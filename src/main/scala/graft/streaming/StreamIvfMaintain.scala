package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.Tables
import graft.functions.VectorOps._

/** Streaming MAINTENANCE of the persisted IVF index (q375) — the IVF
  * sibling of [[StreamIndexMaintain]], completing the lifecycle matrix
  * (LSH and IVF each: build once → append-maintain → probe, with the
  * appends arriving either as a batch epoch (q359/q360) or as a live
  * stream (q372/here)). Epoch-0 vectors (even ids) build the inverted
  * file in batch; epoch-1 vectors arrive as a rate-limited file stream
  * and every micro-batch assigns its vectors against the FROZEN coarse
  * quantizer inside `foreachBatch`, appending members into their
  * cluster's partition directory — dynamic-partition append, old files
  * never rewritten, no streaming state (assignment is stateless given
  * the frozen centroids).
  *
  * Why granularity cannot matter: each vector's cluster is a pure
  * function of (vector, frozen centroids), so ANY partitioning of the
  * appends yields the same inverted file contents — the probe
  * partition-prunes identical directories. Centroid drift is the one
  * thing this cannot absorb; that rebuild trigger is q356's monitor.
  * Oracle: q341's from-scratch SQL — stream-maintained ≡ rebuilt.
  */
object StreamIvfMaintain {

  def runOnce(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_sivf_" +
      java.util.UUID.randomUUID.toString.replace("-", "")
    val in = s"$tmp/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    try {
      val base = Tables.embeddings(spark, sfDir)
        .select($"vec_id", asDouble($"embedding").as("emb"))
        .withColumn("nrm", l2Norm($"emb"))
      val cent = base.filter($"vec_id".between(2, 9))
        .select($"vec_id".as("cid"), $"emb".as("cemb"), $"nrm".as("cnrm"))
      def assign(df: DataFrame) = Tables.fanOut(df, col("vec_id"))
        .crossJoin(broadcast(cent))
        .withColumn("c", dot(col("emb"), col("cemb")) / (col("nrm") * col("cnrm")))
        .groupBy(col("vec_id"))
        .agg(max_by(col("cid"), struct(col("c"), -col("cid"))).as("cid"),
          first(col("emb")).as("emb"), first(col("nrm")).as("nrm"))
      // BUILD (batch, epoch 0 = even ids).
      assign(base.filter($"vec_id" % 2 === 0))
        .write.partitionBy("cid").parquet(s"$tmp/ivf")
      // STAGE epoch 1 (odd ids) as two files → two append micro-batches.
      Seq($"vec_id" % 4 === 1, $"vec_id" % 4 === 3).zipWithIndex.foreach {
        case (pred, i) =>
          val stage = s"$tmp/stage_$i"
          Tables.embeddings(spark, sfDir).filter(pred)
            .coalesce(1).write.parquet(stage)
          val ls = java.nio.file.Files.list(java.nio.file.Paths.get(stage))
          try ls.filter(_.toString.endsWith(".parquet")).findFirst.ifPresent { p =>
            java.nio.file.Files.move(p,
              java.nio.file.Paths.get(s"$in/vecs_$i.parquet"))
            ()
          }
          finally ls.close()
      }
      val schema = spark.read.parquet(in).schema
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          assign(batch
              .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
              .withColumn("nrm", l2Norm(col("emb"))))
            .write.mode("append").partitionBy("cid").parquet(s"$tmp/ivf")
          ()
        }
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // PROBE the stream-maintained inverted file exactly as q341/q360.
      val qv = base.filter($"vec_id" === 1)
        .select($"emb".as("qemb"), $"nrm".as("qnrm"))
      val probeCids = cent.crossJoin(broadcast(qv))
        .withColumn("c", dot($"cemb", $"qemb") / ($"cnrm" * $"qnrm"))
        .orderBy($"c".desc, $"cid")
        .limit(2)
        .select($"cid").collect().map(_.getLong(0))
      val hits = spark.read.parquet(s"$tmp/ivf")
        .filter($"cid".isin(probeCids: _*) && $"vec_id" =!= 1)
        .crossJoin(broadcast(qv))
        .select($"vec_id", $"cid".cast("long").as("cluster_id"),
          round(dot($"emb", $"qemb") / ($"nrm" * $"qnrm"), 4).as("cos_sim"))
        .orderBy($"cos_sim".desc, $"vec_id")
        .limit(10)
      graft.queries.Eager(hits) // eager: index and stage live under tmp
    } finally graft.Fs.deleteTree(tmp)
  }
}
