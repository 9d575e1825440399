package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.Tables
import graft.functions.CollectCapped.collectCapped
import graft.functions.TextFns._

/** Streaming dedup against a PERSISTED LSH index (q366) — the ingest
  * path the q342/q359 index family exists to serve: the corpus index is
  * built ONCE (batch, capped band buckets, partitioned by band) and the
  * arriving documents flow in as a file-source stream; each micro-batch
  * computes its signatures statelessly, probes the WRITTEN index with a
  * band-key equi-join inside `foreachBatch`, and appends its verdicts
  * to the result sink. No streaming state at all: the index on disk IS
  * the state, which is what makes the pattern restartable and lets the
  * probe fleet scale independently of the index builder at 100 TB
  * (signatures per doc are computed exactly once, in the batch that
  * carries the doc).
  *
  * The stage is rate-limited (two files, one per trigger) so the probe
  * provably runs per micro-batch, and every doc appears in exactly one
  * file — per-doc verdicts are complete within that doc's batch, so the
  * drained result must equal the all-at-once batch probe, which is
  * exactly what the oracle computes from scratch (q342's SQL).
  */
object StreamIndexProbe {

  def runOnce(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cap = graft.queries.NearDup.MaxLshBucket
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_sidx_" +
      java.util.UUID.randomUUID.toString.replace("-", "")
    val bands = s"$tmp/bands"
    val in = s"$tmp/in"
    val sink = s"$tmp/sink"
    val ckpt = s"$tmp/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    try {
      val docs = Tables.documents(spark, sfDir)
        .select($"doc_id", tokens($"text").as("t"))
        .filter(size($"t") >= 3)
      // BUILD (batch, once): q342's capped corpus buckets on disk.
      graft.queries.Indexes.bandSigs(docs.filter($"doc_id" % 4 =!= 0))
        .groupBy($"b", $"band_key")
        .agg(collectCapped($"doc_id", cap).as("ids"))
        .filter(size($"ids") <= cap)
        .select($"b", $"band_key", explode($"ids").as("corpus_id"))
        .write.partitionBy("b").parquet(bands)
      // STAGE the arriving docs as two files → two micro-batches.
      Seq($"doc_id" % 8 === 0, $"doc_id" % 8 === 4).zipWithIndex.foreach {
        case (pred, i) =>
          val stage = s"$tmp/stage_$i"
          Tables.documents(spark, sfDir).filter(pred)
            .select($"doc_id", $"text")
            .coalesce(1).write.parquet(stage)
          val ls = java.nio.file.Files.list(java.nio.file.Paths.get(stage))
          try ls.filter(_.toString.endsWith(".parquet")).findFirst.ifPresent { p =>
            java.nio.file.Files.move(p,
              java.nio.file.Paths.get(s"$in/docs_$i.parquet"))
            ()
          }
          finally ls.close()
      }
      val schema = spark.read.parquet(in).schema
      val sinkSchema = StructType(Seq(
        StructField("doc_id", LongType), StructField("dup_of", LongType)))
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val b = batch
            .select(col("doc_id"), tokens(col("text")).as("t"))
            .filter(size(col("t")) >= 3)
          graft.queries.Indexes.bandSigs(b)
            .join(spark.read.parquet(bands), Seq("b", "band_key"))
            .groupBy(col("doc_id"))
            .agg(min(col("corpus_id")).as("dup_of"))
            .write.mode("append").parquet(sink)
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val verdicts = spark.read.schema(sinkSchema).parquet(sink)
      val out = docs.filter($"doc_id" % 4 === 0).select($"doc_id")
        .join(verdicts, Seq("doc_id"), "left")
        .select($"doc_id", $"dup_of".isNotNull.as("is_dup"), $"dup_of")
        .orderBy($"doc_id")
      graft.queries.Eager(out) // eager: index, stage, and sink live under tmp
    } finally graft.Fs.deleteTree(tmp)
  }
}
