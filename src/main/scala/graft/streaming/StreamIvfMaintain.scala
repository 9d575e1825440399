package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

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
  * cluster's partition directory — no streaming state (assignment is
  * stateless given the frozen centroids).
  *
  * Why granularity cannot matter: each vector's cluster is a pure
  * function of (vector, frozen centroids), so ANY partitioning of the
  * appends yields the same inverted file contents — the probe
  * partition-prunes identical directories.
  *
  * Restart safety: a replayed micro-batch that plain-appended would
  * DUPLICATE member vectors — and unlike the LSH probe's min(), the
  * IVF probe's top-k would then emit the same vec_id twice. So every
  * batch writes under its own (cid, batch_id) partitions with
  * dynamic-partition OVERWRITE: the replay deterministically
  * regenerates the same assignments and replaces its own (possibly
  * partial) output instead of doubling it (asserted by the
  * kill-and-restart test). Centroid drift is the one thing append-only
  * maintenance cannot absorb; that rebuild trigger is q356's monitor.
  * Oracle: q341's from-scratch SQL — stream-maintained ≡ rebuilt.
  */
object StreamIvfMaintain {

  private final case class Staged(spark: SparkSession, sfDir: String, tmp: String)

  private def baseOf(st: Staged): DataFrame = {
    import st.spark.implicits._
    Tables.embeddings(st.spark, st.sfDir)
      .select($"vec_id", asDouble($"embedding").as("emb"))
      .withColumn("nrm", l2Norm($"emb"))
  }

  private def centOf(st: Staged): DataFrame = {
    import st.spark.implicits._
    baseOf(st).filter($"vec_id".between(2, 9))
      .select($"vec_id".as("cid"), $"emb".as("cemb"), $"nrm".as("cnrm"))
  }

  private def assign(st: Staged, df: DataFrame): DataFrame =
    Tables.fanOut(df, col("vec_id"))
      .crossJoin(broadcast(centOf(st)))
      .withColumn("c", dot(col("emb"), col("cemb")) / (col("nrm") * col("cnrm")))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cid"), struct(col("c"), -col("cid"))).as("cid"),
        first(col("emb")).as("emb"), first(col("nrm")).as("nrm"))

  private def stage(spark: SparkSession, sfDir: String): Staged = {
    import spark.implicits._
    val st = Staged(spark, sfDir,
      s"${System.getProperty("java.io.tmpdir")}/graft_sivf_" +
        java.util.UUID.randomUUID.toString.replace("-", ""))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"${st.tmp}/in"))
    // BUILD (batch, epoch 0 = even ids).
    assign(st, baseOf(st).filter($"vec_id" % 2 === 0))
      .withColumn("batch_id", lit(-1L))
      .write.partitionBy("cid", "batch_id").parquet(s"${st.tmp}/ivf")
    // STAGE epoch 1 (odd ids) as two files → two append micro-batches.
    Seq($"vec_id" % 4 === 1, $"vec_id" % 4 === 3).zipWithIndex.foreach {
      case (pred, i) =>
        val stg = s"${st.tmp}/stage_$i"
        Tables.embeddings(spark, sfDir).filter(pred)
          .coalesce(1).write.parquet(stg)
        val ls = java.nio.file.Files.list(java.nio.file.Paths.get(stg))
        try ls.filter(_.toString.endsWith(".parquet")).findFirst.ifPresent { p =>
          java.nio.file.Files.move(p,
            java.nio.file.Paths.get(s"${st.tmp}/in/vecs_$i.parquet"))
          ()
        }
        finally ls.close()
    }
    st
  }

  private def writer(st: Staged): DataStreamWriter[Row] = {
    val schema = st.spark.read.parquet(s"${st.tmp}/in").schema
    st.spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"${st.tmp}/in")
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        assign(st, batch
            .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
            .withColumn("nrm", l2Norm(col("emb"))))
          .withColumn("batch_id", lit(batchId))
          .write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("cid", "batch_id").parquet(s"${st.tmp}/ivf")
        ()
      }
      .option("checkpointLocation", s"${st.tmp}/ckpt")
  }

  /** Member-sliver COMPACTION (round-11 verdict ask #3): the inverted
    * file's rows keep their identity — each vector is assigned exactly
    * once — so the [[StoreCompaction]] fold is a pass-through rewrite
    * under one generation per cluster (`cid=X/batch_id=gen`), and the
    * probe's cluster pruning composes unchanged: |probed clusters| ×
    * O(generations) leaf dirs instead of × O(batches). The cid level
    * stays OUTER, so the two-level leaf names ride the same manifest
    * and per-leaf swap the protocol already speaks. Run with the
    * maintainer and probes stopped (the shared quiesce contract). */
  /** The member fold: pass-through under one generation per cluster. */
  private[graft] def memberFold(all: DataFrame, gen: Long, out: String): Unit =
    all.drop("batch_id").withColumn("batch_id", lit(gen))
      .repartition(col("cid"))
      .write.partitionBy("cid", "batch_id").parquet(out)

  private[graft] def compact(spark: SparkSession, tmp: String): Unit = {
    StoreCompaction.compact(spark, s"$tmp/ivf", memberFold)
    ()
  }

  /** PROBE the stream-maintained inverted file exactly as q341/q360. */
  private def probe(st: Staged): DataFrame = {
    import st.spark.implicits._
    StoreCompaction.recover(s"${st.tmp}/ivf",
      StoreCompaction.stageDirFor(s"${st.tmp}/ivf"))
    val qv = baseOf(st).filter($"vec_id" === 1)
      .select($"emb".as("qemb"), $"nrm".as("qnrm"))
    val probeCids = centOf(st).crossJoin(broadcast(qv))
      .withColumn("c", dot($"cemb", $"qemb") / ($"cnrm" * $"qnrm"))
      .orderBy($"c".desc, $"cid")
      .limit(2)
      .select($"cid").collect().map(_.getLong(0))
    val hits = st.spark.read.parquet(s"${st.tmp}/ivf")
      .filter($"cid".isin(probeCids: _*) && $"vec_id" =!= 1)
      .crossJoin(broadcast(qv))
      .select($"vec_id", $"cid".cast("long").as("cluster_id"),
        round(dot($"emb", $"qemb") / ($"nrm" * $"qnrm"), 4).as("cos_sim"))
      .orderBy($"cos_sim".desc, $"vec_id")
      .limit(10)
    graft.queries.Eager(hits) // eager: index and stage live under tmp
  }

  def runOnce(spark: SparkSession, sfDir: String): DataFrame =
      // r12: per-batch frames here are thousands of rows — exchanges
      // ride the harness's state-volume width (StreamHarness doc).
      StreamHarness.withStreamingPartitions(spark, 8) {
    val st = stage(spark, sfDir)
    try {
      val q = writer(st).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // Maintenance-job compaction with the maintainer drained: the
      // probe answers from the consolidated inverted file, so the
      // oracle gates build → stream → compact → probe.
      compact(spark, st.tmp)
      probe(st)
    } finally graft.Fs.deleteTree(st.tmp)
  }

  /** Kill the maintainer as soon as the first streamed (cid, batch_id)
    * partition appears (possibly mid-batch), restart on the SAME
    * checkpoint, drain, probe — a doubled append would surface as a
    * duplicate vec_id in the top-10. */
  def runWithRestart(spark: SparkSession, sfDir: String): DataFrame =
      // r12: per-batch frames here are thousands of rows — exchanges
      // ride the harness's state-volume width (StreamHarness doc).
      StreamHarness.withStreamingPartitions(spark, 8) {
    val st = stage(spark, sfDir)
    try {
      val q1 = writer(st).trigger(Trigger.ProcessingTime("50 milliseconds")).start()
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      def streamedPartition(): Boolean = {
        val root = new java.io.File(s"${st.tmp}/ivf")
        val cids = Option(root.listFiles).getOrElse(Array.empty)
        cids.exists { c =>
          c.getName.startsWith("cid=") && {
            val bs = Option(c.listFiles).getOrElse(Array.empty)
            bs.exists(b => b.getName.startsWith("batch_id=") &&
              !b.getName.endsWith("=-1"))
          }
        }
      }
      while (!streamedPartition() && q1.isActive && System.nanoTime() < deadline)
        Thread.sleep(20)
      q1.stop()
      try q1.awaitTermination()
      catch { case scala.util.control.NonFatal(_) => () }
      val q2 = writer(st).trigger(Trigger.AvailableNow()).start()
      q2.awaitTermination()
      probe(st)
    } finally graft.Fs.deleteTree(st.tmp)
  }
}
