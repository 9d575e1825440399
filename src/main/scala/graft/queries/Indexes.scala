package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.CollectCapped.collectCapped
import graft.functions.TextFns._
import graft.functions.VectorOps._
import Det._

/** Persisted-index operators (SURVEY §2.3 stretch, round-6): the
  * "build the index ONCE, write it, probe it incrementally" half of the
  * ANN/LSH story. q28/q81/q125 compute their centroid/band structures
  * in-flight every run — correct, but at 100 TB the index build is the
  * expensive pass and must amortize across probe batches. These queries
  * stage the index to parquet exactly the way a production pipeline
  * would (partitioned by the probe key, so a probe is a PRUNED read,
  * not a scan), then answer from the WRITTEN files; the DuckDB oracle
  * computes the same answer from scratch, proving the persisted round
  * trip loses nothing.
  *
  * Scale design: index rows are tiny (ids + signatures/centroids, never
  * text or raw vectors on the probe path's shuffle); the probe reads
  * only the partitions its keys select — at 1000 executors that is a
  * handful of parquet dirs, not the corpus.
  */
object Indexes {

  private val B = 4 // LSH bands (must match NearDup's banding)

  /** (doc_id, t=tokens) → (doc_id, b, band_key): the banded MinHash
    * signature stream shared by q342 (build-once index) and q359
    * (incrementally maintained index) — signatures must be IDENTICAL
    * across epochs or the maintained index silently diverges from a
    * rebuild. */
  private[graft] def bandSigs(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.select($"doc_id", shingles3("t").as("sh"))
      .select($"doc_id",
        saltedHashes("sh", 0).as("h0"), saltedHashes("sh", 1).as("h1"))
      .select($"doc_id", explode(sequence(lit(0), lit(B - 1))).as("b"), $"h0", $"h1")
      .select($"doc_id", $"b",
        concat(chunkMin("h0", "b"), lit("|"), chunkMin("h1", "b")).as("band_key"))
  }

  /** q341 — IVF index persisted + probed: q28's centroid assignment is
    * computed ONCE (one corpus pass: broadcast the 8 centroids, argmax
    * per vector) and WRITTEN to parquet partitioned by cluster id —
    * the inverted file. The probe then selects the query's 2 nearest
    * centroids (an 8-row computation) and reads ONLY those partitions
    * back (partition pruning on `cid` — the directory structure IS the
    * inverted index), scoring cosines against a ~2/8 slice of the
    * corpus. Result contract: identical to computing IVF from scratch,
    * which is exactly what the oracle does. Cleanup is eager — the
    * staged index is scratch, deleted before return. */
  val q341 = QuerySpec(
    "q341_ann_index_persisted",
    (s, d) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft_ivfidx").toString
      try {
        val base = Tables.embeddings(s, d)
          .select($"vec_id", asDouble($"embedding").as("emb"))
          .withColumn("nrm", l2Norm($"emb"))
        val cent = base.filter($"vec_id".between(2, 9))
          .select($"vec_id".as("cid"), $"emb".as("cemb"), $"nrm".as("cnrm"))
        val qv = base.filter($"vec_id" === 1)
          .select($"emb".as("qemb"), $"nrm".as("qnrm"))
        // BUILD: one assignment pass, then the inverted file on disk.
        Tables.fanOut(base, col("vec_id"))
          .crossJoin(broadcast(cent))
          .withColumn("c", dot($"emb", $"cemb") / ($"nrm" * $"cnrm"))
          .groupBy($"vec_id")
          .agg(max_by($"cid", struct($"c", -$"cid")).as("cid"),
            first($"emb").as("emb"), first($"nrm").as("nrm"))
          .write.partitionBy("cid").parquet(s"$tmp/ivf")
        // PROBE: 2 nearest centroids to the query — a driver-side pair
        // of ids (bounded by the centroid count), pushed into the read
        // as a partition filter.
        val probeCids = cent.crossJoin(broadcast(qv))
          .withColumn("c", dot($"cemb", $"qemb") / ($"cnrm" * $"qnrm"))
          .orderBy($"c".desc, $"cid")
          .limit(2)
          .select($"cid").collect().map(_.getLong(0))
        val hits = s.read.parquet(s"$tmp/ivf")
          .filter($"cid".isin(probeCids: _*) && $"vec_id" =!= 1)
          .crossJoin(broadcast(qv))
          .select($"vec_id", $"cid".cast("long").as("cluster_id"),
            round(dot($"emb", $"qemb") / ($"nrm" * $"qnrm"), 4).as("cos_sim"))
          .orderBy($"cos_sim".desc, $"vec_id")
          .limit(10)
        Eager(hits)
      } finally graft.Fs.deleteTree(tmp)
    },
    Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
            |cent AS (SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id BETWEEN 2 AND 9),
            |assign AS (SELECT vec_id, cid, c, row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cid) AS rn
            |           FROM (SELECT v.vec_id, c2.cid, ${sqlCosine("v.emb", "c2.cemb")} AS c FROM e v, cent c2)),
            |member AS (SELECT vec_id, cid FROM assign WHERE rn = 1),
            |q AS (SELECT emb AS qemb FROM e WHERE vec_id = 1),
            |probe AS (SELECT cid FROM assign WHERE vec_id = 1 AND rn <= 2)
            |SELECT m.vec_id AS vec_id, m.cid AS cluster_id, round(${sqlCosine("v.emb", "qemb")}, 4) AS cos_sim
            |FROM member m JOIN e v ON m.vec_id = v.vec_id, q
            |WHERE m.cid IN (SELECT cid FROM probe) AND m.vec_id <> 1
            |ORDER BY cos_sim DESC, m.vec_id LIMIT 10""".stripMargin),
  )

  /** q342 — LSH band index persisted + probed: q125's incremental dedup
    * with the corpus half actually WRITTEN — corpus band buckets
    * (capped at [[NearDup.MaxLshBucket]] via CollectCapped, hot bands
    * dropped) land in parquet partitioned by band id, then the arriving
    * batch's signatures probe the written buckets with a band-key
    * equi-join. This is the full production shape: signatures are
    * computed once per document EVER (at ingest), the index on disk is
    * bucket-rows keyed for the join, and a probe batch touches exactly
    * its band partitions. Oracle: the from-scratch q125 semantics —
    * the persisted detour must change nothing. */
  val q342 = QuerySpec(
    "q342_lsh_index_persisted",
    (s, d) => {
      import s.implicits._
      val cap = NearDup.MaxLshBucket
      val tmp = java.nio.file.Files.createTempDirectory("graft_lshidx").toString
      try {
        val docs = Tables.fanOut(Tables.documents(s, d), col("doc_id"))
          .select($"doc_id", tokens($"text").as("t"))
          .filter(size($"t") >= 3)
        def sigs(df: DataFrame) = bandSigs(df)
        // BUILD: capped corpus buckets → parquet, one dir per band.
        sigs(docs.filter($"doc_id" % 4 =!= 0))
          .groupBy($"b", $"band_key")
          .agg(collectCapped($"doc_id", cap).as("ids"))
          .filter(size($"ids") <= cap)
          .select($"b", $"band_key", explode($"ids").as("corpus_id"))
          .write.partitionBy("b").parquet(s"$tmp/bands")
        // PROBE: batch signatures against the WRITTEN buckets.
        val matches = sigs(docs.filter($"doc_id" % 4 === 0))
          .join(s.read.parquet(s"$tmp/bands"), Seq("b", "band_key"))
          .groupBy($"doc_id")
          .agg(min($"corpus_id").as("dup_of"))
        val out = docs.filter($"doc_id" % 4 === 0).select($"doc_id")
          .join(matches, Seq("doc_id"), "left")
          .select($"doc_id", $"dup_of".isNotNull.as("is_dup"), $"dup_of")
          .orderBy($"doc_id")
        Eager(out)
      } finally graft.Fs.deleteTree(tmp)
    },
    Some("""WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t FROM documents),
           |docs AS (SELECT doc_id, t FROM toks WHERE len(t) >= 3),
           |sh AS (SELECT doc_id, list_transform(generate_series(1, len(t)-2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS s
           |       FROM docs),
           |hs AS (SELECT doc_id,
           |        list_transform(s, x -> md5(x || ':0')) AS h0,
           |        list_transform(s, x -> md5(x || ':1')) AS h1 FROM sh),
           |sig AS (SELECT doc_id, b,
           |        list_aggregate(list_transform(h0, x -> substring(x, 1 + 8*b, 8)), 'min')
           |        || '|' ||
           |        list_aggregate(list_transform(h1, x -> substring(x, 1 + 8*b, 8)), 'min') AS band_key
           |        FROM hs, generate_series(0, 3) g(b)),
           |corpus AS (SELECT b, band_key, doc_id FROM (
           |  SELECT b, band_key, doc_id, count(*) OVER (PARTITION BY b, band_key) AS bn
           |  FROM sig WHERE doc_id % 4 <> 0) WHERE bn <= 64),
           |matches AS (
           |  SELECT s2.doc_id, min(c.doc_id) AS dup_of
           |  FROM sig s2 JOIN corpus c ON s2.b = c.b AND s2.band_key = c.band_key
           |  WHERE s2.doc_id % 4 = 0 GROUP BY s2.doc_id)
           |SELECT d.doc_id, m.dup_of IS NOT NULL AS is_dup, m.dup_of
           |FROM (SELECT DISTINCT doc_id FROM docs WHERE doc_id % 4 = 0) d
           |LEFT JOIN matches m ON d.doc_id = m.doc_id
           |ORDER BY d.doc_id""".stripMargin),
  )

  /** q359's probe, factored so PlanAuditSpec can pin its shape: the
    * maintained member table is BUCKETED by band_key, so the index side
    * of both probe joins plans with NO shuffle Exchange — batch
    * signatures and the meta liveness frame shuffle TO the index's
    * on-disk partitioning, never the reverse. At 100 TB that is the
    * whole point of a persisted index: the corpus-sized side never
    * moves at probe time. */
  def maintainedLshProbe(s: SparkSession, membersTbl: String,
      metaDir: String, batchDocs: DataFrame, cap: Int): DataFrame = {
    import s.implicits._
    // Liveness from the MAINTAINED meta (true per-bucket totals across
    // every epoch, including tombstoned over-cap buckets whose members
    // were never written): a bucket is probe-able iff its lifetime
    // total stays within cap — exactly the from-scratch drop rule.
    val live = s.read.parquet(metaDir).groupBy($"b", $"band_key")
      .agg(sum($"k").as("ktot")).filter($"ktot" <= cap)
    val members = s.table(membersTbl)
      .join(live, Seq("b", "band_key"), "left_semi")
    bandSigs(batchDocs)
      .join(members, Seq("b", "band_key"))
      .groupBy($"doc_id")
      .agg(min($"corpus_id").as("dup_of"))
  }

  /** q359's build+maintain stage, factored for the plan-audit spec:
    * epoch 0 (doc_id % 4 == 1) creates the bucketed member table and
    * meta; epoch 1 (doc_id % 4 ∈ {2,3}) APPENDS to both. `docs` must
    * carry (doc_id, t). */
  def stageMaintainedLsh(s: SparkSession, docs: DataFrame,
      tmp: String, tbl: String, cap: Int): Unit = {
    import s.implicits._
    // One pass per epoch: true count k (O(1) state) + capped member
    // list (O(cap) state) — a hot bucket costs cap+1 buffer slots,
    // never its true size.
    def epochBuckets(df: DataFrame) = bandSigs(df)
      .groupBy($"b", $"band_key")
      .agg(count(lit(1)).as("k"), collectCapped($"doc_id", cap).as("ids"))
    def writeEpoch(e: DataFrame, first: Boolean): Unit = {
      val mode = if (first) org.apache.spark.sql.SaveMode.ErrorIfExists
                 else org.apache.spark.sql.SaveMode.Append
      e.select($"b", $"band_key", $"k")
        .write.mode(mode).parquet(s"$tmp/meta")
      e.filter($"k" <= cap)
        .select($"b", $"band_key", explode($"ids").as("corpus_id"))
        .write.mode(mode)
        .bucketBy(8, "b", "band_key").sortBy("b", "band_key")
        .option("path", s"$tmp/members").saveAsTable(tbl)
    }
    writeEpoch(epochBuckets(docs.filter($"doc_id" % 4 === 1)), first = true)
    writeEpoch(epochBuckets(docs.filter($"doc_id" % 4 === 2
      || $"doc_id" % 4 === 3)), first = false)
  }

  /** q359 — LSH index MAINTAINED incrementally (the production
    * lifecycle q342 stops short of): the corpus index is built from
    * epoch-0 docs, then epoch-1 arrives and is APPENDED — new band
    * buckets union in, per-epoch member rows land in the same bucketed
    * table, and a meta table of TRUE bucket counts (kept even for
    * over-cap buckets whose members are dropped) is the re-cap
    * authority: the probe admits a bucket only if its lifetime total ≤
    * cap. That meta discipline is what makes increment ≡ rebuild — a
    * bucket that went hot in epoch 0 stays tombstoned even if epoch 1
    * alone is small, exactly as a from-scratch build over both epochs
    * would drop it (the q316 delta discipline applied to an index).
    * Members are written `bucketBy(b, band_key)` + sorted (bucket keys ≡ probe join keys, or the planner disables the bucketed scan), so probe joins
    * plan with NO shuffle on the index side (PlanAuditSpec pins it).
    * Oracle: q342's from-scratch SQL over the SAME corpus — the
    * maintained files must answer identically to a rebuild. */
  val q359 = QuerySpec(
    "q359_lsh_index_maintained",
    (s, d) => {
      import s.implicits._
      val cap = NearDup.MaxLshBucket
      val sfx = java.util.UUID.randomUUID.toString.replace("-", "").take(12)
      val tbl = s"graft_lshm_$sfx"
      val tmp = java.nio.file.Files.createTempDirectory("graft_lshm").toString
      try {
        val docs = Tables.fanOut(Tables.documents(s, d), col("doc_id"))
          .select($"doc_id", tokens($"text").as("t"))
          .filter(size($"t") >= 3)
        // BUILD (epoch 0) then MAINTAIN (epoch 1 appended).
        stageMaintainedLsh(s, docs, tmp, tbl, cap)
        // PROBE the maintained files with the arriving batch.
        val matches = maintainedLshProbe(s, tbl, s"$tmp/meta",
          docs.filter($"doc_id" % 4 === 0), cap)
        val out = docs.filter($"doc_id" % 4 === 0).select($"doc_id")
          .join(matches, Seq("doc_id"), "left")
          .select($"doc_id", $"dup_of".isNotNull.as("is_dup"), $"dup_of")
          .orderBy($"doc_id")
        Eager(out)
      } finally {
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        graft.Fs.deleteTree(tmp)
      }
    },
    // The from-scratch rebuild IS the oracle: maintained ≡ rebuilt.
    q342.oracle,
  )

  /** q360 — IVF inverted file MAINTAINED incrementally: q341 builds
    * once and probes once; here the corpus arrives in two epochs and
    * the second is APPENDED into the written inverted file (assignment
    * is per-vector against the FROZEN coarse quantizer, so maintenance
    * is append-only — new members land in their cluster's partition
    * directory and old files are never rewritten; Hive-style dynamic
    * partition append). The probe then partition-prunes the maintained
    * directory exactly as q341 does a fresh one. Centroid drift is the
    * one thing append-only maintenance cannot absorb — that rebuild
    * trigger is q356's monitor, by design. Oracle: q341's from-scratch
    * SQL — the maintained inverted file must answer identically. */
  val q360 = QuerySpec(
    "q360_ivf_index_maintained",
    (s, d) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft_ivfm").toString
      try {
        val base = Tables.embeddings(s, d)
          .select($"vec_id", asDouble($"embedding").as("emb"))
          .withColumn("nrm", l2Norm($"emb"))
        val cent = base.filter($"vec_id".between(2, 9))
          .select($"vec_id".as("cid"), $"emb".as("cemb"), $"nrm".as("cnrm"))
        val qv = base.filter($"vec_id" === 1)
          .select($"emb".as("qemb"), $"nrm".as("qnrm"))
        def assign(df: DataFrame) = Tables.fanOut(df, col("vec_id"))
          .crossJoin(broadcast(cent))
          .withColumn("c", dot($"emb", $"cemb") / ($"nrm" * $"cnrm"))
          .groupBy($"vec_id")
          .agg(max_by($"cid", struct($"c", -$"cid")).as("cid"),
            first($"emb").as("emb"), first($"nrm").as("nrm"))
        // BUILD from epoch 0 (even ids), MAINTAIN by appending epoch 1.
        assign(base.filter($"vec_id" % 2 === 0))
          .write.partitionBy("cid").parquet(s"$tmp/ivf")
        assign(base.filter($"vec_id" % 2 === 1))
          .write.mode(org.apache.spark.sql.SaveMode.Append)
          .partitionBy("cid").parquet(s"$tmp/ivf")
        val probeCids = cent.crossJoin(broadcast(qv))
          .withColumn("c", dot($"cemb", $"qemb") / ($"cnrm" * $"qnrm"))
          .orderBy($"c".desc, $"cid")
          .limit(2)
          .select($"cid").collect().map(_.getLong(0))
        val hits = s.read.parquet(s"$tmp/ivf")
          .filter($"cid".isin(probeCids: _*) && $"vec_id" =!= 1)
          .crossJoin(broadcast(qv))
          .select($"vec_id", $"cid".cast("long").as("cluster_id"),
            round(dot($"emb", $"qemb") / ($"nrm" * $"qnrm"), 4).as("cos_sim"))
          .orderBy($"cos_sim".desc, $"vec_id")
          .limit(10)
        Eager(hits)
      } finally graft.Fs.deleteTree(tmp)
    },
    // Maintained inverted file ≡ the from-scratch build q341 verifies.
    q341.oracle,
  )

  /** q462's delete stage, factored so the plan/file audit can drive it
    * directly: erase `deadIds` from the maintained inverted file at
    * `ivfDir` by rewriting ONLY the partitions that hold them. The
    * affected cluster ids are recomputed from the FROZEN coarse
    * quantizer (assignment is deterministic, so no index scan is needed
    * to locate a vector's partition — the same property that makes
    * q360's maintenance append-only). Survivors of the affected
    * partitions are staged to a sibling dir (Spark refuses to overwrite
    * a path it is reading, and rightly so), then swapped in with
    * directory-level moves — the file-commit shape of a production
    * dynamic-partition overwrite, one O(1) FS op per affected
    * partition. Partitions without deleted vectors are NEVER read,
    * rewritten, or touched (the audit pins their files byte-identical).
    * Returns the affected cid set. */
  def deleteFromIvf(s: SparkSession, ivfDir: String,
      assignDead: DataFrame, deadPred: org.apache.spark.sql.Column): Seq[Long] = {
    import s.implicits._
    val deadCids = assignDead.select($"cid").distinct()
      .collect().map(_.getLong(0)).toSeq.sorted // bounded by the centroid count
    if (deadCids.nonEmpty) {
      val stage = s"$ivfDir.__delete_stage"
      s.read.parquet(ivfDir)
        .filter($"cid".isin(deadCids: _*)) // partition-pruned read
        .filter(!deadPred)
        .write.partitionBy("cid").parquet(stage)
      graft.Fs.swapPartitionDirs(ivfDir, stage, deadCids.map(c => s"cid=$c"))
      graft.Fs.deleteTree(stage)
    }
    deadCids
  }

  /** q462 — DELETION from the maintained IVF index (the lifecycle verb
    * q359–q361 stop short of — production right-to-be-forgotten must
    * reach the index files, not just the source tables q325 erases
    * from). The q360 inverted file is built and maintained over two
    * epochs, then an erasure request lands for vec_id % 7 = 3:
    * [[deleteFromIvf]] rewrites exactly the affected cluster
    * partitions. The probe then runs the standard q341 shape over the
    * post-delete files, plus an audit column counting erased ids still
    * readable anywhere in the index — the GDPR verification read
    * (column-pruned: ids only, never vectors). Oracle: the from-scratch
    * IVF on the REDUCED corpus — deletion ≡ rebuild-without-them, and
    * the audit count is pinned at zero. Scale: the erase batch is tiny
    * by nature; the rewrite IO is |affected partitions|, not the index;
    * the swap is one FS move per partition. */
  val q462 = QuerySpec(
    "q462_ivf_index_delete",
    (s, d) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft_ivfd").toString
      try {
        val base = Tables.embeddings(s, d)
          .select($"vec_id", asDouble($"embedding").as("emb"))
          .withColumn("nrm", l2Norm($"emb"))
        val cent = base.filter($"vec_id".between(2, 9))
          .select($"vec_id".as("cid"), $"emb".as("cemb"), $"nrm".as("cnrm"))
        val qv = base.filter($"vec_id" === 1)
          .select($"emb".as("qemb"), $"nrm".as("qnrm"))
        def assign(df: DataFrame) = Tables.fanOut(df, col("vec_id"))
          .crossJoin(broadcast(cent))
          .withColumn("c", dot($"emb", $"cemb") / ($"nrm" * $"cnrm"))
          .groupBy($"vec_id")
          .agg(max_by($"cid", struct($"c", -$"cid")).as("cid"),
            first($"emb").as("emb"), first($"nrm").as("nrm"))
        // BUILD + MAINTAIN: q360's two-epoch append lifecycle.
        assign(base.filter($"vec_id" % 2 === 0))
          .write.partitionBy("cid").parquet(s"$tmp/ivf")
        assign(base.filter($"vec_id" % 2 === 1))
          .write.mode(org.apache.spark.sql.SaveMode.Append)
          .partitionBy("cid").parquet(s"$tmp/ivf")
        // DELETE: the erasure batch spans both epochs' files.
        deleteFromIvf(s, s"$tmp/ivf",
          assign(base.filter($"vec_id" % 7 === 3)), $"vec_id" % 7 === 3)
        // AUDIT: erased ids still readable anywhere in the index.
        val left = s.read.parquet(s"$tmp/ivf")
          .filter($"vec_id" % 7 === 3)
          .agg(count(lit(1)).as("n_erased_left"))
        // PROBE the post-delete index, q341's shape.
        val probeCids = cent.crossJoin(broadcast(qv))
          .withColumn("c", dot($"cemb", $"qemb") / ($"cnrm" * $"qnrm"))
          .orderBy($"c".desc, $"cid")
          .limit(2)
          .select($"cid").collect().map(_.getLong(0))
        val hits = s.read.parquet(s"$tmp/ivf")
          .filter($"cid".isin(probeCids: _*) && $"vec_id" =!= 1)
          .crossJoin(broadcast(qv))
          .select($"vec_id", $"cid".cast("long").as("cluster_id"),
            round(dot($"emb", $"qemb") / ($"nrm" * $"qnrm"), 4).as("cos_sim"))
          .orderBy($"cos_sim".desc, $"vec_id")
          .limit(10)
        Eager(hits.crossJoin(broadcast(left)))
      } finally graft.Fs.deleteTree(tmp)
    },
    Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
            |cent AS (SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id BETWEEN 2 AND 9),
            |assign AS (SELECT vec_id, cid, c, row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cid) AS rn
            |           FROM (SELECT v.vec_id, c2.cid, ${sqlCosine("v.emb", "c2.cemb")} AS c FROM e v, cent c2)),
            |member AS (SELECT vec_id, cid FROM assign WHERE rn = 1 AND vec_id % 7 <> 3),
            |q AS (SELECT emb AS qemb FROM e WHERE vec_id = 1),
            |probe AS (SELECT cid FROM assign WHERE vec_id = 1 AND rn <= 2)
            |SELECT m.vec_id AS vec_id, m.cid AS cluster_id, round(${sqlCosine("v.emb", "qemb")}, 4) AS cos_sim,
            |  CAST(0 AS BIGINT) AS n_erased_left
            |FROM member m JOIN e v ON m.vec_id = v.vec_id, q
            |WHERE m.cid IN (SELECT cid FROM probe) AND m.vec_id <> 1
            |ORDER BY cos_sim DESC, m.vec_id LIMIT 10""".stripMargin),
  )

  /** q465 — quantizer-training → index-build → probe CAPSTONE (the full
    * Faiss-style lifecycle in one query; q236 trains but never builds,
    * q341/q360 build from FIXED centroids): k=4 Lloyd's k-means runs
    * exactly q236's two decimal-exact iterations, the TRAINED centroids
    * become the coarse quantizer of a persisted inverted file
    * (partitioned by cluster id), the probe reads the 2 nearest-to-
    * query partitions back (pruned — PlanAuditSpec pins it), and a
    * recall@10 gate scores the pruned answer against the brute-force
    * top-10 (the q369-style audit, attached as a column so the oracle
    * verifies the recall arithmetic too). Distances are decimal-exact
    * sums (q236's rule) and the output distance is floor(d·10⁶) — an
    * exact integer on both engines (the decimal's fractional part is a
    * multiple of 10⁻⁶, so no conversion can cross a floor boundary).
    * Scale: training and recall both touch the persisted long frame;
    * the index write is one corpus pass; the probe IO is 2/k of the
    * index. */
  val q465 = QuerySpec(
    "q465_kmeans_ivf_capstone",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val tmp = java.nio.file.Files.createTempDirectory("graft_ivfcap").toString
      val long = Tables.fanOut(Tables.embeddings(s, d), col("vec_id"))
        .select($"vec_id", posexplode($"embedding").as(Seq("dim", "xf")))
        .select($"vec_id", $"dim", $"xf".cast("double").as("x"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val byVec = Window.partitionBy($"vec_id").orderBy($"dist", $"cid")
        def centroids(assign: DataFrame) = long.join(assign, Seq("vec_id"))
          .groupBy($"cid", $"dim")
          .agg((Det.dsum($"x", 6) / count($"x")).as("c"))
        def reassign(cent: DataFrame) = long.join(broadcast(cent), Seq("dim"))
          .groupBy($"vec_id", $"cid")
          .agg(sum((($"x" - $"c") * ($"x" - $"c")).cast("decimal(30,12)"))
            .as("dist"))
          .withColumn("rn", row_number().over(byVec))
          .where($"rn" === 1)
          .select($"vec_id", $"cid")
        // TRAIN: q236's two Lloyd iterations, verbatim semantics.
        val init = Tables.embeddings(s, d)
          .select($"vec_id", ($"vec_id" % 4).as("cid"))
        val c2 = centroids(reassign(centroids(init)))
        // BUILD: inverted file from the TRAINED quantizer.
        long.join(reassign(c2), Seq("vec_id"))
          .write.partitionBy("cid").parquet(s"$tmp/ivf")
        // PROBE: nprobe=2 nearest trained centroids to query vec 1.
        val qdim = long.filter($"vec_id" === 1).select($"dim", $"x".as("xq"))
        val probeCids = c2.join(broadcast(qdim), Seq("dim"))
          .groupBy($"cid")
          .agg(sum((($"c" - $"xq") * ($"c" - $"xq")).cast("decimal(30,12)"))
            .as("dist"))
          .orderBy($"dist", $"cid").limit(2)
          .select($"cid").collect().map(_.getLong(0))
        def sqDist(df: DataFrame) = df.join(broadcast(qdim), Seq("dim"))
          .groupBy($"vec_id", $"cid")
          .agg(sum((($"x" - $"xq") * ($"x" - $"xq")).cast("decimal(30,12)"))
            .as("dq"))
        val hits = sqDist(s.read.parquet(s"$tmp/ivf")
            .filter($"cid".isin(probeCids: _*) && $"vec_id" =!= 1))
          .orderBy($"dq", $"vec_id").limit(10)
          .select($"vec_id", $"cid".cast("long").as("cluster_id"),
            floor($"dq" * 1000000).cast("long").as("dist_micros"))
        // RECALL GATE: brute force over the full corpus (the audit read).
        val brute = long.filter($"vec_id" =!= 1)
          .withColumn("cid", lit(0L)).transform(sqDist)
          .orderBy($"dq", $"vec_id").limit(10).select($"vec_id")
        val recall = hits.select($"vec_id")
          .join(brute, Seq("vec_id"), "left_semi")
          .agg(count(lit(1)).cast("int").as("recall_at_10"))
        Eager(hits.crossJoin(broadcast(recall))
          .orderBy($"dist_micros", $"vec_id"))
      } finally { long.unpersist(); graft.Fs.deleteTree(tmp) }
    },
    Some("""WITH long AS (
           |  SELECT vec_id, CAST(unnest(range(len(v))) AS INT) AS dim, unnest(v) AS x
           |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)),
           |a0 AS (SELECT vec_id, vec_id % 4 AS cid FROM embeddings),
           |c1 AS (
           |  SELECT cid, dim, CAST(sum(CAST(x AS DECIMAL(30,6))) AS DOUBLE) / count(x) AS c
           |  FROM long JOIN a0 USING (vec_id) GROUP BY cid, dim),
           |d1 AS (
           |  SELECT vec_id, cid, sum(CAST((x - c) * (x - c) AS DECIMAL(30,12))) AS dist
           |  FROM long JOIN c1 USING (dim) GROUP BY vec_id, cid),
           |a1 AS (
           |  SELECT vec_id, cid FROM (
           |    SELECT vec_id, cid,
           |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
           |    FROM d1) WHERE rn = 1),
           |c2 AS (
           |  SELECT cid, dim, CAST(sum(CAST(x AS DECIMAL(30,6))) AS DOUBLE) / count(x) AS c
           |  FROM long JOIN a1 USING (vec_id) GROUP BY cid, dim),
           |d2 AS (
           |  SELECT vec_id, cid, sum(CAST((x - c) * (x - c) AS DECIMAL(30,12))) AS dist
           |  FROM long JOIN c2 USING (dim) GROUP BY vec_id, cid),
           |a2 AS (
           |  SELECT vec_id, cid FROM (
           |    SELECT vec_id, cid,
           |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
           |    FROM d2) WHERE rn = 1),
           |qd AS (SELECT dim, x AS xq FROM long WHERE vec_id = 1),
           |pc AS (SELECT cid FROM (
           |  SELECT cid, row_number() OVER (ORDER BY dist, cid) AS rn FROM (
           |    SELECT cid, sum(CAST((c - xq) * (c - xq) AS DECIMAL(30,12))) AS dist
           |    FROM c2 JOIN qd USING (dim) GROUP BY cid)) WHERE rn <= 2),
           |dq AS (SELECT l.vec_id, sum(CAST((x - xq) * (x - xq) AS DECIMAL(30,12))) AS dq
           |  FROM long l JOIN qd USING (dim) WHERE l.vec_id <> 1 GROUP BY l.vec_id),
           |hits AS (SELECT a2.vec_id, a2.cid, dq FROM a2 JOIN dq USING (vec_id)
           |  WHERE a2.cid IN (SELECT cid FROM pc) ORDER BY dq, a2.vec_id LIMIT 10),
           |brute AS (SELECT vec_id FROM dq ORDER BY dq, vec_id LIMIT 10),
           |rec AS (SELECT CAST(count(*) AS INT) AS recall_at_10
           |  FROM hits JOIN brute USING (vec_id))
           |SELECT h.vec_id, CAST(h.cid AS BIGINT) AS cluster_id,
           |  CAST(floor(dq * 1000000) AS BIGINT) AS dist_micros, rec.recall_at_10
           |FROM hits h, rec ORDER BY dq, h.vec_id""".stripMargin),
  )

  /** q467 — DELETION from the maintained LSH index (the band-buckets
    * half of the q462/q466 lifecycle verb, and the subtle one: the
    * member table is CAPPED, so erasing docs can pull a tombstoned-hot
    * bucket back under cap — "resurrection" — and a correct delete must
    * restore members the original build never wrote). The enabler is
    * the ingest-time SIGNATURE LOG: production computes band signatures
    * once per document ever (q342's note); here they are also PERSISTED
    * per epoch, bucketed like the member table. Deletion then works
    * from ids alone — the erased docs' text is by assumption already
    * gone: (1) the log yields the erased docs' band keys → the affected
    * bucket set; (2) ONLY those buckets are recomputed, from surviving
    * log rows (semi-join on the bucket keys — exchange-free against the
    * bucketed log), which restores resurrected buckets' full member
    * lists exactly; (3) members/meta are rewritten as untouched-rows ∪
    * recomputed-buckets — the compaction-shaped pass production folds
    * deletes into (Lucene's model; q361 is the standalone verb).
    * Probe + audit prove erased docs gone AND survivors identical to a
    * from-scratch rebuild on the reduced corpus — which is exactly what
    * the oracle computes. */
  val q467 = QuerySpec(
    "q467_lsh_index_delete",
    (s, d) => {
      import s.implicits._
      val cap = NearDup.MaxLshBucket
      val sfx = java.util.UUID.randomUUID.toString.replace("-", "").take(12)
      val (tblM, tblM2, tblS) =
        (s"graft_lshd_$sfx", s"graft_lshd2_$sfx", s"graft_lshds_$sfx")
      val tmp = java.nio.file.Files.createTempDirectory("graft_lshd").toString
      try {
        val docs = Tables.fanOut(Tables.documents(s, d), col("doc_id"))
          .select($"doc_id", tokens($"text").as("t"))
          .filter(size($"t") >= 3)
        // BUILD + MAINTAIN, with the signature log written at ingest.
        def writeEpoch(df: DataFrame, first: Boolean): Unit = {
          val mode = if (first) org.apache.spark.sql.SaveMode.ErrorIfExists
                     else org.apache.spark.sql.SaveMode.Append
          val sig = bandSigs(df)
          sig.write.mode(mode)
            .bucketBy(8, "b", "band_key").sortBy("b", "band_key")
            .option("path", s"$tmp/sigs").saveAsTable(tblS)
          val eb = s.table(tblS).join(df.select($"doc_id"), Seq("doc_id"), "left_semi")
            .groupBy($"b", $"band_key")
            .agg(count(lit(1)).as("k"), collectCapped($"doc_id", cap).as("ids"))
          eb.select($"b", $"band_key", $"k")
            .write.mode(mode).parquet(s"$tmp/meta")
          eb.filter($"k" <= cap)
            .select($"b", $"band_key", explode($"ids").as("corpus_id"))
            .write.mode(mode)
            .bucketBy(8, "b", "band_key").sortBy("b", "band_key")
            .option("path", s"$tmp/members").saveAsTable(tblM)
        }
        writeEpoch(docs.filter($"doc_id" % 4 === 1), first = true)
        writeEpoch(docs.filter($"doc_id" % 4 === 2
          || $"doc_id" % 4 === 3), first = false)
        // DELETE doc_id % 5 = 2, BY ID, from the log.
        val delPred = $"doc_id" % 5 === 2
        val affected = s.table(tblS).filter(delPred)
          .select($"b", $"band_key").distinct()
        val newBuckets = s.table(tblS)
          .join(affected, Seq("b", "band_key"), "left_semi")
          .filter(!delPred)
          .groupBy($"b", $"band_key")
          .agg(count(lit(1)).as("k"), collectCapped($"doc_id", cap).as("ids"))
        s.table(tblM)
          .join(affected, Seq("b", "band_key"), "left_anti")
          .unionByName(newBuckets.filter($"k" <= cap)
            .select($"b", $"band_key", explode($"ids").as("corpus_id")))
          .write.bucketBy(8, "b", "band_key").sortBy("b", "band_key")
          .option("path", s"$tmp/members_v2").saveAsTable(tblM2)
        s.read.parquet(s"$tmp/meta")
          .join(affected, Seq("b", "band_key"), "left_anti")
          .unionByName(newBuckets.select($"b", $"band_key", $"k"))
          .write.parquet(s"$tmp/meta_v2")
        // PROBE the post-delete index + AUDIT the erased ids.
        val matches = maintainedLshProbe(s, tblM2, s"$tmp/meta_v2",
          docs.filter($"doc_id" % 4 === 0), cap)
        val audit = s.table(tblM2).filter($"corpus_id" % 5 === 2)
          .agg(count(lit(1)).as("n_erased_left"))
        val out = docs.filter($"doc_id" % 4 === 0).select($"doc_id")
          .join(matches, Seq("doc_id"), "left")
          .select($"doc_id", $"dup_of".isNotNull.as("is_dup"), $"dup_of")
          .crossJoin(broadcast(audit))
          .orderBy($"doc_id")
        Eager(out)
      } finally {
        s.sql(s"DROP TABLE IF EXISTS $tblM")
        s.sql(s"DROP TABLE IF EXISTS $tblM2")
        s.sql(s"DROP TABLE IF EXISTS $tblS")
        graft.Fs.deleteTree(tmp)
      }
    },
    // From-scratch rebuild on the REDUCED corpus (q342's semantics with
    // the erased ids gone), plus the pinned-zero erasure audit.
    Some("""WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t FROM documents),
           |docs AS (SELECT doc_id, t FROM toks WHERE len(t) >= 3),
           |sh AS (SELECT doc_id, list_transform(generate_series(1, len(t)-2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS s
           |       FROM docs),
           |hs AS (SELECT doc_id,
           |        list_transform(s, x -> md5(x || ':0')) AS h0,
           |        list_transform(s, x -> md5(x || ':1')) AS h1 FROM sh),
           |sig AS (SELECT doc_id, b,
           |        list_aggregate(list_transform(h0, x -> substring(x, 1 + 8*b, 8)), 'min')
           |        || '|' ||
           |        list_aggregate(list_transform(h1, x -> substring(x, 1 + 8*b, 8)), 'min') AS band_key
           |        FROM hs, generate_series(0, 3) g(b)),
           |corpus AS (SELECT b, band_key, doc_id FROM (
           |  SELECT b, band_key, doc_id, count(*) OVER (PARTITION BY b, band_key) AS bn
           |  FROM sig WHERE doc_id % 4 <> 0 AND doc_id % 5 <> 2) WHERE bn <= 64),
           |matches AS (
           |  SELECT s2.doc_id, min(c.doc_id) AS dup_of
           |  FROM sig s2 JOIN corpus c ON s2.b = c.b AND s2.band_key = c.band_key
           |  WHERE s2.doc_id % 4 = 0 GROUP BY s2.doc_id)
           |SELECT d.doc_id, m.dup_of IS NOT NULL AS is_dup, m.dup_of,
           |  CAST(0 AS BIGINT) AS n_erased_left
           |FROM (SELECT DISTINCT doc_id FROM docs WHERE doc_id % 4 = 0) d
           |LEFT JOIN matches m ON d.doc_id = m.doc_id
           |ORDER BY d.doc_id""".stripMargin),
  )

  /** q361 — LSH index COMPACTION (the lifecycle step after q359's
    * appends): buckets whose lifetime totals crossed the cap are
    * tombstoned in meta — the probe already ignores them, but their
    * member rows written in earlier (then-small) epochs are dead weight
    * on every probe scan. Compaction REWRITES the member table keeping
    * only live buckets (left-semi against the meta totals — the
    * re-cap), and reports per-band reclamation: bucket census, rows
    * before/after, rows purged. Counts come from the REWRITTEN files,
    * proving the compaction physically happened. At 100 TB this is the
    * periodic maintenance job that keeps probe cost proportional to
    * LIVE index size, not to append history; rewriting bucketed-by-key
    * keeps the post-compaction probes exchange-free too. Oracle:
    * recompute the epoch structure from scratch — written rows are the
    * per-epoch ≤cap member lists, live rows those of buckets whose
    * lifetime total ≤ cap. */
  val q361 = QuerySpec(
    "q361_lsh_index_compaction",
    (s, d) => {
      import s.implicits._
      val cap = NearDup.MaxLshBucket
      val sfx = java.util.UUID.randomUUID.toString.replace("-", "").take(12)
      val (tbl, tbl2) = (s"graft_lshc_$sfx", s"graft_lshc2_$sfx")
      val tmp = java.nio.file.Files.createTempDirectory("graft_lshc").toString
      try {
        val docs = Tables.fanOut(Tables.documents(s, d), col("doc_id"))
          .select($"doc_id", tokens($"text").as("t"))
          .filter(size($"t") >= 3)
        stageMaintainedLsh(s, docs, tmp, tbl, cap)
        val ktot = s.read.parquet(s"$tmp/meta").groupBy($"b", $"band_key")
          .agg(sum($"k").as("ktot"))
        // COMPACT: rewrite members minus tombstoned buckets, bucketed
        // again so downstream probes keep the shuffle-free layout.
        s.table(tbl)
          .join(ktot.filter($"ktot" <= cap), Seq("b", "band_key"), "left_semi")
          .write.bucketBy(8, "b", "band_key").sortBy("b", "band_key")
          .option("path", s"$tmp/members_v2").saveAsTable(tbl2)
        val before = s.table(tbl).groupBy($"b")
          .agg(count(lit(1)).as("rows_before"))
        val after = s.table(tbl2).groupBy($"b")
          .agg(count(lit(1)).as("rows_after"))
        val buckets = ktot.groupBy($"b")
          .agg(count(lit(1)).as("n_buckets"),
            sum(when($"ktot" <= cap, 1L).otherwise(0L)).as("n_live_buckets"))
        // Left joins + coalesce(0): a band whose every bucket went hot
        // has NO rows in either member table but must still report.
        val out = buckets
          .join(before, Seq("b"), "left").join(after, Seq("b"), "left")
          .select($"b", $"n_buckets", $"n_live_buckets",
            coalesce($"rows_before", lit(0L)).as("rows_before"),
            coalesce($"rows_after", lit(0L)).as("rows_after"),
            (coalesce($"rows_before", lit(0L)) -
              coalesce($"rows_after", lit(0L))).as("rows_purged"))
          .orderBy($"b")
        Eager(out)
      } finally {
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        s.sql(s"DROP TABLE IF EXISTS $tbl2")
        graft.Fs.deleteTree(tmp)
      }
    },
    Some("""WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t FROM documents),
           |docs AS (SELECT doc_id, t FROM toks WHERE len(t) >= 3),
           |sh AS (SELECT doc_id, list_transform(generate_series(1, len(t)-2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS s
           |       FROM docs),
           |hs AS (SELECT doc_id,
           |        list_transform(s, x -> md5(x || ':0')) AS h0,
           |        list_transform(s, x -> md5(x || ':1')) AS h1 FROM sh),
           |sig AS (SELECT doc_id, b,
           |        list_aggregate(list_transform(h0, x -> substring(x, 1 + 8*b, 8)), 'min')
           |        || '|' ||
           |        list_aggregate(list_transform(h1, x -> substring(x, 1 + 8*b, 8)), 'min') AS band_key
           |        FROM hs, generate_series(0, 3) g(b)),
           |epochs AS (SELECT b, band_key,
           |        CASE WHEN doc_id % 4 = 1 THEN 0 ELSE 1 END AS ep, count(*) AS k
           |        FROM sig WHERE doc_id % 4 <> 0 GROUP BY 1, 2, 3),
           |bk AS (SELECT b, band_key,
           |        CAST(sum(CASE WHEN k <= 64 THEN k ELSE 0 END) AS BIGINT) AS rows_written,
           |        sum(k) AS ktot
           |        FROM epochs GROUP BY 1, 2)
           |SELECT CAST(b AS INT) AS b, count(*) AS n_buckets,
           |  CAST(sum(CASE WHEN ktot <= 64 THEN 1 ELSE 0 END) AS BIGINT) AS n_live_buckets,
           |  CAST(sum(rows_written) AS BIGINT) AS rows_before,
           |  CAST(sum(CASE WHEN ktot <= 64 THEN rows_written ELSE 0 END) AS BIGINT) AS rows_after,
           |  CAST(sum(CASE WHEN ktot > 64 THEN rows_written ELSE 0 END) AS BIGINT) AS rows_purged
           |FROM bk GROUP BY b ORDER BY b""".stripMargin),
  )

  /** q362 — dedup DELTA between index epochs: the same probe batch
    * answered against the epoch-0 index and against epoch-0∪1, diffed —
    * "which documents' dedup verdicts CHANGED when the new corpus epoch
    * landed". This is the report a training-data curator reads after
    * every ingest: newly-caught dups (a new epoch doc matched an
    * incoming one), flips of the canonical dup target, and verdicts
    * REVOKED by the cap (a bucket the new epoch pushed over cap stops
    * matching — the documented degrade of hot non-discriminating
    * bands). Both sides are the capped-bucket q342 semantics at two
    * corpus states; one signature computation feeds both probes. Output
    * is the changed-verdict rows only. */
  val q362 = QuerySpec(
    "q362_dedup_epoch_delta",
    (s, d) => {
      import s.implicits._
      val cap = NearDup.MaxLshBucket
      val docs = Tables.fanOut(Tables.documents(s, d), col("doc_id"))
        .select($"doc_id", tokens($"text").as("t"))
        .filter(size($"t") >= 3)
      val sig = bandSigs(docs)
      val batch = sig.filter($"doc_id" % 4 === 0)
      def verdict(corpus: DataFrame, col0: String) = {
        val buckets = corpus
          .groupBy($"b", $"band_key")
          .agg(collectCapped($"doc_id", cap).as("ids"))
          .filter(size($"ids") <= cap)
          .select($"b", $"band_key", explode($"ids").as("corpus_id"))
        batch.join(buckets, Seq("b", "band_key"))
          .groupBy($"doc_id")
          .agg(min($"corpus_id").as(col0))
      }
      val then_ = verdict(sig.filter($"doc_id" % 4 === 1), "dup_of_then")
      val now = verdict(sig.filter($"doc_id" % 4 =!= 0), "dup_of_now")
      docs.filter($"doc_id" % 4 === 0).select($"doc_id")
        .join(then_, Seq("doc_id"), "left")
        .join(now, Seq("doc_id"), "left")
        .filter(!($"dup_of_then" <=> $"dup_of_now"))
        .select($"doc_id",
          $"dup_of_then".isNotNull.as("was_dup"),
          $"dup_of_now".isNotNull.as("now_dup"),
          $"dup_of_then", $"dup_of_now")
        .orderBy($"doc_id")
    },
    Some("""WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t FROM documents),
           |docs AS (SELECT doc_id, t FROM toks WHERE len(t) >= 3),
           |sh AS (SELECT doc_id, list_transform(generate_series(1, len(t)-2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS s
           |       FROM docs),
           |hs AS (SELECT doc_id,
           |        list_transform(s, x -> md5(x || ':0')) AS h0,
           |        list_transform(s, x -> md5(x || ':1')) AS h1 FROM sh),
           |sig AS (SELECT doc_id, b,
           |        list_aggregate(list_transform(h0, x -> substring(x, 1 + 8*b, 8)), 'min')
           |        || '|' ||
           |        list_aggregate(list_transform(h1, x -> substring(x, 1 + 8*b, 8)), 'min') AS band_key
           |        FROM hs, generate_series(0, 3) g(b)),
           |c_then AS (SELECT b, band_key, doc_id FROM (
           |  SELECT b, band_key, doc_id, count(*) OVER (PARTITION BY b, band_key) AS bn
           |  FROM sig WHERE doc_id % 4 = 1) WHERE bn <= 64),
           |c_now AS (SELECT b, band_key, doc_id FROM (
           |  SELECT b, band_key, doc_id, count(*) OVER (PARTITION BY b, band_key) AS bn
           |  FROM sig WHERE doc_id % 4 <> 0) WHERE bn <= 64),
           |v_then AS (SELECT s2.doc_id, min(c.doc_id) AS dup_of_then
           |  FROM sig s2 JOIN c_then c ON s2.b = c.b AND s2.band_key = c.band_key
           |  WHERE s2.doc_id % 4 = 0 GROUP BY s2.doc_id),
           |v_now AS (SELECT s2.doc_id, min(c.doc_id) AS dup_of_now
           |  FROM sig s2 JOIN c_now c ON s2.b = c.b AND s2.band_key = c.band_key
           |  WHERE s2.doc_id % 4 = 0 GROUP BY s2.doc_id)
           |SELECT d.doc_id, t.dup_of_then IS NOT NULL AS was_dup,
           |  n.dup_of_now IS NOT NULL AS now_dup, t.dup_of_then, n.dup_of_now
           |FROM (SELECT DISTINCT doc_id FROM docs WHERE doc_id % 4 = 0) d
           |LEFT JOIN v_then t ON d.doc_id = t.doc_id
           |LEFT JOIN v_now n ON d.doc_id = n.doc_id
           |WHERE t.dup_of_then IS DISTINCT FROM n.dup_of_now
           |ORDER BY d.doc_id""".stripMargin),
  )

  /** q366 — STREAMING dedup against the persisted LSH index: the
    * q342/q359 index consumed the way production consumes it — arriving
    * docs as a rate-limited file stream, each micro-batch computing its
    * signatures statelessly and probing the WRITTEN index inside
    * `foreachBatch`, verdicts appended to a sink. Zero streaming state:
    * the on-disk index IS the state, so the job restarts cleanly and
    * the probe fleet scales independently of the index builder. Drained
    * result ≡ the all-at-once batch probe (every doc lives in exactly
    * one micro-batch), which is what the oracle computes from scratch.
    * See [[graft.streaming.StreamIndexProbe]]. */
  val q366 = QuerySpec(
    "q366_stream_index_probe",
    (s, d) => graft.streaming.StreamIndexProbe.runOnce(s, d),
    q342.oracle,
  )

  /** q369 — IVF recall audit (recall@10): for a fixed 20-query sample,
    * the exact cosine top-10 versus the IVF(nprobe=2) top-10, scored as
    * overlap count per query — the "is the ANN index good enough to
    * ship" gauge run after every build/maintenance cycle (q341/q360).
    * Shape: queries and centroids broadcast (20- and 8-row frames); the
    * corpus is scanned once for the exact scores and once for the
    * assignment, both followed by bounded per-query top-k windows —
    * never a corpus×corpus pair. Recall is an exact integer: the
    * estimate itself is the deterministic contract. */
  val q369 = QuerySpec(
    "q369_ivf_recall_audit",
    (s, d) => {
      import s.implicits._
      val base = Tables.fanOut(Tables.embeddings(s, d), col("vec_id"))
        .select($"vec_id", asDouble($"embedding").as("emb"))
        .withColumn("nrm", l2Norm($"emb"))
      val cent = base.filter($"vec_id".between(2, 9))
        .select($"vec_id".as("cid"), $"emb".as("cemb"), $"nrm".as("cnrm"))
      val queries = base.filter($"vec_id".between(10, 29))
        .select($"vec_id".as("qid"), $"emb".as("qemb"), $"nrm".as("qnrm"))
      val wq = org.apache.spark.sql.expressions.Window
        .partitionBy($"qid").orderBy($"c".desc, $"vec_id")
      val scored = base.crossJoin(broadcast(queries))
        .filter($"vec_id" =!= $"qid")
        .withColumn("c", dot($"emb", $"qemb") / ($"nrm" * $"qnrm"))
      val exact = scored.withColumn("rn", row_number().over(wq))
        .filter($"rn" <= 10).select($"qid", $"vec_id")
      val assigned = base.crossJoin(broadcast(cent))
        .withColumn("cc", dot($"emb", $"cemb") / ($"nrm" * $"cnrm"))
        .groupBy($"vec_id")
        .agg(max_by($"cid", struct($"cc", -$"cid")).as("cid"),
          first($"emb").as("emb"), first($"nrm").as("nrm"))
      val wp = org.apache.spark.sql.expressions.Window
        .partitionBy($"qid").orderBy($"cc".desc, $"cid")
      val probe = queries.crossJoin(broadcast(cent))
        .withColumn("cc", dot($"qemb", $"cemb") / ($"qnrm" * $"cnrm"))
        .withColumn("rn", row_number().over(wp))
        .filter($"rn" <= 2).select($"qid", $"cid", $"qemb", $"qnrm")
      val cand = assigned.join(broadcast(probe), Seq("cid"))
        .filter($"vec_id" =!= $"qid")
        .withColumn("c", dot($"emb", $"qemb") / ($"nrm" * $"qnrm"))
        .withColumn("rn", row_number().over(wq))
        .filter($"rn" <= 10).select($"qid", $"vec_id")
      val overlap = exact.join(cand, Seq("qid", "vec_id"), "left_semi")
        .groupBy($"qid").agg(count(lit(1)).as("n_hit"))
      queries.select($"qid").join(overlap, Seq("qid"), "left")
        .select($"qid", coalesce($"n_hit", lit(0L)).as("recall_at_10"))
        .orderBy($"qid")
    },
    Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
            |cent AS (SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id BETWEEN 2 AND 9),
            |q AS (SELECT vec_id AS qid, emb AS qemb FROM e WHERE vec_id BETWEEN 10 AND 29),
            |sc AS (SELECT q.qid, v.vec_id, ${sqlCosine("v.emb", "q.qemb")} AS c
            |       FROM e v, q WHERE v.vec_id <> q.qid),
            |ex AS (SELECT qid, vec_id FROM (
            |    SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY c DESC, vec_id) AS rn FROM sc)
            |  WHERE rn <= 10),
            |ac AS (SELECT v.vec_id, c2.cid, ${sqlCosine("v.emb", "c2.cemb")} AS cc FROM e v, cent c2),
            |asg AS (SELECT vec_id, cid FROM (
            |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY cc DESC, cid) AS rn FROM ac)
            |  WHERE rn = 1),
            |pr AS (SELECT qid, cid FROM (
            |    SELECT q.qid, a.cid, row_number() OVER (PARTITION BY q.qid ORDER BY a.cc DESC, a.cid) AS rn
            |    FROM q JOIN ac a ON a.vec_id = q.qid)
            |  WHERE rn <= 2),
            |cand AS (SELECT s.qid, s.vec_id, s.c
            |  FROM sc s JOIN asg ON asg.vec_id = s.vec_id
            |  JOIN pr ON pr.qid = s.qid AND pr.cid = asg.cid),
            |iv AS (SELECT qid, vec_id FROM (
            |    SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY c DESC, vec_id) AS rn FROM cand)
            |  WHERE rn <= 10),
            |o AS (SELECT ex.qid, count(*) AS n FROM ex JOIN iv
            |  ON ex.qid = iv.qid AND ex.vec_id = iv.vec_id GROUP BY ex.qid)
            |SELECT q.qid, CAST(coalesce(o.n, 0) AS BIGINT) AS recall_at_10
            |FROM q LEFT JOIN o ON q.qid = o.qid ORDER BY q.qid""".stripMargin),
  )

  /** q372 — the index maintained BY the stream (q366's dual): epoch 0
    * builds the q359 layout in batch; epoch-1 docs arrive as a
    * rate-limited file stream whose every micro-batch APPENDS its band
    * buckets (capped members + true-count meta) inside `foreachBatch`;
    * the probe then reads the stream-maintained files. Liveness from
    * lifetime meta totals makes the answer invariant to micro-batch
    * granularity (see [[graft.streaming.StreamIndexMaintain]]), so the
    * oracle is still the from-scratch rebuild. */
  val q372 = QuerySpec(
    "q372_stream_index_maintain",
    (s, d) => graft.streaming.StreamIndexMaintain.runOnce(s, d),
    q342.oracle,
  )

  /** q375 — the IVF inverted file maintained BY the stream (q372's IVF
    * sibling, completing the lifecycle matrix): epoch-1 vectors arrive
    * as a rate-limited file stream, every micro-batch assigned against
    * the FROZEN quantizer and appended into its cluster partition dirs
    * inside `foreachBatch`; assignment is a pure per-vector function of
    * the frozen centroids, so micro-batch granularity cannot change the
    * files the probe prunes to (see
    * [[graft.streaming.StreamIvfMaintain]]). Oracle = q341's
    * from-scratch rebuild. */
  val q375 = QuerySpec(
    "q375_stream_ivf_maintain",
    (s, d) => graft.streaming.StreamIvfMaintain.runOnce(s, d),
    q341.oracle,
  )

  /** q475 — streaming CDC maintenance WITH DELETES (the verb q372/q375
    * stop short of, and q462's batch delete made streamable): the feed
    * is a change log — upsert batches carrying vectors, then a
    * tombstone batch carrying ONLY keys — applied per micro-batch
    * inside `foreachBatch`: upserts land replay-idempotently under
    * (cid, batch_id) dynamic overwrite; deletes locate victims via the
    * index's own id columns and dir-swap ONLY the affected partitions
    * (naturally replay-idempotent: a second pass finds nothing left).
    * See [[graft.streaming.StreamIvfCdc]]; kill-and-restart
    * exactly-once is pinned by Round8EdgeSpec. Oracle: q462's
    * from-scratch IVF on the reduced corpus + the zero erased-ids
    * audit — stream-deleted ≡ rebuilt-without-them. */
  val q475 = QuerySpec(
    "q475_stream_ivf_cdc_delete",
    (s, d) => graft.streaming.StreamIvfCdc.runOnce(s, d),
    q462.oracle,
  )

  /** q384 — IVF nprobe RECALL CURVE (q369 generalized from a point to
    * the tuning sweep): recall@10 and scanned-fraction for
    * nprobe ∈ {1,2,4,8} in one pass — the curve an index operator
    * reads to pick the probe budget. The candidate frame is built ONCE
    * with each vector's probe rank (≤8) attached; the four sweep
    * points are filters over that frame, so the corpus is scored
    * exactly once regardless of how many nprobe values the sweep
    * carries. Exact top-10 baseline shared across points. Aggregate
    * recall is exact integer ppm over 20 queries × 10 slots. */
  val q384 = QuerySpec(
    "q384_ivf_nprobe_sweep",
    (s, d) => {
      import s.implicits._
      val base = Tables.fanOut(Tables.embeddings(s, d), col("vec_id"))
        .select($"vec_id", asDouble($"embedding").as("emb"))
        .withColumn("nrm", l2Norm($"emb"))
      val cent = base.filter($"vec_id".between(2, 9))
        .select($"vec_id".as("cid"), $"emb".as("cemb"), $"nrm".as("cnrm"))
      val queries = base.filter($"vec_id".between(10, 29))
        .select($"vec_id".as("qid"), $"emb".as("qemb"), $"nrm".as("qnrm"))
      val wq = org.apache.spark.sql.expressions.Window
        .partitionBy($"qid").orderBy($"c".desc, $"vec_id")
      val exact = base.crossJoin(broadcast(queries))
        .filter($"vec_id" =!= $"qid")
        .withColumn("c", dot($"emb", $"qemb") / ($"nrm" * $"qnrm"))
        .withColumn("rn", row_number().over(wq))
        .filter($"rn" <= 10).select($"qid", $"vec_id")
      val assigned = base.crossJoin(broadcast(cent))
        .withColumn("cc", dot($"emb", $"cemb") / ($"nrm" * $"cnrm"))
        .groupBy($"vec_id")
        .agg(max_by($"cid", struct($"cc", -$"cid")).as("cid"),
          first($"emb").as("emb"), first($"nrm").as("nrm"))
      val wp = org.apache.spark.sql.expressions.Window
        .partitionBy($"qid").orderBy($"cc".desc, $"cid")
      val probeR = queries.crossJoin(broadcast(cent))
        .withColumn("cc", dot($"qemb", $"cemb") / ($"qnrm" * $"cnrm"))
        .withColumn("prn", row_number().over(wp))
        .filter($"prn" <= 8)
        .select($"qid", $"cid", $"prn", $"qemb", $"qnrm")
      val nps = Seq(1, 2, 4, 8).toDF("np")
      val cand = assigned.join(broadcast(probeR), Seq("cid"))
        .filter($"vec_id" =!= $"qid")
        .withColumn("c", dot($"emb", $"qemb") / ($"nrm" * $"qnrm"))
        .select($"qid", $"vec_id", $"c", $"prn")
        .crossJoin(broadcast(nps))
        .filter($"prn" <= $"np")
        .persist()
      try {
        val scanned = cand.groupBy($"np").agg(count(lit(1)).as("n_scanned"))
        val hits = cand.withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy($"np", $"qid").orderBy($"c".desc, $"vec_id")))
          .filter($"rn" <= 10)
          .join(exact, Seq("qid", "vec_id"), "left_semi")
          .groupBy($"np").agg(count(lit(1)).as("n_hits"))
        val nb = base.agg(count(lit(1)).as("n_base"))
        val out = nps.join(broadcast(hits), Seq("np"), "left")
          .join(broadcast(scanned), Seq("np"), "left")
          .crossJoin(broadcast(nb))
          .select($"np".cast("long").as("nprobe"),
            coalesce($"n_hits", lit(0L)).as("n_hits"),
            expr("coalesce(n_hits, 0L) * 1000000L div 200").as("recall_ppm"),
            expr("coalesce(n_scanned, 0L) * 1000000L div (20 * (n_base - 1))")
              .as("scanned_ppm"))
          .orderBy($"nprobe")
        Eager(out)
      } finally cand.unpersist(blocking = false)
    },
    Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
            |cent AS (SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id BETWEEN 2 AND 9),
            |q AS (SELECT vec_id AS qid, emb AS qemb FROM e WHERE vec_id BETWEEN 10 AND 29),
            |sc AS (SELECT q.qid, v.vec_id, ${sqlCosine("v.emb", "q.qemb")} AS c
            |       FROM e v, q WHERE v.vec_id <> q.qid),
            |ex AS (SELECT qid, vec_id FROM (
            |    SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY c DESC, vec_id) AS rn FROM sc)
            |  WHERE rn <= 10),
            |ac AS (SELECT v.vec_id, c2.cid, ${sqlCosine("v.emb", "c2.cemb")} AS cc FROM e v, cent c2),
            |asg AS (SELECT vec_id, cid FROM (
            |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY cc DESC, cid) AS rn FROM ac)
            |  WHERE rn = 1),
            |pr AS (SELECT qid, cid, rn AS prn FROM (
            |    SELECT q.qid, a.cid, row_number() OVER (PARTITION BY q.qid ORDER BY a.cc DESC, a.cid) AS rn
            |    FROM q JOIN ac a ON a.vec_id = q.qid)
            |  WHERE rn <= 8),
            |nps AS (SELECT unnest([1, 2, 4, 8]) AS np),
            |cand AS (SELECT n.np, s.qid, s.vec_id, s.c
            |  FROM sc s JOIN asg ON asg.vec_id = s.vec_id
            |  JOIN pr ON pr.qid = s.qid AND pr.cid = asg.cid
            |  JOIN nps n ON pr.prn <= n.np),
            |scn AS (SELECT np, count(*) AS n_scanned FROM cand GROUP BY np),
            |iv AS (SELECT np, qid, vec_id FROM (
            |    SELECT np, qid, vec_id, row_number() OVER (PARTITION BY np, qid ORDER BY c DESC, vec_id) AS rn FROM cand)
            |  WHERE rn <= 10),
            |h AS (SELECT iv.np, count(*) AS n_hits FROM iv JOIN ex
            |  ON ex.qid = iv.qid AND ex.vec_id = iv.vec_id GROUP BY iv.np),
            |nb AS (SELECT count(*) AS n_base FROM e)
            |SELECT CAST(n.np AS BIGINT) AS nprobe,
            |  CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
            |  CAST(coalesce(h.n_hits, 0) * 1000000 // 200 AS BIGINT) AS recall_ppm,
            |  CAST(coalesce(s2.n_scanned, 0) * 1000000 // (20 * ((SELECT n_base FROM nb) - 1)) AS BIGINT) AS scanned_ppm
            |FROM nps n LEFT JOIN h ON n.np = h.np LEFT JOIN scn s2 ON n.np = s2.np
            |ORDER BY nprobe""".stripMargin),
  )

  /** q388 — IVF quantizer-quality audit: a simplified (centroid-based)
    * silhouette per cluster over q28/q341's fixed 8-centroid assignment.
    * For every vector, a = cosine distance (1−cos) to its OWN argmax
    * centroid, b = distance to the nearest OTHER centroid; the
    * silhouette s = (b−a)/max(a,b) collapses to (c1−c2)/(1−c2) in
    * cosine terms (c1 ≥ c2, so max(a,b) = 1−c2). Per-cluster mean/min/
    * max s is the "is this quantizer worth probing?" health readout a
    * production IVF index ships beside the files q341 writes: clusters
    * whose mean s ≈ 0 buy no candidate pruning (probe must fan out),
    * strongly positive clusters prune hard.
    *
    * Scale: the classical silhouette is O(n²) (mean pairwise distance);
    * the centroid form is ONE corpus pass — broadcast the K centroids,
    * take per-vector top-2 cosines with a bounded K-element in-row sort
    * (no window shuffle: fanOut already partitions by vec_id), then a
    * K-row final agg. Cosines are sequential-fold doubles (bit-identical
    * to the oracle), the mean routes through [[Det.davg]] so partition
    * order can't move the hash. */
  val q388 = QuerySpec(
    "q388_ivf_silhouette",
    (s, d) => {
      import s.implicits._
      val base = Tables.embeddings(s, d)
        .select($"vec_id", asDouble($"embedding").as("emb"))
        .withColumn("nrm", l2Norm($"emb"))
      val e = Tables.fanOut(base, col("vec_id"))
      val cent = base.filter($"vec_id".between(2, 9))
        .select($"vec_id".as("cid"), $"emb".as("cemb"), $"nrm".as("cnrm"))
      // Top-2 centroids per vector: bounded 8-struct in-row sort on
      // (−c, cid) — c desc, ties lowest cid, same order as the oracle's
      // row_number() window.
      val top2 = e.crossJoin(broadcast(cent))
        .withColumn("c", dot($"emb", $"cemb") / ($"nrm" * $"cnrm"))
        .groupBy($"vec_id")
        .agg(slice(sort_array(collect_list(struct((-$"c").as("nc"), $"cid", $"c"))),
          1, 2).as("t2"))
        .select($"vec_id", $"t2"(0)("cid").as("cid1"),
          $"t2"(0)("c").as("c1"), $"t2"(1)("c").as("c2"))
      top2
        .withColumn("sil", when($"c1" === $"c2", lit(0.0))
          .otherwise(($"c1" - $"c2") / (lit(1.0) - $"c2")))
        .groupBy($"cid1".as("cluster_id"))
        .agg(count(lit(1)).as("n_members"),
          round(davg($"sil", 12), 6).as("mean_sil"),
          round(min($"sil"), 6).as("min_sil"),
          round(max($"sil"), 6).as("max_sil"))
        .orderBy($"cluster_id")
    },
    Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
            |cent AS (SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id BETWEEN 2 AND 9),
            |sc AS (SELECT v.vec_id, c2.cid, ${sqlCosine("v.emb", "c2.cemb")} AS c FROM e v, cent c2),
            |rk AS (SELECT vec_id, cid, c,
            |         row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cid) AS rn FROM sc),
            |tv AS (SELECT vec_id,
            |         max(CASE WHEN rn = 1 THEN c END) AS c1,
            |         max(CASE WHEN rn = 1 THEN cid END) AS cid1,
            |         max(CASE WHEN rn = 2 THEN c END) AS c2
            |       FROM rk WHERE rn <= 2 GROUP BY vec_id),
            |sil AS (SELECT vec_id, cid1,
            |          CASE WHEN c1 = c2 THEN 0.0 ELSE (c1 - c2) / (1.0 - c2) END AS sil
            |        FROM tv)
            |SELECT cid1 AS cluster_id, CAST(count(*) AS BIGINT) AS n_members,
            |  round(${sqlDavg("sil", 12)}, 6) AS mean_sil,
            |  round(min(sil), 6) AS min_sil, round(max(sil), 6) AS max_sil
            |FROM sil GROUP BY 1 ORDER BY 1""".stripMargin),
  )

  /** q480 — streaming CDC maintenance of the LSH index WITH DELETES
    * (q475's verb for the band-bucket family, carrying q467's
    * RESURRECTION subtlety into micro-batch delivery): upsert batches
    * append signature log + capped members + per-batch meta; a
    * tombstone batch records ids, writes a NEGATIVE meta epoch (q466's
    * negative-stat discipline), and recomputes the full member lists of
    * buckets the delete pulled back under cap from the deduped log —
    * members the appends never wrote. The probe masks deleted ids and
    * re-caps from lifetime meta totals. Every step replay-idempotent
    * (see [[graft.streaming.StreamLshCdc]]); kill-and-restart
    * exactly-once pinned by Round9EdgeSpec. Oracle: q467's from-scratch
    * rebuild on the reduced corpus + the zero erased-visible audit. */
  val q480 = QuerySpec(
    "q480_stream_lsh_cdc_delete",
    (s, d) => graft.streaming.StreamLshCdc.runOnce(s, d),
    q467.oracle,
  )

  val all: Seq[QuerySpec] =
    Seq(q341, q342, q359, q360, q361, q362, q366, q369, q372, q375, q384,
      q388, q462, q465, q467, q475, q480)
}
