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
        def sigs(df: DataFrame) = df
          .select($"doc_id", shingles3("t").as("sh"))
          .select($"doc_id",
            saltedHashes("sh", 0).as("h0"), saltedHashes("sh", 1).as("h1"))
          .select($"doc_id", explode(sequence(lit(0), lit(B - 1))).as("b"), $"h0", $"h1")
          .select($"doc_id", $"b",
            concat(chunkMin("h0", "b"), lit("|"), chunkMin("h1", "b")).as("band_key"))
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

  val all: Seq[QuerySpec] = Seq(q341, q342)
}
