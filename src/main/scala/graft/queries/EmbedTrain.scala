package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorOps._
import graft.operators.StableIds
import Det._

/** Contrastive-training data preparation (round-6 family, q352–q358):
  * the operators that sit between a deduplicated corpus and an
  * embedding-model training run — hard-negative mining, deterministic
  * negative sampling, duplication-aware repeat schedules, batch-padding
  * economics, snapshot drift monitoring, positive-pair construction,
  * and near-dup split-leakage audits. Everything a
  * retrieval/contrastive fine-tune pipeline asks of the corpus store,
  * expressed as bounded Spark plans with full DuckDB value oracles.
  *
  * Scale design (100 TB): no query ever pairs the corpus quadratically.
  * Candidate generation is IVF-bucketed (q352) or dup-cluster-chained
  * (q357, linear in cluster size); the sampling domains (q353) are
  * broadcast-sized; global orders (q355) go through
  * [[graft.operators.StableIds]] instead of a single-partition window;
  * the drift monitor (q356) reduces to a (label × snapshot × dim)-sized
  * aggregate — dims are constants, so the post-shuffle frames are tiny.
  * Float determinism follows the [[Det]] discipline: cosines are the
  * same seeded left-folds on both engines, means/sums of doubles route
  * through exact DECIMAL accumulators.
  */
object EmbedTrain {

  /** Same hash-split membership as q60/q211 (TrainPrep.splitOf): first
    * two hex chars of md5(doc_id) — deterministic, growth-stable. */
  private def splitOf(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val bucket = substring(md5(id.cast("string").cast("binary")), 1, 2)
    when(bucket < "cd", "train").when(bucket < "e6", "val").otherwise("test")
  }

  /** Per-IVF-bucket negative-pool cap for q352. Chosen well above any
    * real bucket at the tested SFs (sf0.1 buckets average ~250, sf1
    * ~2500 over 8 centroids — the cap bites only the sf1 tail), so the
    * graded results are unchanged, while the DEGENERATE corpus — every
    * vector in one bucket — is bounded by construction: pool state is
    * O(cap) per bucket ([[graft.functions.BottomKLong]]) and pair
    * volume is O(n·cap), never n². The cap is mirrored EXACTLY in the
    * DuckDB oracle (`row_number() OVER (PARTITION BY cid ORDER BY
    * vec_id) <= cap`), because bottom-k-by-id is a deterministic
    * function of the bucket — unlike [[graft.functions.CollectCapped]]
    * whose oversize subset depends on partitioning. */
  val MaxIvfPool = 1024

  /** q352's mining core, parameterized by the pool cap so the
    * degenerate-corpus spec can exercise a small cap directly:
    * `assigned` is (cid, vec_id, label, emb, nrm) — one row per vector
    * with its IVF bucket; negatives for each anchor are the 3
    * most-cosine-similar OTHER-label vectors drawn from the bucket's
    * capped pool (the `cap` lowest vec_ids). */
  def hardNegatives(s: org.apache.spark.sql.SparkSession,
      assigned: org.apache.spark.sql.DataFrame, cap: Int): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val bottomK = udaf(graft.functions.BottomKLong(cap))
    val pool = assigned.groupBy($"cid")
      .agg(bottomK($"vec_id").as("pool"))
      .select($"cid", explode($"pool").as("vec_id"))
    val a = assigned.select($"cid", $"vec_id".as("anchor_id"),
      $"label".as("la"), $"emb".as("ea"), $"nrm".as("na"))
    val b = assigned.join(pool, Seq("cid", "vec_id"))
      .select($"cid", $"vec_id".as("neg_id"),
        $"label".as("lb"), $"emb".as("eb"), $"nrm".as("nb"))
    val w = Window.partitionBy($"anchor_id").orderBy($"cos".desc, $"neg_id")
    a.join(b, Seq("cid"))
      .filter($"la" =!= $"lb")
      .withColumn("cos", dot($"ea", $"eb") / ($"na" * $"nb"))
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 3)
      .select($"anchor_id", $"rnk", $"neg_id", round($"cos", 4).as("cos_sim"))
      .orderBy($"anchor_id", $"rnk")
  }

  /** q352 — hard-negative mining for contrastive training: for every
    * anchor vector, the 3 most-similar vectors with a DIFFERENT label
    * ("hard" negatives — close in embedding space, wrong by label).
    * Candidates come from q28's IVF coarse quantizer (8 fixed
    * centroids, vec_id 2–9): vectors are bucketed by nearest centroid
    * once, and negatives are mined per bucket against that bucket's
    * CAPPED candidate pool ([[MaxIvfPool]] lowest vec_ids, bounded-state
    * [[graft.functions.BottomKLong]]) — a bucket equi-join whose pair
    * volume is O(n·cap) by construction, enforced rather than assumed:
    * a degenerate corpus that assigns everything to one centroid still
    * completes linearly (EmbedTrainEdgeSpec pins this). The per-anchor
    * top-k is a bounded window over the join's output; the broadcast
    * side is always the K-row centroid frame. */
  val q352 = QuerySpec(
    "q352_hard_negative_mining",
    (s, d) => {
      import s.implicits._
      val base = Tables.fanOut(Tables.embeddings(s, d), col("vec_id"))
        .select($"vec_id", $"label", asDouble($"embedding").as("emb"))
        .withColumn("nrm", l2Norm($"emb"))
      val cent = base.filter($"vec_id".between(2, 9))
        .select($"vec_id".as("cid"), $"emb".as("cemb"), $"nrm".as("cnrm"))
      // One assignment pass: argmax cosine, ties to the lower cid.
      val assigned = base.crossJoin(broadcast(cent))
        .withColumn("c", dot($"emb", $"cemb") / ($"nrm" * $"cnrm"))
        .groupBy($"vec_id")
        .agg(max_by($"cid", struct($"c", -$"cid")).as("cid"),
          first($"label").as("label"), first($"emb").as("emb"),
          first($"nrm").as("nrm"))
      hardNegatives(s, assigned, MaxIvfPool)
    },
    Some(s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
            |cent AS (SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id BETWEEN 2 AND 9),
            |assign AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cid) AS rn
            |           FROM (SELECT v.vec_id, c2.cid, ${sqlCosine("v.emb", "c2.cemb")} AS c FROM e v, cent c2)),
            |m AS (SELECT a.vec_id, a.cid, e.label, e.emb FROM assign a JOIN e ON a.vec_id = e.vec_id WHERE a.rn = 1),
            |pool AS (SELECT cid, vec_id FROM (
            |    SELECT cid, vec_id, row_number() OVER (PARTITION BY cid ORDER BY vec_id) AS pr FROM m)
            |  WHERE pr <= $MaxIvfPool),
            |p AS (SELECT x.vec_id AS anchor_id, y.vec_id AS neg_id, ${sqlCosine("x.emb", "y.emb")} AS c
            |      FROM m x JOIN m y ON x.cid = y.cid AND x.label <> y.label
            |      JOIN pool ON pool.cid = y.cid AND pool.vec_id = y.vec_id),
            |r AS (SELECT anchor_id, neg_id, c, row_number() OVER (PARTITION BY anchor_id ORDER BY c DESC, neg_id) AS rnk FROM p)
            |SELECT anchor_id, CAST(rnk AS INT) AS rnk, neg_id, round(c, 4) AS cos_sim
            |FROM r WHERE rnk <= 3 ORDER BY anchor_id, rnk""".stripMargin),
  )

  /** q353 — deterministic negative sampling for link prediction:
    * positives are the observed (user, event_type, iso-weekday)
    * interactions; the candidate domain is the type × weekday grid
    * (broadcast-sized — 5×7 here, rarely more than thousands in
    * practice); negatives are the per-user unobserved cells, and each
    * user deterministically draws 2 by salted-md5 rank — the same
    * growth-stable membership discipline as q60/q65 (re-running on a
    * grown corpus never reshuffles an existing user's draw unless that
    * user's own positives changed). One shuffle on user_id; the domain
    * broadcasts. Weekday is ISO Monday=1 on BOTH engines (Spark
    * weekday()+1, DuckDB isodow) — dayofweek() is Sunday-based in Spark
    * and Sunday=0 in DuckDB, a documented dialect trap. */
  val q353 = QuerySpec(
    "q353_negative_sampling",
    (s, d) => {
      import s.implicits._
      val pos = Tables.events(s, d)
        .select($"user_id", $"event_type", expr("weekday(ts) + 1").as("dw"))
        .distinct()
      val types = pos.select($"event_type").distinct()
      val grid = types.crossJoin(
        s.range(1, 8).select($"id".cast("int").as("dw")))
      val negs = pos.select($"user_id").distinct()
        .crossJoin(broadcast(grid))
        .join(pos, Seq("user_id", "event_type", "dw"), "left_anti")
        // coalesce keeps the rank key NULL-proof AND engine-identical:
        // Spark's concat_ws SKIPS a NULL field where DuckDB's || chain
        // propagates NULL into r (which then sorts NULLS FIRST in Spark
        // vs LAST in DuckDB) — with a schema-nullable event_type the two
        // engines would draw different negatives. Both sides render a
        // NULL type as '' so the md5 keys agree byte-for-byte.
        .withColumn("r",
          md5(concat_ws("|", $"user_id", coalesce($"event_type", lit("")),
            $"dw").cast("binary")))
      val w = Window.partitionBy($"user_id").orderBy($"r")
      negs.withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 2)
        .select($"user_id", $"rnk", $"event_type", $"dw")
        .orderBy($"user_id", $"rnk")
    },
    Some("""WITH pos AS (
           |  SELECT DISTINCT user_id, event_type, CAST(isodow(ts) AS INT) AS dw FROM events),
           |grid AS (
           |  SELECT event_type, CAST(g.dw AS INT) AS dw
           |  FROM (SELECT DISTINCT event_type FROM pos), generate_series(1, 7) AS g(dw)),
           |negs AS (
           |  SELECT u.user_id, grid.event_type, grid.dw,
           |    md5(u.user_id || '|' || coalesce(grid.event_type, '') || '|' || grid.dw) AS r
           |  FROM (SELECT DISTINCT user_id FROM pos) u, grid
           |  WHERE NOT EXISTS (SELECT 1 FROM pos
           |    WHERE pos.user_id = u.user_id AND pos.event_type = grid.event_type
           |      AND pos.dw = grid.dw)),
           |ranked AS (SELECT user_id, event_type, dw,
           |    row_number() OVER (PARTITION BY user_id ORDER BY r) AS rnk FROM negs)
           |SELECT user_id, CAST(rnk AS INT) AS rnk, event_type, dw
           |FROM ranked WHERE rnk <= 2 ORDER BY user_id, rnk""".stripMargin),
  )

  /** q354 — duplication-aware repeat schedule (the SlimPajama/Doremi
    * move): cluster by q350's 40-char fingerprint, keep one doc per
    * cluster, and repeat the keeper INVERSELY to its duplication —
    * unique docs get up-sampled (4 epochs), doubletons damped (2),
    * heavily-duplicated content capped at 1, so the effective token
    * mix stops over-weighting boilerplate. Per-source readout of raw
    * vs effective chars and the dup rows suppressed. One corpus-sized
    * aggregate to clusters, then a source-sized rollup. */
  val q354 = QuerySpec(
    "q354_dedup_repeat_schedule",
    (s, d) => {
      import s.implicits._
      val cl = Tables.fanOut(Tables.documents(s, d), col("doc_id"))
        .select(md5(substring(lower($"text"), 1, 40).cast("binary")).as("h"),
          $"doc_id", $"source", $"n_chars")
        .groupBy($"h")
        .agg(count(lit(1)).as("k"),
          min_by($"source", $"doc_id").as("src"),
          min_by($"n_chars", $"doc_id").as("keeper_chars"),
          sum($"n_chars").as("raw_chars"))
        .withColumn("rep",
          when($"k" === 1, 4L).when($"k" === 2, 2L).otherwise(1L))
      cl.groupBy($"src")
        .agg(count(lit(1)).as("n_keepers"),
          sum($"k" - 1).as("n_dups_suppressed"),
          sum($"raw_chars").as("raw_chars"),
          sum($"keeper_chars" * $"rep").as("effective_chars"),
          expr("sum(keeper_chars * rep) * 1000000L div sum(raw_chars)")
            .as("effective_ppm"))
        .orderBy($"src")
    },
    Some("""WITH cl AS (
           |  SELECT md5(substring(lower(text), 1, 40)) AS h, count(*) AS k,
           |    min_by(source, doc_id) AS src,
           |    min_by(n_chars, doc_id) AS keeper_chars,
           |    CAST(sum(n_chars) AS BIGINT) AS raw_chars
           |  FROM documents GROUP BY 1),
           |r AS (SELECT *, CASE WHEN k = 1 THEN 4 WHEN k = 2 THEN 2 ELSE 1 END AS rep FROM cl)
           |SELECT src, count(*) AS n_keepers,
           |  CAST(sum(k - 1) AS BIGINT) AS n_dups_suppressed,
           |  CAST(sum(raw_chars) AS BIGINT) AS raw_chars,
           |  CAST(sum(keeper_chars * rep) AS BIGINT) AS effective_chars,
           |  CAST(sum(keeper_chars * rep) * 1000000 // sum(raw_chars) AS BIGINT) AS effective_ppm
           |FROM r GROUP BY src ORDER BY src""".stripMargin),
  )

  /** q355 — batch-padding economics: fixed batches of 8 docs padded to
    * the batch max length, under two batching orders — arrival
    * (doc_id) vs length-sorted. The length-sort classically collapses
    * padding waste; this query quantifies the payoff in exact ppm.
    * Both global orders go through [[StableIds.withGlobalRowIds]]
    * (range-repartition + per-partition offsets) — the naive
    * `row_number() OVER (ORDER BY …)` with no partition key funnels
    * the corpus through ONE task and is exactly the anti-pattern this
    * operator exists to avoid at 100 TB. */
  val q355 = QuerySpec(
    "q355_padding_waste_audit",
    (s, d) => {
      import s.implicits._
      val docs = Tables.fanOut(Tables.documents(s, d), col("doc_id"))
        .select($"doc_id", $"n_chars")
      def waste(ordered: org.apache.spark.sql.DataFrame, strategy: String) =
        ordered
          .withColumn("batch", expr("row_id div 8"))
          .groupBy($"batch")
          .agg(max($"n_chars").as("mx"), sum($"n_chars").as("tot"),
            count(lit(1)).as("n"))
          .agg(count(lit(1)).as("n_batches"),
            sum($"mx" * $"n" - $"tot").as("waste_chars"),
            expr("sum(mx * n - tot) * 1000000L div sum(mx * n)").as("waste_ppm"))
          .select(lit(strategy).as("strategy"), $"n_batches", $"waste_chars",
            $"waste_ppm")
      waste(StableIds.withGlobalRowIds(docs, 8, $"doc_id"), "arrival")
        .unionAll(
          waste(StableIds.withGlobalRowIds(docs, 8, $"n_chars", $"doc_id"),
            "length_sorted"))
        .orderBy($"strategy")
    },
    Some("""WITH arrival AS (
           |  SELECT n_chars, (row_number() OVER (ORDER BY doc_id) - 1) // 8 AS batch
           |  FROM documents),
           |srt AS (
           |  SELECT n_chars, (row_number() OVER (ORDER BY n_chars, doc_id) - 1) // 8 AS batch
           |  FROM documents),
           |wa AS (SELECT batch, max(n_chars) AS mx, sum(n_chars) AS tot, count(*) AS n
           |       FROM arrival GROUP BY batch),
           |ws AS (SELECT batch, max(n_chars) AS mx, sum(n_chars) AS tot, count(*) AS n
           |       FROM srt GROUP BY batch)
           |SELECT 'arrival' AS strategy, count(*) AS n_batches,
           |  CAST(sum(mx * n - tot) AS BIGINT) AS waste_chars,
           |  CAST(sum(mx * n - tot) * 1000000 // sum(mx * n) AS BIGINT) AS waste_ppm
           |FROM wa
           |UNION ALL
           |SELECT 'length_sorted', count(*),
           |  CAST(sum(mx * n - tot) AS BIGINT),
           |  CAST(sum(mx * n - tot) * 1000000 // sum(mx * n) AS BIGINT)
           |FROM ws
           |ORDER BY strategy""".stripMargin),
  )

  /** q356 — embedding centroid drift between corpus snapshots: split
    * the store into two snapshots (vec_id parity — stand-in for "last
    * month's index build vs this month's"), compute each label's mean
    * vector per snapshot, and report the squared L2 distance between
    * the two centroids — the "did the embedding space move under this
    * label" monitor that gates index rebuilds. All float math follows
    * the [[Det]] discipline: per-dimension means are exact-DECIMAL
    * sums divided by counts, and the 64-term drift sum routes through
    * DECIMAL again — bit-identical on both engines regardless of
    * shuffle order. The corpus-sized pass is one (label × snapshot ×
    * dim) aggregate; everything after is label×dim-sized. */
  val q356 = QuerySpec(
    "q356_centroid_drift",
    (s, d) => {
      import s.implicits._
      val x = Tables.fanOut(Tables.embeddings(s, d), col("vec_id"))
        .select($"label", ($"vec_id" % 2).as("snap"),
          posexplode(asDouble($"embedding")).as(Seq("pos", "x")))
      val m = x.groupBy($"label", $"snap", $"pos")
        .agg(davg($"x", 12).as("m"), count(lit(1)).as("n"))
      val piv = m.groupBy($"label", $"pos")
        .agg(max(when($"snap" === 0, $"m")).as("m0"),
          max(when($"snap" === 1, $"m")).as("m1"),
          max(when($"snap" === 0, $"n")).as("n0"),
          max(when($"snap" === 1, $"n")).as("n1"))
      piv
        .withColumn("d2", ($"m0" - $"m1") * ($"m0" - $"m1"))
        .groupBy($"label")
        .agg(max($"n0").as("n_snap0"), max($"n1").as("n_snap1"),
          round(dsum($"d2", 18), 6).as("drift_sq"))
        .orderBy($"label")
    },
    Some(s"""WITH x AS (
            |  SELECT label, vec_id % 2 AS snap,
            |    unnest(generate_series(1, len(embedding))) AS pos,
            |    CAST(unnest(embedding) AS DOUBLE) AS x
            |  FROM embeddings),
            |m AS (SELECT label, snap, pos, ${sqlDavg("x", 12)} AS m, count(*) AS n
            |      FROM x GROUP BY 1, 2, 3),
            |piv AS (SELECT label, pos,
            |    max(CASE WHEN snap = 0 THEN m END) AS m0,
            |    max(CASE WHEN snap = 1 THEN m END) AS m1,
            |    max(CASE WHEN snap = 0 THEN n END) AS n0,
            |    max(CASE WHEN snap = 1 THEN n END) AS n1
            |  FROM m GROUP BY 1, 2)
            |SELECT label, max(n0) AS n_snap0, max(n1) AS n_snap1,
            |  round(${sqlDsum("(m0 - m1) * (m0 - m1)", 18)}, 6) AS drift_sq
            |FROM piv GROUP BY label ORDER BY label""".stripMargin),
  )

  /** q357 — positive-pair construction from dup clusters: near-exact
    * duplicates (same 40-char fingerprint) make free contrastive
    * POSITIVES — same content, independent copies. Pairs are chained
    * along the doc_id order inside each cluster (lead over the
    * cluster window), so a k-cluster emits k−1 pairs — LINEAR in
    * cluster size, never the |k|² all-pairs blowup; the window
    * partitions on the fingerprint, so state is bounded by the
    * largest cluster (capped upstream by the dedup caps at real
    * scale). */
  val q357 = QuerySpec(
    "q357_anchor_positive_pairs",
    (s, d) => {
      import s.implicits._
      val docs = Tables.fanOut(Tables.documents(s, d), col("doc_id"))
        .select(md5(substring(lower($"text"), 1, 40).cast("binary")).as("h"),
          $"doc_id", $"source")
      val w = Window.partitionBy($"h").orderBy($"doc_id")
      docs
        .withColumn("doc_b", lead($"doc_id", 1).over(w))
        .withColumn("src_b", lead($"source", 1).over(w))
        .filter($"doc_b".isNotNull)
        .select($"h", $"doc_id".as("doc_a"), $"doc_b",
          ($"source" === $"src_b").as("same_source"))
        .orderBy($"doc_a", $"doc_b")
    },
    Some("""WITH f AS (
           |  SELECT md5(substring(lower(text), 1, 40)) AS h, doc_id, source,
           |    lead(doc_id) OVER (PARTITION BY md5(substring(lower(text), 1, 40)) ORDER BY doc_id) AS doc_b,
           |    lead(source) OVER (PARTITION BY md5(substring(lower(text), 1, 40)) ORDER BY doc_id) AS src_b
           |  FROM documents)
           |SELECT h, doc_id AS doc_a, doc_b, source = src_b AS same_source
           |FROM f WHERE doc_b IS NOT NULL ORDER BY doc_a, doc_b""".stripMargin),
  )

  /** q358 — near-dup split leakage: q351 catches exact-user leakage
    * across temporal splits; this catches the subtler one — a doc in
    * eval whose near-duplicate sits in train (the model has "seen" the
    * eval answer). Clusters come from the 40-char fingerprint, split
    * membership from q60's hash split; a cluster spanning train and a
    * held-out split is leaked, and every held-out doc in it is a
    * contaminated eval row. Single-row audit: cluster counts, held-out
    * doc counts, leak ppm. Two corpus-sized aggregates, both
    * fingerprint-keyed. */
  val q358 = QuerySpec(
    "q358_split_leakage_neardup",
    (s, d) => {
      import s.implicits._
      val cl = Tables.fanOut(Tables.documents(s, d), col("doc_id"))
        .select(md5(substring(lower($"text"), 1, 40).cast("binary")).as("h"),
          splitOf($"doc_id").as("split"))
        .groupBy($"h")
        .agg(
          sum(when($"split" === "train", 1L).otherwise(0L)).as("n_train"),
          sum(when($"split" =!= "train", 1L).otherwise(0L)).as("n_heldout"))
      cl.agg(
        count(lit(1)).as("n_clusters"),
        sum(when($"n_train" > 0 && $"n_heldout" > 0, 1L).otherwise(0L))
          .as("n_leaked_clusters"),
        sum($"n_heldout").as("n_heldout_docs"),
        sum(when($"n_train" > 0, $"n_heldout").otherwise(0L))
          .as("n_leaked_docs"))
        .withColumn("leak_ppm",
          expr("n_leaked_docs * 1000000L div nullif(n_heldout_docs, 0L)"))
    },
    Some("""WITH cl AS (
           |  SELECT md5(substring(lower(text), 1, 40)) AS h,
           |    sum(CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
           |        THEN 1 ELSE 0 END) AS n_train,
           |    sum(CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
           |        THEN 0 ELSE 1 END) AS n_heldout
           |  FROM documents GROUP BY 1)
           |SELECT count(*) AS n_clusters,
           |  CAST(sum(CASE WHEN n_train > 0 AND n_heldout > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_leaked_clusters,
           |  CAST(sum(n_heldout) AS BIGINT) AS n_heldout_docs,
           |  CAST(sum(CASE WHEN n_train > 0 THEN n_heldout ELSE 0 END) AS BIGINT) AS n_leaked_docs,
           |  CAST(sum(CASE WHEN n_train > 0 THEN n_heldout ELSE 0 END) * 1000000
           |    // nullif(sum(n_heldout), 0) AS BIGINT) AS leak_ppm
           |FROM cl""".stripMargin),
  )

  /** q371 — length-bucketed batching efficiency: the practical middle
    * ground q355's two extremes bracket. A full length-sort minimizes
    * padding but destroys the shuffle randomness SGD needs; real
    * pipelines split the corpus into Q equal-frequency length buckets
    * and batch WITHIN buckets in shuffled order. This query sweeps
    * Q ∈ {1, 4, 16, 64} (Q=1 ≡ pure shuffled batching) and reports the
    * exact padding-waste ppm at each point — the curve a batching
    * config is chosen from. Both global orders (the length rank that
    * defines buckets, and the per-bucket shuffled order) go through
    * [[StableIds]] — dense ids from range partitions + offsets, never
    * a single-partition `row_number() OVER (ORDER BY …)`; the
    * per-bucket shuffle order falls out of ONE global (bucket, md5)
    * sort with per-bucket offsets joined back from a Q-row broadcast
    * frame. The deterministic md5 "shuffle" makes the curve itself the
    * reproducible contract on both engines. */
  val q371 = QuerySpec(
    "q371_bucketed_batching_curve",
    (s, d) => {
      import s.implicits._
      val docs = Tables.fanOut(Tables.documents(s, d), col("doc_id"))
        .select($"doc_id", $"n_chars",
          expr("md5(CAST(doc_id AS STRING))").as("shuf"))
      val ranked = StableIds.withGlobalRowIds(docs, 8, $"n_chars", $"doc_id")
        .withColumnRenamed("row_id", "len_rank")
      val base = ranked.crossJoin(
        broadcast(docs.agg(count(lit(1)).as("n_total"))))
      def curve(q: Int) = {
        val b = base
          .withColumn("bucket", expr(s"len_rank * ${q}L div n_total"))
          .select($"bucket", $"shuf", $"doc_id", $"n_chars")
        val ids = StableIds.withGlobalRowIds(b, 8, $"bucket", $"shuf", $"doc_id")
        val off = ids.groupBy($"bucket").agg(min($"row_id").as("off"))
        ids.join(broadcast(off), Seq("bucket"))
          .withColumn("batch", expr("(row_id - off) div 8"))
          .groupBy($"bucket", $"batch")
          .agg(max($"n_chars").as("mx"), sum($"n_chars").as("tot"),
            count(lit(1)).as("n"))
          .agg(count(lit(1)).as("n_batches"),
            sum($"mx" * $"n" - $"tot").as("waste_chars"),
            expr("sum(mx * n - tot) * 1000000L div sum(mx * n)")
              .as("waste_ppm"))
          .select(lit(q.toLong).as("n_buckets"), $"n_batches",
            $"waste_chars", $"waste_ppm")
      }
      Seq(1, 4, 16, 64).map(curve).reduce(_ unionAll _).orderBy($"n_buckets")
    },
    Some {
      def block(q: Int) =
        s"""SELECT CAST($q AS BIGINT) AS n_buckets, count(*) AS n_batches,
           |  CAST(sum(mx * n - tot) AS BIGINT) AS waste_chars,
           |  CAST(sum(mx * n - tot) * 1000000 // sum(mx * n) AS BIGINT) AS waste_ppm
           |FROM (
           |  SELECT bucket, batch, max(n_chars) AS mx, sum(n_chars) AS tot,
           |    count(*) AS n
           |  FROM (
           |    SELECT bucket, n_chars,
           |      (row_number() OVER (PARTITION BY bucket
           |         ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1) // 8 AS batch
           |    FROM (
           |      SELECT doc_id, n_chars,
           |        (row_number() OVER (ORDER BY n_chars, doc_id) - 1) * $q
           |          // (count(*) OVER ()) AS bucket
           |      FROM documents))
           |  GROUP BY 1, 2)""".stripMargin
      Seq(1, 4, 16, 64).map(block).mkString("", "\nUNION ALL\n",
        "\nORDER BY n_buckets")
    },
  )

  /** q399 — in-batch false-negative collision audit: contrastive
    * training treats every other in-batch example as a negative, so two
    * positive pairs drawn from the SAME dup cluster landing in one
    * batch poison each other (the "false negative" failure InfoNCE
    * losses are most sensitive to). Pairs are q357's linear chains over
    * the prefix-fingerprint clusters; batches are a 16-way salted-md5
    * hash of the anchor (q60's membership discipline — growth-stable,
    * no RNG state). Per batch: pair count, same-cluster pair-combos,
    * total pair-combos, collision ppm. All C(n,2) terms come from the
    * (batch, cluster) count frame — combos never materialize; the
    * readout that says "shuffle pairs across batches before training".
    * At this corpus's honest scale the answer is 0 ppm (clusters ≤2 at
    * sf0.1); the sf1 clone clusters light it up — by construction. */
  val q399 = QuerySpec(
    "q399_inbatch_collision_audit",
    (s, d) => {
      import s.implicits._
      val cl = Tables.fanOut(Tables.documents(s, d), col("doc_id"))
        .select($"doc_id", md5(substring(lower($"text"), 1, 40).cast("binary")).as("h"))
      val mem = cl
        .withColumn("k", count(lit(1)).over(Window.partitionBy($"h")))
        .filter($"k" >= 2)
        .withColumn("rn", row_number().over(Window.partitionBy($"h").orderBy($"doc_id")))
      val pairs = mem.as("a")
        .join(mem.as("b"), $"a.h" === $"b.h" && $"b.rn" === $"a.rn" + 1)
        .select($"a.h".as("h"), $"a.doc_id".as("anchor"))
      val hex = lit("0123456789abcdef")
      val bc = pairs
        .withColumn("batch",
          (instr(hex, substring(md5(concat(lit("b|"), $"anchor".cast("string")).cast("binary")), 1, 1)) - 1)
            .cast("long"))
        .groupBy($"batch", $"h").agg(count(lit(1)).as("n"))
      bc.groupBy($"batch")
        .agg(sum($"n").as("n_pairs"),
          sum(expr("n * (n - 1) div 2")).as("collision_combos"))
        .select($"batch", $"n_pairs", $"collision_combos",
          expr("n_pairs * (n_pairs - 1) div 2").as("total_combos"),
          expr("""collision_combos * 1000000
                 | div nullif(n_pairs * (n_pairs - 1) div 2, 0)""".stripMargin)
            .as("collision_ppm"))
        .orderBy($"batch")
    },
    Some("""WITH cl AS (SELECT doc_id, md5(substring(lower(text), 1, 40)) AS h FROM documents),
           |sz AS (SELECT h FROM cl GROUP BY h HAVING count(*) >= 2),
           |mem AS (SELECT cl.doc_id, cl.h, row_number() OVER (PARTITION BY cl.h ORDER BY cl.doc_id) AS rn
           |        FROM cl JOIN sz USING (h)),
           |pairs AS (SELECT a.h, a.doc_id AS anchor
           |          FROM mem a JOIN mem b ON a.h = b.h AND b.rn = a.rn + 1),
           |bat AS (SELECT h, anchor,
           |          CAST(strpos('0123456789abcdef', substr(md5('b|' || CAST(anchor AS VARCHAR)), 1, 1)) - 1 AS BIGINT) AS batch
           |        FROM pairs),
           |bc AS (SELECT batch, h, count(*) AS n FROM bat GROUP BY 1, 2),
           |per AS (SELECT batch, CAST(sum(n) AS BIGINT) AS n_pairs,
           |          CAST(sum(n * (n - 1) // 2) AS BIGINT) AS collision_combos
           |        FROM bc GROUP BY 1)
           |SELECT batch, n_pairs, collision_combos,
           |  CAST(n_pairs * (n_pairs - 1) // 2 AS BIGINT) AS total_combos,
           |  CAST(collision_combos * 1000000 // nullif(n_pairs * (n_pairs - 1) // 2, 0) AS BIGINT) AS collision_ppm
           |FROM per ORDER BY batch""".stripMargin),
  )

  /** q400 — contrastive training-manifest capstone: the family's ops
    * chained into ONE linear pipeline the way a production run ships
    * them — dup clusters → anchor/positive chains (q357) → slate
    * negatives (q353's slot discipline: a 64-keeper broadcast slate
    * ranked by cluster size, slot = 2-nibble anchor hash mod |slate|,
    * own-cluster hits wrap to the next slot so a triple can never
    * negative-sample its own cluster) → 16-way salted batch assignment
    * (q399) → per-batch manifest census (triples, clusters, distinct
    * negatives, wraps). Every stage is deterministic hash math; the
    * corpus is touched once to fingerprint, once to pair — the slate
    * and both modulus scalars broadcast. The wrap counter is the
    * self-collision telemetry: 0 on an honest corpus, nonzero exactly
    * when big clusters enter the slate (sf1's clones, by design). */
  val q400 = QuerySpec(
    "q400_contrastive_manifest",
    (s, d) => {
      import s.implicits._
      val hex = lit("0123456789abcdef")
      val cl = Tables.fanOut(Tables.documents(s, d), col("doc_id"))
        .select($"doc_id", md5(substring(lower($"text"), 1, 40).cast("binary")).as("h"))
      val ksz = cl.groupBy($"h").agg(count(lit(1)).as("k"), min($"doc_id").as("keeper"))
      val slate = ksz.orderBy($"k".desc, $"h").limit(64)
        .withColumn("slot",
          row_number().over(Window.orderBy($"k".desc, $"h")) - 1)
        .select($"h".as("sh"), $"keeper", $"slot".cast("long").as("slot"))
      val ns = slate.agg(count(lit(1)).as("n_slate"))
      val mem = cl
        .withColumn("k", count(lit(1)).over(Window.partitionBy($"h")))
        .filter($"k" >= 2)
        .withColumn("rn", row_number().over(Window.partitionBy($"h").orderBy($"doc_id")))
      val pairs = mem.as("a")
        .join(mem.as("b"), $"a.h" === $"b.h" && $"b.rn" === $"a.rn" + 1)
        .select($"a.h".as("h"), $"a.doc_id".as("anchor"), $"b.doc_id".as("positive"))
      val nib = (pos: Int) =>
        (instr(hex, substring(md5(concat(lit("n|"), $"anchor".cast("string")).cast("binary")), pos, 1)) - 1).cast("long")
      val tri = pairs
        .withColumn("slot0", nib(1) * 16 + nib(2))
        .crossJoin(broadcast(ns))
        .join(broadcast(slate.select($"slot".as("s1_slot"), $"sh".as("s1_h"), $"keeper".as("s1_keeper"))),
          expr("s1_slot = slot0 % n_slate"))
        .join(broadcast(slate.select($"slot".as("s2_slot"), $"keeper".as("s2_keeper"))),
          expr("s2_slot = (slot0 + 1) % n_slate"))
        .select($"h", $"anchor", $"positive",
          when($"s1_h" === $"h", $"s2_keeper").otherwise($"s1_keeper").as("negative"),
          when($"s1_h" === $"h", 1L).otherwise(0L).as("wrapped"))
      tri
        .withColumn("batch",
          (instr(hex, substring(md5(concat(lit("b|"), $"anchor".cast("string")).cast("binary")), 1, 1)) - 1)
            .cast("long"))
        .groupBy($"batch")
        .agg(count(lit(1)).as("n_triples"),
          countDistinct($"h").as("n_clusters"),
          countDistinct($"negative").as("n_distinct_negatives"),
          sum($"wrapped").as("n_wrapped"))
        .orderBy($"batch")
    },
    Some("""WITH cl AS (SELECT doc_id, md5(substring(lower(text), 1, 40)) AS h FROM documents),
           |ksz AS (SELECT h, count(*) AS k, min(doc_id) AS keeper FROM cl GROUP BY h),
           |slate AS (SELECT h, keeper, row_number() OVER (ORDER BY k DESC, h) - 1 AS slot
           |          FROM ksz ORDER BY k DESC, h LIMIT 64),
           |mem AS (SELECT cl.doc_id, cl.h, row_number() OVER (PARTITION BY cl.h ORDER BY cl.doc_id) AS rn
           |        FROM cl JOIN (SELECT h FROM ksz WHERE k >= 2) s USING (h)),
           |pairs AS (SELECT a.h, a.doc_id AS anchor, b.doc_id AS positive
           |          FROM mem a JOIN mem b ON a.h = b.h AND b.rn = a.rn + 1),
           |ns AS (SELECT count(*) AS n_slate FROM slate),
           |tri0 AS (SELECT pairs.h, pairs.anchor, pairs.positive,
           |           (CAST(strpos('0123456789abcdef', substr(md5('n|' || CAST(pairs.anchor AS VARCHAR)), 1, 1)) - 1 AS BIGINT) * 16
           |           + CAST(strpos('0123456789abcdef', substr(md5('n|' || CAST(pairs.anchor AS VARCHAR)), 2, 1)) - 1 AS BIGINT)) AS slot0
           |         FROM pairs),
           |tri AS (SELECT t.h, t.anchor, t.positive,
           |          CASE WHEN s1.h = t.h THEN s2.keeper ELSE s1.keeper END AS negative,
           |          CASE WHEN s1.h = t.h THEN 1 ELSE 0 END AS wrapped
           |        FROM tri0 t
           |        JOIN slate s1 ON s1.slot = t.slot0 % (SELECT n_slate FROM ns)
           |        JOIN slate s2 ON s2.slot = (t.slot0 + 1) % (SELECT n_slate FROM ns)),
           |bat AS (SELECT h, anchor, positive, negative, wrapped,
           |          CAST(strpos('0123456789abcdef', substr(md5('b|' || CAST(anchor AS VARCHAR)), 1, 1)) - 1 AS BIGINT) AS batch
           |        FROM tri)
           |SELECT batch, CAST(count(*) AS BIGINT) AS n_triples,
           |  CAST(count(DISTINCT h) AS BIGINT) AS n_clusters,
           |  CAST(count(DISTINCT negative) AS BIGINT) AS n_distinct_negatives,
           |  CAST(sum(wrapped) AS BIGINT) AS n_wrapped
           |FROM bat GROUP BY 1 ORDER BY 1""".stripMargin),
  )

  /** q422 — matryoshka (MRL) truncation-quality audit: can the 64-dim
    * store answer nearest-neighbor queries from just its PREFIX dims?
    * For 5 probe vectors and each prefix length k ∈ {8, 16, 32, 64},
    * rank the corpus by cosine over the first k dims and report the
    * truncated top-1 plus its top-5 overlap with the full-dim top-5 —
    * the curve that decides how far an MRL-style index can shrink its
    * vectors before recall pays. One corpus pass against a broadcast
    * 5-row probe frame, ×4 prefix lengths (linear, never pairwise);
    * per-(probe, k) top-5 is [[graft.functions.BottomKLong]] over
    * q404's order-encoded (cos_ppm, vec_id) key — O(5) state, no
    * corpus-sized window (vec_id must fit 32 bits; widen the shift at
    * wider id spaces). Cosines are the same seeded left-folds on both
    * engines over the same slices, quantized to ppm before ranking. */
  val q422 = QuerySpec(
    "q422_mrl_truncation_audit",
    (s, d) => {
      import s.implicits._
      val base = Tables.fanOut(Tables.embeddings(s, d), col("vec_id"))
        .select($"vec_id", asDouble($"embedding").as("emb"))
      val probes = base.filter($"vec_id" < 5)
        .select($"vec_id".as("pid"), $"emb".as("pemb"))
      val bottomK = udaf(graft.functions.BottomKLong(5))
      val sliced = base.crossJoin(broadcast(probes))
        .filter($"vec_id" =!= $"pid")
        .select($"pid", $"vec_id", $"emb", $"pemb",
          explode(array(lit(8), lit(16), lit(32), lit(64))).as("k"))
        .withColumn("ea", expr("slice(emb, 1, k)"))
        .withColumn("eb", expr("slice(pemb, 1, k)"))
        // Parenthesization must match the mirror EXACTLY: 10⁶·(dot/norm),
        // never (10⁶·dot)/norm — the two differ by an ulp at the cos=1.0
        // clone boundary and flip the floor (caught by the sf1 sweep).
        .withColumn("cos_ppm",
          floor(lit(1000000.0) * (dot($"ea", $"eb") / (l2Norm($"ea") * l2Norm($"eb"))))
            .cast("long"))
      val tops = sliced
        .select($"pid", $"k",
          ((lit(1000000L) - $"cos_ppm") * lit(4294967296L) + $"vec_id").as("key"))
        .groupBy($"pid", $"k")
        .agg(bottomK($"key").as("keys"))
        .select($"pid", $"k",
          expr("transform(keys, x -> x % 4294967296L)").as("ids"))
      val full = tops.filter($"k" === 64).select($"pid", $"ids".as("fids"))
      tops.join(broadcast(full), "pid")
        .select($"pid", $"k",
          element_at($"ids", 1).as("top1_id"),
          size(array_intersect($"ids", $"fids")).as("overlap5"))
        .orderBy($"pid", $"k")
    },
    Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
            |p AS (SELECT vec_id AS pid, emb AS pemb FROM e WHERE vec_id < 5),
            |ks(k) AS (VALUES (8), (16), (32), (64)),
            |sc AS (SELECT p.pid, ks.k, e.vec_id,
            |    CAST(floor(1000000.0 * ${sqlCosine("(e.emb[1:ks.k])", "(p.pemb[1:ks.k])")}) AS BIGINT) AS cos_ppm
            |  FROM e, p, ks WHERE e.vec_id <> p.pid),
            |r AS (SELECT pid, k, vec_id, row_number() OVER
            |    (PARTITION BY pid, k ORDER BY cos_ppm DESC, vec_id) AS rnk FROM sc),
            |t AS (SELECT pid, k, list(vec_id ORDER BY rnk) AS ids
            |  FROM r WHERE rnk <= 5 GROUP BY pid, k),
            |f AS (SELECT pid, ids AS fids FROM t WHERE k = 64)
            |SELECT t.pid, CAST(t.k AS INT) AS k, t.ids[1] AS top1_id,
            |  CAST(len(list_intersect(t.ids, f.fids)) AS INT) AS overlap5
            |FROM t JOIN f USING (pid) ORDER BY pid, k""".stripMargin),
  )

  /** q423 — mutual (reciprocal) k-NN pair mining: a candidate duplicate
    * pair survives only if EACH vector ranks in the OTHER's top-3 by
    * cosine — the classic precision filter over one-directional kNN
    * (a hub vector near everything stops flooding the candidate set,
    * because its victims don't rank IT back). Candidates come from the
    * same IVF bucketing + capped pool as q352 (8 broadcast centroids,
    * [[MaxIvfPool]] lowest-id pool via bounded-state
    * [[graft.functions.BottomKLong]] — pair volume O(n·cap), enforced
    * not assumed); directional top-3 is a window over the capped
    * candidate stream; mutuality is a self-join on the reversed pair,
    * emitted once with both directional ranks and the label-agreement
    * flag a semantic-dedup reviewer triages by. */
  val q423 = QuerySpec(
    "q423_mutual_knn_pairs",
    (s, d) => {
      import s.implicits._
      val base = Tables.fanOut(Tables.embeddings(s, d), col("vec_id"))
        .select($"vec_id", $"label", asDouble($"embedding").as("emb"))
        .withColumn("nrm", l2Norm($"emb"))
      val cent = base.filter($"vec_id".between(2, 9))
        .select($"vec_id".as("cid"), $"emb".as("cemb"), $"nrm".as("cnrm"))
      val assigned = base.crossJoin(broadcast(cent))
        .withColumn("c", dot($"emb", $"cemb") / ($"nrm" * $"cnrm"))
        .groupBy($"vec_id")
        .agg(max_by($"cid", struct($"c", -$"cid")).as("cid"),
          first($"label").as("label"), first($"emb").as("emb"),
          first($"nrm").as("nrm"))
      val bottomK = udaf(graft.functions.BottomKLong(MaxIvfPool))
      val pool = assigned.groupBy($"cid")
        .agg(bottomK($"vec_id").as("pool"))
        .select($"cid", explode($"pool").as("vec_id"))
      val a = assigned.select($"cid", $"vec_id".as("anchor"),
        $"label".as("la"), $"emb".as("ea"), $"nrm".as("na"))
      val b = assigned.join(pool, Seq("cid", "vec_id"))
        .select($"cid", $"vec_id".as("nbr"),
          $"label".as("lb"), $"emb".as("eb"), $"nrm".as("nb"))
      val w = Window.partitionBy($"anchor").orderBy($"cos_ppm".desc, $"nbr")
      val knn = a.join(b, Seq("cid"))
        .filter($"anchor" =!= $"nbr")
        // Same ulp discipline as q422: 10⁶·(dot/norm), mirror-identical.
        .withColumn("cos_ppm",
          floor(lit(1000000.0) * (dot($"ea", $"eb") / ($"na" * $"nb"))).cast("long"))
        .withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 3)
        .select($"anchor", $"nbr", $"rnk", $"cos_ppm", $"la", $"lb")
      knn.as("x")
        .join(knn.as("y"),
          $"x.anchor" === $"y.nbr" && $"x.nbr" === $"y.anchor"
            && $"x.anchor" < $"x.nbr")
        .select($"x.anchor".as("vec_a"), $"x.nbr".as("vec_b"),
          $"x.cos_ppm".as("cos_ppm"),
          $"x.rnk".cast("int").as("rank_ab"), $"y.rnk".cast("int").as("rank_ba"),
          ($"x.la" === $"x.lb").as("same_label"))
        .orderBy($"vec_a", $"vec_b")
    },
    Some(s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
            |cent AS (SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id BETWEEN 2 AND 9),
            |assign AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cid) AS rn
            |           FROM (SELECT v.vec_id, c2.cid, ${sqlCosine("v.emb", "c2.cemb")} AS c FROM e v, cent c2)),
            |m AS (SELECT a.vec_id, a.cid, e.label, e.emb FROM assign a JOIN e ON a.vec_id = e.vec_id WHERE a.rn = 1),
            |pool AS (SELECT cid, vec_id FROM (
            |    SELECT cid, vec_id, row_number() OVER (PARTITION BY cid ORDER BY vec_id) AS pr FROM m)
            |  WHERE pr <= $MaxIvfPool),
            |-- cosine is projected to a scalar BEFORE the window so the
            |-- 20M-pair frame entering the sort carries no 64-dim lists
            |-- (the inlined form OOMs DuckDB at sf1).
            |sc AS (SELECT x.vec_id AS anchor, y.vec_id AS nbr,
            |    x.label AS la, y.label AS lb,
            |    CAST(floor(1000000.0 * ${sqlCosine("x.emb", "y.emb")}) AS BIGINT) AS cos_ppm
            |  FROM m x JOIN m y ON x.cid = y.cid AND x.vec_id <> y.vec_id
            |  JOIN pool ON pool.cid = y.cid AND pool.vec_id = y.vec_id),
            |knn AS (SELECT anchor, nbr, rnk, cos_ppm, la, lb FROM (
            |  SELECT anchor, nbr, la, lb, cos_ppm,
            |    row_number() OVER (PARTITION BY anchor
            |      ORDER BY cos_ppm DESC, nbr) AS rnk
            |  FROM sc)
            |  WHERE rnk <= 3)
            |SELECT x.anchor AS vec_a, x.nbr AS vec_b, x.cos_ppm,
            |  CAST(x.rnk AS INT) AS rank_ab, CAST(y.rnk AS INT) AS rank_ba,
            |  x.la = x.lb AS same_label
            |FROM knn x JOIN knn y ON x.anchor = y.nbr AND x.nbr = y.anchor
            |WHERE x.anchor < x.nbr
            |ORDER BY vec_a, vec_b""".stripMargin),
  )

  /** q433 — confident-learning label-noise audit (the cleanlab recipe,
    * Northcutt et al.): estimate WHICH labels are wrong without any
    * external model — per-label mean-embedding centroids stand in for
    * class probabilities, per-class confidence thresholds t_c are the
    * mean SELF-class score, and the confident joint counts every vector
    * under (given label i, predicted class j) where j is its best class
    * among those clearing their own threshold. Off-diagonal mass IS the
    * estimated label-noise matrix a relabeling pass is prioritized by.
    * All scores are the identical quantized cosine folds (ppm) both
    * engines share; thresholds are exact integer division. One corpus
    * pass against a broadcast |labels|-row centroid frame; everything
    * after is (labels × labels)-sized. */
  val q433 = QuerySpec(
    "q433_label_noise_audit",
    (s, d) => {
      import s.implicits._
      val base = Tables.fanOut(Tables.embeddings(s, d), col("vec_id"))
        .select($"vec_id", $"label", asDouble($"embedding").as("emb"))
        .withColumn("nrm", l2Norm($"emb"))
      val cent = base
        .select($"label", posexplode($"emb").as(Seq("dim", "x")))
        .groupBy($"label", $"dim")
        .agg(davg($"x", 12).as("m"))
        .groupBy($"label")
        .agg(expr("transform(sort_array(collect_list(struct(dim, m))), s -> s.m)")
          .as("cemb"))
        .select($"label".as("cl"), $"cemb")
        .withColumn("cnrm", l2Norm($"cemb"))
      val sc = base.crossJoin(broadcast(cent))
        .withColumn("cos_ppm",
          floor(lit(1000000.0) * (dot($"emb", $"cemb") / ($"nrm" * $"cnrm")))
            .cast("long"))
        .select($"vec_id", $"label", $"cl", $"cos_ppm")
      val thr = sc.filter($"label" === $"cl")
        .groupBy($"cl").agg(expr("sum(cos_ppm) div count(1)").as("t"))
      sc.join(broadcast(thr), "cl")
        .filter($"cos_ppm" >= $"t")
        .groupBy($"vec_id", $"label")
        .agg(max_by($"cl", struct($"cos_ppm", -$"cl")).as("pred_label"))
        .groupBy($"label".as("given_label"), $"pred_label")
        .agg(count(lit(1)).as("n"))
        .withColumn("off_diagonal", $"given_label" =!= $"pred_label")
        .orderBy($"given_label", $"pred_label")
    },
    Some(s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
            |long AS (SELECT label,
            |    unnest(generate_series(1, len(emb))) AS pos,
            |    CAST(unnest(emb) AS DOUBLE) AS x
            |  FROM e),
            |cm AS (SELECT label, pos, ${sqlDavg("x", 12)} AS m
            |  FROM long GROUP BY label, pos),
            |cent AS (SELECT label AS cl, list(m ORDER BY pos) AS cemb
            |  FROM cm GROUP BY label),
            |sc AS (SELECT e.vec_id, e.label, c.cl,
            |    CAST(floor(1000000.0 * ${sqlCosine("e.emb", "c.cemb")}) AS BIGINT) AS cos_ppm
            |  FROM e, cent c),
            |thr AS (SELECT cl, sum(cos_ppm) // count(*) AS t
            |  FROM sc WHERE label = cl GROUP BY cl),
            |conf AS (SELECT vec_id, label, cl,
            |    row_number() OVER (PARTITION BY vec_id ORDER BY cos_ppm DESC, cl) AS rn
            |  FROM sc JOIN thr USING (cl) WHERE cos_ppm >= t)
            |SELECT label AS given_label, cl AS pred_label, count(*) AS n,
            |  label <> cl AS off_diagonal
            |FROM conf WHERE rn = 1
            |GROUP BY 1, 2 ORDER BY given_label, pred_label""".stripMargin),
  )

  /** q434 — near-dup cosine-threshold operating curve: at which cosine
    * does "near duplicate" start meaning something? The capped IVF
    * candidate stream (q423's generator, a<b each pair once) is scored
    * ONCE, and every τ ∈ {0.70, 0.80, 0.90, 0.95} reads its pair count
    * and label-agreement precision from conditional sums in that single
    * pass (q432's sweep discipline — no per-τ re-scan). The curve is
    * what a dedup-threshold config is chosen from: precision rises with
    * τ while yield collapses. */
  val q434 = QuerySpec(
    "q434_dedup_threshold_curve",
    (s, d) => {
      import s.implicits._
      val base = Tables.fanOut(Tables.embeddings(s, d), col("vec_id"))
        .select($"vec_id", $"label", asDouble($"embedding").as("emb"))
        .withColumn("nrm", l2Norm($"emb"))
      val cent = base.filter($"vec_id".between(2, 9))
        .select($"vec_id".as("cid"), $"emb".as("cemb"), $"nrm".as("cnrm"))
      val assigned = base.crossJoin(broadcast(cent))
        .withColumn("c", dot($"emb", $"cemb") / ($"nrm" * $"cnrm"))
        .groupBy($"vec_id")
        .agg(max_by($"cid", struct($"c", -$"cid")).as("cid"),
          first($"label").as("label"), first($"emb").as("emb"),
          first($"nrm").as("nrm"))
      val bottomK = udaf(graft.functions.BottomKLong(MaxIvfPool))
      val pool = assigned.groupBy($"cid")
        .agg(bottomK($"vec_id").as("pool"))
        .select($"cid", explode($"pool").as("vec_id"))
      val a = assigned.select($"cid", $"vec_id".as("va"),
        $"label".as("la"), $"emb".as("ea"), $"nrm".as("na"))
      val b = assigned.join(pool, Seq("cid", "vec_id"))
        .select($"cid", $"vec_id".as("vb"),
          $"label".as("lb"), $"emb".as("eb"), $"nrm".as("nb"))
      val scored = a.join(b, Seq("cid"))
        .filter($"va" < $"vb")
        .withColumn("cos_ppm",
          floor(lit(1000000.0) * (dot($"ea", $"eb") / ($"na" * $"nb"))).cast("long"))
        .withColumn("same", ($"la" === $"lb").cast("long"))
      def cnt(tau: Long) = sum(when($"cos_ppm" >= tau, 1L).otherwise(0L))
      def sm(tau: Long) = sum(when($"cos_ppm" >= tau, $"same").otherwise(0L))
      scored.agg(
        cnt(700000L).as("p70"), sm(700000L).as("s70"),
        cnt(800000L).as("p80"), sm(800000L).as("s80"),
        cnt(900000L).as("p90"), sm(900000L).as("s90"),
        cnt(950000L).as("p95"), sm(950000L).as("s95"))
        .select(expr(
          """stack(4, 700000L, p70, s70, 800000L, p80, s80,
            | 900000L, p90, s90, 950000L, p95, s95)
            | AS (tau_ppm, n_pairs, n_same_label)""".stripMargin
            .replaceAll("\n", "")))
        .withColumn("precision_ppm",
          expr("n_same_label * 1000000L div nullif(n_pairs, 0L)"))
        .orderBy($"tau_ppm")
    },
    Some(s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
            |cent AS (SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id BETWEEN 2 AND 9),
            |assign AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cid) AS rn
            |           FROM (SELECT v.vec_id, c2.cid, ${sqlCosine("v.emb", "c2.cemb")} AS c FROM e v, cent c2)),
            |m AS (SELECT a.vec_id, a.cid, e.label, e.emb FROM assign a JOIN e ON a.vec_id = e.vec_id WHERE a.rn = 1),
            |pool AS (SELECT cid, vec_id FROM (
            |    SELECT cid, vec_id, row_number() OVER (PARTITION BY cid ORDER BY vec_id) AS pr FROM m)
            |  WHERE pr <= $MaxIvfPool),
            |sc AS (SELECT CASE WHEN x.label = y.label THEN 1 ELSE 0 END AS same,
            |    CAST(floor(1000000.0 * ${sqlCosine("x.emb", "y.emb")}) AS BIGINT) AS cos_ppm
            |  FROM m x JOIN m y ON x.cid = y.cid AND x.vec_id < y.vec_id
            |  JOIN pool ON pool.cid = y.cid AND pool.vec_id = y.vec_id),
            |agg AS (SELECT
            |    CAST(sum(CASE WHEN cos_ppm >= 700000 THEN 1 ELSE 0 END) AS BIGINT) AS p70,
            |    CAST(sum(CASE WHEN cos_ppm >= 700000 THEN same ELSE 0 END) AS BIGINT) AS s70,
            |    CAST(sum(CASE WHEN cos_ppm >= 800000 THEN 1 ELSE 0 END) AS BIGINT) AS p80,
            |    CAST(sum(CASE WHEN cos_ppm >= 800000 THEN same ELSE 0 END) AS BIGINT) AS s80,
            |    CAST(sum(CASE WHEN cos_ppm >= 900000 THEN 1 ELSE 0 END) AS BIGINT) AS p90,
            |    CAST(sum(CASE WHEN cos_ppm >= 900000 THEN same ELSE 0 END) AS BIGINT) AS s90,
            |    CAST(sum(CASE WHEN cos_ppm >= 950000 THEN 1 ELSE 0 END) AS BIGINT) AS p95,
            |    CAST(sum(CASE WHEN cos_ppm >= 950000 THEN same ELSE 0 END) AS BIGINT) AS s95
            |  FROM sc),
            |u AS (
            |  SELECT CAST(700000 AS BIGINT) AS tau_ppm, p70 AS n_pairs, s70 AS n_same_label FROM agg
            |  UNION ALL SELECT 800000, p80, s80 FROM agg
            |  UNION ALL SELECT 900000, p90, s90 FROM agg
            |  UNION ALL SELECT 950000, p95, s95 FROM agg)
            |SELECT tau_ppm, n_pairs, n_same_label,
            |  CAST(n_same_label * 1000000 // nullif(n_pairs, 0) AS BIGINT) AS precision_ppm
            |FROM u ORDER BY tau_ppm""".stripMargin),
  )

  /** q457 — kNN-distance outlier scoring (the LOF-family's cheap
    * deterministic core): a vector whose 3rd-nearest neighbor is still
    * FAR is an out-of-distribution or corrupted embedding — the
    * curation screen value-based outlier tests (z-score/MAD) can't see,
    * because a broken vector's COORDINATES look normal while its
    * NEIGHBORHOOD is empty. Candidates come from the capped IVF pool
    * (q423's O(n·cap) generator); each anchor's 3rd-highest cosine is a
    * bounded window rank; outlier score = 10⁶ − that cosine (ppm). The
    * top-15 worst anchors with their labels are the review queue. */
  val q457 = QuerySpec(
    "q457_knn_outlier_score",
    (s, d) => {
      import s.implicits._
      val base = Tables.fanOut(Tables.embeddings(s, d), col("vec_id"))
        .select($"vec_id", $"label", asDouble($"embedding").as("emb"))
        .withColumn("nrm", l2Norm($"emb"))
      val cent = base.filter($"vec_id".between(2, 9))
        .select($"vec_id".as("cid"), $"emb".as("cemb"), $"nrm".as("cnrm"))
      val assigned = base.crossJoin(broadcast(cent))
        .withColumn("c", dot($"emb", $"cemb") / ($"nrm" * $"cnrm"))
        .groupBy($"vec_id")
        .agg(max_by($"cid", struct($"c", -$"cid")).as("cid"),
          first($"label").as("label"), first($"emb").as("emb"),
          first($"nrm").as("nrm"))
      val bottomK = udaf(graft.functions.BottomKLong(MaxIvfPool))
      val pool = assigned.groupBy($"cid")
        .agg(bottomK($"vec_id").as("pool"))
        .select($"cid", explode($"pool").as("vec_id"))
      val a = assigned.select($"cid", $"vec_id".as("anchor"),
        $"label".as("la"), $"emb".as("ea"), $"nrm".as("na"))
      val b = assigned.join(pool, Seq("cid", "vec_id"))
        .select($"cid", $"vec_id".as("nbr"), $"emb".as("eb"), $"nrm".as("nb"))
      val w = Window.partitionBy($"anchor").orderBy($"cos_ppm".desc, $"nbr")
      val nn3 = a.join(b, Seq("cid"))
        .filter($"anchor" =!= $"nbr")
        .withColumn("cos_ppm",
          floor(lit(1000000.0) * (dot($"ea", $"eb") / ($"na" * $"nb"))).cast("long"))
        .withColumn("rnk", row_number().over(w))
        .filter($"rnk" === 3)
        .select($"anchor".as("vec_id"), $"la".as("label"),
          $"cos_ppm".as("nn3_cos_ppm"),
          (lit(1000000L) - $"cos_ppm").as("outlier_score_ppm"))
      nn3.orderBy($"outlier_score_ppm".desc, $"vec_id").limit(15)
    },
    Some(s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
            |cent AS (SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id BETWEEN 2 AND 9),
            |assign AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cid) AS rn
            |           FROM (SELECT v.vec_id, c2.cid, ${sqlCosine("v.emb", "c2.cemb")} AS c FROM e v, cent c2)),
            |m AS (SELECT a.vec_id, a.cid, e.label, e.emb FROM assign a JOIN e ON a.vec_id = e.vec_id WHERE a.rn = 1),
            |pool AS (SELECT cid, vec_id FROM (
            |    SELECT cid, vec_id, row_number() OVER (PARTITION BY cid ORDER BY vec_id) AS pr FROM m)
            |  WHERE pr <= $MaxIvfPool),
            |sc AS (SELECT x.vec_id AS anchor, x.label AS la, y.vec_id AS nbr,
            |    CAST(floor(1000000.0 * ${sqlCosine("x.emb", "y.emb")}) AS BIGINT) AS cos_ppm
            |  FROM m x JOIN m y ON x.cid = y.cid AND x.vec_id <> y.vec_id
            |  JOIN pool ON pool.cid = y.cid AND pool.vec_id = y.vec_id),
            |nn3 AS (SELECT anchor AS vec_id, la AS label, cos_ppm AS nn3_cos_ppm,
            |    1000000 - cos_ppm AS outlier_score_ppm
            |  FROM (SELECT anchor, la, cos_ppm,
            |      row_number() OVER (PARTITION BY anchor ORDER BY cos_ppm DESC, nbr) AS rnk
            |    FROM sc) WHERE rnk = 3)
            |SELECT vec_id, label, nn3_cos_ppm,
            |  CAST(outlier_score_ppm AS BIGINT) AS outlier_score_ppm
            |FROM nn3 ORDER BY outlier_score_ppm DESC, vec_id LIMIT 15""".stripMargin),
  )

  val all: Seq[QuerySpec] =
    Seq(q352, q353, q354, q355, q356, q357, q358, q371, q399, q400, q422,
      q423, q433, q434, q457)
}
