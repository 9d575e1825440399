package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import Det._

/** Corpus-curation economics (round-7 family, q363–q365): the decisions
  * a training-data owner makes ABOVE the operator layer — how to split
  * a global token budget across sources, whether the embedding space
  * separates labels well enough to train against, and how much content
  * two sources share. Each reduces the corpus to a tiny frame (per
  * source / per label) in one or two shuffles, then does exact integer
  * or Det-deterministic arithmetic on that frame — the 100 TB cost is
  * the corpus-sized aggregate, never the decision math.
  *
  * Reference anchor: the reference pipeline stops at per-table ETL
  * (workflow-examples/pyspark-taxi-trip.py:34-52); these are the
  * curation-tier capabilities its architecture implies for an
  * LLM-corpus deployment (SURVEY §2.3 Tier C).
  */
object Curation {

  /** q363 — dedup-aware token-budget allocation with largest-remainder
    * rounding: a global budget of T=1,000,000 chars is split across
    * sources proportionally to their DEDUPLICATED cluster counts (raw
    * doc counts would let a source buy budget with boilerplate
    * duplicates), rounded to integers that sum to T EXACTLY via
    * largest remainder (float shares leak budget; q285's
    * apportionment discipline applied to corpus mixing), then capped
    * by each source's available deduplicated chars with the shortfall
    * reported. Two corpus-sized aggregates (doc→cluster, cluster→
    * source); everything after runs on a #sources-row frame. */
  val q363 = QuerySpec(
    "q363_token_budget_allocation",
    (s, d) => {
      import s.implicits._
      val T = 1000000L
      val cl = Tables.fanOut(Tables.documents(s, d), col("doc_id"))
        .select(md5(substring(lower($"text"), 1, 40).cast("binary")).as("h"),
          $"doc_id", $"source", $"n_chars")
        .groupBy($"h")
        .agg(min_by($"source", $"doc_id").as("src"),
          min_by($"n_chars", $"doc_id").as("keeper_chars"))
      val bySrc = cl.groupBy($"src")
        .agg(count(lit(1)).as("n_keepers"),
          sum($"keeper_chars").as("avail_chars"))
      // Tiny frame from here: broadcast the global totals, then one
      // #sources-row window for the remainder ranking.
      val tot = bySrc.agg(sum($"n_keepers").as("w_total"))
      val based = bySrc.crossJoin(broadcast(tot))
        .withColumn("base", expr(s"$T * n_keepers div w_total"))
        .withColumn("rem", expr(s"($T * n_keepers) % w_total"))
      val leftover = based.agg((lit(T) - sum($"base")).as("l"))
      val w = Window.orderBy($"rem".desc, $"src")
      val out = based.crossJoin(broadcast(leftover))
        .withColumn("extra",
          when(row_number().over(w) <= $"l", 1L).otherwise(0L))
        .withColumn("quota_chars", $"base" + $"extra")
        .withColumn("alloc_chars", least($"quota_chars", $"avail_chars"))
        .select($"src", $"n_keepers", $"avail_chars", $"quota_chars",
          $"alloc_chars",
          ($"quota_chars" - $"alloc_chars").as("shortfall_chars"))
        .orderBy($"src")
      out
    },
    Some("""WITH cl AS (
           |  SELECT md5(substring(lower(text), 1, 40)) AS h,
           |    min_by(source, doc_id) AS src,
           |    min_by(n_chars, doc_id) AS keeper_chars
           |  FROM documents GROUP BY 1),
           |bysrc AS (SELECT src, count(*) AS n_keepers,
           |    CAST(sum(keeper_chars) AS BIGINT) AS avail_chars
           |  FROM cl GROUP BY src),
           |based AS (SELECT *,
           |    CAST(1000000 * n_keepers // (SELECT sum(n_keepers) FROM bysrc) AS BIGINT) AS base,
           |    (1000000 * n_keepers) % (SELECT sum(n_keepers) FROM bysrc) AS rem
           |  FROM bysrc),
           |ranked AS (SELECT *,
           |    row_number() OVER (ORDER BY rem DESC, src) AS rnk,
           |    (SELECT 1000000 - sum(base) FROM based) AS leftover
           |  FROM based),
           |q AS (SELECT *, base + CASE WHEN rnk <= leftover THEN 1 ELSE 0 END AS quota_chars
           |  FROM ranked)
           |SELECT src, n_keepers, avail_chars,
           |  CAST(quota_chars AS BIGINT) AS quota_chars,
           |  CAST(least(quota_chars, avail_chars) AS BIGINT) AS alloc_chars,
           |  CAST(quota_chars - least(quota_chars, avail_chars) AS BIGINT) AS shortfall_chars
           |FROM q ORDER BY src""".stripMargin),
  )

  /** q364 — embedding class-separation audit (Fisher-style scatter
    * ratio): per label, the between-class scatter (n·‖m_label −
    * m_global‖²) against the within-class scatter (Σ_dims (Σx² −
    * (Σx)²/n)) — the "will a classifier/contrastive head even find
    * these labels" gauge read before burning GPU-hours. One corpus
    * pass to (label × dim) sufficient statistics; the global mean and
    * ratios derive from that tiny frame. Det discipline end-to-end:
    * every cross-row sum (Σx, Σx², the per-dim rollups) routes
    * through exact DECIMAL; the division/multiplication chain then
    * operates on identical doubles in both engines. */
  val q364 = QuerySpec(
    "q364_class_separation_audit",
    (s, d) => {
      import s.implicits._
      val x = Tables.fanOut(Tables.embeddings(s, d), col("vec_id"))
        .select($"label",
          posexplode(graft.functions.VectorOps.asDouble($"embedding"))
            .as(Seq("pos", "x")))
      val lp = x.groupBy($"label", $"pos")
        .agg(count(lit(1)).as("n"), dsum($"x", 12).as("sx"),
          dsum($"x" * $"x", 12).as("sxx"))
        .withColumn("m", $"sx" / $"n")
        .withColumn("within_pos", $"sxx" - $"sx" * $"sx" / $"n")
      // Global per-dim mean from the label-level stats (label×dim-sized
      // frame): decimal-exact re-sum keeps it order-independent.
      val gp = lp.groupBy($"pos")
        .agg(dsum($"sx", 12).as("gsx"), sum($"n").as("gn"))
        .withColumn("gm", $"gsx" / $"gn")
      val out = lp.join(gp.select($"pos", $"gm"), Seq("pos"))
        .withColumn("between_pos",
          $"n" * ($"m" - $"gm") * ($"m" - $"gm"))
        .groupBy($"label")
        .agg(max($"n").as("n_vecs"),
          round(dsum($"between_pos", 12), 6).as("between_sq"),
          round(dsum($"within_pos", 12), 6).as("within_sq"))
        // floor() not `div`: IntegralDivide is integer-typed in Spark
        // while DuckDB's // on DOUBLE floor-divides in float — floor of
        // the identical double quotient is the portable form.
        .withColumn("separation_milli",
          expr("CAST(floor(between_sq * 1000 / greatest(within_sq, 0.000001)) AS BIGINT)"))
        .orderBy($"label")
      out
    },
    Some(s"""WITH x AS (
            |  SELECT label,
            |    unnest(generate_series(1, len(embedding))) AS pos,
            |    CAST(unnest(embedding) AS DOUBLE) AS x
            |  FROM embeddings),
            |lp AS (SELECT label, pos, count(*) AS n,
            |    ${sqlDsum("x", 12)} AS sx, ${sqlDsum("x * x", 12)} AS sxx
            |  FROM x GROUP BY 1, 2),
            |lp2 AS (SELECT *, sx / n AS m, sxx - sx * sx / n AS within_pos FROM lp),
            |gp AS (SELECT pos, ${sqlDsum("sx", 12)} AS gsx, sum(n) AS gn
            |  FROM lp2 GROUP BY pos),
            |gp2 AS (SELECT pos, gsx / gn AS gm FROM gp),
            |j AS (SELECT l.label, l.n, l.within_pos,
            |    l.n * (l.m - g.gm) * (l.m - g.gm) AS between_pos
            |  FROM lp2 l JOIN gp2 g ON l.pos = g.pos)
            |SELECT label, CAST(max(n) AS BIGINT) AS n_vecs,
            |  round(${sqlDsum("between_pos", 12)}, 6) AS between_sq,
            |  round(${sqlDsum("within_pos", 12)}, 6) AS within_sq,
            |  CAST(floor(round(${sqlDsum("between_pos", 12)}, 6) * 1000
            |    / greatest(round(${sqlDsum("within_pos", 12)}, 6), 0.000001)) AS BIGINT)
            |    AS separation_milli
            |FROM j GROUP BY label ORDER BY label""".stripMargin),
  )

  /** q365 — pairwise source-overlap matrix via per-source MinHash: each
    * source's deduplicated fingerprint set collapses to a 16-salt
    * MinHash signature (16 exact min-reductions — mergeable, one
    * corpus-sized pass), and every source PAIR's Jaccard overlap is
    * estimated as the fraction of agreeing salts. The matrix itself is
    * #sources² rows — driver-readable — while the corpus is touched
    * once; this is how "how much of reddit is already in commoncrawl"
    * gets answered at 100 TB without a cross-source join of content.
    * Exact-integer output (matching salt count + ppm), so the sketch
    * estimate itself is the deterministic contract on both engines. */
  val q365 = QuerySpec(
    "q365_source_overlap_minhash",
    (s, d) => {
      import s.implicits._
      val fp = Tables.fanOut(Tables.documents(s, d), col("doc_id"))
        .select($"source",
          md5(substring(lower($"text"), 1, 40).cast("binary")).as("h"))
        .distinct()
      val sigs = fp
        .select($"source", explode(sequence(lit(0), lit(15))).as("salt"), $"h")
        .groupBy($"source", $"salt")
        .agg(min(md5(concat($"salt".cast("string"), lit(":"), $"h")
          .cast("binary"))).as("mh"))
      val a = sigs.select($"source".as("src_a"), $"salt", $"mh".as("mh_a"))
      val b = sigs.select($"source".as("src_b"), $"salt", $"mh".as("mh_b"))
      a.join(b, Seq("salt"))
        .filter($"src_a" < $"src_b")
        .groupBy($"src_a", $"src_b")
        .agg(sum(when($"mh_a" === $"mh_b", 1L).otherwise(0L)).as("matching_salts"))
        .withColumn("jaccard_ppm", expr("matching_salts * 1000000L div 16"))
        .orderBy($"src_a", $"src_b")
    },
    Some("""WITH fp AS (
           |  SELECT DISTINCT source, md5(substring(lower(text), 1, 40)) AS h
           |  FROM documents),
           |sigs AS (
           |  SELECT source, salt, min(md5(CAST(salt AS VARCHAR) || ':' || h)) AS mh
           |  FROM fp, generate_series(0, 15) g(salt)
           |  GROUP BY source, salt),
           |m AS (SELECT a.source AS src_a, b.source AS src_b,
           |    CAST(sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS BIGINT) AS matching_salts
           |  FROM sigs a JOIN sigs b ON a.salt = b.salt AND a.source < b.source
           |  GROUP BY 1, 2)
           |SELECT src_a, src_b, matching_salts,
           |  CAST(matching_salts * 1000000 // 16 AS BIGINT) AS jaccard_ppm
           |FROM m ORDER BY src_a, src_b""".stripMargin),
  )

  /** q367 — int8 quantization error audit: q81 SHIPS int8-quantized
    * vectors (ADC probes); this measures what the quantization costs —
    * per label, the total/worst absolute reconstruction error of
    * symmetric per-vector int8 (scale = amax/127, round-half-up,
    * clamped) and how many components sit at full scale. All math is
    * per-row array algebra on identical operands (transform/fold
    * mirrored by list_transform/list_reduce), cross-row sums through
    * exact DECIMAL — engine-identical without a single UDF. The gauge
    * a storage-budget decision ("can this corpus ship int8?") reads. */
  val q367 = QuerySpec(
    "q367_int8_quantization_audit",
    (s, d) => {
      import s.implicits._
      val v = Tables.fanOut(Tables.embeddings(s, d), col("vec_id"))
        .select($"vec_id", $"label",
          graft.functions.VectorOps.asDouble($"embedding").as("emb"))
        .withColumn("amax",
          greatest(abs(array_max($"emb")), abs(array_min($"emb"))))
        .filter($"amax" > 0)
        .withColumn("scale", $"amax" / lit(127.0d))
        // round-half-up spelled as floor(x+0.5): Spark round() and
        // DuckDB round() disagree on halves; floor of the identical
        // double is portable.
        .withColumn("err", expr(
          "transform(emb, x -> abs(greatest(least(floor(x / scale + 0.5D), 127.0D), -127.0D) * scale - x))"))
        .withColumn("err_sum", expr("aggregate(err, 0.0D, (a, x) -> a + x)"))
        .withColumn("err_max", array_max($"err"))
        .withColumn("n_sat", expr("size(filter(emb, x -> abs(x) >= amax))"))
      v.groupBy($"label")
        .agg(count(lit(1)).as("n_vecs"),
          round(dsum($"err_sum", 12), 6).as("abs_err_sum"),
          round(max($"err_max"), 6).as("worst_abs_err"),
          sum($"n_sat").cast("long").as("n_full_scale"))
        .orderBy($"label")
    },
    Some(s"""WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
            |a AS (SELECT *, greatest(abs(list_max(emb)), abs(list_min(emb))) AS amax FROM v),
            |b AS (SELECT *, amax / 127.0 AS scale FROM a WHERE amax > 0),
            |c AS (SELECT label,
            |    list_transform(emb, x -> abs(greatest(least(floor(x / scale + 0.5), 127.0), -127.0) * scale - x)) AS err,
            |    len(list_filter(emb, x -> abs(x) >= amax)) AS n_sat
            |  FROM b),
            |e2 AS (SELECT label, ${sqlFoldSum("err")} AS err_sum,
            |    list_max(err) AS err_max, n_sat FROM c)
            |SELECT label, count(*) AS n_vecs,
            |  round(${sqlDsum("err_sum", 12)}, 6) AS abs_err_sum,
            |  round(max(err_max), 6) AS worst_abs_err,
            |  CAST(sum(n_sat) AS BIGINT) AS n_full_scale
            |FROM e2 GROUP BY label ORDER BY label""".stripMargin),
  )

  /** q368 — epoch novelty rate: how much genuinely NEW content did the
    * arriving corpus epoch bring, measured at the 3-shingle level —
    * each epoch-1 document's shingles anti-joined against the DISTINCT
    * epoch-0 shingle set, rolled up per source as exact novelty ppm.
    * The curator signal that decides whether a crawl source is still
    * worth re-crawling. Shape: one shingle-keyed anti-join (linear in
    * corpus shingle volume, hash-partitioned on the shingle — the
    * dedup family's partitioning reused), then doc- and source-sized
    * rollups; epoch split matches the q359/q361 index epochs. */
  val q368 = QuerySpec(
    "q368_epoch_novelty_rate",
    (s, d) => {
      import s.implicits._
      val sh = Tables.fanOut(Tables.documents(s, d), col("doc_id"))
        .select($"doc_id", $"source",
          graft.functions.TextFns.tokens($"text").as("t"))
        .filter(size($"t") >= 3)
        .select($"doc_id", $"source",
          explode(graft.functions.TextFns.shingles3("t")).as("sh"))
      val s0 = sh.filter($"doc_id" % 4 === 1).select($"sh").distinct()
      val arrivals = sh.filter($"doc_id" % 4 === 2 || $"doc_id" % 4 === 3)
      val novel = arrivals.join(s0, Seq("sh"), "left_anti")
        .groupBy($"doc_id").agg(count(lit(1)).as("n_novel"))
      val per = arrivals.groupBy($"doc_id")
        .agg(first($"source").as("source"), count(lit(1)).as("n_sh"))
        .join(novel, Seq("doc_id"), "left")
        .na.fill(0L, Seq("n_novel"))
      per.groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_sh").as("n_shingles"),
          sum($"n_novel").as("n_novel"),
          expr("sum(n_novel) * 1000000L div sum(n_sh)").as("novelty_ppm"))
        .orderBy($"source")
    },
    Some("""WITH toks AS (SELECT doc_id, source, regexp_split_to_array(lower(text), '\s+') AS t FROM documents),
           |docs AS (SELECT doc_id, source, t FROM toks WHERE len(t) >= 3),
           |sh AS (SELECT doc_id, source,
           |    unnest(list_transform(generate_series(1, len(t)-2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
           |  FROM docs),
           |s0 AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 4 = 1),
           |arr AS (SELECT doc_id, source, sh FROM sh WHERE doc_id % 4 IN (2, 3)),
           |j AS (SELECT a.doc_id, a.source,
           |    CASE WHEN s0.sh IS NULL THEN 1 ELSE 0 END AS novel
           |  FROM arr a LEFT JOIN s0 ON a.sh = s0.sh),
           |per AS (SELECT doc_id, source, count(*) AS n_sh, sum(novel) AS n_novel
           |  FROM j GROUP BY 1, 2)
           |SELECT source, count(*) AS n_docs,
           |  CAST(sum(n_sh) AS BIGINT) AS n_shingles,
           |  CAST(sum(n_novel) AS BIGINT) AS n_novel,
           |  CAST(sum(n_novel) * 1000000 // sum(n_sh) AS BIGINT) AS novelty_ppm
           |FROM per GROUP BY source ORDER BY source""".stripMargin),
  )

  /** q370 — intrinsic dimension of the embedding space via the
    * participation ratio PR = tr(C)² / tr(C²) of the covariance matrix
    * C (the eigenvalue "effective rank" (Σλ)²/Σλ² — how many dimensions
    * the representation actually uses; collapsed embedding spaces are a
    * classic silent failure of contrastive training). Both traces come
    * from SUFFICIENT STATS, never an eigendecomposition: one corpus
    * pass emits the d(d+1)/2 upper-triangle cross-products IN-ROW
    * (generator, no self-join), a map-side-combinable aggregate
    * reduces them to a d²-sized frame, and every float reduction
    * routes through [[Det]] DECIMAL sums — bit-identical on both
    * engines regardless of shuffle order. At 100 TB the cost is the
    * one aggregate with 4096 constant partial states; the covariance
    * frame itself never leaves the executors until it is d²-sized. */
  val q370 = QuerySpec(
    "q370_intrinsic_dimension",
    (s, d) => {
      import s.implicits._
      val v = Tables.fanOut(Tables.embeddings(s, d), col("vec_id"))
        .select(graft.functions.VectorOps.asDouble($"embedding").as("v"))
      // Upper-triangle pair products, generated in-row: (i, j, xi*xj)
      // for 0-based i <= j. slice() is 1-based, transform index 0-based.
      val pairs = v.select(explode(expr(
        """flatten(transform(v, (xi, i) ->
          |  transform(slice(v, i + 1, size(v) - i), (xj, j) ->
          |    named_struct('i', i, 'j', i + j, 'p', xi * xj))))""".stripMargin))
        .as("t"))
        .select($"t.i".as("i"), $"t.j".as("j"), $"t.p".as("p"))
      val st = pairs.groupBy($"i", $"j")
        .agg(dsum($"p", 14).as("sxy"), count(lit(1)).as("n"))
      val sx = v.select(posexplode($"v").as(Seq("i", "xi")))
        .groupBy($"i").agg(dsum($"xi", 14).as("sx"))
      val c = st
        .join(broadcast(sx.select($"i".as("ii"), $"sx".as("sxi"))), $"i" === $"ii")
        .join(broadcast(sx.select($"i".as("jj"), $"sx".as("sxj"))), $"j" === $"jj")
        .withColumn("cij", ($"sxy" - $"sxi" * $"sxj" / $"n") / $"n")
      c.agg(
          max($"n").as("n_vecs"),
          expr("CAST(max(j) + 1 AS BIGINT)").as("dim"),
          round(dsum(when($"i" === $"j", $"cij").otherwise(lit(0.0)), 14), 8)
            .as("trace_cov"),
          round(dsum($"cij" * $"cij" *
            when($"i" === $"j", lit(1)).otherwise(lit(2)), 14), 8)
            .as("trace_cov_sq"))
        .withColumn("participation_ratio_milli",
          expr("CAST(floor(trace_cov * trace_cov * 1000 " +
            "/ greatest(trace_cov_sq, 0.000000001)) AS BIGINT)"))
    },
    Some(s"""WITH v AS (SELECT vec_id,
            |    list_transform(embedding, e -> CAST(e AS DOUBLE)) AS v
            |  FROM embeddings),
            |pairs AS (
            |  SELECT unnest(flatten(list_transform(generate_series(1, len(v)), i ->
            |      list_transform(generate_series(i, len(v)), j ->
            |        {'i': i - 1, 'j': j - 1, 'p': v[i] * v[j]})))) AS t
            |  FROM v),
            |p2 AS (SELECT t.i AS i, t.j AS j, t.p AS p FROM pairs),
            |st AS (SELECT i, j, ${sqlDsum("p", 14)} AS sxy, count(*) AS n
            |  FROM p2 GROUP BY 1, 2),
            |sx AS (SELECT pos - 1 AS i, ${sqlDsum("x", 14)} AS sx FROM
            |    (SELECT unnest(generate_series(1, len(embedding))) AS pos,
            |            CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings)
            |  GROUP BY 1),
            |c AS (SELECT s.i, s.j, (s.sxy - a.sx * b.sx / s.n) / s.n AS cij, s.n
            |  FROM st s JOIN sx a ON s.i = a.i JOIN sx b ON s.j = b.i),
            |agg AS (SELECT max(n) AS n_vecs, max(j) + 1 AS dim,
            |  round(${sqlDsum("CASE WHEN i = j THEN cij ELSE 0 END", 14)}, 8)
            |    AS trace_cov,
            |  round(${sqlDsum("cij * cij * (CASE WHEN i = j THEN 1 ELSE 2 END)", 14)}, 8)
            |    AS trace_cov_sq
            |  FROM c)
            |SELECT CAST(n_vecs AS BIGINT) AS n_vecs, CAST(dim AS BIGINT) AS dim,
            |  trace_cov, trace_cov_sq,
            |  CAST(floor(trace_cov * trace_cov * 1000
            |    / greatest(trace_cov_sq, 0.000000001)) AS BIGINT)
            |    AS participation_ratio_milli
            |FROM agg""".stripMargin),
  )

  /** q376 — pairwise-similarity histogram over a deterministic probe
    * sample: q370's participation ratio says how many directions the
    * space uses; this says how PAIRS distribute along them — the
    * cosine histogram whose right-shift (mass piling toward 1.0) is
    * the classic embedding-collapse / near-dup-saturation signature.
    * The sample is id-bounded (vec_id ≤ 100 → ≤4950 pairs) so the
    * predicate pushes into the scan and the pair join is a
    * broadcast-nested-loop over two 100-row sides — cost independent
    * of corpus size, which is what makes it a monitor you can run
    * every ingest tick at 100 TB. Cosines are the [[Det]] seeded
    * left-folds (bit-identical on both engines), binned into 10 fixed
    * [-1,1] buckets with exact integer shares. */
  val q376 = QuerySpec(
    "q376_pair_distance_histogram",
    (s, d) => {
      import s.implicits._
      val e = Tables.embeddings(s, d)
        .filter($"vec_id" <= 100)
        .select($"vec_id", graft.functions.VectorOps.asDouble($"embedding").as("emb"))
      val a = e.select($"vec_id".as("ida"), $"emb".as("ea"))
      val b = e.select($"vec_id".as("idb"), $"emb".as("eb"))
      val pairs = a.join(broadcast(b), $"ida" < $"idb")
        .withColumn("cos", graft.functions.VectorOps.dot($"ea", $"eb") /
          (graft.functions.VectorOps.l2Norm($"ea") *
            graft.functions.VectorOps.l2Norm($"eb")))
        .withColumn("bin",
          expr("least(9L, CAST(floor((cos + 1.0) * 5.0) AS BIGINT))"))
      val binned = pairs.groupBy($"bin").agg(count(lit(1)).as("n_pairs"))
      val tot = binned.agg(sum($"n_pairs").as("n_total"))
      binned.crossJoin(broadcast(tot))
        .select($"bin", $"n_pairs",
          expr("n_pairs * 1000000L div n_total").as("share_ppm"))
        .orderBy($"bin")
    },
    Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
            |  FROM embeddings WHERE vec_id <= 100),
            |p AS (SELECT ${sqlCosine("a.emb", "b.emb")} AS cos
            |  FROM e a JOIN e b ON a.vec_id < b.vec_id),
            |bins AS (SELECT least(9, CAST(floor((cos + 1.0) * 5.0) AS BIGINT)) AS bin,
            |    count(*) AS n_pairs
            |  FROM p GROUP BY 1)
            |SELECT bin, n_pairs,
            |  CAST(n_pairs * 1000000 // (SELECT sum(n_pairs) FROM bins) AS BIGINT)
            |    AS share_ppm
            |FROM bins ORDER BY bin""".stripMargin),
  )

  /** q377 — quality×duplication interaction: q88 gates docs on quality
    * flags and q354/q358 cluster them by fingerprint, but the CURATION
    * decision (how aggressively to dedup each quality band) needs the
    * joint view — is boilerplate concentrated in the low-quality
    * bands? Each doc gets an integer quality score (the sum of q88's
    * four flags — same features, same thresholds) and its q354-family
    * fingerprint; per score band: doc census, non-keeper duplicate
    * share in exact ppm, and distinct-cluster count. One corpus pass
    * to (fingerprint, score), one fingerprint-keyed shuffle for the
    * cluster frame, a 5-row rollup — nothing wider than the
    * fingerprint join at 100 TB. */
  val q377 = QuerySpec(
    "q377_quality_dup_interaction",
    (s, d) => {
      import s.implicits._
      val toks = graft.functions.TextFns.tokens($"text")
      val scored = Tables.fanOut(Tables.documents(s, d), col("doc_id"))
        .select($"doc_id",
          md5(substring(lower($"text"), 1, 40)).as("h"),
          $"lang", $"n_chars",
          size(filter(toks, t => char_length(t) > 0)).as("n_tok"),
          size(array_distinct(filter(toks, t => char_length(t) > 0))).as("n_typ"))
        .select($"doc_id", $"h",
          (when($"lang".isin("en", "es"), 1L).otherwise(0L) +
            when($"n_chars".between(100, 2000), 1L).otherwise(0L) +
            when($"n_tok" >= 30, 1L).otherwise(0L) +
            when($"n_typ" * 1000 >= $"n_tok" * 350, 1L).otherwise(0L))
            .as("score"))
      val cl = scored.groupBy($"h")
        .agg(count(lit(1)).as("k"), min($"doc_id").as("keeper"))
      scored.join(cl, Seq("h"))
        .withColumn("is_dup", $"k" > 1 && $"doc_id" =!= $"keeper")
        .groupBy($"score")
        .agg(count(lit(1)).as("n_docs"),
          sum(when($"is_dup", 1L).otherwise(0L)).as("n_dups"),
          countDistinct($"h").as("n_clusters"))
        .withColumn("dup_ppm", expr("n_dups * 1000000L div n_docs"))
        .orderBy($"score")
    },
    Some("""WITH scored AS (
           |  SELECT doc_id, md5(substring(lower(text), 1, 40)) AS h,
           |    (CASE WHEN lang IN ('en','es') THEN 1 ELSE 0 END
           |     + CASE WHEN n_chars BETWEEN 100 AND 2000 THEN 1 ELSE 0 END
           |     + CASE WHEN len(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0)) >= 30 THEN 1 ELSE 0 END
           |     + CASE WHEN len(list_distinct(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0))) * 1000
           |            >= len(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0)) * 350 THEN 1 ELSE 0 END
           |    ) AS score
           |  FROM documents),
           |cl AS (SELECT h, count(*) AS k, min(doc_id) AS keeper
           |  FROM scored GROUP BY h)
           |SELECT CAST(s.score AS BIGINT) AS score, count(*) AS n_docs,
           |  CAST(sum(CASE WHEN cl.k > 1 AND s.doc_id <> cl.keeper
           |    THEN 1 ELSE 0 END) AS BIGINT) AS n_dups,
           |  count(DISTINCT s.h) AS n_clusters,
           |  CAST(sum(CASE WHEN cl.k > 1 AND s.doc_id <> cl.keeper
           |    THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS dup_ppm
           |FROM scored s JOIN cl ON s.h = cl.h
           |GROUP BY s.score ORDER BY s.score""".stripMargin),
  )

  /** q386 — data-constrained epoch water-filling: q363 splits ONE
    * epoch's budget across sources; this plans REPEATS. Each source
    * may run up to 4 epochs, and a repeated epoch is worth less than
    * a fresh one (the data-constrained-scaling observation that
    * repeated tokens decay in value — modeled as a halving multiplier
    * 8/4/2/1 per epoch). Priority of (source, epoch) = the source's
    * quality score (ppm of deduplicated keepers passing the q88-style
    * gate) × the epoch multiplier — exact integers, no floats.
    * Greedy water-filling: walk (source, epoch) cells in priority
    * order, funding each cell's full deduplicated char cost until the
    * budget line (9/4 of the global unique supply — "a bit over two
    * epochs of everything", chosen so the water line lands INSIDE
    * epoch 3 and the quality ordering actually decides who gets it)
    * is crossed; the straddling cell gets the partial remainder.
    * Scale shape: one corpus-sized cluster agg (the q363 fingerprint
    * shuffle), then a #sources-row frame fanned ×4 — the greedy walk
    * is a running-sum window over ~4·#sources rows, never the corpus.
    * Reference anchor: the reference stops at per-table ETL
    * (workflow-examples/pyspark-taxi-trip.py:34-52); this is the
    * Tier-C mixture-planning capability SURVEY §2.3 implies. */
  val q386 = QuerySpec(
    "q386_epoch_water_filling",
    (s, d) => {
      import s.implicits._
      val cl = Tables.fanOut(Tables.documents(s, d), col("doc_id"))
        .select(md5(substring(lower($"text"), 1, 40)).as("h"),
          $"doc_id", $"source", $"n_chars", $"lang")
        .groupBy($"h")
        .agg(min_by($"source", $"doc_id").as("src"),
          min_by($"n_chars", $"doc_id").as("keeper_chars"),
          min_by($"lang", $"doc_id").as("keeper_lang"))
      val bySrc = cl.groupBy($"src")
        .agg(sum($"keeper_chars").as("supply_chars"),
          sum(when($"keeper_lang".isin("en", "es") &&
            $"keeper_chars".between(100, 2000), 1L).otherwise(0L)).as("n_good"),
          count(lit(1)).as("n_keepers"))
      // Decision frame from here: #sources × 4 rows.
      val tot = bySrc.agg(sum($"supply_chars").as("s_total"))
      val grid = bySrc.crossJoin(broadcast(tot))
        .withColumn("quality_ppm", expr("n_good * 1000000L div n_keepers"))
        .withColumn("epoch", explode(sequence(lit(1L), lit(4L))))
        .withColumn("priority", $"quality_ppm" *
          expr("CASE epoch WHEN 1 THEN 8 WHEN 2 THEN 4 WHEN 3 THEN 2 ELSE 1 END"))
        .withColumn("budget_chars", expr("9 * s_total div 4"))
      // (priority desc, src, epoch) is a total order — (src, epoch) is
      // unique — so the ROWS running sum is deterministic despite ties.
      val w = Window.orderBy($"priority".desc, $"src", $"epoch")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid
        .withColumn("cum_before",
          sum($"supply_chars").over(w) - $"supply_chars")
        .select($"src", $"epoch", $"quality_ppm", $"priority",
          $"supply_chars".as("cost_chars"), $"cum_before",
          greatest(lit(0L), least($"supply_chars",
            $"budget_chars" - $"cum_before")).as("alloc_chars"))
        .orderBy($"src", $"epoch")
    },
    Some("""WITH cl AS (
           |  SELECT md5(substring(lower(text), 1, 40)) AS h,
           |    min_by(source, doc_id) AS src,
           |    min_by(n_chars, doc_id) AS keeper_chars,
           |    min_by(lang, doc_id) AS keeper_lang
           |  FROM documents GROUP BY 1),
           |bysrc AS (
           |  SELECT src, CAST(sum(keeper_chars) AS BIGINT) AS supply_chars,
           |    sum(CASE WHEN keeper_lang IN ('en','es')
           |      AND keeper_chars BETWEEN 100 AND 2000 THEN 1 ELSE 0 END) AS n_good,
           |    count(*) AS n_keepers
           |  FROM cl GROUP BY src),
           |grid AS (
           |  SELECT src, supply_chars,
           |    CAST(n_good * 1000000 // n_keepers AS BIGINT) AS quality_ppm,
           |    unnest(generate_series(1, 4)) AS epoch
           |  FROM bysrc),
           |pr AS (
           |  SELECT src, CAST(epoch AS BIGINT) AS epoch, quality_ppm,
           |    CAST(quality_ppm * (CASE epoch WHEN 1 THEN 8 WHEN 2 THEN 4
           |      WHEN 3 THEN 2 ELSE 1 END) AS BIGINT) AS priority,
           |    supply_chars AS cost_chars,
           |    CAST(9 * (SELECT sum(supply_chars) FROM bysrc) // 4 AS BIGINT)
           |      AS budget_chars
           |  FROM grid),
           |filled AS (
           |  SELECT *, CAST(sum(cost_chars) OVER (ORDER BY priority DESC, src, epoch
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cost_chars
           |    AS BIGINT) AS cum_before
           |  FROM pr)
           |SELECT src, epoch, quality_ppm, priority, cost_chars, cum_before,
           |  CAST(greatest(0, least(cost_chars, budget_chars - cum_before))
           |    AS BIGINT) AS alloc_chars
           |FROM filled ORDER BY src, epoch""".stripMargin),
  )

  /** q394 — marginal source-novelty curve: in a fixed acquisition order
    * (source name), how many DISTINCT 3-shingles each source adds that
    * no earlier-ordered source already contributes, plus the cumulative
    * coverage ppm. The "is source k worth ingesting" diminishing-returns
    * readout (the RedPajama-style marginal-value question) computed
    * WITHOUT materializing per-prefix distinct sets: first-contributor
    * per shingle is just min(source) over the (shingle → sources) frame
    * — one shingle-keyed groupBy, then a |sources|-row cumulative
    * window (a decision frame, never corpus-sized). */
  val q394 = QuerySpec(
    "q394_source_novelty_curve",
    (s, d) => {
      import s.implicits._
      val sh = Tables.fanOut(Tables.documents(s, d), col("doc_id"))
        .select($"source", graft.functions.TextFns.tokens($"text").as("t"))
        .filter(size($"t") >= 3)
        .select($"source",
          explode(array_distinct(graft.functions.TextFns.shingles3("t"))).as("g"))
      val m = sh.groupBy($"g").agg(min($"source").as("source"))
        .groupBy($"source").agg(count(lit(1)).as("marginal_shingles"))
      val tot = m.agg(sum($"marginal_shingles").as("n"))
      m.crossJoin(broadcast(tot))
        .withColumn("cumulative_shingles",
          sum($"marginal_shingles").over(Window.orderBy($"source")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select($"source", $"marginal_shingles", $"cumulative_shingles",
          expr("cumulative_shingles * 1000000 div n").as("cumulative_ppm"))
        .orderBy($"source")
    },
    Some("""WITH toks AS (SELECT doc_id, source, regexp_split_to_array(lower(text), '\s+') AS t FROM documents),
           |sh AS (SELECT source, unnest(list_distinct(list_transform(generate_series(1, len(t)-2),
           |         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS g
           |       FROM toks WHERE len(t) >= 3),
           |f AS (SELECT g, min(source) AS source FROM sh GROUP BY g),
           |m AS (SELECT source, count(*) AS marginal FROM f GROUP BY 1),
           |tot AS (SELECT sum(marginal) AS n FROM m)
           |SELECT source, CAST(marginal AS BIGINT) AS marginal_shingles,
           |  CAST(sum(marginal) OVER (ORDER BY source) AS BIGINT) AS cumulative_shingles,
           |  CAST(sum(marginal) OVER (ORDER BY source) * 1000000 // (SELECT n FROM tot) AS BIGINT) AS cumulative_ppm
           |FROM m ORDER BY source""".stripMargin),
  )

  /** q395 — product-quantization codebook audit: the 8-dim embedding
    * split into two 4-dim subspaces, each assigned to its nearest of 4
    * fixed sub-centroids (vec_ids 2–5's slices — the q28 fixed-centroid
    * discipline), giving a 2-code PQ encoding (16 cells = 1 byte/vector,
    * the compression ANN runs on at 100 TB where raw vectors don't fit).
    * Reported per (code1, code2) cell: population and mean squared
    * reconstruction error — the distortion table that decides whether
    * this codebook is usable, beside q367's int8 scalar-quantization
    * audit. Scale: ONE corpus pass against 4 broadcast codebook rows;
    * the argmin is a struct-min aggregate (no window), distances are
    * sequential-fold doubles bit-identical to the oracle, the mean
    * routes through Det.davg; output is a fixed 16-row grid. */
  val q395 = QuerySpec(
    "q395_pq_codebook_audit",
    (s, d) => {
      import s.implicits._
      val e = Tables.embeddings(s, d)
        .select($"vec_id", graft.functions.VectorOps.asDouble($"embedding").as("emb"))
      val v = Tables.fanOut(e, col("vec_id"))
        .select($"vec_id", expr("slice(emb, 1, 4)").as("s1"), expr("slice(emb, 5, 4)").as("s2"))
      val cb = e.filter($"vec_id".between(2, 5))
        .select($"vec_id".as("cid"),
          expr("slice(emb, 1, 4)").as("c1"), expr("slice(emb, 5, 4)").as("c2"))
      v.crossJoin(broadcast(cb))
        .withColumn("d1", expr(
          "aggregate(zip_with(s1, c1, (x, y) -> (x - y) * (x - y)), 0.0d, (acc, x) -> acc + x)"))
        .withColumn("d2", expr(
          "aggregate(zip_with(s2, c2, (x, y) -> (x - y) * (x - y)), 0.0d, (acc, x) -> acc + x)"))
        .groupBy($"vec_id")
        .agg(min(struct($"d1", $"cid")).as("m1"), min(struct($"d2", $"cid")).as("m2"))
        .groupBy($"m1.cid".as("code1"), $"m2.cid".as("code2"))
        .agg(count(lit(1)).as("n_vecs"),
          round(davg($"m1.d1" + $"m2.d2", 12), 6).as("mean_sq_err"))
        .orderBy($"code1", $"code2")
    },
    Some {
      def l2sq(a: String, b: String): String =
        s"list_reduce(list_prepend(0.0, list_transform(generate_series(1, len($a)), i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))), (acc, x) -> acc + x)"
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         |v AS (SELECT vec_id, emb[1:4] AS s1, emb[5:8] AS s2 FROM e),
         |cb AS (SELECT vec_id AS cid, emb[1:4] AS c1, emb[5:8] AS c2 FROM e WHERE vec_id BETWEEN 2 AND 5),
         |d AS (SELECT v.vec_id, cb.cid, ${l2sq("v.s1", "cb.c1")} AS d1, ${l2sq("v.s2", "cb.c2")} AS d2 FROM v, cb),
         |a1 AS (SELECT vec_id, cid AS code1, d1 FROM (
         |  SELECT vec_id, cid, d1, row_number() OVER (PARTITION BY vec_id ORDER BY d1, cid) AS rn FROM d) WHERE rn = 1),
         |a2 AS (SELECT vec_id, cid AS code2, d2 FROM (
         |  SELECT vec_id, cid, d2, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM d) WHERE rn = 1)
         |SELECT code1, code2, CAST(count(*) AS BIGINT) AS n_vecs,
         |  round(${sqlDavg("a1.d1 + a2.d2", 12)}, 6) AS mean_sq_err
         |FROM a1 JOIN a2 USING (vec_id) GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },
  )

  /** q396 — PQ asymmetric distance (ADC) top-k: the query stays FLOAT,
    * the corpus stays 1-byte PQ codes (q395's two 4-dim subspaces ×
    * 4 sub-centroids), and distance is answered from an 8-entry lookup
    * table (query→sub-centroid distances computed ONCE) — the Jégou
    * et al. ADC recipe that makes billion-vector scans byte-bound
    * instead of float-bound. Output: top-10 by ADC with the EXACT
    * distance beside each hit, so the distortion q395 tabulates is
    * visible per result. Scale: encoding is the q395 one-pass argmin;
    * the probe joins two 4-row broadcast LUTs onto the code frame and
    * TakeOrdered(10)s — no per-vector float math at query time at all
    * (the exact_dist column here is the audit, not the scan). */
  val q396 = QuerySpec(
    "q396_pq_adc_topk",
    (s, d) => {
      import s.implicits._
      val e = Tables.embeddings(s, d)
        .select($"vec_id", graft.functions.VectorOps.asDouble($"embedding").as("emb"))
      val l2 = (a: String, b: String) =>
        s"aggregate(zip_with($a, $b, (x, y) -> (x - y) * (x - y)), 0.0d, (acc, x) -> acc + x)"
      val v = Tables.fanOut(e, col("vec_id"))
        .select($"vec_id", expr("slice(emb, 1, 4)").as("s1"),
          expr("slice(emb, 5, 4)").as("s2"), $"emb")
      val cb = e.filter($"vec_id".between(2, 5))
        .select($"vec_id".as("cid"),
          expr("slice(emb, 1, 4)").as("c1"), expr("slice(emb, 5, 4)").as("c2"))
      val codes = v.crossJoin(broadcast(cb))
        .withColumn("d1", expr(l2("s1", "c1")))
        .withColumn("d2", expr(l2("s2", "c2")))
        .groupBy($"vec_id")
        .agg(min(struct($"d1", $"cid")).as("m1"), min(struct($"d2", $"cid")).as("m2"),
          first($"emb").as("emb"))
        .select($"vec_id", $"m1.cid".as("code1"), $"m2.cid".as("code2"), $"emb")
      val qv = e.filter($"vec_id" === 1)
        .select(expr("slice(emb, 1, 4)").as("q1"), expr("slice(emb, 5, 4)").as("q2"),
          $"emb".as("qe"))
      val lut = cb.crossJoin(broadcast(qv))
        .select($"cid", expr(l2("q1", "c1")).as("qd1"), expr(l2("q2", "c2")).as("qd2"),
          $"qe")
      codes.filter($"vec_id" =!= 1)
        .join(broadcast(lut.select($"cid".as("code1"), $"qd1")), Seq("code1"))
        .join(broadcast(lut.select($"cid".as("code2"), $"qd2", $"qe")), Seq("code2"))
        .select($"vec_id", $"code1", $"code2",
          round($"qd1" + $"qd2", 6).as("adc_dist"),
          round(expr(l2("emb", "qe")), 6).as("exact_dist"),
          ($"qd1" + $"qd2").as("ord"))
        .orderBy($"ord", $"vec_id")
        .limit(10)
        .drop("ord")
    },
    Some {
      def l2sq(a: String, b: String): String =
        s"list_reduce(list_prepend(0.0, list_transform(generate_series(1, len($a)), i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))), (acc, x) -> acc + x)"
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         |v AS (SELECT vec_id, emb[1:4] AS s1, emb[5:8] AS s2, emb FROM e),
         |cb AS (SELECT vec_id AS cid, emb[1:4] AS c1, emb[5:8] AS c2 FROM e WHERE vec_id BETWEEN 2 AND 5),
         |d AS (SELECT v.vec_id, cb.cid, ${l2sq("v.s1", "cb.c1")} AS d1, ${l2sq("v.s2", "cb.c2")} AS d2 FROM v, cb),
         |a1 AS (SELECT vec_id, cid AS code1 FROM (
         |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d1, cid) AS rn FROM d) WHERE rn = 1),
         |a2 AS (SELECT vec_id, cid AS code2 FROM (
         |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM d) WHERE rn = 1),
         |qv AS (SELECT emb[1:4] AS q1, emb[5:8] AS q2, emb AS qe FROM e WHERE vec_id = 1),
         |lut AS (SELECT cb.cid, ${l2sq("qv.q1", "cb.c1")} AS qd1, ${l2sq("qv.q2", "cb.c2")} AS qd2 FROM cb, qv)
         |SELECT a1.vec_id, a1.code1, a2.code2,
         |  round(l1.qd1 + l2.qd2, 6) AS adc_dist,
         |  round(${l2sq("v.emb", "qv.qe")}, 6) AS exact_dist
         |FROM a1 JOIN a2 USING (vec_id)
         |JOIN lut l1 ON l1.cid = a1.code1 JOIN lut l2 ON l2.cid = a2.code2
         |JOIN v ON v.vec_id = a1.vec_id, qv
         |WHERE a1.vec_id <> 1
         |ORDER BY l1.qd1 + l2.qd2, a1.vec_id LIMIT 10""".stripMargin
    },
  )

  /** q398 — dedup-policy what-if: the SlimPajama-style "how much corpus
    * survives each retention policy" table, computed from the
    * prefix-fingerprint cluster frame alone (never re-touching text):
    * keep-1, keep-min(k,4), keep-⌊√k⌋ and keep-all, each reporting docs
    * kept, expected chars kept (chars_total·k′ div k — uniform-choice
    * expectation, exact integer), and both as ppm of the corpus. ⌊√k⌋
    * is floor of an IEEE sqrt of an exact small int — identical on both
    * engines for k < 2⁵². One cluster aggregate; the policy table is
    * 4 rows of decision math. */
  val q398 = QuerySpec(
    "q398_dedup_policy_whatif",
    (s, d) => {
      import s.implicits._
      val cl = Tables.fanOut(Tables.documents(s, d), col("doc_id"))
        .select(md5(substring(lower($"text"), 1, 40).cast("binary")).as("h"), $"n_chars")
        .groupBy($"h")
        .agg(count(lit(1)).as("k"), sum($"n_chars").as("chars_total"))
      val pol = cl.agg(
        sum($"k").as("all_docs"), sum($"chars_total").as("all_chars"),
        count(lit(1)).as("keep1_docs"),
        sum(expr("chars_total div k")).as("keep1_chars"),
        sum(least($"k", lit(4L))).as("cap4_docs"),
        sum(expr("chars_total * least(k, 4) div k")).as("cap4_chars"),
        sum(expr("cast(floor(sqrt(k)) as bigint)")).as("sqrt_docs"),
        sum(expr("chars_total * cast(floor(sqrt(k)) as bigint) div k")).as("sqrt_chars"))
      pol.select(expr(
          """stack(4,
            |  'keep_1',    1L, keep1_docs, keep1_chars,
            |  'keep_4cap', 2L, cap4_docs,  cap4_chars,
            |  'keep_sqrt', 3L, sqrt_docs,  sqrt_chars,
            |  'keep_all',  4L, all_docs,   all_chars) AS (policy, ord, docs_kept, chars_kept)""".stripMargin),
          $"all_docs", $"all_chars")
        .select($"policy", $"ord", $"docs_kept", $"chars_kept",
          expr("docs_kept * 1000000 div all_docs").as("docs_ppm"),
          expr("chars_kept * 1000000 div all_chars").as("chars_ppm"))
        .orderBy($"ord")
    },
    Some("""WITH cl AS (SELECT md5(substring(lower(text), 1, 40)) AS h, count(*) AS k,
           |              CAST(sum(n_chars) AS BIGINT) AS chars_total
           |            FROM documents GROUP BY 1),
           |tot AS (SELECT sum(k) AS all_docs, sum(chars_total) AS all_chars FROM cl),
           |pol AS (
           |  SELECT 'keep_1' AS policy, 1 AS ord, CAST(count(*) AS BIGINT) AS docs_kept,
           |    CAST(sum(chars_total // k) AS BIGINT) AS chars_kept FROM cl
           |  UNION ALL
           |  SELECT 'keep_4cap', 2, CAST(sum(least(k, 4)) AS BIGINT),
           |    CAST(sum(chars_total * least(k, 4) // k) AS BIGINT) FROM cl
           |  UNION ALL
           |  SELECT 'keep_sqrt', 3, CAST(sum(CAST(floor(sqrt(k)) AS BIGINT)) AS BIGINT),
           |    CAST(sum(chars_total * CAST(floor(sqrt(k)) AS BIGINT) // k) AS BIGINT) FROM cl
           |  UNION ALL
           |  SELECT 'keep_all', 4, CAST(sum(k) AS BIGINT),
           |    CAST(sum(chars_total) AS BIGINT) FROM cl)
           |SELECT policy, CAST(ord AS BIGINT) AS ord, docs_kept, chars_kept,
           |  CAST(docs_kept * 1000000 // (SELECT all_docs FROM tot) AS BIGINT) AS docs_ppm,
           |  CAST(chars_kept * 1000000 // (SELECT all_chars FROM tot) AS BIGINT) AS chars_ppm
           |FROM pol ORDER BY ord""".stripMargin),
  )

  /** q402 — license-aware dedup census: when near-dup clusters collapse
    * to one keeper, the keeper must inherit the MOST RESTRICTIVE
    * license present in its cluster (a compliance invariant: you cannot
    * launder a restricted document into a permissive one by deduping
    * against its permissive mirror). Source→license is a deterministic
    * 3-class hash dimension (permissive=0 / attribution=1 /
    * restricted=2 — a stand-in for the real license dim table); the
    * census reports, per (inherited class × cluster-size band), cluster
    * and doc counts plus how many docs were UPGRADED to a stricter
    * class by inheritance — the "dedup changed your licensing exposure"
    * number legal review reads. One fingerprint window + one rollup;
    * the license dim broadcasts by construction (it is a pure hash). */
  val q402 = QuerySpec(
    "q402_license_aware_dedup",
    (s, d) => {
      import s.implicits._
      val hex = lit("0123456789abcdef")
      val lic = Tables.fanOut(Tables.documents(s, d), col("doc_id"))
        .select($"doc_id",
          md5(substring(lower($"text"), 1, 40).cast("binary")).as("h"),
          ((instr(hex, substring(md5(concat(lit("L|"), $"source").cast("binary")), 1, 1)) - 1) % 3)
            .cast("long").as("cls"))
      val w = lic.withColumn("inherited",
        max($"cls").over(Window.partitionBy($"h")))
      val cl = w.groupBy($"h")
        .agg(count(lit(1)).as("k"), max($"inherited").as("inherited"),
          sum(when($"cls" < $"inherited", 1L).otherwise(0L)).as("n_upgraded"))
      cl.select(
          $"inherited".as("license_class"),
          when($"k" === 1, "1").when($"k" <= 4, "2-4").otherwise("5+").as("size_band"),
          $"k", $"n_upgraded")
        .groupBy($"license_class", $"size_band")
        .agg(count(lit(1)).as("n_clusters"), sum($"k").as("n_docs"),
          sum($"n_upgraded").as("n_upgraded_docs"))
        .orderBy($"license_class", $"size_band")
    },
    Some("""WITH lic AS (SELECT doc_id, source, md5(substring(lower(text), 1, 40)) AS h,
           |               CAST((strpos('0123456789abcdef', substr(md5('L|' || source), 1, 1)) - 1) % 3 AS BIGINT) AS cls
           |             FROM documents),
           |w AS (SELECT h, cls, max(cls) OVER (PARTITION BY h) AS inherited FROM lic),
           |cl AS (SELECT h, count(*) AS k, max(inherited) AS inherited,
           |         CAST(sum(CASE WHEN cls < inherited THEN 1 ELSE 0 END) AS BIGINT) AS n_upgraded
           |       FROM w GROUP BY h),
           |b AS (SELECT CASE WHEN k = 1 THEN '1' WHEN k <= 4 THEN '2-4' ELSE '5+' END AS size_band,
           |        inherited, k, n_upgraded FROM cl)
           |SELECT inherited AS license_class, size_band,
           |  CAST(count(*) AS BIGINT) AS n_clusters, CAST(sum(k) AS BIGINT) AS n_docs,
           |  CAST(sum(n_upgraded) AS BIGINT) AS n_upgraded_docs
           |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
  )

  /** q413 — per-source dataset datasheet (the "datasheets for datasets"
    * card, computed): docs, chars, language census with deterministic
    * top language (string-keyed argmin — the two-level argmax
    * discipline of q232: zero-padded inverted count ‖ lang, so ties
    * break on the name identically in both engines), quality-gate pass
    * ppm (q387's gate), duplicated-doc ppm against GLOBAL
    * prefix-fingerprint clusters, and safety-flag ppm (q408's
    * lexicon). Three corpus aggregates (per-(source,lang), per-cluster,
    * per-source) joined on |sources|-row frames — the one-page summary
    * a data consumer reads before the 400-query deep dive. */
  val q413 = QuerySpec(
    "q413_dataset_datasheet",
    (s, d) => {
      import s.implicits._
      val docs = Tables.fanOut(Tables.documents(s, d), col("doc_id"))
      val top = docs.groupBy($"source", $"lang").agg(count(lit(1)).as("n"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_langs"),
          min_by($"lang",
            concat(format_string("%012d", lit(999999999999L) - $"n"), $"lang"))
            .as("top_lang"))
      val cl = docs.select($"source",
        md5(substring(lower($"text"), 1, 40).cast("binary")).as("h"))
      val ck = cl.groupBy($"h").agg(count(lit(1)).as("k"))
      val dup = cl.join(ck, Seq("h"))
        .groupBy($"source")
        .agg(sum(when($"k" >= 2, 1L).otherwise(0L)).as("n_dup"))
      val m = docs.select($"source", $"lang", $"n_chars",
          expr("""size(filter(filter(split(lower(text), '\\s+'), x -> char_length(x) > 0),
                 |  x -> array_contains(array('spark', 'merge', 'dup'), x)))""".stripMargin)
            .as("hits"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("n_chars"),
          sum(when($"lang".isin("en", "es") && $"n_chars".between(100, 2000), 1L)
            .otherwise(0L)).as("n_quality"),
          sum(when($"hits" >= 1, 1L).otherwise(0L)).as("n_flagged"))
      m.join(broadcast(top), Seq("source")).join(broadcast(dup), Seq("source"))
        .select($"source", $"n_docs", $"n_chars", $"n_langs", $"top_lang",
          expr("n_quality * 1000000 div n_docs").as("quality_pass_ppm"),
          expr("n_dup * 1000000 div n_docs").as("dup_doc_ppm"),
          expr("n_flagged * 1000000 div n_docs").as("safety_flag_ppm"))
        .orderBy($"source")
    },
    Some("""WITH lc AS (SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2),
           |top AS (SELECT source, count(*) AS n_langs,
           |          arg_min(lang, printf('%012d', 999999999999 - n) || lang) AS top_lang
           |        FROM lc GROUP BY source),
           |cl AS (SELECT source, md5(substring(lower(text), 1, 40)) AS h FROM documents),
           |ck AS (SELECT h, count(*) AS k FROM cl GROUP BY h),
           |dup AS (SELECT cl.source, CAST(sum(CASE WHEN ck.k >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
           |        FROM cl JOIN ck USING (h) GROUP BY 1),
           |m AS (SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars,
           |        CAST(sum(CASE WHEN lang IN ('en','es') AND n_chars BETWEEN 100 AND 2000 THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
           |        CAST(sum(CASE WHEN len(list_filter(regexp_split_to_array(lower(text), '\s+'),
           |              x -> list_contains(['spark','merge','dup'], x))) >= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
           |      FROM documents GROUP BY source)
           |SELECT m.source, CAST(m.n_docs AS BIGINT) AS n_docs, m.n_chars,
           |  CAST(top.n_langs AS BIGINT) AS n_langs, top.top_lang,
           |  CAST(m.n_quality * 1000000 // m.n_docs AS BIGINT) AS quality_pass_ppm,
           |  CAST(dup.n_dup * 1000000 // m.n_docs AS BIGINT) AS dup_doc_ppm,
           |  CAST(m.n_flagged * 1000000 // m.n_docs AS BIGINT) AS safety_flag_ppm
           |FROM m JOIN top USING (source) JOIN dup USING (source)
           |ORDER BY m.source""".stripMargin),
  )

  val all: Seq[QuerySpec] =
    Seq(q363, q364, q365, q367, q368, q370, q376, q377, q386, q394, q395, q396,
      q398, q402, q413)
}
