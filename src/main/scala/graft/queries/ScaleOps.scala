package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-5 scale-pattern primitives: the operations that exist ONLY
  * because the corpus is too big for a single machine — deterministic
  * global shuffling, source re-balancing to a token budget, dense global
  * row ids without a single-partition sort, and order-independent table
  * digests for cross-site reconciliation. Each states its oracle in
  * pure integer arithmetic so the gate is exact.
  */
object ScaleOps {

  private def md5Hex(c: org.apache.spark.sql.Column) = md5(c.cast("binary"))

  /** Deterministic integer milli-degree coordinates + 2000-unit grid
    * cells (shifted non-negative so integral division IS floor) —
    * shared by the spatial family q256/q270/q273. Affine hashes of the
    * entity key: exact on every engine, no FP trig anywhere. */
  private def geoLatE3(k: org.apache.spark.sql.Column) = (k * 7919L) % 180001L - 90000L
  private def geoLonE3(k: org.apache.spark.sql.Column) = (k * 104729L) % 360001L - 180000L
  private def cellX(lat: org.apache.spark.sql.Column) = ((lat + 90000L) / 2000L).cast("long")
  private def cellY(lon: org.apache.spark.sql.Column) = ((lon + 180000L) / 2000L).cast("long")

  /** q207 — deterministic corpus shuffle + sharding: training pipelines
    * need the corpus in a pseudo-random but REPRODUCIBLE order, split
    * into shards that any worker count can consume. Shard = first hex
    * char of md5(doc_id) (16 shards); within-shard order = the full
    * hash (with doc_id tiebreak). The permutation checksum
    * Σ position·doc_id pins the exact within-shard order — any
    * reordering, not just membership drift, fails the gate. Scale: one
    * hash-partition shuffle on the shard key; the within-shard sort IS
    * the shard write order a sharded-output job needs anyway — no extra
    * pass, no global sort, no RNG state to coordinate. */
  val q207 = QuerySpec(
    "q207_corpus_shuffle",
    (s, d) => {
      import s.implicits._
      val h = Tables.documents(s, d)
        .select($"doc_id", $"n_chars", md5Hex($"doc_id".cast("string")).as("hx"))
        .withColumn("shard", substring($"hx", 1, 1))
      h.withColumn("pos",
          row_number().over(Window.partitionBy($"shard").orderBy($"hx", $"doc_id")))
        .groupBy($"shard")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_chars").as("chars_sum"),
          sum($"pos".cast("long") * $"doc_id").as("perm_checksum"))
        .orderBy($"shard")
    },
    Some("""WITH h AS (
           |  SELECT doc_id, n_chars, md5(CAST(doc_id AS VARCHAR)) AS hx FROM documents),
           |p AS (
           |  SELECT substr(hx, 1, 1) AS shard, doc_id, n_chars,
           |    row_number() OVER (PARTITION BY substr(hx, 1, 1) ORDER BY hx, doc_id) AS pos
           |  FROM h)
           |SELECT shard, count(*) AS n_docs,
           |  CAST(sum(n_chars) AS BIGINT) AS chars_sum,
           |  CAST(sum(pos * doc_id) AS BIGINT) AS perm_checksum
           |FROM p GROUP BY shard ORDER BY shard""".stripMargin),
  )

  /** q208 — token-budget mixture balancing: downsample every source to
    * the SMALLEST source's mass (uniform mixture, the DoReMi/DataComp
    * baseline), by per-source acceptance rates applied as a salted-hash
    * threshold — no RNG, no sampling state; every engine and every
    * rerun keeps exactly the same documents. Rates are exact integer
    * arithmetic (target·65536 DIV mass, a 16-bit threshold compared
    * against 4 hex chars of the salted md5); a rate of 65536 short-
    * circuits to keep-all so the smallest source survives intact.
    * Scale: one dimension-sized aggregate (per-source mass), one 1-row
    * min, rates broadcast back over the corpus — the fact table is
    * scanned twice, shuffled never (the final rollup is per-source,
    * dimension-sized). */
  val q208 = QuerySpec(
    "q208_token_budget_mixture",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d).select($"doc_id", $"source", $"n_chars")
      val mass = docs.groupBy($"source").agg(sum($"n_chars").as("src_mass"))
      val target = mass.agg(min($"src_mass").as("target"))
      val rates = mass.crossJoin(broadcast(target))
        .select($"source", expr("(target * 65536) div src_mass").as("rate16"))
      docs.join(broadcast(rates), Seq("source"))
        .filter($"rate16" >= 65536L ||
          substring(md5Hex(concat(lit("m:"), $"doc_id".cast("string"))), 1, 4)
            < lower(lpad(hex($"rate16"), 4, "0")))
        .groupBy($"source")
        .agg(max($"rate16").as("rate16"),
          count(lit(1)).as("n_kept"),
          sum($"n_chars").as("kept_mass"),
          sum($"doc_id").as("id_checksum"))
        .orderBy($"source")
    },
    Some("""WITH m AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS src_mass
           |  FROM documents GROUP BY source),
           |r AS (SELECT source, src_mass,
           |  (SELECT min(src_mass) FROM m) * 65536 // src_mass AS rate16 FROM m),
           |k AS (
           |  SELECT d.source, doc_id, n_chars, rate16
           |  FROM documents d JOIN r ON d.source = r.source
           |  WHERE rate16 >= 65536
           |     OR substr(md5('m:' || CAST(doc_id AS VARCHAR)), 1, 4) < printf('%04x', rate16))
           |SELECT source, CAST(max(rate16) AS BIGINT) AS rate16, count(*) AS n_kept,
           |  CAST(sum(n_chars) AS BIGINT) AS kept_mass,
           |  CAST(sum(doc_id) AS BIGINT) AS id_checksum
           |FROM k GROUP BY source ORDER BY source""".stripMargin),
  )

  /** q209 — dense global row ids ([[graft.operators.StableIds]]): ids
    * 0..N-1 in (o_totalprice, o_orderkey) order WITHOUT the
    * single-partition `row_number() OVER (ORDER BY …)` — range
    * repartition + per-partition offsets; see the operator Scaladoc for
    * why the ids depend only on the total order. The gate buckets ids
    * by id DIV 1000 and pins Σid, Σkey, min/max per bucket — off-by-one
    * anywhere shifts a bucket boundary and fails. The oracle IS the
    * single-partition formulation the operator replaces. */
  val q209 = QuerySpec(
    "q209_global_row_ids",
    (s, d) => {
      import s.implicits._
      graft.operators.StableIds
        .withGlobalRowIds(
          Tables.orders(s, d).select($"o_orderkey", $"o_totalprice"),
          numParts = 8, $"o_totalprice", $"o_orderkey")
        .groupBy(expr("row_id div 1000").as("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          sum($"row_id").as("id_sum"),
          sum($"o_orderkey").as("key_checksum"),
          min($"row_id").as("id_min"),
          max($"row_id").as("id_max"))
        .orderBy($"bucket")
    },
    Some("""WITH r AS (
           |  SELECT o_orderkey,
           |    row_number() OVER (ORDER BY o_totalprice, o_orderkey) - 1 AS row_id
           |  FROM orders)
           |SELECT row_id // 1000 AS bucket, count(*) AS n_rows,
           |  CAST(sum(row_id) AS BIGINT) AS id_sum,
           |  CAST(sum(o_orderkey) AS BIGINT) AS key_checksum,
           |  CAST(min(row_id) AS BIGINT) AS id_min,
           |  CAST(max(row_id) AS BIGINT) AS id_max
           |FROM r GROUP BY row_id // 1000 ORDER BY bucket""".stripMargin),
  )

  /** q210 — order-independent table digest: a mergeable content
    * checksum (Σ over rows of the first 32 md5 bits of the stable row
    * rendering, bucketed by key) that two sites compute INDEPENDENTLY —
    * no join, no sort, no row movement between them — and compare
    * bucket-by-bucket to localize divergence. This is the scan-only
    * complement to q191's join-based diff: at 100 TB you digest both
    * replicas in place (one scan each, partial-aggregated — commutative
    * sums make shuffle order irrelevant) and ship 16 rows, not rows.
    * Renderings use only int/string columns (q171's portability rule);
    * hex→int is conv() on the Spark side, char arithmetic in DuckDB. */
  val q210 = QuerySpec(
    "q210_table_digest",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .select(($"o_orderkey" % 16).as("bucket"),
          conv(substring(md5(concat_ws("|",
            $"o_orderkey".cast("string"), $"o_custkey".cast("string"),
            $"o_orderstatus", $"o_orderpriority").cast("binary")), 1, 8), 16, 10)
            .cast("long").as("h32"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n_rows"), sum($"h32").as("digest"))
        .orderBy($"bucket")
    },
    Some("""WITH f AS (
           |  SELECT o_orderkey % 16 AS bucket,
           |    md5(concat_ws('|', CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR),
           |      o_orderstatus, o_orderpriority)) AS hx
           |  FROM orders),
           |v AS (
           |  SELECT bucket,
           |    list_reduce(list_transform(generate_series(1, 8),
           |      i -> CAST(CASE WHEN ascii(substr(hx, i, 1)) >= 97
           |            THEN ascii(substr(hx, i, 1)) - 87
           |            ELSE ascii(substr(hx, i, 1)) - 48 END AS BIGINT)
           |        * CAST(power(16, 8 - i) AS BIGINT)),
           |      (a, b) -> a + b) AS h32
           |  FROM f)
           |SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n_rows,
           |  CAST(sum(h32) AS BIGINT) AS digest
           |FROM v GROUP BY bucket ORDER BY bucket""".stripMargin),
  )

  /** q248 — id-sequence gap detection (the completeness audit every
    * ingest ledger runs: "which ids never arrived?"): lead() over the
    * ordered distinct ids turns gaps into (start, width) facts — no
    * spine generation, no anti join against a generated range (which at
    * 100 TB would materialize the full id domain). The global lead is
    * DISTRIBUTED: dense row ids from [[graft.operators.StableIds]]
    * (range partitions + offsets), then a self equi-join on row_id+1 —
    * no single-partition `lead() OVER (ORDER BY id)` anywhere; the
    * oracle IS that single-partition formulation. The filtered orderkey
    * stream has a gap at every 7th key by construction. */
  val q248 = QuerySpec(
    "q248_id_gap_detection",
    (s, d) => {
      import s.implicits._
      val k = Tables.orders(s, d).filter($"o_orderkey" % 7 =!= 0)
        .select($"o_orderkey".as("id")).distinct()
      val ids = graft.operators.StableIds.withGlobalRowIds(k, 8, $"id")
      val successors = ids.select(($"row_id" - 1L).as("row_id"), $"id".as("nxt"))
      ids.join(successors, Seq("row_id"))
        .filter($"nxt" - $"id" > 1)
        .agg(count(lit(1)).as("n_gaps"),
          sum($"nxt" - $"id" - 1).as("missing_total"),
          min($"id" + 1).as("first_gap_start"))
    },
    Some("""WITH k AS (
           |  SELECT DISTINCT o_orderkey AS id FROM orders WHERE o_orderkey % 7 <> 0),
           |g AS (SELECT id, lead(id) OVER (ORDER BY id) AS nxt FROM k)
           |SELECT count(*) AS n_gaps,
           |  CAST(sum(nxt - id - 1) AS BIGINT) AS missing_total,
           |  CAST(min(id + 1) AS BIGINT) AS first_gap_start
           |FROM g WHERE nxt - id > 1""".stripMargin),
  )

  /** q249 — fiscal calendar derivation (FY begins Feb 1): the
    * warehouse date-dimension columns that never match the ISO
    * calendar — fiscal year rolls at month 2, fiscal quarter is modular
    * month arithmetic — derived from the distinct order dates and
    * verified per (fy, fq) block with day counts and boundary dates.
    * Dimension building is dimension-sized by definition; the distinct
    * is the only fact-table pass. */
  val q249 = QuerySpec(
    "q249_fiscal_calendar",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d).select(to_date($"o_orderdate").as("dt")).distinct()
        .select($"dt",
          when(month($"dt") >= 2, year($"dt") + 1).otherwise(year($"dt"))
            .cast("long").as("fy"),
          (expr("((month(dt) + 10) % 12) div 3") + 1).cast("long").as("fq"))
        .groupBy($"fy", $"fq")
        .agg(count(lit(1)).as("n_days"),
          date_format(min($"dt"), "yyyy-MM-dd").as("from_d"),
          date_format(max($"dt"), "yyyy-MM-dd").as("to_d"))
        .orderBy($"fy", $"fq")
    },
    Some("""WITH d AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS dt FROM orders),
           |f AS (
           |  SELECT dt,
           |    CASE WHEN month(dt) >= 2 THEN year(dt) + 1 ELSE year(dt) END AS fy,
           |    ((month(dt) + 10) % 12) // 3 + 1 AS fq
           |  FROM d)
           |SELECT CAST(fy AS BIGINT) AS fy, CAST(fq AS BIGINT) AS fq,
           |  count(*) AS n_days,
           |  strftime(min(dt), '%Y-%m-%d') AS from_d,
           |  strftime(max(dt), '%Y-%m-%d') AS to_d
           |FROM f GROUP BY fy, fq ORDER BY fy, fq""".stripMargin),
  )

  /** q250 — scale-ops capstone (q100's sibling for the round-5
    * family): one pipeline composing exact dedup (md5 text fingerprint,
    * keep-min-id), token-budget mixture balancing to the smallest
    * source (q208's integer thresholds), deterministic hash sharding
    * (q207), and a per-shard digest manifest (q210's mergeable
    * checksum) — corpus in, 16-row shard manifest out, every stage
    * restated by the oracle's CTE chain. The manifest IS what a
    * 100 TB training-data release ships: shard membership, mass, and a
    * content digest any replica can recompute scan-only. */
  val q250 = QuerySpec(
    "q250_scaleops_capstone",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
        .select($"doc_id", $"source", $"n_chars", md5($"text".cast("binary")).as("fp"))
      val deduped = docs
        .withColumn("rk", row_number().over(Window.partitionBy($"fp").orderBy($"doc_id")))
        .filter($"rk" === 1).drop("rk", "fp")
      val mass = deduped.groupBy($"source").agg(sum($"n_chars").as("src_mass"))
      val target = mass.agg(min($"src_mass").as("target"))
      val rates = mass.crossJoin(broadcast(target))
        .select($"source", expr("(target * 65536) div src_mass").as("rate16"))
      val kept = deduped.join(broadcast(rates), Seq("source"))
        .filter($"rate16" >= 65536L ||
          substring(md5Hex(concat(lit("m:"), $"doc_id".cast("string"))), 1, 4)
            < lower(lpad(hex($"rate16"), 4, "0")))
      kept
        .select($"doc_id", $"n_chars",
          substring(md5Hex($"doc_id".cast("string")), 1, 1).as("shard"),
          conv(substring(md5Hex(concat_ws("|", $"doc_id".cast("string"),
            $"n_chars".cast("string"))), 1, 8), 16, 10).cast("long").as("h32"))
        .groupBy($"shard")
        .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("mass"),
          sum($"h32").as("digest"))
        .orderBy($"shard")
    },
    Some("""WITH dd AS (
           |  SELECT doc_id, source, n_chars,
           |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rk
           |  FROM documents),
           |ded AS (SELECT doc_id, source, n_chars FROM dd WHERE rk = 1),
           |m AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS src_mass
           |  FROM ded GROUP BY source),
           |r AS (SELECT source,
           |  (SELECT min(src_mass) FROM m) * 65536 // src_mass AS rate16 FROM m),
           |k AS (
           |  SELECT d.doc_id, d.n_chars
           |  FROM ded d JOIN r ON d.source = r.source
           |  WHERE rate16 >= 65536
           |     OR substr(md5('m:' || CAST(doc_id AS VARCHAR)), 1, 4)
           |        < printf('%04x', rate16)),
           |s AS (
           |  SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard, n_chars,
           |    md5(CAST(doc_id AS VARCHAR) || '|' || CAST(n_chars AS VARCHAR)) AS hx
           |  FROM k),
           |v AS (
           |  SELECT shard, n_chars,
           |    list_reduce(list_transform(generate_series(1, 8),
           |      i -> CAST(CASE WHEN ascii(substr(hx, i, 1)) >= 97
           |            THEN ascii(substr(hx, i, 1)) - 87
           |            ELSE ascii(substr(hx, i, 1)) - 48 END AS BIGINT)
           |        * CAST(power(16, 8 - i) AS BIGINT)),
           |      (a, b) -> a + b) AS h32
           |  FROM s)
           |SELECT shard, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS mass,
           |  CAST(sum(h32) AS BIGINT) AS digest
           |FROM v GROUP BY shard ORDER BY shard""".stripMargin),
  )

  /** DuckDB mirror of Spark's `conv(substr(<hx>, 1, n), 16, 10)` — hex
    * prefix of an md5 string to BIGINT via per-char arithmetic (DuckDB
    * has no base-16 conv; shared by q257/q259, same shape as q210's
    * inline form). */
  private def duckHex(hx: String, n: Int): String =
    s"""list_reduce(list_transform(generate_series(1, $n),
       |      i -> CAST(CASE WHEN ascii(substr($hx, i, 1)) >= 97
       |            THEN ascii(substr($hx, i, 1)) - 87
       |            ELSE ascii(substr($hx, i, 1)) - 48 END AS BIGINT)
       |        * CAST(power(16, $n - i) AS BIGINT)),
       |      (a, b) -> a + b)""".stripMargin

  /** q256 — grid-cell spatial join (within-radius pairs WITHOUT the
    * all-pairs product): customers and suppliers get deterministic
    * integer milli-degree coordinates (affine hashes of their keys —
    * exact on every engine, no FP trig), each point maps to one
    * 2000-milli-degree grid cell, the SMALL side is exploded to its
    * 3×3 neighbor cells and broadcast, and the equi-join on cell id
    * feeds the exact integer distance² filter. Cell width = radius, so
    * the 3×3 neighborhood provably covers every within-radius pair;
    * coordinates are shifted non-negative before the integral divide so
    * truncation IS floor and cells tile uniformly. The oracle is the
    * definitional theta join (no cells) — two formulations, one hash.
    * Scale: the candidate set shrinks from |C|·|S| to pairs sharing a
    * neighborhood (density-proportional); the fact side never shuffles
    * (cell id is computed in the scan projection and the supplier side
    * is broadcast at 9× its dimension size). Planar approximation —
    * no meridian wraparound — documented and mirrored by the oracle. */
  val q256 = QuerySpec(
    "q256_geo_cell_join",
    (s, d) => {
      import s.implicits._
      val cust = Tables.customer(s, d).select($"c_custkey", $"c_nationkey",
          geoLatE3($"c_custkey").as("clat"), geoLonE3($"c_custkey").as("clon"))
        .withColumn("cx", cellX($"clat"))
        .withColumn("cy", cellY($"clon"))
      val supp = Tables.supplier(s, d).select($"s_suppkey",
          geoLatE3($"s_suppkey").as("slat"), geoLonE3($"s_suppkey").as("slon"))
        .withColumn("sx", cellX($"slat"))
        .withColumn("sy", cellY($"slon"))
        .withColumn("dx", explode(sequence(lit(-1), lit(1))))
        .withColumn("dy", explode(sequence(lit(-1), lit(1))))
        .select(($"sx" + $"dx").as("cx"), ($"sy" + $"dy").as("cy"),
          $"s_suppkey", $"slat", $"slon")
      val d2 = ($"clat" - $"slat") * ($"clat" - $"slat") +
        ($"clon" - $"slon") * ($"clon" - $"slon")
      cust.join(broadcast(supp), Seq("cx", "cy"))
        .filter(d2 <= 4000000L)
        .groupBy($"c_nationkey".as("nat"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct($"c_custkey").as("n_cust"),
          sum(d2).as("d2_sum"))
        .orderBy($"nat")
    },
    Some("""WITH c AS (
           |  SELECT c_custkey, c_nationkey,
           |    (c_custkey * 7919) % 180001 - 90000 AS clat,
           |    (c_custkey * 104729) % 360001 - 180000 AS clon
           |  FROM customer),
           |s AS (
           |  SELECT s_suppkey,
           |    (s_suppkey * 7919) % 180001 - 90000 AS slat,
           |    (s_suppkey * 104729) % 360001 - 180000 AS slon
           |  FROM supplier),
           |p AS (
           |  SELECT c_nationkey, c_custkey,
           |    (clat - slat) * (clat - slat) + (clon - slon) * (clon - slon) AS d2
           |  FROM c JOIN s
           |    ON (clat - slat) * (clat - slat) + (clon - slon) * (clon - slon) <= 4000000)
           |SELECT c_nationkey AS nat, count(*) AS n_pairs,
           |  CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_cust,
           |  CAST(sum(d2) AS BIGINT) AS d2_sum
           |FROM p GROUP BY 1 ORDER BY 1""".stripMargin),
  )

  /** q257 — weight-proportional Bernoulli sampling (importance sampling
    * by document length — the keep-long-docs bias every token-budget
    * pipeline applies somewhere): accept doc iff h16·w_max < 65536·w,
    * where h16 is 16 bits of the salted md5 and w_max the corpus max
    * weight — acceptance probability w/w_max per document, EXACT
    * integer comparison, zero RNG state, reproducible across engines
    * and reruns (q208's per-source thresholds generalized to per-ROW
    * weights). Scale: w_max is a 1-row broadcast; the corpus is
    * scanned once, shuffled never (final rollup is per-lang). */
  val q257 = QuerySpec(
    "q257_weighted_sample",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d).select($"doc_id", $"lang", $"n_chars")
      val wmax = docs.agg(max($"n_chars").as("wmax"))
      docs.crossJoin(broadcast(wmax))
        .withColumn("h16",
          conv(substring(md5(concat(lit("w:"), $"doc_id".cast("string"))
            .cast("binary")), 1, 4), 16, 10).cast("long"))
        .filter($"h16" * $"wmax" < lit(65536L) * $"n_chars")
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_kept"),
          sum($"n_chars").as("kept_chars"),
          sum($"doc_id").as("id_checksum"))
        .orderBy($"lang")
    },
    Some(s"""WITH w AS (SELECT max(n_chars) AS wmax FROM documents),
            |k AS (
            |  SELECT lang, doc_id, n_chars,
            |    ${duckHex("md5('w:' || CAST(doc_id AS VARCHAR))", 4)} AS h16
            |  FROM documents)
            |SELECT lang, count(*) AS n_kept,
            |  CAST(sum(n_chars) AS BIGINT) AS kept_chars,
            |  CAST(sum(doc_id) AS BIGINT) AS id_checksum
            |FROM k, w WHERE h16 * wmax < 65536 * n_chars
            |GROUP BY lang ORDER BY lang""".stripMargin),
  )

  /** q258 — exact distributed quantiles in two passes (p50/p90/p99 of
    * l_extendedprice) with NO global sort: pass 1 bins every value into
    * 1024 equal-width buckets (a map-side-combined groupBy producing a
    * 1024-row histogram — driver-sized by construction); the driver
    * walks the cumulative counts to locate, per percentile, the bucket
    * containing rank k = ceil(p·n) and the count of values before it;
    * pass 2 touches ONLY the located buckets (≈ n/1024 rows each) and
    * reads the (k − before)-th smallest as max over an ascending
    * limit. Equal values share a bucket, so rank arithmetic is exact
    * regardless of FP bucket-edge placement — bucketing only needs to
    * be CONSISTENT, not precise. The oracle is the definitional global
    * row_number readout. Scale: 2 scans + a ~n/1024-row sort vs a full
    * shuffle sort; skewed value domains cost one extra refinement
    * round (re-bin inside the hot bucket — not needed at these SFs,
    * noted for the 100 TB path). */
  val q258 = QuerySpec(
    "q258_twopass_quantile",
    (s, d) => {
      import s.implicits._
      val x = Tables.lineitem(s, d).select($"l_extendedprice".as("x"))
      val head = x.agg(count(lit(1)), min($"x"), max($"x")).head()
      val (n, mn, mx) = (head.getLong(0), head.getDouble(1), head.getDouble(2))
      // Degenerate domain (all values equal) → everything in bucket 0;
      // guards the 0-width division, which ANSI would surface as NaN.
      val bucketOf =
        if (mx == mn) lit(0)
        else least(floor(($"x" - mn) / (mx - mn) * 1024).cast("int"), lit(1023))
      val hist = x.groupBy(bucketOf.as("b")).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      def kth(p: Double): Double = {
        val k = math.ceil(p * n).toLong
        var cum = 0L
        var located: Option[(Int, Long)] = None
        hist.foreach { case (b, c) =>
          if (located.isEmpty && cum + c >= k) located = Some((b, cum))
          cum += c
        }
        val (b, before) = located.get
        x.filter(bucketOf === b).orderBy($"x").limit((k - before).toInt)
          .agg(max($"x")).head().getDouble(0)
      }
      val out = Seq((n, mn, mx, kth(0.5), kth(0.9), kth(0.99)))
      s.createDataFrame(out).toDF("n", "x_min", "x_max", "p50", "p90", "p99")
    },
    Some("""WITH s AS (SELECT l_extendedprice AS x FROM lineitem),
           |nn AS (SELECT count(*) AS n FROM s),
           |r AS (SELECT x, row_number() OVER (ORDER BY x) AS rn FROM s)
           |SELECT n, (SELECT min(x) FROM s) AS x_min, (SELECT max(x) FROM s) AS x_max,
           |  max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN x END) AS p50,
           |  max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN x END) AS p90,
           |  max(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT) THEN x END) AS p99
           |FROM r, nn GROUP BY n""".stripMargin),
  )

  /** q259 — anti-entropy digest repair (q210's digests USED): a replica
    * of `documents` diverges on every doc whose salted md5 starts
    * "00" (deterministic ≈1/256 corruption, +1 char count); both sides
    * compute per-bucket mergeable digests independently (scan-only, no
    * row exchange), the bucket comparison localizes divergence, and
    * ONLY the diverged buckets' rows are re-shipped from the primary —
    * the Merkle-less anti-entropy round Dynamo-style stores run. The
    * readout pins buckets diverged, rows re-shipped, a diverged-bucket
    * id checksum, and — the actual gate — that the post-repair digest
    * mismatch count is ZERO. Scale: repair traffic is (diverged
    * buckets)/(total buckets) of the table, not the table; digests are
    * commutative sums, so both scans partial-aggregate and ship 64
    * rows each. */
  val q259 = QuerySpec(
    "q259_anti_entropy_repair",
    (s, d) => {
      import s.implicits._
      val prim = Tables.documents(s, d).select($"doc_id", $"lang", $"source", $"n_chars")
      val corrupt = substring(md5(concat(lit("c:"), $"doc_id".cast("string"))
        .cast("binary")), 1, 2) === "00"
      val repl = prim.withColumn("n_chars",
        when(corrupt, $"n_chars" + 1L).otherwise($"n_chars"))
      def digest(df: org.apache.spark.sql.DataFrame) = df
        .select(($"doc_id" % 64L).as("bucket"),
          conv(substring(md5(concat_ws("|", $"doc_id".cast("string"), $"lang",
            $"source", $"n_chars".cast("string")).cast("binary")), 1, 8), 16, 10)
            .cast("long").as("h32"))
        .groupBy($"bucket").agg(sum($"h32").as("dig"), count(lit(1)).as("n"))
      val dp = digest(prim)
      val dr = digest(repl)
      // Bucket comparison is 64 rows by construction — the anti-entropy
      // protocol's whole point is that only this tiny frame crosses sites,
      // so collecting it driver-side IS the algorithm, not a shortcut.
      val divBuckets = dp.as("p").join(dr.as("r"), Seq("bucket"))
        .filter($"p.dig" =!= $"r.dig" || $"p.n" =!= $"r.n")
        .select($"bucket").collect().map(_.getLong(0)).sorted
      val repaired = repl.filter(!($"doc_id" % 64L).isin(divBuckets: _*))
        .unionByName(prim.filter(($"doc_id" % 64L).isin(divBuckets: _*)))
      val nMismatchAfter = digest(repaired).as("a").join(dp.as("p"), Seq("bucket"))
        .filter($"a.dig" =!= $"p.dig" || $"a.n" =!= $"p.n").count()
      val nRepaired = prim.filter(($"doc_id" % 64L).isin(divBuckets: _*)).count()
      val out = Seq((64L, divBuckets.length.toLong, divBuckets.sum, nRepaired,
        nMismatchAfter))
      s.createDataFrame(out)
        .toDF("n_buckets", "n_diverged", "diverged_checksum", "n_rows_reshipped",
          "n_mismatch_after")
    },
    Some(s"""WITH prim AS (
            |  SELECT doc_id, lang, source, n_chars FROM documents),
            |repl AS (
            |  SELECT doc_id, lang, source,
            |    CASE WHEN substr(md5('c:' || CAST(doc_id AS VARCHAR)), 1, 2) = '00'
            |      THEN n_chars + 1 ELSE n_chars END AS n_chars
            |  FROM prim),
            |dp AS (
            |  SELECT doc_id % 64 AS bucket,
            |    sum(${duckHex("md5(concat_ws('|', CAST(doc_id AS VARCHAR), lang, source, CAST(n_chars AS VARCHAR)))", 8)}) AS dig,
            |    count(*) AS n
            |  FROM prim GROUP BY 1),
            |dr AS (
            |  SELECT doc_id % 64 AS bucket,
            |    sum(${duckHex("md5(concat_ws('|', CAST(doc_id AS VARCHAR), lang, source, CAST(n_chars AS VARCHAR)))", 8)}) AS dig,
            |    count(*) AS n
            |  FROM repl GROUP BY 1),
            |div AS (
            |  SELECT dp.bucket FROM dp JOIN dr USING (bucket)
            |  WHERE dp.dig <> dr.dig OR dp.n <> dr.n)
            |SELECT CAST(64 AS BIGINT) AS n_buckets,
            |  (SELECT count(*) FROM div) AS n_diverged,
            |  (SELECT CAST(coalesce(sum(bucket), 0) AS BIGINT) FROM div) AS diverged_checksum,
            |  (SELECT count(*) FROM prim WHERE doc_id % 64 IN (SELECT bucket FROM div))
            |    AS n_rows_reshipped,
            |  CAST(0 AS BIGINT) AS n_mismatch_after""".stripMargin),
  )

  /** q269 — per-GROUP exact medians, q258's algorithm vectorized across
    * groups: ONE histogram pass builds (group, bucket) counts for every
    * group simultaneously (a map-side-combined groupBy, groups×1024
    * rows — driver-sized while the group domain is dimension-like; for
    * high-cardinality groups the locate step becomes a distributed
    * cumulative-sum join instead of a driver walk, same plan shape),
    * the driver locates each group's median bucket, and ONE second pass
    * filters to the union of located buckets, ranks within each via a
    * per-group window (≈ n/1024 rows per group — the only sort
    * anywhere), and reads the target rank. Lower median (rank
    * ceil(n/2)); duplicate values share a bucket so rank arithmetic
    * stays exact under ties. The oracle is the definitional global
    * per-group row_number readout. */
  val q269 = QuerySpec(
    "q269_grouped_exact_median",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val x = Tables.lineitem(s, d)
        .select($"l_returnflag".as("g"), $"l_extendedprice".as("x"))
      val b0 = x.agg(min($"x"), max($"x")).head()
      val (mn, mx) = (b0.getDouble(0), b0.getDouble(1))
      val bucketOf = // q258's degenerate-domain guard
        if (mx == mn) lit(0)
        else least(floor(($"x" - mn) / (mx - mn) * 1024).cast("int"), lit(1023))
      val hist = x.groupBy($"g", bucketOf.as("b")).count().collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      val locs = hist.map(_._1).distinct.sorted.map { g =>
        val rows = hist.filter(_._1 == g).sortBy(_._2)
        val n = rows.map(_._3).sum
        val k = (n + 1) / 2
        var cum = 0L
        var located: Option[(Int, Long)] = None
        rows.foreach { case (_, b, c) =>
          if (located.isEmpty && cum + c >= k) located = Some((b, cum))
          cum += c
        }
        val (b, before) = located.get
        (g, b, n, k - before)
      }
      val cand = locs.map { case (g, b, _, _) => $"g" === g && bucketOf === b }
        .reduce(_ || _)
      val targets = s.createDataFrame(
        locs.toSeq.map { case (g, _, n, r) => (g, n, r) })
        .toDF("g", "n", "target_rank")
      x.filter(cand)
        .withColumn("rn", row_number().over(Window.partitionBy($"g").orderBy($"x")))
        .join(broadcast(targets), Seq("g"))
        .filter($"rn" === $"target_rank")
        .select($"g", $"n", $"x".as("median"))
        .orderBy($"g")
    },
    Some("""WITH r AS (
           |  SELECT l_returnflag AS g, l_extendedprice AS x,
           |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
           |    count(*) OVER (PARTITION BY l_returnflag) AS n
           |  FROM lineitem)
           |SELECT g, CAST(max(n) AS BIGINT) AS n,
           |  max(CASE WHEN rn = (n + 1) // 2 THEN x END) AS median
           |FROM r GROUP BY g ORDER BY g""".stripMargin),
  )

  /** q270 — nearest neighbor WITHIN RADIUS (q256's cells + argmin):
    * for every customer, the closest supplier within 2000 milli-degrees
    * — or NULL if none — with deterministic d2-then-key tie-break. The
    * cell contract makes the 3×3 candidate set COMPLETE for the radius
    * (cell width = radius), so `min(struct(d2, key))` over candidates
    * is exact nearest-within-r, and the left join back to the full
    * customer table preserves no-match customers (the semantics an
    * inner candidate join would silently drop — same row-preservation
    * rule as q268's outer generator). Unbounded global nearest needs
    * expanding ring search (ring 2, ring 3, ... until hit) — out of
    * scope by declared semantics, noted for the 100 TB path. Scale: the
    * argmin is a map-side-combinable struct-min, no window, no sort;
    * candidates never exceed density × 9 cells per customer. */
  val q270 = QuerySpec(
    "q270_knn_within_radius",
    (s, d) => {
      import s.implicits._
      val cust = Tables.customer(s, d).select($"c_custkey", $"c_nationkey",
          geoLatE3($"c_custkey").as("clat"), geoLonE3($"c_custkey").as("clon"))
        .withColumn("cx", cellX($"clat"))
        .withColumn("cy", cellY($"clon"))
      val supp = Tables.supplier(s, d).select($"s_suppkey",
          geoLatE3($"s_suppkey").as("slat"), geoLonE3($"s_suppkey").as("slon"))
        .withColumn("sx", cellX($"slat"))
        .withColumn("sy", cellY($"slon"))
        .withColumn("dx", explode(sequence(lit(-1), lit(1))))
        .withColumn("dy", explode(sequence(lit(-1), lit(1))))
        .select(($"sx" + $"dx").as("cx"), ($"sy" + $"dy").as("cy"),
          $"s_suppkey", $"slat", $"slon")
      val d2 = ($"clat" - $"slat") * ($"clat" - $"slat") +
        ($"clon" - $"slon") * ($"clon" - $"slon")
      val nearest = cust.join(broadcast(supp), Seq("cx", "cy"))
        .filter(d2 <= 4000000L)
        .withColumn("d2", d2)
        .groupBy($"c_custkey")
        .agg(min(struct($"d2", $"s_suppkey")).as("m"))
        .select($"c_custkey", $"m.d2".as("d2"), $"m.s_suppkey".as("nn"))
      cust.join(nearest, Seq("c_custkey"), "left")
        .groupBy($"c_nationkey".as("nat"))
        .agg(count(lit(1)).as("n_cust"),
          count($"nn").as("n_matched"),
          sum($"d2").as("d2_sum"),
          sum($"nn").as("nn_checksum"))
        .orderBy($"nat")
    },
    Some("""WITH c AS (
           |  SELECT c_custkey, c_nationkey,
           |    (c_custkey * 7919) % 180001 - 90000 AS clat,
           |    (c_custkey * 104729) % 360001 - 180000 AS clon
           |  FROM customer),
           |s AS (
           |  SELECT s_suppkey,
           |    (s_suppkey * 7919) % 180001 - 90000 AS slat,
           |    (s_suppkey * 104729) % 360001 - 180000 AS slon
           |  FROM supplier),
           |cand AS (
           |  SELECT c_custkey, s_suppkey,
           |    (clat - slat) * (clat - slat) + (clon - slon) * (clon - slon) AS d2
           |  FROM c JOIN s
           |    ON (clat - slat) * (clat - slat) + (clon - slon) * (clon - slon) <= 4000000),
           |nearest AS (
           |  SELECT c_custkey, d2, s_suppkey FROM (
           |    SELECT c_custkey, d2, s_suppkey,
           |      row_number() OVER (PARTITION BY c_custkey ORDER BY d2, s_suppkey) AS rn
           |    FROM cand) WHERE rn = 1)
           |SELECT c_nationkey AS nat, count(*) AS n_cust,
           |  CAST(count(n.s_suppkey) AS BIGINT) AS n_matched,
           |  CAST(sum(n.d2) AS BIGINT) AS d2_sum,
           |  CAST(sum(n.s_suppkey) AS BIGINT) AS nn_checksum
           |FROM c LEFT JOIN nearest n USING (c_custkey)
           |GROUP BY 1 ORDER BY 1""".stripMargin),
  )

  /** q273 — UNBOUNDED nearest neighbor by expanding ring search (the
    * escalation q270 declares out of scope): every customer gets its
    * globally nearest supplier, searched ring-by-ring with a
    * termination CERTIFICATE instead of an all-pairs product. Ring r
    * searches cell Chebyshev distance ≤ r (suppliers exploded to the
    * (2r+1)² neighborhood, broadcast); a candidate found at distance d
    * is PROVEN nearest once d ≤ r·2000, because any unexplored supplier
    * sits in a cell ≥ r+1 away ⇒ axis distance > r·2000. Rings double
    * (1, 2, 4, …): one doubling after the first hit always certifies,
    * so iterations are O(log(nearest distance)), and each round
    * re-anchors on the base table minus certified keys (per-round
    * persist — q59's discipline — keeps plan depth constant). Ring is
    * capped at 64 (≈ 1.7 M broadcast cells at this supplier count);
    * stragglers past the cap — none at these SFs — fall back to a
    * direct small-side join, bounded by construction. The oracle is the
    * definitional global argmin. Scale: cost tracks LOCAL density
    * (dense regions certify at ring 1-2), not table size; the argmin
    * stays a map-side-combinable struct-min throughout. */
  val q273 = QuerySpec(
    "q273_expanding_ring_nn",
    (s, d) => {
      import s.implicits._
      val cust = Tables.customer(s, d).select($"c_custkey", $"c_nationkey",
          geoLatE3($"c_custkey").as("clat"), geoLonE3($"c_custkey").as("clon"))
        .withColumn("cx", cellX($"clat")).withColumn("cy", cellY($"clon"))
      val supp = Tables.supplier(s, d).select($"s_suppkey",
        geoLatE3($"s_suppkey").as("slat"), geoLonE3($"s_suppkey").as("slon"))
      val d2 = ($"clat" - $"slat") * ($"clat" - $"slat") +
        ($"clon" - $"slon") * ($"clon" - $"slon")
      def nearestOf(candidates: org.apache.spark.sql.DataFrame) = candidates
        .withColumn("d2", d2)
        .groupBy($"c_custkey", $"c_nationkey")
        .agg(min(struct($"d2", $"s_suppkey")).as("m"))
        .select($"c_custkey", $"c_nationkey", $"m.d2".as("d2"),
          $"m.s_suppkey".as("nn"))
      val certified = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.DataFrame]
      var remaining = cust.persist()
      // Density-derived initial ring: with S suppliers hash-scattered
      // over ~91×181 grid cells, the expected nearest sits ~sqrt(cells/S)
      // cells away — starting there instead of at ring 1 certifies the
      // bulk in the FIRST round (measured: ring-1 start cost 63 s at
      // sf0.01's sparse 100-supplier layout, density start ~8 s; every
      // ring-1 round was pure overhead because nothing could certify
      // until the ring reached the nearest-neighbor scale).
      val nSupp = supp.count()
      var ring = math.max(1L,
        math.ceil(math.sqrt(91.0 * 181.0 / math.max(1L, nSupp))).toLong)
      try {
        while (remaining.limit(1).count() > 0 && ring <= 64L) {
          val cells = supp
            .withColumn("sx", cellX($"slat")).withColumn("sy", cellY($"slon"))
            .withColumn("dx", explode(sequence(lit(-ring), lit(ring))))
            .withColumn("dy", explode(sequence(lit(-ring), lit(ring))))
            .select(($"sx" + $"dx").as("cx"), ($"sy" + $"dy").as("cy"),
              $"s_suppkey", $"slat", $"slon")
          val hit = nearestOf(remaining.join(broadcast(cells), Seq("cx", "cy")))
            .filter($"d2" <= lit(ring * 2000L) * lit(ring * 2000L))
            .persist()
          hit.limit(1).count() // materialize before re-anchoring
          certified += hit
          val next = remaining
            .join(hit.select($"c_custkey"), Seq("c_custkey"), "left_anti")
            .persist()
          next.limit(1).count()
          remaining.unpersist()
          remaining = next
          ring *= 2
        }
        // Past-cap stragglers: direct join against the (small) supplier
        // side — exact, and bounded to the leftover row count.
        val tail = nearestOf(remaining.crossJoin(broadcast(supp)))
        graft.queries.Eager(
          certified.foldLeft(tail)(_ unionByName _)
            .groupBy($"c_nationkey".as("nat"))
            .agg(count(lit(1)).as("n_cust"),
              sum($"d2").as("d2_sum"),
              sum($"nn").as("nn_checksum"))
            .orderBy($"nat"))
      } finally {
        remaining.unpersist()
        certified.foreach(_.unpersist())
      }
    },
    Some("""WITH c AS (
           |  SELECT c_custkey, c_nationkey,
           |    (c_custkey * 7919) % 180001 - 90000 AS clat,
           |    (c_custkey * 104729) % 360001 - 180000 AS clon
           |  FROM customer),
           |s AS (
           |  SELECT s_suppkey,
           |    (s_suppkey * 7919) % 180001 - 90000 AS slat,
           |    (s_suppkey * 104729) % 360001 - 180000 AS slon
           |  FROM supplier),
           |nearest AS (
           |  SELECT c_custkey, c_nationkey, d2, s_suppkey FROM (
           |    SELECT c_custkey, c_nationkey, s_suppkey,
           |      (clat - slat) * (clat - slat) + (clon - slon) * (clon - slon) AS d2,
           |      row_number() OVER (PARTITION BY c_custkey ORDER BY
           |        (clat - slat) * (clat - slat) + (clon - slon) * (clon - slon),
           |        s_suppkey) AS rn
           |    FROM c CROSS JOIN s) WHERE rn = 1)
           |SELECT c_nationkey AS nat, count(*) AS n_cust,
           |  CAST(sum(d2) AS BIGINT) AS d2_sum,
           |  CAST(sum(s_suppkey) AS BIGINT) AS nn_checksum
           |FROM nearest GROUP BY 1 ORDER BY 1""".stripMargin),
  )

  /** Bit-interleave (Morton / z-order) of two 10-bit coordinates —
    * emitted as a static OR-chain so both engines evaluate the same
    * shift/mask tree (Spark codegens it; no UDF). */
  private def mortonExpr(px: String, sy: String): String =
    (0 until 10).map(i =>
      s"((($px >> $i) & 1) << ${2 * i}) | ((($sy >> $i) & 1) << ${2 * i + 1})")
      .mkString("(", " | ", ")")

  /** q283 — z-order clustering layout audit, the 2-D extension of
    * q228's 1-D range-clustered proof: lineitem rows are assigned to 64
    * buckets two ways — by the top bits of the Morton interleave of
    * (partkey, suppkey) scaled to 10-bit grid coordinates, and by the
    * insertion-order key (the unclustered baseline) — and the audit
    * reports each layout's per-bucket bounding-box statistics. Small
    * bbox areas are precisely what makes file-level min/max skipping
    * work for 2-D predicates: a (partkey, suppkey) probe touches only
    * buckets whose box contains it, so area_sum ≈ the expected scan
    * amplification. Z-order keeps every box a ~2⁻⁶ fraction of the
    * grid; insertion order leaves every box ≈ the full grid. Shape: the
    * morton code is one codegen'd bitwise expression per row, bucketing
    * is a 64-group map-side-combined aggregate, and at 100 TB the same
    * code+`repartitionByRange(morton)` IS the clustered-write path —
    * this query is its quality gate. Integer-only throughout. */
  val q283 = QuerySpec(
    "q283_zorder_layout_audit",
    (s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d)
      val g = broadcast(li.agg(
        max($"l_partkey").as("maxp"), max($"l_suppkey").as("maxs"),
        max($"l_orderkey").as("maxo")))
      val coords = li
        .select($"l_partkey", $"l_suppkey", $"l_orderkey")
        .crossJoin(g)
        .withColumn("px", expr("l_partkey * 1024L div (maxp + 1)"))
        .withColumn("sy", expr("l_suppkey * 1024L div (maxs + 1)"))
        .withColumn("bucket_z", expr(s"${mortonExpr("px", "sy")} >> 14"))
        .withColumn("bucket_lin", expr("l_orderkey * 64L div (maxo + 1)"))
      def audit(bucket: String, label: String) = coords
        .groupBy(col(bucket).as("b"))
        .agg(((max($"px") - min($"px") + 1) * (max($"sy") - min($"sy") + 1))
          .as("area"))
        .agg(count(lit(1)).as("n_buckets"),
          sum($"area").as("area_sum"), max($"area").as("area_max"))
        .select(lit(label).as("layout"), $"n_buckets", $"area_sum", $"area_max")
      audit("bucket_z", "zorder").unionAll(audit("bucket_lin", "linear"))
        .orderBy($"layout")
    },
    Some(s"""WITH g AS (SELECT max(l_partkey) AS maxp, max(l_suppkey) AS maxs,
            |    max(l_orderkey) AS maxo FROM lineitem),
            |c AS (SELECT
            |    l_partkey * 1024 // (maxp + 1) AS px,
            |    l_suppkey * 1024 // (maxs + 1) AS sy,
            |    l_orderkey * 64 // (maxo + 1) AS bucket_lin
            |  FROM lineitem CROSS JOIN g),
            |c2 AS (SELECT *, ${mortonExpr("px", "sy")} >> 14 AS bucket_z FROM c),
            |bz AS (SELECT bucket_z, (max(px) - min(px) + 1) * (max(sy) - min(sy) + 1)
            |    AS area FROM c2 GROUP BY bucket_z),
            |bl AS (SELECT bucket_lin, (max(px) - min(px) + 1) * (max(sy) - min(sy) + 1)
            |    AS area FROM c2 GROUP BY bucket_lin)
            |SELECT 'linear' AS layout, count(*) AS n_buckets,
            |  CAST(sum(area) AS BIGINT) AS area_sum, CAST(max(area) AS BIGINT) AS area_max
            |FROM bl
            |UNION ALL
            |SELECT 'zorder', count(*), CAST(sum(area) AS BIGINT), CAST(max(area) AS BIGINT)
            |FROM bz ORDER BY layout""".stripMargin),
  )

  /** q287 — exact WEIGHTED median per group (q269 covers the unweighted
    * case): per supplier nation, the quantity-weighted median extended
    * price — the robust "typical traded price" that per-row medians
    * get wrong by ignoring volume. Two-level shape: (nation, price) pre-aggregation
    * collapses weight ties FIRST (map-side combinable, so the window
    * below sees distinct prices, not raw rows), then a per-nation
    * cumulative-weight window picks the lower weighted median — the
    * first price whose running weight reaches half the total. The
    * median VALUE is copied from the data, never computed, so no float
    * arithmetic enters the hash. Window partitions are nation-sized
    * distinct-price lists, not row counts. */
  val q287 = QuerySpec(
    "q287_weighted_median",
    (s, d) => {
      import s.implicits._
      val w = Tables.lineitem(s, d)
        .join(broadcast(Tables.supplier(s, d)
          .select($"s_suppkey", $"s_nationkey")), $"l_suppkey" === $"s_suppkey")
        .select($"s_nationkey".as("nat"), $"l_extendedprice".as("price"),
          $"l_quantity".cast("long").as("wt"))
        .groupBy($"nat", $"price")
        .agg(sum($"wt").as("wt"))
      val win = Window.partitionBy($"nat").orderBy($"price")
      w.withColumn("cum", sum($"wt").over(win))
        .withColumn("total", sum($"wt").over(Window.partitionBy($"nat")))
        .filter($"cum" * 2 >= $"total")
        .groupBy($"nat")
        .agg(min($"price").as("wmedian_price"), max($"total").as("weight_total"))
        .orderBy($"nat")
    },
    Some("""WITH w AS (
           |  SELECT s_nationkey AS nat, l_extendedprice AS price,
           |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wt
           |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
           |  GROUP BY 1, 2),
           |c AS (
           |  SELECT nat, price, wt,
           |    sum(wt) OVER (PARTITION BY nat ORDER BY price
           |      ROWS UNBOUNDED PRECEDING) AS cum,
           |    sum(wt) OVER (PARTITION BY nat) AS total
           |  FROM w)
           |SELECT nat, min(price) AS wmedian_price,
           |  CAST(max(total) AS BIGINT) AS weight_total
           |FROM c WHERE cum * 2 >= total GROUP BY nat ORDER BY nat""".stripMargin),
  )

  /** q294 — rendezvous (highest-random-weight) shard rebalance: assign
    * every document to its argmax-of-md5(doc:shard) shard under 8
    * shards and again under 12, and report, per original shard, how
    * many documents MOVE — versus the naive `doc_id % n` assignment
    * rebalanced the same way. HRW's guarantee is the point: growing
    * 8→12 moves only the docs whose new-shard hash wins (expected 4/12
    * ≈ 33%), and survivors NEVER shuffle among the old shards, while
    * mod-rehash scatters ~92% of the corpus. At 100 TB this is the
    * difference between re-copying a third of the data and re-copying
    * all of it.
    *
    * Shape: assignment is pure per-row array math (transform over a
    * literal shard sequence + array_max on (hash, shard) structs — one
    * codegen'd projection, no shuffle, no join); only the 8-row
    * per-shard rollup aggregates. Determinism: md5 hex strings compare
    * identically everywhere; the struct argmax ties on shard id, and
    * md5 collisions don't occur in practice. */
  val q294 = QuerySpec(
    "q294_rendezvous_rebalance",
    (s, d) => {
      import s.implicits._
      def best(n: Int) = expr(
        s"""array_max(transform(sequence(0, ${n - 1}),
           |  sh -> struct(md5(cast(concat(cast(doc_id as string), ':',
           |    cast(sh as string)) as binary)) as w, sh))).sh""".stripMargin)
      Tables.documents(s, d)
        .select($"doc_id",
          best(8).cast("long").as("hrw8"), best(12).cast("long").as("hrw12"),
          ($"doc_id" % 8).as("mod8"), ($"doc_id" % 12).as("mod12"))
        .groupBy($"hrw8".as("shard8"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when($"hrw12" =!= $"hrw8", 1L).otherwise(0L)).as("n_moved_hrw"),
          sum(when($"mod12" =!= $"mod8", 1L).otherwise(0L)).as("n_moved_mod"))
        .withColumn("moved_hrw_ppm", expr("n_moved_hrw * 1000000L div n_docs"))
        .withColumn("moved_mod_ppm", expr("n_moved_mod * 1000000L div n_docs"))
        .orderBy($"shard8")
    },
    Some("""WITH asg AS (
           |  SELECT doc_id,
           |    (SELECT sh FROM unnest(range(8)) AS t(sh)
           |      ORDER BY md5(doc_id::VARCHAR || ':' || sh::VARCHAR) DESC, sh
           |      LIMIT 1) AS hrw8,
           |    (SELECT sh FROM unnest(range(12)) AS t(sh)
           |      ORDER BY md5(doc_id::VARCHAR || ':' || sh::VARCHAR) DESC, sh
           |      LIMIT 1) AS hrw12,
           |    doc_id % 8 AS mod8, doc_id % 12 AS mod12
           |  FROM documents)
           |SELECT hrw8 AS shard8, count(*) AS n_docs,
           |  CAST(sum(CASE WHEN hrw12 <> hrw8 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_moved_hrw,
           |  CAST(sum(CASE WHEN mod12 <> mod8 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_moved_mod,
           |  CAST(sum(CASE WHEN hrw12 <> hrw8 THEN 1 ELSE 0 END) AS BIGINT)
           |    * 1000000 // count(*) AS moved_hrw_ppm,
           |  CAST(sum(CASE WHEN mod12 <> mod8 THEN 1 ELSE 0 END) AS BIGINT)
           |    * 1000000 // count(*) AS moved_mod_ppm
           |FROM asg GROUP BY hrw8 ORDER BY shard8""".stripMargin),
  )

  /** q301 — point-in-polygon geofence classification, the spatial
    * family's (q256/q270/q273) containment gate: count customers inside
    * a non-convex 6-edge fence by exact-integer ray casting. A
    * rightward ray from (px,py) crosses edge (x1,y1)→(x2,y2) iff the
    * edge straddles the scan line ((y1>py) ≠ (y2>py)) and the point is
    * left of the intersection — the division-free cross-multiplied
    * test (px−x1)(y2−y1) ⋛ (py−y1)(x2−x1) with the comparison flipped
    * by the edge direction. Odd crossings = inside. No FP anywhere, so
    * both engines agree on every boundary-adjacent point. Scale: the
    * polygon is a 6-row broadcast — per point O(edges) work inside one
    * stage, then one per-nation rollup; a polygon SET extends this with
    * a bbox-bucket pre-join (q256's grid) before the exact test. The
    * edge fold is a row-local array HOF — NOT an explode+groupBy, which
    * would shuffle |points|·|edges| rows to reassemble what never
    * needed to leave the row. */
  val q301 = QuerySpec(
    "q301_point_in_polygon",
    (s, d) => {
      import s.implicits._
      val pts = Tables.customer(s, d)
        .select($"c_custkey", $"c_nationkey".as("nat"),
          geoLonE3($"c_custkey").as("px"), geoLatE3($"c_custkey").as("py"))
      val crossings = size(filter(typedLit(PolygonEdges), e => {
        val (x1, y1, x2, y2) = (e("_1"), e("_2"), e("_3"), e("_4"))
        val lhs = ($"px" - x1) * (y2 - y1)
        val rhs = ($"py" - y1) * (x2 - x1)
        ((y1 > $"py") =!= (y2 > $"py")) &&
          ((y2 > y1 && lhs < rhs) || (y2 < y1 && lhs > rhs))
      }))
      pts.withColumn("inside", crossings % 2 === 1)
        .groupBy($"nat")
        .agg(count(lit(1)).as("n_points"),
          sum(when($"inside", 1L).otherwise(0L)).as("n_inside"),
          sum(when($"inside", $"c_custkey").otherwise(0L)).as("inside_key_sum"))
        .orderBy($"nat")
    },
    Some("""WITH pts AS (
           |  SELECT c_custkey, c_nationkey AS nat,
           |    (c_custkey * 104729) % 360001 - 180000 AS px,
           |    (c_custkey * 7919) % 180001 - 90000 AS py
           |  FROM customer),
           |edges(x1, y1, x2, y2) AS (VALUES
           |  (-150000, 0, -50000, 60000), (-50000, 60000, 0, 20000),
           |  (0, 20000, 100000, 60000), (100000, 60000, 150000, -40000),
           |  (150000, -40000, -20000, -70000), (-20000, -70000, -150000, 0)),
           |cr AS (
           |  SELECT c_custkey, nat,
           |    sum(CASE WHEN ((y1 > py) <> (y2 > py)) AND
           |      ((y2 > y1 AND (px - x1) * (y2 - y1) < (py - y1) * (x2 - x1)) OR
           |       (y2 < y1 AND (px - x1) * (y2 - y1) > (py - y1) * (x2 - x1)))
           |      THEN 1 ELSE 0 END) AS crossings
           |  FROM pts CROSS JOIN edges
           |  GROUP BY c_custkey, nat)
           |SELECT nat, count(*) AS n_points,
           |  CAST(sum(CASE WHEN crossings % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_inside,
           |  CAST(sum(CASE WHEN crossings % 2 = 1 THEN c_custkey ELSE 0 END)
           |    AS BIGINT) AS inside_key_sum
           |FROM cr GROUP BY nat ORDER BY nat""".stripMargin),
  )

  /** The q301 fence, one row per directed edge (closed loop, integer
    * milli-degree lon/lat — x=lon, y=lat in the geo family's frame). */
  private val PolygonEdges: Seq[(Long, Long, Long, Long)] = {
    val v = Seq((-150000L, 0L), (-50000L, 60000L), (0L, 20000L),
      (100000L, 60000L), (150000L, -40000L), (-20000L, -70000L))
    (v :+ v.head).sliding(2).map { case Seq((x1, y1), (x2, y2)) =>
      (x1, y1, x2, y2)
    }.toSeq
  }

  /** q307 — join-cardinality preflight: the O(|keys|) check run BEFORE
    * an O(Σc²) self-join is allowed to execute. A partkey self-join's
    * exact output size is Σₖ c(k)² over the per-key count frame — two
    * aggregates instead of the join itself, which is the difference
    * between "learned the join explodes from the bill" and "knew in
    * advance" at 100 TB. Reports the 5 hottest keys with their pair
    * contribution and share ppm, the global pair total and key count
    * carried on every row (1-row broadcast, not a second scan). The
    * same frame is what a salting pass (q77) keys off. */
  val q307 = QuerySpec(
    "q307_join_cardinality_preflight",
    (s, d) => {
      import s.implicits._
      val c = Tables.lineitem(s, d)
        .groupBy($"l_partkey").agg(count(lit(1)).as("cnt"))
        .withColumn("pairs", $"cnt" * $"cnt")
      val tot = c.agg(sum($"pairs").as("pairs_total"),
        count(lit(1)).as("n_keys"))
      val top = c.crossJoin(broadcast(tot))
        .withColumn("share_ppm", expr("pairs * 1000000L div pairs_total"))
        .orderBy($"pairs".desc, $"l_partkey")
        .limit(5)
        .select($"l_partkey", $"cnt", $"pairs", $"share_ppm",
          $"pairs_total", $"n_keys")
      top
    },
    Some("""WITH c AS (
           |  SELECT l_partkey, count(*) AS cnt, count(*) * count(*) AS pairs
           |  FROM lineitem GROUP BY 1),
           |t AS (SELECT CAST(sum(pairs) AS BIGINT) AS pairs_total,
           |             count(*) AS n_keys FROM c)
           |SELECT l_partkey, cnt, CAST(pairs AS BIGINT) AS pairs,
           |  CAST(pairs AS BIGINT) * 1000000 // pairs_total AS share_ppm,
           |  pairs_total, n_keys
           |FROM c CROSS JOIN t
           |ORDER BY pairs DESC, l_partkey LIMIT 5""".stripMargin),
  )

  /** q309 — dictionary-encoding layout audit: for each low-cardinality
    * string column, the exact dictionary width (bits = len(bin(d−1)),
    * the same integer on both engines), projected encoded size
    * n_rows·width vs raw UTF-8 bits, and the savings ppm — the
    * planning arithmetic behind choosing dictionary vs plain encoding
    * per column at write time (parquet does this per page; a 100 TB
    * layout job does it per column family from exactly these two
    * aggregates). One scan per audited table, group-count-sized
    * frames after. */
  val q309 = QuerySpec(
    "q309_dict_encode_audit",
    (s, d) => {
      import s.implicits._
      def audit(df: org.apache.spark.sql.DataFrame, table: String, c: String) =
        df.select(col(c).as("v"))
          .agg(count(lit(1)).as("n_rows"),
            countDistinct($"v").as("n_distinct"),
            sum(length($"v")).as("raw_chars"))
          .select(lit(table).as("tbl"), lit(c).as("col"),
            $"n_rows", $"n_distinct",
            length(bin(greatest($"n_distinct" - 1L, lit(1L)))).cast("long")
              .as("dict_bits"),
            ($"raw_chars" * 8L).as("raw_bits"))
      val li = Tables.lineitem(s, d)
      val ord = Tables.orders(s, d)
      audit(li, "lineitem", "l_returnflag")
        .unionByName(audit(li, "lineitem", "l_linestatus"))
        .unionByName(audit(ord, "orders", "o_orderstatus"))
        .unionByName(audit(ord, "orders", "o_orderpriority"))
        .withColumn("enc_bits", $"n_rows" * $"dict_bits")
        .withColumn("savings_ppm",
          expr("(raw_bits - enc_bits) * 1000000L div raw_bits"))
        .orderBy($"tbl", $"col")
    },
    Some {
      def arm(t: String, c: String) =
        s"""SELECT '$t' AS tbl, '$c' AS col, count(*) AS n_rows,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  CAST(len(bin(greatest(count(DISTINCT $c) - 1, 1))) AS BIGINT)
           |    AS dict_bits,
           |  CAST(sum(len($c)) * 8 AS BIGINT) AS raw_bits
           |FROM $t""".stripMargin
      s"""WITH a AS (
         |${arm("lineitem", "l_returnflag")}
         |UNION ALL
         |${arm("lineitem", "l_linestatus")}
         |UNION ALL
         |${arm("orders", "o_orderstatus")}
         |UNION ALL
         |${arm("orders", "o_orderpriority")})
         |SELECT tbl, col, n_rows, n_distinct, dict_bits, raw_bits,
         |  n_rows * dict_bits AS enc_bits,
         |  (raw_bits - n_rows * dict_bits) * 1000000 // raw_bits AS savings_ppm
         |FROM a ORDER BY tbl, col""".stripMargin
    },
  )

  /** q322 — key-skew Gini audit: the single number that decides
    * whether a join/agg key needs salting (q77) before it burns a
    * cluster. Exact Gini over per-key counts WITHOUT ranking |keys|
    * rows: collapse the count frame to its count-VALUE histogram
    * (c, m(c)) — bounded by the distinct count values, hundreds at any
    * scale — and use the closed form for rank sums within a tie block:
    * Σᵢ i·cᵢ over a block of m keys of count c starting after R keys =
    * c·(R·m + m(m+1)/2). Gini = (2Σi·cᵢ − (n+1)Σc)/(n·Σc), emitted as
    * exact integer num/den + ppm. Two audited keys: the near-uniform
    * partkey and the hotter custkey distribution. */
  val q322 = QuerySpec(
    "q322_key_skew_gini",
    (s, d) => {
      import s.implicits._
      def gini(df: org.apache.spark.sql.DataFrame, keyCol: String, tag: String) = {
        val counts = df.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("c"))
        val hist = counts.groupBy($"c").agg(count(lit(1)).as("m"))
        val w = Window.orderBy($"c").rowsBetween(Window.unboundedPreceding, -1)
        hist
          .withColumn("r_before", coalesce(sum($"m").over(w), lit(0L)))
          .select(
            expr("c * (r_before * m + (m * (m + 1L)) div 2L)").as("ranksum"),
            ($"c" * $"m").as("mass"), $"m")
          .agg(sum($"ranksum").as("sr"), sum($"mass").as("tot"),
            sum($"m").as("n_keys"))
          .select(lit(tag).as("key"), $"n_keys", $"tot".as("n_rows"),
            (lit(2L) * $"sr" - ($"n_keys" + 1L) * $"tot").as("gini_num"),
            ($"n_keys" * $"tot").as("gini_den"))
          .withColumn("gini_ppm", expr("gini_num * 1000000L div gini_den"))
      }
      gini(Tables.lineitem(s, d), "l_partkey", "lineitem.l_partkey")
        .unionByName(gini(Tables.orders(s, d), "o_custkey", "orders.o_custkey"))
        .orderBy($"key")
    },
    Some {
      def arm(t: String, k: String, tag: String) =
        s"""SELECT '$tag' AS key, n_keys, tot AS n_rows,
           |  2 * sr - (n_keys + 1) * tot AS gini_num,
           |  n_keys * tot AS gini_den,
           |  (2 * sr - (n_keys + 1) * tot) * 1000000 // (n_keys * tot) AS gini_ppm
           |FROM (
           |  SELECT CAST(sum(c * (r_before * m + m * (m + 1) // 2)) AS BIGINT) AS sr,
           |    CAST(sum(c * m) AS BIGINT) AS tot, CAST(sum(m) AS BIGINT) AS n_keys
           |  FROM (
           |    SELECT c, m, coalesce(sum(m) OVER (ORDER BY c
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS r_before
           |    FROM (SELECT c, count(*) AS m
           |          FROM (SELECT $k, count(*) AS c FROM $t GROUP BY $k)
           |          GROUP BY c)))""".stripMargin
      s"""SELECT * FROM (
         |${arm("lineitem", "l_partkey", "lineitem.l_partkey")}
         |UNION ALL
         |${arm("orders", "o_custkey", "orders.o_custkey")})
         |ORDER BY key""".stripMargin
    },
  )

  /** q327 — max-min fair-share allocation (progressive water-filling),
    * the quota governor q208/q69's fixed caps approximate: divide a
    * global token budget B across sources so that no source able to
    * use less is starved by one demanding more. Closed form on the
    * demand-sorted frame: the water level starts at position j* = the
    * first j where B − prefix_{j−1} < d_j·(n−j+1); sources before j*
    * receive their demand, sources at/after j* receive
    * L = (B − prefix_{j*−1}) div (n−j*+1), and the division remainder
    * goes +1 each to the first r capped sources in sort order — so
    * ALLOCATIONS SUM EXACTLY TO B, integer-deterministically. Scale:
    * demands are one grouped aggregate; everything after runs on the
    * |sources|-sized frame. */
  val q327 = QuerySpec(
    "q327_maxmin_fairshare",
    (s, d) => {
      import s.implicits._
      val dem = Tables.documents(s, d)
        .groupBy($"source").agg(sum($"n_chars").as("demand"))
      val w = Window.orderBy($"demand", $"source")
      val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
      val ranked = dem
        .withColumn("rn", row_number().over(w))
        .withColumn("prefix", coalesce(sum($"demand").over(wPrev), lit(0L)))
        .crossJoin(broadcast(
          dem.agg(count(lit(1)).as("n"),
            expr("sum(demand) div 2L").as("budget"))))
      val jstar = ranked
        .filter($"budget" - $"prefix" < $"demand" * ($"n" - $"rn" + 1L))
        .agg(min(struct($"rn", $"prefix")).as("js"))
        .select($"js.rn".as("js_rn"), $"js.prefix".as("js_prefix"))
      ranked.crossJoin(broadcast(jstar))
        .withColumn("rem_budget", $"budget" - $"js_prefix")
        .withColumn("n_capped", $"n" - $"js_rn" + 1L)
        .withColumn("level", expr("rem_budget div n_capped"))
        .withColumn("rem", expr("rem_budget % n_capped"))
        .withColumn("alloc",
          when($"rn" < $"js_rn", $"demand")
            .otherwise($"level" +
              when($"rn" - $"js_rn" < $"rem", 1L).otherwise(0L)))
        .select($"source", $"demand", $"alloc",
          ($"rn" >= $"js_rn").as("capped"))
        .orderBy($"source")
    },
    Some("""WITH dem AS (
           |  SELECT source, CAST(sum(n_chars) AS BIGINT) AS demand
           |  FROM documents GROUP BY source),
           |g AS (SELECT count(*) AS n, CAST(sum(demand) AS BIGINT) // 2 AS budget
           |      FROM dem),
           |r AS (
           |  SELECT source, demand,
           |    row_number() OVER (ORDER BY demand, source) AS rn,
           |    coalesce(CAST(sum(demand) OVER (ORDER BY demand, source
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
           |      AS prefix
           |  FROM dem),
           |js AS (
           |  SELECT min(rn) AS js_rn FROM r CROSS JOIN g
           |  WHERE budget - prefix < demand * (n - rn + 1)),
           |jp AS (SELECT r.rn AS js_rn, r.prefix AS js_prefix
           |       FROM r JOIN js ON r.rn = js.js_rn)
           |SELECT source, demand,
           |  CASE WHEN rn < js_rn THEN demand
           |       ELSE (budget - js_prefix) // (n - js_rn + 1)
           |         + CASE WHEN rn - js_rn < (budget - js_prefix) % (n - js_rn + 1)
           |                THEN 1 ELSE 0 END END AS alloc,
           |  rn >= js_rn AS capped
           |FROM r CROSS JOIN g CROSS JOIN jp
           |ORDER BY source""".stripMargin),
  )

  /** q340 — sampled join-size estimation beside q307's exact Σc²: the
    * O(|keys|/p) estimator a planner can afford when even the grouped
    * count frame is too hot to scan fully. Keys enter the sample iff
    * md5(key) lands in 1/8 of hash space — deterministic, no RNG —
    * and the Horvitz-Thompson scale-up 8·Σ_{sampled} c(k)² estimates
    * the self-join size; both the exact value and the signed error
    * ppm ship in the output, so the estimator's quality IS the row.
    * Scale note: the sample decision happens on the GROUPED frame's
    * key, so the raw table is still scanned once — what the sampling
    * saves is the downstream estimation pipeline, and at 100 TB the
    * same hash gate pushed into the scan samples the raw rows too. */
  val q340 = QuerySpec(
    "q340_join_size_estimator",
    (s, d) => {
      import s.implicits._
      val c = Tables.lineitem(s, d)
        .groupBy($"l_partkey").agg(count(lit(1)).as("cnt"))
        .withColumn("pairs", $"cnt" * $"cnt")
        .withColumn("sampled",
          // conv() returns STRING — cast to long BEFORE % 8 (q311/q314's
          // pattern) rather than riding implicit string→double coercion.
          expr("cast(conv(substring(md5(cast(cast(l_partkey as string) as binary)), 1, 4), 16, 10) as bigint) % 8") === 0)
      c.agg(
          sum($"pairs").as("exact_pairs"),
          (sum(when($"sampled", $"pairs").otherwise(0L)) * 8L).as("est_pairs"),
          sum(when($"sampled", 1L).otherwise(0L)).as("n_sampled"),
          count(lit(1)).as("n_keys"))
        .withColumn("err_ppm",
          expr("(est_pairs - exact_pairs) * 1000000L div exact_pairs"))
    },
    Some("""WITH c AS (
           |  SELECT l_partkey, count(*) AS cnt, count(*) * count(*) AS pairs,
           |    CAST('0x' || substr(md5(l_partkey::VARCHAR), 1, 4) AS BIGINT) % 8 = 0
           |      AS sampled
           |  FROM lineitem GROUP BY 1)
           |SELECT CAST(sum(pairs) AS BIGINT) AS exact_pairs,
           |  CAST(sum(CASE WHEN sampled THEN pairs ELSE 0 END) * 8 AS BIGINT)
           |    AS est_pairs,
           |  CAST(sum(CASE WHEN sampled THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
           |  count(*) AS n_keys,
           |  (CAST(sum(CASE WHEN sampled THEN pairs ELSE 0 END) * 8 AS BIGINT)
           |    - CAST(sum(pairs) AS BIGINT)) * 1000000
           |    // CAST(sum(pairs) AS BIGINT) AS err_ppm
           |FROM c""".stripMargin),
  )

  /** q427 — shuffle-partition skew planner: before keying a 100 TB
    * shuffle on a column, predict the partition-size distribution it
    * will produce — the preflight that decides between plain hash
    * partitioning, salting (q77), and AQE skew splitting. Keys map to
    * 32 partitions by a PORTABLE deterministic hash (first two md5
    * nibbles mod 32 — Spark's internal Murmur3 isn't mirrorable, and
    * the audit's subject is the distribution shape, not Spark's exact
    * placement). Single-row readout: partition count, min/mean/max
    * rows, max/mean imbalance ppm, and how many partitions exceed 2×
    * mean (the AQE skew-split trigger shape). Two aggregates: fact →
    * 32-row partition histogram → 1 row. */
  val q427 = QuerySpec(
    "q427_partition_skew_planner",
    (s, d) => {
      import s.implicits._
      val parts = Tables.fanOut(Tables.lineitem(s, d), col("l_orderkey"))
        .select((conv(substring(md5(concat(lit("pt|"),
          $"l_orderkey".cast("string")).cast("binary")), 1, 2), 16, 10)
          .cast("long") % 32).as("p"))
        .groupBy($"p").agg(count(lit(1)).as("rows"))
      // Mean is over the 32 TARGET partitions, not the non-empty ones —
      // a single hot key must read as 32e6 ppm imbalance, not "balanced".
      val tot = parts.agg(sum($"rows").as("tot"))
      parts.crossJoin(broadcast(tot))
        .agg(
          count(lit(1)).as("n_nonempty_partitions"),
          max($"tot").as("n_rows"),
          min($"rows").as("min_rows"),
          expr("max(tot) div 32L").as("mean_rows"),
          max($"rows").as("max_rows"),
          expr("max(rows) * 1000000L div greatest(max(tot) div 32L, 1L)")
            .as("imbalance_ppm"),
          sum(when($"rows" > lit(2L) * expr("tot div 32L"), 1L).otherwise(0L))
            .as("n_skewed"))
    },
    Some("""WITH parts AS (
           |  SELECT CAST(strpos('0123456789abcdef', substr(md5('pt|' || l_orderkey), 1, 1)) - 1 AS BIGINT) * 16
           |       + CAST(strpos('0123456789abcdef', substr(md5('pt|' || l_orderkey), 2, 1)) - 1 AS BIGINT) AS h,
           |    count(*) AS rows_
           |  FROM lineitem GROUP BY 1),
           |p2 AS (SELECT h % 32 AS p, sum(rows_) AS rows_ FROM parts GROUP BY 1),
           |tot AS (SELECT CAST(sum(rows_) AS BIGINT) AS tot FROM p2)
           |SELECT count(*) AS n_nonempty_partitions,
           |  CAST(max(tot) AS BIGINT) AS n_rows,
           |  CAST(min(rows_) AS BIGINT) AS min_rows,
           |  CAST(max(tot) // 32 AS BIGINT) AS mean_rows,
           |  CAST(max(rows_) AS BIGINT) AS max_rows,
           |  CAST(max(rows_) * 1000000 // greatest(max(tot) // 32, 1) AS BIGINT) AS imbalance_ppm,
           |  CAST(sum(CASE WHEN rows_ > 2 * (tot // 32)
           |    THEN 1 ELSE 0 END) AS BIGINT) AS n_skewed
           |FROM p2 CROSS JOIN tot""".stripMargin),
  )

  /** q431 — Bloom-filter sizing planner for the runtime-filter keys
    * (q190's bloom joins, configured instead of guessed): for each
    * candidate key column, measure the exact distinct-key count and
    * derive the optimal filter geometry at 1% FPP — bits
    * m = ⌈n·(−ln p)/ln²2⌉ and hashes k = round((m/n)·ln 2) — with the
    * transcendental factors precomputed as integer ppm constants
    * (9585059 and 693147; q343's Benford-table move), so both engines
    * compute identical pure-integer plans. Each distinct count is the
    * standard two-phase exact distinct; the planner frame is one row
    * per audited column. */
  val q431 = QuerySpec(
    "q431_bloom_size_planner",
    (s, d) => {
      import s.implicits._
      def row(tbl: String, colName: String, df: org.apache.spark.sql.DataFrame) =
        df.agg(countDistinct(col(colName)).as("n_keys"))
          .select(lit(tbl).as("tbl"), lit(colName).as("key_col"), $"n_keys")
      row("lineitem", "l_orderkey", Tables.lineitem(s, d))
        .unionAll(row("lineitem", "l_partkey", Tables.lineitem(s, d)))
        .unionAll(row("orders", "o_custkey", Tables.orders(s, d)))
        .unionAll(row("events", "user_id", Tables.events(s, d)))
        .select($"tbl", $"key_col", $"n_keys",
          expr("(n_keys * 9585059L + 999999L) div 1000000L").as("m_bits"))
        .select($"tbl", $"key_col", $"n_keys", $"m_bits",
          expr("m_bits div 8192L").as("m_kib"),
          expr("(m_bits * 693147L + (n_keys * 1000000L) div 2L) div (n_keys * 1000000L)")
            .as("k_hashes"))
        .orderBy($"tbl", $"key_col")
    },
    Some("""WITH n AS (
           |  SELECT 'lineitem' AS tbl, 'l_orderkey' AS key_col,
           |    CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_keys FROM lineitem
           |  UNION ALL
           |  SELECT 'lineitem', 'l_partkey',
           |    CAST(count(DISTINCT l_partkey) AS BIGINT) FROM lineitem
           |  UNION ALL
           |  SELECT 'orders', 'o_custkey',
           |    CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders
           |  UNION ALL
           |  SELECT 'events', 'user_id',
           |    CAST(count(DISTINCT user_id) AS BIGINT) FROM events),
           |m AS (SELECT tbl, key_col, n_keys,
           |    (n_keys * 9585059 + 999999) // 1000000 AS m_bits FROM n)
           |SELECT tbl, key_col, n_keys, m_bits,
           |  m_bits // 8192 AS m_kib,
           |  (m_bits * 693147 + (n_keys * 1000000) // 2) // (n_keys * 1000000) AS k_hashes
           |FROM m ORDER BY tbl, key_col""".stripMargin),
  )

  /** q436 — broadcast-vs-shuffle join planner: the third leg of the
    * ops-planner trio (q427 skew, q431 bloom geometry) — estimate each
    * table's in-memory relation size from EXACT column statistics
    * (numeric widths × rows + measured total string bytes + per-row
    * overhead, the same inputs Catalyst's sizeInBytes uses) and call
    * broadcast vs shuffle against the classic 10 MiB
    * autoBroadcastJoinThreshold. Pure-integer identical estimates on
    * both engines; one single-row aggregate per audited table. At 100 TB
    * the verdicts flip exactly where the plan should: dims stay
    * broadcast, facts never do. */
  val q436 = QuerySpec(
    "q436_broadcast_planner",
    (s, d) => {
      import s.implicits._
      def est(tbl: String, df: org.apache.spark.sql.DataFrame,
          numWidth: Long, strCols: Seq[String]) = {
        val strBytes =
          if (strCols.isEmpty) lit(0L)
          else strCols.map(c => sum(length(col(c)).cast("long"))).reduce(_ + _)
        df.agg(count(lit(1)).as("n_rows"), strBytes.as("str_bytes"))
          .select(lit(tbl).as("tbl"), $"n_rows",
            ($"n_rows" * lit(numWidth + 12L) + coalesce($"str_bytes", lit(0L)))
              .as("est_bytes"))
      }
      val rows = Seq(
        est("region", Tables.region(s, d), 4L, Seq("r_name")),
        est("nation", Tables.nation(s, d), 8L, Seq("n_name")),
        est("supplier", Tables.supplier(s, d), 20L, Seq("s_name")),
        est("customer", Tables.customer(s, d), 20L, Seq("c_name", "c_mktsegment")),
        est("part", Tables.part(s, d), 20L, Seq("p_name", "p_brand", "p_type")),
        est("orders", Tables.orders(s, d), 32L, Seq("o_orderstatus", "o_orderpriority")),
        est("lineitem", Tables.lineitem(s, d), 68L, Seq("l_returnflag", "l_linestatus")))
      rows.reduce(_ unionAll _)
        .withColumn("verdict",
          when($"est_bytes" < 10L * 1024L * 1024L, "broadcast")
            .otherwise("shuffle"))
        .orderBy($"tbl")
    },
    Some("""WITH t AS (
           |  SELECT 'region' AS tbl, count(*) AS n_rows,
           |    CAST(count(*) * (4 + 12) + coalesce(sum(length(r_name)), 0) AS BIGINT) AS est_bytes
           |  FROM region
           |  UNION ALL
           |  SELECT 'nation', count(*),
           |    CAST(count(*) * (8 + 12) + coalesce(sum(length(n_name)), 0) AS BIGINT)
           |  FROM nation
           |  UNION ALL
           |  SELECT 'supplier', count(*),
           |    CAST(count(*) * (20 + 12) + coalesce(sum(length(s_name)), 0) AS BIGINT)
           |  FROM supplier
           |  UNION ALL
           |  SELECT 'customer', count(*),
           |    CAST(count(*) * (20 + 12)
           |      + coalesce(sum(length(c_name)), 0) + coalesce(sum(length(c_mktsegment)), 0) AS BIGINT)
           |  FROM customer
           |  UNION ALL
           |  SELECT 'part', count(*),
           |    CAST(count(*) * (20 + 12)
           |      + coalesce(sum(length(p_name)), 0) + coalesce(sum(length(p_brand)), 0)
           |      + coalesce(sum(length(p_type)), 0) AS BIGINT)
           |  FROM part
           |  UNION ALL
           |  SELECT 'orders', count(*),
           |    CAST(count(*) * (32 + 12)
           |      + coalesce(sum(length(o_orderstatus)), 0) + coalesce(sum(length(o_orderpriority)), 0) AS BIGINT)
           |  FROM orders
           |  UNION ALL
           |  SELECT 'lineitem', count(*),
           |    CAST(count(*) * (68 + 12)
           |      + coalesce(sum(length(l_returnflag)), 0) + coalesce(sum(length(l_linestatus)), 0) AS BIGINT)
           |  FROM lineitem)
           |SELECT tbl, CAST(n_rows AS BIGINT) AS n_rows, est_bytes,
           |  CASE WHEN est_bytes < 10 * 1024 * 1024 THEN 'broadcast' ELSE 'shuffle' END AS verdict
           |FROM t ORDER BY tbl""".stripMargin),
  )

  /** q452 — storage-tiering planner (the lifecycle-policy sibling of
    * q436's broadcast planner): bucket the fact table by order year,
    * estimate each bucket's bytes with q436's exact column-stat
    * formula, and assign hot/warm/cold tiers by age against the
    * newest year — plus the exact byte share that a cold tier would
    * move off premium storage. Pure-integer estimates; one
    * orders-sized aggregate to a |years|-row frame. */
  val q452 = QuerySpec(
    "q452_storage_tier_planner",
    (s, d) => {
      import s.implicits._
      val per = Tables.fanOut(Tables.orders(s, d), col("o_orderkey"))
        .groupBy(year($"o_orderdate").cast("bigint").as("o_year"))
        .agg(count(lit(1)).as("n_rows"),
          (sum(length($"o_orderstatus") + length($"o_orderpriority"))
            + count(lit(1)) * lit(44L)).as("est_bytes"))
      val mx = per.agg(max($"o_year").as("ymax"),
        sum($"est_bytes").as("total_bytes"))
      per.crossJoin(broadcast(mx))
        .select($"o_year", $"n_rows", $"est_bytes",
          when($"ymax" - $"o_year" <= 1L, "hot")
            .when($"ymax" - $"o_year" <= 3L, "warm")
            .otherwise("cold").as("tier"),
          expr("est_bytes * 1000000L div total_bytes").as("share_ppm"))
        .withColumn("cold_savings_ppm",
          when($"tier" === "cold", $"share_ppm").otherwise(0L))
        .orderBy($"o_year")
    },
    Some("""WITH per AS (
           |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           |    count(*) AS n_rows,
           |    CAST(sum(length(o_orderstatus) + length(o_orderpriority))
           |      + count(*) * 44 AS BIGINT) AS est_bytes
           |  FROM orders GROUP BY 1),
           |mx AS (SELECT max(o_year) AS ymax,
           |    CAST(sum(est_bytes) AS BIGINT) AS total_bytes FROM per)
           |SELECT o_year, n_rows, est_bytes,
           |  CASE WHEN ymax - o_year <= 1 THEN 'hot'
           |       WHEN ymax - o_year <= 3 THEN 'warm'
           |       ELSE 'cold' END AS tier,
           |  CAST(est_bytes * 1000000 // total_bytes AS BIGINT) AS share_ppm,
           |  CASE WHEN ymax - o_year > 3
           |    THEN CAST(est_bytes * 1000000 // total_bytes AS BIGINT)
           |    ELSE 0 END AS cold_savings_ppm
           |FROM per CROSS JOIN mx ORDER BY o_year""".stripMargin),
  )

  val all: Seq[QuerySpec] = Seq(q207, q208, q209, q210, q248, q249, q250,
    q256, q257, q258, q259, q269, q270, q273, q283, q287, q294, q301, q307,
    q309, q322, q327, q340, q427, q431, q436, q452)
}
