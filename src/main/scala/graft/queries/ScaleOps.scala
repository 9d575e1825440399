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

  val all: Seq[QuerySpec] = Seq(q207, q208, q209, q210, q248, q249, q250)
}
