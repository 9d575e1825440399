package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import Det._

/** Relational query surface (SURVEY §2.11 q01–q18).
  *
  * Tier A queries (q01–q04) re-express the reference's only executable
  * program — the 66-line PySpark taxi ETL
  * (/root/reference/workflow-examples/pyspark-taxi-trip.py:37-51) — as
  * verifiable queries; Tier B (q05–q18) is the ANSI-SQL surface its
  * Glue/Athena layer exists to serve (/root/reference/addons.tf:259-365).
  *
  * Every query: deterministic total ORDER BY, exact decimal sums (Det),
  * dates as strings. Plans are declarative DataFrame ops end-to-end so
  * Catalyst handles pushdown/pruning/join-selection; scale notes per query.
  */
object Relational {

  /** q01 — Tier A1+A2: parquet scan + foldable literal timestamp column
    * (reference appends driver wall-clock via `lit(datetime.now())`,
    * pyspark-taxi-trip.py:40; fixed here for determinism, SURVEY §7.4).
    * Scale: projection prunes to 3 columns at the scan (ReadSchema). */
  val q01 = QuerySpec(
    "q01_scan_project_lit",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .withColumn("current_ts", to_timestamp(lit("2022-01-01 00:00:00")))
        .select($"l_orderkey", $"l_linenumber", $"l_quantity",
          date_format($"current_ts", "yyyy-MM-dd HH:mm:ss").as("current_ts"))
        // (l_orderkey, l_linenumber) is NOT unique in the fixtures —
        // l_quantity completes a total order over the output columns.
        .orderBy($"l_orderkey", $"l_linenumber", $"l_quantity")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity,
           |  strftime(TIMESTAMP '2022-01-01 00:00:00', '%Y-%m-%d %H:%M:%S') AS current_ts
           |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin),
  )

  /** q02 — Tier A5: global count (pyspark-taxi-trip.py:48).
    * Scale: partial count per split + single final combine. */
  val q02 = QuerySpec(
    "q02_count_global",
    (s, d) => Tables.lineitem(s, d).agg(count(lit(1)).as("n_rows")),
    Some("SELECT count(*) AS n_rows FROM lineitem"),
  )

  /** q03 — Tier A4: first-20 semantics of `show(20)`
    * (pyspark-taxi-trip.py:46), made deterministic by a unique sort key. */
  val q03 = QuerySpec(
    "q03_limit_show",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .select($"l_orderkey", $"l_linenumber", $"l_quantity",
          $"l_extendedprice", $"l_returnflag", dstr($"l_shipdate").as("ship_date"))
        // Key pair isn't unique — order by every output column so the
        // limit-20 cut is deterministic on both engines.
        .orderBy($"l_orderkey", $"l_linenumber", $"l_quantity",
          $"l_extendedprice", $"l_returnflag", $"ship_date")
        .limit(20)
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
           |  l_returnflag, strftime(l_shipdate, '%Y-%m-%d') AS ship_date
           |FROM lineitem
           |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice,
           |  l_returnflag, ship_date LIMIT 20""".stripMargin),
  )

  /** q04 — Tier A6+A7: `repartition(2)` round-trip preserves the multiset
    * (pyspark-taxi-trip.py:51) — checked via count + exact checksums that
    * are invariant to the round-robin shuffle. */
  val q04 = QuerySpec(
    "q04_repartition_roundtrip",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d).repartition(2).agg(
        count(lit(1)).as("n_rows"),
        sum($"l_orderkey").as("key_sum"),
        dsum($"l_extendedprice", 2).as("price_sum"))
    },
    Some(s"""SELECT count(*) AS n_rows, CAST(sum(l_orderkey) AS BIGINT) AS key_sum,
            |  ${sqlDsum("l_extendedprice", 2)} AS price_sum FROM lineitem""".stripMargin),
  )

  /** q05 — predicate forms: range, IN, LIKE, null-check (Tier B; the
    * reference itself has no filter anywhere — SURVEY §2.5).
    * Scale: all four predicates push to the parquet scan (PushedFilters). */
  val q05 = QuerySpec(
    "q05_filter_predicates",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_shipdate" >= lit("1996-01-01") && $"l_shipdate" < lit("1998-01-01"))
        .filter($"l_quantity".isin(10.0, 20.0, 30.0, 40.0))
        .filter($"l_returnflag".like("%A%"))
        .filter($"l_discount".isNotNull)
        .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_returnflag",
          dstr($"l_shipdate").as("ship_date"))
        .orderBy($"l_orderkey", $"l_linenumber", $"l_quantity",
          $"l_returnflag", $"ship_date")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag,
           |  strftime(l_shipdate, '%Y-%m-%d') AS ship_date
           |FROM lineitem
           |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
           |  AND l_quantity IN (10.0, 20.0, 30.0, 40.0)
           |  AND l_returnflag LIKE '%A%' AND l_discount IS NOT NULL
           |ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag, ship_date""".stripMargin),
  )

  /** q06 — TPC-H Q1-shaped pricing summary: filter + groupBy + 8 aggregates.
    * Scale: filter pushed to scan; two-phase hash agg (partial map-side
    * combine → 6-group final), shuffle carries only 6 rows per mapper. */
  val q06 = QuerySpec(
    "q06_pricing_agg",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_shipdate" <= lit("1998-12-01"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum($"l_quantity", 2).as("sum_qty"),
          dsum($"l_extendedprice", 2).as("sum_base_price"),
          dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 6).as("sum_disc_price"),
          dsum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax"), 6).as("sum_charge"),
          davg($"l_quantity", 2).as("avg_qty"),
          davg($"l_extendedprice", 2).as("avg_price"),
          davg($"l_discount", 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some(s"""SELECT l_returnflag, l_linestatus,
            |  ${sqlDsum("l_quantity", 2)} AS sum_qty,
            |  ${sqlDsum("l_extendedprice", 2)} AS sum_base_price,
            |  ${sqlDsum("l_extendedprice * (1.0 - l_discount)", 6)} AS sum_disc_price,
            |  ${sqlDsum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", 6)} AS sum_charge,
            |  ${sqlDavg("l_quantity", 2)} AS avg_qty,
            |  ${sqlDavg("l_extendedprice", 2)} AS avg_price,
            |  ${sqlDavg("l_discount", 6)} AS avg_disc,
            |  count(*) AS count_order
            |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-12-01'
            |GROUP BY l_returnflag, l_linestatus
            |ORDER BY l_returnflag, l_linestatus""".stripMargin),
  )

  /** q07 — dimension join chain customer⋈nation⋈region with explicit
    * broadcast hints (nation=25, region=5 rows — the canonical small-dim
    * broadcast; no shuffle of the customer side at any scale). */
  val q07 = QuerySpec(
    "q07_join_broadcast",
    (s, d) => {
      import s.implicits._
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy($"r_name", $"n_name")
        .agg(count(lit(1)).as("n_customers"), dsum($"c_acctbal", 2).as("acctbal_sum"))
        .orderBy($"r_name", $"n_name")
    },
    Some(s"""SELECT r_name, n_name, count(*) AS n_customers,
            |  ${sqlDsum("c_acctbal", 2)} AS acctbal_sum
            |FROM customer
            |JOIN nation ON c_nationkey = n_nationkey
            |JOIN region ON n_regionkey = r_regionkey
            |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin),
  )

  /** q08 — large fact-fact equi-join orders⋈lineitem, forced sort-merge
    * (`hint("merge")`) — the strategy that survives when neither side
    * broadcasts; both sides shuffle-partition on the join key only. */
  val q08 = QuerySpec(
    "q08_join_sortmerge",
    (s, d) => {
      import s.implicits._
      val o = Tables.orders(s, d).hint("merge")
      val l = Tables.lineitem(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy($"o_orderpriority")
        .agg(
          count(lit(1)).as("n_items"),
          countDistinct($"o_orderkey").as("n_orders"),
          dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 6).as("revenue"))
        .orderBy($"o_orderpriority")
    },
    Some(s"""SELECT o_orderpriority, count(*) AS n_items,
            |  count(DISTINCT o_orderkey) AS n_orders,
            |  ${sqlDsum("l_extendedprice * (1.0 - l_discount)", 6)} AS revenue
            |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
  )

  /** q09 — left-semi (orders WITH lineitems) + left-anti (orders WITHOUT),
    * tagged and unioned. Semi/anti never materialize the probe payload —
    * at scale they shuffle only the join key. */
  val q09 = QuerySpec(
    "q09_join_semi_anti",
    (s, d) => {
      import s.implicits._
      val o = Tables.orders(s, d)
      val lKeys = Tables.lineitem(s, d).select($"l_orderkey")
      val semi = o.join(lKeys, o("o_orderkey") === lKeys("l_orderkey"), "left_semi")
        .agg(count(lit(1)).as("n_orders")).select(lit("semi").as("tag"), $"n_orders")
      val anti = o.join(lKeys, o("o_orderkey") === lKeys("l_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n_orders")).select(lit("anti").as("tag"), $"n_orders")
      semi.unionAll(anti).orderBy($"tag")
    },
    Some("""SELECT 'anti' AS tag, count(*) AS n_orders FROM orders
           |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
           |UNION ALL
           |SELECT 'semi' AS tag, count(*) AS n_orders FROM orders
           |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
           |ORDER BY tag""".stripMargin),
  )

  /** q10 — non-equi range join: lineitem × 7-row year-interval table on
    * `l_shipdate ∈ [y_start, y_end)` → BroadcastNestedLoopJoin with the
    * tiny side broadcast — the only NLJ shape that's sane at 100 TB.
    * Scale: lineitem is pre-aggregated on l_shipdate (~2.5k distinct
    * dates) BEFORE the theta join, so the NLJ evaluates its 7 range
    * predicates per DATE, not per row (4.2M → 17.5k predicate evals at
    * sf0.1) — the standard reduce-before-non-equi-join pattern; exact
    * decimal partials re-aggregate associatively after the join. */
  val q10 = QuerySpec(
    "q10_join_theta_range",
    (s, d) => {
      import s.implicits._
      val years = s.range(1995, 2002).select(
        $"id".cast("int").as("yr"),
        to_timestamp(concat($"id".cast("string"), lit("-01-01"))).as("y_start"),
        to_timestamp(concat(($"id" + 1).cast("string"), lit("-01-01"))).as("y_end"))
      val byDate = Tables.lineitem(s, d)
        .groupBy($"l_shipdate")
        .agg(count(lit(1)).as("n"),
          sum($"l_extendedprice".cast(DecimalType(30, 2))).as("p"))
      byDate
        .join(broadcast(years),
          byDate("l_shipdate") >= years("y_start") && byDate("l_shipdate") < years("y_end"))
        .groupBy($"yr")
        .agg(sum($"n").as("n_items"), sum($"p").cast(DoubleType).as("price_sum"))
        .orderBy($"yr")
    },
    Some(s"""WITH years AS (
            |  SELECT CAST(y AS INT) AS yr,
            |    CAST(CAST(y AS VARCHAR) || '-01-01' AS TIMESTAMP) AS y_start,
            |    CAST(CAST(y+1 AS VARCHAR) || '-01-01' AS TIMESTAMP) AS y_end
            |  FROM generate_series(1995, 2001) t(y))
            |SELECT yr, count(*) AS n_items, ${sqlDsum("l_extendedprice", 2)} AS price_sum
            |FROM lineitem JOIN years ON l_shipdate >= y_start AND l_shipdate < y_end
            |GROUP BY yr ORDER BY yr""".stripMargin),
  )

  /** q11 — exact count(DISTINCT) per group (two-phase Expand-based
    * distinct agg). The HLL `approx_count_distinct` twin lives in the
    * non-oracle extras (estimates never hash-match — SURVEY §7.4). */
  val q11 = QuerySpec(
    "q11_agg_distinct_hll",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          countDistinct($"l_partkey").as("n_parts"),
          countDistinct($"l_suppkey").as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
           |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
           |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
  )

  /** q12 — ROLLUP(n_name, o_orderpriority) over orders⋈customer⋈nation;
    * rollup nulls normalized to '(all)' so ORDER BY is portable
    * (Spark sorts NULLS FIRST, DuckDB NULLS LAST). */
  val q12 = QuerySpec(
    "q12_rollup_cube",
    (s, d) => {
      import s.implicits._
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .rollup($"n_name", $"o_orderpriority")
        .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice", 2).as("total"))
        .select(
          coalesce($"n_name", lit("(all)")).as("nation"),
          coalesce($"o_orderpriority", lit("(all)")).as("priority"),
          $"n_orders", $"total")
        .orderBy($"nation", $"priority")
    },
    Some(s"""SELECT coalesce(n_name, '(all)') AS nation,
            |  coalesce(o_orderpriority, '(all)') AS priority,
            |  count(*) AS n_orders, ${sqlDsum("o_totalprice", 2)} AS total
            |FROM orders JOIN customer ON o_custkey = c_custkey
            |JOIN nation ON c_nationkey = n_nationkey
            |GROUP BY ROLLUP (n_name, o_orderpriority)
            |ORDER BY nation, priority""".stripMargin),
  )

  /** q13 — ranking window: top-3 orders per customer by price, with
    * row_number/rank/lag over the same spec. Partition-local sort only —
    * no global shuffle beyond hash-by-customer. */
  val q13 = QuerySpec(
    "q13_window_rank",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .withColumn("rk", rank().over(w))
        .withColumn("prev_price", lag($"o_totalprice", 1).over(w))
        .filter($"rn" <= 3)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn", $"rk", $"prev_price")
        .orderBy($"o_custkey", $"rn")
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn, rk, prev_price FROM (
           |  SELECT o_custkey, o_orderkey, o_totalprice,
           |    CAST(row_number() OVER w AS INT) AS rn,
           |    CAST(rank() OVER w AS INT) AS rk,
           |    lag(o_totalprice, 1) OVER w AS prev_price
           |  FROM orders
           |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
           |) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin),
  )

  /** q14 — running-sum frame: rowsBetween(unboundedPreceding, currentRow)
    * per supplier in deterministic (shipdate, orderkey, linenumber,
    * quantity) order — l_quantity is in BOTH the frame order and the
    * final sort because (orderkey, linenumber) is not unique in the
    * fixtures: a four-column tie would otherwise let the two engines
    * fold the tied quantities into the prefix sums in different orders.
    * Rows tying on all five keys have equal quantity, hence equal
    * prefix sums — fully deterministic. Quantities are integral doubles
    * → prefix sums are exact. */
  val q14 = QuerySpec(
    "q14_window_frame_running",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"l_suppkey")
        .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber", $"l_quantity")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, d)
        .withColumn("run_qty", sum($"l_quantity").over(w))
        .select($"l_suppkey", dstr($"l_shipdate").as("ship_date"),
          $"l_orderkey", $"l_linenumber", $"l_quantity", $"run_qty")
        // run_qty last: rows tying on all five keys still carry distinct
        // prefix sums (prefix+q vs prefix+2q) — ordering by run_qty makes
        // even that emission order identical on both engines.
        .orderBy($"l_suppkey", $"l_shipdate", $"l_orderkey", $"l_linenumber",
          $"l_quantity", $"run_qty")
    },
    Some("""SELECT l_suppkey, strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
           |  l_orderkey, l_linenumber, l_quantity,
           |  sum(l_quantity) OVER (PARTITION BY l_suppkey
           |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_qty
           |FROM lineitem
           |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_quantity, run_qty""".stripMargin),
  )

  /** q15 — global top-k: orderBy + limit. Spark plans TakeOrderedAndProject
    * (per-partition heap + driver merge of k rows) — no global sort. */
  val q15 = QuerySpec(
    "q15_sort_topk",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice", dstr($"o_orderdate").as("order_date"))
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(10)
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice,
           |  strftime(o_orderdate, '%Y-%m-%d') AS order_date
           |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin),
  )

  /** q16 — set ops over two customer-key slices: UNION (distinct),
    * INTERSECT, EXCEPT, reported as tagged counts. */
  val q16 = QuerySpec(
    "q16_setops",
    (s, d) => {
      import s.implicits._
      val c = Tables.customer(s, d)
      val a = c.filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
      val b = c.filter($"c_acctbal" > 5000.0).select($"c_custkey")
      def tagged(tag: String, df: DataFrame) =
        df.agg(count(lit(1)).as("n")).select(lit(tag).as("op"), $"n")
      tagged("except", a.except(b))
        .unionAll(tagged("intersect", a.intersect(b)))
        .unionAll(tagged("union", a.union(b).distinct()))
        .orderBy($"op")
    },
    Some("""SELECT 'except' AS op, count(*) AS n FROM (
           |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
           |  EXCEPT SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)
           |UNION ALL
           |SELECT 'intersect', count(*) FROM (
           |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
           |  INTERSECT SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)
           |UNION ALL
           |SELECT 'union', count(*) FROM (
           |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
           |  UNION SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)
           |ORDER BY op""".stripMargin),
  )

  /** q17 — scalar-function sampler: regexp_extract, date_trunc, datediff,
    * floor-math, CASE WHEN, nullif/coalesce. All codegen'd built-ins. */
  val q17 = QuerySpec(
    "q17_scalar_string_date_math",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .select(
          $"o_orderkey",
          // regexp_extract yields '' on no match, and CAST('' AS INT) throws
          // under ANSI mode — nullif guards digit-less priorities → NULL.
          nullif(regexp_extract($"o_orderpriority", "(\\d+)", 1), lit("")).cast("int").as("prio_num"),
          date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM-dd").as("order_month"),
          datediff($"o_orderdate", lit("1995-01-01")).as("days_since"),
          when($"o_totalprice" > 250000.0, "big")
            .when($"o_totalprice" > 100000.0, "mid")
            .otherwise("small").as("price_bucket"),
          floor($"o_totalprice" / 7.0).as("price_div7"),
          coalesce(nullif($"o_orderstatus", lit("O")), lit("open")).as("status_or_open"))
        .orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey,
           |  CAST(nullif(regexp_extract(o_orderpriority, '(\d+)', 1), '') AS INT) AS prio_num,
           |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
           |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
           |  CASE WHEN o_totalprice > 250000.0 THEN 'big'
           |       WHEN o_totalprice > 100000.0 THEN 'mid' ELSE 'small' END AS price_bucket,
           |  CAST(floor(o_totalprice / 7.0) AS BIGINT) AS price_div7,
           |  coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open
           |FROM orders ORDER BY o_orderkey""".stripMargin),
  )

  /** q18 — JSON column: schema'd from_json over events.props + per-type
    * aggregate. from_json parses once per row inside codegen; at scale
    * prefer this over repeated get_json_object calls per field. */
  val q18 = QuerySpec(
    "q18_json_events",
    (s, d) => {
      import s.implicits._
      val propsSchema = StructType(Seq(StructField("k", IntegerType)))
      Tables.events(s, d)
        .withColumn("k", from_json($"props", propsSchema).getField("k"))
        .groupBy($"event_type")
        .agg(
          count(lit(1)).as("n_events"),
          sum($"k").as("k_sum"),
          max($"k").as("k_max"),
          davg($"value", 4).as("value_avg"))
        .orderBy($"event_type")
    },
    Some(s"""SELECT event_type, count(*) AS n_events,
            |  CAST(sum(CAST(json_extract_string(props, '$$.k') AS INT)) AS BIGINT) AS k_sum,
            |  CAST(max(CAST(json_extract_string(props, '$$.k') AS INT)) AS INT) AS k_max,
            |  ${sqlDavg("value", 4)} AS value_avg
            |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
  )

  /** q66 — the binned range join: q10's pure-inequality join family done
    * the way it survives scale. A raw range join with no equi key plans
    * as BroadcastNestedLoopJoin — every probe row × every build row. The
    * standard fix (the same technique behind Databricks' range-join
    * optimization and interval-join binning in stream processors) is to
    * derive BIN KEYS: each lineitem lands in its month bin, each probe
    * window (order date + 30 days) explodes into the 1–2 month bins it
    * overlaps, the join becomes a plain broadcast HASH join on the bin
    * with the exact range predicate as a residual filter. Work drops
    * from |probe|×|build| comparisons to |build| + matched-bin pairs.
    * Probes here are the handful of highest-value orders; at 100 TB the
    * same plan holds for any probe side small enough to broadcast, and a
    * shuffled hash join on the bin key otherwise. */
  val q66 = QuerySpec(
    "q66_range_join_binned",
    (s, d) => {
      import s.implicits._
      val probes = Tables.orders(s, d)
        .filter($"o_totalprice" >= 498000.0)
        .select($"o_orderkey", $"o_orderdate",
          ($"o_orderdate" + expr("INTERVAL 30 DAYS")).as("o_end"))
        .withColumn("bin", explode(expr(
          "sequence(date_trunc('MONTH', o_orderdate), date_trunc('MONTH', o_end), interval 1 month)")))
      // fanOut: the test fixture is a single parquet split, which would
      // serialize the join + decimal partial-agg onto one core (a real
      // table has many splits and fanOut skips itself).
      val li = Tables.fanOut(
        Tables.lineitem(s, d)
          .select($"l_orderkey", $"l_shipdate", $"l_extendedprice"),
        col("l_orderkey"))
        .withColumn("bin", date_trunc("MONTH", $"l_shipdate"))
      li.join(broadcast(probes), Seq("bin"))
        .filter($"l_shipdate" >= $"o_orderdate" && $"l_shipdate" < $"o_end")
        .groupBy($"o_orderkey")
        .agg(count(lit(1)).as("n_shipped_in_window"),
          dsum($"l_extendedprice", 2).as("price_sum"))
        .orderBy($"o_orderkey")
    },
    Some(s"""SELECT o_orderkey, count(*) AS n_shipped_in_window,
            |  ${sqlDsum("l_extendedprice", 2)} AS price_sum
            |FROM orders JOIN lineitem
            |  ON l_shipdate >= o_orderdate
            | AND l_shipdate < o_orderdate + INTERVAL 30 DAY
            |WHERE o_totalprice >= 498000.0
            |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin),
  )

  /** q75 — distribution window functions (ntile / percent_rank /
    * cume_dist), completing §2.8's ranking family (q13 covers
    * row_number/rank/lag): order-quartiles and rank fractions per
    * customer. The window ORDER BY is totally ordered (price ties broken
    * by o_orderkey) so every rank fraction is deterministic; the
    * fractions are single IEEE divisions of identical ints on both
    * engines. One shuffle on the partition key, like any window. */
  val q75 = QuerySpec(
    "q75_window_distribution",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice", $"o_orderkey")
      Tables.orders(s, d)
        .filter($"o_custkey" < 20)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice",
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"))
        .orderBy($"o_custkey", $"o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice,
           |  CAST(ntile(4) OVER w AS INT) AS quartile,
           |  round(percent_rank() OVER w, 6) AS pct_rank,
           |  round(cume_dist() OVER w, 6) AS cume
           |FROM orders WHERE o_custkey < 20
           |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
           |ORDER BY o_custkey, o_orderkey""".stripMargin),
  )

  /** q76 — value-navigation window functions (first_value / last_value /
    * nth_value) over an unbounded frame: each event annotated with its
    * user-day's opening, closing, and second reading — the
    * session-context enrichment shape. last/nth need the explicit
    * UNBOUNDED FOLLOWING frame (the default frame stops at CURRENT ROW,
    * where last_value degenerates to "this row"); ordering is total via
    * (ts, event_id). */
  val q76 = QuerySpec(
    "q76_window_value_nav",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id", $"day").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, d)
        .filter($"user_id" < 5)
        .withColumn("day", date_format(date_trunc("day", $"ts"), "yyyy-MM-dd"))
        .select($"user_id", $"day", $"event_id", $"value",
          first($"value").over(w).as("open_val"),
          last($"value").over(w).as("close_val"),
          nth_value($"value", 2).over(w).as("second_val"))
        .orderBy($"user_id", $"day", $"event_id")
    },
    Some("""SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           |  event_id, value,
           |  first_value(value) OVER w AS open_val,
           |  last_value(value) OVER w AS close_val,
           |  nth_value(value, 2) OVER w AS second_val
           |FROM events WHERE user_id < 5
           |WINDOW w AS (PARTITION BY user_id, strftime(date_trunc('day', ts), '%Y-%m-%d')
           |  ORDER BY ts, event_id
           |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           |ORDER BY user_id, day, event_id""".stripMargin),
  )

  /** q82 — null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): grouping
    * keys with nulls must MATCH each other through a join, the semantics
    * sentinel-key pipelines rely on (plain `=` silently drops every
    * null-keyed row). Nulls are synthesized via nullif on a mod bucket
    * (the fixture has none); both sides pre-aggregate before the join so
    * the null bucket is one row per side, not a null-key hot spot — the
    * standard mitigation for null-skewed joins at scale. */
  val q82 = QuerySpec(
    "q82_join_null_safe",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .withColumn("bucket", expr("nullif(user_id % 10, 5)"))
      val clicks = ev.filter($"event_type" === "click")
        .groupBy($"bucket").agg(count(lit(1)).as("n_clicks"))
      val purchases = ev.filter($"event_type" === "purchase")
        .groupBy($"bucket").agg(count(lit(1)).as("n_purchases"))
      clicks.as("c")
        .join(purchases.as("p"), $"c.bucket" <=> $"p.bucket")
        .select($"c.bucket".as("bucket"), $"n_clicks", $"n_purchases")
        .orderBy($"bucket".asc_nulls_first)
    },
    Some("""WITH ev AS (SELECT nullif(user_id % 10, 5) AS bucket, event_type FROM events),
           |c AS (SELECT bucket, count(*) AS n_clicks FROM ev
           |      WHERE event_type = 'click' GROUP BY bucket),
           |p AS (SELECT bucket, count(*) AS n_purchases FROM ev
           |      WHERE event_type = 'purchase' GROUP BY bucket)
           |SELECT c.bucket, n_clicks, n_purchases
           |FROM c JOIN p ON c.bucket IS NOT DISTINCT FROM p.bucket
           |ORDER BY c.bucket NULLS FIRST""".stripMargin),
  )

  /** q84 — shipping-priority star join (TPC-H Q3's shape): the canonical
    * selective fact⋈fact⋈dim pipeline. customer filters to one market
    * segment and BROADCASTS into a semi-join on orders (the dim never
    * shuffles the fact); orders⋈lineitem is the one real shuffle
    * (sort-merge on orderkey); revenue is an exact decimal sum so the
    * top-10 ordering is engine-identical; the final sort is a
    * TakeOrderedAndProject, never a global sort. At 100 TB both date
    * filters push to the parquet scans, so each fact side reads a
    * fraction of its files before any join runs. */
  val q84 = QuerySpec(
    "q84_star_join_topk",
    (s, d) => {
      import s.implicits._
      val cut = "1998-07-01"
      val c = Tables.customer(s, d)
        .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
      val o = Tables.orders(s, d)
        .filter($"o_orderdate" < lit(cut))
        .join(broadcast(c), $"o_custkey" === $"c_custkey", "left_semi")
        .select($"o_orderkey", $"o_orderdate")
      val l = Tables.lineitem(s, d)
        .filter($"l_shipdate" > lit(cut))
        .select($"l_orderkey", $"l_extendedprice", $"l_discount")
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_orderkey", $"o_orderdate")
        .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 6).as("revenue"))
        .select($"l_orderkey", dstr($"o_orderdate").as("order_date"), $"revenue")
        .orderBy($"revenue".desc, $"l_orderkey")
        .limit(10)
    },
    Some(s"""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
            |  ${sqlDsum("l_extendedprice * (1.0 - l_discount)", 6)} AS revenue
            |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            |JOIN customer ON o_custkey = c_custkey
            |WHERE c_mktsegment = 'BUILDING'
            |  AND o_orderdate < TIMESTAMP '1998-07-01'
            |  AND l_shipdate > TIMESTAMP '1998-07-01'
            |GROUP BY l_orderkey, o_orderdate
            |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin),
  )

  /** q85 — local-supplier volume (TPC-H Q5's shape): the six-table join
    * with the non-key constraint that supplier and customer share a
    * nation. Join order is chosen for scale: region→nation prunes to one
    * region's nations FIRST and broadcasts into customer (dims filter
    * facts before facts meet facts — 4/5 of customers never leave the
    * scan); customer⋈orders and orders⋈lineitem are the two real
    * shuffles, each on its natural key; supplier and nation (genuinely
    * small dims) broadcast. Revenue per nation via exact decimal sums;
    * descending order is engine-identical because the doubles are. */
  val q85 = QuerySpec(
    "q85_region_nation_revenue",
    (s, d) => {
      import s.implicits._
      val asianNations = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d).filter($"r_name" === "ASIA")),
          $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey", $"n_name")
      val c = Tables.customer(s, d)
        .join(broadcast(asianNations), $"c_nationkey" === $"n_nationkey")
        .select($"c_custkey", $"c_nationkey")
      val o = Tables.orders(s, d)
        .filter($"o_orderdate" >= lit("1996-01-01") && $"o_orderdate" < lit("1999-01-01"))
        .join(c, $"o_custkey" === $"c_custkey")
        .select($"o_orderkey", $"c_nationkey")
      val ol = Tables.lineitem(s, d)
        .select($"l_orderkey", $"l_suppkey", $"l_extendedprice", $"l_discount")
        .join(o, $"l_orderkey" === $"o_orderkey")
      ol.join(broadcast(Tables.supplier(s, d)),
          $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
        .join(broadcast(asianNations), $"s_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 6).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"revenue".desc, $"n_name")
    },
    Some(s"""SELECT n_name,
            |  ${sqlDsum("l_extendedprice * (1.0 - l_discount)", 6)} AS revenue,
            |  count(*) AS n_items
            |FROM customer JOIN orders ON c_custkey = o_custkey
            |JOIN lineitem ON l_orderkey = o_orderkey
            |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
            |JOIN nation ON s_nationkey = n_nationkey
            |JOIN region ON n_regionkey = r_regionkey
            |WHERE r_name = 'ASIA'
            |  AND o_orderdate >= TIMESTAMP '1996-01-01'
            |  AND o_orderdate < TIMESTAMP '1999-01-01'
            |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin),
  )

  /** q143 — TPC-H-Q22-shaped "wealthy but gone quiet": customers whose
    * account balance exceeds the global average AND who placed no
    * orders in the recent window (since 2000-01-01 — Q22's "no orders
    * in 7 years" test), rolled up per nation. The above-average test is
    * exact on both engines by cross-multiplication in integer cents
    * (cents × n_all > cents_all) — no float division, no tie drift.
    * Scale: the global (n, Σ) pair is one scalar agg broadcast into the
    * filter; the gone-quiet test is a left ANTI join against orders
    * date-filtered and projected to the key column only (the orders
    * side carries 8 bytes/row into the shuffle, and at 100 TB the anti
    * join shuffles keys, never payloads). */
  val q143 = QuerySpec(
    "q143_above_avg_no_orders",
    (s, d) => {
      import s.implicits._
      val cust = Tables.customer(s, d).select(
        $"c_custkey", $"c_nationkey",
        ($"c_acctbal".cast(DecimalType(18, 2)) * 100).cast(LongType).as("cents"))
      val stats = cust.agg(
        count(lit(1)).as("n_all"), sum($"cents").as("cents_all"))
      cust.crossJoin(broadcast(stats))
        .where($"cents" * $"n_all" > $"cents_all")
        .join(Tables.orders(s, d)
          .where($"o_orderdate" >= lit("2000-01-01")).select($"o_custkey"),
          $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"c_nationkey")
        .agg(count(lit(1)).as("n_cust"), sum($"cents").as("cents_sum"))
        .orderBy($"c_nationkey")
    },
    Some("""WITH c AS (
           |  SELECT c_custkey, c_nationkey,
           |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
           |  FROM customer)
           |SELECT c_nationkey, count(*) AS n_cust,
           |  CAST(sum(cents) AS BIGINT) AS cents_sum
           |FROM c
           |WHERE cents * (SELECT count(*) FROM c) > (SELECT sum(cents) FROM c)
           |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
           |    AND o_orderdate >= TIMESTAMP '2000-01-01')
           |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin),
  )

  /** q144 — TPC-H-Q14-shaped promo revenue share per ship-year:
    * lineitem⋈part (part broadcasts — it is the dimension), discounted
    * revenue in exact decimal, and the promo share in integer ppm via
    * BIGINT floor division of cent totals — engine-exact, no float
    * ratio in the gate. Scale: one fact scan, map-side conditional
    * aggregation, shuffle bounded by |years|. */
  val q144 = QuerySpec(
    "q144_promo_rev_share",
    (s, d) => {
      import s.implicits._
      val rev6 = ($"l_extendedprice" * (lit(1.0) - $"l_discount"))
        .cast(DecimalType(30, 6))
      Tables.lineitem(s, d)
        .select($"l_partkey", $"l_shipdate", rev6.as("rev6"))
        .join(broadcast(Tables.part(s, d).select($"p_partkey", $"p_type")),
          $"l_partkey" === $"p_partkey")
        .groupBy(year($"l_shipdate").as("ship_year"))
        .agg(
          floor(sum(when($"p_type" === "PROMO", $"rev6").otherwise(lit(0)
            .cast(DecimalType(30, 6)))) * 100).cast(LongType).as("promo_cents"),
          floor(sum($"rev6") * 100).cast(LongType).as("total_cents"))
        .select($"ship_year", $"promo_cents", $"total_cents",
          expr("(promo_cents * 1000000) DIV total_cents").as("promo_ppm"))
        .orderBy($"ship_year")
    },
    Some("""WITH r AS (
           |  SELECT year(l_shipdate) AS ship_year, p_type,
           |    CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6)) AS rev6
           |  FROM lineitem JOIN part ON l_partkey = p_partkey),
           |y AS (
           |  SELECT ship_year,
           |    CAST(floor(sum(CASE WHEN p_type = 'PROMO' THEN rev6
           |      ELSE CAST(0 AS DECIMAL(30,6)) END) * 100) AS BIGINT) AS promo_cents,
           |    CAST(floor(sum(rev6) * 100) AS BIGINT) AS total_cents
           |  FROM r GROUP BY ship_year)
           |SELECT ship_year, promo_cents, total_cents,
           |  CAST((promo_cents * 1000000) // total_cents AS BIGINT) AS promo_ppm
           |FROM y ORDER BY ship_year""".stripMargin),
  )

  /** q145 — TPC-H-Q18-shaped large-volume orders: orders whose total
    * line quantity clears a threshold (HAVING over the fact rollup),
    * joined back to customer for attribution. Quantities are integral
    * doubles → cast to INT before summing, keeping the gate in exact
    * integer arithmetic. Scale: the quantity rollup shuffles on
    * o_orderkey once; the surviving handful of hot orders then joins to
    * dimensions — filter-first, enrich-second, the Q18 plan shape. */
  val q145 = QuerySpec(
    "q145_big_volume_orders",
    (s, d) => {
      import s.implicits._
      val qty = Tables.lineitem(s, d)
        .groupBy($"l_orderkey")
        .agg(sum($"l_quantity".cast(IntegerType)).as("qty_sum"))
        .where($"qty_sum" >= 250)
      qty.join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .join(broadcast(Tables.customer(s, d)
          .select($"c_custkey", $"c_mktsegment")), $"o_custkey" === $"c_custkey")
        .select($"o_orderkey", $"c_mktsegment", $"qty_sum",
          dstr($"o_orderdate").as("order_date"))
        .orderBy($"qty_sum".desc, $"o_orderkey")
    },
    Some("""SELECT o_orderkey, c_mktsegment, qty_sum,
           |  strftime(o_orderdate, '%Y-%m-%d') AS order_date
           |FROM (SELECT l_orderkey, CAST(sum(CAST(l_quantity AS INTEGER)) AS BIGINT)
           |        AS qty_sum FROM lineitem GROUP BY l_orderkey
           |      HAVING qty_sum >= 250)
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |ORDER BY qty_sum DESC, o_orderkey""".stripMargin),
  )

  /** q146 — TPC-H-Q19-shaped disjunctive-predicate join: an equi-join
    * on partkey whose residual is an OR of brand/size/quantity
    * conjunctions. Catalyst keeps the equi key for a broadcast hash
    * join and evaluates the disjunction as a residual filter — the OR
    * never degrades the join to a nested loop. Branches are made
    * disjoint with an ordered CASE so each match attributes to exactly
    * one branch, identically on both engines. */
  val q146 = QuerySpec(
    "q146_disjunctive_pred_join",
    (s, d) => {
      import s.implicits._
      val c1 = $"p_type" === "PROMO" && $"p_size".between(1, 15) &&
        $"l_quantity".between(1, 25)
      val c2 = $"p_type" === "ECONOMY" && $"p_size".between(10, 30) &&
        $"l_quantity".between(20, 40)
      val c3 = $"p_brand" === "Brand#4" && $"l_quantity" >= 40
      Tables.lineitem(s, d)
        .select($"l_partkey", $"l_quantity", $"l_extendedprice", $"l_discount")
        .join(broadcast(Tables.part(s, d)
          .select($"p_partkey", $"p_type", $"p_size", $"p_brand")),
          $"l_partkey" === $"p_partkey" && (c1 || c2 || c3))
        .select(
          when(c1, "promo_small").when(c2, "economy_mid")
            .otherwise("brand4_bulk").as("branch"),
          $"l_extendedprice", $"l_discount", $"l_quantity")
        .groupBy($"branch")
        .agg(count(lit(1)).as("n_items"),
          dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 6).as("revenue"),
          sum($"l_quantity".cast(IntegerType)).as("qty_sum"))
        .orderBy($"branch")
    },
    Some(s"""WITH m AS (
            |  SELECT CASE
            |      WHEN p_type = 'PROMO' AND p_size BETWEEN 1 AND 15
            |        AND l_quantity BETWEEN 1 AND 25 THEN 'promo_small'
            |      WHEN p_type = 'ECONOMY' AND p_size BETWEEN 10 AND 30
            |        AND l_quantity BETWEEN 20 AND 40 THEN 'economy_mid'
            |      ELSE 'brand4_bulk' END AS branch,
            |    l_extendedprice, l_discount, l_quantity
            |  FROM lineitem JOIN part ON l_partkey = p_partkey
            |  WHERE (p_type = 'PROMO' AND p_size BETWEEN 1 AND 15
            |      AND l_quantity BETWEEN 1 AND 25)
            |    OR (p_type = 'ECONOMY' AND p_size BETWEEN 10 AND 30
            |      AND l_quantity BETWEEN 20 AND 40)
            |    OR (p_brand = 'Brand#4' AND l_quantity >= 40))
            |SELECT branch, count(*) AS n_items,
            |  ${sqlDsum("l_extendedprice * (1.0 - l_discount)", 6)} AS revenue,
            |  CAST(sum(CAST(l_quantity AS INTEGER)) AS BIGINT) AS qty_sum
            |FROM m GROUP BY branch ORDER BY branch""".stripMargin),
  )

  /** q155 — calendar/interval scalar breadth (q17's date family
    * completed): month-clamped interval addition (add_months ≡
    * + INTERVAL, both clamp Jan 31 + 1mo → Feb 28), last_day, quarter,
    * month-truncation — the derived-calendar projection every
    * partitioned warehouse computes at ingest. Pure per-row projection
    * over the distinct date domain; dates emitted as strings so
    * timestamp precision never enters the hash. */
  val q155 = QuerySpec(
    "q155_date_scalar_breadth",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .select(to_date($"o_orderdate").as("dt")).distinct()
        .select(
          date_format($"dt", "yyyy-MM-dd").as("order_date"),
          date_format(add_months($"dt", 3), "yyyy-MM-dd").as("plus_3m"),
          date_format(last_day($"dt"), "yyyy-MM-dd").as("month_end"),
          quarter($"dt").as("qtr"),
          date_format(date_trunc("month", $"dt"), "yyyy-MM-dd").as("month_start"),
          datediff($"dt", lit("1995-01-01")).cast("long").as("epoch_day"))
        .orderBy($"order_date")
    },
    Some("""SELECT strftime(dt, '%Y-%m-%d') AS order_date,
           |  strftime(dt + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3m,
           |  strftime(last_day(dt), '%Y-%m-%d') AS month_end,
           |  quarter(dt) AS qtr,
           |  strftime(date_trunc('month', dt), '%Y-%m-%d') AS month_start,
           |  CAST(datediff('day', DATE '1995-01-01', dt) AS BIGINT) AS epoch_day
           |FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS dt FROM orders)
           |ORDER BY order_date""".stripMargin),
  )

  /** q156 — bitwise aggregate family (bit_and / bit_or / bit_xor plus
    * a popcount rollup): the fingerprint/mask algebra SimHash-style
    * pipelines and permission-mask audits run. All-integer, and each
    * aggregate is commutative+associative → partial aggregation and
    * merge-anywhere hold by construction. */
  val q156 = QuerySpec(
    "q156_bitwise_agg",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          bit_and($"l_orderkey").as("mask_and"),
          bit_or($"l_orderkey").as("mask_or"),
          bit_xor($"l_orderkey").as("mask_xor"),
          sum(bit_count($"l_orderkey").cast("long")).as("popcount_sum"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag,
           |  bit_and(l_orderkey) AS mask_and, bit_or(l_orderkey) AS mask_or,
           |  bit_xor(l_orderkey) AS mask_xor,
           |  CAST(sum(bit_count(l_orderkey)) AS BIGINT) AS popcount_sum
           |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
  )

  /** q164 — string scalar breadth (q17's string family completed):
    * translate, lpad, reverse, left/right, ascii, repeat — the
    * normalization/formatting verbs ingest mappings lean on. Pure
    * per-row projection over part; every output is a plain string/int
    * so the hash gate needs no determinism machinery. */
  val q164 = QuerySpec(
    "q164_string_scalar_breadth",
    (s, d) => {
      import s.implicits._
      Tables.part(s, d)
        .select($"p_partkey",
          translate($"p_name", "aeiou", "12345").as("devoweled"),
          lpad($"p_brand", 12, "*").as("padded"),
          reverse($"p_name").as("reversed"),
          expr("left(p_name, 4)").as("prefix4"),
          expr("right(p_name, 4)").as("suffix4"),
          ascii($"p_name").cast("long").as("first_byte"),
          expr("repeat(p_type, 2)").as("doubled_type"))
        .orderBy($"p_partkey")
    },
    Some("""SELECT p_partkey,
           |  translate(p_name, 'aeiou', '12345') AS devoweled,
           |  lpad(p_brand, 12, '*') AS padded,
           |  reverse(p_name) AS reversed,
           |  left(p_name, 4) AS prefix4,
           |  right(p_name, 4) AS suffix4,
           |  CAST(ascii(p_name) AS BIGINT) AS first_byte,
           |  repeat(p_type, 2) AS doubled_type
           |FROM part ORDER BY p_partkey""".stripMargin),
  )

  /** q166 — explicit grouping sets through the DataFrame API (Spark 4's
    * Dataset.groupingSets, q72's SQL form made declarative): three
    * pinned sets — (status, priority), (status), () — one Expand of
    * factor 3, grouping() flags disambiguating real NULLs from
    * super-aggregate rows. NULL grouping keys never reach the ORDER BY
    * (Spark sorts nulls first, DuckDB last): keys are coalesced to
    * 'ALL' labels and the grouping flags lead the sort. */
  val q166 = QuerySpec(
    "q166_df_grouping_sets",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .groupingSets(
          Seq(Seq($"o_orderstatus", $"o_orderpriority"), Seq($"o_orderstatus"), Seq()),
          $"o_orderstatus", $"o_orderpriority")
        .agg(grouping($"o_orderstatus").cast("int").as("g_status"),
          grouping($"o_orderpriority").cast("int").as("g_prio"),
          count(lit(1)).as("n"), dsum($"o_totalprice", 2).as("price_sum"))
        .select(coalesce($"o_orderstatus", lit("ALL")).as("status"),
          coalesce($"o_orderpriority", lit("ALL")).as("prio"),
          $"g_status", $"g_prio", $"n", $"price_sum")
        .orderBy($"g_status", $"g_prio", $"status", $"prio")
    },
    Some(s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
            |  coalesce(o_orderpriority, 'ALL') AS prio,
            |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
            |  CAST(grouping(o_orderpriority) AS INT) AS g_prio,
            |  count(*) AS n, ${sqlDsum("o_totalprice", 2)} AS price_sum
            |FROM orders
            |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
            |ORDER BY g_status, g_prio, status, prio""".stripMargin),
  )

  /** q169 — explicit NULL placement in sorts: the engines' DEFAULTS
    * disagree (Spark sorts nulls first ascending, DuckDB last), which is
    * why every nullable sort key in this suite is either coalesced or
    * pinned — this query pins the feature itself. Two top-10s over a
    * nullable measure, one DESC NULLS LAST (nulls can never enter) and
    * one ASC NULLS FIRST (nulls lead, tie-broken by key), both planned
    * as TakeOrderedAndProject — no global sort materializes. */
  val q169 = QuerySpec(
    "q169_sort_null_placement",
    (s, d) => {
      import s.implicits._
      val o = Tables.orders(s, d).select($"o_orderkey",
        when($"o_orderstatus" === "P", lit(null).cast("double"))
          .otherwise($"o_totalprice").as("p"))
      val last = o.orderBy($"p".desc_nulls_last, $"o_orderkey").limit(10)
        .withColumn("variant", lit("desc_nulls_last"))
      val first = o.orderBy($"p".asc_nulls_first, $"o_orderkey").limit(10)
        .withColumn("variant", lit("asc_nulls_first"))
      last.unionByName(first)
        .select($"variant", $"o_orderkey", $"p")
        .orderBy($"variant", $"o_orderkey")
    },
    Some("""WITH o AS (
           |  SELECT o_orderkey,
           |    CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_totalprice END AS p
           |  FROM orders),
           |a AS (SELECT 'desc_nulls_last' AS variant, o_orderkey, p FROM o
           |      ORDER BY p DESC NULLS LAST, o_orderkey LIMIT 10),
           |b AS (SELECT 'asc_nulls_first' AS variant, o_orderkey, p FROM o
           |      ORDER BY p ASC NULLS FIRST, o_orderkey LIMIT 10)
           |SELECT * FROM a UNION ALL SELECT * FROM b
           |ORDER BY variant, o_orderkey""".stripMargin),
  )

  /** q170 — timezone conversion (the reporting-local-time projection
    * every global warehouse derives from UTC storage): event instants
    * converted to three zones incl. a half-hour-offset one, emitted as
    * wall-clock strings. Both engines resolve IANA zone rules — Spark
    * via from_utc_timestamp, DuckDB via the session-independent
    * timezone(zone, timezone('UTC', ts)) double application (a bare
    * AT TIME ZONE would silently depend on the oracle session's zone).
    * Pure per-row projection. */
  val q170 = QuerySpec(
    "q170_timezone_convert",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .select($"event_id",
          date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("utc"),
          date_format(from_utc_timestamp($"ts", "America/New_York"),
            "yyyy-MM-dd HH:mm:ss").as("new_york"),
          date_format(from_utc_timestamp($"ts", "Asia/Tokyo"),
            "yyyy-MM-dd HH:mm:ss").as("tokyo"),
          date_format(from_utc_timestamp($"ts", "Asia/Kolkata"),
            "yyyy-MM-dd HH:mm:ss").as("kolkata"))
        .orderBy($"event_id")
    },
    Some("""SELECT event_id,
           |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS utc,
           |  strftime(timezone('America/New_York', timezone('UTC', CAST(ts AS TIMESTAMP))),
           |    '%Y-%m-%d %H:%M:%S') AS new_york,
           |  strftime(timezone('Asia/Tokyo', timezone('UTC', CAST(ts AS TIMESTAMP))),
           |    '%Y-%m-%d %H:%M:%S') AS tokyo,
           |  strftime(timezone('Asia/Kolkata', timezone('UTC', CAST(ts AS TIMESTAMP))),
           |    '%Y-%m-%d %H:%M:%S') AS kolkata
           |FROM events ORDER BY event_id""".stripMargin),
  )

  /** q171 — JSON construction (q18's parse direction reversed): typed
    * columns serialized to JSON event payloads with to_json(struct(...)),
    * then extracted back — the emit side of every JSON interchange
    * pipeline. Both engines render the same canonical compact form for
    * int/string/array fields (pinned by md5-ing every payload), and the
    * extract leg proves serialize→extract is lossless. Doubles are
    * deliberately EXCLUDED from the payload: float rendering
    * ("1.0" vs "1") is the one place the canonical forms diverge. */
  val q171 = QuerySpec(
    "q171_json_construct",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .select($"o_orderkey", $"o_orderstatus",
          to_json(struct($"o_orderkey".as("id"), $"o_orderstatus".as("status"),
            array(lit("p"), $"o_orderpriority").as("tags"))).as("j"))
        .select($"o_orderstatus", $"j",
          (get_json_object($"j", "$.id").cast("long") === $"o_orderkey").as("rt_ok"))
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"),
          countDistinct(md5($"j")).as("n_payloads"),
          sum(char_length($"j").cast("long")).as("json_len_sum"),
          sum(when($"rt_ok", 1L).otherwise(0L)).as("n_roundtrip_ok"))
        .orderBy($"o_orderstatus")
    },
    Some("""WITH p AS (
           |  SELECT o_orderstatus, o_orderkey,
           |    to_json(struct_pack(id := o_orderkey, status := o_orderstatus,
           |      tags := ['p', o_orderpriority])) AS j
           |  FROM orders)
           |SELECT o_orderstatus, count(*) AS n,
           |  count(DISTINCT md5(CAST(j AS VARCHAR))) AS n_payloads,
           |  CAST(sum(length(CAST(j AS VARCHAR))) AS BIGINT) AS json_len_sum,
           |  CAST(sum(CASE WHEN CAST(j ->> 'id' AS BIGINT) = o_orderkey
           |    THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip_ok
           |FROM p GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),
  )

  /** q172 — boolean aggregate family: every/any (data-quality
    * invariants stated as aggregates — "all discounts within policy",
    * "any max-size order") and count_if, per group. Spark's
    * every/any/count_if ≡ DuckDB's bool_and/bool_or/count_if; all are
    * commutative+associative so partial aggregation holds. The
    * invariant-as-aggregate shape is how a 100 TB audit states checks
    * without materializing violations. */
  val q172 = QuerySpec(
    "q172_boolean_agg",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          every($"l_discount" <= 0.1).as("all_disc_in_policy"),
          some($"l_quantity" === 50.0).as("any_max_qty"),
          every($"l_tax" >= 0.0).as("all_tax_nonneg"),
          count_if($"l_quantity" >= 45.0).as("n_large"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag,
           |  bool_and(l_discount <= 0.1) AS all_disc_in_policy,
           |  bool_or(l_quantity = 50.0) AS any_max_qty,
           |  bool_and(l_tax >= 0.0) AS all_tax_nonneg,
           |  CAST(count_if(l_quantity >= 45.0) AS BIGINT) AS n_large
           |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
  )

  /** q174 — schema-evolving union: `unionByName(allowMissingColumns)`
    * fills absent columns with NULL and aligns by NAME, not position —
    * the append pattern for a 100 TB lake where producers add columns
    * over time (old partitions lack the new field). Positional `union`
    * would silently mis-bind here. DuckDB mirror: UNION ALL BY NAME.
    * Narrow per-row op: no shuffle beyond the final presentation sort. */
  val q174 = QuerySpec(
    "q174_union_by_name",
    (s, d) => {
      import s.implicits._
      val o = Tables.orders(s, d)
      val open = o.filter($"o_orderstatus" === "O")
        .select($"o_orderkey".as("id"), lit("open").as("src"),
          $"o_totalprice".as("price"))
      val done = o.filter($"o_orderstatus" === "F")
        .select($"o_orderkey".as("id"), lit("done").as("src"),
          $"o_orderpriority".as("priority"))
      open.unionByName(done, allowMissingColumns = true).orderBy($"id")
    },
    Some("""SELECT * FROM (
           |  SELECT o_orderkey AS id, 'open' AS src, o_totalprice AS price
           |  FROM orders WHERE o_orderstatus = 'O'
           |  UNION ALL BY NAME
           |  SELECT o_orderkey AS id, 'done' AS src, o_orderpriority AS priority
           |  FROM orders WHERE o_orderstatus = 'F'
           |) ORDER BY id""".stripMargin),
  )

  /** q175 — DISTINCT aggregates: sum(DISTINCT), avg(DISTINCT) (exact via
    * decimal sum / distinct count), and multi-column count_distinct.
    * Spark plans each distinct aggregate as an Expand + two-phase agg;
    * multiple DISTINCTs in one groupBy share the Expand — one shuffle,
    * not one per aggregate. Quantity is integral-valued in the data; the
    * BIGINT cast makes the distinct set and its sum engine-exact.
    * (count_distinct(a,b) skips rows with any NULL — suppkey/partkey are
    * non-null here, matching DuckDB's row-tuple DISTINCT.) */
  val q175 = QuerySpec(
    "q175_distinct_agg",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          sum_distinct($"l_quantity".cast("bigint")).as("sum_dq"),
          count_distinct($"l_quantity".cast("bigint")).as("n_dq"),
          count_distinct($"l_suppkey", $"l_partkey").as("n_supp_part"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag,
           |  CAST(sum(DISTINCT CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_dq,
           |  count(DISTINCT CAST(l_quantity AS BIGINT)) AS n_dq,
           |  count(DISTINCT (l_suppkey, l_partkey)) AS n_supp_part
           |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
  )

  /** q176 — keyset-free pagination: global ORDER BY on a unique key +
    * LIMIT/OFFSET (`Dataset.offset`, Spark ≥3.4). Spark plans the pair
    * as a single GlobalLimit(offset+limit) over a TakeOrderedAndProject
    * variant — only offset+limit rows ever reach the driver, so a page
    * deep in a 100 TB result set still moves one page of data (though
    * OFFSET cost grows linearly with depth; keyset pagination via
    * WHERE id > last_seen — q15's top-k shape — is the constant-cost
    * alternative for very deep scrolls). */
  val q176 = QuerySpec(
    "q176_sql_pagination",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus")
        .orderBy($"o_orderkey")
        .offset(500).limit(100)
    },
    Some("""SELECT o_orderkey, o_custkey, o_orderstatus
           |FROM orders ORDER BY o_orderkey LIMIT 100 OFFSET 500""".stripMargin),
  )

  /** q177 — MapType pipeline: map_from_entries over a per-group
    * collect_list, transform_values, map_filter, cardinality, then
    * map_entries→explode back to rows. The map stays inside one row
    * (no per-entry shuffle); the oracle states the same semantics
    * relationally — proving the map algebra against plain SQL. Keys
    * are made unique per order by a pre-aggregation over
    * (l_orderkey, l_linenumber) — the synthetic data repeats line
    * numbers within an order, and map_from_entries errors on
    * duplicate keys rather than silently last-wins. */
  val q177 = QuerySpec(
    "q177_map_functions",
    (s, d) => {
      import s.implicits._
      val m = Tables.lineitem(s, d)
        .filter($"l_orderkey" <= 200)
        .groupBy($"l_orderkey", $"l_linenumber")
        .agg(sum($"l_quantity".cast("bigint") * $"l_linenumber").as("v"))
        .groupBy($"l_orderkey")
        .agg(map_from_entries(collect_list(struct(
          $"l_linenumber", $"v"))).as("m"))
        .select($"l_orderkey",
          map_filter(col("m"), (_, v) => v >= 20L).as("m"))
        .filter(cardinality($"m") > 0)
        .select($"l_orderkey", cardinality($"m").as("n_entries"),
          explode(map_entries($"m")).as("e"))
      m.select($"l_orderkey", $"n_entries",
          $"e.key".as("ln"), $"e.value".as("v"))
        .orderBy($"l_orderkey", $"ln")
    },
    Some("""WITH f AS (
           |  SELECT l_orderkey, l_linenumber AS ln,
           |         CAST(sum(CAST(l_quantity AS BIGINT) * l_linenumber) AS BIGINT) AS v
           |  FROM lineitem WHERE l_orderkey <= 200
           |  GROUP BY l_orderkey, l_linenumber
           |), g AS (SELECT * FROM f WHERE v >= 20)
           |SELECT l_orderkey,
           |       CAST(count(*) OVER (PARTITION BY l_orderkey) AS INT) AS n_entries,
           |       ln, v
           |FROM g ORDER BY l_orderkey, ln""".stripMargin),
  )

  /** q178 — robust central tendency: median / interpolated quantiles /
    * mode per group. Exactness: the input is cast to BIGINT first, so
    * both engines interpolate over exactly-representable integers
    * (position (n-1)·q and lower + frac·(upper−lower) are exact for
    * these magnitudes); mode is gated on data with a strictly unique
    * per-group winner (verified), so tie-break order can't differ.
    * All three are single-pass mergeable sketches over a sort — the
    * group-local sort is the cost at 100 TB, not an extra shuffle. */
  val q178 = QuerySpec(
    "q178_median_mode",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          median($"l_quantity".cast("bigint")).as("med_qty"),
          percentile($"l_quantity".cast("bigint"), lit(0.25)).as("p25_qty"),
          percentile($"l_quantity".cast("bigint"), lit(0.75)).as("p75_qty"),
          mode($"l_linenumber").as("mode_ln"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag,
           |  median(CAST(l_quantity AS BIGINT)) AS med_qty,
           |  quantile_cont(CAST(l_quantity AS BIGINT), 0.25) AS p25_qty,
           |  quantile_cont(CAST(l_quantity AS BIGINT), 0.75) AS p75_qty,
           |  mode(l_linenumber) AS mode_ln
           |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
  )

  /** q179 — URL decomposition: parse_url(HOST/PATH/QUERY key) over URLs
    * synthesized from customer columns. The oracle doesn't parse — it
    * states each component from the same source columns, so Spark's
    * parser is validated against ground truth rather than another
    * parser's quirks. Per-row scalar work, no shuffle: the clickstream
    * normalization shape at 100 TB. */
  val q179 = QuerySpec(
    "q179_url_parse",
    (s, d) => {
      import s.implicits._
      Tables.customer(s, d).filter($"c_custkey" <= 500)
        .select($"c_custkey",
          concat(lit("https://shop.example.com/seg/"), lower($"c_mktsegment"),
            lit("?cust="), $"c_custkey", lit("&seg="), $"c_mktsegment").as("url"))
        .select($"c_custkey",
          parse_url($"url", lit("HOST")).as("host"),
          parse_url($"url", lit("PATH")).as("path"),
          parse_url($"url", lit("QUERY"), lit("cust")).as("cust"),
          parse_url($"url", lit("QUERY"), lit("seg")).as("seg"))
        .orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey,
           |  'shop.example.com' AS host,
           |  '/seg/' || lower(c_mktsegment) AS path,
           |  CAST(c_custkey AS VARCHAR) AS cust,
           |  c_mktsegment AS seg
           |FROM customer WHERE c_custkey <= 500 ORDER BY c_custkey""".stripMargin),
  )

  /** q180 — key:value string parsing: str_to_map + element_at +
    * map_keys round-trip, oracle-validated against the source columns
    * the string was built from (same ground-truth pattern as q179).
    * This is the log-line / header-blob ingestion shape: parse once
    * per row, no shuffle, stays in whole-stage codegen. */
  val q180 = QuerySpec(
    "q180_kv_parse",
    (s, d) => {
      import s.implicits._
      val kv = Tables.lineitem(s, d).filter($"l_orderkey" <= 100)
        .select($"l_orderkey", $"l_linenumber",
          concat(lit("qty:"), $"l_quantity".cast("bigint"),
            lit(",flag:"), $"l_returnflag",
            lit(",supp:"), $"l_suppkey").as("kvs"))
        .select($"l_orderkey", $"l_linenumber",
          str_to_map($"kvs", lit(","), lit(":")).as("m"))
      kv.select($"l_orderkey", $"l_linenumber",
          element_at($"m", "qty").cast("bigint").as("qty"),
          element_at($"m", "flag").as("flag"),
          element_at($"m", "supp").cast("bigint").as("supp"),
          array_join(array_sort(map_keys($"m")), ",").as("keys_sorted"))
        // Full-row sort: the driver's synthetic lineitem does NOT have a
        // unique (orderkey, linenumber) — ties carry different flags, and
        // an under-keyed ORDER BY is engine-arbitrary between them
        // (caught by the round-6 sf1 positional compare).
        .orderBy($"l_orderkey", $"l_linenumber", $"qty", $"flag", $"supp")
    },
    Some("""SELECT l_orderkey, l_linenumber,
           |  CAST(l_quantity AS BIGINT) AS qty,
           |  l_returnflag AS flag,
           |  l_suppkey AS supp,
           |  'flag,qty,supp' AS keys_sorted
           |FROM lineitem WHERE l_orderkey <= 100
           |ORDER BY l_orderkey, l_linenumber, qty, flag, supp""".stripMargin),
  )

  /** q181 — multi-aggregate pivot: groupBy.pivot(values).agg(n, rev)
    * produces the {value}_{alias} column matrix in ONE pass — one
    * shuffle, partial aggregation intact, vs the naive N-queries+join.
    * Explicit pivot values keep the plan static (no driver-side
    * distinct scan to discover columns — the 100 TB rule for pivot).
    * Oracle mirrors with FILTER/CASE conditional aggregation. */
  val q181 = QuerySpec(
    "q181_pivot_multi_agg",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(count(lit(1)).as("n"), dsum($"l_extendedprice", 2).as("rev"))
        // Pivot emits NULL for a (group, value) combo with zero rows while
        // the oracle's count(*) FILTER emits 0 — coalesce the counts so
        // parity holds even if a fixture change empties a combo. The rev
        // columns stay NULL on both engines (sum over empty is NULL).
        .select($"l_linestatus",
          coalesce($"A_n", lit(0L)).as("A_n"), $"A_rev",
          coalesce($"N_n", lit(0L)).as("N_n"), $"N_rev",
          coalesce($"R_n", lit(0L)).as("R_n"), $"R_rev")
        .orderBy($"l_linestatus")
    },
    Some("""SELECT l_linestatus,
           |  count(*) FILTER (l_returnflag='A') AS "A_n",
           |  CAST(sum(CASE WHEN l_returnflag='A' THEN CAST(l_extendedprice AS DECIMAL(30,2)) END) AS DOUBLE) AS "A_rev",
           |  count(*) FILTER (l_returnflag='N') AS "N_n",
           |  CAST(sum(CASE WHEN l_returnflag='N' THEN CAST(l_extendedprice AS DECIMAL(30,2)) END) AS DOUBLE) AS "N_rev",
           |  count(*) FILTER (l_returnflag='R') AS "R_n",
           |  CAST(sum(CASE WHEN l_returnflag='R' THEN CAST(l_extendedprice AS DECIMAL(30,2)) END) AS DOUBLE) AS "R_rev"
           |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin),
  )

  /** q182 — outer generators: posexplode_outer keeps the parent row as
    * a single (NULL, NULL) child when the array is NULL/empty — the
    * difference between "document with no chunks disappears" and
    * "document with no chunks survives the explode" in a flattening
    * pipeline. Oracle mirrors with LEFT JOIN against the value domain.
    * Within a key the output is either the one null row or non-null
    * rows, so null-ordering dialects can't reorder it; pinned NULLS
    * FIRST anyway. */
  val q182 = QuerySpec(
    "q182_explode_outer",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d).filter($"o_orderkey" <= 300)
        .select($"o_orderkey".as("k"), ($"o_orderkey" % 4).as("m"))
        .select($"k",
          when($"m" >= 2, sequence(lit(2L), $"m")).as("arr"))
        .select($"k", posexplode_outer($"arr"))
        .withColumnRenamed("col", "val")
        .orderBy($"k", $"pos".asc_nulls_first)
    },
    Some("""WITH o AS (SELECT o_orderkey AS k, o_orderkey % 4 AS m
           |           FROM orders WHERE o_orderkey <= 300)
           |SELECT k,
           |  CASE WHEN v.val IS NULL THEN NULL ELSE CAST(v.val - 2 AS INT) END AS pos,
           |  CAST(v.val AS BIGINT) AS val
           |FROM o LEFT JOIN (VALUES (2),(3)) v(val) ON v.val <= o.m
           |ORDER BY k, pos NULLS FIRST""".stripMargin),
  )

  /** q184 — permissive JSON ingestion: from_json in PERMISSIVE mode
    * with a columnNameOfCorruptRecord field keeps malformed rows (raw
    * text preserved in the corrupt column) instead of nulling them
    * invisibly or failing the batch — the triage gate of every messy
    * 100 TB ingest: count good/bad per group, aggregate only rows that
    * parsed. Malformation is injected deterministically (truncated
    * JSON on l_orderkey % 50 == 0), so the oracle states the split
    * from the modulo directly. Gate uses only corrupt-column presence
    * — robust to Spark's partial-result parsing of truncated rows. */
  val q184 = QuerySpec(
    "q184_json_corrupt_record",
    (s, d) => {
      import s.implicits._
      val payload = concat(lit("{\"qty\":"), $"l_quantity".cast("bigint"), lit("}"))
      val truncated = concat(lit("{\"qty\":"), $"l_quantity".cast("bigint"))
      Tables.lineitem(s, d).filter($"l_orderkey" <= 2000)
        .select($"l_returnflag",
          when($"l_orderkey" % 50 === 0, truncated).otherwise(payload).as("js"))
        .select($"l_returnflag",
          from_json($"js", StructType(Seq(
            StructField("qty", LongType), StructField("_cr", StringType))),
            Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_cr")).as("p"))
        .groupBy($"l_returnflag")
        .agg(
          count(when($"p._cr".isNull, lit(1))).as("n_good"),
          count($"p._cr").as("n_bad"),
          sum(when($"p._cr".isNull, $"p.qty")).as("qty_good"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag,
           |  CAST(count(*) FILTER (l_orderkey % 50 <> 0) AS BIGINT) AS n_good,
           |  CAST(count(*) FILTER (l_orderkey % 50 = 0) AS BIGINT) AS n_bad,
           |  CAST(sum(CAST(l_quantity AS BIGINT)) FILTER (l_orderkey % 50 <> 0) AS BIGINT) AS qty_good
           |FROM lineitem WHERE l_orderkey <= 2000
           |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
  )

  /** q185 — numeric RANGE window frame: each row aggregates its value
    * neighborhood (all rows within 5 quantity units below), not a row
    * count — the "peers by value, not position" frame q14 (ROWS) and
    * q92 (time RANGE) don't exercise. RANGE makes equal keys full
    * peers, so duplicate quantities get identical outputs and the
    * result is a deterministic multiset without a unique tiebreaker.
    * One window sort per partition — same shuffle shape as any
    * windowed aggregate at 100 TB. */
  val q185 = QuerySpec(
    "q185_range_frame_numeric",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"l_returnflag").orderBy($"qty")
        .rangeBetween(-5L, 0L)
      Tables.lineitem(s, d).filter($"l_orderkey" <= 500)
        .select($"l_returnflag", $"l_quantity".cast("bigint").as("qty"))
        .select($"l_returnflag", $"qty",
          sum($"qty").over(w).as("near_sum"),
          count(lit(1)).over(w).as("near_n"))
        .orderBy($"l_returnflag", $"qty")
    },
    Some("""SELECT l_returnflag, qty,
           |  CAST(sum(qty) OVER w AS BIGINT) AS near_sum,
           |  CAST(count(*) OVER w AS BIGINT) AS near_n
           |FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty
           |      FROM lineitem WHERE l_orderkey <= 500)
           |WINDOW w AS (PARTITION BY l_returnflag ORDER BY qty
           |             RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
           |ORDER BY l_returnflag, qty""".stripMargin),
  )

  /** q186 — n-ary scalar comparison: greatest/least across three
    * integer expressions — the row-local winner-pick that otherwise
    * tempts a CASE ladder. Pure per-row codegen'd scalars, no shuffle;
    * inputs are non-null bigints so both engines' NULL conventions are
    * moot. Sort key includes the outputs: (orderkey, linenumber)
    * repeats in the synthetic data. */
  val q186 = QuerySpec(
    "q186_greatest_least",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d).filter($"l_orderkey" <= 300)
        .select($"l_orderkey", $"l_linenumber",
          greatest($"l_quantity".cast("bigint"), $"l_suppkey" % 50, $"l_partkey" % 50).as("hi"),
          least($"l_quantity".cast("bigint"), $"l_suppkey" % 50, $"l_partkey" % 50).as("lo"))
        .orderBy($"l_orderkey", $"l_linenumber", $"hi", $"lo")
    },
    Some("""SELECT l_orderkey, l_linenumber,
           |  greatest(CAST(l_quantity AS BIGINT), l_suppkey % 50, l_partkey % 50) AS hi,
           |  least(CAST(l_quantity AS BIGINT), l_suppkey % 50, l_partkey % 50) AS lo
           |FROM lineitem WHERE l_orderkey <= 300
           |ORDER BY l_orderkey, l_linenumber, hi, lo""".stripMargin),
  )

  /** q190 — bloom runtime-filter join (graft.operators.RuntimeFilter +
    * the codegen'd BloomMightContain expression): the urgent-orders key
    * set is aggregated into a bloom (distributed treeAggregate; the
    * driver holds only the final bitset), the lineitem probe side is
    * prefiltered by the bloom BEFORE any join machinery, and the exact
    * join + rollup runs on the survivors. At 100 TB this is the rewrite
    * for a dimension too big to broadcast-hash but whose key bloom
    * ships in the plan: ~99% of dead probe rows never enter the
    * shuffle. Semantics are unchanged by construction — blooms have no
    * false negatives and the exact join drops false positives — which
    * is exactly what the oracle (the PLAIN join, no bloom) certifies. */
  val q190 = QuerySpec(
    "q190_bloom_runtime_filter_join",
    (s, d) => {
      import s.implicits._
      val dim = Tables.orders(s, d)
        .filter($"o_orderpriority" === "1-URGENT")
        .select($"o_orderkey", $"o_orderstatus")
      val probe = graft.operators.RuntimeFilter.prefilter(
        Tables.lineitem(s, d), "l_orderkey", dim, "o_orderkey",
        expectedItems = dim.count(), fpp = 0.01)
      probe.join(dim, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus", $"l_linestatus")
        .agg(count(lit(1)).as("n_items"),
          sum($"l_quantity".cast("bigint")).as("qty_sum"),
          dsum($"l_extendedprice", 2).as("price_sum"))
        .orderBy($"o_orderstatus", $"l_linestatus")
    },
    Some(s"""SELECT o_orderstatus, l_linestatus, count(*) AS n_items,
            |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
            |  ${Det.sqlDsum("l_extendedprice", 2)} AS price_sum
            |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            |WHERE o_orderpriority = '1-URGENT'
            |GROUP BY o_orderstatus, l_linestatus
            |ORDER BY o_orderstatus, l_linestatus""".stripMargin),
  )

  /** q196 — shuffled-hash join via hint: the third join strategy, for
    * the side that is too big to broadcast but small enough to HASH in
    * memory per partition — SHJ skips BOTH sort phases of sort-merge
    * (orders builds a per-partition hash table; lineitem streams), the
    * right call when the build side is mid-size and memory budgets
    * allow. Spark won't pick SHJ unprompted in most shapes (sort-merge
    * is the safe default), so the hint IS the operator here; the plan
    * audit pins ShuffledHashJoin and the oracle certifies the hint
    * changed nothing semantically. At 100 TB: same single exchange per
    * side as SMJ, minus two sorts — but the build side must fit
    * per-partition memory, so it composes with AQE skew splitting. */
  val q196 = QuerySpec(
    "q196_shuffled_hash_join",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d).hint("shuffle_hash"),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          sum($"l_quantity".cast("bigint")).as("qty_sum"))
        .orderBy($"o_orderpriority")
    },
    Some("""SELECT o_orderpriority, count(*) AS n_items,
           |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum
           |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
  )

  /** q212 — Spark-3.4/3.5 collection-function breadth (array_compact /
    * array_prepend / array_append / try_element_at / array_position /
    * slice): per-row array surgery on synthesized 4-element arrays with
    * an embedded NULL, rolled up to integer checksums. try_element_at
    * past the end must be NULL (not an ANSI error — the try_ contract);
    * array_position's not-found is 0 on Spark vs NULL on DuckDB, pinned
    * by the coalesce in the oracle. All lambda/array work is per-row and
    * codegen'd — shuffle-free until the final 1-row rollup. */
  val q212 = QuerySpec(
    "q212_collection_fn_breadth",
    (s, d) => {
      import s.implicits._
      val b = Tables.orders(s, d).filter($"o_orderkey" % 100 === 0)
        .select($"o_orderkey".as("k"),
          array($"o_orderkey" % 7, lit(null).cast("long"),
            $"o_orderkey" % 5, $"o_orderkey" % 3).as("a"))
      b.select($"k",
          array_append(array_prepend(array_compact($"a"), $"k" % 2), $"k" % 11).as("built"),
          try_element_at($"a", lit(6)).as("oob"),
          array_position($"a", $"k" % 5).as("pos5"),
          slice($"a", 2, 2).as("mid"))
        .agg(sum(size($"built")).cast("long").as("built_len_sum"),
          sum(expr("aggregate(built, 0L, (x, y) -> x + y)")).as("built_sum"),
          sum(when($"oob".isNull, 1L).otherwise(0L)).as("n_oob_null"),
          sum($"pos5").as("pos5_sum"),
          sum(size($"mid")).cast("long").as("mid_len_sum"))
    },
    Some("""WITH b AS (
           |  SELECT o_orderkey AS k,
           |    [o_orderkey % 7, NULL, o_orderkey % 5, o_orderkey % 3] AS a
           |  FROM orders WHERE o_orderkey % 100 = 0),
           |t AS (
           |  SELECT k,
           |    list_append(list_prepend(k % 2, list_filter(a, x -> x IS NOT NULL)), k % 11) AS built,
           |    a[2 + len(a)] AS oob,
           |    list_position(a, k % 5) AS pos5,
           |    a[2:3] AS mid
           |  FROM b)
           |SELECT CAST(sum(len(built)) AS BIGINT) AS built_len_sum,
           |  CAST(sum(list_reduce(list_prepend(CAST(0 AS BIGINT), built),
           |    (x, y) -> x + y)) AS BIGINT) AS built_sum,
           |  CAST(sum(CASE WHEN oob IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oob_null,
           |  CAST(sum(coalesce(pos5, 0)) AS BIGINT) AS pos5_sum,
           |  CAST(sum(len(mid)) AS BIGINT) AS mid_len_sum
           |FROM t""".stripMargin),
  )

  /** q213 — calendar edge semantics: month-end CLAMPING under
    * add_months (Jan 31 + 1 m = Feb 28; + 13 m lands on leap Feb 29),
    * ISO week AND ISO year-of-week (the year boundary where early
    * January belongs to the previous ISO year), and next_day's
    * strictly-after contract — the three date traps that silently skew
    * calendar rollups. Dates are constructed (month ends via last_day,
    * mid-month via make_date) rather than sampled, so the edges are
    * guaranteed present; DuckDB mirrors next_day with isodow modular
    * arithmetic since it has no such function. */
  val q213 = QuerySpec(
    "q213_calendar_edges",
    (s, d) => {
      import s.implicits._
      val y = (lit(1995) + $"o_orderkey" % 5).cast("int")
      val m = (lit(1) + $"o_orderkey" % 12).cast("int")
      Tables.orders(s, d).filter($"o_orderkey" % 449 < 8)
        .select(when($"o_orderkey" % 2 === 0, last_day(make_date(y, m, lit(1))))
          .otherwise(make_date(y, m, (lit(1) + $"o_orderkey" % 28).cast("int"))).as("dt"))
        .groupBy($"dt").agg(count(lit(1)).as("n"))
        .select(date_format($"dt", "yyyy-MM-dd").as("dt"),
          date_format(add_months($"dt", 1), "yyyy-MM-dd").as("plus_1m"),
          date_format(add_months($"dt", 13), "yyyy-MM-dd").as("plus_13m"),
          weekofyear($"dt").cast("long").as("iso_week"),
          expr("extract(YEAROFWEEK FROM dt)").cast("long").as("iso_year"),
          date_format(next_day($"dt", "Tuesday"), "yyyy-MM-dd").as("next_tue"),
          $"n")
        .orderBy($"dt")
    },
    Some("""WITH d AS (
           |  SELECT CASE WHEN o_orderkey % 2 = 0
           |      THEN last_day(make_date(1995 + o_orderkey % 5, 1 + o_orderkey % 12, 1))
           |      ELSE make_date(1995 + o_orderkey % 5, 1 + o_orderkey % 12,
           |                     1 + o_orderkey % 28)
           |    END AS dt0
           |  FROM orders WHERE o_orderkey % 449 < 8),
           |g AS (SELECT dt0 AS dt, count(*) AS n FROM d GROUP BY dt0)
           |SELECT strftime(dt, '%Y-%m-%d') AS dt,
           |  strftime(dt + INTERVAL 1 MONTH, '%Y-%m-%d') AS plus_1m,
           |  strftime(dt + INTERVAL 13 MONTH, '%Y-%m-%d') AS plus_13m,
           |  CAST(week(dt) AS BIGINT) AS iso_week,
           |  CAST(isoyear(dt) AS BIGINT) AS iso_year,
           |  strftime(dt + (CASE WHEN ((2 - isodow(dt)) % 7 + 7) % 7 = 0 THEN 7
           |      ELSE ((2 - isodow(dt)) % 7 + 7) % 7 END) * INTERVAL 1 DAY,
           |    '%Y-%m-%d') AS next_tue,
           |  n
           |FROM g ORDER BY dt""".stripMargin),
  )

  /** q218 — map higher-order functions (transform_keys / map_zip_with)
    * plus array_sort with a CUSTOM comparator — the map-algebra half
    * q177 left open. Per-priority status→count and status→amount maps
    * (keys pre-aggregated unique, q177's rule) are zipped into
    * avg-cents-per-order (exact decimal→BIGINT cents, truncating div on
    * both engines), keys are rewritten by transform_keys, and the top
    * entry is selected by a comparator lambda (value DESC, key ASC) —
    * a total order, so the pick is deterministic. The DuckDB oracle
    * computes the same readout relationally (maps are Spark-side
    * representation; the GATE is on values). Per-group maps are
    * |statuses|-sized — dimension-bounded at any corpus scale. */
  val q218 = QuerySpec(
    "q218_map_hof_breadth",
    (s, d) => {
      import s.implicits._
      val base = Tables.orders(s, d)
        .groupBy($"o_orderpriority", $"o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum($"o_totalprice".cast(DecimalType(30, 2))).as("amt"))
      base.groupBy($"o_orderpriority")
        .agg(map_from_entries(array_sort(collect_list(struct($"o_orderstatus", $"n"))))
            .as("cnts"),
          map_from_entries(array_sort(collect_list(struct($"o_orderstatus", $"amt"))))
            .as("amts"))
        .select($"o_orderpriority",
          expr("map_zip_with(cnts, amts, (k, c, a) -> CAST(a * 100 AS BIGINT) div c)")
            .as("cents_per"),
          expr("transform_keys(cnts, (k, v) -> concat('s_', lower(k)))").as("cnts2"))
        .select($"o_orderpriority",
          cardinality($"cents_per").cast("long").as("n_statuses"),
          expr("""array_sort(map_entries(cents_per), (l, r) ->
                 |  CASE WHEN l.value > r.value THEN -1 WHEN l.value < r.value THEN 1
                 |       WHEN l.key < r.key THEN -1 WHEN l.key > r.key THEN 1
                 |       ELSE 0 END)[0]""".stripMargin).as("top"),
          expr("aggregate(map_keys(cnts2), 0L, (acc, k) -> acc + length(k))")
            .as("keylen_sum"))
        .select($"o_orderpriority", $"n_statuses",
          $"top.key".as("top_status"), $"top.value".as("top_cents"),
          $"keylen_sum")
        .orderBy($"o_orderpriority")
    },
    Some("""WITH g AS (
           |  SELECT o_orderpriority, o_orderstatus, count(*) AS n,
           |    CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) * 100 AS BIGINT) AS cents
           |  FROM orders GROUP BY 1, 2),
           |r AS (
           |  SELECT o_orderpriority, o_orderstatus, n, cents // n AS avg_cents,
           |    row_number() OVER (PARTITION BY o_orderpriority
           |      ORDER BY cents // n DESC, o_orderstatus) AS rk
           |  FROM g)
           |SELECT o_orderpriority,
           |  CAST(count(*) AS BIGINT) AS n_statuses,
           |  max(CASE WHEN rk = 1 THEN o_orderstatus END) AS top_status,
           |  CAST(max(CASE WHEN rk = 1 THEN avg_cents END) AS BIGINT) AS top_cents,
           |  CAST(sum(len('s_' || lower(o_orderstatus))) AS BIGINT) AS keylen_sum
           |FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
  )

  /** q223 — URL canonicalization: the pretraining-corpus dedup key
    * (lowercase scheme/host, strip default ports, drop fragments, trim
    * trailing path slash, SORT query params) applied to four messy
    * variants per logical URL built from customer rows — variants 0/1
    * must collapse to the same canonical form; 2/3 differ by real
    * port/scheme and must survive. The oracle states the expected
    * canonical STRINGS from the construction arithmetic (ground truth,
    * not a second parser — q179's rule), so n_canonical AND the exact
    * canonical byte length cross the gate. Per-row parse_url + regexp +
    * array_sort work, shuffle-free until the 1-row rollup — the 100 TB
    * URL-dedup preprocessing shape. */
  val q223 = QuerySpec(
    "q223_url_canonicalize",
    (s, d) => {
      import s.implicits._
      val b = Tables.customer(s, d).filter($"c_custkey" <= 800)
        .select($"c_custkey".as("k"), ($"c_custkey" % 4).as("v"),
          expr("c_custkey div 4").as("grp"), lower($"c_mktsegment").as("seg"))
      val messy = b.select($"k",
        when($"v" === 0, concat(lit("HTTPS://Shop.Example.COM:443/cat/"), $"seg",
            lit("/?b="), $"grp", lit("&a="), $"seg", lit("#top")))
          .when($"v" === 1, concat(lit("https://shop.example.com/cat/"), $"seg",
            lit("?a="), $"seg", lit("&b="), $"grp"))
          .when($"v" === 2, concat(lit("http://SHOP.example.com:8080/cat/"), $"seg",
            lit("?b="), $"grp", lit("&a="), $"seg"))
          .otherwise(concat(lit("https://shop.example.com:8443/cat/"), $"seg",
            lit("/?a="), $"seg", lit("&b="), $"grp", lit("#x"))).as("url"))
      val canon = messy.select($"k",
          lower(regexp_extract($"url", "^([A-Za-z]+)://", 1)).as("scheme"),
          lower(parse_url($"url", lit("HOST"))).as("host"),
          regexp_extract($"url", "^[A-Za-z]+://[^/?#]*:(\\d+)", 1).as("port"),
          regexp_replace(parse_url($"url", lit("PATH")), "/$", "").as("path"),
          array_join(array_sort(split(parse_url($"url", lit("QUERY")), "&")), "&")
            .as("q"))
        .select($"k", concat($"scheme", lit("://"), $"host",
          when($"port" === "" ||
            ($"scheme" === "https" && $"port" === "443") ||
            ($"scheme" === "http" && $"port" === "80"), lit(""))
            .otherwise(concat(lit(":"), $"port")),
          $"path",
          when($"q" === "", lit("")).otherwise(concat(lit("?"), $"q"))).as("cu"))
      canon.agg(count(lit(1)).as("n_urls"),
        countDistinct($"cu").as("n_canonical"),
        (count(lit(1)) - countDistinct($"cu")).as("n_collapsed"),
        sum(length($"cu")).cast("long").as("canon_len_sum"))
    },
    Some("""WITH b AS (
           |  SELECT c_custkey AS k, c_custkey % 4 AS v, c_custkey // 4 AS grp,
           |    lower(c_mktsegment) AS seg
           |  FROM customer WHERE c_custkey <= 800),
           |canon AS (
           |  SELECT k,
           |    CASE WHEN v IN (0, 1)
           |      THEN 'https://shop.example.com/cat/' || seg || '?a=' || seg || '&b=' || grp
           |      WHEN v = 2
           |      THEN 'http://shop.example.com:8080/cat/' || seg || '?a=' || seg || '&b=' || grp
           |      ELSE 'https://shop.example.com:8443/cat/' || seg || '?a=' || seg || '&b=' || grp
           |    END AS cu
           |  FROM b)
           |SELECT count(*) AS n_urls,
           |  CAST(count(DISTINCT cu) AS BIGINT) AS n_canonical,
           |  CAST(count(*) - count(DISTINCT cu) AS BIGINT) AS n_collapsed,
           |  CAST(sum(len(cu)) AS BIGINT) AS canon_len_sum
           |FROM canon""".stripMargin),
  )

  /** q225 — inline() generator (array-of-structs → columns, completing
    * the generator family: explode q19, posexplode/outer q182, stack
    * q97/q88): each order fans out to two struct rows whose fields land
    * as real columns without a struct projection step. Cents go through
    * DECIMAL before BIGINT (cast-rounding divergence trap — DuckDB
    * rounds double→int, Spark truncates; decimal scale-2 ×100 is exact
    * on both). Generator output is 2× the scan — no shuffle until the
    * rollup. */
  val q225 = QuerySpec(
    "q225_inline_generator",
    (s, d) => {
      import s.implicits._
      val cents = ($"o_totalprice".cast(DecimalType(18, 2)) * 100).cast("long")
      Tables.orders(s, d)
        .select($"o_orderpriority",
          array(struct(lit(1L).as("pos"), cents.as("cents")),
            struct(lit(2L).as("pos"), (cents * 2).as("cents"))).as("arr"))
        .select($"o_orderpriority", inline($"arr"))
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_rows"), sum($"pos").as("pos_sum"),
          sum($"cents").as("cents_sum"))
        .orderBy($"o_orderpriority")
    },
    Some("""SELECT o_orderpriority, 2 * count(*) AS n_rows,
           |  3 * count(*) AS pos_sum,
           |  CAST(3 * sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           |    AS BIGINT) AS cents_sum
           |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
  )

  /** q229 — json_tuple generator (multi-field JSON extraction in ONE
    * parse, the generator-form alternative to N get_json_object calls —
    * q18's Scaladoc rule made executable): JSON synthesized from order
    * columns (ground truth, q179's pattern), fanned back to columns by
    * json_tuple in a selectExpr, then validated field-by-field against
    * the source. All values int/string (q171's to_json portability
    * rule). Per-row parse, shuffle-free until the rollup. */
  val q229 = QuerySpec(
    "q229_json_tuple_generator",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d).filter($"o_orderkey" % 13 === 0)
        .select($"o_orderkey", $"o_orderstatus", $"o_orderpriority",
          to_json(struct($"o_orderkey".as("id"), $"o_orderstatus".as("st"),
            $"o_orderpriority".as("pr"))).as("j"))
        .selectExpr("o_orderkey", "o_orderstatus", "o_orderpriority",
          "json_tuple(j, 'id', 'st', 'pr') AS (jid, jst, jpr)")
        .agg(count(lit(1)).as("n_rows"),
          sum(when($"jid".cast("long") === $"o_orderkey", 1L).otherwise(0L))
            .as("id_ok"),
          sum(when($"jst" === $"o_orderstatus", 1L).otherwise(0L)).as("st_ok"),
          sum(when($"jpr" === $"o_orderpriority", 1L).otherwise(0L)).as("pr_ok"))
    },
    Some("""SELECT count(*) AS n_rows, count(*) AS id_ok, count(*) AS st_ok,
           |  count(*) AS pr_ok
           |FROM orders WHERE o_orderkey % 13 = 0""".stripMargin),
  )

  /** q230 — NULL algebra torture: the three-valued-logic scalar surface
    * in one place — null-safe equality as a SCALAR (`<=>`, q82 used it
    * as a join key), NULL propagation through arithmetic and concat,
    * concat_ws SKIPPING nulls (the asymmetry that surprises every new
    * pipeline author), nvl / nvl2 / coalesce chains, count(col) vs
    * count(*) under nulls, and sum over an all-null group = NULL.
    * Nullable inputs are built with nullif from order columns so both
    * engines derive identical null patterns. */
  val q230 = QuerySpec(
    "q230_null_algebra",
    (s, d) => {
      import s.implicits._
      val base = Tables.orders(s, d)
        .select($"o_orderkey".as("k"),
          nullif($"o_orderkey" % 5, lit(0)).as("a"),
          nullif($"o_orderkey" % 3, lit(0)).as("b"),
          nullif($"o_orderstatus", lit("P")).as("st"))
      base.agg(count(lit(1)).as("n_rows"),
          count($"a").as("n_a_nonnull"),
          sum(when($"a" <=> $"b", 1L).otherwise(0L)).as("n_nullsafe_eq"),
          sum(when(($"a" === $"b").isNull, 1L).otherwise(0L)).as("n_plain_eq_null"),
          sum(when(($"a" + $"b").isNull, 1L).otherwise(0L)).as("n_arith_null"),
          sum(when(concat($"st", lit("!")).isNull, 1L).otherwise(0L))
            .as("n_concat_null"),
          sum(length(concat_ws("-", $"st", lit("x")))).as("ws_len_sum"),
          sum(nvl($"a", lit(-1))).as("nvl_sum"),
          sum(nvl2($"a", lit(10), lit(1))).as("nvl2_sum"),
          sum(coalesce($"a", $"b", lit(-100))).as("coalesce_sum"),
          sum(when($"st".isNull, $"a")).as("allnullish_sum"))
    },
    Some("""WITH base AS (
           |  SELECT o_orderkey AS k,
           |    nullif(o_orderkey % 5, 0) AS a,
           |    nullif(o_orderkey % 3, 0) AS b,
           |    nullif(o_orderstatus, 'P') AS st
           |  FROM orders)
           |SELECT count(*) AS n_rows,
           |  count(a) AS n_a_nonnull,
           |  CAST(sum(CASE WHEN a IS NOT DISTINCT FROM b THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_nullsafe_eq,
           |  CAST(sum(CASE WHEN (a = b) IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_plain_eq_null,
           |  CAST(sum(CASE WHEN (a + b) IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_arith_null,
           |  CAST(sum(CASE WHEN (st || '!') IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_concat_null,
           |  CAST(sum(len(concat_ws('-', st, 'x'))) AS BIGINT) AS ws_len_sum,
           |  CAST(sum(coalesce(a, -1)) AS BIGINT) AS nvl_sum,
           |  CAST(sum(CASE WHEN a IS NOT NULL THEN 10 ELSE 1 END) AS BIGINT)
           |    AS nvl2_sum,
           |  CAST(sum(coalesce(a, b, -100)) AS BIGINT) AS coalesce_sum,
           |  CAST(sum(CASE WHEN st IS NULL THEN a END) AS BIGINT) AS allnullish_sum
           |FROM base""".stripMargin),
  )

  /** q235 — LIKE quantifiers (LIKE ANY / LIKE ALL / NOT LIKE ANY) plus
    * ILIKE and RLIKE in one predicate sweep — the pattern-matching
    * quantifier surface q163's regexp breadth left out. DuckDB has no
    * LIKE ANY/ALL, so the oracle expands them to OR/AND chains — which
    * is exactly their defined semantics; the gate certifies the
    * expansion — including the TRAP: `x NOT LIKE ANY (a, b)` negates
    * per-pattern BEFORE quantifying (∃ pattern x fails), it is NOT the
    * negation of `LIKE ANY` — so it is near-always true and the mirror
    * is an OR of negations. Pure scan-side predicates, one 1-row
    * rollup. */
  val q235 = QuerySpec(
    "q235_like_quantifiers",
    (s, d) => {
      import s.implicits._
      Tables.part(s, d).select($"p_type", $"p_brand")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(expr("p_type LIKE ANY ('%ECO%', '%PRO%')"), 1L).otherwise(0L))
            .as("n_any"),
          sum(when(expr("p_type LIKE ALL ('%M%', '%dummy_never%')"), 1L).otherwise(0L))
            .as("n_all_never"),
          sum(when(expr("p_type LIKE ALL ('%A%', '%D%')"), 1L).otherwise(0L))
            .as("n_all"),
          sum(when(expr("p_type NOT LIKE ANY ('%ECO%', '%PRO%')"), 1L).otherwise(0L))
            .as("n_not_any"),
          sum(when(expr("p_type ILIKE 'eco%'"), 1L).otherwise(0L)).as("n_ilike"),
          sum(when(expr("p_brand RLIKE '^Brand#1[0-9]$'"), 1L).otherwise(0L))
            .as("n_rlike"))
    },
    Some("""SELECT count(*) AS n_rows,
           |  CAST(sum(CASE WHEN p_type LIKE '%ECO%' OR p_type LIKE '%PRO%'
           |    THEN 1 ELSE 0 END) AS BIGINT) AS n_any,
           |  CAST(sum(CASE WHEN p_type LIKE '%M%' AND p_type LIKE '%dummy_never%'
           |    THEN 1 ELSE 0 END) AS BIGINT) AS n_all_never,
           |  CAST(sum(CASE WHEN p_type LIKE '%A%' AND p_type LIKE '%D%'
           |    THEN 1 ELSE 0 END) AS BIGINT) AS n_all,
           |  CAST(sum(CASE WHEN (p_type NOT LIKE '%ECO%') OR (p_type NOT LIKE '%PRO%')
           |    THEN 1 ELSE 0 END) AS BIGINT) AS n_not_any,
           |  CAST(sum(CASE WHEN lower(p_type) LIKE 'eco%' THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_ilike,
           |  CAST(sum(CASE WHEN regexp_matches(p_brand, '^Brand#1[0-9]$')
           |    THEN 1 ELSE 0 END) AS BIGINT) AS n_rlike
           |FROM part""".stripMargin),
  )

  /** q244 — running DISTINCT count over a window: Spark (like most
    * engines) rejects COUNT(DISTINCT) OVER. The naive rewrite —
    * `size(collect_set(...) OVER w)` — materializes the set PER ROW,
    * O(n²) per partition (measured: 17× cost at 10× data). The LINEAR
    * rewrite used here: flag each key's FIRST occurrence with a
    * per-(partition, key) row_number, then a plain running SUM of the
    * flags — two linear window passes, no set state at all. The gate
    * sums the running counts over every row (an order-sensitive "area
    * under the distinct curve"), so a single off-by-one anywhere in
    * either window fails. */
  val q244 = QuerySpec(
    "q244_window_distinct_rewrite",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val perKey = Window.partitionBy($"event_type", $"user_id").orderBy($"ts", $"event_id")
      val running = Window.partitionBy($"event_type").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select($"event_type", $"ts", $"event_id", $"user_id",
          when(row_number().over(perKey) === 1, 1L).otherwise(0L).as("is_first"))
        .select($"event_type", sum($"is_first").over(running).as("run_distinct"))
        .groupBy($"event_type")
        .agg(max($"run_distinct").as("final_distinct"),
          sum($"run_distinct").as("area"))
        .orderBy($"event_type")
    },
    Some("""WITH w AS (
           |  SELECT event_type,
           |    len(list_distinct(list(user_id) OVER (
           |      PARTITION BY event_type ORDER BY ts, event_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))) AS run_distinct
           |  FROM events)
           |SELECT event_type, CAST(max(run_distinct) AS BIGINT) AS final_distinct,
           |  CAST(sum(run_distinct) AS BIGINT) AS area
           |FROM w GROUP BY event_type ORDER BY event_type""".stripMargin),
  )

  /** q245 — rounding semantics pinned: round() is HALF_UP (away from
    * zero at ties, both engines) while bround() is HALF_EVEN (banker's)
    * — DuckDB has no bround, so the oracle DERIVES half-even from
    * floor-parity CASE logic, which is the semantic spec itself. Tie
    * values (.0/.5 halves, both signs) are constructed by exact decimal
    * multiplication — never division, which DuckDB routes through
    * DOUBLE. The disagreement count equals the even-floor ties by
    * construction. */
  val q245 = QuerySpec(
    "q245_rounding_semantics",
    (s, d) => {
      import s.implicits._
      val x = (($"o_orderkey" - lit(7500)).cast(DecimalType(18, 1))
        * lit(0.5).cast(DecimalType(2, 1))).as("x")
      Tables.orders(s, d).select(x)
        .agg(count(lit(1)).as("n_rows"),
          sum(round($"x", 0)).cast("long").as("round_sum"),
          sum(bround($"x", 0)).cast("long").as("bround_sum"),
          sum(when(round($"x", 0) =!= bround($"x", 0), 1L).otherwise(0L))
            .as("n_disagree"),
          sum(floor($"x")).cast("long").as("floor_sum"),
          sum(ceil($"x")).cast("long").as("ceil_sum"))
    },
    Some("""WITH b AS (
           |  SELECT CAST(o_orderkey - 7500 AS DECIMAL(18,1))
           |    * CAST(0.5 AS DECIMAL(2,1)) AS x
           |  FROM orders),
           |r AS (
           |  SELECT x, round(x, 0) AS r_up,
           |    CASE WHEN x - floor(x) = 0.5 THEN
           |      CASE WHEN CAST(floor(x) AS BIGINT) % 2 = 0 THEN floor(x) ELSE ceil(x) END
           |    ELSE round(x, 0) END AS r_even
           |  FROM b)
           |SELECT count(*) AS n_rows,
           |  CAST(sum(r_up) AS BIGINT) AS round_sum,
           |  CAST(sum(r_even) AS BIGINT) AS bround_sum,
           |  CAST(sum(CASE WHEN r_up <> r_even THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_disagree,
           |  CAST(sum(floor(x)) AS BIGINT) AS floor_sum,
           |  CAST(sum(ceil(x)) AS BIGINT) AS ceil_sum
           |FROM r""".stripMargin),
  )

  val all: Seq[QuerySpec] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09,
    q10, q11, q12, q13, q14, q15, q16, q17, q18, q66, q75, q76, q82, q84, q85,
    q143, q144, q145, q146, q155, q156, q164, q166, q169, q170, q171, q172,
    q174, q175, q176, q177, q178, q179, q180, q181, q182, q184, q185, q186,
    q190, q196, q212, q213, q218, q223, q225, q229, q230, q235, q244, q245)
}
