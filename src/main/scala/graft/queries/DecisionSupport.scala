package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.queries.Det._

/** Round-5 decision-support additions: the classic TPC-H ad-hoc query
  * shapes (Q13/Q15/Q17/Q21/Q8/Q16 analogues, adapted to the synthetic
  * star schema's columns) that a warehouse user of the reference's
  * Athena/Glue layer would run over the ETL output. Each query is the
  * canonical instance of a DISTINCT physical-plan shape — outer-join
  * fan-out aggregation, scalar-max equality join, per-group-threshold
  * semi-reduction, only-one-offender anti-semantics, conditional share
  * rollup, and anti-filtered distinct counting — so together they pin
  * the join/agg strategy space a 100 TB ad-hoc workload exercises.
  */
object DecisionSupport {

  /** q201 — customer order-count distribution (TPC-H Q13 shape): LEFT
    * OUTER join with an extra non-key predicate ON THE JOIN (not a
    * post-filter — filtering after the join would turn absent orders
    * into dropped customers instead of c_count=0), then a two-level
    * aggregation: per-customer count, then a histogram of those counts.
    * Scale: the outer join shuffles both sides on custkey; the first
    * aggregate reuses that clustering (no extra exchange); the second
    * aggregate's domain is |distinct counts| — tiny at any corpus size.
    * The (custdist DESC, c_count DESC) sort is total because c_count is
    * the group key. */
  val q201 = QuerySpec(
    "q201_custdist",
    (s, d) => {
      import s.implicits._
      val c = Tables.customer(s, d).select($"c_custkey")
      val o = Tables.orders(s, d).select($"o_custkey", $"o_orderkey", $"o_orderpriority")
      c.join(o, $"c_custkey" === $"o_custkey" && $"o_orderpriority" =!= "1-URGENT",
          "left_outer")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("c_count"))
        .groupBy($"c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy($"custdist".desc, $"c_count".desc)
    },
    Some("""SELECT c_count, count(*) AS custdist FROM (
           |  SELECT c_custkey, count(o_orderkey) AS c_count
           |  FROM customer LEFT OUTER JOIN orders
           |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
           |  GROUP BY c_custkey)
           |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin),
  )

  /** q202 — small-quantity revenue (TPC-H Q17 shape): lineitems of one
    * brand whose quantity is below HALF the part's average quantity —
    * a per-group threshold computed from the same fact rows that are
    * then filtered by it. The per-part stats frame is |parts-in-brand|
    * rows → broadcast back to the fact side; at 100 TB the brand filter
    * prunes the part dim first and only surviving partkeys' lineitems
    * are touched (the part join is itself a broadcast semi-reduction).
    * Determinism: the threshold compare runs entirely in DECIMAL with
    * pinned widths — (12,2)·(2,0)·(18,0) = (33,2) stays under both
    * engines' 38-digit ceiling, so no precision-loss rescale fires and
    * the comparison is bit-exact cross-engine. */
  val q202 = QuerySpec(
    "q202_small_qty_revenue",
    (s, d) => {
      import s.implicits._
      val p = Tables.part(s, d).filter($"p_brand" === "Brand#1").select($"p_partkey")
      val li = Tables.lineitem(s, d)
        .join(broadcast(p), $"l_partkey" === $"p_partkey")
        .select($"l_partkey", $"l_quantity", $"l_extendedprice")
      val st = li.groupBy($"l_partkey".as("pk"))
        .agg(sum($"l_quantity".cast(DecimalType(12, 2))).as("qty_sum"),
          count(lit(1)).as("n"))
      li.join(broadcast(st), $"l_partkey" === $"pk")
        .filter($"l_quantity".cast(DecimalType(12, 2))
          * lit(2).cast(DecimalType(2, 0))
          * $"n".cast(DecimalType(18, 0)) < $"qty_sum")
        .agg(count(lit(1)).as("n_small"),
          (dsum($"l_extendedprice", 2) / 7.0).as("avg_yearly"))
    },
    Some(s"""WITH li AS (
            |  SELECT l_partkey, l_quantity, l_extendedprice
            |  FROM lineitem JOIN part ON l_partkey = p_partkey
            |  WHERE p_brand = 'Brand#1'),
            |st AS (SELECT l_partkey AS pk,
            |  sum(CAST(l_quantity AS DECIMAL(12,2))) AS qty_sum,
            |  count(*) AS n FROM li GROUP BY 1)
            |SELECT count(*) AS n_small,
            |  CAST(${Det.sqlDsum("l_extendedprice", 2)} / 7.0 AS DOUBLE) AS avg_yearly
            |FROM li JOIN st ON l_partkey = pk
            |WHERE CAST(l_quantity AS DECIMAL(12,2))
            |  * CAST(2 AS DECIMAL(2,0)) * CAST(n AS DECIMAL(18,0)) < qty_sum""".stripMargin),
  )

  /** q203 — suppliers who kept orders waiting (TPC-H Q21 shape,
    * adapted: the schema has no commit/receipt dates, so "late" is
    * shipping > 400 days after the order date): for finished orders
    * with at least two suppliers, count per supplier the orders where
    * that supplier was late and NO OTHER supplier was. The Spark side
    * states it as ONE aggregation cascade — per-(order,supplier) late
    * flag, per-order supplier/late tallies, join back, filter
    * `late ∧ n_supp≥2 ∧ n_late=1` — while the oracle states the
    * textbook EXISTS / NOT EXISTS double correlated subquery; the gate
    * certifies the aggregate formulation ≡ the exists formulation.
    * Scale: the cascade is two key-clustered aggregates plus one
    * key-sized self-join — no correlated per-row probing, which is
    * exactly why the aggregate form is the 100 TB rewrite of Q21. */
  val q203 = QuerySpec(
    "q203_waiting_supplier",
    (s, d) => {
      import s.implicits._
      val f = Tables.lineitem(s, d)
        .join(Tables.orders(s, d).filter($"o_orderstatus" === "F")
          .select($"o_orderkey", $"o_orderdate"),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_orderkey", $"l_suppkey")
        .agg(max(when($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 400 DAYS"), 1)
          .otherwise(0)).as("late"))
      val perOrder = f.groupBy($"l_orderkey".as("k"))
        .agg(count(lit(1)).as("n_supp"), sum($"late").as("n_late"))
      f.join(perOrder, $"l_orderkey" === $"k")
        .filter($"late" === 1 && $"n_supp" >= 2 && $"n_late" === 1)
        .join(broadcast(Tables.supplier(s, d)), $"l_suppkey" === $"s_suppkey")
        .groupBy($"s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy($"numwait".desc, $"s_name")
        .limit(20)
    },
    Some("""WITH f AS (
           |  SELECT l_orderkey, l_suppkey,
           |    max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 400 DAY
           |        THEN 1 ELSE 0 END) AS late
           |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |  WHERE o_orderstatus = 'F'
           |  GROUP BY 1, 2)
           |SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
           |FROM f l1 JOIN supplier ON l1.l_suppkey = s_suppkey
           |WHERE l1.late = 1
           |  AND EXISTS (SELECT 1 FROM f l2
           |    WHERE l2.l_orderkey = l1.l_orderkey
           |      AND l2.l_suppkey <> l1.l_suppkey)
           |  AND NOT EXISTS (SELECT 1 FROM f l3
           |    WHERE l3.l_orderkey = l1.l_orderkey
           |      AND l3.l_suppkey <> l1.l_suppkey AND l3.late = 1)
           |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin),
  )

  /** q204 — top supplier by quarter revenue (TPC-H Q15 shape): revenue
    * per supplier over one ship-date quarter, then the supplier(s)
    * whose revenue EQUALS the global max — a scalar-subquery equality
    * that only works because revenue stays an exact DECIMAL from the
    * partial sums through the max and the equality join (doubles would
    * make "equals the max" order-dependent). The 1-row max frame is
    * cross-joined (broadcast) against the per-supplier frame — the
    * standard Spark rewrite of an uncorrelated scalar subquery.
    * Scale: one quarter-pruned scan, one suppkey-clustered aggregate
    * (|suppliers| rows), one 1-row broadcast — nothing grows with the
    * fact table except the pruned scan itself. */
  val q204 = QuerySpec(
    "q204_top_supplier",
    (s, d) => {
      import s.implicits._
      val rev = Tables.lineitem(s, d)
        .filter($"l_shipdate" >= lit("1997-01-01") && $"l_shipdate" < lit("1997-04-01"))
        .groupBy($"l_suppkey".as("sk"))
        .agg(sum(($"l_extendedprice" * (lit(1) - $"l_discount"))
          .cast(DecimalType(30, 4))).as("total"))
      val mx = rev.agg(max($"total").as("mx"))
      rev.join(broadcast(mx), $"total" === $"mx")
        .join(broadcast(Tables.supplier(s, d)), $"sk" === $"s_suppkey")
        .select($"s_suppkey", $"s_name", $"total".cast("double").as("total_rev"))
        .orderBy($"s_suppkey")
    },
    Some("""WITH rev AS (
           |  SELECT l_suppkey AS sk,
           |    sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,4))) AS total
           |  FROM lineitem
           |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           |    AND l_shipdate < TIMESTAMP '1997-04-01'
           |  GROUP BY 1)
           |SELECT s_suppkey, s_name, CAST(total AS DOUBLE) AS total_rev
           |FROM rev JOIN supplier ON sk = s_suppkey
           |WHERE total = (SELECT max(total) FROM rev)
           |ORDER BY s_suppkey""".stripMargin),
  )

  /** q205 — national market share (TPC-H Q8 shape): for orders placed
    * by customers in one REGION, the yearly revenue share delivered by
    * suppliers of one NATION — a 6-table star join (fact + two
    * independent dimension chains) feeding a conditional-share rollup.
    * All five dimension chains are broadcast (region→nation→customer
    * collapses to a semi-filter before touching orders); the only big
    * shuffle is lineitem⋈orders on orderkey. Share = exact DECIMAL
    * conditional sum ÷ exact DECIMAL total, divided once in DOUBLE —
    * identical operands cross-engine, so the quotient is bit-identical
    * (Det's division rule). */
  val q205 = QuerySpec(
    "q205_market_share",
    (s, d) => {
      import s.implicits._
      val asiaNations = Tables.nation(s, d)
        .join(Tables.region(s, d).filter($"r_name" === "ASIA"),
          $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey")
      val cust = Tables.customer(s, d)
        .join(broadcast(asiaNations), $"c_nationkey" === $"n_nationkey")
        .select($"c_custkey")
      val ord = Tables.orders(s, d)
        .join(broadcast(cust), $"o_custkey" === $"c_custkey")
        .select($"o_orderkey", year($"o_orderdate").cast("bigint").as("o_year"))
      val supp = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d).select($"n_nationkey", $"n_name")),
          $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"n_name".as("s_nation"))
      val vol = ($"l_extendedprice" * (lit(1) - $"l_discount")).cast(DecimalType(30, 4))
      Tables.lineitem(s, d)
        .join(ord, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
        .groupBy($"o_year")
        .agg((sum(when($"s_nation" === "NATION_7", vol)
            .otherwise(lit(0).cast(DecimalType(30, 4)))).cast("double")
          / sum(vol).cast("double")).as("mkt_share"))
        .orderBy($"o_year")
    },
    Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           |  CAST(CAST(sum(CASE WHEN sn.n_name = 'NATION_7'
           |        THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,4))
           |        ELSE CAST(0 AS DECIMAL(30,4)) END) AS DOUBLE)
           |    / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,4)))
           |        AS DOUBLE) AS DOUBLE) AS mkt_share
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation cn ON c_nationkey = cn.n_nationkey
           |JOIN region ON cn.n_regionkey = r_regionkey
           |JOIN supplier ON l_suppkey = s_suppkey
           |JOIN nation sn ON s_nationkey = sn.n_nationkey
           |WHERE r_name = 'ASIA'
           |GROUP BY year(o_orderdate) ORDER BY o_year""".stripMargin),
  )

  /** q206 — supplier census by part type (TPC-H Q16 shape): distinct
    * suppliers per (p_type, size band), excluding a denylisted supplier
    * set (negative account balance) via NOT IN — which Spark plans as a
    * null-aware anti join; s_suppkey is non-nullable so the
    * three-valued-logic trap (q167) does not bite. The distinct count
    * dedups (type, band, suppkey) BEFORE counting — a two-shuffle
    * expand-dedup-count, Spark's standard exact-distinct plan. Scale:
    * the denylist is |suppliers| at worst → broadcast anti join; the
    * distinct's key space is |types|·|bands|·|suppliers| — dimension-
    * sized, not fact-sized. */
  val q206 = QuerySpec(
    "q206_supplier_census",
    (s, d) => {
      import s.implicits._
      val deny = Tables.supplier(s, d).filter($"s_acctbal" < 0).select($"s_suppkey")
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).select($"p_partkey", $"p_type", $"p_size")),
          $"l_partkey" === $"p_partkey")
        .join(broadcast(deny), $"l_suppkey" === $"s_suppkey", "left_anti")
        .select($"p_type", expr("p_size div 10").cast("bigint").as("size_band"),
          $"l_suppkey")
        .groupBy($"p_type", $"size_band")
        .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
        .orderBy($"p_type", $"size_band")
    },
    Some("""SELECT p_type, CAST(p_size // 10 AS BIGINT) AS size_band,
           |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
           |GROUP BY p_type, p_size // 10
           |ORDER BY p_type, size_band""".stripMargin),
  )

  /** q410 — TPC-H-Q7-shaped volume shipping: revenue flowing between an
    * ordered pair of nations (supplier side ships, customer side buys),
    * both directions, by ship year. Plan shape: both nation filters
    * reduce to 2-row frames that broadcast into supplier/customer; the
    * customer-side keys broadcast into orders; the only corpus-sized
    * exchange is the lineitem⋈orders fact-fact shuffle (Q7's
    * irreducible join). Revenue rides the Det.dsum DECIMAL discipline —
    * per-row double product, decimal-exact sum, one final correctly-
    * rounded double cast mirrored via the VARCHAR detour. */
  val q410 = QuerySpec(
    "q410_volume_shipping",
    (s, d) => {
      import s.implicits._
      val nat = Tables.nation(s, d)
        .filter($"n_name".isin("NATION_3", "NATION_7"))
        .select($"n_nationkey", $"n_name")
      val supp = Tables.supplier(s, d)
        .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"n_name".as("supp_nation"))
      val cust = Tables.customer(s, d)
        .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
        .select($"c_custkey", $"n_name".as("cust_nation"))
      val ord = Tables.orders(s, d)
        .join(broadcast(cust), $"o_custkey" === $"c_custkey")
        .select($"o_orderkey", $"cust_nation")
      Tables.lineitem(s, d)
        .join(ord, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
        .filter($"supp_nation" =!= $"cust_nation")
        .groupBy($"supp_nation", $"cust_nation",
          year($"l_shipdate").cast("bigint").as("l_year"))
        .agg(count(lit(1)).as("n_lines"),
          dsum($"l_extendedprice" * (lit(1) - $"l_discount"), 4).as("revenue"))
        .orderBy($"supp_nation", $"cust_nation", $"l_year")
    },
    Some(s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
            |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
            |  count(*) AS n_lines,
            |  ${sqlDsum("l_extendedprice * (1 - l_discount)", 4)} AS revenue
            |FROM lineitem
            |JOIN orders ON l_orderkey = o_orderkey
            |JOIN customer ON o_custkey = c_custkey
            |JOIN nation cn ON c_nationkey = cn.n_nationkey
            |JOIN supplier ON l_suppkey = s_suppkey
            |JOIN nation sn ON s_nationkey = sn.n_nationkey
            |WHERE sn.n_name IN ('NATION_3', 'NATION_7')
            |  AND cn.n_name IN ('NATION_3', 'NATION_7')
            |  AND sn.n_name <> cn.n_name
            |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin),
  )

  /** q417 — TPC-H-Q9-shaped product-line profit by supplier nation and
    * order year. The synthetic schema has no partsupp, so supply cost is
    * modeled as 10% of the part's retail price per unit — preserving
    * Q9's physical shape exactly: a selective part filter (name
    * contains 'red') that broadcasts into lineitem and prunes the fact
    * scan FIRST, a supplier→nation dimension chain folded into one
    * broadcast, and the lineitem⋈orders fact-fact shuffle as the only
    * corpus-sized exchange (same irreducible join as q410). Profit
    * rides Det.dsum: per-row double arithmetic, DECIMAL-exact sum,
    * one correctly-rounded double at the end. */
  val q417 = QuerySpec(
    "q417_profit_by_nation_year",
    (s, d) => {
      import s.implicits._
      val redParts = Tables.part(s, d)
        .filter($"p_name".contains("red"))
        .select($"p_partkey", $"p_retailprice")
      val supp = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)),
          $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"n_name".as("nation"))
      val ord = Tables.orders(s, d)
        .select($"o_orderkey", year($"o_orderdate").cast("bigint").as("o_year"))
      Tables.lineitem(s, d)
        .join(broadcast(redParts), $"l_partkey" === $"p_partkey")
        .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
        .join(ord, $"l_orderkey" === $"o_orderkey")
        .groupBy($"nation", $"o_year")
        .agg(count(lit(1)).as("n_lines"),
          dsum($"l_extendedprice" * (lit(1) - $"l_discount")
            - $"p_retailprice" * $"l_quantity" * lit(0.1), 4).as("profit"))
        .orderBy($"nation", $"o_year".desc)
    },
    Some(s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
            |  count(*) AS n_lines,
            |  ${sqlDsum("l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity * 0.1", 4)} AS profit
            |FROM lineitem
            |JOIN part ON l_partkey = p_partkey
            |JOIN supplier ON l_suppkey = s_suppkey
            |JOIN nation ON s_nationkey = n_nationkey
            |JOIN orders ON l_orderkey = o_orderkey
            |WHERE p_name LIKE '%red%'
            |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin),
  )

  /** q418 — TPC-H-Q10-shaped returned-item revenue report: the top 20
    * customers by revenue lost to returns ('R' lineitems) for orders
    * placed in one half-year window. Plan shape: the order-date range
    * prunes the orders scan, the returnflag filter prunes lineitem,
    * their join is the one fact-fact shuffle; customer and nation are
    * dimension broadcasts on top of the post-aggregate (customer-sized,
    * not fact-sized) frame. The global top-20 is a TakeOrdered over the
    * aggregated customers — never a single-partition window. Ranking
    * key is the DECIMAL-exact revenue (identical double on both
    * engines), tie-broken by custkey. */
  val q418 = QuerySpec(
    "q418_returned_item_revenue",
    (s, d) => {
      import s.implicits._
      val ord = Tables.orders(s, d)
        .filter($"o_orderdate" >= "1996-01-01" && $"o_orderdate" < "1996-07-01")
        .select($"o_orderkey", $"o_custkey")
      val rev = Tables.lineitem(s, d)
        .filter($"l_returnflag" === "R")
        .join(ord, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("n_return_lines"),
          dsum($"l_extendedprice" * (lit(1) - $"l_discount"), 4).as("revenue"))
      rev
        .join(broadcast(Tables.customer(s, d)), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .select($"c_custkey", $"c_name", $"n_name".as("nation"),
          $"c_acctbal", $"n_return_lines", $"revenue")
        .orderBy($"revenue".desc, $"c_custkey")
        .limit(20)
    },
    Some(s"""SELECT c_custkey, c_name, n_name AS nation, c_acctbal,
            |  count(*) AS n_return_lines,
            |  ${sqlDsum("l_extendedprice * (1 - l_discount)", 4)} AS revenue
            |FROM lineitem
            |JOIN orders ON l_orderkey = o_orderkey
            |JOIN customer ON o_custkey = c_custkey
            |JOIN nation ON c_nationkey = n_nationkey
            |WHERE l_returnflag = 'R'
            |  AND o_orderdate >= TIMESTAMP '1996-01-01'
            |  AND o_orderdate < TIMESTAMP '1996-07-01'
            |GROUP BY 1, 2, 3, 4
            |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin),
  )

  /** q442 — Herfindahl–Hirschman supplier-concentration index per
    * market segment: how concentrated is each segment's spend across
    * suppliers (the antitrust screen, and operationally the
    * single-supplier-dependency risk readout)? Revenue in exact cents;
    * shares quantized to ppm and HHI = Σ share² read back in ppm
    * (10⁶ = monopoly, 10⁶/n = perfectly even), with the Σ share²
    * accumulation DECIMAL/HUGEINT-lifted. One fact aggregate to the
    * (segment × supplier) frame, then segment-sized algebra; the
    * customer→segment dim broadcasts into orders. */
  val q442 = QuerySpec(
    "q442_hhi_concentration",
    (s, d) => {
      import s.implicits._
      val seg = Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)
          .select($"c_custkey", $"c_mktsegment")), $"o_custkey" === $"c_custkey")
        .select($"o_orderkey", $"c_mktsegment".as("segment"))
      val rev = Tables.lineitem(s, d)
        .join(seg, $"l_orderkey" === $"o_orderkey")
        .groupBy($"segment", $"l_suppkey")
        .agg(sum(expr(
          "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"))
          .as("cents"))
      val tot = rev.groupBy($"segment").agg(sum($"cents").as("seg_cents"))
      rev.join(broadcast(tot), "segment")
        .withColumn("share_ppm", expr("cents * 1000000L div seg_cents"))
        .groupBy($"segment")
        .agg(count(lit(1)).as("n_suppliers"),
          expr("""CAST(sum(CAST(share_ppm AS DECIMAL(38,0)) * share_ppm)
            | div 1000000 AS BIGINT)""".stripMargin.replaceAll("\n", ""))
            .as("hhi_ppm"),
          max($"share_ppm").as("top_share_ppm"))
        .orderBy($"segment")
    },
    Some("""WITH seg AS (
           |  SELECT o_orderkey, c_mktsegment AS segment
           |  FROM orders JOIN customer ON o_custkey = c_custkey),
           |rev AS (SELECT segment, l_suppkey,
           |    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS cents
           |  FROM lineitem JOIN seg ON l_orderkey = o_orderkey
           |  GROUP BY 1, 2),
           |tot AS (SELECT segment, CAST(sum(cents) AS BIGINT) AS seg_cents
           |  FROM rev GROUP BY segment),
           |sh AS (SELECT rev.segment, cents * 1000000 // seg_cents AS share_ppm
           |  FROM rev JOIN tot ON rev.segment = tot.segment)
           |SELECT segment, count(*) AS n_suppliers,
           |  CAST(sum(CAST(share_ppm AS HUGEINT) * share_ppm) // 1000000 AS BIGINT) AS hhi_ppm,
           |  CAST(max(share_ppm) AS BIGINT) AS top_share_ppm
           |FROM sh GROUP BY segment ORDER BY segment""".stripMargin),
  )

  /** q461 — ABC (Pareto) supplier classification: rank suppliers by
    * revenue, classify the head covering the first 80% of cumulative
    * revenue as A, the next 15% as B, the tail as C, and report each
    * class's member count and exact revenue share — the inventory-
    * management 80/20 readout (and the data-layout heuristic behind
    * "hot keys get their own files"). Revenue in exact cents; the
    * cumulative rank runs over the SUPPLIER DIMENSION (bounded,
    * dimension-sized — never the fact table); class boundaries compare
    * exact integer cumulative cents against total·thresholds. */
  val q461 = QuerySpec(
    "q461_abc_pareto_class",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val rev = Tables.lineitem(s, d)
        .groupBy($"l_suppkey")
        .agg(sum(expr(
          "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"))
          .as("cents"))
      val w = Window.orderBy($"cents".desc, $"l_suppkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = rev.agg(sum($"cents").as("total"))
      // Classes cut on where each supplier's cumulative share STARTS
      // (cum − own cents): the boundary-CROSSING supplier belongs to the
      // class it completes, so class A genuinely covers ≥80% of revenue
      // and a single-supplier corpus is A, not C (Round8EdgeSpec pins
      // the degenerate case).
      rev.crossJoin(broadcast(tot))
        .withColumn("cum", sum($"cents").over(w))
        .withColumn("cls",
          when(($"cum" - $"cents") * 100L < $"total" * 80L, "A")
            .when(($"cum" - $"cents") * 100L < $"total" * 95L, "B")
            .otherwise("C"))
        .groupBy($"cls")
        .agg(count(lit(1)).as("n_suppliers"),
          sum($"cents").as("class_cents"))
        .crossJoin(broadcast(tot))
        // class_cents·10⁶ crosses 2⁶³ at sf1 totals — DECIMAL lift.
        .select($"cls", $"n_suppliers",
          expr("CAST(CAST(class_cents AS DECIMAL(38,0)) * 1000000 div total AS BIGINT)")
            .as("revenue_share_ppm"))
        .orderBy($"cls")
    },
    Some("""WITH rev AS (
           |  SELECT l_suppkey,
           |    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS cents
           |  FROM lineitem GROUP BY 1),
           |t AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM rev),
           |c AS (SELECT cents,
           |    sum(cents) OVER (ORDER BY cents DESC, l_suppkey
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           |  FROM rev),
           |k AS (SELECT cents,
           |    CASE WHEN (cum - cents) * 100 < total * 80 THEN 'A'
           |         WHEN (cum - cents) * 100 < total * 95 THEN 'B'
           |         ELSE 'C' END AS cls
           |  FROM c CROSS JOIN t)
           |SELECT cls, count(*) AS n_suppliers,
           |  CAST(CAST(sum(cents) AS HUGEINT) * 1000000 // (SELECT total FROM t) AS BIGINT) AS revenue_share_ppm
           |FROM k GROUP BY cls ORDER BY cls""".stripMargin),
  )

  /** q469 — order-priority waiting report (TPC-H Q4 shape, adapted: no
    * commit date in the schema, so "waiting" is any lineitem shipped
    * > 300 days after the order date): for orders placed in 1996,
    * count per priority the orders with at least one such lineitem.
    * The EXISTS is a LEFT SEMI join with a non-equi residual on the
    * order-date — one fact-fact shuffle on orderkey, then a
    * |priorities|-row aggregate. The oracle states the textbook
    * correlated EXISTS; the gate certifies semi ≡ exists. */
  val q469 = QuerySpec(
    "q469_priority_waiting_count",
    (s, d) => {
      import s.implicits._
      val o = Tables.orders(s, d)
        .filter($"o_orderdate" >= "1996-01-01" && $"o_orderdate" < "1997-01-01")
        .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
      val l = Tables.lineitem(s, d).select($"l_orderkey", $"l_shipdate")
      o.join(l, $"l_orderkey" === $"o_orderkey"
          && $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 300 DAYS"),
          "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy($"o_orderpriority")
    },
    Some("""SELECT o_orderpriority, count(*) AS order_count
           |FROM orders o
           |WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'
           |  AND EXISTS (SELECT 1 FROM lineitem l
           |    WHERE l.l_orderkey = o.o_orderkey
           |      AND l.l_shipdate > o.o_orderdate + INTERVAL 300 DAY)
           |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
  )

  /** q470 — important-part supply value (TPC-H Q11 shape over the fact
    * table — the schema has no partsupp, so "supply value" is shipped
    * revenue): parts whose exact-cents revenue exceeds 1.5x the MEAN
    * part revenue (the HAVING-vs-global-scalar shape). The threshold is
    * deliberately scale-FREE — Q11's fixed-fraction cut goes vacuous
    * the moment the part population grows (the sf1 sweep caught
    * exactly that: 10x parts diluted every share 10x and emptied the
    * result), while x-of-mean selects the same head at every SF. One
    * fact aggregate to |parts| rows; the 2-row global frame broadcasts
    * back; exact integer cents, DECIMAL-lifted products. */
  val q470 = QuerySpec(
    "q470_important_part_value",
    (s, d) => {
      import s.implicits._
      val r = Tables.lineitem(s, d)
        .groupBy($"l_partkey")
        .agg(sum(expr(
          "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"))
          .as("cents"))
      r.crossJoin(broadcast(r.agg(sum($"cents").as("total"),
          count(lit(1)).as("n_parts"))))
        .filter(expr(
          "CAST(cents AS DECIMAL(38,0)) * n_parts * 2 > CAST(total AS DECIMAL(38,0)) * 3"))
        .select($"l_partkey", $"cents",
          expr("CAST(CAST(cents AS DECIMAL(38,0)) * n_parts * 1000000 div total AS BIGINT)")
            .as("vs_mean_ppm"))
        .orderBy($"cents".desc, $"l_partkey")
    },
    Some("""WITH r AS (SELECT l_partkey,
           |    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS cents
           |  FROM lineitem GROUP BY 1),
           |t AS (SELECT CAST(sum(cents) AS BIGINT) AS total,
           |  CAST(count(*) AS BIGINT) AS n_parts FROM r)
           |SELECT l_partkey, cents,
           |  CAST(CAST(cents AS HUGEINT) * n_parts * 1000000 // total AS BIGINT) AS vs_mean_ppm
           |FROM r CROSS JOIN t
           |WHERE CAST(cents AS HUGEINT) * n_parts * 2 > CAST(total AS HUGEINT) * 3
           |ORDER BY cents DESC, l_partkey""".stripMargin),
  )

  /** q471 — promo revenue share by ship year (TPC-H Q14 shape,
    * widened from one month to the year series): the conditional-
    * share-of-total readout — PROMO-type parts' exact-cents revenue
    * over each year's total, in ppm. Part type broadcasts into the
    * fact scan; ONE aggregate computes both the conditional and the
    * total sum (no second pass, no self-join). */
  val q471 = QuerySpec(
    "q471_promo_revenue_share",
    (s, d) => {
      import s.implicits._
      val p = Tables.part(s, d).select($"p_partkey", $"p_type")
      Tables.lineitem(s, d)
        .join(broadcast(p), $"l_partkey" === $"p_partkey")
        .select(year($"l_shipdate").as("yr"),
          expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)").as("cents"),
          ($"p_type" === "PROMO").as("promo"))
        .groupBy($"yr")
        .agg(sum(when($"promo", $"cents").otherwise(0L)).as("promo_cents"),
          sum($"cents").as("total_cents"))
        .select($"yr", $"promo_cents", $"total_cents",
          expr("promo_cents * 1000000L div total_cents").as("promo_share_ppm"))
        .orderBy($"yr")
    },
    Some("""SELECT CAST(year(l_shipdate) AS INT) AS yr,
           |  CAST(sum(CASE WHEN p_type = 'PROMO'
           |    THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
           |    ELSE 0 END) AS BIGINT) AS promo_cents,
           |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_cents,
           |  CAST(sum(CASE WHEN p_type = 'PROMO'
           |    THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
           |    ELSE 0 END) * 1000000
           |    // sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS promo_share_ppm
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |GROUP BY 1 ORDER BY yr""".stripMargin),
  )

  /** q472 — large-volume orders (TPC-H Q18 shape): orders whose total
    * quantity exceeds 250, with their customer — the grouped-HAVING-
    * subquery-feeding-a-join shape. The qty census is one fact
    * aggregate (exact DECIMAL sums — quantity is a double column);
    * survivors (hundreds, not millions) join back to orders+customer
    * broadcast-side. Top 20 by quantity. */
  val q472 = QuerySpec(
    "q472_large_volume_orders",
    (s, d) => {
      import s.implicits._
      val big = Tables.lineitem(s, d)
        .groupBy($"l_orderkey")
        .agg(sum($"l_quantity".cast(DecimalType(12, 2))).as("qty"))
        .filter($"qty" > 250)
      big.join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .join(broadcast(Tables.customer(s, d)
          .select($"c_custkey", $"c_name")), $"o_custkey" === $"c_custkey")
        .select($"c_name", $"o_orderkey", dstr($"o_orderdate").as("o_date"),
          $"qty".cast("double").as("total_qty"))
        .orderBy($"total_qty".desc, $"o_orderkey")
        .limit(20)
    },
    Some("""WITH big AS (
           |  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS qty
           |  FROM lineitem GROUP BY 1 HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 250)
           |SELECT c_name, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date,
           |  CAST(qty AS DOUBLE) AS total_qty
           |FROM big JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |ORDER BY total_qty DESC, o_orderkey LIMIT 20""".stripMargin),
  )

  /** q473 — dormant rich customers (TPC-H Q22 shape, nation-grouped —
    * the schema has no phone column): customers with an account
    * balance above the positive-balance average with no orders since
    * 1999 (every synthetic customer ordered at least once, so Q22's
    * never-ordered filter would be vacuous — churn is the live
    * version) — per nation, how many and how much idle budget. The
    * scalar average is exact integer cents over a broadcast 1-row
    * frame; the churn test is a LEFT ANTI join against the recent
    * order slice (the oracle states NOT EXISTS). */
  val q473 = QuerySpec(
    "q473_dormant_rich_customers",
    (s, d) => {
      import s.implicits._
      val c = Tables.customer(s, d)
        .select($"c_custkey", $"c_nationkey",
          expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("bal_c"))
      // Integer division on BOTH engines: (sum/count).cast("long") would
      // TRUNCATE the double toward zero while DuckDB's CAST(... AS
      // BIGINT) rounds to nearest — a customer sitting exactly on the
      // rounded cent would flip the bal_c > avg_c cut. `div` and `//`
      // are the same exact floor over identical integers.
      val avgPos = c.filter($"bal_c" > 0L)
        .agg(expr("sum(bal_c) div count(1)").as("avg_c"))
      c.crossJoin(broadcast(avgPos))
        .filter($"bal_c" > $"avg_c")
        .join(Tables.orders(s, d)
          .filter($"o_orderdate" >= "1999-01-01").select($"o_custkey"),
          $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"c_nationkey")
        .agg(count(lit(1)).as("n_customers"), sum($"bal_c").as("idle_cents"))
        .orderBy($"c_nationkey")
    },
    Some("""WITH c AS (SELECT c_custkey, c_nationkey,
           |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c FROM customer),
           |a AS (SELECT CAST(sum(bal_c) // count(*) AS BIGINT) AS avg_c
           |  FROM c WHERE bal_c > 0)
           |SELECT c_nationkey, count(*) AS n_customers,
           |  CAST(sum(bal_c) AS BIGINT) AS idle_cents
           |FROM c CROSS JOIN a
           |WHERE bal_c > avg_c
           |  AND NOT EXISTS (SELECT 1 FROM orders o
           |    WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= '1999-01-01')
           |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin),
  )

  /** q474 — dominant suppliers of scarce parts (TPC-H Q20 shape over
    * the fact table — no partsupp, so "holds the stock" becomes "ships
    * ≥10% of the part's volume"): for red parts, suppliers dominating
    * at least TWO parts' shipped quantity. The nested semi chain: part
    * name filter broadcasts into the fact scan; per-(part, supplier)
    * qty and per-part totals are two key-clustered aggregates; the
    * dominance test and the ≥2 HAVING reduce to a supplier-keyed frame
    * joined to the supplier dim. Quantities exact DECIMAL. */
  val q474 = QuerySpec(
    "q474_dominant_part_suppliers",
    (s, d) => {
      import s.implicits._
      val pp = Tables.part(s, d).filter($"p_name".like("red%"))
        .select($"p_partkey")
      val f = Tables.lineitem(s, d)
        .join(broadcast(pp), $"l_partkey" === $"p_partkey")
        .groupBy($"l_partkey", $"l_suppkey")
        .agg(sum($"l_quantity".cast(DecimalType(12, 2))).as("q"))
      val t = f.groupBy($"l_partkey").agg(sum($"q").as("tq"))
      val dom = f.join(t, Seq("l_partkey"))
        .filter($"q" * 10 > $"tq")
        .groupBy($"l_suppkey")
        .agg(count(lit(1)).as("n_dominated"))
        .filter($"n_dominated" >= 2)
      dom.join(broadcast(Tables.supplier(s, d)
          .select($"s_suppkey", $"s_name")), $"l_suppkey" === $"s_suppkey")
        .select($"s_suppkey", $"s_name", $"n_dominated")
        .orderBy($"n_dominated".desc, $"s_suppkey")
    },
    Some("""WITH pp AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
           |f AS (SELECT l_partkey, l_suppkey,
           |    sum(CAST(l_quantity AS DECIMAL(12,2))) AS q
           |  FROM lineitem JOIN pp ON l_partkey = p_partkey GROUP BY 1, 2),
           |t AS (SELECT l_partkey, sum(q) AS tq FROM f GROUP BY 1),
           |dom AS (SELECT l_suppkey, count(*) AS n_dominated
           |  FROM f JOIN t USING (l_partkey) WHERE q * 10 > tq
           |  GROUP BY 1 HAVING count(*) >= 2)
           |SELECT s_suppkey, s_name, n_dominated
           |FROM dom JOIN supplier ON l_suppkey = s_suppkey
           |ORDER BY n_dominated DESC, s_suppkey""".stripMargin),
  )

  /** q482 — priority shipping census (TPC-H Q12 shape — the schema has
    * no shipmode/commitdate columns, so the mode is the return flag and
    * the late-vs-committed filters collapse to the ship-date window):
    * per flag, how many 1998-shipped lines belong to URGENT/HIGH
    * orders vs the rest — the two-way CASE-pivot-inside-one-aggregate
    * shape (never two passes), with the date filter pushed into the
    * fact scan and orders joined on the key. One fact-fact shuffle;
    * the output is |flags| rows. */
  val q482 = QuerySpec(
    "q482_priority_shipping_census",
    (s, d) => {
      import s.implicits._
      val hi = Seq("1-URGENT", "2-HIGH")
      Tables.lineitem(s, d)
        .filter($"l_shipdate" >= "1998-01-01" && $"l_shipdate" < "1999-01-01")
        .select($"l_orderkey", $"l_returnflag")
        .join(Tables.orders(s, d).select($"o_orderkey", $"o_orderpriority"),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_returnflag")
        .agg(
          sum(when($"o_orderpriority".isin(hi: _*), 1L).otherwise(0L))
            .as("high_line_count"),
          sum(when($"o_orderpriority".isin(hi: _*), 0L).otherwise(1L))
            .as("low_line_count"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag,
           |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
           |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
           |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
           |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |WHERE l_shipdate >= '1998-01-01' AND l_shipdate < '1999-01-01'
           |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
  )

  /** q483 — min-cost supplier per part (TPC-H Q2 shape, completing the
    * analogue set — no partsupp table, so supply cost is the minimum
    * discounted line price in exact cents a supplier has ever shipped
    * the part for): for small PROMO parts, the ASIA-region supplier(s)
    * achieving each part's minimum cost. The Q2 essentials survive the
    * adaptation: the correlated scalar-min subquery (rewritten as a
    * per-part min aggregate joined back on equality — the decorrelation
    * Spark and every warehouse plan), the two-level region→nation→
    * supplier dim reduction (broadcast semi into the fact scan), and a
    * deterministic top-100. Costs are exact BIGINT cents — no double
    * division anywhere. */
  val q483 = QuerySpec(
    "q483_min_cost_supplier",
    (s, d) => {
      import s.implicits._
      val asiaSupp = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(s, d).filter($"r_name" === "ASIA")),
          $"n_regionkey" === $"r_regionkey")
        .select($"s_suppkey", $"s_name", $"n_name")
      val pp = Tables.part(s, d)
        .filter($"p_type" === "PROMO" && $"p_size" <= 10)
        .select($"p_partkey", $"p_name")
      val cost = Tables.lineitem(s, d)
        .join(broadcast(pp.select($"p_partkey")),
          $"l_partkey" === $"p_partkey", "left_semi")
        .join(broadcast(asiaSupp.select($"s_suppkey")),
          $"l_suppkey" === $"s_suppkey", "left_semi")
        .select($"l_partkey", $"l_suppkey",
          expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)")
            .as("c"))
        .groupBy($"l_partkey", $"l_suppkey")
        .agg(min($"c").as("cost_c"))
      val minCost = cost.groupBy($"l_partkey").agg(min($"cost_c").as("min_c"))
      cost.join(minCost, Seq("l_partkey"))
        .filter($"cost_c" === $"min_c")
        .join(broadcast(pp), $"l_partkey" === $"p_partkey")
        .join(broadcast(asiaSupp), $"l_suppkey" === $"s_suppkey")
        .select($"p_partkey", $"p_name", $"s_suppkey", $"s_name", $"n_name",
          $"cost_c")
        .orderBy($"cost_c", $"p_partkey", $"s_suppkey")
        .limit(100)
    },
    Some("""WITH asia AS (
           |  SELECT s_suppkey, s_name, n_name
           |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
           |  JOIN region ON n_regionkey = r_regionkey
           |  WHERE r_name = 'ASIA'),
           |pp AS (SELECT p_partkey, p_name FROM part
           |  WHERE p_type = 'PROMO' AND p_size <= 10),
           |cost AS (
           |  SELECT l_partkey, l_suppkey,
           |    min(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS cost_c
           |  FROM lineitem
           |  WHERE l_partkey IN (SELECT p_partkey FROM pp)
           |    AND l_suppkey IN (SELECT s_suppkey FROM asia)
           |  GROUP BY 1, 2)
           |SELECT p_partkey, p_name, s_suppkey, s_name, n_name, cost_c
           |FROM cost
           |JOIN pp ON l_partkey = p_partkey
           |JOIN asia ON l_suppkey = s_suppkey
           |WHERE cost_c = (SELECT min(c2.cost_c) FROM cost c2
           |  WHERE c2.l_partkey = cost.l_partkey)
           |ORDER BY cost_c, p_partkey, s_suppkey LIMIT 100""".stripMargin),
  )

  val all: Seq[QuerySpec] =
    Seq(q201, q202, q203, q204, q205, q206, q410, q417, q418, q442, q461,
      q469, q470, q471, q472, q473, q474, q482, q483)
}
