package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.Tables
import graft.etl.TaxiEtl
import graft.functions.TopK
import Det._

/** Round-3 coverage restorations (VERDICT r2 "What's missing"):
  * approx_count_distinct (§2.7), the Tier A ETL write path end-to-end,
  * and a typed `Aggregator` UDAF (§2.10).
  */
object Extras {

  /** q39 — HyperLogLog++ `approx_count_distinct` beside its exact twin.
    * An estimate never hash-matches across engines, so the gate is a
    * tolerance CONTRACT: the emitted boolean asserts the HLL estimate is
    * within ±5% of the exact count (rsd = 0.02, so 5% is > 2σ slack),
    * and the oracle expects TRUE plus the exact counts. Deterministic:
    * Spark's HLL++ is a pure function of the data and rsd. Scale: the
    * HLL sketch is fixed-size per group and merges associatively —
    * O(1) shuffle per group vs count(DISTINCT)'s Expand duplication. */
  val q39 = QuerySpec(
    "q39_agg_approx_distinct",
    (s, d) => {
      import s.implicits._
      Tables.fanOut(Tables.lineitem(s, d), col("l_orderkey"))
        .groupBy($"l_returnflag")
        .agg(
          countDistinct($"l_partkey").as("n_parts_exact"),
          approx_count_distinct($"l_partkey", 0.02).as("hll"),
          count(lit(1)).as("n_rows"))
        .select($"l_returnflag", $"n_parts_exact", $"n_rows",
          (abs($"hll" - $"n_parts_exact") <= $"n_parts_exact" * lit(0.05))
            .as("hll_within_5pct"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts_exact,
           |  count(*) AS n_rows, TRUE AS hll_within_5pct
           |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
  )

  /** q40 — the TaxiEtl pipeline end-to-end: write with overwrite +
    * repartition(2) to a scratch dir, re-read, and emit multiset
    * checksums plus the output file count. The oracle derives the same
    * checksums from the source table — proving the round-trip preserved
    * the multiset and the literal column, and that exactly nOut=2 files
    * were produced (the reference job's layout contract). */
  val q40 = QuerySpec(
    "q40_etl_roundtrip",
    (s, d) => {
      import s.implicits._
      // Unique dir per invocation (a fixed path would race concurrent
      // processes), deleted in a finally — a bench loop must not
      // accumulate lineitem-sized copies in tmp even when a run (or the
      // eager collect) throws.
      val tmp = java.nio.file.Files.createTempDirectory("graft_taxi_etl")
      try {
        val out = s"$tmp/out"
        TaxiEtl.run(s, d, out)
        val agg = s.read.parquet(out)
          // input_file_name() is non-deterministic and may not sit inside
          // an aggregate — project it to an attribute first.
          .withColumn("fname", input_file_name())
          .agg(
            count(lit(1)).as("n_rows"),
            sum($"l_orderkey").as("key_sum"),
            dsum($"l_extendedprice", 2).as("price_sum"),
            countDistinct(date_format($"current_ts", "yyyy-MM-dd HH:mm:ss")).as("n_ts"),
            countDistinct($"fname").as("n_files"))
        Eager(agg) // eager: the round-trip dir can be deleted
      } finally graft.Fs.deleteTree(tmp)
    },
    Some(s"""SELECT count(*) AS n_rows, CAST(sum(l_orderkey) AS BIGINT) AS key_sum,
            |  ${sqlDsum("l_extendedprice", 2)} AS price_sum,
            |  CAST(1 AS BIGINT) AS n_ts, CAST(2 AS BIGINT) AS n_files
            |FROM lineitem""".stripMargin),
  )

  /** q41 — the [[TopK]] typed Aggregator as a UDAF: top-3 order totals
    * per customer. Groups with < 3 orders yield nulls in the tail slots
    * on both engines (out-of-range element_at / list index → NULL). */
  val q41 = QuerySpec(
    "q41_udaf_topk",
    (s, d) => {
      import s.implicits._
      val top3 = udaf(TopK(3))
      Tables.orders(s, d)
        .groupBy($"o_custkey")
        .agg(top3($"o_totalprice").as("t"))
        // get() is null-tolerant past the end (ANSI-safe for groups < k).
        .select($"o_custkey", get($"t", lit(0)).as("top1"),
          get($"t", lit(1)).as("top2"), get($"t", lit(2)).as("top3"))
        .orderBy($"o_custkey")
    },
    Some("""SELECT o_custkey, lst[1] AS top1, lst[2] AS top2, lst[3] AS top3
           |FROM (SELECT o_custkey, list_sort(list(o_totalprice), 'DESC')[1:3] AS lst
           |      FROM orders GROUP BY o_custkey)
           |ORDER BY o_custkey""".stripMargin),
  )

  /** q42 — as-of join, an operator Spark has no built-in for (SURVEY
    * §2.6 named it not-needed for the reference; it IS needed by any
    * event pipeline): for each purchase, the latest click by the same
    * user at-or-before the purchase time — classic attribution.
    *
    * Implemented with the scalable union+ordered-window pattern, NOT an
    * inequality join: both sides union into one stream, one shuffle on
    * user_id, one in-partition sort by (ts, side) with clicks ordered
    * before purchases at equal timestamps, and `last(..., ignoreNulls)`
    * over an unbounded-preceding frame carries the most recent click
    * forward. Cost is O(n log n) per key vs the O(n·m) per key of a
    * range-join + argmax; no BNLJ anywhere. Clicks are pre-deduped per
    * (user, ts) with max(value) so the as-of pick is deterministic under
    * ties. The DuckDB oracle is a native ASOF LEFT JOIN. */
  val q42 = QuerySpec(
    "q42_asof_join",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      val clicks = ev.filter($"event_type" === "click")
        .groupBy($"user_id", $"ts").agg(max($"value").as("cv"))
        .select($"user_id", $"ts", lit(0).as("side"),
          lit(null).cast("long").as("event_id"),
          lit(null).cast("double").as("pvalue"), $"cv")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", lit(1).as("side"), $"event_id",
          $"value".as("pvalue"), lit(null).cast("double").as("cv"))
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      clicks.unionByName(purchases)
        .withColumn("click_value", last($"cv", ignoreNulls = true).over(w))
        .withColumn("click_ts", last(when($"side" === 0, $"ts"), ignoreNulls = true).over(w))
        .filter($"side" === 1)
        .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"),
          $"pvalue".as("purchase_value"),
          unix_micros($"click_ts").as("click_ts_us"), $"click_value")
        .orderBy($"event_id")
    },
    Some("""WITH c AS (SELECT user_id, ts, max(value) AS click_value FROM events
           |           WHERE event_type = 'click' GROUP BY 1, 2),
           |p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase')
           |SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us, p.value AS purchase_value,
           |  epoch_us(c.ts) AS click_ts_us, c.click_value
           |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
           |ORDER BY event_id""".stripMargin),
  )

  /** Session gap shared by batch q43 and the streaming twin (q44):
    * events ≤ 30 minutes apart per user belong to one session. */
  val SessionGapUs: Long = 30L * 60 * 1000000

  /** q43 — sessionization (batch): per-user 30-minute-gap sessions over
    * events, the canonical event-pipeline operator. One shuffle on
    * user_id, one in-partition sort, then lag + running-sum assigns
    * session ids (a new session starts where the gap to the previous
    * event exceeds 30 min) and a hash agg rolls sessions up. Both window
    * phases share the (user_id | ts, event_id) sort. The streaming twin
    * (q44, flatMapGroupsWithState) must produce value-identical sessions
    * — SessionizeSpec asserts it. */
  val q43 = QuerySpec(
    "q43_sessionize",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables.events(s, d)
        .select($"user_id", $"event_id", $"ts", $"value")
        .withColumn("prev", lag($"ts", 1).over(w))
        .withColumn("ns",
          when($"prev".isNull ||
            unix_micros($"ts") - unix_micros($"prev") > SessionGapUs, 1).otherwise(0))
        .withColumn("sid", sum($"ns").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id", $"sid")
        .agg(
          min(unix_micros($"ts")).as("session_start_us"),
          max(unix_micros($"ts")).as("session_end_us"),
          count(lit(1)).as("n_events"),
          dsum($"value", 4).as("value_sum"))
        .select($"user_id", $"session_start_us", $"session_end_us",
          $"n_events", $"value_sum")
        .orderBy($"user_id", $"session_start_us")
    },
    Some(s"""WITH x AS (SELECT user_id, event_id, ts, value,
            |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM events),
            |y AS (SELECT *, CASE WHEN prev IS NULL
            |    OR epoch_us(ts) - epoch_us(prev) > ${SessionGapUs}::BIGINT THEN 1 ELSE 0 END AS ns FROM x),
            |z AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
            |        ROWS UNBOUNDED PRECEDING) AS sid FROM y)
            |SELECT user_id, epoch_us(min(ts)) AS session_start_us,
            |  epoch_us(max(ts)) AS session_end_us, count(*) AS n_events,
            |  ${sqlDsum("value", 4)} AS value_sum
            |FROM z GROUP BY user_id, sid
            |ORDER BY user_id, session_start_us""".stripMargin),
  )

  /** q46 — pivot (long→wide): hourly event-type value sums as one row
    * per hour × one column per type. Spark's `pivot` with EXPLICIT
    * values — at scale the values-discovery pass (a distinct scan) is
    * the hidden cost, so the type list is pinned; the plan is then a
    * plain two-phase hash agg over conditional sums, exactly what the
    * oracle spells out. */
  val q46 = QuerySpec(
    "q46_pivot_hourly",
    (s, d) => {
      import s.implicits._
      val types = Seq("click", "error", "purchase", "signup", "view")
      Tables.events(s, d)
        .withColumn("h", hour($"ts"))
        .groupBy($"h")
        .pivot("event_type", types)
        .agg(dsum($"value", 4))
        .select($"h" +: types.map(t => col(t).as(s"${t}_sum")): _*)
        .orderBy($"h")
    },
    Some {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val cols = types.map(t =>
        s"CAST(sum(CASE WHEN event_type = '$t' THEN CAST(value AS DECIMAL(30,4)) END) AS DOUBLE) AS ${t}_sum")
        .mkString(",\n  ")
      s"""SELECT CAST(extract(hour FROM ts) AS INT) AS h,
         |  $cols
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
    },
  )

  /** q47 — percentiles: exact interpolated `percentile` (the
    * sort-per-group aggregate; both engines implement the standard
    * p·(n−1) linear interpolation) beside `percentile_approx`, whose
    * sketch estimate gates like q39's HLL — a boolean asserting it lands
    * within 5% of exact. Scale: exact percentile holds a group's values
    * in memory (bounded groups only — 5 event types); the approx sketch
    * is the unbounded-cardinality tool. */
  val q47 = QuerySpec(
    "q47_percentile",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy($"event_type")
        .agg(
          expr("percentile(value, 0.5)").as("p50"),
          expr("percentile(value, 0.9)").as("p90"),
          expr("percentile_approx(value, 0.9, 10000)").as("p90a"),
          count(lit(1)).as("n_events"))
        .select($"event_type", $"p50", $"p90", $"n_events",
          (abs($"p90a" - $"p90") <= abs($"p90") * lit(0.05)).as("approx_within_5pct"))
        .orderBy($"event_type")
    },
    Some("""SELECT event_type, quantile_cont(value, 0.5) AS p50,
           |  quantile_cont(value, 0.9) AS p90, count(*) AS n_events,
           |  TRUE AS approx_within_5pct
           |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
  )

  /** q49 — full outer join: per-nation customer counts ⟗ per-nation
    * supplier counts, preserving nations that appear on only one side
    * (the one outer-join shape q07–q09 don't cover). Both inputs are
    * pre-aggregated to one row per key before the join — full outer
    * can't broadcast (both sides must survive), so shrinking both sides
    * to key-level aggregates first is the scale move; the join then
    * shuffles 25 rows a side instead of the base tables. */
  val q49 = QuerySpec(
    "q49_join_full_outer",
    (s, d) => {
      import s.implicits._
      val c = Tables.customer(s, d).filter($"c_acctbal" > 9000.0)
        .groupBy($"c_nationkey".as("nk")).agg(count(lit(1)).as("n_cust"))
      val sup = Tables.supplier(s, d).filter($"s_acctbal" > 5000.0)
        .groupBy($"s_nationkey".as("nk")).agg(count(lit(1)).as("n_supp"))
      c.join(sup, Seq("nk"), "full_outer")
        .select($"nk", coalesce($"n_cust", lit(0)).as("n_cust"),
          coalesce($"n_supp", lit(0)).as("n_supp"))
        .orderBy($"nk")
    },
    Some("""SELECT coalesce(c.nk, s.nk) AS nk,
           |  coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
           |FROM (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer
           |      WHERE c_acctbal > 9000.0 GROUP BY 1) c
           |FULL OUTER JOIN (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier
           |      WHERE s_acctbal > 5000.0 GROUP BY 1) s USING (nk)
           |ORDER BY nk""".stripMargin),
  )

  /** q50 — multiset (ALL) set operations, completing q16's distinct
    * family: duplicates are preserved per bag semantics, so counts
    * expose the difference (intersectAll keeps min(multiplicity),
    * exceptAll subtracts). Spark plans these as aggregate+generate
    * (replicate_rows), no sort. */
  val q50 = QuerySpec(
    "q50_setops_multiset",
    (s, d) => {
      import s.implicits._
      val l = Tables.lineitem(s, d)
      val a = l.filter($"l_quantity" >= 25.0).select($"l_orderkey")
      val b = l.filter($"l_discount" >= 0.05).select($"l_orderkey")
      def tagged(tag: String, df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)).as("n")).select(lit(tag).as("op"), $"n")
      tagged("except_all", a.exceptAll(b))
        .unionAll(tagged("intersect_all", a.intersectAll(b)))
        .unionAll(tagged("union_all", a.unionAll(b)))
        .orderBy($"op")
    },
    Some("""SELECT 'except_all' AS op, count(*) AS n FROM (
           |  SELECT l_orderkey FROM lineitem WHERE l_quantity >= 25.0
           |  EXCEPT ALL SELECT l_orderkey FROM lineitem WHERE l_discount >= 0.05)
           |UNION ALL
           |SELECT 'intersect_all', count(*) FROM (
           |  SELECT l_orderkey FROM lineitem WHERE l_quantity >= 25.0
           |  INTERSECT ALL SELECT l_orderkey FROM lineitem WHERE l_discount >= 0.05)
           |UNION ALL
           |SELECT 'union_all', count(*) FROM (
           |  SELECT l_orderkey FROM lineitem WHERE l_quantity >= 25.0
           |  UNION ALL SELECT l_orderkey FROM lineitem WHERE l_discount >= 0.05)
           |ORDER BY op""".stripMargin),
  )

  /** q58 — calendar-spine gap fill: the hourly rollup (q34's shape)
    * left-joined onto a generated hour spine so silent gaps become
    * explicit zero rows — the completeness contract dashboards and
    * SLA monitors need (an absent hour and a zero hour are different
    * facts). The spine derives from the data's own min/max hour via
    * sequence() on a 1-row aggregate — no driver-side collect; at
    * scale the spine is tiny (one row per hour) and broadcasts onto
    * the aggregated side, never the raw events. */
  val q58 = QuerySpec(
    "q58_events_gap_fill",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      val bounds = ev.agg(
        date_trunc("hour", min($"ts")).as("lo"),
        date_trunc("hour", max($"ts")).as("hi"))
      val spine = bounds.select(
        explode(expr("sequence(lo, hi, interval 1 hour)")).as("h"))
      val hourly = ev
        .groupBy(date_trunc("hour", $"ts").as("h"))
        .agg(count(lit(1)).as("n"), dsum($"value", 4).as("v"))
      // Both sides are hour-count-sized; broadcasting the aggregated
      // side keeps the left join shuffle-free (Catalyst can't know the
      // post-aggregate size statically).
      spine.join(broadcast(hourly), Seq("h"), "left")
        .select(
          date_format($"h", "yyyy-MM-dd HH:mm:ss").as("window_start"),
          coalesce($"n", lit(0L)).as("n_events"),
          coalesce($"v", lit(0.0)).as("value_sum"))
        .orderBy($"window_start")
    },
    Some(s"""WITH b AS (SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi FROM events),
            |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM b),
            |a AS (SELECT date_trunc('hour', ts) AS h, count(*) AS n, ${sqlDsum("value", 4)} AS v
            |      FROM events GROUP BY 1)
            |SELECT strftime(spine.h, '%Y-%m-%d %H:%M:%S') AS window_start,
            |  coalesce(n, 0) AS n_events, coalesce(v, 0.0) AS value_sum
            |FROM spine LEFT JOIN a ON spine.h = a.h
            |ORDER BY window_start""".stripMargin),
  )

  /** q74 — incremental aggregate maintenance: the hourly rollup held as
    * mergeable state (exact DECIMAL sums + counts), a new delivery's
    * delta rolled up the same way, and the two MERGED by key — the
    * incremental-view-maintenance pattern every always-on pipeline uses
    * instead of recomputing 100 TB per batch. Exactness is the point:
    * because the partial state is decimal (order-independent), merged
    * state is bit-identical to a from-scratch rollup, which is precisely
    * what the oracle asserts (it recomputes the whole table). The merge
    * is a full-outer join of two key-level aggregates (both sides
    * already tiny — q49's shape). */
  val q74 = QuerySpec(
    "q74_incremental_agg_merge",
    (s, d) => {
      import s.implicits._
      val split = "2024-01-16 00:00:00"
      val ev = Tables.events(s, d)
      def state(df: org.apache.spark.sql.DataFrame) = df
        .groupBy(date_trunc("hour", $"ts").as("h"))
        .agg(count(lit(1)).as("n"),
          sum($"value".cast(DecimalType(30, 4))).as("v"))
      val old = state(ev.filter($"ts" < lit(split).cast("timestamp")))
      val delta = state(ev.filter($"ts" >= lit(split).cast("timestamp")))
      old.as("o").join(delta.as("dl"), Seq("h"), "full_outer")
        .select(
          date_format($"h", "yyyy-MM-dd HH:mm:ss").as("window_start"),
          (coalesce($"o.n", lit(0L)) + coalesce($"dl.n", lit(0L))).as("n_events"),
          (coalesce($"o.v", lit(BigDecimal(0)).cast(DecimalType(30, 4))) +
            coalesce($"dl.v", lit(BigDecimal(0)).cast(DecimalType(30, 4))))
            .cast(DoubleType).as("value_sum"))
        .orderBy($"window_start")
    },
    Some(s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
            |  count(*) AS n_events, ${sqlDsum("value", 4)} AS value_sum
            |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),
  )

  /** q77 — the salted skew join (graft.operators.SkewJoin) under the
    * oracle gate: a synthetic hot key (every third lineitem collapses to
    * key 0 — one reducer would take a third of the table) joined to a
    * 100-row dim, salted 8 ways. Salting is pure placement: every salt
    * replica sees the full small side, so the salted result is the SAME
    * MULTISET as the plain equi-join — which is exactly what the oracle
    * runs. The rollup's decimal sums are order-independent, so the gate
    * is insensitive to which salt processed which row. */
  val q77 = QuerySpec(
    "q77_skew_salted_join",
    (s, d) => {
      import s.implicits._
      val large = Tables.fanOut(
        Tables.lineitem(s, d).select($"l_orderkey", $"l_quantity"),
        $"l_orderkey")
        .select(
          when($"l_orderkey" % 3 === 0, 0L).otherwise($"l_orderkey" % 100).as("k"),
          $"l_quantity")
      val small = s.range(0, 100)
        .select($"id".as("k"), concat(lit("grp"), ($"id" % 10).cast("string")).as("grp"))
      graft.operators.SkewJoin.saltedEquiJoin(large, small, "k", salts = 8)
        .groupBy($"grp")
        .agg(count(lit(1)).as("n_items"), dsum($"l_quantity", 2).as("qty_sum"))
        .orderBy($"grp")
    },
    Some(s"""WITH large AS (SELECT CASE WHEN l_orderkey % 3 = 0 THEN 0
            |    ELSE l_orderkey % 100 END AS k, l_quantity FROM lineitem),
            |small AS (SELECT r AS k, 'grp' || CAST(r % 10 AS VARCHAR) AS grp
            |  FROM range(0, 100) t(r))
            |SELECT grp, count(*) AS n_items, ${sqlDsum("l_quantity", 2)} AS qty_sum
            |FROM large JOIN small USING (k)
            |GROUP BY grp ORDER BY grp""".stripMargin),
  )

  /** q152 — the typed Dataset API under the gate: per-user inter-event
    * gap statistics via `groupByKey(...).mapGroups` over a typed
    * Dataset[(Long, Long)] — SURVEY §1.5's "typed Dataset[T] where it
    * helps" category as a verifiable query (q41 covers the typed
    * Aggregator; this covers the imperative per-group escape hatch).
    * Timestamps reduce to exact integer micros BEFORE typing, so the
    * in-group sort and gap arithmetic are integer-exact; the oracle is
    * the lag-window formulation of the same statistics.
    * Scale: mapGroups materializes ONE user's events in memory —
    * bounded by per-key volume, the honest contract of the typed
    * escape hatch (unbounded keys belong in q43's window formulation);
    * the shuffle is the same single user_id exchange the window pays. */
  val q152 = QuerySpec(
    "q152_typed_gap_stats",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .select($"user_id", unix_micros($"ts"))
        .as[(Long, Long)]
      ev.groupByKey(_._1)
        .mapGroups { (uid, it) =>
          val us = it.map(_._2).toArray
          java.util.Arrays.sort(us)
          var maxGap = 0L; var sumGap = 0L; var i = 1
          while (i < us.length) {
            val g = us(i) - us(i - 1)
            if (g > maxGap) maxGap = g
            sumGap += g; i += 1
          }
          (uid, us.length.toLong, maxGap, sumGap)
        }
        .toDF("user_id", "n_events", "max_gap_us", "gap_sum_us")
        .orderBy($"user_id")
    },
    Some("""WITH x AS (
           |  SELECT user_id, epoch_us(ts) AS us,
           |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
           |  FROM events)
           |SELECT user_id, count(*) AS n_events,
           |  CAST(coalesce(max(us - prev), 0) AS BIGINT) AS max_gap_us,
           |  CAST(coalesce(sum(us - prev), 0) AS BIGINT) AS gap_sum_us
           |FROM x GROUP BY user_id ORDER BY user_id""".stripMargin),
  )

  /** q141 — bucketed co-located join (graft.operators.Bucketing) under
    * the oracle gate: orders and lineitem both written as bucketed+sorted
    * managed tables on the join key (8 buckets), then equi-joined and
    * rolled up. Bucketing pre-partitions the data ON DISK — bucket i of
    * each side reads into the same task, so the join plans with NO
    * Exchange on either side (BucketingSpec pins that plan shape); at
    * 100 TB the fact⋈fact shuffle is paid once at write time and
    * amortized over every downstream query. Layout must never change
    * semantics: the oracle runs the plain join on the raw parquet.
    * Unique table names + DROP in finally keep the shared-session
    * catalog and warehouse dir clean even when a run throws. */
  val q141 = QuerySpec(
    "q141_bucketed_colocated_join",
    (s, d) => {
      import s.implicits._
      val sfx = java.util.UUID.randomUUID.toString.replace("-", "").take(12)
      val (tblO, tblL) = (s"graft_bo_$sfx", s"graft_bl_$sfx")
      try {
        graft.operators.Bucketing.writeBucketed(
          Tables.orders(s, d).select($"o_orderkey", $"o_orderpriority"),
          tblO, "o_orderkey", buckets = 8)
        graft.operators.Bucketing.writeBucketed(
          Tables.lineitem(s, d)
            .select($"l_orderkey", $"l_extendedprice", $"l_quantity"),
          tblL, "l_orderkey", buckets = 8)
        val agg = s.table(tblO)
          .join(s.table(tblL), $"o_orderkey" === $"l_orderkey")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n_items"),
            dsum($"l_extendedprice", 2).as("price_sum"),
            dsum($"l_quantity", 2).as("qty_sum"))
          .orderBy($"o_orderpriority")
        Eager(agg) // eager: tables are dropped in finally
      } finally {
        s.sql(s"DROP TABLE IF EXISTS $tblO")
        s.sql(s"DROP TABLE IF EXISTS $tblL")
      }
    },
    Some(s"""SELECT o_orderpriority, count(*) AS n_items,
            |  ${sqlDsum("l_extendedprice", 2)} AS price_sum,
            |  ${sqlDsum("l_quantity", 2)} AS qty_sum
            |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
  )

  /** q79 — Hive-style partitioned layout end-to-end: documents written
    * `partitionBy(lang)` (the Glue/Athena partition convention the
    * reference's catalog tier implies — one directory per partition
    * value), re-read with a partition-column filter, aggregated, tmp
    * cleaned in a finally. The filter prunes at PLANNING time — only
    * `lang=en/` is ever listed or scanned, the difference between
    * reading one partition and reading 100 TB (PartitionPruningSpec
    * asserts PartitionFilters on exactly this layout's plan). The
    * oracle applies the same predicate to the unpartitioned table —
    * layout must never change semantics. */
  val q79 = QuerySpec(
    "q79_partitioned_write_prune",
    (s, d) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft_part_q79")
      try {
        val out = s"$tmp/documents_by_lang"
        Tables.documents(s, d)
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .partitionBy("lang").parquet(out)
        val agg = s.read.parquet(out)
          .filter($"lang" === "en")
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("chars_sum"))
          .orderBy($"source")
        Eager(agg) // eager: tmp is deleted in the finally
      } finally graft.Fs.deleteTree(tmp)
    },
    Some("""SELECT source, count(*) AS n_docs,
           |  CAST(sum(n_chars) AS BIGINT) AS chars_sum
           |FROM documents WHERE lang = 'en'
           |GROUP BY source ORDER BY source""".stripMargin),
  )

  /** q80 — CDC compaction (latest-wins upsert): collapse an event
    * changelog to one current row per key, newest (ts, event_id) wins —
    * the batch form of what a merge-on-read table format does at
    * compaction. One window over (user_id | ts desc, event_id desc)
    * with rank=1; totally ordered, so the survivor is unique and
    * engine-independent. At scale this is one shuffle on the key and
    * the filter drops everything but one row per key before any
    * downstream operator sees data. */
  val q80 = QuerySpec(
    "q80_cdc_latest_wins",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
      Tables.events(s, d)
        .withColumn("rk", row_number().over(w))
        .filter($"rk" === 1)
        .select($"user_id", $"event_id".as("last_event_id"),
          unix_micros($"ts").as("last_ts_us"), $"value".as("last_value"))
        .orderBy($"user_id")
    },
    Some("""SELECT user_id, event_id AS last_event_id,
           |  epoch_us(ts) AS last_ts_us, value AS last_value
           |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
           |    ORDER BY ts DESC, event_id DESC) AS rk FROM events)
           |WHERE rk = 1 ORDER BY user_id""".stripMargin),
  )

  /** q92 — rolling time window via a RANGE frame: per event, the count
    * and exact sum of the same user's events in the preceding hour —
    * the batch form of a sliding-window metric (fraud velocity checks,
    * rate limits) that q54 computes as a stream-stream join. RANGE
    * frames bound by VALUE distance (here μs on the event-time axis),
    * not row count — a frame rows-frames can't express when event
    * spacing is irregular. One shuffle on user_id, one in-partition
    * sort shared by both window aggregates; the frame sum is an exact
    * decimal accumulator so in-frame order can't drift the double. */
  val q92 = QuerySpec(
    "q92_rolling_time_window",
    (s, d) => {
      import s.implicits._
      val hourUs = 3600L * 1000000
      val w = Window.partitionBy($"user_id").orderBy($"ts_us")
        .rangeBetween(-hourUs, 0)
      Tables.events(s, d)
        .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"), $"value")
        .withColumn("n_prior_hour", count(lit(1)).over(w))
        .withColumn("value_sum_hour",
          sum($"value".cast(DecimalType(30, 4))).over(w).cast(DoubleType))
        .select($"event_id", $"user_id", $"ts_us", $"n_prior_hour", $"value_sum_hour")
        .orderBy($"event_id")
    },
    Some("""SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           |  count(*) OVER w AS n_prior_hour,
           |  CAST(sum(CAST(value AS DECIMAL(30,4))) OVER w AS DOUBLE) AS value_sum_hour
           |FROM events
           |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
           |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
           |ORDER BY event_id""".stripMargin),
  )

  /** q98 — schema evolution on read (mergeSchema): a table whose early
    * files lack a column later files carry — the inevitable state of any
    * long-lived parquet lake. Half the docs are written with the v1
    * schema, half with v2 (+quality column); one mergeSchema read
    * reconciles the union schema, v1 rows surfacing NULL quality. The
    * rollup counts both generations and aggregates quality only where
    * present — layout generations must never change row-level facts,
    * which is exactly what the oracle (one query over the ORIGINAL
    * table, simulating the generation split) checks. Scale: mergeSchema
    * costs a footer-read per file at planning; steady-state lakes pin
    * the merged schema in a catalog instead — semantics identical. */
  val q98 = QuerySpec(
    "q98_schema_evolution_read",
    (s, d) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft_evolve_q98")
      try {
        val out = s"$tmp/docs"
        val docs = Tables.documents(s, d)
        docs.filter($"doc_id" % 2 === 0)
          .select($"doc_id", $"lang", $"n_chars")
          .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(out)
        docs.filter($"doc_id" % 2 === 1)
          .select($"doc_id", $"lang", $"n_chars",
            ($"n_chars" % 100).as("quality"))
          .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(out)
        val agg = s.read.option("mergeSchema", "true").parquet(out)
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_docs"),
            sum($"n_chars").as("chars_sum"),
            count($"quality").as("n_with_quality"),
            sum($"quality").as("quality_sum"))
          .orderBy($"lang")
        Eager(agg) // eager: tmp deleted in the finally
      } finally graft.Fs.deleteTree(tmp)
    },
    Some("""SELECT lang, count(*) AS n_docs,
           |  CAST(sum(n_chars) AS BIGINT) AS chars_sum,
           |  count(CASE WHEN doc_id % 2 = 1 THEN 1 END) AS n_with_quality,
           |  CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars % 100 END) AS BIGINT) AS quality_sum
           |FROM documents GROUP BY lang ORDER BY lang""".stripMargin),
  )

  /** q99 — quarantine split (dead-letter pattern): one scan classifies
    * every row, clean rows go to the main sink, rejects to a quarantine
    * sink WITH a reason column — no row is ever dropped silently, and
    * clean + quarantined must reconcile to the input exactly (the gate
    * sums both sinks against the source). The classified frame is
    * persisted so the two sink writes share ONE scan+classify pass —
    * at 100 TB the alternative is reading the corpus twice. Reason
    * codes are mutually exclusive and ordered (first failure wins) so
    * the split is deterministic. */
  val q99 = QuerySpec(
    "q99_quarantine_split",
    (s, d) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft_quarantine_q99")
      val classified = Tables.documents(s, d)
        .withColumn("reason",
          when(!$"lang".isin("en", "es", "de", "fr"), "lang_blocked")
            .when($"n_chars" < 100, "too_short")
            .otherwise(null))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val clean = s"$tmp/clean"
        val rejects = s"$tmp/quarantine"
        classified.filter($"reason".isNull).drop("reason")
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(clean)
        classified.filter($"reason".isNotNull)
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(rejects)
        val cleanAgg = s.read.parquet(clean)
          .select(lit("clean").as("sink"), $"doc_id", $"n_chars",
            lit("none").as("reason"))
        val rejAgg = s.read.parquet(rejects)
          .select(lit("quarantine").as("sink"), $"doc_id", $"n_chars", $"reason")
        val agg = cleanAgg.unionByName(rejAgg)
          .groupBy($"sink", $"reason")
          .agg(count(lit(1)).as("n_docs"), sum($"doc_id").as("id_checksum"),
            sum($"n_chars").as("chars_sum"))
          .orderBy($"sink", $"reason")
        Eager(agg) // eager: both sinks live under tmp
      } finally {
        classified.unpersist(blocking = false)
        graft.Fs.deleteTree(tmp)
      }
    },
    Some("""WITH c AS (SELECT doc_id, n_chars,
           |    CASE WHEN lang NOT IN ('en','es','de','fr') THEN 'lang_blocked'
           |         WHEN n_chars < 100 THEN 'too_short' END AS reason
           |  FROM documents)
           |SELECT CASE WHEN reason IS NULL THEN 'clean' ELSE 'quarantine' END AS sink,
           |  coalesce(reason, 'none') AS reason, count(*) AS n_docs,
           |  CAST(sum(doc_id) AS BIGINT) AS id_checksum,
           |  CAST(sum(n_chars) AS BIGINT) AS chars_sum
           |FROM c GROUP BY 1, 2 ORDER BY sink, reason""".stripMargin),
  )

  /** q102 — event throttle/debounce: drop an event arriving within 5
    * seconds of the same user+type's PREVIOUS RAW event (lag-based
    * throttling — deterministic and windowable in one pass, unlike
    * chain-debounce whose keep decision depends on prior keeps and
    * needs q44-style stateful iteration). The dual of q53's exact-id
    * dedup: q53 collapses redelivery of the SAME event, this collapses
    * DISTINCT near-simultaneous events (double-clicks, sensor chatter).
    * One shuffle on (user, type), one sort, a lag compare. */
  val q102 = QuerySpec(
    "q102_event_debounce",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id", $"event_type").orderBy($"ts", $"event_id")
      Tables.events(s, d)
        .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(w))
        .filter($"prev_us".isNull || unix_micros($"ts") - $"prev_us" > 5000000L)
        .select($"event_id", $"user_id", $"event_type", unix_micros($"ts").as("ts_us"))
        .orderBy($"event_id")
    },
    Some("""SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
           |FROM (SELECT *, lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
           |        ORDER BY ts, event_id) AS prev_us FROM events)
           |WHERE prev_us IS NULL OR epoch_us(ts) - prev_us > 5000000
           |ORDER BY event_id""".stripMargin),
  )

  /** q104 — MapType operators end-to-end (§2.8's one untouched complex
    * type): per-user event-type counts built INTO a map
    * (map_from_entries over a collect_list of structs), pruned in-row
    * with map_filter (keep types seen ≥ 3 times), then exploded back to
    * rows with each kept type's integer-ppm share of the user's total.
    * The map is bounded by the event-type vocabulary (5 values), so the
    * collect_list state is O(types) per user, not O(events) — the rule
    * that makes map-building safe at 100 TB; the counts themselves come
    * from an ordinary two-phase hash agg first. The oracle spells the
    * same semantics relationally (GROUP BY + HAVING + join), proving
    * the map round-trip loses nothing. */
  val q104 = QuerySpec(
    "q104_map_event_shares",
    (s, d) => {
      import s.implicits._
      val counts = Tables.events(s, d)
        .groupBy($"user_id", $"event_type").agg(count(lit(1)).as("cnt"))
      counts.groupBy($"user_id")
        .agg(
          map_from_entries(collect_list(struct($"event_type", $"cnt"))).as("by_type"),
          sum($"cnt").as("total"))
        .select($"user_id", $"total",
          explode(map_filter($"by_type", (_, v) => v >= 3)).as(Seq("event_type", "cnt")))
        .select($"user_id", $"event_type", $"cnt",
          expr("cnt * 1000000L div total").as("share_ppm"))
        .orderBy($"user_id", $"event_type")
    },
    Some("""WITH c AS (SELECT user_id, event_type, count(*) AS cnt
           |  FROM events GROUP BY 1, 2),
           |t AS (SELECT user_id, CAST(sum(cnt) AS BIGINT) AS total FROM c GROUP BY 1)
           |SELECT c.user_id, c.event_type, c.cnt, c.cnt * 1000000 // t.total AS share_ppm
           |FROM c JOIN t USING (user_id) WHERE c.cnt >= 3
           |ORDER BY user_id, event_type""".stripMargin),
  )

  /** q105 — equi-width histogram with cumulative distribution: bin
    * l_extendedprice by 5 000-wide buckets, per-bin count + exact
    * decimal sum, then the running cumulative share in integer ppm.
    * The heavy pass is ONE partial+final hash agg over the fact scan
    * (shuffle = bin count, ~20 rows); both windows — running and
    * grand-total — run over the post-agg bin rows, so the unpartitioned
    * window's single-reducer shape is irrelevant at any corpus size.
    * This is the profiling primitive behind quantile sketches and
    * range-partition planning (pick split points where cum_ppm crosses
    * k/N). floor(x/5000.0) is the same IEEE division + floor on both
    * engines — bin edges cannot drift. */
  val q105 = QuerySpec(
    "q105_histogram_bins",
    (s, d) => {
      import s.implicits._
      val binned = Tables.lineitem(s, d)
        .select(floor($"l_extendedprice" / 5000.0).cast("int").as("bin"),
          $"l_extendedprice")
        .groupBy($"bin")
        .agg(count(lit(1)).as("n_items"), dsum($"l_extendedprice", 2).as("price_sum"))
      val running = Window.orderBy($"bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val whole = Window.orderBy($"bin")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      binned
        .withColumn("cum_items", sum($"n_items").over(running))
        .withColumn("total_items", sum($"n_items").over(whole))
        .select($"bin", $"n_items", $"price_sum",
          expr("cum_items * 1000000L div total_items").as("cum_ppm"))
        .orderBy($"bin")
    },
    Some(s"""WITH b AS (SELECT CAST(floor(l_extendedprice / 5000.0) AS INT) AS bin,
            |    count(*) AS n_items, ${sqlDsum("l_extendedprice", 2)} AS price_sum
            |  FROM lineitem GROUP BY 1)
            |SELECT bin, n_items, price_sum,
            |  CAST(sum(n_items) OVER (ORDER BY bin) AS BIGINT) * 1000000
            |    // CAST(sum(n_items) OVER () AS BIGINT) AS cum_ppm
            |FROM b ORDER BY bin""".stripMargin),
  )

  /** q107 — single-pass column profiler (the data-quality census every
    * ingest runs before trusting a new drop): null count, exact distinct
    * count, and min/max per column of orders, emitted long-form — one
    * row per column. ONE scan computes every stat (a wide agg), then a
    * driver-free `stack` pivots the single stats row into the long
    * layout; the oracle spells the same census as per-column UNION ALL
    * branches, proving the fused pass loses nothing. Numeric extremes
    * stay DOUBLE and string extremes stay STRING (separate columns) —
    * never cast through double→string, whose shortest-repr formatting
    * is engine-specific. At 100 TB: the scan is the cost; the exact
    * NDVs share one Expand (same family as count-distinct q11), and the
    * profile's output is O(columns). */
  val q107 = QuerySpec(
    "q107_column_profile",
    (s, d) => {
      import s.implicits._
      // fanOut: the 5x countDistinct EXPAND otherwise runs on orders'
      // single sf0.1 input split (bench read cpu/wall ~= 2 on 32 cores).
      val o = Tables.fanOut(Tables.orders(s, d), col("o_orderkey"))
      val stats = o.agg(
        count(lit(1)).as("n"),
        count($"o_orderkey").as("nn_key"), countDistinct($"o_orderkey").as("ndv_key"),
        min($"o_orderkey").cast(DoubleType).as("min_key"),
        max($"o_orderkey").cast(DoubleType).as("max_key"),
        count($"o_custkey").as("nn_cust"), countDistinct($"o_custkey").as("ndv_cust"),
        min($"o_custkey").cast(DoubleType).as("min_cust"),
        max($"o_custkey").cast(DoubleType).as("max_cust"),
        count($"o_totalprice").as("nn_price"), countDistinct($"o_totalprice").as("ndv_price"),
        min($"o_totalprice").as("min_price"), max($"o_totalprice").as("max_price"),
        count($"o_orderstatus").as("nn_stat"), countDistinct($"o_orderstatus").as("ndv_stat"),
        min($"o_orderstatus").as("min_stat"), max($"o_orderstatus").as("max_stat"),
        count($"o_orderpriority").as("nn_prio"), countDistinct($"o_orderpriority").as("ndv_prio"),
        min($"o_orderpriority").as("min_prio"), max($"o_orderpriority").as("max_prio"))
      stats.selectExpr(
        """stack(5,
          |  'o_custkey',      n - nn_cust,  ndv_cust,  min_cust,  max_cust,  CAST(NULL AS STRING), CAST(NULL AS STRING),
          |  'o_orderkey',     n - nn_key,   ndv_key,   min_key,   max_key,   CAST(NULL AS STRING), CAST(NULL AS STRING),
          |  'o_orderpriority',n - nn_prio,  ndv_prio,  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), min_prio, max_prio,
          |  'o_orderstatus',  n - nn_stat,  ndv_stat,  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), min_stat, max_stat,
          |  'o_totalprice',   n - nn_price, ndv_price, min_price, max_price, CAST(NULL AS STRING), CAST(NULL AS STRING)
          |) AS (col_name, n_null, ndv, min_num, max_num, min_str, max_str)""".stripMargin)
        .orderBy($"col_name")
    },
    Some("""SELECT 'o_custkey' AS col_name, count(*) - count(o_custkey) AS n_null,
           |  count(DISTINCT o_custkey) AS ndv, CAST(min(o_custkey) AS DOUBLE) AS min_num,
           |  CAST(max(o_custkey) AS DOUBLE) AS max_num,
           |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str FROM orders
           |UNION ALL
           |SELECT 'o_orderkey', count(*) - count(o_orderkey), count(DISTINCT o_orderkey),
           |  CAST(min(o_orderkey) AS DOUBLE), CAST(max(o_orderkey) AS DOUBLE), NULL, NULL FROM orders
           |UNION ALL
           |SELECT 'o_orderpriority', count(*) - count(o_orderpriority), count(DISTINCT o_orderpriority),
           |  NULL, NULL, min(o_orderpriority), max(o_orderpriority) FROM orders
           |UNION ALL
           |SELECT 'o_orderstatus', count(*) - count(o_orderstatus), count(DISTINCT o_orderstatus),
           |  NULL, NULL, min(o_orderstatus), max(o_orderstatus) FROM orders
           |UNION ALL
           |SELECT 'o_totalprice', count(*) - count(o_totalprice), count(DISTINCT o_totalprice),
           |  min(o_totalprice), max(o_totalprice), NULL, NULL FROM orders
           |ORDER BY col_name""".stripMargin),
  )

  /** q109 — z-order clustering key (graft.operators.ZOrder under the
    * gate): Morton-interleave two bucketed dimensions of lineitem and
    * take the 20 smallest keys under a total output order. The gate
    * pins the BIT ARITHMETIC — both engines must compute identical keys
    * from the shared shift-mask ladder, which is what makes a layout
    * written by this engine prunable by any other reader (the
    * reference's Athena tier reading our parquet). The operational use
    * is `df.repartitionByRange(col("z")).sortWithinPartitions("z")
    * .write` — q79's partitioned-write path with z as the sort key;
    * here the key computation itself is the verified unit. Per-row ALU
    * work only, no shuffle beyond the top-k. */
  val q109 = QuerySpec(
    "q109_zorder_key",
    (s, d) => {
      import s.implicits._
      import graft.operators.ZOrder
      Tables.lineitem(s, d)
        .select(
          ZOrder.interleave(pmod($"l_partkey", lit(1024L)), pmod($"l_suppkey", lit(1024L)))
            .as("zval"),
          $"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey")
        .orderBy($"zval", $"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey")
        .limit(20)
    },
    Some(Seq(
      s"SELECT ${graft.operators.ZOrder.interleaveSql("(l_partkey % 1024)", "(l_suppkey % 1024)")} AS zval,",
      "  l_orderkey, l_linenumber, l_partkey, l_suppkey",
      "FROM lineitem",
      "ORDER BY zval, l_orderkey, l_linenumber, l_partkey, l_suppkey",
      "LIMIT 20").mkString("\n")),
  )

  /** q112 — sessionization via the BUILT-IN session_window (q43's
    * declarative twin): groupBy(user, session_window(ts, 30 min))
    * replaces the lag + running-sum assignment with Spark's native
    * merging-session aggregate — fewer moving parts, and in streaming
    * mode the same expression is incrementally maintainable where q43's
    * window trick is batch-only. Boundary semantics differ from q43 BY
    * CONTRACT: session_window opens a NEW session when the gap is ≥ 30
    * min (an event at exactly start+gap is outside the half-open
    * window), while q43's `> gap` merges it — the oracle spells the ≥
    * rule, pinning the engine's actual boundary rather than papering
    * over it. Same scale shape as q43: one shuffle on the group keys,
    * sessions merged within partitions. */
  val q112 = QuerySpec(
    "q112_session_window_builtin",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy($"user_id", session_window($"ts", "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"), dsum($"value", 4).as("value_sum"))
        .select($"user_id",
          unix_micros($"sw.start").as("session_start_us"),
          (unix_micros($"sw.end") - lit(SessionGapUs)).as("session_end_us"),
          $"n_events", $"value_sum")
        .orderBy($"user_id", $"session_start_us")
    },
    Some(s"""WITH x AS (SELECT user_id, event_id, ts, value,
            |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM events),
            |y AS (SELECT *, CASE WHEN prev IS NULL
            |    OR epoch_us(ts) - epoch_us(prev) >= ${SessionGapUs}::BIGINT THEN 1 ELSE 0 END AS ns FROM x),
            |z AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
            |        ROWS UNBOUNDED PRECEDING) AS sid FROM y)
            |SELECT user_id, epoch_us(min(ts)) AS session_start_us,
            |  epoch_us(max(ts)) AS session_end_us, count(*) AS n_events,
            |  ${sqlDsum("value", 4)} AS value_sum
            |FROM z GROUP BY user_id, sid
            |ORDER BY user_id, session_start_us""".stripMargin),
  )

  /** q115 — observed metrics (`Dataset.observe` + `Observation`):
    * pipeline telemetry collected DURING a pass — row counts and exact
    * sums accumulate in the executors as the noop-sink write streams
    * through, no second scan, no extra shuffle (the aggregates merge
    * driver-side via the listener). This is how a production pipeline
    * exports "rows kept after filter X" to its metrics system for free;
    * the gate re-derives the same numbers relationally, proving the
    * observed path sees every row exactly once. The noop sink is the
    * action: all rows processed, nothing persisted. */
  val q115 = QuerySpec(
    "q115_observe_metrics",
    (s, d) => {
      import s.implicits._
      val obs = new org.apache.spark.sql.Observation(
        "graft_obs_" + java.util.UUID.randomUUID.toString.replace("-", ""))
      Tables.lineitem(s, d)
        .filter($"l_quantity" > 25.0)
        .observe(obs,
          count(lit(1)).as("n_rows"),
          dsum($"l_extendedprice", 2).as("price_sum"),
          min($"l_quantity").as("qty_min"),
          max($"l_quantity").as("qty_max"))
        .write.format("noop").mode("overwrite").save()
      val m = obs.get
      Seq((m("n_rows").asInstanceOf[Long], m("price_sum").asInstanceOf[Double],
        m("qty_min").asInstanceOf[Double], m("qty_max").asInstanceOf[Double]))
        .toDF("n_rows", "price_sum", "qty_min", "qty_max")
    },
    Some(s"""SELECT count(*) AS n_rows, ${sqlDsum("l_extendedprice", 2)} AS price_sum,
            |  min(l_quantity) AS qty_min, max(l_quantity) AS qty_max
            |FROM lineitem WHERE l_quantity > 25.0""".stripMargin),
  )

  /** q158 — the DataFrameNaFunctions cleaning surface (na.fill /
    * na.replace / na.drop) under the gate: a synthetically-dirtied
    * lineitem (sentinel values nulled out, the shape malformed feeds
    * arrive in) cleaned by the three na verbs — impute a numeric
    * default, recode a categorical, drop rows missing the critical
    * column — then rolled up in exact decimals. The oracle applies the
    * equivalent CASE/COALESCE/WHERE pipeline; null grouping keys never
    * reach the ORDER BY (Spark sorts nulls first, DuckDB last — the
    * fill to 'UNKNOWN' is also the portability guard). All three verbs
    * are pure per-row projections/filters — shuffle-free until the
    * rollup. */
  val q158 = QuerySpec(
    "q158_na_cleaning",
    (s, d) => {
      import s.implicits._
      val messy = Tables.lineitem(s, d).select(
        when($"l_discount" === 0.0, lit(null)).otherwise($"l_discount").as("disc"),
        when($"l_quantity" >= 45.0, lit(null)).otherwise($"l_quantity").as("qty"),
        when($"l_returnflag" === "N", lit(null)).otherwise($"l_returnflag").as("flag"))
      messy
        .na.fill(Map("qty" -> 0.0, "flag" -> "UNKNOWN"))
        .na.replace("flag", Map("A" -> "ACCEPT", "R" -> "RETURN"))
        .na.drop(Seq("disc"))
        .groupBy($"flag")
        .agg(count(lit(1)).as("n"),
          dsum($"qty", 2).as("qty_sum"), dsum($"disc", 2).as("disc_sum"))
        .orderBy($"flag")
    },
    Some(s"""WITH messy AS (
            |  SELECT CASE WHEN l_discount = 0.0 THEN NULL ELSE l_discount END AS disc,
            |    CASE WHEN l_quantity >= 45.0 THEN NULL ELSE l_quantity END AS qty0,
            |    CASE WHEN l_returnflag = 'N' THEN NULL ELSE l_returnflag END AS flag0
            |  FROM lineitem),
            |clean AS (
            |  SELECT disc, coalesce(qty0, 0.0) AS qty,
            |    CASE coalesce(flag0, 'UNKNOWN') WHEN 'A' THEN 'ACCEPT'
            |      WHEN 'R' THEN 'RETURN' ELSE coalesce(flag0, 'UNKNOWN') END AS flag
            |  FROM messy WHERE disc IS NOT NULL)
            |SELECT flag, count(*) AS n, ${sqlDsum("qty", 2)} AS qty_sum,
            |  ${sqlDsum("disc", 2)} AS disc_sum
            |FROM clean GROUP BY flag ORDER BY flag""".stripMargin),
  )

  /** q159 — forward fill via IGNORE NULLS (q58's estimating sibling,
    * q121's step-function alternative): the per-type hourly series on
    * its full spine, gaps carried forward by `last(n, ignoreNulls)`
    * over an unbounded-preceding frame — the last-observation-carried-
    * forward imputation time-series stores apply before joins. Scale:
    * the fill is one window over the (type, hour) rollup — spine-sized
    * rows, never raw events; real deployments partition the window by
    * series key exactly as here, so no global sort exists. */
  val q159 = QuerySpec(
    "q159_forward_fill",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d)
      val bounds = ev.agg(
        date_trunc("hour", min($"ts")).as("lo"),
        date_trunc("hour", max($"ts")).as("hi"))
      val spine = bounds
        .select(explode(expr("sequence(lo, hi, interval 1 hour)")).as("h"))
        .crossJoin(broadcast(ev.select($"event_type").distinct()))
      val hourly = ev
        .groupBy(date_trunc("hour", $"ts").as("h"), $"event_type")
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy($"event_type").orderBy($"h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(broadcast(hourly), Seq("h", "event_type"), "left")
        .select($"event_type", $"h", $"n",
          last($"n", ignoreNulls = true).over(w).as("locf"))
        .select($"event_type",
          date_format($"h", "yyyy-MM-dd HH:mm:ss").as("hour"),
          coalesce($"n", lit(0L)).as("n_observed"),
          coalesce($"locf", lit(0L)).as("n_filled"),
          $"n".isNull.as("was_gap"))
        .orderBy($"event_type", $"hour")
    },
    Some("""WITH b AS (SELECT date_trunc('hour', min(ts)) AS lo,
           |    date_trunc('hour', max(ts)) AS hi FROM events),
           |spine AS (
           |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h, et
           |  FROM b, (SELECT DISTINCT event_type AS et FROM events)),
           |a AS (SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n
           |      FROM events GROUP BY 1, 2),
           |f AS (
           |  SELECT spine.et AS event_type, spine.h, a.n,
           |    last_value(a.n IGNORE NULLS) OVER (PARTITION BY spine.et
           |      ORDER BY spine.h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf
           |  FROM spine LEFT JOIN a ON spine.h = a.h AND spine.et = a.event_type)
           |SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
           |  coalesce(n, 0) AS n_observed, coalesce(locf, 0) AS n_filled,
           |  (n IS NULL) AS was_gap
           |FROM f ORDER BY event_type, hour""".stripMargin),
  )

  /** q195 — in-flight pipeline metrics (`Dataset.observe`): the
    * data-quality counters every production run publishes (row count,
    * exact value sum, null-key count, high-water mark) collected DURING
    * the pass — zero extra scans, zero extra shuffles; the metrics ride
    * the noop-sink action as accumulator-style aggregates and surface
    * through the Observation handle when the action completes. This is
    * the engine-native replacement for the reference's CloudWatch-side
    * job metrics: observe on the frame, alert on the handle. The gate
    * re-states the same aggregates relationally — what the listener
    * reported must equal what a dedicated aggregation pass computes.
    * Distinct-style aggregates are disallowed inside observe; the
    * metric set here is the allowed accumulator family. */
  val q195 = QuerySpec(
    "q195_observe_metrics",
    (s, d) => {
      import s.implicits._
      val obs = org.apache.spark.sql.Observation(
        "gate_" + java.util.UUID.randomUUID.toString.replace("-", "").take(12))
      Tables.events(s, d)
        .observe(obs,
          count(lit(1)).as("n_events"),
          Det.dsum($"value", 4).as("value_sum"),
          sum(when($"user_id".isNull, 1L).otherwise(0L)).as("n_null_user"),
          max($"event_id").as("max_event_id"))
        .write.mode("overwrite").format("noop").save()
      val m = obs.get
      Seq((m("n_events").asInstanceOf[Long],
        m("value_sum").asInstanceOf[Double],
        m("n_null_user").asInstanceOf[Long],
        m("max_event_id").asInstanceOf[Long]))
        .toDF("n_events", "value_sum", "n_null_user", "max_event_id")
    },
    Some(s"""SELECT count(*) AS n_events,
            |  ${Det.sqlDsum("value", 4)} AS value_sum,
            |  CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_user,
            |  max(event_id) AS max_event_id
            |FROM events""".stripMargin),
  )

  /** q197 — typed cogroup reconciliation (KeyValueGroupedDataset
    * .cogroup — the per-key two-sided custom logic the relational
    * surface can't express in one operator): orders and lineitem keys
    * cogrouped, each key's two iterators inspected imperatively, and
    * presence mismatches emitted (order with no lines / line with no
    * order — the referential-integrity audit of every fact pair).
    * Relationally this is TWO anti joins; cogroup does it in ONE
    * co-partitioned pass — both sides shuffle once on the key (same
    * exchange budget as a sort-merge join) and the lambda sees each
    * key exactly once. The oracle states the anti-join form — the
    * typed path must reproduce set-algebra semantics exactly. */
  val q197 = QuerySpec(
    "q197_cogroup_reconcile",
    (s, d) => {
      import s.implicits._
      val o = Tables.orders(s, d).select($"o_orderkey").as[Long]
      val l = Tables.lineitem(s, d).select($"l_orderkey").as[Long]
      o.groupByKey(identity).cogroup(l.groupByKey(identity)) { (k, os, ls) =>
        val hasO = os.nonEmpty
        val hasL = ls.nonEmpty
        if (hasO && !hasL) Iterator(("orders_only", k))
        else if (!hasO && hasL) Iterator(("lineitem_only", k))
        else Iterator.empty
      }.toDF("side", "k")
        .groupBy($"side")
        .agg(count(lit(1)).as("n_keys"), sum($"k").as("key_checksum"))
        .orderBy($"side")
    },
    Some("""SELECT side, count(*) AS n_keys, CAST(sum(k) AS BIGINT) AS key_checksum
           |FROM (
           |  SELECT DISTINCT 'lineitem_only' AS side, l_orderkey AS k FROM lineitem
           |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
           |  UNION ALL
           |  SELECT DISTINCT 'orders_only', o_orderkey FROM orders
           |  WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey))
           |GROUP BY side ORDER BY side""".stripMargin),
  )

  /** q232 — OHLC bar resampling (open/high/low/close per 4-hour bar):
    * the time-series downsampling readout — open/close are min_by /
    * max_by over a TOTAL order (epoch-micros + event_id, zero-padded to
    * a lexicographic string because the oracle's arg_min/arg_max only
    * take scalar ordering keys), so first/last are deterministic even
    * under timestamp ties. One hash aggregate, map-side combinable
    * (min_by/max_by merge by keeping the winning pair) — calendar-sized
    * output at any corpus scale, no window sort needed. */
  val q232 = QuerySpec(
    "q232_ohlc_resample",
    (s, d) => {
      import s.implicits._
      val ord = concat(lpad(unix_micros($"ts").cast("string"), 20, "0"),
        lit("-"), lpad($"event_id".cast("string"), 12, "0"))
      Tables.events(s, d)
        .select($"event_type",
          timestamp_micros(expr("(unix_micros(ts) div 14400000000) * 14400000000"))
            .as("bar"),
          ord.as("ord"), $"value")
        .groupBy($"event_type", $"bar")
        .agg(min_by($"value", $"ord").as("open"),
          max_by($"value", $"ord").as("close"),
          min($"value").as("lo"), max($"value").as("hi"),
          count(lit(1)).as("n"))
        .select($"event_type",
          date_format($"bar", "yyyy-MM-dd HH:mm:ss").as("bar_start"), $"n",
          round($"open", 6).as("open"), round($"close", 6).as("close"),
          round($"lo", 6).as("lo"), round($"hi", 6).as("hi"))
        .orderBy($"event_type", $"bar_start")
    },
    Some("""WITH b AS (
           |  SELECT event_type,
           |    make_timestamp((epoch_us(ts) // 14400000000) * 14400000000) AS bar,
           |    lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || '-' ||
           |      lpad(CAST(event_id AS VARCHAR), 12, '0') AS ord,
           |    value
           |  FROM events)
           |SELECT event_type, strftime(bar, '%Y-%m-%d %H:%M:%S') AS bar_start,
           |  count(*) AS n,
           |  round(arg_min(value, ord), 6) AS open,
           |  round(arg_max(value, ord), 6) AS close,
           |  round(min(value), 6) AS lo, round(max(value), 6) AS hi
           |FROM b GROUP BY event_type, bar
           |ORDER BY event_type, bar_start""".stripMargin),
  )

  /** q233 — null-skew outer-join rewrite: a LEFT OUTER join on a
    * nullable key ships every null-key row through the shuffle to
    * exactly one reducer — and they can never match anything. The
    * rewrite splits them off BEFORE the exchange (they short-circuit
    * straight to the null-extended output) and joins only the non-null
    * partition — q77's salting cousin for the special case where the
    * hot key is NULL itself (the most common real-world skew: optional
    * foreign keys). A third of the rows here carry a null key; the
    * oracle is the PLAIN left join, so the gate certifies the rewrite
    * changes nothing semantically. */
  val q233 = QuerySpec(
    "q233_null_skew_outer_join",
    (s, d) => {
      import s.implicits._
      val left = Tables.customer(s, d)
        .select($"c_custkey",
          when($"c_custkey" % 3 === 0, lit(null).cast("long"))
            .otherwise($"c_custkey" % 97).as("bkt"))
      val dim = Tables.supplier(s, d)
        .groupBy(($"s_suppkey" % 97).as("bkt"))
        .agg(count(lit(1)).as("dim_n"))
      val nullSide = left.filter($"bkt".isNull)
        .select($"c_custkey", $"bkt", lit(null).cast("long").as("dim_n"))
      val joined = left.filter($"bkt".isNotNull)
        .join(broadcast(dim), Seq("bkt"), "left_outer")
        .select($"c_custkey", $"bkt", $"dim_n")
      nullSide.unionByName(joined)
        .agg(count(lit(1)).as("n_rows"),
          sum(when($"bkt".isNull, 1L).otherwise(0L)).as("n_null_key"),
          sum(when($"dim_n".isNotNull, 1L).otherwise(0L)).as("n_matched"),
          sum($"c_custkey" * coalesce($"dim_n", lit(0L))).as("weighted_checksum"))
    },
    Some("""WITH l AS (
           |  SELECT c_custkey,
           |    CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_custkey % 97 END AS bkt
           |  FROM customer),
           |dm AS (SELECT s_suppkey % 97 AS bkt, count(*) AS dim_n
           |  FROM supplier GROUP BY 1)
           |SELECT count(*) AS n_rows,
           |  CAST(sum(CASE WHEN l.bkt IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_null_key,
           |  CAST(sum(CASE WHEN dm.dim_n IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_matched,
           |  CAST(sum(c_custkey * coalesce(dm.dim_n, 0)) AS BIGINT)
           |    AS weighted_checksum
           |FROM l LEFT JOIN dm ON l.bkt = dm.bkt""".stripMargin),
  )

  /** Row shape for q234's sorted-group traversal. */
  final case class StreakEv(user_id: Long, value: Double)

  /** q234 — typed secondary sort (`flatMapSortedGroups`): per-user
    * events delivered to the lambda ALREADY sorted by (ts, event_id) —
    * Spark sorts within the exchange, so no per-group buffering or
    * driver-side sort — traversed imperatively for the longest strictly
    * increasing value run. This is the typed form of gaps-and-islands:
    * the oracle computes the same streaks relationally (break flags →
    * running group ids → run lengths), so the gate certifies the
    * imperative traversal ≡ the SQL islands construction. One shuffle
    * on user_id; state per group is three scalars. */
  val q234 = QuerySpec(
    "q234_sorted_groups_streak",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .select($"user_id", $"ts", $"event_id", $"value")
        .as[(Long, java.sql.Timestamp, Long, Double)]
        .groupByKey(_._1)
        .flatMapSortedGroups($"ts", $"event_id") { (uid, it) =>
          var best = 0L
          var cur = 0L
          var prev = 0.0
          var first = true
          it.foreach { e =>
            cur = if (first || e._4 <= prev) 1L else cur + 1L
            if (cur > best) best = cur
            prev = e._4
            first = false
          }
          Iterator((uid, best))
        }
        .toDF("user_id", "longest_streak")
        .orderBy($"user_id")
    },
    Some("""WITH e AS (
           |  SELECT user_id, value,
           |    row_number() OVER w AS rn,
           |    CASE WHEN value > lag(value) OVER w THEN 0 ELSE 1 END AS brk
           |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
           |g AS (
           |  SELECT user_id, rn, sum(brk) OVER (PARTITION BY user_id ORDER BY rn) AS grp
           |  FROM e),
           |runs AS (SELECT user_id, grp, count(*) AS run_len FROM g GROUP BY 1, 2)
           |SELECT user_id, CAST(max(run_len) AS BIGINT) AS longest_streak
           |FROM runs GROUP BY user_id ORDER BY user_id""".stripMargin),
  )

  /** q265 — ordered LISTAGG (SQL:2023, Spark 4's listagg ... WITHIN
    * GROUP): the string-assembly aggregate report builders reach for.
    * Run over a PRE-AGGREGATED frame (status:count pairs per priority),
    * not raw facts — an unbounded listagg grows its state linearly with
    * group size, so at scale the reduce-then-agg ladder here is the
    * only responsible shape (the aggregate state is bounded by the
    * status domain). WITHIN GROUP ordering is the gate: DuckDB's
    * string_agg(... ORDER BY) must assemble the identical string. */
  val q265 = QuerySpec(
    "q265_listagg_ordered",
    (s, d) => {
      SqlSurface.registerViews(s, d)
      s.sql("""WITH pc AS (
              |  SELECT o_orderpriority, o_orderstatus, count(*) AS n
              |  FROM orders GROUP BY 1, 2)
              |SELECT o_orderpriority,
              |  listagg(o_orderstatus || ':' || CAST(n AS STRING), ',')
              |    WITHIN GROUP (ORDER BY o_orderstatus) AS status_census,
              |  count(*) AS n_statuses
              |FROM pc GROUP BY o_orderpriority
              |ORDER BY o_orderpriority""".stripMargin)
    },
    Some("""WITH pc AS (
           |  SELECT o_orderpriority, o_orderstatus, count(*) AS n
           |  FROM orders GROUP BY 1, 2)
           |SELECT o_orderpriority,
           |  string_agg(o_orderstatus || ':' || CAST(n AS VARCHAR), ','
           |    ORDER BY o_orderstatus) AS status_census,
           |  count(*) AS n_statuses
           |FROM pc GROUP BY o_orderpriority
           |ORDER BY o_orderpriority""".stripMargin),
  )

  /** q266 — try_* arithmetic under ANSI mode (the session default here,
    * as in Spark 4 generally): plain arithmetic THROWS on overflow and
    * division by zero, and try_add/try_divide/try_multiply/try_sum are
    * the per-expression opt-outs that return NULL instead — the
    * semantics a pipeline needs when one poisoned row must not kill a
    * 100 TB job. Poison rows are RARE by construction (l_orderkey %
    * 499 = 0, ~0.2%), which is both the realistic shape and the
    * performance contract: each caught ANSI error is an interpreted
    * JVM exception, so a try_* expression whose failure path fires on
    * most rows runs ~10× slower than the scan around it (measured:
    * an always-overflowing variant of this query went 12× super-linear
    * sf0.01→sf0.1). try_* guards ITS OWN op only — the try_sum input
    * product is sized to never overflow per-row while the partial-sum
    * ladder overflows at sf0.1 and stays in range at sf0.01, pinning
    * BOTH branches of try_sum across the two scale points. The oracle
    * restates every condition in HUGEINT (DuckDB has no try_*). */
  val q266 = QuerySpec(
    "q266_try_arithmetic",
    (s, d) => {
      import s.implicits._
      val poisoned = Tables.lineitem(s, d)
        .select($"l_returnflag", $"l_orderkey", $"l_linenumber",
          ($"l_orderkey" % 499L === 0L && $"l_orderkey" > 0L).as("p"))
        .select($"l_returnflag", $"l_orderkey",
          expr("try_add(9223372036854775807L, CASE WHEN p THEN l_orderkey ELSE 0L END)").as("a"),
          expr("try_divide(l_orderkey, CASE WHEN p THEN 0 ELSE 4 END)").as("b"),
          expr("try_multiply(l_orderkey, CASE WHEN p THEN 9223372036854775807L ELSE 2L END)").as("c"))
      val scalar = poisoned
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"),
          count(when($"a".isNull, 1)).as("n_add_overflow"),
          count(when($"b".isNull, 1)).as("n_div_zero"),
          count(when($"c".isNull, 1)).as("n_mul_overflow"),
          dsum(coalesce($"b", lit(0.0)), 6).as("div_sum"))
      // try_sum over a 256-row pre-aggregated ladder per group: the inner
      // partial sums never overflow PER ROW (256 buckets keep each
      // partial ~6e18·M⁻¹ below the cliff through sf1 — the mod-16
      // ladder's rows crossed 2⁶³ at sf1 inside the multiply, which
      // try_sum does NOT guard), while the scaled outer sum overflows at
      // sf0.1 (→ NULL) and fits at sf0.01 (→ exact value). Belt and
      // suspenders for beyond-sf1: the product itself runs through
      // try_multiply, and if ANY row-product overflows the whole result
      // is forced NULL — with all-positive terms that coincides exactly
      // with the oracle's HUGEINT total falling outside int64.
      val ladder = Tables.lineitem(s, d)
        .groupBy($"l_returnflag", ($"l_orderkey" % 256L).as("b256"))
        .agg(sum($"l_orderkey").as("s256"))
        .groupBy($"l_returnflag")
        .agg(expr(
          """CASE WHEN count(CASE WHEN try_multiply(s256, 1000000000L) IS NULL THEN 1 END) > 0
            |  THEN CAST(NULL AS BIGINT)
            |  ELSE try_sum(try_multiply(s256, 1000000000L)) END""".stripMargin)
          .as("sum_overflow"))
      scalar.join(ladder, Seq("l_returnflag"))
        .orderBy($"l_returnflag")
    },
    Some("""WITH base AS (
           |  SELECT l_returnflag, l_orderkey, (l_orderkey % 499 = 0 AND l_orderkey > 0) AS p
           |  FROM lineitem),
           |scalar AS (
           |  SELECT l_returnflag, count(*) AS n,
           |    CAST(count(CASE WHEN p THEN 1 END) AS BIGINT) AS n_add_overflow,
           |    CAST(count(CASE WHEN p THEN 1 END) AS BIGINT) AS n_div_zero,
           |    CAST(count(CASE WHEN p THEN 1 END) AS BIGINT) AS n_mul_overflow,
           |    CAST(CAST(sum(CAST(CASE WHEN p THEN 0.0
           |        ELSE CAST(l_orderkey AS DOUBLE) / 4 END AS DECIMAL(30,6)))
           |      AS STRING) AS DOUBLE) AS div_sum
           |  FROM base GROUP BY l_returnflag),
           |ladder AS (
           |  SELECT l_returnflag,
           |    sum(CAST(s256 AS HUGEINT) * 1000000000) AS hsum
           |  FROM (SELECT l_returnflag, l_orderkey % 256 AS b256,
           |          CAST(sum(l_orderkey) AS BIGINT) AS s256
           |        FROM lineitem GROUP BY 1, 2)
           |  GROUP BY l_returnflag)
           |SELECT s.l_returnflag, n, n_add_overflow, n_div_zero, n_mul_overflow,
           |  div_sum,
           |  CASE WHEN hsum BETWEEN -9223372036854775808 AND 9223372036854775807
           |    THEN CAST(hsum AS BIGINT) ELSE NULL END AS sum_overflow
           |FROM scalar s JOIN ladder USING (l_returnflag)
           |ORDER BY s.l_returnflag""".stripMargin),
  )

  /** q267 — union with missing columns (schema-evolution union): two
    * extracts with overlapping-but-different schemas zip via
    * `unionByName(allowMissingColumns = true)` — absent columns fill
    * NULL, matched BY NAME not position (positional UNION would
    * silently misalign). The oracle is DuckDB's UNION ALL BY NAME. The
    * readout counts per-column presence so a fill-direction bug (NULLs
    * landing on the wrong side) fails loudly. */
  val q267 = QuerySpec(
    "q267_union_missing_columns",
    (s, d) => {
      import s.implicits._
      val o = Tables.orders(s, d)
      val v1 = o.filter($"o_orderstatus" === "F")
        .select($"o_orderkey", $"o_totalprice", $"o_orderpriority")
      val v2 = o.filter($"o_orderstatus" === "O")
        .select($"o_orderkey", $"o_orderstatus")
      v1.unionByName(v2, allowMissingColumns = true)
        .agg(count(lit(1)).as("n"),
          count($"o_totalprice").as("n_price"),
          count($"o_orderstatus").as("n_status"),
          count($"o_orderpriority").as("n_priority"),
          dsum(coalesce($"o_totalprice", lit(0.0)), 2).as("price_sum"),
          sum($"o_orderkey").as("key_sum"))
    },
    Some(s"""WITH u AS (
            |  SELECT o_orderkey, o_totalprice, o_orderpriority
            |  FROM orders WHERE o_orderstatus = 'F'
            |  UNION ALL BY NAME
            |  SELECT o_orderkey, o_orderstatus
            |  FROM orders WHERE o_orderstatus = 'O')
            |SELECT count(*) AS n,
            |  count(o_totalprice) AS n_price,
            |  count(o_orderstatus) AS n_status,
            |  count(o_orderpriority) AS n_priority,
            |  ${Det.sqlDsum("coalesce(o_totalprice, 0.0)", 2)} AS price_sum,
            |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum
            |FROM u""".stripMargin),
  )

  /** q268 — OUTER generators (posexplode_outer): the generator family's
    * row-preserving half — an empty array must keep its parent row with
    * NULL pos/col instead of dropping it (the inner explode's silent
    * row loss is the bug this exists to avoid: a doc with zero chunks
    * still needs its bookkeeping row). 'R' rows get empty arrays by
    * construction; the gate pins output cardinality, the NULL-row
    * count, and pos/value checksums. The oracle rebuilds outer-unnest
    * as inner-unnest UNION the empty-side rows — DuckDB's unnest has
    * no outer form, which is exactly why the semantic needs pinning. */
  val q268 = QuerySpec(
    "q268_generator_outer",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .select($"l_returnflag".as("rf"),
          when($"l_returnflag" === "R", array().cast("array<int>"))
            .otherwise(sequence(lit(1), $"l_linenumber")).as("arr"))
        .select($"rf", posexplode_outer($"arr"))
        .groupBy($"rf")
        .agg(count(lit(1)).as("n_out"),
          count(when($"pos".isNull, 1)).as("n_null_rows"),
          sum(coalesce($"pos", lit(0))).as("pos_sum"),
          sum(coalesce($"col", lit(0))).as("val_sum"))
        .orderBy($"rf")
    },
    Some("""WITH base AS (
           |  SELECT l_returnflag AS rf, l_linenumber AS ln FROM lineitem),
           |ex AS (
           |  SELECT rf, CAST(t.i - 1 AS BIGINT) AS pos, CAST(t.i AS BIGINT) AS v
           |  FROM base, unnest(generate_series(1, ln)) AS t(i)
           |  WHERE rf <> 'R'
           |  UNION ALL
           |  SELECT rf, NULL, NULL FROM base WHERE rf = 'R')
           |SELECT rf, count(*) AS n_out,
           |  CAST(count(CASE WHEN pos IS NULL THEN 1 END) AS BIGINT) AS n_null_rows,
           |  CAST(sum(coalesce(pos, 0)) AS BIGINT) AS pos_sum,
           |  CAST(sum(coalesce(v, 0)) AS BIGINT) AS val_sum
           |FROM ex GROUP BY rf ORDER BY rf""".stripMargin),
  )

  /** q305 — group-mode imputation (categorical missing-value repair,
    * the categorical sibling of q159's forward fill and q121's linear
    * interpolation): null segments (injected deterministically on
    * custkey ≡ 0 mod 37 — the fixture has no real nulls) are filled
    * with their nation's modal segment, tie broken by the smaller
    * segment value so the repair is a pure function of the data. Mode
    * = argmax over the nation×segment count matrix via one struct-max
    * (max(struct(cnt, seg-inverted)) — no window, no sort), which is
    * group-count-sized and broadcast back onto the table. Audit output:
    * per nation, rows repaired, the mode used, and the post-repair
    * segment histogram checksum. Scale: two aggregates + one broadcast
    * join — the raw table shuffles once (final rollup), never for the
    * mode. */
  val q305 = QuerySpec(
    "q305_mode_imputation",
    (s, d) => {
      import s.implicits._
      val cust = Tables.customer(s, d)
        .select($"c_custkey", $"c_nationkey".as("nat"),
          when($"c_custkey" % 37 === 0, lit(null)).otherwise($"c_mktsegment")
            .as("seg"))
      // Deterministic argmax with an ASCENDING tie-break (max cnt, then
      // MIN seg — opposite orders, so no single struct-max): max the
      // count on the group-sized frame, join back, min the seg.
      val counts = cust.filter($"seg".isNotNull)
        .groupBy($"nat", $"seg").agg(count(lit(1)).as("cnt"))
      val top = counts.groupBy($"nat").agg(max($"cnt").as("cnt"))
        .join(counts, Seq("nat", "cnt"))
        .groupBy($"nat").agg(min($"seg").as("mode_seg"))
      val repaired = cust.join(broadcast(top), Seq("nat"))
        .withColumn("filled", $"seg".isNull)
        .withColumn("seg2", coalesce($"seg", $"mode_seg"))
      repaired.groupBy($"nat")
        .agg(max($"mode_seg").as("mode_seg"),
          sum(when($"filled", 1L).otherwise(0L)).as("n_repaired"),
          count(lit(1)).as("n_rows"),
          // 6-hex prefix (≤2²⁴) keeps the Σ(prefix·custkey) accumulator
          // inside BIGINT headroom well past sf1; the 8-hex form crossed
          // 2⁶³ mid-aggregate around sf≈1 under ANSI (round-6 ADVICE).
          sum(conv(substring(md5($"seg2".cast("binary")), 1, 6), 16, 10)
            .cast("long") * $"c_custkey").as("hist_checksum"))
        .orderBy($"nat")
    },
    Some("""WITH cust AS (
           |  SELECT c_custkey, c_nationkey AS nat,
           |    CASE WHEN c_custkey % 37 = 0 THEN NULL ELSE c_mktsegment END AS seg
           |  FROM customer),
           |counts AS (
           |  SELECT nat, seg, count(*) AS cnt FROM cust
           |  WHERE seg IS NOT NULL GROUP BY nat, seg),
           |top AS (
           |  SELECT c.nat, min(c.seg) AS mode_seg
           |  FROM counts c JOIN (SELECT nat, max(cnt) AS cnt FROM counts GROUP BY nat) m
           |    ON c.nat = m.nat AND c.cnt = m.cnt
           |  GROUP BY c.nat),
           |rep AS (
           |  SELECT cust.nat, c_custkey, mode_seg,
           |    seg IS NULL AS filled, coalesce(seg, mode_seg) AS seg2
           |  FROM cust JOIN top ON cust.nat = top.nat)
           |SELECT nat, max(mode_seg) AS mode_seg,
           |  CAST(sum(CASE WHEN filled THEN 1 ELSE 0 END) AS BIGINT) AS n_repaired,
           |  count(*) AS n_rows,
           |  CAST(sum(CAST('0x' || substr(md5(seg2), 1, 6) AS BIGINT) * c_custkey)
           |    AS BIGINT) AS hist_checksum
           |FROM rep GROUP BY nat ORDER BY nat""".stripMargin),
  )

  /** q337 — NEAREST as-of matching (completing q42's as-of matrix:
    * backward there, nearest-either-direction with tolerance here),
    * computed with ZERO joins: one user-ordered window pass carries
    * the previous click (last_value IGNORE NULLS over the trailing
    * frame) and the next click (first_value over the leading frame)
    * past every purchase; the nearer one within 30 min wins, ties
    * prefer the earlier (prev) side. The join-free shape is the scale
    * point — the naive ±tolerance interval join re-shuffles both
    * event sets, the window pass shuffles once on user_id and reads
    * the stream in order, which is how a 100 TB clickstream is
    * already laid out. */
  val q337 = QuerySpec(
    "q337_asof_nearest",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val wB = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wF = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val clickUs = when($"event_type" === "click", unix_micros($"ts"))
      val tolUs = 1800L * 1000000L
      Tables.events(s, d)
        .select($"user_id", $"ts", $"event_id", $"event_type")
        .withColumn("prev_us", last(clickUs, ignoreNulls = true).over(wB))
        .withColumn("next_us", first(clickUs, ignoreNulls = true).over(wF))
        .filter($"event_type" === "purchase")
        .withColumn("tus", unix_micros($"ts"))
        .withColumn("dp", $"tus" - $"prev_us")
        .withColumn("dn", $"next_us" - $"tus")
        .withColumn("side",
          when($"dp".isNotNull && $"dp" <= tolUs &&
            ($"dn".isNull || $"dp" <= $"dn" || $"dn" > tolUs), "prev")
            .when($"dn".isNotNull && $"dn" <= tolUs, "next")
            .otherwise("none"))
        .withColumn("delta_s",
          when($"side" === "prev", expr("dp div 1000000L"))
            .when($"side" === "next", expr("dn div 1000000L")))
        .groupBy($"user_id", $"side")
        .agg(count(lit(1)).as("n_purchases"), sum($"delta_s").as("delta_s_sum"),
          max($"delta_s").as("delta_s_max"))
        .orderBy($"user_id", $"side")
    },
    Some("""WITH ev AS (
           |  SELECT user_id, ts, event_id, event_type,
           |    last_value(CASE WHEN event_type = 'click'
           |        THEN epoch_us(ts) END IGNORE NULLS)
           |      OVER (PARTITION BY user_id ORDER BY ts, event_id
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_us,
           |    first_value(CASE WHEN event_type = 'click'
           |        THEN epoch_us(ts) END IGNORE NULLS)
           |      OVER (PARTITION BY user_id ORDER BY ts, event_id
           |        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_us
           |  FROM events),
           |p AS (
           |  SELECT user_id, epoch_us(ts) - prev_us AS dp, next_us - epoch_us(ts) AS dn
           |  FROM ev WHERE event_type = 'purchase'),
           |cls AS (
           |  SELECT user_id, dp, dn,
           |    CASE WHEN dp IS NOT NULL AND dp <= 1800000000
           |           AND (dn IS NULL OR dp <= dn OR dn > 1800000000) THEN 'prev'
           |         WHEN dn IS NOT NULL AND dn <= 1800000000 THEN 'next'
           |         ELSE 'none' END AS side
           |  FROM p),
           |f AS (
           |  SELECT user_id, side,
           |    CASE WHEN side = 'prev' THEN dp // 1000000
           |         WHEN side = 'next' THEN dn // 1000000 END AS delta_s
           |  FROM cls)
           |SELECT user_id, side, count(*) AS n_purchases,
           |  CAST(sum(delta_s) AS BIGINT) AS delta_s_sum,
           |  CAST(max(delta_s) AS BIGINT) AS delta_s_max
           |FROM f GROUP BY user_id, side ORDER BY user_id, side""".stripMargin),
  )

  /** q338 — FIFO lot matching (inventory/cost-basis allocation): sells
    * consume buys strictly in arrival order, expressed RELATIONALLY —
    * buy b's cumulative-quantity interval [Σqty_before, +qty) overlaps
    * sell s's interval exactly by the quantity FIFO assigns b→s, so
    * the whole matching is two per-part cumsum windows and one
    * interval-overlap join (no recursion, no per-row state machine —
    * the formulation that parallelizes). Per part the pair count is
    * O(buys + sells), not O(B·S): each consecutive-interval overlap
    * chain advances one side. Rolled up per partkey mod 10 with a
    * match checksum so a single misallocated unit fails the gate. */
  val q338 = QuerySpec(
    "q338_fifo_lot_matching",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val base = Tables.lineitem(s, d)
        .filter($"l_returnflag".isin("A", "R"))
        .select($"l_partkey".as("pk"), $"l_returnflag".as("fl"),
          round($"l_quantity").cast("long").as("qty"),
          ($"l_orderkey" * 10L + $"l_linenumber").as("seq"))
      def intervals(flag: String) = {
        // ORDER BY (seq, qty), not seq alone: the driver's lineitem has
        // duplicate (l_orderkey, l_linenumber) pairs (118k at sf0.1), so
        // seq is NOT a total order — two tied rows with different qty
        // cumsum in engine-dependent order, and the round-7 sf1 sweep
        // caught the resulting ±5-pair drift. With qty in the order,
        // any remaining ties have EQUAL qty, under which the interval
        // structure (and the seq-sum checksum) is swap-invariant — the
        // result is well-defined without needing a unique key the data
        // doesn't have.
        val w = Window.partitionBy($"pk").orderBy($"seq", $"qty")
          .rowsBetween(Window.unboundedPreceding, -1)
        base.filter($"fl" === flag)
          .withColumn("lo", coalesce(sum($"qty").over(w), lit(0L)))
          .withColumn("hi", $"lo" + $"qty")
      }
      val buys = intervals("A").select($"pk", $"seq".as("bseq"),
        $"lo".as("blo"), $"hi".as("bhi"))
      val sells = intervals("R").select($"pk", $"seq".as("sseq"),
        $"lo".as("slo"), $"hi".as("shi"))
      buys.join(sells, Seq("pk"))
        .filter($"blo" < $"shi" && $"slo" < $"bhi")
        .withColumn("matched",
          least($"bhi", $"shi") - greatest($"blo", $"slo"))
        .groupBy(($"pk" % 10L).as("pk_bucket"))
        .agg(count(lit(1)).as("n_matches"),
          sum($"matched").as("qty_matched"),
          sum($"matched" * ($"bseq" + $"sseq")).as("match_checksum"))
        .orderBy($"pk_bucket")
    },
    Some("""WITH base AS (
           |  SELECT l_partkey AS pk, l_returnflag AS fl,
           |    CAST(round(l_quantity) AS BIGINT) AS qty,
           |    l_orderkey * 10 + l_linenumber AS seq
           |  FROM lineitem WHERE l_returnflag IN ('A', 'R')),
           |iv AS (
           |  SELECT pk, fl, seq,
           |    coalesce(CAST(sum(qty) OVER (PARTITION BY pk, fl ORDER BY seq, qty
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
           |      AS lo,
           |    coalesce(CAST(sum(qty) OVER (PARTITION BY pk, fl ORDER BY seq, qty
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
           |      + qty AS hi
           |  FROM base),
           |m AS (
           |  SELECT b.pk, b.seq AS bseq, s.seq AS sseq,
           |    least(b.hi, s.hi) - greatest(b.lo, s.lo) AS matched
           |  FROM iv b JOIN iv s
           |    ON b.pk = s.pk AND b.fl = 'A' AND s.fl = 'R'
           |      AND b.lo < s.hi AND s.lo < b.hi)
           |SELECT pk % 10 AS pk_bucket, count(*) AS n_matches,
           |  CAST(sum(matched) AS BIGINT) AS qty_matched,
           |  CAST(sum(matched * (bseq + sseq)) AS BIGINT) AS match_checksum
           |FROM m GROUP BY pk % 10 ORDER BY pk_bucket""".stripMargin),
  )

  /** q379 — INCREMENTAL sessionization maintenance: q43 recomputes the
    * world; production re-sessionizes only the users the day's delta
    * touched (q316's both-sided delta discipline applied to a GROUPED
    * stateful view — correct here because sessions never cross users,
    * so a group untouched by the delta is bit-identical in the full
    * recompute). Epoch-0 sessions are materialized to parquet (the
    * persisted state), epoch-1 events arrive (later half by event_id),
    * and the maintained view = kept sessions of untouched users ∪
    * re-sessionized RAW events of touched users — a new event may
    * bridge two old sessions, so touched users recompute from raw
    * events, never by patching session rows. Scale: the touched-user
    * set is a semi-join pruned read on both sides; the recompute
    * window runs only over touched users' events. Oracle: the
    * from-scratch q43 SQL — maintained ≡ rebuilt. */
  val q379 = QuerySpec(
    "q379_incremental_sessionize",
    (s, d) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft_isess").toString
      try {
        val ev = Tables.events(s, d)
          .select($"user_id", $"event_id", $"ts", $"value")
        val mid = ev.agg(expr("max(event_id) div 2")).head().getLong(0)
        def sessions(df: org.apache.spark.sql.DataFrame) = {
          val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
          df.withColumn("prev", lag($"ts", 1).over(w))
            .withColumn("ns",
              when($"prev".isNull ||
                unix_micros($"ts") - unix_micros($"prev") > SessionGapUs, 1)
                .otherwise(0))
            .withColumn("sid", sum($"ns").over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
            .groupBy($"user_id", $"sid")
            .agg(
              min(unix_micros($"ts")).as("session_start_us"),
              max(unix_micros($"ts")).as("session_end_us"),
              count(lit(1)).as("n_events"),
              dsum($"value", 4).as("value_sum"))
            .select($"user_id", $"session_start_us", $"session_end_us",
              $"n_events", $"value_sum")
        }
        // Epoch 0 materialized: the persisted session state.
        sessions(ev.filter($"event_id" <= mid))
          .write.parquet(s"$tmp/sessions_e0")
        val delta = ev.filter($"event_id" > mid)
        val touched = delta.select($"user_id").distinct()
        val kept = s.read.parquet(s"$tmp/sessions_e0")
          .join(touched, Seq("user_id"), "left_anti")
        val recomputed = sessions(
          ev.join(touched, Seq("user_id"), "left_semi"))
        Eager(kept.unionAll(recomputed)
          .orderBy($"user_id", $"session_start_us"))
      } finally graft.Fs.deleteTree(tmp)
    },
    // The from-scratch rebuild IS the oracle: maintained ≡ rebuilt.
    q43.oracle,
  )

  /** q382 — in-session event-type co-occurrence lift: which behaviors
    * cluster inside one visit (q70's collocation-lift discipline moved
    * from token space to the SESSION-level event domain). Sessions are
    * q43's gap sessions; each reduces to its distinct-type set (≤5
    * elements), pairs generate IN-ROW over the sorted set (never a
    * session self-join), and lift = P(a,b)/(P(a)·P(b)) lands as exact
    * integer ppm against the session census. The domain is bounded by
    * the event-type vocabulary, so the post-shuffle frames are ≤10
    * pair rows at any corpus size; the corpus-sized work is the one
    * sessionize window q43 already pays. */
  val q382 = QuerySpec(
    "q382_session_event_pmi",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val sess = Tables.events(s, d)
        .select($"user_id", $"event_id", $"ts", $"event_type")
        .withColumn("prev", lag($"ts", 1).over(w))
        .withColumn("ns",
          when($"prev".isNull ||
            unix_micros($"ts") - unix_micros($"prev") > SessionGapUs, 1)
            .otherwise(0))
        .withColumn("sid", sum($"ns").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id", $"sid")
        .agg(array_sort(collect_set($"event_type")).as("types"))
      val persisted = sess.persist()
      try {
        val n = persisted.agg(count(lit(1)).as("n_sessions"))
        val singles = persisted
          .select(explode($"types").as("t"))
          .groupBy($"t").agg(count(lit(1)).as("nt"))
        val pairs = persisted.select(explode(expr(
          """flatten(transform(types, (a, i) ->
            |  transform(slice(types, i + 2, size(types) - i - 1), b ->
            |    named_struct('ta', a, 'tb', b))))""".stripMargin)).as("p"))
          .groupBy($"p.ta".as("ta"), $"p.tb".as("tb"))
          .agg(count(lit(1)).as("n_ab"))
        val out = pairs
          .join(broadcast(singles.select($"t".as("ta"), $"nt".as("na"))), Seq("ta"))
          .join(broadcast(singles.select($"t".as("tb"), $"nt".as("nb"))), Seq("tb"))
          .crossJoin(broadcast(n))
          .select($"ta", $"tb", $"n_ab",
            expr("n_ab * n_sessions * 1000000L div (na * nb)").as("lift_ppm"))
          .orderBy($"ta", $"tb")
        Eager(out)
      } finally persisted.unpersist(blocking = false)
    },
    Some(s"""WITH x AS (SELECT user_id, event_id, ts, event_type,
            |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM events),
            |y AS (SELECT *, CASE WHEN prev IS NULL
            |    OR epoch_us(ts) - epoch_us(prev) > ${SessionGapUs}::BIGINT THEN 1 ELSE 0 END AS ns FROM x),
            |z AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
            |        ROWS UNBOUNDED PRECEDING) AS sid FROM y),
            |sess AS (SELECT user_id, sid, list_sort(list_distinct(list(event_type))) AS types
            |  FROM z GROUP BY user_id, sid),
            |n AS (SELECT count(*) AS n_sessions FROM sess),
            |singles AS (SELECT t, count(*) AS nt FROM
            |  (SELECT unnest(types) AS t FROM sess) GROUP BY 1),
            |pairs AS (SELECT p.ta, p.tb, count(*) AS n_ab FROM (
            |    SELECT unnest(flatten(list_transform(generate_series(1, len(types)), i ->
            |      list_transform(generate_series(i + 1, len(types)), j ->
            |        {'ta': types[i], 'tb': types[j]})))) AS p
            |    FROM sess) GROUP BY 1, 2)
            |SELECT pairs.ta AS ta, pairs.tb AS tb, pairs.n_ab AS n_ab,
            |  CAST(pairs.n_ab * (SELECT n_sessions FROM n) * 1000000
            |    // (a.nt * b.nt) AS BIGINT) AS lift_ppm
            |FROM pairs JOIN singles a ON pairs.ta = a.t
            |  JOIN singles b ON pairs.tb = b.t
            |ORDER BY ta, tb""".stripMargin),
  )

  val all: Seq[QuerySpec] = Seq(q39, q40, q41, q42, q43, q46, q47, q49, q50, q58,
    q74, q77, q79, q80, q92, q98, q99, q102, q104, q105, q107, q109, q112, q115,
    q141, q152, q158, q159, q195, q197, q232, q233, q234, q265, q266, q267, q268,
    q305, q337, q338, q379, q382)
}
