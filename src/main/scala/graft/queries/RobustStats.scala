package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Det._

/** Robust / distributional statistics (round-6): the audits a data
  * owner runs when means and counts stop being trustworthy — digit-law
  * fraud checks, outlier-robust dispersion and location (MAD,
  * winsorized mean), continuity/gap structure, and two-sample
  * distribution drift. All exact integer or decimal-exact arithmetic
  * (no transcendentals cross the gate — Benford's log₁₀ expectations
  * are precomputed integer ppm constants).
  *
  * Scale design: every query reduces to (a) one grouped aggregate over
  * the fact table (map-side combined), then (b) windows/joins over a
  * GROUP-sized or VALUE-DOMAIN-sized frame (digits: 9 rows, flags: 3,
  * distinct lengths: thousands) — the corpus-sized pass is always the
  * single first aggregate.
  */
object RobustStats {

  /** q343 — Benford first-digit audit over l_extendedprice: observed
    * first-significant-digit frequencies vs Benford's law expectation
    * log₁₀(1+1/d), both in integer ppm (the expectations are
    * precomputed constants — no transcendental is evaluated by either
    * engine). The classic fabricated-data screen: a synthetic or
    * clipped price column shows up as a large dev_ppm. One
    * corpus-sized aggregate to 9 rows; the total joins back via a
    * 9-row window. */
  val q343 = QuerySpec(
    "q343_benford_digit_audit",
    (s, d) => {
      import s.implicits._
      val byDigit = Tables.lineitem(s, d)
        // floor() on BOTH engines: a bare double→BIGINT CAST truncates
        // in Spark but ROUNDS in DuckDB (999.9 → digit 9 vs digit 1).
        .select(expr("CAST(substring(CAST(floor(l_extendedprice) AS STRING), 1, 1) AS INT)").as("digit"))
        .groupBy($"digit").agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy() // 9-row frame — not a corpus window
      byDigit
        .withColumn("total", sum($"cnt").over(w))
        .withColumn("observed_ppm", expr("cnt * 1000000L div total"))
        .withColumn("expected_ppm", expr(
          """CASE digit WHEN 1 THEN 301029L WHEN 2 THEN 176091L
            |  WHEN 3 THEN 124938L WHEN 4 THEN 96910L WHEN 5 THEN 79181L
            |  WHEN 6 THEN 66946L WHEN 7 THEN 57991L WHEN 8 THEN 51152L
            |  ELSE 45757L END""".stripMargin))
        .withColumn("dev_ppm", abs($"observed_ppm" - $"expected_ppm"))
        .select($"digit", $"cnt", $"observed_ppm", $"expected_ppm", $"dev_ppm")
        .orderBy($"digit")
    },
    Some("""WITH b AS (
           |  SELECT CAST(substring(CAST(CAST(floor(l_extendedprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
           |    count(*) AS cnt
           |  FROM lineitem GROUP BY 1)
           |SELECT digit, cnt,
           |  CAST(cnt * 1000000 // sum(cnt) OVER () AS BIGINT) AS observed_ppm,
           |  CASE digit WHEN 1 THEN 301029 WHEN 2 THEN 176091
           |    WHEN 3 THEN 124938 WHEN 4 THEN 96910 WHEN 5 THEN 79181
           |    WHEN 6 THEN 66946 WHEN 7 THEN 57991 WHEN 8 THEN 51152
           |    ELSE 45757 END AS expected_ppm,
           |  CAST(abs(cnt * 1000000 // sum(cnt) OVER ()
           |    - CASE digit WHEN 1 THEN 301029 WHEN 2 THEN 176091
           |        WHEN 3 THEN 124938 WHEN 4 THEN 96910 WHEN 5 THEN 79181
           |        WHEN 6 THEN 66946 WHEN 7 THEN 57991 WHEN 8 THEN 51152
           |        ELSE 45757 END) AS BIGINT) AS dev_ppm
           |FROM b ORDER BY digit""".stripMargin),
  )

  /** q344 — gaps-and-islands over event activity: per user, runs of
    * CONSECUTIVE active days (the classic `day − row_number()` island
    * key), rolled up to a corpus-wide island-length histogram — the
    * continuity readout behind streak features and retention cohorts.
    * Shuffles: one distinct (user, day) aggregate (corpus-sized, but
    * rows collapse to ≤ users×days), one user-partitioned window over
    * that small frame, two tiny regroups. */
  val q344 = QuerySpec(
    "q344_event_gaps_islands",
    (s, d) => {
      import s.implicits._
      val days = Tables.events(s, d)
        .select($"user_id", expr("unix_date(to_date(ts))").as("day"))
        .distinct()
      val w = Window.partitionBy($"user_id").orderBy($"day")
      val islands = days
        .withColumn("grp", $"day" - row_number().over(w))
        .groupBy($"user_id", $"grp")
        .agg(count(lit(1)).as("island_len"))
      islands.groupBy($"island_len")
        .agg(count(lit(1)).as("n_islands"),
          countDistinct($"user_id").as("n_users"))
        .orderBy($"island_len")
    },
    Some("""WITH days AS (
           |  SELECT DISTINCT user_id,
           |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
           |  FROM events),
           |isl AS (
           |  SELECT user_id,
           |    day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
           |  FROM days),
           |runs AS (
           |  SELECT user_id, grp, count(*) AS island_len
           |  FROM isl GROUP BY user_id, grp)
           |SELECT island_len, count(*) AS n_islands,
           |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
           |FROM runs GROUP BY island_len ORDER BY island_len""".stripMargin),
  )

  /** q345 — median absolute deviation (MAD) of l_quantity per return
    * flag: the outlier-robust dispersion twin of q339's variance (one
    * wild row moves variance arbitrarily, moves MAD not at all). Two
    * exact-percentile passes — median, then median of |x − med| — with
    * the 3-row median frame broadcast back between them. Quantities
    * are small integers, so every interpolated midpoint is an exact
    * x.0/x.5 double on both engines. Exact percentiles sort within
    * flag partitions; the 100 TB path swaps in the q246
    * approx-percentile family, traded consciously for exactness
    * here. */
  val q345 = QuerySpec(
    "q345_mad_dispersion",
    (s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d).select($"l_returnflag", $"l_quantity")
      val med = li.groupBy($"l_returnflag")
        .agg(expr("percentile(l_quantity, 0.5)").as("med"))
      li.join(broadcast(med), Seq("l_returnflag"))
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"), first($"med").as("med"),
          expr("percentile(abs(l_quantity - med), 0.5)").as("mad"))
        .orderBy($"l_returnflag")
    },
    Some("""WITH med AS (
           |  SELECT l_returnflag, median(l_quantity) AS med
           |  FROM lineitem GROUP BY 1)
           |SELECT l.l_returnflag, count(*) AS n, first(m.med) AS med,
           |  median(abs(l.l_quantity - m.med)) AS mad
           |FROM lineitem l JOIN med m USING (l_returnflag)
           |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin),
  )

  /** q346 — winsorized mean of l_extendedprice per return flag: clamp
    * to the [p5, p95] order statistics, then a decimal-exact mean —
    * the trimmed-location estimate robust to fat tails. Percentile
    * ranks are DISCRETE and computed by the same integer formula
    * ⌈q·n⌉ on both engines (row_number over a unique total order — no
    * interpolation, no quantile-definition drift). One window pass to
    * rank, a 3-row boundary frame broadcast back, one decimal mean. */
  val q346 = QuerySpec(
    "q346_winsorized_mean",
    (s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d)
        .select($"l_returnflag", $"l_extendedprice", $"l_orderkey", $"l_linenumber")
      val w = Window.partitionBy($"l_returnflag")
        .orderBy($"l_extendedprice", $"l_orderkey", $"l_linenumber")
      val ranked = li
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy($"l_returnflag")))
      val bounds = ranked
        .groupBy($"l_returnflag")
        .agg(
          max(when(expr("rn = (n * 5 + 99) div 100"), $"l_extendedprice")).as("p05"),
          max(when(expr("rn = (n * 95 + 99) div 100"), $"l_extendedprice")).as("p95"))
      li.join(broadcast(bounds), Seq("l_returnflag"))
        .withColumn("wp", least(greatest($"l_extendedprice", $"p05"), $"p95"))
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"), first($"p05").as("p05"),
          first($"p95").as("p95"), davg($"wp", 2).as("wmean"))
        .orderBy($"l_returnflag")
    },
    Some(s"""WITH ranked AS (
            |  SELECT l_returnflag, l_extendedprice,
            |    row_number() OVER (PARTITION BY l_returnflag
            |      ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
            |    count(*) OVER (PARTITION BY l_returnflag) AS n
            |  FROM lineitem),
            |bounds AS (
            |  SELECT l_returnflag,
            |    max(CASE WHEN rn = (n * 5 + 99) // 100 THEN l_extendedprice END) AS p05,
            |    max(CASE WHEN rn = (n * 95 + 99) // 100 THEN l_extendedprice END) AS p95
            |  FROM ranked GROUP BY 1)
            |SELECT l.l_returnflag, count(*) AS n, first(b.p05) AS p05,
            |  first(b.p95) AS p95,
            |  ${sqlDavg("least(greatest(l.l_extendedprice, b.p05), b.p95)", 2)} AS wmean
            |FROM lineitem l JOIN bounds b USING (l_returnflag)
            |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin),
  )

  /** q349 — two-sample Kolmogorov–Smirnov drift between two sources'
    * n_chars distributions: D = max |F₁ − F₂| in exact integer ppm —
    * the distribution-shift alarm a mixture pipeline (q110/q194) runs
    * before trusting that "src1-like" still means what it meant last
    * snapshot. The empirical CDFs share one value-domain-sized frame
    * (distinct lengths), cumulated in a single ordered window; the
    * argmax row reports WHERE the distributions diverge most (lowest
    * value on ties). */
  val q349 = QuerySpec(
    "q349_ks_distribution_drift",
    (s, d) => {
      import s.implicits._
      val pts = Tables.documents(s, d)
        .filter($"source".isin("src1", "src2"))
        .groupBy($"n_chars".as("v"))
        .agg(sum(when($"source" === "src1", 1L).otherwise(0L)).as("c1"),
          sum(when($"source" === "src2", 1L).otherwise(0L)).as("c2"))
      val w = Window.partitionBy().orderBy($"v") // value-domain-sized frame
      val cdf = pts
        .withColumn("cum1", sum($"c1").over(w))
        .withColumn("cum2", sum($"c2").over(w))
        .withColumn("n1", sum($"c1").over(Window.partitionBy()))
        .withColumn("n2", sum($"c2").over(Window.partitionBy()))
        .withColumn("dppm",
          abs(expr("cum1 * 1000000L div n1") - expr("cum2 * 1000000L div n2")))
        .withColumn("dmax", max($"dppm").over(Window.partitionBy()))
      cdf.agg(first($"n1").as("n1"), first($"n2").as("n2"),
          max($"dppm").as("ks_d_ppm"),
          min(when($"dppm" === $"dmax", $"v")).as("at_value"))
    },
    Some("""WITH pts AS (
           |  SELECT n_chars AS v,
           |    CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
           |    CAST(sum(CASE WHEN source = 'src2' THEN 1 ELSE 0 END) AS BIGINT) AS c2
           |  FROM documents WHERE source IN ('src1', 'src2') GROUP BY 1),
           |cdf AS (
           |  SELECT v,
           |    sum(c1) OVER (ORDER BY v) AS cum1,
           |    sum(c2) OVER (ORDER BY v) AS cum2,
           |    sum(c1) OVER () AS n1, sum(c2) OVER () AS n2
           |  FROM pts),
           |dd AS (
           |  SELECT v, n1, n2,
           |    abs(cum1 * 1000000 // n1 - cum2 * 1000000 // n2) AS dppm
           |  FROM cdf)
           |SELECT CAST(first(n1) AS BIGINT) AS n1, CAST(first(n2) AS BIGINT) AS n2,
           |  CAST(max(dppm) AS BIGINT) AS ks_d_ppm,
           |  CAST(min(CASE WHEN dppm = (SELECT max(dppm) FROM dd) THEN v END) AS BIGINT)
           |    AS at_value
           |FROM dd""".stripMargin),
  )

  /** q374 — heavy-hitter churn between corpus epochs: q349 watches a
    * NUMERIC distribution drift; this watches the CATEGORICAL head —
    * the top-20 token sets of two epochs compared by membership
    * (Jaccard ppm, entered/exited counts) and by rank displacement
    * among survivors (max + total |Δrank|). The alarm that catches a
    * vocabulary-composition shift (new spam template, scraper change)
    * that KS on lengths never sees. One corpus-sized token count per
    * epoch (map-side combined), then the rank window runs over the
    * VOCABULARY-sized frame — two partitions is fine there because the
    * frame entering the window is already the aggregated (epoch, token,
    * n) counts, orders of magnitude below the corpus. */
  val q374 = QuerySpec(
    "q374_heavy_hitter_churn",
    (s, d) => {
      import s.implicits._
      val cnt = Tables.fanOut(Tables.documents(s, d), col("doc_id"))
        .select(($"doc_id" % 2).as("epoch"),
          explode(graft.functions.TextFns.tokens($"text")).as("tok"))
        .filter($"tok" =!= "")
        .groupBy($"epoch", $"tok").agg(count(lit(1)).as("n"))
      val rk = cnt.withColumn("r", row_number().over(
          Window.partitionBy($"epoch").orderBy($"n".desc, $"tok")))
        .filter($"r" <= 20)
      val t0 = rk.filter($"epoch" === 0).select($"tok", $"r".as("r0"))
      val t1 = rk.filter($"epoch" === 1).select($"tok".as("tok1"), $"r".as("r1"))
      val common = $"r0".isNotNull && $"r1".isNotNull
      t0.join(t1, $"tok" === $"tok1", "full_outer")
        .agg(
          sum(when(common, 1L).otherwise(0L)).as("n_common"),
          sum(when($"r0".isNull, 1L).otherwise(0L)).as("n_entered"),
          sum(when($"r1".isNull, 1L).otherwise(0L)).as("n_exited"),
          expr("sum(CASE WHEN r0 IS NOT NULL AND r1 IS NOT NULL THEN 1 ELSE 0 END)" +
            " * 1000000L div count(1)").as("jaccard_ppm"),
          coalesce(max(when(common, abs($"r1" - $"r0"))), lit(0L))
            .cast("long").as("max_rank_shift"),
          sum(when(common, abs($"r1" - $"r0")).otherwise(0L))
            .as("sum_rank_shift"))
    },
    Some("""WITH toks AS (SELECT doc_id % 2 AS epoch,
           |    unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
           |  FROM documents),
           |cnt AS (SELECT epoch, tok, count(*) AS n FROM toks
           |  WHERE tok <> '' GROUP BY 1, 2),
           |rk AS (SELECT epoch, tok, n,
           |    row_number() OVER (PARTITION BY epoch ORDER BY n DESC, tok) AS r
           |  FROM cnt),
           |t0 AS (SELECT tok, r FROM rk WHERE epoch = 0 AND r <= 20),
           |t1 AS (SELECT tok, r FROM rk WHERE epoch = 1 AND r <= 20),
           |j AS (SELECT coalesce(t0.tok, t1.tok) AS tok, t0.r AS r0, t1.r AS r1
           |  FROM t0 FULL JOIN t1 ON t0.tok = t1.tok)
           |SELECT
           |  CAST(sum(CASE WHEN r0 IS NOT NULL AND r1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
           |  CAST(sum(CASE WHEN r0 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_entered,
           |  CAST(sum(CASE WHEN r1 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_exited,
           |  CAST(sum(CASE WHEN r0 IS NOT NULL AND r1 IS NOT NULL THEN 1 ELSE 0 END) * 1000000
           |    // count(*) AS BIGINT) AS jaccard_ppm,
           |  CAST(coalesce(max(CASE WHEN r0 IS NOT NULL AND r1 IS NOT NULL
           |    THEN abs(r1 - r0) END), 0) AS BIGINT) AS max_rank_shift,
           |  CAST(sum(CASE WHEN r0 IS NOT NULL AND r1 IS NOT NULL
           |    THEN abs(r1 - r0) ELSE 0 END) AS BIGINT) AS sum_rank_shift
           |FROM j""".stripMargin),
  )

  /** q380 — split-conformal calibration threshold per group: the exact
    * ⌈(n+1)(1−α)⌉-th smallest nonconformity score (α=0.1, score =
    * |value − group median| quantized to 10⁻⁴) and the achieved
    * coverage ppm — the distribution-free prediction-band radius, with
    * the finite-sample +1 correction that plain percentile() lacks
    * (coverage is provably ≥ 1−α, visible in the output). Scale
    * discipline: quantization moves the selection onto the VALUE
    * DOMAIN — one grouped count histogram (map-side combined), then
    * the cumulative window runs over (group × distinct score) rows,
    * never the event set; the rank index is computed in pure integer
    * arithmetic (((n+1)·9+9) div 10 = ⌈0.9(n+1)⌉), no float rank
    * anywhere. */
  val q380 = QuerySpec(
    "q380_conformal_threshold",
    (s, d) => {
      import s.implicits._
      val ev = Tables.fanOut(Tables.events(s, d), col("event_id"))
        .select($"event_type", $"value")
      val med = ev.groupBy($"event_type")
        .agg(expr("percentile(value, 0.5)").as("med"))
      val h = ev.join(broadcast(med), Seq("event_type"))
        .select($"event_type",
          expr("CAST(round(abs(value - med) * 10000) AS BIGINT)").as("score_m"))
        .groupBy($"event_type", $"score_m").agg(count(lit(1)).as("c"))
      val w = Window.partitionBy($"event_type").orderBy($"score_m")
      h.withColumn("cc", sum($"c").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n", sum($"c").over(Window.partitionBy($"event_type")))
        .withColumn("kk", expr("least(n, ((n + 1) * 9 + 9) div 10)"))
        .filter($"cc" >= $"kk")
        .groupBy($"event_type", $"n")
        .agg(min($"score_m").as("tau_m"),
          expr("min_by(cc, score_m)").as("cov"))
        .select($"event_type", $"n", $"tau_m",
          expr("cov * 1000000L div n").as("coverage_ppm"))
        .orderBy($"event_type")
    },
    Some("""WITH m AS (SELECT event_type, quantile_cont(value, 0.5) AS med
           |  FROM events GROUP BY 1),
           |s AS (SELECT e.event_type,
           |    CAST(round(abs(e.value - m.med) * 10000) AS BIGINT) AS score_m
           |  FROM events e JOIN m USING (event_type)),
           |h AS (SELECT event_type, score_m, count(*) AS c FROM s GROUP BY 1, 2),
           |cum AS (SELECT *, sum(c) OVER (PARTITION BY event_type ORDER BY score_m
           |    ROWS UNBOUNDED PRECEDING) AS cc,
           |    sum(c) OVER (PARTITION BY event_type) AS n FROM h),
           |k AS (SELECT *, least(n, ((n + 1) * 9 + 9) // 10) AS kk FROM cum),
           |t AS (SELECT event_type, CAST(n AS BIGINT) AS n, min(score_m) AS tau_m,
           |    CAST(min_by(cc, score_m) AS BIGINT) AS cov
           |  FROM k WHERE cc >= kk GROUP BY event_type, n)
           |SELECT event_type, n, tau_m,
           |  CAST(cov * 1000000 // n AS BIGINT) AS coverage_ppm
           |FROM t ORDER BY event_type""".stripMargin),
  )

  /** q419 — exact Spearman rank correlation (tie-corrected, via average
    * ranks) between per-customer order activity and spend — the
    * monotone-association twin of q381's Kendall tau-b, read off the
    * SAME bounded joint-count histogram rather than row-level ranks.
    * x = order count (naturally bounded domain), y = lifetime spend in
    * exact $1000 bins (cents summed as BIGINT — no float order
    * dependence). Average ranks are derived PER DISTINCT VALUE from the
    * marginal histograms (rank2 = 2·#less + #equal + 1, scaled ×2 to
    * stay integer — the ×2 cancels in rho), so the only windows run
    * over value-domain-sized frames; the corpus-sized pass is the one
    * orders→customer aggregate. The n·Sxy − Sx·Sy cross-products are
    * lifted termwise into DECIMAL(38,0)/HUGEINT before subtraction
    * (q381's overflow discipline — the BIGINT subtree would overflow
    * near 2e21 at sf1-like customer counts). */
  val q419 = QuerySpec(
    "q419_spearman_rho",
    (s, d) => {
      import s.implicits._
      val per = Tables.fanOut(Tables.orders(s, d), col("o_custkey"))
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("x"),
          sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
        .select($"x", expr("cents div 100000L").as("y"))
      val cells = per.groupBy($"x", $"y").agg(count(lit(1)).as("c"))
      def rank2(marg: org.apache.spark.sql.DataFrame, v: String) = {
        val w = Window.orderBy(col(v))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        marg.withColumn("cum", sum($"cnt").over(w))
          .select(col(v), (lit(2L) * $"cum" - $"cnt" + 1L).as(s"r$v"))
      }
      val rx = rank2(cells.groupBy($"x").agg(sum($"c").as("cnt")), "x")
      val ry = rank2(cells.groupBy($"y").agg(sum($"c").as("cnt")), "y")
      cells.join(broadcast(rx), "x").join(broadcast(ry), "y")
        .agg(sum($"c").as("n"),
          sum($"c" * $"rx").as("sx"), sum($"c" * $"ry").as("sy"),
          sum($"c" * $"rx" * $"rx").as("sxx"),
          sum($"c" * $"ry" * $"ry").as("syy"),
          sum($"c" * $"rx" * $"ry").as("sxy"))
        .select($"n".as("n_customers"),
          // nullif guards the zero-variance degenerate (all-equal x or
          // y): 0/0 would be NaN here and a CAST error in DuckDB.
          expr("""CAST(floor(1000.0 *
            | CAST(CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE) /
            | nullif(sqrt(CAST(CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)
            |   * CAST(CAST(n AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy AS DOUBLE)), 0.0d))
            | AS BIGINT)""".stripMargin.replaceAll("\n", ""))
            .as("rho_milli"))
    },
    Some("""WITH per AS (
           |  SELECT o_custkey, count(*) AS x,
           |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) // 100000 AS y
           |  FROM orders GROUP BY o_custkey),
           |cells AS (SELECT x, y, count(*) AS c FROM per GROUP BY 1, 2),
           |rx AS (SELECT x, 2 * sum(cnt) OVER (ORDER BY x) - cnt + 1 AS rx FROM
           |  (SELECT x, sum(c) AS cnt FROM cells GROUP BY x)),
           |ry AS (SELECT y, 2 * sum(cnt) OVER (ORDER BY y) - cnt + 1 AS ry FROM
           |  (SELECT y, sum(c) AS cnt FROM cells GROUP BY y)),
           |st AS (SELECT CAST(sum(c) AS BIGINT) AS n,
           |    CAST(sum(c * rx) AS BIGINT) AS sx, CAST(sum(c * ry) AS BIGINT) AS sy,
           |    CAST(sum(c * rx * rx) AS BIGINT) AS sxx,
           |    CAST(sum(c * ry * ry) AS BIGINT) AS syy,
           |    CAST(sum(c * rx * ry) AS BIGINT) AS sxy
           |  FROM cells JOIN rx USING (x) JOIN ry USING (y))
           |SELECT n AS n_customers,
           |  CAST(floor(1000.0 *
           |    CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) /
           |    nullif(sqrt(CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
           |      * CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE)), 0.0))
           |    AS BIGINT) AS rho_milli
           |FROM st""".stripMargin),
  )

  /** q420 — unbiased pass@k eval estimator (the Chen et al. HumanEval
    * combinatorial form): per problem, n=10 attempts with c successes,
    * pass@k = 1 − C(n−c,k)/C(n,k), computed EXACTLY in integer ppm as
    * 10⁶ − 10⁶·Π(n−c−i)/Π(n−i) (the falling-factorial ratio; the Π
    * denominators are per-k constants ≤ 10!, so everything stays well
    * inside BIGINT). Attempt outcomes are deterministic hash draws —
    * nibble(md5('att|'||doc||'|'||i)) against a per-source difficulty
    * threshold — so both engines reproduce the same c without RNG
    * state. In-row math over a lazily-materialized sequence(1,10) (no
    * explode of the corpus), one |sources|×3-sized rollup; means are
    * exact integer div, mirrored verbatim. */
  val q420 = QuerySpec(
    "q420_pass_at_k",
    (s, d) => {
      import s.implicits._
      val per = Tables.fanOut(Tables.documents(s, d), col("doc_id"))
        .select($"doc_id", $"source")
        .withColumn("thr",
          expr("1 + (char_length(source) * 7 + ascii(substring(source, 4, 1))) % 8"))
        .withColumn("c", expr(
          """CAST(size(filter(sequence(1, 10), i ->
            | (instr('0123456789abcdef',
            |    substring(md5(CAST(concat('att|', doc_id, '|', i) AS BINARY)), 1, 1)) - 1)
            |   < thr)) AS BIGINT)""".stripMargin.replaceAll("\n", "")))
      val ks = Seq((1L, 10L), (5L, 30240L), (10L, 3628800L))
        .toDF("k", "den")
      per.crossJoin(broadcast(ks))
        .withColumn("num", expr(
          "aggregate(sequence(0, CAST(k AS INT) - 1), 1L, (acc, i) -> acc * greatest(10L - c - i, 0L))"))
        .withColumn("ppm", lit(1000000L) - expr("(1000000L * num) div den"))
        .groupBy($"source", $"k")
        .agg(count(lit(1)).as("n_problems"),
          expr("sum(c) * 1000L div count(1)").as("mean_c_milli"),
          expr("sum(ppm) div count(1)").as("pass_ppm_mean"))
        .orderBy($"source", $"k")
    },
    Some("""WITH per AS (
           |  SELECT doc_id, source,
           |    1 + (length(source) * 7 + ascii(substring(source, 4, 1))) % 8 AS thr,
           |    CAST(len(list_filter(generate_series(1, 10), i ->
           |      (strpos('0123456789abcdef',
           |         substr(md5('att|' || doc_id || '|' || i), 1, 1)) - 1) < thr))
           |      AS BIGINT) AS c
           |  FROM documents),
           |ks(k, den) AS (VALUES (CAST(1 AS BIGINT), CAST(10 AS BIGINT)),
           |  (5, 30240), (10, 3628800)),
           |px AS (SELECT source, k,
           |    1000000 - (1000000 * list_reduce(list_prepend(CAST(1 AS BIGINT),
           |        list_transform(generate_series(0, k - 1), i -> greatest(10 - c - i, 0))),
           |      (acc, x) -> acc * x)) // den AS ppm,
           |    c
           |  FROM per CROSS JOIN ks)
           |SELECT source, k, count(*) AS n_problems,
           |  CAST(sum(c) * 1000 // count(*) AS BIGINT) AS mean_c_milli,
           |  CAST(sum(ppm) // count(*) AS BIGINT) AS pass_ppm_mean
           |FROM px GROUP BY 1, 2 ORDER BY source, k""".stripMargin),
  )

  /** q429 — one-way ANOVA F across sources on document length: does
    * source explain length variance (the "are these feeds actually the
    * same distribution" screen that complements q349's two-sample KS
    * with an all-groups-at-once test)? Everything reduces to per-group
    * sufficient stats (n, Σx, Σx²); the rational (Σxᵢ)²/nᵢ terms are
    * evaluated in double with IDENTICAL operand trees and quantized to
    * micro BEFORE the cross-group sums, so the between/within sums are
    * pure integers (float addition order never crosses the gate —
    * q425's z discipline). Output: group count, N, SSB/SSW micro,
    * F milli, and eta² ppm (variance explained). One corpus aggregate
    * to |sources| rows, then constant-size algebra. */
  val q429 = QuerySpec(
    "q429_anova_f_oneway",
    (s, d) => {
      import s.implicits._
      val g = Tables.fanOut(Tables.documents(s, d), col("doc_id"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n"), sum($"n_chars").as("sx"),
          sum($"n_chars" * $"n_chars").as("sxx"))
        // Per-group term (Σx)²/n quantized to micro: identical double
        // tree on both engines, then integer sums only.
        .select($"n", $"sx", $"sxx",
          expr("CAST(floor(1000000.0 * (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)) AS BIGINT)")
            .as("sq_micro"),
          expr("""CAST(floor(1000000.0 * (CAST(sxx AS DOUBLE)
            | - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)) AS BIGINT)"""
            .stripMargin.replaceAll("\n", "")).as("ssw_micro"))
      g.agg(count(lit(1)).as("k"), sum($"n").as("n_total"),
        sum($"sx").as("sx_all"), sum($"sq_micro").as("sq_sum"),
        sum($"ssw_micro").as("ssw_micro"))
        .select($"k", $"n_total",
          ($"sq_sum" - expr(
            "CAST(floor(1000000.0 * (CAST(sx_all AS DOUBLE) * CAST(sx_all AS DOUBLE) / n_total)) AS BIGINT)"))
            .as("ssb_micro"),
          $"ssw_micro")
        // F's numerator is ssb_micro·(N−k)·1000 ≈ 1e24 at sf1 — lifted
        // termwise to DECIMAL(38,0)/HUGEINT (the q381 discipline).
        .select($"k", $"n_total", $"ssb_micro", $"ssw_micro",
          // outer nullif: k=1 (single group) zeroes the divisor AFTER
          // the ssw guard — F is undefined, return NULL not an error.
          expr("""CAST(CAST(ssb_micro AS DECIMAL(38,0)) * (n_total - k) * 1000
            | div nullif(nullif(CAST(ssw_micro AS DECIMAL(38,0)), 0) * (k - 1L), 0) AS BIGINT)"""
            .stripMargin.replaceAll("\n", "")).as("f_milli"),
          expr("""CAST(CAST(ssb_micro AS DECIMAL(38,0)) * 1000000
            | div nullif(CAST(ssb_micro AS DECIMAL(38,0)) + ssw_micro, 0) AS BIGINT)"""
            .stripMargin.replaceAll("\n", "")).as("eta2_ppm"))
    },
    Some("""WITH g AS (
           |  SELECT source, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sx,
           |    CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx
           |  FROM documents GROUP BY source),
           |t AS (SELECT n, sx, sxx,
           |    CAST(floor(1000000.0 * (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)) AS BIGINT) AS sq_micro,
           |    CAST(floor(1000000.0 * (CAST(sxx AS DOUBLE)
           |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)) AS BIGINT) AS ssw_micro
           |  FROM g),
           |a AS (SELECT count(*) AS k, CAST(sum(n) AS BIGINT) AS n_total,
           |    CAST(sum(sx) AS BIGINT) AS sx_all, CAST(sum(sq_micro) AS BIGINT) AS sq_sum,
           |    CAST(sum(ssw_micro) AS BIGINT) AS ssw_micro
           |  FROM t),
           |b AS (SELECT k, n_total,
           |    sq_sum - CAST(floor(1000000.0 * (CAST(sx_all AS DOUBLE) * CAST(sx_all AS DOUBLE) / n_total)) AS BIGINT) AS ssb_micro,
           |    ssw_micro
           |  FROM a)
           |SELECT k, n_total, ssb_micro, ssw_micro,
           |  CAST(CAST(ssb_micro AS HUGEINT) * (n_total - k) * 1000
           |    // nullif(nullif(CAST(ssw_micro AS HUGEINT), 0) * (k - 1), 0) AS BIGINT) AS f_milli,
           |  CAST(CAST(ssb_micro AS HUGEINT) * 1000000
           |    // nullif(CAST(ssb_micro AS HUGEINT) + ssw_micro, 0) AS BIGINT) AS eta2_ppm
           |FROM b""".stripMargin),
  )

  /** q430 — McNemar's paired test between two classifiers evaluated on
    * the SAME documents (the correct significance test when comparing
    * models on one eval set — marginal accuracies alone ignore the
    * pairing): truth is the length-quality bar, classifier A a token-
    * count rule, classifier B a space-count rule. Only the DISCORDANT
    * cells matter: χ² = (b−c)²/(b+c), plus the Edwards continuity-
    * corrected (|b−c|−1)²/(b+c) — both exact integer milli against the
    * precomputed df=1 critical value. One corpus pass to a single row. */
  val q430 = QuerySpec(
    "q430_mcnemar_paired",
    (s, d) => {
      import s.implicits._
      val cls = Tables.fanOut(Tables.documents(s, d), col("doc_id"))
        .select(
          ($"n_chars" >= 300L).as("truth"),
          (size(split($"text", " ")) >= 55).as("pa"),
          ((length($"text") - length(regexp_replace($"text", " ", ""))) >= 54)
            .as("pb"))
        .select(($"pa" === $"truth").as("ca"), ($"pb" === $"truth").as("cb"))
      cls.agg(
        count(lit(1)).as("n"),
        sum(when($"ca" && !$"cb", 1L).otherwise(0L)).as("b"),
        sum(when(!$"ca" && $"cb", 1L).otherwise(0L)).as("c"))
        .select($"n", $"b", $"c",
          expr("(b - c) * (b - c) * 1000L div nullif(b + c, 0L)")
            .as("chi2_milli"),
          expr("""(abs(b - c) - 1L) * (abs(b - c) - 1L) * 1000L
            | div nullif(b + c, 0L)""".stripMargin.replaceAll("\n", ""))
            .as("chi2_cc_milli"))
        .withColumn("significant", $"chi2_milli" > 3841L)
    },
    Some("""WITH cls AS (
           |  SELECT (n_chars >= 300) AS truth,
           |    (len(string_split(text, ' ')) >= 55) AS pa,
           |    ((length(text) - length(replace(text, ' ', ''))) >= 54) AS pb
           |  FROM documents),
           |m AS (SELECT count(*) AS n,
           |    CAST(sum(CASE WHEN (pa = truth) AND NOT (pb = truth) THEN 1 ELSE 0 END) AS BIGINT) AS b,
           |    CAST(sum(CASE WHEN NOT (pa = truth) AND (pb = truth) THEN 1 ELSE 0 END) AS BIGINT) AS c
           |  FROM cls)
           |SELECT n, b, c,
           |  CAST((b - c) * (b - c) * 1000 // nullif(b + c, 0) AS BIGINT) AS chi2_milli,
           |  CAST((abs(b - c) - 1) * (abs(b - c) - 1) * 1000 // nullif(b + c, 0) AS BIGINT) AS chi2_cc_milli,
           |  CAST((b - c) * (b - c) * 1000 // nullif(b + c, 0) AS BIGINT) > 3841 AS significant
           |FROM m""".stripMargin),
  )

  /** q455 — bimodality screen over the doc-length distribution: a mixed
    * corpus (two templating regimes, two upstream feeds) shows up as
    * two histogram modes with a valley between them — the cheap test
    * that decides whether per-source stats (q429) even make sense
    * pooled. Mode 1 = global argmax bin; mode 2 = argmax among bins ≥ 3
    * bins away (so a fat unimodal peak can't nominate its own
    * shoulder); valley = min count strictly between them. The dip ratio
    * valley/min(mode₁, mode₂) in exact ppm flags bimodal < 0.5. All
    * argmaxes tie-break on the lower bin; one corpus aggregate to a
    * bounded 32-char-bin histogram, then bin-domain algebra. */
  val q455 = QuerySpec(
    "q455_bimodality_screen",
    (s, d) => {
      import s.implicits._
      val hist = Tables.fanOut(Tables.documents(s, d), col("doc_id"))
        .groupBy(expr("n_chars div 32L").as("bin"))
        .agg(count(lit(1)).as("c"))
      val m1 = hist.orderBy($"c".desc, $"bin").limit(1)
        .select($"bin".as("bin1"), $"c".as("c1"))
      val m2 = hist.crossJoin(broadcast(m1))
        .filter(abs($"bin" - $"bin1") >= 3)
        .orderBy($"c".desc, $"bin").limit(1)
        .select($"bin".as("bin2"), $"c".as("c2"))
      hist.crossJoin(broadcast(m1)).crossJoin(broadcast(m2))
        .filter($"bin" > least($"bin1", $"bin2")
          && $"bin" < greatest($"bin1", $"bin2"))
        .agg(max($"bin1").as("bin1"), max($"c1").as("c1"),
          max($"bin2").as("bin2"), max($"c2").as("c2"),
          min($"c").as("valley_min"))
        .select($"bin1", $"c1", $"bin2", $"c2", $"valley_min",
          expr("valley_min * 1000000L div least(c1, c2)").as("dip_ppm"))
        .withColumn("bimodal", $"dip_ppm" < 500000L)
    },
    Some("""WITH hist AS (
           |  SELECT n_chars // 32 AS bin, count(*) AS c
           |  FROM documents GROUP BY 1),
           |m1 AS (SELECT bin AS bin1, c AS c1 FROM hist ORDER BY c DESC, bin LIMIT 1),
           |m2 AS (SELECT bin AS bin2, c AS c2 FROM hist CROSS JOIN m1
           |  WHERE abs(bin - bin1) >= 3 ORDER BY c DESC, bin LIMIT 1),
           |v AS (SELECT max(bin1) AS bin1, CAST(max(c1) AS BIGINT) AS c1,
           |    max(bin2) AS bin2, CAST(max(c2) AS BIGINT) AS c2,
           |    CAST(min(c) AS BIGINT) AS valley_min
           |  FROM hist CROSS JOIN m1 CROSS JOIN m2
           |  WHERE bin > least(bin1, bin2) AND bin < greatest(bin1, bin2))
           |SELECT bin1, c1, bin2, c2, valley_min,
           |  CAST(valley_min * 1000000 // least(c1, c2) AS BIGINT) AS dip_ppm,
           |  valley_min * 1000000 // least(c1, c2) < 500000 AS bimodal
           |FROM v""".stripMargin),
  )

  /** Shared fixture for the fairness trio (q458–q460): q430's two
    * deterministic document classifiers against the length-quality
    * truth, grouped by source — (source, truth, pred) per doc. */
  private def classified(s: org.apache.spark.sql.SparkSession, d: String) = {
    import s.implicits._
    Tables.fanOut(Tables.documents(s, d), col("doc_id"))
      .select($"source",
        ($"n_chars" >= 300L).as("truth"),
        (size(split($"text", " ")) >= 55).as("pred"))
  }

  private val sqlClassified: String =
    """cls AS (
      |  SELECT source, (n_chars >= 300) AS truth,
      |    (len(string_split(text, ' ')) >= 55) AS pred
      |  FROM documents)""".stripMargin

  /** q458 — per-group accuracy fairness gap: the first fairness page —
    * does the classifier work EQUALLY WELL across sources, or does its
    * aggregate accuracy hide a group it fails? Accuracy per source in
    * exact ppm plus each group's gap to the best group; worst gap
    * above 50 000 ppm flags review. One corpus aggregate to |sources|
    * rows, the 1-row max broadcast back. */
  val q458 = QuerySpec(
    "q458_accuracy_fairness_gap",
    (s, d) => {
      import s.implicits._
      val per = classified(s, d).groupBy($"source")
        .agg(count(lit(1)).as("n"),
          sum(when($"pred" === $"truth", 1L).otherwise(0L)).as("n_correct"))
        .withColumn("acc_ppm", expr("n_correct * 1000000L div n"))
      per.crossJoin(broadcast(per.agg(max($"acc_ppm").as("best_ppm"))))
        .select($"source", $"n", $"acc_ppm",
          ($"best_ppm" - $"acc_ppm").as("gap_ppm"))
        .withColumn("review_flag", $"gap_ppm" > 50000L)
        .orderBy($"source")
    },
    Some(s"""WITH $sqlClassified,
            |per AS (SELECT source, count(*) AS n,
            |    CAST(sum(CASE WHEN pred = truth THEN 1 ELSE 0 END) * 1000000
            |      // count(*) AS BIGINT) AS acc_ppm
            |  FROM cls GROUP BY source),
            |b AS (SELECT max(acc_ppm) AS best_ppm FROM per)
            |SELECT source, n, acc_ppm,
            |  best_ppm - acc_ppm AS gap_ppm,
            |  best_ppm - acc_ppm > 50000 AS review_flag
            |FROM per CROSS JOIN b ORDER BY source""".stripMargin),
  )

  /** q459 — disparate-impact (four-fifths rule) audit: per source, the
    * classifier's positive-selection rate, and each group's impact
    * ratio against the MOST-selected group — the EEOC 80% screen: a
    * ratio under 800 000 ppm is adverse impact. Exact ppm integer
    * chains; same single-aggregate shape as q458. */
  val q459 = QuerySpec(
    "q459_disparate_impact",
    (s, d) => {
      import s.implicits._
      val per = classified(s, d).groupBy($"source")
        .agg(count(lit(1)).as("n"),
          sum(when($"pred", 1L).otherwise(0L)).as("n_selected"))
        .withColumn("sel_ppm", expr("n_selected * 1000000L div n"))
      per.crossJoin(broadcast(per.agg(max($"sel_ppm").as("best_sel_ppm"))))
        .select($"source", $"n", $"n_selected", $"sel_ppm",
          expr("sel_ppm * 1000000L div nullif(best_sel_ppm, 0L)")
            .as("impact_ratio_ppm"))
        .withColumn("adverse_impact", $"impact_ratio_ppm" < 800000L)
        .orderBy($"source")
    },
    Some(s"""WITH $sqlClassified,
            |per AS (SELECT source, count(*) AS n,
            |    CAST(sum(CASE WHEN pred THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
            |    CAST(sum(CASE WHEN pred THEN 1 ELSE 0 END) * 1000000
            |      // count(*) AS BIGINT) AS sel_ppm
            |  FROM cls GROUP BY source),
            |b AS (SELECT max(sel_ppm) AS best_sel_ppm FROM per)
            |SELECT source, n, n_selected, sel_ppm,
            |  CAST(sel_ppm * 1000000 // nullif(best_sel_ppm, 0) AS BIGINT) AS impact_ratio_ppm,
            |  sel_ppm * 1000000 // nullif(best_sel_ppm, 0) < 800000 AS adverse_impact
            |FROM per CROSS JOIN b ORDER BY source""".stripMargin),
  )

  /** q460 — equalized-odds gap (Hardt et al.): per source, the
    * classifier's TRUE-positive and FALSE-positive rates, and each
    * group's absolute gap to the corpus-wide pooled rates — error-rate
    * parity conditioned on the truth, the fairness criterion accuracy
    * (q458) and selection rate (q459) both miss. nullif guards the
    * all-one-class group (TPR/FPR undefined → NULL, not ÷0). */
  val q460 = QuerySpec(
    "q460_equalized_odds_gap",
    (s, d) => {
      import s.implicits._
      val per = classified(s, d).groupBy($"source")
        .agg(
          sum(when($"truth" && $"pred", 1L).otherwise(0L)).as("tp"),
          sum(when($"truth" && !$"pred", 1L).otherwise(0L)).as("fn"),
          sum(when(!$"truth" && $"pred", 1L).otherwise(0L)).as("fp"),
          sum(when(!$"truth" && !$"pred", 1L).otherwise(0L)).as("tn"))
        .withColumn("tpr_ppm", expr("tp * 1000000L div nullif(tp + fn, 0L)"))
        .withColumn("fpr_ppm", expr("fp * 1000000L div nullif(fp + tn, 0L)"))
      val pooled = per.agg(
        expr("sum(tp) * 1000000L div nullif(sum(tp) + sum(fn), 0L)").as("tpr_all"),
        expr("sum(fp) * 1000000L div nullif(sum(fp) + sum(tn), 0L)").as("fpr_all"))
      per.crossJoin(broadcast(pooled))
        .select($"source", $"tpr_ppm", $"fpr_ppm",
          abs($"tpr_ppm" - $"tpr_all").as("tpr_gap_ppm"),
          abs($"fpr_ppm" - $"fpr_all").as("fpr_gap_ppm"))
        .withColumn("odds_violation",
          greatest($"tpr_gap_ppm", $"fpr_gap_ppm") > 100000L)
        .orderBy($"source")
    },
    Some(s"""WITH $sqlClassified,
            |per AS (SELECT source,
            |    CAST(sum(CASE WHEN truth AND pred THEN 1 ELSE 0 END) AS BIGINT) AS tp,
            |    CAST(sum(CASE WHEN truth AND NOT pred THEN 1 ELSE 0 END) AS BIGINT) AS fn,
            |    CAST(sum(CASE WHEN NOT truth AND pred THEN 1 ELSE 0 END) AS BIGINT) AS fp,
            |    CAST(sum(CASE WHEN NOT truth AND NOT pred THEN 1 ELSE 0 END) AS BIGINT) AS tn
            |  FROM cls GROUP BY source),
            |r AS (SELECT source,
            |    tp * 1000000 // nullif(tp + fn, 0) AS tpr_ppm,
            |    fp * 1000000 // nullif(fp + tn, 0) AS fpr_ppm
            |  FROM per),
            |pl AS (SELECT
            |    sum(tp) * 1000000 // nullif(sum(tp) + sum(fn), 0) AS tpr_all,
            |    sum(fp) * 1000000 // nullif(sum(fp) + sum(tn), 0) AS fpr_all
            |  FROM per)
            |SELECT source, CAST(tpr_ppm AS BIGINT) AS tpr_ppm,
            |  CAST(fpr_ppm AS BIGINT) AS fpr_ppm,
            |  CAST(abs(tpr_ppm - tpr_all) AS BIGINT) AS tpr_gap_ppm,
            |  CAST(abs(fpr_ppm - fpr_all) AS BIGINT) AS fpr_gap_ppm,
            |  greatest(abs(tpr_ppm - tpr_all), abs(fpr_ppm - fpr_all)) > 100000 AS odds_violation
            |FROM r CROSS JOIN pl ORDER BY source""".stripMargin),
  )

  val all: Seq[QuerySpec] =
    Seq(q343, q344, q345, q346, q349, q374, q380, q419, q420, q429, q430,
      q455, q458, q459, q460)
}
