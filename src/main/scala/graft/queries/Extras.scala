package graft.queries

import org.apache.spark.sql.functions._

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
      Tables.lineitem(s, d)
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
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_taxi_etl_out"
      TaxiEtl.run(s, d, out)
      s.read.parquet(out)
        // input_file_name() is non-deterministic and may not sit inside
        // an aggregate — project it to an attribute first.
        .withColumn("fname", input_file_name())
        .agg(
          count(lit(1)).as("n_rows"),
          sum($"l_orderkey").as("key_sum"),
          dsum($"l_extendedprice", 2).as("price_sum"),
          countDistinct(date_format($"current_ts", "yyyy-MM-dd HH:mm:ss")).as("n_ts"),
          countDistinct($"fname").as("n_files"))
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

  val all: Seq[QuerySpec] = Seq(q39, q40, q41)
}
