package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns

/** Keyword-search operators over the documents corpus: BM25 relevance
  * ranking and inverted-index construction — the retrieval half of a
  * training-data pipeline (quality-by-retrieval, contamination probes,
  * eval-set mining all start from "rank the corpus for this query").
  *
  * Determinism discipline: both operators are INTEGER-ONLY end to end.
  * BM25's log-idf is replaced by the rational idf (N-df+1)·10⁶/(df+1) —
  * a strictly-decreasing function of df like Robertson's
  * log((N-df+0.5)/(df+0.5)), so per-term ordering is identical and the
  * saturation shape in tf/dl is the classic k₁=1.2, b=0.75 curve, but
  * every division is a Long floor-div at ppm scale, bit-equal in DuckDB
  * (`//`) and Spark (`div`) — no float ever enters the pipeline (the
  * q96 ppm discipline; cross-engine `ln()` drift is the reason the
  * textbook formula can't be hash-verified).
  */
object Search {
  import org.apache.spark.sql.{DataFrame, SparkSession}

  /** (query_id, term) pairs — the literal "query log" both engines rank
    * against. Terms chosen from the corpus vocabulary: `dup` is the one
    * rare term (df≈25/500), the rest are df≈380-400 common terms, so
    * scores exercise both the idf extremes and tf saturation. */
  private val QueryTerms: Seq[(String, String)] = Seq(
    "ann_dedup"     -> "dup", "ann_dedup" -> "vector", "ann_dedup" -> "hash",
    "stream_join"   -> "stream", "stream_join" -> "join", "stream_join" -> "window",
    "scan_pushdown" -> "scan", "scan_pushdown" -> "filter", "scan_pushdown" -> "batch",
  )

  private def sqlQueryTerms: String =
    QueryTerms.map { case (q, t) => s"('$q', '$t')" }.mkString(", ")

  /** Non-empty lowercase whitespace tokens of `text`. */
  private def toks(s: SparkSession) = {
    import s.implicits._
    filter(TextFns.tokens($"text"), t => char_length(t) > 0)
  }

  /** q278 — BM25 top-5 per query, fixed-point (see object doc).
    *
    * Shape at scale: tokens are exploded ONCE and immediately
    * semi-filtered to the broadcast query-term set, so the per-(doc,
    * term) tf table is |queries|-bounded, not vocabulary-bounded; df
    * and the corpus globals (N, avgdl) are term-count / singleton-sized
    * and broadcast back; the only shuffle proportional to the corpus is
    * the tf groupBy, keyed on (doc, term). Final top-k is a per-query
    * window over score-ranked candidates — partitions are query-sized,
    * never corpus-sized, because the tf table only holds docs that
    * matched ≥1 query term.
    *
    * Overflow bounds (Long): idf_ppm ≤ N·10⁶ and contrib multiplies it
    * by tf_sat_ppm÷1000 ≤ 2200, so the pipeline is exact while
    * N < 4·10⁹ docs; beyond that, drop idf to centi-units (same shape,
    * documented here rather than silently saturating). */
  val q278 = QuerySpec(
    "q278_bm25_topk",
    (s, d) => {
      import s.implicits._
      val docs = Tables.fanOut(Tables.documents(s, d), col("doc_id"))
        .select($"doc_id", toks(s).as("t"))
      val queries = s.createDataFrame(QueryTerms).toDF("query_id", "term")
      val terms = QueryTerms.map(_._2).distinct
      // Globals: one singleton row, broadcast via crossJoin.
      val globals = docs.agg(
        count(lit(1)).as("n_docs"),
        sum(size($"t")).as("len_sum"))
        .select($"n_docs",
          expr("len_sum * 1000000L div n_docs").as("avgdl_ppm"))
      // tf over query terms only — the explode is pruned at the scan.
      val tf = docs
        .select($"doc_id", size($"t").as("dl"), explode($"t").as("term"))
        .filter($"term".isin(terms: _*))
        .groupBy($"doc_id", $"dl", $"term")
        .agg(count(lit(1)).as("tf"))
      val df_ = tf.groupBy($"term").agg(count(lit(1)).as("df"))
      val scored = tf
        .join(broadcast(df_), "term")
        .join(broadcast(queries), "term")
        .crossJoin(broadcast(globals))
        .withColumn("dl_norm_ppm",
          expr("250000L + (750000L * dl * 1000000L) div avgdl_ppm"))
        .withColumn("tf_sat_ppm",
          expr("(tf * 2200000L * 1000000L) div (tf * 1000000L + (12L * dl_norm_ppm) div 10L)"))
        .withColumn("idf_ppm",
          expr("((n_docs - df + 1) * 1000000L) div (df + 1)"))
        .withColumn("contrib_ppm",
          expr("(idf_ppm * (tf_sat_ppm div 1000L)) div 1000L"))
        .groupBy($"query_id", $"doc_id")
        .agg(count(lit(1)).as("n_terms_matched"),
          sum($"contrib_ppm").as("score_ppm"))
      val w = Window.partitionBy($"query_id")
        .orderBy($"score_ppm".desc, $"doc_id")
      scored
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= 5)
        .select($"query_id", $"rank", $"doc_id", $"n_terms_matched", $"score_ppm")
        .orderBy($"query_id", $"rank")
    },
    Some(s"""WITH q(query_id, term) AS (VALUES $sqlQueryTerms),
            |toks AS (SELECT doc_id,
            |    list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> len(x) > 0) AS t
            |  FROM documents),
            |g AS (SELECT count(*) AS n_docs,
            |    CAST(sum(len(t)) AS BIGINT) * 1000000 // count(*) AS avgdl_ppm FROM toks),
            |tf AS (SELECT doc_id, len(t) AS dl, term, count(*) AS tf
            |  FROM (SELECT doc_id, t, unnest(t) AS term FROM toks)
            |  WHERE term IN (SELECT DISTINCT term FROM q)
            |  GROUP BY doc_id, len(t), term),
            |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            |scored AS (
            |  SELECT query_id, doc_id,
            |    CAST(count(*) AS BIGINT) AS n_terms_matched,
            |    CAST(sum(((CAST(n_docs AS BIGINT) - df + 1) * 1000000 // (df + 1))
            |      * ((tf * 2200000 * 1000000
            |          // (tf * 1000000 + (12 * (250000 + (750000 * dl * 1000000) // avgdl_ppm)) // 10))
            |         // 1000) // 1000) AS BIGINT) AS score_ppm
            |  FROM tf JOIN dfx USING (term) JOIN q USING (term) CROSS JOIN g
            |  GROUP BY query_id, doc_id)
            |SELECT query_id, rank, doc_id, n_terms_matched, score_ppm FROM (
            |  SELECT *, CAST(row_number() OVER
            |      (PARTITION BY query_id ORDER BY score_ppm DESC, doc_id) AS INT) AS rank
            |  FROM scored) WHERE rank <= 5
            |ORDER BY query_id, rank""".stripMargin),
  )

  /** q279 — inverted index: per term, document frequency, corpus term
    * frequency, and the FIRST-8 posting list (lowest doc ids, sorted).
    *
    * Bounded-state discipline: the posting cap is enforced BEFORE the
    * collect — a row_number window per term (sort-based, streaming: no
    * per-group buffering) keeps only rank ≤ 8, so the collect_list
    * aggregation buffer holds ≤ 8 ids per term even for a stopword that
    * appears in every document (the CollectCapped lesson: capping after
    * a plain collect still materializes the pathological group). df and
    * total tf are computed on the FULL tf table in a separate
    * vocabulary-sized aggregate and joined back — two shuffles keyed on
    * term, both map-side-combined, nothing corpus-sized crosses. */
  val q279 = QuerySpec(
    "q279_inverted_index",
    (s, d) => {
      import s.implicits._
      val tf = Tables.fanOut(Tables.documents(s, d), col("doc_id"))
        .select($"doc_id", explode(toks(s)).as("term"))
        .groupBy($"term", $"doc_id")
        .agg(count(lit(1)).as("tf"))
      val stats = tf.groupBy($"term").agg(
        count(lit(1)).as("df"),
        sum($"tf").as("tf_total"))
      val w = Window.partitionBy($"term").orderBy($"doc_id")
      val postings = tf
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= 8)
        .groupBy($"term")
        .agg(sort_array(collect_list($"doc_id")).as("posting"))
      stats.join(postings, "term")
        .select($"term", $"df", $"tf_total", $"posting")
        .orderBy($"term")
    },
    Some("""WITH tf AS (
           |  SELECT term, doc_id, count(*) AS tf
           |  FROM (SELECT doc_id,
           |      unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
           |        x -> len(x) > 0)) AS term
           |    FROM documents)
           |  GROUP BY term, doc_id)
           |SELECT term, CAST(count(*) AS BIGINT) AS df,
           |  CAST(sum(tf) AS BIGINT) AS tf_total,
           |  (list_sort(list(doc_id)))[1:8] AS posting
           |FROM tf GROUP BY term ORDER BY term""".stripMargin),
  )

  val all: Seq[QuerySpec] = Seq(q278, q279)
}
