package graft.queries

import graft.streaming.{EventIngest, Sessionize, StreamBackfillBridge, StreamDedup, StreamJoin, StreamSessionWindow}
import Det._

/** Streaming surface, gated through the same oracle as the batch twin.
  *
  * The reference's "streaming" is job-level: one SQS message → one batch
  * run (SURVEY §2.9). q35 runs that model in-engine: a checkpointed
  * file-source stream drained with Trigger.AvailableNow, whose windowed
  * state must equal the batch q34 aggregate over the same files — so the
  * DuckDB oracle for q34 verifies the streaming path value-for-value.
  */
object StreamingOps {

  /** q35 — streaming hourly window (Trigger.AvailableNow), verified
    * against the batch oracle. Watermark (1h) bounds streaming state at
    * scale; complete-mode memory sink is harness-only (see EventIngest). */
  val q35 = QuerySpec(
    "q35_stream_hourly_window",
    (s, d) => EventIngest.runOnce(s, d),
    Some(s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
            |  count(*) AS n_events, ${sqlDsum("value", 4)} AS value_sum
            |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
  )

  /** q44 — stateful streaming sessionization (flatMapGroupsWithState +
    * event-time timeout), gated against batch q43's oracle: the stream's
    * closed sessions over the drained file source must equal the batch
    * lag/cumsum sessionization value-for-value (exact scaled-decimal
    * sums make the totals bit-identical). See graft.streaming.Sessionize
    * for the state contract and the heartbeat drain. */
  val q44 = QuerySpec(
    "q44_stream_sessionize",
    (s, d) => Sessionize.runOnce(s, d),
    Extras.q43.oracle,
  )

  /** q53 — streaming dedup under duplicate delivery
    * (dropDuplicatesWithinWatermark): the events table delivered twice
    * must collapse back to single-copy per-type counts. See
    * graft.streaming.StreamDedup. */
  val q53 = QuerySpec(
    "q53_stream_dedup",
    (s, d) => StreamDedup.runOnce(s, d),
    Some("""SELECT event_type, count(*) AS n_events
           |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
  )

  /** q54 — stream-stream interval join (clicks within the hour before
    * each purchase, per user), gated against the equivalent batch join.
    * Watermark + interval bound keep both sides' join state evictable.
    * See graft.streaming.StreamJoin. */
  val q54 = QuerySpec(
    "q54_stream_interval_join",
    (s, d) => StreamJoin.runOnce(s, d),
    Some("""SELECT p.event_id AS purchase_id, count(*) AS n_clicks_prior_hour
           |FROM events p JOIN events c
           |  ON c.user_id = p.user_id
           | AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
           |WHERE p.event_type = 'purchase' AND c.event_type = 'click'
           |GROUP BY p.event_id ORDER BY purchase_id""".stripMargin),
  )

  /** q91 — streaming CDC upsert (foreachBatch MERGE, batch q80's twin):
    * micro-batches merged latest-wins into a versioned parquet target
    * under duplicate delivery (two staged copies, maxFilesPerTrigger=1
    * forcing ≥2 merges). The oracle is q80's batch compaction — the
    * streamed upsert state must equal compacting the whole changelog at
    * once. See graft.streaming.StreamUpsert. */
  val q91 = QuerySpec(
    "q91_stream_cdc_upsert",
    (s, d) => graft.streaming.StreamUpsert.runOnce(s, d),
    Extras.q80.oracle,
  )

  /** q95 — stream-static enrichment join: events enriched per
    * micro-batch against the static customer dimension via broadcast
    * left join (stateless — no watermark, no join state), rolled up by
    * the enriched attribute for the gate. See
    * graft.streaming.StreamEnrich. */
  val q95 = QuerySpec(
    "q95_stream_static_enrich",
    (s, d) => graft.streaming.StreamEnrich.runOnce(s, d),
    Some(s"""SELECT coalesce(c_mktsegment, 'unknown') AS segment,
            |  count(*) AS n_events, ${sqlDsum("value", 4)} AS value_sum
            |FROM events LEFT JOIN customer ON user_id = c_custkey
            |GROUP BY 1 ORDER BY 1""".stripMargin),
  )

  /** q108 — stream-stream LEFT OUTER interval join (q54's outer half):
    * every purchase emits, clickless ones flushed as null-side rows only
    * after the watermark proves no match can arrive (heartbeat-driven
    * here, continuous in production). Gated against the batch left
    * join — outer-null handling must be value-identical. See
    * graft.streaming.StreamJoin.runLeftOuterOnce. */
  val q108 = QuerySpec(
    "q108_stream_outer_interval_join",
    (s, d) => StreamJoin.runLeftOuterOnce(s, d),
    Some("""SELECT p.event_id AS purchase_id,
           |  CAST(sum(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_clicks_prior_hour
           |FROM events p LEFT JOIN events c
           |  ON c.user_id = p.user_id AND c.event_type = 'click'
           | AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
           |WHERE p.event_type = 'purchase'
           |GROUP BY p.event_id ORDER BY purchase_id""".stripMargin),
  )

  /** q122 — `transformWithState` (Spark 4 arbitrary state, RocksDB
    * store): per-user running totals accumulated across micro-batches
    * under duplicate delivery (feed staged twice, one file per
    * trigger). The final per-user snapshot must equal exactly 2× the
    * batch aggregate — stated directly by the oracle. See
    * graft.streaming.StreamRunningTotals for the state contract. */
  val q122 = QuerySpec(
    "q122_stream_transform_with_state",
    (s, d) => graft.streaming.StreamRunningTotals.runOnce(s, d),
    Some("""SELECT user_id, 2 * count(*) AS n_events,
           |  CAST(2 * sum(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS value_sum
           |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
  )

  /** q161 — streaming dead-letter split (batch q99's continuous twin):
    * each micro-batch classified once and fanned to clean + quarantine
    * append sinks via foreachBatch; duplicate delivery (feed staged
    * twice) stays in the gate — every event lands exactly twice, which
    * the oracle mirrors by doubling the source. Stateless per batch.
    * See graft.streaming.StreamQuarantine. */
  val q161 = QuerySpec(
    "q161_stream_quarantine",
    (s, d) => graft.streaming.StreamQuarantine.runOnce(s, d),
    Some(s"""WITH e2 AS (SELECT * FROM events, (SELECT unnest([1, 2]) AS copy)),
            |c AS (SELECT event_id, value,
            |    CASE WHEN event_type = 'error' THEN 'error_type'
            |         WHEN value < 1.0 THEN 'low_value' END AS reason
            |  FROM e2)
            |SELECT CASE WHEN reason IS NULL THEN 'clean' ELSE 'quarantine' END AS sink,
            |  coalesce(reason, 'none') AS reason, count(*) AS n_events,
            |  CAST(sum(event_id) AS BIGINT) AS id_checksum,
            |  ${sqlDsum("value", 4)} AS value_sum
            |FROM c GROUP BY 1, 2 ORDER BY sink, reason""".stripMargin),
  )

  /** q211 — update output mode: cumulative per-key re-emission across
    * micro-batches, folded by a foreachBatch upsert sink that also
    * COUNTS the re-emissions. Two mtime-ordered batches split at the
    * corpus-midpoint hour → exactly the split day upserts twice (once
    * per half with data), every other day once, and the final counts
    * equal the batch rollup. The oracle restates n_upserts as the
    * number of halves each day has events in — robust even when the
    * split lands on a day boundary. See graft.streaming.StreamUpdateMode. */
  val q211 = QuerySpec(
    "q211_stream_update_mode",
    (s, d) => graft.streaming.StreamUpdateMode.runOnce(s, d),
    Some("""WITH c AS (
           |  SELECT date_trunc('hour',
           |    make_timestamp((epoch_us(min(ts)) + epoch_us(max(ts))) // 2)) AS cut
           |  FROM events)
           |SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           |  count(*) AS n_events,
           |  CAST(count(DISTINCT CASE WHEN ts >= cut THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_upserts
           |FROM events, c GROUP BY 1 ORDER BY 1""".stripMargin),
  )

  /** q221 — stream-stream FULL OUTER interval join (q54/q108's third
    * mode): both orphan kinds — clickless purchases AND purchase-less
    * clicks — flush on watermark proof. The oracle decomposes batch
    * full-outer into the per-purchase left half plus the NOT EXISTS
    * click-only half. See StreamJoin.runFullOuterOnce. */
  val q221 = QuerySpec(
    "q221_stream_full_outer_join",
    (s, d) => StreamJoin.runFullOuterOnce(s, d),
    Some("""SELECT 'purchase' AS kind, p.event_id AS k,
           |  CAST(sum(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n
           |FROM events p LEFT JOIN events c
           |  ON c.user_id = p.user_id AND c.event_type = 'click'
           | AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
           |WHERE p.event_type = 'purchase'
           |GROUP BY p.event_id
           |UNION ALL
           |SELECT 'click_only', c.user_id, count(*)
           |FROM events c
           |WHERE c.event_type = 'click' AND NOT EXISTS (
           |  SELECT 1 FROM events p
           |  WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
           |    AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR)
           |GROUP BY c.user_id
           |ORDER BY kind, k""".stripMargin),
  )

  /** q262 — chained streaming window aggregations (multiple stateful
    * operators in ONE query): 5-min tumbling aggregate → 15-min
    * re-aggregate via `window(window_time(window))`, append mode, tail
    * flushed by heartbeat. The oracle is the equivalent batch rollup
    * ladder — per-15-min counts, DECIMAL-exact value sums, and the
    * 5-min-bucket fan-in count that proves level 2 really consumed
    * level-1 windows. See graft.streaming.StreamChainedWindows. */
  val q262 = QuerySpec(
    "q262_stream_chained_windows",
    (s, d) => graft.streaming.StreamChainedWindows.runOnce(s, d),
    Some("""WITH b AS (
           |  SELECT event_type,
           |    make_timestamp(CAST(floor(epoch(ts) / 300) AS BIGINT) * 300 * 1000000) AS w5,
           |    value
           |  FROM events),
           |l1 AS (
           |  SELECT event_type, w5,
           |    make_timestamp(CAST(floor(epoch(w5) / 900) AS BIGINT) * 900 * 1000000) AS w15,
           |    count(*) AS n5, sum(CAST(value AS DECIMAL(30,4))) AS v5
           |  FROM b GROUP BY 1, 2)
           |SELECT strftime(w15, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
           |  CAST(sum(n5) AS BIGINT) AS n_events,
           |  CAST(sum(v5) AS DOUBLE) AS value_sum,
           |  count(*) AS n_buckets5
           |FROM l1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
  )

  /** q324 — the built-in session_window in STREAMING mode (q44's
    * declarative twin, batch q112's streaming twin): engine-maintained
    * merging session state, append-mode flush on watermark proof.
    * Gated against q112's batch oracle — stream and batch
    * sessionization must agree value-for-value. See
    * graft.streaming.StreamSessionWindow. */
  val q324 = QuerySpec(
    "q324_stream_session_window",
    (s, d) => StreamSessionWindow.runOnce(s, d),
    Extras.q112.oracle,
  )


  /** q401 — batch-backfill + streaming-tail seam bridge: history before
    * a derived seam hour aggregates as batch, the tail streams with a
    * 1 h pre-seam re-delivery overlap, and the DECIMAL partials merge —
    * the seam-straddling hour gets contributions from BOTH halves, so
    * the merge is a partial-sum, never a rollup concat. Must equal the
    * from-scratch batch rollup (q34's oracle) value-for-value — the
    * lambda-architecture migration proof. See
    * [[graft.streaming.StreamBackfillBridge]]. */
  val q401 = QuerySpec(
    "q401_stream_backfill_bridge",
    (s, d) => StreamBackfillBridge.runOnce(s, d),
    Some(s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
            |  count(*) AS n_events, ${sqlDsum("value", 4)} AS value_sum
            |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
  )

  val all: Seq[QuerySpec] =
    Seq(q35, q44, q53, q54, q91, q95, q108, q122, q161, q211, q221, q262, q324, q401)
}
