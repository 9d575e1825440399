package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed tables for shuffle-free co-located joins (SURVEY §4; driver
  * mandate: "bucketing for co-located joins").
  *
  * Writing both fact tables bucketed by the join key with the same
  * bucket count pre-partitions them ON DISK: a later equi-join on that
  * key reads bucket i of each side into the same task — no Exchange, no
  * sort of the big sides at query time (Spark requires only an
  * in-partition sort). At 100 TB this converts every repeated
  * fact⋈fact join on the canonical key from a full shuffle of both
  * inputs into a local merge — the shuffle is paid ONCE at write time
  * and amortized over every downstream query.
  *
  * Sizing: buckets ≈ (table size ÷ target partition size); both sides
  * must agree on count and key. Too few buckets caps parallelism; too
  * many makes small files.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (overwriting). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
}
