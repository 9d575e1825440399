package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver's synthetic parquet tables (TESTDATA.md /
  * FIXTURES.md §2) plus declared-schema contracts mirroring the reference's
  * Glue DDL pattern (/root/reference/addons.tf:299-365 declares a fixed
  * schema over crawled parquet; we do the same as cheap StructType checks).
  *
  * Scale note (100 TB design point): loaders return plain
  * `spark.read.parquet` scans — no caching, no collect — so Catalyst can
  * push filters/projections into the parquet reader and partition the scan
  * by file splits regardless of input size.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Fan a small scan out across all cores before CPU-bound per-row work
    * (md5 shingling, pairwise cosine). The driver's test tables are one
    * parquet file each → one input split, which would serialize hash-heavy
    * stages onto a single core. Hash-partitioning on the row key keeps the
    * fan-out deterministic; the shuffled payload here is a few hundred
    * bytes per row.
    *
    * Scale-adaptive: when the scan already plans at least core-count
    * SPLITS (any real 100 TB table), the reshuffle would be pure
    * overhead and is skipped. The decision reads the planned partition
    * count (`rdd.getNumPartitions` — computed from file metadata +
    * maxPartitionBytes packing, no job runs), NOT the raw file count:
    * Spark packs many small files into few splits and slices one large
    * file into many, so file count misestimates in both directions.
    * Results are partitioning-invariant either way; only the fan-out
    * changes. */
  def fanOut(df: DataFrame, key: Column): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    val splits =
      try df.rdd.getNumPartitions
      catch { case scala.util.control.NonFatal(_) => 0 }
    if (splits >= cores) df else df.repartition(cores, key)
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.parquet has carried two ts encodings across driver rounds:
    * TIMESTAMP(NANOS), which our sessions read as long nanos
    * (spark.sql.legacy.parquet.nanosAsLong), and plain microsecond
    * TIMESTAMP_NTZ. Re-derive ONE canonical column from either — a
    * session-zone (UTC) microsecond TimestampType — matching what DuckDB
    * sees when it reads the same file, so event-time queries (q34,
    * streaming demo) get identical values on both engines.
    * THE single normalization: the batch loader and every streaming
    * reader (EventIngest, StreamHarness staging) must share it, or the
    * stream/batch twin-equality gates (q34/q35, q43/q44) drift apart. */
  val nanosTsToMicros: String = "timestamp_micros(ts div 1000)"

  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => df.withColumn("ts", expr(nanosTsToMicros))
    // UTC session: NTZ→LTZ keeps the wall clock, i.e. the same micros.
    case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
    case _ => df
  }

  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(table(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Declared-schema contract for lineitem (mirrors the reference's
    * fixed Glue DDL regime, SURVEY §1.2). Enforced by
    * graft.SchemaContractsSpec. */
  val lineitemSchema: StructType = StructType(Seq(
    StructField("l_orderkey", LongType, nullable = true),
    StructField("l_partkey", LongType, nullable = true),
    StructField("l_suppkey", LongType, nullable = true),
    StructField("l_linenumber", IntegerType, nullable = true),
    StructField("l_quantity", DoubleType, nullable = true),
    StructField("l_extendedprice", DoubleType, nullable = true),
    StructField("l_discount", DoubleType, nullable = true),
    StructField("l_tax", DoubleType, nullable = true),
    StructField("l_returnflag", StringType, nullable = true),
    StructField("l_linestatus", StringType, nullable = true),
    // Parquet writes isAdjustedToUTC=false → Spark 4 surfaces NTZ.
    StructField("l_shipdate", TimestampNTZType, nullable = true),
  ))

  val embeddingsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType, nullable = true),
    StructField("embedding", ArrayType(FloatType, containsNull = true), nullable = true),
    StructField("label", IntegerType, nullable = true),
  ))
}
