package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import Det._

/** Source-format surface beyond parquet (SURVEY §2.2: the reference's
  * Glue crawler re-infers whatever lands in the bucket — a real lake
  * ingests CSV and JSON drops and raw binary objects, not just parquet).
  * Each query round-trips driver data through another format/source and
  * gates the multiset against the parquet-derived oracle, so the format
  * adapters are verified to preserve values, not just to parse.
  *
  * Scratch staging mirrors q40's contract: everything under a UUID tmp
  * dir, deleted in `finally` (a bench loop over an erroring query must
  * not accumulate copies), results materialized eagerly before cleanup.
  */
object SourcesIO {

  /** q113 — binary-file source (`spark.read.format("binaryFile")`): the
    * real multimodal ingest path — image/audio objects land as FILES,
    * not rows, and the binaryFile source turns a prefix listing into
    * (path, mtime, length, content) rows. Twenty payloads are staged as
    * .bin files, read back, doc ids recovered from the file NAME (the
    * lake convention: identity in the key), and the gate checks count,
    * byte volume, distinct content digests, and the id checksum against
    * the documents table. Only digests/lengths aggregate — payloads
    * never shuffle (q33's rule). At 100 TB the source parallelizes by
    * file; driver-side staging here is harness-only (20 files). */
  val q113 = QuerySpec(
    "q113_binaryfile_source",
    (s, d) => {
      import s.implicits._
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_binsrc_" +
        java.util.UUID.randomUUID.toString.replace("-", "")
      Files.createDirectories(Paths.get(tmp))
      try {
        Tables.documents(s, d).filter($"doc_id" < 20)
          .select($"doc_id", $"text").collect()
          .foreach { r =>
            Files.write(Paths.get(s"$tmp/doc_${r.getLong(0)}.bin"),
              r.getString(1).getBytes("UTF-8"))
          }
        val bin = s.read.format("binaryFile").load(tmp)
          .select(
            regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1).cast("long").as("doc_id"),
            col("length"), md5(col("content")).as("digest"))
        val agg = bin.agg(
          count(lit(1)).as("n_files"),
          sum(col("length")).as("total_bytes"),
          countDistinct(col("digest")).as("n_distinct"),
          sum(col("doc_id")).as("id_checksum"))
        val rows = agg.collect() // eager: source dir is about to be deleted
        s.createDataFrame(java.util.Arrays.asList(rows: _*), agg.schema)
      } finally graft.Fs.deleteTree(tmp)
    },
    Some("""SELECT count(*) AS n_files,
           |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
           |  CAST(sum(doc_id) AS BIGINT) AS id_checksum
           |FROM documents WHERE doc_id < 20""".stripMargin),
  )

  /** q114 — CSV and JSON format round-trip: nation written to both
    * formats, read back with a DECLARED schema (never inference in a
    * pipeline — the Glue-DDL regime of SURVEY §1.2 applied to text
    * formats), and the per-format multiset checksums gated against the
    * parquet original. Text formats carry no types, so the declared
    * StructType is what makes ints ints again; value equality across
    * parquet→csv→parquet proves the adapters are lossless for this
    * schema. Both reads stay distributed (line-splittable formats). */
  val q114 = QuerySpec(
    "q114_format_roundtrip",
    (s, d) => {
      import s.implicits._
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_fmt_" +
        java.util.UUID.randomUUID.toString.replace("-", "")
      try {
        val nation = Tables.nation(s, d)
          .select($"n_nationkey", $"n_name", $"n_regionkey")
        val schema = StructType(Seq(
          StructField("n_nationkey", LongType),
          StructField("n_name", StringType),
          StructField("n_regionkey", LongType)))
        nation.write.option("header", "true").csv(s"$tmp/csv")
        nation.write.json(s"$tmp/json")
        val back = s.read.option("header", "true").schema(schema).csv(s"$tmp/csv")
          .withColumn("fmt", lit("csv"))
          .unionByName(s.read.schema(schema).json(s"$tmp/json")
            .withColumn("fmt", lit("json")))
        val agg = back.groupBy($"fmt")
          .agg(count(lit(1)).as("n_rows"),
            sum($"n_nationkey").as("key_checksum"),
            sum(char_length($"n_name")).as("name_len_sum"),
            sum($"n_regionkey" * $"n_nationkey").as("cross_checksum"))
          .orderBy($"fmt")
        val rows = agg.collect() // eager: staged formats live under tmp
        s.createDataFrame(java.util.Arrays.asList(rows: _*), agg.schema)
      } finally graft.Fs.deleteTree(tmp)
    },
    Some("""SELECT fmt, count(*) AS n_rows,
           |  CAST(sum(n_nationkey) AS BIGINT) AS key_checksum,
           |  CAST(sum(len(n_name)) AS BIGINT) AS name_len_sum,
           |  CAST(sum(n_regionkey * n_nationkey) AS BIGINT) AS cross_checksum
           |FROM nation, (SELECT unnest(['csv', 'json']) AS fmt)
           |GROUP BY fmt ORDER BY fmt""".stripMargin),
  )

  /** q117 — XML source round-trip (Spark 4's built-in xml format,
    * q114's third leg): nation written row-per-element under a rowTag,
    * read back with the declared schema, checksummed against the
    * parquet original. XML is the interchange format enterprise drops
    * still arrive in; the source parallelizes by file and the declared
    * schema keeps typing out of inference's hands, same as CSV/JSON. */
  val q117 = QuerySpec(
    "q117_xml_roundtrip",
    (s, d) => {
      import s.implicits._
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_xml_" +
        java.util.UUID.randomUUID.toString.replace("-", "")
      try {
        val nation = Tables.nation(s, d)
          .select($"n_nationkey", $"n_name", $"n_regionkey")
        val schema = StructType(Seq(
          StructField("n_nationkey", LongType),
          StructField("n_name", StringType),
          StructField("n_regionkey", LongType)))
        nation.write.format("xml").option("rowTag", "nation").save(s"$tmp/xml")
        val back = s.read.format("xml").option("rowTag", "nation")
          .schema(schema).load(s"$tmp/xml")
        val agg = back.agg(
          count(lit(1)).as("n_rows"),
          sum($"n_nationkey").as("key_checksum"),
          sum(char_length($"n_name")).as("name_len_sum"),
          sum($"n_regionkey" * $"n_nationkey").as("cross_checksum"))
        val rows = agg.collect() // eager: staged xml lives under tmp
        s.createDataFrame(java.util.Arrays.asList(rows: _*), agg.schema)
      } finally graft.Fs.deleteTree(tmp)
    },
    Some("""SELECT count(*) AS n_rows,
           |  CAST(sum(n_nationkey) AS BIGINT) AS key_checksum,
           |  CAST(sum(len(n_name)) AS BIGINT) AS name_len_sum,
           |  CAST(sum(n_regionkey * n_nationkey) AS BIGINT) AS cross_checksum
           |FROM nation""".stripMargin),
  )

  val all: Seq[QuerySpec] = Seq(q113, q114, q117)
}
