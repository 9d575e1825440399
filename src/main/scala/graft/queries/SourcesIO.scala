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
        Eager(agg) // eager: source dir is about to be deleted
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
        Eager(agg) // eager: staged formats live under tmp
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
        Eager(agg) // eager: staged xml lives under tmp
      } finally graft.Fs.deleteTree(tmp)
    },
    Some("""SELECT count(*) AS n_rows,
           |  CAST(sum(n_nationkey) AS BIGINT) AS key_checksum,
           |  CAST(sum(len(n_name)) AS BIGINT) AS name_len_sum,
           |  CAST(sum(n_regionkey * n_nationkey) AS BIGINT) AS cross_checksum
           |FROM nation""".stripMargin),
  )

  /** q140 — ORC round-trip (the format family's columnar second
    * binary leg beside parquet): orders written as SNAPPY ORC, read
    * back (ORC carries its own types — no declared schema needed,
    * unlike q114's text formats), multiset checksums gated against the
    * parquet original. ORC is the other lake columnar standard a
    * crawler-fed catalog meets (SURVEY §1.2); the source is splittable
    * and vectorized, so the read parallelizes by stripe like parquet
    * does by row group. */
  val q140 = QuerySpec(
    "q140_orc_roundtrip",
    (s, d) => {
      import s.implicits._
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_orc_" +
        java.util.UUID.randomUUID.toString.replace("-", "")
      try {
        Tables.orders(s, d)
          .select($"o_orderkey", $"o_custkey", $"o_totalprice",
            $"o_orderdate", $"o_orderstatus")
          .write.option("compression", "snappy").orc(s"$tmp/orc")
        val agg = s.read.orc(s"$tmp/orc").agg(
          count(lit(1)).as("n_rows"),
          sum($"o_orderkey").as("key_checksum"),
          dsum($"o_totalprice", 2).as("price_sum"),
          sum(char_length($"o_orderstatus")).as("status_len_sum"),
          countDistinct(dstr($"o_orderdate")).as("n_days"))
        Eager(agg) // eager: staged orc lives under tmp
      } finally graft.Fs.deleteTree(tmp)
    },
    Some(s"""SELECT count(*) AS n_rows,
            |  CAST(sum(o_orderkey) AS BIGINT) AS key_checksum,
            |  ${sqlDsum("o_totalprice", 2)} AS price_sum,
            |  CAST(sum(len(o_orderstatus)) AS BIGINT) AS status_len_sum,
            |  CAST(count(DISTINCT strftime(o_orderdate, '%Y-%m-%d')) AS BIGINT) AS n_days
            |FROM orders""".stripMargin),
  )

  /** q133 — small-file compaction planner: the planning half of the
    * small-files problem every long-running ingest hits (q80 executes a
    * compaction; this decides WHAT to compact). Forty staged object
    * files are listed by the binaryFile source — content NEVER
    * projected, the scan reads names and lengths only — and assigned to
    * target-sized bins by next-fit-decreasing: sort (length desc,
    * name), running byte cumsum, bin = preceding-bytes DIV target,
    * target = total DIV 4 + 1. All-integer arithmetic → engine-exact.
    *
    * The staged files are documents' text bytes (q113's staging), so
    * each file's length equals octet_length(text) BY CONSTRUCTION and
    * the DuckDB oracle plans the identical bins straight from the
    * documents table — the gate needs no filesystem access. At 100 TB
    * the listing is the metadata scan: millions of files stay a
    * driver-free DataFrame, the window runs over file-count rows, and
    * bins ship to executors as compaction work units. */
  val q133 = QuerySpec(
    "q133_compaction_plan",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_compact_" +
        java.util.UUID.randomUUID.toString.replace("-", "")
      Files.createDirectories(Paths.get(tmp))
      try {
        Tables.documents(s, d).filter($"doc_id" < 40)
          .select($"doc_id", $"text").collect()
          .foreach { r =>
            Files.write(Paths.get(f"$tmp/doc_${r.getLong(0)}%03d.bin"),
              r.getString(1).getBytes("UTF-8"))
          }
        val files = s.read.format("binaryFile").load(tmp)
          .select(element_at(split($"path", "/"), -1).as("file_name"), $"length")
        val w = Window.orderBy($"length".desc, $"file_name")
          .rowsBetween(Window.unboundedPreceding, -1)
        val plan = files
          .withColumn("target", expr("sum(length) OVER () DIV 4") + lit(1L))
          .withColumn("before", coalesce(sum($"length").over(w), lit(0L)))
          .select($"file_name", $"length",
            expr("before DIV target").cast("int").as("bin"))
          .orderBy($"file_name")
        Eager(plan) // eager: staged dir is about to be deleted
      } finally graft.Fs.deleteTree(tmp)
    },
    Some("""WITH f AS (
           |  SELECT 'doc_' || lpad(CAST(doc_id AS VARCHAR), 3, '0') || '.bin' AS file_name,
           |    CAST(octet_length(encode(text)) AS BIGINT) AS length
           |  FROM documents WHERE doc_id < 40
           |), t AS (
           |  SELECT *, (sum(length) OVER ()) // 4 + 1 AS target,
           |    coalesce(sum(length) OVER (ORDER BY length DESC, file_name
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
           |  FROM f
           |)
           |SELECT file_name, length, CAST(before // target AS INT) AS bin
           |FROM t ORDER BY file_name""".stripMargin),
  )

  /** q136 — hidden `_metadata` scan columns: per-file row counts and
    * the 0-based dense `row_index` checksum over the lineitem scan —
    * the lineage primitive behind "which file did this row come from"
    * debugging and file-level incremental reprocessing. The oracle
    * needs no filesystem access: the fixture is one file per table, so
    * file_name is a constant and a dense 0..n-1 row_index must sum to
    * n(n-1)/2 — which is exactly what pins the column's semantics. */
  val q136 = QuerySpec(
    "q136_metadata_columns",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .select(
          element_at(split(col("_metadata.file_name"), "/"), -1).as("file_name"),
          col("_metadata.row_index").as("row_index"))
        .groupBy($"file_name")
        .agg(count(lit(1)).as("n"), sum($"row_index").as("row_index_sum"))
        .orderBy($"file_name")
    },
    Some("""SELECT 'lineitem.parquet' AS file_name, count(*) AS n,
           |  CAST(count(*) * (count(*) - 1) // 2 AS BIGINT) AS row_index_sum
           |FROM lineitem""".stripMargin),
  )

  /** q187 — external-table round-trip (`CREATE TABLE ... USING parquet
    * LOCATION`): the Glue-catalog semantic of the reference's addons
    * tier (addons.tf:299-365 registers a Hive-style EXTERNAL table over
    * an S3 prefix) exercised against Spark's session catalog. Nation is
    * written to a warehouse-external parquet dir, registered by
    * LOCATION, read back THROUGH the catalog, then dropped — and the
    * gate proves the external contract: the table reports
    * tableType=EXTERNAL, and after DROP TABLE the underlying files
    * survive (n_rows_after_drop re-reads the raw path). A managed table
    * would delete its data on drop; external must not. Unique table
    * name + DROP IF EXISTS in finally keep the shared-session catalog
    * clean even when a run throws. */
  val q187 = QuerySpec(
    "q187_external_table_roundtrip",
    (s, d) => {
      import s.implicits._
      val tmp = Files.createTempDirectory("graft_ext_q187").toString
      val sfx = java.util.UUID.randomUUID.toString.replace("-", "").take(12)
      val tbl = s"graft_ext_$sfx"
      try {
        val loc = s"$tmp/nation_ext"
        Tables.nation(s, d).write
          .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(loc)
        s.sql(s"CREATE TABLE $tbl USING parquet LOCATION '$loc'")
        val tableType = s.catalog.getTable(tbl).tableType
        val viaCatalog = s.table(tbl).agg(
          count(lit(1)).as("n_rows"),
          sum($"n_nationkey".cast("long")).as("key_checksum"),
          countDistinct($"n_regionkey").as("n_regions"))
        val before = Eager(viaCatalog) // materialize before the drop below
        s.sql(s"DROP TABLE $tbl")
        val after = s.read.parquet(loc).agg(count(lit(1)).as("n_rows_after_drop"))
        Eager(before
          .withColumn("table_type", lit(tableType))
          .crossJoin(after)) // eager: tmp dir is about to be deleted
      } finally {
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        graft.Fs.deleteTree(tmp)
      }
    },
    Some("""SELECT count(*) AS n_rows,
           |  CAST(sum(n_nationkey) AS BIGINT) AS key_checksum,
           |  CAST(count(DISTINCT n_regionkey) AS BIGINT) AS n_regions,
           |  'EXTERNAL' AS table_type,
           |  count(*) AS n_rows_after_drop
           |FROM nation""".stripMargin),
  )

  /** q188 — dynamic partition overwrite: the idempotent-reprocessing
    * semantic the reference's retry policy (spark-operator-taxi.yaml:
    * 37-42, OnFailure×3) implicitly relies on. Documents are laid out
    * partitionBy(lang); then ONE partition (lang=en) is reprocessed
    * (n_chars doubled) and rewritten in Overwrite mode with
    * `partitionOverwriteMode=dynamic` — which replaces only the
    * partitions present in the incoming frame. The gate aggregates the
    * WHOLE table per lang afterwards: en carries the reprocessed
    * values, every other lang must survive untouched. Under the
    * default static mode the second write would truncate the entire
    * table and the non-en groups would vanish — so the oracle parity
    * here IS the proof of dynamic semantics. At 100 TB this is how a
    * retried job rewrites yesterday's partition without touching the
    * other 10,000. */
  val q188 = QuerySpec(
    "q188_dynamic_partition_overwrite",
    (s, d) => {
      import s.implicits._
      val tmp = Files.createTempDirectory("graft_dpo_q188").toString
      try {
        val out = s"$tmp/docs_by_lang"
        val docs = Tables.documents(s, d)
          .select($"doc_id", $"source", $"n_chars", $"lang")
        docs.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .partitionBy("lang").parquet(out)
        docs.filter($"lang" === "en")
          .withColumn("n_chars", $"n_chars" * 2)
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("lang").parquet(out)
        val agg = s.read.parquet(out)
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_docs"),
            sum($"n_chars").as("chars_sum"),
            sum($"doc_id").as("id_checksum"))
          .orderBy($"lang")
        Eager(agg) // eager: tmp dir is about to be deleted
      } finally graft.Fs.deleteTree(tmp)
    },
    Some("""SELECT lang, count(*) AS n_docs,
           |  CAST(sum(CASE WHEN lang = 'en' THEN n_chars * 2 ELSE n_chars END) AS BIGINT) AS chars_sum,
           |  CAST(sum(doc_id) AS BIGINT) AS id_checksum
           |FROM documents GROUP BY lang ORDER BY lang""".stripMargin),
  )

  /** q189 — compaction EXECUTED (q133 plans; this rewrites): the staged
    * forty objects are binned by the identical next-fit-decreasing plan
    * computed from a metadata-only listing (names+lengths — content is
    * NOT projected in the planning pass), then each bin is physically
    * compacted: members concatenated in file_name order into one
    * object, written from the executors, and the compacted dir is
    * re-listed for the gate. The invariant is byte-exactness end to
    * end: per-bin file count, byte total, and the md5 of the compacted
    * payload must equal what the documents table predicts (the staged
    * bytes are documents' text BY CONSTRUCTION, so DuckDB states the
    * digest as md5(string_agg(text ORDER BY file_name)) over the same
    * bin assignment — plan → action → invariant, no filesystem access
    * oracle-side). At 100 TB the plan is a metadata scan, each bin is
    * an executor work unit reading its members once, and verification
    * is a second metadata-cheap listing of the (much smaller) output. */
  val q189 = QuerySpec(
    "q189_compaction_execute",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_compex_" +
        java.util.UUID.randomUUID.toString.replace("-", "")
      val staged = s"$tmp/staged"
      val outDir = s"$tmp/compacted"
      Files.createDirectories(Paths.get(staged))
      Files.createDirectories(Paths.get(outDir))
      try {
        Tables.documents(s, d).filter($"doc_id" < 40)
          .select($"doc_id", $"text").collect()
          .foreach { r =>
            Files.write(Paths.get(f"$staged/doc_${r.getLong(0)}%03d.bin"),
              r.getString(1).getBytes("UTF-8"))
          }
        // Planning pass: metadata only (content column never projected).
        val w = Window.orderBy($"length".desc, $"file_name")
          .rowsBetween(Window.unboundedPreceding, -1)
        val plan = s.read.format("binaryFile").load(staged)
          .select(element_at(split($"path", "/"), -1).as("file_name"), $"length")
          .withColumn("target", expr("sum(length) OVER () DIV 4") + lit(1L))
          .withColumn("before", coalesce(sum($"length").over(w), lit(0L)))
          .select($"file_name", expr("before DIV target").cast("int").as("bin"))
        // Execution pass: content read ONCE, grouped per bin, members
        // concatenated in file_name order (sort_array on the struct sorts
        // by its first field), objects written executor-side.
        val payloads = s.read.format("binaryFile").load(staged)
          .select(element_at(split($"path", "/"), -1).as("file_name"), $"content")
          .join(plan, Seq("file_name"))
          .groupBy($"bin")
          .agg(sort_array(collect_list(struct($"file_name", $"content"))).as("fs"))
          .select($"bin", expr(
            "aggregate(fs, CAST(X'' AS BINARY), (acc, f) -> concat(acc, f.content))").as("payload"))
        payloads.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
          it.foreach { r =>
            Files.write(Paths.get(f"$outDir/bin_${r.getInt(0)}%02d.bin"),
              r.getAs[Array[Byte]]("payload"))
          }
        }
        // Gate: re-list the compacted output; join the plan's per-bin
        // manifest (count) so the oracle checks plan AND action.
        val counts = plan.groupBy($"bin").agg(count(lit(1)).as("n_files"))
        val post = s.read.format("binaryFile").load(outDir)
          .select(
            regexp_extract($"path", "bin_(\\d+)\\.bin$", 1).cast("int").as("bin"),
            $"length".as("bytes"), md5($"content").as("digest"))
        Eager(post.join(counts, Seq("bin"))
          .select($"bin", $"n_files", $"bytes", $"digest")
          .orderBy($"bin")) // eager: tmp dir is about to be deleted
      } finally graft.Fs.deleteTree(tmp)
    },
    Some("""WITH f AS (
           |  SELECT 'doc_' || lpad(CAST(doc_id AS VARCHAR), 3, '0') || '.bin' AS file_name,
           |    text, CAST(octet_length(encode(text)) AS BIGINT) AS length
           |  FROM documents WHERE doc_id < 40
           |), t AS (
           |  SELECT *, (sum(length) OVER ()) // 4 + 1 AS target,
           |    coalesce(sum(length) OVER (ORDER BY length DESC, file_name
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
           |  FROM f
           |)
           |SELECT CAST(before // target AS INT) AS bin, count(*) AS n_files,
           |  CAST(sum(length) AS BIGINT) AS bytes,
           |  md5(string_agg(text, '' ORDER BY file_name)) AS digest
           |FROM t GROUP BY 1 ORDER BY bin""".stripMargin),
  )

  /** q216 — compression-codec round-trip (zstd vs snappy): the same
    * slice written under both codecs must read back content-identical,
    * certified by q210's order-independent digest (Σ first-32-md5-bits
    * over the stable row rendering) computed on the source AND on each
    * round-trip — codec choice is THE storage/CPU trade at 100 TB
    * (zstd ≈ 30-40% smaller, snappy faster to decode) and the digest
    * gate proves it is content-neutral, so the decision can be made on
    * economics alone. The oracle restates the digest from the raw
    * table; the equality booleans cross the gate explicitly. */
  val q216 = QuerySpec(
    "q216_codec_roundtrip",
    (s, d) => {
      import s.implicits._
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_codec_" +
        java.util.UUID.randomUUID.toString.replace("-", "")
      def digest(df: org.apache.spark.sql.DataFrame) =
        df.select(conv(substring(md5(concat_ws("|",
            $"l_orderkey".cast("string"), $"l_linenumber".cast("string"),
            $"l_returnflag", $"l_linestatus").cast("binary")), 1, 8), 16, 10)
            .cast("long").as("h32"))
          .agg(count(lit(1)).as("n_rows"), sum($"h32").as("digest"))
      try {
        val slice = Tables.lineitem(s, d).filter($"l_orderkey" % 20 === 0)
          .select($"l_orderkey", $"l_linenumber", $"l_returnflag", $"l_linestatus")
        slice.write.option("compression", "zstd").parquet(s"$tmp/zstd")
        slice.write.option("compression", "snappy").parquet(s"$tmp/snappy")
        val src = digest(slice).select($"n_rows", $"digest")
        val z = digest(s.read.parquet(s"$tmp/zstd"))
          .select($"n_rows".as("n_z"), $"digest".as("d_z"))
        val sn = digest(s.read.parquet(s"$tmp/snappy"))
          .select($"n_rows".as("n_s"), $"digest".as("d_s"))
        val out = src.crossJoin(broadcast(z)).crossJoin(broadcast(sn))
          .select($"n_rows", $"digest",
            ($"n_z" === $"n_rows" && $"d_z" === $"digest").as("zstd_ok"),
            ($"n_s" === $"n_rows" && $"d_s" === $"digest").as("snappy_ok"))
        Eager(out) // eager: staged parquet lives under tmp
      } finally graft.Fs.deleteTree(tmp)
    },
    Some("""WITH f AS (
           |  SELECT md5(concat_ws('|', CAST(l_orderkey AS VARCHAR),
           |      CAST(l_linenumber AS VARCHAR), l_returnflag, l_linestatus)) AS hx
           |  FROM lineitem WHERE l_orderkey % 20 = 0),
           |v AS (
           |  SELECT list_reduce(list_transform(generate_series(1, 8),
           |      i -> CAST(CASE WHEN ascii(substr(hx, i, 1)) >= 97
           |            THEN ascii(substr(hx, i, 1)) - 87
           |            ELSE ascii(substr(hx, i, 1)) - 48 END AS BIGINT)
           |        * CAST(power(16, 8 - i) AS BIGINT)),
           |      (a, b) -> a + b) AS h32
           |  FROM f)
           |SELECT count(*) AS n_rows, CAST(sum(h32) AS BIGINT) AS digest,
           |  true AS zstd_ok, true AS snappy_ok
           |FROM v""".stripMargin),
  )

  /** q224 — CSV quirk torture: payloads with embedded delimiters,
    * double quotes, AND newlines round-tripped through the CSV
    * writer/reader with RFC-4180 quoting (escape = '"' → doubled
    * quotes) and multiLine=true on the read (without it, the reader
    * splits quoted records at the embedded newline and the digest
    * breaks — THE classic CSV-at-scale corruption). The gate is q210's
    * content digest computed on the read-back vs the oracle's digest
    * from the same construction arithmetic — byte-exact or fail.
    * multiLine trade-off documented: it disables record-level input
    * splitting (a quoted newline means record boundaries can't be
    * found mid-file), so at 100 TB quirky CSV is an ingest-once
    * format — land it, convert to parquet (A7), never re-scan. */
  val q224 = QuerySpec(
    "q224_csv_quirks",
    (s, d) => {
      import s.implicits._
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_csvq_" +
        java.util.UUID.randomUUID.toString.replace("-", "")
      try {
        val src = Tables.orders(s, d).filter($"o_orderkey" % 7 === 0)
          .select($"o_orderkey".as("k"),
            concat(lit("v,"), $"o_orderpriority", lit(",\"q\""),
              when($"o_orderkey" % 3 === 0,
                concat(lit("\n"), lit("line2,\"tail\""))).otherwise(lit("")))
              .as("payload"))
        src.write.option("header", "true").option("quote", "\"")
          .option("escape", "\"").csv(s"$tmp/csv")
        val back = s.read.schema("k LONG, payload STRING")
          .option("header", "true").option("quote", "\"")
          .option("escape", "\"").option("multiLine", "true")
          .csv(s"$tmp/csv")
        val srcD = digest32(src).select($"n_rows", $"digest")
        val backD = digest32(back).select($"n_rows".as("n_b"), $"digest".as("d_b"))
        Eager(srcD.crossJoin(broadcast(backD))
          .select($"n_rows", $"digest",
            ($"n_b" === $"n_rows" && $"d_b" === $"digest").as("roundtrip_ok")))
      } finally graft.Fs.deleteTree(tmp)
    },
    Some("""WITH p AS (
           |  SELECT o_orderkey AS k,
           |    'v,' || o_orderpriority || ',"q"' ||
           |      CASE WHEN o_orderkey % 3 = 0 THEN chr(10) || 'line2,"tail"'
           |           ELSE '' END AS payload
           |  FROM orders WHERE o_orderkey % 7 = 0),
           |f AS (SELECT md5(CAST(k AS VARCHAR) || '|' || payload) AS hx FROM p),
           |v AS (
           |  SELECT list_reduce(list_transform(generate_series(1, 8),
           |      i -> CAST(CASE WHEN ascii(substr(hx, i, 1)) >= 97
           |            THEN ascii(substr(hx, i, 1)) - 87
           |            ELSE ascii(substr(hx, i, 1)) - 48 END AS BIGINT)
           |        * CAST(power(16, 8 - i) AS BIGINT)),
           |      (a, b) -> a + b) AS h32
           |  FROM f)
           |SELECT count(*) AS n_rows, CAST(sum(h32) AS BIGINT) AS digest,
           |  true AS roundtrip_ok
           |FROM v""".stripMargin),
  )

  /** Shared 32-bit md5 digest over (k, payload) — q210's scheme. */
  private def digest32(df: org.apache.spark.sql.DataFrame) = {
    import df.sparkSession.implicits._
    df.select(conv(substring(md5(concat_ws("|",
        $"k".cast("string"), $"payload").cast("binary")), 1, 8), 16, 10)
        .cast("long").as("h32"))
      .agg(count(lit(1)).as("n_rows"), sum($"h32").as("digest"))
  }

  /** q228 — range-clustered write layout: repartitionByRange +
    * sortWithinPartitions before the write gives every output file a
    * DISJOINT key range (equal keys land in one partition, so even tied
    * boundary keys can't straddle files) — the sort-based layout that
    * makes point/range reads touch one file instead of all of them,
    * z-order's (q109) one-dimensional sibling and the cheapest pruning
    * win a 100 TB table can buy. The gate reads the layout back and
    * PROVES both halves: per-file [min,max] ranges are pairwise
    * disjoint (window over file stats), and a point-range lookup's
    * surviving rows come from exactly ONE file (input_file_name). */
  val q228 = QuerySpec(
    "q228_clustered_write_layout",
    (s, d) => {
      import s.implicits._
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_clus_" +
        java.util.UUID.randomUUID.toString.replace("-", "")
      try {
        Tables.lineitem(s, d)
          .select($"l_orderkey", $"l_linenumber", $"l_quantity")
          .repartitionByRange(8, $"l_orderkey")
          .sortWithinPartitions($"l_orderkey")
          .write.parquet(s"$tmp/clustered")
        val back = s.read.parquet(s"$tmp/clustered")
        val fileStats = back
          .select(input_file_name().as("f"), $"l_orderkey")
          .groupBy($"f")
          .agg(min($"l_orderkey").as("lo"), max($"l_orderkey").as("hi"))
        val w = org.apache.spark.sql.expressions.Window.orderBy($"lo")
        val disjoint = fileStats
          .select(($"lo" > lag($"hi", 1, Long.MinValue).over(w)).as("ok"))
          .agg(min($"ok").as("disjoint_ok"), count(lit(1)).as("n_files"))
        // Point lookup on a key guaranteed to exist at every SF.
        val probeKey = back.agg(min($"l_orderkey")).head().getLong(0)
        val touched = back.filter($"l_orderkey" === probeKey)
          .select(input_file_name().as("f")).distinct()
          .agg(count(lit(1)).as("files_touched"))
        Eager(disjoint.crossJoin(broadcast(touched))
          .crossJoin(broadcast(back.agg(count(lit(1)).as("n_rows")))))
      } finally graft.Fs.deleteTree(tmp)
    },
    Some("""SELECT true AS disjoint_ok, CAST(8 AS BIGINT) AS n_files,
           |  CAST(1 AS BIGINT) AS files_touched, count(*) AS n_rows
           |FROM lineitem""".stripMargin),
  )

  /** q237 — nested-schema pruning: a deeply nested parquet layout
    * (struct{meta{status, priority}, items: array<struct{ln, qty}>})
    * read back with a LEAF projection — `spark.sql.optimizer
    * .nestedSchemaPruning.enabled` (default on) must prune the scan's
    * ReadSchema to just the referenced leaves, so a 100-leaf document
    * table pays for ONE leaf, not the whole struct (the multimodal
    * metadata pattern: wide nested metadata, narrow queries). The plan
    * audit pins the pruned ReadSchema; the value gate recomputes the
    * same rollup from flat columns. */
  val q237 = QuerySpec(
    "q237_nested_pruning",
    (s, d) => {
      import s.implicits._
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_nest_" +
        java.util.UUID.randomUUID.toString.replace("-", "")
      try {
        Tables.orders(s, d)
          .select($"o_orderkey",
            struct(
              struct($"o_orderstatus".as("status"), $"o_orderpriority".as("priority"))
                .as("meta"),
              array(struct(lit(1).as("ln"), $"o_custkey".as("qty")),
                struct(lit(2).as("ln"), ($"o_custkey" * 2).as("qty"))).as("items"))
              .as("doc"))
          .write.parquet(s"$tmp/nested")
        val agg = s.read.parquet(s"$tmp/nested")
          .groupBy($"doc.meta.status".as("status"))
          .agg(count(lit(1)).as("n"), sum($"o_orderkey").as("key_checksum"))
          .orderBy($"status")
        Eager(agg)
      } finally graft.Fs.deleteTree(tmp)
    },
    Some("""SELECT o_orderstatus AS status, count(*) AS n,
           |  CAST(sum(o_orderkey) AS BIGINT) AS key_checksum
           |FROM orders GROUP BY o_orderstatus ORDER BY status""".stripMargin),
  )

  /** q238 — text source (line mode + wholetext): the rawest ingest
    * format — staged text files read once as one-row-per-LINE (parsed
    * with the q180 kv idiom) and once as one-row-per-FILE (wholetext,
    * the contract multimodal transcripts/prompts ship under). Line
    * counts, parsed checksums, and per-file line tallies must agree
    * with the construction arithmetic. Text files are splittable in
    * line mode (scales); wholetext is per-file atomic by design —
    * bounded file sizes are the operator's contract, like q224's
    * multiLine CSV. */
  val q238 = QuerySpec(
    "q238_text_source",
    (s, d) => {
      import s.implicits._
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_text_" +
        java.util.UUID.randomUUID.toString.replace("-", "")
      try {
        Tables.orders(s, d).filter($"o_orderkey" % 11 === 0)
          .select(concat(lit("k:"), $"o_orderkey", lit(";p:"), $"o_orderpriority")
            .as("value"))
          .repartition(4)
          .write.text(s"$tmp/lines")
        val lines = s.read.text(s"$tmp/lines")
          .select(str_to_map($"value", lit(";"), lit(":")).as("m"))
          .select(element_at($"m", "k").cast("long").as("k"),
            element_at($"m", "p").as("p"))
        val lineAgg = lines.agg(count(lit(1)).as("n_lines"),
          sum($"k").as("k_checksum"), countDistinct($"p").as("n_priorities"))
        // Trailing newline: wholetext keeps the raw bytes, so split
        // yields a final empty element — count non-empty lines only.
        val whole = s.read.option("wholetext", "true").text(s"$tmp/lines")
          .select(expr("size(filter(split(value, '\n'), x -> x != ''))")
            .as("n_in_file"))
          .agg(count(lit(1)).as("n_files"), sum($"n_in_file").as("lines_via_whole"))
        Eager(lineAgg.crossJoin(broadcast(whole)))
      } finally graft.Fs.deleteTree(tmp)
    },
    Some("""SELECT count(*) AS n_lines, CAST(sum(o_orderkey) AS BIGINT) AS k_checksum,
           |  CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities,
           |  CAST(4 AS BIGINT) AS n_files, count(*) AS lines_via_whole
           |FROM orders WHERE o_orderkey % 11 = 0""".stripMargin),
  )

  /** q239 — output file-size governance (`maxRecordsPerFile`): the
    * write-side lever that stops one fat partition from emitting a
    * multi-GB file (the read-parallelism killer at 100 TB — a file is
    * the minimum unit of recovery and, for non-splittable codecs, of
    * parallelism). One coalesced partition forced through
    * maxRecordsPerFile=1000 must fan out into ceil(n/1000) files with
    * every file ≤ 1000 records — both proven from input_file_name on
    * the read-back. */
  val q239 = QuerySpec(
    "q239_max_records_per_file",
    (s, d) => {
      import s.implicits._
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_mrpf_" +
        java.util.UUID.randomUUID.toString.replace("-", "")
      try {
        val src = Tables.orders(s, d).filter($"o_orderkey" % 3 === 0)
          .select($"o_orderkey")
        src.coalesce(1)
          .write.option("maxRecordsPerFile", 1000).parquet(s"$tmp/capped")
        val perFile = s.read.parquet(s"$tmp/capped")
          .groupBy(input_file_name().as("f"))
          .agg(count(lit(1)).as("n"))
        val out = perFile.agg(count(lit(1)).as("n_files"),
          max($"n").as("max_per_file"), sum($"n").as("n_rows"))
          .select($"n_files", ($"max_per_file" <= 1000L).as("cap_held"),
            ($"n_files" === ceil($"n_rows" / lit(1000.0)).cast("long")).as("file_count_ok"),
            $"n_rows")
        Eager(out)
      } finally graft.Fs.deleteTree(tmp)
    },
    Some("""SELECT CAST(ceil(count(*) / 1000.0) AS BIGINT) AS n_files,
           |  true AS cap_held, true AS file_count_ok, count(*) AS n_rows
           |FROM orders WHERE o_orderkey % 3 = 0""".stripMargin),
  )

  /** q240 — CSV corrupt-record triage (q184's JSON discipline for CSV):
    * a staged file mixes well-formed rows with arity-broken and
    * type-broken lines; PERMISSIVE mode must load the good ones and
    * capture the raw text of the bad ones in _corrupt_record, and
    * DROPMALFORMED must keep exactly the good ones — the quarantine
    * contract (q99) at the parser layer. Lines are constructed from
    * order keys, so every count crosses the gate as arithmetic. Two
    * Spark caveats baked into the gate: corrupt-record capture needs
    * the corrupt column IN the declared schema (and the frame cached
    * before filtering on it), and — the sharp one — CSV COLUMN PRUNING
    * skips malformed-row detection for columns a query never reads, so
    * a bare count(*) under DROPMALFORMED drops NOTHING; the drop-side
    * aggregate therefore sums the parsed values (forcing the full-row
    * parse), which is also a stronger checksum. */
  val q240 = QuerySpec(
    "q240_csv_corrupt_records",
    (s, d) => {
      import s.implicits._
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_csvc_" +
        java.util.UUID.randomUUID.toString.replace("-", "")
      try {
        // good: "k,2k"; arity-broken: "k"; type-broken: "k,oops"
        Tables.orders(s, d).filter($"o_orderkey" % 13 === 0)
          .select(when($"o_orderkey" % 3 === 0, concat($"o_orderkey"))
            .when($"o_orderkey" % 3 === 1,
              concat($"o_orderkey", lit(","), $"o_orderkey" * 2))
            .otherwise(concat($"o_orderkey", lit(",oops"))).as("value"))
          .coalesce(1).write.text(s"$tmp/raw")
        val schema = "k LONG, v LONG, _corrupt_record STRING"
        val permissive = s.read.schema(schema)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .csv(s"$tmp/raw")
          .cache()
        try {
          val pAgg = permissive.agg(count(lit(1)).as("n_total"),
            sum(when($"_corrupt_record".isNull, 1L).otherwise(0L)).as("n_good"),
            sum(when($"_corrupt_record".isNotNull, 1L).otherwise(0L)).as("n_corrupt"),
            sum(when($"_corrupt_record".isNull, $"v")).as("v_checksum"))
          val dropped = s.read.schema("k LONG, v LONG")
            .option("mode", "DROPMALFORMED").csv(s"$tmp/raw")
            .agg(count(lit(1)).as("n_dropmalformed"),
              sum($"k" + $"v").as("drop_checksum"))
          Eager(pAgg.crossJoin(broadcast(dropped)))
        } finally { permissive.unpersist(); () }
      } finally graft.Fs.deleteTree(tmp)
    },
    Some("""SELECT count(*) AS n_total,
           |  CAST(sum(CASE WHEN o_orderkey % 3 = 1 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_good,
           |  CAST(sum(CASE WHEN o_orderkey % 3 <> 1 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_corrupt,
           |  CAST(sum(CASE WHEN o_orderkey % 3 = 1 THEN 2 * o_orderkey END) AS BIGINT)
           |    AS v_checksum,
           |  CAST(sum(CASE WHEN o_orderkey % 3 = 1 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_dropmalformed,
           |  CAST(sum(CASE WHEN o_orderkey % 3 = 1 THEN 3 * o_orderkey END) AS BIGINT)
           |    AS drop_checksum
           |FROM orders WHERE o_orderkey % 13 = 0""".stripMargin),
  )

  /** q277 — schema drift REPORT (q98 reads through evolution; this
    * observes it as data): two written snapshot versions diverge by an
    * added column, a removed column, and a type change; reading both
    * footers back and diffing the introspected StructTypes yields one
    * row per column with its drift status — the report a catalog-sync
    * or contract-check job emits before anyone queries the new
    * snapshot. The expectation is pinned as CONSTANTS in the oracle
    * (the drift is known by construction), so a change in how Spark
    * renders types (`DataType.sql`) fails loudly. Scale: footer-only —
    * no data rows are read; schema introspection cost is per-FILE
    * metadata, the reason drift checks run in seconds at 100 TB. */
  val q277 = QuerySpec(
    "q277_schema_drift_report",
    (s, d) => {
      import s.implicits._
      val tmp = Files.createTempDirectory("graft_drift_q277").toString
      try {
        val o = Tables.orders(s, d)
        o.select($"o_orderkey", $"o_custkey", $"o_totalprice")
          .write.mode("overwrite").parquet(s"$tmp/v1")
        o.select($"o_orderkey",
            $"o_totalprice".cast("decimal(12,2)").as("o_totalprice"),
            lit("std").as("o_channel"))
          .write.mode("overwrite").parquet(s"$tmp/v2")
        val m1 = s.read.parquet(s"$tmp/v1").schema.fields
          .map(f => f.name -> f.dataType.sql).toMap
        val m2 = s.read.parquet(s"$tmp/v2").schema.fields
          .map(f => f.name -> f.dataType.sql).toMap
        val rows = (m1.keySet ++ m2.keySet).toSeq.sorted.map { c =>
          val status = (m1.get(c), m2.get(c)) match {
            case (Some(a), Some(b)) if a == b => "unchanged"
            case (Some(_), Some(_))           => "type_changed"
            case (Some(_), None)              => "removed"
            case _                            => "added"
          }
          (c, m1.getOrElse(c, ""), m2.getOrElse(c, ""), status)
        }
        s.createDataFrame(rows)
          .toDF("col_name", "v1_type", "v2_type", "status")
          .orderBy($"col_name")
      } finally graft.Fs.deleteTree(tmp)
    },
    Some("""SELECT * FROM (VALUES
           |  ('o_channel', '', 'STRING', 'added'),
           |  ('o_custkey', 'BIGINT', '', 'removed'),
           |  ('o_orderkey', 'BIGINT', 'BIGINT', 'unchanged'),
           |  ('o_totalprice', 'DOUBLE', 'DECIMAL(12,2)', 'type_changed'))
           |  t(col_name, v1_type, v2_type, status)
           |ORDER BY col_name""".stripMargin),
  )

  /** q326 — EMBEDDED CSV parsing (`from_csv`/`to_csv` as expressions,
    * not a file source — the q114/q224 file adapters' in-row sibling):
    * the lake pattern where a message queue lands one CSV line per
    * record inside a string column, parsed per row with a declared
    * schema inside whole-stage codegen — no staging, no re-scan, no
    * inference. Round trip: to_csv(struct) → from_csv(schema) must
    * reproduce the source values through the quoting/escaping layer
    * (a p_name containing the delimiter is the case that silently
    * corrupts naive split(',')-based parsers — and the fixture's names
    * are re-checked to include multi-token values). The oracle states
    * the identity directly from the source table. */
  val q326 = QuerySpec(
    "q326_embedded_csv_roundtrip",
    (s, d) => {
      import s.implicits._
      val src = Tables.part(s, d)
        .select($"p_partkey", $"p_name", $"p_size", $"p_retailprice")
      val line = to_csv(struct($"p_partkey", $"p_name", $"p_size", $"p_retailprice"))
      val parsed = src.select($"p_partkey".as("key_orig"), line.as("line"))
        .select($"key_orig",
          from_csv($"line", StructType(Seq(
            StructField("p_partkey", LongType),
            StructField("p_name", StringType),
            StructField("p_size", IntegerType),
            StructField("p_retailprice", DoubleType))),
            Map.empty[String, String]).as("p"))
      parsed
        .select($"p.p_partkey", $"p.p_name", $"p.p_size", $"p.p_retailprice")
        .orderBy($"p_partkey")
    },
    Some("""SELECT p_partkey, p_name, p_size, p_retailprice
           |FROM part ORDER BY p_partkey""".stripMargin),
  )

  val all: Seq[QuerySpec] =
    Seq(q113, q114, q117, q133, q136, q140, q187, q188, q189, q216, q224, q228,
      q237, q238, q239, q240, q277, q326)
}
