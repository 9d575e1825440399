package graft

import org.apache.spark.sql.types._

/** Declared-schema contracts (SURVEY §1.2): the reference's Glue DDL
  * pattern — a fixed schema asserted over crawled parquet
  * (/root/reference/addons.tf:299-365) — re-expressed as StructType
  * checks against the driver's parquet footers. */
class SchemaContractsSpec extends SparkTestBase {

  test("lineitem parquet footer matches the declared contract") {
    assert(Tables.lineitem(spark, sf).schema === Tables.lineitemSchema)
  }

  test("embeddings parquet footer matches the declared contract") {
    assert(Tables.embeddings(spark, sf).schema === Tables.embeddingsSchema)
  }

  test("events.ts is re-derived as a usable timestamp column") {
    val schema = Tables.events(spark, sf).schema
    assert(schema("ts").dataType === TimestampType)
    // Sanity: values land in the generator's 2024-01 window, so the
    // nanos→micros derivation didn't shift the epoch.
    val bounds = Tables.events(spark, sf)
      .selectExpr("min(ts) as lo", "max(ts) as hi").head()
    assert(bounds.getTimestamp(0).toString.startsWith("2024-01"))
    assert(bounds.getTimestamp(1).toString.startsWith("2024-01"))
  }

  test("all driver tables load and are non-empty at sf0.001") {
    val loaders = Map(
      "region" -> Tables.region _, "nation" -> Tables.nation _,
      "customer" -> Tables.customer _, "supplier" -> Tables.supplier _,
      "part" -> Tables.part _, "orders" -> Tables.orders _,
      "lineitem" -> Tables.lineitem _, "events" -> Tables.events _,
      "documents" -> Tables.documents _, "embeddings" -> Tables.embeddings _)
    loaders.foreach { case (name, load) =>
      assert(load(spark, sf).count() > 0, s"table $name is empty")
    }
  }
}
