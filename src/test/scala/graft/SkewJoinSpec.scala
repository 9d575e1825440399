package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

/** The salted join must be RESULT-identical to the plain equi-join while
  * actually spreading a hot key over multiple shuffle partitions — even
  * when the hot key's rows are bit-identical duplicates (the shape a
  * content-hash salt silently fails on).
  */
class SkewJoinSpec extends SparkTestBase {

  private lazy val skewed = {
    import spark.implicits._
    // 10k rows, 90% on key 1 — one reducer would take the whole key.
    (1 to 10000).map(i => (if (i % 10 == 0) i % 7 + 2 else 1L, s"v$i"))
      .toDF("k", "payload")
  }

  private lazy val dim = {
    import spark.implicits._
    (1L to 10L).map(k => (k, s"name$k")).toDF("k", "name")
  }

  test("salted join result equals the plain join result") {
    val plain = skewed.join(dim, Seq("k"))
      .select("k", "payload", "name").orderBy("k", "payload").collect()
    val salted = SkewJoin.saltedEquiJoin(skewed, dim, "k", salts = 8)
      .select("k", "payload", "name").orderBy("k", "payload").collect()
    assert(salted.length === plain.length)
    assert(salted.sameElements(plain))
  }

  test("the hot key's rows spread across multiple shuffle partitions") {
    val salts = skewed
      .withColumn(SkewJoin.SaltCol, SkewJoin.saltExpr(8))
      .filter(col("k") === 1)
      .select(SkewJoin.SaltCol).distinct().count()
    assert(salts > 1, s"hot key stayed on $salts salt(s)")
  }

  test("bit-identical duplicate rows still spread (and join correctly)") {
    import spark.implicits._
    // Every row identical — a content-hash salt maps all of them to one
    // salt value; the positional salt must use all 8.
    val dups = Seq.fill(4000)((1L, "same")).toDF("k", "payload")
      .repartition(8) // several input splits, like a real hot table
    val salts = dups
      .withColumn(SkewJoin.SaltCol, SkewJoin.saltExpr(8))
      .select(SkewJoin.SaltCol).distinct().count()
    assert(salts === 8L, s"identical duplicates spread over only $salts salt(s)")
    val joined = SkewJoin.saltedEquiJoin(dups, dim, "k", salts = 8)
    assert(joined.count() === 4000L)
    assert(joined.select("name").distinct().head.getString(0) === "name1")
  }
}
