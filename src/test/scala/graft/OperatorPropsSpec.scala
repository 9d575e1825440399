package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Operator laws under generated inputs (SURVEY §5): properties the
  * reference relies on implicitly — repartition is a pure multiset
  * reshuffle (pyspark-taxi-trip.py:51 assumes it), set ops obey algebra,
  * dedup is idempotent.
  *
  * Uses raw ScalaCheck Gen with fixed seeds (the scalatest bridge
  * artifact isn't in the offline cache) — deterministic across runs.
  */
class OperatorPropsSpec extends SparkTestBase {

  private val listGen: Gen[List[Long]] =
    Gen.listOfN(60, Gen.chooseNum(-1000L, 1000L))

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("repartition(n) preserves the exact multiset") {
    import spark.implicits._
    samples(Gen.zip(listGen, Gen.chooseNum(1, 7)), 8).foreach { case (xs, n) =>
      val df = xs.toDF("v")
      val back = df.repartition(n).collect().map(_.getLong(0)).toSeq
      assert(back.sorted === xs.sorted, s"multiset changed for n=$n")
      assert(df.repartition(n).rdd.getNumPartitions === n)
    }
  }

  test("(a union b) except b is a subset of distinct a") {
    import spark.implicits._
    samples(Gen.zip(listGen, listGen), 8).foreach { case (a, b) =>
      val da = a.toDF("v"); val db = b.toDF("v")
      val out = da.union(db).except(db).collect().map(_.getLong(0)).toSet
      assert(out.subsetOf(a.toSet))
      assert(out.intersect(b.toSet).isEmpty)
    }
  }

  test("dropDuplicates is idempotent and keeps one row per key") {
    import spark.implicits._
    samples(listGen, 8).foreach { a =>
      val df = a.toDF("v")
      val once = df.dropDuplicates("v")
      assert(once.count() === a.distinct.length.toLong)
      assert(once.dropDuplicates("v").count() === once.count())
    }
  }
}
