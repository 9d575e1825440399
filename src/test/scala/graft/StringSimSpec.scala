package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.JaroWinkler

/** Jaro-Winkler expression semantics, pinned two ways: (1) literature /
  * DuckDB-verified constants — each expected double below is the EXACT
  * value DuckDB 1.x's `jaro_winkler_similarity` returns (probed once,
  * bit-identical, which is what makes q302's floor(jw·1e6) oracle gate
  * engine-portable); (2) metric properties over randomized corpora.
  */
class StringSimSpec extends SparkTestBase {

  private def jw(a: String, b: String): Double =
    JaroWinkler.jw(UTF8String.fromString(a), UTF8String.fromString(b))

  test("pinned reference values (bit-exact vs DuckDB's builtin)") {
    assert(jw("MARTHA", "MARHTA") === 0.9611111111111111)
    assert(jw("DIXON", "DICKSONX") === 0.8133333333333332)
    assert(jw("JELLYFISH", "SMELLYFISH") === 0.8962962962962964)
    assert(jw("CRATE", "TRACE") === 0.7333333333333334)
    assert(jw("arnab", "raanb") === 0.8666666666666667)
    assert(jw("abcdefgh", "hgfedcba") === 0.5)
  }

  test("degenerate rules: empty → 0 (both-empty included), equal → 1") {
    assert(jw("", "abc") === 0.0)
    assert(jw("abc", "") === 0.0)
    assert(jw("", "") === 0.0)
    assert(jw("same", "same") === 1.0)
    assert(jw("a", "b") === 0.0)
  }

  test("winkler boost fires only above jaro 0.7, never past 1.0") {
    // CRATE/TRACE has jaro ≈ 0.733 but zero common prefix → no boost.
    assert(jw("CRATE", "TRACE") === jw("TRACE", "CRATE"))
    val gen = Gen.zip(Gen.alphaLowerStr.map(_.take(10)), Gen.alphaLowerStr.map(_.take(10)))
    Iterator.from(0).map(i => gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
      .take(300).foreach { case (a, b) =>
        val s = jw(a, b)
        assert(s >= 0.0 && s <= 1.0, s"out of range for ($a, $b): $s")
        assert(s === jw(b, a), s"asymmetric for ($a, $b)")
      }
  }

  test("codegen'd column path equals the scalar path on the fixture") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Tables.part(spark, sf)
      .select($"p_name",
        JaroWinkler.jaroWinkler($"p_name", reverse($"p_name")).as("s"))
      .collect()
    rows.foreach { r =>
      val n = r.getString(0)
      assert(r.getDouble(1) === jw(n, n.reverse), s"codegen diverged for $n")
    }
  }

  test("SQL surface: graft_jaro_winkler is registered and matches") {
    val v = spark.sql("SELECT graft_jaro_winkler('MARTHA', 'MARHTA')")
      .head().getDouble(0)
    assert(v === 0.9611111111111111)
  }

  test("banded levenshtein equals least(full DP, k+1) over randomized pairs") {
    def full(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(
          math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    def banded(a: String, b: String, k: Int): Int =
      graft.functions.BoundedLevenshtein.banded(
        UTF8String.fromString(a), UTF8String.fromString(b), k)
    val gen = Gen.zip(
      Gen.chooseNum(0, 12).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c'))),
      Gen.chooseNum(0, 12).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c'))),
      Gen.chooseNum(0, 5))
    Iterator.from(0).map(i => gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
      .take(500).foreach { case (a, b, k) =>
        val exp = math.min(full(a, b), k + 1)
        assert(banded(a, b, k) === exp, s"($a, $b, k=$k)")
      }
  }
}
