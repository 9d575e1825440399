package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorOps._

class VectorOpsSpec extends SparkTestBase {
  import org.apache.spark.sql.Row

  private def vecs = {
    import spark.implicits._
    Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f), Seq(0.0f, 1.0f, 0.0f)),
      (2L, Seq(3.0f, 4.0f, 0.0f), Seq(3.0f, 4.0f, 0.0f)),
      (3L, Seq(1.0f, 2.0f, 2.0f), Seq(2.0f, 4.0f, 4.0f)),
    ).toDF("id", "a", "b")
  }

  test("dot: orthogonal is 0, parallel is |v|^2") {
    val rows = vecs.select(col("id"), dot(col("a"), col("b")).as("d"))
      .orderBy("id").collect()
    assert(rows(0).getDouble(1) === 0.0)
    assert(rows(1).getDouble(1) === 25.0)
    assert(rows(2).getDouble(1) === 18.0)
  }

  test("l2Norm matches hand computation") {
    val rows = vecs.select(col("id"), l2Norm(col("a")).as("n"))
      .orderBy("id").collect()
    assert(rows(0).getDouble(1) === 1.0)
    assert(rows(1).getDouble(1) === 5.0)
    assert(rows(2).getDouble(1) === 3.0)
  }

  test("cosine: orthogonal 0, identical 1, scaled copies 1") {
    val rows = vecs.select(col("id"), cosine(col("a"), col("b")).as("c"))
      .orderBy("id").collect()
    assert(rows(0).getDouble(1) === 0.0)
    assert(math.abs(rows(1).getDouble(1) - 1.0) < 1e-12)
    assert(math.abs(rows(2).getDouble(1) - 1.0) < 1e-12)
  }

  test("dot of mismatched-length arrays is null, not a partial sum") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    import graft.functions.DotProduct
    // Codegen'd path: through a query.
    val df = Seq((1L, Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0))).toDF("id", "a", "b")
    val gen = df.select(dot(col("a"), col("b")).as("d")).collect()
    assert(gen(0).isNullAt(0))
    // Interpreted path: nullSafeEval directly.
    val lit3 = Literal.create(Array(1.0, 2.0, 3.0), ArrayType(DoubleType))
    val lit2 = Literal.create(Array(1.0, 2.0), ArrayType(DoubleType))
    assert(DotProduct(lit3, lit2).eval() == null)
    assert(DotProduct(lit3, lit3).eval() == 14.0)
  }

  test("graft_dot is callable from SQL text via GraftExtensions") {
    import spark.implicits._
    Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b").createOrReplaceTempView("gdot_t")
    val r = spark.sql("SELECT graft_dot(a, b) AS d FROM gdot_t").head.getDouble(0)
    assert(r === 11.0)
  }

  test("null embedding yields null, not a crash") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[Seq[Float]]), (2L, Some(Seq(1.0f))))
      .toDF("id", "v")
    val out = df.select(col("id"), l2Norm(col("v")).as("n")).orderBy("id").collect()
    assert(out(0).isNullAt(1))
    assert(out(1).getDouble(1) === 1.0)
  }
}
