package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `SparkSessionExtensions` hook: registers the engine's custom Catalyst
  * expressions as SQL functions, so the SQL surface (SqlSurface /
  * spark.sql text — the way a reference user works) can call them the
  * same way the DataFrame API does. Activate with
  * `spark.sql.extensions=graft.functions.GraftExtensions` (GraftSession
  * sets it for every entry point).
  *
  * `graft_dot(array<double>, array<double>)` is the codegen'd
  * [[DotProduct]]; a SQL user writes
  * `SELECT graft_dot(a.emb, b.emb) / (a.nrm * b.nrm) ...` and gets the
  * same tight generated loop as the Scala surface — no UDF registry, no
  * boxing.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, s"graft_dot expects 2 arguments, got ${children.size}")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_array_md5"),
      new ExpressionInfo(classOf[ArrayMd5].getName, "graft_array_md5"),
      (children: Seq[Expression]) => {
        require(children.size == 2, s"graft_array_md5 expects 2 arguments, got ${children.size}")
        ArrayMd5(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash32"),
      new ExpressionInfo(classOf[SimHash32].getName, "graft_simhash32"),
      (children: Seq[Expression]) => {
        require(children.size == 1, s"graft_simhash32 expects 1 argument, got ${children.size}")
        SimHash32(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getName, "graft_cms_estimate"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_cms_estimate expects 2 arguments, got ${children.size}")
        CmsEstimate(children.head, children(1))
      }))
    // Spark ships Bloom-filter expressions for its own runtime join
    // filters (InjectRuntimeFilter) but leaves them out of the SQL
    // registry. Registering them makes EXPLICIT semi-join reduction —
    // build a Bloom filter over the small side's keys, pre-filter the
    // big side before it shuffles — available to both surfaces (q93).
    // The aggregate is commutative/mergeable (bitset OR), so it
    // partial-aggregates like any sum.
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          s"graft_bloom_agg(xxhash64_col, est_items, num_bits) expects 3 arguments, got ${children.size}")
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          children.head, children(1), children(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jaro_winkler"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_jaro_winkler expects 2 arguments, got ${children.size}")
        JaroWinkler(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_might_contain"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_might_contain(bloom, xxhash64_value) expects 2 arguments, got ${children.size}")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children.head, children(1))
      }))
  }
}
