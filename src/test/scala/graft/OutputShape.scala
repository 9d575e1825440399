package graft

import org.apache.spark.sql.types._

/** Output-shape guard for the driver's oracle gate (round-6 lesson,
  * q279): the gate canonicalizes both result frames with pandas
  * `sort_values` before hashing, and pandas cannot sort a cell that is
  * a numpy.ndarray (ArrayType), dict (MapType), or Row (StructType) —
  * the comparison crashes before certifying the query. So the contract
  * is: every `SparkEntry.queries` output column must be an ATOMIC type;
  * collections reduce to '|'-joined strings or checksums before the
  * final select (the discipline q173/q212/q279 follow).
  */
object OutputShape {
  /** Columns whose type the oracle gate cannot sort/hash, rendered as
    * "name: type" for assertion messages. Empty = certifiable. */
  def nonAtomicColumns(schema: StructType): Seq[String] =
    schema.fields.collect {
      case f if !isAtomic(f.dataType) => s"${f.name}: ${f.dataType.simpleString}"
    }.toSeq

  private def isAtomic(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => false
    case _ => true
  }
}
