package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimension data layout — the
  * clustering key behind Iceberg/Delta z-order compaction: sorting by
  * the interleaved key places rows close in BOTH dimensions into the
  * same files, so scans filtered on either dimension (or a box on
  * both) prune most files, where a lexicographic (x, y) sort only
  * prunes on the leading column.
  *
  * Built from integer-exact Spark built-ins (shift/mod/multiply —
  * codegen'd, no UDF) with an exact DuckDB mirror, like every
  * [[Portable]] primitive. `bits` ≤ 31 per dimension keeps the
  * interleaved key in a positive BIGINT.
  *
  * Typical use here: `zValue(url_bucket, day_index, 16)` as the
  * within-partition sort key before writing tier files.
  */
object ZOrder {

  /** Interleave the low `bits` of x (even positions) and y (odd). */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "1 <= bits <= 31")
    (0 until bits).map { j =>
      (shiftright(x, j) % 2L) * lit(1L << (2 * j)) +
        (shiftright(y, j) % 2L) * lit(1L << (2 * j + 1))
    }.reduce(_ + _)
  }

  def zValueSql(xExpr: String, yExpr: String, bits: Int): String =
    (0 until bits).map { j =>
      s"(($xExpr // ${1L << j}) % 2) * ${1L << (2 * j)} + " +
        s"(($yExpr // ${1L << j}) % 2) * ${1L << (2 * j + 1)}"
    }.mkString("(", " + ", ")")

  /** Inverse: extract dimension `dim` (0 = x, 1 = y) from a z value. */
  def deinterleave(z: Column, dim: Int, bits: Int): Column = {
    require(dim == 0 || dim == 1)
    (0 until bits).map { j =>
      (shiftright(z, 2 * j + dim) % 2L) * lit(1L << j)
    }.reduce(_ + _)
  }

  def deinterleaveSql(zExpr: String, dim: Int, bits: Int): String =
    (0 until bits).map { j =>
      s"(($zExpr // ${1L << (2 * j + dim)}) % 2) * ${1L << j}"
    }.mkString("(", " + ", ")")
}
