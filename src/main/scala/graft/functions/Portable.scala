package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic primitives: every function here has an
  * exact DuckDB SQL equivalent (emitted by the paired `*Sql` builder),
  * so operators built from them are oracle-checkable value-for-value.
  * All are Catalyst built-ins (codegen'd) — no UDFs.
  */
object Portable {

  /** 60-bit deterministic hash: first 15 hex digits of md5. Positive,
    * fits a BIGINT on both engines.
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  def hash60Sql(expr: String): String =
    s"CAST(concat('0x', substring(md5($expr), 1, 15)) AS BIGINT)"

  /** Seeded hash family member i (for MinHash permutations / LSH planes). */
  def hashSeeded(i: Int, c: Column): Column =
    hash60(concat(lit(s"$i:"), c))

  def hashSeededSql(i: Int, expr: String): String =
    hash60Sql(s"concat('$i:', $expr)")

  /** Occurrences of a literal substring — replace-and-measure trick,
    * identical on both engines (no regex dialect divergence).
    */
  def occurrences(c: Column, sub: String): Column =
    ((length(c) - length(replace(c, lit(sub), lit("")))) / lit(sub.length))
      .cast("long")

  def occurrencesSql(expr: String, sub: String): String = {
    val q = sub.replace("'", "''")
    s"CAST((length($expr) - length(replace($expr, '$q', ''))) / ${sub.length} AS BIGINT)"
  }

  /** Whitespace token count for single-space-separated text. */
  def tokenCount(c: Column): Column =
    (length(c) - length(replace(c, lit(" "), lit(""))) + 1).cast("long")

  def tokenCountSql(expr: String): String =
    s"CAST(length($expr) - length(replace($expr, ' ', '')) + 1 AS BIGINT)"
}
