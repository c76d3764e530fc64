package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All `tables` random-hyperplane LSH bucket ids of a vector, as one
  * array<long> (index = table) — the key-generation kernel of the LSH
  * similarity paths.
  *
  * Why a custom Expression (same story as [[IvfNearest]]): composed
  * from built-ins this is tables·planes (e.g. 32) inlined dot-product
  * loops against literal ±1 plane arrays in ONE whole-stage-codegen
  * method — past the JIT bytecode ceiling the stage runs interpreted
  * and key generation dominates the scan. Codegen here emits a single
  * call into this compiled helper.
  *
  * Numerics are bit-identical to the built-in composition it replaces
  * (and therefore to the DuckDB oracle's baked plane constants): per
  * plane, the same strict sequential left-to-right fold as
  * [[DotProduct]] (null elements contribute 0), sign bit set iff
  * `proj >= 0` — a null vector yields 0 for every plane term exactly
  * like the `when(...).otherwise(0)` sum it replaces, and NaN
  * projections set no bit (`NaN >= 0` is false on both paths).
  *
  * `signs` is indexed `[table * planes + p][dim]` and is built by the
  * caller from the deterministic md5-parity plane family.
  */
case class LshBuckets(vec: Expression, tables: Int, planes: Int,
                      signs: Array[Array[Double]])
    extends UnaryExpression {

  require(tables >= 1 && planes >= 1 && planes <= 62,
    "need 1..62 planes and at least one table")
  require(signs.length == tables * planes,
    s"signs must have tables*planes rows, got ${signs.length}")

  override def child: Expression = vec

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_buckets expects array<double>, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): Any =
    LshBuckets.buckets(vec.eval(input).asInstanceOf[ArrayData],
                       tables, planes, signs)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val vEval = vec.genCode(ctx)
    val signsRef = ctx.addReferenceObj("signs", signs, "double[][]")
    val helper = "graft.functions.LshBuckets$.MODULE$"
    ev.copy(
      code = vEval.code +
        code"""
           |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
           |  $helper.buckets(
           |    ${vEval.isNull} ? null : ${vEval.value},
           |    $tables, $planes, $signsRef);
           |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(vec = newChild)

  override def prettyName: String = "graft_lsh_buckets"
}

object LshBuckets {

  /** Bucket id per table; null vec → every projection term is 0. */
  def buckets(vec: ArrayData, tables: Int, planes: Int,
              signs: Array[Array[Double]]): ArrayData = {
    val out = new Array[Long](tables)
    if (vec != null) {
      val n = vec.numElements()
      var t = 0
      while (t < tables) {
        var bucket = 0L
        var p = 0
        while (p < planes) {
          val s = signs(t * planes + p)
          val m = math.min(n, s.length)
          var d = 0.0
          var j = 0
          while (j < m) {
            if (!vec.isNullAt(j)) d += vec.getDouble(j) * s(j)
            j += 1
          }
          if (d >= 0) bucket += (1L << p)
          p += 1
        }
        out(t) = bucket
        t += 1
      }
    }
    new GenericArrayData(out)
  }

  /** Column wrapper over the deterministic md5-parity plane family
    * `planeSigns` (built by the caller so both engines share it).
    */
  def forPlanes(vec: Column, tables: Int, planes: Int,
                signs: Array[Array[Double]]): Column =
    GraftColumnBridge.column(LshBuckets(
      GraftColumnBridge.expression(vec), tables, planes, signs))
}
