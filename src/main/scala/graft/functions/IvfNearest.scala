package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Top-`nprobe` centroid ids of a vector against a CONSTANT codebook,
  * in `(cscore DESC, cent_id ASC)` order — the in-row coarse-quantizer
  * kernel of the IVF paths.
  *
  * Why a custom Expression (the [[DotProduct]] justification, one level
  * up): composed from built-ins this is 16 inlined dot-product loops
  * plus struct/array construction in ONE whole-stage-codegen method —
  * past the JIT's ~8 KB bytecode ceiling the stage runs as interpreted
  * bytecode and the scan-speed kernel became the dominant cost
  * (measured ~20-60 µs/row). Here codegen emits a single CALL into this
  * compiled helper, so the generated method stays tiny and the loop
  * itself is scalac-compiled and JIT-hot.
  *
  * Numerics are bit-identical to the built-in composition it replaces
  * (and to the DuckDB oracle): per centroid,
  * `floor(dot(vec, centv) / (nrm * centn) * 1e9)` with the same strict
  * sequential left-to-right fold as [[DotProduct]], centroid norms
  * precomputed ONCE with the same fold (matching the constant-folded
  * `SQRT(graft_dot(lit, lit))`). Null vec / null nrm rank after every
  * real score (the window ordering's DESC NULLS LAST); ties break to
  * the smallest cent_id (the `row_number` tie-break). A NaN/±Inf score
  * (zero-norm vector — impossible for real embeddings; the round-5
  * ANSI cast would have errored) also ranks last instead of erroring.
  */
case class IvfNearest(vec: Expression, nrm: Expression,
                      centIds: Array[Long], centVecs: Array[Array[Double]],
                      nprobe: Int)
    extends BinaryExpression {

  require(centIds.length == centVecs.length && centIds.nonEmpty,
    "codebook must be non-empty with one id per vector")
  require(centIds.zip(centIds.tail).forall { case (a, b) => a < b },
    "codebook must be sorted by cent_id (the tie-break order)")
  require(nprobe >= 1, "nprobe must be positive")

  override def left: Expression = vec
  override def right: Expression = nrm

  // centroid norms: same sequential fold the constant-folded
  // SQRT(graft_dot(lit, lit)) evaluated
  private val centNorms: Array[Double] = centVecs.map { cv =>
    var s = 0.0
    var i = 0
    while (i < cv.length) { s += cv(i) * cv(i); i += 1 }
    math.sqrt(s)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = vec.dataType match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    }
    if (vecOk && nrm.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_ivf_nearest expects (array<double>, double), got " +
        s"(${vec.dataType.catalogString}, ${nrm.dataType.catalogString})")
  }

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    val n = nrm.eval(input)
    IvfNearest.top(v.asInstanceOf[ArrayData],
      n == null, if (n == null) 0.0 else n.asInstanceOf[Double],
      centIds, centVecs, centNorms, nprobe)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val vEval = vec.genCode(ctx)
    val nEval = nrm.genCode(ctx)
    val idsRef = ctx.addReferenceObj("centIds", centIds, "long[]")
    val vecsRef = ctx.addReferenceObj("centVecs", centVecs, "double[][]")
    val normsRef = ctx.addReferenceObj("centNorms", centNorms, "double[]")
    val helper = "graft.functions.IvfNearest$.MODULE$"
    ev.copy(
      code = vEval.code + nEval.code +
        code"""
           |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
           |  $helper.top(
           |    ${vEval.isNull} ? null : ${vEval.value},
           |    ${nEval.isNull}, ${nEval.isNull} ? 0.0 : ${nEval.value},
           |    $idsRef, $vecsRef, $normsRef, $nprobe);
           |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, nrm = newRight)

  override def prettyName: String = "graft_ivf_nearest"
}

object IvfNearest {

  /** Ranks below every real cscore (|cscore| ≤ ~2^31): DESC NULLS LAST. */
  private final val Sentinel = -Long.MaxValue

  /** Top-`nprobe` cent ids by (score DESC, cent_id ASC); `ids` must be
    * ascending so the strict-greater scan keeps the smallest id on ties.
    */
  def top(vec: ArrayData, nrmIsNull: Boolean, nrm: Double,
          ids: Array[Long], vecs: Array[Array[Double]],
          norms: Array[Double], nprobe: Int): ArrayData = {
    val n = ids.length
    val scores = new Array[Long](n)
    if (vec == null || nrmIsNull) {
      java.util.Arrays.fill(scores, Sentinel)
    } else {
      var i = 0
      while (i < n) {
        val cv = vecs(i)
        val m = math.min(vec.numElements(), cv.length)
        var d = 0.0
        var j = 0
        while (j < m) {
          if (!vec.isNullAt(j)) d += vec.getDouble(j) * cv(j)
          j += 1
        }
        val c = math.floor(d / (nrm * norms(i)) * 1e9)
        scores(i) = if (java.lang.Double.isNaN(c) ||
                        java.lang.Double.isInfinite(c)) Sentinel
                    else c.toLong
        i += 1
      }
    }
    val k = math.min(nprobe, n)
    val out = new Array[Long](k)
    val taken = new Array[Boolean](n)
    var r = 0
    while (r < k) {
      var best = -1
      var bestScore = Long.MinValue
      var i = 0
      while (i < n) {
        // strictly greater keeps the earliest (smallest) cent_id on ties
        if (!taken(i) && (best < 0 || scores(i) > bestScore)) {
          best = i; bestScore = scores(i)
        }
        i += 1
      }
      taken(best) = true
      out(r) = ids(best)
      r += 1
    }
    new GenericArrayData(out)
  }

  /** Column wrapper: top-`nprobe` cent ids for (vec, nrm). */
  def topCents(vec: Column, nrm: Column, cents: Seq[(Long, Array[Double])],
               nprobe: Int): Column = {
    val sorted = cents.sortBy(_._1)
    GraftColumnBridge.column(IvfNearest(
      GraftColumnBridge.expression(vec), GraftColumnBridge.expression(nrm),
      sorted.map(_._1).toArray, sorted.map(_._2).toArray, nprobe))
  }
}
