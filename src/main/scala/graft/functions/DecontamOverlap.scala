package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document benchmark-containment scores against a CONSTANT bench
  * shingle index, in-row: `array<struct<bench_id, overlap_milli>>` of
  * every bench doc whose containment `1000·|C ∩ B| / |B|` meets the
  * threshold, ascending by bench_id.
  *
  * Why a custom Expression (the [[IvfNearest]] justification): the
  * bench side of decontamination is SMALL by the operator's standing
  * contract — it was already collected by the driver to build a
  * broadcast hash relation. Holding the same data as a shingle →
  * posting-list index inside the expression lets the corpus side score
  * at scan speed, so the corpus is never exploded into shingle rows at
  * all and no (corpus × bench) pair stream ever crosses an exchange —
  * the decision is made on in-row metadata (guide §8: shuffle keys and
  * metadata, not payloads; here nothing needs to shuffle at all).
  *
  * Semantics are identical to the explode/join/aggregate composition
  * it replaces: the shingle set is [[WordShingles.shingleStrings]] (the
  * single source of truth for both sides), `_inter` counts DISTINCT
  * corpus shingles present in the bench doc's distinct set, and
  * `overlap_milli = (_inter * 1000) DIV |B|` (both positive, so Java
  * long division ≡ the oracle's floor `//`). Null corpus text → null
  * (the explode drops the row, exactly as the old shingle explode
  * produced no rows); a doc with no qualifying bench doc → empty array
  * (explode drops it, like a join with no surviving pair).
  */
case class DecontamOverlap(text: Expression, k: Int,
                           benchIds: Array[Long],
                           postings: java.util.HashMap[String, Array[Int]],
                           benchSizes: Array[Long],
                           thresholdMilli: Long)
    extends UnaryExpression {

  require(k >= 1, "shingle width must be positive")
  require(benchIds.length == benchSizes.length,
    "one shingle-set size per bench doc")
  require(benchIds.zip(benchIds.tail).forall { case (a, b) => a < b },
    "bench ids must be sorted ascending (the emission order)")

  override def child: Expression = text

  override def dataType: DataType = DecontamOverlap.OutType

  override def checkInputDataTypes(): TypeCheckResult = text.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_decontam_overlap expects string, got ${other.catalogString}")
  }

  override def nullSafeEval(t: Any): Any =
    DecontamOverlap.score(t.asInstanceOf[UTF8String], k, benchIds,
      postings, benchSizes, thresholdMilli)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("benchIds", benchIds, "long[]")
    val postRef = ctx.addReferenceObj("postings", postings,
      "java.util.HashMap")
    val bszRef = ctx.addReferenceObj("benchSizes", benchSizes, "long[]")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.DecontamOverlap$$.MODULE$$" +
        s".score($t, $k, $idsRef, $postRef, $bszRef, ${thresholdMilli}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(text = newChild)

  override def prettyName: String = "graft_decontam_overlap"
}

object DecontamOverlap {

  /** Nullable fields on purpose: the exploded columns keep the same
    * nullable schema the join/aggregate composition produced.
    */
  private[functions] val OutType: DataType = ArrayType(
    StructType(Seq(
      StructField("bench_id", LongType, nullable = true),
      StructField("overlap_milli", LongType, nullable = true))),
    containsNull = true)

  def score(text: UTF8String, k: Int, benchIds: Array[Long],
            postings: java.util.HashMap[String, Array[Int]],
            benchSizes: Array[Long], thresholdMilli: Long): ArrayData = {
    val shingles = WordShingles.shingleStrings(text, k)
    val counts = new Array[Int](benchIds.length)
    val it = shingles.iterator()
    while (it.hasNext) {
      val post = postings.get(it.next())
      if (post != null) {
        var i = 0
        while (i < post.length) { counts(post(i)) += 1; i += 1 }
      }
    }
    var n = 0
    var i = 0
    while (i < counts.length) {
      if (counts(i) > 0 &&
          counts(i).toLong * 1000L / benchSizes(i) >= thresholdMilli) n += 1
      i += 1
    }
    val out = new Array[AnyRef](n)
    var o = 0
    i = 0
    while (i < counts.length) {
      if (counts(i) > 0) {
        val om = counts(i).toLong * 1000L / benchSizes(i)
        if (om >= thresholdMilli) {
          out(o) = new GenericInternalRow(
            Array[Any](benchIds(i), om)): InternalRow
          o += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Builds the bench index from driver-side (bench_id, text) rows —
    * the same size class the broadcast join already collected — and
    * returns the scoring column. Null-text bench docs are skipped
    * (they had no shingle rows, so nothing could ever match them).
    */
  def of(corpusText: Column, k: Int, bench: Seq[(Long, String)],
         thresholdMilli: Long): Column = {
    val live = bench.filter(_._2 != null).sortBy(_._1)
    val ids = live.map(_._1).toArray
    val sizes = new Array[Long](ids.length)
    val postings = new java.util.HashMap[String, Array[Int]]()
    val tmp = new java.util.HashMap[String, java.util.ArrayList[Integer]]()
    for (((_, txt), idx) <- live.zipWithIndex) {
      val set = WordShingles.shingleStrings(UTF8String.fromString(txt), k)
      sizes(idx) = set.size.toLong
      val it = set.iterator()
      while (it.hasNext) {
        val s = it.next()
        var lst = tmp.get(s)
        if (lst == null) { lst = new java.util.ArrayList[Integer](); tmp.put(s, lst) }
        lst.add(idx)
      }
    }
    val tIt = tmp.entrySet().iterator()
    while (tIt.hasNext) {
      val e = tIt.next()
      val lst = e.getValue
      val arr = new Array[Int](lst.size())
      var i = 0
      while (i < arr.length) { arr(i) = lst.get(i); i += 1 }
      postings.put(e.getKey, arr)
    }
    GraftColumnBridge.column(DecontamOverlap(
      GraftColumnBridge.expression(corpusText), k, ids, postings, sizes,
      thresholdMilli))
  }
}
