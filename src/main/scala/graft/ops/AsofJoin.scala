package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for every left row, the single right row with
  * the greatest `rightTime <= leftTime` within the same key (the
  * standard time-series enrichment: "the latest completed rollup /
  * quote / state as of this event").
  *
  * Spark has no as-of operator. Per the build preference (compose
  * built-ins before custom plans), this is the union + one-window
  * composition: tag both sides, sort per key by (time, side) with
  * right rows first on ties (inclusive semantics), and carry the most
  * recent right payload forward with `last(ignoreNulls)` — ONE shuffle
  * of |left| + |right| rows, no range-explosion join, no per-row
  * binary search. Left rows before any right row get nulls.
  *
  * Scale shape (100 TB): the window exchange partitions by key — the
  * same hash layout the tier tables already cluster by, so at scale
  * the sort is partition-local; a naive `leftTime >= rightTime` range
  * join would be a quadratic-per-key non-equi join instead.
  */
object AsofJoin {

  /** `right`'s non-key, non-time columns are appended to `left`
    * (null when no right row is at or before the left row's time).
    */
  def backward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTime: String, rightTime: String): DataFrame = {
    val payload = right.columns.filterNot(c =>
      keyCols.contains(c) || c == rightTime).toSeq
    require(payload.nonEmpty, "right side needs at least one payload column")
    val leftCols = left.columns.toSeq
    require(!payload.exists(leftCols.contains),
      s"payload/left column collision: ${payload.intersect(leftCols).mkString(",")}")

    val r = right.select(
      (keyCols.map(col) :+ col(rightTime).as("_t")) :+
        struct(payload.map(col): _*).as("_r") :+ lit(0).as("_side"): _*)
    val l = left.select(
      (keyCols.map(col) :+ col(leftTime).as("_t")) :+
        lit(null).cast(r.schema("_r").dataType).as("_r") :+
        lit(1).as("_side") :+ struct(leftCols.map(col): _*).as("_l"): _*)
    val both = r.withColumn("_l", lit(null).cast(l.schema("_l").dataType))
      .unionByName(l)

    // right rows sort BEFORE left rows at equal time → inclusive (<=)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    both
      .withColumn("_asof", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(c => col(s"_l.$c").as(c)) ++
        payload.map(c => col(s"_asof.$c").as(c)): _*)
  }
}
