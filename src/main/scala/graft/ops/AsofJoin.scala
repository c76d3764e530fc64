package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for every left row, the single right row with
  * the greatest `rightTime <= leftTime` within the same key (the
  * standard time-series enrichment: "the latest completed rollup /
  * quote / state as of this event").
  *
  * Spark has no as-of operator. Per the build preference (compose
  * built-ins before custom plans), this is the union + window
  * composition: tag both sides, sort per key by (time, side) with
  * right rows first on ties (inclusive semantics), and carry the most
  * recent right payload forward with `last(ignoreNulls)` — ONE shuffle
  * of |left| + |right| rows, no range-explosion join, no per-row
  * binary search. Left rows before any right row get nulls.
  *
  * Two variants:
  *  - [[backward]] — one window partitioned by key. Right for low-skew
  *    key domains; a Zipf-head key sorts its whole |left|+|right|
  *    stream in one task.
  *  - [[backwardBucketed]] — the skew-safe two-phase form: the raw-row
  *    window partitions by (key, coarse time bucket), so no task ever
  *    sorts more than one hot key's single bucket; a second window over
  *    the per-bucket TAILS (one row per (key, bucket) that has right
  *    rows — thousands of rows per key, not billions) carries the seed
  *    payload across buckets. Identical results (spec-pinned equal to
  *    [[backward]] and to DuckDB's native ASOF JOIN).
  *
  * Right-side contract (both variants): (key…, rightTime) should be
  * unique — with duplicate right rows at the same instant "the latest
  * right row" is ill-defined and which duplicate wins is not
  * deterministic (the usual right side is a rollup tier, unique by
  * construction).
  *
  * Scale shape (100 TB): the bucketed variant's heavy exchange
  * partitions by (key, bucket) — pick `bucketSeconds` near the tier
  * width so buckets hold thousands of rows; the carry window's stream
  * is |distinct (key, bucket)|, ~10⁶× smaller than the raw rows.
  */
object AsofJoin {

  /** Tagged union of both sides: right rows carry the payload struct
    * `_r`, left rows carry their full row as `_l`; `_side` sorts right
    * rows before left rows at equal time (inclusive `<=`).
    */
  private def unioned(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                      leftTime: String, rightTime: String)
      : (DataFrame, Seq[String], Seq[String]) = {
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
    (both, leftCols, payload)
  }

  private def project(df: DataFrame, asof: Column, leftCols: Seq[String],
                      payload: Seq[String]): DataFrame =
    df.withColumn("_asof", asof)
      .filter(col("_side") === 1)
      .select(leftCols.map(c => col(s"_l.$c").as(c)) ++
        payload.map(c => col(s"_asof.$c").as(c)): _*)

  /** `right`'s non-key, non-time columns are appended to `left`
    * (null when no right row is at or before the left row's time).
    * One window partitioned by key — use [[backwardBucketed]] for
    * skewed key domains.
    */
  def backward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTime: String, rightTime: String): DataFrame = {
    val (both, leftCols, payload) =
      unioned(left, right, keyCols, leftTime, rightTime)
    // right rows sort BEFORE left rows at equal time → inclusive (<=)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    project(both, last(col("_r"), ignoreNulls = true).over(w),
            leftCols, payload)
  }

  /** Forward as-of join: for every left row, the single right row with
    * the SMALLEST `rightTime >= leftTime` per key (inclusive) — "the
    * next completed rollup / correction after this event". Same
    * one-window composition as [[backward]] with time order reversed.
    */
  def forward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
              leftTime: String, rightTime: String): DataFrame = {
    val (both, leftCols, payload) =
      unioned(left, right, keyCols, leftTime, rightTime)
    // descending time; right rows still first at equal time → inclusive
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t").desc, col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    project(both, last(col("_r"), ignoreNulls = true).over(w),
            leftCols, payload)
  }

  /** Skew-safe two-phase form of [[backward]]: identical results, but
    * the raw-row window partitions by (key, `bucketSeconds` bucket) and
    * only the per-bucket tails flow through the per-key carry window —
    * a hot key costs max(bucket) rows per task, never its whole stream.
    */
  def backwardBucketed(left: DataFrame, right: DataFrame,
                       keyCols: Seq[String], leftTime: String,
                       rightTime: String, bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucket width must be positive")
    val (both0, leftCols, payload) =
      unioned(left, right, keyCols, leftTime, rightTime)
    val both = both0.withColumn("_bkt",
      col("_t") - pmod(col("_t"), lit(bucketSeconds)))
    val keys = keyCols.map(col)

    // Phase 1: within-bucket as-of — the heavy window, partitioned by
    // (key, bucket) so skew is bounded by bucket width, not key weight.
    val w1 = Window.partitionBy(keys :+ col("_bkt"): _*)
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = both.withColumn("_local",
      last(col("_r"), ignoreNulls = true).over(w1))

    // Phase 2: per-bucket tails (latest right payload per (key, bucket)
    // that has right rows) + the buckets left rows live in, carried per
    // key over the TINY bucket stream. At equal bucket, the left-bucket
    // marker (_ms=0) sorts before the tail (_ms=1): a bucket's own tail
    // must not seed its own left rows (their in-bucket rights are
    // already in _local; later-in-bucket rights must not apply).
    val tails = both.filter(col("_side") === 0)
      .groupBy(keys :+ col("_bkt"): _*)
      .agg(max_by(col("_r"), col("_t")).as("_tail"))
      .withColumn("_ms", lit(1))
    val marks = both.filter(col("_side") === 1)
      .select(keys :+ col("_bkt"): _*).distinct()
      .withColumn("_tail", lit(null).cast(tails.schema("_tail").dataType))
      .withColumn("_ms", lit(0))
    val w2 = Window.partitionBy(keys: _*)
      .orderBy(col("_bkt"), col("_ms"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val seeds = tails.unionByName(marks)
      .withColumn("_seed", last(col("_tail"), ignoreNulls = true).over(w2))
      .filter(col("_ms") === 0)
      .select(keys :+ col("_bkt") :+ col("_seed"): _*)

    // left rows with no in-bucket match take the carried seed
    val joined = local.join(seeds, keyCols :+ "_bkt", "left")
    project(joined, coalesce(col("_local"), col("_seed")),
            leftCols, payload)
  }
}
