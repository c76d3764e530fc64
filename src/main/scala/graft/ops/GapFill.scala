package graft.ops

import graft.core.{Flag, TierSpec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-fill over the fixed (series × bucket) grid + forward-fill.
  *
  * Mirrors the reference's fixed-interval VPTS grid: every profile
  * carries the complete 25-level ladder regardless of which levels have
  * data (/root/reference/tests/test_vpts.py:141-146), with missing bins
  * appearing as explicit rows flagged `gap=TRUE` and nodata measures
  * (/root/reference/src/vptstools/vpts_csv.py:276; visible in the golden
  * file /root/reference/tests/data/inventory/nosta_vpts_20230311.csv:2-5).
  * Here the ladder is the tumbling-bucket grid: for every series the
  * full [minBucket, maxBucket] range is materialized; buckets with no
  * observation become null-marker rows (`flag=NODATA`, `is_gap=true`).
  *
  * Plan shape (scale-first):
  *  - the grid is a single `sequence()` of bucket starts (global range
  *    — e.g. one year of 5m buckets ≈ 105k rows) — *broadcast* to the
  *    distinct-series side, so the dense frame is built without
  *    shuffling the big side twice;
  *  - the observed rollup joins the dense frame on (series, bucket) —
  *    a hash join whose build side is the dense keys only;
  *  - forward-fill is one window (`last(..., ignoreNulls)`) partitioned
  *    by series, ordered by bucket — a single sort per series partition,
  *    range-partitioned by Spark's window exchange.
  */
object GapFill {

  /** Dense grid with null-marker rows. Input: a [[Rollup]] tier output
    * with columns (series…, bucket_epoch, n, …). Output adds
    * `is_gap: boolean` and `flag: byte` (OK | NODATA).
    */
  def dense(rollup: DataFrame, tier: TierSpec,
            seriesCol: String = "domain"): DataFrame = {
    val bounds = rollup.agg(
      min("bucket_epoch").as("mn"), max("bucket_epoch").as("mx"))
    val grid = bounds.select(
      explode(sequence(col("mn"), col("mx"), lit(tier.seconds)))
        .as("bucket_epoch"))
    val series = rollup.select(seriesCol).distinct()
    series
      .crossJoin(broadcast(grid))
      .join(rollup, Seq(seriesCol, "bucket_epoch"), "left")
      .withColumn("is_gap", col("n").isNull)
      .withColumn("flag",
        when(col("n").isNull, lit(Flag.NODATA)).otherwise(lit(Flag.OK)))
  }

  /** Forward-fill the gap-filled frame: carry the last observed value
    * per series; `filled=true` marks carried rows. Leading gaps (before
    * the first observation of a series) stay null.
    */
  def forwardFill(denseDf: DataFrame, valueCol: String = "sum_value_micros",
                  seriesCol: String = "domain"): DataFrame = {
    val w = Window.partitionBy(seriesCol).orderBy("bucket_epoch")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    denseDf
      .withColumn("ffill_value", last(col(valueCol), ignoreNulls = true).over(w))
      .withColumn("filled", col("is_gap") && col("ffill_value").isNotNull)
  }

  /** DuckDB oracle for [[dense]] over the webpages CTE at one tier. */
  def denseOracleSql(tier: TierSpec): String =
    s"""${graft.ingest.WebPages.oracleCte},
       |obs AS (
       |  SELECT domain,
       |         warc_epoch - (warc_epoch % ${tier.seconds}) AS bucket_epoch,
       |         ${Rollup.oracleMeasures}
       |  FROM webpages GROUP BY 1, 2
       |),
       |grid AS (SELECT CAST(unnest(generate_series(mn, mx, ${tier.seconds})) AS BIGINT) AS bucket_epoch
       |         FROM (SELECT min(bucket_epoch) mn, max(bucket_epoch) mx FROM obs)),
       |sk AS (SELECT DISTINCT domain FROM obs)
       |SELECT sk.domain, grid.bucket_epoch,
       |       obs.n, obs.sum_chars, obs.sum_value_micros,
       |       obs.min_value_micros, obs.max_value_micros,
       |       (obs.n IS NULL) AS is_gap,
       |       CAST(CASE WHEN obs.n IS NULL THEN ${Flag.NODATA} ELSE ${Flag.OK} END AS TINYINT) AS flag
       |FROM sk CROSS JOIN grid
       |LEFT JOIN obs ON obs.domain = sk.domain AND obs.bucket_epoch = grid.bucket_epoch""".stripMargin

  /** DuckDB oracle for [[dense]]∘[[forwardFill]], projecting the filled
    * value stream (the columns the `ts_ffill_*` query returns).
    */
  def ffillOracleSql(tier: TierSpec): String =
    s"""${graft.ingest.WebPages.oracleCte},
       |obs AS (
       |  SELECT domain,
       |         warc_epoch - (warc_epoch % ${tier.seconds}) AS bucket_epoch,
       |         ${Rollup.oracleMeasures}
       |  FROM webpages GROUP BY 1, 2
       |),
       |grid AS (SELECT CAST(unnest(generate_series(mn, mx, ${tier.seconds})) AS BIGINT) AS bucket_epoch
       |         FROM (SELECT min(bucket_epoch) mn, max(bucket_epoch) mx FROM obs)),
       |sk AS (SELECT DISTINCT domain FROM obs),
       |dense AS (
       |  SELECT sk.domain, grid.bucket_epoch, obs.n, obs.sum_value_micros,
       |         (obs.n IS NULL) AS is_gap
       |  FROM sk CROSS JOIN grid
       |  LEFT JOIN obs ON obs.domain = sk.domain AND obs.bucket_epoch = grid.bucket_epoch
       |)
       |SELECT domain, bucket_epoch, is_gap,
       |       last_value(sum_value_micros IGNORE NULLS) OVER (
       |         PARTITION BY domain ORDER BY bucket_epoch
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill_value
       |FROM dense""".stripMargin
}
