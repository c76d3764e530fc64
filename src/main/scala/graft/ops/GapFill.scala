package graft.ops

import graft.core.{Flag, TierSpec}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Gap-fill over the fixed (series × bucket) grid + forward-fill.
  *
  * Mirrors the reference's fixed-interval VPTS grid: every profile
  * carries the complete 25-level ladder regardless of which levels have
  * data (/root/reference/tests/test_vpts.py:141-146), with missing bins
  * appearing as explicit rows flagged `gap=TRUE` and nodata measures
  * (/root/reference/src/vptstools/vpts_csv.py:276; visible in the golden
  * file /root/reference/tests/data/inventory/nosta_vpts_20230311.csv:2-5).
  * Here the ladder is the tumbling-bucket grid, in two range flavors:
  *
  *  - [[dense]] — GLOBAL range: every series carries the full
  *    [min, max] bucket range of the whole table (the strict VPTS-grid
  *    analog: one shared ladder).
  *  - [[denseBySeries]] — PER-SERIES range: each series carries only its
  *    own [first, last] observed range. **This is the 100 TB default**:
  *    with 10⁶ staggered-lifetime series × a year of 5m buckets, the
  *    global grid is a 10¹¹-row dense frame that is mostly leading/
  *    trailing gaps for series not yet alive; the per-series grid is
  *    proportional to actual series lifetimes.
  *
  * Plan shape (both flavors, scale-first): ONE window exchange on the
  * series key (lag/lead neighbor buckets) + ONE generator — each
  * observed row emits itself plus the gap buckets since its
  * predecessor (the last row also emits the trailing gaps, global
  * flavor only). The input is referenced once; output size equals the
  * dense frame, so no intermediate ever exceeds the result. No
  * crossJoin, no self-join, no persist — the global flavor adds only a
  * broadcast of a 1-row global-bounds aggregate.
  */
object GapFill {

  /** Dense GLOBAL-range grid with null-marker rows. Input: a [[Rollup]]
    * tier output with columns (series…, bucket_epoch, n, …). Output adds
    * `is_gap: boolean` and `flag: byte` (OK | NODATA). Prefer
    * [[denseBySeries]] at scale (see class doc).
    */
  def dense(rollup: DataFrame, tier: TierSpec,
            seriesCol: String = "domain"): DataFrame =
    denseImpl(rollup, tier, Seq(seriesCol), global = true)

  /** Multi-column series key (e.g. the production (domain, url_bucket)
    * key at 100 TB) — same single-window-plus-generator plan, with the
    * window and grid keyed on the composite.
    */
  def dense(rollup: DataFrame, tier: TierSpec,
            seriesCols: Seq[String]): DataFrame =
    denseImpl(rollup, tier, seriesCols, global = true)

  /** Dense PER-SERIES-range grid: each series' ladder spans its own
    * [first, last] observed bucket — the scale-safe default.
    */
  def denseBySeries(rollup: DataFrame, tier: TierSpec,
                    seriesCol: String = "domain"): DataFrame =
    denseImpl(rollup, tier, Seq(seriesCol), global = false)

  /** Per-series grid over a multi-column series key. */
  def denseBySeries(rollup: DataFrame, tier: TierSpec,
                    seriesCols: Seq[String]): DataFrame =
    denseImpl(rollup, tier, seriesCols, global = false)

  private def denseImpl(rollup: DataFrame, tier: TierSpec,
                        seriesCols: Seq[String], global: Boolean): DataFrame = {
    val step = tier.seconds
    val measures = rollup.columns.toSeq
      .filterNot(c => seriesCols.contains(c) || c == "bucket_epoch")
    val w = Window.partitionBy(seriesCols.map(col): _*).orderBy("bucket_epoch")
    val nbrs = rollup
      .withColumn("_prev", lag(col("bucket_epoch"), 1).over(w))
      .withColumn("_last", lead(col("bucket_epoch"), 1).over(w).isNull)
    // grid bounds: global = one broadcast 1-row aggregate; per-series =
    // the row's own neighborhood (first row starts at itself, last row
    // emits no trailing gaps)
    val bounded =
      if (global)
        nbrs.crossJoin(broadcast(rollup.agg(
          min("bucket_epoch").as("_gmn"), max("bucket_epoch").as("_gmx"))))
      else nbrs.withColumn("_gmn", col("bucket_epoch"))
               .withColumn("_gmx", col("bucket_epoch"))
    // buckets this observed row is responsible for: the gaps since its
    // predecessor (or the grid start), itself, and — for the last row —
    // the trailing gaps to the grid end
    val upTo = sequence(coalesce(col("_prev") + step, col("_gmn")),
                        col("bucket_epoch"), lit(step))
    val trailing = when(col("_last") && col("_gmx") > col("bucket_epoch"),
        sequence(col("bucket_epoch") + step, col("_gmx"), lit(step)))
      .otherwise(lit(Array.empty[Long]).cast(ArrayType(LongType)))
    val exploded = bounded
      .withColumn("_bk", explode(concat(upTo, trailing)))
      .withColumn("is_gap", col("_bk") =!= col("bucket_epoch"))
    exploded.select(
      (seriesCols.map(col) ++ (col("_bk").as("bucket_epoch") +:
        measures.map(c => when(!col("is_gap"), col(c)).as(c)))) :+
        col("is_gap") :+
        when(col("is_gap"), lit(Flag.NODATA)).otherwise(lit(Flag.OK))
          .as("flag"): _*)
  }

  /** Forward-fill the gap-filled frame: carry the last observed value
    * per series; `filled=true` marks carried rows. Leading gaps (before
    * the first observation of a series) stay null.
    */
  def forwardFill(denseDf: DataFrame, valueCol: String = "sum_value_micros",
                  seriesCol: String = "domain"): DataFrame =
    forwardFill(denseDf, valueCol, Seq(seriesCol))

  /** Forward-fill over a multi-column series key. */
  def forwardFill(denseDf: DataFrame, valueCol: String,
                  seriesCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(seriesCols.map(col): _*).orderBy("bucket_epoch")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    denseDf
      .withColumn("ffill_value", last(col(valueCol), ignoreNulls = true).over(w))
      .withColumn("filled", col("is_gap") && col("ffill_value").isNotNull)
  }

  /** Linear interpolation across gaps: each gap row takes
    * `prev + floor((next − prev) · (t − pt) / (nt − pt))` from its
    * nearest observed neighbors per series; leading/trailing gaps (no
    * neighbor on one side) stay null; observed rows keep their value.
    * One exchange + one sort feed both neighbor windows. The ratio is
    * evaluated in IEEE double on both engines in the same operation
    * order (exact while |next−prev|·gap < 2^53 — micros × tier widths
    * stay far below that).
    */
  def interpolate(denseDf: DataFrame, valueCol: String = "sum_value_micros",
                  seriesCol: String = "domain"): DataFrame =
    interpolate(denseDf, valueCol, Seq(seriesCol))

  /** Interpolation over a multi-column series key. */
  def interpolate(denseDf: DataFrame, valueCol: String,
                  seriesCols: Seq[String]): DataFrame = {
    val obs = when(!col("is_gap"), col(valueCol))
    val obsT = when(!col("is_gap"), col("bucket_epoch"))
    val wPrev = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy("bucket_epoch")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy("bucket_epoch")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val withNbrs = denseDf
      .withColumn("_pv", last(obs, ignoreNulls = true).over(wPrev))
      .withColumn("_pt", last(obsT, ignoreNulls = true).over(wPrev))
      .withColumn("_nv", first(obs, ignoreNulls = true).over(wNext))
      .withColumn("_nt", first(obsT, ignoreNulls = true).over(wNext))
    withNbrs
      .withColumn("interp_value",
        when(!col("is_gap"), col(valueCol))
          .otherwise(col("_pv") + floor(
            (col("_nv") - col("_pv")).cast("double")
              * (col("bucket_epoch") - col("_pt"))
              / (col("_nt") - col("_pt"))).cast("long")))
      .drop("_pv", "_pt", "_nv", "_nt")
  }

  /** DuckDB oracle for [[dense]]∘[[interpolate]] at one tier (the
    * columns the `ts_interp_*` query returns).
    */
  def interpOracleSql(tier: TierSpec): String =
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
       |  SELECT sk.domain, grid.bucket_epoch, obs.sum_value_micros AS v,
       |         (obs.n IS NULL) AS is_gap
       |  FROM sk CROSS JOIN grid
       |  LEFT JOIN obs ON obs.domain = sk.domain AND obs.bucket_epoch = grid.bucket_epoch
       |),
       |nbrs AS (
       |  SELECT domain, bucket_epoch, v, is_gap,
       |         last_value(v IGNORE NULLS) OVER (
       |           PARTITION BY domain ORDER BY bucket_epoch
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
       |         last_value(CASE WHEN NOT is_gap THEN bucket_epoch END IGNORE NULLS) OVER (
       |           PARTITION BY domain ORDER BY bucket_epoch
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
       |         first_value(v IGNORE NULLS) OVER (
       |           PARTITION BY domain ORDER BY bucket_epoch
       |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
       |         first_value(CASE WHEN NOT is_gap THEN bucket_epoch END IGNORE NULLS) OVER (
       |           PARTITION BY domain ORDER BY bucket_epoch
       |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
       |  FROM dense
       |)
       |SELECT domain, bucket_epoch, is_gap,
       |       CAST(CASE WHEN NOT is_gap THEN v
       |                 ELSE pv + CAST(floor(CAST(nv - pv AS DOUBLE)
       |                                * (bucket_epoch - pt) / (nt - pt)) AS BIGINT)
       |            END AS BIGINT) AS interp_value
       |FROM nbrs""".stripMargin

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

  /** DuckDB oracle for [[denseBySeries]]: the grid is generated from
    * each series' own [min, max] observed bucket.
    */
  def denseBySeriesOracleSql(tier: TierSpec): String =
    s"""${graft.ingest.WebPages.oracleCte},
       |obs AS (
       |  SELECT domain,
       |         warc_epoch - (warc_epoch % ${tier.seconds}) AS bucket_epoch,
       |         ${Rollup.oracleMeasures}
       |  FROM webpages GROUP BY 1, 2
       |),
       |grid AS (SELECT domain,
       |                CAST(unnest(generate_series(mn, mx, ${tier.seconds})) AS BIGINT) AS bucket_epoch
       |         FROM (SELECT domain, min(bucket_epoch) mn, max(bucket_epoch) mx
       |               FROM obs GROUP BY domain))
       |SELECT grid.domain, grid.bucket_epoch,
       |       obs.n, obs.sum_chars, obs.sum_value_micros,
       |       obs.min_value_micros, obs.max_value_micros,
       |       (obs.n IS NULL) AS is_gap,
       |       CAST(CASE WHEN obs.n IS NULL THEN ${Flag.NODATA} ELSE ${Flag.OK} END AS TINYINT) AS flag
       |FROM grid
       |LEFT JOIN obs ON obs.domain = grid.domain AND obs.bucket_epoch = grid.bucket_epoch""".stripMargin

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
