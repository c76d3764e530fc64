package graft

import graft.core.TierSpec
import graft.ingest.WebPages
import graft.ops.{Decontaminate, Dedup, GapFill, Multimodal, Rollup, Sampling, Similarity, Sketches, TextStats}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central registry of driver-checkable queries: each entry pairs a
  * Spark implementation with (where SQL-expressible) a DuckDB oracle
  * over the same raw parquet tables. Column names/types are pinned to
  * match between both sides (the driver sorts columns by name and
  * hashes values).
  */
final case class QueryDef(
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Queries {

  /** All registered queries, in registration order. */
  def all: Seq[(String, QueryDef)] = timeseries ++ textOps ++ relationalOps

  // ---------------------------------------------------------------------
  // Time-series engine core (SURVEY.md §2.7-§2.9)
  // ---------------------------------------------------------------------

  private def pages(s: SparkSession, dir: String): DataFrame =
    WebPages.load(s, dir)

  private def tierQuery(tier: TierSpec): QueryDef = QueryDef(
    run = (s, dir) => {
      // Cascade: each tier computed from the finer tier, not from raw.
      val finest = Rollup.fromRaw(pages(s, dir), TierSpec.T5m)
      TierSpec.cascade.takeWhile(_.seconds <= tier.seconds).tail
        .foldLeft(finest)((finer, t) => Rollup.cascade(finer, t))
    },
    oracle = Some(Rollup.oracleSql(tier)))

  private def flaggedTierQuery(tier: TierSpec): QueryDef = QueryDef(
    run = (s, dir) => {
      val finest = Rollup.fromRawFlagged(pages(s, dir), TierSpec.T5m)
      TierSpec.cascade.takeWhile(_.seconds <= tier.seconds).tail
        .foldLeft(finest)((finer, t) => Rollup.cascadeFlagged(finer, t))
        .withColumn("bucket_flag", Rollup.bucketFlag)
    },
    oracle = Some(
      s"""${WebPages.oracleCte},
         |r AS (
         |  SELECT domain,
         |         warc_epoch - (warc_epoch % ${tier.seconds}) AS bucket_epoch,
         |         ${Rollup.flagOracleMeasures}
         |  FROM webpages GROUP BY 1, 2
         |)
         |SELECT r.*,
         |       CAST(CASE WHEN n_ok > 0 THEN 0
         |                 WHEN n_undetect > 0 THEN 2
         |                 ELSE 1 END AS INT) AS bucket_flag
         |FROM r""".stripMargin))

  def timeseries: Seq[(String, QueryDef)] = Seq(
    // Per-row invariant gate: text is extracted FROM the html binary on
    // the Spark side and must hash-match the raw document text.
    "wp_base" -> QueryDef(
      run = (s, dir) =>
        pages(s, dir).select(
          col("url"), col("domain"), col("warc_epoch"), col("lang"),
          col("n_chars"),
          md5(WebPages.extractText(col("html"))).as("text_md5")),
      oracle = Some(
        s"""${WebPages.oracleCte}
           |SELECT url, domain, warc_epoch, lang, n_chars,
           |       md5(text) AS text_md5
           |FROM webpages""".stripMargin)),

    "ts_rollup_5m"  -> tierQuery(TierSpec.T5m),
    "ts_rollup_1h"  -> tierQuery(TierSpec.T1h),
    "ts_rollup_1d"  -> tierQuery(TierSpec.T1d),
    "ts_rollup_30d" -> tierQuery(TierSpec.T30d),

    // Three-state missingness through the cascade: per-state counts +
    // OK-only value measures, merged 5m→1h (and →1d below); the bucket
    // flag is derived from the counts at any tier.
    "ts_rollup_flags_1h" -> flaggedTierQuery(TierSpec.T1h),
    "ts_rollup_flags_1d" -> flaggedTierQuery(TierSpec.T1d),

    // Mergeable HLL sketch tier: distinct urls per (series, 1d bucket),
    // cascaded by sketch-union from the 1h tier. The gate asserts the
    // approximation property (±5% of exact) — the sketch itself has no
    // cross-engine oracle.
    "ts_distinct_urls_1d" -> QueryDef(
      run = (s, dir) => {
        val p = pages(s, dir)
        val est = Sketches.estimated(
          Sketches.cascade(Sketches.fromRaw(p, TierSpec.T1h), TierSpec.T1d))
        val exact = p
          .groupBy(col("domain"), Rollup.bucket(col("warc_epoch"), TierSpec.T1d))
          .agg(countDistinct(col("url")).as("exact_distinct"))
        est.join(exact, Seq("domain", "bucket_epoch"))
          .select(col("domain"), col("bucket_epoch"), col("n"),
            (abs(col("distinct_est") - col("exact_distinct"))
              <= col("exact_distinct") * 0.05 + lit(1)).as("within_5pct"))
      },
      oracle = Some(
        s"""${WebPages.oracleCte}
           |SELECT domain,
           |       warc_epoch - (warc_epoch % 86400) AS bucket_epoch,
           |       CAST(count(*) AS BIGINT) AS n,
           |       TRUE AS within_5pct
           |FROM webpages GROUP BY 1, 2""".stripMargin)),

    // Same sketch property through TWO union levels (1h→1d→30d): the
    // 30d estimate from cascaded unions must match the direct sketch
    // of the raw data (compared via the exact count oracle ±5%).
    "ts_distinct_urls_30d" -> QueryDef(
      run = (s, dir) => {
        val p = pages(s, dir)
        val est = Sketches.estimated(
          Sketches.cascade(
            Sketches.cascade(Sketches.fromRaw(p, TierSpec.T1h), TierSpec.T1d),
            TierSpec.T30d))
        val exact = p
          .groupBy(col("domain"), Rollup.bucket(col("warc_epoch"), TierSpec.T30d))
          .agg(countDistinct(col("url")).as("exact_distinct"))
        est.join(exact, Seq("domain", "bucket_epoch"))
          .select(col("domain"), col("bucket_epoch"), col("n"),
            (abs(col("distinct_est") - col("exact_distinct"))
              <= col("exact_distinct") * 0.05 + lit(1)).as("within_5pct"))
      },
      oracle = Some(
        s"""${WebPages.oracleCte}
           |SELECT domain,
           |       warc_epoch - (warc_epoch % ${TierSpec.T30d.seconds}) AS bucket_epoch,
           |       CAST(count(*) AS BIGINT) AS n,
           |       TRUE AS within_5pct
           |FROM webpages GROUP BY 1, 2""".stripMargin)),

    // Mergeable QUANTILE sketch tier (KLL): per-bucket p50/p95 of the
    // value stream, cascaded 1h→1d by sketch-MERGE (not re-scan) — the
    // quantile analog of the HLL tier. Gate: the estimates are actual
    // bucket elements whose rank sits within a ±10% band of the target
    // (KLL k=200 rank error ≈1.7%; exact while buckets fit the buffer).
    "ts_quantile_1d" -> QueryDef(
      run = (s, dir) => {
        val p = pages(s, dir)
          .withColumn("value_micros", Rollup.micros(col("value")))
        val est = Sketches.quantEstimated(
          Sketches.quantCascade(
            Sketches.quantFromRaw(p, TierSpec.T1h), TierSpec.T1d))
        val raw = p.select(col("domain"),
          Rollup.bucket(col("warc_epoch"), TierSpec.T1d), col("value_micros"))
        def rankOk(r: org.apache.spark.sql.Column, q: Double) =
          r >= floor(col("n") * (q - 0.10)) - 1 &&
          r <= ceil(col("n") * (q + 0.10)) + 1
        raw.join(est, Seq("domain", "bucket_epoch"))
          .groupBy("domain", "bucket_epoch", "n", "p50", "p95")
          .agg(
            sum(when(col("value_micros") <= col("p50"), 1L).otherwise(0L)).as("r50"),
            sum(when(col("value_micros") <= col("p95"), 1L).otherwise(0L)).as("r95"),
            max(when(col("value_micros") === col("p50"), 1L).otherwise(0L)).as("e50"),
            max(when(col("value_micros") === col("p95"), 1L).otherwise(0L)).as("e95"))
          .select(col("domain"), col("bucket_epoch"), col("n"),
            rankOk(col("r50"), 0.5).as("p50_ok"),
            rankOk(col("r95"), 0.95).as("p95_ok"),
            (col("e50") === 1L && col("e95") === 1L).as("quantiles_are_elements"))
      },
      oracle = Some(
        s"""${WebPages.oracleCte}
           |SELECT domain,
           |       warc_epoch - (warc_epoch % ${TierSpec.T1d.seconds}) AS bucket_epoch,
           |       CAST(count(*) AS BIGINT) AS n,
           |       TRUE AS p50_ok, TRUE AS p95_ok,
           |       TRUE AS quantiles_are_elements
           |FROM webpages GROUP BY 1, 2""".stripMargin)),

    // Downsample: derived per-bucket mean in exact integer micros
    // (floor(sum/n) — order-insensitive, engine-identical).
    "ts_downsample_1h" -> QueryDef(
      run = (s, dir) => Rollup.cascade(
          Rollup.fromRaw(pages(s, dir), TierSpec.T5m), TierSpec.T1h)
        .select(col("domain"), col("bucket_epoch"), col("n"),
          floor(col("sum_value_micros") / col("n")).cast("long")
            .as("avg_value_micros")),
      oracle = Some(
        s"""${WebPages.oracleCte},
           |r AS (
           |  SELECT domain,
           |         warc_epoch - (warc_epoch % 3600) AS bucket_epoch,
           |         CAST(count(*) AS BIGINT) AS n,
           |         CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS s
           |  FROM webpages GROUP BY 1, 2
           |)
           |SELECT domain, bucket_epoch, n,
           |       CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT) AS avg_value_micros
           |FROM r""".stripMargin)),

    // Analytic window: per-series delta vs the previous observed bucket
    // (lag) at the 1d tier.
    "ts_delta_1d" -> QueryDef(
      run = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val r1d = TierSpec.cascade.tail.takeWhile(_.seconds <= 86400L)
          .foldLeft(Rollup.fromRaw(pages(s, dir), TierSpec.T5m))(
            (f, t) => Rollup.cascade(f, t))
        val w = Window.partitionBy("domain").orderBy("bucket_epoch")
        r1d.select(col("domain"), col("bucket_epoch"),
          (col("sum_value_micros")
            - lag(col("sum_value_micros"), 1).over(w)).as("delta_micros"))
      },
      oracle = Some(
        s"""${WebPages.oracleCte},
           |r AS (
           |  SELECT domain,
           |         warc_epoch - (warc_epoch % 86400) AS bucket_epoch,
           |         CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS s
           |  FROM webpages GROUP BY 1, 2
           |)
           |SELECT domain, bucket_epoch,
           |       CAST(s - lag(s) OVER (PARTITION BY domain ORDER BY bucket_epoch) AS BIGINT)
           |         AS delta_micros
           |FROM r""".stripMargin)),

    // dense() is a single-window + generator plan referencing its input
    // once (plus a 1-row broadcast bounds aggregate in the global
    // flavor) — no persist needed, no cache leaks into the session.
    "ts_gapfill_1h" -> QueryDef(
      run = (s, dir) => GapFill.dense(Rollup.cascade(
        Rollup.fromRaw(pages(s, dir), TierSpec.T5m), TierSpec.T1h),
        TierSpec.T1h),
      oracle = Some(GapFill.denseOracleSql(TierSpec.T1h))),

    // Per-series-bounds flavor — the 100 TB default: each series'
    // ladder spans its own lifetime, not the global range.
    "ts_gapfill_series_1h" -> QueryDef(
      run = (s, dir) => GapFill.denseBySeries(Rollup.cascade(
        Rollup.fromRaw(pages(s, dir), TierSpec.T5m), TierSpec.T1h),
        TierSpec.T1h),
      oracle = Some(GapFill.denseBySeriesOracleSql(TierSpec.T1h))),

    // Gap-fill over the MULTI-COLUMN production series key
    // (domain, url_bucket) — the actual 100 TB key: the window and the
    // per-series grid are keyed on the composite, so a hot domain's
    // stream splits across its url buckets. Bucket = portable 60-bit
    // url hash mod 8 (engine-mirrorable, unlike xxhash64).
    "ts_gapfill_bucketed" -> QueryDef(
      run = (s, dir) => {
        val keys = Seq("domain", "url_bucket")
        val keyed = pages(s, dir).withColumn("url_bucket",
          pmod(graft.functions.Portable.hash60(col("url")), lit(8L)))
        GapFill.denseBySeries(
          Rollup.fromRaw(keyed, TierSpec.T1h, keys), TierSpec.T1h, keys)
      },
      oracle = Some {
        val h = graft.functions.Portable.hash60Sql("url")
        s"""${WebPages.oracleCte},
           |keyed AS (
           |  SELECT domain, ($h % 8) AS url_bucket, warc_epoch, n_chars, value
           |  FROM webpages
           |),
           |obs AS (
           |  SELECT domain, url_bucket,
           |         warc_epoch - (warc_epoch % 3600) AS bucket_epoch,
           |         ${Rollup.oracleMeasures.replace("\n", "\n         ")}
           |  FROM keyed GROUP BY 1, 2, 3
           |),
           |grid AS (SELECT domain, url_bucket,
           |                CAST(unnest(generate_series(mn, mx, 3600)) AS BIGINT) AS bucket_epoch
           |         FROM (SELECT domain, url_bucket, min(bucket_epoch) mn,
           |                      max(bucket_epoch) mx
           |               FROM obs GROUP BY 1, 2))
           |SELECT grid.domain, grid.url_bucket, grid.bucket_epoch,
           |       obs.n, obs.sum_chars, obs.sum_value_micros,
           |       obs.min_value_micros, obs.max_value_micros,
           |       (obs.n IS NULL) AS is_gap,
           |       CAST(CASE WHEN obs.n IS NULL THEN ${graft.core.Flag.NODATA}
           |            ELSE ${graft.core.Flag.OK} END AS TINYINT) AS flag
           |FROM grid
           |LEFT JOIN obs ON obs.domain = grid.domain
           |             AND obs.url_bucket = grid.url_bucket
           |             AND obs.bucket_epoch = grid.bucket_epoch""".stripMargin
      }),

    "ts_ffill_1h" -> QueryDef(
      run = (s, dir) => GapFill.forwardFill(GapFill.dense(Rollup.cascade(
          Rollup.fromRaw(pages(s, dir), TierSpec.T5m), TierSpec.T1h),
          TierSpec.T1h))
        .select("domain", "bucket_epoch", "is_gap", "ffill_value"),
      oracle = Some(GapFill.ffillOracleSql(TierSpec.T1h))),

    // Fixed-band histogram tier: per-bucket log2-band value counts,
    // cascaded 1h→1d by per-band SUM — the EXACT mergeable
    // distribution aggregate (deterministic, checksum-safe, oracle
    // value-for-value; the KLL tier is its approximate sibling).
    "ts_hist_1d" -> QueryDef(
      run = (s, dir) => {
        val p = pages(s, dir)
          .withColumn("value_micros", Rollup.micros(col("value")))
        Sketches.histCascade(
          Sketches.histFromRaw(p, TierSpec.T1h, "value_micros", 8),
          TierSpec.T1d, 8)
      },
      oracle = Some {
        val band = Sketches.histBandSql(
          "CAST(floor(value * 1000000) AS BIGINT)", 8)
        val hcols = (0 until 8).map(i =>
          s"CAST(sum(CASE WHEN $band = $i THEN 1 ELSE 0 END) AS BIGINT) AS h$i")
          .mkString(",\n       ")
        s"""${WebPages.oracleCte}
           |SELECT domain,
           |       warc_epoch - (warc_epoch % ${TierSpec.T1d.seconds}) AS bucket_epoch,
           |       $hcols
           |FROM webpages GROUP BY 1, 2""".stripMargin
      }),

    // PromQL-style counter rate: a synthetic cumulative counter per
    // user (running sum of |value_micros| wrapped at 10^9 — the wrap IS
    // a reset) → reset-aware increase per sample → per-bucket increase
    // + rate. Exercises the reset branch deterministically on both
    // engines.
    "ts_rate_1h" -> QueryDef(
      run = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = s.read.parquet(s"$dir/events.parquet").select(
          col("user_id"),
          unix_timestamp(col("ts")).as("t_epoch"),
          col("event_id"),
          abs(Rollup.micros(col("value"))).as("vm"))
        val wc = Window.partitionBy("user_id")
          .orderBy(col("t_epoch"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val counters = ev.withColumn("counter",
          sum(col("vm")).over(wc) % 1000000000L)
        graft.ops.Rate.perBucket(
          counters, "user_id", "t_epoch", "event_id", "counter",
          TierSpec.T1h)
      },
      oracle = Some(
        """WITH c AS (
          |  SELECT user_id,
          |         CAST(epoch_us(ts) // 1000000 AS BIGINT) AS t_epoch,
          |         event_id,
          |         sum(abs(CAST(floor(value * 1000000) AS BIGINT))) OVER (
          |           PARTITION BY user_id
          |           ORDER BY CAST(epoch_us(ts) // 1000000 AS BIGINT), event_id
          |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |           % 1000000000 AS counter
          |  FROM events
          |),
          |inc AS (
          |  SELECT user_id, t_epoch,
          |         CASE WHEN lag(counter) OVER w IS NULL THEN 0
          |              WHEN counter >= lag(counter) OVER w
          |                THEN counter - lag(counter) OVER w
          |              ELSE counter END AS increase
          |  FROM c
          |  WINDOW w AS (PARTITION BY user_id ORDER BY t_epoch, event_id)
          |)
          |SELECT user_id,
          |       t_epoch - (t_epoch % 3600) AS bucket_epoch,
          |       CAST(sum(increase) AS BIGINT) AS increase,
          |       CAST(count(*) AS BIGINT) AS n_samples,
          |       CAST(sum(increase) * 1000 // 3600 AS BIGINT) AS rate_milli
          |FROM inc GROUP BY 1, 2""".stripMargin)),

    // Linear interpolation across gaps (integer micros, IEEE-identical
    // ratio on both engines); leading/trailing gaps stay null.
    "ts_interp_1h" -> QueryDef(
      run = (s, dir) => GapFill.interpolate(GapFill.dense(Rollup.cascade(
          Rollup.fromRaw(pages(s, dir), TierSpec.T5m), TierSpec.T1h),
          TierSpec.T1h))
        .select("domain", "bucket_epoch", "is_gap", "interp_value"),
      oracle = Some(GapFill.interpOracleSql(TierSpec.T1h))),

    // Gap-based sessionization, 30-minute inactivity gap over the
    // events stream. The gated form runs the skew-safe bucketed
    // variant (raw-row window per (key, 1h bucket); one per-key carry
    // window over the local-session stream numbers the global
    // sessions) — spec-pinned equal to the one-window form.
    "ts_sessionize" -> QueryDef(
      run = (s, dir) => {
        val ev = s.read.parquet(s"$dir/events.parquet").select(
          col("user_id"),
          unix_timestamp(col("ts")).as("t_epoch"),
          col("event_id"))
        graft.ops.Sessionize.statsBucketed(
          ev, Seq("user_id"), "t_epoch", "event_id",
          gapSeconds = 1800L, bucketSeconds = 3600L)
      },
      oracle = Some(graft.ops.Sessionize.statsOracleSql(
        """SELECT user_id,
          |       CAST(epoch_us(ts) // 1000000 AS BIGINT) AS t_epoch,
          |       event_id
          |FROM events""".stripMargin,
        "user_id", "t_epoch", "event_id", 1800L))),

    // Sessionization on the MULTI-COLUMN production key
    // (domain, url_bucket) — the composite-key overload, oracle-gated
    // like its GapFill sibling: the skew-safe bucketed two-phase form
    // keyed on the composite, 1h inactivity gap over the page stream.
    "ts_sessionize_bucketed" -> QueryDef(
      run = (s, dir) => {
        val keyed = pages(s, dir).select(
          col("domain"),
          pmod(graft.functions.Portable.hash60(col("url")), lit(8L))
            .as("url_bucket"),
          col("warc_epoch"), col("event_id"))
        graft.ops.Sessionize.statsBucketed(
          keyed, Seq("domain", "url_bucket"), "warc_epoch", "event_id",
          gapSeconds = 3600L, bucketSeconds = 6L * 3600L)
      },
      oracle = Some {
        val h = graft.functions.Portable.hash60Sql("url")
        s"""${WebPages.oracleCte},
           |ev AS (
           |  SELECT domain, ($h % 8) AS url_bucket, warc_epoch, event_id
           |  FROM webpages
           |),
           |marked AS (
           |  SELECT domain, url_bucket, warc_epoch, event_id,
           |         CASE WHEN lag(warc_epoch) OVER w IS NULL
           |                OR warc_epoch - lag(warc_epoch) OVER w > 3600
           |              THEN 1 ELSE 0 END AS newsess
           |  FROM ev
           |  WINDOW w AS (PARTITION BY domain, url_bucket
           |               ORDER BY warc_epoch, event_id)
           |),
           |assigned AS (
           |  SELECT domain, url_bucket, warc_epoch,
           |         sum(newsess) OVER (PARTITION BY domain, url_bucket
           |           ORDER BY warc_epoch, event_id
           |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |           AS session_seq
           |  FROM marked
           |)
           |SELECT domain, url_bucket,
           |       CAST(session_seq AS BIGINT) AS session_seq,
           |       CAST(count(*) AS BIGINT) AS n_events,
           |       min(warc_epoch) AS start_epoch,
           |       max(warc_epoch) AS end_epoch,
           |       max(warc_epoch) - min(warc_epoch) AS duration_s
           |FROM assigned GROUP BY 1, 2, 3""".stripMargin
      }),

    // Forward as-of join: each page row picks up the NEXT daily rollup
    // at or after its timestamp (the correction/late-rollup lookup).
    "asof_join_forward" -> QueryDef(
      run = (s, dir) => {
        val p = pages(s, dir).select("event_id", "domain", "warc_epoch")
        val sparse = Rollup.fromRaw(pages(s, dir), TierSpec.T1d)
          .filter(col("n") >= 25)
          .select(col("domain"), col("bucket_epoch"),
            col("n").as("day_n"), col("sum_value_micros").as("day_sum"))
        graft.ops.AsofJoin.forward(
          p, sparse, Seq("domain"), "warc_epoch", "bucket_epoch")
      },
      oracle = Some(
        s"""${WebPages.oracleCte},
           |r1d AS (
           |  SELECT domain,
           |         warc_epoch - (warc_epoch % 86400) AS bucket_epoch,
           |         CAST(count(*) AS BIGINT) AS day_n,
           |         CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS day_sum
           |  FROM webpages GROUP BY 1, 2
           |  HAVING count(*) >= 25
           |)
           |SELECT w.event_id, w.domain, w.warc_epoch, r.day_n, r.day_sum
           |FROM webpages w ASOF LEFT JOIN r1d r
           |  ON w.domain = r.domain AND w.warc_epoch <= r.bucket_epoch""".stripMargin))
  )

  // ---------------------------------------------------------------------
  // Text / training-data pipeline ops
  // ---------------------------------------------------------------------

  private val docsCte = "WITH docs AS (SELECT * FROM documents)"

  /** Exact-dup canonical representative: the full row carrying the
    * minimum `idCol` per `fpCol` group — ONE min_by hash aggregate with
    * map-side partial aggregation. The round-5 form computed
    * `min(id) OVER (PARTITION BY fp)` and filtered `id = keep_id`: an
    * exchange of EVERY row plus a sort for the window; the aggregate
    * shuffles at most one partially-combined row per (task, fp) and
    * never sorts (guide §2.3: aggregate before you shuffle). Row set is
    * identical — ids are unique, so "the row whose id is the group min"
    * and "min_by(row, id)" pick the same single row per group.
    */
  private def fpCanonical(df: DataFrame, fpCol: String,
                          idCol: String): DataFrame =
    df.groupBy(col(fpCol))
      .agg(min_by(struct(df.columns.map(col): _*), col(idCol)).as("_c"))
      .select(col("_c.*"))

  /** The curation thresholds the unversioned queries run under — the
    * registry's frozen default (v1.0), referenced instead of repeated
    * literals so the registry is the single source of truth on BOTH
    * engines (the *_rulesets queries exercise other versions).
    */
  private val Rules = graft.core.CurationRuleset.Default

  def textOps: Seq[(String, QueryDef)] = Seq(
    "text_stats" -> QueryDef(
      run = (s, dir) => TextStats.stats(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text"),
      oracle = Some(TextStats.statsOracleSql(docsCte, "docs", "doc_id", "text"))),

    // PII scrubbing (C4/RefinedWeb hygiene): deterministic PII is
    // injected per row on BOTH engines (the corpus itself is clean), the
    // scrubber replaces email/IP/phone shapes with typed tokens, and the
    // audit counts gate the result value-for-value. Pure narrow map.
    "text_scrub" -> QueryDef(
      run = (s, dir) => {
        val pii = concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@mail.example.com from 10.0."),
          (col("doc_id") % 256L).cast("string"),
          lit(".7 call 555-010-1234"))
        s.read.parquet(s"$dir/documents.parquet")
          .select(Seq(col("doc_id"),
                      TextStats.scrubPii(pii).as("scrubbed")) ++
                  TextStats.piiCounts(pii): _*)
      },
      oracle = Some {
        val pii = "concat(text, ' contact user', CAST(doc_id AS VARCHAR), " +
          "'@mail.example.com from 10.0.', CAST(doc_id % 256 AS VARCHAR), " +
          "'.7 call 555-010-1234')"
        s"""$docsCte
           |SELECT doc_id,
           |       ${TextStats.scrubPiiSql(pii)} AS scrubbed,
           |       ${TextStats.piiCountsSql(pii).mkString(",\n       ")}
           |FROM docs""".stripMargin
      }),

    // The SAME scrubber under TWO ruleset versions side by side (the
    // registry's point: knobs iterate weekly, behavior is pinned per
    // version): v1.0 has no SSN pattern — the ssn-shaped injection
    // survives; v2.0 scrubs it. Both engines parametrize from the same
    // CurationRuleset, so each version gates value-for-value.
    // ONE corpus scan: both versions' scrubs are computed per row and
    // exploded to (version, scrubbed) pairs — A/B-ing a ruleset costs
    // one extra projection, never a second 100 TB read (the DuckDB
    // mirror unions two reads; its corpus is small).
    "text_scrub_rulesets" -> QueryDef(
      run = (s, dir) => {
        import graft.core.CurationRuleset
        val pii = concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@mail.example.com ssn 123-45-6789 call 555-010-1234"))
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), explode(array(
            Seq(CurationRuleset.V1, CurationRuleset.V2).map(rs =>
              struct(lit(rs.version).as("ruleset"),
                     TextStats.scrubPii(pii, rs).as("scrubbed"))): _*))
            .as("r"))
          .select(col("r.ruleset").as("ruleset"), col("doc_id"),
                  col("r.scrubbed").as("scrubbed"))
      },
      oracle = Some {
        import graft.core.CurationRuleset
        val pii = "concat(text, ' contact user', CAST(doc_id AS VARCHAR), " +
          "'@mail.example.com ssn 123-45-6789 call 555-010-1234')"
        def one(rs: CurationRuleset) =
          s"""SELECT '${rs.version}' AS ruleset, doc_id,
             |       ${TextStats.scrubPiiSql(pii, rs)} AS scrubbed
             |FROM documents""".stripMargin
        s"${one(CurationRuleset.V1)}\nUNION ALL\n${one(CurationRuleset.V2)}"
      }),

    // corpus_filter under two ruleset versions: v2.0's extra stopword
    // language and stricter quality floor change the keep set — both
    // versions run in ONE plan, ONE corpus scan, ONE fingerprint
    // canonical aggregate: the fingerprint (and so the exact-dup canonical) is
    // ruleset-independent, so per-version lang/quality are computed
    // side by side in the same projection, exploded to (version, …)
    // rows, and gated by the per-version floor. A/B-ing a ruleset
    // iteration costs one extra projection, never a second corpus
    // read or shuffle.
    "corpus_filter_rulesets" -> QueryDef(
      run = (s, dir) => {
        import graft.core.CurationRuleset
        val versions = Seq(CurationRuleset.V1, CurationRuleset.V2)
        val docs = s.read.parquet(s"$dir/documents.parquet")
        fpCanonical(docs
          // narrow map at the scan: fingerprint + BOTH versions' stats
          // as two small structs — the text column never reaches the
          // canonical aggregate's exchange
          .select(col("doc_id"), TextStats.fingerprint(col("text")).as("fp_md5"),
            array(versions.map(rs =>
              struct(lit(rs.version).as("ruleset"),
                     TextStats.langId(col("text"), rs).as("lang_pred"),
                     TextStats.qualityMilli(col("text"), rs).as("quality_milli"),
                     lit(rs.qualityFloorMilli).as("floor"))): _*).as("rs")),
          "fp_md5", "doc_id")
          .select(col("doc_id"), explode(col("rs")).as("r"))
          .filter(col("r.quality_milli") >= col("r.floor") &&
            col("r.lang_pred") =!= "und")
          .select(col("r.ruleset").as("ruleset"), col("doc_id"),
                  col("r.lang_pred").as("lang_pred"),
                  col("r.quality_milli").as("quality_milli"))
      },
      oracle = Some {
        import graft.core.CurationRuleset
        def one(rs: CurationRuleset) =
          s"""SELECT '${rs.version}' AS ruleset, doc_id, lang_pred, quality_milli
             |FROM (
             |  SELECT s.*, min(doc_id) OVER (PARTITION BY fp) AS keep_id FROM (
             |    SELECT doc_id,
             |           ${TextStats.langIdSql("text", rs).replace("\n", "\n           ")} AS lang_pred,
             |           ${TextStats.qualityMilliSql("text", rs).replace("\n", "\n           ")} AS quality_milli,
             |           md5(lower(text)) AS fp
             |    FROM documents
             |  ) s
             |)
             |WHERE doc_id = keep_id
             |  AND quality_milli >= ${rs.qualityFloorMilli}
             |  AND lang_pred <> 'und'""".stripMargin
        s"${one(CurationRuleset.V1)}\nUNION ALL\n${one(CurationRuleset.V2)}"
      }),

    // Gopher/MassiveText repetition rules: duplicate-chunk fraction +
    // top-bigram mass, per document, in-row (no shuffle) — with the
    // keep-gate thresholds applied the way a curation pipeline would.
    "text_quality_rep" -> QueryDef(
      run = (s, dir) =>
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id") +: TextStats.repetitionCols(col("text")): _*)
          .withColumn("keep",
            col("dup_chunk_milli") < Rules.dupChunkMaxMilli &&
            col("top_bigram_milli") < Rules.topBigramMaxMilli),
      oracle = Some(
        s"""$docsCte,
           |r AS (
           |  SELECT doc_id,
           |         ${TextStats.repetitionColsSql("text")
                 .mkString(",\n").replace("\n", "\n         ")}
           |  FROM docs
           |)
           |SELECT doc_id, n_chunks, dup_chunk_milli, n_bigrams,
           |       top_bigram_milli,
           |       (dup_chunk_milli < ${Rules.dupChunkMaxMilli} AND top_bigram_milli < ${Rules.topBigramMaxMilli}) AS keep
           |FROM r""".stripMargin)),

    // Decontamination composed into selection — the integration a real
    // pipeline runs: the corpus_filter keep-set MINUS documents whose
    // k-gram containment vs the (broadcast) bench set crosses the
    // threshold. Bench stand-in: doc_id < 5 (they self-contain at 1000
    // and are excluded — eval docs never reach training). One anti-join
    // on top of the selection plan; the bench side stays broadcast.
    "corpus_select_decontam" -> QueryDef(
      run = (s, dir) => {
        val docs = s.read.parquet(s"$dir/documents.parquet")
        val bench = docs.filter(col("doc_id") < 5L)
          .select(col("doc_id").as("bench_id"), col("text"))
        val contaminated = graft.ops.Decontaminate
          .overlap(docs, "doc_id", "text", bench, "bench_id", "text")
          .select("doc_id").distinct()
        fpCanonical(TextStats.stats(docs, "doc_id", "text"), "fp_md5", "doc_id")
          .filter(col("quality_milli") >= Rules.qualityFloorMilli &&
            col("lang_pred") =!= "und")
          .join(contaminated, Seq("doc_id"), "left_anti")
          .select("doc_id", "lang_pred", "quality_milli")
      },
      oracle = Some {
        val cont = graft.ops.Decontaminate.overlapOracleSql(
          "SELECT doc_id, text FROM documents", "doc_id", "text",
          "SELECT doc_id AS bench_id, text FROM documents WHERE doc_id < 5",
          "bench_id", "text")
        s"""$docsCte,
           |s AS (
           |  SELECT doc_id,
           |         ${TextStats.langIdSql("text").replace("\n", "\n         ")} AS lang_pred,
           |         ${TextStats.qualityMilliSql("text").replace("\n", "\n         ")} AS quality_milli,
           |         md5(lower(text)) AS fp
           |  FROM docs
           |),
           |s2 AS (
           |  SELECT s.*, min(doc_id) OVER (PARTITION BY fp) AS keep_id FROM s
           |),
           |cont AS (
           |  SELECT DISTINCT doc_id FROM (
           |    ${cont.replace("\n", "\n    ")}
           |  )
           |)
           |SELECT doc_id, lang_pred, quality_milli
           |FROM s2
           |WHERE doc_id = keep_id AND quality_milli >= ${Rules.qualityFloorMilli}
           |  AND lang_pred <> 'und'
           |  AND NOT EXISTS (SELECT 1 FROM cont WHERE cont.doc_id = s2.doc_id)""".stripMargin
      }),

    // Sequence packing (the training-data layout step): global token
    // prefix-sum → fixed 512-token sequence ids/offsets per document.
    // The GATED form is the skew-safe bucketed two-phase prefix sum (no
    // global sort) with the bucket width DERIVED from the id span
    // (phase-2 stream ≤ targetBuckets rows at any corpus size);
    // spec-pinned identical to the one-window form.
    "corpus_pack" -> QueryDef(
      run = (s, dir) => {
        val d = s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"),
            graft.functions.Portable.tokenCount(col("text")).as("n_tokens"))
        graft.ops.Pack.packBucketedAuto(d, "doc_id", "n_tokens", 512L,
                                        targetBuckets = 64L)
      },
      oracle = Some(graft.ops.Pack.packOracleSql(
        s"SELECT doc_id, ${graft.functions.Portable.tokenCountSql("text")} AS n_tokens FROM documents",
        "doc_id", "n_tokens", 512L))),

    // C4-style chunk-level dedup signal: per-doc share of 8-word chunks
    // that also appear in another document (boilerplate / mirror pages).
    "dedup_chunks" -> QueryDef(
      run = (s, dir) => Dedup.chunkShared(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text"),
      oracle = Some(Dedup.chunkSharedSql(docsCte, "docs", "doc_id", "text"))),

    // End-of-pipeline training-set selection: the curation ops COMPOSE —
    // exact-dup canonical representative (min id per fingerprint) ∧
    // quality floor ∧ confident language id, in one plan (one
    // partially-aggregated min_by shuffle on the fingerprint —
    // [[fpCanonical]]; everything else scan-speed).
    "corpus_filter" -> QueryDef(
      run = (s, dir) => {
        val stats = TextStats.stats(
          s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")
        fpCanonical(stats, "fp_md5", "doc_id")
          .filter(col("quality_milli") >= Rules.qualityFloorMilli &&
            col("lang_pred") =!= "und")
          .select("doc_id", "lang_pred", "quality_milli", "n_tokens")
      },
      oracle = Some(
        s"""$docsCte,
           |s AS (
           |  SELECT doc_id,
           |         ${graft.functions.Portable.tokenCountSql("text")} AS n_tokens,
           |         ${TextStats.langIdSql("text").replace("\n", "\n         ")} AS lang_pred,
           |         ${TextStats.qualityMilliSql("text").replace("\n", "\n         ")} AS quality_milli,
           |         md5(lower(text)) AS fp
           |  FROM docs
           |)
           |, s2 AS (
           |  SELECT s.*, min(doc_id) OVER (PARTITION BY fp) AS keep_id FROM s
           |)
           |SELECT doc_id, lang_pred, quality_milli, n_tokens
           |FROM s2
           |WHERE doc_id = keep_id
           |  AND quality_milli >= ${Rules.qualityFloorMilli} AND lang_pred <> 'und'""".stripMargin)),

    // Stratified quota sampling AFTER the curation filter: per
    // (lang, quality band) deterministic hash-threshold sampling to a
    // target mixture — the step between "filtered pool" and "training
    // mix". Pure narrow filter on top of corpus_filter's plan (no new
    // shuffle); quotas compiled to a CASE, reproducible across runs and
    // cluster sizes.
    "corpus_sample" -> QueryDef(
      run = (s, dir) => {
        val stats = TextStats.stats(
          s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")
        val filtered = fpCanonical(stats, "fp_md5", "doc_id")
          .filter(col("quality_milli") >= Rules.qualityFloorMilli &&
            col("lang_pred") =!= "und")
          .withColumn("band",
            floor(col("quality_milli") / 250L).cast("long"))
        val quota = least(lit(1000L),
          (col("band") + 1L) * 100L +
            Sampling.quotaFor(col("lang_pred"), Seq("en" -> 0L), 300L))
        Sampling.stratifiedHash(filtered, "doc_id", quota)
          .select("doc_id", "lang_pred", "quality_milli", "band", "n_tokens")
      },
      oracle = Some {
        val quotaSql = Sampling.quotaForSql("lang_pred", Seq("en" -> 0L), 300L)
        s"""$docsCte,
           |s AS (
           |  SELECT doc_id,
           |         ${graft.functions.Portable.tokenCountSql("text")} AS n_tokens,
           |         ${TextStats.langIdSql("text").replace("\n", "\n         ")} AS lang_pred,
           |         ${TextStats.qualityMilliSql("text").replace("\n", "\n         ")} AS quality_milli,
           |         md5(lower(text)) AS fp
           |  FROM docs
           |),
           |s2 AS (
           |  SELECT s.*, min(doc_id) OVER (PARTITION BY fp) AS keep_id FROM s
           |),
           |f AS (
           |  SELECT doc_id, lang_pred, quality_milli, n_tokens,
           |         quality_milli // 250 AS band
           |  FROM s2
           |  WHERE doc_id = keep_id
           |    AND quality_milli >= ${Rules.qualityFloorMilli} AND lang_pred <> 'und'
           |)
           |SELECT doc_id, lang_pred, quality_milli, band, n_tokens
           |FROM f
           |WHERE ${Sampling.samplingKeySql("doc_id")}
           |      < least(1000, (band + 1) * 100 + $quotaSql)""".stripMargin
      }),

    // Exact-count quota sampling: precisely min(k, |stratum|) docs per
    // language by stable hash rank — the deterministic complement of
    // corpus_sample's in-expectation thresholds; plans as a PARTIAL
    // WindowGroupLimit (map output shrinks to k per stratum pre-shuffle).
    "corpus_sample_exact" -> QueryDef(
      run = (s, dir) => Sampling.exactQuota(
          TextStats.stats(s.read.parquet(s"$dir/documents.parquet"),
            "doc_id", "text"),
          Seq("lang_pred"), "doc_id", k = 40)
        .select("doc_id", "lang_pred", "n_tokens"),
      oracle = Some(
        s"""$docsCte,
           |s AS (
           |  SELECT doc_id,
           |         ${graft.functions.Portable.tokenCountSql("text")} AS n_tokens,
           |         ${TextStats.langIdSql("text").replace("\n", "\n         ")} AS lang_pred
           |  FROM docs
           |),
           |r AS (
           |  SELECT s.*, row_number() OVER (
           |           PARTITION BY lang_pred
           |           ORDER BY ${Sampling.samplingKeySql("doc_id")}, doc_id) AS rk
           |  FROM s
           |)
           |SELECT doc_id, lang_pred, n_tokens FROM r WHERE rk <= 40""".stripMargin)),

    // Mixture upsampling: repeat filtered docs per language weight
    // (en ×2.5, others ×0.7 in expectation) — deterministic fractional
    // repetition, the "epochs per source" step of mix construction.
    "corpus_mix" -> QueryDef(
      run = (s, dir) => {
        val stats = TextStats.stats(
          s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")
        val filtered = fpCanonical(stats, "fp_md5", "doc_id")
          .filter(col("quality_milli") >= Rules.qualityFloorMilli &&
            col("lang_pred") =!= "und")
        val w = Sampling.quotaFor(col("lang_pred"), Seq("en" -> 2500L), 700L)
        Sampling.repeatByWeight(filtered, "doc_id", w)
          .select("doc_id", "lang_pred", "copy_idx")
      },
      oracle = Some {
        val wSql = Sampling.quotaForSql("lang_pred", Seq("en" -> 2500L), 700L)
        s"""$docsCte,
           |s AS (
           |  SELECT doc_id,
           |         ${TextStats.langIdSql("text").replace("\n", "\n         ")} AS lang_pred,
           |         ${TextStats.qualityMilliSql("text").replace("\n", "\n         ")} AS quality_milli,
           |         md5(lower(text)) AS fp
           |  FROM docs
           |),
           |s2 AS (
           |  SELECT s.*, min(doc_id) OVER (PARTITION BY fp) AS keep_id FROM s
           |),
           |f AS (
           |  SELECT doc_id, lang_pred, ($wSql) AS w
           |  FROM s2
           |  WHERE doc_id = keep_id
           |    AND quality_milli >= ${Rules.qualityFloorMilli} AND lang_pred <> 'und'
           |)
           |SELECT doc_id, lang_pred,
           |       ${Sampling.repeatByWeightSql("doc_id", "w")
                      .replace("\n", "\n       ")}
           |FROM f""".stripMargin
      }),

    // Benchmark decontamination: corpus docs containing ≥60% of a bench
    // doc's 3-gram shingles. The bench set (tiny) broadcasts; the
    // corpus streams — never corpus-quadratic.
    "decontaminate" -> QueryDef(
      run = (s, dir) => {
        val docs = s.read.parquet(s"$dir/documents.parquet")
        val bench = docs.filter(col("doc_id") % 50L === 0L)
          .select(col("doc_id").as("bench_id"), col("text"))
        Decontaminate.overlap(docs, "doc_id", "text",
          bench, "bench_id", "text", k = 3, thresholdMilli = 600L)
      },
      oracle = Some(Decontaminate.overlapOracleSql(
        "SELECT doc_id, text FROM documents", "doc_id", "text",
        "SELECT doc_id AS bench_id, text FROM documents WHERE doc_id % 50 = 0",
        "bench_id", "text", 3, 600L))),

    "dedup_exact" -> QueryDef(
      run = (s, dir) => Dedup.exact(pages(s, dir), "url", "text"),
      oracle = Some(Dedup.exactOracleSql(
        WebPages.oracleCte, "webpages", "url", "text"))),

    "dedup_minhash" -> QueryDef(
      run = (s, dir) => Dedup.minHashLsh(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text"),
      oracle = Some(Dedup.minHashLshOracleSql(docsCte, "docs", "doc_id", "text"))),

    // The FULL curation pipeline in one query — what "produce the
    // training set" actually runs: exact-dup canonical (fp window) ∧
    // near-dup CLUSTER canonical (LSH pairs → connected components;
    // keep only the component min) ∧ quality floor ∧ confident
    // language ∧ stratified quota sample. Everything but the bounded
    // component iteration is one declarative plan.
    "corpus_pipeline" -> QueryDef(
      run = (s, dir) => {
        val docs = s.read.parquet(s"$dir/documents.parquet")
        val clusters = graft.ops.Components.connected(
            Dedup.minHashLsh(docs, "doc_id", "text"), "id_a", "id_b")
          .withColumnRenamed("v", "doc_id")
        val filtered = fpCanonical(
            TextStats.stats(docs, "doc_id", "text"), "fp_md5", "doc_id")
          .filter(col("quality_milli") >= Rules.qualityFloorMilli &&
            col("lang_pred") =!= "und")
          .join(clusters, Seq("doc_id"), "left")
          .filter(col("cluster_id").isNull || col("cluster_id") === col("doc_id"))
          .withColumn("band",
            floor(col("quality_milli") / 250L).cast("long"))
        val quota = least(lit(1000L),
          (col("band") + 1L) * 100L +
            Sampling.quotaFor(col("lang_pred"), Seq("en" -> 0L), 300L))
        Sampling.stratifiedHash(filtered, "doc_id", quota)
          .select("doc_id", "lang_pred", "quality_milli", "band", "n_tokens")
      },
      oracle = Some {
        val quotaSql = Sampling.quotaForSql("lang_pred", Seq("en" -> 0L), 300L)
        val clustersSql = graft.ops.Components.connectedOracleSql(
          Dedup.minHashLshOracleSql(docsCte, "docs", "doc_id", "text"),
          "id_a", "id_b", vName = "doc_id")
        s"""$docsCte,
           |clusters AS (
           |  ${clustersSql.replace("\n", "\n  ")}
           |),
           |s AS (
           |  SELECT doc_id,
           |         ${graft.functions.Portable.tokenCountSql("text")} AS n_tokens,
           |         ${TextStats.langIdSql("text").replace("\n", "\n         ")} AS lang_pred,
           |         ${TextStats.qualityMilliSql("text").replace("\n", "\n         ")} AS quality_milli,
           |         md5(lower(text)) AS fp
           |  FROM docs
           |),
           |s2 AS (
           |  SELECT s.*, min(doc_id) OVER (PARTITION BY fp) AS keep_id FROM s
           |),
           |f AS (
           |  SELECT s2.doc_id, lang_pred, quality_milli, n_tokens,
           |         quality_milli // 250 AS band
           |  FROM s2 LEFT JOIN clusters c ON c.doc_id = s2.doc_id
           |  WHERE s2.doc_id = keep_id
           |    AND quality_milli >= ${Rules.qualityFloorMilli} AND lang_pred <> 'und'
           |    AND (c.cluster_id IS NULL OR c.cluster_id = s2.doc_id)
           |)
           |SELECT doc_id, lang_pred, quality_milli, band, n_tokens
           |FROM f
           |WHERE ${Sampling.samplingKeySql("doc_id")}
           |      < least(1000, (band + 1) * 100 + $quotaSql)""".stripMargin
      }),

    // Duplicate clusters from LSH pairs: iterative min-label connected
    // components (pointer-jumped, fixpoint-detected) — cluster_id is
    // the component min, i.e. the canonical keep id. Oracle: DuckDB
    // recursive-CTE reachability closure over the same pair SQL.
    "dedup_clusters" -> QueryDef(
      run = (s, dir) => {
        val docs = s.read.parquet(s"$dir/documents.parquet")
        graft.ops.Components.connected(
            Dedup.minHashLsh(docs, "doc_id", "text"), "id_a", "id_b")
          .withColumnRenamed("v", "doc_id")
      },
      oracle = Some(graft.ops.Components.connectedOracleSql(
        Dedup.minHashLshOracleSql(docsCte, "docs", "doc_id", "text"),
        "id_a", "id_b", vName = "doc_id"))),

    // Incremental cross-snapshot dedup: two ingests through the band
    // tier table must produce EXACTLY the pair set of the full-corpus
    // batch run (the oracle is the same SQL that gates dedup_minhash) —
    // per-increment work is O(increment), and the corpus band stream is
    // never shuffled (broadcast semi-join on the increment's buckets).
    "dedup_incremental" -> QueryDef(
      run = (s, dir) => {
        val root = java.nio.file.Files
          .createTempDirectory("graft-incdedup").toString
        val docs = s.read.parquet(s"$dir/documents.parquet")
        val d = new graft.ops.IncrementalDedup(s, root)
        d.ingest(docs.filter(col("doc_id") % 2L === 0L), "doc_id", "text")
        d.ingest(docs.filter(col("doc_id") % 2L === 1L), "doc_id", "text")
        d.pairs()
      },
      oracle = Some(Dedup.minHashLshOracleSql(docsCte, "docs", "doc_id", "text"))),

    // End-to-end incremental dedup: cluster labels derived from the
    // ACCUMULATED incremental pair table must equal the batch-run
    // clusters (pairs are much smaller than the corpus, so re-running
    // components over them per ingest is the O(pairs) closing step of
    // the incremental story). Oracle = the batch dedup_clusters SQL.
    "dedup_incremental_clusters" -> QueryDef(
      run = (s, dir) => {
        val root = java.nio.file.Files
          .createTempDirectory("graft-incclust").toString
        val docs = s.read.parquet(s"$dir/documents.parquet")
        val d = new graft.ops.IncrementalDedup(s, root)
        d.ingest(docs.filter(col("doc_id") < 250L), "doc_id", "text")
        d.ingest(docs.filter(col("doc_id") >= 250L), "doc_id", "text")
        graft.ops.Components.connected(d.pairs(), "id_a", "id_b")
          .withColumnRenamed("v", "doc_id")
      },
      oracle = Some(graft.ops.Components.connectedOracleSql(
        Dedup.minHashLshOracleSql(docsCte, "docs", "doc_id", "text"),
        "id_a", "id_b", vName = "doc_id"))),

    "dedup_simhash" -> QueryDef(
      run = (s, dir) => Dedup.simHash(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text"),
      oracle = Some(Dedup.simHashOracleSql(docsCte, "docs", "doc_id", "text"))),

    // SimHash near-dup pairs via pigeonhole band blocking + one
    // bit_count(xor) verify — the hamming-space analog of minHashLsh.
    "dedup_simhash_pairs" -> QueryDef(
      run = (s, dir) => Dedup.simHashNearDup(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text"),
      oracle = Some(Dedup.simHashNearDupOracleSql(
        docsCte, "docs", "doc_id", "text"))),

    "dedup_jaccard" -> QueryDef(
      run = (s, dir) => Dedup.ngramJaccard(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        "lang", 600L),
      oracle = Some(Dedup.ngramJaccardOracleSql(
        docsCte, "docs", "doc_id", "text", "lang", 600L))),

    "ann_topk" -> QueryDef(
      run = (s, dir) => {
        val emb = s.read.parquet(s"$dir/embeddings.parquet")
        Similarity.bruteForceTopK(
            emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
          .select("query_id", "neighbor_id", "rank")
      },
      oracle = Some(Similarity.bruteForceOracleSql(
        "embeddings", "vec_id", "embedding", 5, 10L))),

    "dedup_embedding" -> QueryDef(
      run = (s, dir) => Similarity.embeddingNearDup(
        s.read.parquet(s"$dir/embeddings.parquet"),
        "vec_id", "embedding", "label", 300000L),
      oracle = Some(Similarity.embeddingNearDupOracleSql(
        "embeddings", "vec_id", "embedding", "label", 300000L))),

    // Second ANN scale path: IVF inverted lists (deterministic coarse
    // quantizer; probe nprobe lists, exact rank within) — the
    // partition-pruning-shaped alternative to LSH.
    "ann_ivf_topk" -> QueryDef(
      run = (s, dir) => {
        val emb = s.read.parquet(s"$dir/embeddings.parquet")
        Similarity.ivfTopK(
            emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
          .select("query_id", "neighbor_id", "rank")
      },
      oracle = Some(Similarity.ivfTopKOracleSql(
        "embeddings", "vec_id", "embedding", 5, 10L))),

    // K-means-refined IVF: Lloyd iterations (integer-exact micros
    // arithmetic, truncating integer-division means, nano-cosine
    // argmin) over the hash-rank seeds — the trained-quantizer upgrade;
    // the oracle replays the SAME iterations as unrolled CTEs, so the
    // codebook and list assignment reproduce bit-for-bit.
    "ann_ivf_kmeans_topk" -> QueryDef(
      run = (s, dir) => {
        val emb = s.read.parquet(s"$dir/embeddings.parquet")
        Similarity.ivfTopKTrained(
            emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
          .select("query_id", "neighbor_id", "rank")
      },
      oracle = Some(Similarity.ivfKmeansOracleSql(
        "embeddings", "vec_id", "embedding", 5, 10L))),

    // Scale path of embedding dedup: LSH bucket blocking instead of the
    // label block — the variant a 100 TB corpus actually runs.
    "dedup_embedding_lsh" -> QueryDef(
      run = (s, dir) => Similarity.embeddingNearDupLsh(
        s.read.parquet(s"$dir/embeddings.parquet"),
        "vec_id", "embedding", 300000L),
      oracle = Some(Similarity.embeddingNearDupLshOracleSql(
        "embeddings", "vec_id", "embedding", 300000L))),

    // Scale path of ANN: multi-table LSH candidate generation + exact
    // rank within candidates (bruteForceTopK is the exact baseline).
    "ann_lsh_topk" -> QueryDef(
      run = (s, dir) => {
        val emb = s.read.parquet(s"$dir/embeddings.parquet")
        Similarity.lshTopK(
            emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
          .select("query_id", "neighbor_id", "rank")
      },
      oracle = Some(Similarity.lshTopKOracleSql(
        "embeddings", "vec_id", "embedding", 5, 10L))),

    // Magic-routed feature extraction over a MIXED payload column:
    // one third real BMPs, one third real PNGs (both synthesized from
    // known dimensions), one third raw html bytes. BMP/PNG rows must
    // carry REAL header dimensions; unknown-format rows fall back to
    // the stub. sha_md5 (md5 of raw bytes) is spec-covered instead of
    // oracle-gated — DuckDB 1.0 can only md5 VARCHAR, not BLOB.
    "mm_features" -> QueryDef(
      run = (s, dir) => {
        val payload = when(col("event_id") % 3L === 0L,
            Multimodal.syntheticBmp((col("event_id") % 1024L) + 1L,
                                    (col("n_chars") % 512L) + 1L))
          .when(col("event_id") % 3L === 1L,
            Multimodal.syntheticPng((col("event_id") % 2048L) + 1L,
                                    (col("n_chars") % 256L) + 1L))
          .otherwise(col("html"))
        Multimodal.extractFeatures(
            pages(s, dir).withColumn("_pl", payload), "event_id", "_pl")
          .select("event_id", "byte_len", "width", "height", "n_frames", "kind")
      },
      oracle = Some {
        val html = "concat('<html><body>', text, '</body></html>')"
        val d = graft.functions.Portable.hash60Sql(html)
        s"""${WebPages.oracleCte}
           |SELECT event_id,
           |       CAST(CASE WHEN event_id % 3 = 0 THEN 30
           |                 WHEN event_id % 3 = 1 THEN 33
           |                 ELSE length($html) END AS BIGINT) AS byte_len,
           |       CAST(CASE WHEN event_id % 3 = 0 THEN event_id % 1024 + 1
           |                 WHEN event_id % 3 = 1 THEN event_id % 2048 + 1
           |                 ELSE $d % 1280 END AS BIGINT) AS width,
           |       CAST(CASE WHEN event_id % 3 = 0 THEN n_chars % 512 + 1
           |                 WHEN event_id % 3 = 1 THEN n_chars % 256 + 1
           |                 ELSE ($d // 2048) % 720 END AS BIGINT) AS height,
           |       CAST(CASE WHEN event_id % 3 IN (0, 1) THEN 1
           |                 ELSE ($d // 4194304) % 100 END AS BIGINT) AS n_frames,
           |       CASE WHEN event_id % 3 = 0 THEN 'bmp'
           |            WHEN event_id % 3 = 1 THEN 'png'
           |            ELSE 'unknown' END AS kind
           |FROM webpages""".stripMargin
      }),

    // REAL multimodal decode: BMP header fields parsed from raw
    // little-endian bytes (no media library). Payloads are synthesized
    // engine-side from known dimensions; the oracle computes what the
    // byte-level parse must yield.
    "mm_decode_bmp" -> QueryDef(
      run = (s, dir) => {
        val docs = s.read.parquet(s"$dir/documents.parquet")
        val payload = Multimodal.syntheticBmp(
          (col("doc_id") % 1024L) + lit(1L),
          (col("n_chars") % 512L) + lit(1L))
        docs.select(col("doc_id"), Multimodal.decodeBmp(payload).as("h"))
          .select(col("doc_id"), col("h.width"), col("h.height"), col("h.bpp"))
      },
      oracle = Some(
        """SELECT doc_id,
          |       CAST(doc_id % 1024 + 1 AS BIGINT) AS width,
          |       CAST(n_chars % 512 + 1 AS BIGINT) AS height,
          |       CAST(24 AS BIGINT) AS bpp
          |FROM documents""".stripMargin)),

    // REAL multimodal decode #2: PNG IHDR fields parsed from raw
    // big-endian bytes (signature + chunk type verified).
    "mm_decode_png" -> QueryDef(
      run = (s, dir) => {
        val docs = s.read.parquet(s"$dir/documents.parquet")
        val payload = Multimodal.syntheticPng(
          (col("doc_id") % 4096L) + 1L,
          (col("n_chars") % 2048L) + 1L)
        docs.select(col("doc_id"), Multimodal.decodePng(payload).as("h"))
          .select(col("doc_id"), col("h.width"), col("h.height"),
                  col("h.bit_depth"), col("h.color_type"))
      },
      oracle = Some(
        """SELECT doc_id,
          |       CAST(doc_id % 4096 + 1 AS BIGINT) AS width,
          |       CAST(n_chars % 2048 + 1 AS BIGINT) AS height,
          |       CAST(8 AS BIGINT) AS bit_depth,
          |       CAST(2 AS BIGINT) AS color_type
          |FROM documents""".stripMargin)),

    // The BATCHED (mapPartitions, one-decoder-per-partition) decode
    // path, fully oracle-gated: the stub decoder recomputes md5-derived
    // pseudo-metadata in plain JVM code, and for text payloads the
    // DuckDB mirror reproduces every byte-derived field — so even the
    // non-SQL mapPartitions plumbing gets a value-for-value gate.
    "mm_batch_decode" -> QueryDef(
      run = (s, dir) => graft.ops.BatchDecode.decodePartitioned(
        pages(s, dir), "event_id", "html"),
      oracle = Some {
        val html = "concat('<html><body>', text, '</body></html>')"
        val d = graft.functions.Portable.hash60Sql(html)
        s"""${WebPages.oracleCte}
           |SELECT event_id,
           |       CAST(length($html) AS BIGINT) AS byte_len,
           |       md5($html) AS sha_md5,
           |       CAST($d % 1280 AS BIGINT) AS width,
           |       CAST(($d // 2048) % 720 AS BIGINT) AS height,
           |       CAST(($d // 4194304) % 100 AS BIGINT) AS n_frames
           |FROM webpages""".stripMargin
      }),

    "text_extract_invariant" -> QueryDef(
      // Byte-identical text per url: compare text re-extracted from the
      // html binary against the raw document text. Oracle asserts all-true.
      run = (s, dir) => pages(s, dir).select(
        col("event_id"),
        (WebPages.extractText(col("html")) === col("text")).as("ok")),
      oracle = Some(
        s"""${WebPages.oracleCte}
           |SELECT event_id, TRUE AS ok FROM webpages""".stripMargin))
  )

  // ---------------------------------------------------------------------
  // Relational / lifecycle ops from the reference inventory
  // ---------------------------------------------------------------------

  def relationalOps: Seq[(String, QueryDef)] = Seq(
    // Gorilla block codec round-trip: encode per (user, day), decode,
    // explode — must reproduce the raw points exactly.
    "gorilla_roundtrip" -> QueryDef(
      run = (s, dir) => {
        val ev = s.read.parquet(s"$dir/events.parquet").select(
          col("user_id"),
          unix_timestamp(col("ts")).as("ts_epoch"),
          col("value"))
          .withColumn("day", Rollup.bucket(col("ts_epoch"), TierSpec.T1d))
        graft.codec.GorillaAgg.roundTrip(ev, Seq("user_id", "day"), "ts_epoch", "value")
          .select("user_id", "ts_epoch", "value")
      },
      oracle = Some(
        """SELECT user_id,
          |       CAST(epoch_us(ts) // 1000000 AS BIGINT) AS ts_epoch,
          |       value
          |FROM events""".stripMargin)),

    // P1/P2/P3/P5/P10 scalar projections (vpts_csv.py rulesets).
    "vpts_scalars" -> QueryDef(
      run = (s, dir) => {
        import graft.fmt.VptsCsv
        s.read.parquet(s"$dir/events.parquet").select(
          col("event_id"),
          VptsCsv.iso8601(col("ts")).as("dt_iso"),
          VptsCsv.intToNodata(
            when(col("event_type") === "error", lit("0"))
              .when(col("event_type") === "view", lit("NULL"))
              .otherwise(col("user_id").cast("string"))).as("vcp"),
          VptsCsv.numberToBoolStr(
            when(col("value") > 0, 1).otherwise(0)).as("gap"),
          VptsCsv.round6(col("value") / 7).as("lat6"),
          substring(col("event_type"), 1, 2).as("country"),
          substring(col("event_type"), 3, 100).as("radar"))
      },
      oracle = Some(
        """SELECT event_id,
          |       strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS dt_iso,
          |       CASE WHEN event_type IN ('error', 'view') OR user_id = 0 THEN ''
          |            ELSE CAST(user_id AS VARCHAR) END AS vcp,
          |       CASE WHEN value > 0 THEN 'TRUE' ELSE 'FALSE' END AS gap,
          |       round(value / 7, 6) AS lat6,
          |       substring(event_type, 1, 2) AS country,
          |       substring(event_type, 3, 100) AS radar
          |FROM events""".stripMargin)),

    // P9 filename parse + A1 coverage count (s3.py:74-109, 243-260).
    "coverage_count" -> QueryDef(
      run = (s, dir) => {
        val fname = concat(
          substring(replace(col("domain"), lit("."), lit("")), 1, 5),
          lit("_vp_"), date_format(col("warc_ts"), "yyyyMMdd'T'HHmm"),
          lit(".h5"))
        val re = "^([a-z0-9]{5})_vp_([0-9]{8})T([0-9]{4})\\.h5$"
        pages(s, dir)
          .withColumn("fname", fname)
          .select(
            regexp_extract(col("fname"), re, 1).as("radar"),
            regexp_extract(col("fname"), re, 2).as("yyyymmdd"))
          .groupBy("radar", "yyyymmdd")
          .agg(count(lit(1)).as("file_count"))
      },
      oracle = Some(
        s"""${WebPages.oracleCte},
           |files AS (
           |  SELECT concat(substring(replace(domain, '.', ''), 1, 5), '_vp_',
           |                strftime(warc_ts, '%Y%m%dT%H%M'), '.h5') AS fname
           |  FROM webpages
           |)
           |SELECT regexp_extract(fname, '^([a-z0-9]{5})_vp_([0-9]{8})T([0-9]{4})\\.h5$$', 1) AS radar,
           |       regexp_extract(fname, '^([a-z0-9]{5})_vp_([0-9]{8})T([0-9]{4})\\.h5$$', 2) AS yyyymmdd,
           |       CAST(count(*) AS BIGINT) AS file_count
           |FROM files GROUP BY 1, 2""".stripMargin)),

    // P9 FULL parser (s3.py:100-120): the reference's actual regex —
    // mixed-case radar lowered, data_type group, optional T, tolerated
    // extra suffixes, legacy uva inventory shape — exercised over the
    // 6 reference test variants (tests/test_s3.py:19-111) distributed
    // across the events table, with the invalid 7th name quarantined
    // by the regex gate on both engines. Pure narrow codegen'd
    // projection: 10^12 inventory keys parse at scan speed.
    "filename_parse" -> QueryDef(
      run = (s, dir) => {
        import graft.fmt.OdimPath
        val n = OdimPath.ReferenceVariants.size
        val path = element_at(
          array(OdimPath.ReferenceVariants.map(lit): _*),
          (pmod(col("event_id"), lit(n.toLong)) + 1L).cast("int"))
        s.read.parquet(s"$dir/events.parquet")
          .select(path.as("file_path"))
          .filter(OdimPath.isValid(col("file_path")))
          .select(col("file_path") +: OdimPath.parse(col("file_path")): _*)
          .groupBy("file_path", "radar_code", "data_type", "year", "month",
                   "day", "hour", "minute", "file_name", "country", "radar")
          .agg(count(lit(1)).as("n_files"))
      },
      oracle = Some {
        import graft.fmt.OdimPath
        val n = OdimPath.ReferenceVariants.size
        val cases = OdimPath.ReferenceVariants.zipWithIndex
          .map { case (p, i) => s"WHEN $i THEN '$p'" }
          .mkString("\n|    ", "\n|    ", "")
        s"""WITH paths AS (
           |  SELECT CASE CAST(((event_id % $n) + $n) % $n AS INT)$cases
           |  END AS file_path
           |  FROM events
           |)
           |SELECT file_path,
           |       ${OdimPath.parseSql("file_path").replace("\n", "\n       ")},
           |       CAST(count(*) AS BIGINT) AS n_files
           |FROM paths
           |WHERE ${OdimPath.isValidSql("file_path")}
           |GROUP BY 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11""".stripMargin
      }),

    // S5 manifest JSON scan: per-day inventory manifests
    // ({"files":[{"key":…}…]}, s3.py:156-174) built from the data,
    // then from_json + explode back to per-file keys.
    "manifest_scan" -> QueryDef(
      run = (s, dir) => {
        import org.apache.spark.sql.types._
        val day = Rollup.bucket(col("warc_epoch"), TierSpec.T1d)
        val manifests = pages(s, dir)
          .select(col("domain"), day, col("url"))
          .groupBy("domain", "bucket_epoch")
          .agg(to_json(struct(collect_list(struct(col("url").as("key")))
            .as("files"))).as("manifest_json"))
        val schema = StructType(Seq(StructField("files", ArrayType(
          StructType(Seq(StructField("key", StringType)))))))
        manifests
          .select(col("domain"), col("bucket_epoch").as("day_epoch"),
            explode(from_json(col("manifest_json"), schema)("files")).as("f"))
          .groupBy("domain", "day_epoch")
          .agg(count(col("f.key")).as("n_files"))
      },
      oracle = Some(
        s"""${WebPages.oracleCte}
           |SELECT domain,
           |       warc_epoch - (warc_epoch % 86400) AS day_epoch,
           |       CAST(count(*) AS BIGINT) AS n_files
           |FROM webpages GROUP BY 1, 2""".stripMargin)),

    // S6/S7: chunked CSV scan + typed re-read. The rendered events
    // stream is sunk to a multi-part CSV (the "chunks"), scanned back
    // all-string with no NaN/null inference, re-typed, and must equal
    // the direct typed projection (s3.py:327-343 chunked inventory
    // scan; vph5_to_vpts.py:230-240 string-preserving re-read).
    "csv_scan_roundtrip" -> QueryDef(
      run = (s, dir) => {
        import graft.fmt.VptsCsv
        import org.apache.spark.sql.types.{StringType, StructField, StructType}
        // per-application scratch path + overwrite mode: repeated
        // registry runs within one session reuse one directory, while
        // concurrent Verify/Bench runs on the same box stay isolated
        // (a shared fixed path let one run clobber the other's chunk
        // files mid-read)
        val out = s"${System.getProperty("java.io.tmpdir")}/graft-scratch/" +
          s"${s.sparkContext.applicationId}/csvscan"
        val cols = Seq("event_id", "dt_iso", "event_type", "value_micros")
        val rendered = s.read.parquet(s"$dir/events.parquet").select(
          col("event_id").cast("string").as("event_id"),
          VptsCsv.iso8601(col("ts")).as("dt_iso"),
          col("event_type"),
          Rollup.micros(col("value")).cast("string").as("value_micros"))
        rendered.repartition(4).write.mode("overwrite")
          .option("header", "true").option("emptyValue", "")
          .option("nullValue", "").csv(out)
        val schema = StructType(cols.map(StructField(_, StringType)))
        s.read.option("header", "true").schema(schema).csv(out)
          .select(col("event_id").cast("long").as("event_id"),
                  col("dt_iso"), col("event_type"),
                  col("value_micros").cast("long").as("value_micros"))
      },
      oracle = Some(
        """SELECT event_id,
          |       strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS dt_iso,
          |       event_type,
          |       CAST(floor(value * 1000000) AS BIGINT) AS value_micros
          |FROM events""".stripMargin)),

    // F1 format gate with quarantine side-channel (odimh5.py:141-151:
    // reject non-VP products; here: bad-record channel instead of abort).
    "format_gate" -> QueryDef(
      run = (s, dir) => pages(s, dir).select(
        col("event_id"),
        when(col("lang") === "zh", lit("quarantined:unsupported_lang"))
          .when(length(col("text")) < 60, lit("quarantined:too_short"))
          .otherwise(lit("ok")).as("status")),
      oracle = Some(
        s"""${WebPages.oracleCte}
           |SELECT event_id,
           |       CASE WHEN lang = 'zh' THEN 'quarantined:unsupported_lang'
           |            WHEN length(text) < 60 THEN 'quarantined:too_short'
           |            ELSE 'ok' END AS status
           |FROM webpages""".stripMargin)),

    // P7 root_datetime parse + P8 "WMO:…,NOD:…" k:v source parse
    // (odimh5.py:79-116) via str_to_map / to_timestamp.
    "meta_parse" -> QueryDef(
      run = (s, dir) => {
        val ev = s.read.parquet(s"$dir/events.parquet")
        val src = concat(lit("WMO:0"), col("user_id").cast("string"),
                         lit(",NOD:"), col("event_type"), lit(",CTY:unk"))
        val m = str_to_map(src, lit(","), lit(":"))
        ev.select(
          col("event_id"),
          element_at(m, "NOD").as("nod"),
          element_at(m, "WMO").as("wmo"),
          unix_timestamp(to_timestamp(
            concat(date_format(col("ts"), "yyyyMMdd"),
                   date_format(col("ts"), "HHmmss")),
            "yyyyMMddHHmmss")).as("root_epoch"))
      },
      oracle = Some(
        """SELECT event_id,
          |       event_type AS nod,
          |       concat('0', CAST(user_id AS VARCHAR)) AS wmo,
          |       CAST(epoch_us(strptime(strftime(ts, '%Y%m%d%H%M%S'),
          |                              '%Y%m%d%H%M%S')) // 1000000 AS BIGINT)
          |         AS root_epoch
          |FROM events""".stripMargin)),

    // F3/I1 modified-since watermark: the incremental recompute set.
    "watermark_filter" -> QueryDef(
      run = (s, dir) => pages(s, dir)
        .filter(col("warc_ts") >= lit("2024-01-28 00:00:00").cast("timestamp"))
        .groupBy(col("domain"),
                 Rollup.bucket(col("warc_epoch"), TierSpec.T1d).as("day_epoch"))
        .agg(count(lit(1)).as("n")),
      oracle = Some(
        s"""${WebPages.oracleCte}
           |SELECT domain,
           |       warc_epoch - (warc_epoch % 86400) AS day_epoch,
           |       CAST(count(*) AS BIGINT) AS n
           |FROM webpages
           |WHERE warc_ts >= TIMESTAMP '2024-01-28 00:00:00'
           |GROUP BY 1, 2""".stripMargin)),

    // J1 existence anti-join (transfer_baltrad.py:30-47,141).
    "anti_join" -> QueryDef(
      run = (s, dir) => {
        val ev = s.read.parquet(s"$dir/events.parquet")
        val purchasers = ev.filter(col("event_type") === "purchase")
          .select("user_id").distinct()
        val erring = ev.filter(col("event_type") === "error" &&
            col("ts") < lit("2024-01-03 00:00:00").cast("timestamp"))
          .select("user_id").distinct()
        purchasers.join(erring, Seq("user_id"), "left_anti")
      },
      oracle = Some(
        """SELECT DISTINCT user_id FROM events
          |WHERE event_type = 'purchase'
          |  AND NOT EXISTS (SELECT 1 FROM events e2
          |                  WHERE e2.user_id = events.user_id
          |                    AND e2.event_type = 'error'
          |                    AND e2.ts < TIMESTAMP '2024-01-03 00:00:00')""".stripMargin)),

    // O3 union-all concat preserving duplicates (vpts.py:266).
    "union_concat" -> QueryDef(
      run = (s, dir) => {
        val ev = s.read.parquet(s"$dir/events.parquet")
          .select("event_id", "event_type", "ts")
        val a = ev.filter(col("ts") < lit("2024-01-03 00:00:00").cast("timestamp"))
        val b = ev.filter(
          col("ts") >= lit("2024-01-02 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-04 00:00:00").cast("timestamp"))
        a.unionByName(b).select("event_id", "event_type")
      },
      oracle = Some(
        """SELECT event_id, event_type FROM events
          |WHERE ts < TIMESTAMP '2024-01-03 00:00:00'
          |UNION ALL
          |SELECT event_id, event_type FROM events
          |WHERE ts >= TIMESTAMP '2024-01-02 00:00:00'
          |  AND ts < TIMESTAMP '2024-01-04 00:00:00'""".stripMargin)),

    // Backward as-of join (time-series enrichment Spark lacks as an
    // operator): every page row picks up the latest SPARSE daily
    // rollup (days with n >= 25 only) at or before its timestamp —
    // DuckDB's native ASOF LEFT JOIN is the oracle. The gated form is
    // the skew-safe two-phase variant (raw-row window per (key, 2-day
    // bucket); per-key carry over bucket tails only) — spec-pinned
    // equal to the one-window form.
    "asof_join" -> QueryDef(
      run = (s, dir) => {
        val p = pages(s, dir).select("event_id", "domain", "warc_epoch")
        val sparse = Rollup.fromRaw(pages(s, dir), TierSpec.T1d)
          .filter(col("n") >= 25)
          .select(col("domain"), col("bucket_epoch"),
            col("n").as("day_n"), col("sum_value_micros").as("day_sum"))
        graft.ops.AsofJoin.backwardBucketed(
          p, sparse, Seq("domain"), "warc_epoch", "bucket_epoch",
          bucketSeconds = 2L * 86400L)
      },
      oracle = Some(
        s"""${WebPages.oracleCte},
           |r1d AS (
           |  SELECT domain,
           |         warc_epoch - (warc_epoch % 86400) AS bucket_epoch,
           |         CAST(count(*) AS BIGINT) AS day_n,
           |         CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS day_sum
           |  FROM webpages GROUP BY 1, 2
           |  HAVING count(*) >= 25
           |)
           |SELECT w.event_id, w.domain, w.warc_epoch, r.day_n, r.day_sum
           |FROM webpages w ASOF LEFT JOIN r1d r
           |  ON w.domain = r.domain AND w.warc_epoch >= r.bucket_epoch""".stripMargin)),

    // Range (interval-containment) join, decomposed into an EQUI join
    // on tumbling buckets: events inside 2-day "campaign" windows that
    // open on every day whose 1d count clears a threshold. Oracle is a
    // plain inequality join — DuckDB can afford quadratic at sf scale;
    // the engine's plan cannot at 100 TB.
    "range_join" -> QueryDef(
      run = (s, dir) => {
        val p = pages(s, dir).select("event_id", "domain", "warc_epoch")
        val r1d = Rollup.fromRaw(pages(s, dir), TierSpec.T1d)
        // above-average days open a 2-day window; the comparison is
        // integer-exact (n·count > sum) so the qualifying set is
        // bit-identical on both engines at every scale factor
        val tot = r1d.agg(sum(col("n")).as("_s"), count(lit(1)).as("_c"))
        val windows = r1d.crossJoin(broadcast(tot))
          .filter(col("n") * col("_c") > col("_s"))
          .select(col("domain"), col("bucket_epoch").as("w_start"),
                  (col("bucket_epoch") + 2L * 86400L).as("w_end"))
        graft.ops.RangeJoin.contains(
            p, windows, Seq("domain"), "warc_epoch", "w_start", "w_end",
            grainSeconds = 86400L)
          .select("event_id", "domain", "warc_epoch", "w_start")
      },
      oracle = Some(
        s"""${WebPages.oracleCte},
           |w0 AS (
           |  SELECT domain,
           |         warc_epoch - (warc_epoch % 86400) AS w_start,
           |         CAST(count(*) AS BIGINT) AS n
           |  FROM webpages GROUP BY 1, 2
           |),
           |tot AS (SELECT CAST(sum(n) AS BIGINT) AS s,
           |               CAST(count(*) AS BIGINT) AS c FROM w0),
           |w AS (
           |  SELECT domain, w_start, w_start + 2 * 86400 AS w_end
           |  FROM w0, tot WHERE n * c > s
           |)
           |SELECT p.event_id, p.domain, p.warc_epoch, w.w_start
           |FROM webpages p JOIN w
           |  ON p.domain = w.domain
           | AND p.warc_epoch >= w.w_start AND p.warc_epoch < w.w_end""".stripMargin)),

    // Top-k buckets per series (rank window; deterministic tie-break).
    "topk_per_series" -> QueryDef(
      run = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val r1d = Rollup.fromRaw(pages(s, dir), TierSpec.T1d)
        val w = Window.partitionBy("domain")
          .orderBy(col("n").desc, col("bucket_epoch"))
        r1d.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select("domain", "bucket_epoch", "n", "rk")
      },
      oracle = Some(
        s"""${WebPages.oracleCte},
           |r1d AS (
           |  SELECT domain,
           |         warc_epoch - (warc_epoch % 86400) AS bucket_epoch,
           |         CAST(count(*) AS BIGINT) AS n
           |  FROM webpages GROUP BY 1, 2
           |)
           |SELECT domain, bucket_epoch, n,
           |       CAST(row_number() OVER (PARTITION BY domain
           |         ORDER BY n DESC, bucket_epoch) AS INT) AS rk
           |FROM r1d QUALIFY rk <= 3""".stripMargin)),

    // I1/I2 end-to-end: two incremental ingests through the TierRunner
    // (snapshot commits, per-partition lineage, checkpoint manifest)
    // must converge to the direct full rollup at the 1d tier.
    "tier_incremental" -> QueryDef(
      run = (s, dir) => {
        val root = java.nio.file.Files
          .createTempDirectory("graft-tierq").toString
        val runner = new graft.run.TierRunner(s, root)
        val p = pages(s, dir)
        val cut = lit("2024-01-15 00:00:00").cast("timestamp")
        runner.run("inc1", runner.ingest(p.filter(col("warc_ts") < cut)))
        runner.run("inc2", runner.ingest(p.filter(col("warc_ts") >= cut)))
        runner.tier(TierSpec.T1d).select(
          "domain", "bucket_epoch", "n", "n_ok", "n_nodata", "n_undetect",
          "sum_chars", "sum_value_micros", "min_value_micros",
          "max_value_micros")
      },
      oracle = Some(
        s"""${WebPages.oracleCte}
           |SELECT domain,
           |       warc_epoch - (warc_epoch % ${TierSpec.T1d.seconds}) AS bucket_epoch,
           |       ${Rollup.flagOracleMeasures}
           |FROM webpages
           |GROUP BY 1, 2""".stripMargin)),

    // Sketch tiers maintained INCREMENTALLY through the TierRunner
    // (I1/I2 watermark semantics, same snapshot/lineage machinery as
    // the value cascade): two ingests through the exact mergeable
    // histogram ladder (raw→1h per-band counts, 1h→1d per-band SUMS —
    // never a raw re-scan) must equal the direct full-data histogram,
    // value for value.
    "tier_hist_incremental" -> QueryDef(
      run = (s, dir) => {
        val root = java.nio.file.Files
          .createTempDirectory("graft-tierhist").toString
        val runner = new graft.run.TierRunner(s, root)
        val p = pages(s, dir)
        val cut = lit("2024-01-15 00:00:00").cast("timestamp")
        runner.run("h1", runner.ingest(p.filter(col("warc_ts") < cut)))
        runner.run("h2", runner.ingest(p.filter(col("warc_ts") >= cut)))
        runner.histTier(TierSpec.T1d)
          .select(Seq(col("domain"), col("bucket_epoch")) ++
            (0 until 8).map(i => col(s"h$i")): _*)
      },
      oracle = Some {
        val band = Sketches.histBandSql(
          "CAST(floor(value * 1000000) AS BIGINT)", 8)
        val hcols = (0 until 8).map(i =>
          s"CAST(sum(CASE WHEN $band = $i THEN 1 ELSE 0 END) AS BIGINT) AS h$i")
          .mkString(",\n       ")
        s"""${WebPages.oracleCte}
           |SELECT domain,
           |       warc_epoch - (warc_epoch % ${TierSpec.T1d.seconds}) AS bucket_epoch,
           |       $hcols
           |FROM webpages GROUP BY 1, 2""".stripMargin
      }),

    // Same lifecycle for the HLL distinct-url ladder: two ingests,
    // 1h sketches unioned register-wise into the 1d tier — the
    // incrementally-maintained estimate must stay within ±5% of the
    // exact distinct count of the FULL corpus (the mergeability
    // property, now exercised through snapshot commits + watermark
    // recompute instead of a single query plan).
    "tier_distinct_incremental" -> QueryDef(
      run = (s, dir) => {
        val root = java.nio.file.Files
          .createTempDirectory("graft-tierhll").toString
        val runner = new graft.run.TierRunner(s, root)
        val p = pages(s, dir)
        val cut = lit("2024-01-15 00:00:00").cast("timestamp")
        runner.run("u1", runner.ingest(p.filter(col("warc_ts") < cut)))
        runner.run("u2", runner.ingest(p.filter(col("warc_ts") >= cut)))
        val est = Sketches.estimated(runner.hllTier(TierSpec.T1d))
          .select("domain", "bucket_epoch", "n", "distinct_est")
        val exact = p
          .groupBy(col("domain"), Rollup.bucket(col("warc_epoch"), TierSpec.T1d))
          .agg(countDistinct(col("url")).as("exact_distinct"))
        est.join(exact, Seq("domain", "bucket_epoch"))
          .select(col("domain"), col("bucket_epoch"), col("n"),
            (abs(col("distinct_est") - col("exact_distinct"))
              <= col("exact_distinct") * 0.05 + lit(1)).as("within_5pct"))
      },
      oracle = Some(
        s"""${WebPages.oracleCte}
           |SELECT domain,
           |       warc_epoch - (warc_epoch % ${TierSpec.T1d.seconds}) AS bucket_epoch,
           |       CAST(count(*) AS BIGINT) AS n,
           |       TRUE AS within_5pct
           |FROM webpages GROUP BY 1, 2""".stripMargin)),

    // The histogram ladder's 30d level through the SAME lifecycle: the
    // coarsest continuous aggregate is rebuilt by per-band SUM of
    // exactly the member 1d partitions of touched 30d buckets (the
    // value cascade's 30d branch, applied to sketches) — still exact,
    // still value-for-value against the direct full-data oracle.
    "tier_hist_incremental_30d" -> QueryDef(
      run = (s, dir) => {
        val root = java.nio.file.Files
          .createTempDirectory("graft-tierhist30").toString
        val runner = new graft.run.TierRunner(s, root)
        val p = pages(s, dir)
        val cut = lit("2024-01-15 00:00:00").cast("timestamp")
        runner.run("h1", runner.ingest(p.filter(col("warc_ts") < cut)))
        runner.run("h2", runner.ingest(p.filter(col("warc_ts") >= cut)))
        runner.histTier(TierSpec.T30d)
          .select(Seq(col("domain"), col("bucket_epoch")) ++
            (0 until 8).map(i => col(s"h$i")): _*)
      },
      oracle = Some {
        val band = Sketches.histBandSql(
          "CAST(floor(value * 1000000) AS BIGINT)", 8)
        val hcols = (0 until 8).map(i =>
          s"CAST(sum(CASE WHEN $band = $i THEN 1 ELSE 0 END) AS BIGINT) AS h$i")
          .mkString(",\n       ")
        s"""${WebPages.oracleCte}
           |SELECT domain,
           |       warc_epoch - (warc_epoch % ${TierSpec.T30d.seconds}) AS bucket_epoch,
           |       $hcols
           |FROM webpages GROUP BY 1, 2""".stripMargin
      }),

    // Third sketch ladder through the runner lifecycle: KLL quantile
    // sketches, 1h from touched raw days, 1d by sketch-MERGE — the
    // incrementally maintained p50/p95 must satisfy the same rank-band
    // property as the single-plan ts_quantile_1d gate.
    "tier_quantile_incremental" -> QueryDef(
      run = (s, dir) => {
        val root = java.nio.file.Files
          .createTempDirectory("graft-tierkll").toString
        val runner = new graft.run.TierRunner(s, root)
        val p = pages(s, dir)
        val cut = lit("2024-01-15 00:00:00").cast("timestamp")
        runner.run("q1", runner.ingest(p.filter(col("warc_ts") < cut)))
        runner.run("q2", runner.ingest(p.filter(col("warc_ts") >= cut)))
        val est = Sketches.quantEstimated(runner.kllTier(TierSpec.T1d))
        val raw = p.withColumn("value_micros", Rollup.micros(col("value")))
          .select(col("domain"),
            Rollup.bucket(col("warc_epoch"), TierSpec.T1d), col("value_micros"))
        def rankOk(r: org.apache.spark.sql.Column, q: Double) =
          r >= floor(col("n") * (q - 0.10)) - 1 &&
          r <= ceil(col("n") * (q + 0.10)) + 1
        raw.join(est, Seq("domain", "bucket_epoch"))
          .groupBy("domain", "bucket_epoch", "n", "p50", "p95")
          .agg(
            sum(when(col("value_micros") <= col("p50"), 1L).otherwise(0L)).as("r50"),
            sum(when(col("value_micros") <= col("p95"), 1L).otherwise(0L)).as("r95"))
          .select(col("domain"), col("bucket_epoch"), col("n"),
            rankOk(col("r50"), 0.5).as("p50_ok"),
            rankOk(col("r95"), 0.95).as("p95_ok"))
      },
      oracle = Some(
        s"""${WebPages.oracleCte}
           |SELECT domain,
           |       warc_epoch - (warc_epoch % ${TierSpec.T1d.seconds}) AS bucket_epoch,
           |       CAST(count(*) AS BIGINT) AS n,
           |       TRUE AS p50_ok, TRUE AS p95_ok
           |FROM webpages GROUP BY 1, 2""".stripMargin)),

    // Per-(series, day) Gorilla value blocks stored as binary columns:
    // decoding the stored blocks must reproduce the 5m tier points,
    // INCLUDING the three-state missingness — the value channel's NaN
    // sentinel decodes to null for zero-OK buckets, and the parallel
    // OK/NODATA/UNDETECT count channels survive the codec round-trip
    // value-for-value (no HAVING: every bucket with any raw row has a
    // block point).
    "gorilla_blocks" -> QueryDef(
      run = (s, dir) => {
        val root = java.nio.file.Files
          .createTempDirectory("graft-blocks").toString
        val runner = new graft.run.TierRunner(s, root)
        runner.run("b1", runner.ingest(pages(s, dir)))
        runner.decodedBlocks()
      },
      oracle = Some(
        s"""${WebPages.oracleCte}
           |SELECT domain,
           |       warc_epoch - (warc_epoch % 300) AS bucket_epoch,
           |       CAST(sum(CASE WHEN flag = 0
           |                     THEN CAST(floor(value * 1000000) AS BIGINT)
           |                END) AS DOUBLE) AS value,
           |       CAST(sum(CASE WHEN flag = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
           |       CAST(sum(CASE WHEN flag = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_nodata,
           |       CAST(sum(CASE WHEN flag = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_undetect
           |FROM webpages
           |GROUP BY 1, 2""".stripMargin)),

    // Blocks ARE a queryable storage tier (north-star property): a 1h
    // rollup computed from the DECODED Gorilla block table equals the
    // direct raw→1h rollup — value sums ride the codec as integral
    // micros (exact doubles), the three-state counts ride the parallel
    // flag channels, and the merge is the standard cascade shape.
    "ts_rollup_blocks_1h" -> QueryDef(
      run = (s, dir) => {
        val root = java.nio.file.Files
          .createTempDirectory("graft-blockroll").toString
        val runner = new graft.run.TierRunner(s, root)
        runner.run("b1", runner.ingest(pages(s, dir)))
        runner.decodedBlocks()
          .groupBy(col("domain"),
                   Rollup.bucket(col("bucket_epoch"), TierSpec.T1h))
          // cast BEFORE summing: the decoded values are exact integral
          // micros, and a long sum stays exact past 2^53 where a double
          // sum would silently round (ANSI errors on true overflow)
          .agg(sum(col("value").cast("long")).as("sum_value_micros"),
               sum(col("n_ok")).as("n_ok"),
               sum(col("n_nodata")).as("n_nodata"),
               sum(col("n_undetect")).as("n_undetect"))
      },
      oracle = Some(
        s"""${WebPages.oracleCte}
           |SELECT domain,
           |       warc_epoch - (warc_epoch % 3600) AS bucket_epoch,
           |       CAST(sum(CASE WHEN flag = 0
           |                     THEN CAST(floor(value * 1000000) AS BIGINT)
           |                END) AS BIGINT) AS sum_value_micros,
           |       CAST(sum(CASE WHEN flag = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
           |       CAST(sum(CASE WHEN flag = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_nodata,
           |       CAST(sum(CASE WHEN flag = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_undetect
           |FROM webpages
           |GROUP BY 1, 2""".stripMargin)),

    // G1 parallel-arrays explode (vpts.py:108-136): per-profile arrays
    // (25-level ladder) + broadcast scalars → long form via ONE
    // arrays_zip+posexplode generator. The arrays are built
    // deterministically per event; the oracle computes the expected
    // long form directly.
    "profile_explode" -> QueryDef(
      run = (s, dir) => {
        import graft.fmt.VptsCsv
        val ev = s.read.parquet(s"$dir/events.parquet")
        val lvl = sequence(lit(0), lit(24))
        val withArrays = ev.select(
          col("event_id"),
          VptsCsv.iso8601(col("ts")).as("dt_iso"),
          transform(lvl, i => i * 200).as("height"),
          transform(lvl, i =>
            Rollup.micros(col("value")) + i.cast("long") * 7L).as("u_micros"),
          transform(lvl, i => col("user_id") + i).as("v_cnt"))
        graft.ops.ProfileExplode.explodeParallel(
          withArrays, Seq("height", "u_micros", "v_cnt"),
          Seq("event_id", "dt_iso"))
      },
      oracle = Some(
        """SELECT event_id,
          |       strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS dt_iso,
          |       CAST(g.idx AS INT) AS level_idx,
          |       CAST(g.idx * 200 AS INT) AS height,
          |       CAST(floor(value * 1000000) AS BIGINT) + g.idx * 7 AS u_micros,
          |       user_id + g.idx AS v_cnt
          |FROM events
          |CROSS JOIN (SELECT unnest(generate_series(0, 24)) AS idx) g""".stripMargin)),

    // Z-order layout key: Morton-interleave (url_bucket, day_index) —
    // the within-partition clustering key for multi-dim file pruning
    // (Iceberg z-order compaction analog). The query pins the bijection
    // (deinterleave(z) reproduces both inputs) value-for-value.
    "zorder_key" -> QueryDef(
      run = (s, dir) => {
        import graft.functions.{Portable, ZOrder}
        // portable bucket (hash60 % 2^16) so the oracle reproduces every
        // bit; the production layout key uses url_bucket the same way
        val p = pages(s, dir)
          .withColumn("xb", Portable.hash60(col("url")) % 65536L)
          .withColumn("day_index",
            floor(col("warc_epoch") / 86400L).cast("long") % 65536L)
        val z = ZOrder.zValue(col("xb"), col("day_index"), 16)
        p.select(col("event_id"), col("xb"), col("day_index"),
          z.as("z"),
          ZOrder.deinterleave(z, 0, 16).as("x_back"),
          ZOrder.deinterleave(z, 1, 16).as("y_back"))
      },
      oracle = Some {
        import graft.functions.{Portable, ZOrder}
        val z = ZOrder.zValueSql("xb", "day_index", 16)
        s"""${WebPages.oracleCte},
           |wx AS (
           |  SELECT event_id,
           |         ${Portable.hash60Sql("url")} % 65536 AS xb,
           |         (warc_epoch // 86400) % 65536 AS day_index
           |  FROM webpages
           |)
           |SELECT event_id, xb, day_index,
           |       CAST($z AS BIGINT) AS z,
           |       CAST(${ZOrder.deinterleaveSql("(" + z + ")", 0, 16)} AS BIGINT) AS x_back,
           |       CAST(${ZOrder.deinterleaveSql("(" + z + ")", 1, 16)} AS BIGINT) AS y_back
           |FROM wx""".stripMargin
      }),

    // A5 distinct-set invariant: buckets per series at the 1h tier.
    "distinct_buckets" -> QueryDef(
      run = (s, dir) => Rollup
        .fromRaw(pages(s, dir), TierSpec.T1h)
        .groupBy("domain")
        .agg(countDistinct(col("bucket_epoch")).as("n_buckets"),
             sum(col("n")).as("n_rows")),
      oracle = Some(
        s"""${WebPages.oracleCte}
           |SELECT domain,
           |       CAST(count(DISTINCT warc_epoch - (warc_epoch % 3600)) AS BIGINT) AS n_buckets,
           |       CAST(count(*) AS BIGINT) AS n_rows
           |FROM webpages GROUP BY 1""".stripMargin))
  )
}
