package graft.ops

import graft.functions.Portable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified / quota sampling for corpus curation: after
  * filtering selects the candidate pool, a training-data pipeline
  * samples per stratum (language × quality band × …) to hit target
  * mixture weights.
  *
  * The mechanism is hash-threshold sampling: keep a row iff
  * `hash60(id) mod 1000 < quotaMilli(stratum)`. Engine-portable
  * (md5-derived [[Portable.hash60]], exact DuckDB mirror), reproducible
  * across runs and cluster sizes (no RNG state, no
  * partition-dependent `rand()`), and composable — re-sampling with a
  * lower quota yields a strict subset of the higher-quota sample
  * (nested samples, the property survey/ablation pipelines rely on).
  *
  * Scale shape: a pure narrow filter — no shuffle, runs at scan speed
  * inside whole-stage codegen; quotas arrive either as an expression
  * over the stratum columns or as a small map (compiled into a CASE,
  * never a join).
  */
object Sampling {

  /** Keep rows whose 60-bit id-hash lands under `quotaMilli` (‰). */
  def stratifiedHash(df: DataFrame, idCol: String,
                     quotaMilli: Column): DataFrame =
    df.filter(samplingKey(col(idCol)) < quotaMilli)

  /** The sampling key: hash60 of the id rendered as a string, reduced
    * mod 1000 — uniform over [0, 1000) and identical in the oracle.
    */
  def samplingKey(id: Column): Column =
    Portable.hash60(id.cast("string")) % 1000L

  def samplingKeySql(idExpr: String): String =
    s"${Portable.hash60Sql(s"CAST($idExpr AS VARCHAR)")} % 1000"

  /** Quota expression from a per-stratum map (stratum → ‰), compiled to
    * a CASE chain; strata absent from the map get `defaultMilli`.
    */
  def quotaFor(stratum: Column, quotas: Seq[(String, Long)],
               defaultMilli: Long): Column =
    quotas.foldLeft(lit(defaultMilli)) { case (acc, (k, q)) =>
      when(stratum === k, lit(q)).otherwise(acc)
    }

  def quotaForSql(stratumExpr: String, quotas: Seq[(String, Long)],
                  defaultMilli: Long): String = {
    // SQL-escape embedded quotes (a stratum value like "it's" must not
    // produce malformed oracle SQL)
    val branches = quotas
      .map { case (k, q) =>
        s"WHEN $stratumExpr = '${k.replace("'", "''")}' THEN $q" }
      .mkString(" ")
    s"CASE $branches ELSE $defaultMilli END"
  }

  /** EXACT-count quota sampling: keep precisely `min(k, |stratum|)`
    * rows per stratum — the deterministic complement of the
    * hash-threshold sampler (which hits quotas in expectation). Rows
    * are ranked within their stratum by (id-hash, id) — a stable
    * pseudo-random order — and the rank filter plans as a PARTIAL
    * WindowGroupLimit: map output shrinks to k rows per (split,
    * stratum) BEFORE the exchange, so exact quotas cost one small
    * shuffle even at corpus scale.
    */
  def exactQuota(df: DataFrame, strataCols: Seq[String], idCol: String,
                 k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(samplingKey(col(idCol)), col(idCol))
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k)
      .drop("_rk")
  }

  /** Mixture upsampling: repeat each row `weightMilli/1000` times in
    * expectation — `floor` copies always, plus one more iff the row's
    * hash lands under the fractional part (deterministic fractional
    * repetition: exactly the id-stable analog of "2.5 epochs of source
    * X"). Rows with zero copies disappear, so weights < 1000 subsample
    * and weights > 1000 upsample through ONE operator. `copy_idx`
    * (1-based) keeps the output row-distinct for downstream shuffles.
    *
    * Scale shape: a generator (explode of a ≤⌈w⌉-element sequence) —
    * map-side row multiplication, no shuffle; the blow-up factor is
    * exactly the mixture weight, visible in the plan as one Generate.
    */
  def repeatByWeight(df: DataFrame, idCol: String,
                     weightMilli: Column): DataFrame = {
    val copies = (floor(weightMilli / 1000L).cast("long")
      + when(samplingKey(col(idCol)) < weightMilli % 1000L, 1L)
          .otherwise(0L))
    // sequence(1, 0) would DESCEND ([1,0]) — guard the empty case
    df.withColumn("_nc", copies)
      .withColumn("copy_idx",
        explode(when(col("_nc") >= 1L, sequence(lit(1L), col("_nc")))
          .otherwise(lit(Array.empty[Long]))))
      .drop("_nc")
  }

  def repeatByWeightSql(idExpr: String, weightMilliExpr: String): String =
    s"""unnest(CASE WHEN ($weightMilliExpr) // 1000
       |            + (CASE WHEN ${samplingKeySql(idExpr)} < ($weightMilliExpr) % 1000
       |               THEN 1 ELSE 0 END) >= 1
       |       THEN generate_series(1, ($weightMilliExpr) // 1000
       |            + (CASE WHEN ${samplingKeySql(idExpr)} < ($weightMilliExpr) % 1000
       |               THEN 1 ELSE 0 END))
       |       ELSE [] END) AS copy_idx""".stripMargin
}
