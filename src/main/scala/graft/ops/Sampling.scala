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
    val branches = quotas
      .map { case (k, q) => s"WHEN $stratumExpr = '$k' THEN $q" }
      .mkString(" ")
    s"CASE $branches ELSE $defaultMilli END"
  }
}
