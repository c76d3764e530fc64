package graft.ops

import graft.core.TierSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Monotone-counter rate — the PromQL `increase()`/`rate()` semantics
  * over cumulative counters (bytes served, requests handled): the
  * per-sample contribution is the positive delta, and a counter RESET
  * (value drops — process restart, wrap) contributes the post-reset
  * value instead of a negative delta.
  *
  * One lag window per key (deterministic (time, id) tie-break) + the
  * usual tumbling-bucket aggregation — both stages partition on the
  * key the tier tables already cluster by. Integer-exact end-to-end.
  */
object Rate {

  /** Adds `increase`: the reset-aware per-sample counter delta (the
    * first sample of a key contributes 0 — no baseline).
    */
  def counterIncrease(df: DataFrame, keyCol: String, timeCol: String,
                      idCol: String, counterCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(timeCol), col(idCol))
    val prev = lag(col(counterCol), 1).over(w)
    df.withColumn("increase",
      when(prev.isNull, 0L)
        .when(col(counterCol) >= prev, col(counterCol) - prev)
        .otherwise(col(counterCol))) // reset: count the post-reset value
  }

  /** Per-(key, bucket) increase + rate in milli-units/second. */
  def perBucket(df: DataFrame, keyCol: String, timeCol: String,
                idCol: String, counterCol: String, tier: TierSpec): DataFrame =
    counterIncrease(df, keyCol, timeCol, idCol, counterCol)
      .groupBy(col(keyCol), Rollup.bucket(col(timeCol), tier))
      .agg(sum(col("increase")).as("increase"),
           count(lit(1)).as("n_samples"))
      // integer DIV, not floor(double /): `/` on longs is double
      // division and loses bits above 2^53, so a >~9e12 bucket
      // increase would diverge from the oracle's integer `//`
      .withColumn("rate_milli",
        expr(s"(increase * 1000) DIV ${tier.seconds}"))
}
