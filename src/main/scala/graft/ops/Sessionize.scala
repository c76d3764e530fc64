package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: consecutive events of one key belong to
  * the same session while the inter-event gap stays ≤ `gapSeconds`; a
  * larger gap opens a new session. The classic batch formulation —
  * one window per key ordered by (time, id): a `lag` marks session
  * starts, a running `sum` over the markers numbers the sessions —
  * ONE exchange + one sort, no self-join, no iteration.
  *
  * The id column is the deterministic tie-break (events at the same
  * instant sort stably and always share a session — their gap is 0).
  *
  * Scale shape: identical to every other per-key window here — the
  * exchange partitions by key; for Zipf-head keys apply the same
  * (key, coarse bucket) two-phase split as [[AsofJoin.backwardBucketed]]
  * if a single key's stream outgrows a task.
  */
object Sessionize {

  /** Adds `session_seq` (1-based per key, in time order). */
  def assign(df: DataFrame, keyCol: String, timeCol: String, idCol: String,
             gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(timeCol), col(idCol))
    val prev = lag(col(timeCol), 1).over(w)
    df.withColumn("_new",
        when(prev.isNull || col(timeCol) - prev > gapSeconds, 1L)
          .otherwise(0L))
      .withColumn("session_seq",
        sum(col("_new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_new")
  }

  /** Per-session stats: bounds, event count, duration. */
  def stats(df: DataFrame, keyCol: String, timeCol: String, idCol: String,
            gapSeconds: Long): DataFrame =
    assign(df, keyCol, timeCol, idCol, gapSeconds)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
           min(col(timeCol)).as("start_epoch"),
           max(col(timeCol)).as("end_epoch"))
      .withColumn("duration_s", col("end_epoch") - col("start_epoch"))

  /** DuckDB mirror of [[stats]] over a FROM-able `sel` exposing
    * (keyCol, timeCol, idCol).
    */
  def statsOracleSql(sel: String, keyCol: String, timeCol: String,
                     idCol: String, gapSeconds: Long): String =
    s"""WITH ev AS ($sel),
       |marked AS (
       |  SELECT $keyCol, $timeCol, $idCol,
       |         CASE WHEN lag($timeCol) OVER w IS NULL
       |                OR $timeCol - lag($timeCol) OVER w > $gapSeconds
       |              THEN 1 ELSE 0 END AS newsess
       |  FROM ev
       |  WINDOW w AS (PARTITION BY $keyCol ORDER BY $timeCol, $idCol)
       |),
       |assigned AS (
       |  SELECT $keyCol, $timeCol,
       |         sum(newsess) OVER (PARTITION BY $keyCol ORDER BY $timeCol, $idCol
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
       |  FROM marked
       |)
       |SELECT $keyCol, CAST(session_seq AS BIGINT) AS session_seq,
       |       CAST(count(*) AS BIGINT) AS n_events,
       |       min($timeCol) AS start_epoch,
       |       max($timeCol) AS end_epoch,
       |       max($timeCol) - min($timeCol) AS duration_s
       |FROM assigned GROUP BY 1, 2""".stripMargin
}
