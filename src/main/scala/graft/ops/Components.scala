package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over near-duplicate candidate pairs — the step
  * between "pairs" and "keep one document per duplicate cluster": every
  * node gets its component's minimum id as `cluster_id`, so the
  * canonical representative (the min) and the drop set (everyone else)
  * fall out of one column.
  *
  * Algorithm: iterative min-label propagation WITH pointer jumping —
  * each round every node takes the min of (its label, its neighbors'
  * labels), then labels are compressed one hop (l ← label(l)). Plain
  * propagation needs O(diameter) rounds; the jump halves remaining
  * chain lengths each round (O(log d)). Near-dup clusters are
  * near-cliques (diameter ≈ 2), so real corpora converge in 2-3
  * rounds; the loop stops at the fixpoint, detected by the strictly
  * decreasing Σlabels (a cheap aggregate on the already-materialized
  * frame — labels only ever decrease, so equal sums ⇒ fixpoint).
  *
  * Scale shape: per round, one shuffle of |edges| (neighbor join), one
  * of |nodes| (min-agg), one small self-join for the jump;
  * `localCheckpoint` cuts the lineage so round N's plan never replays
  * rounds 1…N−1 (the classic iterative-DataFrame trap). Edges are
  * persisted for the loop and unpersisted before returning — the
  * consuming actions all happen inside the operator, so no cache
  * handle leaks to the caller.
  */
object Components {

  /** (node, cluster_id) for every node appearing in `pairs`;
    * cluster_id = the component's minimum node id.
    */
  def connected(pairs: DataFrame, aCol: String, bCol: String,
                maxIter: Int = 25): DataFrame = {
    val edges = pairs.select(col(aCol).as("s"), col(bCol).as("d"))
      .unionByName(pairs.select(col(bCol).as("s"), col(aCol).as("d")))
      .distinct()
      .persist()
    try {
      // Σlabels as decimal(38): the fixpoint detector must not ANSI-
      // overflow when ids are large (1e12 ids × 1e12 nodes > 2^63)
      def labelSum(df: DataFrame): java.math.BigDecimal =
        df.agg(org.apache.spark.sql.functions.sum(
          col("l").cast("decimal(38,0)"))).head().getDecimal(0)
      var labels = edges.select(col("s").as("v")).distinct()
        .withColumn("l", col("v"))
        .localCheckpoint()
      var sum = labelSum(labels)
      var converged = false
      var iter = 0
      while (!converged && iter < maxIter) {
        // min over (own label, neighbor labels) — join+agg, not a
        // union: a union whose second branch derives from the first
        // trips Union constraint rewriting in the analyzer
        val nbrMin = edges
          .join(labels.select(col("v").as("_s"), col("l").as("_sl")),
                col("s") === col("_s"))
          .groupBy(col("d")).agg(min(col("_sl")).as("_nl"))
        val m = labels
          .join(nbrMin, labels("v") === nbrMin("d"), "left")
          .select(col("v"), least(col("l"), coalesce(col("_nl"), col("l"))).as("l"))
        // pointer jump: l ← label(l)
        val jumped = m.as("x")
          .join(m.select(col("v").as("_lv"), col("l").as("_ll")),
                col("x.l") === col("_lv"), "left")
          .select(col("x.v").as("v"), coalesce(col("_ll"), col("x.l")).as("l"))
          .localCheckpoint()
        val newSum = labelSum(jumped)
        converged = newSum.compareTo(sum) == 0
        sum = newSum
        labels = jumped
        iter += 1
      }
      labels.select(col("v"), col("l").as("cluster_id"))
    } finally edges.unpersist()
  }

  /** DuckDB mirror: reachability closure via a recursive CTE, min
    * reachable id per node. `pairsSel` is a FROM-able subselect
    * exposing (aCol, bCol).
    */
  def connectedOracleSql(pairsSel: String, aCol: String, bCol: String,
                         vName: String = "v"): String =
    s"""WITH RECURSIVE
       |p AS ($pairsSel),
       |edges AS (SELECT $aCol AS s, $bCol AS d FROM p
       |          UNION SELECT $bCol, $aCol FROM p),
       |nodes AS (SELECT DISTINCT s AS v FROM edges),
       |walk(v, l) AS (
       |  SELECT v, v FROM nodes
       |  UNION
       |  SELECT e.d, walk.l FROM edges e JOIN walk ON e.s = walk.v
       |)
       |SELECT v AS $vName, CAST(min(l) AS BIGINT) AS cluster_id
       |FROM walk GROUP BY v""".stripMargin
}
