package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: match every left row whose
  * `timeCol` falls inside a right-side interval `[startCol, endCol)`
  * with the same key — "which campaign/outage/window was this event
  * in".
  *
  * Spark plans a raw `t >= start AND t < end` predicate as a non-equi
  * join: broadcast if one side is small, else a quadratic-per-key
  * nested loop. This composition makes it an EQUI join: each interval
  * is decomposed into the `grainSeconds` tumbling buckets it overlaps
  * (one generator), each left row carries its own bucket, the join key
  * becomes (key…, bucket), and exact containment is a post-join
  * filter. A left row meets an interval in exactly one bucket (its
  * own), so no dedup is needed. At 100 TB the shuffle carries
  * |left| + |right|·(avg interval width ÷ grain) rows — pick the grain
  * near the typical interval width to keep the blow-up ≈ 1.
  */
object RangeJoin {

  def contains(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               timeCol: String, startCol: String, endCol: String,
               grainSeconds: Long): DataFrame = {
    require(grainSeconds > 0, "grain must be positive")
    def bucketOf(c: Column): Column = c - pmod(c, lit(grainSeconds))
    // empty/inverted intervals (end <= start) match nothing by the
    // containment predicate — drop them BEFORE the bucket sequence,
    // whose inverted bounds would otherwise throw at runtime and fail
    // the whole job for one degenerate right row
    val r = right.filter(col(endCol) > col(startCol)).withColumn("_b",
      explode(sequence(bucketOf(col(startCol)),
                       bucketOf(col(endCol) - 1),
                       lit(grainSeconds))))
    val l = left.withColumn("_b", bucketOf(col(timeCol)))
    l.join(r, keyCols :+ "_b")
      .filter(col(timeCol) >= col(startCol) && col(timeCol) < col(endCol))
      .drop("_b")
  }
}
