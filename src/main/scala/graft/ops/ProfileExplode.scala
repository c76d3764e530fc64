package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Parallel-arrays → rows explode: the reference's single generator op
  * (/root/reference/src/vptstools/vpts.py:108-136 — 16 parallel
  * 25-element variable arrays + broadcast per-profile scalars flattened
  * to one row per level; rendered per vpts_csv.py:198-237).
  *
  * Spark-first shape: `arrays_zip` + `posexplode` — ONE generator node,
  * no join, no shuffle; scalars replicate to every emitted row by plain
  * projection. At 100 TB this is a map-side row multiplier that stays
  * inside whole-stage codegen; the level index is emitted so downstream
  * grids (gap-fill ladders) can key on it.
  */
object ProfileExplode {

  /** Flatten `arrayCols` (parallel, equal-length per row) into one row
    * per index, carrying `scalarCols` through. Adds `idxName` (0-based
    * level index). Arrays shorter than the longest are padded with
    * nulls by `arrays_zip`, and a row whose arrays are all null/empty
    * still emits ONE row (null index, null measures) via the OUTER
    * generator — mirroring the reference's fixed ladder where absent
    * variables are missing values, never dropped rows/profiles.
    */
  def explodeParallel(df: DataFrame, arrayCols: Seq[String],
                      scalarCols: Seq[String],
                      idxName: String = "level_idx"): DataFrame = {
    require(arrayCols.nonEmpty, "need at least one array column")
    val zipped = arrays_zip(arrayCols.map(col): _*)
    df.select(scalarCols.map(col) :+
        posexplode_outer(zipped).as(Seq(idxName, "_z")): _*)
      .select(scalarCols.map(col) ++
        (col(idxName) +: arrayCols.map(c => col(s"_z.$c").as(c))): _*)
  }
}
