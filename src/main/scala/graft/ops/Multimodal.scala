package graft.ops

import graft.functions.Portable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video payloads as
  * opaque `binary` columns with typed metadata, and run decode /
  * feature-extraction as batched per-partition transforms.
  *
  * The actual media decode is STUBBED (this container has no image or
  * audio libraries): [[stubDecode]] derives deterministic pseudo-
  * metadata from the payload digest. Everything around the stub — the
  * binary schema, the batch shape, the feature struct, partitioning —
  * is real and tested; swapping [[stubDecode]] for a real decoder does
  * not change the plan.
  *
  * Scale notes: feature extraction is a narrow projection over the
  * binary column; at 100 TB it runs at scan speed with the payload
  * column pruned everywhere it is not needed.
  */
object Multimodal {

  /** Typed metadata extracted per payload. */
  val featureSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType, nullable = false),
    StructField("sha_md5", StringType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = false)))

  /** STUB decode: deterministic fake dimensions from the payload digest
    * (width ∈ [0,1280), height ∈ [0,720), frames ∈ [0,100)). Replace
    * with a real decoder to go from fake to real metadata; the plan and
    * schema stay identical.
    */
  def stubDecode(payload: Column): Column = {
    val digest60 = Portable.hash60(payload)
    struct(
      length(payload).cast("long").as("byte_len"),
      md5(payload).as("sha_md5"),
      (digest60 % 1280L).as("width"),
      (shiftright(digest60, 11) % 720L).as("height"),
      (shiftright(digest60, 22) % 100L).as("n_frames"))
  }

  /** Feature-extract a binary column into the typed metadata struct. */
  def extractFeatures(df: DataFrame, idCol: String,
                      payloadCol: String): DataFrame =
    df.select(col(idCol), stubDecode(col(payloadCol)).as("f"))
      .select(col(idCol), col("f.byte_len"), col("f.sha_md5"),
              col("f.width"), col("f.height"), col("f.n_frames"))

  /** DuckDB oracle: recomputes the stub from the payload's known
    * construction (`payloadExpr` must rebuild the same bytes as a
    * VARCHAR — md5 of equal bytes is equal).
    */
  def oracleSql(fromCte: String, table: String, idCol: String,
                payloadExpr: String): String = {
    val d = Portable.hash60Sql(payloadExpr)
    s"""$fromCte
       |SELECT $idCol,
       |       CAST(length($payloadExpr) AS BIGINT) AS byte_len,
       |       md5($payloadExpr) AS sha_md5,
       |       CAST($d % 1280 AS BIGINT) AS width,
       |       CAST(($d // 2048) % 720 AS BIGINT) AS height,
       |       CAST(($d // 4194304) % 100 AS BIGINT) AS n_frames
       |FROM $table""".stripMargin
  }
}
