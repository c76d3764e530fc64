package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** One decoded payload's typed metadata (the row shape of
  * [[BatchDecode.decodePartitioned]]).
  */
final case class DecodedFeature(id: Long, byte_len: Long, sha_md5: String,
                                width: Long, height: Long, n_frames: Long)

/** Batched per-partition decode plumbing — the Scala analog of running
  * a decoder as a pandas `mapInPandas` batch UDF: real media decoders
  * (libjpeg/ffmpeg JNI bindings, an ONNX session) carry expensive
  * per-process initialization that a per-row UDF cannot amortize; the
  * right shape is ONE decoder instance per PARTITION, streamed over
  * that partition's rows.
  *
  * This container has no media libraries, so the default
  * [[stubDecoder]] is the deterministic fake (bit-identical to the
  * Column-level [[Multimodal.stubDecode]] — spec-pinned), but the seam
  * is real: `makeDecoder` runs ONCE per partition on the executor
  * (library init goes there), the returned function runs per row, and
  * swapping in a real binding changes no plan, schema, or partitioning.
  *
  * Scale notes: `mapPartitions` is a narrow transformation — no
  * shuffle; decode parallelism equals scan splits. Payload bytes never
  * leave the executor; only the typed metadata row comes back.
  */
object BatchDecode {

  /** A per-partition decoder: payload bytes → metadata (sans id). */
  type Decoder = Array[Byte] => (Long, String, Long, Long, Long)

  /** Deterministic stub decoder — the JVM mirror of
    * [[Multimodal.stubDecode]] (md5-derived pseudo-dimensions), so the
    * batched path is verifiable against the codegen'd Column path.
    */
  def stubDecoder(): Decoder = {
    // per-partition init happens HERE (a real binding would open its
    // native context once); MessageDigest is the stand-in
    val md = java.security.MessageDigest.getInstance("MD5")
    (payload: Array[Byte]) => {
      md.reset()
      val hex = md.digest(payload).map("%02X".format(_)).mkString
      val h60 = java.lang.Long.parseLong(hex.take(15), 16)
      (payload.length.toLong, hex.toLowerCase,
        h60 % 1280L, (h60 >> 11) % 720L, (h60 >> 22) % 100L)
    }
  }

  /** Decode a binary column with one decoder instance per partition.
    * `makeDecoder` must be serializable (it ships to executors); the
    * decoder it builds may hold non-serializable native state.
    */
  def decodePartitioned(df: DataFrame, idCol: String, payloadCol: String,
                        makeDecoder: () => Decoder = () => stubDecoder())
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val decode = makeDecoder() // once per partition
        rows.map { case (id, payload) =>
          val (len, digest, w, h, frames) = decode(payload)
          DecodedFeature(id, len, digest, w, h, frames)
        }
      }
      .toDF("id", "byte_len", "sha_md5", "width", "height", "n_frames")
      .withColumnRenamed("id", idCol)
  }

  /** Deterministic frame sampling over a (stub-)decoded payload: pick
    * ≤ `maxFrames` evenly spaced frame indices of the `n_frames`
    * reported by the decoder — the batch-shape of a video
    * frame-sampler, with the frame EXTRACTION stubbed to the index
    * list (no ffmpeg in this container).
    */
  def sampleFrameIndices(nFrames: Long, maxFrames: Int): Seq[Long] =
    if (nFrames <= 0L) Seq.empty
    else if (nFrames <= maxFrames) 0L until nFrames
    else (0 until maxFrames).map(i => i * nFrames / maxFrames)
}
