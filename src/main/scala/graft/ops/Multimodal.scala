package graft.ops

import graft.functions.Portable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video payloads as
  * opaque `binary` columns with typed metadata, and run decode /
  * feature-extraction as batched per-partition transforms.
  *
  * Decode tiers:
  *  - [[decodeBmp]] — a REAL container-format decoder: BMP
  *    (BITMAPINFOHEADER) width/height/bpp parsed from raw little-endian
  *    header bytes with Spark built-ins only (hex/substring/conv) — no
  *    media library required, fully codegen'd, oracle-gated.
  *  - [[decodePng]] — second REAL container: PNG IHDR width/height/
  *    bit-depth/color-type, big-endian (the same byte-level built-ins
  *    with the byte order flipped).
  *  - [[stubDecode]] — the deep pixel/sample decode is STUBBED (this
  *    container has no image or audio libraries): deterministic pseudo-
  *    metadata from the payload digest. Everything around the stub —
  *    the binary schema, the batch shape, the feature struct,
  *    partitioning — is real and tested; swapping it for a real pixel
  *    decoder does not change the plan.
  *
  * [[extractFeatures]] routes by container magic: payloads whose magic
  * matches a real decoder get REAL metadata; only unknown formats fall
  * back to the stub (and are labeled so in the `kind` column).
  *
  * Scale notes: feature extraction is a narrow projection over the
  * binary column; at 100 TB it runs at scan speed with the payload
  * column pruned everywhere it is not needed.
  */
object Multimodal {

  /** Little-endian unsigned int read from a binary column: `nBytes`
    * starting at 1-based `off`. hex() of each byte, reassembled
    * most-significant-first, parsed base-16 — pure built-ins, codegen'd.
    */
  def leUint(bin: Column, off: Int, nBytes: Int): Column =
    conv(concat((nBytes - 1 to 0 by -1).map(i =>
      hex(substring(bin, off + i, 1))): _*), 16, 10).cast("long")

  /** Hex string of a long as `nBytes` little-endian bytes (builder side
    * of [[leUint]]; used to synthesize test payloads engine-side).
    */
  def leHex(v: Column, nBytes: Int): Column = {
    val be = lpad(hex(v), nBytes * 2, "0")
    concat((nBytes - 1 to 0 by -1).map(i => substring(be, i * 2 + 1, 2)): _*)
  }

  /** Big-endian unsigned int read (PNG byte order): hex of the `nBytes`
    * at 1-based `off`, parsed base-16 — pure built-ins, codegen'd.
    */
  def beUint(bin: Column, off: Int, nBytes: Int): Column =
    conv(hex(substring(bin, off, nBytes)), 16, 10).cast("long")

  /** Hex string of a long as `nBytes` big-endian bytes. */
  def beHex(v: Column, nBytes: Int): Column = lpad(hex(v), nBytes * 2, "0")

  /** Synthesize a minimal BMP (BITMAPINFOHEADER) header as a binary
    * column — 'BM' magic, width/height/bpp in their real byte offsets.
    */
  def syntheticBmp(width: Column, height: Column,
                   bpp: Column = lit(24L)): Column =
    unhex(concat(
      lit("424D"),            // 'BM'
      leHex(lit(70L), 4),     // file size (toy)
      lit("00000000"),        // reserved
      leHex(lit(54L), 4),     // pixel-data offset
      leHex(lit(40L), 4),     // DIB header size
      leHex(width, 4),        // biWidth  (LE, offset 19 1-based)
      leHex(height, 4),       // biHeight (LE, offset 23)
      leHex(lit(1L), 2),      // planes
      leHex(bpp, 2)))         // bits per pixel (offset 29)

  /** Parsed BMP header fields. */
  val bmpSchema: StructType = StructType(Seq(
    StructField("width", LongType), StructField("height", LongType),
    StructField("bpp", LongType)))

  /** Signed 32-bit reinterpretation of a 4-byte little-endian read:
    * BITMAPINFOHEADER's biHeight is SIGNED (negative = top-down row
    * order), so the high bit means −(2^32 − v), not a value near 2^32.
    */
  private def asInt32(u: Column): Column =
    when(u >= lit(1L << 31), u - lit(1L << 32)).otherwise(u)

  /** REAL decode: BMP header fields from raw bytes. Non-BMP payloads
    * (wrong magic or truncated header) decode to null — the quarantine
    * channel decides their fate, the decoder never throws. `height` is
    * signed per the spec: a top-down BMP decodes to its negative
    * height (consumers take `abs` for the pixel-row count).
    */
  def decodeBmp(payload: Column): Column =
    when(hex(substring(payload, 1, 2)) === "424D" &&
         length(payload) >= 30,
      struct(
        leUint(payload, 19, 4).as("width"),
        asInt32(leUint(payload, 23, 4)).as("height"),
        leUint(payload, 29, 2).as("bpp")))
      .otherwise(lit(null).cast(bmpSchema))

  /** Synthesize a minimal PNG: 8-byte signature + a complete IHDR chunk
    * (length, type, 13 data bytes, zeroed CRC) — 33 bytes, width/height/
    * depth/color in their real big-endian offsets.
    */
  def syntheticPng(width: Column, height: Column,
                   bitDepth: Column = lit(8L),
                   colorType: Column = lit(2L)): Column =
    unhex(concat(
      lit("89504E470D0A1A0A"),  // PNG signature
      beHex(lit(13L), 4),       // IHDR data length
      lit("49484452"),          // 'IHDR'
      beHex(width, 4),          // width  (BE, offset 17 1-based)
      beHex(height, 4),         // height (BE, offset 21)
      beHex(bitDepth, 1),       // bit depth (offset 25)
      beHex(colorType, 1),      // color type (offset 26)
      lit("000000"),            // compression, filter, interlace
      lit("00000000")))         // CRC (unchecked by the header decode)

  /** Parsed PNG IHDR fields. */
  val pngSchema: StructType = StructType(Seq(
    StructField("width", LongType), StructField("height", LongType),
    StructField("bit_depth", LongType), StructField("color_type", LongType)))

  /** REAL decode: PNG IHDR fields from raw bytes (signature + 'IHDR'
    * chunk type verified; big-endian reads). Non-PNG payloads decode to
    * null — quarantine decides, the decoder never throws.
    */
  def decodePng(payload: Column): Column =
    when(hex(substring(payload, 1, 8)) === "89504E470D0A1A0A" &&
         hex(substring(payload, 13, 4)) === "49484452" &&
         length(payload) >= 26,
      struct(
        beUint(payload, 17, 4).as("width"),
        beUint(payload, 21, 4).as("height"),
        beUint(payload, 25, 1).as("bit_depth"),
        beUint(payload, 26, 1).as("color_type")))
      .otherwise(lit(null).cast(pngSchema))

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

  /** Feature-extract a binary column into typed metadata, routed by
    * container magic: BMP and PNG payloads get their REAL header
    * dimensions (one decoded frame; BMP height is |signed| — top-down
    * rows don't change the pixel-row count); unknown formats fall back
    * to [[stubDecode]] and say so in `kind`. One narrow codegen'd
    * projection either way.
    */
  def extractFeatures(df: DataFrame, idCol: String,
                      payloadCol: String): DataFrame = {
    val p = col(payloadCol)
    val routed = df.select(col(idCol),
      decodeBmp(p).as("_bmp"), decodePng(p).as("_png"),
      stubDecode(p).as("_stub"), length(p).cast("long").as("byte_len"),
      md5(p).as("sha_md5"))
    routed.select(
      col(idCol), col("byte_len"), col("sha_md5"),
      when(col("_bmp").isNotNull, col("_bmp.width"))
        .when(col("_png").isNotNull, col("_png.width"))
        .otherwise(col("_stub.width")).as("width"),
      when(col("_bmp").isNotNull, abs(col("_bmp.height")))
        .when(col("_png").isNotNull, col("_png.height"))
        .otherwise(col("_stub.height")).as("height"),
      when(col("_bmp").isNotNull || col("_png").isNotNull, lit(1L))
        .otherwise(col("_stub.n_frames")).as("n_frames"),
      when(col("_bmp").isNotNull, lit("bmp"))
        .when(col("_png").isNotNull, lit("png"))
        .otherwise(lit("unknown")).as("kind"))
  }

}
