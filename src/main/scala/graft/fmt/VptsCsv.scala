package graft.fmt

import graft.core.Flag
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Versioned VPTS-CSV-style rendering ruleset.
  *
  * Mirrors the reference's `AbstractVptsCsv` / `VptsCsvV1` registry
  * (/root/reference/src/vptstools/vpts_csv.py:164-295 — versioned
  * nodata/undetect sentinels, ordered column mapping, typed sort spec,
  * source-file regex) re-expressed as typed Columns: data stays typed
  * through the whole plan and is stringified only here at the sink —
  * the inverse of the reference's all-string internal frames
  * (vpts.py:123), chosen so Catalyst sees real types everywhere.
  */
sealed trait VptsCsvVersion {
  def version: String
  /** Rendering of the two missing states (vpts_csv.py:243-251). */
  def nodata: String
  def undetect: String
  /** v1 source_file gate: forbids leading /, ./ and any ".."
    * (vpts_csv.py:241).
    */
  def sourceFileRegex: String
}

case object VptsCsvV1 extends VptsCsvVersion {
  val version = "v1.0"
  val nodata = ""
  val undetect = "NaN"
  val sourceFileRegex = "^(?=^[^./~])(^((?!\\.{2}).)*$).*$"
}

/** Unknown-version error, mirroring VptsCsvVersionError
  * (vpts_csv.py:7-10).
  */
final class VptsCsvVersionError(v: String)
  extends IllegalArgumentException(s"unknown VPTS CSV version: $v")

object VptsCsv {

  /** Version registry (vpts_csv.py:142-161). */
  def version(v: String): VptsCsvVersion = v match {
    case "v1.0" => VptsCsvV1
    case other  => throw new VptsCsvVersionError(other)
  }

  /** P1 — ISO-8601 UTC render, `%Y-%m-%dT%H:%M:%SZ`
    * (vpts_csv.py:18-37).
    */
  def iso8601(ts: Column): Column =
    date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'")

  /** P2 — int-or-nodata: "0"/"NULL" map to the nodata sentinel, other
    * strings must parse as int; unparseable input raises, matching the
    * reference's bare `int(value)` ValueError (vpts_csv.py:40-74) —
    * never silently nulled. Parsed as LONG so any digit string up to
    * 19 digits round-trips (an `int` cast would overflow at 2^31;
    * beyond-long digit strings raise under ANSI arithmetic rather than
    * nulling — the reference's arbitrary-precision `int()` has no
    * fixed-width Spark equivalent, so the ceiling is explicit).
    */
  def intToNodata(c: Column, v: VptsCsvVersion = VptsCsvV1): Column =
    when(c.isin("0", "NULL"), lit(v.nodata))
      .when(c.rlike("^[+-]?[0-9]+$"), c.cast("long").cast("string"))
      .otherwise(raise_error(concat(lit("not an integer value: "),
                                    coalesce(c, lit("null")))))

  /** P3 — strict 1/0 → TRUE/FALSE (vpts_csv.py:76-94); other values
    * raise, matching the reference's KeyError.
    */
  def numberToBoolStr(c: Column): Column =
    when(c === 1, "TRUE").when(c === 0, "FALSE")
      .otherwise(raise_error(concat(lit("not a boolean value: "),
                                    c.cast("string"))))

  /** P4 — provenance regex gate (vpts_csv.py:97-129): pass value
    * through, raise on violation.
    */
  def checkSourceFile(c: Column, v: VptsCsvVersion = VptsCsvV1): Column =
    when(c.rlike(v.sourceFileRegex), c)
      .otherwise(raise_error(concat(lit("source_file not matching regex: "), c)))

  /** P5 — coordinate rounding (vpts_csv.py:288-291). */
  def round6(c: Column): Column = round(c, 6)

  /** Two-state missingness render: null+NODATA → nodata sentinel,
    * null+UNDETECT → undetect sentinel (vpts.py:17-18,65-66;125-127).
    */
  def renderValue(value: Column, flag: Column,
                  v: VptsCsvVersion = VptsCsvV1): Column =
    when(flag === Flag.NODATA, lit(v.nodata))
      .when(flag === Flag.UNDETECT, lit(v.undetect))
      .otherwise(value.cast("string"))

  /** O1 — typed multi-key total sort: radar/series lexical, datetime
    * lexical (ISO-8601 sorts correctly), height/bucket numeric,
    * source_file lexical (vpts.py:130-134, 270-274;
    * vpts_csv.py:254-256). Range-partitioned global SortExec — the
    * distributed replacement of the reference's driver-side
    * `sort_values`.
    */
  def sortSpec(df: DataFrame, series: String, datetime: String,
               numericKey: String, sourceFile: String): DataFrame =
    df.orderBy(col(series), col(datetime),
               col(numericKey).cast("long"), col(sourceFile))

  /** Deterministic single-file CSV sink for golden comparisons
    * (vpts.py:278-294: comma, utf-8, no index; our analog adds
    * coalesce(1) so bytes are stable).
    */
  def writeGolden(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite")
      .option("header", "true")
      .option("emptyValue", "")
      .option("nullValue", "")
      .csv(path)

  /** K2 — gzipped (monthly-rollup-style) CSV sink, the distributed
    * analog of the reference's `.csv.gz` concatenated monthly files
    * (bin/vph5_to_vpts.py:241-245; s3.py:122-153 naming): same render
    * ruleset, gzip codec, one file per partition of `df` (coalesce
    * upstream for the single-file case).
    */
  def writeGzip(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("emptyValue", "")
      .option("nullValue", "")
      .option("compression", "gzip")
      .csv(path)
}
