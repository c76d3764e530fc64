package graft.fmt

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Full ODIM HDF5 file-name parser — the reference's ACTUAL regex
  * semantics (/root/reference/src/vptstools/s3.py:100-108), not just the
  * canonical shape the engine's own generators emit:
  *
  *   `.*([a-zA-Z]{5})_([a-z]*)_(dddd)(dd)(dd)T?(dd)(dd).*\.h5`
  *
  *  - MIXED-CASE radar codes accepted, lowercased on parse (the legacy
  *    `NLDBL_vp_20080215T0000_NL50_v0-3-20.h5` inventory shape),
  *  - a `data_type` capture (`vp`, …),
  *  - the `T` date/time separator is OPTIONAL,
  *  - arbitrary `extra` suffixes (seconds, `Z`, checksums, version
  *    tags) are tolerated and ignored,
  *  - any parent path is skipped by the greedy prefix; `file_name` is
  *    the basename.
  *
  * Engine parity: Java (Spark `regexp_extract`) and RE2 (DuckDB) both
  * reproduce Python `re.match`'s greedy submatches for this pattern —
  * verified over all 6 reference test variants of
  * /root/reference/tests/test_s3.py:19-111 by the `filename_parse`
  * oracle query. Non-matching names are gated out with [[isValid]]
  * (the engine-side analog of the reference's ValueError — F1
  * quarantine semantics, not an exception per row).
  *
  * Everything here is a codegen'd narrow projection: parsing 10^12
  * inventory keys is scan-speed map work, no shuffle.
  */
object OdimPath {

  /** The reference regex, verbatim (s3.py:105-107). */
  val Re: String =
    ".*([a-zA-Z]{5})_([a-z]*)_(\\d\\d\\d\\d)(\\d\\d)(\\d\\d)T?(\\d\\d)(\\d\\d).*\\.h5"

  /** The 6 parametrized file-path variants of the reference's parser
    * test (/root/reference/tests/test_s3.py:19-111) — seconds+Z extras,
    * checksum suffixes, the legacy mixed-case
    * `NLDBL_vp_20080215T0000_NL50_v0-3-20.h5` uva shape — plus one
    * invalid name (the reference raises ValueError; the engine's
    * regex gate quarantines it). The `filename_parse` oracle query
    * parses all of them on both engines.
    */
  val ReferenceVariants: Seq[String] = Seq(
    "baltrad/hdf5/fivan/2016/10/25/fivan_vp_20161025T2100Z_0x7_147742969449.h5",
    "baltrad/hdf5/fiuta/2021/11/14/fiuta_vp_20211114T214500Z_0xb.h5",
    "baltrad/hdf5/seang/2017/01/20/seang_vp_20170120T2115Z_0xf3fc7b_148494821853.h5",
    "baltrad/hdf5/searl/2016/12/31/searl_vp_20161231T2030Z_0x5_148321870475.h5",
    "baltrad/hdf5/plrze/2020/10/27/plrze_vp_20201027T172000Z_0x9.h5",
    "uva/hdf5/2008/02/15/NLDBL_vp_20080215T0000_NL50_v0-3-20.h5",
    "not a valid file name")

  /** Valid ODIM file name (the rows [[parse]] columns are defined on). */
  def isValid(path: Column): Column = path.rlike(Re)

  def radarCode(path: Column): Column = lower(regexp_extract(path, Re, 1))
  def dataType(path: Column): Column = regexp_extract(path, Re, 2)
  def year(path: Column): Column = regexp_extract(path, Re, 3)
  def month(path: Column): Column = regexp_extract(path, Re, 4)
  def day(path: Column): Column = regexp_extract(path, Re, 5)
  def hour(path: Column): Column = regexp_extract(path, Re, 6)
  def minute(path: Column): Column = regexp_extract(path, Re, 7)

  /** Basename (the reference returns `Path(file_name).name`). */
  def fileName(path: Column): Column = element_at(split(path, "/"), -1)

  /** First 2 letters of the radar code (s3.py:113-115). */
  def country(path: Column): Column = substring(radarCode(path), 1, 2)

  /** Last 3 letters of the radar code (s3.py:117-120). */
  def radar(path: Column): Column = substring(radarCode(path), 3, 3)

  /** All parsed components as named columns, in the reference's return
    * order (radar_code, data_type, year, month, day, hour, minute,
    * file_name) plus the derived country/radar split.
    *
    * ONE regex execution per row, not one per field: the match is
    * rendered once as all 7 groups joined on an unlikely delimiter
    * (`regexp_replace` + split; a trailing delimiter isolates any
    * unmatched suffix into a discarded 8th slot), and every output
    * column indexes the same array — whole-stage codegen's
    * subexpression elimination evaluates the shared parse once. The
    * per-field accessors above stay regexp_extract for ad-hoc use;
    * `filename_parse` pins both shapes equal against the oracle's
    * per-group extraction.
    */
  def parse(path: Column): Seq[Column] = {
    val delim = "\u0001"
    val g = split(
      regexp_replace(path, Re, (1 to 7).map("$" + _).mkString(delim) + delim),
      delim)
    val rc = lower(g.getItem(0))
    Seq(
      rc.as("radar_code"),
      g.getItem(1).as("data_type"),
      g.getItem(2).as("year"), g.getItem(3).as("month"),
      g.getItem(4).as("day"),
      g.getItem(5).as("hour"), g.getItem(6).as("minute"),
      fileName(path).as("file_name"),
      substring(rc, 1, 2).as("country"),
      substring(rc, 3, 3).as("radar"))
  }

  /** DuckDB mirror of [[parse]] over a path expression (RE2 reproduces
    * the greedy submatches — pinned by the `filename_parse` oracle).
    */
  def parseSql(pathExpr: String): String = {
    // the Scala literal already holds single-backslash `\d`s — embed as-is
    val re = s"'$Re'"
    s"""lower(regexp_extract($pathExpr, $re, 1)) AS radar_code,
       |regexp_extract($pathExpr, $re, 2) AS data_type,
       |regexp_extract($pathExpr, $re, 3) AS year,
       |regexp_extract($pathExpr, $re, 4) AS month,
       |regexp_extract($pathExpr, $re, 5) AS day,
       |regexp_extract($pathExpr, $re, 6) AS hour,
       |regexp_extract($pathExpr, $re, 7) AS minute,
       |string_split($pathExpr, '/')[-1] AS file_name,
       |substring(lower(regexp_extract($pathExpr, $re, 1)), 1, 2) AS country,
       |substring(lower(regexp_extract($pathExpr, $re, 1)), 3, 3) AS radar""".stripMargin
  }

  def isValidSql(pathExpr: String): String =
    s"regexp_matches($pathExpr, '$Re')"
}
