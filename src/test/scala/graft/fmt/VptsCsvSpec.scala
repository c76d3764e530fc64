package graft.fmt

import graft.SparkSuite
import graft.core.Flag
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests of the versioned render ruleset — mirrors the
  * reference's per-scalar tests (tests/test_vpts_csv.py:25-113).
  */
class VptsCsvSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("version registry returns v1.0 and raises on unknown (vpts_csv.py:142-161)") {
    assert(VptsCsv.version("v1.0") == VptsCsvV1)
    intercept[VptsCsvVersionError](VptsCsv.version("v0.9"))
  }

  test("iso8601 renders UTC with Z suffix (P1)") {
    val out = Seq("2023-03-11 23:45:06").toDF("s")
      .select(VptsCsv.iso8601(col("s").cast("timestamp"))).head().getString(0)
    assert(out == "2023-03-11T23:45:06Z")
  }

  test("intToNodata maps 0/NULL to nodata, parses ints (P2; vol2bird#198)") {
    val rows = Seq("0", "NULL", "12", "170").toDF("v")
      .select(VptsCsv.intToNodata(col("v")).as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(rows == Seq("", "", "12", "170"))
  }

  test("intToNodata raises on unparseable input (P2 strict; vpts_csv.py:74)") {
    intercept[Exception] {
      Seq("garbage").toDF("v").select(VptsCsv.intToNodata(col("v"))).collect()
    }
  }

  test("numberToBoolStr strict mapping raises on non-boolean (P3)") {
    val ok = Seq(1, 0).toDF("v")
      .select(VptsCsv.numberToBoolStr(col("v"))).collect().map(_.getString(0))
    assert(ok.toSeq == Seq("TRUE", "FALSE"))
    intercept[Exception] {
      Seq(2).toDF("v").select(VptsCsv.numberToBoolStr(col("v"))).collect()
    }
  }

  test("checkSourceFile rejects path escapes (P4, v1 regex)") {
    val good = Seq("bejab_vp_20221111T233000Z_0x9.h5")
    val bad = Seq("/etc/passwd", "./x.h5", "a/../b.h5", "~home.h5")
    for (s <- good)
      assert(Seq(s).toDF("f").select(VptsCsv.checkSourceFile(col("f")))
        .head().getString(0) == s)
    for (s <- bad)
      intercept[Exception] {
        Seq(s).toDF("f").select(VptsCsv.checkSourceFile(col("f"))).collect()
      }
  }

  test("path→source_file provenance hook feeds the regex gate (P12)") {
    // the Spark analog of the reference's file_name_function hook
    // (vpts.py:241-249): derive source_file from the scan's actual
    // input path and pass it through the v1 provenance gate
    val src = spark.read.parquet(s"$sfDir/events.parquet")
      .select(regexp_extract(input_file_name(), "([^/]+?)(\\.parquet)?$", 1)
        .as("source_file"))
      .distinct()
      .select(VptsCsv.checkSourceFile(col("source_file")))
    assert(src.collect().map(_.getString(0)).toSeq == Seq("events"))
  }

  test("renderValue: two-state missingness survives to the sink (vpts.py:17-18)") {
    val df = Seq(
      (Some(5.3), Flag.OK),
      (None: Option[Double], Flag.NODATA),
      (None: Option[Double], Flag.UNDETECT)).toDF("v", "f")
    val out = df.select(VptsCsv.renderValue(col("v"), col("f")))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("5.3", "", "NaN"))
  }

  test("sortSpec orders numerically on the numeric key (O1)") {
    val df = Seq(("r", "2023", "1000", "f"), ("r", "2023", "200", "f"),
                 ("r", "2023", "0", "f"))
      .toDF("radar", "dt", "height", "src")
    val hs = VptsCsv.sortSpec(df, "radar", "dt", "height", "src")
      .collect().map(_.getString(2)).toSeq
    assert(hs == Seq("0", "200", "1000")) // numeric, not lexicographic
  }

  test("sort is idempotent (tests/test_vpts.py:93-107 analog)") {
    val df = graft.ingest.WebPages.load(spark, sfDir)
      .select(col("domain"), VptsCsv.iso8601(col("warc_ts")).as("dt"),
              col("n_chars").cast("string").as("h"), col("url"))
    val once = VptsCsv.sortSpec(df, "domain", "dt", "h", "url")
      .collect().map(_.toString).toSeq
    val twice = VptsCsv.sortSpec(
      VptsCsv.sortSpec(df, "domain", "dt", "h", "url"),
      "domain", "dt", "h", "url").collect().map(_.toString).toSeq
    assert(once == twice)
  }
}
