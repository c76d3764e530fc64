package graft.ops

import graft.SparkSuite
import graft.core.TierSpec
import graft.ingest.WebPages
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mergeability of the HLL sketch tier: cascading unions must equal a
  * direct sketch of the whole window, register-for-register.
  */
class SketchesSpec extends AnyFunSuite with SparkSuite {

  private lazy val pages = WebPages.load(spark, sfDir).cache()

  test("cascaded sketch estimate == direct sketch estimate (lossless merge)") {
    val cascaded = Sketches.estimated(
      Sketches.cascade(
        Sketches.cascade(Sketches.fromRaw(pages, TierSpec.T5m), TierSpec.T1h),
        TierSpec.T1d))
      .select("domain", "bucket_epoch", "distinct_est")
    val direct = Sketches.estimated(Sketches.fromRaw(pages, TierSpec.T1d))
      .select("domain", "bucket_epoch", "distinct_est")
    assert(cascaded.exceptAll(direct).isEmpty &&
           direct.exceptAll(cascaded).isEmpty)
  }

  test("estimates are within 5% of exact distinct counts") {
    val est = Sketches.estimated(Sketches.fromRaw(pages, TierSpec.T1d))
    val exact = pages
      .groupBy(col("domain"), Rollup.bucket(col("warc_epoch"), TierSpec.T1d))
      .agg(countDistinct(col("url")).as("exact"))
    val bad = est.join(exact, Seq("domain", "bucket_epoch"))
      .filter(abs(col("distinct_est") - col("exact")) >
              col("exact") * 0.05 + lit(1))
    assert(bad.isEmpty)
  }
}
