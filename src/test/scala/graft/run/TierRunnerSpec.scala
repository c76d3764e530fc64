package graft.run

import java.nio.file.Files

import graft.SparkSuite
import graft.core.TierSpec
import graft.ingest.WebPages
import graft.ops.Rollup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental cascade == full recompute; resume skips committed
  * partitions; manifests carry lineage.
  */
class TierRunnerSpec extends AnyFunSuite with SparkSuite {

  private def tmpRoot(): String =
    Files.createTempDirectory("graft-tier").toString

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("two incremental ingests converge to the full-recompute rollup") {
    val root = tmpRoot()
    val runner = new TierRunner(spark, root)
    val pages = WebPages.load(spark, sfDir)
    val cut = lit("2024-01-15 00:00:00").cast("timestamp")
    val first = pages.filter(col("warc_ts") < cut)
    val second = pages.filter(col("warc_ts") >= cut)

    val d1 = runner.ingest(first)
    val m1 = runner.run("r1", d1)
    assert(m1.okCount > 0)

    val d2 = runner.ingest(second)
    val m2 = runner.run("r2", d2)
    assert(m2.okCount > 0)

    // Every tier must equal a from-scratch rollup of the full input.
    val full5m = Rollup.fromRaw(pages, TierSpec.T5m)
    val full1h = Rollup.cascade(full5m, TierSpec.T1h)
    val full1d = Rollup.cascade(full1h, TierSpec.T1d)
    val full30d = Rollup.cascade(full1d, TierSpec.T30d)
    val cols = Seq("domain", "bucket_epoch", "n", "sum_chars",
                   "sum_value_micros", "min_value_micros", "max_value_micros")
      .map(col)

    assert(sortedRows(runner.tier(TierSpec.T5m).select(cols: _*)) ==
           sortedRows(full5m.select(cols: _*)))
    assert(sortedRows(runner.tier(TierSpec.T1h).select(cols: _*)) ==
           sortedRows(full1h.select(cols: _*)))
    assert(sortedRows(runner.tier(TierSpec.T1d).select(cols: _*)) ==
           sortedRows(full1d.select(cols: _*)))
    assert(sortedRows(runner.tier(TierSpec.T30d).select(cols: _*)) ==
           sortedRows(full30d.select(cols: _*)))
  }

  test("late data re-ingest recomputes the touched day only, still exact") {
    val root = tmpRoot()
    val runner = new TierRunner(spark, root)
    val pages = WebPages.load(spark, sfDir)
    val day = lit("2024-01-05 00:00:00").cast("timestamp")
    val nextDay = lit("2024-01-06 00:00:00").cast("timestamp")
    // initial load misses half of Jan 5
    val initial = pages.filter(
      !(col("warc_ts") >= day && col("warc_ts") < nextDay &&
        col("event_id") % 2 === 0))
    val late = pages.filter(
      col("warc_ts") >= day && col("warc_ts") < nextDay &&
      col("event_id") % 2 === 0)

    runner.run("r1", runner.ingest(initial))
    val touched = runner.ingest(late)
    assert(touched == Set((1704412800L).toString)) // 2024-01-05 epoch day
    runner.run("r2", touched)

    val full1d = Rollup.cascade(
      Rollup.cascade(Rollup.fromRaw(pages, TierSpec.T5m), TierSpec.T1h),
      TierSpec.T1d)
    val cols = Seq("domain", "bucket_epoch", "n", "sum_chars",
                   "sum_value_micros", "min_value_micros", "max_value_micros")
      .map(col)
    assert(sortedRows(runner.tier(TierSpec.T1d).select(cols: _*)) ==
           sortedRows(full1d.select(cols: _*)))
  }

  test("resume skips partitions already committed ok") {
    val root = tmpRoot()
    val runner = new TierRunner(spark, root)
    val pages = WebPages.load(spark, sfDir)
    val days = runner.ingest(pages)
    val m1 = runner.run("r1", days)
    val fresh = m1.entries.count(e => e._4 == "ok" && e._3 >= 0)
    assert(fresh > 0)
    // replay of the same run id: everything resumed, nothing rewritten
    val m2 = runner.run("r1", days)
    assert(m2.entries.forall(e => e._4 == "ok" && e._3 == -1L))
  }

  test("text_sha invariant travels the cascade: tier XOR equals direct XOR") {
    val root = tmpRoot()
    val runner = new TierRunner(spark, root)
    val pages = WebPages.load(spark, sfDir)
    runner.run("r1", runner.ingest(pages))
    val direct = {
      val t5m = Rollup.fromRaw(pages, TierSpec.T5m,
        textSha = Some(xxhash64(WebPages.extractText(col("html")))))
      Rollup.cascade(Rollup.cascade(t5m, TierSpec.T1h), TierSpec.T1d)
        .select("domain", "bucket_epoch", "text_sha")
    }
    val fromTiers = runner.tier(TierSpec.T1d)
      .select("domain", "bucket_epoch", "text_sha")
    assert(sortedRows(fromTiers) == sortedRows(direct))
  }

  test("manifest records lineage and round-trips through JSON") {
    val root = tmpRoot()
    val runner = new TierRunner(spark, root)
    val pages = WebPages.load(spark, sfDir)
    val m = runner.run("r1", runner.ingest(pages))
    val parsed = RunManifest.parseStatuses(m.toJson)
    assert(parsed.nonEmpty && parsed.values.forall(_ == "ok"))
    // tier table manifest carries per-partition lineage
    val t5m = new graft.table.TierTable(s"$root/tier_5m", spark)
    val tm = t5m.currentManifest.get
    assert(tm.partitions.nonEmpty)
    assert(tm.partitions.values.forall(p =>
      p.lineage.exists(_.status == "ok") && p.rows > 0))
  }
}
