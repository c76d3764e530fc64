package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Committed golden physical plans for the headline queries — plan
  * regressions (a lost ReusedExchange, a broadcast flipping to
  * sort-merge, a new shuffle) surface as reviewable text diffs instead
  * of silent slowdowns. Complements PlanSpec's targeted string pins
  * with the WHOLE operator tree.
  *
  * The golden is the tree section of `explain("formatted")` of the
  * EXECUTED plan (the query is materialized first, so AQE has
  * finalized it — runtime exchange reuse, final join strategies; the
  * initial adaptive plan would show self-join pipelines duplicated
  * that runtime dedups into one ReusedExchange), with expression ids
  * normalized (`#12` → `#N`) — operator structure and ids are kept
  * verbatim. Regenerate after an intentional plan change with:
  * `GRAFT_UPDATE_PLANS=1 sbt "testOnly graft.PlanGoldenSpec"`.
  */
class PlanGoldenSpec extends AnyFunSuite with SparkSuite {

  private val pinned = Seq(
    "ts_rollup_1d",   // cascade: partial-agg before every exchange
    "ts_gapfill_1h",  // one window + one generator, broadcast bounds
    "dedup_minhash",  // signature pipeline under ONE reused exchange
    "asof_join",      // bucketed two-phase window split
    "ann_lsh_topk",   // broadcast bucket join + WindowGroupLimit
    "corpus_filter_rulesets") // TWO ruleset versions, ONE scan + window

  private val goldenDir = Paths.get("src/test/resources/golden-plans")

  private def normalize(s: String): String =
    s.linesIterator
      // final-plan tree only: stop at the Initial Plan echo or the
      // blank line before the per-operator details
      .takeWhile(l => l.trim.nonEmpty && !l.contains("== Initial Plan =="))
      .mkString("\n")
      .replaceAll("#\\d+", "#N")
      .replaceAll("plan_id=\\d+", "plan_id=N")
      // runtime row/byte statistics are input-layout noise, not shape
      .replaceAll(", Statistics\\(sizeInBytes=[^)]*\\)", "")
      // operator ids count nodes across BOTH the final plan and the
      // initial-plan echo, so warm-session AQE state shifts them —
      // the tree's structure is the indentation + operator names
      .replaceAll("\\(\\d+\\)", "(#)")
      .trim + "\n"

  private def planOf(name: String): String = {
    import org.apache.spark.sql.execution.ExplainMode
    // other suites cache shared frames (e.g. OpsSpec's pages); Catalyst
    // would substitute their InMemoryRelations into these plans and the
    // golden would depend on suite execution order — plan the cold tree
    spark.catalog.clearCache()
    val df = SparkEntry.queries(name)(spark, sfDir)
    // collect(), not count(): count() builds its OWN QueryExecution;
    // collect() finalizes THIS one, so AQE's runtime shape
    // (ReusedExchange, final joins) lands in the golden
    df.collect()
    normalize(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
  }

  for (name <- pinned) test(s"golden plan: $name") {
    val got = planOf(name)
    val path = goldenDir.resolve(s"$name.plan")
    if (sys.env.contains("GRAFT_UPDATE_PLANS")) {
      Files.createDirectories(goldenDir)
      Files.writeString(path, got)
      info(s"updated $path")
    } else {
      assert(Files.exists(path),
        s"no golden at $path — run GRAFT_UPDATE_PLANS=1 to create it")
      val want = Files.readString(path)
      if (got != want) {
        val gl = got.linesIterator.toSeq
        val wl = want.linesIterator.toSeq
        val firstDiff = gl.zipAll(wl, "<missing>", "<missing>")
          .indexWhere { case (a, b) => a != b }
        fail(s"plan drifted from golden $path at line ${firstDiff + 1}:\n" +
          s"  got:  ${gl.lift(firstDiff).getOrElse("<missing>")}\n" +
          s"  want: ${wl.lift(firstDiff).getOrElse("<missing>")}\n" +
          "If the change is intentional, regenerate with GRAFT_UPDATE_PLANS=1.")
      }
    }
  }
}
