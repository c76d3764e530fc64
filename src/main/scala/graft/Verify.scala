package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // optional: verify only the named queries (larger-sf spot runs —
    // catches sf-dependent plan cliffs before the driver does); no
    // names = the driver's full-registry contract, unchanged
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args.drop(2).toSet) else None
    // a typo'd name must not produce a green run that verified nothing
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      if (unknown.nonEmpty) {
        System.err.println(
          s"[verify] unknown queries: ${unknown.toSeq.sorted.mkString(", ")}")
        sys.exit(1)
      }
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // Queries may persist() internal subtrees (gap-fill, LSH band
      // streams); drop them so caches don't accumulate across the
      // registry run and evict each other mid-query.
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Partial runs must be distinguishable from the driver's full
    // contract: a subset green run writes a marker naming what it
    // covered, so it can never be graded as a full-registry pass — and
    // a FULL run into a reused outDir removes any stale marker, so it
    // can never be misgraded as partial.
    only match {
      case Some(names) =>
        val arr = names.toSeq.sorted.map(q).mkString("[", ",", "]")
        Files.writeString(Paths.get(s"$outDir/partial_run.json"),
          s"""{"partial":true,"verified_queries":$arr}""")
      case None =>
        Files.deleteIfExists(Paths.get(s"$outDir/partial_run.json"))
    }
    spark.stop()
  }
}
