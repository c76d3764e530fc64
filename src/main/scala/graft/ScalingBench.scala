package graft

import org.apache.spark.sql.SparkSession

/** Two-cluster-size scaling evidence (BASELINE.md): the same tier
  * cascade on the same deterministic input at local[N] and local[4N],
  * reporting points/sec at both and the throughput scaling efficiency
  * `(tN / t4N) / 4`.
  *
  * Each parallelism level runs in its own SparkSession (the previous
  * one fully stopped); `iters` runs per level, best-of to damp JVM
  * noise. Usage: runMain graft.ScalingBench [n] [sfDir] [replicate]
  * [iters].
  */
object ScalingBench {

  private def sessionAt(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def bestRun(spark: SparkSession, sfDir: String, rep: Int,
                      iters: Int): (Long, Double) = {
    // warm-up at tiny scale: codegen + class-loading
    Bench.cascadeRun(graft.ingest.WebPages.load(spark, "/root/testdata/sf0.001"))
    val runs = (1 to iters).map { _ =>
      Bench.cascadeRun(Bench.replicatedPages(spark, sfDir, rep))
    }
    runs.minBy(_._2)
  }

  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(8)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val rep = args.lift(2).map(_.toInt).getOrElse(20)
    val iters = args.lift(3).map(_.toInt).getOrElse(3)

    val sN = sessionAt(n)
    val (points, tN) = bestRun(sN, sfDir, rep, iters)
    sN.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    val s4N = sessionAt(4 * n)
    val (_, t4N) = bestRun(s4N, sfDir, rep, iters)
    s4N.stop()

    val ppsN = points / tN
    val pps4N = points / t4N
    val eff = (tN / t4N) / 4.0
    println(
      f"""{"metric":"scaling_efficiency","value":$eff%.3f,"unit":"ratio","n_cores":$n,"cores_4n":${4 * n},"points":$points,"sec_n":$tN%.3f,"sec_4n":$t4N%.3f,"points_per_sec_n":$ppsN%.1f,"points_per_sec_4n":$pps4N%.1f,"sf":"$sfDir","replicate":$rep}""")
  }
}
