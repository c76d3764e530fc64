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
      // AQE coalescing sizes post-shuffle partitions from the PRE-explode
      // map output (tiny) and would serialize the 100-2000x replication
      // explode into one task
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
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

    // Two alternating passes per level (N, 4N, N, 4N), best-of across
    // both passes of a level: both levels run with equally-warm JIT —
    // a single N-then-4N order systematically flatters the later level.
    def phase(cores: Int): (Long, Double) = {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val s = sessionAt(cores)
      // the master is a SparkContext property: verify we really got the
      // requested core count (a live context would silently win)
      require(s.sparkContext.master == s"local[$cores]",
        s"stale SparkContext: ${s.sparkContext.master} != local[$cores]")
      val r = bestRun(s, sfDir, rep, iters)
      // fully stop the context — a later builder would otherwise reuse
      // it and silently ignore the new master
      s.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      r
    }
    val (points, tN1) = phase(n)
    val (_, t4N1) = phase(4 * n)
    val (_, tN2) = phase(n)
    val (_, t4N2) = phase(4 * n)
    val tN = math.min(tN1, tN2)
    val t4N = math.min(t4N1, t4N2)

    val ppsN = points / tN
    val pps4N = points / t4N
    val eff = (tN / t4N) / 4.0
    println(
      f"""{"metric":"scaling_efficiency","value":$eff%.3f,"unit":"ratio","n_cores":$n,"cores_4n":${4 * n},"points":$points,"sec_n":$tN%.3f,"sec_4n":$t4N%.3f,"points_per_sec_n":$ppsN%.1f,"points_per_sec_4n":$pps4N%.1f,"sf":"$sfDir","replicate":$rep}""")
  }
}
