package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dev tool: (re)generate the committed golden CSV. */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val out = args.lift(0).getOrElse(
      "src/test/resources/golden/vpts_v1_sf0001.csv")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val csv = graft.fmt.VptsGolden.csvString(spark, "/root/testdata/sf0.001")
    Files.createDirectories(Paths.get(out).getParent)
    Files.writeString(Paths.get(out), csv)
    println(s"wrote ${csv.linesIterator.size} lines to $out")
    spark.stop()
  }
}
