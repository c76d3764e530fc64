package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bit-equivalence of the round-6 compiled kernels against the exact
  * built-in compositions they replaced, on an adversarial corpus the
  * sf tables don't contain (multi-space runs, leading/trailing spaces,
  * empty string, unicode, adjacent repeats, stopwords at boundaries).
  * The DuckDB oracle already pins the kernels on the real data paths
  * at two scale factors; this pins the edge cases directly.
  */
class KernelEquivalenceSpec extends AnyFunSuite with SparkSuite {

  private lazy val adversarial: DataFrame = {
    import spark.implicits._
    Seq(
      "the quick brown fox the quick brown fox",
      "the the the the",                    // adjacent repeats
      "a  b   c",                           // multi-space runs (empty tokens)
      " leading and trailing ",             // boundary spaces
      "",                                   // empty document
      "single",
      "der die das und the a is and le la et los que y",
      "naïve café über strße tokén", // multibyte
      "x y x y x y x y z",
      "555-010-1234 10.0.3.7 a@b.co the"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
  }

  private def assertSame(a: DataFrame, b: DataFrame, what: String): Unit = {
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"$what diverges from the built-in composition")
  }

  test("Hash60 == conv(substring(md5, 1, 15), 16, 10)") {
    val ref = conv(substring(md5(col("text").cast("binary")), 1, 15), 16, 10)
      .cast("long")
    assertSame(
      adversarial.select(col("id"), Hash60.of(col("text")).as("h")),
      adversarial.select(col("id"), ref.as("h")), "Hash60")
  }

  test("WordShingles == array_distinct(transform(sequence, slice-join))") {
    for (k <- Seq(1, 3, 8)) {
      val w = split(col("text"), " ")
      val ref = array_distinct(transform(
        sequence(lit(1), greatest(size(w) - (k - 1), lit(1))),
        i => concat_ws(" ", slice(w, i, lit(k)))))
      assertSame(
        adversarial.select(col("id"), WordShingles.of(col("text"), k).as("s")),
        adversarial.select(col("id"), ref.as("s")), s"WordShingles(k=$k)")
    }
  }

  test("MinHashSig == explode + min(affine) aggregation") {
    val k = 3
    val numHashes = 16
    val w = split(col("text"), " ")
    val shingles = array_distinct(transform(
      sequence(lit(1), greatest(size(w) - (k - 1), lit(1))),
      i => concat_ws(" ", slice(w, i, lit(k)))))
    val ref = adversarial
      .select(col("id"), explode(shingles).as("sh"))
      .withColumn("_h",
        conv(substring(md5(col("sh")), 1, 15), 16, 10).cast("long")
          % Portable.MinHashP)
      .groupBy("id")
      .agg(array((0 until numHashes).map(i =>
        min(Portable.affine(i, col("_h")))): _*).as("sig"))
    val got = adversarial
      .select(col("id"), MinHashSig.of(col("text"), k, numHashes).as("sig"))
    assertSame(got, ref, "MinHashSig")
  }

  test("OccurrenceCounts == replace-and-measure occurrence chain") {
    val subs = Seq(" the ", " a ", " und ", " y ", " la ")
    val padded = concat(lit(" "), col("text"), lit(" "))
    val ref = adversarial.select(col("id"),
      array(subs.map(s => Portable.occurrences(padded, s)): _*).as("c"))
    val got = adversarial.select(col("id"),
      OccurrenceCounts.of(col("text"), subs).as("c"))
    assertSame(got, ref, "OccurrenceCounts")
  }

  test("RepetitionStats == the HOF repetition composition") {
    val k = 8
    val chunks = graft.ops.TextStats.wordChunks(col("text"), k)
    val nc = size(chunks).cast("long")
    val distinctC = size(array_distinct(chunks)).cast("long")
    val dup = when(nc > 0, ((nc - distinctC) * 1000L) / nc).otherwise(0.0)
    val w = split(col("text"), " ")
    val nw = size(w)
    val bigrams = when(nw >= 2,
      transform(sequence(lit(1), nw - 1),
        i => concat(element_at(w, i), lit(" "), element_at(w, i + 1))))
      .otherwise(array().cast("array<string>"))
    val nbg = size(bigrams).cast("long")
    val topCount = array_max(transform(array_distinct(bigrams),
      b => size(filter(bigrams, x => x === b))))
    val topMilli = when(nbg > 0, (topCount.cast("long") * 1000L) / nbg)
      .otherwise(0.0)
    val ref = adversarial.select(col("id"), nc.as("n_chunks"),
      floor(dup).cast("long").as("dup_chunk_milli"), nbg.as("n_bigrams"),
      floor(topMilli).cast("long").as("top_bigram_milli"))
    val got = adversarial.select(
      col("id") +: graft.ops.TextStats.repetitionCols(col("text"), k): _*)
    assertSame(got, ref, "RepetitionStats")
  }

  test("SimHashFp == explode + bit-sum aggregation") {
    for (bits <- Seq(16, 32)) {
      val sumAggs = (0 until bits).map(j =>
        sum(when((shiftright(col("wh"), j) % 2) === 1, 1L)
          .otherwise(-1L)).as(s"s$j"))
      val ref = adversarial
        .select(col("id"),
          explode(array_distinct(split(col("text"), " "))).as("w"))
        .withColumn("wh",
          conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long"))
        .groupBy("id")
        .agg(sumAggs.head, sumAggs.tail: _*)
        .select(col("id"),
          (0 until bits).map(j =>
            when(col(s"s$j") >= 0, lit(1L << j)).otherwise(lit(0L)))
            .reduce(_ + _).as("fp"))
      val got = adversarial.select(col("id"),
        SimHashFp.of(col("text"), bits).as("fp"))
      assertSame(got, ref, s"SimHashFp(bits=$bits)")
    }
  }

  test("LshBuckets == the per-plane when-sum composition") {
    import graft.ops.Similarity
    val dims = 4
    val tables = 3
    val planes = 5
    val vecs = adversarial.select(col("id"),
      array(Seq(col("id") * 1.0 - 3.0, lit(-1.5), col("id") % 3 * 2.0,
                lit(0.25)): _*).as("v"))
    def refBucket(t: Int): Column =
      (0 until planes).map { p =>
        val signs = array(Similarity.planeSigns(t, p, dims).map(lit): _*)
        when(DotProduct.dot(col("v"), signs) >= 0, lit(1L << p))
          .otherwise(lit(0L))
      }.reduce(_ + _)
    val signs = Array.tabulate(tables * planes) { i =>
      Similarity.planeSigns(i / planes, i % planes, dims).toArray
    }
    val got = vecs.select(col("id"),
      LshBuckets.forPlanes(col("v"), tables, planes, signs).as("b"))
    val ref = vecs.select(col("id"),
      array((0 until tables).map(refBucket): _*).as("b"))
    assertSame(got, ref, "LshBuckets")
  }

  test("DecontamOverlap == shingle explode + broadcast join + count") {
    import graft.ops.Decontaminate
    // adversarial corpus plus a null-text doc (must score no pairs,
    // like its missing shingle rows in the explode form) and an exact
    // duplicate of a bench doc (containment 1000)
    val rows = adversarial.collect().map(r => (r.getLong(0), r.getString(1))) ++
      Seq((100L, null: String), (101L, "the the the the"))
    import spark.implicits._
    val corpus = rows.toSeq.toDF("id", "text")
    val bench = corpus.filter(col("id") % 3 === 0 && col("id") < 100)
      .select(col("id").as("bid"), col("text"))
    for ((k, thr) <- Seq((3, 200L), (1, 500L))) {
      val got = Decontaminate.overlap(
        corpus, "id", "text", bench, "bid", "text", k, thr)
      // the pre-kernel composition, verbatim
      def shingleRows(df: DataFrame, idc: String): DataFrame =
        df.select(col(idc).as("_id"),
          explode(WordShingles.of(col("text"), k)).as("w"))
      val cs = shingleRows(corpus, "id").withColumnRenamed("_id", "doc_id")
      val bs = shingleRows(bench, "bid").withColumnRenamed("_id", "bench_id")
      val bSizes = bs.groupBy("bench_id").agg(count(lit(1)).as("_bsz"))
      val ref = cs.join(broadcast(bs), Seq("w"))
        .groupBy("doc_id", "bench_id")
        .agg(count(lit(1)).as("_inter"))
        .join(broadcast(bSizes), Seq("bench_id"))
        .withColumn("overlap_milli", expr("(_inter * 1000) DIV _bsz"))
        .filter(col("overlap_milli") >= thr)
        .select("doc_id", "bench_id", "overlap_milli")
      assert(ref.count() > 0, s"vacuous fixture at k=$k")
      assertSame(got, ref, s"DecontamOverlap(k=$k, thr=$thr)")
    }
    // plan shape: the corpus side never explodes into a join — no Join
    // operator at all, and the only exchange is the single-file spread
    val p = Decontaminate.overlap(
        corpus, "id", "text", bench, "bid", "text", 3, 200L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p.take(1200))
  }
}
