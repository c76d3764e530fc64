package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quality properties of the approximate dedup/similarity operators,
  * checked against their exact counterparts on the small corpus.
  */
class DedupSimilaritySpec extends AnyFunSuite with SparkSuite {

  private lazy val docs =
    spark.read.parquet(s"$sfDir/documents.parquet").cache()
  private lazy val emb =
    spark.read.parquet(s"$sfDir/embeddings.parquet").cache()

  test("exact dedup finds injected duplicates") {
    val dup = docs.limit(5).withColumn("doc_id", col("doc_id") + 100000L)
    val withDups = docs.unionByName(dup)
    val groups = Dedup.exact(withDups, "doc_id", "text")
    assert(groups.filter(col("n_dupes") === 2).count() == 5)
    assert(groups.agg(sum("n_dupes")).head().getLong(0) == docs.count() + 5)
    // canonical representative is the minimum id (the original)
    assert(groups.filter(col("n_dupes") === 2)
      .filter(col("keep_id") >= 100000L).isEmpty)
  }

  test("minhash LSH recall: identical texts always collide, and candidates skew similar") {
    val dup = docs.limit(8).withColumn("doc_id", col("doc_id") + 100000L)
    val withDups = docs.unionByName(dup)
    val pairs = Dedup.minHashLsh(withDups, "doc_id", "text").cache()
    // every exact duplicate pair must be a candidate (identical word
    // sets → identical signatures → same bands)
    val exactPairs = dup.select((col("doc_id") - 100000L).as("id_a"),
                                col("doc_id").as("id_b"))
    assert(exactPairs.exceptAll(pairs.join(exactPairs,
      Seq("id_a", "id_b"), "left_semi")).isEmpty)
    pairs.unpersist()
  }

  test("minhash candidates have higher mean Jaccard than random pairs") {
    val exact = Dedup.ngramJaccard(docs, "doc_id", "text", "lang", 0L)
      .withColumnRenamed("jaccard_milli", "j").cache()
    val cand = Dedup.minHashLsh(docs, "doc_id", "text")
    val candJ = cand.join(exact, Seq("id_a", "id_b"))
      .agg(avg("j")).head().getDouble(0)
    val allJ = exact.agg(avg("j")).head().getDouble(0)
    assert(candJ > allJ,
      s"candidate mean Jaccard $candJ should beat corpus mean $allJ")
    exact.unpersist()
  }

  test("minhash bucket cap: 1k identical docs don't explode into B² pairs") {
    // 1000 copies of one text: every band bucket they share has 1000
    // members (>> cap) — without the cap the self-join would emit
    // ~500k pairs; with it, those buckets are dropped and logged.
    val one = docs.filter(col("doc_id") === 0)
      .select(col("text")).head().getString(0)
    val clones = spark.range(200000, 201000)
      .select(col("id").as("doc_id"), lit(one).as("text"))
    // near-dup copies of docs 1..8 — disjoint from the cloned text, so
    // their bands are never capped
    val near = docs.filter(col("doc_id").between(1, 8))
      .withColumn("doc_id", col("doc_id") + 100000L)
    val corpus = docs.select("doc_id", "text")
      .unionByName(near.select("doc_id", "text")).unionByName(clones)
    val pairs = Dedup.minHashLsh(corpus, "doc_id", "text", maxBucket = 100)
      .cache()
    // no pair between two clones survived (their only buckets are capped)
    assert(pairs.filter(col("id_a") >= 200000L && col("id_b") >= 200000L)
      .isEmpty)
    // normal near-dup pairs are untouched by the cap
    val exactPairs = near.select((col("doc_id") - 100000L).as("id_a"),
                                 col("doc_id").as("id_b"))
    assert(exactPairs.exceptAll(pairs.join(exactPairs,
      Seq("id_a", "id_b"), "left_semi")).isEmpty)
    pairs.unpersist()
  }

  test("jaccard size guard refuses oversized input") {
    intercept[IllegalArgumentException] {
      Dedup.ngramJaccard(docs, "doc_id", "text", "lang", 0L,
                         maxInputRows = 10L)
    }
  }

  test("LSH embedding near-dup: precision 1 vs exact, recall measured") {
    // exact unblocked pair set at the same threshold
    val exact = Similarity.embeddingNearDup(
      emb.withColumn("one", lit(1)), "vec_id", "embedding", "one", 300000L)
      .select("id_a", "id_b").cache()
    val lsh = Similarity.embeddingNearDupLsh(
      emb, "vec_id", "embedding", 300000L).cache()
    // precision: every LSH pair is in the exact set (cosine is computed
    // exactly on candidates; only candidate *generation* is approximate)
    assert(lsh.select("id_a", "id_b").exceptAll(exact).isEmpty)
    val recall = lsh.count().toDouble / math.max(exact.count(), 1L)
    assert(recall > 0.2, f"LSH near-dup recall $recall%.2f too low")
    exact.unpersist(); lsh.unpersist()
  }

  test("simhash: identical texts get identical fingerprints; hamming correlates") {
    val fp = Dedup.simHash(docs, "doc_id", "text")
    assert(fp.count() == docs.count())
    val dup = docs.limit(5).withColumn("doc_id", col("doc_id") + 100000L)
    val fpAll = Dedup.simHash(docs.unionByName(dup), "doc_id", "text")
    val a = fpAll.filter(col("_id") < 5).select(col("_id"), col("simhash").as("sa"))
    val b = fpAll.filter(col("_id") >= 100000L)
      .select((col("_id") - 100000L).as("_id"), col("simhash").as("sb"))
    assert(a.join(b, "_id").filter(col("sa") =!= col("sb")).isEmpty)
  }

  test("LSH ANN achieves reasonable recall vs brute force") {
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id")
    val approx = Similarity.lshTopK(emb, queries, "vec_id", "embedding", 5,
                                    planes = 3, tables = 12).cache()
    val hit = exact.join(approx.select("query_id", "neighbor_id"),
                         Seq("query_id", "neighbor_id"), "left_semi")
      .count()
    val recall = hit.toDouble / exact.count()
    assert(recall > 0.5,
      f"LSH recall $recall%.2f too low for 3 planes x 12 tables")
    assert(approx.filter(col("rank") < 1 || col("rank") > 5).isEmpty)
    approx.unpersist()
  }

  test("IVF ANN: bounded nlist at two corpus sizes, recall holds at both") {
    // |centroids| is a CONSTANT knob: the same nlist at 1x and 2x the
    // corpus (round-3's id%step sampler grew it linearly — the flagged
    // scale-killer), and recall does not silently degrade with growth.
    val nlist = 16
    val bigger = emb.unionByName(
      emb.withColumn("vec_id", col("vec_id") + 1000000L))
    for (corpus <- Seq(emb, bigger)) {
      val nCents = Similarity.ivfCentroids(corpus, "vec_id", "embedding",
                                           nlist).count()
      assert(nCents == nlist,
        s"|centroids| $nCents != nlist $nlist at corpus ${corpus.count()}")
      val queries = corpus.filter(col("vec_id") < 20)
      val exact = Similarity.bruteForceTopK(corpus, queries,
          "vec_id", "embedding", 5)
        .select("query_id", "neighbor_id").cache()
      val ivf = Similarity.ivfTopK(corpus, queries, "vec_id", "embedding", 5,
                                   nlist = nlist, nprobe = 6).cache()
      val hit = exact.join(ivf.select("query_id", "neighbor_id"),
                           Seq("query_id", "neighbor_id"), "left_semi").count()
      val recall = hit.toDouble / exact.count()
      assert(recall > 0.4,
        f"IVF recall $recall%.2f too low for nprobe=6/$nlist%d lists")
      assert(ivf.filter(col("rank") < 1 || col("rank") > 5).isEmpty)
      exact.unpersist(); ivf.unpersist()
    }
  }

  test("k-means IVF: trained codebook bounded + deterministic, recall holds") {
    val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding", 16, 2, 64)
    assert(cents.count() == 16)
    assert(cents.filter(size(col("cq")) =!= 64).isEmpty)
    // deterministic under repartition (integer-exact Lloyd iterations)
    val again = Similarity.kmeansCentroids(emb.repartition(13),
                                           "vec_id", "embedding", 16, 2, 64)
    assert(cents.exceptAll(again).isEmpty && again.exceptAll(cents).isEmpty,
      "trained codebook is shuffle-order dependent")
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").cache()
    val ivf = Similarity.ivfTopKTrained(emb, queries, "vec_id", "embedding", 5,
                                        nprobe = 6).cache()
    val hit = exact.join(ivf.select("query_id", "neighbor_id"),
                         Seq("query_id", "neighbor_id"), "left_semi").count()
    val recall = hit.toDouble / exact.count()
    assert(recall > 0.4, f"trained-IVF recall $recall%.2f too low")
    assert(ivf.filter(col("rank") < 1 || col("rank") > 5).isEmpty)
    exact.unpersist(); ivf.unpersist()
  }

  test("k-means training buys recall: trained >= raw seeds per probe, both sizes") {
    // The 2-iteration Lloyd cost must purchase a measurable benefit:
    // at the same (nlist, nprobe) budget, recall@5 of the trained
    // codebook is at least the raw hash-rank seeds' — on the corpus
    // AND on a 2x corpus (the knob-constancy scale shape).
    val nprobe = 3
    val bigger = emb.unionByName(
      emb.withColumn("vec_id", col("vec_id") + 1000000L))
    for ((corpus, tag) <- Seq((emb, "1x"), (bigger, "2x"))) {
      val queries = corpus.filter(col("vec_id") < 20)
      val exact = Similarity.bruteForceTopK(corpus, queries,
          "vec_id", "embedding", 5)
        .select("query_id", "neighbor_id").cache()
      val n = exact.count().toDouble
      def recallOf(df: org.apache.spark.sql.DataFrame): Double =
        exact.join(df.select("query_id", "neighbor_id"),
                   Seq("query_id", "neighbor_id"), "left_semi").count() / n
      val raw = recallOf(Similarity.ivfTopK(corpus, queries,
        "vec_id", "embedding", 5, nprobe = nprobe))
      val trained = recallOf(Similarity.ivfTopKTrained(corpus, queries,
        "vec_id", "embedding", 5, nprobe = nprobe))
      assert(trained >= raw,
        f"$tag: trained recall $trained%.3f < raw seeds $raw%.3f")
      exact.unpersist()
    }
  }

  test("IvfNearest kernel: (score DESC, cent_id ASC) order; null input ranks by id") {
    import graft.functions.{DotProduct, IvfNearest}
    // cents 5 and 7 are identical → equal scores → tie breaks to the
    // smaller cent_id first (the row_number ordering's tie-break)
    val cents = Seq((7L, Array(1.0, 0.0)), (5L, Array(1.0, 0.0)),
                    (9L, Array(0.0, 1.0)))
    val df = spark.range(1).select(typedLit(Seq(2.0, 0.1)).as("v"))
      .withColumn("n", sqrt(DotProduct.dot(col("v"), col("v"))))
      .select(IvfNearest.topCents(col("v"), col("n"), cents, 3).as("ids"))
    assert(df.head().getSeq[Long](0) == Seq(5L, 7L, 9L))
    // null vec / null nrm: every score is the sentinel (DESC NULLS
    // LAST) → pure cent_id order, never an error or a null result
    val nullDf = spark.range(1)
      .select(lit(null).cast("array<double>").as("v"),
              lit(null).cast("double").as("n"))
      .select(IvfNearest.topCents(col("v"), col("n"), cents, 2).as("ids"))
    assert(nullDf.head().getSeq[Long](0) == Seq(5L, 7L))
  }

  test("native dot product is bit-identical to the built-in fold it replaces") {
    val v = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val both = v.crossJoin(v.limit(7).select(col("v").as("w")))
      .select(
        graft.functions.DotProduct.dot(col("v"), col("w")).as("fast"),
        aggregate(zip_with(col("v"), col("w"), (x, y) => x * y),
                  lit(0.0), (acc, x) => acc + x).as("slow"))
    // exact double equality: same products, same left-to-right adds
    assert(both.filter(col("fast") =!= col("slow")).isEmpty)
    // the expression participates in whole-stage codegen (no fallback)
    val p = both.queryExecution.executedPlan.toString
    assert(p.contains("WholeStageCodegen") || p.contains("*("), p.take(400))
  }

  test("brute-force ANN is exact: agrees with itself under repartition") {
    val queries = emb.filter(col("vec_id") < 10)
    val a = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
    val b = Similarity.bruteForceTopK(emb.repartition(13), queries,
                                      "vec_id", "embedding", 5)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
