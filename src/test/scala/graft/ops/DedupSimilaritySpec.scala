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
    assert(groups.agg(sum("n_dupes")).head.getLong(0) == docs.count() + 5)
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
      .agg(avg("j")).head.getDouble(0)
    val allJ = exact.agg(avg("j")).head.getDouble(0)
    assert(candJ > allJ,
      s"candidate mean Jaccard $candJ should beat corpus mean $allJ")
    exact.unpersist()
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

  test("brute-force ANN is exact: agrees with itself under repartition") {
    val queries = emb.filter(col("vec_id") < 10)
    val a = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
    val b = Similarity.bruteForceTopK(emb.repartition(13), queries,
                                      "vec_id", "embedding", 5)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
