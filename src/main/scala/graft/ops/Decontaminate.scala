package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag corpus documents whose k-gram
  * (word-shingle) sets overlap a benchmark/eval set above a containment
  * threshold — the standard training-data step that keeps eval questions
  * out of the training corpus.
  *
  * Containment is measured against the BENCH doc's shingle set
  * (`overlap_milli = 1000·|C ∩ B| / |B|`): a short eval question fully
  * embedded in a long web page scores 1000 even though the page's own
  * Jaccard vs the question is tiny — containment, not Jaccard, is the
  * right decontamination metric.
  *
  * Scale shape (100 TB corpus × small bench set): the bench shingle
  * stream and its per-doc sizes are both BROADCAST — the corpus side
  * streams through a broadcast hash join at scan speed, and the only
  * exchange is the partial-aggregated (corpus_id, bench_id) overlap
  * count (bounded by matching pairs, not the corpus). Nothing is ever
  * quadratic in the corpus; bench sets are thousands of docs, far under
  * broadcast limits.
  */
object Decontaminate {

  /** (doc_id, bench_id, overlap_milli) pairs with containment ≥
    * `thresholdMilli`. Shingle construction is [[Dedup.shingleSet]]
    * (distinct k-word shingles; short docs yield their single sub-k
    * shingle).
    */
  def overlap(corpus: DataFrame, corpusId: String, corpusText: String,
              bench: DataFrame, benchId: String, benchText: String,
              k: Int = 3, thresholdMilli: Long = 800L): DataFrame = {
    val cs = Dedup.shingleSet(corpus, corpusId, corpusText, k)
      .withColumnRenamed("_id", "doc_id")
    val bs = Dedup.shingleSet(bench, benchId, benchText, k)
      .withColumnRenamed("_id", "bench_id")
    val bSizes = bs.groupBy("bench_id").agg(count(lit(1)).as("_bsz"))
    cs.join(broadcast(bs), Seq("w"))
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("_inter"))
      .join(broadcast(bSizes), Seq("bench_id"))
      // integer DIV mirrors the oracle's `//` exactly (double `/` under
      // floor is bit-exact only below 2^53)
      .withColumn("overlap_milli", expr("(_inter * 1000) DIV _bsz"))
      .filter(col("overlap_milli") >= thresholdMilli)
      .select("doc_id", "bench_id", "overlap_milli")
  }

  /** DuckDB mirror of [[overlap]]. `corpusSel`/`benchSel` are FROM-able
    * subselects exposing (id, text) under the given column names.
    */
  def overlapOracleSql(corpusSel: String, corpusId: String, corpusText: String,
                       benchSel: String, benchId: String, benchText: String,
                       k: Int = 3, thresholdMilli: Long = 800L): String =
    s"""WITH cs AS (
       |  ${Dedup.shingleSetSql(s"($corpusSel) _corp", corpusId, corpusText, k)
             .replace("\n", "\n  ")}
       |),
       |bs AS (
       |  ${Dedup.shingleSetSql(s"($benchSel) _bench", benchId, benchText, k)
             .replace("\n", "\n  ")}
       |),
       |bsz AS (SELECT _id AS bench_id, count(*) AS b FROM bs GROUP BY 1),
       |inter AS (
       |  SELECT cs._id AS doc_id, bs._id AS bench_id, count(*) AS i
       |  FROM cs JOIN bs ON cs.w = bs.w
       |  GROUP BY 1, 2
       |)
       |SELECT doc_id, bench_id,
       |       CAST((i * 1000) // b AS BIGINT) AS overlap_milli
       |FROM inter JOIN bsz USING (bench_id)
       |WHERE (i * 1000) // b >= $thresholdMilli""".stripMargin
}
