package graft.ops

import graft.functions.Portable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language-ID
  * (stopword n-gram heuristic), quality scoring, token counting,
  * document fingerprinting. All arithmetic is integral (milli-units)
  * so results are exact and oracle-checkable.
  *
  * No reference counterpart — these extend the engine for web-text
  * curation at Common-Crawl scale. Everything is a narrow projection
  * (no shuffle): at 100 TB these run at scan speed inside whole-stage
  * codegen.
  */
object TextStats {

  /** (lang, stopwords) table for the n-gram language heuristic. Fixed
    * priority order breaks ties deterministically.
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is", "and"),
    "de" -> Seq("der", "die", "das", "und"),
    "fr" -> Seq("le", "la", "et", "les"),
    "es" -> Seq("el", "los", "que", "y"))

  private def padded(c: Column): Column = concat(lit(" "), c, lit(" "))
  private def paddedSql(e: String): String = s"concat(' ', $e, ' ')"

  /** Stopword-hit count for one language over single-space text. */
  def langScore(text: Column, lang: String): Column =
    stopwords.toMap.apply(lang)
      .map(w => Portable.occurrences(padded(text), s" $w "))
      .reduce(_ + _)

  def langScoreSql(expr: String, lang: String): String =
    stopwords.toMap.apply(lang)
      .map(w => Portable.occurrencesSql(paddedSql(expr), s" $w "))
      .mkString("(", " + ", ")")

  /** Predicted language: argmax of stopword scores, ties resolved by
    * the fixed order of [[stopwords]]; score 0 everywhere → "und"
    * (undetermined).
    */
  def langId(text: Column): Column = {
    val scored = stopwords.map { case (l, _) => l -> langScore(text, l) }
    val anyHit = scored.map(_._2).reduce(_ + _) > 0
    val best = scored.tail.foldLeft(when(lit(true), scored.head._1)) {
      case (acc, (l, s)) =>
        // keep earlier lang unless this one is strictly better
        when(s > scored.takeWhile(_._1 != l).map(_._2).reduce(greatest(_, _)), l)
          .otherwise(acc)
    }
    when(anyHit, best).otherwise(lit("und"))
  }

  def langIdSql(expr: String): String = {
    val scores = stopwords.map { case (l, _) => l -> langScoreSql(expr, l) }
    val total = scores.map(_._2).mkString(" + ")
    // mirror of langId's fold: later lang wins only if strictly greater
    // than the max of all earlier ones
    val caseBranches = scores.tail.reverse.map { case (l, s) =>
      val earlier = scores.takeWhile(_._1 != l).map(_._2)
      val earlierMax = earlier.tail.foldLeft(earlier.head)((a, b) => s"greatest($a, $b)")
      s"WHEN $s > $earlierMax THEN '$l'"
    }
    s"""CASE WHEN ($total) = 0 THEN 'und'
       |${caseBranches.mkString("\n")}
       |ELSE '${scores.head._1}' END""".stripMargin
  }

  /** Quality score in milli-units: rewards length (up to 200 tokens)
    * and stopword presence, penalizes extreme mean word length.
    * Integral end-to-end.
    */
  def qualityMilli(text: Column): Column = {
    val t = Portable.tokenCount(text)
    val chars = length(text) - (t - 1) // chars excluding separators
    // floor-div (Spark `/` is double division; floor matches DuckDB `//`)
    val wlMilli = floor((chars * 1000L) / t).cast("long")
    val stops = stopwords.map { case (l, _) => langScore(text, l) }.reduce(_ + _)
    (least(t * lit(5L), lit(1000L))
      + least(stops * lit(20L), lit(200L))
      - when(wlMilli > 8000L, lit(200L)).otherwise(lit(0L))).cast("long")
  }

  def qualityMilliSql(expr: String): String = {
    val t = Portable.tokenCountSql(expr)
    val stops = stopwords.map { case (l, _) => langScoreSql(expr, l) }.mkString(" + ")
    s"""CAST(least($t * 5, 1000)
       |   + least(($stops) * 20, 200)
       |   - (CASE WHEN ((length($expr) - ($t - 1)) * 1000) // $t > 8000
       |           THEN 200 ELSE 0 END) AS BIGINT)""".stripMargin
  }

  /** Document fingerprint: md5 of lowercased text (exact-dup key), plus
    * a 60-bit integer form for bucketing.
    */
  def fingerprint(text: Column): Column = md5(lower(text))
  def fingerprintSql(expr: String): String = s"md5(lower($expr))"
  def fingerprint60(text: Column): Column = Portable.hash60(lower(text))
  def fingerprint60Sql(expr: String): String = Portable.hash60Sql(s"lower($expr)")

  /** BPE-ish token count: alternation of letter runs, digit runs, and
    * single non-alphanumeric marks (the classic pre-tokenizer regex).
    */
  private val bpeRegex = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeRegex), lit(0))).cast("long")
  def tokenCountBpeSql(expr: String): String =
    s"CAST(len(regexp_extract_all($expr, '$bpeRegex')) AS BIGINT)"

  /** Full per-document stats projection. */
  def stats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      Portable.tokenCount(col(textCol)).as("n_tokens"),
      tokenCountBpe(col(textCol)).as("n_tokens_bpe"),
      langId(col(textCol)).as("lang_pred"),
      qualityMilli(col(textCol)).as("quality_milli"),
      fingerprint(col(textCol)).as("fp_md5"),
      fingerprint60(col(textCol)).as("fp60"))

  def statsOracleSql(fromCte: String, table: String, idCol: String,
                     textCol: String): String =
    s"""$fromCte
       |SELECT $idCol,
       |       ${Portable.tokenCountSql(textCol)} AS n_tokens,
       |       ${tokenCountBpeSql(textCol)} AS n_tokens_bpe,
       |       ${langIdSql(textCol)} AS lang_pred,
       |       ${qualityMilliSql(textCol)} AS quality_milli,
       |       ${fingerprintSql(textCol)} AS fp_md5,
       |       ${fingerprint60Sql(textCol)} AS fp60
       |FROM $table""".stripMargin
}
