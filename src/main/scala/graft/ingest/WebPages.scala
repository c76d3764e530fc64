package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic Common-Crawl-style web-pages table
  * `(url, warc_ts, html, text, lang, …)` — the engine's tier-0 input.
  *
  * Derived purely from the driver-provided parquet tables (no external
  * data): each `events` row is one page fetch; the fetched document is
  * `documents[event_id mod |documents|]`. The derivation is pure SQL on
  * both engines, so the DuckDB oracle can reproduce it exactly (see
  * [[oracleCte]]).
  *
  * Per-row invariant (BASELINE.json input_hint): `text` must be
  * byte-identically extractable from `html`. `html` is
  * `"<html><body>" + text + "</body></html>"` UTF-8 encoded;
  * [[extractText]] is its exact inverse and is asserted by the
  * `text_extract_invariant` query and the ScalaTest suite.
  *
  * Scale notes: `documents` is a dimension table (broadcast join);
  * `events` is the fact side and streams through without a shuffle.
  * At 100 TB the fact scan partitions by file splits; the broadcast
  * keeps the derivation shuffle-free.
  */
object WebPages {

  private val HtmlPrefix = "<html><body>"   // 12 bytes
  private val HtmlSuffix = "</body></html>" // 14 bytes

  /** Dimension cardinality per directory — computed once, not per call
    * (load() is invoked by every registered query; an uncached count()
    * is a driver-side job embedded in each of them). The dim table is
    * immutable within a run, so the cache never invalidates.
    */
  private val docCountCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Load the tier-0 web-pages DataFrame from a testdata sf directory. */
  def load(spark: SparkSession, sfDir: String): DataFrame = {
    val docs   = spark.read.parquet(s"$sfDir/documents.parquet")
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val nDocs: Long = docCountCache.computeIfAbsent(sfDir, _ => docs.count())
    events
      .withColumn("doc_id", col("event_id") % nDocs)
      .join(broadcast(docs), Seq("doc_id"))
      .select(
        concat(
          lit("https://"), col("source"), lit(".example.org/"), col("lang"),
          lit("/"), col("doc_id").cast("string"),
          lit("?e="), col("event_id").cast("string")).as("url"),
        concat(col("source"), lit(".example.org")).as("domain"),
        col("ts").as("warc_ts"),
        unix_timestamp(col("ts")).as("warc_epoch"),
        // binary concat of the wrapper bytes around the text's UTF-8
        // bytes (cast string→binary wraps the internal bytes): the same
        // html bytes as the round-5 encode(concat(...), 'UTF-8') chain
        // WITHOUT materializing a java String per row and re-encoding
        // it — this projection runs in the single scan task feeding the
        // replication exchange, so its per-row cost is a SERIAL section
        // of every cascade run (Amdahl at 16+ cores)
        concat(lit(HtmlPrefix.getBytes("UTF-8")), col("text").cast("binary"),
               lit(HtmlSuffix.getBytes("UTF-8"))).as("html"),
        col("text"), col("lang"), col("n_chars"), col("value"),
        col("event_id"), col("doc_id"),
        // three-state missingness at tier-0 (core.Flag): a fetch error
        // carries no measurement (NODATA); a measurement below the
        // detection threshold is observed-but-undetected (UNDETECT).
        // Deterministic per row, mirrored bit-for-bit in [[oracleCte]].
        when(col("event_type") === "error", lit(graft.core.Flag.NODATA))
          .when(col("value") < 5.0, lit(graft.core.Flag.UNDETECT))
          .otherwise(lit(graft.core.Flag.OK)).cast("int").as("flag"))
      // explicit url-hash bucket: the clustering key for co-located
      // storage/joins at scale (north rule: url-hash bucketing +
      // warc_ts range partitioning; the range dimension is the
      // day_epoch partition in TierTable)
      .withColumn("url_bucket", pmod(xxhash64(col("url")), lit(UrlBuckets)))
  }

  /** Number of url-hash buckets (files per day partition at scale). */
  val UrlBuckets = 16

  /** Exact inverse of the html wrapper: byte-identical `text`. Slices
    * the BINARY first (prefix/suffix are fixed ASCII byte counts, so
    * byte offsets are exact even for multibyte text), then casts
    * binary→string, which wraps the UTF-8 bytes directly. The round-5
    * form decoded the whole document (bytes → java String → internal
    * string = two full copies) and then paid a third O(n)
    * char-boundary scan for the string substring. The wrapper writes
    * valid UTF-8 by construction, so the wrapped bytes ARE the decoded
    * text and every downstream consumer (md5/xxhash64/equality)
    * operates on identical bytes.
    */
  def extractText(html: Column): Column =
    html.substr(lit(HtmlPrefix.length + 1),
        length(html) - lit(HtmlPrefix.length + HtmlSuffix.length))
      .cast("string")

  /** DuckDB CTE mirroring [[load]] exactly — prefix for oracle SQL.
    * `warc_epoch` uses epoch_us//1_000_000 (floor) to match Spark's
    * `unix_timestamp` second truncation.
    */
  val oracleCte: String =
    """WITH webpages AS (
      |  SELECT
      |    concat('https://', d.source, '.example.org/', d.lang, '/',
      |           CAST(d.doc_id AS VARCHAR), '?e=', CAST(e.event_id AS VARCHAR)) AS url,
      |    concat(d.source, '.example.org') AS domain,
      |    e.ts AS warc_ts,
      |    CAST(epoch_us(e.ts) // 1000000 AS BIGINT) AS warc_epoch,
      |    d.text AS text, d.lang AS lang, d.n_chars AS n_chars,
      |    e.value AS value, e.event_id AS event_id, d.doc_id AS doc_id,
      |    CAST(CASE WHEN e.event_type = 'error' THEN 1
      |              WHEN e.value < 5.0 THEN 2
      |              ELSE 0 END AS INT) AS flag
      |  FROM events e
      |  JOIN documents d
      |    ON d.doc_id = e.event_id % (SELECT count(*) FROM documents)
      |)""".stripMargin
}
