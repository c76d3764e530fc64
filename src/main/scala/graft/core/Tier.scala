package graft.core

/** Retention tiers of the rollup cascade: 5m → 1h → 1d → 30d.
  *
  * Mirrors the reference's daily/monthly tumbling tiers
  * (/root/reference/src/vptstools/s3.py:122-153 — daily
  * `{radar}_vpts_{yyyymmdd}.csv`, monthly `{radar}_vpts_{yyyymm}.csv.gz`),
  * generalized to the 5m/1h/1d/30d ladder required by the target spec.
  *
  * Each tier's bucket is a tumbling window of `seconds` aligned to the
  * Unix epoch; `bucket(t) = t - (t mod seconds)`. Every coarser tier's
  * width is an integer multiple of the finer tier's, so the cascade can
  * be computed tier-to-tier with mergeable (sum/min/max/count) partial
  * aggregates — the distributed analog of the reference's chunked
  * partial-aggregation + final merge (s3.py:344-366).
  */
final case class TierSpec(name: String, seconds: Long) {
  require(seconds > 0, s"tier width must be positive: $seconds")
}

object TierSpec {
  val T5m: TierSpec  = TierSpec("5m", 300L)
  val T1h: TierSpec  = TierSpec("1h", 3600L)
  val T1d: TierSpec  = TierSpec("1d", 86400L)
  val T30d: TierSpec = TierSpec("30d", 2592000L)

  /** Finest → coarsest; each divides the next. */
  val cascade: Seq[TierSpec] = Seq(T5m, T1h, T1d, T30d)

  def byName(name: String): TierSpec =
    cascade.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"unknown tier: $name"))
}

/** Three-state missingness, preserving the reference's two distinct
  * missing sentinels (NODATA="" vs UNDETECT="NaN",
  * /root/reference/src/vptstools/vpts.py:17-18,65-66) plus OK.
  * Internally typed (never stringly); rendered only at the CSV sink
  * (graft.fmt.VptsCsv).
  */
object Flag {
  val OK: Byte       = 0
  val NODATA: Byte   = 1 // gap-filled null-marker row
  val UNDETECT: Byte = 2

  def name(f: Byte): String = f match {
    case OK       => "OK"
    case NODATA   => "NODATA"
    case UNDETECT => "UNDETECT"
    case other    => throw new IllegalArgumentException(s"bad flag: $other")
  }
}
