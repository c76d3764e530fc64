package graft.core

/** Versioned registry of the curation knobs — stopword tables, PII
  * patterns, quality/repetition thresholds. A real pipeline iterates
  * these weekly; making them a first-class versioned surface (instead
  * of literals buried in operators) means a run can be reproduced,
  * audited, and A/B'd by ruleset version, with the version recorded in
  * run manifests.
  *
  * Reference analog: the versioned VPTS CSV rulesets dispatched by
  * `get_vpts_version` (/root/reference/src/vptstools/vpts_csv.py:142-161)
  * — one name → one frozen bundle of formatting/validation rules; new
  * behavior lands as a NEW version, never by mutating an old one.
  *
  * Every pattern stays in the Java∩RE2 portable regex subset and every
  * threshold is integral, so both engines (Spark and the DuckDB
  * oracle) evaluate any version identically.
  */
final case class CurationRuleset(
    version: String,
    /** (lang, stopwords) for the n-gram language heuristic; fixed
      * priority order breaks ties deterministically. */
    stopwords: Seq[(String, Seq[String])],
    /** (kind, pattern, replacement) in application order. */
    piiPatterns: Seq[(String, String, String)],
    /** corpus_filter keep-gate floor (milli-units). */
    qualityFloorMilli: Long,
    /** Gopher repetition keep-gates (milli-units). */
    dupChunkMaxMilli: Long,
    topBigramMaxMilli: Long)

object CurationRuleset {

  /** The round-1..4 literals, frozen. */
  val V1: CurationRuleset = CurationRuleset(
    version = "v1.0",
    stopwords = Seq(
      "en" -> Seq("the", "a", "is", "and"),
      "de" -> Seq("der", "die", "das", "und"),
      "fr" -> Seq("le", "la", "et", "les"),
      "es" -> Seq("el", "los", "que", "y")),
    piiPatterns = Seq(
      // (?i): Jane.Doe@Example.COM must not survive (or half-survive)
      // the scrub; the inline flag behaves identically in Java and RE2
      ("email", "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>"),
      ("ip", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
      ("phone", "\\b[0-9]{3}-[0-9]{3,4}-[0-9]{4}\\b", "<PHONE>")),
    qualityFloorMilli = 300L,
    dupChunkMaxMilli = 300L,
    topBigramMaxMilli = 180L)

  /** A representative iteration: one more language, one more PII kind
    * (SSN — disjoint from the phone shape: its middle group is exactly
    * two digits where phone requires 3-4), a stricter quality floor.
    */
  val V2: CurationRuleset = V1.copy(
    version = "v2.0",
    stopwords = V1.stopwords :+ ("nl" -> Seq("het", "een", "niet", "ook")),
    piiPatterns = V1.piiPatterns :+
      ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"),
    qualityFloorMilli = 350L)

  val registry: Map[String, CurationRuleset] =
    Seq(V1, V2).map(r => r.version -> r).toMap

  /** Active default for unversioned callers (the frozen V1 — bumping
    * the default is an explicit, reviewed change).
    */
  val Default: CurationRuleset = V1

  def apply(version: String): CurationRuleset =
    registry.getOrElse(version, throw new IllegalArgumentException(
      s"unknown curation ruleset '$version' " +
        s"(have: ${registry.keySet.toSeq.sorted.mkString(", ")})"))
}
