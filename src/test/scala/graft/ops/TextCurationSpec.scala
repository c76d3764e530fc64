package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for the curation-hygiene operators (the oracle
  * queries gate distributed parity; these pin the rules themselves on
  * crafted inputs).
  */
class TextCurationSpec extends AnyFunSuite with SparkSuite {

  test("PII scrub: email/IP/phone replaced, clean text untouched, counts audit") {
    import spark.implicits._
    val df = Seq(
      (1L, "write to jane.doe+x@corp.example.org today"),
      (2L, "server 192.168.0.17 answered"),
      (3L, "call 555-0100-1234 or 555-010-1234"),
      (4L, "perfectly clean text with no identifiers"),
      (5L, "mail JANE.DOE@EXAMPLE.COM now")
    ).toDF("id", "t")
    val out = df.select(col("id"), TextStats.scrubPii(col("t")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "write to <EMAIL> today")
    assert(out(5L) == "mail <EMAIL> now", out(5L))
    assert(out(2L) == "server <IP> answered")
    assert(out(3L) == "call <PHONE> or <PHONE>")
    assert(out(4L) == "perfectly clean text with no identifiers")
    val counts = df.select(col("id") +: TextStats.piiCounts(col("t")): _*)
      .filter(col("id") === 3L).head()
    assert(counts.getAs[Long]("n_phone") == 2L &&
           counts.getAs[Long]("n_email") == 0L)
  }

  test("repetition stats: repeated chunks and dominant bigrams are flagged") {
    import spark.implicits._
    val chunk = "a b c d e f g h" // exactly one 8-word chunk
    val df = Seq(
      (1L, Seq.fill(4)(chunk).mkString(" ")),  // 4 identical chunks
      (2L, (1 to 32).map(i => s"w$i").mkString(" ")), // all distinct
      (3L, ("x y " * 16).trim)                 // one bigram dominates
    ).toDF("id", "t")
    val out = df.select(col("id") +: TextStats.repetitionCols(col("t")): _*)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("dup_chunk_milli"),
          r.getAs[Long]("top_bigram_milli")))).toMap
    assert(out(1L)._1 == 4L && out(1L)._2 == 750L, out(1L).toString)
    assert(out(2L)._2 == 0L && out(2L)._3 < 100L)
    assert(out(3L)._3 > 400L, s"dominant bigram not flagged: ${out(3L)}")
    // degenerate inputs don't crash (single word: zero bigrams)
    val tiny = Seq((9L, "solo")).toDF("id", "t")
      .select(col("id") +: TextStats.repetitionCols(col("t")): _*).head()
    assert(tiny.getAs[Long]("n_bigrams") == 0L &&
           tiny.getAs[Long]("top_bigram_milli") == 0L)
  }

  test("sequence packing: bucketed == global window at any bucket size; spans exact") {
    import spark.implicits._
    val d = Seq((0L, 300L), (1L, 300L), (2L, 600L), (3L, 12L), (10L, 500L))
      .toDF("id", "nt")
    val cols = Seq("id", "nt", "start_offset", "seq_id", "seq_offset",
                   "end_seq_id").map(col)
    val global = Pack.pack(d, "id", "nt", 512L).select(cols: _*)
    for (b <- Seq(1L, 2L, 7L, 100L)) {
      val bk = Pack.packBucketed(d, "id", "nt", 512L, b).select(cols: _*)
      assert(bk.exceptAll(global).isEmpty && global.exceptAll(bk).isEmpty,
        s"packBucketed($b) != global pack")
    }
    val got = global.collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4),
                                  r.getLong(5)))).toMap
    assert(got(0L) == ((0L, 0L, 0L, 0L)))
    // doc 1 starts at 300, crosses the 512 boundary → spans seqs 0-1
    assert(got(1L) == ((300L, 0L, 300L, 1L)))
    // doc 2 starts at 600 (seq 1, offset 88), ends token 1199 → seq 2
    assert(got(2L) == ((600L, 1L, 88L, 2L)))
    assert(got(3L) == ((1200L, 2L, 176L, 2L)))
    assert(got(10L) == ((1212L, 2L, 188L, 3L)))
    // the bucketed form's heavy window partitions by the id bucket
    val p = Pack.packBucketed(d, "id", "nt", 512L, 2L)
      .queryExecution.executedPlan.toString
    assert("hashpartitioning\\(_bkt".r.findFirstIn(p).isDefined, p.take(900))
  }

  test("curation ruleset registry: versions resolve, unknown fails, patterns disjoint") {
    import graft.core.CurationRuleset
    assert(CurationRuleset("v1.0") == CurationRuleset.V1)
    assert(CurationRuleset("v2.0").piiPatterns.exists(_._1 == "ssn"))
    intercept[IllegalArgumentException](CurationRuleset("v9.9"))
    // V1 is the frozen default the unversioned operators run under
    assert(CurationRuleset.Default == CurationRuleset.V1)
    assert(TextStats.stopwords == CurationRuleset.V1.stopwords)
    // v2's ssn pattern and the phone pattern never cross-match; v1
    // leaves the ssn shape untouched
    def scrub(rs: CurationRuleset) = spark.range(1)
      .select(TextStats.scrubPii(lit("id 123-45-6789 tel 555-010-1234"), rs)
        .as("s")).head().getString(0)
    assert(scrub(CurationRuleset.V2) == "id <SSN> tel <PHONE>")
    assert(scrub(CurationRuleset.V1) == "id 123-45-6789 tel <PHONE>")
  }

  test("derived pack bucket width bounds the phase-2 stream at any id span") {
    import spark.implicits._
    // sparse ids spanning 10^10 — the shape where a hard-coded width
    // would blow the phase-2 window up to O(corpus) rows
    val sparse = (0L until 1000L).map(i => (i * 10000000L, 7L)).toDF("id", "nt")
    val target = 100L
    val w = Pack.deriveBucketSize(sparse, "id", target)
    assert(w == 99900001L, s"width $w") // ceil(span 9990000001 / 100)
    // phase-2 input = distinct buckets ≤ target, regardless of span
    val buckets = sparse.select((col("id") - col("id") % w).as("b"))
      .distinct().count()
    assert(buckets <= target, s"$buckets buckets > target $target")
    // dense ids too (the toy-corpus shape)
    val dense = (0L until 500L).map(i => (i, 3L)).toDF("id", "nt")
    assert(Pack.deriveBucketSize(dense, "id", 64L) == 8L) // ceil(500/64)
    // the auto form equals the global window exactly on both shapes
    val cols = Seq("id", "nt", "start_offset", "seq_id", "seq_offset",
                   "end_seq_id").map(col)
    for (d <- Seq(sparse, dense)) {
      val g = Pack.pack(d, "id", "nt", 512L).select(cols: _*)
      val a = Pack.packBucketedAuto(d, "id", "nt", 512L, target).select(cols: _*)
      assert(a.exceptAll(g).isEmpty && g.exceptAll(a).isEmpty)
    }
    // degenerate: empty corpus derives width 1 and packs to empty
    val empty = dense.filter(lit(false))
    assert(Pack.deriveBucketSize(empty, "id") == 1L)
    assert(Pack.packBucketedAuto(empty, "id", "nt", 512L).isEmpty)
  }

  test("sequence packing invariants hold on random inputs (seeded)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val gen = for {
      n <- Gen.chooseNum(1, 60)
      ids <- Gen.pick(n, 0L until 500L)
      toks <- Gen.listOfN(n, Gen.chooseNum(0L, 2000L)) // incl. empty docs
    } yield ids.toSeq.sorted.zip(toks)
    val prop = Prop.forAll(gen) { rows =>
      val df = rows.toDF("id", "nt")
      val out = Pack.packBucketed(df, "id", "nt", 512L, 16L)
        .orderBy("id").collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[Long]("nt"),
                   r.getAs[Long]("start_offset"), r.getAs[Long]("seq_id"),
                   r.getAs[Long]("seq_offset"), r.getAs[Long]("end_seq_id")))
      // contiguous layout: each doc starts where the previous ended
      val contiguous = out.foldLeft((true, 0L)) {
        case ((ok, expect), (_, nt, start, _, _, _)) =>
          (ok && start == expect, expect + nt)
      }._1
      // sequence math is consistent with the offsets
      val math = out.forall { case (_, nt, start, sid, soff, eid) =>
        sid == start / 512L && soff == start % 512L && eid >= sid &&
          eid == (if (nt > 0) (start + nt - 1) / 512L else sid)
      }
      contiguous && math
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30)
        .withInitialSeed(Seed(20260817L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("chunk dedup: shared chunks across docs detected, within-doc repeats don't count") {
    import spark.implicits._
    val shared = "p q r s t u v w"
    val df = Seq(
      (1L, s"$shared one two three four five six seven eight"),
      (2L, s"$shared alpha beta gamma delta eps zeta eta theta"),
      (3L, s"$shared $shared"), // repeats the shared chunk internally
      (4L, "totally unrelated words in this document here now")
    ).toDF("id", "t")
    val out = Dedup.chunkShared(df, "id", "t")
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_chunks_distinct"), r.getAs[Long]("n_shared"),
          r.getAs[Long]("shared_milli")))).toMap
    assert(out(1L) == ((2L, 1L, 500L)), out(1L).toString)
    assert(out(2L) == ((2L, 1L, 500L)))
    // doc 3: both chunks are the SAME shared chunk → 1 distinct, shared
    assert(out(3L) == ((1L, 1L, 1000L)))
    assert(out(4L) == ((1L, 0L, 0L)))
  }
}
