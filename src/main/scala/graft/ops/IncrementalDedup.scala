package graft.ops

import graft.table.{PartitionLineage, TierTable}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental cross-snapshot near-duplicate detection — the composition
  * a continuous-ingest corpus actually runs: instead of re-running
  * MinHash+LSH over the whole corpus per batch (O(corpus) map work,
  * O(corpus) pair generation), the corpus's LSH band stream
  * (`_id`, band, band_hash) is maintained as a snapshot table, and each
  * ingest
  *
  *  1. computes signatures + bands for the INCREMENT only (the O(n)
  *     expensive map work: shingling + seeded md5s),
  *  2. commits them as a new `ingest_seq` partition (copy-on-write —
  *     prior ingests' bands are carried forward untouched),
  *  3. generates exactly the NEW pairs: increment ids × (corpus ∪
  *     increment) ids sharing a band bucket — every pair is discovered
  *     at the ingest of its LATER member, so per-ingest pair sets are
  *     disjoint and their union converges to the full-corpus
  *     [[Dedup.minHashLsh]] run (oracle-gated),
  *  4. records the pairs per snapshot in a second table (lineage: which
  *     band snapshot produced them).
  *
  * Scale shape: the corpus band table is NEVER shuffled — corpus rows
  * are pre-filtered to the increment's buckets by a BROADCAST semi-join
  * on the increment's distinct (band, band_hash) keys (an increment of
  * n docs touches ≤ n·bands buckets), so the only exchange carries
  * bucket-matching rows, bounded by increment-buckets × bucket size.
  * The skew cap applies to the CUMULATIVE bucket size at pairing time
  * (a bucket that outgrows `maxBucket` stops producing new pairs; pairs
  * emitted while it was small are kept — the cap is monotone under
  * increments). At warehouse scale, store the band table bucketed by
  * band_hash so the per-ingest join is also co-located on disk.
  *
  * Reference analog: the watermark-driven touched-set recompute of
  * /root/reference/src/vptstools/bin/vph5_to_vpts.py:120-144, applied
  * to the dedup stage instead of the rollup cascade.
  */
final class IncrementalDedup(spark: SparkSession, root: String,
                             numHashes: Int = 16, bands: Int = 4,
                             shingleK: Int = 3, maxBucket: Int = 1000) {

  private val bandTable = new TierTable(s"$root/bands", spark).init()
  private val pairTable = new TierTable(s"$root/pairs", spark).init()

  /** Ingest one increment; returns the NEW near-dup candidate pairs it
    * introduces (id_a < id_b, distinct), already recorded in the pair
    * table under this ingest's sequence number.
    *
    * Replay-safe (the I5 contract [[graft.run.TierRunner.ingest]]
    * keeps for raw days, applied here): ids already present in the
    * band table are dropped from the increment BEFORE the signature
    * work, so re-running a crashed or duplicated ingest is a no-op —
    * no duplicate band rows, no re-emitted pairs. The known-id check
    * is a narrow id-column scan of the band table semi-joined against
    * the broadcast increment ids (never a corpus shuffle).
    */
  def ingest(increment: DataFrame, idCol: String, textCol: String): DataFrame = {
    val seq = bandTable.currentSnapshotId.map(_ + 1).getOrElse(0L)

    val fresh =
      if (seq == 0L) increment
      else {
        val knownIds = bandTable.read()
          .join(broadcast(increment.select(col(idCol).as("_id")).distinct()),
                Seq("_id"))
          .select(col("_id").as(idCol)).distinct()
        increment.join(knownIds, Seq(idCol), "left_anti")
      }

    // 1+2: increment bands, committed as this ingest's partition (the
    // expensive signature map work runs once, into the commit)
    val newBands = Dedup.lshBands(
        Dedup.minHashSignatures(fresh, idCol, textCol, numHashes, shingleK),
        numHashes, bands)
      .withColumn("ingest_seq", lit(seq))
    bandTable.commitOverwrite(newBands, "ingest_seq",
      Map(seq.toString -> PartitionLineage(seq, "ok")))

    // 3: new pairs — corpus rows restricted to increment-touched buckets
    // (broadcast semi-join: no corpus shuffle), cumulative skew cap via
    // one count window, then increment × touched-corpus within bucket.
    val inc = bandTable.read(Set(seq.toString))
    val touched = bandTable.read()
      .join(broadcast(inc.select("band", "band_hash").distinct()),
            Seq("band", "band_hash"))
    val sized = touched
      .withColumn("_bsz", count(lit(1)).over(
        Window.partitionBy("band", "band_hash")))
      .filter(col("_bsz") <= maxBucket)
    val l = sized.select(col("_id").as("id_x"), col("band"), col("band_hash"))
    val r = sized.filter(col("ingest_seq") === seq)
      .select(col("_id").as("id_y"), col("band"), col("band_hash"))
    val pairs = l.join(r, Seq("band", "band_hash"))
      .filter(col("id_x") =!= col("id_y"))
      .select(least(col("id_x"), col("id_y")).as("id_a"),
              greatest(col("id_x"), col("id_y")).as("id_b"))
      .distinct()

    // 4: record per snapshot (lineage → the band snapshot that made them)
    pairTable.commitOverwrite(pairs.withColumn("ingest_seq", lit(seq)),
      "ingest_seq", Map(seq.toString -> PartitionLineage(seq, "ok")))
    // read back the committed partition (no recompute for the caller);
    // a pair table that is still all-empty has no schema to read — that
    // ingest legitimately found nothing
    try pairTable.read(Set(seq.toString)).drop("ingest_seq")
    catch { case _: IllegalStateException => pairs }
  }

  /** All recorded pairs across every ingest (disjoint per-ingest sets;
    * equals the full-corpus batch run — the convergence contract).
    */
  def pairs(): DataFrame = pairTable.read().drop("ingest_seq")

  /** The accumulated corpus band stream. */
  def corpusBands(): DataFrame = bandTable.read()
}
