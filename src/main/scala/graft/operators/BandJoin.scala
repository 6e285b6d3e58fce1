package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-bucket-guarded band self-join — the candidate stage shared by the
  * 64-bit-signature near-dup family (q_dedup_simhash, q_image_phash).
  *
  * The plain formulation equi-joins a banded signature frame with itself on
  * (band, bandBits) and lets bit_count(xor) verify the survivors. Its scale
  * hazard: each 16-bit band has only 2^16 possible values, so bucket
  * occupancy grows LINEARLY with the corpus once it passes ~65k docs and
  * in-bucket candidate pairs grow QUADRATICALLY — the round-9 scaling audit
  * measured q_dedup_simhash at 6.9× runtime for 5× data from exactly this
  * saturation (there is no corpus size at which a fixed 16-bit band stays
  * sparse).
  *
  * The guard: count bucket occupancy first (one extra keyed shuffle on the
  * same (band, bandBits) key), and for buckets over `cap`, SUB-SPLIT by a
  * secondary 16-bit key — the NEXT 16-bit slice of the same signature,
  * rotated per band. A hot bucket of size B then fans out across up to 2^16
  * sub-buckets and its pair count drops from B² toward Σᵢbᵢ², restoring
  * ~linear candidate growth; cold buckets keep subKey=0 and behave exactly
  * as before, so small-corpus output is bit-identical to the unguarded
  * join.
  *
  * Recall effect (documented, by design): a true near-dup pair is lost only
  * if EVERY band it agrees on is hot AND its rotated secondary slice
  * differs there. For Hamming ≤ 3 over 4 bands, pigeonhole leaves ≥ 1
  * agreeing band; the secondary slice of that band differs only when one of
  * the ≤ 3 flipped bits lands in the specific rotated 16-bit window (< 3/4
  * of flip placements), and only hot buckets are affected at all — exact
  * duplicates (Hamming 0) are NEVER lost, because every slice of equal
  * signatures is equal. This trades a bounded recall dent inside saturated
  * buckets for candidate volume that survives a 100 TB corpus.
  *
  * Pair semantics note: sub-splitting cannot "fix" genuinely quadratic
  * OUTPUT — a cluster of B identical signatures still emits B·(B−1)/2
  * verified pairs, because they collide in every sub-bucket too. That is
  * inherent to pair-listing; corpus-scale pipelines cluster via
  * q_dedup_cluster's connected components instead of materializing pairs.
  */
object BandJoin {

  /** Default occupancy above which a bucket is sub-split. 64 keeps the
    * worst un-split bucket at ≤ 64·63/2 ≈ 2k pairs while leaving every
    * healthy bucket (expected occupancy ~1 below 65k docs) untouched.
    */
  val DefaultCap = 64

  /** Candidate pairs (doc_a < doc_b, with both signatures) from a banded
    * frame of (doc_id, `sigCol`, band, bandBits), hot buckets sub-split.
    *
    * @param banded one row per (doc, band); bandBits is the band's value
    * @param sigCol the 64-bit signature column name (sig / phash)
    * @param cap    bucket occupancy above which the sub-split kicks in
    */
  def cappedCandidates(banded: DataFrame, sigCol: String,
      cap: Int = DefaultCap): DataFrame = {
    require(cap >= 2, s"band cap must be >= 2, got $cap")
    val occ = banded.groupBy("band", "bandBits").agg(count(lit(1)).as("occ"))
    // the rotated secondary slice: band b's sub-key is slice (b+1) mod 4 —
    // always a DIFFERENT contiguous 16 bits than a contiguous band's own,
    // deterministic per (band, signature). shiftright via expr: the SQL
    // ShiftRight expression accepts a column shift amount (the Scala
    // functions wrapper is Int-only).
    val subKey: Column = when(col("occ") > cap,
      expr(s"shiftright($sigCol, CAST(((band + 1) % 4) * 16 AS INT))")
        .bitwiseAND(lit(0xFFFFL)))
      .otherwise(lit(0L))
    val withSub = banded.join(occ, Seq("band", "bandBits"))
      .withColumn("subKey", subKey)
    withSub.as("x").join(withSub.as("y"), Seq("band", "bandBits", "subKey"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col(s"x.$sigCol").as("sig_a"), col(s"y.$sigCol").as("sig_b"))
      .distinct()
  }
}
