package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable KMV ("k minimum values") theta sketch — distinct counting
  * with SET ALGEBRA, the capability the HLL family ([[HllSketch]]) cannot
  * provide: two HLLs union losslessly but cannot intersect, while two KMV
  * sketches support an unbiased INTERSECTION estimate (and by extension
  * difference / Jaccard) — the sketch behind audience-overlap /
  * shared-vocabulary / cross-slice-contamination questions at 100 TB,
  * where materializing the distinct sets to intersect them exactly would
  * itself be the bottleneck. Sixth member of the engine's mergeable-sketch
  * family (TopK, CMS, HLL, DdSketch, Bloom).
  *
  * Representation: the K smallest DISTINCT `xxhash64` values of the key
  * set, as a sorted ascending `array<bigint>` column (SIGNED order — the
  * hash is uniform over the full 2^64 range, and signed ascending is
  * order-isomorphic to the usual [0,1) fraction via f(h) = h/2^64 + 1/2,
  * so "k smallest signed" IS "k smallest fractions"). Everything is
  * DETERMINISTIC: the k-smallest set of a fixed input is partition- and
  * order-invariant, so same input → bit-identical sketch on any plan.
  *
  * Estimates (classic KMV, Bar-Yossef et al. 2002 / the DataSketches theta
  * formulation):
  *  - cardinality: exact `|sketch|` while under K; else `(K-1) / f(h_K)`
  *    where `h_K` is the K-th smallest hash (RSE ≈ 1/√(K−2) ≈ 6.3% at
  *    K=256).
  *  - intersection: θ = min(θ_A, θ_B) (θ = f(h_K), or 1 when the sketch
  *    holds its whole set); every retained hash < θ is an inclusion-
  *    probability-θ uniform sample of its set, so
  *    `|A∩B| ≈ |{h ∈ A ∩ B : h < θ}| / θ`.
  *
  * Merge (union) keeps the K smallest of the union of two sketches —
  * associative, commutative, IDEMPOTENT — so pre-aggregated per-slice
  * sketches roll up to BIT-IDENTICAL arrays vs sketching the union raw
  * (the declared query's `merge_exact` boolean), and partial aggregation
  * ships a constant ≤ K×8 B per partition regardless of input size.
  *
  * Scale posture: `reduce` is O(1) for the overwhelming majority of rows —
  * once the buffer is full, any hash ≥ the current K-th is rejected on a
  * single comparison (probability K/n of surviving); inserts binary-search
  * and shift within the fixed K-slot buffer. No per-row allocation after
  * the buffer fills.
  */
object ThetaSketch {
  val K = 256
  private val TwoTo64 = math.pow(2.0, 64)

  /** Hash a key column for sketching: xxhash64 (fixed seed 42 inside
    * Spark — deterministic across runs/partitionings). NULL key → NULL
    * (skipped by the aggregator), mirroring [[HllSketch.slotsFor]].
    */
  def hashFor(key: Column): Column =
    when(key.isNull, lit(null).cast("bigint")).otherwise(xxhash64(key))

  /** KMV aggregator over pre-hashed long keys ([[hashFor]]). Buffer is the
    * sorted ascending array of the ≤K smallest distinct hashes seen.
    */
  class KmvAgg extends Aggregator[java.lang.Long, Array[Long], Array[Long]] {
    def zero: Array[Long] = Array.emptyLongArray
    def reduce(b: Array[Long], v: java.lang.Long): Array[Long] = {
      if (v == null) return b
      val x = v.longValue()
      val n = b.length
      // fast path: buffer full and x not smaller than the current max —
      // rejects all but ~K/n of rows on one comparison
      if (n == K && x >= b(n - 1)) return b
      val idx = java.util.Arrays.binarySearch(b, x)
      if (idx >= 0) b // already present (distinctness)
      else {
        val ins = -idx - 1
        if (n < K) {
          val out = new Array[Long](n + 1)
          System.arraycopy(b, 0, out, 0, ins)
          out(ins) = x
          System.arraycopy(b, ins, out, ins + 1, n - ins)
          out
        } else {
          // full: x < b(K-1), so it displaces the max in place
          System.arraycopy(b, ins, b, ins + 1, K - 1 - ins)
          b(ins) = x
          b
        }
      }
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      val out = new Array[Long](math.min(K, a.length + b.length))
      var i = 0; var j = 0; var n = 0
      // two-pointer merge; each input is internally distinct, so the only
      // duplicates are cross-array equal heads — advance both
      while (n < out.length && (i < a.length || j < b.length)) {
        val v =
          if (j >= b.length) { val t = a(i); i += 1; t }
          else if (i >= a.length) { val t = b(j); j += 1; t }
          else if (a(i) < b(j)) { val t = a(i); i += 1; t }
          else if (b(j) < a(i)) { val t = b(j); j += 1; t }
          else { val t = a(i); i += 1; j += 1; t }
        out(n) = v; n += 1
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  def sketch: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new KmvAgg, ExpressionEncoder[java.lang.Long]())

  /** Hash value → its [0,1) fraction, columnar — clamped away from 0 so
    * a K-th smallest hash of exactly Long.MinValue (a ~2^-63 event) can't
    * make θ = 0 and the estimates divide by zero.
    */
  private def frac(h: Column): Column =
    greatest(h.cast("double") / lit(TwoTo64) + lit(0.5), lit(1.0 / TwoTo64))

  /** θ of a sketch: 1.0 while it holds its whole set, else the K-th
    * smallest hash's fraction.
    */
  def thetaCol(sk: Column): Column =
    when(size(sk) < K, lit(1.0)).otherwise(frac(element_at(sk, K)))

  /** Cardinality estimate: exact below K, else (K-1)/θ. */
  def estimateCol(sk: Column): Column =
    when(size(sk) < K, size(sk).cast("double"))
      .otherwise(lit((K - 1).toDouble) / thetaCol(sk))

  /** Columnar union — K smallest of the merged distinct hashes; the
    * roll-up twin of [[KmvAgg.merge]], bit-identical to sketching the
    * union raw (sorted-ascending arrays in, sorted-ascending array out).
    */
  def mergeCol(a: Column, b: Column): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, K)

  /** Intersection-cardinality estimate of the two sketched sets:
    * `|{h ∈ A∩B : h < θ}| / θ`, θ = min(θ_A, θ_B). Exact whenever both
    * sketches are under K (they then hold their full hash sets).
    */
  def intersectEstimateCol(a: Column, b: Column): Column = {
    val maxL = lit(Long.MaxValue)
    val thLong = least(
      when(size(a) < K, maxL).otherwise(element_at(a, K)),
      when(size(b) < K, maxL).otherwise(element_at(b, K)))
    val thF = frac(thLong)
    val common = size(array_intersect(
      filter(a, e => e < thLong), filter(b, e => e < thLong)))
    // Both-under-K → each sketch holds its FULL hash set, so the exact
    // path is a plain set intersection — no θ filter, which would wrongly
    // drop a retained hash equal to Long.MaxValue (θ is exclusive).
    when(size(a) < K && size(b) < K,
      size(array_intersect(a, b)).cast("double"))
      .otherwise(common.cast("double") / thF)
  }
}
