package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable relative-error quantile sketch (DDSketch-style, fixed-size
  * store) — quantiles as DATA, completing the engine's reusable-sketch
  * family beside [[TopKAggregate]], [[CountMinSketch]] and [[HllSketch]]:
  * store a per-day/per-source sketch column, MERGE later by elementwise
  * sum, and answer any quantile over any rollup without re-touching raw
  * data (the p99-latency-per-arbitrary-slice pattern).
  *
  * Buckets: value x>0 lands in index `i = ceil(ln(x)/ln(γ))` with
  * `γ = (1+α)/(1−α)` (α = 0.02), i.e. x ∈ (γ^(i−1), γ^i]; reporting the
  * bucket's representative `2·γ^i/(γ+1)` guarantees relative error ≤ α
  * for any in-range value (the DDSketch bound, Masson et al., VLDB'19 —
  * public algorithm). The store is a FIXED array<long>: one zero bucket +
  * [[IdxMin]]..[[IdxMax]] per sign (indexes clamp at the ends, trading
  * accuracy outside |x| ∈ [γ^IdxMin, γ^IdxMax] ≈ [4e-10, 4e13] for a
  * constant footprint) — so, like the HLL registers, a sketch is ~20 KiB
  * regardless of input rows, partial aggregation ships a constant amount
  * per partition, and MERGE (elementwise +) is exact: merged per-subset
  * sketches are BIT-IDENTICAL to the whole-input sketch (integer sums are
  * associative/commutative), which also makes every result deterministic
  * under any partitioning.
  *
  * Per-row input is a precomputed SLOT from [[slotFor]] — a codegen'd
  * Column expression (ln/ceil/clamp on built-ins); the aggregator itself
  * just increments `buf(slot)`.
  */
object DdSketch {
  val Alpha = 0.02
  val Gamma: Double = (1.0 + Alpha) / (1.0 - Alpha)
  val IdxMin: Int = -512
  val IdxMax: Int = 767
  val NP: Int = IdxMax - IdxMin + 1 // buckets per sign
  val Size: Int = 2 * NP + 1        // [zero][positive NP][negative NP]

  private val LnGamma = math.log(Gamma)

  /** Store slot for a value: 0 = zero bucket, 1..NP positives (ascending
    * index), NP+1..2NP negatives (ascending index of |x|). NULL → NULL
    * (skipped by the aggregator).
    */
  def slotFor(x: Column): Column = {
    def idxOf(absX: Column) =
      greatest(lit(IdxMin),
        least(lit(IdxMax), ceil(log(absX) / lit(LnGamma)).cast("int")))
    // 1-element array so a NULL value stays a skippable NULL through the
    // udaf boundary (a primitive int input would decode NULL as 0 — the
    // zero bucket); same shape as HllSketch.slotsFor
    when(x.isNull, lit(null).cast("array<int>"))
      .when(x === 0.0, array(lit(0)))
      .when(x > 0.0, array(idxOf(x) - lit(IdxMin) + lit(1)))
      .otherwise(array(idxOf(-x) - lit(IdxMin) + lit(NP + 1)))
  }

  /** Representative value of a slot (driver-side twin of the literal
    * table used by [[quantileCol]]).
    */
  private[graft] def valueOfSlot(slot: Int): Double =
    if (slot == 0) 0.0
    else if (slot <= NP) 2.0 * math.pow(Gamma, IdxMin + slot - 1) / (Gamma + 1.0)
    else -2.0 * math.pow(Gamma, IdxMin + slot - NP - 1) / (Gamma + 1.0)

  /** Slots in ascending VALUE order: all negatives (|x| descending), the
    * zero bucket, all positives (ascending).
    */
  private val orderedSlots: Array[Int] =
    ((2 * NP) to (NP + 1) by -1).toArray ++ Array(0) ++ (1 to NP).toArray

  private val orderedValues: Array[Double] = orderedSlots.map(valueOfSlot)

  /** Quantile estimate from a sketch column: reorder the counts into
    * value-ascending order (three slices — O(1) expression nodes, not one
    * node per bucket), then one `aggregate` walk finds the bucket
    * containing rank ⌊q·(total−1)⌋+1 (the canonical DDSketch rank: the
    * same order statistic `percentile`/`quantile_cont` anchor their
    * interpolation on, so estimates track exact-percentile checks instead
    * of drifting a whole order statistic at sparse tails) and reports its
    * representative. Cost is O(Size) per GROUP (not per input row).
    * Null/empty sketch → null.
    */
  def quantileCol(sk: Column, q: Double): Column = {
    require(q >= 0.0 && q <= 1.0, s"quantile must be in [0,1], got $q")
    // negatives (|x| descending) ++ zero ++ positives (ascending); slot s
    // lives at array index s+1 for element_at but slice() is 1-based too
    val ordered = concat(
      reverse(slice(sk, NP + 2, NP)), slice(sk, 1, 1), slice(sk, 2, NP))
    val total = aggregate(ordered, lit(0L), (a, c) => a + c)
    val target = floor(lit(q) * (total - 1).cast("double")).cast("long") + 1L
    val entries = zip_with(ordered, typedLit(orderedValues),
      (c, v) => struct(c.as("c"), v.as("v")))
    val walk = aggregate(entries,
      struct(lit(0L).as("cum"), lit(null).cast("double").as("ans")),
      (acc, e) => struct(
        (acc("cum") + e("c")).as("cum"),
        coalesce(acc("ans"),
          when(acc("cum") + e("c") >= target, e("v"))).as("ans")))
    when(total === 0, lit(null).cast("double")).otherwise(walk("ans"))
  }

  /** Union of two sketches: elementwise sum — exact and order-free. */
  def mergeCol(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => x + y)

  def sketch: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new DdSketchAgg, ExpressionEncoder[Array[Int]]())
}

class DdSketchAgg extends Aggregator[Array[Int], Array[Long], Array[Long]] {
  def zero: Array[Long] = new Array[Long](DdSketch.Size)

  def reduce(b: Array[Long], slot: Array[Int]): Array[Long] = {
    // null guard: a null value yields a null slot array upstream; skip
    if (slot != null && slot.length == 1 && slot(0) >= 0 && slot(0) < b.length)
      b(slot(0)) += 1L
    b
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  def finish(b: Array[Long]): Array[Long] = b

  def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
