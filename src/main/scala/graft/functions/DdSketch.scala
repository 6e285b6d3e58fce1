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
    val slot = when(x === 0.0, lit(0L))
      .when(x > 0.0, (idxOf(x) - lit(IdxMin) + lit(1)).cast("long"))
      .otherwise((idxOf(-x) - lit(IdxMin) + lit(NP + 1)).cast("long"))
    when(x.isNull, lit(null).cast("array<long>")).otherwise(array(slot))
  }

  /** Weighted insert — [slot, count] from an already-computed slot column:
    * the PRE-AGGREGATED path. The udaf's per-row cost is dominated by the
    * ~20 KiB buffer's encoder round-trip (true of every ScalaAggregator),
    * so at scale the sketch should never see raw rows: hash-aggregate
    * (group, slot) counts first (codegen'd, map-side-combining) and feed
    * the sketch one weighted row per DISTINCT slot — ≤ store-size rows per
    * group regardless of input size (the r8 bench fix: 11 s → ~1 s on
    * 100k rows at sf0.1).
    */
  def weightedSlot(slot: Column, weight: Column): Column =
    when(slot.isNull, lit(null).cast("array<long>"))
      .otherwise(array(slot.cast("long"), weight.cast("long")))

  /** Representative value of a slot (driver-side twin of [[quantileCol]]'s
    * ordinal arithmetic; same java.lang.Math.pow, so bit-identical).
    */
  private[graft] def valueOfSlot(slot: Int): Double =
    if (slot == 0) 0.0
    else if (slot <= NP) 2.0 * math.pow(Gamma, IdxMin + slot - 1) / (Gamma + 1.0)
    else -2.0 * math.pow(Gamma, IdxMin + slot - NP - 1) / (Gamma + 1.0)

  /** Driver-side twin of [[slotFor]] (same ceil/log/clamp math) — lets
    * property tests exercise the aggregator + walk without a Spark job.
    */
  private[graft] def slotOf(x: Double): Int = {
    def idx(a: Double) =
      math.max(IdxMin, math.min(IdxMax, math.ceil(math.log(a) / LnGamma).toInt))
    if (x == 0.0) 0
    else if (x > 0.0) idx(x) - IdxMin + 1
    else idx(-x) - IdxMin + NP + 1
  }

  /** Driver-side twin of [[DdQuantileExpr]]'s walk (identical traversal
    * and rank convention).
    */
  private[graft] def quantileOfStore(store: Array[Long], q: Double): Option[Double] = {
    val total = store.sum
    if (total == 0L) return None
    val target = math.floor(q * (total - 1)).toLong + 1L
    var cum = 0L
    var s = 2 * NP
    while (s >= NP + 1) {
      cum += store(s)
      if (cum >= target) return Some(valueOfSlot(s))
      s -= 1
    }
    cum += store(0)
    if (cum >= target) return Some(0.0)
    s = 1
    while (s <= NP) {
      cum += store(s)
      if (cum >= target) return Some(valueOfSlot(s))
      s += 1
    }
    None
  }

  /** Quantile estimate from a sketch column, as a NATIVE expression
    * ([[DdQuantileExpr]]): one O(Size) walk per GROUP row in plain JVM
    * code. Two higher-order-function formulations died here first: a
    * Size-element value-table literal cost ~2 s of PLANNING per call, and
    * an `aggregate` lambda whose rank target was an embedded sub-aggregate
    * re-evaluated that aggregate at EVERY step — O(Size²) interpreted
    * lambda work ≈ 0.8 s per output row (r8 bench findings). The walk
    * targets rank ⌊q·(total−1)⌋+1, the canonical DDSketch rank and the
    * order statistic `percentile`/`quantile_cont` anchor interpolation on,
    * so estimates track exact-percentile checks even at sparse tails.
    * Null/empty sketch → null.
    */
  def quantileCol(sk: Column, q: Double): Column = {
    require(q >= 0.0 && q <= 1.0, s"quantile must be in [0,1], got $q")
    org.apache.spark.sql.GraftColumnBridge.column(
      DdQuantileExpr(org.apache.spark.sql.GraftColumnBridge.expression(sk), q))
  }

  /** Union of two sketches: elementwise sum — exact and order-free. */
  def mergeCol(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => x + y)

  def sketch: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new DdSketchAgg, ExpressionEncoder[Array[Long]]())

  /** Aggregate MERGE of many sketch COLUMNS (elementwise sum) — the
    * roll-up-forever half of the contract: per-slice sketches stored as
    * data merge into any coarser slice without re-touching raw rows.
    * Input rows here are sketches (one per fine-grained group), so the
    * per-row buffer cost note (SURVEY note 27) is inherently respected.
    */
  def mergeAgg: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new DdMergeAgg, ExpressionEncoder[Array[Long]]())
}

/** Merges already-built sketch arrays by elementwise sum. */
class DdMergeAgg extends Aggregator[Array[Long], Array[Long], Array[Long]] {
  def zero: Array[Long] = new Array[Long](DdSketch.Size)
  def reduce(b: Array[Long], sk: Array[Long]): Array[Long] = merge(b, sk)
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (b != null) {
      // A truncated/corrupted sketch column must fail loudly: silently
      // skipping it would yield an incomplete rollup that LOOKS valid.
      require(b.length == a.length,
        s"malformed DdSketch: expected ${a.length} slots, got ${b.length}")
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
    }
    a
  }
  def finish(b: Array[Long]): Array[Long] = b
  def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

/** The quantile walk over a sketch's bucket array (see
  * [[DdSketch.quantileCol]]): slots visited in value-ascending order —
  * negatives by |x| descending (slots 2·NP…NP+1), the zero bucket, then
  * positives ascending (1…NP) — until the running count reaches rank
  * ⌊q·(total−1)⌋+1; the answer is that bucket's representative via the
  * same java.lang.Math.pow arithmetic as [[DdSketch.valueOfSlot]].
  * Eval-only (CodegenFallback): it runs once per GROUP row, never per
  * input row, so codegen would buy nothing.
  */
case class DdQuantileExpr(
    child: org.apache.spark.sql.catalyst.expressions.Expression, q: Double)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dd_quantile"
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): DdQuantileExpr =
    copy(child = c)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<bigint> (a DdSketch store), got ${other.sql}")
    }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (arr.numElements() != DdSketch.Size) return null
    val np = DdSketch.NP
    var total = 0L
    var i = 0
    while (i < DdSketch.Size) { total += arr.getLong(i); i += 1 }
    if (total == 0L) return null
    val target = math.floor(q * (total - 1)).toLong + 1L
    var cum = 0L
    // negatives: |x| descending = slot descending
    var s = 2 * np
    while (s >= np + 1) {
      cum += arr.getLong(s)
      if (cum >= target) return DdSketch.valueOfSlot(s)
      s -= 1
    }
    cum += arr.getLong(0)
    if (cum >= target) return 0.0
    s = 1
    while (s <= np) {
      cum += arr.getLong(s)
      if (cum >= target) return DdSketch.valueOfSlot(s)
      s += 1
    }
    null // unreachable: cum == total >= target by the end
  }
}

class DdSketchAgg extends Aggregator[Array[Long], Array[Long], Array[Long]] {
  def zero: Array[Long] = new Array[Long](DdSketch.Size)

  def reduce(b: Array[Long], slot: Array[Long]): Array[Long] = {
    // null guard: a null value yields a null slot array upstream; skip.
    // [slot] adds 1; [slot, w] adds w (the pre-aggregated path).
    if (slot != null && slot.length >= 1) {
      val s = slot(0).toInt
      if (s >= 0 && s < b.length)
        b(s) += (if (slot.length >= 2) slot(1) else 1L)
    }
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
