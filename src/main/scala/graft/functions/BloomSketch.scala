package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable BLOOM FILTER as a data column — the set-membership member of
  * the sketch family (TopK / CMS / HLL / DdSketch), completing the
  * pre-aggregate-once-roll-up-forever contract for "was this key active
  * in slice X": store one bloom per fine slice (day, shard), OR them into
  * any coarser range, and probe without re-touching raw rows. OR of
  * blooms over deterministic hashes is EXACTLY the bloom of the union —
  * the roll-up is bit-exact by construction, not approximately so.
  *
  * Layout: 2^16 bits as 1024 long lanes, K=4 bit positions per key from
  * the SAME XXH64 chain Spark's `xxhash64` SQL function computes
  * (seed 42, arguments folded left), so [[mightContain]] tests membership
  * with PURE COLUMN functions — shiftrightunsigned + element_at inside
  * whole-stage codegen, no UDF on the probe side. fp at load n:
  * (1 − e^(−Kn/m))^K — ~6e-5 at n=1500, 1% at n≈12k; beyond that widen
  * lanes (the layout is a constant here, a config at cluster scale).
  *
  * Build obeys SURVEY note 27: feed the udaf DISTINCT keys per group
  * (groupBy-distinct first), so the 8 KiB buffer's encoder round-trip is
  * paid per distinct key, never per raw row.
  */
object BloomSketch {
  val Lanes = 1024 // 65536 bits
  val K = 4

  import org.apache.spark.sql.catalyst.expressions.XXH64

  /** JVM-side bit positions for key v — MUST stay the mirror of
    * [[mightContain]]'s column chain: Spark's xxhash64(lit(i: Long), col)
    * is hashLong(col, hashLong(i, 42)).
    */
  private[graft] def bitPositions(v: Long): Array[Int] = {
    val out = new Array[Int](K)
    var i = 0
    while (i < K) {
      out(i) = (XXH64.hashLong(v, XXH64.hashLong(i.toLong, 42L)) & 0xFFFFL).toInt
      i += 1
    }
    out
  }

  /** Column-side membership test over a bloom ARRAY column: all K bits
    * set. Identical hash chain as [[bitPositions]]; element_at is
    * 1-based.
    */
  def mightContain(bloom: Column, v: Column): Column =
    (0 until K).map { i =>
      val pos = xxhash64(lit(i.toLong), v).bitwiseAND(lit(0xFFFFL))
      val lane = element_at(bloom, (shiftrightunsigned(pos, 6) + 1).cast("int"))
      call_function("bit_get", lane, pos.bitwiseAND(lit(63L)).cast("int")) === 1
    }.reduce(_ && _)

  /** Builds a bloom over long keys. */
  class BloomAgg extends Aggregator[Long, Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](Lanes)
    def reduce(b: Array[Long], v: Long): Array[Long] = {
      val ps = bitPositions(v)
      var i = 0
      while (i < ps.length) {
        b(ps(i) >>> 6) |= (1L << (ps(i) & 63))
        i += 1
      }
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = orInto(a, b)
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** Merges already-built bloom COLUMNS by elementwise OR — the roll-up
    * aggregate; input rows are blooms (one per fine slice), so note 27's
    * per-row buffer cost is inherently respected.
    */
  class BloomOrAgg extends Aggregator[Array[Long], Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](Lanes)
    def reduce(b: Array[Long], sk: Array[Long]): Array[Long] = orInto(b, sk)
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = orInto(a, b)
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  private def orInto(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (b != null) {
      // malformed blooms fail loudly — silently skipping one would yield a
      // roll-up that LOOKS valid but reports false negatives
      require(b.length == a.length,
        s"malformed bloom: expected ${a.length} lanes, got ${b.length}")
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
    }
    a
  }

  def sketch: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new BloomAgg, ExpressionEncoder[Long]())

  def orAgg: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new BloomOrAgg, ExpressionEncoder[Array[Long]]())

  /** SCALE-PATH bloom build, no Aggregator anywhere near the raw keys
    * (SURVEY note 27: a typed-Aggregator udaf pays its 8 KiB buffer's
    * encoder round-trip PER INPUT ROW — fine for thousands of keys,
    * wrong for millions): each key explodes to its K (lane, mask) pairs
    * map-side, a NATIVE codegen'd `bit_or` collapses (group, lane) with
    * map-side combine, and the only object aggregation is the per-group
    * array assembly over ≤ [[Lanes]] rows. Bit-identical to [[sketch]]
    * ([[BloomSketchSpec]] pins it). Returns `groupCols :+ bloom`.
    */
  def buildBlooms(df: org.apache.spark.sql.DataFrame, keyCol: String,
      groupCols: String*): org.apache.spark.sql.DataFrame = {
    val pairs = (0 until K).map { i =>
      val pos = xxhash64(lit(i.toLong), col(keyCol)).bitwiseAND(lit(0xFFFFL))
      struct(shiftrightunsigned(pos, 6).cast("int").as("lane"),
        call_function("shiftleft", lit(1L),
          pos.bitwiseAND(lit(63L)).cast("int")).as("mask"))
    }
    val gs = groupCols.map(col)
    // explode_outer, not explode: the literal-length array is non-empty by
    // construction and the _outer form keeps InferFiltersFromGenerate from
    // re-inlining the generator child (SURVEY note 2)
    df.select(gs :+ explode_outer(array(pairs: _*)).as("lm"): _*)
      .groupBy(gs :+ col("lm.lane").as("lane"): _*)
      .agg(expr("bit_or(lm.mask)").as("w"))
      .groupBy(gs: _*)
      .agg(map_from_entries(collect_list(struct(col("lane"), col("w")))).as("m"))
      .select(gs :+
        transform(sequence(lit(0), lit(Lanes - 1)),
          l => coalesce(element_at(col("m"), l), lit(0L))).as("bloom"): _*)
  }
}
