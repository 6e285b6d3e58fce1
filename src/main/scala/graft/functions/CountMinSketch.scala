package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable Count-Min Sketch — the bounded-memory frequency sketch for
  * heavy-hitter counting over unbounded key cardinality (the regime where
  * an exact groupBy's hash table no longer fits: per-URL/per-user counts
  * at 100 TB).
  *
  * Layout: `Depth` rows × `Width` counters, flattened row-major into one
  * `Array[Long]`. The aggregator's INPUT is the precomputed bucket-index
  * array (one index per row, from [[bucketsFor]]), so bucket hashing runs
  * as codegen'd `xxhash64` Column expressions — the Scala side never
  * re-implements the hash, and build/estimate use byte-identical bucket
  * functions by construction.
  *
  * Guarantees (the classic CMS contract):
  *  - no undercount, ever: every counter a key maps to receives +1 for
  *    each of its occurrences, collisions only ADD — so
  *    `estimate ≥ true_count` deterministically (the declared query's
  *    oracle-compared boolean);
  *  - overcount is bounded: E[over] ≤ totalRows/Width per depth row, and
  *    the min over `Depth` independent rows concentrates sharply
  *    (CountMinSketchSpec asserts the ε·N bound empirically).
  *
  * Scale posture: `reduce` is an O(Depth) array update per row, `merge`
  * an elementwise sum — associative, commutative, partition-order-free —
  * so Spark runs it as partial aggregation with a constant
  * `Depth·Width·8`-byte shuffle per partition, regardless of input rows
  * or key cardinality.
  */
object CountMinSketch {
  val Depth = 4
  val Width = 2048

  /** Bucket indices for a key column: Depth indices, the i-th from
    * `xxhash64(i, key)` — per-depth independence comes from the seed-lane
    * literal, and `pmod` keeps the index non-negative. Codegen'd built-ins
    * only.
    */
  def bucketsFor(key: Column): Column =
    // a NULL key must produce a NULL array (skipped by the aggregator),
    // not an array of NULL elements (which the primitive-int deserializer
    // rejects)
    when(key.isNull, lit(null).cast("array<int>"))
      .otherwise(array((0 until Depth).map(i =>
        pmod(xxhash64(lit(i), key), lit(Width.toLong)).cast("int")): _*))

  /** Point estimate from a sketch column: min over the Depth counters the
    * key maps to (`element_at` is 1-based; row-major flattening).
    */
  def estimateCol(cms: Column, key: Column): Column = {
    val bks = bucketsFor(key)
    least((0 until Depth).map(i =>
      element_at(cms, (lit(i * Width) + element_at(bks, i + 1)).cast("int") + 1)): _*)
  }

  /** Driver-side estimate twin for tests (same arithmetic over a collected
    * sketch; bucket indices must come from the SAME Spark expression).
    */
  def estimate(cms: Array[Long], buckets: Seq[Int]): Long =
    buckets.zipWithIndex.map { case (b, i) => cms(i * Width + b) }.min

  def sketch: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new CountMinSketchAgg, ExpressionEncoder[Array[Int]]())
}

class CountMinSketchAgg
    extends Aggregator[Array[Int], Array[Long], Array[Long]] {
  import CountMinSketch.{Depth, Width}

  def zero: Array[Long] = new Array[Long](Depth * Width)

  def reduce(b: Array[Long], buckets: Array[Int]): Array[Long] = {
    // null/ragged guard: a null key yields a null bucket array upstream;
    // skip rather than corrupt the sketch
    if (buckets != null && buckets.length == Depth) {
      var i = 0
      while (i < Depth) { b(i * Width + buckets(i)) += 1L; i += 1 }
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
