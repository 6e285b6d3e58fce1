package graft

import graft.functions.ThetaSketch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The KMV theta-sketch contract: exact below K; estimates within a few
  * standard errors above K (RSE ≈ 1/√(K−2) ≈ 6.3% at K=256); bit-identical
  * sketches on any partitioning (the k-smallest set is order-invariant);
  * columnar union merge bit-identical to sketching the union raw and
  * idempotent; intersection estimates exact under K and within tolerance
  * above it.
  */
class ThetaSketchSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private def sketchOf(ids: Seq[Long], partitions: Int): Array[Long] = {
    val sess = spark
    import sess.implicits._
    ids.toDF("k").repartition(partitions)
      .agg(ThetaSketch.sketch(ThetaSketch.hashFor(col("k"))).as("sk"))
      .collect()(0).getSeq[Long](0).toArray
  }

  test("sketch under K is the exact sorted distinct hash set") {
    val ids = (1L to 100L) ++ (1L to 100L) // duplicates must collapse
    val sk = sketchOf(ids, 5)
    assert(sk.length == 100)
    assert(sk.sorted.sameElements(sk))
    assert(sk.distinct.length == sk.length)
  }

  test("estimates are within 4 sigma above K") {
    for (n <- Seq(1000, 20000)) {
      val sk = sketchOf(1L to n.toLong, 7)
      assert(sk.length == ThetaSketch.K)
      val est = (ThetaSketch.K - 1).toDouble /
        (sk.last.toDouble / math.pow(2.0, 64) + 0.5)
      val tol = 4 * (1.0 / math.sqrt(ThetaSketch.K - 2)) * n
      assert(math.abs(est - n) <= tol, s"n=$n est=$est")
    }
  }

  test("sketches are bit-identical across partitionings") {
    val base = sketchOf(1L to 5000L, 1)
    for (p <- Seq(3, 7, 32))
      assert(sketchOf(1L to 5000L, p).sameElements(base), s"partitions=$p")
  }

  test("columnar merge of halves is bit-identical to the union sketch, and idempotent") {
    val sess = spark
    import sess.implicits._
    val df = (1L to 4000L).toDF("k")
      .select(col("k"), ThetaSketch.hashFor(col("k")).as("h"))
    val row = df.agg(
        ThetaSketch.sketch(col("h")).as("all"),
        ThetaSketch.sketch(when(col("k") % 2 === 0, col("h"))).as("even"),
        ThetaSketch.sketch(when(col("k") % 2 === 1, col("h"))).as("odd"))
      .select(
        (ThetaSketch.mergeCol(col("even"), col("odd")) === col("all")).as("m"),
        (ThetaSketch.mergeCol(col("all"), col("all")) === col("all")).as("idem"))
      .collect()(0)
    assert(row.getBoolean(0), "merge(even, odd) != sketch(all)")
    assert(row.getBoolean(1), "merge not idempotent")
  }

  test("intersection estimate: exact under K, within tolerance above") {
    val sess = spark
    import sess.implicits._
    // under K: A = 1..100, B = 51..150 → exact 50
    val small = (1L to 150L).toDF("k")
      .agg(
        ThetaSketch.sketch(when(col("k") <= 100, ThetaSketch.hashFor(col("k")))).as("a"),
        ThetaSketch.sketch(when(col("k") >= 51, ThetaSketch.hashFor(col("k")))).as("b"))
      .select(ThetaSketch.intersectEstimateCol(col("a"), col("b")).as("e"))
      .collect()(0).getDouble(0)
    assert(small == 50.0, s"under-K intersection should be exact, got $small")
    // above K: A = 1..6000, B = 3001..9000 → true 3000
    val big = (1L to 9000L).toDF("k")
      .agg(
        ThetaSketch.sketch(when(col("k") <= 6000, ThetaSketch.hashFor(col("k")))).as("a"),
        ThetaSketch.sketch(when(col("k") >= 3001, ThetaSketch.hashFor(col("k")))).as("b"))
      .select(ThetaSketch.intersectEstimateCol(col("a"), col("b")).as("e"))
      .collect()(0).getDouble(0)
    assert(math.abs(big - 3000.0) / 3000.0 < 0.35, s"big intersection est=$big")
  }

  test("boundary hashes: Long.MaxValue survives under-K intersection; Long.MinValue theta stays finite") {
    val sess = spark
    import sess.implicits._
    // Under-K sketches holding Long.MaxValue: the exact path must count it
    // (the θ filter is exclusive and would wrongly drop it).
    val a = typedLit(Array(1L, 42L, Long.MaxValue))
    val b = typedLit(Array(42L, 99L, Long.MaxValue))
    // A full-K sketch whose K-th smallest hash is Long.MinValue → raw
    // fraction 0; the clamp must keep θ > 0 and the estimate finite.
    val degenerate = typedLit(Array.fill(ThetaSketch.K)(Long.MinValue))
    val row = Seq(1).toDF("x").select(
        ThetaSketch.intersectEstimateCol(a, b).as("exact"),
        ThetaSketch.thetaCol(degenerate).as("th"),
        ThetaSketch.estimateCol(degenerate).as("est"))
      .collect()(0)
    assert(row.getDouble(0) == 2.0,
      s"under-K exact intersection must include Long.MaxValue, got ${row.getDouble(0)}")
    assert(row.getDouble(1) > 0.0, "theta must be clamped away from 0")
    assert(!row.getDouble(2).isInfinite && !row.getDouble(2).isNaN,
      s"estimate must be finite, got ${row.getDouble(2)}")
  }

  test("theta and cardinality estimate columns agree with the driver-side math") {
    val sess = spark
    import sess.implicits._
    val row = (1L to 3000L).toDF("k")
      .agg(ThetaSketch.sketch(ThetaSketch.hashFor(col("k"))).as("sk"))
      .select(
        ThetaSketch.thetaCol(col("sk")).as("th"),
        ThetaSketch.estimateCol(col("sk")).as("est"),
        element_at(col("sk"), ThetaSketch.K).as("kth"))
      .collect()(0)
    val expTh = row.getLong(2).toDouble / math.pow(2.0, 64) + 0.5
    assert(math.abs(row.getDouble(0) - expTh) < 1e-12)
    assert(math.abs(row.getDouble(1) - (ThetaSketch.K - 1) / expTh) < 1e-6)
  }
}
