package graft

import graft.functions.DdSketch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DDSketch contract: any quantile of any in-range input lands within
  * the α relative-error bound, merged per-subset sketches are BIT-IDENTICAL
  * to the whole-input sketch (integer bucket sums commute), the store is
  * partition invariant, nulls are skipped, and the sign/zero layout orders
  * correctly (negatives < zero < positives).
  */
class DdSketchSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private def sketchOf(xs: Seq[Double], partitions: Int): Array[Long] = {
    val sess = spark
    import sess.implicits._
    xs.toDF("x").repartition(partitions)
      .select(DdSketch.slotFor(col("x")).as("s"))
      .agg(DdSketch.sketch(col("s")).as("sk"))
      .collect()(0).getSeq[Long](0).toArray
  }

  private def quantileOf(sk: Array[Long], q: Double): Double = {
    val sess = spark
    import sess.implicits._
    Seq(1).toDF("one")
      .select(DdSketch.quantileCol(typedLit(sk), q).as("est"))
      .collect()(0).getDouble(0)
  }

  test("quantile estimates stay within the alpha relative-error bound") {
    // log-uniform-ish positive values spread over 5 decades, deterministic
    val xs = (1 to 2000).map(i => math.pow(10.0, (i % 500) / 100.0) * (1 + (i % 7)))
    val sorted = xs.sorted
    val sk = sketchOf(xs.map(_.toDouble), 7)
    for (q <- Seq(0.01, 0.25, 0.5, 0.9, 0.95, 0.99)) {
      val est = quantileOf(sk, q)
      // the driver twin (used by the PROPERTY test) matches the native
      // expression bit-for-bit
      assert(DdSketch.quantileOfStore(sk, q).contains(est))
      // rank floor(q*(n-1))+1 — the same order statistic quantileCol targets
      val exact = sorted(math.floor(q * (xs.size - 1)).toInt)
      assert(math.abs(est - exact) / exact <= DdSketch.Alpha + 1e-9,
        s"q=$q est=$est exact=$exact relerr=${math.abs(est - exact) / exact}")
    }
  }

  test("negative / zero / positive values order correctly through the store") {
    val xs = Seq(-100.0, -1.0, -0.5, 0.0, 0.0, 0.5, 1.0, 100.0)
    val sk = sketchOf(xs, 3)
    assert(sk.sum == xs.size)
    // p near 0 → most negative; median → zero region; p near 1 → largest
    val lo = quantileOf(sk, 0.01)
    assert(math.abs(lo + 100.0) / 100.0 <= DdSketch.Alpha, s"lo=$lo")
    val hi = quantileOf(sk, 1.0)
    assert(math.abs(hi - 100.0) / 100.0 <= DdSketch.Alpha, s"hi=$hi")
    val mid = quantileOf(sk, 0.5)
    assert(mid == 0.0, s"median of the symmetric set must hit the zero bucket, got $mid")
  }

  test("merged subset sketches equal the whole-input sketch bit-for-bit") {
    val xs = (1 to 1000).map(i => (i % 97) * 1.5 + 0.01)
    val whole = sketchOf(xs, 5)
    val evens = sketchOf(xs.zipWithIndex.collect { case (x, i) if i % 2 == 0 => x }, 3)
    val odds = sketchOf(xs.zipWithIndex.collect { case (x, i) if i % 2 == 1 => x }, 4)
    val merged = evens.zip(odds).map { case (a, b) => a + b }
    assert(merged.toSeq == whole.toSeq)
  }

  test("PROPERTY: any in-range sample's quantiles respect the alpha bound (driver twins)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // driver-side twins (slotOf/quantileOfStore mirror the Column/native
    // paths bit-for-bit) let scalacheck run hundreds of samples jobs-free
    val genXs = for {
      n <- Gen.choose(1, 400)
      xs <- Gen.listOfN(n, Gen.oneOf(
        Gen.choose(1e-6, 1e9),                         // positive, 15 decades
        Gen.choose(-1e9, -1e-6),                       // negative
        Gen.const(0.0)))
    } yield xs
    val prop = Prop.forAll(genXs, Gen.choose(0.0, 1.0)) { (xs, q) =>
      val store = new Array[Long](DdSketch.Size)
      xs.foreach(x => store(DdSketch.slotOf(x)) += 1)
      val est = DdSketch.quantileOfStore(store, q).get
      val sorted = xs.sorted
      val exact = sorted(math.floor(q * (xs.size - 1)).toInt)
      if (exact == 0.0) est == 0.0
      else math.abs(est - exact) / math.abs(exact) <= DdSketch.Alpha + 1e-9
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("store is partition invariant; nulls are skipped; clamping holds extremes") {
    val sess = spark
    import sess.implicits._
    val xs = (1 to 500).map(i => i * 0.37)
    assert(sketchOf(xs, 1).toSeq == sketchOf(xs, 13).toSeq)

    val withNulls = Seq[Option[Double]](Some(1.0), None, Some(2.0), None)
      .toDF("x")
      .select(DdSketch.slotFor(col("x")).as("s"))
      .agg(DdSketch.sketch(col("s")).as("sk"))
      .collect()(0).getSeq[Long](0)
    assert(withNulls.sum == 2, "null values must be skipped, not bucketed")

    // out-of-range magnitudes clamp into the end buckets instead of crashing
    val extreme = sketchOf(Seq(1e300, -1e300, 1e-300), 2)
    assert(extreme.sum == 3)
  }
}
