package graft

import graft.functions.HllSketch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The HLL sketch contract: estimates land within a few standard errors
  * (σ ≈ 1.04/√1024 ≈ 3.3%) across small (linear-counting) and large
  * (harmonic-mean) regimes, the merge of per-subset sketches is
  * BIT-IDENTICAL to the union's sketch, and registers are
  * partition-order invariant (max is associative/commutative/idempotent
  * — the property that makes it a legal partial aggregate).
  */
class HllSketchSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private def registersOf(ids: Seq[Long], partitions: Int): Array[Int] = {
    val sess = spark
    import sess.implicits._
    ids.toDF("k").repartition(partitions)
      .select(HllSketch.slotsFor(col("k")).as("s"))
      .agg(HllSketch.sketch(col("s")).as("sk"))
      .collect()(0).getSeq[Int](0).toArray
  }

  test("estimates are within 4 sigma across regimes") {
    for (n <- Seq(10, 150, 2000, 20000)) {
      val est = HllSketch.estimate(registersOf((1L to n.toLong), 7))
      val tol = math.max(2.0, 4 * 0.033 * n) // ±4σ, floor of 2 for tiny n
      assert(math.abs(est - n) <= tol, s"n=$n est=$est")
    }
  }

  test("merged subset sketches equal the union sketch bit-for-bit") {
    val all = (1L to 5000L)
    val (evens, odds) = all.partition(_ % 2 == 0)
    val skAll = registersOf(all, 11)
    val merged = registersOf(evens, 3).zip(registersOf(odds, 5))
      .map { case (a, b) => math.max(a, b) }
    assert(merged.sameElements(skAll))
  }

  test("registers are partition-count invariant and duplicate-insensitive") {
    val ids = (1L to 3000L)
    val a = registersOf(ids, 2)
    val b = registersOf(ids, 17)
    assert(a.sameElements(b))
    // idempotence: inserting every id twice changes nothing
    val dup = registersOf(ids ++ ids, 5)
    assert(dup.sameElements(a))
  }

  test("null keys are skipped, not inserted") {
    val sess = spark
    import sess.implicits._
    val df = Seq(Some(1L), None, Some(2L), None).toDF("k")
    val sk = df.select(HllSketch.slotsFor(col("k")).as("s"))
      .agg(HllSketch.sketch(col("s")).as("sk"))
      .collect()(0).getSeq[Int](0).toArray
    assert(HllSketch.estimate(sk) == 2L)
  }
}
