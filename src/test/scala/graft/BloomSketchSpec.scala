package graft

import graft.functions.BloomSketch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bloom's load-bearing invariant is the HASH MIRROR: the JVM-side
  * builder (BloomAgg via XXH64) and the column-side prober (xxhash64 +
  * bit_get inside codegen) must compute identical bit positions, or
  * membership silently breaks. Pinned here directly, plus the one-sided
  * error contract and the loud-failure rule for malformed blooms.
  */
class BloomSketchSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  test("JVM bitPositions mirror the column-side xxhash64 chain exactly") {
    val s = spark
    import s.implicits._
    val keys = Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue, 123456789L)
    val colSide = keys.toDF("v").select(
      col("v"),
      array((0 until BloomSketch.K).map(i =>
        xxhash64(lit(i.toLong), col("v")).bitwiseAND(lit(0xFFFFL)).cast("int")): _*)
        .as("pos"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    keys.foreach { v =>
      assert(BloomSketch.bitPositions(v).toSeq == colSide(v),
        s"hash mirror broken for key $v")
    }
  }

  test("membership is one-sided: every inserted key hits; absent keys almost never do") {
    val s = spark
    import s.implicits._
    val members = (1L to 500L).map(_ * 7919L)
    val bloom = members.toDF("v").agg(BloomSketch.sketch(col("v")).as("bf"))
    val probes = (members.map(v => (v, true)) ++
      (1L to 500L).map(v => (v * 7919L + 1L, false))).toDF("v", "member")
    val checked = probes.crossJoin(broadcast(bloom))
      .select(col("v"), col("member"),
        BloomSketch.mightContain(col("bf"), col("v")).as("hit"))
      .collect()
    assert(checked.filter(_.getBoolean(1)).forall(_.getBoolean(2)),
      "a bloom NEVER false-negatives")
    val fps = checked.filterNot(_.getBoolean(1)).count(_.getBoolean(2))
    assert(fps <= 5, s"fp count $fps out of 500 at n=500/m=65536/k=4")
  }

  test("OR roll-up of split halves equals the directly-built bloom bit-for-bit") {
    val s = spark
    import s.implicits._
    val keys = (1L to 300L).map(_ * 31L)
    val halves = keys.map(v => (v % 2, v)).toDF("half", "v")
      .groupBy("half").agg(BloomSketch.sketch(col("v")).as("bf"))
      .agg(BloomSketch.orAgg(col("bf")).as("rolled"))
    val direct = keys.toDF("v").agg(BloomSketch.sketch(col("v")).as("direct"))
    val eq = halves.crossJoin(direct)
      .select((col("rolled") === col("direct")).as("same")).collect()(0).getBoolean(0)
    assert(eq, "OR of partial blooms must equal the whole-set bloom exactly")
  }

  test("the native buildBlooms scale path is bit-identical to the udaf build") {
    val s = spark
    import s.implicits._
    val df = (1L to 400L).map(v => (v % 3, v * 1013L)).toDF("g", "v")
    val viaUdaf = df.groupBy("g").agg(BloomSketch.sketch(col("v")).as("bf"))
    val viaNative = BloomSketch.buildBlooms(df, "v", "g")
    val joined = viaUdaf.join(viaNative, Seq("g"))
      .select((col("bf") === col("bloom")).as("same")).collect()
    assert(joined.length == 3 && joined.forall(_.getBoolean(0)),
      "both builds must set identical bits")
  }

  test("a malformed (truncated) bloom fails the roll-up loudly") {
    val agg = new BloomSketch.BloomOrAgg
    val e = intercept[IllegalArgumentException] {
      agg.reduce(agg.zero, new Array[Long](10))
    }
    assert(e.getMessage.contains("malformed bloom"))
  }
}
