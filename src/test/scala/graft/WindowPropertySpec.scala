package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §5.2.4: windowed aggregation vs brute force on random event
  * streams. Spark's `window()` bucketing must agree with a hand-computed
  * epoch-aligned floor for arbitrary timestamps (including negative epochs
  * and bucket-boundary instants).
  */
class WindowPropertySpec extends AnyFunSuite {

  test("tumbling window counts equal brute-force epoch-floor bucketing") {
    val spark = TestSpark.spark
    import spark.implicits._
    val genEvents: Gen[List[Long]] =
      Gen.listOfN(60, Gen.chooseNum(-3600L * 1000, 3 * 3600L * 1000)) // ms around epoch
    val prop = Prop.forAll(genEvents) { ms =>
      ms.isEmpty || {
        val df = ms.map(m => new Timestamp(m)).toDF("ts")
        val viaWindow = df.groupBy(window(col("ts"), "1 hour"))
          .count()
          .select(col("window.start").cast("long").as("w"), col("count"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val brute = ms.groupBy(m => math.floorDiv(m, 3600L * 1000) * 3600L)
          .map { case (w, xs) => w -> xs.size.toLong }
        viaWindow == brute
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("boundary instants land in the window they open, not the one they close") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq(new Timestamp(3600000L)).toDF("ts") // exactly 01:00:00
    val w = df.groupBy(window(col("ts"), "1 hour"))
      .count().select(col("window.start").cast("long")).collect()(0).getLong(0)
    assert(w == 3600L) // [01:00, 02:00), not [00:00, 01:00)
  }

  test("Ops.ntileExact equals the global-window ntile on random frames (r17)") {
    // the distributed rank (sampled-CDF range partitioning + driver
    // offsets) must reproduce ntile().over(Window.orderBy(...)) EXACTLY —
    // ties, negative values, duplicates, n not dividing the count,
    // n > count — since q_rfm's oracle hash rides on it
    val spark = TestSpark.spark
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val genRows: Gen[(List[Int], Int, Int)] = for {
      sz <- Gen.chooseNum(1, 300)
      vals <- Gen.listOfN(sz, Gen.chooseNum(-50, 50)) // heavy duplicates
      n <- Gen.chooseNum(1, 9)
      partitions <- Gen.oneOf(1, 2, 7, 32) // incl. degenerate counts
    } yield (vals, n, partitions)
    val prop = Prop.forAll(genRows) { case (vals, n, partitions) =>
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "m").repartition(5)
      val expect = df.withColumn("t",
          ntile(n).over(Window.orderBy(col("m").asc, col("id").asc)).cast("long"))
        .select("id", "t").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = graft.operators.Ops
        .ntileExact(df, n, col("m"), col("id"), "t", partitions = partitions)
        .select("id", "t").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == expect
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("Ops.ntileExact on a CONSTANT metric: exact tiles AND a multi-partition spread (r17 verdict item 2)") {
    // every row the same metric value = the worst tie case. Value-width
    // bucketing (the r17 design) put 100% of rows in bucket 0 → one task;
    // the sampled-CDF composite cut must (a) still produce the exact
    // SQL-standard tiles and (b) spread the tie group across range
    // partitions, because the tiebreak makes the composite key unique.
    val spark = TestSpark.spark
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val df = (0 until 4000).map(i => (i.toLong, 7)).toDF("id", "m")
      .repartition(8)
    val expect = df.withColumn("t",
        ntile(4).over(Window.orderBy(col("m").asc, col("id").asc)).cast("long"))
      .select("id", "t").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = graft.operators.Ops
      .ntileExact(df, 4, col("m"), col("id"), "t", partitions = 8)
      .select("id", "t").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
    // the constant-metric frame range-splits by the tiebreak: every one of
    // the 8 partitions holds a slice (RangePartitioner cuts the composite
    // (m, id) CDF, and id is unique)
    val spread = df
      .repartitionByRange(8, col("m").asc, col("id").asc)
      .select(spark_partition_id().as("pid")).distinct().count()
    assert(spread > 1, s"constant metric still funnels one partition")
  }

  test("Ops.rankExact: class-skewed frame ranks exactly and the hot class spans many partitions (r17 verdict item 1)") {
    // one class holds 90% of the rows — the q_pack_bins failure shape
    // (real doc-length corpora concentrate most docs in a few harmonic
    // classes). The class-local ranks must equal the per-class window
    // ranks, AND the hot class must not flow through one task.
    val spark = TestSpark.spark
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val rows = (0 until 9000).map(i => (i.toLong, 1L, (i * 37 % 1000).toLong)) ++
      (0 until 1000).map(i => (100000L + i, 2L + (i % 3), i.toLong))
    val df = rows.toDF("id", "k", "n").repartition(8)
    val w = Window.partitionBy("k").orderBy(col("n").desc, col("id").asc)
    val expect = df.withColumn("r", row_number().over(w).cast("long"))
      .select("id", "r").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = graft.operators.Ops
      .rankExact(df, Seq("k"), Seq(col("n").desc, col("id").asc), "r",
        partitions = 8)
      .select("id", "r").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
    // the hot class (k=1, 90% of rows) spans >1 range partition — the
    // whole point of cutting partitions from the composite-key CDF
    // instead of partitioning the window by the class column
    val hotSpread = df
      .repartitionByRange(8, col("k").asc, col("n").desc, col("id").asc)
      .where(col("k") === 1L)
      .select(spark_partition_id().as("pid")).distinct().count()
    assert(hotSpread > 1,
      s"hot class funnels through one task-sized partition (spread=$hotSpread)")
  }

  test("Ops.ntileExact fails fast on null/NaN metrics (r17 ADVICE)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val withNull = Seq((1L, Some(1.0)), (2L, None), (3L, Some(2.0)))
      .toDF("id", "m")
    val eN = intercept[IllegalArgumentException] {
      graft.operators.Ops.ntileExact(withNull, 2, col("m"), col("id"), "t")
    }
    assert(eN.getMessage.contains("null/NaN"))
    val withNaN = Seq((1L, 1.0), (2L, Double.NaN), (3L, 2.0)).toDF("id", "m")
    val eNaN = intercept[IllegalArgumentException] {
      graft.operators.Ops.ntileExact(withNaN, 2, col("m"), col("id"), "t")
    }
    assert(eNaN.getMessage.contains("null/NaN"))
    // empty frames still produce the null-tile column, not an error
    val empty = Seq.empty[(Long, Double)].toDF("id", "m")
    val out = graft.operators.Ops.ntileExact(empty, 2, col("m"), col("id"), "t")
    assert(out.count() == 0 && out.columns.contains("t"))
  }
}
