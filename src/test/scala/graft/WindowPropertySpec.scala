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
    // the distributed two-pass rank (value-range buckets + driver offsets)
    // must reproduce ntile().over(Window.orderBy(...)) EXACTLY — ties,
    // negative values, duplicates, n not dividing the count, n > count —
    // since q_rfm's oracle hash rides on it
    val spark = TestSpark.spark
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val genRows: Gen[(List[Int], Int, Int)] = for {
      sz <- Gen.chooseNum(1, 300)
      vals <- Gen.listOfN(sz, Gen.chooseNum(-50, 50)) // heavy duplicates
      n <- Gen.chooseNum(1, 9)
      buckets <- Gen.oneOf(1, 2, 7, 4096) // incl. degenerate bucket counts
    } yield (vals, n, buckets)
    val prop = Prop.forAll(genRows) { case (vals, n, buckets) =>
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "m").repartition(5)
      val expect = df.withColumn("t",
          ntile(n).over(Window.orderBy(col("m").asc, col("id").asc)).cast("long"))
        .select("id", "t").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = graft.operators.Ops
        .ntileExact(df, n, col("m"), col("id"), "t", buckets = buckets)
        .select("id", "t").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == expect
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
