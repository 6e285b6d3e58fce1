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
}
