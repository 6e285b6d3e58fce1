package graft

import graft.functions.CountMinSketch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Count-Min Sketch contract: never undercounts (hard guarantee),
  * overcount bounded by ε·N with the classic ε ≈ e/Width (empirical
  * assertion on skewed data), and partition-order invariance of the merge
  * (the property that makes it a legal partial aggregate).
  */
class CountMinSketchSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private def buildAndEstimates(keys: Seq[String], partitions: Int)
      : Map[String, (Long, Long)] = {
    val sess = spark
    import sess.implicits._
    val df = keys.toDF("k").repartition(partitions)
    val cms = df.select(CountMinSketch.bucketsFor(col("k")).as("bk"))
      .agg(CountMinSketch.sketch(col("bk")).as("cms"))
    val est = df.distinct()
      .crossJoin(broadcast(cms))
      .withColumn("est", CountMinSketch.estimateCol(col("cms"), col("k")))
      .select("k", "est")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.map { case (k, c) => k -> (c, est(k)) }
  }

  test("estimates never undercount and overcount stays within eps*N") {
    // Zipf-ish skew over 500 distinct keys, 20k rows
    val rnd = new scala.util.Random(7)
    val keys = (1 to 20000).map { _ =>
      val r = rnd.nextDouble()
      val id = math.min(499, math.floor(math.pow(r, 2.5) * 500).toInt)
      s"key_$id"
    }
    val res = buildAndEstimates(keys, partitions = 13)
    val n = keys.size
    val epsN = math.ceil(math.E / CountMinSketch.Width * n).toLong * 4 // slack ×4
    for ((k, (exact, est)) <- res) {
      assert(est >= exact, s"$k undercounted: $est < $exact")
      assert(est <= exact + epsN, s"$k overcounted: $est > $exact + $epsN")
    }
  }

  test("the sketch is invariant under input partitioning") {
    val keys = (1 to 5000).map(i => s"k${i % 97}")
    val a = buildAndEstimates(keys, partitions = 1)
    val b = buildAndEstimates(keys, partitions = 17)
    assert(a == b)
  }

  test("driver-side estimate() agrees with the estimateCol expression") {
    val sess = spark
    import sess.implicits._
    val keys = (1 to 3000).map(i => s"key${i % 41}")
    val df = keys.toDF("k")
    val cmsArr = df.select(CountMinSketch.bucketsFor(col("k")).as("bk"))
      .agg(CountMinSketch.sketch(col("bk")).as("cms"))
      .collect().head.getSeq[Long](0).toArray
    val viaExpr = df.distinct()
      .crossJoin(broadcast(df.select(CountMinSketch.bucketsFor(col("k")).as("bk"))
        .agg(CountMinSketch.sketch(col("bk")).as("cms"))))
      .withColumn("est", CountMinSketch.estimateCol(col("cms"), col("k")))
      .select("k", "est")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the driver twin consumes the SAME Spark-computed bucket indices
    val buckets = df.distinct()
      .select(col("k"), CountMinSketch.bucketsFor(col("k")).as("bk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    for ((k, bk) <- buckets)
      assert(CountMinSketch.estimate(cmsArr, bk) == viaExpr(k), s"mismatch for $k")
  }

  test("null keys are skipped, not counted or crashing") {
    val sess = spark
    import sess.implicits._
    val df = Seq(Some("a"), None, Some("a"), None, Some("b"))
      .toDF("k")
    val cms = df.select(CountMinSketch.bucketsFor(col("k")).as("bk"))
      .agg(CountMinSketch.sketch(col("bk")).as("cms"))
      .collect().head.getSeq[Long](0)
    // total mass = non-null rows × Depth
    assert(cms.sum == 3L * CountMinSketch.Depth)
  }
}
