package graft

import graft.functions.BloomFilterExpressions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bloom pre-filter's load-bearing properties: zero false negatives
  * (the exactness contract of q_join_bloom), null routing, and an actual
  * filtering effect (the 100 TB shuffle-volume claim is vacuous if the
  * filter passes everything).
  */
class BloomFilterSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  test("mightContainLong never yields a false negative and nulls stay null") {
    val s = spark
    import s.implicits._
    val keys = (0L until 1000L by 3).toDF("k") // 334 inserted keys
    val bf = keys.stat.bloomFilter("k", 1000L, 0.01)
    val probe = ((0L until 1000L).map(java.lang.Long.valueOf) :+ null)
      .toDF("k")
      .select(col("k"),
        BloomFilterExpressions.mightContainLong(col("k"), bf).as("hit"))
      .collect()
    probe.foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(1))
      else if (r.getLong(0) % 3 == 0) assert(r.getBoolean(1), s"false negative at ${r.getLong(0)}")
    }
    // fpp 1% on 666 non-members: >5% misses means the filter is broken
    val fp = probe.count(r => !r.isNullAt(0) && r.getLong(0) % 3 != 0 && r.getBoolean(1))
    assert(fp <= 33, s"$fp false positives out of 666")
  }

  test("q_join_bloom's pre-filter passes a small fraction of the fact table") {
    val dim = Tables(spark, "/root/testdata/sf0.01", "orders")
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderdate") >= lit("1997-06-01").cast("timestamp"))
    val bf = dim.stat.bloomFilter("o_orderkey", 1000000L, 0.01)
    val li = Tables(spark, "/root/testdata/sf0.01", "lineitem")
    val total = li.count().toDouble
    val kept = li.filter(BloomFilterExpressions
      .mightContainLong(col("l_orderkey"), bf)).count().toDouble
    val dimFrac = dim.count().toDouble /
      Tables(spark, "/root/testdata/sf0.01", "orders").count().toDouble
    // kept fraction ≈ dim selectivity + fpp; generous upper bound 2× + 2%
    assert(kept / total <= dimFrac * 2 + 0.02,
      s"bloom kept ${kept / total}, dim selectivity $dimFrac")
  }
}
