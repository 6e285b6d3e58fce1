package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The runtime skew audit's regression pin (r17 verdict item 3): the
  * audit must FLAG the shape q_pack_bins shipped with in r17 — a rank
  * window partitioned by the low-cardinality harmonic class, which the
  * structural PlanSpec gate cannot see (the window IS partitioned) — and
  * must PASS the r18 `Ops.rankExact` reformulation on the same skewed
  * frame. Run on a deliberately class-skewed corpus: one class holds 90%
  * of the rows, the real doc-length situation (most documents short).
  */
class SkewAuditSpec extends AnyFunSuite {

  test("audit flags the r17 per-class window shape and passes the r18 rankExact shape") {
    val spark = TestSpark.spark
    import spark.implicits._
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val prevCoalesce =
      spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    val (prevRows, prevTasks) = (SkewAudit.MinRows, SkewAudit.MinTasks)
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    // same posture as the SkewAudit main: measure the declared
    // partitioning, not what AQE coalescing makes of toy volumes
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    SkewAudit.MinRows = 5000L
    SkewAudit.MinTasks = 2
    try {
      // 90% of docs in harmonic class 1, the rest spread over classes 2-4
      val rows = (0 until 36000).map(i => (i.toLong, 1L, 1025L + i % 1000)) ++
        (0 until 4000).map(i => (100000L + i, 2L + (i % 3), 300L + i % 200))
      val df = rows.toDF("doc_id", "k", "n").repartition(8)
        .localCheckpoint(true) // freeze the input so both shapes read alike
      // r17 shape: rank window PARTITIONED BY the class — plan looks
      // healthy, runtime funnels the hot class through one task
      val oldShape = SkewAudit.measureWorst(spark) {
        df.withColumn("bin",
            floor((row_number().over(
              Window.partitionBy("k").orderBy(col("n").desc, col("doc_id"))) - 1)
              / col("k")).cast("long"))
          .groupBy("k").agg(count(lit(1)).as("n_docs"),
            countDistinct(col("bin")).as("n_bins"))
          .write.format("noop").mode("overwrite").save()
      }
      assert(SkewAudit.flags(oldShape),
        s"the r17 per-class window shape must flag: $oldShape")
      assert(oldShape.exists(_._2 > SkewAudit.MaxShare),
        s"one task must carry the hot class: $oldShape")
      // r18 shape: rankExact spreads the hot class across partitions
      val newShape = SkewAudit.measureWorst(spark) {
        graft.operators.Ops
          .rankExact(df, Seq("k"), Seq(col("n").desc, col("doc_id").asc), "rnk")
          .withColumn("bin", floor((col("rnk") - 1) / col("k")).cast("long"))
          .groupBy("k").agg(count(lit(1)).as("n_docs"),
            countDistinct(col("bin")).as("n_bins"))
          .write.format("noop").mode("overwrite").save()
      }
      assert(!SkewAudit.flags(newShape),
        s"the rankExact shape must pass the audit: $newShape")
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
        prevCoalesce)
      SkewAudit.MinRows = prevRows
      SkewAudit.MinTasks = prevTasks
    }
  }
}
