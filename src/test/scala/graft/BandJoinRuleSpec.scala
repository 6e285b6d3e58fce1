package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The automatic band-join rewrite (plans/BandJoinToBinEquiJoin, injected
  * by GraftExtensions — active in this session): fires on naive band
  * joins, defers to explicit hints and real equi keys, and never changes
  * results.
  */
class BandJoinRuleSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def bandJoin(c: DataFrame, s: DataFrame): DataFrame =
    c.join(s, col("c_acctbal") >= col("s_acctbal") - 50 &&
        col("c_acctbal") < col("s_acctbal"))
      .select("s_suppkey", "c_custkey", "s_acctbal", "c_acctbal")

  test("a naive band join plans as an equi join on bins, not a nested loop") {
    val out = bandJoin(Tables(spark, dir, "customer"), Tables(spark, dir, "supplier"))
    val p = physical(out)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"band join should have been binned:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), s"expected an equi join:\n$p")
  }

  test("rewrite preserves results exactly (vs the rule disabled)") {
    val c = Tables(spark, dir, "customer")
    val s = Tables(spark, dir, "supplier")
    val rewritten = bandJoin(c, s).orderBy("s_suppkey", "c_custkey").collect()
    spark.conf.set("spark.graft.bandJoinRewrite", "false")
    try {
      val plain = bandJoin(c, s).orderBy("s_suppkey", "c_custkey").collect()
      assert(rewritten.toSeq == plain.toSeq)
      assert(rewritten.nonEmpty)
    } finally spark.conf.unset("spark.graft.bandJoinRewrite")
  }

  test("negative values bin correctly (floor, not truncate-toward-zero)") {
    val sess = spark
    import sess.implicits._
    val a = Seq(-120.0, -75.0, -50.0, -0.5, 0.0, 49.9).toDF("x")
    val b = Seq(-100.0, -50.0, 0.0, 50.0).toDF("y")
    val got = a.join(b, col("x") >= col("y") - 50 && col("x") < col("y"))
      .orderBy("x", "y").collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val want = (for {
      x <- Seq(-120.0, -75.0, -50.0, -0.5, 0.0, 49.9)
      y <- Seq(-100.0, -50.0, 0.0, 50.0)
      if x >= y - 50 && x < y
    } yield (x, y)).sorted
    assert(got.toSeq == want)
  }

  test("an explicit broadcast hint wins — the rule defers to the user") {
    val p = physical(bandJoin(Tables(spark, dir, "customer"),
      broadcast(Tables(spark, dir, "supplier"))))
    assert(p.contains("BroadcastNestedLoopJoin"), s"hint must be honored:\n$p")
  }

  test("a join with a real equi key is left to the hash-join planner") {
    val li = Tables(spark, dir, "lineitem").select("l_orderkey", "l_quantity")
    val o = Tables(spark, dir, "orders").select("o_orderkey", "o_totalprice")
    val p = physical(li.join(o, col("l_orderkey") === col("o_orderkey") &&
      col("l_quantity") < col("o_totalprice")))
    assert(!p.contains("__graft_bin"), s"equi join must not be binned:\n$p")
  }

  test("a band written with flipped operand order is rewritten too") {
    val c = Tables(spark, dir, "customer")
    val s = Tables(spark, dir, "supplier")
    // same band as bandJoin but each comparison has the attr on the right
    val flipped = c.join(s,
        col("s_acctbal") - 50 <= col("c_acctbal") &&
          col("s_acctbal") > col("c_acctbal"))
      .select("s_suppkey", "c_custkey")
    val p = physical(flipped)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"flipped band join should have been binned:\n$p")
    // and results match the straight spelling
    val straight = bandJoin(c, s).select("s_suppkey", "c_custkey")
      .orderBy("s_suppkey", "c_custkey").collect()
    assert(flipped.orderBy("s_suppkey", "c_custkey").collect().toSeq == straight.toSeq)
  }

  test("a TIMESTAMP band with an interval offset is binned (r8 widening)") {
    val od = Tables(spark, dir, "orders").select("o_orderkey", "o_orderdate")
    val li = Tables(spark, dir, "lineitem")
      .filter(col("l_quantity") > 49).select("l_orderkey", "l_shipdate")
    def tsBand(l: DataFrame, r: DataFrame): DataFrame =
      l.join(r, col("o_orderdate") >= col("l_shipdate") - expr("INTERVAL 3 DAYS") &&
          col("o_orderdate") < col("l_shipdate"))
        .select("o_orderkey", "l_orderkey")
    val p = physical(tsBand(od, li))
    assert(p.contains("__graft_bin"), s"timestamp band should have been binned:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    val rewritten = tsBand(od, li).orderBy("o_orderkey", "l_orderkey").collect()
    spark.conf.set("spark.graft.bandJoinRewrite", "false")
    try {
      val plain = tsBand(od, li).orderBy("o_orderkey", "l_orderkey").collect()
      assert(rewritten.toSeq == plain.toSeq)
      assert(rewritten.nonEmpty)
    } finally spark.conf.unset("spark.graft.bandJoinRewrite")
  }

  test("a DATE band via date_sub is binned (r8 widening)") {
    val od = Tables(spark, dir, "orders")
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("order_day"))
    val li = Tables(spark, dir, "lineitem").filter(col("l_quantity") > 49)
      .select(col("l_orderkey"), to_date(col("l_shipdate")).as("ship_day"))
    def dateBand(l: DataFrame, r: DataFrame): DataFrame =
      l.join(r, col("order_day") >= date_sub(col("ship_day"), 3) &&
          col("order_day") <= col("ship_day"))
        .select("o_orderkey", "l_orderkey")
    val p = physical(dateBand(od, li))
    assert(p.contains("__graft_bin"), s"date band should have been binned:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    val rewritten = dateBand(od, li).orderBy("o_orderkey", "l_orderkey").collect()
    spark.conf.set("spark.graft.bandJoinRewrite", "false")
    try {
      val plain = dateBand(od, li).orderBy("o_orderkey", "l_orderkey").collect()
      assert(rewritten.toSeq == plain.toSeq)
      assert(rewritten.nonEmpty)
    } finally spark.conf.unset("spark.graft.bandJoinRewrite")
  }

  test("an INTEGER band is binned (r8 widening)") {
    val sess = spark
    import sess.implicits._
    val a = (0L to 2000L).toDF("x")
    val b = Seq(100L, 250L, 999L, 1500L).toDF("y")
    def intBand(l: DataFrame, r: DataFrame): DataFrame =
      l.join(r, col("x") >= col("y") - 7 && col("x") < col("y"))
    val p = physical(intBand(a, b))
    assert(p.contains("__graft_bin"), s"integer band should have been binned:\n$p")
    val got = intBand(a, b).orderBy("x", "y").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = (for {
      x <- 0L to 2000L; y <- Seq(100L, 250L, 999L, 1500L)
      if x >= y - 7 && x < y
    } yield (x, y)).sorted
    assert(got.toSeq == want)
  }

  test("a DECIMAL band is binned despite analyzer precision-promotion casts (r8)") {
    val sess = spark
    import sess.implicits._
    val a = (0 to 500).map(i => BigDecimal(i) / 100).toDF("x")
      .select(col("x").cast("decimal(12,2)").as("x"))
    val b = Seq(BigDecimal("1.00"), BigDecimal("2.50"), BigDecimal("4.99"))
      .toDF("y").select(col("y").cast("decimal(12,2)").as("y"))
    def decBand(l: DataFrame, r: DataFrame): DataFrame =
      l.join(r, col("x") >= col("y") - 0.25 && col("x") < col("y"))
    val p = physical(decBand(a, b))
    assert(p.contains("__graft_bin"), s"decimal band should have been binned:\n$p")
    val got = decBand(a, b).orderBy("x", "y").collect()
      .map(r => (r.getDecimal(0).toString, r.getDecimal(1).toString))
    val want = (for {
      x <- (0 to 500).map(i => BigDecimal(i) / 100)
      y <- Seq(BigDecimal("1.00"), BigDecimal("2.50"), BigDecimal("4.99"))
      if x >= y - 0.25 && x < y
    } yield (x.setScale(2).toString, y.setScale(2).toString)).sorted
    assert(got.map(t => (t._1, t._2)).toSeq == want)
  }

  test("a FLOAT band is binned (r8)") {
    val sess = spark
    import sess.implicits._
    val a = (0 to 1000).map(_.toFloat / 10).toDF("x")
    val b = Seq(10.0f, 45.5f, 99.9f).toDF("y")
    def fBand(l: DataFrame, r: DataFrame): DataFrame =
      l.join(r, col("x") >= col("y") - 2.5f && col("x") < col("y"))
    val p = physical(fBand(a, b))
    assert(p.contains("__graft_bin"), s"float band should have been binned:\n$p")
    val got = fBand(a, b).count()
    spark.conf.set("spark.graft.bandJoinRewrite", "false")
    try assert(fBand(a, b).count() == got && got > 0)
    finally spark.conf.unset("spark.graft.bandJoinRewrite")
  }

  test("with several qualifying pairs the NARROWEST band sizes the bin (ADVICE r7)") {
    val c = Tables(spark, dir, "customer")
    val s = Tables(spark, dir, "supplier")
    // two lower bounds: the wide (-5000) pair must not shadow the tight (-50)
    val df = c.join(s,
        col("c_acctbal") >= col("s_acctbal") - 5000 &&
          col("c_acctbal") >= col("s_acctbal") - 50 &&
          col("c_acctbal") < col("s_acctbal"))
      .select("s_suppkey", "c_custkey")
    val p = physical(df)
    assert(p.contains("__graft_bin"), p)
    assert(p.contains("/ 50.0"), s"bin width must come from the narrowest pair:\n$p")
    assert(!p.contains("/ 5000.0"), s"bin width must come from the narrowest pair:\n$p")
    // and the result still honors ALL conjuncts (the re-filter keeps them)
    val straight = bandJoin(c, s).select("s_suppkey", "c_custkey")
      .orderBy("s_suppkey", "c_custkey").collect()
    assert(df.orderBy("s_suppkey", "c_custkey").collect().toSeq == straight.toSeq)
  }

  test("a non-boolean kill-switch spelling disables gracefully, never throws") {
    spark.conf.set("spark.graft.bandJoinRewrite", "0")
    try {
      val out = bandJoin(Tables(spark, dir, "customer"),
        Tables(spark, dir, "supplier"))
      assert(physical(out).contains("BroadcastNestedLoopJoin"))
      assert(out.count() > 0) // planning and execution both survive
    } finally spark.conf.unset("spark.graft.bandJoinRewrite")
  }

  test("the kill switch disables the rewrite") {
    spark.conf.set("spark.graft.bandJoinRewrite", "false")
    try {
      val p = physical(bandJoin(Tables(spark, dir, "customer"),
        Tables(spark, dir, "supplier")))
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("CartesianProduct"))
    } finally spark.conf.unset("spark.graft.bandJoinRewrite")
  }
}
