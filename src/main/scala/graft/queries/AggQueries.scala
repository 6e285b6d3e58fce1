package graft.queries

import graft.{QueryDef, QueryModule}
import graft.QueryDef._
import org.apache.spark.sql.functions._

/** Grouped aggregation surface: hash agg (partial+final map-side combine is
  * automatic in Spark), HAVING, DISTINCT agg, ROLLUP/CUBE/GROUPING SETS.
  * All SUM/AVG over doubles go through the DECIMAL(38,6) determinism
  * contract (QueryDef).
  */
object AggQueries extends QueryModule {

  /** TPC-H Q1-shaped aggregate — also the flagship pipeline's query.
    * Fixed-point formulation (QueryDef.fxSum): sums run over primitive
    * longs, bit-identical to the decimal-sum oracle after the final double
    * conversion. disc_price: price·(1−disc) = cents(price)·(100−cents(disc))
    * / 10^4 exactly; the per-row product stays < 2^53 and the long total
    * < 2^63 at bench scale.
    */
  def q1(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.groupBy("l_returnflag", "l_linestatus")
      .agg(
        fxSum(col("l_quantity")).as("sum_qty"),
        fxSum(col("l_extendedprice")).as("sum_base_price"),
        (sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
          .cast("double") / 1e4).as("sum_disc_price"),
        fxAvg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_agg_group",
      (s, dir) => q1(t(s, dir, "lineitem")),
      Some("""SELECT l_returnflag, l_linestatus,
             |CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
             |CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
             |CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
             |CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
             |COUNT(*) AS count_order
             |FROM lineitem GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    QueryDef(
      "q_agg_having",
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("order_cnt"),
            fxSum(col("o_totalprice")).as("sum_price"))
          .filter(col("order_cnt") > 12)
          .orderBy("o_custkey"),
      Some("""SELECT o_custkey, COUNT(*) AS order_cnt,
             |CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
             |FROM orders GROUP BY o_custkey HAVING COUNT(*) > 12
             |ORDER BY o_custkey""".stripMargin)),

    QueryDef(
      "q_agg_distinct",
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy("o_orderpriority")
          .agg(countDistinct(col("o_custkey")).as("uniq_custs"), count(lit(1)).as("cnt"))
          .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS uniq_custs, COUNT(*) AS cnt
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    QueryDef(
      "q_agg_rollup",
      // Two-level rollup: pre-aggregate to the finest group, then roll up
      // over the ~|groups| base rows. Catalyst's Expand otherwise clones
      // EVERY fact row once per grouping set (3x for rollup, 4x for cube)
      // before aggregating; re-aggregable aggregates (long-cents sums,
      // count -> sum of counts) make the subtotals exact either way, and
      // genuine NULL group keys stay distinct from subtotal NULLs via the
      // grouping() flags — identical output, Expand on 6 rows not 600k.
      (s, dir) => {
        val base = t(s, dir, "lineitem")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(sum(cents(col("l_quantity"))).as("sq"), count(lit(1)).as("c0"))
        base.rollup("l_returnflag", "l_linestatus")
          .agg(
            (sum(col("sq")).cast("double") / 100.0).as("sum_qty"),
            sum(col("c0")).as("cnt"),
            grouping(col("l_returnflag")).cast("long").as("g_rf"),
            grouping(col("l_linestatus")).cast("long").as("g_ls"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty, COUNT(*) AS cnt,
             |GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls
             |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
             |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    QueryDef(
      "q_agg_cube",
      // Same two-level shape as q_agg_rollup (see comment there).
      (s, dir) => {
        val base = t(s, dir, "lineitem")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(sum(cents(col("l_quantity"))).as("sq"), count(lit(1)).as("c0"))
        base.cube("l_returnflag", "l_linestatus")
          .agg(
            (sum(col("sq")).cast("double") / 100.0).as("sum_qty"),
            sum(col("c0")).as("cnt"),
            grouping(col("l_returnflag")).cast("long").as("g_rf"),
            grouping(col("l_linestatus")).cast("long").as("g_ls"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty, COUNT(*) AS cnt,
             |GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls
             |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
             |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    QueryDef(
      "q_agg_groupsets",
      // Explicit GROUPING SETS — SQL-only surface, so this one runs through
      // spark.sql over a registered view (same text runs on DuckDB).
      (s, dir) => {
        t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        s.sql(
          """SELECT l_returnflag, l_linestatus,
            |CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty, COUNT(*) AS cnt,
            |GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls
            |FROM lineitem
            |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
            |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
          .withColumn("g_rf", col("g_rf").cast("long"))
          .withColumn("g_ls", col("g_ls").cast("long"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty, COUNT(*) AS cnt,
             |GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
             |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    QueryDef(
      "q_agg_mode",
      // Deterministic MODE per group: each customer's most frequent order
      // priority, ties broken by the larger priority string. Two shuffles,
      // both map-side combined: (custkey, priority) counts, then a per-key
      // max over (cnt, priority) structs — lexicographic struct max IS the
      // argmax, so no window/sort is ever needed and the second agg's input
      // is already count-collapsed (≤ |priorities| rows per customer).
      // The scale shape of "most common value per key" (mode of language
      // per domain, top label per user, ...) without a per-group sort.
      (s, dir) => {
        t(s, dir, "orders")
          .groupBy("o_custkey", "o_orderpriority")
          .agg(count(lit(1)).as("cnt"))
          .groupBy("o_custkey")
          .agg(max(struct(col("cnt"), col("o_orderpriority"))).as("m"))
          .select(col("o_custkey"),
            col("m.o_orderpriority").as("mode_priority"),
            col("m.cnt").as("cnt"))
          .orderBy("o_custkey")
      },
      Some("""WITH c AS (SELECT o_custkey, o_orderpriority, COUNT(*) AS cnt
             |          FROM orders GROUP BY 1, 2),
             |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
             |        ORDER BY cnt DESC, o_orderpriority DESC) AS rn FROM c)
             |SELECT o_custkey, o_orderpriority AS mode_priority, cnt
             |FROM r WHERE rn = 1 ORDER BY o_custkey""".stripMargin)),
  )
}
