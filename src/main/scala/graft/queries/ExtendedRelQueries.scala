package graft.queries

import graft.{QueryDef, QueryModule}
import graft.QueryDef._
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second-ring relational surface: value-range window frames, pivot/unpivot
  * reshaping, exact percentiles, ordered string aggregation, correlated
  * subqueries. All built-ins / Catalyst-planned SQL — no UDFs. Scale notes:
  * pivot with an explicit value list is a single partial+final aggregate
  * (no extra pass to discover values); unpivot is a Generate (no shuffle);
  * percentile is a sort-based aggregate per group; the correlated subquery
  * decorrelates to an aggregate + left join under Catalyst.
  */
object ExtendedRelQueries extends QueryModule {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_win_rangeframe",
      // Value-based RANGE frame: for each order, the decimal sum of
      // totalprice over orders of the same customer within the preceding
      // 30 days (inclusive) by order date.
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate").cast("timestamp").cast("long"))
          .rangeBetween(-30L * 86400, 0)
        t(s, dir, "orders")
          .withColumn("sum_30d", sum(cents(col("o_totalprice"))).over(w).cast("double") / 100.0)
          .select("o_orderkey", "o_custkey", "o_orderdate", "sum_30d")
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey, o_orderdate,
             |CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
             |  PARTITION BY o_custkey
             |  ORDER BY epoch(o_orderdate)
             |  RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_30d
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    QueryDef(
      "q_pivot",
      // PIVOT with an explicit value list — one aggregate pass; the oracle
      // is the equivalent conditional aggregation (dialect-portable).
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy("o_orderpriority")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .orderBy("o_orderpriority"),
      // DuckDB SUM(int) returns HUGEINT (→ float64 in the driver's pandas
      // conversion, vs Spark's int64) — CAST ... AS BIGINT keeps the dtypes
      // aligned. See QueryDef OUTPUT-TYPE contract.
      Some("""SELECT o_orderpriority,
             |CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
             |CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
             |CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    QueryDef(
      "q_unpivot",
      // UNPIVOT/melt: wide→long without a shuffle (Generate, not join).
      (s, dir) =>
        t(s, dir, "customer")
          .select(col("c_custkey"), col("c_acctbal"),
            col("c_nationkey").cast("double").as("c_nationkey_d"))
          .unpivot(
            Array(col("c_custkey")),
            Array(col("c_acctbal"), col("c_nationkey_d")),
            "measure", "val")
          .orderBy("c_custkey", "measure"),
      Some("""SELECT c_custkey, 'c_acctbal' AS measure, c_acctbal AS val FROM customer
             |UNION ALL
             |SELECT c_custkey, 'c_nationkey_d', CAST(c_nationkey AS DOUBLE) FROM customer
             |ORDER BY c_custkey, measure""".stripMargin)),

    QueryDef(
      "q_percentile",
      // Exact percentiles by DISTRIBUTED SORT: one window sort ranks
      // values per group, each quantile reads exactly its two
      // interpolation neighbors (idx = floor/ceil((n-1)p)), and the
      // follow-up groupBy reuses the window's partitioning (no second
      // exchange). The minimal-stage formulation — fastest whenever every
      // group fits a single task's sort budget (4 stages; 1.35 s at sf0.1
      // vs 3.3 s for the histogram path below, which pays ~8 sequential
      // stages of fixed overhead at this scale). When a group outgrows
      // one task, q_percentile_hist is the same answer with every stage
      // parallel. Same linear interpolation as DuckDB quantile_cont:
      // lo + (hi - lo) * frac.
      (s, dir) => {
        // All three window expressions share one (partition, order) spec so
        // Spark plans a SINGLE WindowExec over a single exchange+sort; the
        // unbounded-frame count/max piggyback on the row_number sort
        // instead of a second Window operator. The quantile-neighbor filter
        // then cuts the aggregate's input from every row to ≤4 rows per
        // group before any further work.
        val w = Window.partitionBy("o_orderpriority").orderBy("v")
        val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val ranked = t(s, dir, "orders")
          .select(col("o_orderpriority"), col("o_totalprice"),
            col("o_totalprice").cast("double").as("v"))
          .withColumn("idx", (row_number().over(w) - lit(1)).cast("double"))
          .withColumn("cnt", count(lit(1)).over(wAll).cast("double"))
          .withColumn("mxg", max(col("o_totalprice")).over(wAll))
        def pos(p: Double) = (col("cnt") - 1) * lit(p)
        def vAt(c: Column) = max(when(col("idx") === c, col("v")))
        def interp(lo: Column, hi: Column, p: Double, n: Column) = {
          val position = (n - 1) * lit(p)
          lo + (hi - lo) * (position - floor(position))
        }
        ranked
          .filter(col("idx") === floor(pos(0.5)) || col("idx") === ceil(pos(0.5)) ||
            col("idx") === floor(pos(0.9)) || col("idx") === ceil(pos(0.9)))
          .groupBy("o_orderpriority")
          .agg(
            vAt(floor(pos(0.5))).as("lo50"), vAt(ceil(pos(0.5))).as("hi50"),
            vAt(floor(pos(0.9))).as("lo90"), vAt(ceil(pos(0.9))).as("hi90"),
            max(col("mxg")).as("mx"), max(col("cnt")).as("n"))
          .select(col("o_orderpriority"),
            toDbl(interp(col("lo50"), col("hi50"), 0.5, col("n")).cast(Dec38)).as("p50"),
            toDbl(interp(col("lo90"), col("hi90"), 0.9, col("n")).cast(Dec38)).as("p90"),
            col("mx"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority,
             |CAST(CAST(quantile_cont(o_totalprice, 0.5) AS DECIMAL(38,6)) AS DOUBLE) AS p50,
             |CAST(CAST(quantile_cont(o_totalprice, 0.9) AS DECIMAL(38,6)) AS DOUBLE) AS p90,
             |MAX(o_totalprice) AS mx
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    QueryDef(
      "q_percentile_hist",
      // Exact percentiles by BUCKETED TWO-PASS — the huge-group scale
      // path. q_percentile's window sort is one PARTITION per group; with
      // 5 priorities that is a 5-task sort of the whole table (at 100 TB:
      // a billion-row sort on one executor). Spark's `percentile`
      // aggregate instead buffers every group value in a boxed
      // OpenHashMap — the same wall, hit at aggregation-merge time. Here:
      //   1. log-scale value histogram per group — bucketing is map-side
      //      (monotone in v, needs no min/max prepass), the (g,sgn,bkt)
      //      count agg is the only full-data shuffle and combines map-side;
      //   2. a tiny cumulative-count window over the histogram locates the
      //      bucket holding each of the ≤4 target ranks (floor/ceil((n-1)p));
      //   3. only rows in those buckets (~n/1024 per needed bucket) are
      //      fetched and locally ranked — global rank = cum-below + local.
      // Every stage is parallel across the cluster regardless of group
      // count, and nothing ever materializes a whole group. Same linear
      // interpolation as DuckDB quantile_cont: lo + (hi - lo) * frac.
      (s, dir) => {
        // ~1024 histogram cells per e-fold of value; bucketing is a pure
        // map-side expression (sign class + log-scale cell — monotone in v
        // for ALL reals, no data-dependent min/max prepass, no broadcast
        // into the big scan). Cell occupancy is ~n/1024 for smooth
        // distributions, so the rank-targeted fetch below touches ~0.1%
        // of rows; a point-mass distribution only makes the fetch larger,
        // never wrong.
        val C = 1024.0
        def bucketed(df: org.apache.spark.sql.DataFrame) = df
          .withColumn("sgn", signum(col("v")).cast("int"))
          .withColumn("bkt",
            when(col("v") > 0, floor(log(col("v")) * C))
              .when(col("v") < 0, -floor(log(-col("v")) * C))
              .otherwise(lit(0L)).cast("long"))
        val orders = bucketed(
          t(s, dir, "orders")
            .select(col("o_orderpriority").as("g"),
              col("o_totalprice").cast("double").as("v")))
        // the ONLY full-data shuffle: map-side-combined (g, sgn, bkt) counts
        val hist = orders.groupBy("g", "sgn", "bkt")
          .agg(count(lit(1)).as("c"), max("v").as("bmx"))
        val wH = Window.partitionBy("g").orderBy("sgn", "bkt")
          .rowsBetween(Window.unboundedPreceding, -1)
        val wG = Window.partitionBy("g")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val cum = hist
          .withColumn("below", coalesce(sum("c").over(wH), lit(0L)))
          .withColumn("n", sum("c").over(wG))
          .withColumn("mx", max("bmx").over(wG))
        // locate the bucket holding each of the 4 per-group target ranks
        def hits(r: Column) = r >= col("below") && r < col("below") + col("c")
        def tpos(p: Double) = (col("n") - 1).cast("double") * lit(p)
        val needed = cum
          .filter(hits(floor(tpos(0.5))) || hits(ceil(tpos(0.5))) ||
            hits(floor(tpos(0.9))) || hits(ceil(tpos(0.9))))
          .select("g", "sgn", "bkt", "below", "n", "mx")
        // fetch only the needed buckets; rank locally inside each
        val wL = Window.partitionBy("g", "sgn", "bkt").orderBy("v")
        val ranked = orders.join(broadcast(needed), Seq("g", "sgn", "bkt"))
          .withColumn("idx", (col("below") + row_number().over(wL) - 1).cast("double"))
          .withColumn("cnt", col("n").cast("double"))
        def pos(p: Double) = (col("cnt") - 1) * lit(p)
        def vAt(c: Column) = max(when(col("idx") === c, col("v")))
        def interp(lo: Column, hi: Column, p: Double, n: Column) = {
          val position = (n - 1) * lit(p)
          lo + (hi - lo) * (position - floor(position))
        }
        ranked
          .filter(col("idx") === floor(pos(0.5)) || col("idx") === ceil(pos(0.5)) ||
            col("idx") === floor(pos(0.9)) || col("idx") === ceil(pos(0.9)))
          .groupBy("g")
          .agg(
            vAt(floor(pos(0.5))).as("lo50"), vAt(ceil(pos(0.5))).as("hi50"),
            vAt(floor(pos(0.9))).as("lo90"), vAt(ceil(pos(0.9))).as("hi90"),
            max(col("mx")).as("mx"), max(col("cnt")).as("n"))
          .select(col("g").as("o_orderpriority"),
            toDbl(interp(col("lo50"), col("hi50"), 0.5, col("n")).cast(Dec38)).as("p50"),
            toDbl(interp(col("lo90"), col("hi90"), 0.9, col("n")).cast(Dec38)).as("p90"),
            col("mx"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority,
             |CAST(CAST(quantile_cont(o_totalprice, 0.5) AS DECIMAL(38,6)) AS DOUBLE) AS p50,
             |CAST(CAST(quantile_cont(o_totalprice, 0.9) AS DECIMAL(38,6)) AS DOUBLE) AS p90,
             |MAX(o_totalprice) AS mx
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    QueryDef(
      "q_percentile_approx",
      // Sketch twin of q_percentile (the approx_distinct pattern): the
      // approximate percentile (GK/KLL-style mergeable sketch — the only
      // formulation that scales, since exact percentile buffers every group
      // value) is computed and exercised, then dropped before the compare;
      // the oracle checks the exact columns alongside.
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy("o_orderpriority")
          .agg(
            expr("approx_percentile(o_totalprice, 0.5, 10000)").as("ap50"),
            toDbl(expr("percentile(o_totalprice, 0.5)").cast(Dec38)).as("p50"),
            count(lit(1)).as("cnt"))
          .drop("ap50")
          .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
             |CAST(CAST(quantile_cont(o_totalprice, 0.5) AS DECIMAL(38,6)) AS DOUBLE) AS p50,
             |COUNT(*) AS cnt
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    QueryDef(
      "q_string_agg",
      // Ordered string aggregation: collect, sort, join — deterministic by
      // construction (collect_list order is partition-dependent, the sort
      // restores a total order before concatenation).
      (s, dir) =>
        t(s, dir, "nation")
          .groupBy("n_regionkey")
          .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"))
          .orderBy("n_regionkey"),
      Some("""SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
             |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)),

    QueryDef(
      "q_subquery_correlated",
      // Correlated scalar subquery — Catalyst decorrelates it into an
      // aggregate + left outer join (no per-row re-execution).
      (s, dir) => {
        t(s, dir, "customer").createOrReplaceTempView("customer")
        t(s, dir, "orders").createOrReplaceTempView("orders")
        s.sql("""SELECT c_custkey,
                |  (SELECT MAX(o_totalprice) FROM orders o
                |   WHERE o.o_custkey = c.c_custkey) AS max_order
                |FROM customer c ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey,
             |  (SELECT MAX(o_totalprice) FROM orders o
             |   WHERE o.o_custkey = c.c_custkey) AS max_order
             |FROM customer c ORDER BY c_custkey""".stripMargin)),

    QueryDef(
      "q_winsorize",
      // Winsorized robust aggregation: per-priority p05/p95 cutpoints
      // (the q_percentile single-window recipe — quantile_cont-identical
      // interpolation), values outside clamp to the cutpoint, and the
      // winsorized mean is assembled from EXACT components so the
      // cross-engine hash holds: (S_mid/100 + n_lo·p05 + n_hi·p95)/n,
      // where S_mid (cents of strictly-inside values), n_lo, n_hi, n are
      // all primitive-long aggregates and the formula is one fixed IEEE
      // op sequence mirrored token-for-token in the oracle — never a sum
      // of arbitrary doubles, whose addition order partitioning would
      // perturb. Cutpoint frame is group-count-sized → broadcast back.
      (s, dir) => {
        val w = Window.partitionBy("o_orderpriority").orderBy("v")
        val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val ranked = t(s, dir, "orders")
          .select(col("o_orderpriority"), col("o_totalprice").cast("double").as("v"))
          .withColumn("idx", (row_number().over(w) - lit(1)).cast("double"))
          .withColumn("cnt", count(lit(1)).over(wAll).cast("double"))
        def pos(p: Double) = (col("cnt") - 1) * lit(p)
        def vAt(c: Column) = max(when(col("idx") === c, col("v")))
        def interp(lo: Column, hi: Column, p: Double, n: Column) = {
          val position = (n - 1) * lit(p)
          lo + (hi - lo) * (position - floor(position))
        }
        val cuts = ranked
          .filter(col("idx") === floor(pos(0.05)) || col("idx") === ceil(pos(0.05)) ||
            col("idx") === floor(pos(0.95)) || col("idx") === ceil(pos(0.95)))
          .groupBy("o_orderpriority")
          .agg(vAt(floor(pos(0.05))).as("lo05"), vAt(ceil(pos(0.05))).as("hi05"),
            vAt(floor(pos(0.95))).as("lo95"), vAt(ceil(pos(0.95))).as("hi95"),
            max(col("cnt")).as("nq"))
          .select(col("o_orderpriority").as("cut_prio"),
            interp(col("lo05"), col("hi05"), 0.05, col("nq")).as("p05"),
            interp(col("lo95"), col("hi95"), 0.95, col("nq")).as("p95"))
        t(s, dir, "orders")
          .join(broadcast(cuts), col("o_orderpriority") === col("cut_prio"))
          .groupBy("o_orderpriority")
          .agg(
            count(lit(1)).as("n"),
            sum(when(col("o_totalprice") < col("p05"), 1L).otherwise(0L)).as("n_lo"),
            sum(when(col("o_totalprice") > col("p95"), 1L).otherwise(0L)).as("n_hi"),
            sum(when(col("o_totalprice") >= col("p05") && col("o_totalprice") <= col("p95"),
              cents(col("o_totalprice"))).otherwise(0L)).as("s_mid"),
            max(col("p05")).as("p05"), max(col("p95")).as("p95"))
          .select(col("o_orderpriority"), col("n"), col("n_lo"), col("n_hi"),
            toDbl(col("p05").cast(Dec38)).as("p05"),
            toDbl(col("p95").cast(Dec38)).as("p95"),
            toDbl((((col("s_mid").cast("double") / lit(100.0)) +
              col("n_lo").cast("double") * col("p05") +
              col("n_hi").cast("double") * col("p95")) / col("n").cast("double"))
              .cast(Dec38)).as("winsor_mean"))
          .orderBy("o_orderpriority")
      },
      Some("""WITH cut AS (SELECT o_orderpriority AS cut_prio,
             |  quantile_cont(o_totalprice, 0.05) AS p05,
             |  quantile_cont(o_totalprice, 0.95) AS p95
             |FROM orders GROUP BY o_orderpriority)
             |SELECT o_orderpriority, COUNT(*) AS n,
             |  CAST(SUM(CASE WHEN o_totalprice < p05 THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
             |  CAST(SUM(CASE WHEN o_totalprice > p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
             |  CAST(CAST(p05 AS DECIMAL(38,6)) AS DOUBLE) AS p05,
             |  CAST(CAST(p95 AS DECIMAL(38,6)) AS DOUBLE) AS p95,
             |  CAST(CAST(((CAST(SUM(CASE WHEN o_totalprice >= p05 AND o_totalprice <= p95
             |      THEN CAST(ROUND(o_totalprice*100) AS BIGINT) ELSE 0 END) AS DOUBLE) / 100.0)
             |    + CAST(SUM(CASE WHEN o_totalprice < p05 THEN 1 ELSE 0 END) AS DOUBLE) * p05
             |    + CAST(SUM(CASE WHEN o_totalprice > p95 THEN 1 ELSE 0 END) AS DOUBLE) * p95)
             |    / CAST(COUNT(*) AS DOUBLE) AS DECIMAL(38,6)) AS DOUBLE) AS winsor_mean
             |FROM orders JOIN cut ON o_orderpriority = cut_prio
             |GROUP BY o_orderpriority, p05, p95 ORDER BY o_orderpriority""".stripMargin)),

    QueryDef(
      "q_percentile_weighted",
      // Exact WEIGHTED median per group (importance-weighted quantiles —
      // the sampling-weights / record-weights form of q_percentile):
      // lower weighted median = smallest value v with cumW(v) >= W/2,
      // weights = exact cents longs of l_quantity. Values pre-collapse to
      // (group, value, Σw) — tie weights merge BEFORE the cumsum, so the
      // running sum is over unique values and fully deterministic — then
      // one per-group windowed cumsum (partition-parallel sort over the
      // collapsed frame, not the raw rows) and a broadcast of the
      // group-total frame picks the crossing value. All comparisons are
      // integer (2·cumW >= W): no float thresholds anywhere.
      (s, dir) => {
        val g = t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"), col("l_extendedprice"))
          .agg(sum(cents(col("l_quantity"))).as("w"))
        val cum = g.withColumn("cw",
          sum(col("w")).over(Window.partitionBy("l_returnflag")
            .orderBy("l_extendedprice")))
        val tot = g.groupBy("l_returnflag").agg(sum(col("w")).as("tw"))
        cum.join(broadcast(tot), "l_returnflag")
          .filter(col("cw") * 2 >= col("tw"))
          .groupBy("l_returnflag")
          .agg(min(col("l_extendedprice")).as("wmedian"),
            (max(col("tw")).cast("double") / 100.0).as("total_weight"))
          .orderBy("l_returnflag")
      },
      Some("""WITH g AS (SELECT l_returnflag, l_extendedprice,
             |  SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS w
             |FROM lineitem GROUP BY 1, 2),
             |c AS (SELECT *, SUM(w) OVER (PARTITION BY l_returnflag
             |  ORDER BY l_extendedprice) AS cw FROM g),
             |t AS (SELECT l_returnflag, SUM(w) AS tw FROM g GROUP BY 1)
             |SELECT c.l_returnflag, MIN(l_extendedprice) AS wmedian,
             |  CAST(CAST(MAX(tw) AS DOUBLE) / 100.0 AS DOUBLE) AS total_weight
             |FROM c JOIN t ON c.l_returnflag = t.l_returnflag
             |WHERE 2 * cw >= tw
             |GROUP BY c.l_returnflag ORDER BY c.l_returnflag""".stripMargin)),
  )
}
