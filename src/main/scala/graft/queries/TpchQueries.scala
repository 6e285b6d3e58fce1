package graft.queries

import graft.{QueryDef, QueryModule}
import graft.QueryDef._
import org.apache.spark.sql.functions._

/** TPC-H-shaped composite queries (Q3 / Q5 / Q10 adapted to the driver
  * corpus's columns) — the multi-join analytics workloads the reference's
  * delegated SQL surface exists to serve, and the classic exercise of
  * Catalyst's join planning: selective dimension filters push into scans,
  * small sides broadcast, revenue aggregates run as fixed-point long sums
  * (QueryDef.cents at 4 digits — `extendedprice·(1−discount)` carries ≤4
  * fractional digits, so partial sums stay primitive-long codegen).
  *
  * Revenue determinism: the double product rounds identically in both
  * engines (same IEEE multiply), lands within ~1e-7 of the exact
  * 4-decimal value, and the scaled long recovers it exactly — mirrored
  * token-for-token in the oracles' ROUND(x*10000) casts.
  */
object TpchQueries extends QueryModule {

  private val revenue = col("l_extendedprice") * (lit(1) - col("l_discount"))

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_tpch_q3",
      // Shipping-priority shape: unshipped BUILDING-segment orders as of
      // the cutoff, top 10 by open revenue. Catalyst pushes both date
      // predicates into the scans; the customer filter prunes before the
      // join chain.
      (s, dir) => {
        val cutoff = lit("1995-03-15 00:00:00").cast("timestamp")
        t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
          .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
          .filter(col("o_orderdate") < cutoff)
          .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
          .filter(col("l_shipdate") > cutoff)
          .groupBy("o_orderkey", "o_orderdate")
          .agg(fxSum(revenue, 4).as("revenue"))
          .select("o_orderkey", "revenue", "o_orderdate")
          .orderBy(desc("revenue"), asc("o_orderkey"))
          .limit(10)
      },
      Some("""SELECT o_orderkey,
             |  CAST(SUM(CAST(ROUND((l_extendedprice*(1-l_discount))*10000) AS BIGINT)) AS DOUBLE)/10000.0 AS revenue,
             |  o_orderdate
             |FROM customer, orders, lineitem
             |WHERE c_mktsegment = 'BUILDING'
             |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
             |  AND o_orderdate < TIMESTAMP '1995-03-15'
             |  AND l_shipdate > TIMESTAMP '1995-03-15'
             |GROUP BY o_orderkey, o_orderdate
             |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin)),

    QueryDef(
      "q_tpch_q5",
      // Local-supplier volume: revenue per ASIA nation where the customer
      // and the lineitem's supplier share the nation — the 6-table join
      // chain. Region/nation/supplier broadcast; the fact chain shuffles
      // once on orderkey.
      (s, dir) => {
        val asia = broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA"))
        val nations = broadcast(t(s, dir, "nation")
          .join(asia, col("n_regionkey") === col("r_regionkey")))
        t(s, dir, "customer")
          .join(nations, col("c_nationkey") === col("n_nationkey"))
          .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
          .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
          .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(t(s, dir, "supplier")),
            col("l_suppkey") === col("s_suppkey") &&
              col("s_nationkey") === col("c_nationkey"))
          .groupBy("n_name")
          .agg(fxSum(revenue, 4).as("revenue"))
          .orderBy(desc("revenue"), asc("n_name"))
      },
      Some("""SELECT n_name,
             |  CAST(SUM(CAST(ROUND((l_extendedprice*(1-l_discount))*10000) AS BIGINT)) AS DOUBLE)/10000.0 AS revenue
             |FROM customer, orders, lineitem, supplier, nation, region
             |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
             |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |  AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
             |  AND r_name = 'ASIA'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate < TIMESTAMP '1997-01-01'
             |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin)),

    QueryDef(
      "q_tpch_q10",
      // Returned-item reporting: top 20 customers by lost revenue from
      // returned ('R') lineitems of one order quarter, with their nation.
      (s, dir) => {
        t(s, dir, "customer")
          .join(broadcast(t(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
          .filter(col("o_orderdate") >= lit("1995-10-01 00:00:00").cast("timestamp") &&
            col("o_orderdate") < lit("1996-01-01 00:00:00").cast("timestamp"))
          .join(t(s, dir, "lineitem").filter(col("l_returnflag") === "R"),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
          .agg(fxSum(revenue, 4).as("revenue"))
          .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
          .orderBy(desc("revenue"), asc("c_custkey"))
          .limit(20)
      },
      Some("""SELECT c_custkey, c_name,
             |  CAST(SUM(CAST(ROUND((l_extendedprice*(1-l_discount))*10000) AS BIGINT)) AS DOUBLE)/10000.0 AS revenue,
             |  c_acctbal, n_name
             |FROM customer, orders, lineitem, nation
             |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
             |  AND o_orderdate >= TIMESTAMP '1995-10-01'
             |  AND o_orderdate < TIMESTAMP '1996-01-01'
             |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
             |GROUP BY c_custkey, c_name, c_acctbal, n_name
             |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)),

    QueryDef(
      "q_tpch_q18",
      // Large-volume customers (Q18 shape): orders whose total quantity
      // exceeds 300, with customer and order detail, top 100 by
      // (totalprice desc, orderdate, orderkey). The HAVING subquery is ONE
      // lineitem aggregate whose result drives a semi-join — Catalyst
      // plans the IN-subquery as LeftSemi, so the big side is filtered to
      // the qualifying handful BEFORE the customer/orders joins; the
      // detail quantity agg then reuses the same (orderkey) grouping key.
      // Top-k is TakeOrdered, never a global sort.
      (s, dir) => {
        val qualifying = t(s, dir, "lineitem")
          .groupBy("l_orderkey")
          .agg(sum(cents(col("l_quantity"))).as("qc"))
          .filter(col("qc") > 300 * 100)
          .select(col("l_orderkey").as("qk"))
        t(s, dir, "lineitem")
          .join(qualifying, col("l_orderkey") === col("qk"), "left_semi")
          .groupBy("l_orderkey")
          .agg(fxSum(col("l_quantity")).as("sum_qty"))
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderdate"), col("o_orderkey"))
          .limit(100)
      },
      Some("""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
             |  CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty
             |FROM customer, orders, lineitem
             |WHERE o_orderkey IN (
             |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
             |  HAVING SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) > 30000)
             |AND c_custkey = o_custkey AND o_orderkey = l_orderkey
             |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
             |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 100""".stripMargin)),
  )
}
