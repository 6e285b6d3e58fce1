package graft.queries

import graft.{QueryDef, QueryModule}
import graft.QueryDef._
import org.apache.spark.sql.functions._

/** Scans, filters, projections, casts, exact dedup, sort/limit, set ops —
  * the `-q` projection/expression/cast/ORDER BY contract the reference
  * delegates to Postgres (/root/reference/src/lib.rs:39-41, exercised in
  * /root/reference/tests/basic_integration.rs:28,130,150,169), expressed
  * natively on the DataFrame API so Catalyst plans the scan with column
  * pruning + predicate pushdown into parquet.
  */
object CoreQueries extends QueryModule {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_scan_project",
      (s, dir) => {
        // Projection + decimal arithmetic; filters/columns reach the scan
        // (ReadSchema is 5 columns, not 11).
        t(s, dir, "lineitem")
          .select(
            col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            ((cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
              .cast("double") / 1e4).as("revenue"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity,
             |CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    QueryDef(
      "q_scan_filter",
      (s, dir) => {
        t(s, dir, "lineitem")
          .filter(col("l_quantity") > 30 && col("l_returnflag") === "R"
            && col("l_shipdate") >= lit("1998-01-01").cast("timestamp"))
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate")
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_shipdate
             |FROM lineitem
             |WHERE l_quantity > 30 AND l_returnflag = 'R' AND l_shipdate >= TIMESTAMP '1998-01-01'
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    QueryDef(
      "q_project_cast",
      // Mirror of the reference's own query-surface tests: arithmetic alias
      // (`cint8 + 1 cint8`, basic_integration.rs:130) and cast-to-text
      // (`cint8::text`, basic_integration.rs:150).
      (s, dir) => {
        t(s, dir, "lineitem")
          .select(
            col("l_orderkey"), col("l_linenumber"),
            (col("l_orderkey") + 1).as("okey_plus"),
            col("l_quantity").cast("string").as("qty_str"),
            toDbl(col("l_extendedprice").cast("decimal(18,2)")).as("price_dec"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_orderkey + 1 AS okey_plus,
             |CAST(l_quantity AS VARCHAR) AS qty_str,
             |CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price_dec
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    QueryDef(
      "q_distinct",
      (s, dir) =>
        t(s, dir, "lineitem")
          .select("l_returnflag", "l_linestatus")
          .distinct()
          .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus
             |FROM lineitem ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    QueryDef(
      "q_sort_limit",
      // Global top-100: Spark plans TakeOrderedAndProject (no full sort of
      // the whole table on the driver); deterministic via unique tiebreak.
      (s, dir) =>
        t(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(100),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
             |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)),

    QueryDef(
      "q_set_union",
      (s, dir) => {
        val a = t(s, dir, "orders").filter(col("o_totalprice") > 400000)
          .select(col("o_custkey").as("key"))
        val b = t(s, dir, "customer").filter(col("c_acctbal") > 9000)
          .select(col("c_custkey").as("key"))
        a.union(b).distinct().orderBy("key")
      },
      Some("""SELECT o_custkey AS key FROM orders WHERE o_totalprice > 400000
             |UNION
             |SELECT c_custkey FROM customer WHERE c_acctbal > 9000
             |ORDER BY key""".stripMargin)),

    QueryDef(
      "q_set_intersect",
      (s, dir) =>
        t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
          .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
          .orderBy("nationkey"),
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |INTERSECT
             |SELECT s_nationkey FROM supplier
             |ORDER BY nationkey""".stripMargin)),

    QueryDef(
      "q_set_except",
      // Positive-balance customers minus big spenders — both sides filtered
      // so the difference is non-empty on the test corpus.
      (s, dir) =>
        t(s, dir, "customer").filter(col("c_acctbal") > 0)
          .select(col("c_custkey").as("key"))
          .except(t(s, dir, "orders").filter(col("o_totalprice") > 400000)
            .select(col("o_custkey").as("key")))
          .orderBy("key"),
      Some("""SELECT c_custkey AS key FROM customer WHERE c_acctbal > 0
             |EXCEPT
             |SELECT o_custkey FROM orders WHERE o_totalprice > 400000
             |ORDER BY key""".stripMargin)),

    QueryDef(
      "q_set_except_all",
      // MULTISET difference (EXCEPT ALL): per-customer order rows minus one
      // copy per high-value order — duplicates survive by count, the
      // semantics bag-reconciliation (billing diffs, replay audits)
      // actually needs. Spark's exceptAll plans as a single hash aggregate
      // over counts, not a join per duplicate.
      (s, dir) =>
        t(s, dir, "orders").select(col("o_custkey").as("key"))
          .exceptAll(t(s, dir, "orders").filter(col("o_totalprice") > 400000)
            .select(col("o_custkey").as("key")))
          .groupBy("key").agg(count(lit(1)).as("n"))
          .orderBy("key"),
      Some("""SELECT key, CAST(COUNT(*) AS BIGINT) AS n FROM (
             |  SELECT o_custkey AS key FROM orders
             |  EXCEPT ALL
             |  SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
             |GROUP BY key ORDER BY key""".stripMargin)),

    QueryDef(
      "q_set_intersect_all",
      // MULTISET intersection (INTERSECT ALL): order rows per customer
      // common to two overlapping date ranges, multiplicity = the smaller
      // per-key count on either side.
      (s, dir) =>
        t(s, dir, "orders")
          .filter(col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
          .select(col("o_custkey").as("key"))
          .intersectAll(t(s, dir, "orders")
            .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp"))
            .select(col("o_custkey").as("key")))
          .groupBy("key").agg(count(lit(1)).as("n"))
          .orderBy("key"),
      Some("""SELECT key, CAST(COUNT(*) AS BIGINT) AS n FROM (
             |  SELECT o_custkey AS key FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
             |  INTERSECT ALL
             |  SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01')
             |GROUP BY key ORDER BY key""".stripMargin)),
  )
}
