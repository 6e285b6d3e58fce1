package graft.queries

import graft.{QueryDef, QueryModule}
import graft.QueryDef._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function surface: ranking, running frames, lead/lag, analytic
  * distribution functions, top-k per group. Every window orders by a unique
  * key suffix so frames (and therefore results) are deterministic on both
  * engines. One shuffle per distinct partitioning — all queries here reuse a
  * single partitionBy, so exactly one exchange each.
  */
object WindowQueries extends QueryModule {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_win_rank",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        t(s, dir, "orders")
          .select(
            col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            row_number().over(w).cast("long").as("rn"),
            rank().over(w).cast("long").as("rnk"),
            dense_rank().over(w).cast("long").as("drnk"))
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
             |ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
             |ORDER BY o_custkey, rn""".stripMargin)),

    QueryDef(
      "q_win_running",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "orders")
          .select(
            col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            (sum(cents(col("o_totalprice"))).over(w).cast("double") / 100.0).as("run_sum"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate,
             |CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER
             |  (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_sum
             |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)),

    QueryDef(
      "q_win_leadlag",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
        t(s, dir, "events")
          .select(
            col("event_id"), col("user_id"), col("value"),
            lag("value", 1).over(w).as("prev_v"),
            lead("value", 1).over(w).as("next_v"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, value,
             |LAG(value, 1) OVER w AS prev_v, LEAD(value, 1) OVER w AS next_v
             |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |ORDER BY event_id""".stripMargin)),

    QueryDef(
      "q_win_ignore_nulls",
      // IGNORE NULLS analytics — last-observation-carried-forward (LOCF),
      // the sensor/CDC gap-repair primitive: a sparse reading (2 of every
      // 3 events nulled deterministically) is filled from the most recent
      // non-null value in the same user's timeline. One user-keyed
      // shuffle + per-user sort; the running frame never re-scans (Spark
      // evaluates last(ignoreNulls) incrementally).
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
        t(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("ts"),
            when(col("event_id") % 3 === 0, col("value")).as("v"))
          .select(col("event_id"), col("user_id"), col("v"),
            last("v", ignoreNulls = true)
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .as("v_filled"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, v,
             |  LAST_VALUE(v IGNORE NULLS) OVER
             |    (PARTITION BY user_id ORDER BY ts, event_id
             |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
             |FROM (SELECT event_id, user_id, ts,
             |        CASE WHEN event_id % 3 = 0 THEN value END AS v FROM events)
             |ORDER BY event_id""".stripMargin)),

    QueryDef(
      "q_win_analytic",
      // ntile / percent_rank / cume_dist. The distribution functions divide
      // small exact integers (rank, partition size ~10), so the double
      // quotient is bit-identical across engines; DECIMAL(18,6) cast keeps
      // the compared value away from representation noise.
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
        t(s, dir, "orders")
          .select(
            col("o_custkey"), col("o_orderkey"),
            ntile(4).over(w).cast("long").as("nt"),
            toDbl(percent_rank().over(w).cast("decimal(18,6)")).as("pr"),
            toDbl(cume_dist().over(w).cast("decimal(18,6)")).as("cd"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |NTILE(4) OVER w AS nt,
             |CAST(CAST(PERCENT_RANK() OVER w AS DECIMAL(18,6)) AS DOUBLE) AS pr,
             |CAST(CAST(CUME_DIST() OVER w AS DECIMAL(18,6)) AS DOUBLE) AS cd
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    QueryDef(
      "q_topk_pergroup",
      // Top-3 orders per customer: window + filter. At scale this is one
      // shuffle by custkey; no driver-side collect, no global sort.
      // The aggregate formulation (q_topk_agg) halves the shuffle further:
      // partial top-k per map task means ≤ k rows per group per partition
      // cross the wire instead of every row.
      (s, dir) =>
        graft.operators.Ops.topKPerGroup(
            t(s, dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice"),
            partitionCols = Seq("o_custkey"),
            order = Seq(col("o_totalprice").desc, col("o_orderkey").asc), k = 3)
          .orderBy("o_custkey", "rn"),
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |  ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders) sub
             |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)),

    QueryDef(
      "q_topk_agg",
      // Same top-3-per-customer, via the custom typed Aggregator
      // (graft.functions.TopKAggregate): partial top-k per map task, so the
      // shuffle carries at most k rows per group per partition — the
      // scale-preferred formulation. Same total order (price desc, key asc)
      // as the window twin, so the window query IS the oracle.
      (s, dir) => {
        val topk = graft.functions.TopKAggregate.topk(3)
        t(s, dir, "orders")
          .groupBy("o_custkey")
          .agg(topk(col("o_totalprice"), col("o_orderkey")).as("top"))
          .select(col("o_custkey"), posexplode(col("top")))
          .select(
            col("o_custkey"), col("col.key").as("o_orderkey"),
            col("col.price").as("o_totalprice"), (col("pos") + 1).cast("long").as("rn"))
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |  ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders) sub
             |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)),

    QueryDef(
      "q_win_ntile",
      // NTILE quartile assignment + per-quartile profile (r10) — the
      // equal-frequency binning window (vs q_length_bucket's equal-width
      // and q_percentile's point quantiles): per event_type, rank events
      // into 4 equal tiles by (value, event_id) — the unique tiebreak
      // makes tile membership total-order-deterministic — then profile
      // each tile. One window shuffle on event_type + one grouped agg on
      // (event_type, tile); value boundaries stay raw doubles ROUNDED only
      // at the edge via the cents mirror.
      (s, dir) =>
        t(s, dir, "events")
          .withColumn("tile", ntile(4).over(
            Window.partitionBy("event_type").orderBy(col("value"), col("event_id")))
            .cast("long"))
          .groupBy("event_type", "tile")
          .agg(count(lit(1)).as("cnt"),
            min("value").cast("double").as("min_v"),
            max("value").cast("double").as("max_v"),
            fxSum(col("value")).as("sum_v"))
          .orderBy("event_type", "tile"),
      Some("""SELECT event_type, CAST(tile AS BIGINT) AS tile, COUNT(*) AS cnt,
             |  MIN(value) AS min_v, MAX(value) AS max_v,
             |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_v
             |FROM (
             |  SELECT event_type, value,
             |    NTILE(4) OVER (PARTITION BY event_type ORDER BY value, event_id) AS tile
             |  FROM events) sub
             |GROUP BY event_type, tile ORDER BY event_type, tile""".stripMargin)),
  )
}
