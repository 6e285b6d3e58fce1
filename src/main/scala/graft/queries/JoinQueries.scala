package graft.queries

import graft.{QueryDef, QueryModule}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** All nine join shapes of the delegated query surface (SURVEY.md §2.2).
  *
  * Scale notes (100 TB posture):
  *  - fact ⋈ fact (lineitem ⋈ orders) is a shuffle join on the join key —
  *    correct at any scale; AQE picks the physical strategy.
  *  - dimension joins broadcast explicitly (`broadcast(nation)`): no shuffle
  *    of the big side at all.
  *  - the range join bounds its probe side (a small broadcast) so the
  *    nested-loop is O(|corpus| × |probe|), never fact × fact.
  *  - the as-of join is the union+window rewrite: ONE shuffle by key, a
  *    per-key sort, no per-row subquery — the standard scalable formulation.
  */
object JoinQueries extends QueryModule {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_join_inner",
      (s, dir) =>
        t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"), "inner")
          .select("l_orderkey", "l_linenumber", "o_custkey", "o_totalprice", "l_quantity")
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, o_custkey, o_totalprice, l_quantity
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    QueryDef(
      "q_join_bucketed",
      // Co-located join over bucketed tables: both sides laid out
      // bucketBy(8, orderkey).sortBy(orderkey) once (graft.sources
      // .BucketedTables), after which THIS join plans with no Exchange and
      // no Sort on either side — each task merges bucket i of both tables
      // locally. Result-identical to q_join_inner (whose SQL is the
      // oracle); PlanSpec pins the exchange-free shape.
      (s, dir) => {
        val (li, od) = graft.sources.BucketedTables.ensure(s, dir)
        // hint("merge"): at corpus scale neither fact side broadcasts, so
        // SMJ-over-buckets is the real plan; without the hint the tiny test
        // corpus auto-broadcasts and the planner disables bucketed reading.
        s.table(li).hint("merge")
          .join(s.table(od), col("l_orderkey") === col("o_orderkey"), "inner")
          .select("l_orderkey", "l_linenumber", "o_custkey", "o_totalprice", "l_quantity")
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, o_custkey, o_totalprice, l_quantity
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    QueryDef(
      "q_join_broadcast",
      (s, dir) =>
        t(s, dir, "customer")
          .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
          .select("c_custkey", "c_name", "n_name", "r_name")
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name, n_name, r_name
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |ORDER BY c_custkey""".stripMargin)),

    QueryDef(
      "q_join_left",
      (s, dir) =>
        t(s, dir, "customer")
          .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
          .select("c_custkey", "o_orderkey", "o_totalprice")
          .orderBy(col("c_custkey").asc, col("o_orderkey").asc_nulls_first),
      Some("""SELECT c_custkey, o_orderkey, o_totalprice
             |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |ORDER BY c_custkey, o_orderkey NULLS FIRST""".stripMargin)),

    QueryDef(
      "q_join_full",
      (s, dir) =>
        t(s, dir, "customer").filter(col("c_custkey") < 200)
          .join(t(s, dir, "supplier"), col("c_nationkey") === col("s_nationkey"), "full_outer")
          .select("c_custkey", "s_suppkey", "c_nationkey", "s_nationkey")
          .orderBy(col("c_custkey").asc_nulls_first, col("s_suppkey").asc_nulls_first),
      Some("""SELECT c_custkey, s_suppkey, c_nationkey, s_nationkey
             |FROM (SELECT * FROM customer WHERE c_custkey < 200) c
             |FULL JOIN supplier s ON c_nationkey = s_nationkey
             |ORDER BY c_custkey NULLS FIRST, s_suppkey NULLS FIRST""".stripMargin)),

    QueryDef(
      "q_join_semi",
      (s, dir) =>
        t(s, dir, "customer")
          .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_name", "c_acctbal")
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name, c_acctbal FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    QueryDef(
      "q_join_anti",
      // NOT EXISTS over a filtered right side: every customer has *some*
      // order in this corpus, so the filter keeps the result non-trivial.
      (s, dir) =>
        t(s, dir, "customer")
          .join(
            t(s, dir, "orders").filter(col("o_totalprice") > 300000),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name", "c_acctbal")
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name, c_acctbal FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o
             |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
             |ORDER BY c_custkey""".stripMargin)),

    QueryDef(
      "q_join_cross",
      (s, dir) =>
        t(s, dir, "region").crossJoin(t(s, dir, "nation"))
          .select("r_regionkey", "n_nationkey", "r_name", "n_name")
          .orderBy("r_regionkey", "n_nationkey"),
      Some("""SELECT r_regionkey, n_nationkey, r_name, n_name
             |FROM region CROSS JOIN nation
             |ORDER BY r_regionkey, n_nationkey""".stripMargin)),

    QueryDef(
      "q_join_range",
      // Non-equi band join. The probe side (supplier) is small and
      // broadcast, so this is BroadcastNestedLoopJoin over the stream side —
      // O(|customer| × |supplier|) with no shuffle. At 100 TB the band
      // predicate would be bucketized (join on floor(acctbal/50) ± 1, then
      // re-filter) to turn it into an equi shuffle join.
      (s, dir) =>
        t(s, dir, "customer")
          .join(
            broadcast(t(s, dir, "supplier")),
            col("c_acctbal") >= col("s_acctbal") - 50 && col("c_acctbal") < col("s_acctbal"))
          .select("s_suppkey", "c_custkey", "s_acctbal", "c_acctbal")
          .orderBy("s_suppkey", "c_custkey"),
      Some("""SELECT s_suppkey, c_custkey, s_acctbal, c_acctbal
             |FROM customer JOIN supplier
             |ON c_acctbal >= s_acctbal - 50 AND c_acctbal < s_acctbal
             |ORDER BY s_suppkey, c_custkey""".stripMargin)),

    QueryDef(
      "q_join_range_binned",
      // The SAME band join as q_join_range, executed the way it must run
      // at 100 TB: bin both sides by the band width and equi-shuffle-join
      // on the bin id (supplier explodes to the ≤2 bins its band overlaps,
      // customer maps to exactly one), then re-filter the exact predicate.
      // No broadcast requirement, no nested loop — |fact| shuffles once.
      // q_join_range's oracle IS this oracle: result-identical by
      // construction (Ops.rangeBinJoin).
      (s, dir) =>
        graft.operators.Ops.rangeBinJoin(
            t(s, dir, "customer"), t(s, dir, "supplier"),
            probeVal = col("c_acctbal"),
            lo = col("s_acctbal") - 50, hi = col("s_acctbal"),
            binWidth = 50.0,
            exact = col("c_acctbal") >= col("s_acctbal") - 50 &&
              col("c_acctbal") < col("s_acctbal"))
          .select("s_suppkey", "c_custkey", "s_acctbal", "c_acctbal")
          .orderBy("s_suppkey", "c_custkey"),
      Some("""SELECT s_suppkey, c_custkey, s_acctbal, c_acctbal
             |FROM customer JOIN supplier
             |ON c_acctbal >= s_acctbal - 50 AND c_acctbal < s_acctbal
             |ORDER BY s_suppkey, c_custkey""".stripMargin)),

    QueryDef(
      "q_join_range_auto",
      // The SAME band join as q_join_range written NAIVELY — no hint, no
      // manual binning. The graft.plans.BandJoinToBinEquiJoin optimizer
      // rule (installed via GraftExtensions in every engine session)
      // detects the band condition and plans the binned equi join of
      // q_join_range_binned automatically; BandJoinRuleSpec + PlanSpec pin
      // the rewrite, this oracle pins the results.
      (s, dir) =>
        t(s, dir, "customer")
          .join(t(s, dir, "supplier"),
            col("c_acctbal") >= col("s_acctbal") - 50 &&
              col("c_acctbal") < col("s_acctbal"))
          .select("s_suppkey", "c_custkey", "s_acctbal", "c_acctbal")
          .orderBy("s_suppkey", "c_custkey"),
      Some("""SELECT s_suppkey, c_custkey, s_acctbal, c_acctbal
             |FROM customer JOIN supplier
             |ON c_acctbal >= s_acctbal - 50 AND c_acctbal < s_acctbal
             |ORDER BY s_suppkey, c_custkey""".stripMargin)),

    QueryDef(
      "q_join_range_auto_date",
      // The most common band join in practice is TEMPORAL: "orders placed
      // within 3 days before the shipment", written naively on DATE
      // columns. BandJoinToBinEquiJoin (r8: widened beyond DoubleType)
      // detects the date band — offsets via date_sub, units via unix_date
      // — and plans the binned equi join automatically; without the rule
      // this exact query is a BroadcastNestedLoopJoin. Output days are
      // cast back to timestamp (midnight UTC on both engines) per the
      // determinism contract.
      (s, dir) => {
        val li = t(s, dir, "lineitem").filter(col("l_quantity") > 49)
          .select(col("l_orderkey"), col("l_linenumber"),
            to_date(col("l_shipdate")).as("ship_day"))
        val od = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"), to_date(col("o_orderdate")).as("order_day"))
        od.join(li,
            col("order_day") >= date_sub(col("ship_day"), 3) &&
              col("order_day") <= col("ship_day"))
          .select(col("o_orderkey"), col("l_orderkey"), col("l_linenumber"),
            col("order_day").cast("timestamp").as("order_day"),
            col("ship_day").cast("timestamp").as("ship_day"))
          .orderBy("o_orderkey", "l_orderkey", "l_linenumber")
      },
      Some("""SELECT o_orderkey, l_orderkey, l_linenumber,
             |CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS order_day,
             |CAST(CAST(l_shipdate AS DATE) AS TIMESTAMP) AS ship_day
             |FROM orders JOIN lineitem
             |ON CAST(o_orderdate AS DATE) >= CAST(l_shipdate AS DATE) - 3
             |AND CAST(o_orderdate AS DATE) <= CAST(l_shipdate AS DATE)
             |WHERE o_orderpriority = '1-URGENT' AND l_quantity > 49
             |ORDER BY o_orderkey, l_orderkey, l_linenumber""".stripMargin)),

    QueryDef(
      "q_join_range_auto_ts",
      // The same temporal band on raw TIMESTAMP columns with INTERVAL
      // arithmetic — the `o_orderdate BETWEEN l_shipdate - 90d AND
      // l_shipdate` shape SURVEY §2.2 motivates q_join_range with. The
      // rule reads the constant day-time interval offset, bins
      // unix_micros by the 3-day width, and the naive spelling plans as
      // one shuffle equi join.
      (s, dir) => {
        val li = t(s, dir, "lineitem").filter(col("l_quantity") > 49)
          .select("l_orderkey", "l_linenumber", "l_shipdate")
        val od = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
          .select("o_orderkey", "o_orderdate")
        od.join(li,
            col("o_orderdate") >= col("l_shipdate") - expr("INTERVAL 3 DAYS") &&
              col("o_orderdate") < col("l_shipdate"))
          .select("o_orderkey", "l_orderkey", "l_linenumber", "o_orderdate", "l_shipdate")
          .orderBy("o_orderkey", "l_orderkey", "l_linenumber")
      },
      Some("""SELECT o_orderkey, l_orderkey, l_linenumber, o_orderdate, l_shipdate
             |FROM orders JOIN lineitem
             |ON o_orderdate >= l_shipdate - INTERVAL 3 DAY
             |AND o_orderdate < l_shipdate
             |WHERE o_orderpriority = '1-URGENT' AND l_quantity > 49
             |ORDER BY o_orderkey, l_orderkey, l_linenumber""".stripMargin)),

    QueryDef(
      "q_join_skew_salted",
      // Skew-resilient shuffle join: the fact side carries a deterministic
      // salt in [0, 8), the dim side is replicated across all salts, and the
      // join key becomes (key, salt) — so a hot key's rows spread over 8
      // reducers instead of melting one. The result is IDENTICAL to the
      // plain join (the oracle IS the plain join); only the shuffle shape
      // changes. At 100 TB this is the manual fallback where AQE skew-join
      // splitting can't reach (skewed aggregations, pre-AQE stages); a
      // production variant salts only keys above a frequency threshold
      // instead of replicating the whole dim side.
      (s, dir) =>
        graft.operators.Ops.saltedEquiJoin(
            t(s, dir, "lineitem"), t(s, dir, "orders"),
            col("l_orderkey") === col("o_orderkey"),
            saltOn = Seq(col("l_orderkey"), col("l_linenumber")))
          .select("l_orderkey", "l_linenumber", "o_totalprice")
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, o_totalprice
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    QueryDef(
      "q_join_skew_adaptive",
      // The production variant of q_join_skew_salted (r8): a slim
      // (key, count) census finds the keys that are ACTUALLY hot, and only
      // those pay the salts-x dim replication — blanket replication
      // multiplies the whole dim side by the salt count whether or not any
      // key is skewed. Threshold 4 exercises both paths on this corpus
      // (orderkeys have 1-7 lineitems). Result identical to the plain
      // join, which IS the oracle.
      (s, dir) =>
        graft.operators.Ops.saltedEquiJoinAdaptive(
            t(s, dir, "lineitem"), t(s, dir, "orders"),
            col("l_orderkey"), col("o_orderkey"),
            saltOn = Seq(col("l_orderkey"), col("l_linenumber")),
            hotThreshold = 4)
          .select("l_orderkey", "l_linenumber", "o_totalprice")
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, o_totalprice
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    QueryDef(
      "q_join_asof",
      // As-of join: for each event, the latest order of the same customer
      // with o_orderdate <= ts (DuckDB `ASOF JOIN` `<=`-latest-wins
      // semantics, SURVEY.md §7.3). Implemented as the scalable union+window
      // rewrite: tag both sides, one shuffle on the key, per-key sort by
      // (time, tag), then last non-null order key in the unbounded-preceding
      // frame. Orders are first deduped per (custkey, orderdate) — max
      // orderkey wins — so ties are deterministic on both engines.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "user_id", "ts")
        val od = t(s, dir, "orders")
          .groupBy("o_custkey", "o_orderdate")
          .agg(max("o_orderkey").as("o_orderkey"))
        graft.operators.Ops.asofJoin(ev, od,
            leftKey = "user_id", rightKey = "o_custkey",
            leftTime = "ts", rightTime = "o_orderdate",
            valueCols = Seq("o_orderkey"))
          .orderBy("event_id")
      },
      Some("""SELECT e.event_id, e.user_id, e.ts, o.o_orderkey
             |FROM events e ASOF LEFT JOIN
             |(SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
             | FROM orders GROUP BY o_custkey, o_orderdate) o
             |ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
             |ORDER BY e.event_id""".stripMargin)),

    QueryDef(
      "q_join_asof_strict",
      // Strictly-before as-of: latest order with o_orderdate < ts (an order
      // at exactly ts must NOT match). Same union+window rewrite; the only
      // change is the per-key sort order at equal timestamps — events (tag
      // 0) sort BEFORE orders (tag 1), so an event's unbounded-preceding
      // frame excludes same-instant orders.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "user_id", "ts")
        val od = t(s, dir, "orders")
          .groupBy("o_custkey", "o_orderdate")
          .agg(max("o_orderkey").as("o_orderkey"))
        graft.operators.Ops.asofJoin(ev, od,
            leftKey = "user_id", rightKey = "o_custkey",
            leftTime = "ts", rightTime = "o_orderdate",
            valueCols = Seq("o_orderkey"), strict = true)
          .orderBy("event_id")
      },
      Some("""SELECT e.event_id, e.user_id, e.ts, o.o_orderkey
             |FROM events e ASOF LEFT JOIN
             |(SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
             | FROM orders GROUP BY o_custkey, o_orderdate) o
             |ON e.user_id = o.o_custkey AND e.ts > o.o_orderdate
             |ORDER BY e.event_id""".stripMargin)),

    QueryDef(
      "q_table_diff",
      // CDC-style snapshot reconciliation: full outer join two versions of
      // a table on the key, classify insert/delete/update/unchanged — the
      // diff primitive behind lakehouse change feeds and backfill audits.
      // "New" snapshot simulated as: high-balance rows dropped (deletes),
      // balances bumped for low keys (updates).
      (s, dir) => {
        val old = t(s, dir, "customer")
          .select(col("c_custkey").as("key"), col("c_acctbal").as("bal"))
        val neu = t(s, dir, "customer")
          .filter(col("c_acctbal") <= 9000)
          .select(col("c_custkey").as("key"),
            when(col("c_custkey") < 100, col("c_acctbal") + 10)
              .otherwise(col("c_acctbal")).as("bal"))
        graft.operators.Ops.tableDiff(old, neu, keys = Seq("key"))
          .orderBy("key")
      },
      Some("""WITH old AS (SELECT c_custkey AS key, c_acctbal AS bal_old FROM customer),
             |neu AS (SELECT c_custkey AS key,
             |        CASE WHEN c_custkey < 100 THEN c_acctbal + 10 ELSE c_acctbal END AS bal_new
             |        FROM customer WHERE c_acctbal <= 9000)
             |SELECT key, bal_old, bal_new,
             |  CASE WHEN bal_old IS NULL THEN 'insert'
             |       WHEN bal_new IS NULL THEN 'delete'
             |       WHEN bal_old != bal_new THEN 'update'
             |       ELSE 'unchanged' END AS change
             |FROM old FULL JOIN neu USING (key)
             |WHERE (CASE WHEN bal_old IS NULL THEN 'insert'
             |       WHEN bal_new IS NULL THEN 'delete'
             |       WHEN bal_old != bal_new THEN 'update'
             |       ELSE 'unchanged' END) != 'unchanged'
             |ORDER BY key""".stripMargin)),

    QueryDef(
      "q_join_bloom",
      // Bloom-pre-filtered semi-join (functions/BloomFilterExpressions):
      // the dimension side (selective orders subset) builds a distributed
      // bloom filter; the fact scan drops non-matching rows INSIDE the
      // scan's codegen span, before any exchange, and the broadcast
      // semi-join that follows removes the ~1% false positives. Exactly
      // the semi-join's rows, at ~selectivity of its network cost — the
      // standard 100 TB shape for "join a petabyte fact to a filtered
      // dimension". (Spark's own runtime row-group filtering does this
      // only for shuffle-join scans it can rewrite; doing it explicitly
      // pins the plan.)
      (s, dir) => {
        val dim = t(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT" &&
            col("o_orderdate") >= lit("1997-06-01").cast("timestamp"))
          .select("o_orderkey")
        // Overestimated item count only widens the bitset (~1.2 MB at 1M
        // keys / 1% fpp) — never causes false negatives.
        val bf = dim.stat.bloomFilter("o_orderkey", 1000000L, 0.01)
        t(s, dir, "lineitem")
          .filter(graft.functions.BloomFilterExpressions
            .mightContainLong(col("l_orderkey"), bf))
          .join(broadcast(dim), col("l_orderkey") === col("o_orderkey"), "left_semi")
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n_rows"),
            countDistinct(col("l_orderkey")).as("n_orders"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
             |CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
             |FROM lineitem WHERE l_orderkey IN (
             |  SELECT o_orderkey FROM orders
             |  WHERE o_orderpriority = '1-URGENT' AND o_orderdate >= TIMESTAMP '1997-06-01')
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    QueryDef(
      "q_join_asof_nearest",
      // Nearest-in-time join (either direction): for each error event, the
      // closest purchase of the same user — ties at equal distance prefer
      // the EARLIER (backward) purchase. Composed from TWO passes of the
      // scalable union+window as-of rewrite: backward = latest purchase
      // ≤ ts; forward = the same rewrite on NEGATED epoch-micros (latest
      // −t ⇔ earliest ≥ ts); then a map-side pick of the smaller distance.
      // Still one shuffle + per-key sort per pass, no per-row subquery —
      // the lateral-join spelling the oracle uses is O(probe × candidates)
      // and exists only as the semantic spec. Purchases are deduped per
      // (user, µs-instant) with max event_id so ties are deterministic.
      (s, dir) => {
        val ev = t(s, dir, "events")
          .filter(col("event_type") === "error")
          .select("event_id", "user_id", "ts")
        val pu = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy("user_id", "ts").agg(max("event_id").as("p_event_id"))
        val back = graft.operators.Ops.asofJoin(
          ev,
          pu.select(col("user_id").as("p_user"), col("ts").as("p_ts"),
            col("p_event_id").as("b_event_id"), col("ts").as("b_ts")),
          leftKey = "user_id", rightKey = "p_user",
          leftTime = "ts", rightTime = "p_ts",
          valueCols = Seq("b_event_id", "b_ts"))
        val both = graft.operators.Ops.asofJoin(
          back.withColumn("neg_ts", -unix_micros(col("ts"))),
          pu.select(col("user_id").as("p_user"),
            (-unix_micros(col("ts"))).as("neg_p"),
            col("p_event_id").as("f_event_id"), col("ts").as("f_ts")),
          leftKey = "user_id", rightKey = "p_user",
          leftTime = "neg_ts", rightTime = "neg_p",
          valueCols = Seq("f_event_id", "f_ts"))
        val bd = unix_micros(col("ts")) - unix_micros(col("b_ts"))
        val fd = unix_micros(col("f_ts")) - unix_micros(col("ts"))
        val useBack = col("b_ts").isNotNull &&
          (col("f_ts").isNull || bd <= fd)
        both.select(
            col("event_id"), col("user_id"), col("ts"),
            when(useBack, col("b_event_id")).otherwise(col("f_event_id"))
              .as("near_event_id"),
            when(useBack, col("b_ts")).otherwise(col("f_ts")).as("near_ts"),
            when(useBack, bd).otherwise(fd).as("delta_us"))
          .orderBy("event_id")
      },
      // CAST(ts AS TIMESTAMP) truncates DuckDB's nanosecond read to the
      // microseconds Spark's parquet reader keeps — distances must be
      // computed on the same precision or sub-µs components flip ranks.
      Some("""WITH p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS p_ts,
             |  MAX(event_id) AS p_event_id
             |FROM events WHERE event_type = 'purchase'
             |GROUP BY user_id, CAST(ts AS TIMESTAMP))
             |SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
             |  l.near_event_id, l.near_ts, l.delta_us
             |FROM events e LEFT JOIN LATERAL (
             |  SELECT p.p_event_id AS near_event_id, p.p_ts AS near_ts,
             |    ABS(date_diff('microsecond', CAST(e.ts AS TIMESTAMP), p.p_ts)) AS delta_us
             |  FROM p WHERE p.user_id = e.user_id
             |  ORDER BY ABS(date_diff('microsecond', CAST(e.ts AS TIMESTAMP), p.p_ts)), p.p_ts
             |  LIMIT 1) l ON TRUE
             |WHERE e.event_type = 'error'
             |ORDER BY e.event_id""".stripMargin)),

    QueryDef(
      "q_join_nullsafe",
      // NULL-safe equality join (<=>): reconcile two snapshots of a
      // nullable attribute where NULL must match NULL — the semantics SQL
      // equality silently drops (NULL = NULL is NULL, so changed-to-NULL
      // and NULL-to-NULL rows vanish from an inner join). Snapshot B is
      // derived deterministically (the q_table_diff precedent): segment
      // rewritten for custkey % 7 = 0, BUILDING nulled on both sides.
      // The point at scale: EqualNullSafe is a legal EQUI-join key, so
      // Catalyst still plans a hash join (broadcast here) — never the
      // nested loop a naive `coalesce(a, sentinel) = coalesce(b,
      // sentinel)` workaround or an OR-of-conditions would risk.
      (s, dir) => {
        val a = t(s, dir, "customer").select(col("c_custkey"),
          nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_a"))
        val b = t(s, dir, "customer").select(col("c_custkey").as("bk"),
          nullif(when(col("c_custkey") % 7 === 0, lit("AUTOMOBILE"))
            .otherwise(col("c_mktsegment")), lit("BUILDING")).as("seg_b"))
        a.join(b, col("c_custkey") === col("bk") && col("seg_a") <=> col("seg_b"))
          .select(col("c_custkey"), col("seg_a"))
          .orderBy("c_custkey")
      },
      Some("""WITH a AS (SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg_a
             |          FROM customer),
             |b AS (SELECT c_custkey AS bk,
             |  NULLIF(CASE WHEN c_custkey % 7 = 0 THEN 'AUTOMOBILE'
             |         ELSE c_mktsegment END, 'BUILDING') AS seg_b
             |FROM customer)
             |SELECT c_custkey, seg_a
             |FROM a JOIN b ON c_custkey = bk AND seg_a IS NOT DISTINCT FROM seg_b
             |ORDER BY c_custkey""".stripMargin)),
  )
}
