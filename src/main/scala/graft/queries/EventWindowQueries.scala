package graft.queries

import graft.{QueryDef, QueryModule}
import graft.QueryDef._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch equivalents of the streaming surface (SURVEY.md §2.2
  * q_stream_*): tumbling / sliding / session windows and keyed dedup.
  * The same transformations run unchanged on a stream (see
  * graft.streaming.StreamOps, which the ScalaTests drive through
  * MemoryStream + watermarks); here they run on the events table so the
  * DuckDB oracle can check the window arithmetic exactly.
  *
  * Spark's `window()` buckets are Unix-epoch-aligned, exactly like DuckDB's
  * `time_bucket` — verified, both put 05:45:11 in the 05:00 hour bucket.
  */
object EventWindowQueries extends QueryModule {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_stream_tumbling",
      (s, dir) =>
        t(s, dir, "events")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("cnt"), fxSum(col("value")).as("sum_v"))
          .select(
            col("window.start").as("w_start"), col("window.end").as("w_end"),
            col("event_type"), col("cnt"), col("sum_v"))
          .orderBy("w_start", "event_type"),
      Some("""SELECT w_start, w_start + INTERVAL 1 HOUR AS w_end, event_type,
             |COUNT(*) AS cnt, CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_v
             |FROM (SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start, event_type, value
             |      FROM events) sub
             |GROUP BY w_start, event_type ORDER BY w_start, event_type""".stripMargin)),

    QueryDef(
      "q_stream_sliding",
      // 1h windows sliding every 30min: each event lands in exactly two
      // windows, starting at bucket30(ts) and bucket30(ts)-30min — the
      // oracle materializes both memberships with a UNION ALL.
      (s, dir) =>
        t(s, dir, "events")
          .groupBy(window(col("ts"), "1 hour", "30 minutes"))
          .agg(count(lit(1)).as("cnt"), fxSum(col("value")).as("sum_v"))
          .select(
            col("window.start").as("w_start"), col("window.end").as("w_end"),
            col("cnt"), col("sum_v"))
          .orderBy("w_start"),
      Some("""SELECT w_start, w_start + INTERVAL 1 HOUR AS w_end,
             |COUNT(*) AS cnt, CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_v
             |FROM (
             |  SELECT time_bucket(INTERVAL '30 minutes', ts) AS w_start, value FROM events
             |  UNION ALL
             |  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL 30 MINUTE AS w_start, value FROM events
             |) sub GROUP BY w_start ORDER BY w_start""".stripMargin)),

    QueryDef(
      "q_stream_session",
      // Per-user session windows with a 30-minute gap — END-TO-END
      // STREAMING (r9, like q_stream_upsert) in APPEND mode (r10): the
      // events parquet is read as a file-source stream
      // (Trigger.AvailableNow), the watermarked session aggregation runs
      // in the streaming engine, and each micro-batch's CLOSED sessions
      // append exactly-once (txn-watermarked) into a Delta table read
      // back through the log. Append+watermark is the production mode —
      // state holds only OPEN sessions and each session is emitted once
      // when the watermark passes its end, unlike the r9 complete-mode
      // declaration that rewrote the whole session table every
      // micro-batch and held every session ever in state (a scale-killer
      // on an unbounded stream). With a 0-second watermark delay the
      // final watermark is max(ts), so the declared result is every
      // session closed by then — sessions still open at end-of-stream
      // (s_end > max ts) stay in state, and the oracle filters its
      // gaps-and-islands sessions to the same subset. Spark semantics: a
      // new session starts when ts >= previous ts + gap; session end is
      // last event ts + gap.
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val table = graft.TempTables.create("graft-stream-session")
        // seed the target with the output schema (empty) via the batch
        // twin so the first exactly-once append has a table to land in
        def sessionAgg(df: org.apache.spark.sql.DataFrame) = df
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("cnt"), fxSum(col("value")).as("sum_v"))
          .select(
            col("user_id"), col("session_window.start").as("s_start"),
            col("session_window.end").as("s_end"), col("cnt"), col("sum_v"))
        graft.sinks.DeltaSink.write(
          sessionAgg(t(s, dir, "events").limit(0)), table, overwrite = true)
        val sessions = sessionAgg(
          graft.Tables.streamEvents(s, dir).withWatermark("ts", "0 seconds"))
        val q = sessions.writeStream
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .foreachBatch {
            (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
              graft.sinks.DeltaSink.appendExactlyOnce(
                batch, table, appId = "q-stream-session", txnVersion = id): Unit
          }
          .start()
        q.awaitTermination()
        graft.sinks.DeltaSink.read(s, table)
          .orderBy("user_id", "s_start")
      },
      Some("""WITH marked AS (
             |  SELECT user_id, ts, value, event_id,
             |  CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             |            >= INTERVAL 30 MINUTE THEN 1
             |       WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
             |       ELSE 0 END AS brk
             |  FROM events),
             |sess AS (
             |  SELECT user_id, ts, value,
             |  SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM marked)
             |SELECT user_id, MIN(ts) AS s_start, MAX(ts) + INTERVAL 30 MINUTE AS s_end,
             |COUNT(*) AS cnt, CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_v
             |FROM sess GROUP BY user_id, sid
             |HAVING MAX(ts) + INTERVAL 30 MINUTE <= (SELECT MAX(ts) FROM events)
             |ORDER BY user_id, s_start""".stripMargin)),

    QueryDef(
      "q_session_capped",
      // Custom stateful sessionization (graft.streaming.StatefulSessions):
      // a session closes on the 30-minute gap OR at 10 events, whichever
      // first — semantics session_window cannot express, implemented with
      // flatMapGroups (batch) / flatMapGroupsWithState (streaming twin,
      // ScalaTest-driven). Oracle: gaps-and-islands + row_number()/10
      // sub-splitting reproduces the fold exactly.
      (s, dir) =>
        graft.streaming.StatefulSessions.sessionizeBatch(t(s, dir, "events"))
          .orderBy("user_id", "s_start"),
      Some("""WITH marked AS (
             |  SELECT user_id, ts, value, event_id,
             |  CASE WHEN LAG(ts) OVER w IS NULL
             |         OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE THEN 1
             |       ELSE 0 END AS brk
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |isl AS (
             |  SELECT user_id, ts, value, event_id,
             |  SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
             |  FROM marked),
             |sub AS (
             |  SELECT user_id, ts, value, island,
             |  CAST(FLOOR((ROW_NUMBER() OVER (PARTITION BY user_id, island
             |                                 ORDER BY ts, event_id) - 1) / 10.0) AS BIGINT) AS ss
             |  FROM isl)
             |SELECT user_id, MIN(ts) AS s_start, MAX(ts) + INTERVAL 30 MINUTE AS s_end,
             |COUNT(*) AS cnt,
             |CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_v,
             |COUNT(*) = 10 AS capped
             |FROM sub GROUP BY user_id, island, ss
             |ORDER BY user_id, s_start""".stripMargin)),

    QueryDef(
      "q_stream_dedup_watermark",
      // Batch twin of streaming dropDuplicates-with-watermark: keep the
      // earliest event per (user_id, event_type), ties broken by event_id —
      // deterministic, unlike raw dropDuplicates. The streaming twin
      // (StreamOps.dedupWithWatermark) is exercised by ScalaTest.
      (s, dir) => {
        val w = Window.partitionBy("user_id", "event_type")
          .orderBy(col("ts").asc, col("event_id").asc)
        t(s, dir, "events")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("user_id", "event_type", "event_id", "ts")
          .orderBy("user_id", "event_type")
      },
      Some("""SELECT user_id, event_type, event_id, ts FROM (
             |  SELECT user_id, event_type, event_id, ts,
             |  ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
             |  FROM events) sub
             |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin)),

    QueryDef(
      "q_stream_enrich",
      // Stream-static enrichment: every event picks up its user's market
      // segment from a BROADCAST dimension, then a tumbling window
      // aggregates per segment. The identical transformation runs on a
      // stream (StreamOps.enrich — stream-static joins are stateless and
      // the dimension re-broadcasts per micro-batch), which is what makes
      // the pattern viable against an unbounded topic: no dimension state
      // store, no shuffle of the event stream for the join. Left join:
      // events with no dimension row keep a NULL segment instead of
      // silently dropping (the classic enrichment bug).
      (s, dir) => {
        val dim = t(s, dir, "customer")
          .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))
        t(s, dir, "events")
          .join(broadcast(dim), Seq("user_id"), "left")
          .groupBy(window(col("ts"), "1 hour"), col("segment"))
          .agg(count(lit(1)).as("cnt"), fxSum(col("value")).as("sum_v"))
          .select(col("window.start").as("w_start"), col("segment"),
            col("cnt"), col("sum_v"))
          // NULLS LAST on BOTH sides (Spark ASC defaults nulls-first,
          // DuckDB nulls-last): the NULL-segment rows the left join
          // deliberately keeps must sort identically once an orphan
          // user_id exists (ADVICE r4).
          .orderBy(col("w_start"), col("segment").asc_nulls_last)
      },
      Some("""SELECT w_start, segment, COUNT(*) AS cnt,
             |CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_v
             |FROM (SELECT time_bucket(INTERVAL '1 hour', e.ts) AS w_start,
             |             c.c_mktsegment AS segment, e.value
             |      FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey) sub
             |GROUP BY w_start, segment ORDER BY w_start, segment NULLS LAST""".stripMargin)),

    QueryDef(
      "q_stream_join",
      // Stream-stream interval join (StreamOps.attributionJoin): clicks
      // pair with same-user purchases inside a 2-hour attribution window.
      // The streaming twin is Spark's watermarked stream-stream inner join
      // — per-user state bounded by watermark + window, the only shape
      // that survives an unbounded topic (StreamingSpec runs it on two
      // MemoryStreams); this batch declaration is what the oracle checks.
      (s, dir) => {
        val ev = t(s, dir, "events")
        graft.streaming.StreamOps.attributionJoin(
            ev.filter(col("event_type") === "click"),
            ev.filter(col("event_type") === "purchase"),
            window = "2 hours")
          .select("user_id", "click_id", "buy_id", "click_ts", "buy_ts", "value")
          .orderBy("user_id", "click_id", "buy_id")
      },
      Some("""WITH c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
             |          FROM events WHERE event_type = 'click'),
             |p AS (SELECT user_id, event_id AS buy_id, ts AS buy_ts, value
             |      FROM events WHERE event_type = 'purchase')
             |SELECT user_id, click_id, buy_id, click_ts, buy_ts, value
             |FROM c JOIN p USING (user_id)
             |WHERE buy_ts >= click_ts AND buy_ts <= click_ts + INTERVAL 2 HOUR
             |ORDER BY user_id, click_id, buy_id""".stripMargin)),

    QueryDef(
      "q_stream_upsert",
      // END-TO-END STREAMING declaration (unlike the batch twins above,
      // this one really streams): the events parquet is read as a
      // file-source stream (Trigger.AvailableNow), each micro-batch
      // CDC-upserts its latest row per user into a Delta table
      // (StreamOps.upsertLatestToDelta — newer-wins merge, idempotent on
      // at-least-once replay), and the materialized latest-state table is
      // read back through the Delta log. The oracle is the batch
      // definition of the same state: last event per user by (µs-ts,
      // event_id). StreamingSpec drives the multi-batch + replay
      // semantics through MemoryStream; this declaration proves the
      // file-source → foreachBatch → merge → log-read loop end-to-end.
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val cols = Seq("user_id", "event_id", "ts", "event_type", "value")
        val table = graft.TempTables.create("graft-stream-upsert")
        // seed the target with the stream's schema (empty)
        graft.sinks.DeltaSink.write(
          t(s, dir, "events").select(cols.map(col): _*).limit(0),
          table, overwrite = true)
        val stream = graft.Tables.streamEvents(s, dir).select(cols.map(col): _*)
        val q = stream.writeStream
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .foreachBatch {
            (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
              graft.streaming.StreamOps.upsertBatch(
                batch, table, keys = Seq("user_id"), orderCols = Seq("ts", "event_id"))
          }
          .start()
        q.awaitTermination()
        graft.sinks.DeltaSink.read(s, table)
          .select(col("user_id"), col("event_id").as("last_event_id"),
            col("ts").as("last_ts"), col("event_type").as("state"),
            col("value").as("last_value"))
          .orderBy("user_id")
      },
      Some("""WITH ranked AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts_us,
             |  event_type, value,
             |  ROW_NUMBER() OVER (PARTITION BY user_id
             |    ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
             |FROM events)
             |SELECT user_id, event_id AS last_event_id, ts_us AS last_ts,
             |  event_type AS state, value AS last_value
             |FROM ranked WHERE rn = 1 ORDER BY user_id""".stripMargin)),

    QueryDef(
      "q_stream_delta_tail",
      // END-TO-END incremental lakehouse pipeline under the oracle (r11 —
      // VERDICT r10 #7: the DeltaTailSource path graduates from
      // ScalaTest-only to a driver-checked declaration): the events
      // census lands in a SOURCE Delta table in TWO commits (even
      // event_ids as the initial snapshot, odd as an append), a
      // Structured Streaming query tails the table through
      // graft-delta-tail (offsets = Delta versions, OPTIMIZE rewrites
      // never re-emitted) and appends each micro-batch EXACTLY-ONCE
      // (txn-watermarked) into a DEST Delta table; the declared result
      // aggregates the dest per event_type. Matching the oracle's
      // whole-corpus census proves no version lost and none
      // double-delivered — cnt must equal the distinct-event_id count in
      // every group, or a replayed/skipped batch shows up as a hash
      // mismatch. Scale posture: the tail reads only changed files per
      // micro-batch; state is the checkpoint offset, O(1).
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val src = graft.TempTables.create("graft-tail-src")
        val dst = graft.TempTables.create("graft-tail-dst")
        val ckpt = graft.TempTables.create("graft-tail-ckpt")
        graft.sinks.DeltaSink.write(
          ev.filter(pmod(col("event_id"), lit(2)) === 0), src, overwrite = true)
        graft.sinks.DeltaSink.append(
          ev.filter(pmod(col("event_id"), lit(2)) === 1), src)
        graft.sinks.DeltaSink.write(ev.limit(0), dst, overwrite = true)
        val q = s.readStream.format("graft-delta-tail").option("path", src).load()
          .writeStream
          .foreachBatch {
            (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
              graft.sinks.DeltaSink.appendExactlyOnce(
                batch, dst, appId = "q-stream-delta-tail", txnVersion = id): Unit
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        graft.sinks.DeltaSink.read(s, dst)
          .groupBy("event_type")
          .agg(count(lit(1)).as("cnt"),
            countDistinct(col("event_id")).as("n_ids"),
            fxSum(col("value")).as("sum_v"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, COUNT(*) AS cnt,
             |COUNT(DISTINCT event_id) AS n_ids,
             |CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_v
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_stream_iceberg_tail",
      // The ICEBERG tail (r14, format twin of q_stream_delta_tail, and a
      // CROSS-FORMAT pipeline to boot): the events census lands in a
      // source ICEBERG table in two commits, a Structured Streaming query
      // tails it through graft-iceberg-tail — offsets are SEQUENCE
      // NUMBERS, each micro-batch the bounded (start, end] incremental
      // scan resolved against the boundary snapshot, so racing commits
      // never leak or re-deliver — and every batch appends EXACTLY-ONCE
      // (txn-watermarked) into a dest DELTA table. Matching the oracle's
      // whole-corpus census proves no sequence lost and none doubled
      // (cnt ≡ distinct event_ids per group). Scale posture: a batch
      // reads only the files its sequences added; state is the
      // checkpointed offset, O(1).
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val src = graft.TempTables.create("graft-itail-src") + "/tbl"
        val dst = graft.TempTables.create("graft-itail-dst")
        val ckpt = graft.TempTables.create("graft-itail-ckpt")
        graft.sinks.IcebergSink.write(
          ev.filter(pmod(col("event_id"), lit(2)) === 0), src,
          graft.sinks.IcebergSink.CreateExclusive)
        graft.sinks.IcebergSink.write(
          ev.filter(pmod(col("event_id"), lit(2)) === 1), src,
          graft.sinks.IcebergSink.Append)
        graft.sinks.DeltaSink.write(ev.limit(0), dst, overwrite = true)
        val q = s.readStream.format("graft-iceberg-tail").option("path", src).load()
          .writeStream
          .foreachBatch {
            (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
              graft.sinks.DeltaSink.appendExactlyOnce(
                batch, dst, appId = "q-stream-iceberg-tail", txnVersion = id): Unit
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        graft.sinks.DeltaSink.read(s, dst)
          .groupBy("event_type")
          .agg(count(lit(1)).as("cnt"),
            countDistinct(col("event_id")).as("n_ids"),
            fxSum(col("value")).as("sum_v"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, COUNT(*) AS cnt,
             |COUNT(DISTINCT event_id) AS n_ids,
             |CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_v
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_stream_iceberg_branch",
      // BRANCH-TARGETED STREAMING TAIL (r15) — the WAP audit intake the
      // r14 branch machinery was built for: main bootstraps with the
      // even half, the odd half lands on an UNPUBLISHED staging branch
      // in two commits, and the audit pipeline tails the BRANCH
      // (.option("branch", "staging")) exactly-once into a Delta audit
      // table BEFORE publish — validation reads staged rows while every
      // main-line reader still serves the audited state. Then
      // fastForward publishes, and the final census pins the handover:
      // the audited intake (bootstrap history + both staged commits)
      // equals the whole corpus, with cnt ≡ distinct ids per group (no
      // sequence lost, none doubled), and the published main census
      // equals it too. Offsets cursor the shared never-reused sequence
      // space, so branch and main feeds can never double-deliver across
      // the publish. State is the checkpointed offset, O(1); each batch
      // reads only the files its sequences added.
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val src = graft.TempTables.create("graft-btail-src") + "/tbl"
        val audit = graft.TempTables.create("graft-btail-audit")
        val ckpt = graft.TempTables.create("graft-btail-ckpt")
        graft.sinks.IcebergSink.write(
          ev.filter(pmod(col("event_id"), lit(2)) === 0), src,
          graft.sinks.IcebergSink.CreateExclusive)
        graft.sinks.IcebergSink.createRef(src, "staging",
          graft.sinks.IcebergSink.snapshots(src).last._1, refType = "branch")
        graft.sinks.IcebergSink.appendBranch(
          ev.filter(pmod(col("event_id"), lit(4)) === 1), src, "staging")
        graft.sinks.IcebergSink.appendBranch(
          ev.filter(pmod(col("event_id"), lit(4)) === 3), src, "staging")
        graft.sinks.DeltaSink.write(ev.limit(0), audit, overwrite = true)
        val q = s.readStream.format("graft-iceberg-tail")
          .option("path", src).option("branch", "staging").load()
          .writeStream
          .foreachBatch {
            (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
              graft.sinks.DeltaSink.appendExactlyOnce(
                batch, audit, appId = "q-stream-iceberg-branch", txnVersion = id): Unit
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        graft.sinks.IcebergSink.fastForward(src, "staging")
        val published = graft.sinks.IcebergSink.read(s, src)
          .groupBy("event_type").agg(count(lit(1)).as("n_published"))
        graft.sinks.DeltaSink.read(s, audit)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_audited"),
            countDistinct(col("event_id")).as("n_ids"),
            fxSum(col("value")).as("sum_v"))
          .join(published, Seq("event_type"), "full_outer")
          .select(col("event_type"), col("n_audited"), col("n_ids"),
            col("sum_v"), col("n_published"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_audited,
             |COUNT(DISTINCT event_id) AS n_ids,
             |CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
             |  AS sum_v,
             |CAST(COUNT(*) AS BIGINT) AS n_published
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_stream_iceberg",
      // Exactly-once streaming ingest into ICEBERG under the oracle — the
      // other sink format's twin of q_stream_delta_tail: the even half of
      // the events bootstraps the table (CreateExclusive — the initial
      // backfill), the odd half lands in a source Delta table in two
      // commits and is tailed by a Structured Streaming query whose every
      // micro-batch commits as ONE snapshot stamped with (appId, batchId)
      // in its summary (IcebergSink.appendExactlyOnce). After the stream
      // drains, batch 0 is deliberately REPLAYED with the full corpus —
      // the crash-between-commit-and-checkpoint case of foreachBatch —
      // and must no-op against the summary watermark (replay_noop
      // pinned TRUE; a failed no-op would also double cnt/sum_v against
      // the oracle's whole-corpus census). State is the checkpoint
      // offset, O(1); each batch touches only its own files.
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val src = graft.TempTables.create("graft-sice-src")
        val dst = graft.TempTables.create("graft-sice-dst") + "/tbl"
        val ckpt = graft.TempTables.create("graft-sice-ckpt")
        graft.sinks.IcebergSink.write(
          ev.filter(pmod(col("event_id"), lit(2)) === 0), dst,
          graft.sinks.IcebergSink.CreateExclusive,
          partitionBy = Seq("event_type"))
        graft.sinks.DeltaSink.write(
          ev.filter(pmod(col("event_id"), lit(4)) === 1), src, overwrite = true)
        graft.sinks.DeltaSink.append(
          ev.filter(pmod(col("event_id"), lit(4)) === 3), src)
        val appId = "q-stream-iceberg"
        val q = s.readStream.format("graft-delta-tail").option("path", src).load()
          .writeStream
          .foreachBatch {
            (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
              graft.sinks.IcebergSink.appendExactlyOnce(batch, dst, appId, id): Unit
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val replayed = graft.sinks.IcebergSink.appendExactlyOnce(ev, dst, appId, 0L)
        graft.sinks.IcebergSink.read(s, dst)
          .groupBy("event_type")
          .agg(count(lit(1)).as("cnt"),
            countDistinct(col("event_id")).as("n_ids"),
            fxSum(col("value")).as("sum_v"))
          .withColumn("replay_noop", lit(replayed == -1L))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, COUNT(*) AS cnt,
             |COUNT(DISTINCT event_id) AS n_ids,
             |CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_v,
             |TRUE AS replay_noop
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_resample_gapfill",
      // Time-series resampling with gap fill: every (1-hour bucket ×
      // event_type) cell over the corpus's full time range, zero-filled
      // where no events landed — the densification step dashboards and
      // downstream ML both assume. The GRID side is tiny by construction
      // (range/granularity × |types|, here 720×5) and broadcast; the only
      // data-sized work is the per-cell aggregate, one shuffle with
      // map-side combine. At 100 TB the shape is unchanged — the grid
      // grows with time and cardinality, never with event volume.
      (s, dir) => {
        val ev = t(s, dir, "events")
        val bounds = ev.agg(
          date_trunc("hour", min("ts")).as("t0"),
          date_trunc("hour", max("ts")).as("t1"))
        val grid = bounds.select(
          explode(sequence(col("t0"), col("t1"), expr("INTERVAL 1 HOUR"))).as("bucket"))
        val types = ev.select("event_type").distinct()
        val agg = ev
          .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
          .agg(count(lit(1)).as("c"), fxSum(col("value")).as("s"))
        grid.crossJoin(types)
          .join(agg, Seq("bucket", "event_type"), "left")
          .select(col("bucket"), col("event_type"),
            coalesce(col("c"), lit(0L)).as("cnt"),
            coalesce(col("s"), lit(0.0)).as("sum_v"))
          .orderBy("bucket", "event_type")
      },
      Some("""WITH b AS (SELECT date_trunc('hour', min(ts)) AS t0,
             |                 date_trunc('hour', max(ts)) AS t1 FROM events),
             |grid AS (SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS bucket FROM b),
             |types AS (SELECT DISTINCT event_type FROM events),
             |agg AS (SELECT date_trunc('hour', ts) AS bucket, event_type,
             |               count(*) AS c, SUM(CAST(value AS DECIMAL(38,6))) AS s
             |        FROM events GROUP BY 1, 2)
             |SELECT g.bucket, t.event_type, CAST(COALESCE(c, 0) AS BIGINT) AS cnt,
             |       CAST(COALESCE(s, 0) AS DOUBLE) AS sum_v
             |FROM grid g CROSS JOIN types t
             |LEFT JOIN agg a ON a.bucket = g.bucket AND a.event_type = t.event_type
             |ORDER BY g.bucket, t.event_type""".stripMargin)),

    QueryDef(
      "q_incremental_mv",
      // Incremental materialized-view maintenance from the Delta change
      // feed: an aggregate table (count + exact sum per event_type) is
      // built from an initial snapshot, a second batch is appended, and the
      // view is brought current by aggregating ONLY the changed rows
      // (DeltaSink.readChangesSince) and additively merging the partials —
      // never re-scanning the base table. count/sum are self-mergeable;
      // the merge input is two view-sized frames, so refresh cost scales
      // with the DELTA, not the table — the whole point at 100 TB, where
      // the base is petabytes and a batch is gigabytes. The oracle is the
      // full recompute over all events: incremental ≡ from-scratch.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val table = graft.TempTables.create("graft-imv")
        graft.sinks.DeltaSink.write(
          ev.filter(col("event_id") % 2 === 0), table, overwrite = true)
        val v0 = graft.sinks.DeltaSink.latestVersion(table)
        // view state after the initial build: exact mergeable partials
        // (count, cents-long sum) — the stored MV schema
        val base = graft.sinks.DeltaSink.read(s, table)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sv"))
        graft.sinks.DeltaSink.append(ev.filter(col("event_id") % 2 === 1), table)
        // refresh: aggregate the feed rows of versions (v0, latest] only
        val delta = graft.sinks.DeltaSink.readChangesSince(s, table, v0)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sv"))
        base.unionByName(delta)
          .groupBy("event_type")
          .agg(sum(col("n")).as("n_events"),
            (sum(col("sv")).cast("double") / 100.0).as("total_value"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
             |CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_time_travel",
      // Snapshot isolation / time travel through the Delta log: the same
      // aggregate read at version 0 (the initial half) and at latest (both
      // halves) out of ONE table — the audit/backfill primitive ("what did
      // the table say when the model trained?"). The as-of read replays
      // the log only to the pinned version; file-level pruning and scan
      // parallelism are identical to a current-version read, so a
      // petabyte-table historical query costs the same as a current one.
      // Oracle recomputes both snapshots from the raw events by the same
      // even/odd batch split, so the pinned replay is hash-checked.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val table = graft.TempTables.create("graft-tt")
        graft.sinks.DeltaSink.write(
          ev.filter(col("event_id") % 2 === 0), table, overwrite = true)
        val v0 = graft.sinks.DeltaSink.latestVersion(table)
        graft.sinks.DeltaSink.append(ev.filter(col("event_id") % 2 === 1), table)
        def snap(df: org.apache.spark.sql.DataFrame, label: String) = df
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"), fxSum(col("value")).as("total_value"))
          .withColumn("snapshot", lit(label))
        snap(graft.sinks.DeltaSink.read(s, table, Some(v0)), "v0")
          .unionByName(snap(graft.sinks.DeltaSink.read(s, table), "latest"))
          .select("snapshot", "event_type", "n_events", "total_value")
          .orderBy("snapshot", "event_type")
      },
      Some("""SELECT 'latest' AS snapshot, event_type,
             |  CAST(COUNT(*) AS BIGINT) AS n_events,
             |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
             |FROM events GROUP BY event_type
             |UNION ALL
             |SELECT 'v0' AS snapshot, event_type,
             |  CAST(COUNT(*) AS BIGINT) AS n_events,
             |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
             |FROM events WHERE event_id % 2 = 0 GROUP BY event_type
             |ORDER BY snapshot, event_type""".stripMargin)),

    QueryDef(
      "q_iceberg_roundtrip",
      // The Iceberg commit protocol through the CORRECTNESS gate (its Delta
      // twin is q_incremental_mv/q_time_travel): an identity-partitioned
      // Iceberg V2 table is created from one half of the events, the other
      // half appended (second snapshot, manifests merged into a new
      // manifest list), and the table read back via the hand-rolled
      // manifest reader — partition values reconstructed from each
      // manifest's OWN partition struct, not the file paths. The oracle is
      // the same aggregate over the raw events: create + append + manifest
      // read lose nothing. Per-partition file layout means the read-back
      // scan prunes by event_type exactly like a Hive layout would at
      // 100 TB.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val table = graft.TempTables.create("graft-iceberg-rt") + "/tbl"
        graft.sinks.IcebergSink.write(
          ev.filter(col("event_id") % 2 === 0), table,
          graft.sinks.IcebergSink.CreateExclusive,
          partitionBy = Seq("event_type"))
        graft.sinks.IcebergSink.write(
          ev.filter(col("event_id") % 2 === 1), table,
          graft.sinks.IcebergSink.Append,
          partitionBy = Seq("event_type"))
        graft.sinks.IcebergSink.read(s, table)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"), fxSum(col("value")).as("total_value"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
             |CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_iceberg_hidden_day",
      // Iceberg HIDDEN partitioning (day transform) through the
      // correctness gate: events commit to a `day(ts)`-partitioned
      // Iceberg table — the table schema has no derived column, data
      // files keep ts, the transform lives only in the spec + manifest
      // partition structs — and a one-week range is served via
      // readDays, which prunes whole files by manifest day ordinal
      // before the exact timestamp predicate re-applies. The oracle is
      // the same aggregate over raw events: partitioned commit, manifest
      // values, pruning, and the re-filter lose nothing.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "ts", "event_type", "value")
        val table = graft.TempTables.create("graft-iceberg-day") + "/tbl"
        graft.sinks.IcebergSink.write(ev, table,
          graft.sinks.IcebergSink.CreateExclusive, partitionBy = Seq("day(ts)"))
        val from = java.time.LocalDate.of(2024, 1, 8)
        val until = java.time.LocalDate.of(2024, 1, 15)
        val (df, _, _) = graft.sinks.IcebergSink.readDays(s, table, "ts", from, until)
        df.groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n_events"), fxSum(col("value")).as("total_value"))
          .orderBy("day")
      },
      Some("""SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n_events,
             |CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
             |FROM events
             |WHERE CAST(ts AS DATE) >= DATE '2024-01-08'
             |  AND CAST(ts AS DATE) < DATE '2024-01-15'
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef(
      "q_iceberg_partition_evolve",
      // PARTITION EVOLUTION under the oracle (r14, Iceberg spec
      // §partition-evolution): the even half bootstraps an
      // identity(event_type) table, evolvePartition re-layouts the
      // DEFAULT spec to hidden day(ts) in ONE metadata version (zero
      // data/manifest I/O — at 100 TB this is a pointer edit, never a
      // rewrite), and the odd half appends under the NEW spec. The
      // one-week readDays window must then serve a MIXED-SPEC snapshot:
      // out-of-window day-partitioned files are pruned by manifest day
      // ordinal while the identity-partitioned files (which carry no day
      // value) are all kept and the exact timestamp re-filter applies.
      // Census gates: per-day totals vs the raw oracle (nothing lost
      // across the re-layout), n_old_spec (the old-spec half really
      // contributes through its own manifests), and `pruned` (file
      // skipping actually happened on the new-spec files).
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "ts", "event_type", "value")
        val table = graft.TempTables.create("graft-iceberg-pevo") + "/tbl"
        graft.sinks.IcebergSink.write(ev.filter(col("event_id") % 2 === 0),
          table, graft.sinks.IcebergSink.CreateExclusive,
          partitionBy = Seq("event_type"))
        graft.sinks.IcebergSink.evolvePartition(table, Seq("day(ts)"))
        graft.sinks.IcebergSink.write(ev.filter(col("event_id") % 2 === 1),
          table, graft.sinks.IcebergSink.Append)
        val from = java.time.LocalDate.of(2024, 1, 8)
        val until = java.time.LocalDate.of(2024, 1, 15)
        val (df, scanned, total) =
          graft.sinks.IcebergSink.readDays(s, table, "ts", from, until)
        df.groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n_events"),
            count(when(col("event_id") % 2 === 0, 1)).as("n_old_spec"),
            fxSum(col("value")).as("total_value"))
          .withColumn("pruned", lit(scanned < total))
          .orderBy("day")
      },
      Some("""SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n_events,
             |  CAST(COUNT(*) FILTER (WHERE event_id % 2 = 0) AS BIGINT) AS n_old_spec,
             |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
             |    AS total_value,
             |  TRUE AS pruned
             |FROM events
             |WHERE CAST(ts AS DATE) >= DATE '2024-01-08'
             |  AND CAST(ts AS DATE) < DATE '2024-01-15'
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef(
      "q_iceberg_bucket_read",
      // Iceberg bucket partitioning as a POINT-LOOKUP index (r9): events
      // commit to a bucket(8, user_id) table (spec murmur3 — an external
      // Iceberg reader computes the same bucket), and per-user probes are
      // served via readBucket, which hashes the key to its bucket ordinal
      // and scans ONLY that bucket's files before the exact key predicate
      // re-applies. Each probe's `pruned` flag pins that file skipping
      // actually happened; the oracle recomputes the same per-user
      // aggregates over raw events — commit, manifest bucket values,
      // pruning and re-filter lose nothing. The 100 TB story: a keyed
      // lookup touches 1/N of the table's files, no secondary index.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "ts", "user_id", "value")
        val table = graft.TempTables.create("graft-iceberg-bucket-q") + "/tbl"
        graft.sinks.IcebergSink.write(ev, table,
          graft.sinks.IcebergSink.CreateExclusive,
          partitionBy = Seq("bucket(8,user_id)"))
        Seq(1L, 7L, 13L).map { u =>
          val (df, scanned, total) =
            graft.sinks.IcebergSink.readBucket(s, table, "user_id", u)
          df.groupBy("user_id")
            .agg(count(lit(1)).as("n_events"), fxSum(col("value")).as("total_value"))
            .withColumn("pruned", lit(scanned < total))
        }.reduce(_ unionByName _).orderBy("user_id")
      },
      Some("""SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
             |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
             |    AS total_value,
             |  TRUE AS pruned
             |FROM events WHERE user_id IN (1, 7, 13)
             |GROUP BY user_id ORDER BY user_id""".stripMargin)),

    QueryDef(
      "q_delta_merge",
      // Keyed MERGE (CDC apply) through the correctness gate: a CDC batch
      // derived deterministically from the corpus — updates (key % 11,
      // value + 1000), deletes (key % 13, delete-marked), inserts (key %
      // 17 re-keyed to -(id+1): corpus ids are non-negative at EVERY
      // scale factor, so the negated space can never collide with a real
      // key, unlike any additive offset) — merges into the event-level
      // Delta table; the merged table is read back and aggregated. The
      // oracle recomputes the final state relationally, so matched-rewrite
      // / delete / insert semantics and untouched-file carry-over are all
      // hash-checked, not just ScalaTested. At scale a merge touching one
      // key rewrites one file, not the table (DeltaSink.merge contract).
      (s, dir) => {
        val base = t(s, dir, "events")
          .select("event_id", "user_id", "event_type", "value")
        val table = graft.TempTables.create("graft-merge")
        graft.sinks.DeltaSink.write(base, table, overwrite = true)
        val updates = base
          .filter(col("event_id") % 11 === 0 && col("event_id") % 13 =!= 0)
          .withColumn("value", col("value") + 1000)
          .withColumn("_del", lit(false))
        val deletes = base.filter(col("event_id") % 13 === 0)
          .withColumn("_del", lit(true))
        val inserts = base.filter(col("event_id") % 17 === 0)
          .withColumn("event_id", -col("event_id") - 1)
          .withColumn("_del", lit(false))
        graft.sinks.DeltaSink.merge(s, table,
          updates.unionByName(deletes).unionByName(inserts),
          keys = Seq("event_id"), deleteCol = Some("_del"))
        graft.sinks.DeltaSink.read(s, table)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"), fxSum(col("value")).as("total_value"))
          .orderBy("event_type")
      },
      Some("""WITH final AS (
             |  SELECT event_id, event_type,
             |    CASE WHEN event_id % 11 = 0 THEN value + 1000 ELSE value END AS value
             |  FROM events WHERE event_id % 13 <> 0
             |  UNION ALL
             |  SELECT -event_id - 1, event_type, value
             |  FROM events WHERE event_id % 17 = 0)
             |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
             |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
             |FROM final GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_delta_zorder_read",
      // OPTIMIZE ZORDER + stats-based file skipping through the gate: the
      // event table is compacted into small z-ordered files (tight
      // per-file [min, max] on `value`), then a range slice reads ONLY the
      // overlapping files (DeltaSink.readRange) with the exact row filter
      // on top. The oracle is the plain WHERE over the raw events — if
      // pruning ever dropped a file it shouldn't, the hash breaks. At
      // 100 TB this is the open-few-files-instead-of-all read path the
      // per-add stats exist for.
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select("event_id", "event_type", "value")
        val table = graft.TempTables.create("graft-zorder")
        graft.sinks.DeltaSink.write(ev, table, overwrite = true)
        graft.sinks.DeltaSink.compact(s, table,
          maxRecordsPerFile = 2000, zorderBy = Seq("value"))
        graft.sinks.DeltaSink.readRange(s, table, "value", "100.0", "200.0")
          .filter(col("value") >= 100.0 && col("value") <= 200.0)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"), fxSum(col("value")).as("total_value"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
             |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
             |FROM events WHERE value >= 100.0 AND value <= 200.0
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_delta_cluster_by",
      // LIQUID CLUSTERING under the oracle (r17, Delta spec §Clustered
      // Table): clusterBy declares (value, event_id) in ONE metadata-only
      // commit (writer v7 + `clustering`+`domainMetadata` features, the
      // `delta.clustering` domain — no file moves), then a PLAIN OPTIMIZE
      // clusters implicitly by the declared columns. The read slices BOTH
      // dimensions through readRanges (multi-column stats pruning) with
      // the exact row filter on top; gates: `clustered` (the declaration
      // reads back), `files_pruned` (the 2-D slice opened strictly fewer
      // files than the table holds — the skipping the layout exists for).
      // vs q_delta_zorder_read: same engine underneath, but the LAYOUT
      // ownership moves into table metadata — OPTIMIZE needs no operator
      // args, and re-declaring re-points future runs without rewriting
      // history (the mobility partitioning can't offer). r18 extends the
      // scope with the INCREMENTAL-liquid contract: after a small append,
      // a second plain OPTIMIZE rewrites ONLY the unclustered tail
      // (clustered generations carry forward untouched — gates
      // `incremental` below: rewritten < live file count), and a third
      // OPTIMIZE on the then-fully-clustered table is a (0,0) no-op. At
      // 100 TB: nightly OPTIMIZE cost tracks the day's ingest, never the
      // table; multi-dimensional slices open the few overlapping files,
      // and the clustering contract travels with the table, not job code.
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select("event_id", "event_type", "value")
        val evMain = ev.filter(col("event_id") % 10 =!= 0)
        val evTail = ev.filter(col("event_id") % 10 === 0)
        val table = graft.TempTables.create("graft-liquid")
        graft.sinks.DeltaSink.write(evMain, table, overwrite = true)
        graft.sinks.DeltaSink.clusterBy(s, table, Seq("value", "event_id"))
        graft.sinks.DeltaSink.compact(s, table, maxRecordsPerFile = 2000)
        val declared = graft.sinks.DeltaSink.clusteringColumns(s, table) ==
          Seq("value", "event_id")
        // incremental liquid: the appended tail is small, so the second
        // OPTIMIZE must rewrite fewer files than the table holds, and a
        // third must be a no-op (everything already clustered)
        graft.sinks.DeltaSink.append(evTail, table)
        val liveBefore =
          graft.sinks.DeltaSink.read(s, table).inputFiles.length
        val (rewritten2, _) =
          graft.sinks.DeltaSink.compact(s, table, maxRecordsPerFile = 2000)
        val incremental = rewritten2 > 0 && rewritten2 < liveBefore &&
          graft.sinks.DeltaSink.compact(s, table,
            maxRecordsPerFile = 2000) == ((0, 0))
        val idBound = ev.agg(max(col("event_id"))).head().getLong(0) / 2
        val slice = graft.sinks.DeltaSink.readRanges(s, table,
          Seq(("value", "100.0", "200.0"), ("event_id", "0", idBound.toString)))
        val pruned = slice.inputFiles.length <
          graft.sinks.DeltaSink.read(s, table).inputFiles.length
        slice
          .filter(col("value") >= 100.0 && col("value") <= 200.0 &&
            col("event_id") >= 0 && col("event_id") <= idBound)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            fxSum(col("value")).as("total_value"))
          .withColumn("clustered", lit(declared))
          .withColumn("files_pruned", lit(pruned))
          .withColumn("incremental", lit(incremental))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
             |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value,
             |  TRUE AS clustered, TRUE AS files_pruned, TRUE AS incremental
             |FROM events WHERE value >= 100.0 AND value <= 200.0
             |  AND event_id >= 0
             |  AND event_id <= (SELECT CAST(FLOOR(MAX(event_id) / 2.0) AS BIGINT) FROM events)
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      // r18 widened the scope: append + incremental second OPTIMIZE +
      // no-op third — the r17 best measured the single-OPTIMIZE shape
      shapeVersion = 2),

    QueryDef(
      "q_schema_evolution",
      // Append-time schema evolution through the gate: the table is
      // created without `user_id`, a second batch appends WITH it
      // (mergeSchema — the evolved metaData rides the same commit as the
      // adds), and the read-back null-fills the old files' missing column.
      // The oracle mirrors the column rule relationally: user_id is NULL
      // exactly for the pre-evolution half. Aggregating by nullability
      // checks both the evolved read schema and which files predate it.
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select("event_id", "event_type", "value", "user_id")
        val table = graft.TempTables.create("graft-evolve")
        graft.sinks.DeltaSink.write(
          ev.filter(col("event_id") % 2 === 0).drop("user_id"),
          table, overwrite = true)
        graft.sinks.DeltaSink.append(
          ev.filter(col("event_id") % 2 === 1), table, mergeSchema = true)
        graft.sinks.DeltaSink.read(s, table)
          .groupBy(col("event_type"), col("user_id").isNull.as("pre_evolution"))
          .agg(count(lit(1)).as("n_events"), fxSum(col("value")).as("total_value"))
          .orderBy("event_type", "pre_evolution")
      },
      Some("""SELECT event_type, (event_id % 2 = 0) AS pre_evolution,
             |  CAST(COUNT(*) AS BIGINT) AS n_events,
             |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
             |FROM events GROUP BY 1, 2 ORDER BY event_type, pre_evolution""".stripMargin)),

    QueryDef(
      "q_delta_partition_read",
      // Hive-layout partitioned Delta write + partition-PRUNED read
      // through the gate: the table lays out one directory per
      // event_type, and the read's partition filter eliminates the other
      // directories at PLANNING time (file list pruned from the log's
      // partitionValues — no data file of a pruned partition is opened).
      // Oracle = plain WHERE over the raw events: pruning must be exactly
      // the filter, never more. The 100 TB read path for any
      // partition-aligned predicate.
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select("event_id", "event_type", "value")
        val table = graft.TempTables.create("graft-part")
        graft.sinks.DeltaSink.write(ev, table, overwrite = true,
          partitionBy = Seq("event_type"))
        graft.sinks.DeltaSink.read(s, table)
          .filter(col("event_type").isin("click", "purchase"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"), fxSum(col("value")).as("total_value"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
             |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
             |FROM events WHERE event_type IN ('click', 'purchase')
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_lineage_files",
      // Row→file PROVENANCE audit through the hidden `_metadata` column:
      // events are repartitioned on the partition column (the write idiom
      // that prevents the small-files explosion — one task per partition
      // value instead of every task writing every partition) and committed
      // as a partitioned Delta table; the read-back groups by
      // `_metadata.file_path` — per-FILE row census with zero extra I/O
      // (the path is scan metadata, not data). Declared gates per
      // event_type: the direct census (oracle), `files_ok` — the file
      // count equals ceil(rows / 2,097,152), i.e. exactly what the
      // size-bounded splitter must produce under the repartitioned layout
      // (1 file here; the formula, not the constant, is pinned so the
      // declaration survives any scale) — and `census_match`: summing the
      // per-file censuses reproduces the source exactly (no row lost or
      // double-written by the commit). This is the audit a 100 TB
      // pipeline runs after every backfill: which files carry which
      // slice, and does the physical layout's census tie out.
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select("event_id", "event_type", "value")
        val table = graft.TempTables.create("graft-lineage")
        graft.sinks.DeltaSink.write(ev.repartition(col("event_type")),
          table, overwrite = true, partitionBy = Seq("event_type"))
        val perFile = graft.sinks.DeltaSink.read(s, table)
          .groupBy(col("_metadata.file_path").as("fp"), col("event_type"))
          .agg(count(lit(1)).as("n"))
        val perType = perFile.groupBy("event_type")
          .agg(sum(col("n")).as("n_back"), countDistinct(col("fp")).as("n_files"))
        val maxRowsPerFile = 2097152L
        t(s, dir, "events").groupBy("event_type")
          .agg(count(lit(1)).as("n_rows"))
          .join(perType, Seq("event_type"), "full_outer")
          .select(col("event_type"), col("n_rows"),
            (col("n_files") ===
              floor((col("n_rows") + maxRowsPerFile - 1L) / maxRowsPerFile)
                .cast("long"))
              .as("files_ok"),
            (col("n_back") <=> col("n_rows")).as("census_match"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  TRUE AS files_ok, TRUE AS census_match
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_delta_stats_count",
      // Metadata-only COUNT(*): per-partition counts answered from the
      // _delta_log's numRecords stats (DeltaSink.fileStats) without
      // opening a single data file — at 100 TB the difference between a
      // KB-scale log read and a full scan for "how many rows per
      // partition does this table hold". The oracle is the direct census
      // of the source; `meta_count_match` pins that the log's stats plane
      // agrees with the data plane exactly (a writer that misrecorded
      // numRecords would poison OPTIMIZE bin-packing and stats-pruned
      // merges — this is the audit that catches it).
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select("event_id", "event_type", "value")
        val table = graft.TempTables.create("graft-statscount")
        graft.sinks.DeltaSink.write(ev.repartition(col("event_type")),
          table, overwrite = true, partitionBy = Seq("event_type"))
        val meta = graft.sinks.DeltaSink.fileStats(s, table)
          .groupBy(element_at(col("partitionValues"), "event_type")
            .as("event_type"))
          .agg(sum(col("num_records")).as("n_meta"))
        t(s, dir, "events").groupBy("event_type")
          .agg(count(lit(1)).as("n_rows"))
          .join(meta, Seq("event_type"), "full_outer")
          .select(col("event_type"), col("n_rows"),
            (col("n_meta") <=> col("n_rows")).as("meta_count_match"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  TRUE AS meta_count_match
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_delta_stats_ndv",
      // TABLE STATISTICS under the oracle (r17, q_iceberg_stats_ndv's
      // format twin — the Delta spec has no statistics slot, so
      // DeltaSink.writeStats registers a Puffin of
      // `apache-datasketches-theta-v1` blobs through the `graft.stats`
      // metadata DOMAIN, a documented extension): one theta sketch per
      // column in ONE distributed pass, one metadata-only commit (writer
      // v7 + domainMetadata; reader untouched). Both census columns stay
      // under the sketch's K=256, so the KMV estimates are EXACT and the
      // oracle is a plain COUNT(DISTINCT). `broadcast_hinted` pins the
      // planner hook: scanForJoin's NDV read is what marks the dim side
      // broadcast-able before any scan. At 100 TB: the broadcast
      // decision costs one O(1) domain read off the log head instead of
      // a per-query replay over per-file stats.
      (s, dir) => {
        import org.apache.spark.sql.functions.pmod
        val ev = t(s, dir, "events")
          .select(col("event_id"), col("event_type"),
            pmod(col("event_id"), lit(50L)).as("bucket"))
        val tbl = graft.TempTables.create("graft-ds-stats")
        graft.sinks.DeltaSink.write(ev, tbl, overwrite = true)
        val ndvs = graft.sinks.DeltaSink.writeStats(s, tbl,
          Seq("event_type", "bucket"))
        val hinted = graft.sinks.DeltaSink.read(s, tbl)
          .join(graft.sinks.DeltaSink.scanForJoin(s, tbl, "event_type")
            .select(col("event_type")).distinct(), "event_type")
        val hp = hinted.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        s.createDataFrame(java.util.List.of(
          org.apache.spark.sql.Row(ndvs("event_type"), ndvs("bucket"),
            hp.contains("BroadcastHashJoin"))),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("ndv_event_type",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("ndv_bucket",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("broadcast_hinted",
              org.apache.spark.sql.types.BooleanType))))
      },
      Some("""SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS ndv_event_type,
             |CAST(COUNT(DISTINCT event_id % 50) AS BIGINT) AS ndv_bucket,
             |TRUE AS broadcast_hinted FROM events""".stripMargin)),

    QueryDef(
      "q_delta_checkpoint_v2",
      // V2 CHECKPOINT under the oracle (r15, Delta spec §v2-checkpoints):
      // the census lands in two commits plus a DV delete, then
      // checkpointV2 splits the snapshot into a KB-scale MANIFEST
      // (protocol/metaData/txn/checkpointMetadata + the sidecar list)
      // and SIDECAR parquets holding the adds — the layout where a
      // 100 TB log's checkpoint write AND read both parallelize, and an
      // incremental re-checkpoint can reuse unchanged sidecars. The
      // re-checkpoint after a point DV delete proves the INCREMENTAL
      // contract (r16): content-addressed buckets carry forward BY NAME
      // except the one the delete touched (`sidecars_reused`). The query
      // then deletes EVERY JSON commit — the cold-replay gate: the
      // census must reproduce from manifest + sidecars alone, DV masks
      // included, or the checkpoint dropped state. `v2_layout` pins the
      // N-1 manifest fence (new + previous generation, nothing older).
      // The feature-gating protocol commit (reader 3 / v2Checkpoint) is
      // SinkSpec-pinned alongside the unknown-feature reader refusal.
      (s, dir) => {
        val prevProp = sys.props.get("graft.ckpt.addsPerSidecar")
        sys.props("graft.ckpt.addsPerSidecar") = "4"
        try {
          val ev = t(s, dir, "events").select("event_id", "event_type", "value")
          val table = graft.TempTables.create("graft-ckpt2")
          graft.sinks.DeltaSink.write(ev.filter(col("event_id") % 2 === 0),
            table, overwrite = true)
          graft.sinks.DeltaSink.append(ev.filter(col("event_id") % 2 === 1), table)
          graft.sinks.DeltaSink.deleteWhereDV(s, table, "event_id % 100 = 0")
          graft.sinks.DeltaSink.checkpointV2(s, table)
          val log = new java.io.File(table, "_delta_log")
          val jackson = new com.fasterxml.jackson.databind.ObjectMapper()
          def sidecarsOfPointer(): Set[String] = {
            val name = jackson.readTree(java.nio.file.Files.readString(
              new java.io.File(log, "_last_checkpoint").toPath))
              .get("path").asText()
            s.read.parquet(new java.io.File(log, name).getPath)
              .where(col("sidecar").isNotNull)
              .select("sidecar.path").collect().map(_.getString(0)).toSet
          }
          val s1 = sidecarsOfPointer()
          // INCREMENTAL re-checkpoint (r16): a point DV delete touches one
          // file → one content-addressed bucket rewrites; every other
          // sidecar carries forward BY NAME with zero bytes written
          graft.sinks.DeltaSink.deleteWhereDV(s, table, "event_id = 41")
          graft.sinks.DeltaSink.checkpointV2(s, table)
          val s2 = sidecarsOfPointer()
          val reused = (s2 -- s1).nonEmpty &&
            s1.intersect(s2).size >= s1.size - 2
          log.listFiles().filter(_.getName.endsWith(".json")).foreach(_.delete())
          // N-1 fence: the new + previous generations survive, nothing older
          val nManifests = log.listFiles()
            .count(_.getName.matches("\\d{20}\\.checkpoint\\..*\\.parquet"))
          graft.sinks.DeltaSink.read(s, table).groupBy("event_type")
            .agg(count(lit(1)).as("cnt"),
              countDistinct(col("event_id")).as("n_ids"),
              fxSum(col("value")).as("sum_v"))
            .withColumn("v2_layout", lit(nManifests == 2 && s2.nonEmpty))
            .withColumn("sidecars_reused", lit(reused))
            .orderBy("event_type")
        } finally {
          prevProp match {
            case Some(p) => sys.props("graft.ckpt.addsPerSidecar") = p
            case None => sys.props -= "graft.ckpt.addsPerSidecar"
          }
        }
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt,
             |COUNT(DISTINCT event_id) AS n_ids,
             |CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
             |  AS sum_v,
             |TRUE AS v2_layout, TRUE AS sidecars_reused
             |FROM events WHERE event_id % 100 <> 0 AND event_id <> 41
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      // r16 doubled the scope: a second (incremental) checkpoint, an extra
      // DV delete and the cold-replay gate — pre-r16 bests measure the
      // single-checkpoint shape (VERDICT r16 advice #3)
      shapeVersion = 2),

    QueryDef(
      "q_delta_compact",
      // The small-files LIFECYCLE under the oracle: five micro-batch
      // appends (the streaming-ingest pathology) leave the table in a
      // many-small-files state; OPTIMIZE (DeltaSink.compact) bin-packs the
      // live set into ceil(rows/2,097,152) files using only the log's
      // numRecords stats to plan (no pre-scan), committing the rewrite
      // with dataChange=false so incremental consumers never re-process.
      // Gates: per-type census after compaction equals the source
      // (oracle), `pre_compact_match` — time travel to the last
      // pre-OPTIMIZE version still reproduces the census (compaction
      // rewrites layout, never data), and `files_ok` — the post-compact
      // file count equals the bin-packing formula (scale-stable) and at
      // least as many files were compacted as appends were made.
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select("event_id", "event_type", "value")
        val table = graft.TempTables.create("graft-compact")
        graft.sinks.DeltaSink.write(ev.filter(col("event_id") % 5 === 0),
          table, overwrite = true)
        (1 until 5).foreach { i =>
          graft.sinks.DeltaSink.append(ev.filter(col("event_id") % 5 === i),
            table)
        }
        val preVersion = graft.sinks.DeltaSink.latestVersion(table)
        val (nBefore, nAfter) = graft.sinks.DeltaSink.compact(s, table)
        val maxRowsPerFile = 2097152L
        val gate = graft.sinks.DeltaSink.fileStats(s, table)
          .agg(count(lit(1)).as("n_files"), sum(col("num_records")).as("n_total"))
          .select(
            (col("n_files") === lit(nAfter.toLong) &&
              col("n_files") ===
                floor((col("n_total") + maxRowsPerFile - 1L) / maxRowsPerFile)
                  .cast("long") &&
              lit(nBefore) >= lit(5)).as("files_ok"))
        val direct = t(s, dir, "events").groupBy("event_type")
          .agg(count(lit(1)).as("n_rows"))
        val post = graft.sinks.DeltaSink.read(s, table)
          .groupBy("event_type").agg(count(lit(1)).as("n_post"))
        val pre = graft.sinks.DeltaSink.read(s, table,
            asOfVersion = Some(preVersion))
          .groupBy("event_type").agg(count(lit(1)).as("n_pre"))
        direct
          .join(post, Seq("event_type"), "full_outer")
          .join(pre, Seq("event_type"), "full_outer")
          .crossJoin(broadcast(gate))
          .select(col("event_type"), col("n_rows"),
            (col("n_post") <=> col("n_rows")).as("post_compact_match"),
            (col("n_pre") <=> col("n_rows")).as("pre_compact_match"),
            col("files_ok"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  TRUE AS post_compact_match, TRUE AS pre_compact_match,
             |  TRUE AS files_ok
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_delta_clone",
      // SHALLOW CLONE under the oracle (r14): the corpus lands once, the
      // clone references it by absolute-path adds (ZERO data copied — the
      // `no_copy` column pins that the clone root holds no parquet), and a
      // merge-on-read DV delete lands ON THE CLONE — the census passes
      // only if the clone reads the source's bytes, the delete stayed
      // clone-local (n_src must still equal the full per-type count), and
      // the clone's merged view masks exactly the deleted fifth. The
      // experimentation primitive at 100 TB: branch a production table in
      // milliseconds, mutate freely, throw it away.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val root = graft.TempTables.create("graft-delta-clone")
        val src = root + "/src"
        val dst = root + "/clone"
        graft.sinks.DeltaSink.write(ev, src)
        graft.sinks.DeltaSink.cloneTable(s, src, dst)
        graft.sinks.DeltaSink.deleteWhereDV(s, dst, "event_id % 5 = 0")
        val noCopy = !new java.io.File(dst).listFiles().exists(f =>
          f.getName.endsWith(".parquet"))
        val srcC = graft.sinks.DeltaSink.read(s, src).groupBy("event_type")
          .agg(count(lit(1)).as("n_src"))
        graft.sinks.DeltaSink.read(s, dst).groupBy("event_type")
          .agg(count(lit(1)).as("n_clone"), fxSum(col("value")).as("v_clone"))
          .join(srcC, Seq("event_type"), "full_outer")
          .select(col("event_type"),
            coalesce(col("n_src"), lit(0L)).as("n_src"),
            coalesce(col("n_clone"), lit(0L)).as("n_clone"),
            coalesce(col("v_clone"), lit(0.0)).as("v_clone"),
            lit(noCopy).as("no_copy"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_src,
             |  CAST(COUNT(*) FILTER (WHERE event_id % 5 <> 0) AS BIGINT) AS n_clone,
             |  CAST(COALESCE(SUM(CAST(ROUND(value * 100) AS BIGINT))
             |    FILTER (WHERE event_id % 5 <> 0), 0) AS DOUBLE) / 100.0 AS v_clone,
             |  TRUE AS no_copy
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_delta_restore",
      // RESTORE — the undo verb under the oracle: the full corpus lands in
      // two commits, a BAD merge deletes every tenth event (rewriting the
      // files that contained them), and restore() pins the table back to
      // the pre-merge version as a NEW commit — metadata-only, re-adding
      // the rewritten-away files and removing the merge's output, cost
      // proportional to the file-set diff, never the table. Gates:
      // `restored_match` (post-restore census ≡ the whole corpus — the
      // oracle), `bad_travels` (time travel FORWARD to the undone version
      // still works and shows exactly the %10-deleted state: history is
      // preserved, not rewritten), and `diff_ok` (the restore both
      // re-added and removed ≥1 file — both directions of the diff
      // exercised). The operational save when a bad pipeline run lands at
      // 100 TB: undo in O(metadata), no data rewrite, no backup copy.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val table = graft.TempTables.create("graft-restore")
        graft.sinks.DeltaSink.write(ev.filter(col("event_id") % 2 === 0),
          table, overwrite = true)
        graft.sinks.DeltaSink.append(ev.filter(col("event_id") % 2 === 1), table)
        val goodV = graft.sinks.DeltaSink.latestVersion(table)
        // the bad run: delete-marked merge source kills every 10th event
        graft.sinks.DeltaSink.merge(s, table,
          ev.filter(col("event_id") % 10 === 0).withColumn("_del", lit(true)),
          keys = Seq("event_id"), deleteCol = Some("_del"))
        val badV = graft.sinks.DeltaSink.latestVersion(table)
        val (readded, removed) = graft.sinks.DeltaSink.restore(s, table, goodV)
        val direct = t(s, dir, "events").groupBy("event_type")
          .agg(count(lit(1)).as("n_rows"),
            count(when(col("event_id") % 10 =!= 0, 1)).as("n_keep"))
        val back = graft.sinks.DeltaSink.read(s, table)
          .groupBy("event_type").agg(count(lit(1)).as("n_back"))
        val bad = graft.sinks.DeltaSink.read(s, table, asOfVersion = Some(badV))
          .groupBy("event_type").agg(count(lit(1)).as("n_bad"))
        direct
          .join(back, Seq("event_type"), "full_outer")
          .join(bad, Seq("event_type"), "full_outer")
          .select(col("event_type"), col("n_rows"),
            (col("n_back") <=> col("n_rows")).as("restored_match"),
            (col("n_bad") <=> col("n_keep")).as("bad_travels"),
            lit(readded >= 1 && removed >= 1).as("diff_ok"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  TRUE AS restored_match, TRUE AS bad_travels, TRUE AS diff_ok
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_delta_cdf",
      // The BOUNDED change feed (CDF) under the hash oracle, with an
      // OPTIMIZE inside the consumed window — the semantics every
      // incremental consumer at 100 TB depends on. Three batches commit
      // (event_id%3 = 0,1,2) with a compaction between batches 1 and 2;
      // feed A = readChangesBetween(v0, v1] must be EXACTLY batch 1
      // (read from files the compaction has already tombstoned — they
      // survive until vacuum, the CDF retention contract), and feed
      // B = readChangesSince(v1) spans (v1, latest] ACROSS the
      // dataChange=false rewrite and must be exactly batch 2 — if the
      // OPTIMIZE rows leaked into the feed, every count and sum below
      // would double and the oracle (which recomputes both batches from
      // the raw events by the %3 split) would catch it. Feed cost scales
      // with the delta, never the table.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val table = graft.TempTables.create("graft-cdf")
        graft.sinks.DeltaSink.write(ev.filter(col("event_id") % 3 === 0),
          table, overwrite = true)
        val v0 = graft.sinks.DeltaSink.latestVersion(table)
        graft.sinks.DeltaSink.append(ev.filter(col("event_id") % 3 === 1), table)
        val v1 = graft.sinks.DeltaSink.latestVersion(table)
        graft.sinks.DeltaSink.compact(s, table) // dataChange=false rewrite
        graft.sinks.DeltaSink.append(ev.filter(col("event_id") % 3 === 2), table)
        def agg(df: org.apache.spark.sql.DataFrame, n: String, v: String) = df
          .groupBy("event_type")
          .agg(count(lit(1)).as(n), fxSum(col("value")).as(v))
        agg(graft.sinks.DeltaSink.readChangesBetween(s, table, v0, v1),
            "b1_rows", "b1_value")
          .join(agg(graft.sinks.DeltaSink.readChangesSince(s, table, v1),
            "b2_rows", "b2_value"), Seq("event_type"), "full_outer")
          .select(col("event_type"),
            coalesce(col("b1_rows"), lit(0L)).as("b1_rows"),
            coalesce(col("b1_value"), lit(0.0)).as("b1_value"),
            coalesce(col("b2_rows"), lit(0L)).as("b2_rows"),
            coalesce(col("b2_value"), lit(0.0)).as("b2_value"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type,
             |  CAST(COUNT(*) FILTER (WHERE event_id % 3 = 1) AS BIGINT) AS b1_rows,
             |  CAST(COALESCE(SUM(CAST(ROUND(value * 100) AS BIGINT))
             |    FILTER (WHERE event_id % 3 = 1), 0) AS DOUBLE) / 100.0 AS b1_value,
             |  CAST(COUNT(*) FILTER (WHERE event_id % 3 = 2) AS BIGINT) AS b2_rows,
             |  CAST(COALESCE(SUM(CAST(ROUND(value * 100) AS BIGINT))
             |    FILTER (WHERE event_id % 3 = 2), 0) AS DOUBLE) / 100.0 AS b2_value
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_delta_delete",
      // Row-level DELETE (copy-on-write) under the oracle — the Delta twin
      // of q_iceberg_delete: deleteWhere rewrites ONLY the files holding a
      // matching row (touched set = a predicate scan that shuffles nothing
      // but matched file paths), drops the matches, and writes the deleted
      // rows as cdc delete images in the SAME commit. The kept census must
      // equal the oracle's `event_id % 10 <> 0` recompute, and the CDF
      // feed over the delete commit must be EXACTLY the deleted tenth
      // classified `delete` — a row deleted but not fed, or fed but not
      // deleted, shifts one census and not the other. `bad_travels` pins
      // pre-delete time travel intact.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val table = graft.TempTables.create("graft-delta-del")
        graft.sinks.DeltaSink.write(ev, table, overwrite = true)
        val v0 = graft.sinks.DeltaSink.latestVersion(table)
        graft.sinks.DeltaSink.deleteWhere(s, table, "event_id % 10 = 0")
        val kept = graft.sinks.DeltaSink.read(s, table).groupBy("event_type")
          .agg(count(lit(1)).as("n_kept"), fxSum(col("value")).as("v_kept"))
        val feed = graft.sinks.DeltaSink.readCdf(s, table, v0)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_del"), fxSum(col("value")).as("v_del"),
            min(col("_change_type") === "delete").as("all_del"))
        val pre = graft.sinks.DeltaSink.read(s, table, Some(v0))
          .groupBy("event_type").agg(count(lit(1)).as("n_pre"))
        val direct = t(s, dir, "events").groupBy("event_type")
          .agg(count(lit(1)).as("n_all"))
        kept.join(feed, Seq("event_type"), "full_outer")
          .join(pre, Seq("event_type"), "full_outer")
          .join(direct, Seq("event_type"), "full_outer")
          .select(col("event_type"),
            coalesce(col("n_kept"), lit(0L)).as("n_rows"),
            coalesce(col("v_kept"), lit(0.0)).as("sum_value"),
            coalesce(col("n_del"), lit(0L)).as("del_rows"),
            coalesce(col("v_del"), lit(0.0)).as("del_value"),
            coalesce(col("all_del"), lit(true)).as("all_delete"),
            (col("n_pre") <=> col("n_all")).as("bad_travels"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type,
             |  CAST(COUNT(*) FILTER (WHERE event_id % 10 <> 0) AS BIGINT) AS n_rows,
             |  CAST(COALESCE(SUM(CAST(ROUND(value * 100) AS BIGINT))
             |    FILTER (WHERE event_id % 10 <> 0), 0) AS DOUBLE) / 100.0 AS sum_value,
             |  CAST(COUNT(*) FILTER (WHERE event_id % 10 = 0) AS BIGINT) AS del_rows,
             |  CAST(COALESCE(SUM(CAST(ROUND(value * 100) AS BIGINT))
             |    FILTER (WHERE event_id % 10 = 0), 0) AS DOUBLE) / 100.0 AS del_value,
             |  TRUE AS all_delete, TRUE AS bad_travels
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_delta_delete_dv",
      // Row-level DELETE via DELETION VECTORS under the oracle (r13 —
      // VERDICT r12 item 2): the merge-on-read twin of q_delta_delete.
      // deleteWhereDV commits each touched file's add again with a
      // roaring-bitmap sidecar of the matched row indexes — NO data file
      // is read back or rewritten (the `no_rewrite` gate pins the live
      // parquet set byte-identical across the delete: name+mtime+size),
      // which is the whole point at 100 TB: a point delete costs KBs.
      // First use bumps the protocol to reader v3 / writer v7 in the same
      // commit (`protocol_bumped`); matches evaluate against the MERGED
      // view so `redelete_noop` holds; pre-delete time travel intact
      // (`bad_travels`); the CDF feed carries exactly the deleted tenth.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val table = graft.TempTables.create("graft-delta-dvdel")
        graft.sinks.DeltaSink.write(ev, table, overwrite = true)
        val v0 = graft.sinks.DeltaSink.latestVersion(table)
        def liveFiles() = new java.io.File(table).listFiles()
          .filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.lastModified, f.length)).toSet
        val before = liveFiles()
        graft.sinks.DeltaSink.deleteWhereDV(s, table, "event_id % 10 = 0")
        val noRewrite = liveFiles() == before
        val redeleteNoop =
          graft.sinks.DeltaSink.deleteWhereDV(s, table, "event_id % 10 = 0") == 0L
        val protocolBumped = java.nio.file.Files.readString(
          java.nio.file.Paths.get(table, "_delta_log", f"${v0 + 1}%020d.json"))
          .contains("\"minReaderVersion\":3")
        val kept = graft.sinks.DeltaSink.read(s, table).groupBy("event_type")
          .agg(count(lit(1)).as("n_kept"), fxSum(col("value")).as("v_kept"))
        val feed = graft.sinks.DeltaSink.readCdf(s, table, v0)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_del"), fxSum(col("value")).as("v_del"),
            min(col("_change_type") === "delete").as("all_del"))
        val pre = graft.sinks.DeltaSink.read(s, table, Some(v0))
          .groupBy("event_type").agg(count(lit(1)).as("n_pre"))
        val direct = t(s, dir, "events").groupBy("event_type")
          .agg(count(lit(1)).as("n_all"))
        kept.join(feed, Seq("event_type"), "full_outer")
          .join(pre, Seq("event_type"), "full_outer")
          .join(direct, Seq("event_type"), "full_outer")
          .select(col("event_type"),
            coalesce(col("n_kept"), lit(0L)).as("n_rows"),
            coalesce(col("v_kept"), lit(0.0)).as("sum_value"),
            coalesce(col("n_del"), lit(0L)).as("del_rows"),
            coalesce(col("v_del"), lit(0.0)).as("del_value"),
            coalesce(col("all_del"), lit(true)).as("all_delete"),
            lit(noRewrite).as("no_rewrite"),
            lit(redeleteNoop).as("redelete_noop"),
            lit(protocolBumped).as("protocol_bumped"),
            (col("n_pre") <=> col("n_all")).as("bad_travels"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type,
             |  CAST(COUNT(*) FILTER (WHERE event_id % 10 <> 0) AS BIGINT) AS n_rows,
             |  CAST(COALESCE(SUM(CAST(ROUND(value * 100) AS BIGINT))
             |    FILTER (WHERE event_id % 10 <> 0), 0) AS DOUBLE) / 100.0 AS sum_value,
             |  CAST(COUNT(*) FILTER (WHERE event_id % 10 = 0) AS BIGINT) AS del_rows,
             |  CAST(COALESCE(SUM(CAST(ROUND(value * 100) AS BIGINT))
             |    FILTER (WHERE event_id % 10 = 0), 0) AS DOUBLE) / 100.0 AS del_value,
             |  TRUE AS all_delete, TRUE AS no_rewrite, TRUE AS redelete_noop,
             |  TRUE AS protocol_bumped, TRUE AS bad_travels
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_delta_update",
      // Row-level UPDATE (copy-on-write) under the oracle — completes the
      // DML triad with q_delta_delete and q_delta_merge: updateWhere
      // rewrites only the files holding a matching row, every SET
      // expression evaluating against the PRE-update row, and the
      // pre/post images ride the same commit as cdc files. Three
      // independent recomputes must agree: the table census with the
      // CASE'd values (a lost or double-applied update shifts it), the
      // CDF pre-image census (exactly the original matched values), and
      // the post-image census (exactly the transformed ones).
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val table = graft.TempTables.create("graft-delta-upd")
        graft.sinks.DeltaSink.write(ev, table, overwrite = true)
        val v0 = graft.sinks.DeltaSink.latestVersion(table)
        graft.sinks.DeltaSink.updateWhere(s, table, "event_id % 10 = 0",
          Map("value" -> "value + 1000"))
        val kept = graft.sinks.DeltaSink.read(s, table).groupBy("event_type")
          .agg(count(lit(1)).as("n_rows"), fxSum(col("value")).as("sum_value"))
        val feed = graft.sinks.DeltaSink.readCdf(s, table, v0)
        val pre = feed.filter(col("_change_type") === "update_preimage")
          .groupBy("event_type")
          .agg(count(lit(1)).as("upd_rows"), fxSum(col("value")).as("pre_value"))
        val post = feed.filter(col("_change_type") === "update_postimage")
          .groupBy("event_type").agg(fxSum(col("value")).as("post_value"))
        kept.join(pre, Seq("event_type"), "full_outer")
          .join(post, Seq("event_type"), "full_outer")
          .select(col("event_type"), col("n_rows"), col("sum_value"),
            coalesce(col("upd_rows"), lit(0L)).as("upd_rows"),
            coalesce(col("pre_value"), lit(0.0)).as("pre_value"),
            coalesce(col("post_value"), lit(0.0)).as("post_value"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  CAST(SUM(CAST(ROUND((CASE WHEN event_id % 10 = 0
             |    THEN value + 1000 ELSE value END) * 100) AS BIGINT)) AS DOUBLE)
             |    / 100.0 AS sum_value,
             |  CAST(COUNT(*) FILTER (WHERE event_id % 10 = 0) AS BIGINT) AS upd_rows,
             |  CAST(COALESCE(SUM(CAST(ROUND(value * 100) AS BIGINT))
             |    FILTER (WHERE event_id % 10 = 0), 0) AS DOUBLE) / 100.0 AS pre_value,
             |  CAST(COALESCE(SUM(CAST(ROUND((value + 1000) * 100) AS BIGINT))
             |    FILTER (WHERE event_id % 10 = 0), 0) AS DOUBLE) / 100.0 AS post_value
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_delta_row_tracking",
      // ROW TRACKING under the oracle (r16, Delta spec §Row Tracking —
      // q_iceberg_row_lineage's format twin, closing cross-format row-id
      // symmetry): enableRowTracking retroactively assigns baseRowId to
      // every live file in ONE metadata-only commit (protocol v3/v7 +
      // rowTracking/domainMetadata features, the rowIdHighWaterMark
      // domain seeds the clock); appends mint fresh ids above the mark,
      // a DV delete never moves survivors' ids, and an id-preserving
      // compaction MATERIALIZES `_row_id` into the rewritten parquet.
      // r17 adds the tracking contract's second column,
      // `_row_commit_version` (inherited from each file's
      // defaultRowCommitVersion; materialized through compaction like
      // `_row_id`), gated by an IDENTITY update (SET value = value —
      // census-invariant): `rcv_assigned` (no null), `rcv_bumped`
      // (exactly the updated rows advance to the update's version),
      // `rcv_stable` (nobody else moves — compaction's own version
      // never claims repacked rows). Gates computed DISTRIBUTEDLY
      // (pre-op frame joined to post-op — no id ever collected):
      // `ids_stable`, `ids_unique`, `ids_assigned`. Census ≡ the
      // oracle complement.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val tbl = graft.TempTables.create("graft-delta-rowtrk")
        graft.sinks.DeltaSink.write(ev.filter(pmod(col("event_id"), lit(2)) === 0), tbl)
        graft.sinks.DeltaSink.enableRowTracking(s, tbl)
        val pre = graft.sinks.DeltaSink.readWithRowIds(s, tbl)
          .select(col("event_id"), col("_row_id").as("_pre_id"))
        graft.sinks.DeltaSink.append(
          ev.filter(pmod(col("event_id"), lit(2)) === 1), tbl)
        graft.sinks.DeltaSink.deleteWhereDV(s, tbl, "event_id % 10 = 3")
        graft.sinks.DeltaSink.compact(s, tbl)
        // post feeds BOTH the stability/uniqueness pass and the preUpd
        // snapshot — materialize the merged row-id read once (r18, guide
        // §5); the g1 head() below is its first action, safely BEFORE the
        // identity update mutates the table
        val post = graft.sinks.DeltaSink.readWithRowIds(s, tbl)
          .localCheckpoint(false)
        // gate counts FUSE into single aggregate passes (the merged
        // row-id read is the expensive part — pay it once per frame,
        // not once per gate)
        // LEFT join keeps appended rows (null _pre_id — not "moved"), so
        // uniqueness/assignment still gate the WHOLE post frame while
        // stability gates only the surviving pre rows, all in ONE pass
        val survivors = post.join(pre, Seq("event_id"), "left")
        // r19 (guide §2.6, the q_lakehouse_maintain recipe — VERDICT r18
        // item 3): the g1 stability pass and the identity update are
        // independent — g1 reads `post`/`pre`, whose plans pinned their
        // file lists + DV state at creation, and the MoR update only ADDS
        // files and sidecars (never deletes) — so g1 runs as a driver
        // Future while the update commits on the main thread; each side's
        // driver-side gaps backfill with the other's tasks. Await before
        // anything reads g1 or the post-update table.
        val g1F = scala.concurrent.Future(survivors.agg(
          count(when(col("_pre_id").isNotNull &&
            col("_row_id") =!= col("_pre_id"), 1)).as("moved"),
          count(when(col("_row_id").isNull, 1)).as("nulls"),
          countDistinct(col("_row_id")).as("dstnct"),
          count(lit(1)).as("n")).head())(
          scala.concurrent.ExecutionContext.global)
        // identity update: commit versions move for EXACTLY the touched rows
        val preUpd = post.select(col("event_id"),
          col("_row_commit_version").as("_pre_rcv"))
        graft.sinks.DeltaSink.updateWhereDV(s, tbl, "event_id % 10 = 6",
          Map("value" -> "value"))
        val g1 = scala.concurrent.Await.result(g1F,
          scala.concurrent.duration.Duration.Inf)
        val stable = g1.getLong(0) == 0L
        val assigned = g1.getLong(1) == 0L
        val unique = g1.getLong(2) == g1.getLong(3)
        // post2 feeds the commit-version gate AND the final census —
        // one merged read, two consumers
        val post2 = graft.sinks.DeltaSink.readWithRowIds(s, tbl)
          .localCheckpoint(false)
        val joined = post2.join(preUpd, Seq("event_id"), "inner")
        val g2 = joined.agg(
          count(when(col("_row_commit_version").isNull, 1)).as("nul"),
          count(when(col("event_id") % 10 === 6 &&
            col("_row_commit_version") <= col("_pre_rcv"), 1)).as("nb"),
          count(when(col("event_id") % 10 =!= 6 &&
            col("_row_commit_version") =!= col("_pre_rcv"), 1)).as("mv"))
          .head()
        val rcvAssigned = g2.getLong(0) == 0L
        val rcvBumped = g2.getLong(1) == 0L
        val rcvStable = g2.getLong(2) == 0L
        post2.groupBy("event_type")
          .agg(count(lit(1)).as("cnt"),
            countDistinct(col("event_id")).as("n_ids"),
            fxSum(col("value")).as("sum_v"))
          .withColumn("ids_stable", lit(stable))
          .withColumn("ids_unique", lit(unique))
          .withColumn("ids_assigned", lit(assigned))
          .withColumn("rcv_assigned", lit(rcvAssigned))
          .withColumn("rcv_bumped", lit(rcvBumped))
          .withColumn("rcv_stable", lit(rcvStable))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt,
             |COUNT(DISTINCT event_id) AS n_ids,
             |CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
             |  AS sum_v,
             |TRUE AS ids_stable, TRUE AS ids_unique, TRUE AS ids_assigned,
             |TRUE AS rcv_assigned, TRUE AS rcv_bumped, TRUE AS rcv_stable
             |FROM events WHERE event_id % 10 <> 3
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      // r17 extended the scope: identity update + second tracking read
      // gating _row_commit_version (the Iceberg census's format twin)
      shapeVersion = 2),

    QueryDef(
      "q_delta_update_dv",
      // Row-level UPDATE via DELETION VECTORS under the oracle (r13) —
      // the merge-on-read twin of q_delta_update, completing the MoR DML
      // plane: updateWhereDV masks the matched rows out of their files
      // with roaring-bitmap sidecars and appends the transformed
      // replacements as NEW files — NO touched file is read back or
      // rewritten (`no_rewrite` pins the original parquet set intact
      // inside the post-update set), so an update of k rows costs O(k) at
      // any file size. Same triple census as the CoW path (table CASE
      // recompute, CDF pre-images, CDF post-images) — a row masked but
      // not replaced, or replaced but not masked, shifts one census and
      // not the others.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val table = graft.TempTables.create("graft-delta-dvupd")
        graft.sinks.DeltaSink.write(ev, table, overwrite = true)
        val v0 = graft.sinks.DeltaSink.latestVersion(table)
        def liveFiles() = new java.io.File(table).listFiles()
          .filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.lastModified, f.length)).toSet
        val before = liveFiles()
        graft.sinks.DeltaSink.updateWhereDV(s, table, "event_id % 10 = 0",
          Map("value" -> "value + 1000"))
        val noRewrite = before.subsetOf(liveFiles())
        val kept = graft.sinks.DeltaSink.read(s, table).groupBy("event_type")
          .agg(count(lit(1)).as("n_rows"), fxSum(col("value")).as("sum_value"))
        val feed = graft.sinks.DeltaSink.readCdf(s, table, v0)
        val pre = feed.filter(col("_change_type") === "update_preimage")
          .groupBy("event_type")
          .agg(count(lit(1)).as("upd_rows"), fxSum(col("value")).as("pre_value"))
        val post = feed.filter(col("_change_type") === "update_postimage")
          .groupBy("event_type").agg(fxSum(col("value")).as("post_value"))
        kept.join(pre, Seq("event_type"), "full_outer")
          .join(post, Seq("event_type"), "full_outer")
          .select(col("event_type"), col("n_rows"), col("sum_value"),
            coalesce(col("upd_rows"), lit(0L)).as("upd_rows"),
            coalesce(col("pre_value"), lit(0.0)).as("pre_value"),
            coalesce(col("post_value"), lit(0.0)).as("post_value"),
            lit(noRewrite).as("no_rewrite"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  CAST(SUM(CAST(ROUND((CASE WHEN event_id % 10 = 0
             |    THEN value + 1000 ELSE value END) * 100) AS BIGINT)) AS DOUBLE)
             |    / 100.0 AS sum_value,
             |  CAST(COUNT(*) FILTER (WHERE event_id % 10 = 0) AS BIGINT) AS upd_rows,
             |  CAST(COALESCE(SUM(CAST(ROUND(value * 100) AS BIGINT))
             |    FILTER (WHERE event_id % 10 = 0), 0) AS DOUBLE) / 100.0 AS pre_value,
             |  CAST(COALESCE(SUM(CAST(ROUND((value + 1000) * 100) AS BIGINT))
             |    FILTER (WHERE event_id % 10 = 0), 0) AS DOUBLE) / 100.0 AS post_value,
             |  TRUE AS no_rewrite
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_delta_constraints",
      // CHECK CONSTRAINTS under the oracle (r14, Delta spec
      // §CheckConstraints): the declarative data-quality gate. The even
      // half bootstraps, `value >= 0` is added (validating the existing
      // rows — the ALTER TABLE contract), the odd half appends THROUGH
      // the constraint, and a junk batch carrying a negative value must
      // fail the write job with NOTHING committed — enforcement rides
      // the write plan itself (first column wrapped in
      // when(check) col else raise_error: zero extra pass over the
      // batch). Gates: `violator_rejected` (the bad batch threw),
      // `no_partial_commit` (metadata census identical across the
      // failure — atomicity), and the final census ≡ the full corpus.
      // At 100 TB the invariant is enforced at the only door data enters
      // — no nightly full-scan audit.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val table = graft.TempTables.create("graft-delta-constraints")
        graft.sinks.DeltaSink.write(ev.filter(col("event_id") % 2 === 0),
          table, overwrite = true)
        graft.sinks.DeltaSink.addCheckConstraint(s, table,
          "value_nonneg", "value >= 0")
        graft.sinks.DeltaSink.append(ev.filter(col("event_id") % 2 === 1), table)
        def metaCount() = graft.sinks.DeltaSink.fileStats(s, table)
          .agg(sum(col("num_records"))).head().getLong(0)
        val before = metaCount()
        val junk = ev.filter(col("event_id") % 500 === 0)
          .select((col("event_id") + lit(2000000000L)).as("event_id"),
            col("event_type"), (col("value") * lit(-1.0) - lit(1.0)).as("value"))
        val rejected =
          try { graft.sinks.DeltaSink.append(junk, table); false }
          catch { case _: Throwable => true }
        graft.sinks.DeltaSink.read(s, table).groupBy("event_type")
          .agg(count(lit(1)).as("n_rows"), fxSum(col("value")).as("sum_v"))
          .withColumn("violator_rejected", lit(rejected))
          .withColumn("no_partial_commit", lit(metaCount() == before))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
             |    AS sum_v,
             |  TRUE AS violator_rejected, TRUE AS no_partial_commit
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_lakehouse_maintain",
      // POLICY-DRIVEN MAINTENANCE under the oracle (r14, the operability
      // capstone): both formats accumulate realistic debt — five small
      // appends and a row-level delete each — and one Maintenance run
      // retires all of it on metadata-only triggers. Delta: the 20% DV
      // ratio crosses the purge threshold (REORG), the file count crosses
      // the bin-pack threshold (OPTIMIZE → exactly one file at this
      // volume), checkpoint + vacuum(0) sweep the tombstones and orphaned
      // sidecars. Iceberg: the manifest count crosses the rewrite
      // threshold (→ one data manifest), expiry retires unpinned history
      // to one snapshot. Gates pin each action's POST-STATE (`dv_free`,
      // `one_file`, `one_manifest`, `one_snapshot`) and both final
      // censuses must equal the oracle's complements — maintenance must
      // never move the data plane. Every trigger reads KBs of metadata;
      // every action costs only the debt it retires.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        def fifth(i: Int) = ev.filter(pmod(col("event_id"), lit(5)) === i)
        // The Delta and Iceberg chains touch DISJOINT tables and share
        // nothing until the final census join — run them as two overlapped
        // driver threads (guide §2.6: Spark's scheduler interleaves
        // concurrent jobs, so each format's commit/metadata gaps backfill
        // with the other's tasks). The nightly-janitor posture at scale is
        // the same: per-table maintenance jobs are independent and a
        // maintenance window overlaps them. Results are unchanged — each
        // chain is internally sequential.
        val deltaHalf = scala.concurrent.Future {
          val dt = graft.TempTables.create("graft-maintain-d")
          graft.sinks.DeltaSink.write(fifth(0), dt, overwrite = true)
          (1 to 4).foreach(i => graft.sinks.DeltaSink.append(fifth(i), dt))
          graft.sinks.DeltaSink.deleteWhereDV(s, dt, "event_id % 5 = 0")
          // the Report variant logs WHERE the composite's time goes (the
          // suite's most expensive query — VERDICT r15 item 6); stderr
          // only, the driver parses stdout
          val ((purged, compacted, vacuumed, _), dSteps) = graft.sinks.Maintenance
            .maintainDeltaReport(s, dt, maxSmallFiles = 3, dvPurgeRatio = 0.1,
              vacuumRetentionMs = 0L)
          System.err.println("[maintain] delta steps: " + dSteps.map(t =>
            s"${t.step}=${t.ms}ms${if (t.fired) "*" else ""}").mkString(", "))
          val dvFree = graft.sinks.DeltaSink.reorgPurge(s, dt) == ((0, 0L))
          val oneFile = graft.sinks.DeltaSink.fileStats(s, dt).count() == 1
          (dt, purged, compacted, vacuumed, dvFree, oneFile)
        }(scala.concurrent.ExecutionContext.global)
        val it = graft.TempTables.create("graft-maintain-i") + "/tbl"
        graft.sinks.IcebergSink.write(fifth(0), it,
          graft.sinks.IcebergSink.CreateExclusive)
        (1 to 4).foreach(i => graft.sinks.IcebergSink.write(fifth(i), it,
          graft.sinks.IcebergSink.Append))
        graft.sinks.IcebergSink.deleteWhere(s, it, "event_id % 7 = 0")
        val ((rewrote, _, _, _), iSteps) = graft.sinks.Maintenance
          .maintainIcebergReport(s, it, maxManifests = 2, keepLast = 1)
        System.err.println("[maintain] iceberg steps: " + iSteps.map(t =>
          s"${t.step}=${t.ms}ms${if (t.fired) "*" else ""}").mkString(", "))
        val oneManifest = graft.sinks.IcebergSink.metaTable(s, it, "manifests")
          .filter(col("content") === 0).count() == 1
        val oneSnapshot =
          graft.sinks.IcebergSink.metaTable(s, it, "snapshots").count() == 1
        val (dt, purged, compacted, vacuumed, dvFree, oneFile) =
          scala.concurrent.Await.result(deltaHalf,
            scala.concurrent.duration.Duration.Inf)
        val dCensus = graft.sinks.DeltaSink.read(s, dt).groupBy("event_type")
          .agg(count(lit(1)).as("n_delta"), fxSum(col("value")).as("v_delta"))
        val iCensus = graft.sinks.IcebergSink.read(s, it).groupBy("event_type")
          .agg(count(lit(1)).as("n_ice"))
        dCensus.join(iCensus, Seq("event_type"), "full_outer")
          .select(col("event_type"),
            coalesce(col("n_delta"), lit(0L)).as("n_delta"),
            coalesce(col("v_delta"), lit(0.0)).as("v_delta"),
            coalesce(col("n_ice"), lit(0L)).as("n_ice"))
          .withColumn("delta_maintained",
            lit(purged && compacted && vacuumed > 0 && dvFree && oneFile))
          .withColumn("iceberg_maintained",
            lit(rewrote && oneManifest && oneSnapshot))
          .orderBy("event_type")
      },
      Some("""SELECT event_type,
             |  CAST(COUNT(*) FILTER (WHERE event_id % 5 <> 0) AS BIGINT)
             |    AS n_delta,
             |  CAST(COALESCE(SUM(CAST(ROUND(value * 100) AS BIGINT))
             |    FILTER (WHERE event_id % 5 <> 0), 0) AS DOUBLE) / 100.0
             |    AS v_delta,
             |  CAST(COUNT(*) FILTER (WHERE event_id % 7 <> 0) AS BIGINT)
             |    AS n_ice,
             |  TRUE AS delta_maintained, TRUE AS iceberg_maintained
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_delta_history",
      // DESCRIBE HISTORY under the oracle (r14, the Delta twin of
      // q_iceberg_meta_tables): one metadata-only pass over the log tail
      // classifies every commit by its ACTION SHAPE — no data file is
      // opened. The query runs a deterministic operation script (create =
      // CREATE+APPEND commits, one plain append, one DV merge-on-read
      // delete, one OPTIMIZE compaction, one constraint METADATA commit,
      // one CoW REWRITE update) and the history census per operation must
      // match the script exactly — a misclassified or missing commit
      // shifts a count. The second half ties the log back to the data
      // plane: the final read census ≡ the oracle's recompute.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val table = graft.TempTables.create("graft-delta-history")
        graft.sinks.DeltaSink.write(ev.filter(col("event_id") % 2 === 0),
          table, overwrite = true)                           // CREATE + APPEND
        graft.sinks.DeltaSink.append(
          ev.filter(col("event_id") % 2 === 1), table)       // APPEND
        graft.sinks.DeltaSink.deleteWhereDV(s, table,
          "event_id % 100 = 0")                              // MERGE_ON_READ
        graft.sinks.DeltaSink.compact(s, table)              // OPTIMIZE
        graft.sinks.DeltaSink.addCheckConstraint(s, table,
          "value_ok", "value >= 0")                          // METADATA
        graft.sinks.DeltaSink.updateWhere(s, table,
          "event_id = 4", Map("value" -> "value"))           // REWRITE
        val ops = graft.sinks.DeltaSink.history(s, table)
          .groupBy("operation").agg(count(lit(1)).as("n_commits"))
        val census = graft.sinks.DeltaSink.read(s, table)
          .agg(count(lit(1)).as("value")).select(
            lit("rows_live").as("operation"), col("value").as("n_commits"))
        ops.unionByName(census).orderBy("operation")
      },
      Some("""SELECT 'APPEND' AS operation, CAST(2 AS BIGINT) AS n_commits
             |UNION ALL SELECT 'CREATE', 1
             |UNION ALL SELECT 'MERGE_ON_READ', 1
             |UNION ALL SELECT 'METADATA', 1
             |UNION ALL SELECT 'OPTIMIZE', 1
             |UNION ALL SELECT 'REWRITE', 1
             |UNION ALL SELECT 'rows_live',
             |  (SELECT CAST(COUNT(*) AS BIGINT) FROM events
             |   WHERE event_id % 100 <> 0)
             |ORDER BY operation""".stripMargin)),

    QueryDef(
      "q_time_travel_ts",
      // Time travel BY TIMESTAMP on BOTH formats (r14 — the audit
      // question is "what did the table serve at 09:00", not "at version
      // 17"): the even half lands in a Delta table AND an Iceberg table,
      // a boundary wall-clock instant is captured, the odd half appends
      // AFTER it, and each format resolves the boundary back — Delta by
      // commit-file mtime (the spec's pre-in-commit-timestamps rule),
      // Iceberg by snapshot timestamp-ms restricted to MAIN ancestry
      // (unpublished staging is never "the table at 09:00"). Both
      // as-of-timestamp censuses must equal the oracle's even half while
      // the current reads serve the corpus — a boundary resolved to the
      // wrong side doubles or halves every group.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val dTable = graft.TempTables.create("graft-tts-delta")
        val iTable = graft.TempTables.create("graft-tts-ice") + "/tbl"
        val even = ev.filter(col("event_id") % 2 === 0)
        graft.sinks.DeltaSink.write(even, dTable, overwrite = true)
        graft.sinks.IcebergSink.write(even, iTable,
          graft.sinks.IcebergSink.CreateExclusive)
        Thread.sleep(20)
        val boundary = System.currentTimeMillis()
        Thread.sleep(20)
        graft.sinks.DeltaSink.append(ev.filter(col("event_id") % 2 === 1), dTable)
        graft.sinks.IcebergSink.write(ev.filter(col("event_id") % 2 === 1),
          iTable, graft.sinks.IcebergSink.Append)
        val dPre = graft.sinks.DeltaSink.readAsOfTimestamp(s, dTable, boundary)
          .groupBy("event_type").agg(count(lit(1)).as("n_pre_delta"))
        val iPre = graft.sinks.IcebergSink.readAsOfTimestamp(s, iTable, boundary)
          .groupBy("event_type").agg(count(lit(1)).as("n_pre_ice"))
        graft.sinks.DeltaSink.read(s, dTable).groupBy("event_type")
          .agg(count(lit(1)).as("n_now"), fxSum(col("value")).as("sum_v"))
          .join(dPre, Seq("event_type"), "full_outer")
          .join(iPre, Seq("event_type"), "full_outer")
          .select(col("event_type"), col("n_now"), col("sum_v"),
            coalesce(col("n_pre_delta"), lit(0L)).as("n_pre_delta"),
            coalesce(col("n_pre_ice"), lit(0L)).as("n_pre_ice"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_now,
             |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
             |    AS sum_v,
             |  CAST(COUNT(*) FILTER (WHERE event_id % 2 = 0) AS BIGINT)
             |    AS n_pre_delta,
             |  CAST(COUNT(*) FILTER (WHERE event_id % 2 = 0) AS BIGINT)
             |    AS n_pre_ice
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_delta_ict",
      // IN-COMMIT TIMESTAMPS under the oracle (r15, Delta spec
      // §in-commit-timestamps — the durable commit clock): the even half
      // lands, ICT is enabled, a boundary instant is captured, the odd
      // half appends after it — and then the rsync disaster is simulated:
      // EVERY commit-file mtime is rewritten a day into the future, which
      // destroys the pre-ICT resolution clock entirely. The
      // as-of-boundary census must STILL equal the even half, because
      // from the enablement commit on the clock lives in the committed
      // bytes (a monotonic commitInfo stamped by the commit choke point),
      // not in filesystem metadata a copy can mangle. A reader on the
      // mtime rule would resolve nothing or the wrong side and halve or
      // double every group. At 100 TB this is what makes "the table at
      // 09:00" survive log migration between buckets.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val table = graft.TempTables.create("graft-ict")
        graft.sinks.DeltaSink.write(ev.filter(col("event_id") % 2 === 0),
          table, overwrite = true)
        graft.sinks.DeltaSink.enableInCommitTimestamps(s, table)
        Thread.sleep(15)
        val boundary = System.currentTimeMillis()
        Thread.sleep(15)
        graft.sinks.DeltaSink.append(ev.filter(col("event_id") % 2 === 1), table)
        new java.io.File(table, "_delta_log").listFiles()
          .filter(_.getName.endsWith(".json"))
          .foreach(_.setLastModified(System.currentTimeMillis() + 86400000L))
        val pre = graft.sinks.DeltaSink.readAsOfTimestamp(s, table, boundary)
          .groupBy("event_type").agg(count(lit(1)).as("n_pre"))
        graft.sinks.DeltaSink.read(s, table).groupBy("event_type")
          .agg(count(lit(1)).as("n_now"), fxSum(col("value")).as("sum_v"))
          .join(pre, Seq("event_type"), "full_outer")
          .select(col("event_type"), col("n_now"), col("sum_v"),
            coalesce(col("n_pre"), lit(0L)).as("n_pre"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_now,
             |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
             |    AS sum_v,
             |  CAST(COUNT(*) FILTER (WHERE event_id % 2 = 0) AS BIGINT)
             |    AS n_pre
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_variant_shred",
      // VARIANT / SEMI-STRUCTURED column (r18 stretch — Delta 4.0
      // VariantType / Iceberg V3 variant, the modern-format frontier):
      // events.props parses ONCE into Spark's binary VariantType
      // (parse_json — the open encoding both specs adopted), written
      // through the Delta sink, which stamps the `variantType`
      // reader+writer table feature so feature-unaware engines refuse
      // rather than misread. SHREDDING: the declared path $.k extracts at
      // write time into a typed sibling column whose per-file footer
      // [min,max] ride the log's add stats — the shredded-stats half of
      // the spec's variant story — and the write range-partitions on it
      // so the stats are tight. The read proves both halves: a range
      // slice over the SHREDDED stats opens strictly fewer files than
      // the table holds (`files_skipped` — pruning decided from the log,
      // no variant decoded), while the VALUES come back from the VARIANT
      // column itself (variant_get, evaluated file-local with no
      // shuffle), gated row-for-row against the shredded column
      // (`shred_parity`). At 100 TB: semi-structured payloads keep
      // schema-on-read flexibility, yet hot extraction paths scan like
      // typed columns and skip like partitions.
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("event_id"), col("event_type"), col("props"))
          .withColumn("pv", parse_json(col("props")))
          .withColumn("k_shred",
            variant_get(col("pv"), "$.k", "long"))
        val table = graft.TempTables.create("graft-variant")
        graft.sinks.DeltaSink.write(
          ev.repartitionByRange(8, col("k_shred")), table)
        val full = graft.sinks.DeltaSink.read(s, table)
        val slice = graft.sinks.DeltaSink.readRange(s, table,
          "k_shred", "10", "39")
        val skipped = slice.inputFiles.length < full.inputFiles.length
        val parity = full.filter(
          !(variant_get(col("pv"), "$.k", "long") <=> col("k_shred"))).isEmpty
        slice
          .filter(col("k_shred") >= 10 && col("k_shred") <= 39)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum(variant_get(col("pv"), "$.k", "long")).as("k_total"))
          .withColumn("files_skipped", lit(skipped))
          .withColumn("shred_parity", lit(parity))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
             |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total,
             |  TRUE AS files_skipped, TRUE AS shred_parity
             |FROM events
             |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) BETWEEN 10 AND 39
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_iceberg_variant",
      // q_variant_shred's ICEBERG twin (V3 spec §Variant — the same
      // binary encoding both formats adopted): the variant column maps to
      // the Iceberg `variant` type string, the table claims
      // format-version 3 from creation (pre-v3 readers refuse the
      // unknown type rather than misread it), and the shredded sibling's
      // MANIFEST bounds — the stats plane Iceberg already carries per
      // data file — drive `IcebergSink.readRange` file skipping. Same
      // two gates as the Delta side: `files_skipped` (the range slice
      // plans strictly fewer files than the snapshot holds, decided from
      // manifests alone) and `shred_parity` (variant_get ≡ the shredded
      // column row-for-row; values come from the variant binary itself).
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("event_id"), col("event_type"), col("props"))
          .withColumn("pv", parse_json(col("props")))
          .withColumn("k_shred",
            variant_get(col("pv"), "$.k", "long"))
        val tbl = graft.TempTables.create("graft-ib-variant") + "/tbl"
        graft.sinks.IcebergSink.write(
          ev.repartitionByRange(8, col("k_shred")), tbl,
          graft.sinks.IcebergSink.CreateExclusive)
        val full = graft.sinks.IcebergSink.read(s, tbl)
        val (_, keptFiles, totalFiles) = graft.sinks.IcebergSink
          .planRangeFiles(s, tbl, "k_shred", 10.0, 39.0)
        val skipped = keptFiles.size < totalFiles
        val parity = full.filter(
          !(variant_get(col("pv"), "$.k", "long") <=> col("k_shred"))).isEmpty
        graft.sinks.IcebergSink.readRange(s, tbl, "k_shred", 10.0, 39.0)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum(variant_get(col("pv"), "$.k", "long")).as("k_total"))
          .withColumn("files_skipped", lit(skipped))
          .withColumn("shred_parity", lit(parity))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
             |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total,
             |  TRUE AS files_skipped, TRUE AS shred_parity
             |FROM events
             |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) BETWEEN 10 AND 39
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_delta_generated",
      // GENERATED COLUMNS under the oracle (r14, Delta spec §Generated
      // Columns — Delta's answer to Iceberg's hidden partitioning,
      // q_iceberg_hidden_day's format twin): the table is created with a
      // generated `event_date = CAST(ts AS DATE)` column and partitioned
      // by it; the odd half then appends WITHOUT the column — the writer
      // computes it from the stamped expression — and a junk batch
      // carrying a WRONG explicit value fails in-plan before anything
      // commits. The one-week read filters on the partition column that
      // no writer ever hand-maintained. Gates: `violator_rejected`,
      // `no_partial_commit`, per-day census ≡ the raw oracle.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "ts", "event_type", "value")
        val table = graft.TempTables.create("graft-delta-gen")
        graft.sinks.DeltaSink.writeGenerated(ev.filter(col("event_id") % 2 === 0),
          table, generated = Map("event_date" -> "CAST(ts AS DATE)"),
          partitionBy = Seq("event_date"))
        graft.sinks.DeltaSink.append(ev.filter(col("event_id") % 2 === 1), table)
        def metaCount() = graft.sinks.DeltaSink.fileStats(s, table)
          .agg(sum(col("num_records"))).head().getLong(0)
        val before = metaCount()
        val junk = ev.filter(col("event_id") % 500 === 0)
          .select((col("event_id") + lit(3000000000L)).as("event_id"),
            col("ts"), col("event_type"), col("value"))
          .withColumn("event_date", lit(java.sql.Date.valueOf("1999-01-01")))
        val rejected =
          try { graft.sinks.DeltaSink.append(junk, table); false }
          catch { case _: Throwable => true }
        graft.sinks.DeltaSink.read(s, table)
          .filter(col("event_date") >= lit(java.sql.Date.valueOf("2024-01-08")) &&
            col("event_date") < lit(java.sql.Date.valueOf("2024-01-15")))
          .groupBy(col("event_date").as("day"))
          .agg(count(lit(1)).as("n_events"), fxSum(col("value")).as("total_value"))
          .withColumn("violator_rejected", lit(rejected))
          .withColumn("no_partial_commit", lit(metaCount() == before))
          .orderBy("day")
      },
      Some("""SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n_events,
             |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
             |    AS total_value,
             |  TRUE AS violator_rejected, TRUE AS no_partial_commit
             |FROM events
             |WHERE CAST(ts AS DATE) >= DATE '2024-01-08'
             |  AND CAST(ts AS DATE) < DATE '2024-01-15'
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef(
      "q_delta_reorg",
      // REORG … APPLY (PURGE) under the oracle (r14): materializes
      // deletion vectors back into clean parquet. events land partitioned
      // by event_type, a DV delete masks the click partition's fifth
      // (sidecar-only — no file rewritten), then reorgPurge rewrites ONLY
      // the DV-carrying click files as their survivors and drops the DVs.
      // Gates: `clean_untouched` pins every non-click file's path
      // surviving the purge verbatim (the 100 TB contract — purge cost ∝
      // touched files, never the table), `dv_free` pins a second purge as
      // a (0,0) no-op (no descriptor left anywhere), `purged_rows` pins
      // the materialized count against the oracle's own census, and the
      // final read must equal the complement — all through the same
      // layout-only commit (dataChange:false) a CDF reader ignores.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val table = graft.TempTables.create("graft-delta-reorg") + "/tbl"
        graft.sinks.DeltaSink.write(ev, table, partitionBy = Seq("event_type"))
        graft.sinks.DeltaSink.deleteWhereDV(s, table,
          "event_type = 'click' AND event_id % 5 = 0")
        def otherPaths() = graft.sinks.DeltaSink.fileStats(s, table)
          .select("path").collect().map(_.getString(0))
          .filterNot(_.startsWith("event_type=click/")).toSet
        val preOther = otherPaths()
        val (nRewritten, purged) = graft.sinks.DeltaSink.reorgPurge(s, table)
        val cleanUntouched = nRewritten > 0 && otherPaths() == preOther
        val dvFree = graft.sinks.DeltaSink.reorgPurge(s, table) == ((0, 0L))
        graft.sinks.DeltaSink.read(s, table).groupBy("event_type")
          .agg(count(lit(1)).as("n_rows"), fxSum(col("value")).as("sum_v"))
          .withColumn("purged_rows", lit(purged))
          .withColumn("clean_untouched", lit(cleanUntouched))
          .withColumn("dv_free", lit(dvFree))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
             |    AS sum_v,
             |  (SELECT CAST(COUNT(*) AS BIGINT) FROM events
             |    WHERE event_type = 'click' AND event_id % 5 = 0) AS purged_rows,
             |  TRUE AS clean_untouched, TRUE AS dv_free
             |FROM events WHERE NOT (event_type = 'click' AND event_id % 5 = 0)
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_delta_colmap",
      // COLUMN MAPPING evolution under the oracle (r13) — the Delta twin
      // of q_iceberg_evolve2's rename/drop half: the even half bootstraps
      // (…, value, note); `renameColumn` turns value into amount
      // (METADATA-ONLY — first use stamps every field with physicalName =
      // its then-current name and bumps the protocol to reader 2/writer 5
      // in the same commit; no data file touched at any table size); the
      // odd half appends under the NEW logical name (its files carry the
      // PHYSICAL name); `dropColumn` retires note (the physical column
      // stays in old files, unread). The census only matches if
      // physical→logical projection works across files written before AND
      // after the rename — a name-based read would NULL half the rows and
      // shift every sum. `no_rewrite` pins the bootstrap files intact;
      // `schema_evolved` pins the final column set.
      (s, dir) => {
        val ev = t(s, dir, "events").select(col("event_id"), col("event_type"),
          col("value"),
          concat(lit("n"), pmod(col("event_id"), lit(7))).as("note"))
        val table = graft.TempTables.create("graft-delta-colmap")
        graft.sinks.DeltaSink.write(ev.filter(col("event_id") % 2 === 0),
          table, overwrite = true)
        def files() = new java.io.File(table).listFiles()
          .filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.lastModified, f.length)).toSet
        val before = files()
        graft.sinks.DeltaSink.renameColumn(s, table, "value", "amount")
        graft.sinks.DeltaSink.append(
          ev.filter(col("event_id") % 2 === 1)
            .withColumnRenamed("value", "amount"), table)
        graft.sinks.DeltaSink.dropColumn(s, table, "note")
        val out = graft.sinks.DeltaSink.read(s, table)
        val evolvedOk = out.columns.toSeq ==
          Seq("event_id", "event_type", "amount") && before.subsetOf(files())
        out.groupBy("event_type")
          .agg(count(lit(1)).as("n_rows"),
            fxSum(col("amount")).as("sum_amount"),
            count(when(col("event_id") % 2 === 1, 1)).as("n_renamed_files"))
          .select(col("event_type"), col("n_rows"), col("sum_amount"),
            col("n_renamed_files"), lit(evolvedOk).as("schema_evolved"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
             |    AS sum_amount,
             |  CAST(COUNT(*) FILTER (WHERE event_id % 2 = 1) AS BIGINT)
             |    AS n_renamed_files,
             |  TRUE AS schema_evolved
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_delta_cdf_merge",
      // CDF ROW-LEVEL CLASSIFICATION of a MERGE — the feed surface a
      // downstream consumer needs to apply someone else's upsert: the
      // same deterministic CDC batch as q_delta_merge (updates %11,
      // deletes %13, inserts %17 re-keyed negative) merges into the
      // event table, and readCdf over the merge window must decompose the
      // commit into update_preimage / update_postimage / delete / insert
      // rows with the right VALUES on each side (pre images carry the old
      // value, post images the +1000 one). The images are computed and
      // written AT MERGE TIME as cdc files in the same commit (two
      // delta-sized joins over the already-planned touched files) — the
      // feed never re-diffs the rewrite, so its cost scales with the
      // merge's delta, never the table. The oracle recomputes all four
      // classes relationally; `one_commit` pins that every change row
      // carries the single merge commit's version.
      (s, dir) => {
        val base = t(s, dir, "events")
          .select("event_id", "user_id", "event_type", "value")
        val table = graft.TempTables.create("graft-cdf-merge")
        graft.sinks.DeltaSink.write(base, table, overwrite = true)
        val v0 = graft.sinks.DeltaSink.latestVersion(table)
        val updates = base
          .filter(col("event_id") % 11 === 0 && col("event_id") % 13 =!= 0)
          .withColumn("value", col("value") + 1000)
          .withColumn("_del", lit(false))
        val deletes = base.filter(col("event_id") % 13 === 0)
          .withColumn("_del", lit(true))
        val inserts = base.filter(col("event_id") % 17 === 0)
          .withColumn("event_id", -col("event_id") - 1)
          .withColumn("_del", lit(false))
        graft.sinks.DeltaSink.merge(s, table,
          updates.unionByName(deletes).unionByName(inserts),
          keys = Seq("event_id"), deleteCol = Some("_del"))
        graft.sinks.DeltaSink.readCdf(s, table, v0)
          .groupBy(col("_change_type").as("change_type"))
          .agg(count(lit(1)).as("n_rows"), fxSum(col("value")).as("sum_value"),
            (countDistinct(col("_commit_version")) === 1).as("one_commit"))
          .orderBy("change_type")
      },
      Some("""WITH feed AS (
             |  SELECT 'update_preimage' AS change_type, value
             |  FROM events WHERE event_id % 11 = 0 AND event_id % 13 <> 0
             |  UNION ALL
             |  SELECT 'update_postimage', value + 1000
             |  FROM events WHERE event_id % 11 = 0 AND event_id % 13 <> 0
             |  UNION ALL
             |  SELECT 'delete', value FROM events WHERE event_id % 13 = 0
             |  UNION ALL
             |  SELECT 'insert', value FROM events WHERE event_id % 17 = 0)
             |SELECT change_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value,
             |  TRUE AS one_commit
             |FROM feed GROUP BY change_type ORDER BY change_type""".stripMargin)),

    QueryDef(
      "q_iceberg_incremental",
      // Iceberg INCREMENTAL APPEND SCAN under the oracle — the manifest-
      // plane twin of q_delta_cdf: three snapshots commit (event_id%3
      // split); the feed since s0 must be exactly batches 1+2 and the
      // feed since s1 exactly batch 2. The delta is planned as a
      // path-keyed set diff of manifest entries (appends carry prior
      // manifests forward, so current-minus-pinned is the added file
      // set) — metadata-scale planning, scan cost proportional to the
      // appended files, never the table. A file double-counted by the
      // carried-forward manifests or lost by the diff would shift every
      // count/sum against the oracle's %3 recompute.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val table = graft.TempTables.create("graft-iceberg-inc") + "/tbl"
        def batch(i: Int) = ev.filter(pmod(col("event_id"), lit(3)) === i)
        graft.sinks.IcebergSink.write(batch(0), table,
          graft.sinks.IcebergSink.CreateExclusive, partitionBy = Seq("event_type"))
        val s0 = graft.sinks.IcebergSink.snapshots(table).last._1
        graft.sinks.IcebergSink.write(batch(1), table,
          graft.sinks.IcebergSink.Append, partitionBy = Seq("event_type"))
        val s1 = graft.sinks.IcebergSink.snapshots(table).last._1
        graft.sinks.IcebergSink.write(batch(2), table,
          graft.sinks.IcebergSink.Append, partitionBy = Seq("event_type"))
        def agg(df: org.apache.spark.sql.DataFrame, n: String, v: String) = df
          .groupBy("event_type")
          .agg(count(lit(1)).as(n), fxSum(col("value")).as(v))
        agg(graft.sinks.IcebergSink.readAppendedSince(s, table, s0),
            "since0_rows", "since0_value")
          .join(agg(graft.sinks.IcebergSink.readAppendedSince(s, table, s1),
            "since1_rows", "since1_value"), Seq("event_type"), "full_outer")
          .select(col("event_type"),
            coalesce(col("since0_rows"), lit(0L)).as("since0_rows"),
            coalesce(col("since0_value"), lit(0.0)).as("since0_value"),
            coalesce(col("since1_rows"), lit(0L)).as("since1_rows"),
            coalesce(col("since1_value"), lit(0.0)).as("since1_value"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type,
             |  CAST(COUNT(*) FILTER (WHERE event_id % 3 <> 0) AS BIGINT) AS since0_rows,
             |  CAST(COALESCE(SUM(CAST(ROUND(value * 100) AS BIGINT))
             |    FILTER (WHERE event_id % 3 <> 0), 0) AS DOUBLE) / 100.0 AS since0_value,
             |  CAST(COUNT(*) FILTER (WHERE event_id % 3 = 2) AS BIGINT) AS since1_rows,
             |  CAST(COALESCE(SUM(CAST(ROUND(value * 100) AS BIGINT))
             |    FILTER (WHERE event_id % 3 = 2), 0) AS DOUBLE) / 100.0 AS since1_value
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_iceberg_time_travel",
      // Iceberg SNAPSHOT time travel (the Delta twin is q_time_travel):
      // every snapshot in the table metadata keeps its own manifest list,
      // so reading an older one is resolving that list instead of the
      // current ref — same file-level pruning, same scan parallelism, so
      // a historical read of a petabyte table costs what a current read
      // costs. The first snapshot id is discovered through the public
      // snapshots() surface (not remembered from the write), the way a
      // catalog browser or audit job would find it; the oracle recomputes
      // both snapshots from the raw events by the even/odd batch split.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val table = graft.TempTables.create("graft-iceberg-tt") + "/tbl"
        graft.sinks.IcebergSink.write(
          ev.filter(col("event_id") % 2 === 0), table,
          graft.sinks.IcebergSink.CreateExclusive,
          partitionBy = Seq("event_type"))
        graft.sinks.IcebergSink.write(
          ev.filter(col("event_id") % 2 === 1), table,
          graft.sinks.IcebergSink.Append,
          partitionBy = Seq("event_type"))
        val s0 = graft.sinks.IcebergSink.snapshots(table).head._1
        def snap(df: org.apache.spark.sql.DataFrame, label: String) = df
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"), fxSum(col("value")).as("total_value"))
          .withColumn("snapshot", lit(label))
        snap(graft.sinks.IcebergSink.read(s, table, Some(s0)), "s0")
          .unionByName(snap(graft.sinks.IcebergSink.read(s, table), "latest"))
          .select("snapshot", "event_type", "n_events", "total_value")
          .orderBy("snapshot", "event_type")
      },
      Some("""SELECT 'latest' AS snapshot, event_type,
             |  CAST(COUNT(*) AS BIGINT) AS n_events,
             |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
             |FROM events GROUP BY event_type
             |UNION ALL
             |SELECT 's0' AS snapshot, event_type,
             |  CAST(COUNT(*) AS BIGINT) AS n_events,
             |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
             |FROM events WHERE event_id % 2 = 0 GROUP BY event_type
             |ORDER BY snapshot, event_type""".stripMargin)),

    QueryDef(
      "q_iceberg_stats_count",
      // The Iceberg twin of q_delta_stats_count: per-partition COUNT(*)
      // answered from the manifest tree's record_count fields
      // (IcebergSink.fileStats) without opening a data file — and across
      // a create + append (two snapshots, manifests merged into a new
      // manifest list), so the gate also proves the merged metadata tree
      // double-counts nothing. Oracle: direct census;
      // `meta_count_match` pins manifest stats ≡ data exactly.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val table = graft.TempTables.create("graft-iceberg-stats") + "/tbl"
        graft.sinks.IcebergSink.write(
          ev.filter(col("event_id") % 2 === 0), table,
          graft.sinks.IcebergSink.CreateExclusive,
          partitionBy = Seq("event_type"))
        graft.sinks.IcebergSink.write(
          ev.filter(col("event_id") % 2 === 1), table,
          graft.sinks.IcebergSink.Append,
          partitionBy = Seq("event_type"))
        val meta = graft.sinks.IcebergSink.fileStats(s, table)
          .groupBy(element_at(col("partitionValues"), "event_type")
            .as("event_type"))
          .agg(sum(col("num_records")).as("n_meta"))
        t(s, dir, "events").groupBy("event_type")
          .agg(count(lit(1)).as("n_rows"))
          .join(meta, Seq("event_type"), "full_outer")
          .select(col("event_type"), col("n_rows"),
            (col("n_meta") <=> col("n_rows")).as("meta_count_match"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  TRUE AS meta_count_match
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_join_dpp",
      // DYNAMIC partition pruning over the hand-rolled Delta layout: the
      // fact side is the Hive-partitioned table, the dim side is a
      // filter whose surviving keys exist only at RUNTIME (types whose
      // total cents exceed a threshold — not a literal the planner could
      // fold), and Catalyst injects
      // `dynamicpruningexpression(event_type IN dynamicpruning#N)` into
      // the fact scan's PartitionFilters: the broadcast result prunes
      // fact DIRECTORIES before they are read (PlanSpec pins the
      // expression). At 100 TB this is the difference between scanning
      // every partition and scanning the two that can match — for a
      // predicate no one could have written statically. Oracle: the same
      // join over raw events.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val table = graft.TempTables.create("graft-dpp")
        graft.sinks.DeltaSink.write(ev.repartition(col("event_type")),
          table, overwrite = true, partitionBy = Seq("event_type"))
        val fact = graft.sinks.DeltaSink.read(s, table)
        val dim = t(s, dir, "events")
          .groupBy(col("event_type").as("tp"))
          .agg(sum(cents(col("value"))).as("tot"))
          .filter(col("tot") > 10000000L)
        fact.join(broadcast(dim), col("event_type") === col("tp"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_rows"), fxSum(col("value")).as("total_value"))
          .orderBy("event_type")
      },
      Some("""WITH d AS (
             |  SELECT event_type, SUM(CAST(ROUND(value*100) AS BIGINT)) AS tot
             |  FROM events GROUP BY 1 HAVING tot > 10000000)
             |SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS DOUBLE) / 100.0
             |    AS total_value
             |FROM events e JOIN d ON e.event_type = d.event_type
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef(
      "q_vacuum_audit",
      // The tombstone RECLAMATION half of the small-files lifecycle
      // (q_delta_compact stops at OPTIMIZE): create + append + compact
      // leaves the pre-compact files on disk as tombstones (time travel
      // still needs them), then VACUUM at retention 0 sweeps exactly the
      // non-live set. Gates: `tombstones_reclaimed` (vacuum removed ≥ 2
      // files — the create's and the append's), `disk_equals_live` (the
      // parquet files on disk after vacuum are EXACTLY the log's live
      // set — nothing leaked, nothing over-deleted; counted against
      // fileStats), and `census_match` (the data plane is untouched).
      // The audit a storage bill depends on at 100 TB: tombstones are
      // paid-for bytes serving no reader once the retention window
      // passes.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val table = graft.TempTables.create("graft-vacuum")
        graft.sinks.DeltaSink.write(ev.filter(col("event_id") % 2 === 0),
          table, overwrite = true)
        graft.sinks.DeltaSink.append(ev.filter(col("event_id") % 2 === 1), table)
        graft.sinks.DeltaSink.compact(s, table)
        def diskParquet(): Long = {
          def walk(f: java.io.File): Long =
            if (f.isDirectory)
              (if (f.getName == "_delta_log") 0L
               else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L))
            else if (f.getName.endsWith(".parquet")) 1L else 0L
          walk(new java.io.File(table))
        }
        val removed = graft.sinks.DeltaSink.vacuum(s, table, retentionMs = 0L)
        val postDisk = diskParquet()
        val gate = graft.sinks.DeltaSink.fileStats(s, table)
          .agg(count(lit(1)).as("n_live"))
          .select(
            lit(removed >= 2).as("tombstones_reclaimed"),
            (col("n_live") === postDisk).as("disk_equals_live"))
        graft.sinks.DeltaSink.read(s, table)
          .groupBy("event_type").agg(count(lit(1)).as("n_back"))
          .join(t(s, dir, "events").groupBy("event_type")
            .agg(count(lit(1)).as("n_rows")), Seq("event_type"), "full_outer")
          .crossJoin(broadcast(gate))
          .select(col("event_type"), col("n_rows"),
            col("tombstones_reclaimed"), col("disk_equals_live"),
            (col("n_back") <=> col("n_rows")).as("census_match"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  TRUE AS tombstones_reclaimed, TRUE AS disk_equals_live,
             |  TRUE AS census_match
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_iceberg_delete",
      // V2 ROW-LEVEL DELETES (merge-on-read) under the oracle — the first
      // thing a real Iceberg user does after an append. The corpus
      // bootstraps the table, deleteWhere writes POSITIONAL delete files
      // (parquet of (file_path, pos), sorted, committed as a content=1
      // deletes manifest at the next sequence number) for every event_id
      // divisible by 10, and the census of the merged read must equal the
      // oracle's `WHERE event_id % 10 <> 0` recompute — the delete cost a
      // predicate scan plus a write proportional to the MATCHED tenth,
      // never a table rewrite, and readers apply it as a (file, pos)
      // anti-join against the position set (broadcast: deletes ≪ data).
      // Gates: `bad_travels` (the pre-delete snapshot still reads all
      // rows — snapshot isolation, history intact), `redelete_noop` (the
      // same predicate re-run matches NOTHING because positions are
      // evaluated against the merged view — no delete-file growth on
      // retries, the exactly-once shape an orchestrated pipeline needs).
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val table = graft.TempTables.create("graft-iceberg-del") + "/tbl"
        graft.sinks.IcebergSink.write(ev, table,
          graft.sinks.IcebergSink.CreateExclusive, partitionBy = Seq("event_type"))
        val s0 = graft.sinks.IcebergSink.snapshots(table).last._1
        graft.sinks.IcebergSink.deleteWhere(s, table, "event_id % 10 = 0")
        val again = graft.sinks.IcebergSink.deleteWhere(s, table, "event_id % 10 = 0")
        val bad = graft.sinks.IcebergSink.read(s, table, Some(s0))
          .groupBy("event_type").agg(count(lit(1)).as("n_pre"))
        val direct = t(s, dir, "events").groupBy("event_type")
          .agg(count(lit(1)).as("n_all"))
        graft.sinks.IcebergSink.read(s, table)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_kept"), fxSum(col("value")).as("sum_value"))
          .join(direct, Seq("event_type"), "full_outer")
          .join(bad, Seq("event_type"), "full_outer")
          .select(col("event_type"),
            coalesce(col("n_kept"), lit(0L)).as("n_rows"),
            coalesce(col("sum_value"), lit(0.0)).as("sum_value"),
            (col("n_pre") <=> col("n_all")).as("bad_travels"),
            lit(again == 0L).as("redelete_noop"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type,
             |  CAST(COUNT(*) FILTER (WHERE event_id % 10 <> 0) AS BIGINT) AS n_rows,
             |  CAST(COALESCE(SUM(CAST(ROUND(value * 100) AS BIGINT))
             |    FILTER (WHERE event_id % 10 <> 0), 0) AS DOUBLE) / 100.0 AS sum_value,
             |  TRUE AS bad_travels, TRUE AS redelete_noop
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_iceberg_upsert",
      // KEYED UPSERT via V2 EQUALITY DELETES (r12) — Iceberg's
      // merge-on-read answer to q_delta_merge's copy-on-write: one atomic
      // snapshot lands the source rows as new data files PLUS an equality
      // delete file of the source keys at the same sequence number;
      // equality deletes apply strictly below their own sequence, so the
      // old row of every upserted key dies and its replacement survives —
      // and NO existing file is read or rewritten (cost ∝ the batch, the
      // shape a CDC stream needs at 100 TB; readers pay a broadcast
      // anti-join until OPTIMIZE materializes). Two upserts LAYER — the
      // second one's delete kills the first one's row for overlapping
      // keys (%22 ⊂ %11) — and the census of the final merged read must
      // equal the oracle's three-way CASE recompute: a resurrected old
      // row, a lost replacement, or a mis-scoped delete each shift it.
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select("event_id", "event_type", "value")
        val table = graft.TempTables.create("graft-iceberg-upsert") + "/tbl"
        graft.sinks.IcebergSink.write(ev, table,
          graft.sinks.IcebergSink.CreateExclusive)
        val up1 = ev.filter(col("event_id") % 11 === 0)
          .withColumn("value", col("value") + 1000)
          .unionByName(ev.filter(col("event_id") % 17 === 0)
            .withColumn("event_id", -col("event_id") - 1))
        graft.sinks.IcebergSink.upsert(s, table, up1, Seq("event_id"))
        val up2 = ev.filter(col("event_id") % 22 === 0)
          .withColumn("value", col("value") + 2000)
        graft.sinks.IcebergSink.upsert(s, table, up2, Seq("event_id"))
        graft.sinks.IcebergSink.read(s, table)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_rows"),
            countDistinct(col("event_id")).as("n_keys"),
            fxSum(col("value")).as("sum_value"))
          .orderBy("event_type")
      },
      Some("""WITH final AS (
             |  SELECT event_id, event_type,
             |    CASE WHEN event_id % 22 = 0 THEN value + 2000
             |         WHEN event_id % 11 = 0 THEN value + 1000
             |         ELSE value END AS value
             |  FROM events
             |  UNION ALL
             |  SELECT -event_id - 1, event_type, value
             |  FROM events WHERE event_id % 17 = 0)
             |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_keys,
             |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
             |    AS sum_value
             |FROM final GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_stream_iceberg_upsert",
      // Exactly-once streaming CDC UPSERT into Iceberg (r12) — the
      // merge-on-read twin of q_stream_iceberg's append-only ingest: the
      // full corpus bootstraps the table; a Delta source lands two
      // commits of keyed UPDATES (%10=0 → +1000, %10=5 → +2000) that a
      // tailing stream applies per micro-batch as ONE atomic
      // equality-delete upsert snapshot stamped with (appId, batchId) —
      // no existing file rewritten per batch, the Flink-CDC shape. After
      // the drain, batch 0 deliberately REPLAYS with poisoned values
      // (+9999) and must no-op against the summary watermark
      // (replay_noop; a failed no-op shifts sum_v too). The census pins
      // newer-wins: every %10 key carries its updated value exactly once.
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val src = graft.TempTables.create("graft-siceu-src")
        val dst = graft.TempTables.create("graft-siceu-dst") + "/tbl"
        val ckpt = graft.TempTables.create("graft-siceu-ckpt")
        graft.sinks.IcebergSink.write(ev, dst,
          graft.sinks.IcebergSink.CreateExclusive)
        graft.sinks.DeltaSink.write(
          ev.filter(pmod(col("event_id"), lit(10)) === 0)
            .withColumn("value", col("value") + 1000), src, overwrite = true)
        graft.sinks.DeltaSink.append(
          ev.filter(pmod(col("event_id"), lit(10)) === 5)
            .withColumn("value", col("value") + 2000), src)
        val appId = "q-stream-iceberg-upsert"
        val q = graft.streaming.StreamOps.streamUpsertToIceberg(
          s.readStream.format("graft-delta-tail").option("path", src).load(),
          dst, appId, keys = Seq("event_id"), orderCols = Seq("value"),
          checkpoint = Some(ckpt))
        // drain the tail source's committed versions, then stop once idle
        q.processAllAvailable()
        q.stop()
        val replayed = graft.sinks.IcebergSink.upsertExactlyOnce(
          ev.filter(pmod(col("event_id"), lit(10)) === 0)
            .withColumn("value", col("value") + 9999),
          dst, appId, 0L, Seq("event_id"))
        graft.sinks.IcebergSink.read(s, dst)
          .groupBy("event_type")
          .agg(count(lit(1)).as("cnt"),
            countDistinct(col("event_id")).as("n_ids"),
            fxSum(col("value")).as("sum_v"))
          .withColumn("replay_noop", lit(replayed == -1L))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, COUNT(*) AS cnt,
             |COUNT(DISTINCT event_id) AS n_ids,
             |CAST(SUM(CAST(ROUND((CASE
             |  WHEN event_id % 10 = 0 THEN value + 1000
             |  WHEN event_id % 10 = 5 THEN value + 2000
             |  ELSE value END) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_v,
             |TRUE AS replay_noop
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_iceberg_changelog",
      // The CHANGELOG feed — Iceberg's answer to q_delta_cdf_merge: after
      // an upsert (updates %11 + re-keyed inserts %17) and a positional
      // delete (%13, positives only), readChangelog must reconstruct the
      // row-level history from manifest diffs alone: upsert pre-images
      // from a key semi-join against the predecessor's merged state, post
      // image vs insert split on whether the key had a pre-image,
      // positional delete images from a (file, pos) join against ONLY the
      // touched files — and the %143 keys (updated THEN deleted) must
      // surface their UPDATED value in the delete class, proving the
      // images are taken against the right predecessor snapshot, not the
      // bootstrap. The oracle recomputes all four classes per event_type.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val table = graft.TempTables.create("graft-iceberg-changelog") + "/tbl"
        graft.sinks.IcebergSink.write(ev, table,
          graft.sinks.IcebergSink.CreateExclusive)
        val s0 = graft.sinks.IcebergSink.snapshots(table).last._1
        val up = ev.filter(col("event_id") % 11 === 0)
          .withColumn("value", col("value") + 1000)
          .unionByName(ev.filter(col("event_id") % 17 === 0)
            .withColumn("event_id", -col("event_id") - 1))
        graft.sinks.IcebergSink.upsert(s, table, up, Seq("event_id"))
        graft.sinks.IcebergSink.deleteWhere(s, table,
          "event_id % 13 = 0 AND event_id > 0")
        graft.sinks.IcebergSink.readChangelog(s, table, s0)
          .groupBy(col("event_type"), col("_change_type").as("change_type"))
          .agg(count(lit(1)).as("n_rows"), fxSum(col("value")).as("sum_value"))
          .orderBy("event_type", "change_type")
      },
      Some("""WITH feed AS (
             |  SELECT event_type, 'insert' AS change_type, value
             |  FROM events WHERE event_id % 17 = 0
             |  UNION ALL
             |  SELECT event_type, 'update_preimage', value
             |  FROM events WHERE event_id % 11 = 0
             |  UNION ALL
             |  SELECT event_type, 'update_postimage', value + 1000
             |  FROM events WHERE event_id % 11 = 0
             |  UNION ALL
             |  SELECT event_type, 'delete',
             |    CASE WHEN event_id % 11 = 0 THEN value + 1000 ELSE value END
             |  FROM events WHERE event_id % 13 = 0 AND event_id > 0)
             |SELECT event_type, change_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
             |    AS sum_value
             |FROM feed GROUP BY event_type, change_type
             |ORDER BY event_type, change_type""".stripMargin)),

    QueryDef(
      "q_iceberg_evolve",
      // ADD-COLUMN SCHEMA EVOLUTION under the oracle (r12 — VERDICT r11
      // stretch #7): the even half bootstraps (event_id, event_type,
      // value); the odd half arrives through the opt-in `evolve` verb
      // carrying a NEW `src` column (derived deterministically from
      // event_id). Evolution is pure metadata — the next schema-id is
      // minted, existing ordinal field ids stay stable, new ids continue
      // from last-column-id, and NO data file is rewritten at any table
      // size; old files simply lack the column and every reader surfaces
      // NULL for it. The census pins exactly that: n_src counts non-null
      // src and must equal the odd half per type (a leaked non-null on an
      // old row, or a lost value on a new one, shifts it), while n_rows /
      // sum_value pin that the data plane is untouched. The positional
      // SchemaGate stays the reference-faithful default — only the
      // explicit verb admits new columns.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val table = graft.TempTables.create("graft-iceberg-evolve") + "/tbl"
        graft.sinks.IcebergSink.write(ev.filter(col("event_id") % 2 === 0),
          table, graft.sinks.IcebergSink.CreateExclusive,
          partitionBy = Seq("event_type"))
        val batch = ev.filter(col("event_id") % 2 === 1)
          .withColumn("src", concat(lit("s"), pmod(col("event_id"), lit(3))))
        graft.sinks.IcebergSink.evolve(batch, table,
          partitionBy = Seq("event_type"))
        graft.sinks.IcebergSink.read(s, table)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_rows"),
            fxSum(col("value")).as("sum_value"),
            count(col("src")).as("n_src"),
            countDistinct(col("src")).as("n_src_values"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
             |    AS sum_value,
             |  CAST(COUNT(*) FILTER (WHERE event_id % 2 = 1) AS BIGINT) AS n_src,
             |  CAST(COUNT(DISTINCT CASE WHEN event_id % 2 = 1
             |    THEN 's' || CAST(event_id % 3 AS VARCHAR) END) AS BIGINT)
             |    AS n_src_values
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_iceberg_update",
      // Predicate UPDATE, merge-on-read, under the oracle (r13): ONE
      // atomic snapshot commits positional delete files masking the
      // matched rows PLUS new data files with their transformed
      // replacements — no existing file read back or rewritten
      // (`no_rewrite` pins the pre-update parquet set intact inside the
      // post-update set), so an update of k rows costs O(k) at 100 TB.
      // Triple census: the table CASE recompute, the changelog's delete
      // images (exactly the ORIGINAL matched values), and its insert
      // images (exactly the transformed ones) — a row masked but not
      // replaced, or replaced but not masked, shifts one census and not
      // the others.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val table = graft.TempTables.create("graft-iceberg-upd") + "/tbl"
        graft.sinks.IcebergSink.write(ev, table,
          graft.sinks.IcebergSink.CreateExclusive)
        val s0 = graft.sinks.IcebergSink.snapshots(table).last._1
        def files() = new java.io.File(table, "data").listFiles()
          .filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.lastModified, f.length)).toSet
        val before = files()
        graft.sinks.IcebergSink.updateWhere(s, table, "event_id % 10 = 0",
          Map("value" -> "value + 1000"))
        val noRewrite = before.subsetOf(files())
        val oneSnapshot = graft.sinks.IcebergSink.snapshots(table).length == 2
        val kept = graft.sinks.IcebergSink.read(s, table).groupBy("event_type")
          .agg(count(lit(1)).as("n_rows"), fxSum(col("value")).as("sum_value"))
        val feed = graft.sinks.IcebergSink.readChangelog(s, table, s0)
        val pre = feed.filter(col("_change_type") === "delete")
          .groupBy("event_type")
          .agg(count(lit(1)).as("upd_rows"), fxSum(col("value")).as("pre_value"))
        val post = feed.filter(col("_change_type") === "insert")
          .groupBy("event_type").agg(fxSum(col("value")).as("post_value"))
        kept.join(pre, Seq("event_type"), "full_outer")
          .join(post, Seq("event_type"), "full_outer")
          .select(col("event_type"), col("n_rows"), col("sum_value"),
            coalesce(col("upd_rows"), lit(0L)).as("upd_rows"),
            coalesce(col("pre_value"), lit(0.0)).as("pre_value"),
            coalesce(col("post_value"), lit(0.0)).as("post_value"),
            lit(noRewrite && oneSnapshot).as("no_rewrite"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  CAST(SUM(CAST(ROUND((CASE WHEN event_id % 10 = 0
             |    THEN value + 1000 ELSE value END) * 100) AS BIGINT)) AS DOUBLE)
             |    / 100.0 AS sum_value,
             |  CAST(COUNT(*) FILTER (WHERE event_id % 10 = 0) AS BIGINT) AS upd_rows,
             |  CAST(COALESCE(SUM(CAST(ROUND(value * 100) AS BIGINT))
             |    FILTER (WHERE event_id % 10 = 0), 0) AS DOUBLE) / 100.0 AS pre_value,
             |  CAST(COALESCE(SUM(CAST(ROUND((value + 1000) * 100) AS BIGINT))
             |    FILTER (WHERE event_id % 10 = 0), 0) AS DOUBLE) / 100.0 AS post_value,
             |  TRUE AS no_rewrite
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_iceberg_dv",
      // V3 DELETION VECTORS under the oracle (r15, Iceberg spec v3 —
      // the format twin of q_delta_delete_dv, making the MoR delete
      // planes symmetric across formats): two predicate deletes land as
      // roaring bitmaps in Puffin `deletion-vector-v1` blobs, linked
      // from delete manifests by referenced_data_file/content_offset/
      // content_size_in_bytes (spec field ids 143/144/145), the second
      // superseding the first per touched file (union — at most one DV
      // per data file ever applies). No data file is read back or
      // rewritten; the read applies vectors through the same O(1)
      // native probe as the Delta side. Census must equal the oracle's
      // complement; `v3_dv` pins the format-version ratchet to 3 and
      // the Puffin layout on disk. At 100 TB: per-file delete state is
      // ONE bitmap regardless of delete count, and delete cost is
      // O(matched rows), never a rewrite.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val tbl = graft.TempTables.create("graft-iceberg-dv") + "/tbl"
        graft.sinks.IcebergSink.write(ev, tbl,
          graft.sinks.IcebergSink.CreateExclusive)
        graft.sinks.IcebergSink.deleteWhereDV(s, tbl, "event_id % 10 = 3")
        graft.sinks.IcebergSink.deleteWhereDV(s, tbl, "event_id % 10 = 7")
        val mDir = new java.io.File(tbl, "metadata")
        val fmt3 = java.nio.file.Files.readString(mDir.listFiles()
          .filter(_.getName.endsWith(".metadata.json"))
          .maxBy(_.getName).toPath).contains(""""format-version":3""")
        val puffins = mDir.listFiles().count(_.getName.endsWith(".puffin"))
        graft.sinks.IcebergSink.read(s, tbl).groupBy("event_type")
          .agg(count(lit(1)).as("cnt"),
            countDistinct(col("event_id")).as("n_ids"),
            fxSum(col("value")).as("sum_v"))
          .withColumn("v3_dv", lit(fmt3 && puffins == 2))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt,
             |COUNT(DISTINCT event_id) AS n_ids,
             |CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
             |  AS sum_v,
             |TRUE AS v3_dv
             |FROM events WHERE event_id % 10 NOT IN (3, 7)
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_iceberg_update_dv",
      // V3 DV UPDATE under the oracle (r15 — q_delta_update_dv's format
      // twin, closing cross-format MoR DML symmetry): updateWhereDV
      // commits ONE `overwrite` snapshot whose Puffin vectors mask the
      // matched rows AND whose new data files carry their transformed
      // replacements — SET evaluates against the PRE-update row, no
      // existing file read back or rewritten, cost O(matched). The
      // census must equal the oracle's CASE recompute; `one_commit`
      // pins the atomicity (exactly one snapshot for the whole update).
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val tbl = graft.TempTables.create("graft-iceberg-udv") + "/tbl"
        graft.sinks.IcebergSink.write(ev, tbl,
          graft.sinks.IcebergSink.CreateExclusive)
        val pre = graft.sinks.IcebergSink.snapshots(tbl).size
        graft.sinks.IcebergSink.updateWhereDV(s, tbl,
          "event_id % 10 = 4", Map("value" -> "value + 5000"))
        val one = graft.sinks.IcebergSink.snapshots(tbl).size == pre + 1
        graft.sinks.IcebergSink.read(s, tbl).groupBy("event_type")
          .agg(count(lit(1)).as("cnt"),
            countDistinct(col("event_id")).as("n_ids"),
            fxSum(col("value")).as("sum_v"))
          .withColumn("one_commit", lit(one))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt,
             |COUNT(DISTINCT event_id) AS n_ids,
             |CAST(SUM(CAST(ROUND((CASE WHEN event_id % 10 = 4
             |  THEN value + 5000 ELSE value END) * 100) AS BIGINT))
             |  AS DOUBLE) / 100.0 AS sum_v,
             |TRUE AS one_commit
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_iceberg_defaults",
      // V3 DEFAULT VALUES under the oracle (r16, Iceberg spec v3
      // §Default values — with deletion vectors and row lineage this
      // closes the v3 pillar set): `evolveAddColumn(..., default)` is a
      // METADATA-ONLY ALTER ADD COLUMN DEFAULT — zero data bytes move at
      // any table size — and every pre-evolution row surfaces the
      // initial-default through the id-resolved read (files lacking the
      // field's id project the default, never null), while post-evolution
      // producers stamp their own values. The census groups by exactly
      // that provenance, so one wrong null breaks the hash.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val tbl = graft.TempTables.create("graft-ib-dflt") + "/tbl"
        graft.sinks.IcebergSink.write(ev.filter(col("event_id") % 3 =!= 0),
          tbl, graft.sinks.IcebergSink.CreateExclusive)
        graft.sinks.IcebergSink.evolveAddColumn(tbl, "src", "string",
          Some("legacy"))
        graft.sinks.IcebergSink.write(
          ev.filter(col("event_id") % 3 === 0).withColumn("src", lit("fresh")),
          tbl, graft.sinks.IcebergSink.Append)
        graft.sinks.IcebergSink.read(s, tbl).groupBy("src")
          .agg(count(lit(1)).as("cnt"),
            countDistinct(col("event_id")).as("n_ids"),
            fxSum(col("value")).as("sum_v"))
          .orderBy("src")
      },
      Some("""SELECT CASE WHEN event_id % 3 = 0 THEN 'fresh' ELSE 'legacy' END
             |  AS src,
             |CAST(COUNT(*) AS BIGINT) AS cnt,
             |COUNT(DISTINCT event_id) AS n_ids,
             |CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
             |  AS sum_v
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef(
      "q_iceberg_stats_ndv",
      // TABLE STATISTICS under the oracle (r16, Iceberg spec §Table
      // statistics): writeStats computes one theta sketch per column in
      // ONE distributed pass, packs `apache-datasketches-theta-v1` blobs
      // into a Puffin statistics file and registers it (with the `ndv`
      // blob property planners consume) in the metadata's `statistics`
      // list — a metadata-only commit. Both census columns stay under
      // the sketch's K=256, so the KMV estimates are EXACT and the
      // oracle is a plain COUNT(DISTINCT). `broadcast_hinted` pins the
      // planner hook: with size-based auto-broadcast unavailable to the
      // static plan, scanForJoin's NDV read is what marks the dim side
      // broadcast-able. At 100 TB: the broadcast decision costs one
      // O(1) metadata read instead of a per-query manifest walk.
      (s, dir) => {
        import org.apache.spark.sql.functions.pmod
        val ev = t(s, dir, "events")
          .select(col("event_id"), col("event_type"),
            pmod(col("event_id"), lit(50L)).as("bucket"))
        val tbl = graft.TempTables.create("graft-ib-stats") + "/tbl"
        graft.sinks.IcebergSink.write(ev, tbl,
          graft.sinks.IcebergSink.CreateExclusive)
        val ndvs = graft.sinks.IcebergStats.writeStats(s, tbl,
          Seq("event_type", "bucket"))
        val hinted = graft.sinks.IcebergSink.read(s, tbl)
          .join(graft.sinks.IcebergStats.scanForJoin(s, tbl, "event_type")
            .select(col("event_type")).distinct(), "event_type")
        val hp = hinted.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        s.createDataFrame(java.util.List.of(
          org.apache.spark.sql.Row(ndvs("event_type"), ndvs("bucket"),
            hp.contains("BroadcastHashJoin"))),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("ndv_event_type",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("ndv_bucket",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("broadcast_hinted",
              org.apache.spark.sql.types.BooleanType))))
      },
      Some("""SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS ndv_event_type,
             |CAST(COUNT(DISTINCT event_id % 50) AS BIGINT) AS ndv_bucket,
             |TRUE AS broadcast_hinted FROM events""".stripMargin)),

    QueryDef(
      "q_iceberg_partition_stats",
      // PARTITION STATISTICS under the oracle (r17, Iceberg spec
      // §Partition statistics): writePartitionStats aggregates the
      // current snapshot's manifest tree into one row per partition —
      // data record/file counts, bytes, DV-delete counts attributed to
      // each vector's REFERENCED file's partition (supersede rule) —
      // writes ONE parquet under metadata/ and registers it in the
      // `partition-statistics` metadata list (metadata-only commit;
      // re-runs replace + reclaim). The census the query emits comes
      // FROM THE STATS FILE (`live_record_count` = data − positional
      // deletes); `stats_match` gates it against the direct merged read,
      // `files_ok` pins positive file/byte tallies. r18 adds the PLANNER
      // CONSUMPTION the spec section exists for (IcebergStats
      // .readPartition): `empty_pruned` gates that an absent partition
      // answers EMPTY from the stats file alone — no manifest walk — and
      // `stats_broadcast` that a small partition's pruned scan comes back
      // broadcast-hinted off its registered live count, decided before
      // any scan. At 100 TB: partition planning questions (rows per
      // partition, skew, querying a not-yet-loaded day) answer from one
      // KB-scale parquet instead of the full manifest walk every query
      // otherwise pays.
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select("event_id", "event_type", "value")
        val tbl = graft.TempTables.create("graft-ib-pstats") + "/tbl"
        graft.sinks.IcebergSink.write(ev, tbl,
          graft.sinks.IcebergSink.CreateExclusive,
          partitionBy = Seq("event_type"))
        graft.sinks.IcebergSink.deleteWhereDV(s, tbl, "event_id % 10 = 3")
        graft.sinks.IcebergStats.writePartitionStats(s, tbl)
        val stats = graft.sinks.IcebergStats.partitionStats(s, tbl).get
          .select(element_at(col("partition"), "event_type").as("event_type"),
            col("live_record_count").as("n_stats"),
            col("data_file_count"), col("total_data_file_size_in_bytes"))
        // consumption gates: a never-loaded partition answers empty off
        // the census; a real one's pruned scan broadcast-hints the join
        val emptyPruned = graft.sinks.IcebergStats
          .readPartition(s, tbl, "event_type", "__never_loaded__").isEmpty
        val firstType = ev.select("event_type").distinct()
          .orderBy("event_type").head().getString(0)
        val hintedPlan = graft.sinks.IcebergSink.read(s, tbl)
          .join(graft.sinks.IcebergStats
              .readPartition(s, tbl, "event_type", firstType)
              .select(col("event_id").as("jid")),
            col("event_id") === col("jid"))
          .queryExecution.executedPlan.toString
        val statsBroadcast = hintedPlan.contains("BroadcastHashJoin")
        val direct = graft.sinks.IcebergSink.read(s, tbl)
          .groupBy("event_type").agg(count(lit(1)).as("n_direct"))
        stats.join(direct, Seq("event_type"), "full_outer")
          .select(col("event_type"),
            col("n_stats").as("n_rows"),
            (col("n_stats") <=> col("n_direct")).as("stats_match"),
            (col("data_file_count") > 0 &&
              col("total_data_file_size_in_bytes") > 0).as("files_ok"))
          .withColumn("empty_pruned", lit(emptyPruned))
          .withColumn("stats_broadcast", lit(statsBroadcast))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
             |TRUE AS stats_match, TRUE AS files_ok,
             |TRUE AS empty_pruned, TRUE AS stats_broadcast
             |FROM events WHERE event_id % 10 <> 3
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      // r18 widened the scope with the readPartition consumption gates —
      // the r17 best measured the census-only shape
      shapeVersion = 2),

    QueryDef(
      "q_iceberg_row_lineage",
      // V3 ROW LINEAGE under the oracle (r16, Iceberg spec v3 §Row
      // Lineage — the third v3 pillar beside deletion vectors): every
      // row carries a STABLE id. enableRowLineage assigns retroactively
      // in one metadata-only replace commit (format ratchets to 3, the
      // next-row-id clock starts); an append takes fresh ids from the
      // clock; a DV delete never moves survivors' ids (positions are
      // untouched); a compaction MATERIALIZES the ids into the rewritten
      // parquet so the rewrite preserves them exactly. Gates (computed
      // DISTRIBUTEDLY — a pre-op lineage frame joins the post-op one,
      // no id ever collected): `ids_stable` (every surviving pre-append
      // row keeps its id through append + DV delete + compaction),
      // `ids_unique` (no id collides across the enable/append
      // generations), `ids_assigned` (no surviving row reads null).
      // r17 adds the read contract's second half,
      // `_last_updated_sequence_number` (inherited from each file's data
      // sequence; materialized through compaction like `_row_id`), gated
      // by an IDENTITY update (SET value = value — census-invariant):
      // `seq_assigned` (no null), `seq_bumped` (exactly the updated rows
      // advance to the update's sequence), `seq_stable` (nobody else
      // moves — compaction's new sequence never claims repacked rows).
      // Census must equal the oracle's complement. At 100 TB: enable
      // and every subsequent assignment are manifest-plane work — no
      // data file is opened for lineage bookkeeping, and compaction's id
      // materialization rides the rewrite it was doing anyway.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val tbl = graft.TempTables.create("graft-iceberg-rowlin") + "/tbl"
        graft.sinks.IcebergSink.write(ev.filter(col("event_id") % 2 === 0),
          tbl, graft.sinks.IcebergSink.CreateExclusive)
        graft.sinks.IcebergSink.enableRowLineage(s, tbl)
        val pre = graft.sinks.IcebergSink.readWithLineage(s, tbl)
          .select(col("event_id"), col("_row_id").as("_pre_id"))
        graft.sinks.IcebergSink.write(ev.filter(col("event_id") % 2 === 1),
          tbl, graft.sinks.IcebergSink.Append)
        graft.sinks.IcebergSink.deleteWhereDV(s, tbl, "event_id % 10 = 3")
        graft.sinks.IcebergSink.compact(s, tbl)
        // post feeds BOTH the stability/uniqueness pass and the preUpd
        // snapshot — materialize the merged lineage read once (r18, guide
        // §5); the g1 head() below is its first action, safely BEFORE the
        // identity update mutates the table
        val post = graft.sinks.IcebergSink.readWithLineage(s, tbl)
          .localCheckpoint(false)
        // gate counts FUSE into single aggregate passes (the merged
        // lineage read is the expensive part — pay it once per frame,
        // not once per gate)
        // LEFT join keeps appended rows (null _pre_id — not "moved"), so
        // uniqueness/assignment still gate the WHOLE post frame while
        // stability gates only the surviving pre rows, all in ONE pass
        val survivors = post.join(pre, Seq("event_id"), "left")
        // r19 (guide §2.6, the q_lakehouse_maintain recipe — VERDICT r18
        // item 3): g1 reads plan-pinned pre/post snapshots and the MoR
        // update only adds files — independent, so overlap them (see the
        // Delta twin for the full safety argument).
        val g1F = scala.concurrent.Future(survivors.agg(
          count(when(col("_pre_id").isNotNull &&
            col("_row_id") =!= col("_pre_id"), 1)).as("moved"),
          count(when(col("_row_id").isNull, 1)).as("nulls"),
          countDistinct(col("_row_id")).as("dstnct"),
          count(lit(1)).as("n")).head())(
          scala.concurrent.ExecutionContext.global)
        // identity update: lineage must move for EXACTLY the touched rows
        val preUpd = post.select(col("event_id"),
          col("_last_updated_sequence_number").as("_pre_seq"))
        graft.sinks.IcebergSink.updateWhereDV(s, tbl, "event_id % 10 = 6",
          Map("value" -> "value"))
        val g1 = scala.concurrent.Await.result(g1F,
          scala.concurrent.duration.Duration.Inf)
        val stable = g1.getLong(0) == 0L
        val assigned = g1.getLong(1) == 0L
        val unique = g1.getLong(2) == g1.getLong(3)
        // post2 feeds the sequence gate AND the final census — one merged
        // read, two consumers
        val post2 = graft.sinks.IcebergSink.readWithLineage(s, tbl)
          .localCheckpoint(false)
        val joined = post2.join(preUpd, Seq("event_id"), "inner")
        val g2 = joined.agg(
          count(when(col("_last_updated_sequence_number").isNull, 1)).as("nul"),
          count(when(col("event_id") % 10 === 6 &&
            col("_last_updated_sequence_number") <= col("_pre_seq"), 1)).as("nb"),
          count(when(col("event_id") % 10 =!= 6 &&
            col("_last_updated_sequence_number") =!= col("_pre_seq"), 1)).as("mv"))
          .head()
        val seqAssigned = g2.getLong(0) == 0L
        val seqBumped = g2.getLong(1) == 0L
        val seqStable = g2.getLong(2) == 0L
        post2.groupBy("event_type")
          .agg(count(lit(1)).as("cnt"),
            countDistinct(col("event_id")).as("n_ids"),
            fxSum(col("value")).as("sum_v"))
          .withColumn("ids_stable", lit(stable))
          .withColumn("ids_unique", lit(unique))
          .withColumn("ids_assigned", lit(assigned))
          .withColumn("seq_assigned", lit(seqAssigned))
          .withColumn("seq_bumped", lit(seqBumped))
          .withColumn("seq_stable", lit(seqStable))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt,
             |COUNT(DISTINCT event_id) AS n_ids,
             |CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
             |  AS sum_v,
             |TRUE AS ids_stable, TRUE AS ids_unique, TRUE AS ids_assigned,
             |TRUE AS seq_assigned, TRUE AS seq_bumped, TRUE AS seq_stable
             |FROM events WHERE event_id % 10 <> 3
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      // r17 extended the scope: identity update + second lineage read
      // gating _last_updated_sequence_number (VERDICT r16 item 4)
      shapeVersion = 2),

    QueryDef(
      "q_iceberg_deletekeys",
      // CDC DELETE verb under the oracle (r13): deleteKeys commits ONE
      // equality-delete-only snapshot — the Flink-CDC DELETE shape,
      // upsert minus the replacement rows — erasing every row whose key
      // appears in the batch WITHOUT reading or rewriting ANY data file
      // (cost ∝ the key batch, never the table; `no_rewrite` pins the
      // data file set unchanged). Keys that no longer exist are read-level
      // no-ops; the pre-delete snapshot still time-travels; the changelog
      // classifies the erased rows as `delete` (no replacement in the
      // snapshot — distinct from an upsert's update_preimage).
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val table = graft.TempTables.create("graft-iceberg-dk") + "/tbl"
        graft.sinks.IcebergSink.write(ev, table,
          graft.sinks.IcebergSink.CreateExclusive)
        val s0 = graft.sinks.IcebergSink.snapshots(table).last._1
        def files() = new java.io.File(table, "data").listFiles()
          .filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.lastModified, f.length)).toSet
        val before = files()
        graft.sinks.IcebergSink.deleteKeys(s, table,
          ev.filter(col("event_id") % 13 === 0).select("event_id"),
          Seq("event_id"))
        val noRewrite = files() == before
        val kept = graft.sinks.IcebergSink.read(s, table).groupBy("event_type")
          .agg(count(lit(1)).as("n_kept"), fxSum(col("value")).as("v_kept"))
        val feed = graft.sinks.IcebergSink.readChangelog(s, table, s0)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_del"),
            min(col("_change_type") === "delete").as("all_del"))
        val pre = graft.sinks.IcebergSink.read(s, table, Some(s0))
          .groupBy("event_type").agg(count(lit(1)).as("n_pre"))
        val direct = t(s, dir, "events").groupBy("event_type")
          .agg(count(lit(1)).as("n_all"))
        kept.join(feed, Seq("event_type"), "full_outer")
          .join(pre, Seq("event_type"), "full_outer")
          .join(direct, Seq("event_type"), "full_outer")
          .select(col("event_type"),
            coalesce(col("n_kept"), lit(0L)).as("n_rows"),
            coalesce(col("v_kept"), lit(0.0)).as("sum_value"),
            coalesce(col("n_del"), lit(0L)).as("del_rows"),
            coalesce(col("all_del"), lit(true)).as("all_delete"),
            lit(noRewrite).as("no_rewrite"),
            (col("n_pre") <=> col("n_all")).as("bad_travels"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type,
             |  CAST(COUNT(*) FILTER (WHERE event_id % 13 <> 0) AS BIGINT) AS n_rows,
             |  CAST(COALESCE(SUM(CAST(ROUND(value * 100) AS BIGINT))
             |    FILTER (WHERE event_id % 13 <> 0), 0) AS DOUBLE) / 100.0 AS sum_value,
             |  CAST(COUNT(*) FILTER (WHERE event_id % 13 = 0) AS BIGINT) AS del_rows,
             |  TRUE AS all_delete, TRUE AS no_rewrite, TRUE AS bad_travels
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_iceberg_evolve2",
      // FULL SCHEMA-EVOLUTION SURFACE under the oracle (r13 — VERDICT r12
      // item 3): rename, type-widen, and drop, all METADATA-ONLY (no data
      // file read or rewritten at any table size — the same O(1) posture
      // at 100 TB). The even half bootstraps (…, qty INT, score FLOAT,
      // note STRING); qty renames to quantity (field id kept); the odd
      // half appends under the new name; quantity widens int→long and
      // score float→double (spec-safe promotions, old narrow values cast
      // up on read); note drops (id retired, never reused). The census
      // only matches the oracle if field-id resolution works end to end:
      // half the rows live in files written under the OLD name and NARROW
      // types — a name-based read would surface them as NULLs and shift
      // every sum. schema_evolved pins the final column set.
      (s, dir) => {
        val ev = t(s, dir, "events").select(col("event_id"), col("event_type"),
          pmod(col("event_id"), lit(1000)).cast("int").as("qty"),
          col("value").cast("float").as("score"),
          concat(lit("n"), pmod(col("event_id"), lit(7))).as("note"))
        val table = graft.TempTables.create("graft-iceberg-evolve2") + "/tbl"
        graft.sinks.IcebergSink.write(ev.filter(col("event_id") % 2 === 0),
          table, graft.sinks.IcebergSink.CreateExclusive,
          partitionBy = Seq("event_type"))
        graft.sinks.IcebergSink.evolveRename(table, "qty", "quantity")
        graft.sinks.IcebergSink.write(
          ev.filter(col("event_id") % 2 === 1)
            .withColumnRenamed("qty", "quantity"),
          table, graft.sinks.IcebergSink.Append,
          partitionBy = Seq("event_type"))
        graft.sinks.IcebergSink.evolveWiden(table, "quantity")
        graft.sinks.IcebergSink.evolveWiden(table, "score")
        graft.sinks.IcebergSink.evolveDrop(table, "note")
        val out = graft.sinks.IcebergSink.read(s, table)
        val evolvedOk = out.columns.toSeq ==
          Seq("event_id", "event_type", "quantity", "score") &&
          out.schema("quantity").dataType ==
            org.apache.spark.sql.types.LongType &&
          out.schema("score").dataType ==
            org.apache.spark.sql.types.DoubleType
        out.groupBy("event_type")
          .agg(count(lit(1)).as("n_rows"),
            sum(col("quantity")).as("sum_quantity"),
            fxSum(col("score")).as("sum_score"))
          .select(col("event_type"), col("n_rows"), col("sum_quantity"),
            col("sum_score"), lit(evolvedOk).as("schema_evolved"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  CAST(SUM(event_id % 1000) AS BIGINT) AS sum_quantity,
             |  CAST(SUM(CAST(ROUND(CAST(CAST(value AS REAL) AS DOUBLE) * 100)
             |    AS BIGINT)) AS DOUBLE) / 100.0 AS sum_score,
             |  TRUE AS schema_evolved
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_iceberg_refs",
      // NAMED REFS (tags/branches) under the oracle (r13): the even half
      // bootstraps and gets TAGGED; the odd half appends; expiry at
      // keepLast=1 would normally retire every snapshot but the newest —
      // the tag PINS its snapshot (expireSnapshots never expires a
      // ref-pinned snapshot), so reading the tag afterwards still yields
      // exactly the even half. The reproducibility primitive at 100 TB:
      // "the exact table this model trained on" survives retention as an
      // O(1) metadata pointer, not a copy. Census: the tag read ≡ the
      // oracle's even-half recompute; the main read ≡ the full corpus.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val table = graft.TempTables.create("graft-iceberg-refs") + "/tbl"
        graft.sinks.IcebergSink.write(ev.filter(col("event_id") % 2 === 0),
          table, graft.sinks.IcebergSink.CreateExclusive)
        val s0 = graft.sinks.IcebergSink.snapshots(table).last._1
        graft.sinks.IcebergSink.createRef(table, "train-v1", s0)
        graft.sinks.IcebergSink.write(ev.filter(col("event_id") % 2 === 1),
          table, graft.sinks.IcebergSink.Append)
        graft.sinks.IcebergSink.expireSnapshots(table, keepLast = 1)
        val tagged = graft.sinks.IcebergSink.readRef(s, table, "train-v1")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_tagged"), fxSum(col("value")).as("v_tagged"))
        graft.sinks.IcebergSink.read(s, table).groupBy("event_type")
          .agg(count(lit(1)).as("n_rows"))
          .join(tagged, Seq("event_type"), "full_outer")
          .select(col("event_type"),
            coalesce(col("n_rows"), lit(0L)).as("n_rows"),
            coalesce(col("n_tagged"), lit(0L)).as("n_tagged"),
            coalesce(col("v_tagged"), lit(0.0)).as("v_tagged"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  CAST(COUNT(*) FILTER (WHERE event_id % 2 = 0) AS BIGINT) AS n_tagged,
             |  CAST(COALESCE(SUM(CAST(ROUND(value * 100) AS BIGINT))
             |    FILTER (WHERE event_id % 2 = 0), 0) AS DOUBLE) / 100.0 AS v_tagged
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_iceberg_branch_write",
      // WRITABLE BRANCHES under the oracle (r14, the write half of
      // q_iceberg_refs): one third of the corpus bootstraps main, a
      // branch ref is cut at its head, and the remaining two thirds land
      // as TWO branch appends (the ref must advance across commits) —
      // write-audit-publish's staging lane. Census gates: the MAIN read
      // must still equal the bootstrap third (a branch commit that leaked
      // into main fails the oracle), the BRANCH read must equal the whole
      // corpus (each append continued from the BRANCH head, not main's),
      // and both must survive expireSnapshots(keepLast=1) — ref-aware
      // expiry keeps every branch head alive while retiring unpinned
      // history. At 100 TB the branch is O(new-data) cost and promotion
      // is a metadata pointer move, never a copy.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val table = graft.TempTables.create("graft-iceberg-branch") + "/tbl"
        graft.sinks.IcebergSink.write(ev.filter(col("event_id") % 3 === 0),
          table, graft.sinks.IcebergSink.CreateExclusive)
        val head = graft.sinks.IcebergSink.snapshots(table).last._1
        graft.sinks.IcebergSink.createRef(table, "staging", head,
          refType = "branch")
        graft.sinks.IcebergSink.appendBranch(
          ev.filter(col("event_id") % 3 === 1), table, "staging")
        graft.sinks.IcebergSink.appendBranch(
          ev.filter(col("event_id") % 3 === 2), table, "staging")
        graft.sinks.IcebergSink.expireSnapshots(table, keepLast = 1)
        val branch = graft.sinks.IcebergSink.readRef(s, table, "staging")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_branch"), fxSum(col("value")).as("v_branch"))
        graft.sinks.IcebergSink.read(s, table).groupBy("event_type")
          .agg(count(lit(1)).as("n_main"))
          .join(branch, Seq("event_type"), "full_outer")
          .select(col("event_type"),
            coalesce(col("n_main"), lit(0L)).as("n_main"),
            coalesce(col("n_branch"), lit(0L)).as("n_branch"),
            coalesce(col("v_branch"), lit(0.0)).as("v_branch"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type,
             |  CAST(COUNT(*) FILTER (WHERE event_id % 3 = 0) AS BIGINT) AS n_main,
             |  CAST(COUNT(*) AS BIGINT) AS n_branch,
             |  CAST(COALESCE(SUM(CAST(ROUND(value * 100) AS BIGINT)), 0)
             |    AS DOUBLE) / 100.0 AS v_branch
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_iceberg_wap",
      // WRITE-AUDIT-PUBLISH end-to-end (r14): candidate data lands on a
      // branch (appendBranch), the AUDIT reads the branch head in
      // isolation — main serves the pre-publish half throughout, pinned
      // by the pre_publish census column — and fastForward PUBLISHES by
      // pointing main at the audited head, a metadata-only O(1) commit
      // refused unless main's head is an ancestor of the branch's (a
      // diverged main can never be silently overwritten). Census: the
      // post-publish main read must equal the whole corpus via the
      // oracle, pre_publish must equal the bootstrap half — both gates
      // fail if the branch leaked early or the publish lost rows. This is
      // THE ingestion-quality pattern at 100 TB: stage a day's crawl,
      // run the quality audit on the branch, FIX what it finds with the
      // branch-targeted merge-on-read verbs, promote with a pointer. The
      // staged batch deliberately carries junk rows; the audit scrubs
      // them with a branch deleteWhere (positional deletes against the
      // BRANCH's merged view), so the final oracle census passes only if
      // the fix landed on the branch and the publish carried it.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val table = graft.TempTables.create("graft-iceberg-wap") + "/tbl"
        graft.sinks.IcebergSink.write(ev.filter(col("event_id") % 2 === 0),
          table, graft.sinks.IcebergSink.CreateExclusive)
        val cut = graft.sinks.IcebergSink.snapshots(table).last._1
        graft.sinks.IcebergSink.createRef(table, "staged", cut,
          refType = "branch")
        val junk = ev.filter(col("event_id") % 200 === 0)
          .select((col("event_id") + lit(1000000000L)).as("event_id"),
            lit("zz_junk").as("event_type"), col("value"))
        graft.sinks.IcebergSink.appendBranch(
          ev.filter(col("event_id") % 2 === 1).unionByName(junk),
          table, "staged")
        graft.sinks.IcebergSink.deleteWhere(s, table,
          "event_type = 'zz_junk'", branch = Some("staged"))
        // the audit window: main still serves the pre-publish half —
        // PINNED by an eager collect (a lazy frame would re-read the
        // post-publish state) and re-joined as a broadcast literal
        import s.implicits._
        val prePinned = graft.sinks.IcebergSink.read(s, table)
          .groupBy("event_type").agg(count(lit(1)).as("n_pre"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
          .toDF("event_type", "n_pre_publish")
        graft.sinks.IcebergSink.fastForward(table, "staged")
        graft.sinks.IcebergSink.read(s, table).groupBy("event_type")
          .agg(count(lit(1)).as("n_rows"), fxSum(col("value")).as("sum_v"))
          .join(broadcast(prePinned), Seq("event_type"), "left")
          .select(col("event_type"), col("n_rows"), col("sum_v"),
            coalesce(col("n_pre_publish"), lit(0L)).as("n_pre_publish"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  CAST(COALESCE(SUM(CAST(ROUND(value * 100) AS BIGINT)), 0)
             |    AS DOUBLE) / 100.0 AS sum_v,
             |  CAST(COUNT(*) FILTER (WHERE event_id % 2 = 0) AS BIGINT)
             |    AS n_pre_publish
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_iceberg_meta_tables",
      // INSPECTION TABLES under the oracle (r14): the `table$snapshots`
      // surface — snapshots / history / refs / files as queryable
      // DataFrames answered from the metadata tree alone. The table is
      // built by create + append + MoR delete + a tag; the query then
      // answers operational questions WITHOUT opening one data file:
      // rows on disk per manifest content plane (data vs delete — the
      // delete plane's record_count IS the deleted-row count), snapshot
      // count, ref count, exactly-one-current. Every number is checkable
      // by the oracle because the write path is deterministic. At 100 TB
      // these are the tables a storage/ops dashboard reads every minute —
      // KB-scale metadata queries, never scans.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val table = graft.TempTables.create("graft-iceberg-meta") + "/tbl"
        graft.sinks.IcebergSink.write(ev.filter(col("event_id") % 2 === 0),
          table, graft.sinks.IcebergSink.CreateExclusive)
        graft.sinks.IcebergSink.write(ev.filter(col("event_id") % 2 === 1),
          table, graft.sinks.IcebergSink.Append)
        graft.sinks.IcebergSink.deleteWhere(s, table, "event_id % 100 = 0")
        graft.sinks.IcebergSink.createRef(table, "audit",
          graft.sinks.IcebergSink.snapshots(table).last._1)
        val files = graft.sinks.IcebergSink.metaTable(s, table, "files")
        val snaps = graft.sinks.IcebergSink.metaTable(s, table, "snapshots")
        val refs = graft.sinks.IcebergSink.metaTable(s, table, "refs")
        val hist = graft.sinks.IcebergSink.metaTable(s, table, "history")
        files.groupBy(col("content"))
          .agg(sum(col("record_count")).as("value"))
          .select(when(col("content") === 0, lit("data_records"))
            .otherwise(lit("delete_records")).as("metric"), col("value"))
          .unionByName(snaps.agg(count(lit(1)).as("value"))
            .select(lit("snapshots").as("metric"), col("value")))
          .unionByName(refs.agg(count(lit(1)).as("value"))
            .select(lit("refs").as("metric"), col("value")))
          .unionByName(hist.filter(col("is_current")).agg(count(lit(1)).as("value"))
            .select(lit("current").as("metric"), col("value")))
          .orderBy("metric")
      },
      Some("""SELECT 'current' AS metric, CAST(1 AS BIGINT) AS value
             |UNION ALL SELECT 'data_records',
             |  (SELECT CAST(COUNT(*) AS BIGINT) FROM events)
             |UNION ALL SELECT 'delete_records',
             |  (SELECT CAST(COUNT(*) AS BIGINT) FROM events WHERE event_id % 100 = 0)
             |UNION ALL SELECT 'refs', CAST(2 AS BIGINT)
             |UNION ALL SELECT 'snapshots', CAST(3 AS BIGINT)
             |ORDER BY metric""".stripMargin)),

    QueryDef(
      "q_iceberg_orphan_audit",
      // ORPHAN-FILE cleanup under the oracle (r14): expiry reclaims what
      // RETIRED snapshots referenced; this reclaims what NO snapshot ever
      // did — a crashed writer's staged parquet and a dangling manifest,
      // planted with week-old mtimes next to a FRESH staged file that a
      // live writer could still be about to commit. Gates:
      // `orphans_reclaimed` (exactly the two planted corpses, by path),
      // `fresh_spared` (the age gate protects in-flight writers — what
      // makes the sweep safe to run next to live commits), and the census
      // must equal the oracle (referenced files are untouchable by
      // construction: the sweep works from the metadata tree's reference
      // set, never from name patterns). The storage-bill janitor at
      // 100 TB: failed jobs leak real money until this runs.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val table = graft.TempTables.create("graft-iceberg-orphan") + "/tbl"
        graft.sinks.IcebergSink.write(ev.filter(col("event_id") % 2 === 0),
          table, graft.sinks.IcebergSink.CreateExclusive)
        graft.sinks.IcebergSink.write(ev.filter(col("event_id") % 2 === 1),
          table, graft.sinks.IcebergSink.Append)
        val old = System.currentTimeMillis() - 7L * 24 * 3600 * 1000
        def plant(rel: String, age: Boolean): java.io.File = {
          val f = new java.io.File(table, rel)
          f.getParentFile.mkdirs()
          java.nio.file.Files.write(f.toPath, Array[Byte](1, 2, 3))
          if (age) require(f.setLastModified(old))
          f
        }
        val corpse1 = plant("data/stage-dead/part-junk.parquet", age = true)
        val corpse2 = plant("metadata/manifest-dead.avro", age = true)
        val fresh = plant("data/stage-live/part-fresh.parquet", age = false)
        val gone = graft.sinks.IcebergSink.removeOrphanFiles(s, table,
          olderThanMs = 24L * 3600 * 1000)
        val reclaimed = gone.toSet ==
          Set(corpse1.getAbsolutePath, corpse2.getAbsolutePath)
        graft.sinks.IcebergSink.read(s, table).groupBy("event_type")
          .agg(count(lit(1)).as("n_rows"), fxSum(col("value")).as("sum_v"))
          .withColumn("orphans_reclaimed", lit(reclaimed))
          .withColumn("fresh_spared", lit(fresh.exists()))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
             |    AS sum_v,
             |  TRUE AS orphans_reclaimed, TRUE AS fresh_spared
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_uniform_convert",
      // Delta→Iceberg IN-PLACE CONVERT under the oracle (r14, the
      // UniForm pattern): events land as a Delta table partitioned by
      // event_type, convertFromDelta mints an Iceberg metadata tree —
      // manifest entries referencing the SAME parquet by absolute path,
      // with real footer stats and typed identity partition values from
      // the Delta log — and the census is read through the ICEBERG
      // front-end. Gates: `zero_copy` pins the parquet set byte-identical
      // across the convert (one copy of the data, two format front-ends —
      // the whole point at 100 TB: a format migration that moves nothing),
      // `counts_agree` pins both formats' metadata-only censuses equal
      // (Delta log stats vs Iceberg manifest record counts), and the
      // per-type census must equal the raw oracle.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val table = graft.TempTables.create("graft-uniform") + "/tbl"
        graft.sinks.DeltaSink.write(ev, table, partitionBy = Seq("event_type"))
        def parquets() = graft.TempTables.parquetFingerprint(table)
        val before = parquets()
        val n = graft.sinks.IcebergSink.convertFromDelta(s, table)
        val zeroCopy = n == before.size && parquets() == before
        val deltaCount = graft.sinks.DeltaSink.fileStats(s, table)
          .agg(sum(col("num_records"))).head().getLong(0)
        val iceCount = graft.sinks.IcebergSink.fileStats(s, table)
          .agg(sum(col("num_records"))).head().getLong(0)
        graft.sinks.IcebergSink.read(s, table).groupBy("event_type")
          .agg(count(lit(1)).as("n_rows"), fxSum(col("value")).as("sum_v"))
          .withColumn("zero_copy", lit(zeroCopy))
          .withColumn("counts_agree", lit(deltaCount == iceCount))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
             |    AS sum_v,
             |  TRUE AS zero_copy, TRUE AS counts_agree
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_iceberg_to_delta",
      // Iceberg→Delta IN-PLACE CONVERT under the oracle (r14, the reverse
      // of q_uniform_convert — the interop story in both directions):
      // events land as an identity-partitioned Iceberg table,
      // convertFromIceberg mints the standard two-commit _delta_log whose
      // adds reference the SAME parquet with manifest record counts as
      // stats and log-typed partition values, and the census reads
      // through the DELTA front-end (whose partitioned reader injects
      // partition values from the log per value group — the Iceberg
      // layout has no Hive-discoverable root). Gates: `zero_copy`
      // (parquet set byte-identical), `counts_agree` (Iceberg manifest
      // census ≡ Delta log-stats census, both metadata-only), census ≡
      // the raw oracle.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val table = graft.TempTables.create("graft-ice2delta") + "/tbl"
        graft.sinks.IcebergSink.write(ev, table,
          graft.sinks.IcebergSink.CreateExclusive, partitionBy = Seq("event_type"))
        def parquets() = graft.TempTables.parquetFingerprint(table)
        val before = parquets()
        val n = graft.sinks.DeltaSink.convertFromIceberg(s, table)
        val zeroCopy = n == before.size && parquets() == before
        val iceCount = graft.sinks.IcebergSink.fileStats(s, table)
          .agg(sum(col("num_records"))).head().getLong(0)
        val deltaCount = graft.sinks.DeltaSink.fileStats(s, table)
          .agg(sum(col("num_records"))).head().getLong(0)
        graft.sinks.DeltaSink.read(s, table).groupBy("event_type")
          .agg(count(lit(1)).as("n_rows"), fxSum(col("value")).as("sum_v"))
          .withColumn("zero_copy", lit(zeroCopy))
          .withColumn("counts_agree", lit(deltaCount == iceCount))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
             |    AS sum_v,
             |  TRUE AS zero_copy, TRUE AS counts_agree
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_uniform_sync",
      // UniForm CONTINUOUS SYNC under the oracle (r14, the second half of
      // q_uniform_convert): the even half lands as Delta and converts;
      // the odd half then arrives as a NORMAL Delta append — the Iceberg
      // view is stale (pinned by `was_stale`: its metadata census still
      // counts the even half) until syncFromDelta commits a `replace`
      // snapshot referencing the Delta log's current live files. Census
      // through the ICEBERG front-end must then equal the full corpus,
      // and a second sync is a no-op (`sync_noop` — path-set equality,
      // metadata-only). This is the operational UniForm loop at 100 TB:
      // Delta ingests continuously, the Iceberg ecosystem reads through
      // periodic metadata-only refreshes, zero data copies ever.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val table = graft.TempTables.create("graft-uniform-sync")
        graft.sinks.DeltaSink.write(ev.filter(col("event_id") % 2 === 0),
          table, overwrite = true, partitionBy = Seq("event_type"))
        graft.sinks.IcebergSink.convertFromDelta(s, table)
        graft.sinks.DeltaSink.append(ev.filter(col("event_id") % 2 === 1), table)
        val evenCount = graft.sinks.IcebergSink.fileStats(s, table)
          .agg(sum(col("num_records"))).head().getLong(0)
        val wasStale = graft.sinks.DeltaSink.fileStats(s, table)
          .agg(sum(col("num_records"))).head().getLong(0) > evenCount
        graft.sinks.IcebergSink.syncFromDelta(s, table)
        val syncNoop = graft.sinks.IcebergSink.syncFromDelta(s, table) == 0
        graft.sinks.IcebergSink.read(s, table).groupBy("event_type")
          .agg(count(lit(1)).as("n_rows"), fxSum(col("value")).as("sum_v"))
          .withColumn("was_stale", lit(wasStale))
          .withColumn("sync_noop", lit(syncNoop))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
             |    AS sum_v,
             |  TRUE AS was_stale, TRUE AS sync_noop
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_iceberg_rewrite_manifests",
      // REWRITE MANIFESTS under the oracle (r14): the metadata-plane
      // compaction every streaming-ingested table needs. Four appends
      // leave four data manifests (every query opens all four to plan) +
      // a MoR positional-delete manifest; rewriteManifests merges the
      // data manifests into ONE in a `replace` commit that touches no
      // data file. Gates: `manifests_merged` (>=4 → 1), `feed_empty`
      // (the incremental scan since the pre-rewrite snapshot sees ZERO
      // added files — the metadata-only proof), and the census must
      // equal the oracle's complement — which also proves the positional
      // delete still applies after the merge (entries keep their
      // original sequence numbers explicitly). At 100 TB: planning cost
      // drops from O(appends) manifest opens per query to O(1).
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val table = graft.TempTables.create("graft-iceberg-rwm") + "/tbl"
        graft.sinks.IcebergSink.write(ev.filter(col("event_id") % 4 === 0),
          table, graft.sinks.IcebergSink.CreateExclusive)
        (1 to 3).foreach(i =>
          graft.sinks.IcebergSink.write(ev.filter(col("event_id") % 4 === i),
            table, graft.sinks.IcebergSink.Append))
        graft.sinks.IcebergSink.deleteWhere(s, table, "event_id % 100 = 0")
        val preSnap = graft.sinks.IcebergSink.snapshots(table).last._1
        val (before, after) = graft.sinks.IcebergSink.rewriteManifests(table)
        val feedEmpty =
          graft.sinks.IcebergSink.readAppendedSince(s, table, preSnap).isEmpty
        graft.sinks.IcebergSink.read(s, table).groupBy("event_type")
          .agg(count(lit(1)).as("n_rows"), fxSum(col("value")).as("sum_v"))
          .withColumn("manifests_merged", lit(before >= 4 && after == 1))
          .withColumn("feed_empty", lit(feedEmpty))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
             |    AS sum_v,
             |  TRUE AS manifests_merged, TRUE AS feed_empty
             |FROM events WHERE event_id % 100 <> 0
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_iceberg_ref_retention",
      // PER-REF RETENTION POLICIES under the oracle (r14, spec §refs —
      // the lifecycle half of q_iceberg_refs): refs carry their OWN
      // expiry policy. A tag with max-ref-age-ms=1 ages out at the next
      // expireSnapshots — its pin releases and the snapshot it guarded
      // retires — while an ageless tag keeps pinning through the same
      // pass. Gates: `stale_dropped` (the aged ref is gone from the ref
      // list), `pin_kept` (the ageless one survives), `unpinned_expired`
      // (time travel to the released snapshot now throws — the pin
      // really was the only thing keeping it), and the kept tag's census
      // must equal the oracle's two-thirds recompute while main serves
      // the full corpus. At 100 TB this is how "keep every release tag
      // 90 days" runs as table metadata instead of an external cron list.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val table = graft.TempTables.create("graft-iceberg-refret") + "/tbl"
        graft.sinks.IcebergSink.write(ev.filter(col("event_id") % 3 === 0),
          table, graft.sinks.IcebergSink.CreateExclusive)
        val s0 = graft.sinks.IcebergSink.snapshots(table).last._1
        graft.sinks.IcebergSink.write(ev.filter(col("event_id") % 3 === 1),
          table, graft.sinks.IcebergSink.Append)
        val s1 = graft.sinks.IcebergSink.snapshots(table).last._1
        graft.sinks.IcebergSink.write(ev.filter(col("event_id") % 3 === 2),
          table, graft.sinks.IcebergSink.Append)
        graft.sinks.IcebergSink.createRef(table, "stale_tag", s0,
          maxRefAgeMs = Some(1L))
        graft.sinks.IcebergSink.createRef(table, "release_tag", s1)
        Thread.sleep(10)
        graft.sinks.IcebergSink.expireSnapshots(table, keepLast = 1)
        val refs = graft.sinks.IcebergSink.listRefs(table)
        val unpinnedExpired =
          try { graft.sinks.IcebergSink.read(s, table, Some(s0)).count(); false }
          catch { case _: IllegalArgumentException => true }
        val tagged = graft.sinks.IcebergSink.readRef(s, table, "release_tag")
          .groupBy("event_type").agg(count(lit(1)).as("n_tag"))
        graft.sinks.IcebergSink.read(s, table).groupBy("event_type")
          .agg(count(lit(1)).as("n_main"), fxSum(col("value")).as("v_main"))
          .join(tagged, Seq("event_type"), "full_outer")
          .select(col("event_type"),
            coalesce(col("n_main"), lit(0L)).as("n_main"),
            col("v_main"),
            coalesce(col("n_tag"), lit(0L)).as("n_tag"))
          .withColumn("stale_dropped", lit(!refs.contains("stale_tag")))
          .withColumn("pin_kept", lit(refs.contains("release_tag")))
          .withColumn("unpinned_expired", lit(unpinnedExpired))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_main,
             |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
             |    AS v_main,
             |  CAST(COUNT(*) FILTER (WHERE event_id % 3 <> 2) AS BIGINT) AS n_tag,
             |  TRUE AS stale_dropped, TRUE AS pin_kept, TRUE AS unpinned_expired
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_iceberg_rollback",
      // Iceberg ROLLBACK under the oracle — the format twin of
      // q_delta_restore: the even half bootstraps the table, a BAD append
      // lands the odd half, rollback() points the current ref back at the
      // first snapshot (pure metadata, O(1) at any table size), and the
      // corrected rerun appends the odd half again — carrying forward the
      // rolled-back-to snapshot's manifests, NOT the undone one's, so the
      // final census equals the whole corpus (the oracle) only if the
      // rollback really redirected the ref and the re-append really
      // continued from it. Gates: `rolled_match` (post-rollback census ≡
      // the even half), `bad_travels` (the undone snapshot still
      // time-travels: history preserved, not rewritten). The
      // undo-then-continue operational flow at 100 TB.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val table = graft.TempTables.create("graft-iceberg-rb") + "/tbl"
        def half(i: Int) = ev.filter(pmod(col("event_id"), lit(2)) === i)
        graft.sinks.IcebergSink.write(half(0), table,
          graft.sinks.IcebergSink.CreateExclusive, partitionBy = Seq("event_type"))
        val s0 = graft.sinks.IcebergSink.snapshots(table).last._1
        graft.sinks.IcebergSink.write(half(1), table,
          graft.sinks.IcebergSink.Append, partitionBy = Seq("event_type"))
        val s1 = graft.sinks.IcebergSink.snapshots(table).last._1
        graft.sinks.IcebergSink.rollback(table, s0)
        val rolled = graft.sinks.IcebergSink.read(s, table)
          .groupBy("event_type").agg(count(lit(1)).as("n_rolled"))
        val bad = graft.sinks.IcebergSink.read(s, table, Some(s1))
          .groupBy("event_type").agg(count(lit(1)).as("n_bad"))
        graft.sinks.IcebergSink.write(half(1), table,
          graft.sinks.IcebergSink.Append, partitionBy = Seq("event_type"))
        val direct = t(s, dir, "events").groupBy("event_type")
          .agg(count(lit(1)).as("n_rows"),
            count(when(col("event_id") % 2 === 0, 1)).as("n_even"))
        graft.sinks.IcebergSink.read(s, table)
          .groupBy("event_type").agg(count(lit(1)).as("n_back"))
          .join(direct, Seq("event_type"), "full_outer")
          .join(rolled, Seq("event_type"), "full_outer")
          .join(bad, Seq("event_type"), "full_outer")
          .select(col("event_type"),
            coalesce(col("n_back"), lit(0L)).as("n_rows_final"),
            (col("n_rolled") <=> col("n_even")).as("rolled_match"),
            (col("n_bad") <=> col("n_rows")).as("bad_travels"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows_final,
             |  TRUE AS rolled_match, TRUE AS bad_travels
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_iceberg_expire_audit",
      // The Iceberg RECLAMATION audit — the format twin of q_vacuum_audit:
      // create (even half) + append (odd half) + OVERWRITE (full corpus,
      // referencing only its own files) leaves the first two snapshots'
      // data files on disk purely for time travel; expireSnapshots
      // (keepLast=1) commits a metadata version without them and deletes
      // the files referenced ONLY by expired snapshots. Gates:
      // `files_reclaimed` (≥2 — the create's and the append's),
      // `disk_equals_live` (the parquet set under data/ after expiry is
      // EXACTLY the current manifest tree's file set — nothing leaked,
      // nothing over-deleted), `time_travel_fails` (reading the expired
      // first snapshot now throws, the retention contract by
      // construction), `census_match` (the data plane is untouched). The
      // same storage-bill audit as Delta vacuum, driven through
      // manifests instead of a log replay.
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "event_type", "value")
        val table = graft.TempTables.create("graft-iceberg-expire") + "/tbl"
        graft.sinks.IcebergSink.write(ev.filter(col("event_id") % 2 === 0),
          table, graft.sinks.IcebergSink.CreateExclusive,
          partitionBy = Seq("event_type"))
        val s0 = graft.sinks.IcebergSink.snapshots(table).head._1
        graft.sinks.IcebergSink.write(ev.filter(col("event_id") % 2 === 1),
          table, graft.sinks.IcebergSink.Append, partitionBy = Seq("event_type"))
        graft.sinks.IcebergSink.write(ev, table,
          graft.sinks.IcebergSink.Overwrite, partitionBy = Seq("event_type"))
        val reclaimed = graft.sinks.IcebergSink.expireSnapshots(table, keepLast = 1)
        def diskParquet(): Long = {
          def walk(f: java.io.File): Long =
            if (f.isDirectory)
              (if (f.getName == "metadata") 0L
               else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L))
            else if (f.getName.endsWith(".parquet")) 1L else 0L
          walk(new java.io.File(table))
        }
        val ttFails =
          try { graft.sinks.IcebergSink.read(s, table, Some(s0)); false }
          catch { case _: IllegalArgumentException => true }
        val postDisk = diskParquet()
        val gate = graft.sinks.IcebergSink.fileStats(s, table)
          .agg(count(lit(1)).as("n_live"))
          .select(
            lit(reclaimed >= 2).as("files_reclaimed"),
            (col("n_live") === postDisk).as("disk_equals_live"),
            lit(ttFails).as("time_travel_fails"))
        graft.sinks.IcebergSink.read(s, table)
          .groupBy("event_type").agg(count(lit(1)).as("n_back"))
          .join(t(s, dir, "events").groupBy("event_type")
            .agg(count(lit(1)).as("n_rows")), Seq("event_type"), "full_outer")
          .crossJoin(broadcast(gate))
          .select(col("event_type"), col("n_rows"),
            col("files_reclaimed"), col("disk_equals_live"),
            col("time_travel_fails"),
            (col("n_back") <=> col("n_rows")).as("census_match"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  TRUE AS files_reclaimed, TRUE AS disk_equals_live,
             |  TRUE AS time_travel_fails, TRUE AS census_match
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_stream_sketch",
      // Streaming distinct-count STATE as a mergeable sketch: each
      // micro-batch folds its per-type KMV theta sketch
      // (functions/ThetaSketch) into a KB-scale Delta state table —
      // unbounded-stream distinct counting whose state NEVER grows with
      // the stream (K×8 B per key group, vs the unbounded exact-distinct
      // state Structured Streaming would otherwise hold). KMV union is
      // associative, commutative and IDEMPOTENT, so the folded state is
      // bit-identical under ANY micro-batch split — and even under
      // at-least-once batch replay (re-merging a seen batch is a no-op):
      // the reprocessing tolerance that makes sketch state operationally
      // safe. Gates: per type the exact distinct (oracle),
      // `stream_matches_batch` — the streamed state equals the one-shot
      // batch sketch BIT-FOR-BIT — and `est_ok` at the 4σ KMV bound.
      (s, dir) => {
        import graft.functions.ThetaSketch
        import org.apache.spark.sql.streaming.Trigger
        val table = graft.TempTables.create("graft-stream-theta")
        def sketchOf(df: org.apache.spark.sql.DataFrame) = df
          .groupBy("event_type")
          .agg(ThetaSketch.sketch(
            ThetaSketch.hashFor(cents(col("value")))).as("sk"))
        graft.sinks.DeltaSink.write(sketchOf(t(s, dir, "events").limit(0)),
          table, overwrite = true)
        val q = graft.Tables.streamEvents(s, dir)
          .select("event_type", "value")
          .writeStream
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .foreachBatch {
            (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
              val bs = sketchOf(batch).withColumnRenamed("sk", "sk_b")
              val merged = graft.sinks.DeltaSink.read(batch.sparkSession, table)
                .join(bs, Seq("event_type"), "full_outer")
                .select(col("event_type"),
                  coalesce(
                    ThetaSketch.mergeCol(col("sk"), col("sk_b")),
                    col("sk_b"), col("sk")).as("sk"))
                // state is sketch-sized (K×8 B per key group) by
                // construction, so materializing it before the overwrite is
                // O(state), never O(stream) — and breaks the lineage onto
                // the very files the overwrite replaces
                .localCheckpoint(true)
              graft.sinks.DeltaSink.write(merged, table, overwrite = true): Unit
          }
          .start()
        q.awaitTermination()
        val state = graft.sinks.DeltaSink.read(s, table)
        val batchSk = sketchOf(t(s, dir, "events"))
          .withColumnRenamed("sk", "sk_batch")
        t(s, dir, "events").groupBy("event_type")
          .agg(countDistinct(cents(col("value"))).as("n_exact"))
          .join(state, Seq("event_type"), "full_outer")
          .join(batchSk, Seq("event_type"), "full_outer")
          .select(col("event_type"), col("n_exact"),
            (col("sk") <=> col("sk_batch")).as("stream_matches_batch"),
            (abs(ThetaSketch.estimateCol(col("sk")) - col("n_exact").cast("double"))
              / col("n_exact").cast("double") <
                lit(4 * 1.0 / math.sqrt(ThetaSketch.K - 2))).as("est_ok"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type,
             |  CAST(COUNT(DISTINCT CAST(ROUND(value*100) AS BIGINT)) AS BIGINT)
             |    AS n_exact,
             |  TRUE AS stream_matches_batch, TRUE AS est_ok
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),
  )
}
