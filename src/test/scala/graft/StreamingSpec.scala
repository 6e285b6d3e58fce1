package graft

import java.sql.Timestamp

import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

/** Structured-Streaming behavior of the q_stream_* twins via MemoryStream:
  * watermark-driven session closure and keyed dedup with late duplicates
  * (SURVEY.md §5.2.5 — no oracle exists for stateful semantics, so the
  * scenarios are constructed with explicit event-time skew).
  */
class StreamingSpec extends AnyFunSuite {
  private def ts(minutes: Long) = new Timestamp(minutes * 60000L)

  test("session windows: gap splits sessions; watermark emits closed ones") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamOps.sessionCounts(input.toDF(), gap = "30 minutes", watermark = "1 hour")
      .writeStream.format("memory").queryName("sessions").outputMode(OutputMode.Append).start()
    try {
      // user 1: events at t=0,10 (one session) and t=50 (a new session:
      // 50-10=40min >= 30min gap)
      input.addData(
        Ev(1, ts(0), 1, "c", 1.0), Ev(2, ts(10), 1, "c", 2.0), Ev(3, ts(50), 1, "c", 3.0))
      q.processAllAvailable()
      // advance watermark far past everything → both sessions close
      input.addData(Ev(99, ts(600), 2, "c", 0.0))
      q.processAllAvailable()
      val out = spark.table("sessions")
        .select("user_id", "s_start", "s_end", "cnt").where("user_id = 1")
        .orderBy("s_start").collect()
      assert(out.length == 2)
      assert(out(0).getTimestamp(1) == ts(0) && out(0).getTimestamp(2) == ts(40)) // last+gap
      assert(out(0).getLong(3) == 2)
      assert(out(1).getTimestamp(1) == ts(50) && out(1).getLong(3) == 1)
    } finally q.stop()
  }

  test("dedup with watermark drops in-watermark duplicate event_ids") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamOps.dedupWithWatermark(input.toDF(), watermark = "1 hour")
      .writeStream.format("memory").queryName("dedup").outputMode(OutputMode.Append).start()
    try {
      input.addData(Ev(1, ts(0), 1, "c", 1.0), Ev(2, ts(1), 1, "c", 2.0))
      q.processAllAvailable()
      // same event_ids again (duplicates within the watermark) + one new
      input.addData(Ev(1, ts(2), 1, "c", 1.0), Ev(3, ts(3), 1, "c", 3.0))
      q.processAllAvailable()
      val ids = spark.table("dedup").select("event_id").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("streaming aggregates land in a Delta table via complete-mode overwrite") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val table = java.nio.file.Files.createTempDirectory("graft-stream-delta").toString
    // no watermark: complete mode keeps all windows live so the Delta
    // snapshot always holds the full aggregate state
    val agg = input.toDF()
      .groupBy(org.apache.spark.sql.functions.window($"ts", "1 hour"), $"event_type")
      .count()
      .select($"window.start".as("w_start"), $"event_type", $"count")
    val q = StreamOps.aggregatesToDelta(agg, table)
    try {
      input.addData(Ev(1, ts(5), 1, "a", 1.0), Ev(2, ts(20), 1, "a", 2.0))
      q.processAllAvailable()
      assert(sinks.DeltaSink.read(spark, table).where("event_type = 'a'")
        .collect().map(_.getLong(2)).toSeq == Seq(2L))
      input.addData(Ev(3, ts(30), 1, "a", 3.0), Ev(4, ts(70), 1, "b", 4.0))
      q.processAllAvailable()
      val back = sinks.DeltaSink.read(spark, table).orderBy("event_type")
        .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
      assert(back == Seq(("a", 3L), ("b", 1L)))
    } finally q.stop()
  }

  test("tumbling counts run in streaming mode and match batch totals") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamOps.tumblingCounts(input.toDF())
      .writeStream.format("memory").queryName("tumbling").outputMode(OutputMode.Append).start()
    try {
      input.addData(Ev(1, ts(5), 1, "a", 1.0), Ev(2, ts(20), 1, "a", 2.0), Ev(3, ts(70), 1, "a", 4.0))
      q.processAllAvailable()
      input.addData(Ev(9, ts(600), 1, "z", 0.0)) // advance watermark
      q.processAllAvailable()
      val rows = spark.table("tumbling").where("event_type = 'a'")
        .select("w_start", "cnt").orderBy("w_start").collect()
      assert(rows.map(r => (r.getTimestamp(0), r.getLong(1))).toSeq ==
        Seq((ts(0), 2L), (ts(60), 1L)))
    } finally q.stop()
  }

  test("stream-static enrichment joins the broadcast dimension per micro-batch") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "GOLD"), (2L, "IRON")).toDF("user_id", "segment")
    val input = MemoryStream[Ev]
    val q = StreamOps.enrich(input.toDF(), dim, "user_id")
      .writeStream.format("memory").queryName("enriched").outputMode(OutputMode.Append).start()
    try {
      input.addData(Ev(1, ts(5), 1, "a", 1.0), Ev(2, ts(6), 2, "b", 2.0),
        Ev(3, ts(7), 99, "c", 3.0)) // no dimension row → NULL segment kept
      q.processAllAvailable()
      val rows = spark.table("enriched")
        .select("event_id", "segment").orderBy("event_id").collect()
      assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
        Seq((1L, "GOLD"), (2L, "IRON"), (3L, null)))
    } finally q.stop()
  }

  test("capped sessions (batch): a session splits at 10 events even with no gap") {
    val spark = TestSpark.spark
    import spark.implicits._
    // user 1: 25 events 1 minute apart (never a 30-min gap) → 10/10/5
    val evs = (0 until 25).map(i => Ev(i.toLong, ts(i.toLong), 1L, "c", 1.0))
    val out = graft.streaming.StatefulSessions.sessionizeBatch(evs.toDF())
      .orderBy("s_start").collect()
    assert(out.map(r => (r.getLong(3), r.getBoolean(5))).toSeq ==
      Seq((10L, true), (10L, true), (5L, false)))
    // sub-sessions chain: each starts at the event after the previous close
    assert(out.map(_.getTimestamp(1)).toSeq == Seq(ts(0), ts(10), ts(20)))
    assert(out.map(_.getDouble(4)).toSeq == Seq(10.0, 10.0, 5.0))
  }

  test("capped sessions (streaming): incremental output equals the batch fold") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = graft.streaming.StatefulSessions.sessionizeStream(input.toDF())
      .writeStream.format("memory").queryName("capped").outputMode(OutputMode.Append).start()
    // offset past epoch 0: the first micro-batch's inherited watermark is 0,
    // and events AT the watermark are treated as late and dropped
    def tso(m: Long) = ts(m + 1440)
    // user 1: 12 rapid events split across micro-batches (cap fires across
    // the batch boundary); user 2: two gap-separated sessions
    val batch1 = (0 until 7).map(i => Ev(i.toLong, tso(i.toLong), 1L, "c", 1.0)) ++
      Seq(Ev(100, tso(0), 2L, "c", 2.0))
    val batch2 = (7 until 12).map(i => Ev(i.toLong, tso(i.toLong), 1L, "c", 1.0)) ++
      Seq(Ev(101, tso(45), 2L, "c", 3.0))
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      input.addData(Ev(999, tso(600), 9L, "c", 0.0)) // watermark past everything
      q.processAllAvailable()
      input.addData(Ev(1000, tso(700), 9L, "c", 0.0)) // timeout flush pass
      q.processAllAvailable()
      val streamed = spark.table("capped").where("user_id < 9")
        .select("user_id", "s_start", "s_end", "cnt", "sum_v", "capped")
        .orderBy("user_id", "s_start").collect().map(_.toString).toSeq
      val batch = graft.streaming.StatefulSessions.sessionizeBatch(
          (batch1 ++ batch2).toDF())
        .select("user_id", "s_start", "s_end", "cnt", "sum_v", "capped")
        .orderBy("user_id", "s_start").collect().map(_.toString).toSeq
      assert(streamed == batch, s"streamed=$streamed\nbatch=$batch")
    } finally q.stop()
  }

  test("exactly-once streaming ingest: appends commit with txn actions, replays no-op") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val table = java.nio.file.Files.createTempDirectory("graft-stream-delta").toString
    // declare the table (schema) before the stream starts
    assert(graft.sinks.DeltaSink.write(
      Seq.empty[(Long, String)].toDF("event_id", "event_type"), table))
    val input = MemoryStream[Ev]
    val q = StreamOps.streamToDelta(
      input.toDF().select($"event_id", $"event_type"), table, appId = "ingest-test")
    try {
      input.addData(Ev(1, ts(0), 1, "a", 1.0), Ev(2, ts(1), 1, "b", 1.0))
      q.processAllAvailable()
      input.addData(Ev(3, ts(2), 2, "c", 1.0))
      q.processAllAvailable()
      val got = graft.sinks.DeltaSink.read(spark, table)
        .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == Seq(1L, 2L, 3L))
      // the commits carry txn actions; the watermark is the last batch id
      val wm = graft.sinks.DeltaSink.lastTxnVersion(spark, table, "ingest-test")
      assert(wm >= 1L)
      // a crash-replay of an already-committed batch must be a no-op
      val replayed = graft.sinks.DeltaSink.appendExactlyOnce(
        Seq((1L, "a")).toDF("event_id", "event_type"), table, "ingest-test", wm)
      assert(replayed == -1L)
      assert(graft.sinks.DeltaSink.read(spark, table).count() == 3)
      // but the next batch id goes through
      val v = graft.sinks.DeltaSink.appendExactlyOnce(
        Seq((4L, "d")).toDF("event_id", "event_type"), table, "ingest-test", wm + 1)
      assert(v > 0)
      assert(graft.sinks.DeltaSink.read(spark, table).count() == 4)
    } finally q.stop()
  }

  test("streamUpsertToIceberg rejects empty orderCols at wiring time (r13 advice)") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val e = intercept[IllegalArgumentException] {
      StreamOps.streamUpsertToIceberg(
        input.toDF(), "/nonexistent", appId = "x",
        keys = Seq("event_id"), orderCols = Nil)
    }
    assert(e.getMessage.contains("order column"))
  }

  test("streamUpsertToIceberg: latest-per-key per batch, one atomic snapshot each, exactly-once (r12)") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val table = java.nio.file.Files.createTempDirectory("graft-stream-ice-up").toString
    graft.sinks.IcebergSink.writeWithRetry(
      Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("event_id", "event_type", "value"),
      table, graft.sinks.IcebergSink.CreateExclusive)
    val input = MemoryStream[Ev]
    val q = StreamOps.streamUpsertToIceberg(
      input.toDF().select($"event_id", $"event_type", $"value", $"ts"),
      table, appId = "cdc-test", keys = Seq("event_id"), orderCols = Seq("ts"))
    try {
      // two versions of key 1 in ONE batch: the later ts must win;
      // key 3 is a genuine insert
      input.addData(Ev(1, ts(0), 1, "a", 10.0), Ev(1, ts(5), 1, "a", 11.0),
        Ev(3, ts(1), 1, "c", 3.0))
      q.processAllAvailable()
      val snaps1 = graft.sinks.IcebergSink.snapshots(table).length
      assert(snaps1 == 2, "one micro-batch = ONE atomic upsert snapshot")
      val afterB1 = graft.sinks.IcebergSink.read(spark, table)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      assert(afterB1 == Map(1L -> 11.0, 2L -> 2.0, 3L -> 3.0), s"got $afterB1")
      // second batch layers on the first
      input.addData(Ev(2, ts(6), 1, "b", 22.0))
      q.processAllAvailable()
      val afterB2 = graft.sinks.IcebergSink.read(spark, table)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      assert(afterB2 == Map(1L -> 11.0, 2L -> 22.0, 3L -> 3.0), s"got $afterB2")
      // crash-replay of an already-committed batch id no-ops
      val wm = graft.sinks.IcebergSink.lastTxnBatch(table, "cdc-test")
      assert(wm >= 1L)
      val replayed = graft.sinks.IcebergSink.upsertExactlyOnce(
        Seq((1L, "a", 999.0)).toDF("event_id", "event_type", "value"),
        table, "cdc-test", wm, Seq("event_id"))
      assert(replayed == -1L)
      assert(graft.sinks.IcebergSink.read(spark, table)
        .filter($"event_id" === 1L).head().getDouble(2) == 11.0)
    } finally q.stop()
  }

  test("session windows: a session ending EXACTLY at the watermark is emitted (boundary pin, r10)") {
    // The q_stream_session oracle filters to sessions with
    // s_end <= max(ts) (the final watermark at 0s delay) — this pins the
    // inclusive boundary: Spark evicts/emits a session whose end equals
    // the advanced watermark, so the SQL mirror must be <=, not <.
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamOps.sessionCounts(input.toDF(), gap = "30 minutes", watermark = "0 seconds")
      .writeStream.format("memory").queryName("sessions_boundary")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1's session: single event at t=0 → s_end = t=30min exactly;
      // user 2's event at t=30min drives the final watermark to exactly
      // 30min (0s delay)
      input.addData(Ev(1, ts(0), 1, "c", 1.0))
      q.processAllAvailable()
      input.addData(Ev(2, ts(30), 2, "c", 1.0))
      q.processAllAvailable()
      val out = spark.table("sessions_boundary")
        .select("user_id", "s_end").collect()
      assert(out.exists(r => r.getLong(0) == 1L && r.getTimestamp(1) == ts(30)),
        s"session ending at the watermark must be emitted; got ${out.mkString(",")}")
      // user 2's own session (ends 60min > watermark 30min) stays open
      assert(!out.exists(_.getLong(0) == 2L))
    } finally q.stop()
  }

  test("txn watermark survives a checkpoint") {
    val spark = TestSpark.spark
    import spark.implicits._
    val table = java.nio.file.Files.createTempDirectory("graft-txn-ckpt").toString
    assert(graft.sinks.DeltaSink.write(Seq((0L, "seed")).toDF("id", "s"), table))
    graft.sinks.DeltaSink.appendExactlyOnce(
      Seq((1L, "x")).toDF("id", "s"), table, "app-a", 7L)
    graft.sinks.DeltaSink.checkpoint(spark, table)
    assert(graft.sinks.DeltaSink.lastTxnVersion(spark, table, "app-a") == 7L)
    // replay of batch 7 after the checkpoint still no-ops
    assert(graft.sinks.DeltaSink.appendExactlyOnce(
      Seq((1L, "x")).toDF("id", "s"), table, "app-a", 7L) == -1L)
  }

  test("stream-stream interval join pairs events within the lookback, evicts beyond it") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val imps = MemoryStream[Ev]
    val joined = StreamOps.intervalJoin(
      clicks.toDF().select($"user_id".as("c_user"), $"ts".as("c_ts"), $"event_id".as("click_id")),
      imps.toDF().select($"user_id".as("i_user"), $"ts".as("i_ts"), $"event_id".as("imp_id")),
      "c_user", "i_user", "c_ts", "i_ts", lookback = "30 minutes")
    val q = joined.writeStream.format("memory").queryName("ivjoin")
      .outputMode(OutputMode.Append).start()
    try {
      // all event times sit inside the 1-hour watermark delay (so no batch
      // ordering can make a row late) and ABOVE the initial watermark
      // (epoch 0 — stateful operators drop rows with event time <= the
      // watermark, and the very first watermark is 0); matches are then
      // decided purely by the 30-minute lookback condition
      val t0 = 1000L
      imps.addData(Ev(100, ts(t0), 1, "imp", 0), Ev(101, ts(t0 + 25), 1, "imp", 0))
      clicks.addData(Ev(200, ts(t0 + 20), 1, "click", 0), Ev(201, ts(t0 + 55), 1, "click", 0))
      q.processAllAvailable()
      val out = spark.table("ivjoin").select("click_id", "imp_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(out.contains((200L, 100L))) // imp 20 min before the click
      assert(!out.contains((200L, 101L))) // that imp is after this click
      assert(out.contains((201L, 101L))) // imp 30 min before the click
      assert(!out.contains((201L, 100L))) // beyond the 30-minute lookback
    } finally q.stop()
  }

  test("vacuum deletes compacted-away files past retention, keeps live ones") {
    val spark = TestSpark.spark
    import spark.implicits._
    val table = java.nio.file.Files.createTempDirectory("graft-vacuum").toString
    assert(graft.sinks.DeltaSink.write(Seq((1L, "a")).toDF("id", "s"), table))
    (2 to 4).foreach { i =>
      graft.sinks.DeltaSink.append(Seq((i.toLong, s"r$i")).toDF("id", "s"), table)
    }
    val (before, after) = graft.sinks.DeltaSink.compact(spark, table)
    assert(before == 4 && after == 1)
    // retention 0: every tombstoned file is reclaimable immediately
    val deleted = graft.sinks.DeltaSink.vacuum(spark, table, retentionMs = 0L)
    assert(deleted == 4)
    // current snapshot unaffected
    assert(graft.sinks.DeltaSink.read(spark, table)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    // nothing left to reclaim on a second pass
    assert(graft.sinks.DeltaSink.vacuum(spark, table, retentionMs = 0L) == 0)
  }

  test("delta tail source: incremental versions delivered once, compaction not re-emitted") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.sinks.DeltaSink
    val table = java.nio.file.Files.createTempDirectory("graft-tail").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-tail-ckpt").toString
    assert(DeltaSink.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), table))

    // foreachBatch sink: the memory sink refuses checkpoint recovery, and
    // restarting from the SAME checkpoint is exactly what's under test
    def drain(): Seq[Long] = {
      val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val q = spark.readStream
        .format("graft-delta-tail")
        .option("path", table)
        .load()
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.select("id").collect().foreach(r => got.add(r.getLong(0)))
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      q.stop()
      import scala.jdk.CollectionConverters._
      got.asScala.toSeq.sorted
    }
    assert(drain() == Seq(1L, 2L))

    // two appends + an OPTIMIZE: the next run must deliver ONLY the new
    // rows — the compaction rewrite (dataChange=false) re-adds every row
    // under new file names and a feed that re-emitted them would
    // double-process each OPTIMIZE
    DeltaSink.append(Seq((3L, "c")).toDF("id", "s"), table)
    DeltaSink.append(Seq((4L, "d")).toDF("id", "s"), table)
    DeltaSink.compact(spark, table)
    assert(drain() == Seq(3L, 4L))

    // nothing new → empty incremental run
    assert(drain().isEmpty)
  }

  test("iceberg tail source: sequence offsets deliver once; rewriteManifests not re-emitted (r14)") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.sinks.IcebergSink
    val table = java.nio.file.Files.createTempDirectory("graft-itail").toString + "/tbl"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-itail-ckpt").toString
    IcebergSink.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), table,
      IcebergSink.CreateExclusive)

    def drain(): Seq[Long] = {
      val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val q = spark.readStream
        .format("graft-iceberg-tail")
        .option("path", table)
        .load()
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.select("id").collect().foreach(r => got.add(r.getLong(0)))
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      q.stop()
      import scala.jdk.CollectionConverters._
      got.asScala.toSeq.sorted
    }
    assert(drain() == Seq(1L, 2L))

    // two appends + a rewriteManifests: the metadata compaction's merged
    // manifest keeps per-entry sequences, so the next run delivers ONLY
    // the appended rows — never the whole table again
    IcebergSink.write(Seq((3L, "c")).toDF("id", "s"), table, IcebergSink.Append)
    IcebergSink.write(Seq((4L, "d")).toDF("id", "s"), table, IcebergSink.Append)
    IcebergSink.rewriteManifests(table)
    assert(drain() == Seq(3L, 4L))

    // nothing new → empty incremental run
    assert(drain().isEmpty)

    // a BRANCH commit must not reach the main-line feed: offsets are
    // main-head sequences, and the boundary snapshot is resolved exactly
    // — the unpublished WAP staging rows stay invisible until fastForward
    val head = IcebergSink.snapshots(table).last._1
    IcebergSink.createRef(table, "staged", head, refType = "branch")
    IcebergSink.appendBranch(Seq((99L, "staged")).toDF("id", "s"), table, "staged")
    assert(drain().isEmpty, "branch commit leaked into the main-line tail")
    IcebergSink.fastForward(table, "staged")
    assert(drain() == Seq(99L), "published rows must flow after fastForward")
  }

  test("iceberg tail source follows a named branch; fastForward hands over to main (r15)") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.sinks.IcebergSink
    val table = java.nio.file.Files.createTempDirectory("graft-btail").toString + "/tbl"
    IcebergSink.write(Seq((1L, "a")).toDF("id", "s"), table,
      IcebergSink.CreateExclusive)
    IcebergSink.createRef(table, "staging",
      IcebergSink.snapshots(table).last._1, refType = "branch")

    def drain(ckpt: String, branch: Option[String]): Seq[Long] = {
      val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val reader = spark.readStream
        .format("graft-iceberg-tail").option("path", table)
      val q = branch.fold(reader)(b => reader.option("branch", b)).load()
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.select("id").collect().foreach(r => got.add(r.getLong(0)))
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      q.stop()
      import scala.jdk.CollectionConverters._
      got.asScala.toSeq.sorted
    }
    val bCkpt = java.nio.file.Files.createTempDirectory("graft-btail-b").toString
    val mCkpt = java.nio.file.Files.createTempDirectory("graft-btail-m").toString
    // the branch tail bootstraps with the shared pre-branch history
    assert(drain(bCkpt, Some("staging")) == Seq(1L))
    // staged WAP commits feed the branch tail — the audit intake...
    IcebergSink.appendBranch(Seq((2L, "b")).toDF("id", "s"), table, "staging")
    IcebergSink.appendBranch(Seq((3L, "c")).toDF("id", "s"), table, "staging")
    assert(drain(bCkpt, Some("staging")) == Seq(2L, 3L))
    // ...while staying invisible to a main-line tail
    assert(drain(mCkpt, None) == Seq(1L))
    // publish: the main tail picks up exactly the staged sequences from
    // its own offset — nothing lost, nothing doubled across the handover
    IcebergSink.fastForward(table, "staging")
    assert(drain(mCkpt, None) == Seq(2L, 3L))
    // the branch head stopped advancing → the branch tail idles
    assert(drain(bCkpt, Some("staging")).isEmpty)
    // a typo'd branch fails loudly, never an empty feed
    assert(intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(java.nio.file.Files.createTempDirectory("graft-btail-x").toString,
        Some("stagnig"))
    }.getMessage != null)
  }

  test("branch-tail handover under an OCC race: a main commit between audit and publish refuses; rebase recovers exactly-once (r16)") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.sinks.IcebergSink
    val table = java.nio.file.Files.createTempDirectory("graft-btail-race")
      .toString + "/tbl"
    IcebergSink.write(Seq((1L, "a")).toDF("id", "s"), table,
      IcebergSink.CreateExclusive)
    IcebergSink.createRef(table, "staging",
      IcebergSink.snapshots(table).last._1, refType = "branch")
    def drain(ckpt: String, branch: Option[String]): Seq[Long] = {
      val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val reader = spark.readStream
        .format("graft-iceberg-tail").option("path", table)
      val q = branch.fold(reader)(b => reader.option("branch", b)).load()
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.select("id").collect().foreach(r => got.add(r.getLong(0)))
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      q.stop()
      import scala.jdk.CollectionConverters._
      got.asScala.toSeq.sorted
    }
    val bCkpt = java.nio.file.Files.createTempDirectory("graft-brace-b").toString
    val mCkpt = java.nio.file.Files.createTempDirectory("graft-brace-m").toString
    // audit intake consumes the staged batch
    IcebergSink.appendBranch(Seq((2L, "b")).toDF("id", "s"), table, "staging")
    assert(drain(bCkpt, Some("staging")) == Seq(1L, 2L))
    // THE RACE: a main-line commit lands between the audit tail's last
    // batch and the publish — the ancestry gate must REFUSE rather than
    // silently clobber main's new head
    IcebergSink.write(Seq((7L, "m")).toDF("id", "s"), table,
      IcebergSink.Append)
    val e = intercept[IllegalArgumentException](
      IcebergSink.fastForward(table, "staging"))
    assert(e.getMessage.contains("not a fast-forward"))
    // the refused publish leaves BOTH feeds consistent: main serves only
    // main-line rows, the branch tail saw only its staging rows — the
    // staged batch is neither lost from the branch nor leaked into main
    assert(drain(mCkpt, None) == Seq(1L, 7L))
    assert(drain(bCkpt, Some("staging")).isEmpty)
    assert(IcebergSink.read(spark, table).select("id").as[Long]
      .collect().toSet == Set(1L, 7L))
    // RESOLUTION (the gate's own message): rebase — re-stage the audited
    // batch on a fresh branch cut at main's NEW head, re-audit, publish
    IcebergSink.createRef(table, "staging2",
      IcebergSink.snapshots(table).last._1, refType = "branch")
    IcebergSink.appendBranch(Seq((2L, "b")).toDF("id", "s"), table, "staging2")
    IcebergSink.fastForward(table, "staging2")
    // the continuing main tail picks up EXACTLY the re-staged batch from
    // its own offset — nothing lost, nothing doubled across the race
    assert(drain(mCkpt, None) == Seq(2L))
    assert(IcebergSink.read(spark, table).select("id").as[Long]
      .collect().toSet == Set(1L, 2L, 7L))
  }

  test("delta-to-delta incremental pipeline is exactly-once end to end") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.sinks.DeltaSink
    val src = java.nio.file.Files.createTempDirectory("graft-e2e-src").toString
    val dst = java.nio.file.Files.createTempDirectory("graft-e2e-dst").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-e2e-ckpt").toString
    assert(DeltaSink.write(Seq((1L, "a")).toDF("id", "s"), src))
    assert(DeltaSink.write(Seq.empty[(Long, String)].toDF("id", "s"), dst))

    def run(): Unit = {
      val q = spark.readStream
        .format("graft-delta-tail").option("path", src).load()
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          DeltaSink.appendExactlyOnce(batch, dst, appId = "e2e-pipe", txnVersion = id)
          () // discard the version; foreachBatch wants Unit
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      q.stop()
    }
    run()
    DeltaSink.append(Seq((2L, "b")).toDF("id", "s"), src)
    run()
    // a replay of the last batch (simulating a crash after the Delta
    // commit but before Spark checkpointed) must no-op via the txn
    // watermark
    val replay = DeltaSink.readChangesBetween(spark, src,
      DeltaSink.latestVersion(src) - 1, DeltaSink.latestVersion(src))
    assert(DeltaSink.appendExactlyOnce(replay, dst, "e2e-pipe", 1L) == -1L)
    assert(DeltaSink.read(spark, dst).select("id").collect().map(_.getLong(0))
      .sorted.toSeq == Seq(1L, 2L))
  }

  test("stream-stream attribution join pairs in-window purchases only") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val buys = MemoryStream[Ev]
    val q = StreamOps.attributionJoin(clicks.toDF(), buys.toDF(),
        window = "30 minutes", watermark = "1 hour")
      .writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData(Ev(1, ts(10), 1, "click", 0.0), Ev(2, ts(10), 2, "click", 0.0))
      buys.addData(
        Ev(10, ts(20), 1, "purchase", 5.0),  // in window for click 1
        Ev(11, ts(50), 1, "purchase", 7.0),  // outside 30-min window
        Ev(12, ts(5), 2, "purchase", 9.0))   // BEFORE the click → no match
      q.processAllAvailable()
      val rows = spark.table("attrib")
        .select("user_id", "click_id", "buy_id").orderBy("user_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(rows.toSeq == Seq((1L, 1L, 10L)))
    } finally q.stop()
  }

  test("left-outer attribution emits unmatched clicks only after the watermark") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val buys = MemoryStream[Ev]
    val q = StreamOps.attributionJoinLeftOuter(clicks.toDF(), buys.toDF(),
        window = "30 minutes", watermark = "1 hour")
      .writeStream.format("memory").queryName("attrib_outer")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData(Ev(1, ts(10), 1, "click", 0.0), Ev(2, ts(10), 2, "click", 0.0))
      buys.addData(Ev(10, ts(20), 1, "purchase", 5.0)) // match for click 1 only
      q.processAllAvailable()
      val early = spark.table("attrib_outer").collect()
      // the unmatched click CANNOT appear yet — a purchase may still arrive
      assert(early.length == 1)
      // advance event time on BOTH inputs so the global watermark passes
      // click_ts + window + watermark, evicting click 2's state
      clicks.addData(Ev(3, ts(300), 3, "click", 0.0))
      buys.addData(Ev(11, ts(300), 99, "purchase", 1.0))
      q.processAllAvailable()
      val rows = spark.table("attrib_outer")
        .select("user_id", "click_id", "buy_id").orderBy("user_id").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2)))
      assert(rows.toSeq.contains((1L, 1L, 10L)), s"matched pair: ${rows.toSeq}")
      assert(rows.toSeq.contains((2L, 2L, -1L)),
        s"unmatched click must emit with nulls after eviction: ${rows.toSeq}")
    } finally q.stop()
  }

  test("count-min sketch aggregates across micro-batches (mergeable partial state)") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.CountMinSketch
    import org.apache.spark.sql.functions.col
    val input = MemoryStream[Ev]
    val q = input.toDF()
      .select(CountMinSketch.bucketsFor(col("event_type")).as("bk"))
      .agg(CountMinSketch.sketch(col("bk")).as("cms"))
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode(OutputMode.Complete).start()
    try {
      input.addData(Ev(1, ts(0), 1, "click", 0.0), Ev(2, ts(1), 1, "view", 0.0))
      q.processAllAvailable()
      input.addData(Ev(3, ts(2), 2, "click", 0.0))
      q.processAllAvailable()
      val cms = spark.table("cms_stream").collect().head.getSeq[Long](0)
      // mass accumulates across micro-batches: 3 rows × Depth counters
      assert(cms.sum == 3L * CountMinSketch.Depth)
    } finally q.stop()
  }

  test("dd-sketch aggregates across micro-batches: streaming p95 stays in bound (r8)") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.DdSketch
    import org.apache.spark.sql.functions.col
    val input = MemoryStream[Ev]
    val q = input.toDF()
      .select(DdSketch.slotFor(col("value")).as("s"))
      .agg(DdSketch.sketch(col("s")).as("sk"))
      .select(DdSketch.quantileCol(col("sk"), 0.95).as("p95"),
        org.apache.spark.sql.functions.aggregate(
          col("sk"), org.apache.spark.sql.functions.lit(0L), (a, c) => a + c).as("n"))
      .writeStream.format("memory").queryName("dd_stream")
      .outputMode(OutputMode.Complete).start()
    try {
      // two micro-batches of latency-like values 1..100
      input.addData((1 to 60).map(i => Ev(i, ts(i), 1, "m", i.toDouble)): _*)
      q.processAllAvailable()
      input.addData((61 to 100).map(i => Ev(i, ts(i), 1, "m", i.toDouble)): _*)
      q.processAllAvailable()
      val row = spark.table("dd_stream").collect().head
      assert(row.getLong(1) == 100L, "all rows across batches must accumulate")
      val p95 = row.getDouble(0)
      assert(math.abs(p95 - 95.0) / 95.0 <= DdSketch.Alpha + 1e-9,
        s"streaming p95=$p95 outside the alpha bound")
    } finally q.stop()
  }

  test("attribution join batch shape equals a plain interval self-join") {
    val spark = TestSpark.spark
    import spark.implicits._
    val evs = Seq(
      Ev(1, ts(0), 1, "click", 0.0), Ev(2, ts(25), 1, "purchase", 3.0),
      Ev(3, ts(90), 1, "purchase", 4.0), Ev(4, ts(10), 2, "click", 0.0))
    val df = evs.toDF()
    val out = StreamOps.attributionJoin(
        df.where("event_type = 'click'"), df.where("event_type = 'purchase'"),
        window = "30 minutes")
      .select("click_id", "buy_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L)))
  }

  test("exactly-once Iceberg ingest: snapshots carry the txn summary, replays no-op") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val table = java.nio.file.Files.createTempDirectory("graft-stream-iceberg").toString
    graft.sinks.IcebergSink.write(
      Seq((0L, "seed")).toDF("event_id", "event_type"),
      table, graft.sinks.IcebergSink.CreateExclusive)
    val input = MemoryStream[Ev]
    val q = StreamOps.streamToIceberg(
      input.toDF().select($"event_id", $"event_type"), table, appId = "ice-ingest")
    try {
      input.addData(Ev(1, ts(0), 1, "a", 1.0), Ev(2, ts(1), 1, "b", 1.0))
      q.processAllAvailable()
      input.addData(Ev(3, ts(2), 2, "c", 1.0))
      q.processAllAvailable()
      val got = graft.sinks.IcebergSink.read(spark, table)
        .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == Seq(0L, 1L, 2L, 3L))
      val wm = graft.sinks.IcebergSink.lastTxnBatch(table, "ice-ingest")
      assert(wm >= 1L)
      // crash-replay of an already-committed batch must be a no-op
      val replayed = graft.sinks.IcebergSink.appendExactlyOnce(
        Seq((1L, "a")).toDF("event_id", "event_type"), table, "ice-ingest", wm)
      assert(replayed == -1L)
      assert(graft.sinks.IcebergSink.read(spark, table).count() == 4)
      // a different app's watermark is independent
      assert(graft.sinks.IcebergSink.lastTxnBatch(table, "other-app") == -1L)
      // the next batch id commits
      val seq2 = graft.sinks.IcebergSink.appendExactlyOnce(
        Seq((4L, "d")).toDF("event_id", "event_type"), table, "ice-ingest", wm + 1)
      assert(seq2 > 0)
      assert(graft.sinks.IcebergSink.read(spark, table).count() == 5)
    } finally q.stop()
  }

  test("CDC upsert stream: newer wins across batches, replay is a no-op") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val table = java.nio.file.Files.createTempDirectory("graft-upsert-delta").toString
    assert(graft.sinks.DeltaSink.write(
      Seq.empty[Ev].toDF(), table, overwrite = true))
    def state(): Map[Long, (Long, String)] =
      graft.sinks.DeltaSink.read(spark, table)
        .select("user_id", "event_id", "event_type").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val input = MemoryStream[Ev]
    val q = StreamOps.upsertLatestToDelta(input.toDF(), table,
      keys = Seq("user_id"), orderCols = Seq("ts", "event_id"))
    try {
      // batch 1: user 1 has two events — only the latest lands
      input.addData(Ev(1, ts(0), 1, "view", 1.0), Ev(2, ts(5), 1, "click", 1.0),
        Ev(3, ts(1), 2, "view", 1.0))
      q.processAllAvailable()
      assert(state() == Map(1L -> (2L, "click"), 2L -> (3L, "view")))
      // batch 2: a NEWER event for user 1 updates; an OLDER (late) event
      // for user 2 must NOT regress its state
      input.addData(Ev(4, ts(9), 1, "purchase", 1.0), Ev(5, ts(0), 2, "error", 1.0))
      q.processAllAvailable()
      assert(state() == Map(1L -> (4L, "purchase"), 2L -> (3L, "view")))
      // same-timestamp tie: higher event_id wins (orderCols tiebreak)
      input.addData(Ev(6, ts(9), 1, "click", 1.0))
      q.processAllAvailable()
      assert(state()(1L) == (6L, "click"))
    } finally q.stop()
    // at-least-once replay: re-applying an already-applied batch directly
    // leaves the table state unchanged
    val before = state()
    StreamOps.upsertBatch(
      Seq(Ev(4, ts(9), 1, "purchase", 1.0), Ev(5, ts(0), 2, "error", 1.0)).toDF(),
      table, keys = Seq("user_id"), orderCols = Seq("ts", "event_id"))
    // user 1's replayed row (ts9, id4) is older than current (ts9, id6)
    // under the lexicographic order; user 2's is older outright — both drop
    assert(state() == before)
  }

  test("streaming WAP: exactly-once micro-batches land on a branch, publish promotes (r14)") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val table = java.nio.file.Files.createTempDirectory("graft-stream-wap").toString
    graft.sinks.IcebergSink.write(
      Seq((0L, "seed")).toDF("event_id", "event_type"),
      table, graft.sinks.IcebergSink.CreateExclusive)
    val cut = graft.sinks.IcebergSink.snapshots(table).last._1
    graft.sinks.IcebergSink.createRef(table, "live", cut, refType = "branch")
    val input = MemoryStream[Ev]
    val q = StreamOps.streamToIceberg(
      input.toDF().select($"event_id", $"event_type"), table,
      appId = "wap-ingest", branch = Some("live"))
    try {
      input.addData(Ev(1, ts(0), 1, "a", 1.0), Ev(2, ts(1), 1, "b", 1.0))
      q.processAllAvailable()
      input.addData(Ev(3, ts(2), 2, "c", 1.0))
      q.processAllAvailable()
      // main serves only the seed until a publish; the branch has the stream
      assert(graft.sinks.IcebergSink.read(spark, table).count() == 1)
      assert(graft.sinks.IcebergSink.readRef(spark, table, "live").count() == 4)
      // replay of a committed batch id no-ops on the branch too
      val wm = graft.sinks.IcebergSink.lastTxnBatch(table, "wap-ingest")
      assert(wm >= 1L)
      assert(graft.sinks.IcebergSink.appendExactlyOnce(
        Seq((1L, "a")).toDF("event_id", "event_type"), table, "wap-ingest",
        wm, branch = Some("live")) == -1L)
      // an EMPTY next batch commits nothing and returns the no-op sentinel
      assert(graft.sinks.IcebergSink.appendExactlyOnce(
        Seq.empty[(Long, String)].toDF("event_id", "event_type"), table,
        "wap-ingest", wm + 1, branch = Some("live")) == 0L)
      assert(graft.sinks.IcebergSink.readRef(spark, table, "live").count() == 4)
      // publish: main fast-forwards to the audited stream head
      graft.sinks.IcebergSink.fastForward(table, "live")
      assert(graft.sinks.IcebergSink.read(spark, table)
        .select("event_id").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(0L, 1L, 2L, 3L))
    } finally q.stop()
  }
}
