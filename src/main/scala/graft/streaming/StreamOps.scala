package graft.streaming

import graft.QueryDef._
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Structured-Streaming twins of the q_stream_* batch queries
  * (SURVEY.md §2.2). Each takes an events-shaped DataFrame — batch OR
  * streaming (e.g. from MemoryStream) — and returns the transformed frame;
  * Spark plans the stateful physical operators (stateful agg, session
  * state merge, dedup state store) when the input is a stream.
  *
  * Watermarks bound state at scale: with `withWatermark("ts", 1 hour)`,
  * window/session state older than the watermark is evicted, and
  * dropDuplicates keeps only in-watermark keys — mandatory for unbounded
  * topics at 100 TB/day.
  */
object StreamOps {

  def tumblingCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(dec(col("value"))).as("sum_v"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("event_type"), col("cnt"), col("sum_v"))

  def slidingCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("cnt"), sum(dec(col("value"))).as("sum_v"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("cnt"), col("sum_v"))

  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("cnt"), sum(dec(col("value"))).as("sum_v"))
      .select(col("user_id"), col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("cnt"), col("sum_v"))

  /** Stream-static enrichment join: the static dimension broadcasts and is
    * re-resolved every micro-batch (Spark's stream-static join contract —
    * dimension updates become visible without restarting the stream). The
    * join is STATELESS: no state store, no watermark on the static side —
    * which is what keeps it viable against an unbounded stream at scale.
    */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Stream-stream interval join (click→conversion attribution): each left
    * event pairs with right events of the SAME user whose timestamp falls
    * in [left.ts, left.ts + window] — the forward-window twin of
    * [[intervalJoin]] (which looks BACK from the left event), with the
    * events-table column contract baked in so it declares as q_stream_join. Both sides carry watermarks and the
    * join condition time-bounds the right side relative to the left, which
    * is exactly what Spark's stream-stream inner join needs to evict
    * matched state: per-key state is bounded by watermark + window, never
    * the whole topic. The same code runs in batch (watermark is a no-op)
    * — q_stream_join's DuckDB oracle checks that path.
    */
  def attributionJoin(left: DataFrame, right: DataFrame,
      window: String = "2 hours", watermark: String = "1 hour"): DataFrame = {
    // UUID'd internal key: a fixed name would collide with (and silently
    // replace) a user column
    val u = java.util.UUID.randomUUID().toString.take(8)
    val rUser = s"__graft_ruser_$u"
    val l = left.withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val r = right.withWatermark("ts", watermark)
      .select(col("user_id").as(rUser), col("event_id").as("buy_id"),
        col("ts").as("buy_ts"), col("value"))
    l.join(r, col("user_id") === col(rUser) &&
        col("buy_ts") >= col("click_ts") &&
        col("buy_ts") <= col("click_ts") + expr(s"INTERVAL $window"))
      .drop(rUser)
  }

  /** Watermark-bounded stream-stream LEFT OUTER attribution: clicks pair
    * with same-user purchases inside the forward window like
    * [[attributionJoin]], but UNMATCHED clicks are also emitted (null
    * purchase columns) — once the watermark establishes no matching
    * purchase can still arrive. This is the semantics Spark's outer
    * stream-stream join exists for: the null row CANNOT be emitted
    * eagerly (a match may still come), so emission happens on state
    * eviction, delayed by the watermark — StreamingSpec drives the timing
    * with two MemoryStreams.
    */
  def attributionJoinLeftOuter(left: DataFrame, right: DataFrame,
      window: String = "2 hours", watermark: String = "1 hour"): DataFrame = {
    val u = java.util.UUID.randomUUID().toString.take(8)
    val rUser = s"__graft_ruser_$u"
    val l = left.withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val r = right.withWatermark("ts", watermark)
      .select(col("user_id").as(rUser), col("event_id").as("buy_id"),
        col("ts").as("buy_ts"), col("value"))
    l.join(r, col("user_id") === col(rUser) &&
        col("buy_ts") >= col("click_ts") &&
        col("buy_ts") <= col("click_ts") + expr(s"INTERVAL $window"),
      "left_outer")
      .drop(rUser)
  }

  /** Streaming dedup on event_id bounded by a watermark — late duplicates
    * beyond the watermark are dropped from state (reference has no streaming
    * surface; this is the [ext] q_stream_dedup_watermark twin).
    */
  def dedupWithWatermark(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicates("event_id")

  /** Streaming aggregates → Delta: each micro-batch's complete aggregate
    * state overwrites the Delta table through the hand-rolled sink — the
    * streaming analogue of the reference's query→Delta pipeline (its Delta
    * sink is create/overwrite-only, delta_destination.rs:414-432, so
    * complete-mode overwrite is the parity-preserving semantic; an
    * append-commit sink would be the Iceberg path). Returns the started
    * query; callers own its lifecycle.
    */
  def aggregatesToDelta(aggregated: DataFrame, table: String): StreamingQuery =
    aggregated.writeStream
      .outputMode("complete")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        graft.sinks.DeltaSink.write(batch, table, overwrite = true): Unit
      }
      .start()

  /** Watermarked stream-stream interval join: each left event pairs with
    * right events of the same key whose timestamp lies in
    * [leftTs - `lookback`, leftTs] — the enrichment shape (clicks joined
    * to recent impressions). Both sides carry watermarks and the join
    * condition bounds event-time distance, so Spark can size and EVICT the
    * join state: without the time bound, stream-stream join state grows
    * forever. Column names must be disambiguated by the caller (the two
    * sides keep their own).
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      lookback: String = "1 hour", watermark: String = "1 hour"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $lookback") &&
        col(rightTs) <= col(leftTs))
  }

  /** Exactly-once streaming ingest: every micro-batch appends to the Delta
    * table as ONE OCC-committed log version carrying a `txn` action
    * (appId, batchId). If the query restarts and Spark replays a batch the
    * table already committed (crash between Delta commit and Spark
    * checkpoint — the classic at-least-once gap of foreachBatch), the
    * replay hits the txn watermark and becomes a no-op: end-to-end
    * exactly-once without any coordination beyond the table's own log.
    * This is the streaming analogue of the reference's pg→Delta load
    * (lib.rs:106-120): an unbounded source continuously loaded into a
    * lakehouse table. The target table must already exist (create it with
    * [[graft.sinks.DeltaSink.write]] — possibly empty — so the schema and
    * partition layout are declared before the stream starts).
    */
  def streamToDelta(stream: DataFrame, table: String,
      appId: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.sinks.DeltaSink.appendExactlyOnce(batch, table, appId, batchId): Unit
      }
      .start()

  /** Exactly-once streaming ingest into ICEBERG — the other sink format's
    * twin of [[streamToDelta]]: each micro-batch commits as one snapshot
    * stamped with (appId, batchId) in its summary, and replays of
    * already-committed batch ids no-op against the summary watermark
    * (IcebergSink.appendExactlyOnce). The target table must already exist.
    */
  def streamToIceberg(stream: DataFrame, table: String,
      appId: String, branch: Option[String] = None): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.sinks.IcebergSink.appendExactlyOnce(batch, table, appId,
          batchId, branch = branch): Unit
      }
      .start()

  /** Exactly-once streaming CDC UPSERT into Iceberg: each micro-batch
    * first reduces to its latest row per key under `orderCols`
    * (lexicographic, latest wins — include a unique tiebreak), then
    * applies as ONE atomic equality-delete upsert snapshot stamped with
    * (appId, batchId); a replayed batch id no-ops. No existing file is
    * rewritten per batch — the merge-on-read CDC-ingestion shape
    * ([[graft.sinks.IcebergSink.upsert]]); run OPTIMIZE on a cadence to
    * fold the accumulated delete files back into plain data files.
    */
  def streamUpsertToIceberg(stream: DataFrame, table: String, appId: String,
      keys: Seq[String], orderCols: Seq[String],
      checkpoint: Option[String] = None): StreamingQuery = {
    // Fail at WIRING time, not inside micro-batch N: an empty orderCols
    // yields an unordered row_number() window (AnalysisException every
    // batch), and a non-total order produces duplicate 'latest' rows that
    // then abort the batch in upsert's dup-key guard with a confusing
    // error. The caller must make the per-key order total — include a
    // unique tiebreak column (e.g. an event id) as the last entry.
    require(orderCols.nonEmpty,
      "streamUpsertToIceberg requires at least one order column " +
        "(lexicographic, latest wins; include a unique tiebreak so the " +
        "per-key order is total)")
    require(keys.nonEmpty, "streamUpsertToIceberg requires key columns")
    val writer = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val u = java.util.UUID.randomUUID().toString.take(8)
        val rnN = s"__rn_$u"
        val w = Window.partitionBy(keys.map(col): _*)
          .orderBy(orderCols.map(c => col(c).desc): _*)
        val latest = batch
          .withColumn(rnN, row_number().over(w))
          .filter(col(rnN) === 1).drop(rnN)
        graft.sinks.IcebergSink.upsertExactlyOnce(
          latest, table, appId, batchId, keys): Unit
      }
    checkpoint.foreach(c => writer.option("checkpointLocation", c))
    writer.start()
  }

  /** One micro-batch of CDC upsert (the body of [[upsertLatestToDelta]],
    * exposed so tests can drive replay semantics directly): the batch
    * reduces to its latest row per key under `orderCols` (lexicographic,
    * latest wins — include a unique tiebreak), rows OLDER than the target
    * table's current row for their key are dropped (newer-wins across
    * batches AND on at-least-once replay: re-applying any prefix of
    * already-applied batches is a no-op), and the survivors MERGE into the
    * Delta table by key. Per batch this is one window over batch-sized
    * data, one key-join against the table's current keys, and one merge
    * rewrite of only the touched files.
    */
  def upsertBatch(batch: Dataset[Row], table: String,
      keys: Seq[String], orderCols: Seq[String]): Unit = {
    val spark = batch.sparkSession
    val u = java.util.UUID.randomUUID().toString.take(8)
    val (rnN, ordN, curN) = (s"__rn_$u", s"__ord_$u", s"__cur_$u")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(c => col(c).desc): _*)
    val latest = batch
      .withColumn(rnN, row_number().over(w))
      .filter(col(rnN) === 1).drop(rnN)
      .withColumn(ordN, struct(orderCols.map(col): _*))
    val current = graft.sinks.DeltaSink.read(spark, table)
      .select(keys.map(col) :+ struct(orderCols.map(col): _*).as(curN): _*)
    val fresh = latest
      .join(current, keys, "left_outer")
      .filter(col(curN).isNull || col(ordN) >= col(curN))
      .drop(ordN, curN)
    if (!fresh.isEmpty)
      graft.sinks.DeltaSink.merge(spark, table, fresh, keys): Unit
  }

  /** Streaming CDC apply: maintain a latest-state-per-key Delta table from
    * an unbounded change stream — the upsert/materialized-view primitive
    * the reference's batch-only loader lacks. Each micro-batch runs
    * [[upsertBatch]]; the newer-wins guard makes replays idempotent, so
    * foreachBatch's at-least-once delivery yields an exactly-once TABLE
    * STATE. The target table must already exist with the stream's schema
    * (seed it with [[graft.sinks.DeltaSink.write]]).
    */
  def upsertLatestToDelta(stream: DataFrame, table: String,
      keys: Seq[String], orderCols: Seq[String]): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        upsertBatch(batch, table, keys, orderCols)
      }
      .start()
}
