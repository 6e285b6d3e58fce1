package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Capped sessionization — the custom stateful operator the built-in
  * `session_window` cannot express: a session closes on a 30-minute gap OR
  * when it reaches `maxEvents` events, whichever comes first (the
  * "bound-the-blast-radius" variant every abuse/rate pipeline wants, since a
  * bot that never pauses would otherwise grow one unbounded session).
  *
  * The session fold is one pure function ([[sessionize]]) used by BOTH
  * execution shapes, so streaming incrementality is testable against the
  * batch truth:
  *  - batch: `groupByKey(user).flatMapGroups` (q_session_capped, with an
  *    exact gaps-and-islands DuckDB oracle);
  *  - streaming: `flatMapGroupsWithState` with EventTimeTimeout — open
  *    sessions live in the state store across micro-batches and are flushed
  *    when the watermark passes start + gap (StreamingSpec drives it through
  *    MemoryStream).
  *
  * Scale: one shuffle on user_id; state per key is a single open session
  * (constant size — the closed ones are emitted immediately), evicted by
  * event-time timeout. Sums are exact scaled longs (QueryDef.cents
  * rationale), emitted once as double.
  */
object StatefulSessions {
  /** All session arithmetic runs in epoch MICROseconds — events.ts carries
    * microsecond precision and java.sql.Timestamp.getTime would truncate to
    * milliseconds.
    */
  val GapUs: Long = 30L * 60 * 1000 * 1000
  val MaxEvents: Int = 10

  case class Ev(user_id: Long, ts: Timestamp, event_id: Long, value: Double)

  /** Exact epoch micros from a Timestamp (getTime alone truncates to ms). */
  private def us(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
  case class Open(startUs: Long, lastUs: Long, cnt: Long, sumCents: Long)
  case class Session(user_id: Long, start_us: Long, end_us: Long,
      cnt: Long, sum_v: Double, capped: Boolean)

  private def close(uid: Long, o: Open): Session =
    Session(uid, o.startUs, o.lastUs + GapUs,
      o.cnt, o.sumCents / 100.0, capped = o.cnt >= MaxEvents)

  private def fold(uid: Long, evs: Iterator[Ev], open: Option[Open])
      : (Seq[Session], Option[Open]) = {
    var cur = open
    val out = Seq.newBuilder[Session]
    evs.foreach { e =>
      val t = us(e.ts)
      val c = math.round(e.value * 100) // exact: corpus values carry ≤2 digits
      cur match {
        case Some(o) if t - o.lastUs < GapUs && o.cnt < MaxEvents =>
          cur = Some(Open(o.startUs, t, o.cnt + 1, o.sumCents + c))
        case Some(o) =>
          out += close(uid, o)
          cur = Some(Open(t, t, 1, c))
        case None =>
          cur = Some(Open(t, t, 1, c))
      }
    }
    (out.result(), cur)
  }

  /** long-micros Session columns → user-facing timestamps. */
  private def toTimestamps(df: DataFrame): DataFrame =
    df.select(col("user_id"),
      timestamp_micros(col("start_us")).as("s_start"),
      timestamp_micros(col("end_us")).as("s_end"),
      col("cnt"), col("sum_v"), col("capped"))

  /** Batch shape: events sorted per user, fold, emit every session. */
  def sessionizeBatch(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    toTimestamps(events
      .select(col("user_id"), col("ts"), col("event_id"), col("value")).as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroups { (uid, it) =>
        val sorted = it.toSeq.sortBy(e => (us(e.ts), e.event_id)).iterator
        val (closed, open) = fold(uid, sorted, None)
        (closed ++ open.map(close(uid, _))).iterator
      }
      .toDF())
  }

  /** Streaming shape: open sessions persist in the state store; the
    * event-time timeout (watermark past lastMs + gap) flushes them. Within a
    * micro-batch events are sorted; across batches the watermark bounds
    * disorder, exactly like the built-in session_window contract.
    */
  def sessionizeStream(events: DataFrame, watermark: String = "1 hour"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    toTimestamps(events.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), col("event_id"), col("value")).as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
        (uid: Long, it: Iterator[Ev], state: GroupState[Open]) => {
          if (it.isEmpty && state.hasTimedOut) {
            val done = state.getOption.map(close(uid, _))
            state.remove()
            done.iterator
          } else {
            val sorted = it.toSeq.sortBy(e => (us(e.ts), e.event_id)).iterator
            val (closed, open) = fold(uid, sorted, state.getOption)
            open match {
              case Some(o) =>
                state.update(o)
                state.setTimeoutTimestamp((o.lastUs + GapUs) / 1000) // ms API
              case None => state.remove()
            }
            closed.iterator
          }
        })(Encoders.product[Open], Encoders.product[Session])
      .toDF())
  }
}
