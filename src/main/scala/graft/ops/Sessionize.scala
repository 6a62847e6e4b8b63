package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sessionization over an event stream — the classic gap-based session
  * operator in both execution styles:
  *
  *  - [[byGap]]: batch/SQL formulation (lag + cumulative sum over a
  *    user window) — oracle-checkable, used by `q_sessionize`;
  *  - [[streaming]]: `flatMapGroupsWithState` with processing-time
  *    timeout — the Structured Streaming stateful form for unbounded
  *    input (the reference has no stateful ops — T4 — this is a
  *    north-star extension).
  *
  * Scale: both shapes shuffle once on `user_id`. The batch window
  * sorts within user partitions (Spark's window exec spills); the
  * streaming form keeps O(1) state per key.
  */
object Sessionize {

  /** Batch gap sessionization. `tsMicrosCol` is an epoch-microseconds
    * long column (timestamps stay integral end-to-end — no
    * double-precision timestamps). Emits one row per session.
    */
  def byGap(events: DataFrame, gapSeconds: Long,
            userCol: String = "user_id",
            tsMicrosCol: String = "ts_us",
            idCol: String = "event_id"): DataFrame = {
    val order = Window.partitionBy(userCol)
      .orderBy(col(tsMicrosCol).asc, col(idCol).asc)
    val running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("prev_ts", lag(col(tsMicrosCol), 1).over(order))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col(tsMicrosCol) - col("prev_ts") > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(running))
      .groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsMicrosCol)).as("session_start_us"),
        max(col(tsMicrosCol)).as("session_end_us"),
        min(col(idCol)).as("first_event_id"))
  }

  case class Event(userId: Long, tsMicros: Long, eventId: Long)
  case class SessionState(start: Long, last: Long, n: Long, firstId: Long)
  case class Session(userId: Long, sessionStartUs: Long, sessionEndUs: Long,
                     nEvents: Long, firstEventId: Long)

  /** Pure gap-session fold shared by the flatMapGroupsWithState and
    * transformWithState operators (one algorithm, two state APIs):
    * merge the carried open session with this batch's events as
    * INTERVALS, standard gap merge over (start, firstId)-sorted spans.
    * In-watermark LATE events are the whole point of the interval
    * form — a naive "last = e.ts" fold would REWIND the open session's
    * end below its start (inverted sessions) and split contiguous
    * sessions; here a late event extends `start` backwards, never
    * drags `last` down, and a late event more than a gap BEFORE the
    * open session forms its own, immediately-closed session. Returns
    * (closed sessions in ascending start order, the still-open state —
    * always the latest span).
    */
  def foldSessions(key: Long, prev: Option[SessionState],
                   events: Seq[TimedEvent], gapUs: Long)
      : (List[Session], Option[SessionState]) = {
    if (events.isEmpty) return (Nil, prev)
    val evs = events.sortBy(e => (e.tsMicros, e.eventId))
      .map(e => SessionState(e.tsMicros, e.tsMicros, 1, e.eventId))
    val all = (prev.toList ++ evs).sortBy(s => (s.start, s.firstId))
    var merged = List.empty[SessionState] // reverse order (head latest)
    all.foreach { iv =>
      merged match {
        case h :: t if iv.start <= h.last + gapUs =>
          merged = h.copy(last = math.max(h.last, iv.last),
            n = h.n + iv.n) :: t
        case _ => merged = iv :: merged
      }
    }
    val closed = merged.tail.reverse
      .map(s => Session(key, s.start, s.last, s.n, s.firstId))
    (closed, Some(merged.head))
  }

  /** Streaming sessionization: a session closes (and is emitted) when
    * a later event for the same user arrives more than `gapSeconds` of
    * *event time* after the session's last event. State per key is one
    * open session (O(1)). Event-time gap closure keeps the operator
    * deterministic and replayable; a production deployment that also
    * needs idle-key flushing adds `GroupStateTimeout` timers on top —
    * orthogonal to the session logic and deliberately left out of the
    * deterministic core.
    */
  def streaming(events: Dataset[Event], gapSeconds: Long): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessionState]
    events.groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event],
         state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.tsMicros, e.eventId))
          var closed = List.empty[Session]
          var cur = state.getOption
          sorted.foreach { e =>
            cur match {
              case Some(s) if e.tsMicros - s.last <= gapSeconds * 1000000L =>
                cur = Some(s.copy(last = e.tsMicros, n = s.n + 1))
              case Some(s) =>
                closed ::= Session(userId, s.start, s.last, s.n, s.firstId)
                cur = Some(SessionState(e.tsMicros, e.tsMicros, 1, e.eventId))
              case None =>
                cur = Some(SessionState(e.tsMicros, e.tsMicros, 1, e.eventId))
            }
          }
          cur.foreach(state.update)
          closed.reverseIterator
      }
  }

  case class TimedEvent(userId: Long, tsMicros: Long, eventId: Long,
                        ts: java.sql.Timestamp)

  /** Streaming sessionization with idle-key flushing: like
    * [[streaming]], but a watermark plus event-time timers close a
    * session once the watermark passes `last + gap` — a key that never
    * sends another event still emits its final session, and state for
    * dead keys is dropped (the unbounded-key-space requirement at
    * 100 TB: without timers, one-visit users leak state forever).
    *
    * Still deterministic: timers fire on watermark progress (event
    * time), never on wall-clock.
    */
  def streamingWithFlush(events: Dataset[Event], gapSeconds: Long,
                         watermarkDelay: String = "0 seconds"
                        ): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val timedEnc = Encoders.product[TimedEvent]
    val gapUs = gapSeconds * 1000000L
    events
      .withColumn("ts", timestamp_micros(col("tsMicros")))
      .withWatermark("ts", watermarkDelay)
      .as[TimedEvent]
      .groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[TimedEvent],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last+gap with no new events: final flush
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.start, s.last, s.n, s.firstId))
          } else {
            val (foldClosed, cur) =
              foldSessions(userId, state.getOption, rows.toSeq, gapUs)
            var closed = foldClosed.reverse // keep ascending on emit
            cur.foreach { s =>
              val closeAtMs = s.last / 1000 + gapSeconds * 1000
              if (closeAtMs <= state.getCurrentWatermarkMs()) {
                // another key already advanced the watermark past this
                // session's gap — it is closed on arrival (timers must
                // be set strictly beyond the current watermark)
                closed ::= Session(userId, s.start, s.last, s.n, s.firstId)
                if (state.exists) state.remove()
              } else {
                state.update(s)
                state.setTimeoutTimestamp(closeAtMs)
              }
            }
            closed.reverseIterator
          }
      }
  }
}
