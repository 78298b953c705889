package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}
import java.sql.Timestamp

/** Structured Streaming surface (SURVEY §2.7 — absent in the reference,
  * required by the engine checklist): event-time tumbling windows with
  * watermarks, and gap-based stateful sessionization.
  *
  * The batch/stream duality is deliberate: [[hourlyCounts]] over a stream
  * produces exactly the rows of the batch `events_hourly` query (the
  * oracle pins this via a memory-sink run in `streaming_hourly`), and
  * [[Sessionize.streaming]] is the stateful twin of the window-function
  * batch formulation in the `sessionize_events` query. At scale the
  * streaming path shuffles by user/group key once per trigger and keeps
  * per-key state O(1) — the standard Structured Streaming contract.
  */
object EventsStream {
  /** Tumbling 1-hour event-time aggregation (streaming or batch frame). */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("total_value"))
  }

  final case class Event(user_id: Long, ts: Timestamp, value: Double)
  final case class Session(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Long,
                           total_value: Double)

  /** Mutable-session accumulator (top-level in the object: deeper nesting
    * breaks the Catalyst encoder's codegen constructor lookup). */
  private[streaming] final case class State(start: Long, end: Long, n: Long,
                                            value: Double)

  /** Gap-based sessionization. */
  object Sessionize {

    /** Streaming form: per-user state via flatMapGroupsWithState; closes a
      * session when the event-time watermark passes `gapMs` after its last
      * event (or on state timeout). Input must carry a watermark.
      * Cross-batch late arrivals (inside the watermark): an event within a
      * gap of the open session merges into it (extending its start
      * backwards if needed); an event more than a gap before the open
      * session's start closes immediately as a singleton session — exact
      * only if no sibling of that earlier session is still in flight,
      * the standard bounded-lateness trade-off of single-pass streaming
      * sessionization. In-order streams match the batch twin exactly. */
    def streaming(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
      import events.sparkSession.implicits._
      events.groupByKey(_.user_id)
        .flatMapGroupsWithState[State, Session](
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
          (user: Long, it: Iterator[Event], state: GroupState[State]) =>
            if (state.hasTimedOut) {
              val s = state.get
              state.remove()
              Iterator.single(Session(user, new Timestamp(s.start),
                new Timestamp(s.end), s.n, s.value))
            } else {
              val sorted = it.toSeq.sortBy(_.ts.getTime)
              var closed = List.empty[Session]
              var cur = state.getOption
              sorted.foreach { e =>
                val t = e.ts.getTime
                cur match {
                  // within a gap of the open session on EITHER side:
                  // merge, extending start back for a cross-batch late
                  // arrival (in-batch events are sorted, so only late
                  // arrivals can precede the open start)
                  case Some(s)
                      if t - s.end <= gapMs && t >= s.start - gapMs =>
                    cur = Some(State(math.min(s.start, t),
                      math.max(s.end, t), s.n + 1, s.value + e.value))
                  // a late arrival more than a gap BEFORE the open
                  // session: a session of its own, closed immediately
                  // (the open session is not its successor's business)
                  case Some(s) if t < s.start - gapMs =>
                    closed ::= Session(user, new Timestamp(t),
                      new Timestamp(t), 1, e.value)
                  case Some(s) =>
                    closed ::= Session(user, new Timestamp(s.start),
                      new Timestamp(s.end), s.n, s.value)
                    cur = Some(State(t, t, 1, e.value))
                  case None =>
                    cur = Some(State(t, t, 1, e.value))
                }
              }
              cur.foreach { s =>
                state.update(s)
                state.setTimeoutTimestamp(s.end + gapMs)
              }
              closed.reverseIterator
            }
        }
    }
  }
}
