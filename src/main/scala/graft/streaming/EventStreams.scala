package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analytics over an event stream `(ts, user, kind)` — the
  * Structured Streaming counterpart of the batch `events_hourly` query:
  * watermarked windowed aggregation (bounded state under late data) and
  * gap-based sessionization as a `flatMapGroupsWithState` custom-state
  * operator with an event-time timeout. At cluster scale both run as
  * keyed stateful operators: state is hash-partitioned by group key and
  * the watermark bounds how much of it survives each microbatch.
  */
object EventStreams {

  /** Tumbling `windowSize` counts per kind. The watermark caps state: a
    * window closes (and with OutputMode.Append emits exactly once) when
    * event time passes window end + `watermark`.
    */
  def windowedCounts(events: DataFrame, windowSize: String = "10 minutes",
                     watermark: String = "15 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowSize), col("kind"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("kind"), col("n"))

  /** Open-session state: millis bounds + event count. */
  case class SessionState(start: Long, last: Long, n: Int)

  /** A closed session. */
  case class SessionOut(user: String, start: Timestamp, end: Timestamp, events: Int)

  /** Gap sessionization: a user's session closes after `gapMs` of event-time
    * inactivity. Closure happens two ways, both exactly-once under Append:
    * in-line, when a later event of the same user arrives past the gap; and
    * by event-time timeout, when the watermark passes `last + gapMs` with no
    * further events. Out-of-order events inside one microbatch are sorted
    * before folding, so results do not depend on batch arrival order.
    */
  def sessions(events: Dataset[(Timestamp, String)], gapMs: Long,
               watermark: String = "10 seconds"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.toDF("ts", "user")
      .withWatermark("ts", watermark)
      .as[(Timestamp, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: String, it: Iterator[(Timestamp, String)],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(
              SessionOut(user, new Timestamp(s.start), new Timestamp(s.last), s.n))
          } else {
            val ts = it.map(_._1.getTime).toArray.sorted
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            ts.foreach { t =>
              cur = cur match {
                case Some(s) if t - s.last <= gapMs =>
                  // late-but-in-gap events extend the session backwards too
                  Some(SessionState(math.min(s.start, t), math.max(s.last, t), s.n + 1))
                case Some(s) =>
                  closed ::= SessionOut(user, new Timestamp(s.start),
                    new Timestamp(s.last), s.n)
                  Some(SessionState(t, t, 1))
                case None => Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.reverse.iterator
          }
      }
  }
}
