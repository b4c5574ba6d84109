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

  /** One open session: millis bounds + event count. */
  case class SessionState(start: Long, last: Long, n: Int)

  /** All of a user's in-flight sessions (late events can open a session
    * BEHIND an existing one, so state is a set, not a single session).
    */
  case class OpenSessions(sessions: List[SessionState])

  /** A closed session. */
  case class SessionOut(user: String, start: Timestamp, end: Timestamp, events: Int)

  /** Batch twin of [[sessions]] — gap sessionization as gaps-and-islands
    * window functions over a static event table: a new session starts where
    * the gap to the previous event (per user) EXCEEDS `gapMs` (an event at
    * exactly gap distance still extends, matching the streaming merge
    * predicate `t <= last + gapMs`). Runs as two window passes + one
    * aggregation, all partitioned on the user key — one shuffle, linear in
    * events, same plan shape at any scale. With a complete input the output
    * equals [[sessions]]' for every admissible arrival order
    * (EventStreamsSpec cross-checks the two on one fixture).
    * `events`: (userCol, tsCol) rows. Returns (user, start, end, events).
    */
  def sessionsBatch(events: DataFrame, userCol: String, tsCol: String,
                    gapMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user").orderBy("ts")
    // microsecond arithmetic: casting a timestamp to long truncates to
    // seconds, which would mis-bucket sub-second gaps. The inner
    // cast("timestamp") admits TIMESTAMP_NTZ inputs (parquet default),
    // interpreting wall clock in the session timezone — run with a fixed-
    // offset session timezone (UTC) for NTZ data.
    val micros = unix_micros(col("ts").cast("timestamp"))
    events.select(col(userCol).as("user"), col(tsCol).as("ts"))
      .withColumn("brk",
        when(micros - lag(micros, 1).over(w) > gapMs * 1000L, 1).otherwise(0))
      .withColumn("sess", sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user", "sess")
      .agg(min("ts").as("start"), max("ts").as("end"),
        count(lit(1)).as("events"))
      .drop("sess")
  }

  /** Gap sessionization: a user's session closes after `gapMs` of event-time
    * inactivity. A session is emitted (exactly once, Append) only when the
    * watermark passes `last + gapMs` — never eagerly on the next event —
    * because an in-gap LATE event may still arrive and extend or bridge it.
    * Each event merges every in-flight session within `gapMs` of it (an
    * event can bridge two sessions into one); state is bounded by the
    * watermark, which finalizes sessions on data or timeout invocations
    * alike. Results are independent of how events split across microbatches
    * for any arrival order the watermark admits.
    */
  def sessions(events: Dataset[(Timestamp, String)], gapMs: Long,
               watermark: String = "10 seconds"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.toDF("ts", "user")
      .withWatermark("ts", watermark)
      .as[(Timestamp, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[OpenSessions, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: String, it: Iterator[(Timestamp, String)],
         state: GroupState[OpenSessions]) =>
          val wm = state.getCurrentWatermarkMs()
          var open = state.getOption.map(_.sessions).getOrElse(Nil)
          if (!state.hasTimedOut) {
            it.map(_._1.getTime).toArray.sorted.foreach { t =>
              val (near, far) = open.partition(s =>
                t >= s.start - gapMs && t <= s.last + gapMs)
              val merged = near.foldLeft(SessionState(t, t, 1)) { (a, s) =>
                SessionState(math.min(a.start, s.start),
                  math.max(a.last, s.last), a.n + s.n)
              }
              open = merged :: far
            }
          }
          // watermark-final: no admissible event can extend these anymore.
          // Strictly < wm: an event with ts == wm is still admitted by the
          // watermark filter, and ts == last + gapMs extends the session, so
          // closing at == would emit early and fork a spurious session.
          val (closed, stillOpen) = open.partition(_.last + gapMs < wm)
          if (stillOpen.isEmpty) state.remove()
          else {
            state.update(OpenSessions(stillOpen))
            // earliest possible closure; a session at exactly last+gapMs == wm
            // survives the strict partition, and Spark rejects a timeout at or
            // before the watermark, so clamp to wm + 1 (closes next advance)
            state.setTimeoutTimestamp(
              math.max(stillOpen.map(_.last + gapMs).min, wm + 1))
          }
          closed.sortBy(_.start).iterator.map(s =>
            SessionOut(user, new Timestamp(s.start), new Timestamp(s.last), s.n))
      }
  }
}
