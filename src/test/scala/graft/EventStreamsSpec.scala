package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** Watermarked windowed aggregation + flatMapGroupsWithState
  * sessionization over a MemoryStream, with deterministic event times.
  */
class EventStreamsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // +1000 s base: an epoch-0 event time equals the INITIAL watermark (0)
  // and is discarded as late before reaching any stateful operator
  private val Base = 1000L
  private def ts(sec: Long) = new Timestamp((Base + sec) * 1000L)

  test("windowed counts with watermark (complete mode over a memory sink)") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, String)]
    val df = EventStreams.windowedCounts(
      mem.toDF.toDF("ts", "user", "kind"), windowSize = "10 seconds",
      watermark = "5 seconds")
    val q = df.writeStream.format("memory").queryName("wc")
      .outputMode(OutputMode.Complete).start()
    try {
      mem.addData((ts(1), "a", "click"), (ts(2), "b", "click"), (ts(11), "a", "view"))
      q.processAllAvailable()
      val rows = spark.table("wc").collect()
        .map(r => (r.getTimestamp(0).getTime / 1000 - Base, r.getString(1), r.getLong(2)))
        .toSet
      assert(rows === Set((0L, "click", 2L), (10L, "view", 1L)))
    } finally q.stop()
  }

  test("gap sessionization: in-line closure and event-time timeout closure") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val out = EventStreams.sessions(mem.toDS(), gapMs = 30000L,
      watermark = "10 seconds")
    val q = out.writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append).start()
    try {
      def rows() = spark.table("sess").collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime / 1000 - Base,
          r.getTimestamp(2).getTime / 1000 - Base, r.getInt(3))).toSet

      // batch 1: a has 2 events 5s apart (one open session), b has 1
      mem.addData((ts(0), "a"), (ts(5), "a"), (ts(2), "b"))
      q.processAllAvailable()
      assert(rows() === Set.empty) // nothing closed yet

      // batch 2: a's event at t=100 is past the 30s gap → closes a's first
      // session IN-LINE; watermark advances to 100-10=90 > b.last+gap=32 →
      // b's session closes by EVENT-TIME TIMEOUT
      mem.addData((ts(100), "a"))
      q.processAllAvailable()
      // timeout fires on the batch AFTER the watermark move; nudge with an
      // unrelated key so no real session is disturbed
      mem.addData((ts(101), "c"))
      q.processAllAvailable()
      assert(rows().contains(("a", 0L, 5L, 2)))
      assert(rows().contains(("b", 2L, 2L, 1)))
      assert(!rows().exists(_._1 == "c")) // c's session is still open

      // out-of-order WITHIN the gap extends, not splits: a at t=95 (late
      // but above watermark) folds into a's open t=100 session
      mem.addData((ts(95), "a"), (ts(130), "a"))
      q.processAllAvailable()
      mem.addData((ts(300), "d"))
      q.processAllAvailable()
      mem.addData((ts(301), "d"))
      q.processAllAvailable()
      assert(rows().contains(("a", 95L, 130L, 3))) // 95,100,130 one session
    } finally q.stop()
  }
}
