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

  test("windowed counts, APPEND mode: window emits once on close; late rows drop") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, String)]
    val df = EventStreams.windowedCounts(
      mem.toDF.toDF("ts", "user", "kind"), windowSize = "10 seconds",
      watermark = "5 seconds")
    val q = df.writeStream.format("memory").queryName("wca")
      .outputMode(OutputMode.Append).start()
    try {
      def rows() = spark.table("wca").collect()
        .map(r => (r.getTimestamp(0).getTime / 1000 - Base, r.getString(1), r.getLong(2)))
        .toSeq
      mem.addData((ts(1), "a", "click"), (ts(2), "b", "click"))
      q.processAllAvailable()
      assert(rows().isEmpty) // watermark has not passed the window end
      mem.addData((ts(30), "a", "view")) // moves watermark to 25
      q.processAllAvailable()
      mem.addData((ts(31), "a", "view")) // batch AFTER the move: [0,10) closes
      q.processAllAvailable()
      assert(rows().count(_ == (0L, "click", 2L)) === 1) // exactly-once emission
      // a late click at t=3 (far below watermark 25) must be dropped, not
      // re-open or re-emit the closed window
      mem.addData((ts(3), "x", "click"))
      q.processAllAvailable()
      assert(rows().count(_._1 == 0L) === 1)
      assert(rows().count(_ == (0L, "click", 2L)) === 1)
    } finally q.stop()
  }

  test("gap sessionization: watermark closure, in-gap late extension") {
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

      // batch 2: a's event at t=100 is past the 30s gap → a now has TWO
      // open sessions (the first is NOT emitted eagerly: an in-gap late
      // event could still extend it). The batch moves the watermark to 90.
      mem.addData((ts(100), "a"))
      q.processAllAvailable()
      // next batch processes timeouts: watermark 90 > last+gap for a's
      // first session (35) and b's (32) → both become final
      mem.addData((ts(101), "c"))
      q.processAllAvailable()
      assert(rows().contains(("a", 0L, 5L, 2)))
      assert(rows().contains(("b", 2L, 2L, 1)))
      assert(!rows().exists(_._1 == "c")) // c's session is still open

      // out-of-order WITHIN the gap extends backwards, not splits: a at
      // t=95 (late but above watermark 91) folds into a's open session
      mem.addData((ts(95), "a"), (ts(130), "a"))
      q.processAllAvailable()
      mem.addData((ts(300), "d"))
      q.processAllAvailable()
      mem.addData((ts(301), "d"))
      q.processAllAvailable()
      assert(rows().contains(("a", 95L, 130L, 3))) // 95,100,130 one session
    } finally q.stop()
  }

  test("sessionsBatch equals the streaming sessionizer on one fixture") {
    implicit val sc = spark.sqlContext
    def msTs(ms: Long) = new Timestamp(Base * 1000L + ms)
    // boundary cases: a gap of EXACTLY 30 s still extends (strict > splits),
    // 30.001 s splits, duplicate timestamps count separately
    val evs: Seq[(Timestamp, String)] = Seq(
      (msTs(0), "a"), (msTs(5000), "a"), (msTs(35000), "a"),
      (msTs(65001), "a"),
      (msTs(1000), "b"), (msTs(1000), "b"),
      (msTs(500), "d"))
    val batch = EventStreams.sessionsBatch(
        evs.toDF("ts", "user"), "user", "ts", 30000L)
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .toSet
    assert(batch.size == 4) // a split once, b and d one each

    val mem = MemoryStream[(Timestamp, String)]
    val out = EventStreams.sessions(mem.toDS(), gapMs = 30000L,
      watermark = "5 seconds")
    val q = out.writeStream.format("memory").queryName("sessb")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(evs.sortBy(_._1.getTime): _*)
      q.processAllAvailable()
      // sentinel batches advance the watermark past every last+gap and let
      // the event-time timeouts finalize all fixture sessions
      mem.addData((msTs(500000), "zz"))
      q.processAllAvailable()
      mem.addData((msTs(600000), "zz"))
      q.processAllAvailable()
      val stream = spark.table("sessb").collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getInt(3).toLong))
        .filterNot(_._1 == "zz").toSet
      assert(stream == batch, s"stream=$stream\nbatch=$batch")
    } finally q.stop()
  }

  test("late events bridge two sessions; far-late events open their own") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val out = EventStreams.sessions(mem.toDS(), gapMs = 30000L,
      watermark = "60 seconds")
    val q = out.writeStream.format("memory").queryName("sess2")
      .outputMode(OutputMode.Append).start()
    try {
      def rows() = spark.table("sess2").collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime / 1000 - Base,
          r.getTimestamp(2).getTime / 1000 - Base, r.getInt(3))).toSet

      // u: t=0 and t=50 are >gap apart → two open sessions
      mem.addData((ts(0), "u"), (ts(50), "u"))
      q.processAllAvailable()
      // the late bridge at t=25 is within gap of BOTH → they merge into one
      mem.addData((ts(25), "u"))
      q.processAllAvailable()
      // w opens at 200 (watermark afterwards: 140)
      mem.addData((ts(200), "w"))
      q.processAllAvailable()
      // w's late event at 145 is admissible (≥140) but >gap before 200 →
      // its OWN session behind the open one, not a merge
      mem.addData((ts(145), "w"))
      q.processAllAvailable()
      // advance the watermark past every last+gap and let timeouts fire
      mem.addData((ts(300), "z"))
      q.processAllAvailable()
      mem.addData((ts(301), "z"))
      q.processAllAvailable()
      assert(rows() === Set(
        ("u", 0L, 50L, 3),    // bridged: 0,25,50 one session
        ("w", 145L, 145L, 1), // far-late stand-alone
        ("w", 200L, 200L, 1)))
    } finally q.stop()
  }
}
