package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.build.IndexBuilder
import graft.search.Searcher

/** Addon (attached-column) ordered scans against the reference's
  * orderby suite (/root/reference/sql/orderby.sql +
  * expected/orderby.out): the tsts fixture — 508 rows of 2-char lexemes
  * with hourly timestamps, indexed `WITH (attach='d', to='t')` — plus the
  * two inserted rows. All counts, top-5 id lists and distances below are
  * the reference's expected values.
  */
class OrderBySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def parseTs(s: String): Long = {
    val ldt = java.time.LocalDateTime.parse(s.replace(' ', 'T'))
    ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
  }

  private lazy val rows: Seq[(Long, String, Long)] = {
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get("/root/reference/data/tsts.data"))
    val parsed = (0 until lines.size()).map { i =>
      val f = lines.get(i).split("\t", -1)
      val text = f(1).replace("'", " ").trim.replaceAll("\\s+", " ")
      (f(0).toLong, text, parseTs(f(2)))
    }
    // sql/orderby.sql:9-10 inserted rows
    parsed ++ Seq(
      (-1L, "t1 t2", parseTs("2016-05-02 02:24:22.326724")),
      (-2L, "t1 t2 t3", parseTs("2016-05-02 02:26:22.326724")))
  }

  private lazy val indexDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("tstsidx").toString
    val df = spark.createDataFrame(rows).toDF("id", "t", "d")
    // altOrder: the reference's orderby suite runs against the
    // order_by_attach layout — exercise the alt scan path on its goldens
    IndexBuilder.build(spark, df, "id", "t", dir,
      IndexBuilder.Params(nShards = 8, attach = Some("d"), altOrder = true))
    dir
  }
  private lazy val searcher = new Searcher(spark, indexDir)

  private val C = parseTs("2016-05-16 14:21:25")

  test("boolean counts on tsts (expected/orderby.out)") {
    assert(searcher.count("wr|qh") == 158)
    assert(searcher.count("wr&qh") == 17)
    assert(searcher.count("eq&yt") == 6)
    assert(searcher.count("eq|yt") == 98)
    assert(searcher.count("(eq&yt)|(wr&qh)") == 23)
    assert(searcher.count("(eq|yt)&(wr|qh)") == 39)
  }

  test("d <=> c top-5 (two-sided distance)") {
    val got = searcher.topKAddon("wr&qh", C, "both", 5).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(got.map(_._1).toSeq == Seq(355L, 354L, 371L, 406L, 415L), got.mkString(","))
    val expectedSec = Seq(2.673276, 3602.673276, 57597.326724, 183597.326724, 215997.326724)
    got.map(_._2 / 1e6).zip(expectedSec).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-6, s"$a vs $b")
    }
  }

  test("d <=| c top-5 (left-only)") {
    val got = searcher.topKAddon("wr&qh", C, "left", 5).collect().map(_.getLong(0))
    assert(got.toSeq == Seq(355L, 354L, 252L, 232L, 168L), got.mkString(","))
  }

  test("d |=> c top-5 (right-only)") {
    val got = searcher.topKAddon("wr&qh", C, "right", 5).collect().map(_.getLong(0))
    assert(got.toSeq == Seq(371L, 406L, 415L, 428L, 457L), got.mkString(","))
  }

  test("range scan: match AND d <= c ORDER BY d (expected id list)") {
    import org.apache.spark.sql.functions._
    val got = searcher.matchingWithAddon("wr&qh")
      .where(col("addon") <= C).orderBy("addon")
      .collect().map(_.getLong(0))
    assert(got.toSeq == Seq(16L, 39L, 71L, 135L, 168L, 232L, 252L, 354L, 355L), got.mkString(","))
  }

  test("range scan: match AND d >= c ORDER BY d") {
    import org.apache.spark.sql.functions._
    val got = searcher.matchingWithAddon("wr&qh")
      .where(col("addon") >= C).orderBy("addon")
      .collect().map(_.getLong(0))
    assert(got.toSeq == Seq(371L, 406L, 415L, 428L, 457L, 458L, 484L, 496L), got.mkString(","))
  }

  test("topKMulti: lexicographic (rank, addon, docId) equals brute force; " +
    "addon key decides equal-rank ties") {
    import graft.search.Searcher.OrderKey
    // query t1&t2 matches the two inserted rows (plus any data rows carrying
    // both lexemes); docs -1 ("t1 t2") and -2 ("t1 t2 t3") have IDENTICAL
    // cover distance, so only the second key separates them
    val cTs = parseTs("2016-05-02 02:24:22.326724") // == doc -1's timestamp
    val addons = searcher.matchingWithAddon("t1&t2").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ranks = searcher.topKCover("t1&t2", addons.size + 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expect = addons.keys.toSeq
      .map(id => (id, ranks(id), math.abs(addons(id) - cTs)))
      .sortBy { case (id, d1, d2) => (d1, d2, id) }
    val got = searcher.topKMulti("t1&t2",
        Seq(OrderKey.Rank(), OrderKey.Addon(cTs, "both")), expect.size)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2).toLong))
    assert(got.toSeq == expect, got.mkString(","))
    // doc -1 is at addon distance 0 and must precede -2 (120 s away) even
    // though docId order (-2 < -1) says otherwise: the SECOND key decided
    val i1 = got.indexWhere(_._1 == -1L)
    val i2 = got.indexWhere(_._1 == -2L)
    assert(i1 >= 0 && i2 >= 0 && i1 < i2, got.mkString(","))
    assert(got(i1)._2 == got(i2)._2) // the tie the addon key broke
  }

  test("topKMulti: addon-first ordering equals brute force") {
    import graft.search.Searcher.OrderKey
    val addons = searcher.matchingWithAddon("wr&qh").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ranks = searcher.topKCover("wr&qh", addons.size + 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expect = addons.keys.toSeq
      .map(id => (id, math.abs(addons(id) - C), ranks(id)))
      .sortBy { case (id, d1, d2) => (d1, d2, id) }.take(5)
      .map { case (id, d1, d2) => (id, d1.toDouble, d2) }
    val got = searcher.topKMulti("wr&qh",
        Seq(OrderKey.Addon(C, "both"), OrderKey.Rank()), 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got.toSeq == expect, got.mkString(","))
    // first key agrees with the single-key addon scan
    val single = searcher.topKAddon("wr&qh", C, "both", 5).collect()
      .map(_.getLong(0)).toSeq
    assert(got.map(_._1).toSeq == single)
  }

  test("topKMulti on a pure negation routes through the full scan") {
    import graft.search.Searcher.OrderKey
    // !wr has no required keys → full-scan candidates (docs table)
    val nonMatch = rows.filterNot(_._2.split("\\s+").contains("wr"))
    val expect = nonMatch
      .map { case (id, _, d) => (id, math.abs(d - C)) }
      .sortBy { case (id, dist) => (dist, id) }.take(5)
      .map { case (id, dist) => (id, dist.toDouble) }
    val got = searcher.topKMulti("!wr", Seq(OrderKey.Addon(C, "both")), 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == expect, got.mkString(","))
  }

  test("addon values round-trip exactly (µs timestamps in payload)") {
    import org.apache.spark.sql.functions._
    val expect = rows.map(r => r._1 -> r._3).toMap
    val got = searcher.matchingWithAddon("t1").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.contains(-1L) && got.contains(-2L))
    got.foreach { case (id, addon) => assert(addon == expect(id), s"id=$id") }
  }
}
