package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.build.{AddonUnits, IndexBuilder}
import graft.search.Searcher

/** Typed addon-unit transforms (the long-castable mapping for the
  * reference's scalar opclass families, btree_rum.c:249-323,513-517):
  * round-trips, order preservation, overflow behavior, and an end-to-end
  * timestamp-ordered scan spanning the epoch (signed micros).
  */
class AddonUnitsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("floatOrderedBits preserves IEEE-754 value order exactly") {
    val vals = Seq(
      Double.NegativeInfinity, -1.7e308, -42.5, -1.0, -java.lang.Double.MIN_VALUE,
      -0.0, 0.0, java.lang.Double.MIN_VALUE, 1e-300, 0.5, 1.0, 42.5, 1.7e308,
      Double.PositiveInfinity)
    val mapped = vals.map(AddonUnits.floatOrderedBits)
    assert(mapped == mapped.sorted, s"order broken: ${vals.zip(mapped)}")
    // strictly increasing except the -0.0/0.0 pair (distinct longs, adjacent)
    mapped.sliding(2).foreach { case Seq(a, b) => assert(a < b) }
    // NaN sorts above +Inf (one canonical class)
    assert(AddonUnits.floatOrderedBits(Double.NaN) >
      AddonUnits.floatOrderedBits(Double.PositiveInfinity))
    // round-trip
    vals.foreach { v =>
      val back = AddonUnits.floatFromOrderedBits(AddonUnits.floatOrderedBits(v))
      assert(back == v || (v == -0.0 && back == -0.0),
        s"$v -> $back")
    }
  }

  test("floatOrderedBits Column twin agrees with the scalar twin") {
    val vals = Seq(-3.25, -0.0, 0.0, 1.5, 9e300, Double.NegativeInfinity)
    val got = vals.toDF("x")
      .select(AddonUnits.floatOrderedBits(org.apache.spark.sql.functions.col("x")))
      .collect().map(_.getLong(0)).toSeq
    assert(got == vals.map(AddonUnits.floatOrderedBits))
    // null stays null
    val n = Seq[java.lang.Double](null).toDF("x")
      .select(AddonUnits.floatOrderedBits(org.apache.spark.sql.functions.col("x")))
      .collect()(0)
    assert(n.isNullAt(0))
  }

  test("scaledLong: exact scaling, HALF_UP rounding, overflow raises") {
    import org.apache.spark.sql.functions.col
    val got = Seq(12.34, -0.005, 99.999).toDF("x")
      .select(AddonUnits.scaledLong(col("x"), 2)).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1234L, -1L, 10000L), got) // -0.5 -> HALF_UP (away from 0) -> -1
    assert(AddonUnits.scaledLong(BigDecimal("12.34"), 2) == 1234L)
    assert(AddonUnits.scaledLong(BigDecimal("-12.345"), 2) == -1235L)
    val ex = intercept[Exception] {
      Seq(1e30).toDF("x").select(AddonUnits.scaledLong(col("x"), 2)).collect()
    }
    def msgs(t: Throwable): List[String] =
      if (t == null) Nil else (t.getMessage + "") :: msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("overflows long")), msgs(ex).mkString("|"))
  }

  test("timestampMicros: signed pre-1970, Column and Instant twins agree") {
    import org.apache.spark.sql.functions.col
    val instants = Seq(
      "1955-11-05T06:15:00Z", "1969-12-31T23:59:59.999999Z",
      "1970-01-01T00:00:00Z", "2024-01-15T12:34:56.789Z")
      .map(java.time.Instant.parse)
    assert(AddonUnits.timestampMicros(instants(0)) < 0L) // pre-epoch: negative
    assert(AddonUnits.timestampMicros(instants(1)) == -1L)
    assert(AddonUnits.timestampMicros(instants(2)) == 0L)
    val got = instants.map(i => java.sql.Timestamp.from(i)).toDF("ts")
      .select(AddonUnits.timestampMicros(col("ts")))
      .collect().map(_.getLong(0)).toSeq
    assert(got == instants.map(AddonUnits.timestampMicros))
  }

  test("end-to-end: epoch-spanning timestamp-ordered scan (alt + fallback)") {
    val base = java.time.Instant.parse("1970-01-01T00:00:00Z")
    // timestamps from 1969-12-29 to 1970-01-03 — addons cross zero
    val docs = (0 until 600).map { i =>
      val ts = base.plusSeconds(((i * 7919) % 600 - 300) * 900L)
      (i.toLong, "every " + (if (i % 2 == 0) "half " else "") + s"tail${i % 5}",
        java.sql.Timestamp.from(ts))
    }
    val df = docs.toDF("doc_id", "text", "ts")
      .withColumn("ts_us", AddonUnits.timestampMicros(org.apache.spark.sql.functions.col("ts")))
    val dA = java.nio.file.Files.createTempDirectory("tsalt").toString
    val dP = java.nio.file.Files.createTempDirectory("tsplain").toString
    IndexBuilder.build(spark, df, "doc_id", "text", dA,
      IndexBuilder.Params(nShards = 2, attach = Some("ts_us"), altOrder = true))
    IndexBuilder.build(spark, df, "doc_id", "text", dP,
      IndexBuilder.Params(nShards = 2, attach = Some("ts_us")))
    val sA = new Searcher(spark, dA)
    val sP = new Searcher(spark, dP)
    val c = AddonUnits.timestampMicros(java.time.Instant.parse("1969-12-31T18:00:00Z"))
    assert(c < 0L)
    def brute(k: Int): Seq[(Long, Long, Double)] =
      docs.filter(_._2.contains("half"))
        .map(t => (t._1, AddonUnits.timestampMicros(t._3.toInstant),
          math.abs(AddonUnits.timestampMicros(t._3.toInstant) - c).toDouble))
        .sortBy(t => (t._3, t._1)).take(k)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows(sA.topKAddon("every & half", c, "both", 8)) == brute(8))
    assert(rows(sP.topKAddon("every & half", c, "both", 8)) == brute(8))
  }

  // float fixture shared by the ordered-scan and facet tests: value ties
  // (i*7919 % 100 collides), signed values, ±0.0, ±Inf, NaN — indexed as
  // order-preserving IEEE bits; (docs, alt searcher, plain searcher)
  private lazy val floatFixture: (Seq[(Long, String, Double)], Searcher, Searcher) = {
    import org.apache.spark.sql.functions.col
    val specials = Map(14 -> Double.NaN, 26 -> Double.PositiveInfinity,
      34 -> Double.NegativeInfinity, 46 -> -0.0, 58 -> 0.0)
    val docs = (0 until 400).map { i =>
      val v = specials.getOrElse(i, ((i * 7919) % 100 - 50) / 4.0)
      (i.toLong, "every " + (if (i % 2 == 0) "half " else "") + s"tail${i % 5}", v)
    }
    val df = docs.toDF("doc_id", "text", "f")
      .withColumn("fbits", AddonUnits.floatOrderedBits(col("f")))
    val dA = java.nio.file.Files.createTempDirectory("falt").toString
    val dP = java.nio.file.Files.createTempDirectory("fplain").toString
    IndexBuilder.build(spark, df, "doc_id", "text", dA,
      IndexBuilder.Params(nShards = 2, attach = Some("fbits"), altOrder = true))
    IndexBuilder.build(spark, df, "doc_id", "text", dP,
      IndexBuilder.Params(nShards = 2, attach = Some("fbits")))
    (docs, new Searcher(spark, dA), new Searcher(spark, dP))
  }

  test("end-to-end float VALUE-space ordered scan (alt + fallback), NaN last") {
    val (docs, sA, sP) = floatFixture
    val matches = docs.filter(t => t._1 % 2 == 0) // "every & half"
    val c = 3.25
    // brute oracle ranks on the SAME bit image the engine uses (exact
    // double order with NaN canonicalized last)
    def key(v: Double, cc: Double, oneSided: Boolean): Long =
      java.lang.Double.doubleToLongBits(
        if (oneSided) cc - v else math.abs(v - cc))
    def brute(cc: Double, k: Int): Seq[(Long, Double, Double)] =
      matches.map(t => (t._1, t._3,
          java.lang.Double.longBitsToDouble(key(t._3, cc, oneSided = false))))
        .sortBy(t => (key(t._2, cc, oneSided = false), t._1)).take(k)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    // finite region: both paths equal the brute composite order exactly
    assert(rows(sA.topKAddonFloat("every & half", c, "both", 9)) == brute(c, 9))
    assert(rows(sP.topKAddonFloat("every & half", c, "both", 9)) == brute(c, 9))
    // ties present in the window (value collisions) — docId breaks them
    assert(brute(c, 9).map(_._3).distinct.size < 9)
    // full drain: NaN doc sorts LAST on both paths; ±Inf before it
    val fullA = rows(sA.topKAddonFloat("every & half", c, "both", matches.size))
    val fullP = rows(sP.topKAddonFloat("every & half", c, "both", matches.size))
    assert(fullA.size == matches.size && fullP.size == matches.size)
    assert(fullA.last._2.isNaN && fullP.last._2.isNaN)
    assert(fullA.map(_._1) == fullP.map(_._1))
    assert(fullA(matches.size - 2)._2.isInfinite)
    // one-sided in bits space: -0.0 counts as <= 0.0, NaN excluded
    val leftA = rows(sA.topKAddonFloat("every & half", 0.0, "left", matches.size))
    val leftP = rows(sP.topKAddonFloat("every & half", 0.0, "left", matches.size))
    val bruteLeft = matches
      .filter(t => AddonUnits.floatOrderedBits(t._3) <= AddonUnits.floatOrderedBits(0.0))
      .map(t => (t._1, t._3, java.lang.Double.longBitsToDouble(key(t._3, 0.0, oneSided = true))))
      .sortBy(t => (key(t._2, 0.0, oneSided = true), t._1))
    assert(leftA == bruteLeft)
    assert(leftP == bruteLeft)
    assert(bruteLeft.exists(t => java.lang.Double.doubleToRawLongBits(t._2) != 0L &&
      t._2 == 0.0)) // the -0.0 doc made it in
    // float range filter in value units
    val gotR = sA.rangeAddonFloat("every & half", -5.0, 2.5).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    val expR = matches.filter(t => !t._3.isNaN && t._3 >= -5.0 && t._3 <= 2.5)
      .map(t => (t._1, t._3)).toSet
    assert(gotR == expR && expR.nonEmpty)
  }

  test("float VALUE-space facet buckets: alt == fallback == brute force") {
    val (docs, sA, sP) = floatFixture
    val matches = docs.filter(t => t._1 % 2 == 0) // "every & half"
    def got(s: Searcher, q: String, w: Double, lo: Double, hi: Double) =
      s.countByAddonBucketFloat(q, w, lo, hi).orderBy("bucket").collect()
        .map(r => (r.getDouble(0), r.getLong(1))).toSeq
    def brute(vals: Seq[Double], w: Double, lo: Double, hi: Double) = {
      val loB = AddonUnits.floatOrderedBits(lo)
      val hiB = AddonUnits.floatOrderedBits(hi)
      vals.filter { v =>
          val b = AddonUnits.floatOrderedBits(v); b >= loB && b <= hiB
        }
        .groupBy(v => lo + math.floor((v - lo) / w) * w + 0.0)
        .map { case (b, xs) => (b, xs.size.toLong) }.toSeq.sortBy(_._1)
    }
    // unaligned lo and a width that doesn't divide the span
    for (q <- Seq("every & half", "every & !half")) {
      val vals = (if (q == "every & half") matches
                  else docs.filterNot(t => t._1 % 2 == 0)).map(_._3)
      val b = brute(vals, 3.5, -11.25, 12.0)
      assert(got(sA, q, 3.5, -11.25, 12.0) == b, q)
      assert(got(sP, q, 3.5, -11.25, 12.0) == b, q)
      assert(b.nonEmpty)
    }
    // bits-space bounds pin the ±0.0 edge: with lo = +0.0 the -0.0 doc
    // (id 46) is EXCLUDED, the +0.0 doc (id 58) counts in bucket 0.0
    val z = got(sA, "every & half", 1.0, 0.0, 2.0)
    val zVals = matches.map(_._3).filter(v =>
      !v.isNaN && AddonUnits.floatOrderedBits(v) >= AddonUnits.floatOrderedBits(0.0) &&
        v <= 2.0)
    assert(z == got(sP, "every & half", 1.0, 0.0, 2.0))
    assert(z.find(_._1 == 0.0).map(_._2).contains(
      zVals.count(v => v >= 0.0 && v < 1.0).toLong))
    // NaN and ±Inf never land in any finite-bounded bucket
    val all = got(sA, "every & half", 1e3, -1e6, 1e6)
    assert(all.map(_._2).sum ==
      matches.map(_._3).count(v => !v.isNaN && !v.isInfinite))
    // invalid params fail fast
    intercept[IllegalArgumentException] {
      sA.countByAddonBucketFloat("every", 0.0, 0.0, 1.0)
    }
    intercept[IllegalArgumentException] {
      sA.countByAddonBucketFloat("every", 1.0, Double.NaN, 1.0)
    }
    intercept[IllegalArgumentException] {
      sA.countByAddonBucketFloat("every", 1.0, 0.0, Double.PositiveInfinity)
    }
  }
}
