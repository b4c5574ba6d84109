package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.build.IndexBuilder
import graft.search.Searcher

/** Fused multi-search (one scan + one shuffle for a heterogeneous query
  * batch): every slot must return exactly its solo query's rows/scores,
  * including prefix expansion, void slots, and full-scan fallbacks riding
  * the same batch; the fused kernel subtree must execute once (shared
  * exchange), not once per output branch.
  */
class MsearchFusedSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val nDocs = 2500
  private def text(i: Int): String = {
    val sb = new StringBuilder
    sb.append("common ")
    if (i % 2 == 0) sb.append("even ")
    if (i % 3 == 0) sb.append("triple word ")
    if (i % 7 == 0) sb.append("rare7 ")
    if (i % 97 == 0) sb.append("veryrare mid veryrare ")
    if (i % 5 == 0) sb.append("prefixed" + (i % 4) + " ")
    sb.append(s"tail${i % 13}")
    sb.toString
  }

  private lazy val searcher: Searcher = {
    val d = java.nio.file.Files.createTempDirectory("msearchidx").toString
    val docs = (0 until nDocs).map(i => (i.toLong, text(i))).toDF("doc_id", "text")
    IndexBuilder.build(spark, docs, "doc_id", "text", d,
      IndexBuilder.Params(nShards = 4, blockSize = 64))
    new Searcher(spark, d)
  }

  test("every fused slot equals its solo query") {
    import Searcher.MsearchSpec._
    val specs = Seq(
      Match("even & triple"),
      Bm25(Seq("rare7", "veryrare", "tail3"), 7),
      Cover("common & rare7", 5),
      Match("prefixed:* & even"),
      Match("!rare7"), // pure negation: full-scan fallback unioned in
      Match(""))       // void slot: contributes nothing
    val got = searcher.msearch(specs).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)

    def soloIds(q: String): Set[Long] =
      searcher.matchingDocs(q).collect().map(_.getLong(0)).toSet
    assert(got(0).map(_._2).toSet == soloIds("even & triple"))
    assert(got(0).forall(_._3 == 0.0))
    assert(got(3).map(_._2).toSet == soloIds("prefixed:* & even"))
    assert(got(4).map(_._2).toSet == soloIds("!rare7"))
    assert(!got.contains(5))

    val soloBm25 = searcher.topKBm25(Seq("rare7", "veryrare", "tail3"), 7)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got(1).map(t => (t._2, t._3)).toSet == soloBm25)

    val soloCover = searcher.topKCover("common & rare7", 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got(2).map(t => (t._2, t._3)).toSet == soloCover)
  }

  test("Cover slot with normalization flags equals the solo normalized query") {
    import Searcher.MsearchSpec._
    import graft.query.CoverRank
    for (m <- Seq(CoverRank.NormLogLength, CoverRank.NormUniq)) {
      val got = searcher.msearch(Seq(Cover("common & rare7", 6, method = m)))
        .collect().map(r => (r.getLong(1), r.getDouble(2))).toSet
      val solo = searcher.topKCover("common & rare7", 6, method = m)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(got == solo, s"method=$m")
    }
  }

  test("msearchCounts equals solo counts; zero, prefix and full-scan slots") {
    val qs = Seq("even & triple", "prefixed:* & even", "zzzabsent",
      "!rare7", "common", "")
    val got = searcher.msearchCounts(qs).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    qs.zipWithIndex.foreach { case (q, qi) =>
      assert(got(qi) == searcher.count(q), s"slot $qi '$q'")
    }
    assert(got(2) == 0L) // the spine surfaces empty slots
    assert(got.size == qs.size)
  }

  test("Count slots: mixed match+count batch shares one scan; spine covers voids") {
    import Searcher.MsearchSpec._
    val specs = Seq(
      Count("even & triple"),
      Match("even & rare7"),
      Count("prefixed:* & even"),   // prefix expansion inside a count slot
      Count("zzzabsent"),           // zero matches: spine row with cnt 0
      Count(""),                    // void: spine row with cnt 0
      Count("!rare7"),              // full-scan fallback aggregated in
      Bm25(Seq("rare7", "veryrare"), 4))
    val df = searcher.msearchPlan(specs)
    val got = df.collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    // count slots: exactly one row, docId carries the count
    def cntOf(qi: Int): Long = {
      val rows = got(qi); assert(rows.size == 1, s"slot $qi rows=${rows.size}")
      rows.head._2
    }
    assert(cntOf(0) == searcher.count("even & triple"))
    assert(cntOf(2) == searcher.count("prefixed:* & even"))
    assert(cntOf(3) == 0L)
    assert(cntOf(4) == 0L)
    assert(cntOf(5) == searcher.count("!rare7"))
    val soloMatch = searcher.matchingDocs("even & rare7").collect()
      .map(_.getLong(0)).toSet
    assert(got(1).map(_._2).toSet == soloMatch)
    val soloBm25 = searcher.topKBm25(Seq("rare7", "veryrare"), 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got(6).map(t => (t._2, t._3)).toSet == soloBm25)
    // the count branch must REUSE the match/bm25 branches' exchange, not
    // rescan: one scan for the whole mixed batch
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Reused"), plan.take(3000))
  }

  test("CountFields: field-scoped count slots over a multicolumn index") {
    import Searcher.MsearchSpec._
    val d = java.nio.file.Files.createTempDirectory("msearchcf").toString
    val docs = (0 until 600).map { i =>
      (i.toLong, text(i), s"lang${i % 3}")
    }.toDF("doc_id", "body", "lang")
    IndexBuilder.buildFields(spark, docs, "doc_id",
      Seq("body" -> "body", "lang" -> "lang"), d,
      IndexBuilder.Params(nShards = 2))
    val s = new Searcher(spark, d)
    val fq = Seq("body" -> "even", "lang" -> "lang1")
    val got = s.msearch(Seq(CountFields(fq), MatchFields(fq))).collect()
      .map(r => (r.getInt(0), r.getLong(1))).groupBy(_._1)
    val soloIds = s.matchingDocsMulti(fq).collect().map(_.getLong(0)).toSet
    assert(got(0).map(_._2).toList == List(soloIds.size.toLong))
    assert(got(1).map(_._2).toSet == soloIds && soloIds.nonEmpty)
  }

  test("24-spec heterogeneous batch: every slot equals its solo query") {
    import Searcher.MsearchSpec._
    // serving-tier batch size: 8 boolean, 8 BM25, 6 cover, a prefix and a
    // full-scan slot — exercises the shared per-shard ShardView across a
    // batch where specs' term sets overlap heavily (common/rare7 appear in
    // many specs) and partially (each tailN in only a few)
    val matches = (0 until 8).map(i => Match(s"tail$i & even"))
    val bm25s = (0 until 8).map(i => Bm25(Seq(s"tail$i", "common", "rare7"), 5 + i))
    val covers = (0 until 6).map(i => Cover(s"common & tail${i + 2}", 4 + i))
    val specs: Seq[Searcher.MsearchSpec] =
      matches ++ bm25s ++ covers ++ Seq(Match("prefixed:*"), Match("!even"))
    assert(specs.length == 24)
    val got = searcher.msearch(specs).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    specs.zipWithIndex.foreach {
      case (Match(q), qi) =>
        val solo = searcher.matchingDocs(q).collect().map(_.getLong(0)).toSet
        assert(got.get(qi).map(_.map(_._2).toSet).getOrElse(Set.empty) == solo,
          s"slot $qi Match($q)")
      case (Bm25(ts, k), qi) =>
        val solo = searcher.topKBm25(ts, k).collect()
          .map(r => (r.getLong(0), r.getDouble(1))).toSet
        assert(got(qi).map(t => (t._2, t._3)).toSet == solo, s"slot $qi Bm25($ts,$k)")
      case (Cover(q, k, _), qi) =>
        val solo = searcher.topKCover(q, k).collect()
          .map(r => (r.getLong(0), r.getDouble(1))).toSet
        assert(got(qi).map(t => (t._2, t._3)).toSet == solo, s"slot $qi Cover($q,$k)")
      case (sp, qi) => fail(s"unexpected spec $sp at $qi")
    }
  }

  // ---- ordered-scan slots (alt-order layout) in the fused batch ----

  private lazy val altSearcher: Searcher = {
    val d = java.nio.file.Files.createTempDirectory("msearchalt").toString
    // signed addons, scrambled + tied like AltOrderSpec's fixture
    val docs = (0 until 2000).map(i =>
      (i.toLong, text(i), (((i * 7919) % 2000) / 3).toLong * 10L - 3000L))
      .toDF("doc_id", "text", "d")
    IndexBuilder.build(spark, docs, "doc_id", "text", d,
      IndexBuilder.Params(nShards = 4, blockSize = 64, attach = Some("d"),
        altOrder = true))
    new Searcher(spark, d)
  }

  test("Addon and AddonRange slots equal their solo queries (incl. fallback)") {
    import Searcher.MsearchSpec._
    val specs = Seq(
      Addon("even & triple", -700L, "both", 7),
      Addon("common & rare7", 500L, "left", 5),
      AddonRange("even & triple", -1500L, -100L),
      Addon("even | rare7", 0L, "right", 6), // OR: union-driven alt slot
      Match("even & rare7"))                 // primary-layout slot in the same batch
    val got = altSearcher.msearch(specs).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)

    def soloAddon(q: String, c: Long, op: String, k: Int): Set[(Long, Double)] =
      altSearcher.topKAddon(q, c, op, k).collect()
        .map(r => (r.getLong(0), r.getDouble(2))).toSet
    assert(got(0).map(t => (t._2, t._3)).toSet == soloAddon("even & triple", -700L, "both", 7))
    assert(got(1).map(t => (t._2, t._3)).toSet == soloAddon("common & rare7", 500L, "left", 5))
    assert(got(3).map(t => (t._2, t._3)).toSet == soloAddon("even | rare7", 0L, "right", 6))
    val soloRange = altSearcher.rangeAddon("even & triple", -1500L, -100L)
      .collect().map(_.getLong(0)).toSet
    assert(got(2).map(_._2).toSet == soloRange && soloRange.nonEmpty)
    assert(got(2).forall(_._3 == 0.0))
    val soloMatch = altSearcher.matchingDocs("even & rare7").collect()
      .map(_.getLong(0)).toSet
    assert(got(4).map(_._2).toSet == soloMatch)
  }

  test("alt branches share one exchange; prefix slots ride too") {
    import Searcher.MsearchSpec._
    val df = altSearcher.msearchPlan(Seq(
      Addon("prefixed:* & even", -200L, "both", 6),
      AddonRange("prefixed:* & even", -2000L, 2000L)))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Reused"), plan.take(3000))
    // slot correctness under prefix expansion
    val got = altSearcher.msearch(Seq(
      Addon("prefixed:* & even", -200L, "both", 6),
      AddonRange("prefixed:* & even", -2000L, 2000L))).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).groupBy(_._1)
    val solo = altSearcher.topKAddon("prefixed:* & even", -200L, "both", 6)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    assert(got(0).map(t => (t._2, t._3)).toSet == solo && solo.nonEmpty)
    val soloR = altSearcher.rangeAddon("prefixed:* & even", -2000L, 2000L)
      .collect().map(_.getLong(0)).toSet
    assert(got(1).map(_._2).toSet == soloR)
  }

  test("Facet slots: per-shard bucket partials equal solo facets (signed addons)") {
    import Searcher.MsearchSpec._
    val specs = Seq(
      Facet("even & triple", 500L, -3000L, 3000L),
      Count("even & triple"),
      Facet("even | rare7", 1000L, -2500L, 2500L), // OR: union-driven alt slot
      Facet("!rare7", 1000L, -3000L, 3000L),       // full-scan: fallback plan
      Facet("zzzabsent", 100L, 0L, 1000L))         // zero matches: no buckets
    val got = altSearcher.msearch(specs).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).groupBy(_._1)
    def solo(q: String, w: Long, lo: Long, hi: Long): Set[(Long, Double)] =
      altSearcher.countByAddonBucket(q, w, lo, hi).collect()
        .map(r => (r.getLong(0), r.getLong(1).toDouble)).toSet
    assert(got(0).map(t => (t._2, t._3)).toSet ==
      solo("even & triple", 500L, -3000L, 3000L))
    assert(got(2).map(t => (t._2, t._3)).toSet ==
      solo("even | rare7", 1000L, -2500L, 2500L))
    assert(got(3).map(t => (t._2, t._3)).toSet ==
      solo("!rare7", 1000L, -3000L, 3000L))
    assert(!got.contains(4))
    // bucket totals reconcile with the in-range match count
    val inRange = altSearcher.rangeAddon("even & triple", -3000L, 3000L).count()
    assert(got(0).map(_._3.toLong).sum == inRange && inRange > 0)
    // facet slots share the batch's alt scan with ordered slots
    val df = altSearcher.msearchPlan(Seq(
      Addon("even & triple", 0L, "both", 5),
      Facet("even & triple", 500L, -3000L, 3000L)))
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("Reused"))
  }

  private lazy val floatSearcher: Searcher = {
    val d = java.nio.file.Files.createTempDirectory("msearchflt").toString
    // signed float values with ties, ±0.0 and a NaN island, indexed as
    // order-preserving IEEE bits
    val docs = (0 until 2000).map { i =>
      val v =
        if (i % 501 == 0) Double.NaN
        else (((i * 7919) % 2000) / 3).toDouble * 1.25 - 400.0
      (i.toLong, text(i), v)
    }.toDF("doc_id", "text", "f")
      .withColumn("fbits", graft.build.AddonUnits.floatOrderedBits(
        org.apache.spark.sql.functions.col("f")))
      .drop("f")
    IndexBuilder.build(spark, docs, "doc_id", "text", d,
      IndexBuilder.Params(nShards = 4, blockSize = 64, attach = Some("fbits"),
        altOrder = true))
    new Searcher(spark, d)
  }

  test("AddonFloat/AddonRangeFloat slots equal their solo float queries") {
    import Searcher.MsearchSpec._
    val cBits = graft.build.AddonUnits.floatOrderedBits(-12.5)
    val specs = Seq(
      AddonFloat("even & triple", 3.75, "both", 7),
      AddonRangeFloat("even & triple", -100.0, 150.0),
      AddonFloat("even | rare7", -1.0, "right", 6), // OR: union-driven alt slot
      // bits-space long slot on the SAME index: exercises the mixed
      // float/non-float score decode in one bounded window
      Addon("even & triple", cBits, "both", 5),
      Match("even & rare7"))
    val got = floatSearcher.msearch(specs).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)

    def soloFloat(q: String, c: Double, op: String, k: Int): Set[(Long, Double)] =
      floatSearcher.topKAddonFloat(q, c, op, k).collect()
        .map(r => (r.getLong(0), r.getDouble(2))).toSet
    assert(got(0).map(t => (t._2, t._3)).toSet ==
      soloFloat("even & triple", 3.75, "both", 7))
    assert(got(2).map(t => (t._2, t._3)).toSet ==
      soloFloat("even | rare7", -1.0, "right", 6))
    val soloRange = floatSearcher.rangeAddonFloat("even & triple", -100.0, 150.0)
      .collect().map(_.getLong(0)).toSet
    assert(got(1).map(_._2).toSet == soloRange && soloRange.nonEmpty)
    assert(got(1).forall(_._3 == 0.0))
    val soloBits = floatSearcher.topKAddon("even & triple", cBits, "both", 5)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    assert(got(3).map(t => (t._2, t._3)).toSet == soloBits)
    val soloMatch = floatSearcher.matchingDocs("even & rare7").collect()
      .map(_.getLong(0)).toSet
    assert(got(4).map(_._2).toSet == soloMatch)
    // float distances are exact value-units doubles (sanity: a known one)
    assert(got(0).forall(t => t._3 >= 0.0 && !t._3.isNaN))
  }

  test("FacetFloat slots: value-space bucket partials equal solo float facets") {
    import Searcher.MsearchSpec._
    val specs = Seq(
      FacetFloat("even & triple", 62.5, -300.0, 300.0),
      AddonFloat("even & triple", 3.75, "both", 5),   // shares the alt scan
      FacetFloat("even | rare7", 125.0, -400.0, 0.0), // OR: union-driven slot
      FacetFloat("!even", 100.0, -400.0, 400.0))      // full-scan: fallback
    val got = floatSearcher.msearch(specs).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    def solo(q: String, w: Double, lo: Double, hi: Double): Set[(Double, Double)] =
      floatSearcher.countByAddonBucketFloat(q, w, lo, hi).collect()
        .map(r => (r.getDouble(0), r.getLong(1).toDouble)).toSet
    def decoded(qi: Int): Set[(Double, Double)] =
      got(qi).map(t => (java.lang.Double.longBitsToDouble(t._2), t._3)).toSet
    assert(decoded(0) == solo("even & triple", 62.5, -300.0, 300.0))
    assert(decoded(0).nonEmpty)
    assert(decoded(2) == solo("even | rare7", 125.0, -400.0, 0.0))
    assert(decoded(3) == solo("!even", 100.0, -400.0, 400.0))
    assert(decoded(3).nonEmpty)
    // NaN docs (i % 501 == 0) never count: totals reconcile with the
    // finite in-range match count (sum over the row SEQ — a set would
    // collapse equal-count buckets)
    val inRange = floatSearcher.rangeAddonFloat("even & triple", -300.0, 300.0)
      .count()
    assert(got(0).map(_._3.toLong).sum == inRange)
  }

  test("Order2 slots (rank, addon, docId composite) equal solo topKMulti") {
    import Searcher.{MsearchSpec, OrderKey}
    import MsearchSpec._
    // templated texts make rank-distance ties common, so the addon second
    // key genuinely decides membership at the k boundary; signed addons
    val specs = Seq(
      Order2("even & triple", -700L, "both", 7),
      Order2("common & rare7", 500L, "left", 5),   // one-sided: misses drop
      Order2("!even", 0L, "both", 5),              // full-scan fallback rides
      Match("even & rare7"),                       // plain slot in same batch
      Order2("common & triple", 0L, "both", 9,
        method = graft.query.CoverRank.NormUniq))  // UNIQ: heap fallback rides
    val got = altSearcher.msearch(specs).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    def solo(q: String, c: Long, op: String, k: Int, m: Int = 0): Set[(Long, Double)] =
      altSearcher.topKMulti(q, Seq(OrderKey.Rank(m), OrderKey.Addon(c, op)), k)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got(0).map(t => (t._2, t._3)).toSet == solo("even & triple", -700L, "both", 7))
    assert(got(0).size == 7)
    assert(got(1).map(t => (t._2, t._3)).toSet == solo("common & rare7", 500L, "left", 5))
    assert(got(2).map(t => (t._2, t._3)).toSet == solo("!even", 0L, "both", 5))
    assert(got(4).map(t => (t._2, t._3)).toSet ==
      solo("common & triple", 0L, "both", 9, m = graft.query.CoverRank.NormUniq))
    val soloMatch = altSearcher.matchingDocs("even & rare7").collect()
      .map(_.getLong(0)).toSet
    assert(got(3).map(_._2).toSet == soloMatch)
  }

  test("Order2 addon tie-break decides the k boundary (not rank+docId alone)") {
    import Searcher.{MsearchSpec, OrderKey}
    // adversarial check: if the fused path ordered by (rank, docId) and
    // ignored the addon key, the boundary membership would differ from the
    // composite order whenever rank ties straddle the cutoff
    val q = "even & triple"; val k = 7
    val byRankDoc = altSearcher.topKMulti(q, Seq(OrderKey.Rank()), k)
      .collect().map(_.getLong(0)).toSet
    val composite = altSearcher.topKMulti(q,
      Seq(OrderKey.Rank(), OrderKey.Addon(-700L, "both")), k)
      .collect().map(_.getLong(0)).toSet
    assert(byRankDoc != composite,
      "fixture no longer exercises the addon tie-break; change q/c/k")
    val fused = altSearcher.msearch(Seq(MsearchSpec.Order2(q, -700L, "both", k)))
      .collect().map(_.getLong(1)).toSet
    assert(fused == composite)
  }

  test("multicolumn ordered-scan slots (AddonFields/AddonRangeFields)") {
    import Searcher.MsearchSpec._
    val d = java.nio.file.Files.createTempDirectory("msearchaltm").toString
    val docs = (0 until 800).map { i =>
      (i.toLong, text(i), s"lang${i % 3}", (((i * 31) % 800)).toLong - 400L)
    }.toDF("doc_id", "body", "lang", "d")
    IndexBuilder.buildFields(spark, docs, "doc_id",
      Seq("body" -> "body", "lang" -> "lang"), d,
      IndexBuilder.Params(nShards = 2, attach = Some("d"), altOrder = true))
    val s = new Searcher(spark, d)
    val fq = Seq("body" -> "even", "lang" -> "lang1")
    val got = s.msearch(Seq(
      AddonFields(fq, -100L, "both", 5),
      AddonRangeFields(fq, -300L, 0L))).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).groupBy(_._1)
    val solo = s.topKAddonMulti(fq, -100L, "both", 5).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toSet
    assert(got(0).map(t => (t._2, t._3)).toSet == solo && solo.nonEmpty)
    val soloR = s.rangeAddonMulti(fq, -300L, 0L).collect().map(_.getLong(0)).toSet
    assert(got(1).map(_._2).toSet == soloR && soloR.nonEmpty)
  }

  test("fused kernel executes once: shared exchange reused across branches") {
    import Searcher.MsearchSpec._
    val df = searcher.msearchPlan(Seq(
      Match("even & triple"), Bm25(Seq("rare7", "veryrare"), 3),
      Cover("common & rare7", 4)))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    println("[msearch plan]\n" + plan)
    assert(plan.contains("Reused"), plan.take(4000))
  }
}
