package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.build.IndexBuilder
import graft.query.{CompiledQuery, TsEval, TsQueryParser}
import graft.search.{SearchKernel, Searcher}
import graft.tokenize.Tokenizer

/** Boolean fast scan (preConsistent seek-join, reference
  * src/rum_ts_utils.c:165-197 + src/rumget.c:1900-2017) exactness:
  * candidates driven from the required-key intersection must yield exactly
  * the brute-force match set for a battery of AND/OR/NOT/phrase/prefix
  * shapes over a corpus large enough for multi-block cursors and skew.
  */
class FastScanSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val nDocs = 2500
  private def text(i: Int): String = {
    val sb = new StringBuilder
    sb.append("common ") // in every doc: union-driver stress
    if (i % 2 == 0) sb.append("even ")
    if (i % 3 == 0) sb.append("triple word ")
    if (i % 7 == 0) sb.append("rare7 ")
    if (i % 97 == 0) sb.append("veryrare mid veryrare ")
    if (i % 5 == 0) sb.append("prefixed" + (i % 4) + " ")
    sb.append(s"tail${i % 13}")
    sb.toString
  }

  private lazy val searcher: Searcher = {
    val d = java.nio.file.Files.createTempDirectory("fastscanidx").toString
    val docs = (0 until nDocs).map(i => (i.toLong, text(i))).toDF("doc_id", "text")
    IndexBuilder.build(spark, docs, "doc_id", "text", d,
      IndexBuilder.Params(nShards = 4, blockSize = 64))
    new Searcher(spark, d)
  }

  private def bruteMatches(queryStr: String): Set[Long] = {
    val cq = CompiledQuery.compile(TsQueryParser.parse(queryStr))
    (0 until nDocs).flatMap { i =>
      val occs = Tokenizer.simple(text(i))
      val byTerm = occs.map(o => o.term -> o).toMap
      val provider = new TsEval.Provider {
        private def occOf(k: Int): Option[Tokenizer.TermOccs] = {
          val key = cq.keys(k)
          if (!key.prefix) byTerm.get(key.term)
          else {
            val hits = occs.filter(_.term.startsWith(key.term))
            if (hits.isEmpty) None
            else {
              val merged = hits.flatMap(h => h.positions.zip(h.wclasses)).sortBy(_._1)
              Some(Tokenizer.TermOccs(key.term, merged.map(_._1), merged.map(_._2)))
            }
          }
        }
        def positions(k: Int): Array[Int] = occOf(k).map(_.positions).orNull
        def wclasses(k: Int): Array[Byte] = occOf(k).map(_.wclasses).orNull
      }
      if (TsEval.matches(cq, provider)) Some(i.toLong) else None
    }.toSet
  }

  private val battery = Seq(
    "common & rare7",                 // huge ∩ small
    "even & triple & rare7",          // 3-way intersection
    "!even & rare7",                  // NOT inside AND → required {rare7}
    "rare7 & !zzzabsent",             // NOT of an absent term
    "even | rare7",                   // pure OR → union fallback
    "(even & common) | (rare7 & common)", // OR with common required key
    "triple <-> word",                // phrase → required both
    "veryrare <2> veryrare",          // self-phrase at distance 2
    "prefixed:* & rare7",             // prefix required via union cursor
    "zzzabsent & common",             // required term absent → empty
    "even & (rare7 | triple)")        // AND over OR

  test("required-key intersection candidates equal brute force") {
    for (q <- battery) {
      val got = searcher.matchingDocs(q).as[Long].collect().toSet
      val want = bruteMatches(q)
      assert(got == want,
        s"query '$q': got ${got.size} want ${want.size}; " +
          s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    }
  }

  test("fuzzy limit sampling: deterministic subset sized by df prediction") {
    val full = searcher.matchingDocs("common & even").as[Long].collect().toSet
    assert(full.size == nDocs / 2)
    val s1 = searcher.matchingDocsSampled("common & even", 100).as[Long].collect().toSet
    val s2 = searcher.matchingDocsSampled("common & even", 100).as[Long].collect().toSet
    assert(s1 == s2) // deterministic — no RNG state
    assert(s1.subsetOf(full))
    // prediction = df(even) = 1250; keep ≈ 100/1250 → expect ~100 ± noise
    assert(s1.size > 40 && s1.size < 250, s"got ${s1.size}")
    // under-limit queries pass through whole
    val small = searcher.matchingDocsSampled("rare7 & common", 10000).as[Long].collect().toSet
    assert(small == bruteMatches("rare7 & common"))
  }

  test("requiredKeys shapes") {
    def req(q: String): Set[String] = {
      val cq = CompiledQuery.compile(TsQueryParser.parse(q))
      SearchKernel.requiredKeys(cq).map(cq.keys(_).term).toSet
    }
    assert(req("a & b") == Set("a", "b"))
    assert(req("a | b") == Set.empty)
    assert(req("!a & b") == Set("b"))
    assert(req("a <-> b") == Set("a", "b"))
    assert(req("(a & c) | (b & c)") == Set("c"))
    assert(req("p:* & b") == Set("p", "b")) // prefix keys can drive candidates
    assert(req("!a") == Set.empty)
  }
}
