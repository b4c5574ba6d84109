package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.query._

/** Rank-identity anchors against the reference's expected outputs
  * (/root/reference/expected/rum.out:122-152): the tsvectors below are the
  * indexed docs printed there, distances are the reference's float4 values.
  */
class CoverRankSpec extends AnyFunSuite {

  private def dist(queryStr: String, terms: Map[String, Array[Int]]): Float = {
    val cq = CompiledQuery.compile(TsQueryParser.parse(queryStr))
    val kp = cq.keys.map(k => terms.get(k.term).orNull)
    val kw = kp.map(p => if (p == null) null else Array.fill[Byte](p.length)(0))
    CoverRank.distance(cq, kp, kw)
  }

  private val d1 = Map("appreci" -> Array(2), "complimentari" -> Array(8),
    "send" -> Array(12), "way" -> Array(9))
  private val d2 = Map("castl" -> Array(10), "half" -> Array(11), "look" -> Array(7),
    "put" -> Array(2), "spec" -> Array(5), "way" -> Array(12))
  private val d3 = Map("fragment" -> Array(6), "gave" -> Array(10), "hang" -> Array(14),
    "still" -> Array(13), "way" -> Array(11), "well" -> Array(2))
  private val d4 = Map("far" -> Array(11), "go" -> Array(3, 7), "reach" -> Array(15),
    "think" -> Array(1), "way" -> Array(14))

  private def approx(a: Float, b: Float, tol: Double = 1e-4): Boolean =
    math.abs(a - b) / math.max(1.0, math.abs(b)) < tol

  test("single-term cover: distance 16.4493 (expected/rum.out:128-131)") {
    for (d <- Seq(d1, d2, d3, d4))
      assert(approx(dist("way", d), 16.4493f), s"got ${dist("way", d)}")
  }

  test("adjacent two-term cover: 8.22467 (expected/rum.out:140)") {
    assert(approx(dist("way & (go | half)", d2), 8.22467f), s"got ${dist("way & (go | half)", d2)}")
  }

  test("spread cover with noise: 57.5727 (expected/rum.out:141)") {
    assert(approx(dist("way & (go | half)", d4), 57.5727f), s"got ${dist("way & (go | half)", d4)}")
  }

  test("no match → infinite distance") {
    assert(dist("way & (go | half)", d1).isInfinite)
    assert(dist("zeta", d1).isInfinite)
  }

  test("repeated identical covers decay by 1/l^2 (calc_score_docr)") {
    // one 'foo' occurrence: score = 0.1/zeta2 → dist 16.4493
    val one = Map("foo" -> Array(5))
    assert(approx(dist("foo", one), 16.4493f))
    // three 'foo' occurrences: identical cover composition → slot decays
    // score = 0.1/z * (1 + 1/4 + 1/9)
    val three = Map("foo" -> Array(5, 9, 13))
    val expected = 1.0 / ((0.1 / 1.64493406685) * (1.0 + 0.25 + 1.0 / 9))
    assert(approx(dist("foo", three), expected.toFloat), s"got ${dist("foo", three)} want $expected")
  }

  test("weighted occurrences change InvSum") {
    // class A (3) single occurrence: InvSum=1 → Cpos=1 → score=1/zeta2
    val cq = CompiledQuery.compile(TsQueryParser.parse("foo"))
    val d = CoverRank.distance(cq, Array(Array(5)), Array(Array[Byte](3)))
    assert(approx(d, 1.64493406685f))
  }

  test("weighted phrase anchor: 2.05617 (expected/rum.out:363-367)") {
    // 'stroustrup:5508B,6233B,6238B bjarn:6235B,6237B' <=> 'bjarn <-> stroustrup'
    // one cover [6237,6238], both class B (invWeight 2.5): InvSum=5,
    // Cpos=(2/5)*2=0.8, noise=0 → score 0.8/zeta2 → distance 2.05617
    val cq = CompiledQuery.compile(TsQueryParser.parse("bjarn <-> stroustrup"))
    val pos = Map("bjarn" -> Array(6235, 6237), "stroustrup" -> Array(5508, 6233, 6238))
    val kp = cq.keys.map(k => pos(k.term))
    val kw = kp.map(p => Array.fill[Byte](p.length)(2)) // B = 2
    val d = CoverRank.distance(cq, kp, kw)
    assert(approx(d, 2.05617f), s"got $d")
  }

  test("mixed A/D adjacent cover: distance zeta2*11/4") {
    // endpoints class A (inv 1) + class D (inv 10): InvSum=11,
    // Cpos=(2/11)*2, noise=0 → distance = zeta2 * 11/4 = 4.52357
    val cq = CompiledQuery.compile(TsQueryParser.parse("aa & bb"))
    val kp = cq.keys.map(k => if (k.term == "aa") Array(4) else Array(5))
    val kw = cq.keys.map(k => Array[Byte](if (k.term == "aa") 3 else 0))
    val d = CoverRank.distance(cq, kp, kw)
    assert(approx(d, (1.64493406685 * 11 / 4).toFloat), s"got $d")
  }

  test("normalization methods (reference flags rum_ts_utils.c:137-142)") {
    val cq = CompiledQuery.compile(TsQueryParser.parse("way"))
    val kp = Array(Array(5))
    val kw = Array(Array[Byte](0))
    val base = CoverRank.score(cq, kp, kw) // 0.1/zeta2
    // RDIVRPLUS1 (32): w/(w+1) → distance gains exactly +1
    val d32 = CoverRank.distance(cq, kp, kw, method = CoverRank.NormRDivRPlus1)
    assert(approx(d32, 16.4493f + 1))
    // LOGLENGTH (1): /= ln(len+1)
    val s1 = CoverRank.score(cq, kp, kw, method = CoverRank.NormLogLength, docLen = 19)
    assert(math.abs(s1 - base / math.log(20.0)) < 1e-12)
    // LENGTH (2): /= len
    val s2 = CoverRank.score(cq, kp, kw, method = CoverRank.NormLength, docLen = 19)
    assert(math.abs(s2 - base / 19.0) < 1e-12)
    // UNIQ (8) / LOGUNIQ (16) from caller-supplied distinct count
    val s8 = CoverRank.score(cq, kp, kw, method = CoverRank.NormUniq, nUniq = 6)
    assert(math.abs(s8 - base / 6.0) < 1e-12)
    val s16 = CoverRank.score(cq, kp, kw, method = CoverRank.NormLogUniq, nUniq = 6)
    assert(math.abs(s16 - base / (math.log(7.0) / math.log(2.0))) < 1e-12)
    // EXTDIST (4): two single-term covers at pos 2 and 10 → extents at
    // 2 and 10, SumDist = 1/8, NExtent = 2 → score /= 2/(1/8) = 16;
    // slot decay gives base*(1 + 1/4) before the norm
    val s4 = CoverRank.score(cq, Array(Array(2, 10)), Array(Array[Byte](0, 0)),
      method = CoverRank.NormExtDist)
    assert(math.abs(s4 - base * 1.25 / 16.0) < 1e-12, s"got $s4")
    // method 0 unchanged
    assert(CoverRank.score(cq, kp, kw, method = 0, docLen = 19, nUniq = 6) == base)
  }

  test("phrase query ranking: def <-> fgr") {
    val d = Map("def" -> Array(4), "fgr" -> Array(5))
    val dd = dist("def <-> fgr", d)
    // cover [4,5]: occ=2, InvSum=20, nitems=2, Cpos=0.2, noise=0 → 8.22467
    assert(approx(dd, 8.22467f), s"got $dd")
  }
}
