package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.compat.QueryIndex

/** Inverted query index truth table vs the reference
  * (/root/reference/sql/ruminv.sql + expected/ruminv.out — 11 stored
  * queries × 14 probe vectors).
  */
class QueryIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val queries = Seq(
    1L -> "a|b", 2L -> "a&b", 3L -> "!(a|b)", 4L -> "!(a&b)",
    5L -> "!a|b", 6L -> "a&!b", 7L -> "(a|b)&c", 8L -> "(!(a|b))&c",
    9L -> "(a|b)&(c|d)", 10L -> "!a",
    11L -> "(a|a1|a2|a3|a4|a5)&(b|b1|b2|b3|b4|b5|b6)&!(c|c1|c2|c3)")

  // expected/ruminv.out truth table (query ids per probe)
  private val golden: Seq[(String, Set[Long])] = Seq(
    "" -> Set(3L, 4L, 5L, 10L),
    "a" -> Set(1L, 4L, 6L),
    "b" -> Set(1L, 4L, 5L, 10L),
    "a b" -> Set(1L, 2L, 5L, 11L),
    "c" -> Set(3L, 4L, 5L, 8L, 10L),
    "a c" -> Set(1L, 4L, 6L, 7L, 9L),
    "b c" -> Set(1L, 4L, 5L, 7L, 9L, 10L),
    "a b c" -> Set(1L, 2L, 5L, 7L, 9L),
    "d" -> Set(3L, 4L, 5L, 10L),
    "a d" -> Set(1L, 4L, 6L, 9L),
    "b d" -> Set(1L, 4L, 5L, 9L, 10L),
    "a b d" -> Set(1L, 2L, 5L, 9L, 11L),
    "c d" -> Set(3L, 4L, 5L, 8L, 10L),
    "a c d" -> Set(1L, 4L, 6L, 7L, 9L))

  test("ruminv truth table (expected/ruminv.out)") {
    val built = QueryIndex.build(spark, queries.toDF("id", "q"))
    assert(built.emptyMatchers.collect().map(_.getLong(0)).toSet == Set(3L, 4L, 5L, 10L))
    val docs = golden.zipWithIndex.map { case ((probe, _), i) => (i.toLong, probe) }
    val res = QueryIndex.probe(spark, built, docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    golden.zipWithIndex.foreach { case ((probe, want), i) =>
      val got = res.getOrElse(i.toLong, Set.empty[Long])
      assert(got == want, s"probe '$probe': got $got want $want")
    }
  }

  test("100k stored queries: fully distributed build/probe, exact matches") {
    // query i = "w{i%K} & w{(i/K)%K}" — semantics invertible, so the
    // expectation is computed per doc without evaluating 100k trees.
    // Nothing is collected driver-side: build is a Dataset map and the
    // probe's task closures carry no per-query state (the source string
    // rides the candidate join and compiles per executor).
    val K = 317
    val nQ = 100000
    val qs = spark.range(nQ).selectExpr("id",
      s"concat('w', id % $K, ' & w', (id div $K) % $K) AS q")
    val built = QueryIndex.build(spark, qs, "id", "q")
    assert(built.entries.count() >= nQ) // ~2 entries per query minus self-pairs

    val rnd = new scala.util.Random(7)
    val docs = (0 until 40).map { d =>
      val terms = Seq.fill(8)(rnd.nextInt(K)).distinct
      (d.toLong, terms.map(t => s"w$t").mkString(" "), terms.toSet)
    }
    val got = QueryIndex.probe(spark, built,
        docs.map(t => (t._1, t._2)).toDF("doc_id", "text"), "doc_id", "text")
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    docs.foreach { case (id, _, terms) =>
      val want = (for (a <- terms; b <- terms) yield b.toLong * K + a)
        .filter(i => i >= 0 && i < nQ)
      assert(got.getOrElse(id, Set.empty[Long]) == want, s"doc $id")
    }
  }

  test("10k prefix operands stay on equi-join plans (no nested-loop blowup)") {
    // every stored query is a prefix operand: the probe must expand corpus
    // terms per distinct prefix LENGTH and equi-join on the substring —
    // a startsWith theta-join here would be a BroadcastNestedLoopJoin over
    // (corpus tokens × 10k prefixes)
    val qs = spark.range(10000).selectExpr("id", "concat('p', id, ':*') AS q")
    val built = QueryIndex.build(spark, qs, "id", "q")
    val docs = Seq((1L, "p17 p4242x zz"), (2L, "q1")).toDF("doc_id", "text")
    val res = QueryIndex.probe(spark, built, docs, "doc_id", "text")
    // two nested-loop nodes are legitimate, both over tiny broadcast sides
    // fixed by construction: docs × empty-matchers and term-dict × distinct
    // prefix LENGTHS. The prefix OPERANDS themselves must never ride a
    // nested loop: no StartsWith join condition and no third BNLJ node
    val plan = res.queryExecution.executedPlan.toString
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnlj <= 2, s"$bnlj nested-loop joins in:\n${plan.take(3000)}")
    assert(!plan.contains("StartsWith"), plan.take(3000))
    // token p17 matches p1:*, p17:*; p4242x matches p4:*, p42:*, p424:*,
    // p4242:*; zz and doc 2 match nothing
    val got = res.collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(got == Map(1L -> Set(1L, 17L, 4L, 42L, 424L, 4242L)), got)
  }

  test("prefix operands in stored queries") {
    val built = QueryIndex.build(spark, Seq(1L -> "al:* & beta").toDF("id", "q"))
    val docs = Seq((1L, "alpha beta"), (2L, "beta gamma"), (3L, "alto beta x")).toDF("doc_id", "text")
    val got = QueryIndex.probe(spark, built, docs, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L))
  }
}
