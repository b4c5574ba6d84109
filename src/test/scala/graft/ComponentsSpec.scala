package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.Components

/** Connected components over near-dup pairs: exact component-minimum reps
  * on chains, cycles, stars, and isolated vertices; deterministic across
  * runs.
  */
class ComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], docs: Seq[Long]): Map[Long, Long] =
    Components.components(edges.toDF("a", "b"), "a", "b", docs.toDF("d"), "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain, cycle, star, isolated vertices") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),           // chain 1-2-3-4 → rep 1
      (10L, 11L), (11L, 12L), (12L, 10L),     // cycle → rep 10
      (20L, 21L), (20L, 22L), (20L, 23L),     // star → rep 20
      (31L, 30L))                             // reversed edge direction
    val docs = (1L to 4L) ++ Seq(10L, 11L, 12L) ++ (20L to 23L) ++
      Seq(30L, 31L) ++ Seq(99L) // 99 isolated
    val got = run(edges, docs)
    assert((1L to 4L).forall(got(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(got(_) == 10L))
    assert((20L to 23L).forall(got(_) == 20L))
    assert(got(30L) == 30L && got(31L) == 30L)
    assert(got(99L) == 99L)
    assert(got.size == docs.size)
  }

  private def runStar(edges: Seq[(Long, Long)], docs: Seq[Long]): Map[Long, Long] =
    Components.componentsStar(edges.toDF("a", "b"), "a", "b", docs.toDF("d"), "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("large-star/small-star equals min-label propagation on every shape") {
    val cases: Seq[(Seq[(Long, Long)], Seq[Long])] = Seq(
      // chain, cycle, star, reversed edge, isolated vertex
      (Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (12L, 10L),
        (20L, 21L), (20L, 22L), (20L, 23L), (31L, 30L)),
        (1L to 4L) ++ Seq(10L, 11L, 12L) ++ (20L to 23L) ++ Seq(30L, 31L, 99L)),
      // long chain: diameter stress (the case star formulations exist for)
      ((0 until 60).map(i => (i.toLong + 1, i.toLong)), (0L to 60L).toSeq),
      // deterministic pseudo-random graph with several components
      ({
        val rnd = new scala.util.Random(42)
        (0 until 120).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
          .filter(e => e._1 != e._2)
      }, (0L until 60L).toSeq),
      // empty edge set
      (Seq.empty, Seq(5L, 6L)))
    cases.foreach { case (edges, docs) =>
      assert(runStar(edges, docs) == run(edges, docs), s"edges=$edges")
    }
  }

  test("componentsStar surfaces non-convergence at tiny maxIters") {
    val edges = (0 until 32).map(i => (i.toLong, i.toLong + 1))
    val ex = intercept[IllegalArgumentException] {
      Components.componentsStar(edges.toDF("a", "b"), "a", "b",
        (0L to 32L).toDF("d"), "d", maxIters = 1)
    }
    assert(ex.getMessage.contains("converge"), ex.getMessage)
  }

  test("exhausting maxIters before the fixpoint is surfaced, not silent") {
    // a chain needs ~log2(diameter) pointer-jumping rounds plus one
    // confirming round; maxIters = 1 cannot reach the fixpoint
    val edges = (0 until 8).map(i => (i.toLong, i.toLong + 1))
    val ex = intercept[IllegalArgumentException] {
      Components.components(edges.toDF("a", "b"), "a", "b",
        (0L to 8L).toDF("d"), "d", maxIters = 1)
    }
    assert(ex.getMessage.contains("converge"), ex.getMessage)
  }

  test("long chain converges (diameter-bound iterations) and is deterministic") {
    val n = 40
    val edges = (0 until n - 1).map(i => (i.toLong + 1, i.toLong)) // reversed chain
    val docs = (0L until n.toLong).toSeq
    val a = run(edges, docs)
    val b = run(edges, docs)
    assert(a == b)
    assert(docs.forall(a(_) == 0L))
  }
}
