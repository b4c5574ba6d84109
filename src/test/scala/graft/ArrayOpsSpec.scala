package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.compat.ArrayOps

/** Array operator semantics vs the reference fixture
  * (/root/reference/sql/array.sql + expected/array.out): the 6-row
  * test_array table `{}, {0}, {1,2,3,4}, {1,2,3}, {1,2}, {1}`.
  */
class ArrayOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val df = Seq(
    (1, Seq.empty[Int]), (2, Seq(0)), (3, Seq(1, 2, 3, 4)),
    (4, Seq(1, 2, 3)), (5, Seq(1, 2)), (6, Seq(1))
  ).toDF("id", "i")

  private def ids(c: org.apache.spark.sql.Column): Set[Int] =
    df.where(c).select("id").collect().map(_.getInt(0)).toSet

  private def arr(xs: Int*) = typedlit(xs.toSeq)

  test("&& overlap (expected/array.out)") {
    assert(ids(ArrayOps.overlap($"i", arr())) == Set())
    assert(ids(ArrayOps.overlap($"i", arr(1))) == Set(3, 4, 5, 6))
    assert(ids(ArrayOps.overlap($"i", arr(4))) == Set(3))
    assert(ids(ArrayOps.overlap($"i", arr(4, 3, 2, 1))) == Set(3, 4, 5, 6))
    assert(ids(ArrayOps.overlap($"i", arr(100))) == Set())
  }

  test("@> contains") {
    assert(ids(ArrayOps.contains($"i", arr())) == Set(1, 2, 3, 4, 5, 6)) // {} contained by all
    assert(ids(ArrayOps.contains($"i", arr(1))) == Set(3, 4, 5, 6))
    assert(ids(ArrayOps.contains($"i", arr(1, 2))) == Set(3, 4, 5))
    assert(ids(ArrayOps.contains($"i", arr(1, 2, 3, 4))) == Set(3))
    assert(ids(ArrayOps.contains($"i", arr(0, 100))) == Set())
  }

  test("<@ contained by") {
    assert(ids(ArrayOps.containedBy($"i", arr())) == Set(1))
    assert(ids(ArrayOps.containedBy($"i", arr(1, 2))) == Set(1, 5, 6))
    assert(ids(ArrayOps.containedBy($"i", arr(1, 2, 3, 4))) == Set(1, 3, 4, 5, 6))
  }

  test("= equality") {
    assert(ids(ArrayOps.equal($"i", arr())) == Set(1))
    assert(ids(ArrayOps.equal($"i", arr(1, 2))) == Set(5))
    assert(ids(ArrayOps.equal($"i", arr(2, 1))) == Set()) // positional, PG parity
  }

  test("% similar at default cosine threshold 0.5 (expected/array.out)") {
    // i % '{1}': cosine = 1/sqrt(n) ≥ 0.5 → n ≤ 4
    assert(ids(ArrayOps.similar($"i", arr(1))) == Set(3, 4, 5, 6))
    // i % '{1,2}': 2/sqrt(2n) for supersets
    assert(ids(ArrayOps.similar($"i", arr(1, 2))) == Set(3, 4, 5, 6))
  }

  test("<=> distance ordering (expected/array.out:94-104)") {
    val got = df.where(ArrayOps.overlap($"i", arr(1)))
      .orderBy(ArrayOps.distance($"i", arr(1)).asc, $"id")
      .select("id").collect().map(_.getInt(0)).toSeq
    // {1}, {1,2}, {1,2,3}, {1,2,3,4}
    assert(got == Seq(6, 5, 4, 3))
  }

  test("similarity modes agree with getSimilarity formulas") {
    val r = df.select(
      ArrayOps.similarity(arr(1, 2, 3), arr(2, 3, 4), "cosine"),
      ArrayOps.similarity(arr(1, 2, 3), arr(2, 3, 4), "jaccard"),
      ArrayOps.similarity(arr(1, 2, 3), arr(2, 3, 4), "overlap")).head()
    assert(math.abs(r.getDouble(0) - 2.0 / 3.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - 2.0 / 4.0) < 1e-12)
    assert(r.getDouble(2) == 2.0)
  }

  test("null/empty semantics") {
    // empty arrays: similarity 0, distance ∞
    val r = df.select(ArrayOps.distance(arr(), arr(1))).head()
    assert(r.getDouble(0).isPosInfinity)
  }
}
