package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.build.IndexBuilder
import graft.search.Searcher

/** Multi-column index (field-prefixed keys — the attnum entry prefix of
  * the reference's multicolumn support, src/rumutil.c:266-288; regression
  * sql/orderby.sql:89-106): cross-field AND in one kernel pass, field
  * scoping of terms and prefixes, single-column API guarded.
  */
class MultiColSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val n = 800
  private def title(i: Int): String =
    (if (i % 3 == 0) "alpha " else "beta ") + s"doc$i"
  private def body(i: Int): String = {
    val sb = new StringBuilder("common ")
    if (i % 2 == 0) sb.append("alpha ") // same term, different field!
    if (i % 5 == 0) sb.append("gamma special ")
    sb.append(s"word${i % 7}")
    sb.toString
  }

  private lazy val searcher: Searcher = {
    val docs = (0 until n).map(i => (i.toLong, title(i), body(i))).toDF("doc_id", "title", "body")
    val d = java.nio.file.Files.createTempDirectory("multicol").toString
    IndexBuilder.buildFields(spark, docs, "doc_id",
      Seq("title" -> "title", "body" -> "body"), d,
      IndexBuilder.Params(nShards = 4, blockSize = 64))
    new Searcher(spark, d)
  }

  test("cross-field AND equals brute force; terms are field-scoped") {
    // 'alpha' in title (i%3==0) vs in body (i%2==0) are DIFFERENT keys
    val titleAlpha = searcher.countMulti(Seq("title" -> "alpha"))
    val bodyAlpha = searcher.countMulti(Seq("body" -> "alpha"))
    assert(titleAlpha == (0 until n).count(_ % 3 == 0))
    assert(bodyAlpha == (0 until n).count(_ % 2 == 0))
    val both = searcher.countMulti(Seq("title" -> "alpha", "body" -> "alpha & gamma"))
    assert(both == (0 until n).count(i => i % 3 == 0 && i % 2 == 0 && i % 5 == 0))
  }

  test("prefix search stays inside its field") {
    // word* only exists in body; doc* only in title
    assert(searcher.countMulti(Seq("title" -> "doc:*")) == n)
    assert(searcher.countMulti(Seq("title" -> "word:*")) == 0)
    assert(searcher.countMulti(Seq("body" -> "word:*")) == n)
  }

  test("phrase works within a field") {
    assert(searcher.countMulti(Seq("body" -> "gamma <-> special")) ==
      (0 until n).count(_ % 5 == 0))
  }

  test("single-column API rejected on a multi-column index; unknown field rejected") {
    assert(intercept[IllegalArgumentException](searcher.count("alpha"))
      .getMessage.contains("multi-column"))
    assert(intercept[IllegalArgumentException](
      searcher.countMulti(Seq("nope" -> "alpha"))).getMessage.contains("unknown field"))
    // bare terms on the term-based APIs would silently miss prefixed keys
    assert(intercept[IllegalArgumentException](
      searcher.topKBm25(Seq("alpha"), 3).collect()).getMessage.contains("fieldKey"))
  }

  test("appendFields: incremental insert into a multi-column index") {
    val docs = (0 until 200).map(i => (i.toLong, title(i), body(i))).toDF("doc_id", "title", "body")
    val more = (200 until 300).map(i => (i.toLong, title(i), body(i))).toDF("doc_id", "title", "body")
    val d = java.nio.file.Files.createTempDirectory("mcappend").toString
    IndexBuilder.buildFields(spark, docs, "doc_id",
      Seq("title" -> "title", "body" -> "body"), d,
      IndexBuilder.Params(nShards = 4, blockSize = 64))
    // field names must match
    assert(intercept[IllegalArgumentException](IndexBuilder.appendFields(
      spark, more, "doc_id", Seq("title" -> "title"), d)).getMessage.contains("field mismatch"))
    IndexBuilder.appendFields(spark, more, "doc_id",
      Seq("title" -> "title", "body" -> "body"), d)
    val s = new Searcher(spark, d)
    assert(s.countMulti(Seq("title" -> "alpha")) == (0 until 300).count(_ % 3 == 0))
    assert(s.countMulti(Seq("title" -> "alpha", "body" -> "gamma")) ==
      (0 until 300).count(i => i % 3 == 0 && i % 5 == 0))
  }
}
