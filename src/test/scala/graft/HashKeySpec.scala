package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.build.IndexBuilder
import graft.core.HashKeys
import graft.search.Searcher

/** Hash-keyed opclass parity (reference rum_tsvector_hash_ops, regression
  * suites rum_hash/orderby_hash): every query answerable without partial
  * match must return exactly what the text-keyed index returns on the same
  * corpus; prefix search is rejected like the reference
  * (expected/rum_hash.out:310).
  */
class HashKeySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val nDocs = 1200
  private def text(i: Int): String = {
    val sb = new StringBuilder
    sb.append("base ")
    if (i % 2 == 0) sb.append("alpha beta ")
    if (i % 3 == 0) sb.append("gamma ")
    if (i % 11 == 0) sb.append("needle in the stack ")
    sb.append(s"tail${i % 9}")
    sb.toString
  }

  private lazy val (textIdx, hashIdx) = {
    val docs = (0 until nDocs).map(i => (i.toLong, text(i), i.toLong % 50)).toDF("doc_id", "text", "d")
    val dT = java.nio.file.Files.createTempDirectory("kidxT").toString
    val dH = java.nio.file.Files.createTempDirectory("kidxH").toString
    IndexBuilder.build(spark, docs, "doc_id", "text", dT,
      IndexBuilder.Params(nShards = 4, blockSize = 64, attach = Some("d")))
    IndexBuilder.build(spark, docs, "doc_id", "text", dH,
      IndexBuilder.Params(nShards = 4, blockSize = 64, attach = Some("d"), keyKind = "hash"))
    (new Searcher(spark, dT), new Searcher(spark, dH))
  }

  test("boolean/phrase/rank queries agree between text and hash keys") {
    val queries = Seq(
      "alpha & gamma", "alpha | gamma", "!alpha & gamma",
      "needle <-> in", "needle <2> the", "alpha & !needle")
    for (q <- queries)
      assert(textIdx.count(q) == hashIdx.count(q), s"count mismatch on '$q'")
    val t = textIdx.topKCover("alpha & gamma", 7).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val h = hashIdx.topKCover("alpha & gamma", 7).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(t.toSeq == h.toSeq)
    val tb = textIdx.topKBm25(Seq("alpha", "gamma", "needle"), 5).collect().map(_.getLong(0))
    val hb = hashIdx.topKBm25(Seq("alpha", "gamma", "needle"), 5).collect().map(_.getLong(0))
    assert(tb.toSeq == hb.toSeq)
    assert(textIdx.topKAddon("alpha & gamma", 25L, "both", 5).collect().map(_.getLong(0)).toSeq ==
      hashIdx.topKAddon("alpha & gamma", 25L, "both", 5).collect().map(_.getLong(0)).toSeq)
  }

  test("prefix search rejected on hash keys (reference rum_hash.out:310)") {
    val e = intercept[IllegalArgumentException](hashIdx.count("need:* & alpha"))
    assert(e.getMessage.contains("prefix"))
  }

  test("hash keys are fixed-width hex and deterministic") {
    assert(HashKeys.hex("merge").length == 16)
    assert(HashKeys.hex("merge") == HashKeys.hex("merge"))
    assert(HashKeys.hex("merge") != HashKeys.hex("merg"))
    // FNV-1a vector: fnv64("") = offset basis
    assert(HashKeys.fnv64("") == 0xcbf29ce484222325L)
  }
}
