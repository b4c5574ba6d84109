package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.build.IndexBuilder
import graft.query.Bm25
import graft.search.Searcher

/** Block-max WAND exactness at multi-block scale: 3000 docs with skewed
  * term frequencies force several posting blocks per term (blockSize 64)
  * so the header-only block-max skip actually fires; the top-k must still
  * equal the brute-force BM25 ranking exactly.
  */
class Bm25WandSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val nDocs = 3000
  private def text(i: Int): String = {
    val sb = new StringBuilder
    for (_ <- 0 until (i % 7) + 1) sb.append("alpha ")
    if (i % 2 == 0) for (_ <- 0 until (i % 3) + 1) sb.append("beta ")
    if (i % 5 == 0) sb.append("gamma ")
    // variable-length filler so length norm differs per doc
    for (j <- 0 until (i % 11)) sb.append(s"filler$j ")
    sb.toString.trim
  }

  private lazy val (searcher, dir) = {
    val d = java.nio.file.Files.createTempDirectory("wandidx").toString
    val docs = (0 until nDocs).map(i => (i.toLong, text(i))).toDF("doc_id", "text")
    IndexBuilder.build(spark, docs, "doc_id", "text", d,
      IndexBuilder.Params(nShards = 4, blockSize = 64))
    (new Searcher(spark, d), d)
  }

  test("multi-block WAND top-k equals brute force (block-max skip exercised)") {
    val terms = Seq("alpha", "beta", "gamma")
    val meta = searcher.meta
    val toks: Map[Long, Map[String, Int]] = (0 until nDocs).map { i =>
      val ts = text(i).split("\\s+").filter(_.nonEmpty)
      i.toLong -> ts.groupBy(identity).map { case (t, o) => t -> o.length }
    }.toMap
    val lens = (0 until nDocs).map(i => i.toLong -> text(i).split("\\s+").count(_.nonEmpty)).toMap
    val df = terms.map(t => t -> toks.values.count(_.contains(t)).toLong).toMap
    def brute(id: Long): Double = terms.map { t =>
      Bm25.termScore(toks(id).getOrElse(t, 0), df(t), lens(id).toLong, meta.avgLen, meta.numDocs)
    }.sum
    val expected = (0 until nDocs).map(i => (i.toLong, brute(i))).filter(_._2 > 0)
      .sortBy { case (id, s) => (-s, id) }.take(10)
    val got = searcher.topKBm25(terms, 10).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case ((gi, gs), (ei, es)) =>
      assert(gi == ei, s"got ${got.map(_._1).mkString(",")} want ${expected.map(_._1).mkString(",")}")
      assert(math.abs(gs - es) < 1e-9, s"doc $gi")
    }
  }

  test("block peek returns header bounds without moving the cursor") {
    import graft.core.{PostingBlock, PostingCursor, PostingListBuilder}
    val b = new PostingListBuilder(4)
    for (d <- 1 to 10) b.add(d.toLong * 10, d, 100, Array.emptyByteArray)
    val blocks = b.result()
    assert(blocks.length == 3) // 4+4+2
    val cur = new PostingCursor(Iterator(blocks))
    val p1 = cur.peekBlock(45L) // falls in block 2 (docs 50..80)
    assert(p1 != null && p1.lastDoc == 80L && p1.maxTf == 8)
    assert(cur.docId == 10L) // cursor unmoved
    assert(cur.peekBlock(1000L) == null) // beyond the array
  }
}
