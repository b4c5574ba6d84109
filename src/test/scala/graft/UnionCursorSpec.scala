package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.build.IndexBuilder
import graft.core.{PositionCodec, PostingCursor, PostingListBuilder}
import graft.search.{SearchKernel, Searcher}

/** Heap-based prefix union (SearchKernel.HeapUnionCursor) must be
  * observationally identical to the linear UnionCursor under arbitrary
  * next/seek interleavings — the reference's partial-match path unions the
  * expansion once into a sorted stream (src/rumget.c:292-481); the heap
  * keeps that sub-linear-in-width advance cost lazily.
  */
class UnionCursorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** member posting list over the given ascending docIds; payloads are
    * functions of the docId so duplicate docIds across members agree
    * (as real per-doc payloads do).
    */
  private def mkCursor(docs: Seq[Long]): PostingCursor = {
    val b = new PostingListBuilder(8)
    docs.foreach { d =>
      val pos = Array(1 + (d % 5).toInt, 7 + (d % 3).toInt)
      val w = Array(0.toByte, 0.toByte)
      b.add(d, 1 + (d % 3).toInt, 10 + (d % 4).toInt, PositionCodec.encode(pos, w), d * 2)
    }
    new PostingCursor(Iterator(b.result()))
  }

  test("heap union ≡ linear union under random next/seek interleavings") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 25) {
      val nMembers = 66 + rnd.nextInt(60) // above the heap threshold
      val memberDocs: Seq[Seq[Long]] = (0 until nMembers).map { _ =>
        val k = rnd.nextInt(40)
        Seq.fill(k)(rnd.nextInt(500).toLong).distinct.sorted
      }
      val a = new SearchKernel.UnionCursor(memberDocs.map(mkCursor).toArray)
      val b = new SearchKernel.HeapUnionCursor(memberDocs.map(mkCursor).toArray)
      var steps = 0
      while (!a.done && !b.done && steps < 5000) {
        assert(a.docId == b.docId, s"trial $trial docId")
        assert(a.tf == b.tf, s"trial $trial tf @ ${a.docId}")
        assert(a.docLen == b.docLen, s"trial $trial len @ ${a.docId}")
        assert(a.addonVal == b.addonVal, s"trial $trial addon @ ${a.docId}")
        val (ap, aw) = a.positions
        val (bp, bw) = b.positions
        assert(ap.toSeq == bp.toSeq && aw.toSeq == bw.toSeq, s"trial $trial pos @ ${a.docId}")
        if (rnd.nextBoolean()) { a.next(); b.next() }
        else {
          val t = a.docId + 1 + rnd.nextInt(25)
          a.seek(t); b.seek(t)
        }
        steps += 1
      }
      assert(a.done == b.done, s"trial $trial done")
    }
  }

  test("wide prefix end-to-end: >64 expansion terms, heap path, exact results") {
    // 120 distinct terms share the prefix 'pfx'; every doc carries a few of
    // them plus 'anchor' on even ids — prefix & anchor must equal brute force
    val n = 400
    val docs = (0 until n).map { i =>
      val terms = (0 until 3).map(j => s"pfx${(i * 7 + j * 13) % 120}")
      val anchor = if (i % 2 == 0) " anchor" else ""
      (i.toLong, terms.mkString(" ") + anchor)
    }
    val dir = java.nio.file.Files.createTempDirectory("heapunion").toString
    IndexBuilder.build(spark, docs.toDF("id", "t"), "id", "t", dir,
      IndexBuilder.Params(nShards = 2, blockSize = 16))
    val s = new Searcher(spark, dir)
    // every doc has a pfx term → prefix alone matches all
    assert(s.count("pfx:*") == n)
    assert(s.count("pfx:* & anchor") == n / 2)
    // positions survive the union: phrase through the prefix expansion
    val ids = s.matchingDocs("pfx:* <-> anchor").collect().map(_.getLong(0)).toSet
    val expect = (0 until n).filter(i => i % 2 == 0).map(_.toLong).toSet
    assert(ids == expect) // anchor always follows the last pfx term
  }
}
