package graft

import org.scalatest.funsuite.AnyFunSuite

/** Exact-substring dedup (fixed-window n-grams) + stopword inventory:
  * each driver query is checked against a full in-JVM recompute of the
  * same definition at sf0.001 (500 docs — exhaustive, not sampled).
  */
class PipelineOpsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs: Array[(Long, Array[String])] = {
    val re = "[a-z0-9]+".r
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> re.findAllIn(r.getString(1).toLowerCase).toArray)
  }

  test("dedup_ngram_spans matches an in-JVM recompute (all docs, n=8)") {
    val got = SparkEntry.queries("dedup_ngram_spans")(spark, dir)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap

    val grams = docs.map { case (id, toks) =>
      id -> toks.sliding(8).filter(_.length == 8).map(_.mkString(" ")).toArray
    }
    val docsPerGram = scala.collection.mutable.HashMap.empty[String, scala.collection.mutable.Set[Long]]
    grams.foreach { case (id, gs) =>
      gs.foreach(g => docsPerGram.getOrElseUpdate(g,
        scala.collection.mutable.Set.empty) += id)
    }
    val expect = grams.flatMap { case (id, gs) =>
      val dw = gs.count(g => docsPerGram(g).size >= 2).toLong
      if (dw > 0) Some(id -> ((dw, gs.length.toLong))) else None
    }.toMap
    assert(expect.nonEmpty) // the corpus really contains duplicated spans
    assert(got == expect)
  }

  test("text_stopwords matches an in-JVM df ranking") {
    val got = SparkEntry.queries("text_stopwords")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)))

    val df = scala.collection.mutable.HashMap.empty[String, Int]
    docs.foreach { case (_, toks) =>
      toks.distinct.foreach(t => df(t) = df.getOrElse(t, 0) + 1)
    }
    val expect = df.toSeq.sortBy { case (t, d) => (-d, t) }.take(25)
      .map { case (t, d) => (t, d.toLong) }
    assert(got.toSeq == expect)
  }
}
