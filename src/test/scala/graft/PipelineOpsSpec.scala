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

  test("dedup_ngram_maxspans: islands of consecutive dup windows (in-JVM)") {
    val got = SparkEntry.queries("dedup_ngram_maxspans")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))

    val grams = docs.map { case (id, toks) =>
      id -> toks.sliding(8).filter(_.length == 8).map(_.mkString(" ")).toArray
    }
    val docsPerGram = scala.collection.mutable.HashMap.empty[String, scala.collection.mutable.Set[Long]]
    grams.foreach { case (id, gs) =>
      gs.foreach(g => docsPerGram.getOrElseUpdate(g,
        scala.collection.mutable.Set.empty) += id)
    }
    val expect = grams.flatMap { case (id, gs) =>
      val starts = gs.zipWithIndex.collect {
        case (g, i) if docsPerGram(g).size >= 2 => i + 1 // 1-based pos
      }
      // islands: split where the gap exceeds 1
      val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long, Long)]
      var i = 0
      while (i < starts.length) {
        var j = i
        while (j + 1 < starts.length && starts(j + 1) == starts(j) + 1) j += 1
        spans += ((id, starts(i), (j - i + 1).toLong, (j - i + 1 + 7).toLong))
        i = j + 1
      }
      spans
    }.sortBy(s => (s._1, s._2))
    assert(expect.nonEmpty)
    assert(got.toSeq == expect.toSeq)
    // merged spans really are maximal: no two adjacent spans touch
    expect.groupBy(_._1).foreach { case (_, ss) =>
      ss.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) => assert(b._2 > a._2 + a._3, s"$a | $b")
        case _ =>
      }
    }
  }

  test("text_tfidf matches an in-JVM recompute (top-5 per doc)") {
    val got = SparkEntry.queries("text_tfidf")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3)))

    val n = docs.length.toDouble
    val df = scala.collection.mutable.HashMap.empty[String, Int]
    docs.foreach { case (_, toks) =>
      toks.distinct.foreach(t => df(t) = df.getOrElse(t, 0) + 1)
    }
    def round6(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP)
        .doubleValue()
    val expect = docs.flatMap { case (id, toks) =>
      toks.groupBy(identity).view.mapValues(_.length).toSeq
        .map { case (t, tf) => (t, round6(tf * math.log(n / df(t)))) }
        .sortBy { case (t, s) => (-s, t) }
        .take(5).zipWithIndex
        .map { case ((t, s), i) => (id, t, s, i + 1) }
    }.sortBy(e => (e._1, e._4))
    assert(got.toSeq == expect.toSeq)
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
