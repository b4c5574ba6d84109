package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.search.AnnLsh
import graft.text.TextAnalysis

/** Specs for the text-analysis + embedding-LSH operators. */
class TextAnnSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("langid: marker scores and argmax tie-break") {
    val df = Seq(
      (1L, "the quick fox of the hills"), // en: the×2 + of×1 = 3
      (2L, "der hund und die katze und der vogel"), // de: 2+1+2 = 5
      (3L, "x y z"), // all zero → tie → en (first)
      (4L, "el le la los")) // es: el+los=2, fr: le=1
      .toDF("doc_id", "text")
    val scores = TextAnalysis.langScores(col("text"))
    val out = scores.foldLeft(df) { case (d, (l, c)) => d.withColumn(s"s_$l", c) }
      .withColumn("pred", TextAnalysis.langId(
        scores.map { case (l, _) => l -> col(s"s_$l") }))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("s_en") == 3L)
    assert(out(1L).getAs[String]("pred") == "en")
    assert(out(2L).getAs[Long]("s_de") == 5L)
    assert(out(2L).getAs[String]("pred") == "de")
    assert(out(3L).getAs[String]("pred") == "en") // zero tie → first lang
    assert(out(4L).getAs[Long]("s_es") == 2L)
    assert(out(4L).getAs[String]("pred") == "es")
  }

  test("lsh planes are deterministic ±1 and bucket matches a JVM recompute") {
    val pl = AnnLsh.planes(4, 8)
    assert(pl.length == 4 && pl.forall(_.length == 8))
    assert(pl.flatten.forall(w => w == 1.0 || w == -1.0))
    assert(AnnLsh.planes(4, 8).map(_.toSeq).toSeq == pl.map(_.toSeq).toSeq)

    val vecs = Seq(
      (1L, Array(1.0f, -2.0f, 0.5f, 3.0f, -1.0f, 0.25f, 2.0f, -0.5f)),
      (2L, Array(-1.0f, 1.0f, -1.0f, 1.0f, -1.0f, 1.0f, -1.0f, 1.0f)))
    val got = vecs.toDF("vec_id", "embedding")
      .withColumn("bucket", AnnLsh.bucket(col("embedding"), pl))
      .select("vec_id", "bucket")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // JVM reference: bit b set iff Σ w(b,i)·x(i) > 0, sequential order
    vecs.foreach { case (id, v) =>
      var expect = 0L
      for (b <- 0 until 4) {
        var s = 0.0
        for (i <- v.indices) s += v(i).toDouble * pl(b)(i)
        if (s > 0) expect |= (1L << b)
      }
      assert(got(id) == expect, s"vec $id")
    }
  }

  test("cosine kernels: exact on hand values") {
    val df = Seq((1L, Array(3.0f, 4.0f), Array(3.0f, 4.0f)),
      (2L, Array(1.0f, 0.0f), Array(0.0f, 2.0f)))
      .toDF("id", "a", "b")
      .withColumn("c", AnnLsh.cosine(col("a"), col("b")))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(math.abs(df(1L) - 1.0) < 1e-12)
    assert(math.abs(df(2L) - 0.0) < 1e-12)
  }

  test("hash60 equals the oracle md5-prefix formula") {
    // CAST('0x' || substr(md5('0|1'),1,15) AS BIGINT) computed by hand:
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("0|1".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(AnnLsh.hash60("0|1") == java.lang.Long.parseLong(md.take(15), 16))
  }
}
