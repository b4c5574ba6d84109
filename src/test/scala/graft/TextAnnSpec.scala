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

  test("lsh sign test is quantized: ±1e-13 projections cannot flip a bit") {
    // summation-order noise near ±0 must round to a stable sign on every
    // engine: bucket quantizes the projection to 12 decimals first
    val plane = Array(Array(1.0, 1.0, 1.0))
    val vecs = Seq(
      (1L, Array(1.0f, -1.0f, 1.0e-13f)),  // rounds to 0 → bit clear
      (2L, Array(1.0f, -1.0f, -1.0e-13f)), // rounds to 0 → bit clear
      (3L, Array(1.0f, -1.0f, 2.0e-12f)),  // above quantum → bit set
      (4L, Array(1.0f, 1.0f, 1.0f)))       // plainly positive → bit set
    val got = vecs.toDF("vec_id", "embedding")
      .withColumn("bucket", AnnLsh.bucket(col("embedding"), plane))
      .select("vec_id", "bucket")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
  }

  test("banded signatures: table t uses global planes [8t, 8t+8)") {
    val vecs = Seq(
      (1L, Array.tabulate(64)(i => (if (i % 3 == 0) 1.0f else -0.5f))),
      (2L, Array.tabulate(64)(i => math.sin(i + 1).toFloat)))
    val sig = AnnLsh.signatures(vecs.toDF("vec_id", "embedding"), "embedding", 4, 8, 64)
      .collect().map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(3)).toMap
    assert(sig.size == 8) // 2 vecs × 4 tables
    // JVM reference per (vec, table)
    vecs.foreach { case (id, v) =>
      for (t <- 0 until 4) {
        val pl = AnnLsh.tablePlanes(t, 8, 64)
        var expect = 0L
        for (bit <- 0 until 8) {
          var s = 0.0
          for (i <- v.indices) s += v(i).toDouble * pl(bit)(i)
          if (s > 0) expect |= (1L << bit)
        }
        assert(sig((id, t)) == expect, s"vec $id table $t")
      }
    }
    // table planes = the matching slice of the flat plane sequence
    assert(AnnLsh.tablePlanes(2, 8, 16).map(_.toSeq).toSeq ==
      AnnLsh.planes(24, 16).slice(16, 24).map(_.toSeq).toSeq)
  }

  test("defaultPlanes grows with corpus size") {
    assert(AnnLsh.defaultPlanes(1000) == 8)       // floor
    assert(AnnLsh.defaultPlanes(64L << 20) == 20) // 64M vecs / 64 → 2^20
    assert(AnnLsh.defaultPlanes(1L << 40, 64) == 34)
  }

  test("jaccard self-join is keyed on (sh, doc_id) — no hot-shingle key") {
    val df = SparkEntry.queries("dedup_jaccard_pairs")(spark, "/root/testdata/sf0.001")
    val joins = df.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("SortMergeJoin") || l.contains("BroadcastHashJoin"))
      .toSeq
    // the shingle join's equi-keys must include BOTH sh and a doc-id
    // expression (a key of sh alone concentrates license boilerplate
    // on one shuffle partition at scale)
    val shingleJoin = joins.filter(_.contains("sh_a"))
    assert(shingleJoin.nonEmpty, joins.mkString("\n"))
    assert(shingleJoin.forall(l => l.contains("nbr") || l.contains("doc_id")),
      shingleJoin.mkString("\n"))
  }

  test("ivf: total assignment, self-centroid probe, candidate pruning") {
    import graft.search.AnnIvf
    val vecs = (0 until 40).map(i =>
      (i.toLong, Array.tabulate(16)(d => math.sin(i * 17 + d + 1).toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val cents = vecs.take(4).map(_._2).toArray
    val assigned = AnnIvf.assign(df, "embedding", cents)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(assigned.size == 40)
    assert(assigned.values.forall(c => c >= 0 && c < 4)) // total partition
    // a centroid's own vector assigns to itself (cosine 1.0 beats all)
    for (c <- 0 until 4) assert(assigned(c.toLong) == c, s"centroid $c")
    // probing the query's own centroid first
    assert(AnnIvf.probeClusters(cents(2), cents, 2).head == 2)
    // candidates = probed clusters only, a strict subset of the corpus
    val probes = AnnIvf.probeClusters(cents(0), cents, 2).toSet
    val cand = assigned.filter { case (_, c) => probes(c) }
    assert(cand.nonEmpty && cand.size < 40)
  }

  test("trained ivf: deterministic kmeans, total assignment, skew beats fixed centroids") {
    import graft.search.AnnIvf
    val n = 360
    val dim = 8
    // three direction clusters with disjoint support: main axis c, small
    // deterministic noise on axis c+3 — cross-cluster cosine is exactly 0
    def vecOf(cluster: Int, i: Int): Array[Float] = {
      val v = new Array[Float](dim)
      v(cluster) = 1.0f
      v((cluster + 3) % dim) = 0.1f * ((i % 7) - 3)
      v
    }
    // membership: the hash-ordered sample's first rows span the clusters
    // (so seeding works without kmeans++), while the fixed-centroid demo
    // rows (ids 0..2) share ONE cluster — the skewed layout to beat
    val hashOrder = (0 until n).sortBy(i => (AnnLsh.hash60(i.toString), i))
    val seedIds = hashOrder.take(3)
    val clusterOfId = (0 until n).map { i =>
      val si = seedIds.indexOf(i)
      if (si >= 0) si else if (i <= 2) 0 else i % 3
    }
    val df = (0 until n).map(i => (i.toLong, vecOf(clusterOfId(i), i)))
      .toDF("vec_id", "embedding")
    val c1 = AnnIvf.kmeansCentroids(df, "embedding", "vec_id", k = 3, iters = 2, sampleN = 30)
    val c2 = AnnIvf.kmeansCentroids(df, "embedding", "vec_id", k = 3, iters = 2, sampleN = 30)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq) // deterministic replay

    val trained = AnnIvf.assignD(df, "embedding", c1)
      .groupBy("cluster").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(trained.values.sum == n) // total assignment
    val fixedCents = (0 to 2).map(i => vecOf(clusterOfId(i), i)).toArray
    val fixed = AnnIvf.assign(df, "embedding", fixedCents)
      .groupBy("cluster").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // fixed same-direction centroids collapse most of the corpus onto one
    // cluster; trained centroids stay near-balanced
    assert(trained.values.max < fixed.values.max,
      s"trained=$trained fixed=$fixed")
    assert(trained.values.max <= n / 3 + n / 6, s"trained=$trained")
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
