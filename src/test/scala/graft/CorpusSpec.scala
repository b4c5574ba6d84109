package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.build.IndexBuilder
import graft.search.Searcher
import graft.sources.CorpusGen

class CorpusSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("corpus generation is deterministic (sha256 per-row invariant)") {
    val a = CorpusGen.generate(spark, 500, 4)
      .select(col("repo"), col("path"), col("commit"), sha2(col("content"), 256).as("sha"))
      .collect().map(_.toSeq).sortBy(_.toString)
    val b = CorpusGen.generate(spark, 500, 7) // different partitioning
      .select(col("repo"), col("path"), col("commit"), sha2(col("content"), 256).as("sha"))
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(a.length == 500 && a.sameElements(b))
  }

  test("corpus shape matches the input hint") {
    val row = CorpusGen.generate(spark, 10, 2).head()
    assert(row.schema.fieldNames.toSeq == Seq("repo", "path", "commit", "lang", "content"))
    assert(row.getAs[String]("commit").length == 40)
    assert(row.getAs[String]("repo").startsWith("org/repo-"))
    assert(Set("scala", "java", "c", "py", "go", "sql")(row.getAs[String]("lang")))
    assert(row.getAs[String]("content").nonEmpty)
  }

  test("docIds are unique at test scale") {
    val n = CorpusGen.withDocId(CorpusGen.generate(spark, 5000, 8))
      .select("doc_id").distinct().count()
    assert(n == 5000)
  }

  test("head-term skew exists (zipf head)") {
    import spark.implicits._
    val df = CorpusGen.generate(spark, 300, 4)
    val counts = df.select(explode(split(lower(col("content")), "[^a-z0-9]+")).as("t"))
      .where(col("t") =!= "").groupBy("t").count()
      .orderBy(col("count").desc).limit(5).as[(String, Long)].collect()
    // 'license' appears in every header line; zipf head terms dominate
    assert(counts.map(_._1).contains("license"))
    assert(counts.head._2 > 300, counts.mkString(","))
  }

  test("end-to-end: build + query the code corpus with the code tokenizer") {
    val dir = java.nio.file.Files.createTempDirectory("codeidx").toString
    val corpus = CorpusGen.withDocId(CorpusGen.generate(spark, 1000, 4))
    val meta = IndexBuilder.build(spark, corpus, "doc_id", "content", dir,
      IndexBuilder.Params(nShards = 8, tokenizer = "code"))
    assert(meta.numDocs == 1000)
    val s = new Searcher(spark, dir)
    // every file contains the license header
    assert(s.count("license & header") == 1000)
    // camelCase splitting: compound identifiers are findable by their parts
    assert(s.count("license <-> header") == 1000)
    val bm = s.topKBm25(Seq("merge", "partition"), 5).collect()
    assert(bm.nonEmpty && bm.forall(_.getDouble(1) > 0))
    // brute-force cross-check one conjunctive count via the raw corpus
    import spark.implicits._
    val brute = corpus.select(col("doc_id"), col("content"))
      .as[(Long, String)].collect()
      .count { case (_, c) =>
        val toks = graft.tokenize.Tokenizer.codeTokens(c).toSet
        toks.contains("merge") && toks.contains("partition")
      }
    assert(s.count("merge & partition") == brute)
  }
}
