package graft

import org.apache.spark.sql.SparkSession

import graft.build.IndexBuilder
import graft.search.Searcher
import graft.sources.CorpusGen

/** Diagnostic bench (NOT driver-facing; Bench.scala is the frozen harness):
  * decomposes the corpus_build phases and isolates per-query costs with the
  * noop sink so optimization work can attribute time to tokenize / pack /
  * shuffle-merge / write / stats instead of one opaque wall number.
  *
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 sbt "runMain graft.BenchExtra"
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Unit): Double = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[extra] $name: $s%.3fs")
      spark.sparkContext.setJobDescription(null)
      s
    }

    // ---- corpus_build decomposition (same shape as Bench's section) ----
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1).toDouble).getOrElse(0.1)
    val nFiles = sys.env.get("SPARK_GRAFT_CORPUS_FILES").map(_.toLong)
      .getOrElse(math.max(2000L, (sf * 500000).toLong))
    val corpus = CorpusGen.withDocId(CorpusGen.generate(spark, nFiles, cpus.toInt * 2))
    time("corpus gen alone (noop)") {
      corpus.write.format("noop").mode("overwrite").save()
    }
    val idxDir = java.nio.file.Files.createTempDirectory("extraidx").toString
    time(s"corpus_build total ($nFiles files)") {
      IndexBuilder.build(spark, corpus, "doc_id", "content", idxDir,
        IndexBuilder.Params(nShards = cpus.toInt, tokenizer = "code"))
    }

    // second identical build in the same JVM: the delta vs the first is
    // JIT/codegen warmup, which the frozen bench pays (fresh JVM per run)
    if (sys.env.contains("SPARK_GRAFT_BUILD_TWICE")) {
      val idxDir2 = java.nio.file.Files.createTempDirectory("extraidx2").toString
      time(s"corpus_build total warm-JVM repeat") {
        IndexBuilder.build(spark, corpus, "doc_id", "content", idxDir2,
          IndexBuilder.Params(nShards = cpus.toInt, tokenizer = "code"))
      }
    }

    // ---- pack-pipeline decomposition (noop sink, guide §1.4) ----
    // isolates: tokenize+cache, the stage-A partition sort, the full
    // A+B pack compute (noop), and the parquet write delta
    if (sys.env.contains("SPARK_GRAFT_PACK_PHASES")) {
      val params = IndexBuilder.Params(nShards = cpus.toInt, tokenizer = "code")
      val exploded = IndexBuilder.explodedOf(
        IndexBuilder.normalize(corpus, "doc_id", "content", params), params).persist()
      time("pack: tokenize+cache count") { exploded.count() }
      time("pack: stage-A sort only (noop)") {
        exploded.sortWithinPartitions("shard", "term", "docId")
          .write.format("noop").mode("overwrite").save()
      }
      time("pack: A+B compute (noop)") {
        IndexBuilder.packDataset(spark, exploded, params)
          .write.format("noop").mode("overwrite").save()
      }
      val pd = java.nio.file.Files.createTempDirectory("extrapack").toString
      time("pack: A+B + parquet write") {
        IndexBuilder.packDataset(spark, exploded, params)
          .write.mode("overwrite").partitionBy("shard").parquet(pd)
      }
      exploded.unpersist(blocking = false)
    }

    // ---- small-index build (the prewarm/IndexCache shape) ----
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    for (t <- 1 to 2) {
      val d = java.nio.file.Files.createTempDirectory("extrasmall").toString
      time(s"small build plain t$t") {
        IndexBuilder.build(spark, docs, "doc_id", "text", d,
          IndexBuilder.Params(nShards = 8, numPartitions = 8,
            tokenizer = "simple", attach = Some("n_chars")))
      }
      val d2 = java.nio.file.Files.createTempDirectory("extrasmallalt").toString
      time(s"small build alt t$t") {
        IndexBuilder.build(spark, docs, "doc_id", "text", d2,
          IndexBuilder.Params(nShards = 8, numPartitions = 8,
            tokenizer = "simple", attach = Some("n_chars"), altOrder = true))
      }
      if (t == 2) {
        val s1 = new Searcher(spark, d)
        time("small index warm count") { s1.count("zzz") }
        time("small index count q1") { s1.count("order & merge") }
        time("small index count q2") { s1.count("vector | stream") }
        val nPost = java.nio.file.Files.walk(java.nio.file.Paths.get(d, "postings"))
          .filter(p => p.toString.endsWith(".parquet")).count()
        println(s"[extra] small index postings files: $nPost")
      }
    }
    spark.stop()
  }
}
