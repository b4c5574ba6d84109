package graft

import org.apache.spark.sql.SparkSession

import graft.search.Searcher

/** Diagnostic: per-query vs batched (msearch) execution cost on an
  * EXISTING index at one parallelism level — isolates driver dispatch from
  * executor work when calibrating scaling runs.
  *
  *   sbt "runMain graft.QueryProbe <cores> <indexDir> [clients]"
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val dir = args(1)
    val clients = if (args.length > 2) args(2).toInt else math.max(2, cores / 2)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores * 2)
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // no manifest at `dir` → build the probe corpus there first (build it
    // once at high parallelism, then probe the SAME index at each level)
    if (graft.build.SegmentCatalog.load(dir).isEmpty) {
      val n = sys.env.getOrElse("PROBE_FILES", "800000").toLong
      val corpus = graft.sources.CorpusGen.withDocId(
        graft.sources.CorpusGen.generate(spark, n, cores * 2))
      graft.build.IndexBuilder.build(spark, corpus, "doc_id", "content", dir,
        graft.build.IndexBuilder.Params(nShards = 32, tokenizer = "code"))
    }
    val searcher = new Searcher(spark, dir)

    def time(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe] cores=$cores $name: $s%.3fs")
      s
    }

    Bench.queryLatencies(searcher, 1) // warm plans + footers
    Bench.queryBatch(searcher)
    for (t <- 1 to 3)
      time(s"sequential 12 queries (1 thread) t$t") {
        Bench.queryLatencies(searcher, 2)
      }
    for (t <- 1 to 3)
      time(s"concurrent ${clients}x12 queries t$t") {
        val ths = (1 to clients).map { c =>
          val th = new Thread(() => {
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", s"c$c")
            Bench.queryLatencies(searcher, 2); ()
          })
          th.start(); th
        }
        ths.foreach(_.join())
      }
    for (t <- 1 to 3)
      time(s"batched 2x6 queries (1 thread) t$t") {
        Bench.queryBatch(searcher); Bench.queryBatch(searcher)
      }
    for (t <- 1 to 3)
      time(s"concurrent batched ${clients}x2x6 t$t") {
        val ths = (1 to clients).map { c =>
          val th = new Thread(() => {
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", s"b$c")
            Bench.queryBatch(searcher); Bench.queryBatch(searcher); ()
          })
          th.start(); th
        }
        ths.foreach(_.join())
      }
    // fresh-plan single queries (new Searcher per query defeats the plan
    // cache; cross-execution stage reuse does not exist) — the true ad-hoc
    // per-query cost
    for (t <- 1 to 2) {
      val names = Seq("bm25_3term", "bm25_4term", "count_and", "count_or",
        "cover_topk", "prefix_count")
      val fns: Seq[Searcher => Unit] = Seq(
        sr => { sr.topKBm25(Seq("merge", "index", "partition"), 10).collect(); () },
        sr => { sr.topKBm25(Seq("license", "return", "value", "data"), 10).collect(); () },
        sr => { sr.count("merge & partition"); () },
        sr => { sr.count("hash | tree | heap"); () },
        sr => { sr.topKCover("index & (merge | sort)", 10).collect(); () },
        sr => { sr.count("seg:* & commit"); () })
      names.zip(fns).foreach { case (n, f) =>
        time(s"fresh single $n t$t")(f(new Searcher(spark, dir)))
      }
    }

    // mechanism check: does a repeated action on the SAME cached Dataset
    // skip shuffle work (AQE materialized-stage reuse)? First run on a
    // fresh agg plan is the full-execution baseline; the repeats hit the
    // cached runCount plan whose stages are already materialized.
    import org.apache.spark.sql.functions.{count => fcount, lit}
    time("fresh-plan count (baseline)") {
      searcher.matchingDocs("merge & partition").agg(fcount(lit(1))).collect()
    }
    for (t <- 1 to 3)
      time(s"repeat count on cached plan t$t") {
        searcher.count("merge & partition")
      }
    // same 6-query union ScalingBench's ad-hoc phase times (one source of
    // truth: Bench.queryBatchFresh) — fresh Dataset per call, full dataflow
    for (t <- 1 to 3)
      time(s"fresh-plan 6-query union t$t") {
        Bench.queryBatchFresh(searcher)
      }
    // decomposition: per-batch DRIVER PLANNING alone (build the fresh
    // Dataset and force the initial physical plan, no action) vs the full
    // batch. Planning is serial driver work a bigger cluster cannot
    // shrink; the difference is the executor dataflow that scales. (AQE's
    // runtime re-planning is excluded — this is the pre-execution cost.)
    for (t <- 1 to 3)
      time(s"plan-only per-branch batch t$t") {
        Bench.queryBatchFresh(searcher, planOnly = true); ()
      }
    for (t <- 1 to 3)
      time(s"plan-only fused batch t$t") {
        Bench.queryBatchFused(searcher, planOnly = true); ()
      }
    for (t <- 1 to 3)
      time(s"full fused batch t$t") {
        Bench.queryBatchFused(searcher)
      }
    // ordered-scan (alt-layout) batch — the same planning-vs-execution
    // decomposition for the addon/range/facet family. The alt index lives
    // beside the primary probe index and is built once (same corpus + the
    // ScalingBench addon column), then probed at every level.
    val altDir = dir + "_alt"
    if (graft.build.SegmentCatalog.load(altDir).isEmpty) {
      import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
      val n = sys.env.getOrElse("PROBE_FILES", "800000").toLong
      val corpus = graft.sources.CorpusGen.withDocId(
        graft.sources.CorpusGen.generate(spark, n, cores * 2))
        .withColumn("d", pmod(xxhash64(col("doc_id")), lit(100000L)))
      graft.build.IndexBuilder.build(spark, corpus, "doc_id", "content", altDir,
        graft.build.IndexBuilder.Params(nShards = 32, tokenizer = "code",
          attach = Some("d"), altOrder = true))
    }
    val altSearcher = new Searcher(spark, altDir)
    Bench.queryBatchAddonFresh(altSearcher) // warm footers + stats memo
    for (t <- 1 to 3)
      time(s"plan-only ordered-scan batch t$t") {
        Bench.queryBatchFusedN(altSearcher, Bench.addonSpecs, planOnly = true); ()
      }
    for (t <- 1 to 3)
      time(s"full ordered-scan batch t$t") {
        Bench.queryBatchAddonFresh(altSearcher); ()
      }
    spark.stop()
  }
}
