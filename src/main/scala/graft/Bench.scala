package graft

import org.apache.spark.sql.SparkSession

import graft.build.IndexBuilder
import graft.search.Searcher
import graft.sources.CorpusGen

/** Per-round benchmark. Prints ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}
  *
  * Sections (all keys land in "queries"):
  *   corpus_build      — index-build wall sec over the synthetic code corpus
  *                       (files/sec reported as corpus_files_per_sec)
  *   query_p50_prepared/p95_prepared — plan-cache hot-path latency (sec)
  *   query_p50_adhoc   — fresh-planned msearch batch, per-query sec
  *   <driver queries>  — each SparkEntry query once, warm
  */
object Bench {

  /** number of queries in [[queryLatencies]]'s set (asserted there) —
    * shared with ScalingBench's per-client rep math instead of a literal.
    */
  val latencySetSize = 6

  def queryLatencies(searcher: Searcher, reps: Int): Array[Double] = {
    val queries = Seq(
      () => searcher.topKBm25(Seq("merge", "index", "partition"), 10).collect(),
      () => searcher.topKBm25(Seq("license", "return", "value", "data"), 10).collect(),
      () => searcher.count("merge & partition"),
      () => searcher.count("hash | tree | heap"),
      () => searcher.topKCover("index & (merge | sort)", 10).collect(),
      () => searcher.count("seg:* & commit"))
    assert(queries.length == latencySetSize)
    val times = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 1 to reps; q <- queries) {
      val t0 = System.nanoTime()
      q()
      times += (System.nanoTime() - t0) / 1e9
    }
    times.toArray.sorted
  }

  private def benchSet(searcher: Searcher) = Seq(
    searcher.topKBm25(Seq("merge", "index", "partition"), 10),
    searcher.topKBm25(Seq("license", "return", "value", "data"), 10),
    searcher.matchingDocs("merge & partition"),
    searcher.matchingDocs("hash | tree | heap"),
    searcher.topKCover("index & (merge | sort)", 10),
    searcher.matchingDocs("seg:* & commit"))

  /** The same 6-query set as ONE Spark job (msearch batching — see
    * Searcher.batchRowCounts): returns the number of queries served.
    * The union plan is cached; repeated calls may additionally reuse
    * materialized AQE stages (prepared hot path).
    */
  def queryBatch(searcher: Searcher): Int =
    searcher.batchRowCounts("bench6", benchSet(searcher)).length

  /** The 6-query set as ONE FRESH-planned Spark job: a new union Dataset
    * per call means a new execution — no materialized-stage reuse — so the
    * batch pays full planning + full execution (the ad-hoc msearch path;
    * the sound basis for throughput-scaling measurements).
    */
  /** `planOnly = true` builds the fresh Dataset and forces its initial
    * physical plan without executing — the driver-planning share of a
    * batch (QueryProbe's decomposition).
    */
  def queryBatchFresh(searcher: Searcher, planOnly: Boolean = false): Int = {
    import org.apache.spark.sql.functions.{col, count => fcount, lit}
    val df = benchSet(searcher).zipWithIndex.map { case (d, i) =>
      d.agg(fcount(lit(1)).as("cnt")).select(lit(i).as("qi"), col("cnt"))
    }.reduce(_.union(_))
    if (planOnly) { df.queryExecution.executedPlan; 0 }
    else df.collect().length
  }

  /** The same 6 logical queries as one FUSED msearch batch
    * (Searcher.msearch: one scan + one shuffle for the whole batch), fresh-
    * planned per call. This is the serving tier's ad-hoc dispatch shape:
    * per-batch driver planning covers ONE fused subtree instead of six, and
    * executor work shares a single postings scan.
    */
  val fusedSpecs: Seq[Searcher.MsearchSpec] = {
    import Searcher.MsearchSpec._
    Seq(
      Bm25(Seq("merge", "index", "partition"), 10),
      Bm25(Seq("license", "return", "value", "data"), 10),
      Match("merge & partition"),
      Match("hash | tree | heap"),
      Cover("index & (merge | sort)", 10),
      Match("seg:* & commit"))
  }

  /** A 24-spec heterogeneous batch — the serving-tier batch size the fused
    * engine is built for (the 6-spec set exercises correctness/latency; a
    * real dispatch loop coalesces 24-48 queries per batch). Spec mix and
    * per-spec term sets vary so no two specs share a compiled shape.
    */
  val fusedSpecs24: Seq[Searcher.MsearchSpec] = {
    import Searcher.MsearchSpec._
    fusedSpecs ++ Seq(
      Bm25(Seq("stream", "shuffle"), 10),
      Bm25(Seq("batch", "write", "read"), 10),
      Bm25(Seq("spill", "memory", "disk", "cache"), 10),
      Bm25(Seq("thread", "lock"), 5),
      Match("sort & spill"),
      Match("cache | buffer"),
      Match("read & write & sync"),
      Match("row | column | page"),
      Match("queue & !drop"),
      Cover("merge & (read | write)", 10),
      Cover("hash & bucket", 10),
      Cover("scan | seek", 5),
      Cover("block & size", 10),
      Match("tab:* & merge"),
      Bm25(Seq("split", "merge", "compact"), 10),
      Match("offset | length"),
      Cover("commit & log", 10),
      Bm25(Seq("error", "retry"), 10))
  }

  /** Count-serving batch (msearchCounts): the per-shard PARTIAL-count
    * path whose shuffle volume is nShards x batch size by construction,
    * independent of match counts — the fused shape that survives
    * million-match count queries. Query mix mirrors fusedSpecs' boolean
    * slots plus wide-match and prefix queries.
    */
  val countSpecs: Seq[String] = Seq(
    "merge & partition",
    "hash | tree | heap",
    "seg:* & commit",
    "merge | index",
    "license & value",
    "sort & !spill")

  /** The counts batch as ONE fresh-planned fused job (per-shard partials,
    * one scan + one shuffle); returns per-query counts in slot order.
    */
  def queryBatchCountsFresh(searcher: Searcher): Array[Long] = {
    val rows = searcher.msearchCountsPlan(countSpecs).collect()
    val m = rows.map(r => r.getInt(0) -> r.getLong(1)).toMap
    countSpecs.indices.map(i => m.getOrElse(i, -1L)).toArray
  }

  /** Per-slot result-row counts of the fused 6-spec batch (deterministic
    * on a deterministic corpus) — the correctness anchor ScalingBench
    * asserts per run, so every scaling run is also a correctness run
    * (the reference pins exact counts the same way,
    * tests/pglist_tests.py:112-117).
    */
  def fusedRowCounts(searcher: Searcher): Array[Long] =
    specRowCounts(searcher, fusedSpecs)

  /** Per-slot result-row counts for an arbitrary fused batch. */
  def specRowCounts(searcher: Searcher,
                    specs: Seq[Searcher.MsearchSpec]): Array[Long] = {
    import org.apache.spark.sql.functions.{count => fcount, lit}
    val rows = searcher.msearchPlan(specs)
      .groupBy("qi").agg(fcount(lit(1)).as("cnt")).collect()
    val m = rows.map(r => r.getInt(0) -> r.getLong(1)).toMap
    specs.indices.map(i => m.getOrElse(i, 0L)).toArray
  }

  /** Ordered-scan serving batch (addon top-k / addon range / facet
    * histogram slots) over an alt-order index: the fused family served
    * from the alt layout's OWN shared scan. Kept at 6 slots so
    * ScalingBench's per-batch query math (batch = fusedSpecs.length)
    * holds for this phase too. Addon values in ScalingBench's alt corpus
    * are pmod(xxhash64(doc_id), 100000) — constants below sit inside that
    * domain.
    */
  val addonSpecs: Seq[Searcher.MsearchSpec] = {
    import Searcher.MsearchSpec._
    Seq(
      Addon("merge & partition", 50000L, "both", 10),
      AddonRange("hash | tree | heap", 10000L, 30000L),
      Facet("merge | index", 5000L, 0L, 99999L),
      Addon("seg:* & commit", 0L, "right", 10),
      Facet("license & value", 10000L, 0L, 99999L),
      AddonRange("sort & !spill", 40000L, 60000L))
  }

  /** The ordered-scan batch as ONE fresh-planned fused job. */
  def queryBatchAddonFresh(searcher: Searcher): Int =
    queryBatchFusedN(searcher, addonSpecs)

  /** [[queryBatchFused]] over an arbitrary spec batch (fresh-planned). */
  def queryBatchFusedN(searcher: Searcher, specs: Seq[Searcher.MsearchSpec],
                       planOnly: Boolean = false): Int = {
    import org.apache.spark.sql.functions.{count => fcount, lit}
    val df = searcher.msearchPlan(specs)
      .groupBy("qi").agg(fcount(lit(1)).as("cnt"))
    if (planOnly) { df.queryExecution.executedPlan; 0 }
    else df.collect().length
  }

  def queryBatchFused(searcher: Searcher, planOnly: Boolean = false): Int = {
    import org.apache.spark.sql.functions.{count => fcount, lit}
    val df = searcher.msearchPlan(fusedSpecs)
      .groupBy("qi").agg(fcount(lit(1)).as("cnt"))
    if (planOnly) { df.queryExecution.executedPlan; 0 }
    else df.collect().length
  }

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

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]

    // ---- corpus index build throughput ----
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1).toDouble).getOrElse(0.1)
    val nFiles = sys.env.get("SPARK_GRAFT_CORPUS_FILES").map(_.toLong)
      .getOrElse(math.max(2000L, (sf * 500000).toLong))
    val idxDir = java.nio.file.Files.createTempDirectory("benchidx").toString
    val corpus = CorpusGen.withDocId(CorpusGen.generate(spark, nFiles, cpus.toInt * 2))
    val tb0 = System.nanoTime()
    IndexBuilder.build(spark, corpus, "doc_id", "content", idxDir,
      IndexBuilder.Params(nShards = cpus.toInt, tokenizer = "code"))
    val buildSec = (System.nanoTime() - tb0) / 1e9
    results += "corpus_build" -> buildSec
    results += "corpus_files_per_sec" -> nFiles / buildSec

    // ---- query latency over the corpus index ----
    // two keys, two meanings (kept separate so a reader diffing rounds
    // never sees a silent metric redefinition):
    //   query_p50_prepared — plan-cache hot path: repeated executions of
    //     already-planned queries (the prepared-statement serving shape)
    //   query_p50_adhoc    — fresh-planned 6-query msearch batch, per-query
    //     sec: pays full Catalyst planning + execution every time (the
    //     basis for throughput-scaling measurements)
    val searcher = new Searcher(spark, idxDir)
    queryLatencies(searcher, 1) // warm: parquet footers, JIT
    val lat = queryLatencies(searcher, 5)
    results += "query_p50_prepared" -> lat(lat.length / 2)
    results += "query_p95_prepared" -> lat(math.min(lat.length - 1, (lat.length * 0.95).toInt))
    // fused = Searcher.msearch one-scan batch (the serving dispatch shape);
    // perbranch = six independently-planned subtrees unioned (the r3 shape,
    // kept for cross-round comparison)
    queryBatchFused(searcher) // warm stats memo + JIT outside the timing
    val adhoc = (1 to 5).map { _ =>
      val t0 = System.nanoTime()
      queryBatchFused(searcher)
      (System.nanoTime() - t0) / 1e9 / fusedSpecs.length
    }.sorted
    results += "query_p50_adhoc" -> adhoc(adhoc.length / 2)
    val adhocPb = (1 to 5).map { _ =>
      val t0 = System.nanoTime()
      queryBatchFresh(searcher)
      (System.nanoTime() - t0) / 1e9 / fusedSpecs.length
    }.sorted
    results += "query_p50_adhoc_perbranch" -> adhocPb(adhocPb.length / 2)
    // large-batch fused dispatch: 24 heterogeneous specs, fresh-planned —
    // per-query cost should DROP vs the 6-spec batch (fixed per-batch
    // driver work amortizes over 4x the queries; the shared ShardView keys
    // per-spec kernel setup off the spec's own terms, not the union)
    queryBatchFusedN(searcher, fusedSpecs24) // warm
    val adhoc24 = (1 to 5).map { _ =>
      val t0 = System.nanoTime()
      queryBatchFusedN(searcher, fusedSpecs24)
      (System.nanoTime() - t0) / 1e9 / fusedSpecs24.length
    }.sorted
    results += "query_p50_adhoc24" -> adhoc24(adhoc24.length / 2)

    // ---- wide-prefix union latency (heap union path) ----
    // one-letter prefix over the code corpus: expansion width is in the
    // hundreds, exercising HeapUnionCursor. Warmed once (footers/JIT),
    // then timed on a FRESH aggregate Dataset over the cached base plan —
    // a new Dataset means a new execution of the whole prefix-union
    // dataflow (repeating an action on one Dataset would only re-run the
    // final stage over materialized AQE shuffle output, timing stage-reuse
    // bookkeeping instead of the HeapUnionCursor path)
    import org.apache.spark.sql.functions.{count => fcount, lit}
    searcher.count("s:* & merge")
    val tp0 = System.nanoTime()
    searcher.matchingDocs("s:* & merge").agg(fcount(lit(1))).collect()
    results += "query_prefix_wide" -> (System.nanoTime() - tp0) / 1e9

    // ---- driver query suite ----
    // pre-warm EVERY once-per-corpus intermediate (index variants, token/
    // shingle tables, LSH signatures) and report the one-time cost under
    // its own key — no driver query absorbs a materialization spike
    val tw0 = System.nanoTime()
    try SparkEntry.prewarm(spark, sfDir)
    catch { case t: Throwable =>
      System.err.println(s"[bench] prewarm FAILED: ${t.getMessage}")
    }
    results += "prewarm_build" -> (System.nanoTime() - tw0) / 1e9
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case t: Throwable =>
          // a broken query must not silently bench as ~0 s
          failed += name
          System.err.println(s"[bench] query $name FAILED: ${t.getClass.getName}: ${t.getMessage}")
      }
      results += name -> (System.nanoTime() - t0) / 1e9
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.6f" }.mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // total = wall seconds only; rate keys (files/sec) are reported but
    // must not be summed into a seconds metric
    val total = results.filterNot(_._1 == "corpus_files_per_sec").values.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
    // the bench corpus index is multi-GB and disposable — reclaim /tmp
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(new java.io.File(idxDir))
  }
}
