package graft.build

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{PositionCodec, PostingBlock, PostingListBuilder}
import graft.tokenize.Tokenizer

/** One (term, docId-range) chunk of a shard's posting list.
  *
  * RUM equivalents: the entry-tree leaf + posting tree for one key
  * (reference: src/ruminsert.c:248-401 posting-tree promotion). A term's
  * postings may span several chunk rows with disjoint, ordered docId
  * ranges — that is the skew/salting mechanism: huge (head) terms are
  * split by docId range across build tasks and bounded per row, so no
  * single task or row ever owns a whole head-term list.
  */
final case class PostingRow(
    shard: Int,
    term: String,
    chunk: Int,
    ndocs: Long,
    blocks: Array[PostingBlock])

/** Per-doc row: shard + token count (BM25 length norm; also the full-scan
  * stream for match-all / order-only queries — RUM's EVERYTHING mode,
  * src/rumget.c:2024-2083). `addon` carries the attached column when the
  * index was built with one (0 otherwise).
  */
final case class DocRow(shard: Int, docId: Long, len: Int, addon: Long)

/** Global per-term stats — RUM's predictNumberResult analogue
  * (src/rumdatapage.c:450: per-key result-size estimates drive stream
  * advancement order); df/maxTf also give WAND term upper bounds.
  */
final case class TermStat(term: String, df: Long, maxTf: Int)

/** Tokenizer UDF output: one element per distinct term of a doc. */
final case class TermEntry(term: String, tf: Int, len: Int, pos: Array[Byte])

/** Distributed inverted-index build (the CREATE INDEX path,
  * reference: src/ruminsert.c:594-708 rumbuild).
  *
  * Spark-native dataflow:
  *   corpus → tokenize (narrow, codegen-friendly UDF) →
  *   repartitionByRange(shard, term, docId) → sortWithinPartitions →
  *   mapPartitions pack posting blocks → parquet partitioned by shard.
  *
  * The single range shuffle replaces RUM's red-black-tree accumulator +
  * page packing (src/rumbulk.c, src/rumdatapage.c): Spark's external sort
  * handles memory-bounded spill, the sorted run is packed full exactly like
  * RUM's build-mode split heuristic (src/rumdatapage.c:1253-1260).
  *
  * Resumability: shards are the checkpoint unit. Each committed shard is
  * recorded in the manifest with lineage + metrics; a re-run with `resume`
  * skips committed shards and only processes the remainder.
  */
object IndexBuilder {

  final case class Params(
      nShards: Int = 32,
      blockSize: Int = PostingBlock.DefaultSize,
      maxPostingsPerChunk: Int = 1 << 17,
      tokenizer: String = "simple",
      numPartitions: Int = 0,
      /** column stamped into every posting as addon payload — RUM's
        * `WITH (attach='d', to='t')` (src/ruminsert.c:505-515); must be
        * castable to long (timestamps: pass epoch micros)
        */
      attach: Option[String] = None) {
    def hash: String = {
      val s = s"v2|$nShards|$blockSize|$maxPostingsPerChunk|$tokenizer|${attach.getOrElse("")}"
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
  }

  private def deleteRecursively(path: String): Unit = {
    val f = new java.io.File(path)
    if (f.exists()) {
      if (f.isDirectory) f.listFiles().foreach(c => deleteRecursively(c.getPath))
      f.delete()
    }
  }

  def tokenizerFn(name: String): String => Array[Tokenizer.TermOccs] = name match {
    case "simple" => (t: String) => Tokenizer.simple(if (t == null) "" else t)
    case "code" => (t: String) => Tokenizer.code(if (t == null) "" else t)
    case other => throw new IllegalArgumentException(s"unknown tokenizer: $other")
  }

  private def tokenCountFn(name: String): String => Int = name match {
    case "simple" => (t: String) => Tokenizer.simpleCount(if (t == null) "" else t)
    case "code" => (t: String) => Tokenizer.codeCount(if (t == null) "" else t)
    case other => throw new IllegalArgumentException(s"unknown tokenizer: $other")
  }

  /** Build (or resume) the index for `corpus` into `indexDir`.
    *
    * @param corpus   any DataFrame with a unique long id column + text column
    */
  def build(spark: SparkSession, corpus: DataFrame, docIdCol: String, textCol: String,
            indexDir: String, params: Params = Params(), resume: Boolean = false): IndexMeta = {
    import spark.implicits._
    val t0 = System.currentTimeMillis()

    val prior: Option[IndexMeta] =
      if (resume) SegmentCatalog.load(indexDir).map { m =>
        require(m.paramsHash == params.hash,
          s"resume with different params: ${m.paramsHash} vs ${params.hash}")
        m
      } else None
    val committed: Set[Int] = prior.map(_.committedShards).getOrElse(Set.empty)
    val remaining = (0 until params.nShards).filterNot(committed)

    val addonCol = params.attach
      .map(a => col(a).cast("long")).getOrElse(lit(0L)).as("addon")
    val base = corpus
      .select(col(docIdCol).cast("long").as("docId"), col(textCol).as("text"), addonCol)
      .withColumn("shard", pmod(xxhash64(col("docId")), lit(params.nShards)).cast("int"))

    val todo =
      if (committed.isEmpty) base
      else base.where(col("shard").isin(remaining: _*))

    // Idempotent restart: data files of shards NOT in the manifest are
    // leftovers of an interrupted run — remove before (re)writing so the
    // shard write is exactly-once (manifest commit is the visibility point,
    // Iceberg-snapshot style).
    if (!resume) {
      deleteRecursively(SegmentCatalog.postingsDir(indexDir))
      deleteRecursively(SegmentCatalog.docsDir(indexDir))
      deleteRecursively(SegmentCatalog.statsDir(indexDir))
    } else {
      remaining.foreach { s =>
        deleteRecursively(s"${SegmentCatalog.postingsDir(indexDir)}/shard=$s")
        deleteRecursively(s"${SegmentCatalog.docsDir(indexDir)}/shard=$s")
      }
    }

    if (remaining.nonEmpty) {
      val tokName = params.tokenizer
      val blockSize = params.blockSize
      val maxChunk = params.maxPostingsPerChunk

      val tokUdf = udf { (text: String) =>
        val occs = tokenizerFn(tokName)(text)
        var len = 0
        var i = 0
        while (i < occs.length) { len += occs(i).tf; i += 1 }
        occs.map { o =>
          val (cp, cw) = PositionCodec.cap(o.positions, o.wclasses)
          TermEntry(o.term, o.tf, len, PositionCodec.encode(cp, cw))
        }
      }

      val exploded = todo
        .select(col("shard"), col("docId"), col("addon"), explode(tokUdf(col("text"))).as("e"))
        .select(col("shard"), $"e.term", col("docId"), $"e.tf", $"e.len", $"e.pos", col("addon"))

      val p = if (params.numPartitions > 0) params.numPartitions
              else spark.sessionState.conf.numShufflePartitions

      // hash-partition on (shard, term): same grouping guarantee as a range
      // partition (all rows of one (shard,term) in one task, sorted below)
      // WITHOUT repartitionByRange's sampling pass, which would tokenize
      // the whole corpus a second time just to pick boundaries. Head-term
      // skew is already dissolved by the shard dimension (shard =
      // hash(docId)): a hot term spreads over all nShards cells, and the
      // per-chunk row cap bounds any remaining cell.
      val packed: Dataset[PostingRow] = exploded
        .repartition(p, col("shard"), col("term"))
        .sortWithinPartitions("shard", "term", "docId")
        .as[(Int, String, Long, Int, Int, Array[Byte], Long)]
        .mapPartitions { it =>
          new Iterator[PostingRow] {
            private var pending: List[PostingRow] = Nil
            private var cur: (Int, String) = null
            private var builder: PostingListBuilder = null
            private var chunkIdx = 0
            private var nInChunk = 0
            private var lastDoc = Long.MinValue

            private def finishChunk(): Unit = {
              if (builder != null && builder.totalDocs > 0) {
                val blocks = builder.result()
                pending ::= PostingRow(cur._1, cur._2, chunkIdx, blocks.map(_.n.toLong).sum, blocks)
                chunkIdx += 1
              }
              builder = new PostingListBuilder(blockSize)
              nInChunk = 0
            }

            private def fill(): Unit = {
              while (pending.isEmpty && it.hasNext) {
                val (shard, term, docId, tf, len, pos, addon) = it.next()
                if (cur == null || cur._1 != shard || cur._2 != term) {
                  finishChunk()
                  cur = (shard, term)
                  chunkIdx = 0
                  lastDoc = Long.MinValue
                }
                if (docId != lastDoc) { // dedup paranoia (RumMergeRumItems keeps first)
                  builder.add(docId, tf, len, pos, addon)
                  lastDoc = docId
                  nInChunk += 1
                  if (nInChunk >= maxChunk) finishChunk()
                }
              }
              if (pending.isEmpty && !it.hasNext && builder != null && builder.totalDocs > 0)
                finishChunk()
            }

            def hasNext: Boolean = { fill(); pending.nonEmpty }
            def next(): PostingRow = { fill(); val h = pending.head; pending = pending.tail; h }
          }
        }

      packed.write.mode("append").partitionBy("shard")
        .parquet(SegmentCatalog.postingsDir(indexDir))

      // docs table: a second narrow pass (count-only, allocation-free
      // tokenize) — no shuffle; at petabyte scale this trades a little CPU
      // for zero extra I/O
      val cntUdf = udf(tokenCountFn(tokName))
      todo.select(col("shard"), col("docId"), cntUdf(col("text")).as("len"), col("addon"))
        .write.mode("append").partitionBy("shard")
        .parquet(SegmentCatalog.docsDir(indexDir))
    }

    // --- global stats + manifest (over ALL shards) ---
    val allPostings = spark.read.parquet(SegmentCatalog.postingsDir(indexDir))
    val stats = allPostings
      .groupBy("term")
      .agg(sum("ndocs").as("df"),
        max(expr("aggregate(blocks, 0, (acc, b) -> greatest(acc, b.maxTf))")).as("maxTf"))
    stats.write.mode("overwrite").parquet(SegmentCatalog.statsDir(indexDir))

    val allDocs = spark.read.parquet(SegmentCatalog.docsDir(indexDir))
    val (numDocs, totalTokens) = {
      val r = allDocs.agg(count(lit(1)), coalesce(sum("len"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }

    val shardAgg = allPostings.groupBy("shard")
      .agg(countDistinct("term").as("terms"), count(lit(1)).as("rows"), sum("ndocs").as("postings"))
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

    val now = System.currentTimeMillis()
    val buildMs = now - t0
    val lineage = corpus.queryExecution.logical.toString.linesIterator.take(1).mkString
    val newShards = remaining.map { s =>
      val (t, r, pc) = shardAgg.getOrElse(s, (0L, 0L, 0L))
      ShardMeta(s, t, r, pc, buildMs, now)
    }
    val meta = IndexMeta(
      formatVersion = 2,
      numDocs = numDocs,
      totalTokens = totalTokens,
      avgLen = if (numDocs == 0) 0.0 else totalTokens.toDouble / numDocs,
      nShards = params.nShards,
      blockSize = params.blockSize,
      maxPostingsPerChunk = params.maxPostingsPerChunk,
      tokenizer = params.tokenizer,
      inputLineage = lineage,
      paramsHash = params.hash,
      shards = (prior.map(_.shards).getOrElse(Nil) ++ newShards).sortBy(_.shard))
    SegmentCatalog.save(indexDir, meta)
    meta
  }
}
