package graft.search

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.build.{DocRow, IndexMeta, PostingRow, SegmentCatalog}
import graft.core.{PositionCodec, PostingBlock, PostingCursor}
import graft.query._

/** Query execution over a built index.
  *
  * Spark plan shape (the RUM scan pipeline, re-expressed):
  *   1. parquet scan of posting rows with `term` predicates pushed down —
  *      the entry-tree descent (reference: src/rumget.c:536-696
  *      startScanEntry); partition/row-group pruning stands in for the
  *      B-tree.
  *   2. groupByKey(shard) → per-shard typed merge kernel — the k-way
  *      posting merge + consistency check (src/rumget.c:1426-1568
  *      scanGetItemRegular) with prefix expansion as positional union
  *      (src/rumget.c:1124-1296 entryGetItem + rum_ts_join_pos).
  *      Only the query terms' postings move in the shuffle.
  *   3. scores computed inside the kernel from payloads (positions) —
  *      index-side ordering, the defining RUM capability (README.md:80-136)
  *   4. per-shard top-k heap → global TakeOrderedAndProject.
  */
final class Searcher(spark: SparkSession, indexDir: String,
                     maxCachedPlans: Int = Searcher.MaxCachedPlans) {
  import spark.implicits._

  val meta: IndexMeta = SegmentCatalog.load(indexDir)
    .getOrElse(throw new IllegalStateException(s"no manifest in $indexDir"))
  // refuse down-versioned layouts up front with a "rebuild required" error
  // instead of an AnalysisException mid-query on a missing column
  graft.build.IndexBuilder.requireFormat(meta)

  // lazy vals: file listing + schema inference happen once per Searcher,
  // not once per query — repeated InMemoryFileIndex listings serialize
  // concurrent queries on the driver
  // All reads go through the manifest's data-file listing (snapshot
  // isolation: only committed files are visible) with explicit schemas so
  // zero-file layouts (buildempty) stay readable.
  private lazy val postings: Dataset[PostingRow] =
    graft.build.IndexBuilder.readDataset(spark, indexDir, meta, "postings").as[PostingRow]

  /** (addon, docId)-ordered posting copy (order_by_attach layout). */
  private lazy val altPostings: Dataset[PostingRow] =
    graft.build.IndexBuilder.readDataset(spark, indexDir, meta, "alt").as[PostingRow]

  private lazy val docs: Dataset[DocRow] =
    graft.build.IndexBuilder.readDataset(spark, indexDir, meta, "docs")
      .select(col("shard"), col("docId"), col("len"), col("addon"), col("uniq"))
      .as[DocRow]

  private lazy val statsDF: DataFrame =
    graft.build.IndexBuilder.readDataset(spark, indexDir, meta, "stats")

  /** Compiled-plan cache (prepared statements). A Searcher is pinned to one
    * immutable snapshot — reads go through the manifest's committed file
    * listing — so the Dataset a public query method returns is a pure
    * function of (method, args). Repeating a query therefore reuses the
    * analyzed/optimized/physical plan (Dataset.queryExecution is computed
    * once per instance) and any driver-side stats lookup folded into plan
    * construction (e.g. topKBm25's df/maxTf fetch), instead of paying
    * Catalyst + a stats job again. This is the fixed per-query driver cost
    * that does NOT parallelize with added cores (BENCH/BASELINE.md 2→8
    * analysis); execution itself still runs fresh per action. Bounded by
    * access-ordered LRU at `maxCachedPlans` shapes: a prepared workload
    * that churns shapes keeps its hot set (evicting the coldest plan)
    * instead of degrading to permanent re-planning.
    */
  private val planCache: java.util.Map[String, DataFrame] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, DataFrame](64, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, DataFrame]): Boolean =
          size() > maxCachedPlans
      })

  private def cached(key: String)(make: => DataFrame): DataFrame = {
    // get/putIfAbsent, NOT computeIfAbsent: plan builders nest (count's agg
    // plan is built over the cached matchingDocs plan) and holding the map
    // lock across `make` would deadlock/re-enter. A racing duplicate build
    // is harmless — first one in wins. get() also refreshes LRU recency.
    val hit = planCache.get(key)
    if (hit != null) hit
    else {
      val df = make
      val prev = planCache.putIfAbsent(key, df)
      if (prev != null) prev else df
    }
  }

  /** term predicate for the parquet scan — exact terms via IN (dictionary/
    * stats pruning), prefixes via range [p, p+MAXCHAR).
    */
  private def termPredicate(cq: CompiledQuery): Column = {
    val exact = cq.keys.filter(!_.prefix).map(_.term).distinct
    val prefixes = cq.keys.filter(_.prefix).map(_.term).distinct
    val preds = scala.collection.mutable.ArrayBuffer.empty[Column]
    if (exact.nonEmpty) preds += col("term").isin(exact: _*)
    prefixes.foreach { p =>
      preds += (col("term") >= p && col("term") < (p + "￿"))
    }
    preds.reduceOption(_ || _).getOrElse(lit(false))
  }

  /** identity for text keys; FNV-1a hex for hash-keyed indexes
    * (rum_extract_tsquery_hash, src/rum_ts_utils.c:757-787). On a
    * multi-column index bare terms would silently miss the field-prefixed
    * key space, so they are rejected: qualify with
    * IndexBuilder.fieldKey(field, term).
    */
  private def keyOf(term: String): String = {
    require(meta.fields.isEmpty || term.contains(graft.build.IndexBuilder.FieldSep),
      s"multi-column index (fields=${meta.fields}): qualify '$term' with " +
        "IndexBuilder.fieldKey(field, term)")
    if (meta.keyKind == "hash") graft.core.HashKeys.hex(term) else term
  }

  private def compileTree(q: TsQuery): CompiledQuery = {
    if (meta.keyKind == "hash") {
      // mirror the reference: hash keys cannot serve range/partial match
      // ("Compare with prefix expressions isn't supported",
      // expected/rum_hash.out:310)
      require(TsQuery.operands(q).forall(!_.prefix),
        "prefix search isn't supported with hash keys")
      CompiledQuery.compile(TsQuery.mapTerms(q, graft.core.HashKeys.hex))
    } else CompiledQuery.compile(q)
  }

  def compile(queryStr: String): CompiledQuery = {
    require(meta.fields.isEmpty,
      s"multi-column index (fields=${meta.fields}): use compileMulti/countMulti")
    compileTree(TsQueryParser.parse(queryStr))
  }

  /** Multi-column query: one tsquery per field, ANDed into a single
    * compiled tree over field-prefixed keys — one kernel pass intersects
    * across fields (reference: attnum-prefixed entry keys,
    * src/rumutil.c:266-288; multicolumn tests sql/orderby.sql:89-106).
    */
  def compileMulti(fieldQueries: Seq[(String, String)]): CompiledQuery = {
    val known = meta.fields.split(",").toSet
    require(meta.fields.nonEmpty, "not a multi-column index")
    val trees = fieldQueries.map { case (f, q) =>
      require(known.contains(f), s"unknown field '$f' (have ${meta.fields})")
      TsQuery.mapTerms(TsQueryParser.parse(q),
        t => graft.build.IndexBuilder.fieldKey(f, t))
    }
    compileTree(trees.reduce(TsQuery.And(_, _)))
  }

  def countMulti(fieldQueries: Seq[(String, String)]): Long =
    runCount("countM" + Searcher.key(fieldQueries.flatMap(p => Seq(p._1, p._2)): _*),
      matchingDocsMulti(fieldQueries))

  def matchingDocsMulti(fieldQueries: Seq[(String, String)]): DataFrame =
    cached("matchM" + Searcher.key(fieldQueries.flatMap(p => Seq(p._1, p._2)): _*)) {
      matchingDocsC(compileMulti(fieldQueries))
    }

  /** docIds matching the query (the bitmap-scan sink, rumgetbitmap —
    * src/rumget.c:2105-2145). Unordered.
    */
  def matchingDocs(queryStr: String): DataFrame =
    cached("match" + Searcher.key(queryStr))(matchingDocsC(compile(queryStr)))

  private def matchingDocsC(cq: CompiledQuery): DataFrame = {
    if (SearchKernel.isVoid(cq)) // empty tsquery: no scan at all (isVoidRes)
      spark.range(0).select(col("id").as("docId"))
    else if (SearchKernel.needsFullScan(cq))
      fullScan(cq, score = false, matchOnly = true, k = 0).select(col("docId"))
    else {
      val keys = SearchKernel.keySpecs(cq)
      postings.where(termPredicate(cq))
        .groupByKey(_.shard)
        .flatMapGroups((shard: Int, it: Iterator[PostingRow]) =>
          SearchKernel.matchShard(cq, keys, it, score = false, k = 0))
        .map(_._1).toDF("docId")
    }
  }

  def count(queryStr: String): Long =
    runCount("count" + Searcher.key(queryStr), matchingDocs(queryStr))

  /** Cached count: Dataset.count() would plan a fresh Aggregate per call,
    * so the aggregate itself is part of the cached plan.
    */
  private def runCount(key: String, base: => DataFrame): Long =
    cached(key)(base.agg(org.apache.spark.sql.functions.count(lit(1)).as("cnt")))
      .collect()(0).getLong(0)

  /** Approximate bounded result set — the fuzzy_search_limit path
    * (reference: rumget.c:50-76 dropItem thins the bitmap with coin flips
    * scaled by predictNumberResult so ~limit matches survive). Re-expressed
    * deterministically: when the df-based prediction exceeds `limit`, keep
    * a match iff md5(docId) lands under limit/predicted — the same 60-bit
    * md5-prefix hash the SQL oracle can compute, so sampling is
    * reproducible across engines AND executors (no RNG state).
    */
  def matchingDocsSampled(queryStr: String, limit: Long): DataFrame =
    cached("sampled" + Searcher.key(queryStr, limit.toString)) {
      matchingDocsSampledU(queryStr, limit)
    }

  private def matchingDocsSampledU(queryStr: String, limit: Long): DataFrame = {
    val cq = compile(queryStr)
    val full = matchingDocsC(cq)
    val predicted = predictResults(cq)
    if (predicted <= limit) full
    else {
      val keep = limit.toDouble / predicted
      val h = conv(substring(md5(col("docId").cast("string")), 1, 15), 16, 10)
        .cast("long")
      full.where(pmod(h, lit(1000000L)) < math.floor(keep * 1e6).toLong)
    }
  }

  /** df-based result-size prediction (predictNumberResult,
    * src/rumdatapage.c:450): AND-ish queries bound by the rarest required
    * key's df; pure OR by the sum of positive keys' dfs; capped at numDocs.
    */
  private def predictResults(cq: CompiledQuery): Long = {
    val req = SearchKernel.requiredKeys(cq)
    val idx = if (req.nonEmpty) req else SearchKernel.positiveKeys(cq)
    if (idx.isEmpty) return meta.numDocs
    val terms = idx.map(cq.keys(_)).filterNot(_.prefix).map(_.term)
    if (terms.isEmpty) return meta.numDocs
    val dfs = statsDF.where(col("term").isin(terms.toSeq: _*))
      .select("df").collect().map(_.getLong(0))
    val est =
      if (req.nonEmpty) (if (dfs.isEmpty) 0L else dfs.min)
      else dfs.sum
    math.min(est, meta.numDocs)
  }

  /** Matching docs with their attached-column value (docId, addon) — the
    * addon rides in the posting payload so no corpus join happens
    * (RUM addon ops, README.md:158-196). Feed this to Column expressions
    * for distance ordering / range predicates on the attached column.
    */
  def matchingWithAddon(queryStr: String): DataFrame =
    cached("addon" + Searcher.key(queryStr))(matchingWithAddonC(compile(queryStr)))

  private def matchingWithAddonC(cq: CompiledQuery): DataFrame = {
    if (SearchKernel.isVoid(cq))
      spark.range(0).select(col("id").as("docId"), col("id").as("addon"))
    else if (SearchKernel.needsFullScan(cq))
      fullScan(cq, score = false, matchOnly = true, k = 0)
        .select(col("docId"), col("addon"))
    else {
      val keys = SearchKernel.keySpecs(cq)
      postings.where(termPredicate(cq))
        .groupByKey(_.shard)
        .flatMapGroups((shard: Int, it: Iterator[PostingRow]) =>
          SearchKernel.matchShard(cq, keys, it, score = false, k = 0))
        .toDF("docId", "distance", "addon").select("docId", "addon")
    }
  }

  /** `WHERE t @@ q ORDER BY addon <op> c LIMIT k` — the reference's
    * addon ordered scan (sql/orderby.sql): op "both" = `<=>` (|a-c|),
    * "left" = `<=|` (only a<=c finite), "right" = `|=>` (only a>=c).
    * Distance is in raw addon units; ties break on docId like RUM's TID
    * tie-break. One-sided misses sort last with infinite distance.
    * Addons and `c` may be ANY signed long (negative scalars, epoch-
    * spanning timestamps — reference sql/int4.sql:7-19); distances beyond
    * Long.MaxValue saturate identically on both execution paths.
    */
  /** True when the alt-order layout can serve this query: layout present
    * and candidates index-drivable — conjunctive queries leapfrog their
    * required keys; disjunctive queries (no required key, e.g. `a | b`)
    * merge all positive keys' ordered streams, RUM's entry-merge shape
    * (src/rumget.c:1272-1369, :2303-2327). Prefix keys included on both
    * paths — AltKernel position-unions the expansion. Only full-scan
    * queries (pure negation / empty-doc matchers) fall back.
    */
  private def altServes(cq: CompiledQuery): Boolean =
    meta.altOrder && !SearchKernel.needsFullScan(cq)

  def topKAddon(queryStr: String, c: Long, op: String, k: Int): DataFrame =
    cached("topKA" + Searcher.key(queryStr, c.toString, op, k.toString)) {
      topKAddonC(compile(queryStr), c, op, k)
    }

  /** Multicolumn ordered scan: `WHERE f1 @@ q1 AND f2 @@ q2 ORDER BY
    * addon <op> c LIMIT k` — the reference's multicolumn test shape
    * (sql/orderby.sql:89-106: text predicate + `ORDER BY d <=> c` on one
    * index). Field-prefixed keys ride through the same alt-order kernel, so
    * early termination is preserved.
    */
  def topKAddonMulti(fieldQueries: Seq[(String, String)], c: Long, op: String,
                     k: Int): DataFrame =
    cached("topKAM" + Searcher.key(
      fieldQueries.flatMap(p => Seq(p._1, p._2)) ++ Seq(c.toString, op, k.toString): _*)) {
      topKAddonC(compileMulti(fieldQueries), c, op, k)
    }

  /** Float-typed ordered scan in VALUE units: `WHERE t @@ q ORDER BY
    * f <op> c LIMIT k` with distance = |f - c| as an exact double, over an
    * index whose attach column was encoded with
    * [[graft.build.AddonUnits.floatOrderedBits]] (the reference's float
    * distance opclasses, btree_rum.c:249-323). The alt fast path streams
    * in bit order (= value order per side) and ranks on the double
    * distance's own bit image — early termination preserved; the fallback
    * decodes and ranks the same double. NaN addons sort last on both
    * paths (Spark orders double NaN greatest; the kernel's canonical-NaN
    * bit image is above +Inf's). Output (docId, value, distance).
    */
  def topKAddonFloat(queryStr: String, c: Double, op: String, k: Int): DataFrame =
    cached("topKAF" + Searcher.key(queryStr,
        java.lang.Double.doubleToLongBits(c).toString, op, k.toString)) {
      topKAddonFloatC(compile(queryStr), c, op, k)
    }

  private def topKAddonFloatC(cq: CompiledQuery, c: Double, op: String,
                              k: Int): DataFrame = {
    require(Set("both", "left", "right").contains(op), s"op: $op")
    val cBits = graft.build.AddonUnits.floatOrderedBits(c)
    val decode = udf((bits: Long) =>
      graft.build.AddonUnits.floatFromOrderedBits(bits))
    if (altServes(cq)) {
      val keys = SearchKernel.keySpecs(cq)
      // rank/limit on the long bit-image distance (exact), decode the k
      // survivors only; the decode UDF touches ≤ k·nShards rows
      val bitsToDouble = udf((bits: Long) => java.lang.Double.longBitsToDouble(bits))
      altPostings.where(termPredicate(cq))
        .groupByKey(_.shard)
        .flatMapGroups((shard: Int, it: Iterator[PostingRow]) =>
          AltKernel.topKAddonShard(cq, keys, it, cBits, op, k,
            floatUnits = true).rows.iterator)
        .toDF("docId", "dist", "addon")
        .orderBy(col("dist").asc, col("docId").asc)
        .limit(k)
        .select(col("docId"), decode(col("addon")).as("value"),
          bitsToDouble(col("dist")).as("distance"))
    } else {
      // one-sided predicates in BITS space (well-defined for NaN, matching
      // the kernel: NaN > +Inf > finite); distance in decoded value space
      val v = decode(col("addon"))
      val keep = op match {
        case "both" => lit(true)
        case "left" => col("addon") <= cBits
        case "right" => col("addon") >= cBits
      }
      val dist = op match {
        case "both" => abs(v - lit(c))
        case "left" => lit(c) - v
        case "right" => v - lit(c)
      }
      matchingWithAddonC(cq).where(keep)
        .withColumn("value", v)
        .withColumn("distance", dist)
        .orderBy(col("distance").asc, col("docId").asc)
        .limit(k)
        .select("docId", "value", "distance")
    }
  }

  /** Float-typed range filter in VALUE units over a
    * [[graft.build.AddonUnits.floatOrderedBits]]-encoded attach:
    * bit order = value order, so the bounds map straight onto the
    * long-keyed layout's bounded stream. Output (docId, value).
    */
  def rangeAddonFloat(queryStr: String, lo: Double, hi: Double): DataFrame =
    cached("rangeAF" + Searcher.key(queryStr,
        java.lang.Double.doubleToLongBits(lo).toString,
        java.lang.Double.doubleToLongBits(hi).toString)) {
      val decode = udf((bits: Long) =>
        graft.build.AddonUnits.floatFromOrderedBits(bits))
      rangeAddonC(compile(queryStr),
          graft.build.AddonUnits.floatOrderedBits(lo),
          graft.build.AddonUnits.floatOrderedBits(hi))
        .select(col("docId"), decode(col("addon")).as("value"))
    }

  private def topKAddonC(cq: CompiledQuery, c: Long, op: String, k: Int): DataFrame = {
    if (altServes(cq) && Set("both", "left", "right").contains(op)) {
      // index-ordered stream with early termination (order_by_attach scan,
      // src/rumget.c:2303-2327): per-shard cost tracks k, not match count;
      // only finite-distance matches are emitted
      val keys = SearchKernel.keySpecs(cq)
      // kernel distances are exact saturating Longs; ordering/limit run on
      // the long column (bit-exact at any magnitude), then the public
      // schema's double distance is produced for the k survivors only
      altPostings.where(termPredicate(cq))
        .groupByKey(_.shard)
        .flatMapGroups((shard: Int, it: Iterator[PostingRow]) =>
          AltKernel.topKAddonShard(cq, keys, it, c, op, k).rows.iterator)
        .toDF("docId", "distance", "addon")
        .select(col("docId"), col("addon"), col("distance"))
        .orderBy(col("distance").asc, col("docId").asc)
        .limit(k)
        .withColumn("distance", col("distance").cast("double"))
    } else {
      val base = matchingWithAddonC(cq)
      // exact decimal distance (long subtraction overflows for extreme
      // constants; double loses sub-256 resolution past 2^53); one-sided
      // misses are null and filtered, matching the alt path's finite-only.
      // Saturated at Long.MaxValue like the alt kernel's satSub, so both
      // paths tie-break identically beyond the representable range.
      val a = col("addon").cast("decimal(20,0)")
      val cc = lit(c).cast("decimal(20,0)")
      val raw = op match {
        case "both" => abs(a - cc)
        case "left" => when(col("addon") <= c, cc - a).otherwise(lit(null))
        case "right" => when(col("addon") >= c, a - cc).otherwise(lit(null))
        case other => throw new IllegalArgumentException(s"op: $other")
      }
      // least() ignores nulls — keep the one-sided-miss null sentinel
      val dist = when(raw.isNull, lit(null))
        .otherwise(least(raw, lit(Long.MaxValue).cast("decimal(20,0)")))
      base.withColumn("distance", dist)
        .where(col("distance").isNotNull)
        .orderBy(col("distance").asc, col("docId").asc)
        .limit(k)
        .withColumn("distance", col("distance").cast("double"))
    }
  }

  /** Multi-key ordered scan: `WHERE t @@ q ORDER BY key1, key2, ... LIMIT k`
    * with LEXICOGRAPHIC (dist1, dist2, ..., docId) ordering — the reference
    * sorts by the whole distances[norderbys] vector then TID
    * (src/rumget.c:2218-2301 insertScanItem; src/rumsort.c:3977-4022
    * comparetup_rum), e.g. `ORDER BY t <=> q, d <=> c LIMIT k` in ONE index
    * scan. Order keys: [[Searcher.OrderKey.Rank]] = cover-density distance
    * of the match query (`t <=> q`), [[Searcher.OrderKey.Addon]] = attached-
    * column distance (`addon <op> c`). The kernel emits (docId, rank
    * distance, addon) in one pass; per-key distance columns are derived and
    * the composite top-k runs as TakeOrderedAndProject — per-partition k-
    * pruning on the FULL composite key, so no shard can drop a row that a
    * later tie-break would promote. Addon keys follow the engine's finite-
    * only contract (one-sided misses are excluded, like [[topKAddon]]).
    * Output: (docId, d0, d1, ...) distances as doubles in key order.
    */
  def topKMulti(queryStr: String, orderKeys: Seq[Searcher.OrderKey], k: Int): DataFrame =
    cached("topKMul" + Searcher.key(
      queryStr +: orderKeys.map(_.toString) :+ k.toString: _*)) {
      topKMultiC(compile(queryStr), orderKeys, k)
    }

  private def topKMultiC(cq: CompiledQuery, orderKeys: Seq[Searcher.OrderKey],
                         k: Int): DataFrame = {
    import Searcher.OrderKey
    require(orderKeys.nonEmpty, "at least one order key")
    val methods = orderKeys.collect { case OrderKey.Rank(m) => m }
    require(methods.distinct.size <= 1,
      "all Rank keys must share one normalization method")
    val needRank = methods.nonEmpty
    val method = methods.headOption.getOrElse(0)
    if (SearchKernel.isVoid(cq))
      return spark.range(0).select(col("id").as("docId") +:
        orderKeys.indices.map(i => col("id").cast("double").as(s"d$i")): _*)
    val needsHeap = (method & (CoverRank.NormUniq | CoverRank.NormLogUniq)) != 0
    val base =
      if (needsHeap || SearchKernel.needsFullScan(cq))
        fullScan(cq, score = needRank, matchOnly = true, k = 0, method = method)
      else {
        val keys = SearchKernel.keySpecs(cq)
        // k = 0: the kernel's own heap orders by (rank, docId) only, which
        // is NOT a prefix of the composite order when addon keys follow —
        // pruning belongs to the composite TakeOrderedAndProject below
        postings.where(termPredicate(cq))
          .groupByKey(_.shard)
          .flatMapGroups((shard: Int, it: Iterator[PostingRow]) =>
            SearchKernel.matchShard(cq, keys, it, score = needRank, k = 0,
              method = method))
          .toDF("docId", "distance", "addon")
      }
    val distCols = orderKeys.zipWithIndex.map {
      case (OrderKey.Rank(_), i) => col("distance").as(s"d$i")
      case (OrderKey.Addon(c, op), i) =>
        // exact decimal distance — same saturating arithmetic as topKAddon
        val a = col("addon").cast("decimal(20,0)")
        val cc = lit(c).cast("decimal(20,0)")
        val raw = op match {
          case "both" => abs(a - cc)
          case "left" => when(col("addon") <= c, cc - a).otherwise(lit(null))
          case "right" => when(col("addon") >= c, a - cc).otherwise(lit(null))
          case other => throw new IllegalArgumentException(s"op: $other")
        }
        when(raw.isNull, lit(null))
          .otherwise(least(raw, lit(Long.MaxValue).cast("decimal(20,0)")))
          .as(s"d$i")
    }
    val named = base.select(col("docId") +: distCols: _*)
    val finite = orderKeys.indices.map(i => col(s"d$i").isNotNull).reduce(_ && _)
    named.where(finite)
      .orderBy(orderKeys.indices.map(i => col(s"d$i").asc) :+ col("docId").asc: _*)
      .limit(k)
      .select(col("docId") +:
        orderKeys.indices.map(i => col(s"d$i").cast("double").as(s"d$i")): _*)
  }

  /** match AND lo <= addon <= hi — served from the alt-order layout as a
    * bounded ordered stream when available (cost tracks the in-range match
    * count), else filter over all matches.
    */
  def rangeAddon(queryStr: String, lo: Long, hi: Long): DataFrame =
    cached("rangeA" + Searcher.key(queryStr, lo.toString, hi.toString)) {
      rangeAddonC(compile(queryStr), lo, hi)
    }

  /** Multicolumn variant of [[rangeAddon]]. */
  def rangeAddonMulti(fieldQueries: Seq[(String, String)], lo: Long, hi: Long): DataFrame =
    cached("rangeAM" + Searcher.key(
      fieldQueries.flatMap(p => Seq(p._1, p._2)) ++ Seq(lo.toString, hi.toString): _*)) {
      rangeAddonC(compileMulti(fieldQueries), lo, hi)
    }

  private def rangeAddonC(cq: CompiledQuery, lo: Long, hi: Long): DataFrame = {
    if (altServes(cq)) {
      val keys = SearchKernel.keySpecs(cq)
      altPostings.where(termPredicate(cq))
        .groupByKey(_.shard)
        .flatMapGroups((shard: Int, it: Iterator[PostingRow]) =>
          AltKernel.rangeAddonShard(cq, keys, it, lo, hi))
        .toDF("docId", "addon")
    } else
      matchingWithAddonC(cq).where(col("addon") >= lo && col("addon") <= hi)
  }

  /** Facet histogram over the attached column (the date-histogram /
    * numeric-facet serving shape): `WHERE t @@ q AND lo <= addon <= hi
    * GROUP BY bucket`, bucket = lo + floor((addon-lo)/width)·width.
    * Served from the alt-order layout as a BOUNDED ordered scan whose
    * kernel collapses each shard to at most one row per bucket — shuffle
    * volume is buckets × shards regardless of match count, the same
    * partial-shipping shape as fused counts. The fallback groups the
    * match+addon stream (addons ride the posting payload, no corpus
    * join), which Spark partial-aggregates map-side. Only non-empty
    * buckets return (SQL GROUP BY semantics). Returns (bucket, cnt).
    */
  def countByAddonBucket(queryStr: String, width: Long, lo: Long,
                         hi: Long): DataFrame =
    cached("facetA" + Searcher.key(queryStr, width.toString, lo.toString,
      hi.toString)) {
      countByAddonBucketC(compile(queryStr), width, lo, hi)
    }

  /** Multicolumn variant of [[countByAddonBucket]]. */
  def countByAddonBucketMulti(fieldQueries: Seq[(String, String)],
                              width: Long, lo: Long, hi: Long): DataFrame =
    cached("facetAM" + Searcher.key(
      fieldQueries.flatMap(p => Seq(p._1, p._2)) ++
        Seq(width.toString, lo.toString, hi.toString): _*)) {
      countByAddonBucketC(compileMulti(fieldQueries), width, lo, hi)
    }

  private def countByAddonBucketC(cq: CompiledQuery, width: Long, lo: Long,
                                  hi: Long): DataFrame = {
    Searcher.requireFacet(width, lo, hi)
    if (SearchKernel.isVoid(cq))
      spark.range(0).select(col("id").as("bucket"), col("id").as("cnt"))
    else if (altServes(cq)) {
      val keys = SearchKernel.keySpecs(cq)
      altPostings.where(termPredicate(cq))
        .groupByKey(_.shard)
        .flatMapGroups((shard: Int, it: Iterator[PostingRow]) =>
          AltKernel.facetShard(cq, keys, it, width, lo, hi))
        .toDF("bucket", "partial")
        .groupBy("bucket").agg(sum("partial").as("cnt"))
    } else
      matchingWithAddonC(cq)
        .where(col("addon") >= lo && col("addon") <= hi)
        .groupBy(Searcher.bucketCol(col("addon"), width, lo).as("bucket"))
        .agg(org.apache.spark.sql.functions.count(lit(1)).as("cnt"))
  }

  /** [[countByAddonBucket]] in float VALUE units over a
    * [[graft.build.AddonUnits.floatOrderedBits]]-encoded attach: matches
    * with value in [lo, hi] count into buckets
    * lo + floor((v-lo)/width)·width, computed in IEEE double arithmetic
    * (deterministic and engine-identical, so a SQL oracle reproduces the
    * buckets bit-for-bit). Bounds must be finite; NaN addons never
    * participate (their bit image sits above +Inf's, outside the encoded
    * bound), and a -0.0 bucket start normalizes to +0.0 on both paths.
    * Returns (bucket: double, cnt: long).
    */
  def countByAddonBucketFloat(queryStr: String, width: Double, lo: Double,
                              hi: Double): DataFrame =
    cached("facetAF" + Searcher.key(queryStr,
        java.lang.Double.doubleToLongBits(width).toString,
        java.lang.Double.doubleToLongBits(lo).toString,
        java.lang.Double.doubleToLongBits(hi).toString)) {
      countByAddonBucketFloatC(compile(queryStr), width, lo, hi)
    }

  private def countByAddonBucketFloatC(cq: CompiledQuery, width: Double,
                                       lo: Double, hi: Double): DataFrame = {
    Searcher.requireFacetFloat(width, lo, hi)
    val loBits = graft.build.AddonUnits.floatOrderedBits(lo)
    val hiBits = graft.build.AddonUnits.floatOrderedBits(hi)
    if (SearchKernel.isVoid(cq))
      spark.range(0).select(col("id").cast("double").as("bucket"),
        col("id").as("cnt"))
    else if (altServes(cq)) {
      val keys = SearchKernel.keySpecs(cq)
      val (w, l) = (width, lo)
      val decodeBits = udf((bits: Long) => java.lang.Double.longBitsToDouble(bits))
      // value-ordered bounded stream → buckets close at their boundary,
      // ≤ one partial row per (shard, non-empty bucket); partials carry
      // the bucket start's raw bit image, decoded after the final sum
      altPostings.where(termPredicate(cq))
        .groupByKey(_.shard)
        .flatMapGroups((shard: Int, it: Iterator[PostingRow]) =>
          AltKernel.facetShardFloat(cq, keys, new AltKernel.ShardCells(it),
            w, l, loBits, hiBits))
        .toDF("bits", "partial")
        .groupBy("bits").agg(sum("partial").as("cnt"))
        .select(decodeBits(col("bits")).as("bucket"), col("cnt"))
    } else {
      val decode = udf((bits: Long) =>
        graft.build.AddonUnits.floatFromOrderedBits(bits))
      val v = decode(col("addon"))
      // Spark floor(double) yields Long; the product k·width is IEEE-equal
      // to the kernel's math.floor path while k < 2^53 (guarded above)
      val bucket = lit(lo) + floor((v - lit(lo)) / lit(width)) * lit(width) +
        lit(0.0)
      matchingWithAddonC(cq)
        .where(col("addon") >= loBits && col("addon") <= hiBits)
        .groupBy(bucket.as("bucket"))
        .agg(org.apache.spark.sql.functions.count(lit(1)).as("cnt"))
    }
  }

  /** Ranked search: WHERE t @@ q ORDER BY t <=> q LIMIT k — the
    * rum.sql golden shape; distance = cover-density (CoverRank), ties by
    * docId ascending (reference tie-break on TID, src/rumsort.c:4003-4021).
    * With matchOnly=false behaves like order-only scan over all docs
    * (EVERYTHING mode): non-matching docs carry infinite distance.
    */
  /** `method` = rank-normalization flags (CoverRank.Norm*). UNIQ flags
    * divide by the doc's distinct-lexeme count, which lives in the docs
    * table (the "heap" — exactly where the reference's rum_ts_distance
    * reads txt->size from), so those queries route through the full scan.
    */
  def topKCover(queryStr: String, k: Int, matchOnly: Boolean = true,
                method: Int = 0): DataFrame =
    cached("topKC" + Searcher.key(queryStr, k.toString, matchOnly.toString,
      method.toString)) {
      topKCoverC(compile(queryStr), k, matchOnly, method, null, null)
    }

  /** Multicolumn ranked scan: match `rankQuery` on `rankField` AND every
    * `filters` predicate on its field — one kernel pass over field-prefixed
    * keys — but rank by the cover-density of `rankQuery` ALONE (the other
    * fields are boolean predicates, not rank inputs), mirroring the
    * reference's multicolumn ordered scans where `ORDER BY t <=> q` ranks
    * one column while siblings filter (sql/orderby.sql:89-106;
    * attnum-prefixed keys src/rumutil.c:266-288).
    */
  def topKCoverMulti(rankField: String, rankQuery: String,
                     filters: Seq[(String, String)], k: Int,
                     matchOnly: Boolean = true, method: Int = 0): DataFrame =
    cached("topKCM" + Searcher.key(
      Seq(rankField, rankQuery) ++ filters.flatMap(p => Seq(p._1, p._2)) ++
        Seq(k.toString, matchOnly.toString, method.toString): _*)) {
      topKCoverMultiU(rankField, rankQuery, filters, k, matchOnly, method)
    }

  /** (fullCq, scoreCq, scoreMap) for a multicolumn ranked scan: match the
    * AND of every field's tsquery, rank by `rankQuery`'s cover-density
    * alone; scoreCq key j reads positions from full-query key scoreMap(j)
    * (dedup is per (term, prefix) on both sides, so the lookup is total).
    */
  private def compileCoverMulti(rankField: String, rankQuery: String,
      filters: Seq[(String, String)]): (CompiledQuery, CompiledQuery, Array[Int]) = {
    require(meta.fields.nonEmpty, "not a multi-column index")
    val known = meta.fields.split(",").toSet
    (rankField +: filters.map(_._1)).foreach(f =>
      require(known.contains(f), s"unknown field '$f' (have ${meta.fields})"))
    val rankTree = TsQuery.mapTerms(TsQueryParser.parse(rankQuery),
      t => graft.build.IndexBuilder.fieldKey(rankField, t))
    val filterTrees = filters.map { case (f, q) =>
      TsQuery.mapTerms(TsQueryParser.parse(q),
        t => graft.build.IndexBuilder.fieldKey(f, t))
    }
    val fullCq = compileTree((rankTree +: filterTrees).reduce(TsQuery.And(_, _)))
    val scoreCq = compileTree(rankTree)
    val scoreMap = scoreCq.keys.map(sk =>
      fullCq.keys.indexWhere(fk => fk.term == sk.term && fk.prefix == sk.prefix))
    require(scoreMap.forall(_ >= 0), "rank keys must appear in the full query")
    (fullCq, scoreCq, scoreMap)
  }

  private def topKCoverMultiU(rankField: String, rankQuery: String,
                     filters: Seq[(String, String)], k: Int,
                     matchOnly: Boolean, method: Int): DataFrame = {
    val (fullCq, scoreCq, scoreMap) = compileCoverMulti(rankField, rankQuery, filters)
    topKCoverC(fullCq, k, matchOnly, method, scoreCq, scoreMap)
  }

  private def topKCoverC(cq: CompiledQuery, k: Int, matchOnly: Boolean,
                         method: Int, scoreCq: CompiledQuery,
                         scoreMap: Array[Int]): DataFrame = {
    if (SearchKernel.isVoid(cq) && matchOnly)
      return spark.range(0)
        .select(col("id").as("docId"), col("id").cast("double").as("distance"))
    val needsHeap = (method & (CoverRank.NormUniq | CoverRank.NormLogUniq)) != 0
    val base =
      if (!matchOnly || needsHeap || SearchKernel.needsFullScan(cq))
        fullScan(cq, score = true, matchOnly = matchOnly, k = k, method = method,
          scoreCq = scoreCq, scoreMap = scoreMap)
      else {
        val keys = SearchKernel.keySpecs(cq)
        postings.where(termPredicate(cq))
          .groupByKey(_.shard)
          .flatMapGroups((shard: Int, it: Iterator[PostingRow]) =>
            SearchKernel.matchShard(cq, keys, it, score = true, k = k, method = method,
              scoreCq = scoreCq, scoreMap = scoreMap))
          .toDF("docId", "distance", "addon").select("docId", "distance")
      }
    base.select("docId", "distance")
      .orderBy(col("distance").asc, col("docId").asc).limit(k)
  }

  /** Classic BM25 disjunctive top-k over bag-of-terms with WAND pruning
    * (the fast-scan analogue, src/rumget.c:1900-2017). Scores use true tf
    * and doc length carried in the posting payload (addon-column pattern).
    */
  /** Field-scoped BM25 over a multicolumn index: terms resolve to the
    * field's prefixed key space, so df/maxTf stats and doc lengths are the
    * field's own (posting payloads carry per-field token counts);
    * `avgLen` stays the index-global average (documented engine behavior —
    * the oracle mirrors it).
    */
  def topKBm25Fields(field: String, terms: Seq[String], k: Int): DataFrame = {
    require(meta.fields.split(",").contains(field),
      s"unknown field '$field' (have ${meta.fields})")
    topKBm25(terms.map(t => graft.build.IndexBuilder.fieldKey(field, t)), k)
  }

  def topKBm25(terms: Seq[String], k: Int): DataFrame =
    cached("bm25" + Searcher.key(terms :+ k.toString: _*))(topKBm25U(terms, k))

  /** Per-searcher term-stats memo: (df, maxTf) per key, absent terms cached
    * as (0, 0). A Searcher is pinned to one immutable snapshot, so stats
    * never go stale; once a term is seen, no further plan construction pays
    * a driver-side stats job for it — the fixed per-query driver cost the
    * ad-hoc serving path must not re-pay per batch.
    */
  private val termStatsCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Int)]()

  /** stats for already-keyOf'd terms; absent terms are dropped. */
  private def statsFor(keys: Seq[String]): Map[String, (Long, Int)] = {
    val missing = keys.filterNot(termStatsCache.containsKey)
    if (missing.nonEmpty) {
      val rows = statsDF.where(col("term").isin(missing: _*))
        .select("term", "df", "maxTf").collect()
      val found = rows.map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap
      missing.foreach(t => termStatsCache.put(t, found.getOrElse(t, (0L, 0))))
    }
    keys.map(t => t -> termStatsCache.get(t)).toMap.filter(_._2._1 > 0L)
  }

  private def topKBm25U(terms: Seq[String], k: Int): DataFrame = {
    val distinct = terms.distinct.map(keyOf)
    val stats = statsFor(distinct)
    val present = distinct.filter(stats.contains)
    if (present.isEmpty) return spark.emptyDataFrame
      .select(lit(0L).as("docId"), lit(0.0).as("score")).limit(0)
    val n = meta.numDocs
    val avgLen = meta.avgLen
    val termsArr = present.toArray
    val dfArr = termsArr.map(t => stats(t)._1)
    val ubArr = termsArr.indices.map(i =>
      Bm25.maxTermScore(stats(termsArr(i))._2, dfArr(i), avgLen, n)).toArray

    postings.where(col("term").isin(termsArr.toSeq: _*))
      .groupByKey(_.shard)
      .flatMapGroups((shard: Int, it: Iterator[PostingRow]) =>
        SearchKernel.wandShard(termsArr, dfArr, ubArr, n, avgLen, k, it))
      .toDF("docId", "score")
      .orderBy(col("score").desc, col("docId").asc)
      .limit(k)
  }

  /** Execute several prepared query DataFrames as ONE Spark job (the
    * msearch/multi-query pattern): each result collapses to its row count
    * and the branches union into a single action, so the per-job driver
    * dispatch — serial at ANY cluster size — amortizes across the batch.
    * This is how a high-QPS serving tier keeps query throughput scaling
    * with executors when individual queries are millisecond-scale. Returns
    * (branch index, row count) per input. The union plan is cached under
    * `key` (caller owns key uniqueness per Searcher instance).
    */
  /** Zero-row frame with (qi, cols...) — the empty-msearch schema shared
    * by every batch API's empty-input guard.
    */
  private def emptyBatch(cols: (String, String)*): DataFrame =
    spark.range(0).select(
      col("id").cast("int").as("qi") +: cols.map { case (n, t) =>
        col("id").cast(t).as(n) }: _*)

  def batchRowCounts(key: String, dfs: => Seq[DataFrame]): Array[(Int, Long)] =
    cached("batch" + Searcher.key(key)) {
      val branches = dfs
      if (branches.isEmpty) // empty msearch buffer: no job at all
        emptyBatch("cnt" -> "long")
      else branches.zipWithIndex.map { case (d, i) =>
        d.agg(org.apache.spark.sql.functions.count(lit(1)).as("cnt"))
          .select(lit(i).as("qi"), col("cnt"))
      }.reduce(_.union(_))
    }.collect().map(r => (r.getInt(0), r.getLong(1)))

  /** Match counts for a batch of tsquery strings in one Spark job. */
  def countBatch(queryStrs: Seq[String]): Map[String, Long] = {
    val distinct = queryStrs.distinct
    batchRowCounts("counts" + Searcher.key(distinct: _*),
      distinct.map(matchingDocs))
      .map { case (i, n) => distinct(i) -> n }.toMap
  }

  /** Batched ranked retrieval (msearch for BM25 top-k): every (terms, k)
    * query's cached plan unions with a query-index tag into ONE job.
    * Returns (qi, docId, score) — qi indexes into the input batch. The
    * outer key joins per-query keys on a second separator so batch
    * boundaries cannot alias.
    */
  def topKBm25Batch(queries: Seq[(Seq[String], Int)]): DataFrame =
    cached("bm25B\u0001" + queries.map { case (ts, k) =>
      (ts :+ k.toString).mkString("\u0001") }.mkString("\u0002")) {
      if (queries.isEmpty) emptyBatch("docId" -> "long", "score" -> "double")
      else queries.zipWithIndex.map { case ((ts, k), i) =>
        topKBm25(ts, k).select(lit(i).as("qi"), col("docId"), col("score"))
      }.reduce(_.union(_))
    }

  /** Batched cover-density ranked retrieval: the msearch twin of
    * [[topKBm25Batch]] for the reference's flagship `<=>` ordering.
    * Returns (qi, docId, distance).
    */
  def topKCoverBatch(queries: Seq[(String, Int)]): DataFrame =
    cached("coverB\u0001" + queries.map { case (q, k) =>
      q + "\u0001" + k }.mkString("\u0002")) {
      if (queries.isEmpty) emptyBatch("docId" -> "long", "distance" -> "double")
      else queries.zipWithIndex.map { case ((q, k), i) =>
        topKCover(q, k).select(lit(i).as("qi"), col("docId"), col("distance"))
      }.reduce(_.union(_))
    }

  /** FUSED multi-search: evaluate a heterogeneous batch of queries in ONE
    * scan + ONE shuffle (the shared-scan msearch a serving tier runs when
    * individual queries are millisecond-scale). The union of all specs'
    * term predicates is pushed to a single postings scan; each shard's rows
    * buffer once and every spec's kernel (boolean match / WAND BM25 /
    * cover-rank, all with their usual per-shard pruning) replays them —
    * extra terms from sibling specs are invisible to a kernel because
    * cursor construction matches exactly its own keys. Global per-spec
    * top-k then runs over ONLY the shard-pruned rows of bounded specs
    * (≤ k·nShards rows each): a shared repartition barrier lets both the
    * bounded and unbounded branches reuse one kernel execution, and match
    * specs never pass through a sort. Per-batch driver cost is one plan
    * over one subtree instead of N — the serial component that would
    * otherwise bound msearch throughput at any cluster size.
    * Returns (qi, docId, score): score = 0.0 for Match and AddonRange,
    * BM25 score for Bm25 (top-k, higher better), cover distance for Cover
    * (top-k, lower better), exact saturating addon distance for Addon
    * (top-k, lower better), exact double value-units distance for
    * AddonFloat. Ordered-scan slots (Addon/AddonRange and their float
    * value-units twins) run over the alt-order layout's OWN shared scan — a heterogeneous batch costs
    * one scan per layout it touches. Void specs contribute no rows;
    * full-scan-only and alt-unservable specs fall back to their solo
    * plans, unioned in.
    */
  def msearch(specs: Seq[Searcher.MsearchSpec]): DataFrame =
    cached("msearch" + specs.map(Searcher.specKey).mkString(""))(msearchPlan(specs))

  /** Uncached twin of [[msearch]] — ad-hoc paths that must pay fresh
    * planning (and benchmarks that must measure it) build a new plan here.
    */
  def msearchPlan(specs: Seq[Searcher.MsearchSpec]): DataFrame = {
    import Searcher.MsearchSpec._
    val fused = scala.collection.mutable.ArrayBuffer.empty[Searcher.FusedSpec]
    val altFused = scala.collection.mutable.ArrayBuffer.empty[Searcher.AltFusedSpec]
    val fallback = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    // count slots: every qi here gets a spine row (even void/zero-match);
    // full-scan-only count queries aggregate their solo plan into the
    // same (qi, partial) union
    val countQis = scala.collection.mutable.ArrayBuffer.empty[Int]
    val countFallback = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def addMatch(qi: Int, cq: CompiledQuery): Unit = {
      if (SearchKernel.isVoid(cq)) ()
      else if (SearchKernel.needsFullScan(cq))
        fallback += matchingDocsC(cq)
          .select(lit(qi).as("qi"), col("docId"), lit(0.0).as("score"))
      else fused += Searcher.FusedSpec(qi, 0, cq, SearchKernel.keySpecs(cq),
        null, null, null, 0)
    }
    def addCover(qi: Int, cq: CompiledQuery, k: Int, method: Int,
                 scoreCq: CompiledQuery, scoreMap: Array[Int]): Unit = {
      val needsHeap = (method & (CoverRank.NormUniq | CoverRank.NormLogUniq)) != 0
      if (SearchKernel.isVoid(cq)) ()
      else if (needsHeap || SearchKernel.needsFullScan(cq))
        fallback += topKCoverC(cq, k, matchOnly = true, method, scoreCq, scoreMap)
          .select(lit(qi).as("qi"), col("docId"), col("distance").as("score"))
      else fused += Searcher.FusedSpec(qi, 1, cq, SearchKernel.keySpecs(cq),
        null, null, null, k, scoreCq, scoreMap, method)
    }
    def addOrder2(qi: Int, cq: CompiledQuery, c: Long, op: String, k: Int,
                  method: Int): Unit = {
      require(Set("both", "left", "right").contains(op), s"op: $op")
      require(k > 0, s"k: $k")
      val needsHeap = (method & (CoverRank.NormUniq | CoverRank.NormLogUniq)) != 0
      if (SearchKernel.isVoid(cq)) ()
      else if (needsHeap || SearchKernel.needsFullScan(cq))
        fallback += topKMultiC(cq,
            Seq(Searcher.OrderKey.Rank(method), Searcher.OrderKey.Addon(c, op)), k)
          .select(lit(qi).as("qi"), col("docId"), col("d0").as("score"))
      else fused += Searcher.FusedSpec(qi, 4, cq, SearchKernel.keySpecs(cq),
        null, null, null, k, null, null, method, c, op)
    }
    def addCount(qi: Int, cq: CompiledQuery): Unit = {
      countQis += qi
      if (SearchKernel.isVoid(cq)) () // 0 via the spine
      else if (SearchKernel.needsFullScan(cq))
        countFallback += matchingDocsC(cq)
          .agg(org.apache.spark.sql.functions.count(lit(1)).as("partial"))
          .select(lit(qi).as("qi"), col("partial"))
      else fused += Searcher.FusedSpec(qi, 3, cq, SearchKernel.keySpecs(cq),
        null, null, null, 0)
    }
    def addAddon(qi: Int, cq: CompiledQuery, c: Long, op: String, k: Int): Unit = {
      require(Set("both", "left", "right").contains(op), s"op: $op")
      if (SearchKernel.isVoid(cq)) ()
      else if (altServes(cq))
        altFused += Searcher.AltFusedSpec(qi, 0, cq, SearchKernel.keySpecs(cq),
          c, op, k, 0L, 0L)
      else
        fallback += topKAddonC(cq, c, op, k)
          .select(lit(qi).as("qi"), col("docId"), col("distance").as("score"))
    }
    def addAddonFloat(qi: Int, cq: CompiledQuery, c: Double, op: String,
                      k: Int): Unit = {
      require(Set("both", "left", "right").contains(op), s"op: $op")
      if (SearchKernel.isVoid(cq)) ()
      else if (altServes(cq))
        altFused += Searcher.AltFusedSpec(qi, 0, cq, SearchKernel.keySpecs(cq),
          graft.build.AddonUnits.floatOrderedBits(c), op, k, 0L, 0L,
          floatUnits = true)
      else
        fallback += topKAddonFloatC(cq, c, op, k)
          .select(lit(qi).as("qi"), col("docId"), col("distance").as("score"))
    }
    def addRange(qi: Int, cq: CompiledQuery, lo: Long, hi: Long): Unit = {
      if (SearchKernel.isVoid(cq)) ()
      else if (altServes(cq))
        altFused += Searcher.AltFusedSpec(qi, 1, cq, SearchKernel.keySpecs(cq),
          0L, "", 0, lo, hi)
      else
        fallback += rangeAddonC(cq, lo, hi)
          .select(lit(qi).as("qi"), col("docId"), lit(0.0).as("score"))
    }
    def addFacet(qi: Int, cq: CompiledQuery, w: Long, lo: Long,
                 hi: Long): Unit = {
      Searcher.requireFacet(w, lo, hi)
      if (SearchKernel.isVoid(cq)) () // facet of nothing = no buckets
      else if (altServes(cq))
        altFused += Searcher.AltFusedSpec(qi, 2, cq, SearchKernel.keySpecs(cq),
          w, "", 0, lo, hi)
      else // fallback plan carries its own final agg; union it in directly
        fallback += countByAddonBucketC(cq, w, lo, hi)
          .select(lit(qi).as("qi"), col("bucket").as("docId"),
            col("cnt").cast("double").as("score"))
    }
    def addFacetFloat(qi: Int, cq: CompiledQuery, w: Double, lo: Double,
                      hi: Double): Unit = {
      Searcher.requireFacetFloat(w, lo, hi)
      if (SearchKernel.isVoid(cq)) ()
      else if (altServes(cq)) // c slot carries the width's ordered bits
        altFused += Searcher.AltFusedSpec(qi, 2, cq, SearchKernel.keySpecs(cq),
          graft.build.AddonUnits.floatOrderedBits(w), "", 0,
          graft.build.AddonUnits.floatOrderedBits(lo),
          graft.build.AddonUnits.floatOrderedBits(hi), floatUnits = true)
      else {
        val bitsOf = udf((v: Double) => java.lang.Double.doubleToRawLongBits(v))
        fallback += countByAddonBucketFloatC(cq, w, lo, hi)
          .select(lit(qi).as("qi"), bitsOf(col("bucket")).as("docId"),
            col("cnt").cast("double").as("score"))
      }
    }
    def addBm25(qi: Int, keys: Seq[String], k: Int): Unit = {
      val distinct = keys.distinct
      val stats = statsFor(distinct)
      val present = distinct.filter(stats.contains).toArray
      if (present.nonEmpty) {
        val dfArr = present.map(t => stats(t)._1)
        val ubArr = present.indices.map(i =>
          graft.query.Bm25.maxTermScore(stats(present(i))._2, dfArr(i),
            meta.avgLen, meta.numDocs)).toArray
        fused += Searcher.FusedSpec(qi, 2, null, null, present, dfArr, ubArr, k)
      }
    }
    specs.zipWithIndex.foreach { case (spec, qi) =>
      spec match {
        case Match(q) => addMatch(qi, compile(q))
        case Cover(q, k, method) => addCover(qi, compile(q), k, method, null, null)
        case Order2(q, c, op, k, method) => addOrder2(qi, compile(q), c, op, k, method)
        case Count(q) => addCount(qi, compile(q))
        case CountFields(fq) => addCount(qi, compileMulti(fq))
        case Bm25(terms, k) => addBm25(qi, terms.map(keyOf), k)
        // field-scoped variants over a multi-column index: the same fused
        // pass — field-prefixed keys are just keys to the kernel
        case MatchFields(fq) => addMatch(qi, compileMulti(fq))
        case CoverFields(rf, rq, filters, k) =>
          val (fullCq, scoreCq, scoreMap) = compileCoverMulti(rf, rq, filters)
          addCover(qi, fullCq, k, 0, scoreCq, scoreMap)
        case Bm25Fields(field, terms, k) =>
          require(meta.fields.split(",").contains(field),
            s"unknown field '$field' (have ${meta.fields})")
          addBm25(qi,
            terms.map(t => keyOf(graft.build.IndexBuilder.fieldKey(field, t))), k)
        // ordered-scan slots ride the batch over the alt-order layout's
        // OWN shared scan (one per layout per batch), or their solo
        // fallback plans when the layout can't serve them
        case Addon(q, c, op, k) => addAddon(qi, compile(q), c, op, k)
        case AddonRange(q, lo, hi) => addRange(qi, compile(q), lo, hi)
        case AddonFields(fq, c, op, k) => addAddon(qi, compileMulti(fq), c, op, k)
        case AddonRangeFields(fq, lo, hi) => addRange(qi, compileMulti(fq), lo, hi)
        // float value-units slots: the range desugars to encoded bounds
        // (bit order = value order); the top-k carries floatUnits through
        // to the kernel's distance closure
        case AddonFloat(q, c, op, k) => addAddonFloat(qi, compile(q), c, op, k)
        case AddonRangeFloat(q, lo, hi) => addRange(qi, compile(q),
          graft.build.AddonUnits.floatOrderedBits(lo),
          graft.build.AddonUnits.floatOrderedBits(hi))
        case Facet(q, w, lo, hi) => addFacet(qi, compile(q), w, lo, hi)
        case FacetFields(fq, w, lo, hi) =>
          addFacet(qi, compileMulti(fq), w, lo, hi)
        case FacetFloat(q, w, lo, hi) => addFacetFloat(qi, compile(q), w, lo, hi)
        // the placeholder key is an ordinary key to the kernel: these
        // slots ride the shared scan like any single-term query
        case MatchEmpty(f) => addMatch(qi, emptyCompiled(f))
        case CountEmpty(f) => addCount(qi, emptyCompiled(f))
      }
    }

    val (fusedParts, countKernelPart): (Seq[DataFrame], Option[DataFrame]) =
      if (fused.isEmpty) (Nil, None)
      else {
        val fs = fused.toArray
        // ONE predicate over the union of every spec's terms: both kernel
        // branches below share an IDENTICAL scan+shuffle subtree, which
        // Spark's exchange reuse executes once (MsearchFusedSpec asserts
        // the ReusedExchange). Each branch's kernel then evaluates only its
        // own specs over the buffered shard rows — no duplicated kernel
        // work, and sibling specs' terms are invisible to a kernel because
        // cursor construction matches exactly its own keys.
        val pred = fs.map { f =>
          if (f.mode == 2) col("term").isin(f.terms.toSeq: _*)
          else termPredicate(f.cq)
        }.reduce(_ || _)
        val nDocs = meta.numDocs
        val avgLen = meta.avgLen
        val base = postings.where(pred).groupByKey(_.shard)
        def kernel(specsArr: Array[Searcher.FusedSpec]): DataFrame =
          base.flatMapGroups { (shard: Int, it: Iterator[PostingRow]) =>
            // group the shard's rows by term ONCE; every spec's cursor
            // construction then touches only its own terms' entries —
            // per-spec setup is O(spec terms), not O(specs × union rows)
            val view = new SearchKernel.ShardView(it)
            specsArr.iterator.flatMap { f =>
              f.mode match {
                case 0 => SearchKernel.matchShard(f.cq, f.keys, view,
                    score = false, k = 0, method = 0, scoreCq = null, scoreMap = null)
                  .map(t => (f.qi, t._1, 0.0, 0.0, 0L))
                case 1 => SearchKernel.matchShard(f.cq, f.keys, view,
                    score = true, k = f.k, method = f.method,
                    scoreCq = f.scoreCq, scoreMap = f.scoreMap)
                  .map(t => (f.qi, t._1, t._2, t._2, 0L))
                case 2 => SearchKernel.wandShard(f.terms, f.dfs, f.ubs, nDocs,
                    avgLen, f.k, view)
                  .map { case (id, s) => (f.qi, id, s, -s, 0L) } // sort asc = score desc
                // per-shard PARTIAL count: one row per (slot, shard); the
                // match set never leaves the shard
                case 3 =>
                  var n = 0L
                  val m = SearchKernel.matchShard(f.cq, f.keys, view,
                    score = false, k = 0, method = 0, scoreCq = null, scoreMap = null)
                  while (m.hasNext) { m.next(); n += 1 }
                  Iterator.single((f.qi, n, 0.0, 0.0, 0L))
                // composite (rank, addonDist, docId): per-shard heap pruned
                // on the FULL tuple; sort2 carries the EXACT long addon
                // distance so the global window tie-breaks losslessly
                case _ => SearchKernel.order2Shard(f.cq, f.keys, view, f.c,
                    f.op, f.k, f.method)
                  .map { case (id, r, d2) => (f.qi, id, r, r, d2) }
              }
            }
          }.toDF("qi", "docId", "score", "sort", "sort2")
        val bounded = fs.filter(f => f.mode != 0 && f.mode != 3)
        val unbounded = fs.filter(_.mode == 0)
        val counts = fs.filter(_.mode == 3)
        // bounded specs: per-shard heaps already pruned to ≤ k·nShards rows
        // each, so the global top-k window's exchange+sort touch only those;
        // match specs stream through their own branch, never sorted
        val boundedPart =
          if (bounded.isEmpty) None
          else {
            val kPairs = bounded.flatMap(f => Seq(lit(f.qi), lit(f.k))).toSeq
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy("qi")
              .orderBy(col("sort").asc, col("sort2").asc, col("docId").asc)
            Some(kernel(bounded)
              .withColumn("rank", row_number().over(w))
              .where(col("rank") <= element_at(map(kPairs: _*), col("qi")))
              .select("qi", "docId", "score"))
          }
        val unboundedPart =
          if (unbounded.isEmpty) None
          else Some(kernel(unbounded).select("qi", "docId", "score"))
        // count slots share the same scan+shuffle subtree (reused
        // exchange); their per-shard partials are aggregated below with
        // the spine and any full-scan fallbacks
        val countPart =
          if (counts.isEmpty) None
          else Some(kernel(counts).select(col("qi"), col("docId").as("partial")))
        ((boundedPart ++ unboundedPart).toSeq, countPart)
      }
    val countsPart: Option[DataFrame] =
      if (countQis.isEmpty) None
      else {
        val spine = countQis.toSeq.toDF("qi").select(col("qi"), lit(0L).as("partial"))
        val union = (Seq(spine) ++ countKernelPart.toSeq ++ countFallback.toSeq)
          .reduce(_ union _)
        Some(union.groupBy("qi").agg(sum("partial").as("cnt"))
          .select(col("qi"), col("cnt").as("docId"),
            col("cnt").cast("double").as("score")))
      }
    // ordered-scan slots: ONE alt-layout scan + shuffle for the whole
    // batch, mirroring the primary fused pass — bounded (top-k) and range
    // branches share the exchange; per-shard ShardCells merges each term's
    // runs once across every spec that touches it
    val altParts: Seq[DataFrame] =
      if (altFused.isEmpty) Nil
      else {
        val afs = altFused.toArray
        val pred = afs.map(f => termPredicate(f.cq)).reduce(_ || _)
        val altBase = altPostings.where(pred).groupByKey(_.shard)
        def altKernel(specsArr: Array[Searcher.AltFusedSpec]): DataFrame =
          altBase.flatMapGroups { (shard: Int, it: Iterator[PostingRow]) =>
            val cells = new AltKernel.ShardCells(it)
            specsArr.iterator.flatMap { f =>
              if (f.mode == 0)
                AltKernel.topKAddonShard(f.cq, f.keys, cells, f.c, f.op, f.k,
                    f.floatUnits)
                  .rows.iterator.map(t => (f.qi, t._1, t._2))
              else if (f.mode == 1)
                AltKernel.rangeAddonShard(f.cq, f.keys, cells, f.lo, f.hi)
                  .map { case (d, _) => (f.qi, d, 0L) }
              // mode 2: per-shard facet partials (c = bucket width; float
              // slots bucket in VALUE space and emit the start's bit image)
              else if (!f.floatUnits)
                AltKernel.facetShard(f.cq, f.keys, cells, f.c, f.lo, f.hi)
                  .map { case (b, n) => (f.qi, b, n) }
              else
                AltKernel.facetShardFloat(f.cq, f.keys, cells,
                    graft.build.AddonUnits.floatFromOrderedBits(f.c),
                    graft.build.AddonUnits.floatFromOrderedBits(f.lo),
                    f.lo, f.hi)
                  .map { case (b, n) => (f.qi, b, n) }
            }
          }.toDF("qi", "docId", "dist")
        val bounded = afs.filter(_.mode == 0)
        val unbounded = afs.filter(_.mode == 1)
        val facets = afs.filter(_.mode == 2)
        val boundedPart =
          if (bounded.isEmpty) None
          else {
            // global top-k over per-shard-pruned rows; ordering/limit on
            // the exact long distance, double only for the k survivors
            val kPairs = bounded.flatMap(f => Seq(lit(f.qi), lit(f.k))).toSeq
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy("qi").orderBy(col("dist").asc, col("docId").asc)
            // float-units slots ranked on the double distance's bit image
            // (same window — order-preserving); decode only the ≤ k·nShards
            // survivor rows back to the exact double for the score column
            val floatQis = bounded.filter(_.floatUnits).map(_.qi).toSeq
            val score =
              if (floatQis.isEmpty) col("dist").cast("double")
              else {
                val bitsToDouble =
                  udf((bits: Long) => java.lang.Double.longBitsToDouble(bits))
                when(col("qi").isInCollection(floatQis), bitsToDouble(col("dist")))
                  .otherwise(col("dist").cast("double"))
              }
            Some(altKernel(bounded)
              .withColumn("rank", row_number().over(w))
              .where(col("rank") <= element_at(map(kPairs: _*), col("qi")))
              .select(col("qi"), col("docId"), score.as("score")))
          }
        val unboundedPart =
          if (unbounded.isEmpty) None
          else Some(altKernel(unbounded)
            .select(col("qi"), col("docId"), lit(0.0).as("score")))
        // facet slots: final sum over the per-shard bucket partials (rows
        // shuffled here = buckets × shards per slot, never the matches);
        // shares the batch's alt scan via exchange reuse like the others
        val facetPart =
          if (facets.isEmpty) None
          else Some(altKernel(facets)
            .groupBy("qi", "docId").agg(sum("dist").as("cnt"))
            .select(col("qi"), col("docId"),
              col("cnt").cast("double").as("score")))
        (boundedPart ++ unboundedPart ++ facetPart).toSeq
      }
    (fusedParts ++ countsPart.toSeq ++ altParts ++ fallback.toSeq)
      .reduceOption(_ union _)
      .getOrElse(emptyBatch("docId" -> "long", "score" -> "double"))
  }

  /** Fused count-serving: match counts for a batch of tsquery strings in
    * ONE scan + ONE shuffle of per-shard PARTIAL counts — the full match
    * sets never leave their shard (map-side aggregation taken to its
    * limit: the kernel itself collapses each (spec, shard) to one long).
    * Shuffled rows = nShards × batch size regardless of match counts,
    * which is what keeps count-heavy serving scaling when individual
    * matches number in the millions. Void queries count 0 (the qi spine
    * guarantees a row per slot); full-scan-only queries fall back to their
    * solo plans, union-aggregated in. Returns (qi, cnt).
    */
  def msearchCounts(queryStrs: Seq[String]): DataFrame =
    cached("msearchC" + Searcher.key(queryStrs: _*))(msearchCountsPlan(queryStrs))

  /** Uncached twin of [[msearchCounts]] (fresh-planned ad-hoc path) —
    * sugar over a batch of [[Searcher.MsearchSpec.Count]] slots through
    * the unified fused planner: Count slots emit (qi, docId = cnt), so
    * counts-only batches keep the exact shape this method always had
    * (one scan + one shuffle of per-shard partials, a spine row per
    * slot), and mixed match+count batches share ONE scan.
    */
  def msearchCountsPlan(queryStrs: Seq[String]): DataFrame =
    msearchPlan(queryStrs.map(Searcher.MsearchSpec.Count(_)))
      .select(col("qi"), col("docId").as("cnt"))

  /** docIds whose indexed value tokenizes to NOTHING (empty or NULL
    * column) — served from the reserved placeholder key the build indexes
    * for token-less docs ([[graft.build.IndexBuilder.EmptyToken]]; the
    * reference's placeholder-key categories src/rum.h:205-211 and
    * INCLUDE_EMPTY scan mode src/rumscan.c:144-151), NOT a corpus scan:
    * the plan is a postings scan with one pushed-down key, like any other
    * single-term match. On a multi-column index pass the field whose
    * emptiness is being asked about.
    */
  private def emptyKeyRaw(field: Option[String]): String = field match {
    case Some(f) =>
      require(meta.fields.split(",").contains(f),
        s"unknown field '$f' (have ${meta.fields})")
      graft.build.IndexBuilder.fieldKey(f, graft.build.IndexBuilder.EmptyToken)
    case None =>
      require(meta.fields.isEmpty,
        s"multi-column index (fields=${meta.fields}): pass the field")
      graft.build.IndexBuilder.EmptyToken
  }

  /** The placeholder key as a compiled single-leaf query: to the kernel
    * it is an ordinary pushed-down key (its rows carry an empty position
    * payload, which decodes to a present-but-empty position list), so
    * Match/Count slots over it ride fused batches like any other query —
    * INCLUDE_EMPTY inside the serving batch (src/rumscan.c:144-151).
    */
  private def emptyCompiled(field: Option[String]): CompiledQuery =
    compileTree(TsQuery.Lexeme(emptyKeyRaw(field)))

  def matchingEmpty(field: Option[String] = None): DataFrame = {
    val raw = emptyKeyRaw(field)
    cached("matchEmpty" + Searcher.key(raw)) {
      postings.where(col("term") === keyOf(raw))
        .flatMap { row =>
          val cur = new PostingCursor(Iterator(row.blocks))
          val out = scala.collection.mutable.ArrayBuffer.empty[Long]
          while (!cur.done) { out += cur.docId; cur.next() }
          out.iterator
        }.toDF("docId")
    }
  }

  def countEmpty(field: Option[String] = None): Long =
    runCount("countEmpty" + Searcher.key(field.getOrElse("")), matchingEmpty(field))

  /** Decoded postings of one term: (doc_id, tf) — the bitmap-scan shape
    * plus payload-derived tf; used for verification and as a building
    * block for joins back to the corpus.
    */
  def termPostings(term: String): DataFrame =
    cached("post" + Searcher.key(term))(termPostingsU(term))

  private def termPostingsU(term: String): DataFrame = {
    postings.where(col("term") === keyOf(term))
      .flatMap { row =>
        val cur = new PostingCursor(Iterator(row.blocks))
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
        while (!cur.done) { out += ((cur.docId, cur.tf)); cur.next() }
        out.iterator
      }.toDF("doc_id", "tf")
  }

  /** Global per-term document frequencies from the stats table. In hash
    * mode the output `term` column carries the hashed key.
    */
  def termStats(terms: Seq[String]): DataFrame =
    cached("stats" + Searcher.key(terms: _*)) {
      statsDF.where(col("term").isin(terms.map(keyOf): _*))
        .select(col("term"), col("df"))
    }

  /** Doc length table (token counts). */
  def docLens: DataFrame =
    docs.select(col("docId").as("doc_id"), col("len"))

  /** Full-corpus scan joined with order-key postings (scanGetItemFull,
    * src/rumget.c:2024-2083): candidate stream = docs table per shard,
    * sorted by docId; posting cursors pulled along for scoring.
    */
  private def fullScan(cq: CompiledQuery, score: Boolean, matchOnly: Boolean, k: Int,
                       method: Int = 0, scoreCq: CompiledQuery = null,
                       scoreMap: Array[Int] = null): DataFrame = {
    val keys = SearchKernel.keySpecs(cq)
    val docsG = docs.groupByKey(_.shard)
    val postG = postings.where(termPredicate(cq)).groupByKey(_.shard)
    docsG.cogroupSorted(postG)(col("docId").asc)(col("term").asc)(
      (shard: Int, docIt: Iterator[DocRow], postIt: Iterator[PostingRow]) =>
        SearchKernel.fullScanShard(cq, keys, docIt, postIt, score, matchOnly, k, method,
          scoreCq, scoreMap))
      .toDF("docId", "distance", "addon")
  }
}

object Searcher {
  /** One query of a fused [[Searcher.msearch]] batch. */
  sealed trait MsearchSpec
  object MsearchSpec {
    /** unordered boolean match: every docId satisfying the tsquery */
    final case class Match(query: String) extends MsearchSpec
    /** BM25 disjunctive top-k over a bag of terms (higher score better) */
    final case class Bm25(terms: Seq[String], k: Int) extends MsearchSpec
    /** cover-density ranked top-k (score = distance, lower better);
      * `method` = CoverRank normalization flags (UNIQ norms route the slot
      * through its solo full-scan fallback — they read the docs table)
      */
    final case class Cover(query: String, k: Int, method: Int = 0) extends MsearchSpec
    /** composite-ordered top-k riding the fused batch:
      * `WHERE q ORDER BY t <=> q, addon <op> c, docId LIMIT k`
      * lexicographic (the [[Searcher.topKMulti]] Rank-then-Addon shape;
      * reference sorts the whole distances[norderbys] vector then TID,
      * src/rumget.c:2218-2301). Slot score = the PRIMARY key's rank
      * distance (lower better); the addon key decides membership and
      * tie-breaks but is not re-emitted (the batch schema is
      * (qi, docId, score)). UNIQ norms / full-scan-only queries ride as
      * their solo fallback plans.
      */
    final case class Order2(query: String, c: Long, op: String, k: Int,
        method: Int = 0) extends MsearchSpec
    /** match COUNT riding the fused batch: ships only the per-shard
      * PARTIAL count (the match set never leaves its shard — shuffle
      * volume for the slot is nShards rows regardless of match count).
      * Emits exactly ONE row per slot even for void/zero-match queries:
      * (qi, docId = the count, score = the count as double).
      * [[Searcher.msearchCounts]] is sugar over a batch of these; mixing
      * Count slots with Match/Bm25/Cover/Order2 slots shares the ONE
      * postings scan across all of them.
      */
    final case class Count(query: String) extends MsearchSpec
    /** multicolumn [[Count]]: one tsquery per field, ANDed */
    final case class CountFields(fieldQueries: Seq[(String, String)])
      extends MsearchSpec
    /** multicolumn match: one tsquery per field, ANDed (compileMulti) */
    final case class MatchFields(fieldQueries: Seq[(String, String)]) extends MsearchSpec
    /** multicolumn ranked top-k: rank one field's query, siblings filter */
    final case class CoverFields(rankField: String, rankQuery: String,
        filters: Seq[(String, String)], k: Int) extends MsearchSpec
    /** field-scoped BM25 over a multicolumn index */
    final case class Bm25Fields(field: String, terms: Seq[String], k: Int)
      extends MsearchSpec
    /** addon ordered top-k: `WHERE q ORDER BY addon <op> c LIMIT k`
      * (score = exact saturating distance as double, lower better); served
      * from the alt-order layout when it can, else the slot's solo
      * fallback plan rides the batch
      */
    final case class Addon(query: String, c: Long, op: String, k: Int)
      extends MsearchSpec
    /** addon range filter: `WHERE q AND lo <= addon <= hi` (score = 0.0) */
    final case class AddonRange(query: String, lo: Long, hi: Long)
      extends MsearchSpec
    /** multicolumn [[Addon]]: one tsquery per field, ANDed */
    final case class AddonFields(fieldQueries: Seq[(String, String)], c: Long,
        op: String, k: Int) extends MsearchSpec
    /** multicolumn [[AddonRange]] */
    final case class AddonRangeFields(fieldQueries: Seq[(String, String)],
        lo: Long, hi: Long) extends MsearchSpec
    /** [[Addon]] in float VALUE units over a
      * [[graft.build.AddonUnits.floatOrderedBits]]-encoded attach: score =
      * `|value - c|` as an exact double — the fused twin of
      * [[Searcher.topKAddonFloat]]. Rides the same alt-layout shared scan,
      * ranking the double distance's own bit image (early termination
      * preserved); NaN addons sort last.
      */
    final case class AddonFloat(query: String, c: Double, op: String, k: Int)
      extends MsearchSpec
    /** [[AddonRange]] in float VALUE units: a pure bound desugar — bit
      * order = value order for [[graft.build.AddonUnits.floatOrderedBits]]
      * keys, so the slot IS an AddonRange over the encoded bounds (NaN
      * never matches: its bit image sits above +Inf's).
      */
    final case class AddonRangeFloat(query: String, lo: Double, hi: Double)
      extends MsearchSpec
    /** facet histogram riding the fused batch (the
      * [[Searcher.countByAddonBucket]] shape): per-shard bucket PARTIALS
      * are all that ship — ≤ buckets × shards rows per slot regardless of
      * match count. Result rows are (qi, docId = bucket start,
      * score = count as double); only non-empty buckets emit.
      * Alt-unservable queries aggregate their solo fallback plan into the
      * batch union.
      */
    final case class Facet(query: String, width: Long, lo: Long, hi: Long)
      extends MsearchSpec
    /** multicolumn [[Facet]]: one tsquery per field, ANDed */
    final case class FacetFields(fieldQueries: Seq[(String, String)],
        width: Long, lo: Long, hi: Long) extends MsearchSpec
    /** [[Facet]] in float VALUE units over a
      * [[graft.build.AddonUnits.floatOrderedBits]]-encoded attach (the
      * fused twin of [[Searcher.countByAddonBucketFloat]]): result rows
      * are (qi, docId = the bucket start's RAW IEEE bits — decode with
      * `java.lang.Double.longBitsToDouble` — , score = count). Rides the
      * batch's shared alt scan; alt-unservable queries aggregate their
      * solo fallback plan with the same bit-image bucket column.
      */
    final case class FacetFloat(query: String, width: Double, lo: Double,
        hi: Double) extends MsearchSpec
    /** docIds whose indexed value is empty/NULL, riding the fused batch —
      * INCLUDE_EMPTY inside the serving batch (the reserved placeholder
      * key is an ordinary pushed-down key to the kernel,
      * src/rumscan.c:144-151). Pass the field on a multicolumn index.
      */
    final case class MatchEmpty(field: Option[String] = None) extends MsearchSpec
    /** count of empty/NULL values as a per-shard-partial [[Count]] slot */
    final case class CountEmpty(field: Option[String] = None) extends MsearchSpec
  }

  private[search] def requireFacet(width: Long, lo: Long, hi: Long): Unit = {
    require(width > 0, s"facet width must be positive: $width")
    require(lo <= hi && hi - lo >= 0, // hi-lo < 0 means the span overflowed
      s"facet range invalid (or span overflows Long): [$lo, $hi]")
  }

  private[search] def requireFacetFloat(width: Double, lo: Double,
                                        hi: Double): Unit = {
    require(width > 0 && !width.isInfinite && !width.isNaN,
      s"facet width must be positive finite: $width")
    require(!lo.isNaN && !hi.isNaN && !lo.isInfinite && !hi.isInfinite &&
      lo <= hi, s"facet range must be finite and ordered: [$lo, $hi]")
    // bucket index k must stay exactly representable as both Long and
    // Double for the two engines' floor paths to agree bit-for-bit
    require((hi - lo) / width < 1e15, s"too many buckets: [$lo, $hi] / $width")
  }

  /** Bucket start for an addon known to sit in [lo, hi]: lo +
    * floor((addon-lo)/width)·width in EXACT Long arithmetic — addon-lo is
    * non-negative in range, so truncation = floor, expressed as
    * offset - (offset mod width) to stay in integer math (a double
    * division would lose exactness past 2^53).
    */
  private[search] def bucketCol(addon: Column, width: Long, lo: Long): Column = {
    val off = addon - lit(lo)
    lit(lo) + (off - pmod(off, lit(width)))
  }

  /** Compiled alt-layout fused-batch slot (ordered scans). mode 0 =
    * addon top-k, 1 = addon range, 2 = facet bucket partials (`c` carries
    * the bucket width).
    */
  private[search] final case class AltFusedSpec(
      qi: Int, mode: Int, cq: CompiledQuery, keys: Array[SearchKernel.KeySpec],
      c: Long, op: String, k: Int, lo: Long, hi: Long,
      floatUnits: Boolean = false)

  /** Compiled fused-batch slot (task-closure payload: no session refs).
    * mode 0 = match, 1 = cover top-k, 2 = BM25 WAND top-k, 3 = count
    * (per-shard partial), 4 = Order2 composite top-k (c/op = the addon
    * key).
    */
  private[search] final case class FusedSpec(
      qi: Int, mode: Int, cq: CompiledQuery, keys: Array[SearchKernel.KeySpec],
      terms: Array[String], dfs: Array[Long], ubs: Array[Double], k: Int,
      scoreCq: CompiledQuery = null, scoreMap: Array[Int] = null,
      method: Int = 0, c: Long = 0L, op: String = "")

  /** One ORDER BY key of a [[Searcher.topKMulti]] scan. */
  sealed trait OrderKey
  object OrderKey {
    /** rank distance `t <=> q` (cover-density, with optional CoverRank
      * normalization flags)
      */
    final case class Rank(method: Int = 0) extends OrderKey
    /** addon distance `addon <op> c`: op "both" = `<=>`, "left" = `<=|`,
      * "right" = `|=>`
      */
    final case class Addon(c: Long, op: String = "both") extends OrderKey
  }

  /** Default plan-cache capacity: the cache is access-ordered LRU, so past
    * this many distinct query shapes the least-recently-used plan is
    * evicted -- a shape-churning prepared workload keeps its hot set instead
    * of degrading to permanent re-planning.
    */
  val MaxCachedPlans = 4096

  /** Collision-safe cache key for one msearch spec: a variant tag + the
    * structured constructor fields joined on \u0001, terminated by \u0002.
    * (Keying on case-class toString would render Bm25(Seq("a, b"), k) and
    * Bm25(Seq("a", "b"), k) identically -- two different batches could then
    * share a cache slot and return the wrong cached plan.)
    */
  private[search] def specKey(sp: MsearchSpec): String = {
    import MsearchSpec._
    (sp match {
      case Match(q) => key("M", q)
      case Bm25(ts, k) => key("B" +: k.toString +: ts: _*)
      case Cover(q, k, m) => key("C", q, k.toString, m.toString)
      case Order2(q, c, op, k, m) =>
        key("O2", q, c.toString, op, k.toString, m.toString)
      case Count(q) => key("K", q)
      case CountFields(fq) => key("KF" +: fq.flatMap(p => Seq(p._1, p._2)): _*)
      case MatchFields(fq) => key("MF" +: fq.flatMap(p => Seq(p._1, p._2)): _*)
      case CoverFields(rf, rq, fl, k) =>
        key(Seq("CF", rf, rq, k.toString) ++ fl.flatMap(p => Seq(p._1, p._2)): _*)
      case Bm25Fields(f, ts, k) => key(Seq("BF", f, k.toString) ++ ts: _*)
      case Addon(q, c, op, k) => key("A", q, c.toString, op, k.toString)
      case AddonRange(q, lo, hi) => key("R", q, lo.toString, hi.toString)
      case AddonFields(fq, c, op, k) =>
        key(Seq("AF", c.toString, op, k.toString) ++ fq.flatMap(p => Seq(p._1, p._2)): _*)
      case AddonRangeFields(fq, lo, hi) =>
        key(Seq("RF", lo.toString, hi.toString) ++ fq.flatMap(p => Seq(p._1, p._2)): _*)
      // doubles keyed by raw bits: distinguishes -0.0/0.0 and every NaN
      // payload the caller could pass (toString would collapse them)
      case AddonFloat(q, c, op, k) =>
        key("AD", q, java.lang.Double.doubleToRawLongBits(c).toString, op,
          k.toString)
      case AddonRangeFloat(q, lo, hi) =>
        key("RD", q, java.lang.Double.doubleToRawLongBits(lo).toString,
          java.lang.Double.doubleToRawLongBits(hi).toString)
      case Facet(q, w, lo, hi) =>
        key("FA", q, w.toString, lo.toString, hi.toString)
      case FacetFields(fq, w, lo, hi) =>
        key(Seq("FAF", w.toString, lo.toString, hi.toString) ++
          fq.flatMap(p => Seq(p._1, p._2)): _*)
      case FacetFloat(q, w, lo, hi) =>
        key("FAD", q, java.lang.Double.doubleToRawLongBits(w).toString,
          java.lang.Double.doubleToRawLongBits(lo).toString,
          java.lang.Double.doubleToRawLongBits(hi).toString)
      case MatchEmpty(f) => key("ME", f.getOrElse(""))
      case CountEmpty(f) => key("KE", f.getOrElse(""))
    }) + "\u0002"
  }

  /** Collision-free cache key: args joined on \u0001 (cannot appear in
    * tsquery strings, terms, or rendered numbers).
    */
  private def key(parts: String*): String = parts.mkString("\u0001", "\u0001", "")
}
