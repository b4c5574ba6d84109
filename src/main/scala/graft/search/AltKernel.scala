package graft.search

import scala.collection.mutable

import graft.build.PostingRow
import graft.core.{PostingBlock, PostingBlocks, PostingListBuilder}
import graft.query.{CompiledQuery, TsEval}

/** Alternative-order scan kernel — RUM's order_by_attach layout where each
  * posting list is ordered by (addInfo, docId) instead of docId
  * (reference: src/rumdatapage.c:327-360 compareRumItem on addInfo first;
  * scan direction handling src/rumscan.c:461-554; ordered gettuple
  * src/rumget.c:2303-2327), so `WHERE t @@ q ORDER BY d <=> c LIMIT k`
  * streams matches outward from c and stops after k consistency checks —
  * cost tracks k, not the match count.
  *
  * Block reinterpretation (see [[graft.core.PostingListBuilder]] allowTies):
  * the key slot holds the addon (ascending, ties = equal addons, docId
  * ascending within a tie run), the addon slot holds the docId.
  * Addons may be ANY signed long (negative scalars, epoch-spanning
  * timestamps — reference sql/int4.sql:7-19 orders (-2..3) by `<=> 0`):
  * the key-slot codec delta-encodes the SIGNED ascending sequence with
  * wrap-safe gaps ([[graft.core.VarByte.encodeDeltas]]) and every
  * comparison in this kernel is signed. Distances saturate at
  * Long.MaxValue ([[satSub]]); the non-alt fallback applies the same cap
  * so both paths tie-break identically beyond the representable range.
  */
object AltKernel extends Serializable {

  /** Direction-agnostic cursor over one key's merged alt-order blocks. */
  private final class AltCur(blocks: Array[PostingBlock], forward: Boolean) {
    private var bi = if (forward) 0 else blocks.length - 1
    private var dec: PostingBlocks.Decoded = _
    private var i = 0
    var done: Boolean = blocks.isEmpty
    if (!done) { load(); i = if (forward) 0 else dec.n - 1 }

    private def load(): Unit = dec = PostingBlocks.decode(blocks(bi))

    def key: Long = dec.keys(i)  // addon
    def sub: Long = dec.subs(i)  // docId
    def positions: (Array[Int], Array[Byte]) = dec.positionsAt(i)

    def step(): Unit = {
      if (forward) {
        i += 1
        if (i >= dec.n) {
          bi += 1
          if (bi >= blocks.length) done = true else { load(); i = 0 }
        }
      } else {
        i -= 1
        if (i < 0) {
          bi -= 1
          if (bi < 0) done = true else { load(); i = dec.n - 1 }
        }
      }
    }

    /** current composite strictly precedes (k, s) in scan direction */
    def before(k: Long, s: Long): Boolean =
      if (forward) key < k || (key == k && sub < s)
      else key > k || (key == k && sub > s)

    def at(k: Long, s: Long): Boolean = !done && key == k && sub == s

    /** advance in scan direction to the first composite >= (k,s)
      * [forward] / <= (k,s) [backward]; whole blocks skipped via headers.
      */
    def stepToward(k: Long, s: Long): Unit = {
      if (done || !before(k, s)) return
      if (forward) {
        if (blocks(bi).lastDoc < k) {
          while (!done && blocks(bi).lastDoc < k) {
            bi += 1
            if (bi >= blocks.length) done = true
          }
          if (done) return
          load(); i = 0
        }
        if (dec.keys(i) < k) {
          var lo = i
          var hi = dec.n - 1
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (dec.keys(mid) < k) lo = mid + 1 else hi = mid
          }
          i = lo
        }
        while (!done && before(k, s)) step()
      } else {
        if (blocks(bi).firstDoc > k) {
          while (bi >= 0 && blocks(bi).firstDoc > k) bi -= 1
          if (bi < 0) { done = true; return }
          load(); i = dec.n - 1
        }
        if (dec.keys(i) > k) {
          var lo = 0
          var hi = i
          while (lo < hi) {
            val mid = (lo + hi + 1) >>> 1
            if (dec.keys(mid) > k) hi = mid - 1 else lo = mid
          }
          i = lo
        }
        while (!done && before(k, s)) step()
      }
    }
  }

  /** Shard-local alt-layout cell table: rows grouped by term ONCE, with
    * each query key's merged/unioned block array memoized — a fused batch
    * of ordered-scan specs shares one instance per shard, so a term or
    * prefix expansion appearing in several specs is merged once (the alt
    * twin of [[SearchKernel.ShardView]]). Cell arrays are immutable; the
    * direction-stateful cursors are built fresh per spec. Not thread-safe
    * (one task owns its shard).
    *
    * Micro-segment runs from incremental appends overlap in addon range;
    * they are merge-sorted and repacked once per (query key, shard) — the
    * query-time analogue of the primary path's UnionCursor.
    */
  final class ShardCells(rows: Iterator[PostingRow]) {
    private val byTerm = mutable.HashMap.empty[String, mutable.ArrayBuffer[PostingRow]]
    rows.foreach(r => byTerm.getOrElseUpdate(r.term, mutable.ArrayBuffer.empty) += r)
    private val cellCache = mutable.HashMap.empty[(String, Boolean), Array[PostingBlock]]

    def cellFor(k: SearchKernel.KeySpec): Array[PostingBlock] =
      cellCache.getOrElseUpdate((k.term, k.prefix), {
        if (!k.prefix)
          byTerm.get(k.term).map(merged).getOrElse(Array.empty[PostingBlock])
        else {
          val rs = byTerm.keysIterator.filter(_.startsWith(k.term))
            .flatMap(byTerm(_)).toSeq
          if (rs.isEmpty) Array.empty[PostingBlock] else mergedUnion(rs)
        }
      })

    /** Group chunk rows into maximal strictly-ascending runs in
      * (firstDoc, chunk) order — each run is an internally (addon, docId)-
      * sorted stream; overlapping micro-segments land in separate runs.
      * Run index order = arrival order, which keep-first dedup relies on.
      */
    private def runsOf(rs: Seq[PostingRow]): Array[Array[PostingRow]] = {
      val sorted = rs.sortBy(r => (r.blocks.head.firstDoc, r.chunk))
      val runs = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[PostingRow]]
      sorted.foreach { r =>
        if (runs.nonEmpty &&
            r.blocks.head.firstDoc > runs.last.last.blocks.last.lastDoc)
          runs.last += r
        else runs += mutable.ArrayBuffer(r)
      }
      runs.map(_.toArray).toArray
    }

    private def merged(rs: mutable.ArrayBuffer[PostingRow]): Array[PostingBlock] = {
      val runs = runsOf(rs.toSeq)
      // single ascending run (the compacted/bulk-built layout): concatenate
      if (runs.length == 1) return runs(0).flatMap(_.blocks)
      // overlapping runs → STREAMING k-way merge of run cursors into the
      // repack builder: O(runs) decoded blocks live at a time instead of
      // every posting of every run materialized and sorted (a skewed hot
      // term between compactions would otherwise hold millions of decoded
      // tuples on one task). Ties keep the LOWEST run index — run order is
      // (firstDoc, chunk) arrival order, reproducing the old stable-sort
      // keep-first dedup.
      val cursors = runs.map(new RunCur(_))
      val builder = new PostingListBuilder(allowTies = true)
      var hasLast = false
      var lastK = Long.MinValue
      var lastS = Long.MinValue
      var live = cursors.count(!_.done)
      while (live > 0) {
        var best = -1
        var i = 0
        while (i < cursors.length) {
          val c = cursors(i)
          if (!c.done && (best < 0 || c.key < cursors(best).key ||
              (c.key == cursors(best).key && c.sub < cursors(best).sub)))
            best = i
          i += 1
        }
        val c = cursors(best)
        if (!(hasLast && c.key == lastK && c.sub == lastS)) {
          builder.add(c.key, c.tf, c.len, c.rawPos, c.sub)
          hasLast = true; lastK = c.key; lastS = c.sub
        }
        c.step()
        if (c.done) live -= 1
      }
      builder.result()
    }

    /** Prefix expansion: union ALL matching terms' entries; equal
      * (addon, docId) composites merge their payloads — tf sums, position
      * lists interleave — exactly the primary path's UnionCursor semantics
      * (rum_ts_join_pos, src/rum_ts_utils.c:1564-1645). Streaming k-way
      * merge over per-(term, run) cursors ordered by (term, run): at a tie
      * composite the first cursor of each term wins (keep-first per term —
      * overlapping micro-segments re-ship the same entry and must not
      * inflate tf), and terms contribute in ascending-term order exactly
      * like the old (key, sub, term) sort.
      */
    private def mergedUnion(rs: Seq[PostingRow]): Array[PostingBlock] = {
      val byT = rs.groupBy(_.term).toSeq.sortBy(_._1)
      val cursors = mutable.ArrayBuffer.empty[RunCur]
      val termIdx = mutable.ArrayBuffer.empty[Int]
      byT.zipWithIndex.foreach { case ((_, rows), ti) =>
        runsOf(rows).foreach { run =>
          cursors += new RunCur(run)
          termIdx += ti
        }
      }
      val builder = new PostingListBuilder(allowTies = true)
      val at = mutable.ArrayBuffer.empty[Int]
      var live = cursors.count(!_.done)
      while (live > 0) {
        var k = 0L
        var s = 0L
        var first = true
        var i = 0
        while (i < cursors.length) {
          val c = cursors(i)
          if (!c.done && (first || c.key < k || (c.key == k && c.sub < s))) {
            k = c.key; s = c.sub; first = false
          }
          i += 1
        }
        at.clear()
        i = 0
        while (i < cursors.length) {
          if (!cursors(i).done && cursors(i).key == k && cursors(i).sub == s)
            at += i
          i += 1
        }
        if (at.length == 1) {
          val c = cursors(at(0))
          builder.add(k, c.tf, c.len, c.rawPos, s)
        } else {
          // union the tie composite: sum tf over DISTINCT terms (first run
          // of each term wins), merge their (pos, wclass) streams
          var tf = 0
          var len = 0
          var haveLen = false
          val mergedPos = mutable.ArrayBuffer.empty[(Int, Byte)]
          var lastTi = -1
          at.foreach { ci =>
            val ti = termIdx(ci)
            if (ti != lastTi) {
              lastTi = ti
              val c = cursors(ci)
              if (!haveLen) { len = c.len; haveLen = true }
              tf += c.tf
              val (ps, ws) = graft.core.PositionCodec.decode(c.rawPos)
              var x = 0
              while (x < ps.length) { mergedPos += ((ps(x), ws(x))); x += 1 }
            }
          }
          val byPos = mergedPos.sortBy(_._1)
          // dedup equal positions (same term re-inserted across runs)
          val dp = mutable.ArrayBuffer.empty[(Int, Byte)]
          byPos.foreach { pw => if (dp.isEmpty || dp.last._1 != pw._1) dp += pw }
          builder.add(k, tf, len,
            graft.core.PositionCodec.encode(dp.map(_._1).toArray, dp.map(_._2).toArray),
            s)
        }
        at.foreach { ci =>
          val c = cursors(ci)
          c.step()
          if (c.done) live -= 1
        }
      }
      builder.result()
    }

  }

  /** Forward-only streaming cursor over one ascending run's chunk rows —
    * decodes ONE block at a time (the bounded-memory unit of the ShardCells
    * repack merge).
    */
  private final class RunCur(rows: Array[PostingRow]) {
    private val blocks: Array[PostingBlock] = rows.flatMap(_.blocks)
    private var bi = 0
    private var dec: PostingBlocks.Decoded = _
    private var i = 0
    var done: Boolean = blocks.isEmpty
    if (!done) load()
    private def load(): Unit = { dec = PostingBlocks.decode(blocks(bi)); i = 0 }
    def key: Long = dec.keys(i)
    def sub: Long = dec.subs(i)
    def tf: Int = dec.tfs(i)
    def len: Int = dec.lens(i)
    def rawPos: Array[Byte] = dec.rawPositionsAt(i)
    def step(): Unit = {
      i += 1
      if (i >= dec.n) {
        bi += 1
        if (bi >= blocks.length) done = true else load()
      }
    }
  }

  private def buildCells(keys: Array[SearchKernel.KeySpec],
                         cells: ShardCells): Array[Array[PostingBlock]] =
    keys.map(cells.cellFor)

  /** Provider over one candidate composite; non-required cursors advance
    * monotonically in scan direction (candidates are monotone too).
    */
  private final class AltProvider(cursors: Array[AltCur]) extends TsEval.Provider {
    private val cachePos = new Array[Array[Int]](cursors.length)
    private val cacheW = new Array[Array[Byte]](cursors.length)
    private val cached = new Array[Boolean](cursors.length)
    private var a = -1L
    private var d = -1L
    def reset(addon: Long, docId: Long): Unit = {
      a = addon; d = docId
      java.util.Arrays.fill(cached, false)
    }
    private def load(k: Int): Unit = {
      if (!cached(k)) {
        val c = cursors(k)
        c.stepToward(a, d)
        if (c.at(a, d)) {
          val (p, w) = c.positions
          if (p.length == 0) { cachePos(k) = Array(1); cacheW(k) = Array(0.toByte) }
          else { cachePos(k) = p; cacheW(k) = w }
        } else { cachePos(k) = null; cacheW(k) = null }
        cached(k) = true
      }
    }
    def positions(k: Int): Array[Int] = { load(k); cachePos(k) }
    def wclasses(k: Int): Array[Byte] = { load(k); cacheW(k) }
  }

  /** Candidate driver over the alt-order streams, in scan-direction
    * (addon, docId) composite order. Two strategies, chosen once per scan:
    *
    *  - conjunctive queries (`requiredKeys` non-empty): leapfrog seek-join
    *    of the required streams — candidates are their intersection;
    *  - disjunctive queries (no key required in every match): sorted UNION
    *    of all positive-polarity streams ([[SearchKernel.positiveKeys]] —
    *    complete because a match must contain one of them unless the query
    *    matches the empty doc, which the caller gates via `needsFullScan`).
    *    This is RUM's shape: the ordered gettuple merges every scan key's
    *    entry stream by addInfo and lets the consistent fn decide
    *    (src/rumget.c:1272-1369 entryGetItem merge, :2303-2327 ordered
    *    scan) — an `ORDER BY d <=> c` with an OR tsquery early-terminates
    *    exactly like the AND shape.
    *
    * Either way candidates arrive in scan order, so distance monotonicity
    * (what early termination needs) is preserved.
    */
  private final class Driver(drv: Array[AltCur], leapfrog: Boolean) {
    var key: Long = 0L
    var sub: Long = 0L

    /** position on the next candidate; false when exhausted */
    def advanceToCandidate(): Boolean = {
      if (leapfrog) {
        if (!nextAgreed(drv)) return false
        key = drv(0).key
        sub = drv(0).sub
        true
      } else {
        var best = -1
        var i = 0
        while (i < drv.length) {
          if (!drv(i).done &&
              (best < 0 || drv(i).before(drv(best).key, drv(best).sub)))
            best = i
          i += 1
        }
        if (best < 0) false
        else {
          key = drv(best).key
          sub = drv(best).sub
          true
        }
      }
    }

    /** step past the current candidate (all streams sitting on it) */
    def step(): Unit =
      if (leapfrog) drv(0).step()
      else {
        var i = 0
        while (i < drv.length) {
          if (drv(i).at(key, sub)) drv(i).step()
          i += 1
        }
      }
  }

  private def driveIdx(cq: CompiledQuery): (Array[Int], Boolean) = {
    val req = SearchKernel.requiredKeys(cq)
    if (req.nonEmpty) (req, true)
    else (SearchKernel.positiveKeys(cq), false)
  }

  /** Leapfrog the required cursors to their next agreed composite.
    * Returns false when any stream is exhausted.
    */
  private def nextAgreed(req: Array[AltCur]): Boolean = {
    var settled = false
    while (!settled) {
      var i = 0
      while (i < req.length) { if (req(i).done) return false; i += 1 }
      val k = req(0).key
      val s = req(0).sub
      settled = true
      i = 1
      while (i < req.length && settled) {
        val c = req(i)
        c.stepToward(k, s)
        if (c.done) return false
        if (!(c.key == k && c.sub == s)) {
          req(0).stepToward(c.key, c.sub)
          settled = false
        }
        i += 1
      }
    }
    true
  }

  /** Bounded best-k on (distance, docId) — smaller is better. Distances
    * are exact Longs (saturating subtraction): double arithmetic loses
    * sub-256 resolution past 2^53, which would misorder e.g. nanosecond-
    * timestamp addons near the k boundary.
    */
  private final class Heap(k: Int) {
    private val pq = mutable.PriorityQueue.empty[(Long, Long, Long)](
      Ordering.by { case (d, id, _) => (d, id) })
    def full: Boolean = pq.size >= k
    def worstDist: Long = if (pq.isEmpty) Long.MaxValue else pq.head._1
    def offer(dist: Long, docId: Long, addon: Long): Unit = {
      if (pq.size < k) pq.enqueue((dist, docId, addon))
      else {
        val (wd, wid, _) = pq.head
        if (dist < wd || (dist == wd && docId < wid)) {
          pq.dequeue(); pq.enqueue((dist, docId, addon))
        }
      }
    }
    def drain(): Array[(Long, Long, Long)] =
      pq.toArray.map { case (d, id, a) => (id, d, a) }
  }

  /** rows = (docId, distance, addon); distance is an exact Long. */
  final case class AltResult(rows: Array[(Long, Long, Long)], visited: Int)

  /** |a - b| that saturates at Long.MaxValue instead of overflowing (an
    * extreme constant c near Long.MinValue would otherwise wrap negative
    * and corrupt heap order / early termination).
    */
  private def satSub(a: Long, b: Long): Long =
    try Math.subtractExact(a, b)
    catch { case _: ArithmeticException => Long.MaxValue }

  /** Finite-only saturating addon distance for composite order keys (the
    * fused Order2 slot's second key): "both" = |a-c|, "left"/"right" the
    * one-sided operators. Returns -1 for a one-sided miss — the caller
    * excludes the row, matching the engine's finite-only contract
    * ([[topKAddonShard]] and the decimal fallback both drop such rows).
    * Saturates at Long.MaxValue like every distance in this kernel.
    */
  private[search] def satDist(a: Long, c: Long, op: String): Long = op match {
    case "both" => if (a >= c) satSub(a, c) else satSub(c, a)
    case "left" => if (a <= c) satSub(c, a) else -1L
    case "right" => if (a >= c) satSub(a, c) else -1L
    case other => throw new IllegalArgumentException(s"op: $other")
  }

  /** `WHERE t @@ q ORDER BY addon <op> c LIMIT k` from the alt-order
    * layout: ordered stream(s) from c with early termination once the
    * next candidate's distance can no longer improve the k best.
    * Only finite-distance matches are emitted. `visited` counts candidate
    * consistency checks — the early-termination evidence.
    */
  def topKAddonShard(cq: CompiledQuery, keys: Array[SearchKernel.KeySpec],
                     rows: Iterator[PostingRow], c: Long, op: String,
                     k: Int, floatUnits: Boolean = false): AltResult =
    topKAddonShard(cq, keys, new ShardCells(rows), c, op, k, floatUnits)

  /** [[topKAddonShard]] over a shared [[ShardCells]] (fused batches).
    *
    * `floatUnits = true` serves VALUE-space float distance over addons
    * encoded with [[graft.build.AddonUnits.floatOrderedBits]]: the
    * distance closure becomes `doubleToLongBits(|decode(a) - decode(c)|)`
    * — the bit image of a non-negative double is order-preserving, so the
    * heap, cross-side merge and early termination are untouched, and the
    * emitted long distance decodes back to the exact double via
    * `longBitsToDouble`. Per-side monotonicity (what early termination
    * needs) holds because bit order = value order on each side of c.
    * NaN addons map above +Inf in both key and distance space (sort last,
    * one equivalence class — the documented AddonUnits policy).
    */
  def topKAddonShard(cq: CompiledQuery, keys: Array[SearchKernel.KeySpec],
                     shardCells: ShardCells, c: Long, op: String,
                     k: Int, floatUnits: Boolean): AltResult = {
    val cells = buildCells(keys, shardCells)
    val (drvKeys, leapfrog) = driveIdx(cq)
    require(drvKeys.nonEmpty,
      "alt scan needs candidate-driving keys (caller gates via needsFullScan)")
    val heap = new Heap(k)
    var visited = 0

    def run(forward: Boolean, startKey: Long, startSub: Long,
            dist: Long => Long): Unit = {
      val cursors = cells.map(b => new AltCur(b, forward))
      val drv = drvKeys.map(cursors)
      val provider = new AltProvider(cursors)
      drv.foreach(_.stepToward(startKey, startSub))
      val driver = new Driver(drv, leapfrog)
      var going = true
      while (going && driver.advanceToCandidate()) {
        val a = driver.key
        val d = driver.sub
        val dd = dist(a)
        if (heap.full && dd > heap.worstDist) going = false
        else {
          visited += 1
          provider.reset(a, d)
          if (TsEval.matches(cq, provider)) heap.offer(dd, d, a)
          driver.step()
        }
      }
    }

    // exact saturating Long distances: overflow-safe AND bit-exact at any
    // magnitude (double would lose sub-256 resolution past 2^53); float
    // units swap in the double-distance bit image (same ordering algebra)
    val (distUp, distDown): (Long => Long, Long => Long) =
      if (floatUnits) {
        val cv = graft.build.AddonUnits.floatFromOrderedBits(c)
        val f = (a: Long) => java.lang.Double.doubleToLongBits(
          Math.abs(graft.build.AddonUnits.floatFromOrderedBits(a) - cv))
        (f, f)
      } else ((a: Long) => satSub(a, c), (a: Long) => satSub(c, a))
    op match {
      case "right" => run(forward = true, c, Long.MinValue, distUp)
      case "left" => run(forward = false, c, Long.MaxValue, distDown)
      case "both" =>
        run(forward = true, c, Long.MinValue, distUp)
        if (c != Long.MinValue)
          run(forward = false, c - 1, Long.MaxValue, distDown)
      case other => throw new IllegalArgumentException(s"op: $other")
    }
    AltResult(heap.drain(), visited)
  }

  /** match AND lo <= addon <= hi, streamed from lo and stopped at hi —
    * cost tracks the in-range match count, not the total match count.
    */
  def rangeAddonShard(cq: CompiledQuery, keys: Array[SearchKernel.KeySpec],
                      rows: Iterator[PostingRow], lo: Long,
                      hi: Long): Iterator[(Long, Long)] =
    rangeAddonShard(cq, keys, new ShardCells(rows), lo, hi)

  /** [[rangeAddonShard]] over a shared [[ShardCells]] (fused batches).
    * LAZY: in-range matches stream straight off the bounded ordered scan —
    * a wide range never materializes its per-shard match set on the task
    * heap (the facet collapse consumes this stream bucket by bucket).
    */
  def rangeAddonShard(cq: CompiledQuery, keys: Array[SearchKernel.KeySpec],
                      shardCells: ShardCells, lo: Long,
                      hi: Long): Iterator[(Long, Long)] = {
    val cells = buildCells(keys, shardCells)
    val (drvKeys, leapfrog) = driveIdx(cq)
    require(drvKeys.nonEmpty,
      "alt scan needs candidate-driving keys (caller gates via needsFullScan)")
    val cursors = cells.map(b => new AltCur(b, forward = true))
    val drv = drvKeys.map(cursors)
    val provider = new AltProvider(cursors)
    drv.foreach(_.stepToward(lo, Long.MinValue))
    val driver = new Driver(drv, leapfrog)
    new Iterator[(Long, Long)] {
      private var going = true
      private var nextRow: (Long, Long) = null
      private def fill(): Unit = {
        while (nextRow == null && going && driver.advanceToCandidate()) {
          val a = driver.key
          val d = driver.sub
          if (a > hi) going = false
          else {
            provider.reset(a, d)
            if (TsEval.matches(cq, provider)) nextRow = ((d, a))
            driver.step()
          }
        }
      }
      def hasNext: Boolean = { fill(); nextRow != null }
      def next(): (Long, Long) = { fill(); val r = nextRow; nextRow = null; r }
    }
  }

  /** Per-shard facet partials over the bounded ordered scan: bucket =
    * lo + floor((addon-lo)/width)·width for matches in [lo, hi]. The
    * candidate stream arrives in addon order, so each bucket's count
    * closes when the stream crosses its boundary — at most one output
    * row per (shard, non-empty bucket), no map needed. Exact Long math:
    * addon-lo ≥ 0 in range, so truncating division IS floor.
    */
  def facetShard(cq: CompiledQuery, keys: Array[SearchKernel.KeySpec],
                 rows: Iterator[PostingRow], width: Long, lo: Long,
                 hi: Long): Iterator[(Long, Long)] =
    facetShard(cq, keys, new ShardCells(rows), width, lo, hi)

  /** [[facetShard]] over a shared [[ShardCells]] (fused batches). */
  def facetShard(cq: CompiledQuery, keys: Array[SearchKernel.KeySpec],
                 shardCells: ShardCells, width: Long, lo: Long,
                 hi: Long): Iterator[(Long, Long)] = {
    val out = mutable.ArrayBuffer.empty[(Long, Long)]
    var curB = 0L
    var n = 0L
    rangeAddonShard(cq, keys, shardCells, lo, hi).foreach { case (_, a) =>
      val b = lo + (a - lo) / width * width
      if (n > 0 && b != curB) { out += ((curB, n)); n = 0L }
      curB = b
      n += 1
    }
    if (n > 0) out += ((curB, n))
    out.iterator
  }

  /** [[facetShard]] in float VALUE units over an ordered-bits layout:
    * buckets are lo + floor((v-lo)/width)·width in IEEE double arithmetic
    * (-0.0 starts normalize to +0.0); each emitted bucket is the start's
    * RAW IEEE bit image so the partial rows stay (Long, Long) like every
    * other fused row. Bit order = value order, so the stream still closes
    * each bucket at its boundary.
    */
  def facetShardFloat(cq: CompiledQuery, keys: Array[SearchKernel.KeySpec],
                      shardCells: ShardCells, width: Double, lo: Double,
                      loBits: Long, hiBits: Long): Iterator[(Long, Long)] = {
    val out = mutable.ArrayBuffer.empty[(Long, Long)]
    var curB = 0L
    var n = 0L
    rangeAddonShard(cq, keys, shardCells, loBits, hiBits).foreach {
      case (_, bits) =>
        val v = graft.build.AddonUnits.floatFromOrderedBits(bits)
        val b = java.lang.Double.doubleToRawLongBits(
          lo + math.floor((v - lo) / width) * width + 0.0)
        if (n > 0 && b != curB) { out += ((curB, n)); n = 0L }
        curB = b
        n += 1
    }
    if (n > 0) out += ((curB, n))
    out.iterator
  }
}
