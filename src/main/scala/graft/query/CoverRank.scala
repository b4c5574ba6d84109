package graft.query

/** RUM's cover-density ranking kernel, re-expressed as a pure function.
  *
  * Semantics ported from the reference (NOT the code — reimplemented):
  *   - cover search: src/rum_ts_utils.c:855-964 `Cover` — accumulate operand
  *     occurrences forward until the query first satisfies (NOT assumed
  *     true), that occurrence's position is the cover's upper bound q; then
  *     re-accumulate backward from there until the query satisfies with
  *     NOT calculated, giving lower bound p.
  *   - scoring: src/rum_ts_utils.c:1209-1328 `calc_score_docr` —
  *     per cover: Cpos = (#occ / Σ invWeight) · #distinctKeysInCover;
  *     noise = (q-p) - (#occ-1) (halved cover length if negative);
  *     covers with identical operand composition share a slot whose ℓ-th
  *     occurrence contributes Cpos/(1+noise)/ℓ²/ζ(2), ζ(2)≈1.64493406685.
  *   - distance = 1/score as float4 (∞ when score 0), matching
  *     rum_ts_distance / the <=> operator (src/rum_ts_utils.c:1409-1520).
  *
  * Expected anchors (reference expected/rum.out:122-152): single-term doc
  * distance 16.4493; adjacent two-term cover 8.22467; 'go..way' spread
  * cover 57.5727.
  */
object CoverRank {

  /** Inverse weight per 2-bit class {D,C,B,A} = {10, 5, 2.5, 1}
    * (reference: src/rum_ts_utils.c:128 `weights[]`).
    */
  private val InvWeights: Array[Double] = Array(10.0, 5.0, 2.5, 1.0)
  private val Zeta2 = 1.64493406685

  /** Normalization method flags (reference src/rum_ts_utils.c:137-142;
    * applied EXTDIST→RDIVRPLUS1 inside the cover loop's epilogue, then
    * LOGLENGTH→LENGTH→UNIQ→LOGUNIQ outside, src/rum_ts_utils.c:1317-1320,
    * 1383-1399). UNIQ/LOGUNIQ need the doc's distinct-lexeme count, which
    * callers must supply (the index stores token counts, not distinct
    * counts — index-side rank paths reject those flags).
    */
  val NormLogLength = 0x01
  val NormLength = 0x02
  val NormExtDist = 0x04
  val NormUniq = 0x08
  val NormLogUniq = 0x10
  val NormRDivRPlus1 = 0x20

  /** One occurrence of a query key in the doc. */
  private final case class Occ(pos: Int, wclass: Int, keyIdx: Int)

  /** Score a doc given, per distinct query key, its sorted positions (+
    * weight classes) in the doc, or null when absent — exactly the data RUM
    * reads out of posting addInfo (get_docrep_addinfo,
    * src/rum_ts_utils.c:966-1036; repeated query operands visited once).
    */
  def score(cq: CompiledQuery,
            keyPositions: Array[Array[Int]],
            keyWclasses: Array[Array[Byte]],
            method: Int = 0, docLen: Int = 0, nUniq: Int = 0): Double = {
    // ---- build the doc representation: merged occurrence list by pos ----
    var total = 0
    var k = 0
    while (k < cq.numKeys) {
      if (keyPositions(k) != null) total += keyPositions(k).length
      k += 1
    }
    if (total == 0) return 0.0
    val occ = new Array[Occ](total)
    var c = 0
    k = 0
    while (k < cq.numKeys) {
      val ps = keyPositions(k)
      if (ps != null) {
        val ws = if (keyWclasses(k) != null) keyWclasses(k) else null
        var j = 0
        while (j < ps.length) {
          occ(c) = Occ(ps(j), if (ws != null) ws(j) & 0x3 else 0, k)
          c += 1
          j += 1
        }
      }
      k += 1
    }
    val doc = occ.sortBy(_.pos)
    val n = doc.length

    // ---- operand state shared with the evaluator (single pos per key) ----
    val statePos = new Array[Int](cq.numKeys)
    val stateW = new Array[Byte](cq.numKeys)
    val stateExist = new Array[Boolean](cq.numKeys)
    val provider = new TsEval.Provider {
      def positions(keyIdx: Int): Array[Int] =
        if (stateExist(keyIdx)) Array(statePos(keyIdx)) else null
      def wclasses(keyIdx: Int): Array[Byte] = Array(stateW(keyIdx))
    }
    def clearState(): Unit = java.util.Arrays.fill(stateExist, false)
    def setState(o: Occ): Unit = {
      stateExist(o.keyIdx) = true
      statePos(o.keyIdx) = o.pos
      stateW(o.keyIdx) = o.wclass.toByte
    }

    // ---- cover iteration + scoring ----
    // Slot identity = the exact sequence of operand indexes in the cover.
    // The reference hashes this sequence lossily ("quick and dirty hash
    // key", src/rum_ts_utils.c:1241-1248) and linear-scans slots; we keep
    // the same semantic intent (same operand sequence -> same slot) but
    // collision-free and O(1) via a HashMap keyed on the sequence itself.
    val coverSlots = scala.collection.mutable.HashMap.empty[Vector[Int], Int]
    val coverLens = scala.collection.mutable.ArrayBuffer.empty[Int]
    val coverRanks = scala.collection.mutable.ArrayBuffer.empty[Double]
    // extent-distance accumulators (calc_score_docr, rum_ts_utils.c:1300-1310)
    var nExtent = 0
    var sumDist = 0.0
    var prevExtPos = 0.0

    var extPos = 0
    var running = true
    while (running) {
      // -- Cover() --
      var beginIdx = -1
      var endIdx = -1
      var p = Int.MaxValue
      var q = 0
      var emitted = false
      var searching = true
      while (searching) {
        if (extPos >= n) { running = false; searching = false }
        else {
          // forward pass, NOT assumed true (TS_EXEC_EMPTY)
          clearState()
          var idx = extPos
          var lastIdx = -1
          q = 0
          var found = false
          while (idx < n && !found) {
            setState(doc(idx))
            if (TsEval.matches(cq, provider, calcNot = false)) {
              if (doc(idx).pos > q) { q = doc(idx).pos; endIdx = idx; lastIdx = idx; found = true }
            }
            if (!found) idx += 1
          }
          if (!found) { running = false; searching = false }
          else {
            // backward pass, NOT calculated
            clearState()
            p = Int.MaxValue
            beginIdx = -1
            var j = lastIdx
            var ok = false
            while (j >= extPos && !ok) {
              setState(doc(j))
              if (TsEval.matches(cq, provider, calcNot = true)) {
                if (doc(j).pos < p) { beginIdx = j; p = doc(j).pos }
                ok = true
              } else j -= 1
            }
            if (p <= q) {
              extPos = beginIdx + 1
              emitted = true
              searching = false
            } else {
              extPos += 1 // restart
            }
          }
        }
      }

      if (emitted) {
        // -- per-cover scoring (calc_score_docr loop body) --
        var invSum = 0.0
        val keySeq = Vector.newBuilder[Int]
        var i = beginIdx
        while (i <= endIdx) {
          invSum += InvWeights(doc(i).wclass)
          keySeq += doc(i).keyIdx
          i += 1
        }
        val key = keySeq.result()
        // distinct keys present in cover = operand state from backward pass,
        // which covered [beginIdx..endIdx]
        val inCover = new Array[Boolean](cq.numKeys)
        i = beginIdx
        while (i <= endIdx) { inCover(doc(i).keyIdx) = true; i += 1 }
        var nitems = 0
        var kk = 0
        while (kk < cq.numKeys) { if (inCover(kk)) nitems += 1; kk += 1 }

        var cpos = (endIdx - beginIdx + 1).toDouble / invSum
        if (nitems > 0) cpos *= nitems
        var nNoise = (q - p) - (endIdx - beginIdx)
        if (nNoise < 0) nNoise = (endIdx - beginIdx) / 2

        val slot = coverSlots.getOrElseUpdate(key, {
          coverLens += 0; coverRanks += 0.0
          coverLens.length - 1
        })
        coverLens(slot) += 1
        val l = coverLens(slot).toDouble
        coverRanks(slot) += cpos / (1 + nNoise) / (l * l) / Zeta2

        val curExtPos = (q + p).toDouble / 2.0
        if (nExtent > 0 && curExtPos > prevExtPos)
          sumDist += 1.0 / (curExtPos - prevExtPos)
        prevExtPos = curExtPos
        nExtent += 1
      }
    }

    var wdoc = coverRanks.sum
    if ((method & NormExtDist) != 0 && nExtent > 0 && sumDist > 0)
      wdoc /= nExtent.toDouble / sumDist
    if ((method & NormRDivRPlus1) != 0)
      wdoc /= wdoc + 1
    if ((method & NormLogLength) != 0 && docLen > 0)
      wdoc /= math.log(docLen + 1.0)
    if ((method & NormLength) != 0 && docLen > 0)
      wdoc /= docLen.toDouble
    if ((method & NormUniq) != 0 && nUniq > 0)
      wdoc /= nUniq.toDouble
    if ((method & NormLogUniq) != 0 && nUniq > 0)
      wdoc /= math.log(nUniq + 1.0) / math.log(2.0)
    wdoc
  }

  /** distance = 1/score with float4 rounding parity (∞ at score 0). */
  def distance(cq: CompiledQuery,
               keyPositions: Array[Array[Int]],
               keyWclasses: Array[Array[Byte]],
               method: Int = 0, docLen: Int = 0, nUniq: Int = 0): Float = {
    val s = score(cq, keyPositions, keyWclasses, method, docLen, nUniq).toFloat
    if (s == 0.0f) Float.PositiveInfinity else 1.0f / s
  }
}
