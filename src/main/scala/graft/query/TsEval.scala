package graft.query

/** Compiled form of a [[TsQuery]]: every lexeme occurrence becomes an
  * operand slot, and operands with the same (term, prefix) share a distinct
  * *key* index — the unit fetched from the index. This mirrors RUM's
  * extractQuery → map_item_operand wiring (reference:
  * src/rum_ts_utils.c:654-734: operands dedup into entries, extra_data maps
  * query items back to entry numbers).
  */
final class CompiledQuery private (
    val source: TsQuery,
    val root: CompiledQuery.CNode,
    val ops: Array[TsQuery.Lexeme],
    /** operand index → distinct key index */
    val opKey: Array[Int],
    /** distinct keys, in first-appearance order */
    val keys: Array[TsQuery.Lexeme]) extends Serializable {
  def numKeys: Int = keys.length
}

object CompiledQuery {
  sealed trait CNode
  /** the empty tsquery: matches nothing (RUM isVoidRes, src/rumscan.c:365-458) */
  case object CEmpty extends CNode
  final case class CLeaf(opIdx: Int, keyIdx: Int, weightMask: Int, prefix: Boolean) extends CNode
  final case class CAnd(l: CNode, r: CNode) extends CNode
  final case class COr(l: CNode, r: CNode) extends CNode
  final case class CNot(x: CNode) extends CNode
  final case class CPhrase(dist: Int, l: CNode, r: CNode) extends CNode

  def compile(q: TsQuery): CompiledQuery = {
    import TsQuery._
    val ops = scala.collection.mutable.ArrayBuffer.empty[Lexeme]
    val keys = scala.collection.mutable.ArrayBuffer.empty[Lexeme]
    val keyIdxOf = scala.collection.mutable.LinkedHashMap.empty[(String, Boolean), Int]
    val opKey = scala.collection.mutable.ArrayBuffer.empty[Int]
    def go(n: TsQuery): CNode = n match {
      case Empty => CEmpty
      case l @ Lexeme(t, p, w) =>
        val opIdx = ops.length
        ops += l
        val kIdx = keyIdxOf.getOrElseUpdate((t, p), { keys += l; keys.length - 1 })
        opKey += kIdx
        CLeaf(opIdx, kIdx, w, p)
      case And(a, b) => CAnd(go(a), go(b))
      case Or(a, b) => COr(go(a), go(b))
      case Not(x) => CNot(go(x))
      case Phrase(d, a, b) => CPhrase(d, go(a), go(b))
    }
    val root = go(q)
    new CompiledQuery(q, root, ops.toArray, opKey.toArray, keys.toArray)
  }
}

/** TS_execute-equivalent evaluator (reference: rum_tsquery_consistent,
  * src/rum_ts_utils.c:199-301, which runs PostgreSQL's TS_execute with
  * positions decoded from addInfo so phrase operators are exact).
  *
  * The provider answers per *key* index:
  *   - `positions(k)`: sorted positions of key k in the doc, or null if
  *     absent; parallel `wclasses(k)` gives the 2-bit weight class per pos.
  *
  * Flags: `calcNot=false` reproduces TS_EXEC_EMPTY (NOT assumed true —
  * used by the rank Cover forward pass); `noPos=true` reproduces
  * TS_EXEC_PHRASE_NO_POS (phrase degraded to AND — RUM's addon-consistent
  * path, src/rum_ts_utils.c:303-346).
  */
object TsEval {
  import CompiledQuery._

  trait Provider {
    def positions(keyIdx: Int): Array[Int] // null = key absent
    def wclasses(keyIdx: Int): Array[Byte] // aligned with positions
  }

  /** Positive result: node matches exactly at `pos`.
    * Negated result: node matches everywhere EXCEPT `pos`.
    * None: node matches nowhere (non-negated no-match).
    */
  private final case class PhrasePos(pos: Array[Int], negate: Boolean)

  def matches(cq: CompiledQuery, p: Provider,
              calcNot: Boolean = true, noPos: Boolean = false): Boolean =
    evalBool(cq.root, p, calcNot, noPos)

  private def leafPositions(l: CLeaf, p: Provider): Array[Int] = {
    val pos = p.positions(l.keyIdx)
    if (pos == null) null
    else if (l.weightMask == 0) pos
    else {
      val w = p.wclasses(l.keyIdx)
      val out = new scala.collection.mutable.ArrayBuffer[Int](pos.length)
      var i = 0
      while (i < pos.length) {
        if ((l.weightMask & (1 << (w(i) & 0x3))) != 0) out += pos(i)
        i += 1
      }
      if (out.isEmpty) null else out.toArray
    }
  }

  private def leafExists(l: CLeaf, p: Provider): Boolean = {
    if (l.weightMask == 0) p.positions(l.keyIdx) != null
    else leafPositions(l, p) != null
  }

  private def evalBool(n: CNode, p: Provider, calcNot: Boolean, noPos: Boolean): Boolean = n match {
    case CEmpty => false
    case l: CLeaf => leafExists(l, p)
    case CAnd(a, b) => evalBool(a, p, calcNot, noPos) && evalBool(b, p, calcNot, noPos)
    case COr(a, b) => evalBool(a, p, calcNot, noPos) || evalBool(b, p, calcNot, noPos)
    case CNot(x) => if (calcNot) !evalBool(x, p, calcNot, noPos) else true
    case ph: CPhrase =>
      if (noPos) phraseAsAnd(ph, p, calcNot, noPos)
      else evalPhrase(ph, p, calcNot) match {
        case None => false
        case Some(PhrasePos(pos, false)) => pos.nonEmpty
        case Some(PhrasePos(_, true)) => true
      }
  }

  private def phraseAsAnd(n: CNode, p: Provider, calcNot: Boolean, noPos: Boolean): Boolean = n match {
    case CPhrase(_, a, b) => phraseAsAnd(a, p, calcNot, noPos) && phraseAsAnd(b, p, calcNot, noPos)
    case other => evalBool(other, p, calcNot, noPos)
  }

  private def evalPhrase(n: CNode, p: Provider, calcNot: Boolean): Option[PhrasePos] = n match {
    case CEmpty => None
    case l: CLeaf =>
      val pos = leafPositions(l, p)
      if (pos == null) None else Some(PhrasePos(pos, negate = false))
    case CNot(x) =>
      if (!calcNot) Some(PhrasePos(Array.emptyIntArray, negate = true))
      else evalPhrase(x, p, calcNot) match {
        case None => Some(PhrasePos(Array.emptyIntArray, negate = true))
        case Some(PhrasePos(pos, neg)) =>
          if (pos.isEmpty && neg) None // matched everywhere → negation matches nowhere
          else Some(PhrasePos(pos, !neg))
      }
    case COr(a, b) => combine(evalPhrase(a, p, calcNot), evalPhrase(b, p, calcNot), or = true)
    case CAnd(a, b) => combine(evalPhrase(a, p, calcNot), evalPhrase(b, p, calcNot), or = false)
    case CPhrase(dist, a, b) =>
      (evalPhrase(a, p, calcNot), evalPhrase(b, p, calcNot)) match {
        case (None, _) | (_, None) => None
        case (Some(la), Some(rb)) =>
          val out =
            if (!rb.negate) {
              // candidate positions from the right operand
              rb.pos.filter { q =>
                val need = q - dist
                if (need < 1) la.negate // left "absent there" iff negated
                else if (la.negate) !contains(la.pos, need)
                else contains(la.pos, need)
              }
            } else if (!la.negate) {
              // right negated: generate from left matches shifted by dist
              la.pos.map(_ + dist).filter(q => !contains(rb.pos, q))
            } else {
              // both negated: approximate as match-everywhere (rare; PG
              // also degrades here)
              return Some(PhrasePos(Array.emptyIntArray, negate = true))
            }
          if (out.isEmpty) None else Some(PhrasePos(out, negate = false))
      }
  }

  private def contains(sorted: Array[Int], v: Int): Boolean =
    java.util.Arrays.binarySearch(sorted, v) >= 0

  private def combine(a: Option[PhrasePos], b: Option[PhrasePos], or: Boolean): Option[PhrasePos] =
    (a, b) match {
      case (None, None) => None
      case (None, x) => if (or) x else None
      case (x, None) => if (or) x else None
      case (Some(pa), Some(pb)) =>
        (pa.negate, pb.negate) match {
          case (false, false) =>
            val s = if (or) (pa.pos.toSet ++ pb.pos.toSet) else pa.pos.toSet.intersect(pb.pos.toSet)
            if (s.isEmpty) { if (or) None else None } else Some(PhrasePos(s.toArray.sorted, negate = false))
          case (true, false) =>
            if (or) Some(PhrasePos(pa.pos.filterNot(pb.pos.toSet), negate = true))
            else Some(PhrasePos(pb.pos.filterNot(pa.pos.toSet), negate = false))
          case (false, true) =>
            if (or) Some(PhrasePos(pb.pos.filterNot(pa.pos.toSet), negate = true))
            else Some(PhrasePos(pa.pos.filterNot(pb.pos.toSet), negate = false))
          case (true, true) =>
            if (or) Some(PhrasePos(pa.pos.toSet.intersect(pb.pos.toSet).toArray.sorted, negate = true))
            else Some(PhrasePos((pa.pos.toSet ++ pb.pos.toSet).toArray.sorted, negate = true))
        }
    }
}
