package graft.query

/** tsquery-style boolean/phrase query tree.
  *
  * Mirrors the query surface RUM indexes answer (reference:
  * src/rum_ts_utils.c:654-787 rum_extract_tsquery — operand lexemes with
  * prefix flags; phrase ops `<->`/`<N>` evaluated from indexed positions in
  * src/rum_ts_utils.c:199-301 rum_tsquery_consistent). Weight masks follow
  * tsvector classes: bit (1<<c) set means class c ∈ {0=D,1=C,2=B,3=A}
  * is acceptable; mask 0 = any.
  */
sealed trait TsQuery

object TsQuery {
  /** The empty tsquery — what PG yields when every lexeme is dropped
    * (e.g. stopword-only input). RUM marks the scan unsatisfiable without
    * touching the index (`isVoidRes`, reference: src/rumscan.c:365-458);
    * [[graft.search.SearchKernel.isVoid]] is the analogue.
    */
  case object Empty extends TsQuery
  final case class Lexeme(term: String, prefix: Boolean = false, weightMask: Int = 0) extends TsQuery
  final case class And(l: TsQuery, r: TsQuery) extends TsQuery
  final case class Or(l: TsQuery, r: TsQuery) extends TsQuery
  final case class Not(x: TsQuery) extends TsQuery
  /** l <dist> r : r's position == l's position + dist */
  final case class Phrase(dist: Int, l: TsQuery, r: TsQuery) extends TsQuery

  /** All lexeme leaves, in-order. Each occurrence is a distinct operand
    * (like PG QueryOperands); use [[distinctTerms]] for index lookups.
    */
  def operands(q: TsQuery): Array[Lexeme] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Lexeme]
    def go(n: TsQuery): Unit = n match {
      case Empty => ()
      case l: Lexeme => buf += l
      case And(a, b) => go(a); go(b)
      case Or(a, b) => go(a); go(b)
      case Not(x) => go(x)
      case Phrase(_, a, b) => go(a); go(b)
    }
    go(q)
    buf.toArray
  }

  def distinctTerms(q: TsQuery): Array[String] =
    operands(q).map(_.term).distinct

  /** Rewrite every lexeme term (hash-key query extraction,
    * reference src/rum_ts_utils.c:698-787 rum_extract_tsquery_hash).
    */
  def mapTerms(q: TsQuery, f: String => String): TsQuery = q match {
    case Empty => Empty
    case Lexeme(t, p, w) => Lexeme(f(t), p, w)
    case And(a, b) => And(mapTerms(a, f), mapTerms(b, f))
    case Or(a, b) => Or(mapTerms(a, f), mapTerms(b, f))
    case Not(x) => Not(mapTerms(x, f))
    case Phrase(d, a, b) => Phrase(d, mapTerms(a, f), mapTerms(b, f))
  }

}

/** Parser for PostgreSQL tsquery syntax:
  * `'quoted lexeme'` or bare lexemes, `&`, `|`, `!`, `<->`, `<N>`,
  * parentheses, `:*` prefix marker, `:ABCD*` weight suffixes.
  * Precedence (loosest→tightest): `|`, `&`, `<->`, `!`.
  */
object TsQueryParser {
  import TsQuery._

  def parse(s: String): TsQuery = new P(s).parseAll()

  private final class P(s: String) {
    private var i = 0

    def parseAll(): TsQuery = {
      skipWs()
      if (i >= s.length) return TsQuery.Empty // blank input = empty tsquery
      val q = parseOr()
      skipWs()
      require(i >= s.length, s"trailing input at $i in tsquery: $s")
      q
    }

    private def skipWs(): Unit = while (i < s.length && s(i).isWhitespace) i += 1

    private def parseOr(): TsQuery = {
      var l = parseAnd()
      skipWs()
      while (i < s.length && s(i) == '|') { i += 1; val r = parseAnd(); l = Or(l, r); skipWs() }
      l
    }

    private def parseAnd(): TsQuery = {
      var l = parsePhrase()
      skipWs()
      while (i < s.length && s(i) == '&') { i += 1; val r = parsePhrase(); l = And(l, r); skipWs() }
      l
    }

    private def parsePhrase(): TsQuery = {
      var l = parseUnary()
      skipWs()
      while (i < s.length && s(i) == '<' && peekPhraseOp()) {
        val dist = readPhraseOp()
        val r = parseUnary()
        l = Phrase(dist, l, r)
        skipWs()
      }
      l
    }

    private def peekPhraseOp(): Boolean = {
      // '<->' or '<N>'
      var j = i + 1
      if (j < s.length && s(j) == '-') return j + 1 < s.length && s(j + 1) == '>'
      while (j < s.length && s(j).isDigit) j += 1
      j > i + 1 && j < s.length && s(j) == '>'
    }

    private def readPhraseOp(): Int = {
      i += 1 // '<'
      if (s(i) == '-') { i += 2; 1 }
      else {
        var n = 0
        while (s(i).isDigit) { n = n * 10 + (s(i) - '0'); i += 1 }
        i += 1 // '>'
        n
      }
    }

    private def parseUnary(): TsQuery = {
      skipWs()
      require(i < s.length, s"unexpected end of tsquery: $s")
      s(i) match {
        case '!' => i += 1; Not(parseUnary())
        case '(' =>
          i += 1
          val q = parseOr()
          skipWs()
          require(i < s.length && s(i) == ')', s"missing ')' at $i in: $s")
          i += 1
          q
        case _ => parseLexeme()
      }
    }

    private def parseLexeme(): TsQuery = {
      skipWs()
      val term = new StringBuilder
      if (s(i) == '\'') {
        i += 1
        while (i < s.length && s(i) != '\'') { term += s(i); i += 1 }
        require(i < s.length, s"unterminated quote in: $s")
        i += 1
      } else {
        while (i < s.length && !s(i).isWhitespace && !"&|!()<:".contains(s(i))) {
          term += s(i); i += 1
        }
      }
      require(term.nonEmpty, s"empty lexeme at $i in: $s")
      var prefix = false
      var mask = 0
      if (i < s.length && s(i) == ':') {
        i += 1
        var done = false
        while (i < s.length && !done) {
          s(i) match {
            case '*' => prefix = true; i += 1
            case 'A' | 'a' => mask |= 1 << 3; i += 1
            case 'B' | 'b' => mask |= 1 << 2; i += 1
            case 'C' | 'c' => mask |= 1 << 1; i += 1
            case 'D' | 'd' => mask |= 1 << 0; i += 1
            case _ => done = true
          }
        }
      }
      Lexeme(term.toString, prefix, mask)
    }
  }
}
