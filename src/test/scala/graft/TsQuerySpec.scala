package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.query._
import graft.tokenize.Tokenizer

class TsQuerySpec extends AnyFunSuite {
  import TsQuery._

  test("parser: operators, precedence, prefix, weights, quotes") {
    assert(TsQueryParser.parse("ever|wrote") == Or(Lexeme("ever"), Lexeme("wrote")))
    assert(TsQueryParser.parse("have&wish") == And(Lexeme("have"), Lexeme("wish")))
    assert(TsQueryParser.parse("a & b | c") == Or(And(Lexeme("a"), Lexeme("b")), Lexeme("c")))
    assert(TsQueryParser.parse("way & (go | half)") ==
      And(Lexeme("way"), Or(Lexeme("go"), Lexeme("half"))))
    assert(TsQueryParser.parse("def <-> fgr") == Phrase(1, Lexeme("def"), Lexeme("fgr")))
    assert(TsQueryParser.parse("def <2> fgr") == Phrase(2, Lexeme("def"), Lexeme("fgr")))
    assert(TsQueryParser.parse("(gave | !half) <-> way") ==
      Phrase(1, Or(Lexeme("gave"), Not(Lexeme("half"))), Lexeme("way")))
    assert(TsQueryParser.parse("!gave & way") == And(Not(Lexeme("gave")), Lexeme("way")))
    assert(TsQueryParser.parse("'multi word':*") == Lexeme("multi word", prefix = true))
    assert(TsQueryParser.parse("w:*") == Lexeme("w", prefix = true))
    assert(TsQueryParser.parse("beauti:a") == Lexeme("beauti", prefix = false, weightMask = 8))
    assert(TsQueryParser.parse("sea:*bc") == Lexeme("sea", prefix = true, weightMask = 6))
  }

  // --- evaluation over a tokenized doc ---
  private def matchDoc(queryStr: String, terms: Map[String, Array[Int]],
                       noPos: Boolean = false): Boolean = {
    val cq = CompiledQuery.compile(TsQueryParser.parse(queryStr))
    val p = new TsEval.Provider {
      def positions(k: Int): Array[Int] = {
        val lex = cq.keys(k)
        if (lex.prefix) {
          val all = terms.keys.filter(_.startsWith(lex.term)).toArray.sorted
          if (all.isEmpty) null
          else all.flatMap(terms(_)).sorted
        } else terms.get(lex.term).orNull
      }
      def wclasses(k: Int): Array[Byte] = {
        val ps = positions(k)
        if (ps == null) null else Array.fill[Byte](ps.length)(0)
      }
    }
    TsEval.matches(cq, p, calcNot = true, noPos = noPos)
  }

  private def toks(text: String): Map[String, Array[Int]] =
    Tokenizer.simple(text).map(o => o.term -> o.positions).toMap

  test("empty tsquery: parses to Empty, compiles void, matches nothing") {
    assert(TsQueryParser.parse("") == Empty)
    assert(TsQueryParser.parse("   ") == Empty)
    val cq = CompiledQuery.compile(Empty)
    assert(cq.numKeys == 0)
    assert(graft.search.SearchKernel.isVoid(cq))
    assert(!graft.search.SearchKernel.matchesEmptyDoc(cq))
    // a pure negation is NOT void — it needs the EVERYTHING full scan
    val notQ = CompiledQuery.compile(TsQueryParser.parse("!a"))
    assert(!graft.search.SearchKernel.isVoid(notQ))
    assert(graft.search.SearchKernel.needsFullScan(notQ))
  }

  test("boolean eval") {
    val d = toks("the quick brown fox jumps over the lazy dog")
    assert(matchDoc("quick & fox", d))
    assert(!matchDoc("quick & cat", d))
    assert(matchDoc("quick | cat", d))
    assert(matchDoc("!cat & dog", d))
    assert(!matchDoc("!dog", d))
    assert(matchDoc("qui:* & fo:*", d))
    assert(!matchDoc("quix:*", d))
  }

  test("phrase eval: adjacency and distance") {
    val d = toks("alpha beta gamma beta delta")
    assert(matchDoc("alpha <-> beta", d))
    assert(!matchDoc("beta <-> alpha", d))
    assert(matchDoc("alpha <2> gamma", d))
    assert(!matchDoc("alpha <-> gamma", d))
    assert(matchDoc("gamma <-> beta <-> delta", d))
    assert(matchDoc("alpha <4> delta", d))
  }

  test("phrase with negation inside (reference rum.sql:33 semantics)") {
    // (gave | !half) <-> way
    val d2 = toks("put on your specs and look at the castle half way up")
    // 'half' right before 'way' → !half fails there, gave absent → no match
    assert(!matchDoc("(gave | !half) <-> way", d2))
    assert(matchDoc("(gave | half) <-> way", d2))
    val d3 = toks("only a fragment as it were gave way it still hangs")
    assert(matchDoc("(gave | !half) <-> way", d3))
    assert(matchDoc("(gave | half) <-> way", d3))
    val d1 = toks("my appreciation of you in a more complimentary way than by")
    assert(matchDoc("(gave | !half) <-> way", d1))
    assert(!matchDoc("(gave | half) <-> way", d1))
    // way at position 1: negated left operand matches "before the doc"
    val d4 = toks("way to go")
    assert(matchDoc("(gave | !half) <-> way", d4))
  }

  test("phrase as AND when positions unavailable (TS_EXEC_PHRASE_NO_POS)") {
    val d = toks("alpha beta gamma")
    assert(matchDoc("alpha <-> gamma", d, noPos = true)) // degraded to AND
    assert(!matchDoc("alpha <-> zeta", d, noPos = true))
  }

  test("weight masks filter positions") {
    val cq = CompiledQuery.compile(TsQueryParser.parse("sea:b"))
    val p = new TsEval.Provider {
      def positions(k: Int): Array[Int] = Array(3, 7)
      def wclasses(k: Int): Array[Byte] = Array(0, 2) // D at 3, B at 7
    }
    assert(TsEval.matches(cq, p))
    val cqA = CompiledQuery.compile(TsQueryParser.parse("sea:a"))
    assert(!TsEval.matches(cqA, p))
  }
}
