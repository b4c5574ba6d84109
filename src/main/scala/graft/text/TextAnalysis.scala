package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: marker-based
  * language identification and related quality signals, built from native
  * Catalyst expressions only (no UDFs) so they stay inside whole-stage
  * codegen and scale linearly over a 100 TB corpus scan.
  *
  * The language-ID heuristic is the classic stopword/marker profile
  * approach (an n-gram profile degenerated to word unigrams): per language,
  * count occurrences of a tiny set of high-frequency marker words and pick
  * the argmax. Deterministic, cheap, and SQL-expressible — every score is
  * reproducible by the DuckDB oracle in SparkEntry.
  */
object TextAnalysis {

  /** Marker words per language, matched with surrounding spaces over the
    * lowercased, space-padded text (word-boundary semantics without regex).
    * Order matters: argmax ties resolve to the earlier language.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of"),
    "de" -> Seq("der", "die", "und"),
    "es" -> Seq("el", "los", "una"),
    "fr" -> Seq("le", "les", "et"))

  /** ' ' || lower(text) || ' ' — the padded haystack markers match in. */
  def padded(text: Column): Column =
    concat(lit(" "), lower(text), lit(" "))

  /** #occurrences of ` m ` in the padded text via the length-difference
    * trick: (len(t) - len(replace(t, m, ''))) / len(m).
    *
    * NOTE counts non-overlapping occurrences of the padded marker; two
    * adjacent marker words ("the the") share the separating space so the
    * second is not counted — acceptable for a scoring heuristic, and the
    * oracle uses the identical formula.
    */
  def markerCount(paddedText: Column, word: String): Column = {
    val m = s" $word "
    ((length(paddedText) - length(replace(paddedText, lit(m), lit("")))) / m.length)
      .cast("long")
  }

  /** Per-language scores: sum of marker counts. */
  def langScores(text: Column): Seq[(String, Column)] = {
    val p = padded(text)
    langMarkers.map { case (lang, words) =>
      lang -> words.map(w => markerCount(p, w)).reduce(_ + _)
    }
  }

  /** Predicted language: argmax of [[langScores]], ties to the earlier
    * entry of [[langMarkers]] (strict `>` against all previously-checked
    * languages encodes the tie-break).
    */
  def langId(scores: Seq[(String, Column)]): Column = {
    // lang_i wins iff score_i > score_j for all j < i and score_i >= score_j
    // for all j > i; expressed as a first-match CASE chain.
    val conds = scores.zipWithIndex.map { case ((lang, s), i) =>
      val beats = scores.zipWithIndex.collect {
        case ((_, o), j) if j < i => s > o
        case ((_, o), j) if j > i => s >= o
      }
      (lang, beats.reduceOption(_ && _).getOrElse(lit(true)))
    }
    conds.tail.foldLeft(when(conds.head._2, conds.head._1)) {
      case (acc, (lang, c)) => acc.when(c, lang)
    }.otherwise(scores.head._1)
  }
}
