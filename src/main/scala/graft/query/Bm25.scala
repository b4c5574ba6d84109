package graft.query

/** Classic BM25 scoring — the additional scoring mode the engine exposes
  * beyond RUM's cover-density kernel (CoverRank). Uses Lucene-style
  * always-positive idf so scores stay monotone on tiny corpora.
  *
  *   idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
  *   s(t, d) = idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·len/avgLen))
  *   score   = Σ over distinct query terms present in d
  *
  * Deterministic across engines: terms are summed in sorted-term order so a
  * SQL oracle can reproduce the exact double (modulo last-bit noise; tests
  * compare at 1e-6 and verify output rounds at 1e-4).
  */
object Bm25 {
  val K1 = 1.2
  val B = 0.75

  def idf(df: Long, numDocs: Long): Double =
    math.log(1.0 + (numDocs - df + 0.5) / (df + 0.5))

  def termScore(tf: Int, df: Long, docLen: Long, avgLen: Double, numDocs: Long): Double = {
    if (tf <= 0) 0.0
    else idf(df, numDocs) * (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * docLen / avgLen))
  }

  /** Upper bound of a term's contribution for any doc — block-max WAND
    * bound given the block's max tf (monotone in tf; docLen ≥ tf ≥ 1 keeps
    * the denominator ≥ tf + k1·(1-b), so bound with the most favorable
    * short doc).
    */
  def maxTermScore(maxTf: Int, df: Long, avgLen: Double, numDocs: Long): Double = {
    if (maxTf <= 0) 0.0
    else idf(df, numDocs) * (maxTf * (K1 + 1.0)) / (maxTf + K1 * (1.0 - B))
  }
}
