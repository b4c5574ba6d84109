package graft.core

/** Hash-keyed entry variant — the engine's rum_tsvector_hash_ops
  * (reference: src/rum_ts_utils.c:596-605 build_tsvector_hash_entry hashes
  * each lexeme with hash_any; opclass wiring rum--1.2.sql:162+; regression
  * suites rum_hash/orderby_hash/altorder_hash). Hash keys shrink the entry
  * key space for dedup-heavy corpora (long identifiers, URLs) at the cost
  * of prefix search, which the reference rejects
  * ("Compare with prefix expressions isn't supported",
  * expected/rum_hash.out:310) — we do the same.
  *
  * The reference stores a 32-bit hash and relies on the heap recheck to
  * absorb collisions; this engine has no heap recheck, so keys are 64-bit
  * FNV-1a rendered as fixed-width hex (16 chars) — collision probability at
  * 10^9 distinct terms is ~3% per the birthday bound for the whole corpus
  * and negligible per query; the rendering keeps the posting schema at
  * term:string so the entire scan/pushdown/kernel path is unchanged.
  */
object HashKeys {

  /** FNV-1a 64-bit over UTF-8 bytes. */
  def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Fixed-width 16-hex-char rendering (sortable, parquet-dictionary
    * friendly).
    */
  def hex(s: String): String = {
    val h = fnv64(s)
    val sb = new java.lang.StringBuilder(16)
    var shift = 60
    while (shift >= 0) {
      sb.append(Character.forDigit(((h >>> shift) & 0xfL).toInt, 16))
      shift -= 4
    }
    sb.toString
  }
}
