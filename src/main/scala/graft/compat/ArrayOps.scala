package graft.compat

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Array operators + similarity (reference: src/rum_arr_utils.c —
  * rum_anyarray_* opclass; operators `&& @> <@ = %` and `<=>` distance,
  * README.md:235-272).
  *
  * All pure Catalyst Column expressions (codegen'd) — RUM needs an index
  * opclass for these, Spark's optimizer gets the same semantics from plain
  * expressions plus parquet pruning. Similarity follows
  * getSimilarity (rum_arr_utils.c:855-880):
  *   cosine  = |a∩b| / sqrt(|a|·|b|)     (default)
  *   jaccard = |a∩b| / (|a|+|b|-|a∩b|)
  *   overlap = |a∩b|
  * distance = 1/sml (∞ at 0) — DIST_FROM_SML; `%` = sml ≥ threshold
  * (default 0.5, the RumArraySimilarityThreshold GUC).
  *
  * Set semantics: counts use distinct elements (the index stores distinct
  * entries — rum_extract_anyarray dedups, rum_arr_utils.c:165-201).
  */
object ArrayOps {
  val DefaultThreshold = 0.5

  /** `a && b` — overlap (∃ shared element). Empty sides never overlap. */
  def overlap(a: Column, b: Column): Column = arrays_overlap(a, b)

  /** `a @> b` — a contains every element of b (empty b ⇒ true, PG parity). */
  def contains(a: Column, b: Column): Column =
    size(array_except(b, a)) === 0

  /** `a <@ b` — a contained by b. */
  def containedBy(a: Column, b: Column): Column = contains(b, a)

  /** `a = b` — set-insensitive PG array equality is positional; the RUM
    * fixture uses sorted distinct arrays, but we reproduce positional
    * equality exactly.
    */
  def equal(a: Column, b: Column): Column = a === b

  private def nd(c: Column): Column = size(array_distinct(c)).cast("double")

  /** |a∩b| over distinct elements. */
  def intersectCount(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double")

  def similarity(a: Column, b: Column, mode: String = "cosine"): Column = {
    val i = intersectCount(a, b)
    mode match {
      case "cosine" => when(nd(a) === 0 || nd(b) === 0, 0.0)
        .otherwise(i / sqrt(nd(a) * nd(b)))
      case "jaccard" => when(nd(a) + nd(b) - i === 0, 0.0)
        .otherwise(i / (nd(a) + nd(b) - i))
      case "overlap" => i
      case other => throw new IllegalArgumentException(s"similarity mode: $other")
    }
  }

  /** `a % b` — similar at threshold. */
  def similar(a: Column, b: Column, threshold: Double = DefaultThreshold,
              mode: String = "cosine"): Column =
    similarity(a, b, mode) >= threshold

  /** `a <=> b` — 1/similarity, ∞ at zero (rum_anyarray_distance). */
  def distance(a: Column, b: Column, mode: String = "cosine"): Column = {
    val s = similarity(a, b, mode)
    when(s === 0.0, lit(Double.PositiveInfinity)).otherwise(lit(1.0) / s)
  }
}
