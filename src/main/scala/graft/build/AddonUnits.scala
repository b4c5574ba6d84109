package graft.build

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Build-time mappings from common scalar families onto the engine's
  * long-valued addon slot, with the matching query-constant transforms —
  * the analogue of the reference's per-type distance opclasses
  * (btree_rum.c:249-323 generic typed extract/compare procs; :513-517
  * timestamp distance). The engine orders/filters raw signed longs
  * exactly (see [[graft.search.AltKernel]]); these helpers define what
  * those longs MEAN per type. Apply the same transform to the indexed
  * column (as a derived `attach` column) and to every query constant.
  *
  * | family            | transform            | distance semantics       |
  * |-------------------|----------------------|--------------------------|
  * | timestamp         | [[timestampMicros]]  | exact, in microseconds   |
  * | money / decimal   | [[scaledLong]]       | exact, in 10^-scale units|
  * | float / double    | [[floatOrderedBits]] | ORDER exact; `<=>` in    |
  * |                   |                      | VALUE units via          |
  * |                   |                      | `Searcher.topKAddonFloat`|
  */
object AddonUnits {

  // ---- timestamps ----------------------------------------------------

  /** timestamp → signed epoch MICROSECONDS. The reference converts its
    * int64-µs timestamps to float seconds for distance (btree_rum.c:513-517,
    * losing sub-second exactness past ~2^53 µs); we keep exact µs — the
    * addon slot is a signed long, so pre-1970 values order correctly
    * (negative micros). NTZ parquet columns are cast through `timestamp`
    * first (run sessions in UTC so the cast is the identity).
    */
  def timestampMicros(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** query-constant twin of [[timestampMicros]] */
  def timestampMicros(i: java.time.Instant): Long =
    java.lang.Math.addExact(
      java.lang.Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L)

  // ---- money / fixed-point decimals ----------------------------------

  /** numeric → long scaled by 10^scale (e.g. money at scale=2 → cents).
    * Exact distances in 10^-scale units. Values are rounded HALF_UP at the
    * scale boundary; anything outside the long range fails the build fast
    * (raise_error) rather than wrapping.
    */
  def scaledLong(c: Column, scale: Int): Column = {
    require(scale >= 0 && scale <= 18, s"scale $scale outside [0, 18]")
    val scaled = round(c.cast("decimal(38,18)") * lit(BigDecimal(10).pow(scale)), 0)
    // conservative double pre-guard FIRST: under ANSI mode a wildly
    // out-of-range value would otherwise fail the decimal cast itself with
    // a generic numeric error before the actionable raise_error below
    val bound = 9.3e18 / math.pow(10, scale)
    when(c.isNull, lit(null).cast("long"))
      .when(abs(c.cast("double")) > bound,
        raise_error(concat(lit(s"scaledLong(scale=$scale) overflows long for value "),
          c.cast("string"))).cast("long"))
      .when(scaled > lit(BigDecimal(Long.MaxValue)) ||
            scaled < lit(BigDecimal(Long.MinValue)),
        raise_error(concat(lit(s"scaledLong(scale=$scale) overflows long for value "),
          c.cast("string"))).cast("long"))
      .otherwise(scaled.cast("long"))
  }

  /** query-constant twin of [[scaledLong]] */
  def scaledLong(v: BigDecimal, scale: Int): Long =
    (v * BigDecimal(10).pow(scale))
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact

  // ---- floats --------------------------------------------------------

  /** double → order-preserving signed long via the IEEE-754 bit trick:
    * positive doubles keep their raw bits (ascending), negative doubles
    * flip the non-sign bits so -0.0 → -1 and more-negative → more-negative.
    * ORDERING is exact for every value (incl. ±0.0, denormals, ±Inf), so
    * range predicates ([[graft.search.Searcher.rangeAddon]]) and one-sided
    * ordered scans (`<=|` / `|=>`) are exact in value order. Distance
    * queries in VALUE units (`|a-c|` as an exact double) are served by
    * `Searcher.topKAddonFloat` / `rangeAddonFloat`, which rank the
    * double distance's own bit image through the same alt-order kernel
    * (early termination preserved). NaN policy: canonical NaN maps above +Inf
    * (sorts last, one equivalence class), mirroring SQL's NULLS-LAST-ish
    * treatment rather than poisoning comparisons.
    */
  def floatOrderedBits(d: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(d) // canonical NaN
    if (b >= 0L) b else b ^ Long.MaxValue
  }

  /** inverse of [[floatOrderedBits]] */
  def floatFromOrderedBits(v: Long): Double =
    java.lang.Double.longBitsToDouble(if (v >= 0L) v else v ^ Long.MaxValue)

  /** Column twin of [[floatOrderedBits]]. A ScalaUDF is acceptable here:
    * this runs ONCE per row at build time inside the already-narrow
    * tokenize stage (no SQL builtin exposes raw IEEE-754 bits), never in
    * a query plan.
    */
  def floatOrderedBits(c: Column): Column = {
    val f = udf((d: java.lang.Double) =>
      if (d == null) null.asInstanceOf[java.lang.Long]
      else java.lang.Long.valueOf(floatOrderedBits(d.doubleValue())))
    f(c.cast("double"))
  }
}
