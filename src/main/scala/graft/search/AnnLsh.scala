package graft.search

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Banded sign-random-projection LSH over an embedding column — the
  * bucketed scale path for approximate-nearest-neighbor search and
  * embedding-cosine near-dup blocking.
  *
  * Structure: `nTables` independent hash tables, each keyed by a
  * `planesPerTable`-bit signature (one bit per hyperplane). Candidates
  * share a (table, bucket) cell in at least one table — banding trades
  * precision for recall the standard way: per-table collision probability
  * for angle θ is (1-θ/π)^P, and T tables give 1-(1-p)^T recall.
  *
  * Hyperplanes are DETERMINISTIC: weight(global plane b, dim i) = ±1 from
  * the parity of a 60-bit md5 prefix of the string "b|i" (i 1-based);
  * table t owns global planes [t·P, (t+1)·P). That makes signatures
  * reproducible from SQL (`md5(b || '|' || i)`), so the DuckDB oracle can
  * verify bucket assignment bit-for-bit.
  *
  * At scale: (table, bucket) is the shuffle/partition key — candidate
  * generation is a co-partitioned equi-join, turning the O(n²) all-pairs
  * cosine into per-cell blocks; exact cosine re-ranks candidates only.
  * The expected candidate-pair count with balanced buckets is
  * T · n²/2^(P+1); P must therefore grow with the corpus —
  * P ≈ log2(n / targetBucketSize) — which [[defaultPlanes]] encodes. At
  * ingest the signature is computed once and persisted as the table's
  * partition key (an Iceberg bucket-transform analogue); recomputing it
  * per query, as small-scale demos do, is the anti-pattern.
  * Everything is native Catalyst (`zip_with`/`aggregate`, posexplode),
  * no UDFs, so projections stay in whole-stage codegen.
  */
object AnnLsh {

  /** planes per table sized so expected bucket occupancy ≈ targetBucket:
    * P = max(8, ceil(log2(n / targetBucket))).
    */
  def defaultPlanes(n: Long, targetBucket: Long = 64L): Int =
    math.max(8, 64 - java.lang.Long.numberOfLeadingZeros(
      math.max(1L, (n + targetBucket - 1) / targetBucket) - 1))

  /** 60-bit md5-prefix hash of a string — the JVM twin of the oracle's
    * CAST('0x' || substr(md5(x),1,15) AS BIGINT).
    */
  def hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** ±1.0 plane weights; planes(b)(i-1) is the weight of 1-based dim i. */
  def planes(nPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes) { b =>
      Array.tabulate(dim) { i0 =>
        if (hash60(s"$b|${i0 + 1}") % 2 == 1) 1.0 else -1.0
      }
    }

  /** Table t's planes: global plane indexes [t·P, (t+1)·P). */
  def tablePlanes(t: Int, planesPerTable: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(planesPerTable) { bit =>
      val b = t * planesPerTable + bit
      Array.tabulate(dim)(i0 => if (hash60(s"$b|${i0 + 1}") % 2 == 1) 1.0 else -1.0)
    }

  /** Banded signatures: one row per (input row, table) with the table's
    * bucket — computed once at ingest and repartitioned on (table, bucket),
    * the layout every candidate join co-partitions on.
    */
  def signatures(df: org.apache.spark.sql.DataFrame, embCol: String,
                 nTables: Int, planesPerTable: Int, dim: Int): org.apache.spark.sql.DataFrame = {
    val tb = (0 until nTables).map { t =>
      struct(lit(t).as("table"),
        bucket(col(embCol), tablePlanes(t, planesPerTable, dim)).as("bucket"))
    }
    df.withColumn("tb", explode(array(tb: _*)))
      .select(df.columns.map(col) :+ col("tb.table").as("table") :+ col("tb.bucket").as("bucket"): _*)
  }

  /** Signed projection of the embedding onto one plane. */
  private def proj(emb: Column, plane: Array[Double]): Column =
    aggregate(
      zip_with(emb, typedlit(plane), (x, w) => x.cast("double") * w),
      lit(0.0), (acc, x) => acc + x)

  /** Bucket id: bit b set iff projection onto plane b is positive. The
    * projection is quantized to 12 decimals BEFORE the sign test (mirroring
    * [[AnnIvf.clusterOf]]): double addition is non-associative, so a
    * projection within last-ulp noise of ±0 must not flip a bucket bit
    * between engines whose summation order differs (the SQL oracle sums
    * x·w in an unordered GROUP BY).
    */
  def bucket(emb: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, b) =>
      when(round(proj(emb, p), 12) > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Exact cosine similarity between an embedding column and a constant
    * query vector (the in-bucket re-rank kernel).
    */
  def cosineTo(emb: Column, q: Array[Float]): Column = {
    val qNorm = math.sqrt(q.map(x => x.toDouble * x.toDouble).sum)
    val dot = aggregate(
      zip_with(emb, typedlit(q), (a, b) => a.cast("double") * b.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    dot / (norm(emb) * lit(qNorm))
  }

  /** Exact cosine between two embedding columns (near-dup pair scoring). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    dot / (norm(a) * norm(b))
  }

  /** L2 norm of an embedding column. */
  def norm(emb: Column): Column =
    sqrt(aggregate(
      transform(emb, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))
}
