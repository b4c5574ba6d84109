package graft.search

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sign-random-projection LSH over an embedding column — the bucketed
  * scale path for approximate-nearest-neighbor search and embedding-cosine
  * near-dup blocking.
  *
  * Hyperplanes are DETERMINISTIC: weight(plane b, dim i) = ±1 from the
  * parity of a 60-bit md5 prefix of the string "b|i" (i 1-based). That
  * makes the signature reproducible from SQL (`md5(b || '|' || i)`), so
  * the DuckDB oracle can verify bucket assignment bit-for-bit.
  *
  * At scale: `bucket` becomes the shuffle/partition key — candidate
  * generation is a co-partitioned equi-join on (bucket), turning the O(n²)
  * all-pairs cosine into per-bucket blocks; exact cosine re-ranks inside a
  * bucket only. Everything is native Catalyst (`zip_with`/`aggregate`),
  * no UDFs, so the projection stays in whole-stage codegen.
  */
object AnnLsh {

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

  /** Signed projection of the embedding onto one plane. */
  private def proj(emb: Column, plane: Array[Double]): Column =
    aggregate(
      zip_with(emb, typedlit(plane), (x, w) => x.cast("double") * w),
      lit(0.0), (acc, x) => acc + x)

  /** Bucket id: bit b set iff projection onto plane b is positive. */
  def bucket(emb: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, b) =>
      when(proj(emb, p) > 0, lit(1L << b)).otherwise(lit(0L))
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
