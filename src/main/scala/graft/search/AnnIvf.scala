package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF-flat approximate-nearest-neighbor over an embedding column — the
  * coarse-quantizer scale path: vectors are assigned to their
  * nearest-centroid cluster at INGEST (cluster = the partition key, like an
  * Iceberg bucket transform), a query probes only the `nprobe` clusters
  * whose centroids are nearest, and exact cosine re-ranks the candidates.
  * Expected scanned fraction ≈ nprobe / nClusters of the corpus, versus
  * the brute-force full scan.
  *
  * Centroids here are DETERMINISTIC — the embeddings of fixed "sample"
  * row ids (a production deployment would k-means them; the assignment /
  * partition / probe plumbing is identical and that is what this module
  * implements). Determinism makes cluster assignment reproducible from
  * SQL, so the DuckDB oracle can verify the whole path.
  *
  * Assignment ties (equal cosine) break toward the smaller centroid id on
  * both engines. All expressions are native Catalyst (`zip_with` /
  * `aggregate` / `array_max`), no UDFs.
  */
object AnnIvf {

  /** cluster id = argmax over centroids of cosine(emb, centroid),
    * ties toward the smaller id (array_max on (sim, -id) structs).
    * Similarities are quantized to 12 decimals before comparison so the
    * argmax agrees bit-for-bit with engines whose dot-product summation
    * order differs (last-ulp noise must not flip an assignment).
    */
  def clusterOf(emb: Column, centroids: Array[Array[Float]]): Column =
    clusterOfD(emb, centroids.map(_.map(_.toDouble)))

  /** double-centroid variant (trained centroids are means, hence doubles). */
  def clusterOfD(emb: Column, centroids: Array[Array[Double]]): Column = {
    val scored = array(centroids.zipWithIndex.map { case (c, i) =>
      struct(round(cosineTo(emb, c), 12).as("s"), lit(-i).as("ni"))
    }: _*)
    (-array_max(scored).getField("ni")).cast("int")
  }

  /** exact cosine between an embedding column and a constant double vector
    * (the trained-centroid re-rank/assignment kernel).
    */
  def cosineTo(emb: Column, q: Array[Double]): Column = {
    val qNorm = math.sqrt(q.map(x => x * x).sum)
    val dot = aggregate(
      zip_with(emb, typedlit(q), (a, b) => a.cast("double") * b),
      lit(0.0), (acc, x) => acc + x)
    dot / (AnnLsh.norm(emb) * lit(qNorm))
  }

  /** add the ingest-time `cluster` column. */
  def assign(df: DataFrame, embCol: String, centroids: Array[Array[Float]]): DataFrame =
    df.withColumn("cluster", clusterOf(col(embCol), centroids))

  def assignD(df: DataFrame, embCol: String, centroids: Array[Array[Double]]): DataFrame =
    df.withColumn("cluster", clusterOfD(col(embCol), centroids))

  /** Deterministic Lloyd's k-means over a hash-ordered sample — the trained
    * coarse quantizer (production IVF; the fixed-row centroids remain as
    * the demo baseline). Every tie rule is pinned so SQL can replay the
    * whole training bit-for-bit:
    *   - sample = the `sampleN` rows with the smallest
    *     (md5-prefix-hash(id), id) — a deterministic pseudo-random sample
    *     any engine can reproduce;
    *   - seeds = the first k sample rows in that order;
    *   - assignment = argmax of cosine quantized to 12 decimals, ties to
    *     the smaller centroid id (same rule as query-time [[clusterOfD]]);
    *   - update = element-wise member mean rounded to 9 decimals (the
    *     rounding absorbs engine summation-order noise; 1e-9 is far below
    *     any clustering-relevant scale); empty clusters keep their
    *     previous centroid;
    *   - fixed iteration count.
    * The sample (sampleN·dim doubles) is the only thing collected —
    * O(training config), not O(corpus). At 100 TB the same sample is a
    * LIMIT over a hash ordering the scan can push down.
    */
  /** ONE copy each of the driver-side cosine kernel and the pinned HALF_UP
    * quantization — the determinism contract (what the SQL oracle replays)
    * lives here and nowhere else.
    */
  private def cosD(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def quant(x: Double, decimals: Int): Double =
    BigDecimal(x).setScale(decimals, BigDecimal.RoundingMode.HALF_UP).toDouble

  def kmeansCentroids(df: DataFrame, embCol: String, idCol: String,
                      k: Int = 8, iters: Int = 2, sampleN: Int = 64): Array[Array[Double]] = {
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10).cast("long")
    val rows: Array[Array[Double]] = df.select(col(idCol), col(embCol))
      .withColumn("h", h)
      .orderBy(col("h"), col(idCol)).limit(sampleN)
      .collect().map(_.getSeq[Float](1).map(_.toDouble).toArray)
    require(rows.length >= k, s"sample ${rows.length} < k=$k")
    val dim = rows(0).length

    var cents = rows.take(k).map(_.clone())
    for (_ <- 0 until iters) {
      val assign = rows.map { v =>
        var best = 0
        var bestS = quant(cosD(v, cents(0)), 12)
        var c = 1
        while (c < k) {
          val s = quant(cosD(v, cents(c)), 12)
          if (s > bestS) { best = c; bestS = s } // tie keeps smaller id
          c += 1
        }
        best
      }
      cents = Array.tabulate(k) { c =>
        val members = rows.indices.filter(assign(_) == c)
        if (members.isEmpty) cents(c)
        else {
          val m = new Array[Double](dim)
          members.foreach { i =>
            var d = 0
            while (d < dim) { m(d) += rows(i)(d); d += 1 }
          }
          var d = 0
          while (d < dim) { m(d) = quant(m(d) / members.length, 9); d += 1 }
          m
        }
      }
    }
    cents
  }

  /** double-vector probe (trained centroids), same quantized tie rules. */
  def probeClustersD(q: Array[Double], centroids: Array[Array[Double]], nprobe: Int): Seq[Int] =
    centroids.zipWithIndex
      .map { case (c, i) => (quant(cosD(q, c), 12), i) }
      .sortBy { case (s, i) => (-s, i) }
      .take(nprobe).map(_._2).toSeq

  /** ids of the `nprobe` clusters nearest to the query vector,
    * by centroid cosine desc with smaller-id tie-break.
    */
  def probeClusters(q: Array[Float], centroids: Array[Array[Float]], nprobe: Int): Seq[Int] =
    probeClustersD(q.map(_.toDouble), centroids.map(_.map(_.toDouble)), nprobe)
}
