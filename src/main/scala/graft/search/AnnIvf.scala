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
  def clusterOf(emb: Column, centroids: Array[Array[Float]]): Column = {
    val scored = array(centroids.zipWithIndex.map { case (c, i) =>
      struct(round(AnnLsh.cosineTo(emb, c), 12).as("s"), lit(-i).as("ni"))
    }: _*)
    (-array_max(scored).getField("ni")).cast("int")
  }

  /** add the ingest-time `cluster` column. */
  def assign(df: DataFrame, embCol: String, centroids: Array[Array[Float]]): DataFrame =
    df.withColumn("cluster", clusterOf(col(embCol), centroids))

  /** ids of the `nprobe` clusters nearest to the query vector,
    * by centroid cosine desc with smaller-id tie-break.
    */
  def probeClusters(q: Array[Float], centroids: Array[Array[Float]], nprobe: Int): Seq[Int] = {
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    centroids.zipWithIndex
      .map { case (c, i) =>
        (BigDecimal(cos(q, c)).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble, i)
      }
      .sortBy { case (s, i) => (-s, i) }
      .take(nprobe).map(_._2).toSeq
  }
}
