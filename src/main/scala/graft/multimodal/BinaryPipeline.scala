package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: media payloads
  * as opaque `binary` columns with typed metadata, and per-batch feature
  * extraction as a typed mapPartitions stage.
  *
  * The decode step is STUBBED — this container has no image/audio codecs —
  * with a deterministic fake ([[FakeDecoder]]); everything Spark-side is
  * real and tested: the schema (binary + metadata struct), partition-
  * preserving batch shape, and the feature extractor's contract. In PySpark
  * the same stage is `mapInPandas(decode_batch, schema)`; in Scala the
  * idiomatic equivalent is a typed mapPartitions over the binary column,
  * which is what this implements.
  */
object BinaryPipeline {

  /** Decoded-media surrogate: dimensions + a raw channel summary. */
  final case class Decoded(width: Int, height: Int, channels: Int, pixels: Array[Byte])

  /** STUB decoder — deterministic pure function of the payload bytes, with
    * the signature a real codec binding would have. Replace the body with
    * e.g. javax.imageio / ffmpeg bindings in a full deployment.
    */
  object FakeDecoder {
    def decode(payload: Array[Byte]): Decoded = {
      val w = 1 + (math.abs(payload.length * 31) % 64)
      val h = 1 + (math.abs(java.util.Arrays.hashCode(payload)) % 64)
      // "pixels": the payload itself stands in for decoded samples
      Decoded(w, h, 3, payload)
    }
  }

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                            meta_width: Int, meta_height: Int)

  final case class Features(media_id: Long, n_bytes: Long, width: Int, height: Int,
                            sum_bytes: Long, mean_byte: Double, histo_0: Long,
                            distinct_bytes: Int)

  /** Attach a synthetic binary payload to any (id, text) table — the test
    * stand-in for reading real media blobs.
    */
  def synthesize(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      lit("image/fake").as("kind"),
      encode(col(textCol), "UTF-8").as("payload"))
      .withColumn("meta_width", (octet_length(col("payload")) % 64 + 1).cast("int"))
      .withColumn("meta_height", (abs(xxhash64(col("payload"))) % 64 + 1).cast("int"))

  /** decode → feature-extract, batch-shaped: one decoder instance per
    * partition (the expensive-init pattern of real codec libraries).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("media_id", "kind", "payload", "meta_width", "meta_height")
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition decoder init happens here (stub: nothing to init)
        rows.map { r =>
          val d = FakeDecoder.decode(r.payload)
          var sum = 0L
          var zeros = 0L
          val seen = new Array[Boolean](256)
          var i = 0
          while (i < d.pixels.length) {
            val b = d.pixels(i) & 0xff
            sum += b
            if (b == 0) zeros += 1
            seen(b) = true
            i += 1
          }
          var distinct = 0
          var j = 0
          while (j < 256) { if (seen(j)) distinct += 1; j += 1 }
          Features(r.media_id, d.pixels.length.toLong, d.width, d.height, sum,
            if (d.pixels.isEmpty) 0.0 else sum.toDouble / d.pixels.length,
            zeros, distinct)
        }
      }.toDF()
  }
}
