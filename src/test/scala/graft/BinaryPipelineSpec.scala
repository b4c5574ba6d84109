package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.multimodal.BinaryPipeline

class BinaryPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("binary media pipeline: schema, determinism, feature extraction") {
    val docs = Seq((1L, "hello world"), (2L, ""), (3L, "hello world"), (4L, "αβγ"))
      .toDF("id", "t")
    val media = BinaryPipeline.synthesize(docs, "id", "t")
    assert(media.schema("payload").dataType.typeName == "binary")
    val feats = BinaryPipeline.extractFeatures(spark, media)
      .collect().map(r => r.getLong(0) -> r).toMap
    // n_bytes = utf8 length
    assert(feats(1L).getLong(1) == 11L)
    assert(feats(2L).getLong(1) == 0L)
    assert(feats(4L).getLong(1) == 6L) // 3 greek letters × 2 bytes
    // identical payloads → identical features (deterministic stub decode)
    assert(feats(1L).toSeq.drop(1) == feats(3L).toSeq.drop(1))
    // sum/mean byte of "hello world"
    val bytes = "hello world".getBytes("UTF-8").map(_ & 0xff)
    assert(feats(1L).getLong(4) == bytes.sum.toLong)
    assert(math.abs(feats(1L).getDouble(5) - bytes.sum.toDouble / bytes.length) < 1e-12)
    assert(feats(1L).getInt(7) == bytes.distinct.length)
  }
}
