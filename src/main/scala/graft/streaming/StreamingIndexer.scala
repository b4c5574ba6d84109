package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.build.{IndexBuilder, SegmentCatalog}

/** Continuous index maintenance over a document stream — the Structured
  * Streaming face of the incremental-insert path (reference:
  * src/ruminsert.c:799-837 `ruminsert`, one entry-tree descent per key;
  * here one micro-segment append per micro-batch).
  *
  * Dataflow: `readStream` source → `foreachBatch` → [[IndexBuilder.append]]
  * (tokenize → shard shuffle → pack blocks → parquet append) → manifest
  * commit. Each micro-batch is atomic at the manifest level, exactly like a
  * batch append; Spark's streaming checkpoint (`checkpointLocation`) makes
  * redelivery idempotent at the source offset level, and the manifest's
  * lineage row records each batch. Query-side k-way merge over overlapping
  * chunk ranges (micro-segments) means readers never block on ingest;
  * [[IndexBuilder.compact]] restores single-run layout out-of-band.
  */
object StreamingIndexer {

  /** Start indexing `stream` (a streaming DataFrame with `docIdCol` and
    * `textCol`) into the existing index at `indexDir`. The index must have
    * been created by [[IndexBuilder.build]] first (possibly on an empty
    * corpus) so params/tokenizer are pinned by the manifest.
    */
  def start(spark: SparkSession, stream: DataFrame, docIdCol: String,
            textCol: String, indexDir: String, checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(SegmentCatalog.load(indexDir).nonEmpty,
      s"no index manifest in $indexDir — run IndexBuilder.build first")
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          IndexBuilder.append(spark, batch, docIdCol, textCol, indexDir)
          ()
        }
      }
      .start()
  }
}
