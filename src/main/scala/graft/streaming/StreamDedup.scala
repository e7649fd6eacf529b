package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Streaming EXACT dedup — the first gate of a continuous ingestion
  * pipeline, run before anything expensive touches a document. Built on
  * the engine's native `dropDuplicatesWithinWatermark`: state is one
  * entry per distinct content hash seen within the watermark horizon, so
  * memory is bounded by (arrival rate x horizon), not corpus size; the
  * near-dup admission against the FULL corpus is the batch-side
  * [[graft.ops.IncrementalDedup]], which this stage feeds.
  *
  * Semantics: the first arrival of a content hash passes; re-arrivals are
  * dropped while the hash is inside the watermark horizon; once the
  * watermark passes, state is evicted and the same content would pass
  * again (by design — the bounded-state trade every streaming dedup
  * makes; the downstream incremental index is the unbounded-memory
  * exactness backstop).
  */
object StreamDedup {

  /** Drop re-arrivals of identical `textCol` content within
    * `delayThreshold` of the event-time watermark on `tsCol`.
    */
  def exactWithinWatermark(
      docs: DataFrame,
      textCol: String,
      tsCol: String,
      delayThreshold: String
  ): DataFrame =
    docs
      .withColumn("__sha", TextOps.contentHash(col(textCol)))
      .withWatermark(tsCol, delayThreshold)
      .dropDuplicatesWithinWatermark("__sha")
      .drop("__sha")
}
