package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked windowed aggregation over an event stream — the canonical
  * `readStream → watermark → window → agg → writeStream` shape the build
  * brief mandates for streams, packaged so every loop/feed in the engine
  * can hang per-key time-window metrics off its mutation or event stream.
  *
  * Append-mode semantics (the scalable setting): a window row is emitted
  * exactly ONCE, when the watermark passes its end — so the sink sees
  * final values only, and the state store holds just the windows still
  * inside the lateness horizon. Events later than `lateness` behind the
  * max observed time are DROPPED by the watermark (the streaming analog
  * of the snapshot table's gcHorizon intake bound: late tolerance and
  * state retention agree by construction).
  *
  * Scale shape: one shuffle on (window, key); partial aggregation
  * combines map-side; state is O(open windows x keys), bounded by the
  * lateness horizon — nothing grows with stream length.
  */
object EventWindows {

  /** Tumbling-window counts and sums per key.
    *
    * @param events    streaming (or batch) frame
    * @param timeCol   event-time column (timestamp)
    * @param keyCol    grouping key column
    * @param valueCol  numeric column to sum
    * @param windowDur window duration, e.g. "10 minutes"
    * @param lateness  watermark delay, e.g. "5 minutes"
    * @return (win_start, win_end, key, n_events, total)
    */
  def tumblingAgg(
      events: DataFrame,
      timeCol: String,
      keyCol: String,
      valueCol: String,
      windowDur: String,
      lateness: String
  ): DataFrame =
    events
      .withWatermark(timeCol, lateness)
      .groupBy(window(col(timeCol), windowDur), col(keyCol))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("total")
      )
      .select(
        col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col(keyCol),
        col("n_events"),
        col("total")
      )
}
