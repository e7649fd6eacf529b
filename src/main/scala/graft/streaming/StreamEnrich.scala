package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.table.SnapshotTable

/** Stream-static temporal enrichment: join a live mutation/event stream
  * against the CURRENT state of an applier-maintained [[SnapshotTable]] —
  * the streaming counterpart of [[graft.ops.JoinOps.asofJoin]], where the
  * "as of" instant is each micro-batch's processing time and the right
  * side is the table the CDC loop keeps up to date (the reference's
  * fan-out consumers read the applied target tables the same way,
  * internal/source/logical/loop.go:452-486).
  *
  * The crucial semantic: the snapshot plan is REBUILT per micro-batch
  * (inside foreachBatch), so every batch reads the table's latest
  * committed version at that moment. A plain stream-static `join` on a
  * DataFrame built once would pin the version (and its file manifest)
  * captured at planning time and silently serve stale state forever —
  * re-resolution per batch is the whole operator.
  *
  * Scale shape: with `broadcastState = true` (dimension-style lookup
  * tables) the state ships to executors once per batch and the join is
  * shuffle-free on the stream side. For large state, set it false: the
  * join shuffles stream rows to the state's key partitions — still one
  * shuffle of the (small) micro-batch, never of the table.
  */
object StreamEnrich {

  /** Enrich one batch with the table's current visible row per key: LEFT
    * join on `keyCols`; `payload` columns surface as `latest_<col>` (null
    * when the key is absent or tombstoned). Call inside foreachBatch — or
    * on any batch DataFrame — so the table resolves to its latest commit
    * at call time.
    */
  def enrichLatest(
      batch: DataFrame,
      table: SnapshotTable,
      keyCols: Seq[String],
      payload: Seq[String],
      broadcastState: Boolean = true
  ): DataFrame = {
    require(keyCols.nonEmpty && payload.nonEmpty)
    val renamed = payload.foldLeft(
      table.read().select((keyCols ++ payload).map(col): _*)
    )((d, c) => d.withColumnRenamed(c, s"latest_$c"))
    val state = if (broadcastState) broadcast(renamed) else renamed
    batch.join(state, keyCols, "left")
  }

  /** Run the enrichment as a streaming query: each micro-batch is joined
    * against the table's state as of that batch and handed to `sink`.
    */
  def start(
      stream: DataFrame,
      table: SnapshotTable,
      keyCols: Seq[String],
      payload: Seq[String],
      checkpointDir: String,
      broadcastState: Boolean = true,
      trigger: Trigger = Trigger.ProcessingTime("1 second")
  )(sink: (DataFrame, Long) => Unit): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, id: Long) =>
        sink(enrichLatest(b, table, keyCols, payload, broadcastState), id)
      }
      .start()
}
