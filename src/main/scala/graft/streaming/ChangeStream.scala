package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A mutation as consumed from any of the feed codecs, keyed and stamped.
  * `data` is null for deletes (the unified feed convention).
  */
final case class StreamMut(key: String, data: String, nanos: Long, logical: Int)

/** One emitted per-key state TRANSITION. */
final case class StreamChange(
    key: String,
    nanos: Long,
    logical: Int,
    change: String, // insert | update | delete
    data: String
)

private[streaming] final case class KeyState(
    nanos: Long,
    logical: Int,
    deleted: Boolean,
    data: String
)

/** The CDC apply expressed as a PURE Structured Streaming stateful
  * operator: a streaming last-writer-wins register per key, held in the
  * engine's state store via `flatMapGroupsWithState`, emitting per-key
  * state transitions (updates-only changelog) instead of materializing a
  * table.
  *
  * This is the complementary sink shape to the replay loop: where
  * [[graft.table.SnapshotTable]] + foreachBatch materialize a TABLE for
  * batch readers, `ChangeStream` materializes the CHANGE STREAM for
  * downstream stream consumers (the reference's webhook fan-out side,
  * internal/source/logical/loop.go:452-486, seen from the consumer's
  * end). The same LWW rule governs both: a delivery at or below the
  * stored HLC emits nothing, so duplicates and late reorderings are
  * absorbed silently and any delivery order converges to the same
  * transition stream tail.
  *
  * Scale shape: `groupByKey` shuffles mutations to their key's state
  * partition once; state is one small record per LIVE key (RocksDB state
  * store at cluster scale); output is O(actual changes), never O(input) —
  * redeliveries produce zero rows, not suppressed-downstream rows.
  *
  * Semantics per micro-batch and key: only the max-HLC mutation of the
  * batch can win (intermediate versions inside one batch are invisible,
  * exactly like the table merge's per-key max_by fold). If it beats the
  * stored HLC the state advances and ONE transition is emitted:
  * `insert` (was absent/deleted, now live), `update` (live before and
  * after), `delete` (was live, now tombstoned). A tombstone for a key
  * that was never live advances the state silently — dead on arrival is
  * not a visible change. A consumer that needs EVERY intermediate
  * transition (not just the per-batch winner) should bound micro-batch
  * size (`maxFilesPerTrigger` / smaller trigger intervals) so fewer
  * versions of one key coalesce into a batch.
  */
object ChangeStream {

  private def newer(m: StreamMut, s: KeyState): Boolean =
    m.nanos > s.nanos || (m.nanos == s.nanos && m.logical > s.logical)

  private[streaming] def step(
      key: String,
      rows: Iterator[StreamMut],
      state: GroupState[KeyState]
  ): Iterator[StreamChange] = {
    if (rows.isEmpty) return Iterator.empty
    val newest = rows.maxBy(m => (m.nanos, m.logical))
    val cur = state.getOption
    if (cur.exists(s => !newer(newest, s))) Iterator.empty
    else {
      val wasLive = cur.exists(!_.deleted)
      val isDelete = newest.data == null
      state.update(KeyState(newest.nanos, newest.logical, isDelete, newest.data))
      val change =
        if (isDelete) (if (wasLive) Some("delete") else None)
        else Some(if (wasLive) "update" else "insert")
      change.iterator.map(c =>
        StreamChange(key, newest.nanos, newest.logical, c, newest.data)
      )
    }
  }

  /** Transform a (streaming) mutation Dataset into its LWW transition
    * stream. Works on batch Datasets too (one "micro-batch" fold) —
    * useful for tests and backfills.
    */
  def lwwChanges(muts: Dataset[StreamMut]): Dataset[StreamChange] = {
    implicit val se = Encoders.product[KeyState]
    implicit val ce = Encoders.product[StreamChange]
    implicit val ke = Encoders.STRING
    muts
      .groupByKey(_.key)
      .flatMapGroupsWithState[KeyState, StreamChange](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout()
      )(step)
  }
}
