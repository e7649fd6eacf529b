package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.ops.{DedupOps, IncrementalDedup}
import graft.streaming.StreamDedup

/** Incremental near-dup admission against a growing band index, plus the
  * streaming exact-dedup front gate.
  */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  /** Distinct-content doc: word stream seeded by id, no shared 5-grams
    * across different seeds.
    */
  private def fresh(id: Long, words: Int = 120): (Long, String) =
    (id, (0 until words).map(w => s"w${id}x$w").mkString(" "))

  /** Near-copy of `of`: same words with a short unique tail (high
    * jaccard vs the original, ~1 for word counts >> tail).
    */
  private def nearCopy(id: Long, of: (Long, String)): (Long, String) =
    (id, of._2 + s" tail${id}a tail${id}b")

  private def docs(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  test("admission: corpus dups rejected by index, batch dups exact-verified, chain is consistent") {
    val d0 = Seq(fresh(1), fresh(2), fresh(3))
    val day0 = IncrementalDedup.admitBatch(
      docs(d0),
      spark.emptyDataset[(Long, Array[Long], Int, Long)]
        .toDF("id", "sig", "band", "bucket"),
      "text",
      "doc_id"
    )
    // nothing to collide with: all accepted, index = bands x docs rows
    assert(day0.accepted.count() == 3 && day0.rejected.count() == 0)
    assert(day0.indexRows.count() == 3 * 8)

    val d1 = Seq(
      nearCopy(10, d0(0)), // near-dup of corpus doc 1 -> reject (corpus)
      (11L, d0(1)._2), // exact copy of corpus doc 2 -> reject (corpus)
      fresh(12), // genuinely new -> accept
      fresh(13), // new, duplicated within the batch...
      nearCopy(14, fresh(13)) // ...-> 13 accepted, 14 rejected (batch)
    )
    val day1 = IncrementalDedup.admitBatch(
      docs(d1),
      day0.indexRows,
      "text",
      "doc_id"
    )
    val acc = day1.accepted.select("doc_id").as[Long].collect().toSet
    val rej = day1.rejected
      .select("id", "dup_of", "reason")
      .as[(Long, Long, String)]
      .collect()
      .map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(acc == Set(12L, 13L))
    assert(rej(10L) == ((1L, "corpus")))
    assert(rej(11L) == ((2L, "corpus")))
    assert(rej(14L) == ((13L, "batch")))

    // index grows by exactly the accepted docs' band rows
    assert(day1.indexRows.select("id").distinct().as[Long].collect().toSet == acc)

    // chain consistency: no accepted day-1 doc is an exact near-dup of any
    // day-0 survivor (brute-force check, the invariant the index maintains)
    val all = docs(d0 ++ d1.filter(r => acc.contains(r._1)))
    val survivors = DedupOps
      .minhashNearDupPairs(all, "text", "doc_id", threshold = 0.7)
      .count()
    assert(survivors == 0L, "an accepted doc near-dups a corpus doc")

    // re-admitting the SAME batch against the grown index rejects all of
    // it (every doc now collides with itself or its original)
    val replay = IncrementalDedup.admitBatch(
      docs(d1),
      day0.indexRows.unionByName(day1.indexRows),
      "text",
      "doc_id"
    )
    assert(replay.accepted.count() == 0)
  }

  test("streaming exact dedup: first arrival passes, watermark bounds the state") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Long, String)]
    val deduped = StreamDedup.exactWithinWatermark(
      in.toDF().toDF("ts", "id", "text"),
      "text",
      "ts",
      "10 minutes"
    )
    val q = deduped.writeStream
      .format("memory")
      .queryName("dedup_out")
      .option("checkpointLocation", tmpDir("sd-ckpt"))
      .outputMode("append")
      .start()
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
    try {
      // first arrivals pass
      in.addData((ts(0), 1L, "alpha beta"), (ts(1), 3L, "gamma"))
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 2)

      // re-arrivals within the horizon (separate batches): dropped
      in.addData((ts(2), 2L, "alpha beta"))
      q.processAllAvailable()
      in.addData((ts(5), 4L, "alpha beta"))
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 2)

      // push the watermark far past the horizon, then re-send: state was
      // evicted, the content passes again (the documented bounded-state
      // trade)
      in.addData((ts(40), 5L, "delta"))
      q.processAllAvailable()
      in.addData((ts(41), 6L, "alpha beta"))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("id").as[Long].collect().toSet
      assert(ids == Set(1L, 3L, 5L, 6L))
    } finally q.stop()
  }
}
