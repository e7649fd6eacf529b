package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.EventWindows

/** Watermark + windowed aggregation: append-mode finalization and
  * late-data drop.
  */
class EventWindowsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("tumbling windows finalize once past the watermark; too-late rows drop") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Long)]
    val agg = EventWindows.tumblingAgg(
      in.toDF().toDF("t", "k", "v"),
      "t", "k", "v",
      windowDur = "10 minutes",
      lateness = "5 minutes"
    )
    val q = agg.writeStream
      .format("memory")
      .queryName("winagg")
      .outputMode("append")
      .start()
    try {
      def rows(): Seq[(Timestamp, String, Long, Long)] = spark
        .table("winagg")
        .select("win_start", "k", "n_events", "total")
        .as[(Timestamp, String, Long, Long)]
        .collect()
        .toSeq

      // window [10:00, 10:10): three events, two keys
      in.addData((ts(1), "a", 5L), (ts(4), "a", 7L), (ts(8), "b", 1L))
      q.processAllAvailable()
      // append mode: nothing emitted — the watermark (max 10:08 - 5m =
      // 10:03) has not passed the window end
      assert(rows().isEmpty, s"premature emit: ${rows()}")

      // an event at 10:16 pushes the watermark to 10:11 > 10:10: the
      // first window finalizes with its exact totals
      in.addData((ts(16), "a", 2L))
      q.processAllAvailable()
      assert(
        rows().toSet == Set(
          (ts(0), "a", 2L, 12L),
          (ts(0), "b", 1L, 1L)
        ),
        s"got ${rows()}"
      )

      // a LATE event for the finalized window (10:05 < watermark 10:11)
      // is dropped: no new or changed rows for that window, ever
      in.addData((ts(5), "a", 100L))
      q.processAllAvailable()
      // and the open window [10:10,10:20) finalizes only when the
      // watermark passes ITS end
      in.addData((ts(27), "b", 3L))
      q.processAllAvailable()
      assert(
        rows().toSet == Set(
          (ts(0), "a", 2L, 12L),
          (ts(0), "b", 1L, 1L),
          (ts(10), "a", 1L, 2L)
        ),
        s"got ${rows()}"
      )
    } finally q.stop()
  }
}
