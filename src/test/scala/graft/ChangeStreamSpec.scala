package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{ChangeStream, StreamMut}

/** The stateful-streaming expression of the CDC apply: LWW register per
  * key in the state store, updates-only transition output.
  */
class ChangeStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming LWW register emits exactly the visible transitions") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamMut]
    val q = ChangeStream
      .lwwChanges(in.toDS())
      .writeStream
      .format("memory")
      .queryName("chg")
      .outputMode("append")
      .start()
    try {
      def emitted(): Seq[(String, String, String)] = spark
        .table("chg")
        .select("key", "change", "data")
        .as[(String, String, String)]
        .collect()
        .toSeq

      // batch 1: two inserts; k1 carries two versions in ONE batch — only
      // the max-HLC one is a visible transition
      in.addData(
        StreamMut("k1", "v1", 10, 0),
        StreamMut("k1", "v2", 12, 0),
        StreamMut("k2", "w1", 11, 0)
      )
      q.processAllAvailable()
      assert(
        emitted().sorted == Seq(("k1", "insert", "v2"), ("k2", "insert", "w1")).sorted
      )

      // batch 2: late OLDER version (absorbed), exact duplicate
      // (absorbed), one real update, one delete
      in.addData(
        StreamMut("k1", "v0", 5, 0), // late: below stored HLC, no output
        StreamMut("k2", "w1", 11, 0), // duplicate delivery: no output
        StreamMut("k2", "w2", 20, 0), // real update
        StreamMut("k1", null, 21, 0) // delete
      )
      q.processAllAvailable()
      assert(
        emitted().sorted == Seq(
          ("k1", "insert", "v2"),
          ("k2", "insert", "w1"),
          ("k2", "update", "w2"),
          ("k1", "delete", null)
        ).sorted
      )

      // batch 3: tombstone for a never-live key advances state SILENTLY;
      // a later below-tombstone upsert cannot resurrect it
      in.addData(StreamMut("k3", null, 30, 0))
      q.processAllAvailable()
      in.addData(StreamMut("k3", "zombie", 25, 0))
      q.processAllAvailable()
      assert(!emitted().exists(_._1 == "k3"))

      // a genuinely newer upsert after the tombstone is an insert again
      in.addData(StreamMut("k3", "alive", 35, 0))
      q.processAllAvailable()
      assert(emitted().count(_._1 == "k3") == 1)
      assert(emitted().contains(("k3", "insert", "alive")))
    } finally q.stop()
  }
}
