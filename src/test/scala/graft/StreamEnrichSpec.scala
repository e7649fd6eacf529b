package graft

import scala.collection.mutable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.model.Hlc
import graft.streaming.StreamEnrich
import graft.table.SnapshotTable

/** Streaming temporal enrichment (stream-static as-of against the applied
  * table) and the changelog file-stream tail — the two consumer-facing
  * streaming surfaces of the CDC-out story.
  */
class StreamEnrichSpec extends SparkSpec {
  import spark.implicits._

  private def batch(
      rows: Seq[(String, String, Long, Boolean)]
  ): DataFrame =
    rows
      .map { case (k, v, n, d) => (k, v, n, 0, d) }
      .toDF("k", "v", "__hlc_nanos", "__hlc_logical", "__deleted")

  test("enrichment re-resolves the table at every micro-batch (never a pinned plan)") {
    val t = new SnapshotTable(spark, tmpDir("enrich"), numBuckets = 4)
    t.merge(
      batch(Seq(("a", "v1", 10L, false), ("b", "v1", 11L, false))),
      Seq("k"),
      "k1",
      Hlc(11, 0)
    )

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val seen = mutable.Buffer[(Long, Map[String, Option[String]])]()
    val q = StreamEnrich.start(
      in.toDF().withColumnRenamed("value", "k"),
      t,
      Seq("k"),
      Seq("v"),
      tmpDir("enrich-ckpt")
    ) { (df, id) =>
      seen.synchronized {
        seen += ((
          id,
          df.select("k", "latest_v")
            .as[(String, Option[String])]
            .collect()
            .toMap
        ))
      }
    }
    try {
      // batch 0: state as committed by k1; unknown key -> null
      in.addData("a", "z")
      q.processAllAvailable()
      assert(seen.last._2 == Map("a" -> Some("v1"), "z" -> None))

      // commit BETWEEN batches; the next batch must see it — the pinned-
      // plan failure mode would still serve v1 here
      t.merge(batch(Seq(("a", "v2", 20L, false))), Seq("k"), "k2", Hlc(20, 0))
      in.addData("a")
      q.processAllAvailable()
      assert(seen.last._2 == Map("a" -> Some("v2")))

      // tombstone: enrichment sees the key disappear
      t.merge(batch(Seq(("b", null, 30L, true))), Seq("k"), "k3", Hlc(30, 0))
      in.addData("b", "a")
      q.processAllAvailable()
      assert(seen.last._2 == Map("b" -> None, "a" -> Some("v2")))
    } finally q.stop()
  }

  test("changelogStream tails emitted segments live; ordered fold lands on table state") {
    val base = tmpDir("cltail")
    val cl = s"$base/changelog"
    val t = new SnapshotTable(spark, s"$base/table", numBuckets = 4)
    t.merge(
      batch(Seq(("a", "v1", 10L, false), ("b", "v1", 11L, false))),
      Seq("k"),
      "k1",
      Hlc(11, 0)
    )
    assert(t.emitChangelog(cl) == 1)

    val stream =
      SnapshotTable.changelogStream(spark, cl, t.changelogSchema)
    val q = stream.writeStream
      .format("memory")
      .queryName("cl_tail")
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    try {
      q.processAllAvailable()
      val first = spark
        .table("cl_tail")
        .select("k", "v", "change_type", "commit_version")
        .as[(String, String, String, Long)]
        .collect()
        .toSet
      assert(first.map(_._3) == Set("insert"))
      assert(first.map(_._1) == Set("a", "b"))

      // two more commits (update + delete) published while the tail runs
      t.merge(batch(Seq(("a", "v2", 20L, false))), Seq("k"), "k2", Hlc(20, 0))
      t.merge(batch(Seq(("b", null, 30L, true))), Seq("k"), "k3", Hlc(30, 0))
      assert(t.emitChangelog(cl) == 2)
      q.processAllAvailable()

      val all = spark
        .table("cl_tail")
        .select("k", "v", "change_type", "commit_version")
        .as[(String, String, String, Long)]
        .collect()
        .toSeq
      assert(all.map(_._3).toSet == Set("insert", "update", "delete"))

      // consumer fold in commit_version order == the table's final state
      val state = mutable.Map[String, String]()
      all.sortBy(_._4).foreach {
        case (k, _, "delete", _) => state.remove(k)
        case (k, v, _, _)        => state(k) = v
      }
      val want = t
        .read()
        .select("k", "v")
        .as[(String, String)]
        .collect()
        .toMap
      assert(state.toMap == want && want == Map("a" -> "v2"))
    } finally q.stop()
  }
}
