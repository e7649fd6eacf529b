package graft

import org.apache.spark.sql.types._
import graft.applyops.TableSpec
import graft.feed.Generator
import graft.feed.Generator.FeedSpec
import graft.loop.ReplayLoop
import graft.stage.StagedStore
import graft.table.SnapshotTable

/** Hot-key skew stress: a power-law feed where a handful of keys receive
  * the overwhelming majority of updates (the north rule's explicit skew
  * case). Correctness must hold and no single-partition window may carry a
  * hot key's entire update stream (the salted/max_by path guarantees it —
  * see LwwDedupSpec's plan test; here we prove end-to-end correctness).
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("extreme power-law key skew converges to the LWW oracle") {
    val fs = FeedSpec(
      seed = 99L,
      numEvents = 20000L,
      numKeys = 2000L,
      numRepos = 5,
      resolvedWindows = 2,
      eventsPerFile = 5000L,
      disorderBlock = 1000L,
      skew = 8.0 // ~most events hit a few keys
    )
    val feedDir = tmpDir("skewfeed")
    val base = tmpDir("skew")
    Generator.writeFeed(spark, fs, feedDir, parallelism = 4)

    // confirm the feed is actually skewed: top key sees >20% of events
    val counts = (0L until fs.numEvents)
      .map(j => Generator.keyId(fs, Generator.canonicalIndex(fs, j)))
      .groupBy(identity)
      .map(_._2.size)
    assert(counts.max > fs.numEvents / 5, s"not skewed enough: ${counts.max}")

    val payload = StructType(
      Seq(
        StructField("repo", StringType),
        StructField("path", StringType),
        StructField("commit", StringType),
        StructField("lang", StringType),
        StructField("content", StringType)
      )
    )
    val table = new SnapshotTable(spark, s"$base/table", numBuckets = 8)
    val stage = new StagedStore(spark, s"$base/stage", bucketNanos = fs.nanosStep * 2000)
    val loop = new ReplayLoop(
      spark,
      feedDir,
      table,
      stage,
      s"$base/checkpoint",
      TableSpec(payload, Seq("repo", "path")),
      saltBuckets = 8,
      maxFilesPerTrigger = 2
    )
    loop.runAvailableNow()

    // oracle: per key, max-(nanos,logical) canonical event
    val winners = scala.collection.mutable.Map[Long, (Long, Int, Long)]()
    (0L until fs.numEvents).foreach { jIn =>
      val j = Generator.canonicalIndex(fs, jIn)
      val k = Generator.keyId(fs, j)
      val nanos = fs.baseNanos + Generator.tsRank(fs, j) * fs.nanosStep
      val logical = (Generator.mix64(fs.seed ^ j) & 0x3).toInt
      val cur = winners.get(k)
      val newer = cur.isEmpty || nanos > cur.get._1 ||
        (nanos == cur.get._1 && logical > cur.get._2)
      if (newer) winners(k) = (nanos, logical, j)
    }
    val expected = winners.flatMap { case (k, (_, _, j)) =>
      if (Generator.isDeleteOf(fs, j)) None
      else
        Some(
          (Generator.repoOf(fs, k), Generator.pathOf(k)) ->
            Generator.contentOf(fs, k, j)
        )
    }.toMap

    val got = table
      .read()
      .select("repo", "path", "content")
      .as[(String, String, String)]
      .collect()
      .map { case (r, p, c) => ((r, p), c) }
      .toMap
    assert(got == expected)
  }
}
