package graft

import org.apache.spark.sql.types._
import graft.applyops.TableSpec
import graft.feed.Generator
import graft.feed.Generator.FeedSpec
import graft.loop.ReplayLoop
import graft.stage.StagedStore
import graft.table.SnapshotTable

/** Mid-stream schema evolution + immediate mode end-to-end. */
class EvolutionLoopSpec extends SparkSpec {
  import spark.implicits._

  private val payloadSchema = StructType(
    Seq(
      StructField("repo", StringType),
      StructField("path", StringType),
      StructField("commit", StringType),
      StructField("lang", StringType),
      StructField("content", StringType)
    )
  )

  private def mkLoop(feedDir: String, base: String, immediate: Boolean) = {
    val table = new SnapshotTable(spark, s"$base/table", numBuckets = 8)
    val stage = new StagedStore(spark, s"$base/stage", bucketNanos = 1000000L * 500)
    (
      new ReplayLoop(
        spark,
        feedDir,
        table,
        stage,
        s"$base/checkpoint",
        TableSpec(payloadSchema, Seq("repo", "path")),
        immediate = immediate,
        saltBuckets = 8,
        maxFilesPerTrigger = 3
      ),
      table
    )
  }

  test("payloads gaining a 'stars' column mid-stream evolve the snapshot schema") {
    val fs = FeedSpec(
      seed = 7L,
      numEvents = 2000L,
      numKeys = 300L,
      resolvedWindows = 2,
      eventsPerFile = 500L,
      disorderBlock = 100L,
      evolveFraction = 0.4 // last 40% of events carry "stars"
    )
    val feedDir = tmpDir("evofeed")
    val base = tmpDir("evo")
    Generator.writeFeed(spark, fs, feedDir, parallelism = 4)

    val (loop, table) = mkLoop(feedDir, base, immediate = false)
    loop.runAvailableNow()

    val out = table.read()
    assert(out.schema.fieldNames.contains("stars"))
    assert(out.schema("stars").dataType == LongType) // inferred from payload
    val withStars = out.filter($"stars".isNotNull).count()
    val withoutStars = out.filter($"stars".isNull).count()
    assert(withStars > 0, "evolved rows present")
    assert(withoutStars > 0, "pre-evolution rows tolerate the missing column")
    // commit log carries the evolved schema forward
    assert(table.payloadSchema().get.fieldNames.contains("stars"))
  }

  test("wrong key arity in the feed fails the batch at staging time") {
    val feedDir = tmpDir("badfeed")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$feedDir/chunk=000000"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$feedDir/chunk=000000/bad.ndjson"),
      // key has 1 element; PK is (repo, path) = arity 2
      """{"after":{"repo":"r","path":"p","commit":"c","lang":"x","content":"y"},"key":["r"],"updated":"10.0000000000"}"""
    )
    val (loop, _) = mkLoop(feedDir, tmpDir("bad"), immediate = false)
    val e = intercept[Exception] { loop.runAvailableNow() }
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(
      chain(e).exists(c =>
        c.isInstanceOf[graft.model.SchemaDriftException] ||
          Option(c.getMessage).exists(_.contains("expected 2"))
      ),
      s"unexpected failure: $e"
    )
  }

  test("immediate mode (no fence) converges to the same final state as staged") {
    val fs = FeedSpec(
      seed = 11L,
      numEvents = 2000L,
      numKeys = 300L,
      resolvedWindows = 2,
      eventsPerFile = 500L,
      disorderBlock = 100L
    )
    val feedDir = tmpDir("immfeed")
    Generator.writeFeed(spark, fs, feedDir, parallelism = 4)

    val (staged, stagedTable) = mkLoop(feedDir, tmpDir("imm-staged"), immediate = false)
    staged.runAvailableNow()
    val (imm, immTable) = mkLoop(feedDir, tmpDir("imm-imm"), immediate = true)
    imm.runAvailableNow()

    def state(t: SnapshotTable) =
      t.read()
        .select("repo", "path", "commit", "content")
        .as[(String, String, String, String)]
        .collect()
        .toSet
    assert(state(immTable) == state(stagedTable))
    assert(state(immTable).nonEmpty)
    // immediate mode performs no fence GATING (every batch merges on
    // arrival), but resolved markers are still RECORDED on the commits
    // they ride with — the ledger shows source progress, mirroring the
    // reference's Record-without-fencing (resolver.go:291-309)
    assert(imm.committedFence > graft.model.Hlc.Zero)
    import org.apache.spark.sql.functions.col
    assert(
      immTable.ledger().filter(col("resolved_nanos") > 0L).count() >= 1,
      "ledger must show recorded source progress in immediate mode"
    )
  }
}
