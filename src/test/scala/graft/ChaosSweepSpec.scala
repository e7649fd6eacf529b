package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.types._
import graft.applyops.TableSpec
import graft.feed.Generator
import graft.feed.Generator.FeedSpec
import graft.loop.ReplayLoop
import graft.stage.StagedStore
import graft.table.SnapshotTable

/** Randomized fault-injection sweep — the probabilistic analog of the
  * reference's chaos e2e (reference: internal/source/cdc/
  * handler_test.go:403-540, chaos p=0.01 over concurrent handlers): per
  * seed, the feed is delivered in random-sized waves, the loop is restarted
  * between waves, checkpoints are randomly wiped (total-crash recovery),
  * and already-delivered chunks are randomly re-delivered under new paths
  * (transport duplicates). Every schedule must converge to the clean run's
  * exact final state — the exactly-once contract is schedule-independence.
  */
class ChaosSweepSpec extends SparkSpec {
  import spark.implicits._

  private val fs = FeedSpec(
    seed = 42L,
    numEvents = 2000L,
    numKeys = 500L,
    numRepos = 7,
    resolvedWindows = 4,
    eventsPerFile = 200L,
    disorderBlock = 100L
  )

  private val payloadSchema = StructType(
    Seq(
      StructField("repo", StringType),
      StructField("path", StringType),
      StructField("commit", StringType),
      StructField("lang", StringType),
      StructField("content", StringType)
    )
  )
  private val spec = TableSpec(payloadSchema, Seq("repo", "path"))

  private def newLoop(feedDir: String, base: String): (ReplayLoop, SnapshotTable) = {
    val table = new SnapshotTable(spark, s"$base/table", numBuckets = 16)
    val stage = new StagedStore(spark, s"$base/stage", bucketNanos = 1000000L * 200000L)
    val loop = new ReplayLoop(
      spark, feedDir, table, stage, s"$base/checkpoint", spec,
      saltBuckets = 8, maxFilesPerTrigger = 3
    )
    (loop, table)
  }

  private def state(t: SnapshotTable): Set[(String, String, String, String)] =
    t.read()
      .select("repo", "path", "commit", "content")
      .as[(String, String, String, String)]
      .collect()
      .toSet

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.toSeq.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }

  private def copyDir(src: Path, dst: Path): Unit = {
    Files.createDirectories(dst)
    Files.list(src).iterator().asScala.toSeq.foreach { f =>
      if (Files.isRegularFile(f))
        Files.copy(f, dst.resolve(f.getFileName), StandardCopyOption.COPY_ATTRIBUTES)
    }
  }

  test("random restart/wipe/duplicate schedules all converge to the clean final state") {
    val master = tmpDir("chaos-master")
    Generator.writeFeed(spark, fs, master, parallelism = 4)
    val chunks: Seq[Path] = Files
      .list(Paths.get(master))
      .iterator()
      .asScala
      .filter(_.getFileName.toString.startsWith("chunk="))
      .toSeq
      .sortBy(_.getFileName.toString)
    assert(chunks.size >= 4, s"want several chunks for a meaningful sweep, got ${chunks.size}")

    // clean, uninterrupted baseline
    val cleanBase = tmpDir("chaos-clean")
    val (cleanLoop, cleanTable) = newLoop(master, cleanBase)
    cleanLoop.runAvailableNow()
    val want = state(cleanTable)
    assert(want.nonEmpty)

    Seq(1L, 7L, 23L, 57L, 91L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val base = tmpDir(s"chaos-$seed")
      val feedDir = s"$base/feed"
      Files.createDirectories(Paths.get(feedDir))
      var delivered = 0
      var dups = 0
      while (delivered < chunks.size) {
        val step = 1 + rnd.nextInt(math.max(1, chunks.size / 2))
        chunks.slice(delivered, delivered + step).foreach { c =>
          copyDir(c, Paths.get(feedDir, c.getFileName.toString))
        }
        delivered = math.min(chunks.size, delivered + step)
        // transport duplicate: re-deliver a random already-delivered chunk
        // under a fresh path (the file source sees brand-new files)
        if (rnd.nextBoolean()) {
          dups += 1
          val dup = chunks(rnd.nextInt(delivered))
          copyDir(dup, Paths.get(feedDir, s"chunk=zdup$dups"))
        }
        // "crash + restart": a fresh loop instance over the same state dirs
        val (loop, _) = newLoop(feedDir, base)
        loop.runAvailableNow()
        // total crash: lose the streaming checkpoint (batch ids renumber
        // from zero; staging markers must not mis-dedup the new batches)
        if (rnd.nextInt(3) == 0) {
          deleteRecursively(Paths.get(s"$base/checkpoint"))
        }
      }
      val (finalLoop, finalTable) = newLoop(feedDir, base)
      finalLoop.runAvailableNow()
      assert(
        state(finalTable) == want,
        s"seed $seed diverged from the clean replay (dups=$dups)"
      )
      assert(finalLoop.committedFence == cleanLoop.committedFence)
    }
  }

  test(".RESOLVED filename-marker feeds survive restart/wipe chaos (mtime gate + drain)") {
    // cloud-storage layout: data chunks carry NO in-stream resolved lines;
    // empty .RESOLVED marker files interleave with them. The delivery-mtime
    // gate plus the post-catch-up drain must fence correctly under random
    // wave sizes, restarts, and checkpoint wipes.
    def mut(id: Int, v: String, nanos: Long): String =
      s"""{"after":{"repo":"r","path":"p$id","commit":"$v","lang":"x","content":"$v"},"key":["r","p$id"],"updated":"$nanos.0000000000"}"""
    def markerName(nanos: Long): String = {
      val dt = java.time.format.DateTimeFormatter
        .ofPattern("yyyyMMddHHmmss")
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.ofEpochSecond(nanos / 1000000000L))
      f"$dt${nanos % 1000000000L}%09d${0}%010d.RESOLVED"
    }
    // 8 data chunks (3 muts each, ids overlap for LWW), a marker after
    // every second chunk; items carry strictly increasing mtimes
    val gen = new scala.util.Random(7L)
    var ts = 10L
    val items: Seq[(String, Option[String])] = (1 to 8).flatMap { i =>
      val lines = (0 until 3).map { _ =>
        ts += 1; mut(gen.nextInt(12), s"v$ts", ts)
      }
      val chunk = Seq((f"chunk=000000/c$i%02d.ndjson", Some(lines.mkString("\n"))))
      if (i % 2 == 0) { ts += 1; chunk :+ ((markerName(ts), None)) }
      else chunk
    }

    def writeItems(feedDir: String, slice: Seq[((String, Option[String]), Int)]): Unit =
      slice.foreach { case ((name, content), idx) =>
        val p = Paths.get(feedDir, name)
        Files.createDirectories(p.getParent)
        Files.writeString(p, content.getOrElse(""))
        Files.setLastModifiedTime(
          p,
          java.nio.file.attribute.FileTime.fromMillis(1000000L + idx * 1000L)
        )
      }
    def mkLoop(feedDir: String, base: String): (ReplayLoop, SnapshotTable) = {
      val table = new SnapshotTable(spark, s"$base/table", numBuckets = 4)
      val stage = new StagedStore(spark, s"$base/stage", bucketNanos = 10L)
      (
        new ReplayLoop(
          spark, feedDir, table, stage, s"$base/checkpoint",
          TableSpec(payloadSchema, Seq("repo", "path")),
          saltBuckets = 4, maxFilesPerTrigger = 2,
          resolvedFromFilenames = true
        ),
        table
      )
    }

    // clean baseline
    val cleanFeed = tmpDir("resmark-cleanfeed")
    writeItems(cleanFeed, items.zipWithIndex)
    val (cleanLoop, cleanTable) = mkLoop(cleanFeed, tmpDir("resmark-clean"))
    cleanLoop.runAvailableNow()
    val want = state(cleanTable)
    assert(want.nonEmpty)
    assert(cleanLoop.committedFence > graft.model.Hlc.Zero)

    Seq(3L, 41L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val base = tmpDir(s"resmark-$seed")
      val feedDir = s"$base/feed"
      Files.createDirectories(Paths.get(feedDir))
      var delivered = 0
      while (delivered < items.size) {
        val step = 1 + rnd.nextInt(5)
        writeItems(
          feedDir,
          items.zipWithIndex.slice(delivered, delivered + step)
        )
        delivered = math.min(items.size, delivered + step)
        val (loop, _) = mkLoop(feedDir, base)
        loop.runAvailableNow()
        if (rnd.nextInt(3) == 0) deleteRecursively(Paths.get(s"$base/checkpoint"))
      }
      val (finalLoop, finalTable) = mkLoop(feedDir, base)
      finalLoop.runAvailableNow()
      assert(state(finalTable) == want, s"seed $seed diverged on the marker feed")
      assert(finalLoop.committedFence == cleanLoop.committedFence)
    }
  }

  // ---- fan-path chaos: a 3-level FK chain through MultiTableLoop ----

  test("FK-chain chaos: restart/wipe/duplicate schedules converge on the multi-table fan path") {
    import graft.loop.{MultiTableLoop, TableTarget}
    import graft.applyops.TableSpec
    import graft.stage.StagedStore

    // deterministic 3-level webhook feed (grand -> parent -> child), the
    // reference's flagship chaos shape (handler_test.go:403-540): 24 files,
    // interleaved topics, updates and deletes, a resolved marker every 4th
    // file and one final marker covering everything
    def mut(topic: String, pk: Int, v: String, ts: Long): String =
      s"""{"after":{"pk":$pk,"v":"$v"},"key":[$pk],"topic":"$topic","updated":"$ts.0000000000"}"""
    def del(topic: String, pk: Int, ts: Long): String =
      s"""{"after":null,"key":[$pk],"topic":"$topic","updated":"$ts.0000000000"}"""

    val gen = new scala.util.Random(42L)
    val topics = Seq("grand", "parent", "child")
    var ts = 100L
    val files: Seq[(String, String)] = (1 to 24).map { i =>
      val bodies = (0 until 1 + gen.nextInt(3)).map { _ =>
        val muts = (0 until 1 + gen.nextInt(4)).map { _ =>
          val topic = topics(gen.nextInt(3))
          val pk = gen.nextInt(30)
          ts += 1
          if (gen.nextInt(10) == 0) del(topic, pk, ts)
          else mut(topic, pk, s"v$ts", ts)
        }
        s"""{"payload":[${muts.mkString(",")}],"length":${muts.size}}"""
      }
      val marker =
        if (i % 4 == 0 || i == 24) { ts += 1; Seq(s"""{"resolved":"$ts.0000000000"}""") }
        else Nil
      (f"$i%04d.json", (bodies ++ marker).mkString("\n"))
    }

    val schema = StructType(
      Seq(StructField("pk", IntegerType), StructField("v", StringType))
    )
    def mkLoop(feedDir: String, base: String) = {
      val targets = topics.map { t =>
        t -> TableTarget(
          TableSpec(schema, Seq("pk")),
          new SnapshotTable(spark, s"$base/$t/table", numBuckets = 4),
          new StagedStore(spark, s"$base/$t/stage", bucketNanos = 50L)
        )
      }.toMap
      (
        new MultiTableLoop(
          spark, feedDir, targets,
          dependsOn = Map("parent" -> Set("grand"), "child" -> Set("parent")),
          checkpointDir = s"$base/checkpoint",
          saltBuckets = 4, maxFilesPerTrigger = 3
        ),
        targets
      )
    }
    def states(targets: Map[String, TableTarget]): Map[String, Set[(Int, String)]] =
      targets.map { case (n, t) =>
        n -> t.table.read().select("pk", "v").as[(Int, String)].collect().toSet
      }

    def writeFile(dir: String, name: String, content: String, mtimeMs: Long): Unit = {
      val p = Paths.get(dir, name)
      Files.writeString(p, content)
      Files.setLastModifiedTime(p, java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
    }

    // clean, uninterrupted baseline
    val cleanFeed = tmpDir("fkchaos-cleanfeed")
    files.zipWithIndex.foreach { case ((n, c), i) =>
      writeFile(cleanFeed, n, c, 1000000L + i * 1000L)
    }
    val (cleanLoop, cleanTargets) = mkLoop(cleanFeed, tmpDir("fkchaos-clean"))
    cleanLoop.runAvailableNow()
    val want = states(cleanTargets)
    assert(want.values.forall(_.nonEmpty))

    Seq(5L, 19L, 77L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val base = tmpDir(s"fkchaos-$seed")
      val feedDir = s"$base/feed"
      Files.createDirectories(Paths.get(feedDir))
      var delivered = 0
      var dups = 0
      while (delivered < files.size) {
        val step = 1 + rnd.nextInt(8)
        files.slice(delivered, delivered + step).zipWithIndex.foreach {
          case ((n, c), i) =>
            writeFile(feedDir, n, c, 1000000L + (delivered + i) * 1000L)
        }
        delivered = math.min(files.size, delivered + step)
        if (rnd.nextBoolean()) {
          // transport duplicate: an already-delivered file under a new name
          dups += 1
          val (_, c) = files(rnd.nextInt(delivered))
          writeFile(feedDir, f"zdup$dups%04d.json", c, 1000000L + delivered * 1000L)
        }
        val (loop, _) = mkLoop(feedDir, base)
        loop.runAvailableNow()
        if (rnd.nextInt(3) == 0) deleteRecursively(Paths.get(s"$base/checkpoint"))
      }
      val (finalLoop, finalTargets) = mkLoop(feedDir, base)
      finalLoop.runAvailableNow()
      assert(
        states(finalTargets) == want,
        s"seed $seed diverged on the fan path (dups=$dups)"
      )
      assert(finalLoop.committedFence == cleanLoop.committedFence)
    }
  }

  test("monitor chaos: random waves absorbed by automatic backfill re-entry cycles") {
    // the startMonitored daemon is the only thing moving data here (the
    // continuous trigger is an hour, the clock is pinned deep in the past
    // so the loop is ALWAYS lagging): each random wave of chunks must be
    // detected via the feed-change signature and absorbed by one
    // stop -> AvailableNow -> restart cycle, and every schedule must land
    // on the clean run's exact state
    val master = tmpDir("monchaos-master")
    Generator.writeFeed(spark, fs, master, parallelism = 4)
    val chunks: Seq[Path] = Files
      .list(Paths.get(master))
      .iterator()
      .asScala
      .filter(_.getFileName.toString.startsWith("chunk="))
      .toSeq
      .sortBy(_.getFileName.toString)

    val cleanBase = tmpDir("monchaos-clean")
    val (cleanLoop, cleanTable) = newLoop(master, cleanBase)
    cleanLoop.runAvailableNow()
    val want = state(cleanTable)
    assert(want.nonEmpty)

    Seq(5L, 13L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val base = tmpDir(s"monchaos-$seed")
      val feedDir = s"$base/feed"
      Files.createDirectories(Paths.get(feedDir))
      val (loop, table) = newLoop(feedDir, base)
      val handle = loop.startMonitored(
        backfillWindowNanos = 1L,
        pollMillis = 100L,
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 hour"),
        nowNanos = () => Long.MaxValue / 2 // always lagging
      )
      try {
        // random waves of 1-3 chunks, in order
        var remaining = chunks
        var waves = 0
        while (remaining.nonEmpty) {
          val n = 1 + rnd.nextInt(3)
          val (wave, rest) = remaining.splitAt(n)
          remaining = rest
          val c0 = handle.backfillCycles
          wave.foreach(c =>
            copyDir(c, Paths.get(feedDir, c.getFileName.toString)))
          val deadline = System.currentTimeMillis() + 120000L
          while (handle.backfillCycles <= c0 &&
            System.currentTimeMillis() < deadline) Thread.sleep(100L)
          assert(
            handle.backfillCycles > c0,
            s"seed $seed: monitor never cycled for wave $waves"
          )
          waves += 1
        }
        // straggler tolerance: cycles keep firing while signatures differ;
        // wait for the terminal state, then require schedule-independence
        val deadline = System.currentTimeMillis() + 120000L
        while (state(table) != want &&
          System.currentTimeMillis() < deadline) Thread.sleep(250L)
        assert(state(table) == want, s"seed $seed diverged")
        assert(handle.backfillCycles >= waves)
        assert(loop.committedFence == cleanLoop.committedFence)
      } finally handle.stop()
    }
  }
}
