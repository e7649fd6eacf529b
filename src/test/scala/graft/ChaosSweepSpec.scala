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
}
