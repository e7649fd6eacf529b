package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.applyops.TableSpec
import graft.feed.Generator
import graft.feed.Generator.FeedSpec
import graft.loop.ReplayLoop
import graft.stage.StagedStore
import graft.table.SnapshotTable

/** spark-submit-able end-to-end replay driver.
  *
  * Usage:
  *   ReplayMain <workDir> [numEvents] [numKeys] [windows] [cores]
  *
  * Generates a deterministic changefeed (seed 42) under workDir/feed, runs
  * the staged replay loop to completion, and prints one JSON line with the
  * applied-events/sec throughput plus the final table row count and a
  * content-sha fingerprint — the figures BENCH/BASELINE.md reports at two
  * parallelism levels.
  */
object ReplayMain {
  def main(args: Array[String]): Unit = {
    val workDir = if (args.nonEmpty) args(0) else s"/tmp/graft-replay-${System.nanoTime()}"
    val numEvents = if (args.length > 1) args(1).toLong else 200000L
    val numKeys = if (args.length > 2) args(2).toLong else 50000L
    val windows = if (args.length > 3) args(3).toInt else 4
    val cores = if (args.length > 4) args(4) else sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft-replay")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", s"${16 * 1024 * 1024}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val contentMin = sys.env.getOrElse("SPARK_GRAFT_CONTENT_MIN", "512").toInt
    val spec = FeedSpec(
      seed = 42L,
      numEvents = numEvents,
      numKeys = numKeys,
      resolvedWindows = windows,
      eventsPerFile = math.max(1000L, numEvents / 32),
      disorderBlock = 1000L,
      contentMin = contentMin,
      contentRange = contentMin * 3
    )
    require(numEvents % windows == 0 && (numEvents / windows) % 1000 == 0,
      "numEvents must be divisible by windows*1000")

    val feedDir = s"$workDir/feed"
    Generator.writeFeed(spark, spec, feedDir, parallelism = cores.toInt)

    val payloadSchema = StructType(
      Seq(
        StructField("repo", StringType),
        StructField("path", StringType),
        StructField("commit", StringType),
        StructField("lang", StringType),
        StructField("content", StringType)
      )
    )
    // merge-on-read cadence 4: three delta merges per compaction — the
    // steady-state write-amplification knob exercised end-to-end
    val table = new SnapshotTable(spark, s"$workDir/table", numBuckets = 64,
      compactEvery = sys.env.getOrElse("SPARK_GRAFT_COMPACT_EVERY", "4").toInt)
    val stage = new StagedStore(spark, s"$workDir/stage",
      bucketNanos = spec.nanosStep * math.max(1000L, numEvents / 16))
    val loop = new ReplayLoop(
      spark,
      feedDir,
      table,
      stage,
      s"$workDir/checkpoint",
      TableSpec(payloadSchema, Seq("repo", "path")),
      saltBuckets = 64,
      maxFilesPerTrigger = 8
    )

    val t0 = System.nanoTime()
    loop.runAvailableNow()
    val sec = (System.nanoTime() - t0) / 1e9
    val eps = numEvents / sec

    val out = table.read()
    val fp = out
      .agg(
        count(lit(1)).as("rows"),
        // order-independent state fingerprint: xor-fold of per-row hashes
        expr("bit_xor(xxhash64(repo, path, sha2(content, 256)))")
          .as("fingerprint")
      )
      .collect()(0)
    println(
      s"""{"metric":"applied-events/sec","value":${"%.1f".format(eps)},"unit":"events/sec","events":$numEvents,"seconds":${"%.2f".format(sec)},"cores":"$cores","final_rows":${fp.getLong(0)},"fingerprint":${fp.getLong(1)},"fence":"${loop.committedFence.format}"}"""
    )
    spark.stop()
  }
}
