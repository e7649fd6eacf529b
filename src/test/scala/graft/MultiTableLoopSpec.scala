package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.types._
import graft.applyops.TableSpec
import graft.loop.{MultiTableLoop, TableTarget}
import graft.model.Hlc
import graft.stage.StagedStore
import graft.table.SnapshotTable

/** Multi-table webhook ingest with FK-level ordered apply — the analog of
  * the reference's 3-table FK-chain backfill test
  * (reference: internal/source/cdc/handler_test.go:403-540, scaled down).
  */
class MultiTableLoopSpec extends SparkSpec {
  import spark.implicits._

  test("webhook feed routes topics to tables, FK levels, one global fence") {
    val base = tmpDir("mtl")
    val feedDir = s"$base/feed"
    Files.createDirectories(Paths.get(feedDir))

    def mut(topic: String, pk: Int, v: String, ts: Long): String =
      s"""{"after":{"pk":$pk,"v":"$v"},"key":[$pk],"topic":"$topic","updated":"$ts.0000000000"}"""

    val bodies = Seq(
      s"""{"payload":[${mut("child", 1, "c1", 10)},${mut("parent", 1, "p1", 11)}],"length":2}""",
      s"""{"payload":[${mut("parent", 2, "p2", 12)},${mut("child", 2, "c2", 13)},${mut("child", 1, "c1b", 14)}],"length":3}""",
      s"""{"resolved":"20.0000000000"}"""
    )
    Files.writeString(Paths.get(feedDir, "0001.json"), bodies.mkString("\n"))

    val schema = StructType(
      Seq(StructField("pk", IntegerType), StructField("v", StringType))
    )
    def target(name: String) = TableTarget(
      TableSpec(schema, Seq("pk")),
      new SnapshotTable(spark, s"$base/$name/table", numBuckets = 4),
      new StagedStore(spark, s"$base/$name/stage", bucketNanos = 100L)
    )
    val targets = Map("parent" -> target("parent"), "child" -> target("child"))
    val loop = new MultiTableLoop(
      spark,
      feedDir,
      targets,
      dependsOn = Map("child" -> Set("parent")),
      checkpointDir = s"$base/checkpoint",
      saltBuckets = 4,
      maxFilesPerTrigger = 4
    )
    loop.runAvailableNow()

    val parents = targets("parent").table
      .read()
      .select("pk", "v")
      .as[(Int, String)]
      .collect()
      .toSet
    val children = targets("child").table
      .read()
      .select("pk", "v")
      .as[(Int, String)]
      .collect()
      .toSet
    assert(parents == Set((1, "p1"), (2, "p2")))
    assert(children == Set((1, "c1b"), (2, "c2"))) // LWW: c1b@14 beats c1@10
    assert(loop.committedFence == Hlc(20L, 0))

    // parent commits before child within the same fence (FK order)
    val pc = targets("parent").table.log.latest().get.committedAtMs
    val cc = targets("child").table.log.latest().get.committedAtMs
    assert(pc <= cc)

    // nothing staged beyond the fence => no pending topics (S12 analog)
    assert(loop.pendingTopics().isEmpty)
  }
}
