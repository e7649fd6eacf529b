package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.Hlc
import graft.stage.StagedStore

/** Plan-inspection driver: prints formatted physical plans for the hot
  * paths so scan pruning / pushdown / aggregation strategy can be reviewed
  * (and regressions spotted) without a debugger.
  */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // staged window scan: expect PartitionFilters on ts_bucket and
    // PushedFilters on nanos
    val stageRoot = java.nio.file.Files
      .createTempDirectory("graft-explain-stage")
      .toString
    val stage = new StagedStore(spark, stageRoot, bucketNanos = 1000L)
    val muts = (0 until 10000)
      .map(i => (s"""["k$i"]""", s"""{"k":"v$i"}""", i.toLong, 0, "f"))
      .toDF("key", "data", "nanos", "logical", "src_file")
    stage.append(muts, 1L)
    println("=== StagedStore.selectWindow(2000, 5000) ===")
    stage.selectWindow(Hlc(2000, 0), Hlc(5000, 0)).explain("formatted")

    println("=== salted LWW dedup (expect 2 aggregate phases, no Window) ===")
    graft.dedup.LastWriterWins
      .dedupSalted(
        muts.toDF(),
        Seq("key"),
        Seq("nanos", "logical"),
        16
      )
      .explain("formatted")

    println("=== q_agg_lineitem on sf0.001 (expect pruned ReadSchema) ===")
    graft.SparkEntry
      .queries("q_agg_lineitem")(spark, "/root/testdata/sf0.001")
      .explain("formatted")

    println("=== q_join_mktsegment (expect BroadcastHashJoin) ===")
    graft.SparkEntry
      .queries("q_join_mktsegment")(spark, "/root/testdata/sf0.001")
      .explain("formatted")

    println("=== knn brute force (expect BroadcastNestedLoopJoin of queries) ===")
    graft.SparkEntry
      .queries("q_knn_cosine")(spark, "/root/testdata/sf0.001")
      .explain("formatted")

    spark.stop()
  }
}
