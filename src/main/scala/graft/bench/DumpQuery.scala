package graft.bench

import org.apache.spark.sql.SparkSession

/** Dump one `SparkEntry.queries` entry as headered CSV — the debugging /
  * oracle-pinning surface (`runMain graft.bench.DumpQuery <name> <sfDir>
  * <outCsvDir>`).
  */
object DumpQuery {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: DumpQuery <queryName> <sfDir> <outCsvDir>")
    val Array(name, sfDir, out) = args
    val spark = SparkSession
      .builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .appName(s"graft-dump-$name")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try
      graft.SparkEntry
        .queries(name)(spark, sfDir)
        .coalesce(1)
        .write
        .mode("overwrite")
        .option("header", "true")
        .csv(out)
    finally spark.stop()
  }
}
