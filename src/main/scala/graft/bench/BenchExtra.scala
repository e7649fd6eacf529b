package graft.bench

import org.apache.spark.sql.SparkSession

/** Round-7 optimization harness (guide §1): times ONLY the headline query
  * suite with exactly the frozen Bench methodology — same session config,
  * same sf0.001 warmup pass, same noop sink at the target SF — so per-query
  * numbers are comparable to `graft.Bench` phase 1 without paying for the
  * replay phase on every iteration. Optionally repeats the suite and prints
  * min-of-k per query (steal on this box is bursty; min is the
  * noise-minimizing estimator of a query's true cost).
  *
  * Usage: `sbt "runMain graft.bench.BenchExtra [repeats] [q1,q2,...]"`
  */
object BenchExtra {

  private def mkSession(cores: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(s"graft-benchextra-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", s"${16 * 1024 * 1024}")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  val headline = Seq(
    "q_lww_dedup",
    "q_lww_salted",
    "q_cdc_apply",
    "q_cas_gate",
    "q_fence_window",
    "q_agg_lineitem",
    "q_join_mktsegment",
    "q_window_rank",
    "q_dedup_exact",
    "q_token_count",
    "q_text_stats",
    "q_quality_score",
    "q_minhash_pairs",
    "q_simhash_pairs",
    "q_knn_cosine",
    "q_knn_lsh"
  )

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val repeats = if (args.length > 0) args(0).toInt else 1
    val names =
      if (args.length > 1) args(1).split(",").toSeq else headline
    val spark = mkSession(cpus)
    names.foreach { name =>
      try graft.SparkEntry
        .queries(name)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case scala.util.control.NonFatal(_) => () }
    }
    val samples = scala.collection.mutable.Map
      .empty[String, List[Double]]
      .withDefaultValue(Nil)
    for (r <- 1 to repeats; name <- names) {
      spark.sparkContext.setJobDescription(s"$name#$r")
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        samples(name) = ((System.nanoTime() - t0) / 1e9) :: samples(name)
      } catch {
        case e: Throwable =>
          System.err.println(s"[benchextra] $name failed: ${e.getMessage}")
          samples(name) = -1.0 :: samples(name)
      }
    }
    val mins = names.map(n => n -> samples(n).min)
    val qs = mins
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val all = names
      .map(n =>
        "\"" + n + "\":" + samples(n).reverse
          .map(v => f"$v%.3f")
          .mkString("[", ",", "]")
      )
      .mkString("{", ",", "}")
    val total = mins.filter(_._2 >= 0).map(_._2).sum
    println(
      s"""{"metric":"queries_min","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"samples":$all,"sf":"$sfDir","repeats":$repeats}"""
    )
    spark.stop()
  }
}
