package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch stage-isolation probe (guide §1.4): times sub-pipelines of the
  * hot queries with the noop sink under the frozen bench session config.
  * Not part of the measured surface — evidence cited in OPTIMIZATION_r07.md.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName("graft-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", s"${16 * 1024 * 1024}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    def d = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(name: String, mk: => DataFrame): Unit = {
      // warm once, then min of 3
      def run(): Double = {
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run()
      val ts = (1 to 3).map(_ => run())
      println(f"[probe] $name%-28s min=${ts.min}%.3f  runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    val k = 5; val numHashes = 32; val bands = 8
    val rows = numHashes / bands
    val withSig = d.select(
      col("doc_id").as("id"),
      graft.functions.GraftFunctions.minhash(col("text"), k, numHashes).as("sig")
    )
    time("sig-only", withSig)
    val banded = withSig
      .select(
        struct(col("id"), col("sig")).as("m"),
        explode(
          array((0 until bands).map { b =>
            struct(
              lit(b).as("band"),
              xxhash64(slice(col("sig"), b * rows + 1, rows)).as("bucket")
            )
          }: _*)
        ).as("bb")
      )
      .select(col("m"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    time("banded-explode", banded)
    val buckets = banded
      .groupBy("band", "bucket")
      .agg(collect_list(col("m")).as("xs"))
      .filter(size(col("xs")) >= 2 && size(col("xs")) <= 2000)
    time("buckets-grouped", buckets)
    val cands = graft.ops.DedupOps.minhashCandidatePairs(
      d, "text", "doc_id", k, numHashes, bands, 2000, minEst = Some(0.35))
    time("cands+distinct", cands)
    // cardinalities: how many pairs the HOF pair-gen emits pre-distinct
    // (sum over buckets of in-bucket ordered est-passing pairs) vs distinct
    val preDistinct = buckets
      .select(
        explode(
          flatten(
            transform(
              col("xs"),
              x =>
                filter(
                  transform(
                    filter(col("xs"), y => x.getField("id") < y.getField("id")),
                    y =>
                      struct(
                        x.getField("id").as("id_a"),
                        y.getField("id").as("id_b"),
                        (graft.functions.GraftFunctions
                          .sigAgree(x.getField("sig"), y.getField("sig"))
                          .cast("double") / numHashes).as("est_jaccard")
                      )
                  ),
                  p => p.getField("est_jaccard") >= 0.35
                )
            )
          )
        ).as("p")
      )
    val allOrdered = buckets.select(
      explode(
        flatten(
          transform(
            col("xs"),
            x =>
              transform(
                filter(col("xs"), y => x.getField("id") < y.getField("id")),
                y => struct(x.getField("id").as("id_a"), y.getField("id").as("id_b"))
              )
          )
        )
      ).as("p")
    )
    println(s"[probe] in-bucket ordered pairs (pre-est): ${allOrdered.count()}")
    println(s"[probe] est-passing pairs (pre-distinct): ${preDistinct.count()}")
    println(s"[probe] distinct candidates: ${cands.count()}")
    val sh = d.select(
      col("doc_id").as("id"),
      graft.functions.GraftFunctions.shingleHashes(col("text"), k).as("sh"))
    time("shingles-only", sh)
    val verified = graft.ops.DedupOps.minhashNearDupPairs(
      d, "text", "doc_id", k, numHashes, bands, 0.5)
    time("full-minhash", verified)
    time("q_minhash_pairs", graft.SparkEntry.queries("q_minhash_pairs")(spark, sfDir))

    spark.stop()
  }
}
