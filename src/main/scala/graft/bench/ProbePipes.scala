package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** In-session A/B of the round-7 pipeline restructures: the OLD shapes
  * (self-join candidate generation behind capBuckets; two-pass CAS
  * accounting; dropDuplicates in the LSH kNN) are reconstructed here
  * verbatim and timed interleaved with the NEW shapes in one JVM, so
  * machine drift hits both sides equally. Evidence for
  * OPTIMIZATION_r07.md; not part of the measured surface.
  */
object ProbePipes {

  private def capBucketsOld(
      df: DataFrame,
      keyCols: Seq[String],
      maxBucketSize: Int
  ): DataFrame = {
    val crowded = df
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__bsize"))
      .filter(col("__bsize") > maxBucketSize)
      .select(keyCols.map(col): _*)
    df.join(broadcast(crowded), keyCols, "left_anti")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName("graft-probe-pipes")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", s"${16 * 1024 * 1024}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.GraftFunctions

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def events = spark.read.parquet(s"$sfDir/events.parquet")

    // ---- OLD minhash candidate pipeline (r6 shape), est-prefilter path --
    def minhashOld(): DataFrame = {
      val k = 5; val numHashes = 32; val bands = 8; val maxBucketSize = 2000
      val t = 0.35
      val rows = numHashes / bands
      val withSig = docs.select(
        col("doc_id").as("id"),
        GraftFunctions.minhash(col("text"), k, numHashes).as("sig")
      )
      val banded = withSig
        .select(
          col("id"),
          col("sig"),
          explode(
            array((0 until bands).map { b =>
              struct(
                lit(b).as("band"),
                xxhash64(slice(col("sig"), b * rows + 1, rows)).as("bucket")
              )
            }: _*)
          ).as("bb")
        )
        .select(col("id"), col("sig"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      val sized = capBucketsOld(banded, Seq("band", "bucket"), maxBucketSize)
      val l = sized.select(col("band"), col("bucket"), col("id").as("id_a"), col("sig").as("sig_a"))
      val r = sized.select(col("band"), col("bucket"), col("id").as("id_b"), col("sig").as("sig_b"))
      val collided = l
        .join(r, Seq("band", "bucket"))
        .filter(col("id_a") < col("id_b"))
        .withColumn(
          "est_jaccard",
          GraftFunctions.sigAgree(col("sig_a"), col("sig_b")).cast("double") / numHashes
        )
        .filter(col("est_jaccard") >= t)
      val cands = collided.select("id_a", "id_b", "est_jaccard").distinct()
      graft.ops.DedupOps.jaccardVerify(cands, docs, "text", "doc_id", k, 0.5)
    }
    def minhashNew(): DataFrame =
      graft.ops.DedupOps.minhashNearDupPairs(docs, "text", "doc_id", 5, 32, 8, 0.5)

    // ---- OLD simhash pipeline (r6 shape) --------------------------------
    def simhashOld(): DataFrame = {
      val maxHamming = 3; val maxBucketSize = 2000
      val chunks = maxHamming + 1
      val withSh = docs.select(
        col("doc_id").as("id"),
        graft.functions.SimHash64.simhash64(col("text")).as("sh")
      )
      def chunkKey(c: Int) = {
        val start = c * 64 / chunks
        val len = (c + 1) * 64 / chunks - start
        val mask = if (len >= 64) -1L else (1L << len) - 1L
        shiftrightunsigned(col("sh"), start).bitwiseAND(lit(mask))
      }
      val chunked = withSh.select(
        col("id"),
        col("sh"),
        explode(
          array((0 until chunks).map { c =>
            struct(lit(c).as("chunk"), chunkKey(c).as("ckey"))
          }: _*)
        ).as("cc")
      ).select(col("id"), col("sh"), col("cc.chunk").as("chunk"), col("cc.ckey").as("ckey"))
      val sized = capBucketsOld(chunked, Seq("chunk", "ckey"), maxBucketSize)
      val l = sized.select(col("chunk"), col("ckey"), col("id").as("id_a"), col("sh").as("sh_a"))
      val r = sized.select(col("chunk"), col("ckey"), col("id").as("id_b"), col("sh").as("sh_b"))
      l.join(r, Seq("chunk", "ckey"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
        .distinct()
        .select(
          col("id_a"),
          col("id_b"),
          bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming")
        )
        .filter(col("hamming") <= maxHamming)
    }
    def simhashNew(): DataFrame =
      graft.ops.DedupOps.simhashPairs(docs, "text", "doc_id", maxHamming = 3)

    // ---- OLD q_cas_gate accounting (two-pass) vs casAudit ---------------
    def casBase() = {
      val e = events.select(
        col("user_id"),
        col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us")
      )
      val current = graft.dedup.LastWriterWins.dedupSalted(
        e.filter(col("event_id") % 2 === 0),
        Seq("user_id"), Seq("ts_us", "event_id"), 8)
      val proposed = e
        .filter(col("event_id") % 2 === 1)
        .withColumn("__deleted", lit(false))
      (current, proposed)
    }
    def casOld(): DataFrame = {
      val (current, proposed) = casBase()
      val accepted = graft.applyops.ApplyPlanner
        .casFilter(proposed, current, Seq("user_id"), Seq("ts_us", "event_id"))
      proposed
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_proposed"))
        .join(
          accepted.groupBy("user_id").agg(count(lit(1)).as("n_accepted")),
          Seq("user_id"),
          "left"
        )
        .select(
          col("user_id"),
          col("n_proposed"),
          coalesce(col("n_accepted"), lit(0L)).as("n_accepted")
        )
    }
    def casNew(): DataFrame = {
      val (current, proposed) = casBase()
      graft.applyops.ApplyPlanner
        .casAudit(proposed, current, Seq("user_id"), Seq("ts_us", "event_id"))
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "minhash-old" -> (() => minhashOld()),
      "minhash-new" -> (() => minhashNew()),
      "simhash-old" -> (() => simhashOld()),
      "simhash-new" -> (() => simhashNew()),
      "cas-old" -> (() => casOld()),
      "cas-new" -> (() => casNew())
    )
    def run(mk: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    variants.foreach { case (_, mk) => run(mk) } // warm
    val times = scala.collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    for (_ <- 1 to 5; (name, mk) <- variants) times(name) = run(mk) :: times(name)
    variants.foreach { case (name, _) =>
      val ts = times(name)
      println(f"[probepipes] $name%-14s min=${ts.min}%.3f med=${ts.sorted.apply(ts.size / 2)}%.3f")
    }
    spark.stop()
  }
}
