package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** In-session A/B probe of expression formulations (guide §1): times
  * variants interleaved in ONE JVM so machine noise hits both sides.
  * Evidence for OPTIMIZATION_r07.md; not part of the measured surface.
  */
object ProbeExpr {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName("graft-probe-expr")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", s"${16 * 1024 * 1024}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    def d = spark.read.parquet(s"$sfDir/documents.parquet")

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "stats-regex" -> (() =>
        d.select(
          col("doc_id"),
          length(regexp_replace(col("text"), "[^0-9]", "")).as("nd"),
          length(regexp_replace(col("text"), "[^A-Z]", "")).as("nu")
        )),
      "stats-translate" -> (() =>
        d.select(
          col("doc_id"),
          (length(col("text")) - length(translate(col("text"), "0123456789", ""))).as("nd"),
          (length(col("text")) - length(
            translate(col("text"), "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "")
          )).as("nu")
        )),
      "class-regex3" -> (() =>
        d.select(
          size(regexp_extract_all(col("text"), lit("[\\p{Punct}]"), lit(0))).as("p"),
          size(regexp_extract_all(col("text"), lit("[0-9]"), lit(0))).as("g"),
          size(regexp_extract_all(col("text"), lit("[A-Z]"), lit(0))).as("u")
        )),
      "class-translate3" -> (() =>
        d.select(
          graft.ops.TextOps.charClassCount(col("text"), graft.ops.TextOps.AsciiPunct).as("p"),
          graft.ops.TextOps.charClassCount(col("text"), "0123456789").as("g"),
          graft.ops.TextOps
            .charClassCount(col("text"), "ABCDEFGHIJKLMNOPQRSTUVWXYZ")
            .as("u")
        )),
      "bpeish-regex" -> (() =>
        d.select(
          size(
            regexp_extract_all(
              col("text"),
              lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"),
              lit(0)
            )
          ).as("b")
        )),
      "tokens-split" -> (() =>
        d.select(size(filter(split(col("text"), "\\s+"), t => length(t) > 0)).as("t"))),
      "quality-full" -> (() =>
        d.select(graft.ops.TextOps.qualityScoreMicros(col("text")).as("q")))
    )

    def run(mk: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm all
    variants.foreach { case (_, mk) => run(mk) }
    // interleaved rounds
    val times = scala.collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    for (_ <- 1 to 5; (name, mk) <- variants) times(name) = run(mk) :: times(name)
    variants.foreach { case (name, _) =>
      val ts = times(name)
      println(f"[probeexpr] $name%-18s min=${ts.min}%.3f med=${ts.sorted.apply(ts.size / 2)}%.3f")
    }
    spark.stop()
  }
}

/** One-off equivalence probe: does floor(x*100 + 0.5) equal
  * round(x*100).cast(long) on every money value in the test data (all SFs)?
  * Prints mismatch counts — must be 0 before any query swaps the form.
  */
object ProbeRound {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .appName("probe-round").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      for ((t, c) <- Seq(("lineitem", "l_quantity"), ("lineitem", "l_extendedprice"),
                          ("orders", "o_totalprice"))) {
        val df = spark.read.parquet(s"/root/testdata/sf$sf/$t.parquet")
        val n = df.filter(
          round(col(c) * 100).cast("long") =!= floor(col(c) * 100 + 0.5).cast("long")
        ).count()
        val neg = df.filter(col(c) < 0).count()
        println(s"[proberound] sf$sf $t.$c mismatches=$n negatives=$neg")
      }
    }
    spark.stop()
  }
}
