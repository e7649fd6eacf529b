package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reproducible sampling for corpus construction.
  *
  * Training-data pipelines need samples that are (a) deterministic across
  * re-runs and cluster sizes (no RNG state, no partition-order
  * dependence), (b) cheap at 100 TB (a pure filter — no shuffle, no
  * sort), and (c) reproducible by OTHER engines auditing the corpus
  * (hence md5, which every SQL system ships, rather than an
  * engine-private hash). Membership is a pure function of (id, salt), so
  * samples with different salts are independent, and growing a fraction
  * keeps the smaller sample as a subset — the standard trick for
  * carving train/eval splits that never leak as the mix is re-weighted.
  */
object SampleOps {

  /** Uniform [0, 1) hash of an id: first 8 md5 hex digits / 2^32. */
  def hashUnit(id: Column, salt: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("long") / lit(4294967296.0)

  /** Bernoulli-by-hash sample: keep rows whose unit hash falls below
    * `fraction`. A pure filter — scan-pruned columns, no shuffle, exact
    * reproducibility anywhere md5 exists.
    */
  def hashSample(
      df: DataFrame,
      idCol: String,
      fraction: Double,
      salt: String = "graft"
  ): DataFrame =
    df.filter(hashUnit(col(idCol), salt) < fraction)

  /** Deterministic named split (train/val/test …): label every row by
    * where its unit hash falls among cumulative fraction cutoffs. A pure
    * projection — no shuffle, no RNG state, reproducible by any engine
    * with md5 — and REBALANCE-STABLE: because membership is a fixed
    * point on the [0,1) line, growing one split's fraction only converts
    * rows across the adjacent boundary; existing test-set rows can never
    * silently migrate into train when the ratios are retuned (the leak
    * that random re-splits cause). Fractions must sum to 1 (the last
    * split absorbs the remainder exactly). Cumulative cutoffs are
    * computed in the same IEEE order an auditing engine would, so
    * cross-engine agreement is bit-exact when the fractions are binary
    * representable (prefer 0.75/0.125/0.125 over 0.8/0.1/0.1).
    */
  def assignSplit(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Double)],
      salt: String = "graft",
      splitCol: String = "split"
  ): DataFrame = {
    require(splits.size >= 2, "need at least two splits")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9, "fractions must sum to 1")
    val u = hashUnit(col(idCol), salt)
    val cutoffs = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val labeled = splits.init.zip(cutoffs.init).foldLeft(None: Option[Column]) {
      case (acc, ((name, _), cut)) =>
        Some(acc match {
          case None    => when(u < cut, name)
          case Some(c) => c.when(u < cut, name)
        })
    }
    df.withColumn(splitCol, labeled.get.otherwise(splits.last._1))
  }

  /** Stratified variant: per-stratum sampling fractions (corpus mixing
    * weights, e.g. by language or source). Strata absent from the map are
    * dropped. Still a pure filter: the weights ride as a map literal
    * (`try_element_at` — ANSI-safe on missing keys), so there is no join
    * and no shuffle regardless of stratum skew.
    */
  /** Token-budgeted mixture planning: per-stratum Bernoulli fractions that
    * hit each stratum's token budget in expectation, from exact per-stratum
    * totals (`fraction = min(1, budget / total)`; a stratum with no budget
    * or no rows is omitted — downstream [[stratifiedHashSample]] drops it).
    * One groupBy over the strata column (driver result is
    * strata-cardinality-sized — languages/sources, not rows), then the
    * sample itself remains a pure filter: the standard re-weighting loop
    * for corpus mixing, with the subset property preserved as budgets grow.
    */
  def mixtureFractions(
      df: DataFrame,
      strataCol: String,
      weightCol: String,
      budgets: Map[String, Long]
  ): Map[String, Double] = {
    val totals: Map[String, Long] = df
      .groupBy(col(strataCol))
      .agg(sum(col(weightCol)).cast("long").as("t"))
      .collect()
      .flatMap(r => Option(r.get(0)).map(s => s.toString -> r.getLong(1)))
      .toMap
    budgets.flatMap { case (s, b) =>
      totals.get(s).filter(_ > 0).map(t => s -> math.min(1.0, b.toDouble / t))
    }
  }

  /** Contiguous sequence packing — the "concatenate the corpus in a
    * deterministic order, then chunk into fixed-length token windows" step
    * of LLM pretraining data assembly. Every document is assigned the
    * window (`seq_id`) its first token lands in plus its offset inside
    * that window; documents straddle window boundaries exactly as the
    * concatenated stream does, and consumers slice accordingly. Output:
    * `(id, toks, seq_id, tok_offset)`, deterministic (the order is the
    * sort on `idCol` — no RNG, no partition-order dependence).
    *
    * Scale shape: the naive formulation — `SUM(toks) OVER (ORDER BY id)`
    * — funnels the whole corpus through ONE partition. This is the
    * classic two-pass parallel prefix sum instead: range-partition by id,
    * per-partition ordered cumsum (window PARTITIONED BY the physical
    * partition, fully parallel), per-partition totals collected to the
    * driver (O(partitions) rows) and broadcast back as prefix offsets.
    * No single-partition stage anywhere. The two passes execute the same
    * range-partitioned subtree twice; that is sound because Spark's range
    * partitioning is DETERMINISTIC for a given input (stage retries
    * require it), so both passes see identical boundaries and the prefix
    * offsets line up — and the OUTPUT is additionally boundary-agnostic
    * (any monotone id split yields the same global cumsum), which the
    * multi-partition == single-partition spec pins.
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      tokCol: String,
      seqLen: Long,
      numPartitions: Int = 0
  ): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val ranged = df
      .select(col(idCol).cast("long").as("id"), col(tokCol).cast("long").as("toks"))
      .repartitionByRange(parts, col("id"))
      .sortWithinPartitions("id")
      .withColumn("__part", org.apache.spark.sql.functions.spark_partition_id())
    // pass 1: per-partition totals -> driver-side exclusive prefix
    // (bounded: one row per partition)
    val totals = ranged
      .groupBy("__part")
      .agg(sum("toks").as("t"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    // pass 2: within-partition exclusive cumsum + broadcast prefix join
    import org.apache.spark.sql.expressions.Window
    val w = Window
      .partitionBy("__part")
      .orderBy("id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixDf = spark.createDataFrame(exclusivePrefix(totals)).toDF("__part", "__prefix")
    ranged
      .join(broadcast(prefixDf), Seq("__part"))
      .withColumn(
        "__cum_before",
        coalesce(sum(col("toks")).over(w), lit(0L)) + col("__prefix")
      )
      .select(
        col("id"),
        col("toks"),
        // integer DIV, not `/`: long / long is a DOUBLE in Spark SQL and
        // loses exactness past 2^53 — corpus token counts get there
        expr(s"__cum_before DIV $seqLen").as("seq_id"),
        pmod(col("__cum_before"), lit(seqLen)).as("tok_offset")
      )
  }

  /** Exclusive prefix sum of per-partition totals, keyed by partition id
    * (missing/empty partitions contribute 0).
    */
  private def exclusivePrefix(totals: Map[Int, Long]): Seq[(Int, Long)] = {
    val ids = totals.keys.toSeq.sorted
    var acc = 0L
    ids.map { p =>
      val out = (p, acc)
      acc += totals(p)
      out
    }
  }

  def stratifiedHashSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      fractions: Map[String, Double],
      salt: String = "graft"
  ): DataFrame = {
    // a zero-arg map() literal is map<void,void> and fails analysis under
    // try_element_at; the documented "unlisted strata drop" semantics make
    // the empty-weights result the empty frame
    if (fractions.isEmpty) return df.filter(lit(false))
    val fmap = map(
      fractions.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*
    )
    df.filter(
      hashUnit(col(idCol), salt) <
        coalesce(try_element_at(fmap, col(strataCol)), lit(0.0))
    )
  }
}
