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
