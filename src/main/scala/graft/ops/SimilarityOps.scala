package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`array<float>`).
  *
  *  - [[cosine]] / [[dot]]: pure-Catalyst vector math (`zip_with` +
  *    `aggregate`) — codegen'd, no UDF;
  *  - [[knnBruteForce]]: exact top-k — broadcast the (small) query set
  *    against the full base scan; one pass, no shuffle of the base table;
  *  - [[lshBucketKnn]]: the scale path — random-hyperplane LSH codes
  *    (hyperplanes derived deterministically from hash functions, no
  *    stored model), candidates = bucket collisions (shuffle keyed by
  *    bucket), exact cosine re-rank within buckets. Multi-probe via
  *    single-bit flips bounds recall loss.
  */
object SimilarityOps {

  /** Dot product of two float-array columns (double result). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x
    )

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (greatest(norm(a), lit(1e-12)) * greatest(norm(b), lit(1e-12)))

  /** Exact top-k neighbors for each query vector.
    *
    * `queries` is expected to be small (it is broadcast); `base` is scanned
    * once. Per-query top-k is a window over the per-query partition — the
    * partition count equals the query count, so parallelism is preserved
    * for any realistic query batch.
    */
  def knnBruteForce(
      queries: DataFrame, // (qid, qvec)
      base: DataFrame, // (id, vec)
      k: Int = 10
  ): DataFrame = {
    val joined = base.crossJoin(broadcast(queries))
    val scored = joined.withColumn("cos", cosine(col("qvec"), col("vec")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "id", "cos", "rank")
  }

  /** Deterministic random-hyperplane sign bit p for a vector column:
    * sign(sum_i v[i] * h(p, i)) where h is a centered hash — no stored
    * hyperplane matrix, so the "model" is pure code (reproducible across
    * cluster sizes).
    */
  private def planeBit(vec: Column, p: Int): Column = {
    val proj = aggregate(
      zip_with(
        vec,
        sequence(lit(0), size(vec) - 1),
        (x, i) =>
          x.cast("double") *
            (pmod(xxhash64(lit(p), i), lit(2001L)).cast("double") - 1000.0)
      ),
      lit(0.0),
      (acc, x) => acc + x
    )
    when(proj >= 0, lit(1L)).otherwise(lit(0L))
  }

  /** LSH bucket code with `bits` hyperplanes. */
  def lshCode(vec: Column, bits: Int = 8): Column =
    (0 until bits)
      .map(p => shiftleft(planeBit(vec, p), p))
      .reduce((a, b) => a.bitwiseOR(b))

  /** Bucketed ANN: exact cosine, but only within LSH buckets (multi-probe:
    * each query also probes all single-bit-flip neighbor buckets).
    * Returns (qid, id, cos, rank<=k). Recall < 1 by construction; increase
    * `bits` for precision, probes are 1+bits per query.
    */
  def lshBucketKnn(
      queries: DataFrame, // (qid, qvec)
      base: DataFrame, // (id, vec)
      k: Int = 10,
      bits: Int = 8
  ): DataFrame = {
    val baseCoded = base.withColumn("code", lshCode(col("vec"), bits))
    val qCode = lshCode(col("qvec"), bits)
    val probes = array(
      (Seq(qCode) ++ (0 until bits).map(b =>
        qCode.bitwiseXOR(lit(1L << b))
      )): _*
    )
    val qProbed = queries
      .withColumn("code", explode(probes))
    val joined = baseCoded.join(broadcast(qProbed), Seq("code"))
    val scored = joined.withColumn("cos", cosine(col("qvec"), col("vec")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("id"))
    scored
      .dropDuplicates("qid", "id")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "id", "cos", "rank")
  }

  /** Embedding-cosine near-duplicate pairs over one table: LSH-bucket
    * self-join then exact-cosine threshold (near-dup dedup by embeddings).
    */
  def cosineNearDupPairs(
      df: DataFrame, // (id, vec)
      threshold: Double = 0.95,
      bits: Int = 8
  ): DataFrame = {
    val coded = df.withColumn("code", lshCode(col("vec"), bits))
    val l = coded.select(col("code"), col("id").as("id_a"), col("vec").as("vec_a"))
    val r = coded.select(col("code"), col("id").as("id_b"), col("vec").as("vec_b"))
    l.join(r, Seq("code"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("vec_a"), col("vec_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
      .distinct()
  }
}
