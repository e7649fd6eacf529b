package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`array<float>`).
  *
  *  - [[cosine]]: native one-pass kernel (dot + norms in a single loop,
  *    bit-identical to the declarative `zip_with`+`aggregate` folds);
  *    [[dot]] stays pure-Catalyst for the centroid-literal IVF path;
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

  /** Cosine similarity — the native one-pass kernel
    * ([[graft.functions.CosineSim]]: dot + both norms in a single loop,
    * no zipped-array allocations, bit-identical accumulation order).
    * Requires `GraftFunctions.register` (every public entry point below
    * does it).
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.cosineSim(a, b)

  /** The composed-builtins cosine, kept as the cross-check oracle for the
    * native kernel (same folds the declarative form always ran).
    */
  private[graft] def cosineDeclarative(a: Column, b: Column): Column =
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
    graft.functions.GraftFunctions.register(base.sparkSession)
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

  /** LSH bucket code with `bits` hyperplanes. `band` offsets the hyperplane
    * seeds so each band is an independent hash family. Native one-pass
    * kernel ([[graft.functions.LshCode]]); bit-identical to
    * [[lshCodeDeclarative]] (golden-tested — same `xxhash64(p, i)` weights
    * via `XXH64.hashInt`, same per-plane accumulation order).
    */
  def lshCode(vec: Column, bits: Int = 8, band: Int = 0): Column =
    graft.functions.GraftFunctions.lshCode(vec, bits, band)

  /** The composed per-plane formulation, kept as the cross-check oracle
    * for the native kernel.
    */
  private[graft] def lshCodeDeclarative(
      vec: Column,
      bits: Int = 8,
      band: Int = 0
  ): Column =
    (0 until bits)
      .map(p => shiftleft(planeBit(vec, band * bits + p), p))
      .reduce((a, b) => a.bitwiseOR(b))

  /** Crowded-bucket cap: drop rows of `df` whose `keyCols` bucket holds more
    * than `maxBucketSize` rows — one degenerate bucket (zero vectors,
    * boilerplate) is an O(m²) self-join otherwise.
    */
  private[ops] def capBuckets(
      df: DataFrame,
      keyCols: Seq[String],
      maxBucketSize: Int
  ): DataFrame = {
    // aggregate + broadcast anti-join instead of a count window: the
    // crowded-key set is tiny by construction (only buckets OVER the cap),
    // so the cap costs one partial-aggregating pass and a broadcast probe —
    // no full sort of the exploded candidate table
    val crowded = df
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__bsize"))
      .filter(col("__bsize") > maxBucketSize)
      .select(keyCols.map(col): _*)
    df.join(broadcast(crowded), keyCols, "left_anti")
  }

  /** Bucketed ANN: exact cosine, but only within LSH buckets (multi-probe:
    * each query also probes all single-bit-flip neighbor buckets).
    * Returns (qid, id, cos, rank<=k). Recall < 1 by construction; increase
    * `bits` for precision, probes are 1+bits per query.
    */
  def lshBucketKnn(
      queries: DataFrame, // (qid, qvec)
      base: DataFrame, // (id, vec)
      k: Int = 10,
      bits: Int = 8,
      /** cap on base rows per LSH bucket: a degenerate bucket would turn the
        * probe join quadratic; dropped rows are recoverable by raising
        * `bits` (finer buckets) rather than scanning the crowd
        */
      maxBucketSize: Int = 100000
  ): DataFrame = {
    graft.functions.GraftFunctions.register(base.sparkSession)
    val baseCoded = capBuckets(
      base.withColumn("code", lshCode(col("vec"), bits)),
      Seq("code"),
      maxBucketSize
    )
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
    // no (qid, id) dedup needed: a base row carries exactly ONE code and a
    // query's 1+bits probe codes are pairwise distinct (flipping different
    // single bits of qCode yields distinct values, none equal to qCode), so
    // each (query, base) pair can match at most one probe row — the former
    // dropDuplicates("qid", "id") was a provable no-op costing a full
    // exchange + aggregate on the candidate set
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "id", "cos", "rank")
  }

  /** Embedding-cosine near-duplicate pairs over one table: banded LSH
    * self-join, crowded-bucket cap, then exact-cosine threshold.
    *
    * `bands` independent `bits`-bit codes: a pair is a candidate when ANY
    * band collides, so recall at similarity s is
    * `1 - (1 - ((1-θ(s)/π)^bits))^bands` — for cos >= 0.99 and the default
    * (6 bits × 12 bands) that is > 1 - 1e-8, i.e. effectively exact at the
    * advertised threshold, while each band still splits the corpus into
    * 2^bits buckets (the MinHash-LSH banding construction applied to
    * random-hyperplane codes). Candidates are deduped as ids BEFORE vectors
    * are re-attached, so the exact-cosine verify runs once per pair, not
    * once per colliding band.
    *
    * @param maxBucketSize per-(band, code) cap; a degenerate bucket (many
    *   zero/identical vectors) would otherwise go quadratic
    */
  def cosineNearDupPairs(
      df: DataFrame, // (id, vec)
      threshold: Double = 0.95,
      bits: Int = 6,
      bands: Int = 12,
      maxBucketSize: Int = 2000
  ): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val coded = df.select(
      col("id"),
      explode(
        array((0 until bands).map { b =>
          struct(lit(b).as("band"), lshCode(col("vec"), bits, b).as("code"))
        }: _*)
      ).as("bc")
    ).select(col("id"), col("bc.band").as("band"), col("bc.code").as("code"))

    // ONE exchange for candidate generation: group by (band, code), emit
    // ordered pairs inside each bucket (same restructure as
    // DedupOps.minhashCandidatePairs — the former capBuckets + self-join
    // planned the LSH-code subtree four times, i.e. four corpus scans and
    // four code computations). The crowded cap is the size() filter
    // (capBuckets semantics: over-cap buckets emit no pairs).
    val buckets = coded
      .groupBy("band", "code")
      .agg(collect_list(col("id")).as("xs"))
      .filter(size(col("xs")) >= 2 && size(col("xs")) <= maxBucketSize)
    val xsc = col("xs")
    val pairsArr = flatten(
      transform(
        xsc,
        x =>
          transform(
            filter(xsc, y => x < y),
            y => struct(x.as("id_a"), y.as("id_b"))
          )
      )
    )
    val pairs = buckets
      .select(explode(pairsArr).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .distinct()

    val vecA = df.select(col("id").as("id_a"), col("vec").as("vec_a"))
    val vecB = df.select(col("id").as("id_b"), col("vec").as("vec_b"))
    pairs
      .join(vecA, "id_a")
      .join(vecB, "id_b")
      .withColumn("cos", cosine(col("vec_a"), col("vec_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  // ------------------------------------------------------------------ IVF

  /** IVF-Flat coarse quantizer: `nlist` centroids trained with Lloyd
    * iterations on a bounded DETERMINISTIC sample of the base (the
    * FAISS-style recipe — training cost is independent of base size; the
    * sample is the `sampleSize` lowest `xxhash64(id)` rows, so the model
    * is reproducible across cluster sizes with no stored state beyond the
    * returned centroids). Centroids are L2-normalized so cosine assignment
    * reduces to a dot product.
    */
  def ivfTrainCentroids(
      base: DataFrame, // (id, vec)
      nlist: Int,
      iters: Int = 5,
      sampleSize: Int = 4096
  ): Array[Array[Double]] = {
    require(nlist >= 1)
    // cast to array<double> BEFORE collecting: the base may carry
    // array<float> (stored embeddings) or array<double> (any
    // Catalyst-computed vector) — the cast makes the driver-side decode
    // element-type-agnostic
    val sample: Array[Array[Double]] = base
      .orderBy(xxhash64(col("id")), col("id"))
      .limit(sampleSize)
      .select(col("vec").cast("array<double>"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
      .filter(_.nonEmpty)
    require(sample.length >= nlist, s"need >= $nlist sample vectors")
    val dim = sample(0).length
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.max(1e-12, math.sqrt(v.map(x => x * x).sum))
      v.map(_ / n)
    }
    def nearest(cents: Array[Array[Double]], v: Array[Double]): Int = {
      var best = 0; var bestDot = Double.MinValue; var c = 0
      while (c < cents.length) {
        var d = 0.0; var i = 0
        while (i < dim) { d += cents(c)(i) * v(i); i += 1 }
        if (d > bestDot) { bestDot = d; best = c }
        c += 1
      }
      best
    }
    var cents = sample.take(nlist).map(normalize)
    (0 until iters).foreach { _ =>
      val sums = Array.fill(nlist)(new Array[Double](dim))
      val counts = new Array[Long](nlist)
      sample.foreach { v =>
        val c = nearest(cents, v)
        var i = 0
        while (i < dim) { sums(c)(i) += v(i); i += 1 }
        counts(c) += 1
      }
      cents = cents.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old // empty list keeps its centroid
        else normalize(sums(c).map(_ / counts(c)))
      }
    }
    cents
  }

  private def centsLiteral(cents: Array[Array[Double]]): Column =
    array(cents.map(c => array(c.map(lit): _*)): _*)

  /** Above this many centroid elements (nlist x dim) the quantizer stops
    * embedding centroids as a plan literal — a multi-million-node
    * expression tree would blow up analysis/codegen — and switches to a
    * broadcast centroid matrix consumed by a (deterministically identical)
    * UDF. The literal path stays preferable below the cap: whole-stage
    * codegen, no serialization.
    */
  val CentroidLiteralMaxElems: Int = 16384

  /** driver-side argmax-dot — the single source of the assignment rule
    * shared by training, the literal column and the broadcast UDF (first
    * index wins ties, matching array_position-of-max)
    */
  private def nearestIdx(cents: Array[Array[Double]], v: Seq[Double]): Int = {
    var best = 0; var bestDot = Double.MinValue; var c = 0
    while (c < cents.length) {
      var d = 0.0; var i = 0
      val row = cents(c)
      val n = math.min(row.length, v.length)
      while (i < n) { d += row(i) * v(i); i += 1 }
      if (d > bestDot) { bestDot = d; best = c }
      c += 1
    }
    best
  }

  /** probe order: centroid indices by dot desc, index asc — identical to
    * the literal path's array_sort(struct(-sim, idx))
    */
  private def topProbeIdx(
      cents: Array[Array[Double]],
      v: Seq[Double],
      probes: Int
  ): Seq[Int] =
    cents.indices
      .map { c =>
        var d = 0.0; var i = 0
        val row = cents(c)
        val n = math.min(row.length, v.length)
        while (i < n) { d += row(i) * v(i); i += 1 }
        (-d, c)
      }
      .sorted
      .take(probes)
      .map(_._2)

  /** Nearest-centroid list id for a vector column (argmax dot against the
    * normalized centroid literal — pure Catalyst, codegen'd).
    */
  def ivfListId(vec: Column, cents: Array[Array[Double]]): Column = {
    val sims = transform(centsLiteral(cents), c => dot(vec, c))
    (array_position(sims, array_max(sims)) - 1).cast("int")
  }

  /** [[ivfListId]] with the automatic literal/broadcast switch for large
    * quantizers (see [[CentroidLiteralMaxElems]]).
    */
  def ivfListIdAuto(
      spark: org.apache.spark.sql.SparkSession,
      vec: Column,
      cents: Array[Array[Double]],
      literalMaxElems: Int = CentroidLiteralMaxElems
  ): Column =
    if (cents.length.toLong * cents.headOption.map(_.length).getOrElse(0) <= literalMaxElems)
      ivfListId(vec, cents)
    else {
      val bc = spark.sparkContext.broadcast(cents)
      udf((v: Seq[Double]) => nearestIdx(bc.value, v))
        .apply(vec.cast("array<double>"))
    }

  /** per-query probe list ids (array column of the `probes` nearest
    * centroid indices), with the same literal/broadcast switch
    */
  private def probeIdsCol(
      spark: org.apache.spark.sql.SparkSession,
      qvec: Column,
      cents: Array[Array[Double]],
      probes: Int,
      literalMaxElems: Int
  ): Column = {
    val nlist = cents.length
    if (nlist.toLong * cents.headOption.map(_.length).getOrElse(0) <= literalMaxElems) {
      val simIdx = zip_with(
        transform(centsLiteral(cents), c => dot(qvec, c)),
        sequence(lit(0), lit(nlist - 1)),
        (s, i) => struct((-s).as("neg"), i.as("idx"))
      )
      transform(
        slice(array_sort(simIdx), 1, probes),
        p => p.getField("idx").cast("int")
      )
    } else {
      val bc = spark.sparkContext.broadcast(cents)
      udf((v: Seq[Double]) => topProbeIdx(bc.value, v, probes))
        .apply(qvec.cast("array<double>"))
    }
  }

  /** IVF-Flat search: assign the base to inverted lists, probe the
    * `nprobe` nearest lists per query, exact cosine re-rank within the
    * probed lists. `nprobe == nlist` probes every list and is EXACTLY
    * brute force (the oracle mode); smaller `nprobe` trades recall for a
    * `nprobe/nlist` scan fraction — the 100 TB path: the inverted-list
    * assignment is computed once per base (in practice persisted as a
    * partition column, so a probe prunes whole partitions).
    * Returns (qid, id, cos, rank <= k).
    */
  def ivfSearch(
      queries: DataFrame, // (qid, qvec)
      base: DataFrame, // (id, vec)
      cents: Array[Array[Double]],
      k: Int = 10,
      nprobe: Int = 4,
      literalMaxElems: Int = CentroidLiteralMaxElems
  ): DataFrame = {
    val spark = base.sparkSession
    val nlist = cents.length
    val probes = math.min(nprobe, nlist)
    val assigned =
      base.withColumn("list_id", ivfListIdAuto(spark, col("vec"), cents, literalMaxElems))
    val probed = queries.withColumn(
      "list_id",
      explode(probeIdsCol(spark, col("qvec"), cents, probes, literalMaxElems))
    )
    probed
      .join(assigned, "list_id") // shuffle keyed by list id: scan fraction = nprobe/nlist
      .withColumn("cos", cosine(col("qvec"), col("vec")))
      .withColumn(
        "rank",
        row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("id"))
        )
      )
      .filter(col("rank") <= k)
      .select("qid", "id", "cos", "rank")
  }

  /** Persist an IVF index: the base written ONCE with its inverted-list
    * assignment as a parquet PARTITION column. This is the 100 TB layout:
    * a probe against the index reads only the probed `list_id=` directories
    * (PartitionFilters — whole partitions never open), so per-query scan
    * cost is nprobe/nlist of the base regardless of base size. Assignment
    * is computed in one distributed pass; no shuffle (partitionBy writes
    * directory-per-list from each task).
    */
  def ivfBuildIndex(
      base: DataFrame, // (id, vec)
      cents: Array[Array[Double]],
      path: String,
      literalMaxElems: Int = CentroidLiteralMaxElems
  ): Unit =
    base
      .withColumn(
        "list_id",
        ivfListIdAuto(base.sparkSession, col("vec"), cents, literalMaxElems)
      )
      .write
      .mode("overwrite")
      .partitionBy("list_id")
      .parquet(path)

  /** Search a persisted IVF index (see [[ivfBuildIndex]]): the distinct
    * probe set (≤ queries × nprobe ints) is resolved driver-side into a
    * LITERAL `list_id IN (...)` filter, so the scan prunes unprobed
    * partitions statically — `.explain` shows `PartitionFilters` on
    * `list_id`. The query side is evaluated twice (once for the probe set,
    * once for the join); query batches are small by construction.
    * Full probe (`nprobe == nlist`) is exactly brute force.
    */
  def ivfSearchIndexed(
      queries: DataFrame, // (qid, qvec)
      indexPath: String,
      cents: Array[Array[Double]],
      k: Int = 10,
      nprobe: Int = 4,
      literalMaxElems: Int = CentroidLiteralMaxElems
  ): DataFrame = {
    val spark = queries.sparkSession
    val probes = math.min(nprobe, cents.length)
    val probed = queries.withColumn(
      "list_id",
      explode(probeIdsCol(spark, col("qvec"), cents, probes, literalMaxElems))
    )
    val probeSet: Array[Int] =
      probed.select("list_id").distinct().collect().map(_.getInt(0))
    val index = spark.read.parquet(indexPath)
    val pruned =
      if (probeSet.isEmpty) index.filter(lit(false))
      else index.filter(col("list_id").isin(probeSet.map(i => lit(i)): _*))
    probed
      .join(pruned, "list_id")
      .withColumn("cos", cosine(col("qvec"), col("vec")))
      .withColumn(
        "rank",
        row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("id"))
        )
      )
      .filter(col("rank") <= k)
      .select("qid", "id", "cos", "rank")
  }
}
