package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.SimHash64

/** Deduplication operators for training-data pipelines, each shaped for the
  * 100 TB path:
  *
  *  - exact dedup: hash-groupBy (one shuffle on the content hash);
  *  - MinHash + LSH near-dup: shingle → minhash signature (narrow) →
  *    band-bucket self-join (shuffle keyed by (band, bucket), so only
  *    colliding candidates ever meet) → exact Jaccard verify on candidates;
  *  - SimHash near-dup: 64-bit fingerprint (custom Catalyst expression) →
  *    16-bit chunk banding (Hamming-distance LSH) → bit_count verify.
  *
  * No pairwise O(n²) stage ever materializes: all candidate generation is
  * bucket-join based.
  */
object DedupOps {

  /** Character k-gram shingles of a text column (distinct). Texts shorter
    * than k contribute themselves as a single shingle.
    */
  def shingles(text: Column, k: Int = 5): Column =
    when(length(text) < k, array(text)).otherwise(
      array_distinct(
        transform(
          sequence(lit(0), length(text) - k),
          i => text.substr(i + 1, lit(k))
        )
      )
    )

  /** MinHash signature (array of `numHashes` longs) over the k-gram shingle
    * set — the native single-pass expression ([[graft.functions.MinHashSig]];
    * ~50x the declarative transform+array_min formulation, which re-walks
    * and re-hashes the shingles per hash function). Requires
    * `GraftFunctions.register` (done by [[minhashCandidatePairs]]).
    */
  def minhashSignature(text: Column, k: Int = 5, numHashes: Int = 32): Column =
    graft.functions.GraftFunctions.minhash(text, k, numHashes)

  /** The composed-builtins formulation, kept as the cross-check oracle for
    * the native expression (same shape, different hash family).
    */
  def minhashSignatureDeclarative(
      text: Column,
      k: Int = 5,
      numHashes: Int = 32
  ): Column = {
    val sh = shingles(text, k)
    val sig = (0 until numHashes).map { h =>
      array_min(transform(sh, s => xxhash64(s, lit(h))))
    }
    array(sig: _*)
  }

  /** Exact duplicate groups: one row per distinct content hash with the
    * number of copies and the representative (minimum) id.
    */
  def exactDupGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(TextOps.contentHash(col(textCol)).as("content_sha"))
      .agg(
        count(lit(1)).as("copies"),
        min(col(idCol)).as("keep_id")
      )

  /** Exact dedup: keep the min-id row per content hash. */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val h = TextOps.contentHash(col(textCol)).as("__sha")
    df.withColumn("__sha", h)
      .groupBy(col("__sha"))
      .agg(min_by(struct(df.columns.map(col): _*), col(idCol)).as("__row"))
      .select(df.columns.map(c => col(s"__row.`$c`").as(c)): _*)
  }

  /** MinHash-LSH candidate pairs: ids whose signatures collide in at least
    * one band of `rows` consecutive minhashes. Returns (id_a, id_b) with
    * id_a < id_b, distinct, plus the estimated Jaccard from full-signature
    * agreement.
    */
  /** @param maxBucketSize LSH buckets larger than this are skipped: a
    *   bucket of m docs contributes m(m-1)/2 candidates, so one degenerate
    *   bucket (boilerplate, empty docs) can go quadratic. Skipped buckets
    *   only lose candidates whose similarity the OTHER bands still witness;
    *   surfaced in the `crowded_buckets_skipped` driver log line rather than
    *   silently dropped.
    */
  /** @param minEst when set, collided pairs with a signature-estimated
    *   Jaccard below this are dropped BEFORE the pair-dedup shuffle — the
    *   prefilter runs where the estimate is cheapest (both signatures are
    *   already on the joined row), so the low-precision band noise never
    *   reaches the distinct() or any downstream join.
    */
  def minhashCandidatePairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 5,
      numHashes: Int = 32,
      bands: Int = 8,
      maxBucketSize: Int = 2000,
      minEst: Option[Double] = None
  ): DataFrame = {
    require(numHashes % bands == 0)
    graft.functions.GraftFunctions.register(df.sparkSession)
    val rows = numHashes / bands
    val withSig = df.select(
      col(idCol).as("id"),
      minhashSignature(col(textCol), k, numHashes).as("sig")
    )
    // Candidate generation is ONE exchange: banded rows group by
    // (band, bucket) and pairs are generated inside each bucket. The former
    // self-join shape (l ⋈ r on the band key, capBuckets in front) planned
    // the banded subtree FOUR times — twice for the join sides, twice for
    // the crowded-bucket aggregate — i.e. four corpus scans and four
    // signature passes per run; grouping computes the signature once and
    // shuffles the banded bytes once. The bucket-size cap falls out for
    // free as a size() filter on the collected bucket (identical semantics:
    // capBuckets dropped every row of an over-cap bucket, so neither shape
    // emits pairs from crowded buckets; size-1 buckets produce no pairs and
    // are skipped too). Per-group memory is bounded by the cap
    // (maxBucketSize * (8 B id + numHashes*8 B sig)).
    //
    // With a prefilter (minEst set), signatures ride the banded row (a few
    // hundred bytes) so est_jaccard is computed inside the bucket and false
    // candidates are dropped BEFORE the pair-dedup shuffle; the estimate
    // uses the native agree-count kernel ([[graft.functions.SigAgree]]),
    // evaluated per in-bucket pair. Without minEst the estimate buys
    // nothing, so buckets collect ids only.
    val carrySig = minEst.isDefined
    val member =
      if (carrySig) struct(col("id"), col("sig")) else struct(col("id"))
    val banded = withSig
      .select(
        member.as("m"),
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
    val buckets = banded
      .groupBy("band", "bucket")
      .agg(collect_list(col("m")).as("xs"))
      .filter(size(col("xs")) >= 2 && size(col("xs")) <= maxBucketSize)

    val xs = col("xs")
    minEst match {
      case Some(t) =>
        // in-bucket ordered pairs with the estimate prefilter applied at
        // the generation site; collect_list order is nondeterministic but
        // the emitted PAIR SET (id_a < id_b) is order-invariant and
        // est_jaccard is a pure function of the pair, so the distinct
        // collapses multi-band collisions exactly as before
        val pairsArr = flatten(
          transform(
            xs,
            x =>
              filter(
                transform(
                  filter(xs, y => x.getField("id") < y.getField("id")),
                  y =>
                    struct(
                      x.getField("id").as("id_a"),
                      y.getField("id").as("id_b"),
                      (graft.functions.GraftFunctions
                        .sigAgree(x.getField("sig"), y.getField("sig"))
                        .cast("double") / numHashes).as("est_jaccard")
                    )
                ),
                p => p.getField("est_jaccard") >= t
              )
          )
        )
        buckets
          .select(explode(pairsArr).as("p"))
          .select(
            col("p.id_a").as("id_a"),
            col("p.id_b").as("id_b"),
            col("p.est_jaccard").as("est_jaccard")
          )
          .distinct()
      case None =>
        val pairsArr = flatten(
          transform(
            xs,
            x =>
              transform(
                filter(xs, y => x.getField("id") < y.getField("id")),
                y =>
                  struct(
                    x.getField("id").as("id_a"),
                    y.getField("id").as("id_b")
                  )
              )
          )
        )
        buckets
          .select(explode(pairsArr).as("p"))
          .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
          .distinct()
    }
  }

  /** The full near-dup pipeline: MinHash-LSH candidates → signature-based
    * estimate PREFILTER → exact n-gram-Jaccard verify.
    *
    * The prefilter is the stage that makes exact verification affordable:
    * band collisions are high-recall/low-precision (at sf0.1 ~386k
    * candidates hide ~256 true pairs), and intersecting full shingle sets
    * for every false candidate dominates runtime. `est_jaccard` from the
    * 32-hash signature is already computed per pair; keeping only
    * `est >= threshold - margin` drops the noise. Recall contract at the
    * default margin 0.15 (Binomial(32, j) tail): ≈0.975 for a pair exactly
    * AT the threshold, ≥0.999 at t+0.1, indistinguishable from 1 for real
    * near-duplicates (j ≥ 0.8). Raise `estMargin` to trade runtime for
    * boundary recall.
    */
  def minhashNearDupPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 5,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.5,
      estMargin: Double = 0.15,
      maxBucketSize: Int = 2000
  ): DataFrame = {
    val cands = minhashCandidatePairs(
      df, textCol, idCol, k, numHashes, bands, maxBucketSize,
      minEst = Some(threshold - estMargin)
    )
    jaccardVerify(cands, df, textCol, idCol, k, threshold)
  }

  /** Exact n-gram Jaccard for a pair table `(id_a, id_b)` against the
    * source: verification stage after LSH candidate generation.
    */
  def jaccardVerify(
      pairs: DataFrame,
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 5,
      threshold: Double = 0.7
  ): DataFrame = {
    // shingles travel and intersect as xxhash64 LONGS, not strings: the
    // set operations hit Spark's primitive fast path (~an order of
    // magnitude cheaper than UTF8 compares) and the join payload shrinks
    // ~4x. |A∩B| over 64-bit hashes equals the string-set value except on
    // hash collisions (≈1e-13 per pair at 500 shingles) — exact for every
    // practical purpose, including the DuckDB all-pairs oracle. The hashing
    // itself is the native one-pass [[graft.functions.ShingleHashes]]
    // kernel (no per-window substring materialization).
    graft.functions.GraftFunctions.register(df.sparkSession)
    val sh = df.select(
      col(idCol).as("id"),
      graft.functions.GraftFunctions.shingleHashes(col(textCol), k).as("sh")
    )
    val na = size(col("sh_a"))
    val nb = size(col("sh_b"))
    // ShingleHashes emits SORTED arrays, so the intersect is one merge
    // walk per pair — no per-pair hash-set build (array_intersect's cost)
    val inter = graft.functions.GraftFunctions
      .sortedIntersectCount(col("sh_a"), col("sh_b"))
    pairs
      .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      // size-ratio gate BEFORE any set work: |A∩B| <= min(|A|,|B|), so
      // J >= t forces min >= t * (|A|+|B|) / (1+t) — a pair failing that
      // on SIZES alone can never verify, and sizes are O(1) reads while
      // the intersect is O(|A|+|B|) hashing
      .filter(least(na, nb) * (1 + threshold) >= (na + nb) * threshold)
      .withColumn(
        // |A∪B| = |A| + |B| - |A∩B| (both arrays are distinct): one set
        // build instead of two — array_union would re-hash both arrays a
        // second time for a size we already know
        "jaccard",
        inter.cast("double") / (na + nb - inter)
      )
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** SimHash near-duplicate pairs: 64-bit simhash banded into
    * `maxHamming + 1` disjoint bit chunks, verified with
    * `bit_count(a XOR b) <= maxHamming`.
    *
    * The chunk count is DERIVED from `maxHamming` so the pigeonhole
    * guarantee always matches the query: two fingerprints within Hamming
    * distance H differ in at most H of the C = H+1 chunks, so they agree
    * exactly on at least one chunk and are guaranteed to collide — recall 1
    * at the advertised radius (the classic Hamming-LSH banding argument;
    * Charikar '02 fingerprints). Chunks cover all 64 bits with widths
    * differing by at most one.
    *
    * @param maxBucketSize chunk buckets larger than this are skipped — one
    *   boilerplate-heavy bucket (e.g. the all-zero chunk of empty docs) is
    *   an O(m²) self-join otherwise. A skipped bucket only loses pairs whose
    *   OTHER agreeing chunks are also crowded.
    */
  def simhashPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int = 3,
      maxBucketSize: Int = 2000
  ): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, "maxHamming must be in [0, 63]")
    val chunks = maxHamming + 1
    val withSh = df.select(
      col(idCol).as("id"),
      SimHash64.simhash64(col(textCol)).as("sh")
    )
    // chunk i covers bits [i*64/C, (i+1)*64/C): disjoint, exhaustive
    def chunkKey(c: Int): Column = {
      val start = c * 64 / chunks
      val len = (c + 1) * 64 / chunks - start
      val mask = if (len >= 64) -1L else (1L << len) - 1L
      shiftrightunsigned(col("sh"), start).bitwiseAND(lit(mask))
    }
    val chunked = withSh.select(
      struct(col("id"), col("sh")).as("m"),
      explode(
        array((0 until chunks).map { c =>
          struct(lit(c).as("chunk"), chunkKey(c).as("ckey"))
        }: _*)
      ).as("cc")
    ).select(col("m"), col("cc.chunk").as("chunk"), col("cc.ckey").as("ckey"))

    // ONE exchange: group by (chunk, ckey) and emit pairs inside each
    // bucket (same restructure as minhashCandidatePairs — the former
    // self-join + capBuckets shape planned the fingerprint subtree four
    // times). The 8-byte fingerprint rides the banded row, so the pair
    // carries (sh_a, sh_b) with no corpus re-scan; the crowded-bucket cap
    // is the size() filter (identical semantics to capBuckets: no pairs
    // from over-cap buckets).
    val buckets = chunked
      .groupBy("chunk", "ckey")
      .agg(collect_list(col("m")).as("xs"))
      .filter(size(col("xs")) >= 2 && size(col("xs")) <= maxBucketSize)
    val xs = col("xs")
    val pairsArr = flatten(
      transform(
        xs,
        x =>
          transform(
            filter(xs, y => x.getField("id") < y.getField("id")),
            y =>
              struct(
                x.getField("id").as("id_a"),
                y.getField("id").as("id_b"),
                x.getField("sh").as("sh_a"),
                y.getField("sh").as("sh_b")
              )
          )
      )
    )
    buckets
      .select(explode(pairsArr).as("p"))
      // sh is a pure function of id, so the pair dedup collapses
      // multi-chunk collisions exactly as the ids-only distinct did
      .select(
        col("p.id_a").as("id_a"),
        col("p.id_b").as("id_b"),
        col("p.sh_a").as("sh_a"),
        col("p.sh_b").as("sh_b")
      )
      .distinct()
      .select(
        col("id_a"),
        col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming")
      )
      .filter(col("hamming") <= maxHamming)
  }

  /** MOSS-style near-dup pairs from winnowing fingerprints: doc pairs
    * sharing at least `minShared` fingerprints (Schleimer/Wilkerson/Aiken
    * SIGMOD'03 — the winnowing guarantee makes any shared run of
    * `w + k - 1` chars contribute a shared print, so real overlapping
    * passages always collide). Same bucket-join shape as the other LSH
    * ops: shuffle keyed on the fingerprint, crowded prints (boilerplate)
    * capped, never an all-pairs stage.
    */
  def winnowPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 7, // gram size — same (k, w) order and defaults as Winnow
      w: Int = 8, // window size
      minShared: Int = 2,
      maxBucketSize: Int = 2000
  ): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val fps = df.select(
      col(idCol).as("id"),
      explode(
        array_distinct(graft.functions.GraftFunctions.winnow(col(textCol), k, w))
      ).as("fp")
    )
    // ONE exchange: group by fingerprint and emit the in-bucket ordered
    // pairs (same restructure as minhashCandidatePairs — the former
    // capBuckets + self-join planned the winnow subtree four times). A
    // doc's fps are array_distinct'ed before the explode, so each bucket
    // holds distinct ids and each co-occurring pair is emitted exactly once
    // per shared print — the shared_fps counts are unchanged. The crowded
    // cap is the size() filter (capBuckets semantics: over-cap prints emit
    // no pairs).
    val buckets = fps
      .groupBy("fp")
      .agg(collect_list(col("id")).as("xs"))
      .filter(size(col("xs")) >= 2 && size(col("xs")) <= maxBucketSize)
    val xs = col("xs")
    val pairsArr = flatten(
      transform(
        xs,
        x =>
          transform(
            filter(xs, y => x < y),
            y => struct(x.as("id_a"), y.as("id_b"))
          )
      )
    )
    buckets
      .select(explode(pairsArr).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
  }

  // ------------------------------------------------------ decontamination

  /** Eval-set decontamination: ids of training docs sharing at least one
    * character k-gram with the eval corpus (the standard train/test
    * contamination check — long-k n-gram collision against held-out
    * benchmarks). Shingles travel as xxhash64 longs (see [[jaccardVerify]]
    * for the collision argument).
    *
    * Scale shape: benchmark corpora are MBs while the train side is the
    * 100 TB one, so the eval shingle set is BROADCAST and the train side
    * is a map-side semi-probe — the big table never shuffles.
    */
  def contaminatedIds(
      train: DataFrame,
      eval_ : DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 13
  ): DataFrame = {
    graft.functions.GraftFunctions.register(train.sparkSession)
    def grams(df: DataFrame, cols: Column*): DataFrame =
      df.select(
        (cols :+ explode(
          graft.functions.GraftFunctions.shingleHashes(col(textCol), k)
        ).as("g")): _*
      )
    val evalGrams = grams(eval_).distinct()
    grams(train, col(idCol))
      .join(broadcast(evalGrams), Seq("g"), "left_semi")
      .select(col(idCol))
      .distinct()
  }

  // ---------------------------------------------- exact-substring overlap

  /** Per-document duplicated-span fraction, in micros: the share of a
    * document's k-CHAR-gram positions whose gram also occurs in ANOTHER
    * document — the document-granularity reading of exact-substring
    * deduplication (Lee et al., "Deduplicating Training Data Makes
    * Language Models Better", arXiv:2107.06499, which removes duplicated
    * spans ≥ 50 tokens; the fraction is the filter-side signal: a document
    * that is mostly spans seen elsewhere is boilerplate or a copy).
    *
    * Shape = the standard inverted-index pipeline and it scales like one:
    * position grams explode map-side (hashed to longs so the shuffle
    * carries 8 B keys, like the Jaccard shingles), one groupBy counts
    * distinct holders per gram, one join + one per-doc aggregate produce
    * the fraction. No driver-side state; ~|text| rows per document in
    * flight, the same budget the decontamination probe pays.
    * Documents shorter than k score 0.
    *
    * `sampleMod` is the 100 TB scale valve: with the default 1 every gram
    * position shuffles (~16 B per character of corpus — exact, the oracle
    * setting); with m > 1 only grams whose hash ≡ 0 (mod m) survive the
    * explode, shrinking the shuffle by ~m. The selection is
    * CONTENT-DEFINED (Manber'94 / Broder's MOD-p fingerprint sampling):
    * both copies of a shared span select the SAME grams regardless of
    * alignment, so a duplicated span of length L ≥ k is still observed
    * with probability 1-(1-1/m)^(L-k+1) — near 1 for the long spans the
    * operator targets — and the returned fraction becomes an unbiased
    * estimate over the ~1/m sampled positions (numerator and denominator
    * are both restricted to the selected grams).
    */
  def dupSpanFracMicro(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 50,
      sampleMod: Int = 1
  ): DataFrame = {
    val t = col(textCol)
    val gramsAll = df
      .filter(length(t) >= k)
      .select(
        col(idCol).as("id"),
        explode(
          transform(
            sequence(lit(1), length(t) - k + 1),
            i => xxhash64(t.substr(i, lit(k)))
          )
        ).as("g")
      )
    // pre-shuffle filter: unselected grams never leave the map side
    val grams =
      if (sampleMod <= 1) gramsAll
      else gramsAll.filter(pmod(col("g"), lit(sampleMod.toLong)) === 0)
    val stats = grams.groupBy("g").agg(countDistinct("id").as("nd"))
    val perDoc = grams
      .join(stats, "g")
      .groupBy("id")
      .agg(
        floor(
          sum(when(col("nd") > 1, 1).otherwise(0)).cast("double") /
            count(lit(1)) * 1000000 + lit(0.5)
        ).cast("long").as("dup_span_micro")
      )
    df.select(col(idCol).as("id"))
      .join(perDoc, Seq("id"), "left")
      .na
      .fill(0, Seq("dup_span_micro"))
  }

  // ------------------------------------------------- duplicate clustering

  /** Connected components over an undirected pair table — the clustering
    * step of the near-dup pipeline (pairs → duplicate groups → one
    * canonical doc per group). Near-dup similarity is not transitive, so a
    * pipeline that drops "the second doc of each pair" double-drops along
    * chains; the standard practice is to collapse the pair graph into
    * components and keep one representative per component.
    *
    * Alternating large-star / small-star rounds (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14): each round
    * is a groupBy + join keyed on the node id, the edge set contracts
    * toward star graphs centered at each component's minimum id, and
    * convergence takes O(log n) rounds independent of component DIAMETER —
    * a 100 TB pair table with million-node chains converges in ~a dozen
    * shuffles where naive min-label propagation needs O(diameter) rounds.
    * Each round's edge set is localCheckpoint'ed so the iterative plan
    * doesn't accrete (at cluster scale, point the checkpoints at reliable
    * storage instead).
    *
    * Returns (id, component) where component = min id of the node's
    * component; every node appearing in `pairs` is present, singletons
    * included if they arrive as self-referencing rows (self loops are
    * dropped from the edge set but their ids are kept).
    */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String = "id_a",
      bCol: String = "id_b",
      maxIter: Int = 25
  ): DataFrame = {
    val allNodes = pairs
      .select(col(aCol).cast("long").as("id"))
      .union(pairs.select(col(bCol).cast("long").as("id")))
      .distinct()
      .localCheckpoint(true)
    // canonical undirected edge set (lo, hi), no self loops
    var edges = pairs
      .select(
        least(col(aCol), col(bCol)).cast("long").as("u"),
        greatest(col(aCol), col(bCol)).cast("long").as("v")
      )
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)

    def signature(e: DataFrame): (Long, Long) = {
      val r = e.agg(
        count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L))
      ).collect()(0)
      (r.getLong(0), r.getLong(1))
    }

    // large-star: every neighbor v > u links to m = min(Γ(u) ∪ {u}).
    // Processes the SYMMETRIC adjacency so both endpoints contribute.
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(min("v").as("mn"))
      val m = least(col("mn"), col("u"))
      sym
        .join(mins, "u")
        .filter(col("v") > col("u"))
        .select(m.as("u"), col("v").as("v")) // m < u < v ⇒ already canonical
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    // small-star: orient each edge to its larger endpoint v; all smaller
    // neighbors u (and v itself) link to m = min(Γ(v)). m ≤ u < v for every
    // joined row, so both emitted edges are already canonical — pure
    // Catalyst, no lambda.
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy("v").agg(min("u").as("m"))
      val joined = e.join(mins, "v")
      val neighborLinks = joined
        .filter(col("u") =!= col("m"))
        .select(col("m").as("u"), col("u").as("v"))
      val centerLinks = joined.select(col("m").as("u"), col("v").as("v"))
      neighborLinks
        .union(centerLinks)
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    var sig = signature(edges)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      // reassigning `edges` drops the only reference to the previous
      // round's localCheckpoint; its blocks are reclaimed asynchronously by
      // the ContextCleaner once the RDD is GC'd (Spark exposes no public
      // handle to free a local checkpoint eagerly), so peak storage is a
      // couple of edge-set copies, not all O(log n) rounds
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      val nextSig = signature(next)
      converged = nextSig == sig
      sig = nextSig
      edges = next
      it += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds"
      )
    // fixpoint is a star forest rooted at each component's min: (u, v) with
    // u the center. Nodes absent from the final edges are their own centers.
    val members = edges.select(col("v").as("id"), col("u").as("component"))
    allNodes
      .join(members, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }

  /** Keep one representative per duplicate cluster (the min id), dropping
    * every other member — the materialization step after
    * [[connectedComponents]].
    */
  def dedupByComponents(
      df: DataFrame,
      components: DataFrame, // (id, component)
      idCol: String
  ): DataFrame = {
    // renamed drop-list column: joining on a bare col("id") is ambiguous
    // whenever df itself has an "id" column (the common convention)
    val drop = components
      .filter(col("id") =!= col("component"))
      .select(col("id").as("__dup_id"))
    df.join(drop, df(idCol) === col("__dup_id"), "left_anti")
  }
}
