package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental near-dup ADMISSION for a continuously-growing corpus — the
  * operation a crawl/CDC ingestion pipeline actually runs: not "find all
  * pairs inside a static corpus" but "which of today's documents are
  * near-copies of anything already ACCEPTED, and what state must I keep
  * to answer that tomorrow". This connects the engine's two halves: the
  * apply loop lands new documents continuously; this operator decides
  * admission against state that grows with the corpus.
  *
  * State = a persisted BAND INDEX: one row per (doc, band) holding the
  * band's bucket hash and the doc's full minhash signature —
  * `numHashes * 8` bytes per doc (256 B at the default 32 hashes), NOT
  * the text and NOT the shingle set, so 10B accepted docs index in ~2.5
  * TB: broadcastable per-bucket slices, never a corpus rescan.
  *
  * Per batch the work is: signatures over the batch, one join of the
  * batch's bands against the index's matching (band, bucket) keys —
  * bucket-pruned at the storage layer when the index is bucketed/
  * partitioned by `bucket` — plus the ordinary within-batch near-dup
  * pass. Cost is O(batch + collisions), independent of corpus size.
  *
  * Decision semantics vs the accepted corpus are SIGNATURE-ESTIMATE
  * based (`est >= threshold - estMargin`): exact Jaccard verification
  * would need the old documents' shingle sets (~4 KB/doc — 16x the
  * index) or a text fetch; the estimate's recall contract is the same
  * Binomial(numHashes, j) tail documented on
  * [[DedupOps.minhashNearDupPairs]], and the margin biases toward
  * REJECTING borderline duplicates — the cheap side for training-data
  * curation. Within the batch itself both texts are present, so
  * new-vs-new duplicates ARE exact-verified.
  */
object IncrementalDedup {

  /** Admission result: `accepted` rows of the input batch, `rejected`
    * `(id, dup_of, est_jaccard)` evidence rows, and `indexRows` — the
    * accepted docs' band rows to APPEND to the persisted index (the
    * caller owns the store: parquet partitioned by band/bucket, a
    * [[graft.table.SnapshotTable]], anything append-able).
    */
  final case class Admission(
      accepted: DataFrame,
      rejected: DataFrame,
      indexRows: DataFrame
  )

  /** Band-index rows for a document set: `(id, sig, band, bucket)` —
    * one row per (doc, band). This is both the index's storage schema
    * and the probe side of the admission join.
    */
  def bandIndexRows(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 5,
      numHashes: Int = 32,
      bands: Int = 8
  ): DataFrame = {
    require(numHashes % bands == 0)
    graft.functions.GraftFunctions.register(df.sparkSession)
    val rows = numHashes / bands
    df.select(
        col(idCol).as("id"),
        DedupOps.minhashSignature(col(textCol), k, numHashes).as("sig")
      )
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
  }

  private def estJaccard(a: Column, b: Column, numHashes: Int): Column =
    graft.functions.GraftFunctions.sigAgree(a, b).cast("double") / numHashes

  /** Admit one batch against the accepted corpus's band index.
    *
    * A new doc is rejected when (a) any of its bands collides with an
    * indexed doc whose signature-estimated Jaccard clears
    * `threshold - estMargin` (duplicate of the CORPUS), or (b) it
    * exact-verifies as a near-dup of a smaller-id doc in the same batch
    * (duplicate WITHIN the batch; direct-pair greedy — the larger id of
    * every verified pair is rejected, so docs similar only TRANSITIVELY
    * through a rejected middleman both survive; use
    * [[DedupOps.dedupByComponents]] when transitive-closure clustering
    * is wanted instead). Index collisions are checked first so a batch
    * doc never survives because its batch-twin was rejected against the
    * corpus.
    *
    * @param index previously persisted [[bandIndexRows]] of every
    *              accepted doc (empty DataFrame with the same schema on
    *              the first batch)
    */
  def admitBatch(
      newDocs: DataFrame,
      index: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 5,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.7,
      estMargin: Double = 0.15,
      maxBucketSize: Int = 2000,
      /** High-precision mode: the accepted corpus's `(idCol, textCol)`
        * rows (e.g. the lake table the apply loop maintains). When set,
        * corpus-duplicate decisions are EXACT: the index + estimate only
        * PRUNE, then surviving candidate pairs fetch both texts and
        * verify by n-gram Jaccard — cost bounded by candidate count,
        * never a corpus scan, and the verdicts become a pure function of
        * the texts (hash-free semantics). Ids must be disjoint from the
        * batch's. When None, the estimate decides (the index-only mode
        * documented above).
        */
      corpusTexts: Option[DataFrame] = None
  ): Admission = {
    val probe = bandIndexRows(newDocs, textCol, idCol, k, numHashes, bands)

    // (a) corpus-duplicate check: batch bands vs index bands. The join is
    // keyed (band, bucket) — with the index stored partitioned by these
    // keys the scan prunes to only the buckets the batch actually hits.
    val corpusCands = probe
      .select(col("id"), col("sig"), col("band"), col("bucket"))
      .join(
        index.select(
          col("band"),
          col("bucket"),
          col("id").as("old_id"),
          col("sig").as("old_sig")
        ),
        Seq("band", "bucket")
      )
      .withColumn("est_jaccard", estJaccard(col("sig"), col("old_sig"), numHashes))
      .filter(col("est_jaccard") >= threshold - estMargin)
    val vsCorpus = corpusTexts match {
      case None =>
        corpusCands
          .groupBy(col("id"))
          .agg(
            max_by(col("old_id"), col("est_jaccard")).as("dup_of"),
            max(col("est_jaccard")).as("est_jaccard")
          )
      case Some(corpus) =>
        val cands = corpusCands
          .select(col("old_id").as("id_a"), col("id").as("id_b"))
          .distinct()
        // fetch + shingle ONLY the corpus docs that appear as candidates
        // (semi-join on the candidate old_id set): the verify's cost is
        // then bounded by the collision count, never a corpus scan —
        // the documented O(batch + collisions) admission contract (the
        // former corpus.union(newDocs) re-shingled every accepted doc on
        // every batch). Pair set and verdicts are unchanged: jaccardVerify
        // only ever reads ids present in `cands`.
        val neededCorpus = corpus
          .select(col(idCol), col(textCol))
          .join(
            cands.select(col("id_a").as(idCol)).distinct(),
            Seq(idCol),
            "left_semi"
          )
        val both = neededCorpus
          .unionByName(newDocs.select(col(idCol), col(textCol)))
        DedupOps
          .jaccardVerify(cands, both, textCol, idCol, k, threshold)
          .groupBy(col("id_b").as("id"))
          .agg(
            max_by(col("id_a"), col("jaccard")).as("dup_of"),
            max(col("jaccard")).as("est_jaccard")
          )
    }

    val survivors1 = newDocs.join(
      vsCorpus.select(col("id").as(idCol)),
      Seq(idCol),
      "left_anti"
    )

    // (b) within-batch near-dups among corpus-survivors: both texts are
    // local, so this leg is EXACT (LSH -> est prefilter -> n-gram verify).
    val batchPairs = DedupOps
      .minhashNearDupPairs(
        survivors1, textCol, idCol, k, numHashes, bands,
        threshold, estMargin, maxBucketSize
      )
      // greedy canonical rule: the larger id of a verified pair is the dup
      .groupBy(col("id_b").as("id"))
      .agg(
        max_by(col("id_a"), col("jaccard")).as("dup_of"),
        max(col("jaccard")).as("est_jaccard")
      )

    val rejected = vsCorpus
      .withColumn("reason", lit("corpus"))
      .unionByName(batchPairs.withColumn("reason", lit("batch")))
    val accepted = newDocs.join(
      rejected.select(col("id").as(idCol)),
      Seq(idCol),
      "left_anti"
    )
    val indexRows =
      probe.join(rejected.select(col("id")), Seq("id"), "left_anti")
    Admission(accepted, rejected, indexRows)
  }
}
