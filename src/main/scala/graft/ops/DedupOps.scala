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

  /** MinHash signature (array of `numHashes` longs) over the shingle set.
    * The h-th hash function is xxhash64(shingle, h) — no modular arithmetic,
    * so it stays overflow-safe under ANSI mode.
    */
  def minhashSignature(text: Column, k: Int = 5, numHashes: Int = 32): Column = {
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
  def minhashCandidatePairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 5,
      numHashes: Int = 32,
      bands: Int = 8
  ): DataFrame = {
    require(numHashes % bands == 0)
    val rows = numHashes / bands
    val withSig = df.select(
      col(idCol).as("id"),
      minhashSignature(col(textCol), k, numHashes).as("sig")
    )
    val banded = withSig.select(
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
    val l = banded.select(
      col("bb.band").as("band"),
      col("bb.bucket").as("bucket"),
      col("id").as("id_a"),
      col("sig").as("sig_a")
    )
    val r = banded.select(
      col("bb.band").as("band"),
      col("bb.bucket").as("bucket"),
      col("id").as("id_b"),
      col("sig").as("sig_b")
    )
    l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(
        col("id_a"),
        col("id_b"),
        (size(
          filter(
            zip_with(col("sig_a"), col("sig_b"), (a, b) => a === b),
            x => x
          )
        ).cast("double") / numHashes).as("est_jaccard")
      )
      .groupBy("id_a", "id_b")
      .agg(max("est_jaccard").as("est_jaccard"))
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
    val sh = df.select(
      col(idCol).as("id"),
      shingles(col(textCol), k).as("sh")
    )
    pairs
      .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn(
        "jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))
      )
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** SimHash near-duplicate pairs: 64-bit simhash, banded into four 16-bit
    * chunks (two docs within Hamming distance 3 must agree on at least one
    * chunk... within 3 of 64 bits they agree on >= 1 of 4 chunks), verified
    * with bit_count(a XOR b) <= maxHamming.
    */
  def simhashPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int = 3
  ): DataFrame = {
    val withSh = df.select(
      col(idCol).as("id"),
      SimHash64.simhash64(col(textCol)).as("sh")
    )
    val chunked = withSh.select(
      col("id"),
      col("sh"),
      explode(
        array((0 until 4).map { c =>
          struct(
            lit(c).as("chunk"),
            shiftrightunsigned(col("sh"), c * 16)
              .bitwiseAND(lit(0xffffL))
              .as("ckey")
          )
        }: _*)
      ).as("cc")
    )
    val l = chunked.select(
      col("cc.chunk").as("chunk"),
      col("cc.ckey").as("ckey"),
      col("id").as("id_a"),
      col("sh").as("sh_a")
    )
    val r = chunked.select(
      col("cc.chunk").as("chunk"),
      col("cc.ckey").as("ckey"),
      col("id").as("id_b"),
      col("sh").as("sh_b")
    )
    l.join(r, Seq("chunk", "ckey"))
      .filter(col("id_a") < col("id_b"))
      .select(
        col("id_a"),
        col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming")
      )
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
