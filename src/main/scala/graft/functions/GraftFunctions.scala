package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

/** Registration point for graft's native Catalyst expressions.
  *
  * Registering through the session FunctionRegistry (rather than a
  * private-API Column bridge) keeps the expressions first-class: usable
  * from SQL (`SELECT graft_simhash64(text) ...`) and from the Column API
  * via [[simhash64]] / [[winnow]].
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "graft_simhash64",
      exprs => SimHash64(exprs.head),
      "built-in"
    )
    reg.createOrReplaceTempFunction(
      "graft_minhash",
      {
        case Seq(c, k, n) =>
          MinHashSig(
            c,
            k.eval().asInstanceOf[Number].intValue(),
            n.eval().asInstanceOf[Number].intValue()
          )
        case other =>
          throw new IllegalArgumentException(
            s"graft_minhash expects (text, k, numHashes), got ${other.size} args"
          )
      },
      "built-in"
    )
    reg.createOrReplaceTempFunction(
      "graft_json_drop_keys",
      {
        case Seq(c, keys @ _*) if keys.nonEmpty =>
          JsonDropKeys(c, keys.map(_.eval().toString))
        case other =>
          throw new IllegalArgumentException(
            s"graft_json_drop_keys expects (json, key1, ...), got ${other.size} args"
          )
      },
      "built-in"
    )
    reg.createOrReplaceTempFunction(
      "graft_bpe_count",
      {
        case Seq(c, blob) => BpeCount(c, blob.eval().toString)
        case other =>
          throw new IllegalArgumentException(
            s"graft_bpe_count expects (text, mergesBlob), got ${other.size} args"
          )
      },
      "built-in"
    )
    reg.createOrReplaceTempFunction(
      "graft_cosine",
      {
        case Seq(a, b) => CosineSim(a, b)
        case other =>
          throw new IllegalArgumentException(
            s"graft_cosine expects (vecA, vecB), got ${other.size} args"
          )
      },
      "built-in"
    )
    reg.createOrReplaceTempFunction(
      "graft_lsh_code",
      {
        case Seq(v, bits, band) =>
          LshCode(
            v,
            bits.eval().asInstanceOf[Number].intValue(),
            band.eval().asInstanceOf[Number].intValue()
          )
        case other =>
          throw new IllegalArgumentException(
            s"graft_lsh_code expects (vec, bits, band), got ${other.size} args"
          )
      },
      "built-in"
    )
    reg.createOrReplaceTempFunction(
      "graft_shingle_hashes",
      {
        case Seq(c, k) =>
          ShingleHashes(c, k.eval().asInstanceOf[Number].intValue())
        case other =>
          throw new IllegalArgumentException(
            s"graft_shingle_hashes expects (text, k), got ${other.size} args"
          )
      },
      "built-in"
    )
    reg.createOrReplaceTempFunction(
      "graft_sorted_intersect",
      {
        case Seq(a, b) => SortedIntersectCount(a, b)
        case other =>
          throw new IllegalArgumentException(
            s"graft_sorted_intersect expects (sortedA, sortedB), got ${other.size} args"
          )
      },
      "built-in"
    )
    reg.createOrReplaceTempFunction(
      "graft_sig_agree",
      {
        case Seq(a, b) => SigAgree(a, b)
        case other =>
          throw new IllegalArgumentException(
            s"graft_sig_agree expects (sigA, sigB), got ${other.size} args"
          )
      },
      "built-in"
    )
    reg.createOrReplaceTempFunction(
      "graft_quality_counts",
      exprs => QualityCounts(exprs.head),
      "built-in"
    )
    reg.createOrReplaceTempFunction(
      "graft_winnow",
      {
        case Seq(c) => Winnow(c, 7, 8)
        case Seq(c, k, w) =>
          Winnow(
            c,
            k.eval().asInstanceOf[Number].intValue(),
            w.eval().asInstanceOf[Number].intValue()
          )
        case other =>
          throw new IllegalArgumentException(
            s"graft_winnow expects 1 or 3 args, got ${other.size}"
          )
      },
      "built-in"
    )
  }

  /** 64-bit SimHash of the text column (requires [[register]]). */
  def simhash64(c: Column): Column = call_function("graft_simhash64", c)

  /** MinHash signature `array<long>` (requires [[register]]). */
  def minhash(c: Column, k: Int, numHashes: Int): Column =
    call_function(
      "graft_minhash",
      c,
      org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.lit(numHashes)
    )

  /** Structurally drop top-level JSON keys (requires [[register]]). */
  def jsonDropKeys(c: Column, keys: String*): Column =
    call_function(
      "graft_json_drop_keys",
      (c +: keys.map(org.apache.spark.sql.functions.lit(_))): _*
    )

  /** BPE token count under a learned merges table (wire form of
    * [[Bpe.encodeMerges]]; requires [[register]]).
    */
  def bpeCount(c: Column, mergesBlob: String): Column =
    call_function(
      "graft_bpe_count",
      c,
      org.apache.spark.sql.functions.lit(mergesBlob)
    )

  /** One-pass cosine similarity of two `array<float>` columns (requires
    * [[register]]).
    */
  def cosineSim(a: Column, b: Column): Column =
    call_function("graft_cosine", a, b)

  /** One-pass random-hyperplane LSH code (requires [[register]]). */
  def lshCode(vec: Column, bits: Int, band: Int): Column =
    call_function(
      "graft_lsh_code",
      vec,
      org.apache.spark.sql.functions.lit(bits),
      org.apache.spark.sql.functions.lit(band)
    )

  /** Distinct hashed character k-gram shingles `array<long>` (requires
    * [[register]]).
    */
  def shingleHashes(c: Column, k: Int): Column =
    call_function(
      "graft_shingle_hashes",
      c,
      org.apache.spark.sql.functions.lit(k)
    )

  /** Positions where two `array<long>` signatures agree (requires
    * [[register]]).
    */
  def sigAgree(a: Column, b: Column): Column =
    call_function("graft_sig_agree", a, b)

  /** `|A ∩ B|` of two ascending-sorted long arrays — the
    * [[shingleHashes]] wire form (requires [[register]]).
    */
  def sortedIntersectCount(a: Column, b: Column): Column =
    call_function("graft_sorted_intersect", a, b)

  /** One-pass text-feature counts struct `(n_toks, punct, digits, uppers,
    * stop, bpeish)` — see [[QualityCounts]] (requires [[register]]).
    */
  def qualityCounts(c: Column): Column =
    call_function("graft_quality_counts", c)

  /** Winnowing fingerprints `array<long>` (requires [[register]]). */
  def winnow(c: Column, k: Int = 7, w: Int = 8): Column =
    call_function(
      "graft_winnow",
      c,
      org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.lit(w)
    )
}
