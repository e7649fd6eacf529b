package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language identification, fingerprinting.
  * All pure Catalyst column expressions (codegen'd) — no UDFs — so they
  * vectorize over a 100 TB documents table.
  */
object TextOps {

  /** Whitespace tokens, empties removed. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Overlapping-chunk plan for context-window training: one row per
    * (document, chunk), where chunk i covers token offsets
    * `[i*stride, min(i*stride + chunkTokens, n))` and chunks are laid out
    * until every token is covered — the standard chunk-with-stride split
    * of long documents into model windows (stride < chunkTokens overlaps
    * consecutive chunks by `chunkTokens - stride` tokens). Documents
    * shorter than one window still produce exactly one chunk; empty
    * documents produce none. Pure per-row column math (`sequence` +
    * `explode`), no shuffle — at corpus scale the fan-out is
    * tokens/stride rows per document, decided entirely map-side.
    *
    * Output: input columns of `df` (minus the text) + `(chunk_id,
    * tok_begin, tok_end, n_chunks)`. The TEXT slice itself is a
    * downstream `slice(tokens(text), ...)` when needed; the plan carries
    * offsets so the (typically huge) text column is not duplicated per
    * chunk.
    */
  def chunkPlan(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      idCol: String,
      chunkTokens: Int,
      stride: Int
  ): org.apache.spark.sql.DataFrame = {
    require(chunkTokens > 0 && stride > 0 && stride <= chunkTokens)
    val n = tokenCount(col(textCol))
    // number of chunks: smallest c with (c-1)*stride + chunkTokens >= n,
    // i.e. ceil((n - chunkTokens) / stride) + 1, floored at 1 for any
    // non-empty doc; ceil via integer arithmetic (token counts are far
    // below 2^53, so the double division is exact)
    val nChunks = when(n <= 0, 0)
      .when(n <= chunkTokens, 1)
      .otherwise(
        floor((n - chunkTokens + stride - 1) / lit(stride)).cast("int") + 1
      )
    df.select(
        col(idCol),
        n.as("__n"),
        nChunks.as("n_chunks")
      )
      .filter(col("n_chunks") > 0)
      .select(
        col(idCol),
        col("__n"),
        col("n_chunks"),
        explode(sequence(lit(0), col("n_chunks") - 1)).as("chunk_id")
      )
      .select(
        col(idCol),
        col("chunk_id"),
        (col("chunk_id") * stride).as("tok_begin"),
        least(col("chunk_id") * stride + chunkTokens, col("__n")).as("tok_end"),
        col("n_chunks")
      )
  }


  /** Materialized companion of [[chunkPlan]]: the same stride-overlapped
    * fan-out, with each chunk's TEXT sliced out in the same map-side
    * projection — tokenize once per document, explode the chunk ids, then
    * `slice` + `array_join` per chunk. The text column is never shuffled
    * or duplicated ahead of the slice: explode -> slice -> drop-tokens all
    * pipeline inside one whole-stage-codegen'd map task, so what leaves
    * the stage is only the (much smaller) chunk text.
    *
    * Output: `(idCol, chunk_id, tok_begin, tok_end, chunk_text)`.
    */
  def sliceChunks(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      idCol: String,
      chunkTokens: Int,
      stride: Int
  ): org.apache.spark.sql.DataFrame = {
    require(chunkTokens > 0 && stride > 0 && stride <= chunkTokens)
    val toks = tokens(col(textCol))
    val n = size(toks)
    val nChunks = when(n <= 0, 0)
      .when(n <= chunkTokens, 1)
      .otherwise(
        floor((n - chunkTokens + stride - 1) / lit(stride)).cast("int") + 1
      )
    df.select(col(idCol), toks.as("__toks"), nChunks.as("__nc"))
      .filter(col("__nc") > 0)
      .select(
        col(idCol),
        col("__toks"),
        explode(sequence(lit(0), col("__nc") - 1)).as("chunk_id")
      )
      .select(
        col(idCol),
        col("chunk_id"),
        (col("chunk_id") * stride).as("tok_begin"),
        least(col("chunk_id") * stride + chunkTokens, size(col("__toks")))
          .as("tok_end"),
        array_join(
          slice(col("__toks"), col("chunk_id") * stride + 1, lit(chunkTokens)),
          " "
        ).as("chunk_text")
      )
  }

  /** BPE-ish subword count: word pieces, numbers, and punctuation runs
    * counted separately (a cheap stand-in for a real tokenizer's token
    * count; the regex mirrors the GPT-2 pre-tokenizer's shape). For the
    * REAL learned-merges tokenizer, see [[learnBpe]] + [[bpeTokenCount]].
    */
  def bpeishTokenCount(text: Column): Column =
    // native one-pass kernel; value-identical to
    // size(regexp_extract_all(text, "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]", 0))
    // (golden-tested) without the alternation regex per row. Requires
    // [[graft.functions.GraftFunctions.register]].
    graft.functions.GraftFunctions.qualityCounts(text).getField("bpeish")

  /** Learn a BPE merges table from the corpus itself (no external vocab
    * ships in this sandbox): distributed word count (map-side combine
    * bounds the shuffle by vocabulary size, exactly like `q_vocab`), top
    * `maxWords` words by (count desc, word asc) to the driver — bounded
    * state, same pattern as the IVF training sample — then the Sennrich
    * learner ([[graft.functions.Bpe.learn]]). Deterministic end to end.
    */
  def learnBpe(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      numMerges: Int,
      maxWords: Int = 20000
  ): Seq[(String, String)] = {
    val spark = df.sparkSession
    import spark.implicits._
    val words = df
      .select(col(textCol))
      .as[String]
      .flatMap(t => graft.functions.Bpe.pretokenize(t))
      .groupBy("value")
      .count()
      .orderBy(desc("count"), asc("value"))
      .limit(maxWords)
      .as[(String, Long)]
      .collect()
      .toSeq
    graft.functions.Bpe.learn(words, numMerges)
  }

  /** Token count under a learned merges table — the real-tokenizer drop-in
    * for [[bpeishTokenCount]] wherever token budgets matter (mixture
    * planning, packing, chunking). Requires
    * [[graft.functions.GraftFunctions.register]].
    */
  def bpeTokenCount(text: Column, merges: Seq[(String, String)]): Column =
    graft.functions.GraftFunctions
      .bpeCount(text, graft.functions.Bpe.encodeMerges(merges))

  val enStop = Seq(
    "the", "of", "and", "to", "in", "a", "is", "that", "it", "was", "for",
    "on", "are", "as", "with", "his", "they", "at", "be", "this", "have",
    "from", "or", "had", "by", "not", "but", "what", "all", "were", "we"
  )
  val deStop = Seq(
    "der", "die", "das", "und", "ist", "ich", "nicht", "sie", "es", "ein",
    "eine", "zu", "den", "mit", "auf", "für", "von", "dem", "sich", "auch"
  )
  val frStop = Seq(
    "le", "la", "les", "et", "est", "je", "pas", "vous", "que", "une",
    "un", "des", "dans", "qui", "pour", "sur", "avec", "il", "elle", "nous"
  )
  val esStop = Seq(
    "el", "la", "los", "las", "y", "es", "no", "que", "una", "un", "de",
    "en", "por", "para", "con", "se", "su", "al", "lo", "como"
  )

  private def stopHits(toks: Column, words: Seq[String]): Column =
    size(array_intersect(toks, lit(words.toArray)))

  /** The 32 ASCII characters of Java's `\p{Punct}` POSIX class. */
  private[graft] val AsciiPunct = "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"

  /** Number of characters of `text` belonging to `chars` — identical to
    * `size(regexp_extract_all(text, "[<chars>]", 0))` for a class of
    * single BMP characters, computed as the length drop under
    * `translate(text, chars, "")` (one table-lookup pass, no regex
    * engine).
    */
  private[graft] def charClassCount(text: Column, chars: String): Column =
    length(text) - length(translate(text, chars, ""))

  /** Heuristic language ID over a small stopword inventory, plus a `code`
    * class for symbol-dense text. Returns a lowercase label
    * (en/de/fr/es/code/unknown). Declarative: per-language stopword-hit
    * counts, winner via lexicographic struct max.
    */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val symbolDensity =
      size(regexp_extract_all(text, lit("[{}();=<>\\[\\]]"), lit(0)))
    val scored = greatest(
      struct(stopHits(toks, enStop).as("s"), lit("en").as("l")),
      struct(stopHits(toks, deStop).as("s"), lit("de").as("l")),
      struct(stopHits(toks, frStop).as("s"), lit("fr").as("l")),
      struct(stopHits(toks, esStop).as("s"), lit("es").as("l")),
      struct((symbolDensity / lit(2)).as("s"), lit("code").as("l"))
    )
    when(scored.getField("s") > 0, scored.getField("l")).otherwise(lit("unknown"))
  }

  /** Quality features: character/token counts, mean token length,
    * punctuation/digit/uppercase ratios, English stopword ratio — the usual
    * pre-training corpus filters (C4/Gopher-style heuristics).
    */
  def qualityFeatures(text: Column): Column = {
    // ONE fused scan ([[graft.functions.QualityCounts]]) replaces the six
    // composed passes (two \s+ splits, three class regexes, one
    // array_intersect); every count is value-identical by construction
    // (kernel doc + goldens), so the double ratios below are bit-identical
    // too. Requires [[graft.functions.GraftFunctions.register]].
    val qc = graft.functions.GraftFunctions.qualityCounts(text)
    val nChars = length(text).cast("double")
    val nToks = qc.getField("n_toks").cast("double")
    val punct = qc.getField("punct").cast("double")
    val digits = qc.getField("digits").cast("double")
    val uppers = qc.getField("uppers").cast("double")
    val stop = qc.getField("stop").cast("double")
    val safeChars = greatest(nChars, lit(1.0))
    val safeToks = greatest(nToks, lit(1.0))
    struct(
      nChars.cast("long").as("n_chars"),
      nToks.cast("long").as("n_tokens"),
      (nChars / safeToks).as("mean_token_len"),
      (punct / safeChars).as("punct_ratio"),
      (digits / safeChars).as("digit_ratio"),
      (uppers / safeChars).as("upper_ratio"),
      (stop / safeToks).as("stopword_ratio")
    )
  }

  /** Unrounded composite quality score in [0,1]. */
  private def qualityRaw(text: Column): Column = {
    val f = qualityFeatures(text)
    val lenScore =
      least(f.getField("n_tokens").cast("double") / lit(20.0), lit(1.0))
    val punctScore =
      lit(1.0) - least(f.getField("punct_ratio") * lit(3.0), lit(1.0))
    val digitScore =
      lit(1.0) - least(f.getField("digit_ratio") * lit(3.0), lit(1.0))
    val stopScore = least(f.getField("stopword_ratio") * lit(4.0), lit(1.0))
    lenScore * lit(0.3) + punctScore * lit(0.3) +
      digitScore * lit(0.2) + stopScore * lit(0.2)
  }

  /** Composite quality score in [0,1]: penalizes very short docs, extreme
    * punctuation/digit density, and missing stopwords.
    */
  def qualityScore(text: Column): Column = round(qualityRaw(text), 6)

  /** [[qualityScore]] as integer micro-units (exact cross-engine value: no
    * float formatting in downstream hashes). `floor(x*1e6 + 0.5)` rather
    * than `round`: pure IEEE ops are bit-identical across engines, while
    * round implementations differ on decimal-vs-binary tie handling.
    */
  def qualityScoreMicros(text: Column): Column =
    floor(qualityRaw(text) * lit(1000000.0) + lit(0.5)).cast("long")

  /** Exact-content fingerprint (for exact dedup). */
  def contentHash(text: Column): Column = sha2(text, 256)

  /** Normalized content fingerprint: lowercase, collapse whitespace —
    * catches trivially-reformatted duplicates.
    */
  def normalizedHash(text: Column): Column =
    sha2(regexp_replace(trim(lower(text)), "\\s+", " "), 256)

  // ------------------------------------- intra-document repetition (C4-ish)

  /** Non-empty trimmed lines of a document. */
  private def lines(text: Column): Column =
    filter(transform(split(text, "\n"), l => trim(l)), l => length(l) > 0)

  /** Duplicate-LINE fraction in micros: 1 − distinct/total over non-empty
    * trimmed lines — the classic boilerplate/navigation-chrome signal
    * (C4-style line dedup decides on exactly this ratio). 0 for documents
    * with fewer than 2 lines. Pure Catalyst; all integer/million-scaled
    * arithmetic so an auditing engine reproduces it bit-exactly.
    */
  def dupLineFracMicro(text: Column): Column = {
    val ls = lines(text)
    val n = size(ls)
    when(n < 2, lit(0L)).otherwise(
      floor(
        (lit(1.0) - size(array_distinct(ls)).cast("double") / n) * 1000000 + lit(0.5)
      ).cast("long")
    )
  }

  /** Word 3-grams of a document (space-joined, whitespace-tokenized). */
  private def wordGrams3(text: Column): Column = {
    val ws = tokens(text)
    val n = size(ws)
    when(n < 3, array().cast("array<string>")).otherwise(
      transform(
        sequence(lit(0), n - 3),
        i =>
          concat_ws(
            " ",
            element_at(ws, i + 1),
            element_at(ws, i + 2),
            element_at(ws, i + 3)
          )
      )
    )
  }

  /** Duplicate word-3-gram fraction in micros: 1 − distinct/total over the
    * document's word 3-grams — the Gopher/RefinedWeb repetition signal
    * that catches looped phrases line dedup misses. 0 below 3 words.
    */
  def dupGram3FracMicro(text: Column): Column = {
    val gs = wordGrams3(text)
    val n = size(gs)
    when(n < 1, lit(0L)).otherwise(
      floor(
        (lit(1.0) - size(array_distinct(gs)).cast("double") / n) * 1000000 + lit(0.5)
      ).cast("long")
    )
  }

  // ------------------------------------------- Gopher-style quality rules

  /** Mean whitespace-token length in micros (0 for empty documents). */
  def meanWordLenMicro(text: Column): Column = {
    val ws = tokens(text)
    val n = size(ws)
    when(n < 1, lit(0L)).otherwise(
      floor(
        aggregate(ws, lit(0L), (acc, w) => acc + length(w)).cast("double") / n
          * 1000000 + lit(0.5)
      ).cast("long")
    )
  }

  /** '#' and '...' occurrences per word, in micros (the Gopher
    * symbol-to-word ratio; ∞ avoided by flooring at 1 word).
    */
  def symbolRatioMicro(text: Column): Column = {
    val hashes = length(text) - length(replace(text, lit("#"), lit("")))
    val ellipses =
      (length(text) - length(replace(text, lit("..."), lit("")))) / 3
    floor(
      (hashes + ellipses).cast("double") /
        greatest(size(tokens(text)), lit(1)) * 1000000 + lit(0.5)
    ).cast("long")
  }

  /** Fraction of non-empty lines starting with a bullet ('-', '*', '•'),
    * in micros — 0 when the document has no lines.
    */
  def bulletFracMicro(text: Column): Column = {
    val ls = lines(text)
    val n = size(ls)
    val bullets = size(
      filter(
        ls,
        l =>
          startswith(l, lit("-")) || startswith(l, lit("*")) ||
            startswith(l, lit("•"))
      )
    )
    when(n < 1, lit(0L)).otherwise(
      floor(bullets.cast("double") / n * 1000000 + lit(0.5)).cast("long")
    )
  }

  /** The Gopher paper's document-level quality gates (Rae et al. 2021,
    * §A1.1), as one boolean: 50 ≤ words ≤ 100000, mean word length in
    * [3, 10] characters, symbol-to-word ratio ≤ 0.1, bullet-line fraction
    * ≤ 0.9, duplicate-line fraction ≤ 0.3. Every input is one of the
    * micro-scaled integer columns above, so the gate is reproducible
    * bit-exactly by an auditing engine.
    */
  def gopherPass(text: Column): Column = {
    val n = size(tokens(text))
    (n >= 50 && n <= 100000) &&
    meanWordLenMicro(text).between(3000000L, 10000000L) &&
    (symbolRatioMicro(text) <= 100000L) &&
    (bulletFracMicro(text) <= 900000L) &&
    (dupLineFracMicro(text) <= 300000L)
  }

  // ------------------------------------------------------- PII scrubbing

  /** Alternation-free patterns on purpose: Spark's Java regex is
    * leftmost-FIRST (backtracking NFA) while most SQL engines (RE2) are
    * leftmost-LONGEST — character-class + greedy-quantifier patterns are
    * the shape on which both semantics provably agree, which keeps the
    * scrub reproducible by the auditing engine.
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** hyphenated international format: +CC-NNN-N... */
  val phonePattern = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,10}"

  /** Phone formats scrubbed, applied in order (each stays alternation-free;
    * `?` and greedy class quantifiers agree between leftmost-first and
    * leftmost-longest engines — only `|` diverges):
    *  1. hyphenated international (+1-555-1234567);
    *  2. general international — '+' then 6–16 digits with any mix of
    *     space/dot/dash/parenthesis separators (+44 20 7946 0958,
    *     +1 (555) 123-4567);
    *  3. North-American parenthesized area code ((555) 123-4567);
    *  4. bare separated triplets with dash/dot (555-123-4567,
    *     555.123.4567). Space-separated bare digit runs are deliberately
    *     NOT scrubbed — they collide with ordinary numeric prose.
    */
  val phonePatterns: Seq[String] = Seq(
    phonePattern,
    "\\+[0-9][0-9 ().-]{5,16}[0-9]",
    "\\([0-9]{3}\\) ?[0-9]{3}[-. ][0-9]{4}",
    "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"
  )

  /** Redact emails and phone numbers from a text column (training corpora
    * must not memorize contact details). Pure chained `regexp_replace` —
    * codegen'd, no UDF, no shuffle. Coverage = [[emailPattern]] +
    * [[phonePatterns]]; each pattern runs on the output of the previous,
    * so overlapping spans redact exactly once.
    */
  def redactPii(text: Column): Column =
    phonePatterns.foldLeft(regexp_replace(text, emailPattern, "<EMAIL>")) {
      (t, p) => regexp_replace(t, p, "<PHONE>")
    }

  /** Count of PII spans a redaction of `text` would remove. Each pattern is
    * counted on the text already redacted by the patterns before it —
    * matching [[redactPii]]'s application order exactly, so a span matched
    * by two patterns (or a phone-shaped run inside an email) is never
    * double-counted.
    */
  def piiCount(text: Column): Column = {
    val (total, _) = phonePatterns.foldLeft(
      (
        regexp_count(text, lit(emailPattern)),
        regexp_replace(text, emailPattern, "<EMAIL>")
      )
    ) { case ((count, redacted), p) =>
      (count + regexp_count(redacted, lit(p)), regexp_replace(redacted, p, "<PHONE>"))
    }
    total.cast("long")
  }
}
