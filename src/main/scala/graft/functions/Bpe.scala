package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair encoding (Sennrich et al. 2016, "Neural Machine Translation of
  * Rare Words with Subword Units"; the greedy lowest-rank encoder is the one
  * published with GPT-2): a LEARNED merges table replaces the regex token
  * heuristic wherever a real subword token count matters (mixture budgets,
  * sequence packing, chunk planning).
  *
  * Self-contained by construction (this sandbox has no egress, so no
  * published vocab file): [[Bpe.learn]] trains the merges table from a
  * word-frequency list with the textbook algorithm — count adjacent symbol
  * pairs weighted by word frequency, merge the most frequent pair, repeat —
  * with deterministic tie-breaking (count desc, then pair lexicographic), so
  * the same corpus always yields the same table. Encoding follows the
  * published greedy rule: repeatedly merge the adjacent pair with the LOWEST
  * merge rank until none applies.
  *
  * The Spark surface is a native Catalyst expression ([[BpeCount]]) over a
  * broadcast-as-literal merges blob: the ranks table is decoded once per
  * executor (interned by blob hash), encoded word counts are memoized
  * per-executor (Zipf makes the hit rate very high), and the expression
  * participates in whole-stage codegen as a single static kernel call like
  * the other graft kernels.
  */
object Bpe {

  /** Separators for the wire form of a merges table (control characters,
    * never produced by the pre-tokenizer for sane text; words containing
    * them are excluded from learning).
    */
  val PairSep = '\u0001'
  val MergeSep = '\u0002'

  /** GPT-2-style pre-tokenizer (the published pattern, \p-class form):
    * contractions, optionally-space-prefixed letter runs / digit runs /
    * punctuation runs, then residual whitespace.
    */
  private val wordRe =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+".r

  def pretokenize(text: String): Seq[String] =
    if (text == null || text.isEmpty) Nil
    else wordRe.findAllIn(text).toSeq

  /** Split into unicode code-point symbols (surrogate-pair safe). */
  private def symbols(word: String): scala.collection.mutable.ArrayBuffer[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      out += word.substring(i, i + n)
      i += n
    }
    out
  }

  /** Learn `numMerges` merge rules from `(word, frequency)` pairs — the
    * Sennrich algorithm, deterministic: highest weighted pair count wins,
    * ties broken by lexicographic pair order; learning stops early when no
    * pair occurs at least twice.
    */
  def learn(
      wordCounts: Seq[(String, Long)],
      numMerges: Int
  ): Seq[(String, String)] = {
    // exclude words carrying the wire separators (cannot round-trip)
    var vocab: Seq[(scala.collection.mutable.ArrayBuffer[String], Long)] =
      wordCounts
        .filter { case (w, _) =>
          w.nonEmpty && w.indexOf(PairSep) < 0 && w.indexOf(MergeSep) < 0
        }
        .map { case (w, c) => (symbols(w), c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.size < numMerges) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      val best = pairCounts.toSeq
        .filter(_._2 >= 2L)
        .sortBy { case ((a, b), c) => (-c, a, b) }
        .headOption
      best match {
        case None => continue = false
        case Some((pair, _)) =>
          merges += pair
          vocab = vocab.map { case (syms, c) => (mergePair(syms, pair), c) }
      }
    }
    merges.toSeq
  }

  /** Replace every adjacent occurrence of `pair`, left to right. */
  private def mergePair(
      syms: scala.collection.mutable.ArrayBuffer[String],
      pair: (String, String)
  ): scala.collection.mutable.ArrayBuffer[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (
        i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2
      ) {
        out += syms(i) + syms(i + 1)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out
  }

  /** Wire form of a merges table (rides the plan as one string literal). */
  def encodeMerges(merges: Seq[(String, String)]): String =
    merges.map { case (a, b) => s"$a$PairSep$b" }.mkString(MergeSep.toString)

  def decodeMerges(blob: String): Seq[(String, String)] =
    if (blob == null || blob.isEmpty) Nil
    else
      blob
        .split(MergeSep)
        .toSeq
        .filter(_.nonEmpty)
        .map { s =>
          val i = s.indexOf(PairSep)
          (s.substring(0, i), s.substring(i + 1))
        }

  private type Ranks = java.util.HashMap[String, Integer]

  private def ranksOf(merges: Seq[(String, String)]): Ranks = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.putIfAbsent(a + PairSep + b, Integer.valueOf(i))
    }
    m
  }

  /** Interned decoded merges table plus its word-count memo. The memo is
    * String-keyed and PER ENTRY, so the hot path allocates no tuple key and
    * two different tables can never serve each other's counts.
    */
  final class RanksEntry private[Bpe] (val blob: String, val ranks: Ranks) {
    private[Bpe] val counts =
      new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  }

  // per-JVM interning of decoded ranks tables, keyed by the FULL blob
  // string (content equality — a bare blob.hashCode key could silently
  // serve the wrong table on an Int collision). The full-string compare
  // runs once per intern call, and callers intern once per TASK (lazy
  // instance state / codegen mutable state), never per row.
  private val ranksCache =
    new java.util.concurrent.ConcurrentHashMap[String, RanksEntry]()

  def internEntry(blob: String): RanksEntry =
    ranksCache.computeIfAbsent(
      blob,
      b => new RanksEntry(b, ranksOf(decodeMerges(b)))
    )

  /** Greedy lowest-rank-first BPE encode of one pre-tokenized word. */
  def encodeWord(word: String, ranks: Ranks): Seq[String] = {
    val syms = symbols(word)
    if (syms.length < 2 || ranks.isEmpty) return syms.toSeq
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestA: String = null
      var bestB: String = null
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.get(syms(i) + PairSep + syms(i + 1))
        if (r != null && r.intValue() < bestRank) {
          bestRank = r.intValue()
          bestA = syms(i)
          bestB = syms(i + 1)
        }
        i += 1
      }
      if (bestA == null) done = true
      else {
        // merge every adjacent occurrence of the winning pair in place
        var w = 0
        var rdr = 0
        while (rdr < syms.length) {
          if (
            rdr < syms.length - 1 && syms(rdr) == bestA && syms(rdr + 1) == bestB
          ) {
            syms(w) = bestA + bestB
            rdr += 2
          } else {
            syms(w) = syms(rdr)
            rdr += 1
          }
          w += 1
        }
        syms.dropRightInPlace(syms.length - w)
      }
    }
    syms.toSeq
  }

  /** Full-text token sequence: pre-tokenize, BPE-encode each word. */
  def encode(text: String, merges: Seq[(String, String)]): Seq[String] = {
    val ranks = ranksOf(merges)
    pretokenize(text).flatMap(encodeWord(_, ranks))
  }

  private val CountCacheCap = 262144

  /** Public (not package-private): generated whole-stage code calls the
    * static forwarder, which scalac only emits for public object members.
    * The memo lookup is a single String-keyed get on the entry's own map —
    * no per-word tuple allocation on the hot path (the former
    * `(blobHash, word)` key boxed a tuple per word per row).
    */
  def tokenCountWith(text: String, e: RanksEntry): Int = {
    var total = 0
    pretokenize(text).foreach { w =>
      var c = e.counts.get(w)
      if (c == null) {
        c = Integer.valueOf(encodeWord(w, e.ranks).size)
        if (e.counts.size() >= CountCacheCap) e.counts.clear()
        e.counts.put(w, c)
      }
      total += c.intValue()
    }
    total
  }

  /** Convenience form (tests / eval path): intern per call, then count. */
  def tokenCount(text: String, blob: String): Int =
    tokenCountWith(text, internEntry(blob))
}

/** Token count of `child` under the merges table `mergesBlob` (wire form of
  * [[Bpe.encodeMerges]]). Native expression, same shape as [[SimHash64]]:
  * the kernel is a per-row loop behind one static call, and the (large)
  * merges blob rides as a referenced object — never inlined into
  * generated source.
  */
case class BpeCount(child: Expression, mergesBlob: String)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  // interned once per (deserialized) expression instance, i.e. once per
  // task — the per-row path then touches no interning map at all
  @transient private lazy val entry: Bpe.RanksEntry = Bpe.internEntry(mergesBlob)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    java.lang.Integer.valueOf(Bpe.tokenCountWith(s, entry))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val blobRef = ctx.addReferenceObj("mergesBlob", mergesBlob, "java.lang.String")
    // per-task lazily interned entry (mutable state): the generated per-row
    // code pays one null check, not a map lookup
    val entryVar = ctx.addMutableState(
      "graft.functions.Bpe.RanksEntry",
      "bpeEntry"
    )
    nullSafeCodeGen(ctx, ev, c =>
      s"""if ($entryVar == null) { $entryVar = graft.functions.Bpe.internEntry($blobRef); }
         |${ev.value} = graft.functions.Bpe.tokenCountWith($c.toString(), $entryVar);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): BpeCount =
    copy(child = newChild)
}
