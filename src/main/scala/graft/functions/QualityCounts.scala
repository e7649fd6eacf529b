package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text-feature counts for the quality-score / token-accounting
  * hot path: a single scan of the string computes what the composed
  * builtins derive from SIX passes (two regex `\s+` splits with their token
  * arrays, three regex character-class scans, one `array_intersect` against
  * the stopword list, plus the BPE-ish alternation regex). Per-byte work on
  * the corpus scan is the cost that scales with a 100 TB documents table
  * (guide §1.2 step 2), so the fused loop replaces them all.
  *
  * Field-for-field equal BY CONSTRUCTION to the composed forms (golden- and
  * property-tested in TrainingOpsSpec):
  *
  *  - `n_toks`   = `size(filter(split(text, "\\s+"), t => length(t) > 0))`
  *    — count of maximal runs of non-whitespace; Java regex `\s` is exactly
  *    the six ASCII separators scanned here.
  *  - `punct`/`digits`/`uppers` = `size(regexp_extract_all(text, "[c]", 0))`
  *    for the ASCII `\p{Punct}` / `[0-9]` / `[A-Z]` classes — per code
  *    point, and the classes are pure ASCII, so byte-wise checks agree.
  *  - `stop`     = `size(array_intersect(tokens(lower(text)), enStop))`
  *    — the number of DISTINCT English stopwords present (bitmask +
  *    popcount). Lowercasing only ASCII `A-Z` is equivalence-preserving
  *    here: the stop list is ASCII `a-z`, and the only non-ASCII code
  *    point whose Unicode lowercase lands in ASCII is U+212A (KELVIN
  *    SIGN → 'k'), which no stopword contains, so a token matches under
  *    Unicode lowering iff it matches under ASCII lowering.
  *  - `bpeish`   = `size(regexp_extract_all(text,
  *    "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]", 0))` — maximal letter runs +
  *    maximal digit runs + single non-alnum-non-space CODE POINTS
  *    (surrogate pairs counted once, as the regex engine does).
  */
case class QualityCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = QualityCounts.OutputType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    QualityCounts.counts(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.QualityCounts.counts($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): QualityCounts =
    copy(child = newChild)
}

object QualityCounts {
  val OutputType: StructType = StructType(
    Seq(
      StructField("n_toks", IntegerType, nullable = false),
      StructField("punct", IntegerType, nullable = false),
      StructField("digits", IntegerType, nullable = false),
      StructField("uppers", IntegerType, nullable = false),
      StructField("stop", IntegerType, nullable = false),
      StructField("bpeish", IntegerType, nullable = false)
    )
  )

  /** The English stop list this kernel matches — MUST stay identical to
    * `TextOps.enStop` (asserted by a golden test). Each word is ≤ 4
    * lowercase ASCII letters, packed 5 bits per char into a long for
    * branch-free lookup.
    */
  private val StopWords: Array[String] = Array(
    "the", "of", "and", "to", "in", "a", "is", "that", "it", "was", "for",
    "on", "are", "as", "with", "his", "they", "at", "be", "this", "have",
    "from", "or", "had", "by", "not", "but", "what", "all", "were", "we"
  )
  require(StopWords.length <= 32)

  private def pack(w: String): Long = {
    var p = 0L
    var i = 0
    while (i < w.length) { p = p * 32 + (w.charAt(i) - 'a' + 1); i += 1 }
    p
  }

  // sorted packed words with their original index for the distinct bitmask
  private val (packedSorted: Array[Long], packedIdx: Array[Int]) = {
    val pairs = StopWords.zipWithIndex
      .map { case (w, i) => (pack(w), i) }
      .sortBy(_._1)
    (pairs.map(_._1), pairs.map(_._2))
  }

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  @inline private def isAsciiPunct(cp: Int): Boolean =
    (cp >= 33 && cp <= 47) || (cp >= 58 && cp <= 64) ||
      (cp >= 91 && cp <= 96) || (cp >= 123 && cp <= 126)

  def counts(s: String): InternalRow = {
    val n = s.length
    var nToks = 0
    var punct = 0
    var digits = 0
    var uppers = 0
    var bpeish = 0
    var stopMask = 0
    var inTok = false
    var tokPack = 0L
    var tokLen = 0 // -1 once the token can no longer be a stopword
    var runState = 0 // bpeish: 0 = none, 1 = letter run, 2 = digit run

    @inline def endToken(): Unit = {
      nToks += 1
      if (tokLen >= 1) {
        val idx = java.util.Arrays.binarySearch(packedSorted, tokPack)
        if (idx >= 0) stopMask |= 1 << packedIdx(idx)
      }
      inTok = false
    }

    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (isWs(c)) {
        if (inTok) endToken()
        runState = 0
        i += 1
      } else {
        if (!inTok) { inTok = true; tokPack = 0L; tokLen = 0 }
        // one CODE POINT per iteration (surrogate pair = one step of 2)
        var step = 1
        var cp: Int = c
        if (Character.isHighSurrogate(c) && i + 1 < n &&
          Character.isLowSurrogate(s.charAt(i + 1))) {
          cp = Character.toCodePoint(c, s.charAt(i + 1))
          step = 2
        }
        // ASCII class counts
        if (cp >= '0' && cp <= '9') digits += 1
        else if (cp >= 'A' && cp <= 'Z') uppers += 1
        if (isAsciiPunct(cp)) punct += 1
        // bpeish run segmentation
        if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')) {
          if (runState != 1) { bpeish += 1; runState = 1 }
        } else if (cp >= '0' && cp <= '9') {
          if (runState != 2) { bpeish += 1; runState = 2 }
        } else {
          bpeish += 1
          runState = 0
        }
        // stopword candidate accumulation (ASCII-lowered, ≤ 4 letters)
        if (tokLen >= 0) {
          val lc = if (cp >= 'A' && cp <= 'Z') cp + 32 else cp
          if (tokLen < 4 && lc >= 'a' && lc <= 'z')
            { tokPack = tokPack * 32 + (lc - 'a' + 1); tokLen += 1 }
          else tokLen = -1
        }
        i += step
      }
    }
    if (inTok) endToken()
    new GenericInternalRow(
      Array[Any](nToks, punct, digits, uppers, Integer.bitCount(stopMask), bpeish)
    )
  }
}
