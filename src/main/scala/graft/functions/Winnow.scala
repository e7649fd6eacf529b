package graft.functions

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprint (Schleimer, Wilkerson, Aiken, SIGMOD'03 —
  * the MOSS algorithm): Rabin-Karp rolling hashes of character k-grams,
  * keeping the minimum hash of every window of w consecutive k-grams
  * (rightmost minimum), deduplicated. Guarantees any shared substring of
  * length >= w + k - 1 contributes at least one common fingerprint.
  *
  * Native Catalyst expression returning `array<long>`; used for
  * document-fingerprint dedup / overlap detection over the text corpus.
  */
case class Winnow(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k > 0 && w > 0)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    new GenericArrayData(Winnow.fingerprints(s, k, w))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.Winnow.fingerprints($c.toString(), $k, $w));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}

object Winnow {
  private val B = 1000000007L // rolling base
  private val M = (1L << 61) - 1 // Mersenne modulus

  @inline private def mulmod(a: Long, b: Long): Long = {
    // 61-bit Mersenne multiply via 128-bit split
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // (hi:lo) mod 2^61-1
    val r = ((hi << 3) | (lo >>> 61)) + (lo & M)
    if (r >= M) r - M else r
  }

  def fingerprints(s: String, k: Int, w: Int): Array[Long] = {
    val n = s.length
    if (n < k) return Array.empty
    val numGrams = n - k + 1
    val hashes = new Array[Long](numGrams)
    var h = 0L
    var pow = 1L
    var i = 0
    while (i < k) {
      h = (mulmod(h, B) + s.charAt(i).toLong) % M
      if (i < k - 1) pow = mulmod(pow, B)
      i += 1
    }
    hashes(0) = h
    i = 1
    while (i < numGrams) {
      val drop = mulmod(s.charAt(i - 1).toLong, pow)
      h = ((h - drop) % M + M) % M
      h = (mulmod(h, B) + s.charAt(i + k - 1).toLong) % M
      hashes(i) = h
      i += 1
    }
    if (numGrams <= w) {
      var m = hashes(0); var j = 1
      while (j < numGrams) { if (hashes(j) <= m) m = hashes(j); j += 1 }
      return Array(m)
    }
    // winnow: rightmost min per window of w grams, record on change
    val out = new ArrayBuffer[Long]()
    var last = -1 // index of the recorded minimum
    var start = 0
    while (start + w <= numGrams) {
      if (last < start) {
        var m = start
        var j = start + 1
        while (j < start + w) { if (hashes(j) <= hashes(m)) m = j; j += 1 }
        last = m
        out += hashes(m)
      } else {
        val incoming = start + w - 1
        if (hashes(incoming) <= hashes(last)) {
          last = incoming
          out += hashes(incoming)
        }
      }
      start += 1
    }
    out.distinct.toArray
  }

  def winnow(c: Column, k: Int = 7, w: Int = 8): Column =
    GraftFunctions.winnow(c, k, w)
}
