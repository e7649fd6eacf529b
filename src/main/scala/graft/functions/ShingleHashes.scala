package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct 64-bit hashes of the character k-gram shingles of `child`,
  * SORTED ascending — one pass, no intermediate string arrays. The sorted
  * contract is load-bearing: [[SortedIntersectCount]] merge-counts two of
  * these arrays in O(n+m) with zero per-pair allocations, replacing
  * `array_intersect`'s per-pair hash-set build in the exact-verify stage.
  * (Set semantics — sizes, intersections — are order-invariant, so every
  * other consumer is unaffected.)
  *
  * Replaces the composed form
  * `array_distinct(transform(shingles(text, k), s => xxhash64(s)))`, which
  * materializes every k-char substring as a UTF8String, hashes it, and
  * dedups with a boxing hash set — measured as the #2 cost of the
  * exact-verify stage after the estimate prefilter. Downstream consumers
  * (`jaccardVerify` set intersections, `contaminatedIds` semi-join) use the
  * hashes only for EQUALITY between texts hashed by this same expression,
  * so the hash family is internal: FNV-1a over the UTF-16 code units with a
  * splitmix64 finalizer (collision odds ~1e-13 per compared pair at ~500
  * shingles — the same argument the composed xxhash64 form relied on).
  * Texts shorter than k hash whole, matching `DedupOps.shingles`.
  */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    new GenericArrayData(ShingleHashes.hashes(s, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.ShingleHashes.hashes($c.toString(), $k));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  @inline private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  @inline private def hashRange(s: String, from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    mix64(h)
  }

  /** Distinct window hashes in first-occurrence order. Dedup is an
    * open-addressing long table (0 = empty; a real 0 hash is remapped),
    * no boxing, sized 2x the window count.
    */
  def hashes(s: String, k: Int): Array[Long] = {
    val n = s.length
    if (n < k) return Array(hashRange(s, 0, n))
    val m = n - k + 1
    var cap = 16
    while (cap < m * 2) cap <<= 1
    val table = new Array[Long](cap)
    val out = new Array[Long](m)
    var cnt = 0
    var i = 0
    while (i < m) {
      var h = hashRange(s, i, i + k)
      if (h == 0L) h = 0x9e3779b97f4a7c15L
      var idx = (h ^ (h >>> 32)).toInt & (cap - 1)
      var seen = false
      while (!seen && table(idx) != 0L) {
        if (table(idx) == h) seen = true
        else idx = (idx + 1) & (cap - 1)
      }
      if (!seen) {
        table(idx) = h
        out(cnt) = h
        cnt += 1
      }
      i += 1
    }
    val res = if (cnt == m) out else java.util.Arrays.copyOf(out, cnt)
    java.util.Arrays.sort(res)
    res
  }
}

/** `|A ∩ B|` of two ascending-sorted `array<long>` columns (the
  * [[ShingleHashes]] wire form) — a single merge walk, no per-pair hash
  * set. Equal to `size(array_intersect(a, b))` for distinct sorted inputs
  * (golden-tested); behavior on unsorted input is undefined, so this
  * expression is package-wired only against [[ShingleHashes]] outputs.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.count(
      a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData]
    )

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntersectCount.count($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): SortedIntersectCount = copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  def count(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}
