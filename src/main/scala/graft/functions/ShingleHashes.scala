package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct 64-bit hashes of the character k-gram shingles of `child`,
  * in first-occurrence order — one pass, no intermediate string arrays.
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
    if (cnt == m) out else java.util.Arrays.copyOf(out, cnt)
  }
}
