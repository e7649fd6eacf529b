package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature over character k-gram shingles, as a native Catalyst
  * expression: one pass over the text computes rolling shingle hashes and
  * folds all `numHashes` per-function minima simultaneously.
  *
  * The declarative formulation (transform + array_min per hash function)
  * re-walks the shingle array `numHashes` times and re-hashes strings each
  * time — benchmarked ~50x slower on the sf0.1 documents table. This is the
  * "custom Expression beats composition" case from the design preference
  * order.
  *
  * Hash family: h_i(s) = mix64(rollingHash(s) ^ mix64(i)) — pairwise
  * independent enough for Jaccard estimation (Broder 1997 resemblance
  * sketches).
  */
case class MinHashSig(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression {
  require(k > 0 && numHashes > 0)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    new GenericArrayData(MinHashSig.signature(s, k, numHashes))
  }

  // codegen: the kernel stays one static JIT'd call, but the surrounding
  // project/filter pipeline keeps whole-stage codegen (CodegenFallback
  // would break the fused span around the hottest expression in the
  // dedup path)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.MinHashSig.signature($c.toString(), $k, $numHashes));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  @inline private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def signature(s: String, k: Int, numHashes: Int): Array[Long] = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val seeds = Array.tabulate(numHashes)(i => mix64(i.toLong * 0x9e3779b97f4a7c15L + 0x1234567L))
    val n = s.length

    @inline def fold(shingleHash: Long): Unit = {
      val base = mix64(shingleHash)
      var i = 0
      while (i < numHashes) {
        val v = mix64(base ^ seeds(i))
        if (v < mins(i)) mins(i) = v
        i += 1
      }
    }

    if (n < k) {
      // short text: the whole string is the single shingle
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < n) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
      fold(h)
    } else {
      // polynomial rolling hash over k-grams (deduplication of identical
      // shingles is unnecessary: min() is idempotent)
      val B = 1000003L
      var pow = 1L
      var i = 0
      while (i < k - 1) { pow *= B; i += 1 }
      var h = 0L
      i = 0
      while (i < k) { h = h * B + s.charAt(i).toLong; i += 1 }
      fold(h)
      i = k
      while (i < n) {
        h = (h - s.charAt(i - k).toLong * pow) * B + s.charAt(i).toLong
        fold(h)
        i += 1
      }
    }
    mins
  }
}
