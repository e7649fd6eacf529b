package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Cosine similarity of two `array<float>` / `array<double>` embedding
  * columns (element type resolved per side) — dot product and both norms
  * accumulated in ONE pass, replacing the composed form
  *
  *   `dot(a,b) / (greatest(norm(a),1e-12) * greatest(norm(b),1e-12))`
  *
  * which runs three separate `aggregate(zip_with(...))` folds (each
  * materializing a zipped array per pair) and re-computes the base-side
  * norm for every query it is scored against. Accumulation order is
  * left-to-right exactly like `aggregate`, so the result is bit-identical
  * to the composed expression (same IEEE sums, same guard formula) —
  * asserted by a CodegenSpec golden. Null arrays return null; a null
  * ELEMENT nulls the result like the composed fold; length mismatch
  * (impossible for fixed-dim embeddings) also returns null, matching
  * `zip_with`'s null-padding behavior.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  // element types resolve per side: the near-dup queries run on
  // array<double> (planted-perturbation arithmetic), ANN on array<float>
  @transient private lazy val leftFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val rightFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.cosine(
      a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData],
      leftFloat,
      rightFloat
    )

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""java.lang.Double __cs = graft.functions.CosineSim.cosine($a, $b, $leftFloat, $rightFloat);
         |if (__cs == null) { ${ev.isNull} = true; } else { ${ev.value} = __cs.doubleValue(); }
         |""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): CosineSim = copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Boxed so codegen/eval can signal null (mirrors zip_with null rules). */
  def cosine(
      a: ArrayData,
      b: ArrayData,
      aFloat: Boolean,
      bFloat: Boolean
  ): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val da = math.max(math.sqrt(na), 1e-12)
    val db = math.max(math.sqrt(nb), 1e-12)
    java.lang.Double.valueOf(dot / (da * db))
  }
}

/** Random-hyperplane LSH code of an `array<float>` vector — all `bits`
  * sign bits in ONE pass over the elements, replacing the composed
  * per-plane form (one `aggregate(zip_with(vec, sequence(...), ...))` per
  * bit, each materializing an index array and a zipped array per row).
  *
  * Bit p of the code is `sign(sum_i v_i * w(band*bits+p, i))` with the
  * weight `w(p, i) = pmod(xxhash64(p, i), 2001) - 1000` — the exact hash
  * Spark's `xxhash64(lit(p), i)` computes for two int arguments
  * (`XXH64.hashInt(i, XXH64.hashInt(p, 42))`), so codes are bit-identical
  * to the declarative formulation (golden-tested; the pinned q_knn_lsh
  * oracle would catch any divergence). A null element zeroes every
  * projection's sign bit exactly like the composed `when(null >= 0)`
  * fallthrough, yielding code 0.
  */
case class LshCode(child: Expression, bits: Int, band: Int)
    extends UnaryExpression {
  require(bits > 0 && bits <= 63)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  @transient private lazy val planeSeeds: Array[Long] =
    LshCode.seeds(bits, band)
  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      LshCode.code(input.asInstanceOf[ArrayData], planeSeeds, isFloat)
    )

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("planeSeeds", planeSeeds, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.LshCode.code($c, $seedsRef, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): LshCode =
    copy(child = newChild)
}

object LshCode {
  /** Per-plane inner seeds: `xxhash64(p, i)` folds as
    * `hashInt(i, hashInt(p, 42))`, so `hashInt(p, 42)` hoists per plane.
    */
  def seeds(bits: Int, band: Int): Array[Long] =
    Array.tabulate(bits)(p => XXH64.hashInt(band * bits + p, 42L))

  def code(vec: ArrayData, planeSeeds: Array[Long], isFloat: Boolean): Long = {
    val bits = planeSeeds.length
    val n = vec.numElements()
    val proj = new Array[Double](bits)
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return 0L
      val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      var p = 0
      while (p < bits) {
        val h = XXH64.hashInt(i, planeSeeds(p))
        val w = (((h % 2001L) + 2001L) % 2001L).toDouble - 1000.0
        proj(p) += x * w
        p += 1
      }
      i += 1
    }
    var codeAcc = 0L
    var p = 0
    while (p < bits) {
      if (proj(p) >= 0) codeAcc |= 1L << p
      p += 1
    }
    codeAcc
  }
}
