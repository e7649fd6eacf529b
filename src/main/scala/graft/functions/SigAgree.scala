package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Count of positions where two equal-length `array<long>` MinHash
  * signatures agree — the kernel of the LSH estimate prefilter
  * (`est_jaccard = agree / numHashes`).
  *
  * Semantically identical to `size(filter(zip_with(a, b, _ === _), x => x))`
  * but without materializing the two intermediate arrays that composition
  * allocates PER COLLIDED PAIR: in the band-join stage the estimate runs on
  * every collision row (~386k distinct pairs, more rows pre-distinct, at
  * sf0.1), which made the composed form the single hottest expression in
  * the dedup path. One fused loop over the array data, inside whole-stage
  * codegen like the other graft kernels.
  */
case class SigAgree(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SigAgree.agree(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SigAgree.agree($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): SigAgree = copy(left = newLeft, right = newRight)
}

object SigAgree {
  def agree(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }
}
