package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * Native Catalyst expression for the pairwise-similarity hot kernel
 * (the brief's preference order: compose built-ins > custom Expression
 * with doGenCode > UDF). The higher-order-function formulations
 * (`zip_with`+`aggregate`) evaluate their lambda INTERPRETED per element
 * and allocate an intermediate array per pair — at millions of candidate
 * pairs x 64 dims that interpretation overhead dominates the kernel.
 * This expression generates a tight primitive Java loop inside
 * whole-stage codegen: no allocation, no boxing, no virtual calls.
 *
 * Summation is an ascending left fold, matching the HOF formulation
 * bit-for-bit, so swapping implementations cannot change results.
 */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  // inputs are guaranteed array<double> by the Column helper's casts
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Codegen'd dot product; arguments are cast to array<double> (no-op
    * when already double) so the expression's primitive reads are safe. */
  def dotProduct(a: Column, b: Column): Column = {
    val dd = ArrayType(DoubleType)
    GraftColumnBridge.column(DotProduct(
      GraftColumnBridge.expression(a.cast(dd)), GraftColumnBridge.expression(b.cast(dd))))
  }
}
