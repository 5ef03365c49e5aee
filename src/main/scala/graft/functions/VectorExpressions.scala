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
 * bit-for-bit, so swapping implementations cannot change results: like
 * `aggregate(zip_with(a,b,*),...)` it returns NULL for ragged lengths
 * (zip_with pads with null) or a null element — bad embedding data
 * surfaces as null, never as a silently-truncated sum. The per-element
 * null branch is only generated when the array type admits nulls
 * (`containsNull`), so dense float/double columns keep the tight loop.
 */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  // inputs are guaranteed array<double> by the Column helper's casts
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"
  override def nullable: Boolean = true

  private def elementsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  })

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val checkNulls = elementsNullable
    var s = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      val nullCheck =
        if (elementsNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
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
