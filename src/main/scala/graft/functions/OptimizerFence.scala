package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/**
 * Identity expression that the optimizer may not move, duplicate or
 * substitute — guide §4.4's "mark the expensive expression
 * non-deterministic" applied to built-in expression trees.
 *
 * The failure mode it exists for (measured on `q_pipeline_chat`):
 * `validateChat(df).filter("chat_ok")` predicate-pushes the flag
 * column through every Project below it, SUBSTITUTING each staged
 * alias — the conv construction (a regexp tokenize + turn-struct
 * build) ended up inlined ~10× inside one Filter condition evaluated
 * on the 1-task scan side of the plan (4.9 s of a 5.5 s query, 31
 * cores idle). Catalyst has no "already cheap, stop" heuristic for
 * alias substitution; declaring the staged column non-deterministic
 * stops both `PushDownPredicates` and `CollapseProject` at this
 * boundary, so the fenced value is computed exactly once, where it
 * was staged.
 *
 * Runtime cost: ZERO — eval and codegen delegate to the child
 * verbatim (no extra method call in generated code). Semantics:
 * identity; the non-determinism flag is a promise the optimizer
 * honors, not a behavior. Trade-off (same as the guide's): other
 * predicates also stop at the fence, so fence only measured-expensive
 * staging columns, never blanket.
 */
case class OptimizerFence(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = child.dataType
  override def prettyName: String = "graft_fence"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): OptimizerFence =
    copy(child = newChild)
}

object OptimizerFence {
  /** `col`, fenced: computed exactly where it is staged. */
  def fence(col: Column): Column =
    GraftColumnBridge.column(OptimizerFence(GraftColumnBridge.expression(col)))
}
