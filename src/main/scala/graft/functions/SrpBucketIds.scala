package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/**
 * Native SRP bucketing: all `tables` bucket ids of a vector in ONE
 * expression — bucket(t) = bit pattern of sign(dot(plane(t,p), vec))
 * over `planes` hyperplanes.
 *
 * The declarative formulation (tables x planes separate dot-product
 * expressions in one projection) evaluates `tables*planes` array
 * expressions per row; at 32x3 or 12x6 copies the generated code
 * outgrows Janino's method limits and whole-stage codegen degrades,
 * leaving per-plane INTERPRETED evaluation with a per-dot cast
 * allocation. Here the whole assignment is one tight loop over the
 * raw float/double elements (`tables*planes*dim` multiplies, zero
 * allocation) — same ascending fold order, so bucket ids are
 * bit-identical to the per-plane formulation.
 *
 * The hyperplane matrix is regenerated from `(tables, planes, dim,
 * seed)` via the fixed-seed PRNG and memoized per JVM — the plan node
 * carries four scalars, not a tables*planes*dim literal.
 */
case class SrpBucketIds(child: Expression, tables: Int, planes: Int, dim: Int, seed: Long,
                        strict: Boolean = false)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = !strict || child.nullable
  override def prettyName: String = "graft_srp_buckets"

  // a def, not a val: the child is unresolved (NullType) at construction
  private def elemIsDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case ArrayType(FloatType, _) => false
    case other => throw new IllegalArgumentException(
      s"graft_srp_buckets needs array<float|double>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    SrpBucketIds.compute(input.asInstanceOf[ArrayData], tables, planes, dim, seed,
      elemIsDouble, strict)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val call =
        s"""${ev.value} = graft.functions.SrpBucketIds$$.MODULE$$.compute(
           |  $c, $tables, $planes, $dim, ${seed}L, $elemIsDouble, $strict);""".stripMargin
      // only mirror compute()'s null result into isNull when this
      // expression is nullable: when it isn't (strict mode, non-null
      // child), ev.isNull is the unassignable FalseLiteral and the
      // assignment would fail Janino compilation (falling back to
      // interpreted execution); compute() throws in strict mode instead
      // of returning null, so the check is dead code there anyway.
      if (nullable) call + s"\nif (${ev.value} == null) { ${ev.isNull} = true; }"
      else call
    })

  override protected def withNewChildInternal(newChild: Expression): SrpBucketIds =
    copy(child = newChild)
}

object SrpBucketIds {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int, Long), Array[Array[Double]]]()

  /** plane(t*planes + p) — generated in the exact draw order of
    * `Array.fill(tables, planes, dim)(rnd.nextGaussian())` so bucket ids
    * match the historical per-plane formulation bit-for-bit. */
  private def matrix(tables: Int, planes: Int, dim: Int, seed: Long): Array[Array[Double]] =
    cache.computeIfAbsent((tables, planes, dim, seed), _ => {
      val rnd = new scala.util.Random(seed)
      Array.fill(tables * planes)(Array.fill(dim)(rnd.nextGaussian()))
    })

  def compute(vec: ArrayData, tables: Int, planes: Int, dim: Int,
              seed: Long, elemIsDouble: Boolean, strict: Boolean): ArrayData = {
    val m = matrix(tables, planes, dim, seed)
    // a mismatched vector must never silently hash a PREFIX (quietly
    // degraded recall). Default contract matches the rerank side's
    // DotProduct: the row becomes NULL and is EXCLUDED from blocking —
    // one ragged/corrupt vector shouldn't kill an hours-long job.
    // Strict mode (opt-in) throws instead, surfacing a systematic
    // misconfiguration (e.g. wrong `dim` for the whole corpus) loudly.
    if (vec.numElements() != dim) {
      if (strict) throw new IllegalArgumentException(
        s"graft_srp_buckets configured for dim=$dim but vector has ${vec.numElements()} elements")
      return null
    }
    val n = dim
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var p = 0
      while (p < planes) {
        val plane = m(t * planes + p)
        var s = 0.0
        var i = 0
        while (i < n) {
          s += plane(i) * (if (elemIsDouble) vec.getDouble(i) else vec.getFloat(i).toDouble)
          i += 1
        }
        bucket = bucket * 2 + (if (s >= 0) 1 else 0)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  /** The hyperplane matrix itself (plane(t*planes+p) rows) — public so
    * the graded-query ORACLE can embed the planes as SQL literals and
    * recompute the bucketing independently in DuckDB (the zorder
    * generated-oracle convention). */
  def planeMatrix(tables: Int, planes: Int, dim: Int,
                  seed: Long = 42L): Array[Array[Double]] =
    matrix(tables, planes, dim, seed)

  /** Column helper: array of `tables` bucket ids for `vec`. A vector
    * whose size differs from `dim` yields NULL (excluded from blocking;
    * the rerank's DotProduct nulls the same rows) unless `strict`. */
  def srpBucketIds(vec: Column, tables: Int, planes: Int, dim: Int,
                   seed: Long = 42L, strict: Boolean = false): Column =
    GraftColumnBridge.column(
      SrpBucketIds(GraftColumnBridge.expression(vec), tables, planes, dim, seed, strict))
}
