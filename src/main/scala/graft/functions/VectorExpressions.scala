package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

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

/**
 * Whole PQ ADC lookup table (m × numCodes sub-centroid dots) as ONE
 * expression — r21, guide §1.2 step 2 / §4: the composed formulation
 * (`array(array(dotProduct(slice(qv,…), lit(centroid))))`) builds
 * m·numCodes separate expression trees (128 at m=8, codes=16), and the
 * whole-stage-codegen source for that projection took ~1.8 s of janino
 * compile per query plan — more than the query's entire execution at
 * sf0.1. One expression with a tight Scala loop removes the codegen
 * blowup (CodegenFallback: eval is a single JIT-compiled method; the
 * table is computed once per QUERY row, the per-pair ADC score stays
 * builtin-codegen).
 *
 * Bit-identical to the composed form: per (s, c) the fold is the same
 * ascending per-subspace dot; a NULL query vector, a short slice
 * (ragged vector) or a NULL element yields a NULL table entry exactly
 * where slice+dotProduct produced one (the outer table itself is never
 * NULL, matching `array(...)`).
 */
case class PqAdcTable(child: Expression,
                      centroids: Array[Array[Array[Double]]])
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  private val m = centroids.length
  private val numCodes = centroids(0).length
  private val subdim = centroids(0)(0).length

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = true), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_adc_table"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val qv = child.eval(input).asInstanceOf[ArrayData]
    val qn = if (qv == null) 0 else qv.numElements()
    val outer = new Array[Any](m)
    var s = 0
    while (s < m) {
      val inner = new Array[Any](numCodes)
      val start = s * subdim
      // slice semantics: a missing/short/null-bearing slice leaves the
      // whole subspace's entries NULL (dot of ragged or null input)
      if (qv != null && start + subdim <= qn) {
        var hasNull = false
        var j = 0
        while (j < subdim && !hasNull) {
          if (qv.isNullAt(start + j)) hasNull = true
          j += 1
        }
        if (!hasNull) {
          var c = 0
          while (c < numCodes) {
            val cent = centroids(s)(c)
            var acc = 0.0
            var i = 0
            while (i < subdim) {
              acc += qv.getDouble(start + i) * cent(i)
              i += 1
            }
            inner(c) = acc
            c += 1
          }
        }
      }
      outer(s) = new org.apache.spark.sql.catalyst.util.GenericArrayData(inner)
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(outer)
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcTable =
    copy(child = newChild)
}

/**
 * PQ encode (nearest sub-centroid per subspace) as ONE expression —
 * r21, the corpus-side twin of [[PqAdcTable]]: the composed
 * formulation built m·numCodes `struct(dot(slice(vnorm,…),lit)·2−c2, c)`
 * trees with the whole normalize subtree duplicated under each slice —
 * the dominant share of pqTopK's ~1.8 s plan+codegen gap, and per
 * corpus ROW at scale a 128-branch generated function instead of a
 * loop. Bit-identical by construction:
 *
 *  - norm = sqrt(ascending Σ x²); ANY null element nulls the norm, and
 *    `when(n > 0, x/n).otherwise(0.0)` then zero-fills the whole
 *    vector (null condition → otherwise), exactly as the HOF form;
 *  - per (s, c): score = 2·(ascending subspace dot) − c2 with c2
 *    computed by the same Scala `map(x*x).sum` fold;
 *  - a NULL input vector or a short/ragged slice gives NULL scores for
 *    that subspace, and `array_max` over `struct(score, c)` with NULL
 *    smallest, NaN largest, −0.0 == 0.0 and ties toward the larger
 *    code is replayed by the comparison loop below.
 */
case class PqEncode(child: Expression,
                    centroids: Array[Array[Array[Double]]])
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  private val m = centroids.length
  private val numCodes = centroids(0).length
  private val subdim = centroids(0)(0).length
  private val c2: Array[Array[Double]] =
    centroids.map(_.map(c => c.map(x => x * x).sum))

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_pq_encode"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vd = child.eval(input).asInstanceOf[ArrayData]
    // norm: null array or any null element -> null norm -> zero-fill
    var vnormNull = false // transform(null) -> null vector
    var zeroFill = false  // n null or n <= 0 -> every component 0.0
    var n = 0.0
    if (vd == null) vnormNull = true
    else {
      val len = vd.numElements()
      var i = 0
      var s = 0.0
      var anyNull = false
      while (i < len && !anyNull) {
        if (vd.isNullAt(i)) anyNull = true
        else { val x = vd.getDouble(i); s += x * x }
        i += 1
      }
      if (anyNull) zeroFill = true
      else {
        n = math.sqrt(s)
        // Spark comparison semantics: NaN > 0 is TRUE (NaN sorts above
        // everything), so only an exactly-zero norm zero-fills; a NaN
        // norm rides the divide path (x/NaN = NaN) like the when() did
        if (n == 0.0) zeroFill = true
      }
    }
    val vlen = if (vd == null) 0 else vd.numElements()
    val out = new Array[Any](m)
    var sIdx = 0
    while (sIdx < m) {
      val start = sIdx * subdim
      // slice of a null vector -> null; short slice -> ragged dot -> null
      val sliceOk = !vnormNull && start + subdim <= vlen
      var bestC = 0
      var bestScore = 0.0
      var bestNull = true
      var c = 0
      while (c < numCodes) {
        var scoreNull = true
        var score = 0.0
        if (sliceOk) {
          val cent = centroids(sIdx)(c)
          var acc = 0.0
          var j = 0
          while (j < subdim) {
            val x = if (zeroFill) 0.0 else vd.getDouble(start + j) / n
            acc += x * cent(j)
            j += 1
          }
          score = acc * 2.0 - c2(sIdx)(c)
          scoreNull = false
        }
        // array_max tie rules: NULL smallest, NaN largest, ties -> the
        // later (larger) code wins because we replace on >=
        val replace =
          if (c == 0) true
          else if (scoreNull && bestNull) true
          else if (scoreNull) false
          else if (bestNull) true
          else if (score == bestScore) true // -0.0 == 0.0 tie -> later code
          else java.lang.Double.compare(score, bestScore) >= 0
        if (replace) { bestC = c; bestScore = score; bestNull = scoreNull }
        c += 1
      }
      out(sIdx) = bestC
      sIdx += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/**
 * Top-`nprobe` centroids of a vector by dot product, as ONE expression
 * — r21, the centroid-assignment twin of [[PqAdcTable]]/[[PqEncode]]:
 * the composed formulation (`slice(array_sort(array(struct(dot(v,
 * lit(c_i)), i))), -n, n)`) built one expression tree per centroid
 * (k0 ≈ sqrt(corpus) of them) and sorted k0 boxed structs per row with
 * the interpreted struct ordering. One expression computes the k dots
 * in a tight loop and sorts an index array with the identical
 * comparator.
 *
 * Bit-identical ordering: ascending by (dot, cid) where a NULL dot
 * (null/ragged input vector) is smallest, NaN is largest, and
 * -0.0 == 0.0 — then the LAST `min(nprobe, k)` entries in ascending
 * order, exactly `slice(array_sort(...), -n, n)`. Output:
 * array<struct<dot: double, cid: int>>, never NULL.
 */
case class TopCentroids(child: Expression,
                        centroids: Array[Array[Double]],
                        nprobe: Int)
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  private val k = centroids.length
  private val sliceLen = math.min(nprobe, k)

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("dot", DoubleType, nullable = true),
      org.apache.spark.sql.types.StructField("cid", IntegerType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_top_centroids"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input).asInstanceOf[ArrayData]
    val dots = new Array[Double](k)
    val dotNull = new Array[Boolean](k)
    if (v == null) java.util.Arrays.fill(dotNull, true)
    else {
      val n = v.numElements()
      var hasNull = false
      var i = 0
      while (i < n && !hasNull) { // dot breaks at the first null element
        if (v.isNullAt(i)) hasNull = true
        i += 1
      }
      var c = 0
      while (c < k) {
        val cent = centroids(c)
        if (hasNull || cent.length != n) dotNull(c) = true
        else {
          var acc = 0.0
          var j = 0
          while (j < n) { acc += v.getDouble(j) * cent(j); j += 1 }
          dots(c) = acc
        }
        c += 1
      }
    }
    // ascending (dot, cid): NULL smallest, NaN largest, -0.0 == 0.0
    // (Spark's SQLOrderingUtil.compareDoubles), cid breaks ties
    val idx = Array.range(0, k).map(Integer.valueOf)
    java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val an = dotNull(a); val bn = dotNull(b)
        val c0 =
          if (an && bn) 0
          else if (an) -1
          else if (bn) 1
          else if (dots(a) == dots(b)) 0
          else java.lang.Double.compare(dots(a), dots(b))
        if (c0 != 0) c0 else Integer.compare(a, b)
      }
    })
    val out = new Array[Any](sliceLen)
    var p = 0
    while (p < sliceLen) {
      val ci = idx(k - sliceLen + p)
      out(p) = org.apache.spark.sql.catalyst.InternalRow(
        if (dotNull(ci)) null else dots(ci), ci.intValue())
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): TopCentroids =
    copy(child = newChild)
}

object VectorExpressions {
  /** Codegen'd dot product; arguments are cast to array<double> (no-op
    * when already double) so the expression's primitive reads are safe. */
  def dotProduct(a: Column, b: Column): Column = {
    val dd = ArrayType(DoubleType)
    GraftColumnBridge.column(DotProduct(
      GraftColumnBridge.expression(a.cast(dd)), GraftColumnBridge.expression(b.cast(dd))))
  }

  /** The m × numCodes ADC table of `qv` against a PQ codebook, as one
    * expression (see [[PqAdcTable]]). */
  def pqAdcTable(qv: Column, centroids: Array[Array[Array[Double]]]): Column = {
    val dd = ArrayType(DoubleType)
    GraftColumnBridge.column(
      PqAdcTable(GraftColumnBridge.expression(qv.cast(dd)), centroids))
  }

  /** PQ codes of `vec` against a codebook (normalize + per-subspace
    * nearest sub-centroid), as one expression (see [[PqEncode]]). */
  def pqEncode(vec: Column, centroids: Array[Array[Array[Double]]]): Column = {
    val dd = ArrayType(DoubleType)
    GraftColumnBridge.column(
      PqEncode(GraftColumnBridge.expression(vec.cast(dd)), centroids))
  }

  /** The `nprobe` nearest centroids of `v` by dot product, ascending
    * (slice(array_sort(...), -n, n) semantics — see [[TopCentroids]]). */
  def topCentroids(v: Column, centroids: Array[Array[Double]],
                   nprobe: Int): Column = {
    val dd = ArrayType(DoubleType)
    GraftColumnBridge.column(
      TopCentroids(GraftColumnBridge.expression(v.cast(dd)), centroids, nprobe))
  }
}
