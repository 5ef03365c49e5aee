package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Feature-hashing document vector (the "hashing trick", Weinberger et
 * al. 2009): token counts folded into a fixed `dim`-bucket histogram by
 * token hash, L2-normalized — a model-free embedding that plugs a
 * TEXT-only corpus into the entire vector family
 * ([[graft.operators.Similarity]]: cosine near-dup, ANN, spherical
 * k-means, cluster-balanced sampling, SemDeDup-style collapse) without
 * an external embedding model. Cosine between hashing vectors
 * approximates token-histogram cosine (collisions only ADD mass
 * jointly, so similar token distributions stay similar).
 *
 * One pass over the text's bytes — same whitespace byte-scan and
 * xxhash64(seed 42) token hashing as [[Simhash63]]: tokens are maximal
 * `\S+` runs (any [\t-\r ] whitespace separates, runs collapse, no
 * empty tokens). NOTE this is NOT [[ShingleHashes]]'s token
 * definition — that kernel mirrors `split(text, ' ')` (0x20 only,
 * empty tokens counted), so composing hashing vectors with
 * shingle-based ops on tab/newline-separated text mixes two
 * tokenizations; on single-space-separated text they agree.
 * Sign trick: bit 63 of the token hash (untouched by the bucket
 * modulus) decides +1/-1, which keeps the expected dot product of
 * UNRELATED documents at zero instead of drifting positive with
 * length — the standard signed hashing-trick estimator.
 *
 * Empty/all-whitespace documents produce the zero vector (norm 0 —
 * excluded from cosine ops by the existing zero-norm guards).
 * Codegen'd via a static call; the projection rides the scan.
 */
case class HashingVector(child: Expression, dim: Int) extends UnaryExpression {

  require(dim >= 1, "dim must be >= 1")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_hashing_vector"

  override protected def nullSafeEval(input: Any): Any =
    HashingVector.compute(input.asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashingVector$$.MODULE$$.compute($c, $dim);")

  override protected def withNewChildInternal(newChild: Expression): HashingVector =
    copy(child = newChild)
}

object HashingVector {

  private def isSpace(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  /** One-pass signed bucket histogram, L2-normalized. Called from both
    * the interpreted eval and the generated code. */
  def compute(text: UTF8String, dim: Int): ArrayData = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val len = text.numBytes
    val acc = new Array[Double](dim)
    var i = 0
    while (i < len) {
      while (i < len && isSpace(org.apache.spark.unsafe.Platform.getByte(base, off + i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && !isSpace(org.apache.spark.unsafe.Platform.getByte(base, off + i))) i += 1
        // = XxHash64Function.hash(token, StringType, 42) = xxhash64(token)
        val h = XXH64.hashUnsafeBytes(base, off + start, i - start, 42L)
        val bucket = (((h % dim) + dim) % dim).toInt
        acc(bucket) += (if (h < 0) -1.0 else 1.0) // sign = bit 63
      }
    }
    var s = 0.0
    var b = 0
    while (b < dim) { s += acc(b) * acc(b); b += 1 }
    if (s > 0) {
      val n = math.sqrt(s)
      b = 0
      while (b < dim) { acc(b) /= n; b += 1 }
    }
    new GenericArrayData(acc)
  }

  /** Column helper. */
  def hashingVector(text: Column, dim: Int): Column =
    GraftColumnBridge.column(HashingVector(GraftColumnBridge.expression(text), dim))
}
