package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Character-n-gram feature-hashing vector — [[HashingVector]]'s
 * sub-word sibling, the fastText-langid feature space (Joulin et al.
 * 2017 hash char n-grams for exactly this task): every byte n-gram of
 * length `nLo..nHi` over the whitespace-normalized UTF-8 bytes is
 * hashed (xxhash64, seed 42) into a signed `dim`-bucket histogram,
 * L2-normalized.
 *
 * Why bytes, not code points: language identity lives in the byte
 * distribution — UTF-8 multi-byte sequences (CJK, Cyrillic, accented
 * Latin) produce script-specific byte n-grams without any decoding,
 * and morphology-rich languages expose suffix/prefix n-grams that
 * whole-token hashing ([[HashingVector]]) cannot see on short text.
 * Whitespace runs collapse to ONE 0x20 boundary byte (leading/trailing
 * trimmed), so n-grams spanning a word boundary carry "word-final /
 * word-initial" signal while tab-vs-space formatting noise cancels.
 *
 * Empty/all-whitespace text (or text shorter than `nLo` bytes)
 * produces the zero vector — norm 0, excluded downstream by the
 * existing zero-norm guards. Codegen'd via a static call; the
 * projection rides the scan. O(len · (nHi−nLo+1)) per row, one scratch
 * copy of the normalized bytes.
 */
case class CharNgramVector(child: Expression, dim: Int, nLo: Int, nHi: Int)
    extends UnaryExpression {

  require(dim >= 1, "dim must be >= 1")
  require(nLo >= 1 && nHi >= nLo, "need 1 <= nLo <= nHi")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_char_ngram_vector"

  override protected def nullSafeEval(input: Any): Any =
    CharNgramVector.compute(input.asInstanceOf[UTF8String], dim, nLo, nHi)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharNgramVector$$.MODULE$$.compute($c, $dim, $nLo, $nHi);")

  override protected def withNewChildInternal(newChild: Expression): CharNgramVector =
    copy(child = newChild)
}

object CharNgramVector {

  private def isSpace(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  /** Signed bucket histogram over byte n-grams of the
    * whitespace-normalized text, L2-normalized. Called from both the
    * interpreted eval and the generated code. */
  def compute(text: UTF8String, dim: Int, nLo: Int, nHi: Int): ArrayData = {
    val src = text.getBytes // one copy; normalization needs a scratch anyway
    // collapse whitespace runs to a single 0x20, trim ends
    val norm = new Array[Byte](src.length)
    var m = 0
    var i = 0
    while (i < src.length) {
      if (isSpace(src(i))) {
        if (m > 0 && norm(m - 1) != 0x20) { norm(m) = 0x20; m += 1 }
      } else { norm(m) = src(i); m += 1 }
      i += 1
    }
    if (m > 0 && norm(m - 1) == 0x20) m -= 1
    val acc = new Array[Double](dim)
    var n = nLo
    while (n <= nHi) {
      var s = 0
      while (s + n <= m) {
        val h = XXH64.hashUnsafeBytes(norm,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + s, n, 42L)
        val bucket = (((h % dim) + dim) % dim).toInt
        acc(bucket) += (if (h < 0) -1.0 else 1.0)
        s += 1
      }
      n += 1
    }
    var sq = 0.0
    var b = 0
    while (b < dim) { sq += acc(b) * acc(b); b += 1 }
    if (sq > 0) {
      val nrm = math.sqrt(sq)
      b = 0
      while (b < dim) { acc(b) /= nrm; b += 1 }
    }
    new GenericArrayData(acc)
  }

  /** Column helper. */
  def charNgramVector(text: Column, dim: Int, nLo: Int = 1, nHi: Int = 3): Column =
    GraftColumnBridge.column(CharNgramVector(GraftColumnBridge.expression(text), dim, nLo, nHi))
}
