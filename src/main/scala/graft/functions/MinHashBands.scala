package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native MinHash-band expression: given a document's shingle set,
 * produce the LSH band signatures ["h1,h2", ...] in one pass.
 *
 * Produces EXACTLY the values of the declarative formulation
 *   posexplode(transform(sequence(0, numPerm-1), i -> xxhash64(shingle, i)))
 *   -> groupBy min -> slice into bands -> concat_ws(",")
 * (xxhash64(s, i) = hashInt(i, hash(s, StringType, 42)) per Spark's
 * XxHash64 child-chaining), but:
 *  - each shingle's BYTES are hashed once, then extended with numPerm
 *    cheap integer mixes — the Column formulation re-hashes the full
 *    string per permutation (64x the byte-hash work);
 *  - no 96M-row posexplode/groupBy pipeline: the whole signature is one
 *    tight loop per document inside the scan projection, removing two
 *    shuffles from the plan.
 */
case class MinHashBands(child: Expression, numPerm: Int, bands: Int)
  extends UnaryExpression {

  require(numPerm % bands == 0, "bands must divide numPerm")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_minhash_bands"

  override protected def nullSafeEval(input: Any): Any =
    MinHashBands.compute(input.asInstanceOf[ArrayData], numPerm, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashBands$$.MODULE$$.compute($c, $numPerm, $bands);")

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

object MinHashBands {

  /** One pass: minhash signature then band strings. Called from both the
    * interpreted eval and the generated code. */
  def compute(shingles: ArrayData, numPerm: Int, bands: Int): ArrayData = {
    val sig = Array.fill(numPerm)(Long.MaxValue)
    var j = 0
    val n = shingles.numElements()
    while (j < n) {
      // = XxHash64Function.hash(s, StringType, 42): bytes via unsafe access
      val s = shingles.getUTF8String(j)
      val h1 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      mix(h1, sig, numPerm)
      j += 1
    }
    bandStrings(sig, numPerm, bands)
  }

  /** Same signature from PRE-HASHED shingles ([[ShingleHashes]] output):
    * the first-level hash of the string path IS the shingle's byte hash,
    * so the resulting bands are bit-identical to [[compute]] over the
    * corresponding shingle strings (min is duplicate-insensitive). */
  def computeFromHashes(hashes: ArrayData, numPerm: Int, bands: Int): ArrayData = {
    val sig = Array.fill(numPerm)(Long.MaxValue)
    var j = 0
    val n = hashes.numElements()
    while (j < n) {
      mix(hashes.getLong(j), sig, numPerm)
      j += 1
    }
    bandStrings(sig, numPerm, bands)
  }

  private def mix(h1: Long, sig: Array[Long], numPerm: Int): Unit = {
    var i = 0
    while (i < numPerm) {
      val h = XXH64.hashInt(i, h1)
      if (h < sig(i)) sig(i) = h
      i += 1
    }
  }

  private def bandStrings(sig: Array[Long], numPerm: Int, bands: Int): ArrayData = {
    val rows = numPerm / bands
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      val sb = new java.lang.StringBuilder
      var k = 0
      while (k < rows) {
        if (k > 0) sb.append(',')
        sb.append(sig(b * rows + k))
        k += 1
      }
      out(b) = UTF8String.fromString(sb.toString)
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Column helper. */
  def minhashBands(shingles: Column, numPerm: Int, bands: Int): Column =
    GraftColumnBridge.column(
      MinHashBands(GraftColumnBridge.expression(shingles), numPerm, bands))

  /** Column helper over pre-hashed shingles. */
  def minhashBandsFromHashes(hashes: Column, numPerm: Int, bands: Int): Column =
    GraftColumnBridge.column(
      MinHashBandsFromHashes(GraftColumnBridge.expression(hashes), numPerm, bands))
}

/** [[MinHashBands]] over pre-hashed shingles (array<long>). */
case class MinHashBandsFromHashes(child: Expression, numPerm: Int, bands: Int)
  extends UnaryExpression {

  require(numPerm % bands == 0, "bands must divide numPerm")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_minhash_bands_h"

  override protected def nullSafeEval(input: Any): Any =
    MinHashBands.computeFromHashes(input.asInstanceOf[ArrayData], numPerm, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashBands$$.MODULE$$.computeFromHashes($c, $numPerm, $bands);")

  override protected def withNewChildInternal(newChild: Expression): MinHashBandsFromHashes =
    copy(child = newChild)
}
