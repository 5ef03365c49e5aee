package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native one-pass per-document repetition profile: word-bigram counts
 * and distinct-word stats in a single scan of the text's bytes, emitted
 * as a struct `(n_bigrams, distinct_bigram_ratio, top_bigram_ratio,
 * distinct_word_ratio)`.
 *
 * Produces EXACTLY the values of the declarative formulation kept as
 * [[graft.operators.TextStats.repetitionProfileReference]] (split on a
 * single literal space, adjacent tokens joined by one space, count per
 * bigram, ratios as double divisions of exact integer counts) — but
 * that formulation must EXPLODE one row per bigram and aggregate twice
 * (a full-corpus shuffle whose volume is ~the corpus token count; the
 * round-7 profile measured it as 44% of the flagship corpus-clean
 * pipeline). Per-document stats are row-LOCAL, so this expression
 * replaces explode + two shuffled aggregations + a join back with a
 * zero-shuffle projection that stays inside whole-stage codegen.
 *
 * Exactness notes:
 *  - tokens = `split(text, " ")` semantics: split on each single 0x20
 *    byte (which never occurs inside a multi-byte UTF-8 sequence),
 *    keeping empty tokens — including trailing ones (Spark's split has
 *    limit -1);
 *  - a bigram is the byte slice of the ORIGINAL text spanning both
 *    tokens and their separating space, so keys never allocate string
 *    builders, and equality/hashing is byte-exact ([[UTF8String]]
 *    equality), immune to lossy UTF-8 decoding;
 *  - docs with fewer than two tokens (including the empty string) yield
 *    NULL — the declarative formulation's explode of an empty bigram
 *    array emits no row at all, and callers filter the NULLs to match.
 */
case class BigramProfile(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BigramProfile.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bigram_profile"

  override protected def nullSafeEval(input: Any): Any =
    BigramProfile.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.BigramProfile$$.MODULE$$.compute($c);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): BigramProfile =
    copy(child = newChild)
}

object BigramProfile {

  val schema: StructType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("distinct_bigram_ratio", DoubleType, nullable = false),
    StructField("top_bigram_ratio", DoubleType, nullable = false),
    StructField("distinct_word_ratio", DoubleType, nullable = false)))

  /** One-pass profile; null for docs with < 2 space-split tokens.
    * Called from both the interpreted eval and the generated code. */
  def compute(text: UTF8String): InternalRow = {
    val bytes = text.getBytes
    val len = bytes.length
    var nSep = 0
    var i = 0
    while (i < len) { if (bytes(i) == 0x20) nSep += 1; i += 1 }
    val n = nSep + 1 // token count, empties included (split limit -1)
    if (n < 2) return null
    val starts = new Array[Int](n)
    val ends = new Array[Int](n)
    var t = 0
    var s = 0
    i = 0
    while (i <= len) {
      if (i == len || bytes(i) == 0x20) { starts(t) = s; ends(t) = i; t += 1; s = i + 1 }
      i += 1
    }
    val words = new java.util.HashSet[UTF8String](Math.max(16, n * 2))
    var w = 0
    while (w < n) {
      words.add(UTF8String.fromBytes(bytes, starts(w), ends(w) - starts(w)))
      w += 1
    }
    val counts = new java.util.HashMap[UTF8String, Integer](Math.max(16, n * 2))
    var maxC = 0
    var b = 0
    while (b < n - 1) {
      // the slice spans token b, the single 0x20 separator, and token b+1
      val key = UTF8String.fromBytes(bytes, starts(b), ends(b + 1) - starts(b))
      val c = counts.merge(key, 1, (x, y) => Integer.valueOf(x + y))
      if (c > maxC) maxC = c
      b += 1
    }
    val nBigrams = (n - 1).toLong
    new GenericInternalRow(Array[Any](
      nBigrams,
      counts.size().toDouble / nBigrams,
      maxC.toDouble / nBigrams,
      words.size().toDouble / n))
  }

  /** Column helper. */
  def bigramProfile(text: Column): Column =
    GraftColumnBridge.column(BigramProfile(GraftColumnBridge.expression(text)))
}
