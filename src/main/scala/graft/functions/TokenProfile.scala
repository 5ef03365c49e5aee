package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native one-pass token/character profile — every counting primitive of
 * [[TextFunctions.qualityColumns]] in a single scan of the text's
 * bytes, emitted as a struct `(n_chars, n_tokens, tok_chars, n_stop,
 * n_punct, n_nonascii)`:
 *
 *  - `n_chars`    = `length(text)` (codepoints);
 *  - `n_tokens`   = `size(regexp_extract_all(text, '\S+'))` — token
 *    boundaries replicate the regex at the byte level exactly as
 *    [[Simhash63]] does (Java non-UNICODE `\s` = the six ASCII bytes
 *    {0x09..0x0D, 0x20}; UTF-8 continuation/lead bytes are >= 0x80);
 *  - `tok_chars`  = `aggregate(toks, 0L, (acc, t) -> acc + length(t))`
 *    (codepoints inside tokens);
 *  - `n_stop`     = tokens byte-equal to one of
 *    [[TextFunctions.EnStopwords]] (exact, case-sensitive match — same
 *    as `array_contains`);
 *  - `n_punct`    = chars matching `[.,;:!?]` (single-byte ASCII, never
 *    part of a multi-byte sequence);
 *  - `n_nonascii` = chars matching `[^ -~]`: a char is in `[ -~]` iff
 *    its encoding is the single byte 0x20..0x7E, so every other
 *    char-start byte (controls < 0x20, DEL 0x7F, multi-byte leads)
 *    counts.
 *
 * The declarative formulation evaluates five interpreted
 * higher-order-function/regex chains per row (lambdas never enter
 * codegen; measured as the residual cost of q_text_quality after the
 * langid staging fix). This expression replaces all of them with one
 * byte scan that stays inside whole-stage codegen; the ratio and score
 * arithmetic stays declarative on the struct's fields, so values are
 * bit-identical (TextFunctionsSpec asserts equality on every sf0.01
 * doc plus adversarial edge docs).
 */
case class TokenProfile(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TokenProfile.schema
  override def prettyName: String = "graft_token_profile"

  override protected def nullSafeEval(input: Any): Any =
    TokenProfile.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenProfile$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): TokenProfile =
    copy(child = newChild)
}

object TokenProfile {

  val schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("tok_chars", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("n_nonascii", LongType, nullable = false)))

  private val stopBytes: Array[Array[Byte]] =
    TextFunctions.EnStopwords.map(_.getBytes("UTF-8")).toArray

  private def isSpace(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  // char-start byte (not a UTF-8 continuation byte)
  private def isCharStart(b: Byte): Boolean = (b & 0xc0) != 0x80

  private def isStopword(bytes: Array[Byte], start: Int, end: Int): Boolean = {
    val len = end - start
    var s = 0
    while (s < stopBytes.length) {
      val sw = stopBytes(s)
      if (sw.length == len) {
        var i = 0
        while (i < len && bytes(start + i) == sw(i)) i += 1
        if (i == len) return true
      }
      s += 1
    }
    false
  }

  /** One-pass profile. Called from both the interpreted eval and the
    * generated code. */
  def compute(text: UTF8String): InternalRow = {
    val bytes = text.getBytes
    val len = bytes.length
    var nChars = 0L
    var nTokens = 0L
    var tokChars = 0L
    var nStop = 0L
    var nPunct = 0L
    var nNonAscii = 0L
    var i = 0
    while (i < len) {
      val b = bytes(i)
      if (isCharStart(b)) {
        nChars += 1
        val printableAscii = b >= 0x20 && b <= 0x7e
        if (!printableAscii) nNonAscii += 1
        if (b == '.' || b == ',' || b == ';' || b == ':' || b == '!' || b == '?')
          nPunct += 1
      }
      if (!isSpace(b)) {
        // token run: [i, j)
        val start = i
        var j = i
        while (j < len && !isSpace(bytes(j))) {
          if (isCharStart(bytes(j))) {
            if (j > i) { // chars at position start handled by outer loop
              nChars += 1
              val pa = bytes(j) >= 0x20 && bytes(j) <= 0x7e
              if (!pa) nNonAscii += 1
              val bj = bytes(j)
              if (bj == '.' || bj == ',' || bj == ';' || bj == ':' || bj == '!' || bj == '?')
                nPunct += 1
            }
            tokChars += 1
          }
          j += 1
        }
        nTokens += 1
        if (isStopword(bytes, start, j)) nStop += 1
        i = j
      } else {
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](nChars, nTokens, tokChars, nStop, nPunct, nNonAscii))
  }

  /** Column helper. */
  def tokenProfile(text: Column): Column =
    GraftColumnBridge.column(TokenProfile(GraftColumnBridge.expression(text)))
}
