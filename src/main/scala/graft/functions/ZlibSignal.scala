package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Zlib compressibility quality signal — the DEFLATE length of a
 * document's UTF-8 bytes, and its ratio to the raw length. A standard
 * web-corpus quality signal (RedPajama-v2 ships it as
 * `ccnet_compression_ratio`-style metadata): machine-generated spam,
 * keyword stuffing and template boilerplate compress far better than
 * natural prose, and the signal is vocabulary-free — it needs no
 * stopword list, no LM, no language ID, so it works identically on
 * every language and even on code.
 *
 * A native expression because no built-in can express DEFLATE: one
 * `java.util.zip.Deflater` pass per document (level 6, zlib-wrapped),
 * inside whole-stage codegen via the static `compute` call — row-local,
 * zero shuffle, rides the scan. No DuckDB oracle can replay DEFLATE
 * output length portably, so the graded surface is a pinned gate
 * (`q_gate_zlib`: planted boilerplate vs prose ordering) plus specs —
 * the SimHash/ANN rows-only contract.
 *
 * The Deflater is allocated and `end()`ed per call: the signal is
 * evaluated once per document (not per token), so allocation cost is
 * noise next to the DEFLATE itself, and per-call lifecycle keeps the
 * expression thread-safe under whole-stage codegen with zero shared
 * state.
 */
case class DeflateLength(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_deflate_length"

  override protected def nullSafeEval(input: Any): Any =
    ZlibSignal.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ZlibSignal$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): DeflateLength =
    copy(child = newChild)
}

object ZlibSignal {

  /** DEFLATE (zlib, level 6) length of the UTF-8 bytes. Empty input
    * compresses to the 8-byte zlib empty stream — never zero. */
  def compute(text: UTF8String): Long = {
    val bytes = text.getBytes
    val d = new java.util.zip.Deflater(6)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  /** Compressed byte length of `text` (zlib level 6). */
  def deflateLength(text: Column): Column =
    GraftColumnBridge.column(DeflateLength(GraftColumnBridge.expression(text)))

  /** compressed / raw UTF-8 length, round-6; NULL for empty docs (no
    * ratio exists — the zlib header would dominate). Low ratio =
    * highly compressible = repetitive/templated text. */
  def compressionRatio(text: Column): Column =
    when(octet_length(text) > 0,
      round(deflateLength(text).cast(DoubleType) /
        octet_length(text).cast(DoubleType), 6))
}
