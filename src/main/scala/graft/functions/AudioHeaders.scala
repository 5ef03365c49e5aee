package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Codec-free AUDIO header metadata — the [[ImageHeaderMeta]] discipline
 * for sound payloads: container format, sample rate, channel count,
 * bit depth and duration parsed straight from header bytes, no codec.
 * This is the audio-curation filter surface ("keep >= 16 kHz mono",
 * "drop clips under 1 s", per-format corpus cards) for opaque `binary`
 * columns at scan speed: WAV's `fmt ` chunk is a fixed little-endian
 * record found by a RIFF chunk walk (duration from the `data` chunk
 * size), and FLAC's STREAMINFO block packs rate/channels/bits/total
 * samples into a fixed bit layout at the front of the stream. (Actual
 * sample decode stays behind the honest stub in
 * [[graft.operators.Multimodal]].)
 *
 * A native expression because no built-in can express the RIFF chunk
 * walk or STREAMINFO bit unpacking; row-local, zero shuffle,
 * whole-stage-codegen'd via the static `compute` call.
 *
 * Result: struct(format, sample_rate, channels, bits_per_sample,
 * duration_ms). NULL struct for unrecognized payloads; a recognized
 * magic with a truncated/corrupt header yields the format with NULL
 * numeric fields. `duration_ms` is integer floor arithmetic
 * (samples·1000/rate) so it replays exactly in any engine.
 */
case class AudioHeaderMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = AudioHeaders.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_audio_header_meta"

  override protected def nullSafeEval(input: Any): Any =
    AudioHeaders.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.AudioHeaders$$.MODULE$$.compute($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AudioHeaderMeta =
    copy(child = newChild)
}

object AudioHeaders {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("bits_per_sample", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  // byte readers mirror ImageHeaders' — le32 deliberately widened to
  // Long here because RIFF chunk sizes are UNSIGNED u32 and must never
  // truncate negative (the chunk-walk termination proof relies on it)
  private def u(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def le16(b: Array[Byte], i: Int): Int = u(b, i) | (u(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u(b, i).toLong | (u(b, i + 1).toLong << 8) |
      (u(b, i + 2).toLong << 16) | (u(b, i + 3).toLong << 24)
  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b.length >= i + 4 && t.indices.forall(k => u(b, i + k) == t.charAt(k))

  private def row(fmt: String, rate: Long, ch: Int, bits: Int,
                  durMs: Long): InternalRow = {
    val ok = rate > 0 && rate <= Int.MaxValue && ch > 0 && bits > 0
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(fmt),
      if (ok) Int.box(rate.toInt) else null,
      if (ok) Int.box(ch) else null,
      if (ok) Int.box(bits) else null,
      if (ok && durMs >= 0) Long.box(durMs) else null))
  }
  private def fmtOnly(fmt: String): InternalRow = row(fmt, -1, -1, -1, -1)

  /** Parse header bytes; null for unrecognized magic. */
  def compute(b: Array[Byte]): InternalRow = {
    if (b == null) return null
    if (tag(b, 0, "RIFF") && tag(b, 8, "WAVE")) parseWav(b)
    else if (tag(b, 0, "fLaC")) parseFlac(b)
    else null
  }

  /** WAV: walk RIFF chunks from offset 12; `fmt ` carries
    * (audioFormat, channels, sampleRate, …, bitsPerSample) little-
    * endian; `data`'s size + the fmt fields give the duration. */
  private def parseWav(b: Array[Byte]): InternalRow = {
    val n = b.length.toLong
    // Long cursor + Long chunk sizes: le32 is unsigned [0, 2^32), so the
    // step 8 + size + pad is always >= 8 and the walk provably
    // terminates — a crafted size like 0xFFFFFFF8 must not truncate to
    // a negative Int and stall the cursor (a one-row infinite loop
    // would hang the whole executor task)
    var i = 12L
    var rate = -1L
    var ch = -1
    var bits = -1
    var dataBytes = -1L
    while (i + 8 <= n && (rate < 0 || dataBytes < 0)) {
      val at = i.toInt // safe: i + 8 <= n <= Int.MaxValue
      val size = le32(b, at + 4)
      if (tag(b, at, "fmt ")) {
        if (i + 8 + 16 > n) return fmtOnly("wav")
        ch = le16(b, at + 10)
        rate = le32(b, at + 12)
        bits = le16(b, at + 22)
      } else if (tag(b, at, "data")) {
        dataBytes = size
      }
      // chunks are word-aligned: odd sizes carry a pad byte
      i += 8L + size + (size & 1L)
    }
    if (rate <= 0 || ch <= 0 || bits <= 0) return fmtOnly("wav")
    val durMs =
      if (dataBytes < 0) -1L
      else {
        val bytesPerSample = ch.toLong * (bits / 8).max(1)
        val samples = dataBytes / bytesPerSample
        samples * 1000L / rate
      }
    row("wav", rate, ch, bits, durMs)
  }

  /** FLAC: STREAMINFO must be the first metadata block (spec-required);
    * bytes 10..17 of the block pack sampleRate(20b), channels-1(3b),
    * bitsPerSample-1(5b), totalSamples(36b) big-endian. */
  private def parseFlac(b: Array[Byte]): InternalRow = {
    // 4 magic + 4 block header + 34 STREAMINFO
    if (b.length < 42) return fmtOnly("flac")
    val blockType = u(b, 4) & 0x7F
    val blockLen = (u(b, 5) << 16) | (u(b, 6) << 8) | u(b, 7)
    if (blockType != 0 || blockLen < 34) return fmtOnly("flac")
    val o = 8 + 10 // streaminfo start + offset of the packed fields
    val rate = (u(b, o).toLong << 12) | (u(b, o + 1).toLong << 4) |
      (u(b, o + 2) >> 4)
    val ch = ((u(b, o + 2) >> 1) & 0x07) + 1
    val bits = (((u(b, o + 2) & 0x01) << 4) | (u(b, o + 3) >> 4)) + 1
    val samples = ((u(b, o + 3) & 0x0F).toLong << 32) |
      (u(b, o + 4).toLong << 24) | (u(b, o + 5).toLong << 16) |
      (u(b, o + 6).toLong << 8) | u(b, o + 7).toLong
    if (rate <= 0) return fmtOnly("flac")
    row("flac", rate, ch, bits, samples * 1000L / rate)
  }

  /** Column helper: struct(format, sample_rate, channels,
    * bits_per_sample, duration_ms). */
  def audioHeaderMeta(bin: Column): Column =
    GraftColumnBridge.column(AudioHeaderMeta(GraftColumnBridge.expression(bin)))
}
