package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Codec-free image header metadata: container format and pixel
 * dimensions parsed straight from the payload's header BYTES — no
 * imaging library, no decode. This is the real multimodal-curation
 * filter surface ("keep images >= 256x256", "drop extreme aspect
 * ratios", per-format corpus cards) that works on opaque `binary`
 * columns at scan speed: PNG dimensions live in the IHDR chunk, GIF's
 * in the logical screen descriptor, BMP's in the DIB header, and
 * JPEG's in the first SOF segment found by walking the marker list.
 * (The actual pixel decode stays behind the honest stub in
 * [[graft.operators.Multimodal]] — this expression never touches
 * compressed pixel data.)
 *
 * A native expression because no built-in can express the JPEG marker
 * walk (variable-length segment list); row-local, zero shuffle,
 * whole-stage-codegen'd via the static `compute` call — the
 * [[DeflateLength]] kernel discipline.
 *
 * Result: struct(format, width, height). NULL struct for payloads
 * matching no known magic; a recognized magic with a truncated or
 * corrupt header yields the format with NULL dimensions (so "what IS
 * this" and "how big is it" degrade independently).
 */
case class ImageHeaderMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ImageHeaders.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_image_header_meta"

  override protected def nullSafeEval(input: Any): Any =
    ImageHeaders.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.ImageHeaders$$.MODULE$$.compute($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ImageHeaderMeta =
    copy(child = newChild)
}

object ImageHeaders {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  private def u(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def be16(b: Array[Byte], i: Int): Int = (u(b, i) << 8) | u(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u(b, i) | (u(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Long =
    (u(b, i).toLong << 24) | (u(b, i + 1) << 16) | (u(b, i + 2) << 8) | u(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Int =
    u(b, i) | (u(b, i + 1) << 8) | (u(b, i + 2) << 16) | (u(b, i + 3) << 24)

  private def row(fmt: String, w: Int, h: Int): InternalRow = {
    val dims = w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(fmt),
      if (dims) Int.box(w) else null,
      if (dims) Int.box(h) else null))
  }
  private def fmtOnly(fmt: String): InternalRow = row(fmt, -1, -1)

  private def startsWith(b: Array[Byte], magic: Array[Int]): Boolean =
    b.length >= magic.length && magic.indices.forall(i => u(b, i) == magic(i))

  private val PngMagic = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)

  /** Parse header bytes; null for unrecognized magic. Thread-safe and
    * allocation-light — safe inside whole-stage codegen. */
  def compute(b: Array[Byte]): InternalRow = {
    if (b == null) return null
    if (startsWith(b, PngMagic)) parsePng(b)
    else if (b.length >= 6 && u(b, 0) == 'G' && u(b, 1) == 'I' && u(b, 2) == 'F' &&
      u(b, 3) == '8' && (u(b, 4) == '7' || u(b, 4) == '9') && u(b, 5) == 'a') parseGif(b)
    else if (b.length >= 2 && u(b, 0) == 0xFF && u(b, 1) == 0xD8) parseJpeg(b)
    else if (b.length >= 2 && u(b, 0) == 'B' && u(b, 1) == 'M') parseBmp(b)
    else null
  }

  /** PNG: IHDR must be the first chunk (spec-required); width/height
    * are big-endian u32 at offsets 16/20. */
  private def parsePng(b: Array[Byte]): InternalRow = {
    if (b.length < 24) return fmtOnly("png")
    val isIhdr = u(b, 12) == 'I' && u(b, 13) == 'H' && u(b, 14) == 'D' && u(b, 15) == 'R'
    if (!isIhdr) return fmtOnly("png")
    val w = be32(b, 16)
    val h = be32(b, 20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) fmtOnly("png")
    else row("png", w.toInt, h.toInt)
  }

  /** GIF: logical screen descriptor, little-endian u16 at offsets 6/8. */
  private def parseGif(b: Array[Byte]): InternalRow = {
    if (b.length < 10) return fmtOnly("gif")
    row("gif", le16(b, 6), le16(b, 8))
  }

  /** BMP: the DIB header SIZE at offset 14 selects the layout — the
    * legacy 12-byte BITMAPCOREHEADER stores u16 dims at offsets 18/20,
    * every later header (BITMAPINFOHEADER 40+) i32 dims at 18/22
    * (height may be negative = top-down rows; dimension is its
    * magnitude). Reading the i32 layout on a core-header file would
    * return confident garbage (width||height bytes fused), so the
    * size is validated first; unknown sizes degrade to format-only. */
  private def parseBmp(b: Array[Byte]): InternalRow = {
    if (b.length < 26) return fmtOnly("bmp")
    le32(b, 14) match {
      case 12 =>
        row("bmp", le16(b, 18), le16(b, 20))
      case dib if dib >= 40 =>
        val h = le32(b, 22)
        row("bmp", le32(b, 18), if (h == Int.MinValue) -1 else math.abs(h))
      case _ => fmtOnly("bmp")
    }
  }

  /** JPEG: walk the marker segment list from offset 2 until the first
    * frame header (SOFn, excluding DHT/JPG/DAC which share the 0xCn
    * space); height/width are big-endian u16 at payload offsets 1/3.
    * Stops at SOS/EOI or any structural corruption with format-only. */
  private def parseJpeg(b: Array[Byte]): InternalRow = {
    val n = b.length
    var i = 2
    while (i + 1 < n) {
      if (u(b, i) != 0xFF) return fmtOnly("jpeg")
      var j = i + 1
      while (j < n && u(b, j) == 0xFF) j += 1 // fill bytes
      if (j >= n) return fmtOnly("jpeg")
      val m = u(b, j)
      if (m == 0x01 || (m >= 0xD0 && m <= 0xD8)) i = j + 1 // standalone
      else if (m == 0xD9 || m == 0xDA) return fmtOnly("jpeg") // EOI / SOS
      else {
        if (j + 2 >= n) return fmtOnly("jpeg")
        val segLen = be16(b, j + 1)
        if (segLen < 2) return fmtOnly("jpeg")
        val isSof = m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC
        if (isSof) {
          if (j + 7 >= n) return fmtOnly("jpeg")
          return row("jpeg", be16(b, j + 6), be16(b, j + 4))
        }
        i = j + 1 + segLen
      }
    }
    fmtOnly("jpeg")
  }

  /** struct(format, width, height) parsed from header bytes; NULL for
    * unrecognized payloads. */
  def imageHeaderMeta(bin: Column): Column =
    GraftColumnBridge.column(ImageHeaderMeta(GraftColumnBridge.expression(bin)))
}
