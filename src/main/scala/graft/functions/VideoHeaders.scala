package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Codec-free VIDEO container metadata — the [[ImageHeaderMeta]] /
 * [[AudioHeaderMeta]] discipline for the third modality, across the
 * three containers a crawl actually serves: MP4/ISO-BMFF (`ftyp`,
 * `moov/mvhd` timescale+duration, `trak/tkhd` display dims, track
 * count), AVI (RIFF `hdrl/avih` main header), and Matroska/WebM
 * (EBML varint walk: DocType, Info timestamp-scale + float duration,
 * Tracks pixel dims) — all parsed straight from container bytes, no
 * codec. This is the video-curation filter surface
 * ("drop clips under 2 s", "keep ≥ 720p", per-container cards) for
 * opaque `binary` columns at scan speed — frame DECODE stays behind
 * the honest stub in [[graft.operators.Multimodal]] (H.264/VP9 need
 * real codec libraries).
 *
 * A native expression because no built-in can express the nested box
 * walk; row-local, zero shuffle, codegen'd via the static `compute`.
 *
 * Result: struct(format, width, height, duration_ms, n_tracks).
 * NULL struct for unrecognized payloads; a recognized `ftyp` with a
 * truncated/absent `moov` yields the format with NULL numeric
 * fields. Dimensions come from the FIRST `tkhd` with nonzero display
 * size (audio tracks carry 0×0), as 16.16 fixed-point integer parts;
 * `duration_ms` is integer floor arithmetic (duration·1000/timescale)
 * so it replays exactly in any engine.
 */
case class VideoHeaderMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = VideoHeaders.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_video_header_meta"

  override protected def nullSafeEval(input: Any): Any =
    VideoHeaders.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.VideoHeaders$$.MODULE$$.compute($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VideoHeaderMeta =
    copy(child = newChild)
}

object VideoHeaders {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("n_tracks", IntegerType, nullable = true)))

  private def u(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  // box sizes are UNSIGNED u32 big-endian — widened to Long so the
  // walk's cursor step is provably positive (the RIFF-walk termination
  // discipline from AudioHeaders)
  private def be32(b: Array[Byte], i: Int): Long =
    (u(b, i).toLong << 24) | (u(b, i + 1).toLong << 16) |
      (u(b, i + 2).toLong << 8) | u(b, i + 3).toLong
  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b.length >= i + 4 && t.indices.forall(k => u(b, i + k) == t.charAt(k))

  private final class State {
    var timescale = -1L
    var duration = -1L
    var width = -1
    var height = -1
    var tracks = 0
  }

  /** Parse container bytes; null for unrecognized payloads. */
  def compute(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 4) return null
    if (b.length >= 12 && tag(b, 4, "ftyp")) {
      val st = new State
      walk(b, 0L, b.length.toLong, depth = 0, st)
      val ok = st.timescale > 0 && st.duration >= 0
      row("mp4", st.width, st.height,
        if (ok) st.duration * 1000L / st.timescale else -1L, st.tracks)
    } else if (b.length >= 12 && tag(b, 0, "RIFF") && tag(b, 8, "AVI "))
      parseAvi(b)
    else if (u(b, 0) == 0x1A && u(b, 1) == 0x45 &&
      u(b, 2) == 0xDF && u(b, 3) == 0xA3) parseEbml(b)
    else null
  }

  private def row(fmt: String, w: Int, h: Int, durMs: Long,
                  tracks: Int): InternalRow =
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(fmt),
      if (w > 0) Int.box(w) else null,
      if (h > 0) Int.box(h) else null,
      if (durMs >= 0) Long.box(durMs) else null,
      if (tracks > 0) Int.box(tracks) else null))

  private def le32(b: Array[Byte], i: Int): Long =
    (u(b, i).toLong) | (u(b, i + 1).toLong << 8) |
      (u(b, i + 2).toLong << 16) | (u(b, i + 3).toLong << 24)

  /** AVI: RIFF form `AVI `; the `avih` (main header) chunk sits inside
    * the first `LIST hdrl` and carries microSecPerFrame(0),
    * totalFrames(16), streams(24), width(32), height(36) — all
    * little-endian u32. Duration = µsPerFrame·frames/1000 in integer
    * arithmetic. The walk is [[AudioHeaders]]' unsigned-size RIFF
    * discipline; `LIST` sub-chunks are entered (4-byte form tag then
    * children). */
  private def parseAvi(b: Array[Byte]): InternalRow = {
    val n = b.length.toLong
    var i = 12L
    while (i + 8 <= n) {
      val at = i.toInt
      val size = le32(b, at + 4)
      if (tag(b, at, "LIST") && i + 12 <= n && tag(b, at + 8, "hdrl")) {
        // children start after the 4-byte form tag
        var j = i + 12
        val end = math.min(n, i + 8 + size)
        while (j + 8 <= end) {
          val ct = j.toInt
          val csz = le32(b, ct + 4)
          if (tag(b, ct, "avih")) {
            if (j + 8 + 40 > end) return row("avi", -1, -1, -1L, 0)
            val usPerFrame = le32(b, ct + 8)
            val frames = le32(b, ct + 8 + 16)
            val streams = le32(b, ct + 8 + 24)
            val w = le32(b, ct + 8 + 32)
            val h = le32(b, ct + 8 + 36)
            return row("avi", w.toInt, h.toInt,
              usPerFrame * frames / 1000L, streams.toInt)
          }
          j += 8L + csz + (csz & 1L)
        }
        return row("avi", -1, -1, -1L, 0)
      }
      i += 8L + size + (size & 1L)
    }
    row("avi", -1, -1, -1L, 0)
  }

  /** Walk sibling boxes in [from, to); recurse into the known
    * container boxes only. Depth-capped and monotone-cursor so a
    * crafted payload can neither loop nor blow the stack. */
  private def walk(b: Array[Byte], from: Long, to: Long, depth: Int,
                   st: State): Unit = {
    if (depth > 8) return
    var i = from
    while (i + 8 <= to) {
      val at = i.toInt
      var size = be32(b, at)
      var hdr = 8L
      if (size == 1L) { // 64-bit largesize follows the type
        if (i + 16 > to) return
        size = (be32(b, at + 8) << 32) | be32(b, at + 12)
        hdr = 16L
      } else if (size == 0L) { // box extends to the end of the file
        size = to - i
      }
      if (size < hdr) return // malformed: cursor must advance
      val end = math.min(to, i + size)
      if (tag(b, at + 4, "moov") || tag(b, at + 4, "trak") ||
        tag(b, at + 4, "mdia")) {
        if (tag(b, at + 4, "trak")) st.tracks += 1
        walk(b, i + hdr, end, depth + 1, st)
      } else if (tag(b, at + 4, "mvhd") && hdr == 8L) {
        parseMvhd(b, at + 8, end, st)
      } else if (tag(b, at + 4, "tkhd") && hdr == 8L) {
        parseTkhd(b, at + 8, end, st)
      }
      i += size
    }
  }

  /** mvhd v0: ver/flags(4) creation(4) modification(4) timescale(4)
    * duration(4); v1 widens creation/modification/duration to 64. */
  private def parseMvhd(b: Array[Byte], p: Int, end: Long, st: State): Unit = {
    if (p + 4 > end) return
    if (u(b, p) == 0) {
      if (p + 20 > end) return
      st.timescale = be32(b, p + 12)
      st.duration = be32(b, p + 16)
    } else { // v1: creation(8) modification(8) timescale(4) duration(8)
      if (p + 32 > end) return
      st.timescale = be32(b, p + 20)
      st.duration = (be32(b, p + 24) << 32) | be32(b, p + 28)
    }
  }

  /** tkhd: the 16.16 display width/height sit at payload offset 76
    * (v0) / 88 (v1); audio tracks carry 0×0 — the FIRST nonzero pair
    * wins (track order is authoring order, video first by
    * convention). */
  private def parseTkhd(b: Array[Byte], p: Int, end: Long, st: State): Unit = {
    if (st.width > 0 || p + 4 > end) return
    val off = if (u(b, p) == 0) 76 else 88
    if (p + off + 8 > end) return
    val w = (be32(b, p + off) >> 16).toInt
    val h = (be32(b, p + off + 4) >> 16).toInt
    if (w > 0 && h > 0) { st.width = w; st.height = h }
  }

  // ---- Matroska / WebM (EBML) ---------------------------------------------

  private final class EbmlState {
    var docType: String = null
    var timestampScaleNs = 1000000L // Matroska default: 1 ms ticks
    var durationTicks = -1.0
    var width = -1
    var height = -1
    var tracks = 0
  }

  /** EBML varint: the first byte's leading-zero count gives the
    * length; returns (value-without-marker, nBytes), or (-1, 0) on a
    * malformed/oversized field. An all-ones size payload means
    * "unknown size" — mapped to -2 so callers extend to the region
    * end (streamed Matroska writes Segment/Cluster that way). */
  private def ebmlSize(b: Array[Byte], i: Int, limit: Long): (Long, Int) = {
    if (i >= limit) return (-1L, 0)
    val first = u(b, i)
    if (first == 0) return (-1L, 0)
    val len = java.lang.Integer.numberOfLeadingZeros(first) - 24 + 1
    if (len > 8 || i + len > limit) return (-1L, 0)
    var v = (first & ((1 << (8 - len)) - 1)).toLong
    var allOnes = (first & ((1 << (8 - len)) - 1)) == ((1 << (8 - len)) - 1)
    var k = 1
    while (k < len) {
      v = (v << 8) | u(b, i + k)
      allOnes &&= u(b, i + k) == 0xFF
      k += 1
    }
    (if (allOnes) -2L else v, len)
  }

  /** EBML element ID: raw bytes INCLUDING the marker (IDs are defined
    * and compared that way); returns (id, nBytes) or (-1, 0). */
  private def ebmlId(b: Array[Byte], i: Int, limit: Long): (Long, Int) = {
    if (i >= limit) return (-1L, 0)
    val first = u(b, i)
    if (first == 0) return (-1L, 0)
    val len = java.lang.Integer.numberOfLeadingZeros(first) - 24 + 1
    if (len > 4 || i + len > limit) return (-1L, 0)
    var v = first.toLong
    var k = 1
    while (k < len) { v = (v << 8) | u(b, i + k); k += 1 }
    (v, len)
  }

  private def ebmlUint(b: Array[Byte], i: Int, len: Int): Long = {
    var v = 0L
    var k = 0
    while (k < len && k < 8) { v = (v << 8) | u(b, i + k); k += 1 }
    v
  }

  private def ebmlFloat(b: Array[Byte], i: Int, len: Int): Double =
    if (len == 4) java.lang.Float.intBitsToFloat(ebmlUint(b, i, 4).toInt).toDouble
    else if (len == 8) java.lang.Double.longBitsToDouble(ebmlUint(b, i, 8))
    else -1.0

  /**
   * Matroska/WebM: EBML header (DocType distinguishes webm from mkv)
   * then Segment → Info (TimestampScale ns + float Duration in
   * ticks) and Tracks → TrackEntry* (count; Video → PixelWidth /
   * PixelHeight). Same walk guarantees as the MP4 side: known
   * containers only, depth cap, monotone cursor; unknown-size
   * elements extend to their region end.
   */
  private def parseEbml(b: Array[Byte]): InternalRow = {
    val st = new EbmlState
    ebmlWalk(b, 0L, b.length.toLong, 0, st)
    val fmt = if (st.docType == "webm") "webm" else "mkv"
    val durMs =
      if (st.durationTicks >= 0)
        (st.durationTicks * st.timestampScaleNs / 1e6).toLong
      else -1L
    row(fmt, st.width, st.height, durMs, st.tracks)
  }

  private val EbmlHeader = 0x1A45DFA3L
  private val DocType = 0x4282L
  private val Segment = 0x18538067L
  private val Info = 0x1549A966L
  private val TimestampScale = 0x2AD7B1L
  private val DurationId = 0x4489L
  private val Tracks = 0x1654AE6BL
  private val TrackEntry = 0xAEL
  private val VideoEl = 0xE0L
  private val PixelWidth = 0xB0L
  private val PixelHeight = 0xBAL

  private def ebmlWalk(b: Array[Byte], from: Long, to: Long, depth: Int,
                       st: EbmlState): Unit = {
    if (depth > 8) return
    var i = from
    while (i + 2 <= to) {
      val (id, idLen) = ebmlId(b, i.toInt, to)
      if (idLen == 0) return
      val (size0, szLen) = ebmlSize(b, (i + idLen).toInt, to)
      if (szLen == 0) return
      val body = i + idLen + szLen
      val size = if (size0 == -2L) to - body else size0
      if (size < 0) return
      val end = math.min(to, body + size)
      id match {
        case EbmlHeader | Segment | Info | Tracks | TrackEntry | VideoEl =>
          if (id == TrackEntry) st.tracks += 1
          ebmlWalk(b, body, end, depth + 1, st)
        case DocType =>
          st.docType = new String(b, body.toInt, (end - body).toInt,
            java.nio.charset.StandardCharsets.US_ASCII)
        case TimestampScale =>
          st.timestampScaleNs = ebmlUint(b, body.toInt, (end - body).toInt)
        case DurationId =>
          st.durationTicks = ebmlFloat(b, body.toInt, (end - body).toInt)
        case PixelWidth if st.width < 0 =>
          st.width = ebmlUint(b, body.toInt, (end - body).toInt).toInt
        case PixelHeight if st.height < 0 =>
          st.height = ebmlUint(b, body.toInt, (end - body).toInt).toInt
        case _ => ()
      }
      if (end <= i) return // malformed: cursor must advance
      i = end
    }
  }

  /** Column helper: struct(format, width, height, duration_ms,
    * n_tracks). */
  def videoHeaderMeta(bin: Column): Column =
    GraftColumnBridge.column(VideoHeaderMeta(GraftColumnBridge.expression(bin)))
}
