package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Codec-free VIDEO container metadata — the [[ImageHeaderMeta]] /
 * [[AudioHeaderMeta]] discipline for the third modality: MP4/ISO-BMFF
 * (`ftyp` brand detection, `moov/mvhd` timescale+duration,
 * `trak/tkhd` display dimensions, track count) parsed straight from
 * box headers, no codec. This is the video-curation filter surface
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
    if (b == null || b.length < 12 || !tag(b, 4, "ftyp")) return null
    val st = new State
    walk(b, 0L, b.length.toLong, depth = 0, st)
    val ok = st.timescale > 0 && st.duration >= 0
    new GenericInternalRow(Array[Any](
      UTF8String.fromString("mp4"),
      if (st.width > 0) Int.box(st.width) else null,
      if (st.height > 0) Int.box(st.height) else null,
      if (ok) Long.box(st.duration * 1000L / st.timescale) else null,
      if (st.tracks > 0) Int.box(st.tracks) else null))
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

  /** Column helper: struct(format, width, height, duration_ms,
    * n_tracks). */
  def videoHeaderMeta(bin: Column): Column =
    GraftColumnBridge.column(VideoHeaderMeta(GraftColumnBridge.expression(bin)))
}
