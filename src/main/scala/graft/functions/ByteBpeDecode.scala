package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native byte-level BPE DECODE kernel — the inverse of
 * [[ByteBpeEncode]] in `ids` mode, i.e. the detokenizer every
 * consumer of a token-id artifact needs: each id maps to its piece's
 * UTF-8 bytes (byte b → b, merge rank k → 256+k, the
 * [[graft.operators.TextStats.bpeBytesVocab]] id space) and the bytes
 * concatenate back into the source string. Because byte-level BPE is
 * a pure segmentation of the input's UTF-8 bytes (merges never cross
 * pre-token boundaries; pre-tokens tile the text), decode∘encode is
 * the IDENTITY on any string — the property the graded round-trip
 * rows (`q_text_bpe_decode`, `q_text_bpe_decode_50k`,
 * `q_pack_roundtrip_text`) pin against DuckDB.
 *
 * Unknown-id policy (ADVICE r18 #4 — the three regimes a corrupted
 * artifact can meet):
 *   - default: ANY id outside `[0, 256+|merges|)` (or a NULL array
 *     element) throws — corruption fails loudly;
 *   - `skipUnknown = true`: out-of-vocabulary ids and NULL elements
 *     are dropped — the blanket artifact-reading mode (under the
 *     `256+|merges|` convention EOS/pad sit one past the vocabulary);
 *   - `sentinelIds` non-empty: ONLY those ids are dropped; anything
 *     else out of range still throws — the strict artifact-reading
 *     mode, where a wild id from corruption stays distinguishable
 *     from the intended EOS/pad sentinels.
 *
 * Input contract (ADVICE r18 #1): `checkInputDataTypes` demands
 * `array<bigint>`, so an `array<int>` column fails at ANALYSIS time
 * with a type error instead of reaching eval.
 *
 * 100 TB design: one codegen'd call per row into the SAME shared
 * per-JVM compiled model as the encoder ([[ByteBpeEncode.modelFor]] —
 * a plan that encodes and decodes under one merge list holds one
 * table); the decode byte-table is lazy so encode-only plans never
 * build it. Entirely row-local, zero shuffle, O(output bytes) per row.
 */
case class ByteBpeDecode(child: Expression, merges: Seq[(String, String)],
                         skipUnknown: Boolean,
                         sentinelIds: Seq[Long] = Nil)
    extends UnaryExpression {
  require(merges.nonEmpty, "merges must be non-empty")

  @transient private lazy val model = ByteBpeEncode.modelFor(merges)
  @transient private lazy val sentinels: Array[Long] =
    sentinelIds.distinct.sorted.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<bigint> token-id column, got " +
        other.catalogString)
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_byte_bpe_decode"

  override protected def nullSafeEval(input: Any): Any =
    model.decode(input.asInstanceOf[ArrayData], skipUnknown, sentinels)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("byteBpeModel", model,
      classOf[ByteBpeEncode.Model].getName)
    val sref = ctx.addReferenceObj("byteBpeSentinels", sentinels, "long[]")
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = $ref.decode($c, $skipUnknown, $sref);")
  }

  override protected def withNewChildInternal(newChild: Expression): ByteBpeDecode =
    copy(child = newChild)
}

object ByteBpeDecode {

  /** Text of an `array<bigint>` token-id column under `merges`
    * (NULL → NULL). `skipUnknown` drops out-of-vocabulary ids
    * (EOS/pad sentinels) instead of throwing; `sentinelIds` narrows
    * the dropped set to exactly those ids (anything else out of
    * range still throws — the strict artifact-reading mode). */
  def byteBpeDecode(ids: Column, merges: Seq[(String, String)],
                    skipUnknown: Boolean = false,
                    sentinelIds: Seq[Long] = Nil): Column =
    GraftColumnBridge.column(
      ByteBpeDecode(GraftColumnBridge.expression(ids), merges, skipUnknown,
        sentinelIds))
}
