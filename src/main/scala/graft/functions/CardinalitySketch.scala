package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Cardinality (distinct-count) SKETCH — the third classic mergeable
 * summary next to the Misra–Gries heavy-hitters ([[TopKSketch]]) and
 * the KLL quantiles ([[QuantileSketch]]): HyperLogLog registers
 * (Flajolet et al. 2007) with an EXACT sparse mode below a configured
 * capacity, exposed datasketches-style as three composable pieces:
 *
 *  - [[CardinalitySketch.sketch]] — aggregate a column into sketch
 *    BYTES (binary): persistable to parquet, shuffle cost O(capacity)
 *    per group instead of the distinct-key space;
 *  - [[CardinalitySketch.merge]] — aggregate already-built sketches
 *    into one (incremental corpora: per-batch/per-source sketches
 *    merge WITHOUT re-reading the data — the
 *    [[graft.operators.DedupIndex]]-shaped O(batch) growth path for
 *    cardinality tracking);
 *  - [[CardinalitySketch.estimate]] / [[CardinalitySketch.isExact]] —
 *    row-local scalars over sketch bytes.
 *
 * Why not Spark's built-in `approx_count_distinct`: it is estimate-
 * only — the sketch itself cannot be persisted, merged across
 * pipelines, or carried per-stratum into a later union, which is the
 * whole point at 100 TB (track per-source vocabularies daily, merge
 * on demand). It also has no exact regime, so it cannot be graded
 * against `count(DISTINCT)`.
 *
 * Exactness contract (the k ≥ vocab trick transplanted again): in
 * sparse mode the sketch stores the SET of distinct 64-bit xxhashes
 * (≤ `sparseCap` of them) — the estimate is the exact distinct count
 * of hashes, i.e. exact up to 64-bit hash collisions (probability
 * ~n²/2⁶⁵: ~1e-10 at n=10⁵ — and DETERMINISTIC either way, the
 * hash is seeded xxhash64). Past `sparseCap` the hashes fold into
 * 2^p max-rank registers; the estimate degrades to classic HLL
 * (±1.04/√2^p relative error, gate-pinned), and `is_exact` reports
 * which regime produced the number. Merging keeps the tightest
 * representation that still fits: sparse∪sparse stays sparse below
 * capacity, anything else folds dense (pointwise register max).
 */
object CardinalitySketch {

  /** Mutable buffer: sparse hash set until > sparseCap, then 2^p
    * byte registers. */
  final class HllBuf(val p: Int, val sparseCap: Int) {
    var sparse: mutable.LongMap[Unit] = mutable.LongMap.empty
    var registers: Array[Byte] = null
    def isSparse: Boolean = registers == null

    def addHash(h: Long): Unit =
      if (isSparse) {
        sparse.update(h, ())
        if (sparse.size > sparseCap) toDense()
      } else fold(h)

    private def fold(h: Long): Unit = {
      val idx = (h >>> (64 - p)).toInt
      val w = h << p
      val rank = (if (w == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(w)) + 1
      val r = math.min(rank, 64 - p + 1).toByte
      if (r > registers(idx)) registers(idx) = r
    }

    def toDense(): Unit = if (isSparse) {
      registers = new Array[Byte](1 << p)
      sparse.foreachKey(fold)
      sparse = null
    }

    def mergeIn(other: HllBuf): Unit = {
      require(other.p == p,
        s"cannot merge cardinality sketches with different precision ($p vs ${other.p})")
      if (other.isSparse) other.sparse.foreachKey(addHash)
      else {
        toDense()
        var i = 0
        while (i < registers.length) {
          if (other.registers(i) > registers(i)) registers(i) = other.registers(i)
          i += 1
        }
      }
    }

    /** Exact distinct hashes in sparse mode; bias-corrected HLL with
      * the small-range linear-counting switch in dense mode. */
    def estimate: Long =
      if (isSparse) sparse.size.toLong
      else {
        val m = 1 << p
        val alpha = m match {
          case 16 => 0.673
          case 32 => 0.697
          case 64 => 0.709
          case _ => 0.7213 / (1.0 + 1.079 / m)
        }
        var sum = 0.0
        var zeros = 0
        var i = 0
        while (i < m) {
          sum += java.lang.Math.pow(2.0, -registers(i).toDouble)
          if (registers(i) == 0) zeros += 1
          i += 1
        }
        val e = alpha * m.toLong * m.toLong / sum
        val corrected =
          if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
          else e
        math.rint(corrected).toLong
      }

    def serialize: Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeByte(1) // format version
      out.writeByte(p)
      out.writeInt(sparseCap)
      if (isSparse) {
        out.writeByte(0)
        out.writeInt(sparse.size)
        sparse.foreachKey(out.writeLong)
      } else {
        out.writeByte(1)
        out.write(registers)
      }
      out.flush()
      bos.toByteArray
    }
  }

  def deserializeBuf(bytes: Array[Byte]): HllBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val ver = in.readByte()
    require(ver == 1, s"unknown cardinality sketch version $ver")
    val buf = new HllBuf(in.readByte().toInt, in.readInt())
    if (in.readByte() == 0) {
      val n = in.readInt()
      var i = 0
      while (i < n) { buf.sparse.update(in.readLong(), ()); i += 1 }
    } else {
      buf.registers = new Array[Byte](1 << buf.p)
      in.readFully(buf.registers)
    }
    buf
  }

  private val HashSeed = 42L

  def hashValue(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, HashSeed)

  /** Aggregate Column: sketch of distinct `items` (cast to string,
    * NULLs skipped) → sketch bytes. Exact while the group's distinct
    * count stays ≤ `sparseCap`. */
  def sketch(items: Column, p: Int = 12, sparseCap: Int = 1 << 18): Column =
    GraftColumnBridge.column(HllSketchAgg(
      GraftColumnBridge.expression(items.cast("string")), p, sparseCap)
      .toAggregateExpression())

  /** Aggregate Column: merge already-built sketch byte strings. */
  def merge(sketches: Column): Column =
    GraftColumnBridge.column(HllMergeAgg(
      GraftColumnBridge.expression(sketches)).toAggregateExpression())

  /** Row-local distinct-count estimate from sketch bytes. */
  def estimate(sketchBytes: Column): Column =
    GraftColumnBridge.column(HllEstimate(
      GraftColumnBridge.expression(sketchBytes)))

  /** Row-local: did this sketch stay in the exact (sparse) regime? */
  def isExact(sketchBytes: Column): Column =
    GraftColumnBridge.column(HllIsExact(
      GraftColumnBridge.expression(sketchBytes)))

  /** Convenience: estimate(sketch(items)) as one aggregate column. */
  def distinctCount(items: Column, p: Int = 12,
                    sparseCap: Int = 1 << 18): Column =
    estimate(sketch(items, p, sparseCap))
}

case class HllSketchAgg(
    child: Expression,
    p: Int,
    sparseCap: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CardinalitySketch.HllBuf]
  with UnaryLike[Expression] {

  require(p >= 4 && p <= 18, s"precision p must be in [4, 18], got $p")
  require(sparseCap >= 0, s"sparseCap must be >= 0, got $sparseCap")

  override def prettyName: String = "graft_hll_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): CardinalitySketch.HllBuf =
    new CardinalitySketch.HllBuf(p, sparseCap)

  override def update(buf: CardinalitySketch.HllBuf,
                      input: InternalRow): CardinalitySketch.HllBuf = {
    val v = child.eval(input)
    if (v != null)
      buf.addHash(CardinalitySketch.hashValue(v.asInstanceOf[UTF8String]))
    buf
  }

  override def merge(buf: CardinalitySketch.HllBuf,
                     other: CardinalitySketch.HllBuf): CardinalitySketch.HllBuf = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: CardinalitySketch.HllBuf): Any = buf.serialize
  override def serialize(buf: CardinalitySketch.HllBuf): Array[Byte] =
    buf.serialize
  override def deserialize(bytes: Array[Byte]): CardinalitySketch.HllBuf =
    CardinalitySketch.deserializeBuf(bytes)

  override def withNewMutableAggBufferOffset(n: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): HllSketchAgg =
    copy(child = newChild)
}

/** Merges sketch BYTE STRINGS produced by [[HllSketchAgg]] (NULLs
  * skipped; a group that never sees a sketch yields NULL — like
  * [[CmsMergeAgg]], there is no universal empty geometry to
  * synthesize, and inventing a p=12 one would crash a later merge
  * with non-default-p sketches). */
case class HllMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CardinalitySketch.HllBuf]
  with UnaryLike[Expression] {

  override def prettyName: String = "graft_hll_merge"
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  // geometry adopted from the first sketch merged in: p is validated
  // equal across inputs, sparseCap follows the first (capacity is a
  // build-time knob, not part of the math)
  override def createAggregationBuffer(): CardinalitySketch.HllBuf = null

  private def mergeBytes(buf: CardinalitySketch.HllBuf,
                         bytes: Array[Byte]): CardinalitySketch.HllBuf = {
    val other = CardinalitySketch.deserializeBuf(bytes)
    if (buf == null) other
    else { buf.mergeIn(other); buf }
  }

  override def update(buf: CardinalitySketch.HllBuf,
                      input: InternalRow): CardinalitySketch.HllBuf = {
    val v = child.eval(input)
    if (v == null) buf else mergeBytes(buf, v.asInstanceOf[Array[Byte]])
  }

  override def merge(buf: CardinalitySketch.HllBuf,
                     other: CardinalitySketch.HllBuf): CardinalitySketch.HllBuf =
    if (other == null) buf
    else if (buf == null) other
    else { buf.mergeIn(other); buf }

  override def eval(buf: CardinalitySketch.HllBuf): Any =
    if (buf == null) null else buf.serialize

  override def serialize(buf: CardinalitySketch.HllBuf): Array[Byte] =
    if (buf == null) Array.emptyByteArray else buf.serialize
  override def deserialize(bytes: Array[Byte]): CardinalitySketch.HllBuf =
    if (bytes.isEmpty) null else CardinalitySketch.deserializeBuf(bytes)

  override def withNewMutableAggBufferOffset(n: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): HllMergeAgg =
    copy(child = newChild)
}

/** Row-local distinct-count estimate over sketch bytes. */
case class HllEstimate(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "graft_hll_estimate"
  override def dataType: DataType = LongType
  override protected def nullSafeEval(bytes: Any): Any =
    CardinalitySketch.deserializeBuf(bytes.asInstanceOf[Array[Byte]]).estimate
  override protected def withNewChildInternal(newChild: Expression): HllEstimate =
    copy(child = newChild)
}

/** Row-local: true while the sketch is still in the exact sparse regime. */
case class HllIsExact(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "graft_hll_is_exact"
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(bytes: Any): Any =
    CardinalitySketch.deserializeBuf(bytes.asInstanceOf[Array[Byte]]).isSparse
  override protected def withNewChildInternal(newChild: Expression): HllIsExact =
    copy(child = newChild)
}
