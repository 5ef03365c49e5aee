package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Misra–Gries heavy-hitters SKETCH as a native mergeable Catalyst
 * aggregate — approximate top-k item counts in ONE pass with O(k)
 * memory per task, the scale path when even the Zipf-bounded distinct
 * -key shuffle of an exact `groupBy(token).count()` is too much (URLs,
 * n-grams at high n, user-ids: key spaces where "distinct" is itself
 * corpus-scale).
 *
 * Algorithm (Misra & Gries 1982; merge rule from Agarwal et al. 2012,
 * "Mergeable Summaries"): keep at most k counters; an unseen item
 * decrements all k when the table is full. Merge = pointwise counter
 * sum, then subtract the (k+1)-th largest count and drop the
 * non-positive. The summary is MERGEABLE with the same error bound —
 * which is exactly what makes it a correct Spark partial aggregate:
 * each task sketches its partition (update), the k-entry summaries
 * shuffle (bytes ∝ k, NOT ∝ distinct keys), and merge happens on the
 * reduce side.
 *
 * Guarantee: every stored count c satisfies
 * `true − floor(n/(k+1)) ≤ c ≤ true` (n = total items), so any item
 * with true count > n/(k+1) is GUARANTEED present. The gate query
 * pins this against the exact counts.
 *
 * Output: `array<struct<item:string, count_min:bigint>>` sorted by
 * (count desc, item asc) — count_min is the lower-bound estimate.
 */
case class MisraGries(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"sketch size k must be >= 1, got $k")

  override def prettyName: String = "graft_misra_gries"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count_min", LongType, nullable = false))))

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long],
                      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String]
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None if buf.size < k =>
          // copy: the UTF8String may point into a reused row buffer
          buf.update(item.clone(), 1L)
        case None =>
          // full table + unseen item: decrement every counter
          val dead = mutable.ArrayBuffer.empty[UTF8String]
          buf.foreach { case (it, c) =>
            if (c == 1L) dead += it else buf.update(it, c - 1)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[UTF8String, Long],
                     other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (it, c) => buf.update(it, buf.getOrElse(it, 0L) + c) }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count from all, keep the positive
      val cut = buf.values.toArray.sortBy(-_).apply(k)
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      buf.foreach { case (it, c) =>
        if (c - cut <= 0L) dead += it else buf.update(it, c - cut)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (it, c) => (-c, it) }
    new GenericArrayData(sorted.map { case (it, c) =>
      InternalRow(it, c)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (it, c) =>
      val b = it.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}

object TopKSketch {
  /** Aggregate Column: Misra–Gries sketch of `items` with k counters.
    * Result: array<struct<item, count_min>> by (count desc, item asc). */
  def sketch(items: Column, k: Int): Column =
    GraftColumnBridge.column(
      MisraGries(GraftColumnBridge.expression(items), k).toAggregateExpression())
}
