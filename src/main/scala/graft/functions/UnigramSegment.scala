package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unigram-LM (SentencePiece-style, Kudo 2018) Viterbi segmentation:
 * split a string into the piece sequence maximizing Σ logprob(piece)
 * over a FIXED piece table — the inference half of the unigram
 * tokenizer ([[graft.operators.TextStats.trainUnigramLm]] is the EM
 * training half). A native expression because segmentation is a
 * data-dependent DP no built-in can express; the piece table rides the
 * generated code as a REFERENCE OBJECT (`ctx.addReferenceObj` — the
 * standard mechanism for model state inside whole-stage codegen), so
 * evaluation stays codegen'd with zero per-row model setup.
 *
 * Semantics: DP over UTF-16 code units; any single code unit absent
 * from the table falls back to `unkLogProb` (so every string has a
 * valid segmentation); score ties prefer the LONGER piece ending at
 * the position (deterministic longest-match bias). Empty string →
 * empty array; NULL → NULL.
 */
case class UnigramSegment(child: Expression, pieces: Seq[(String, Double)],
                          unkLogProb: Double) extends UnaryExpression {

  require(pieces.nonEmpty, "piece table must be non-empty")

  @transient private lazy val model =
    UnigramSegment.modelFor(pieces, unkLogProb)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_unigram_segment"

  override protected def nullSafeEval(input: Any): Any =
    model.segment(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramModel", model,
      classOf[UnigramSegment.Model].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.segment($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramSegment =
    copy(child = newChild)
}

object UnigramSegment {

  /** One compiled model per distinct (piece table, unk) per JVM — the
    * [[ByteBpeEncode.modelFor]] convention: plans (and TASKS — see
    * [[Model.writeReplace]]) sharing a table share one built HashMap
    * instead of rebuilding per expression instance / per task.
    * Hard-capped like the BPE model cache (past the cap new tables
    * build uncached — correct, just unmemoized). */
  private val modelCache = new java.util.concurrent.ConcurrentHashMap[
    (Seq[(String, Double)], Double), Model]()
  private val ModelCacheCap = 64
  private[graft] def modelFor(pieces: Seq[(String, Double)],
                              unkLogProb: Double): Model = {
    val key = (pieces, unkLogProb)
    val hit = modelCache.get(key)
    if (hit != null) hit
    else {
      val built = new Model(pieces.toArray, unkLogProb)
      if (modelCache.size >= ModelCacheCap) built
      else {
        val prev = modelCache.putIfAbsent(key, built)
        if (prev != null) prev else built
      }
    }
  }

  /** The shared piece-table + Viterbi kernel — one instance per plan,
    * serialized to executors, referenced from generated code. */
  final class Model(pieceTable: Array[(String, Double)],
                    unkLogProb: Double) extends Serializable {
    /** Per-JVM task sharing (guide §4.5): ship the piece table, not
      * the built map; deserialization resolves through [[modelFor]]
      * so every task in the JVM shares one built model. */
    @throws(classOf[java.io.ObjectStreamException])
    private def writeReplace(): Object =
      new ModelRef(pieceTable, unkLogProb)

    private val map = new java.util.HashMap[String, java.lang.Double]()
    private var maxLen = 1
    pieceTable.foreach { case (p, lp) =>
      if (p.nonEmpty) {
        map.put(p, Double.box(lp))
        if (p.length > maxLen) maxLen = p.length
      }
    }

    def logProb(piece: String): java.lang.Double = map.get(piece)

    def segment(text: UTF8String): ArrayData = {
      val s = text.toString
      val n = s.length
      if (n == 0) return new GenericArrayData(Array.empty[Any])
      // surrogate-pair integrity: a boundary between a high and its low
      // surrogate would emit unpaired halves that UTF8String encodes as
      // '?' — such positions are invalid DP states, and the unk
      // fallback covers a whole CODE POINT (1 or 2 units)
      def boundaryOk(k: Int): Boolean =
        k <= 0 || k >= n ||
          !(Character.isHighSurrogate(s.charAt(k - 1)) &&
            Character.isLowSurrogate(s.charAt(k)))
      val score = Array.fill(n + 1)(Double.NegativeInfinity)
      val back = new Array[Int](n + 1)
      score(0) = 0.0
      var i = 1
      while (i <= n) {
        if (boundaryOk(i)) {
          // j ascending = longest piece first; strict > keeps the first
          // (longest) candidate on score ties. Scan at least 2 back so
          // the surrogate-PAIR unk fallback stays reachable even when
          // every table piece is a single unit
          var j = math.max(0, i - math.max(maxLen, 2))
          while (j < i) {
            if (score(j) != Double.NegativeInfinity) {
              val len = i - j
              val isCodePoint = len == 1 ||
                (len == 2 && Character.isHighSurrogate(s.charAt(j)) &&
                  Character.isLowSurrogate(s.charAt(j + 1)))
              val lpBoxed = map.get(s.substring(j, i))
              val lp =
                if (lpBoxed != null) lpBoxed.doubleValue
                else if (isCodePoint) unkLogProb
                else Double.NegativeInfinity
              if (lp != Double.NegativeInfinity) {
                val cand = score(j) + lp
                if (cand > score(i)) { score(i) = cand; back(i) = j }
              }
            }
            j += 1
          }
        }
        i += 1
      }
      var k = n
      var count = 0
      while (k > 0) { k = back(k); count += 1 }
      val out = new Array[Any](count)
      k = n
      var idx = count - 1
      while (k > 0) {
        val j = back(k)
        out(idx) = UTF8String.fromString(s.substring(j, k))
        idx -= 1
        k = j
      }
      new GenericArrayData(out)
    }
  }

  /** [[Model]]'s serialization proxy ([[ByteBpeEncode]]'s ModelRef
    * pattern): carries the piece table only, resolves per-JVM. */
  private final class ModelRef(pieceTable: Array[(String, Double)],
                               unkLogProb: Double) extends Serializable {
    @throws(classOf[java.io.ObjectStreamException])
    private def readResolve(): Object =
      modelFor(pieceTable.toIndexedSeq, unkLogProb)
  }

  /** Column helper: the Viterbi-best piece array. */
  def unigramSegment(text: Column, pieces: Seq[(String, Double)],
                     unkLogProb: Double = -12.0): Column =
    GraftColumnBridge.column(
      UnigramSegment(GraftColumnBridge.expression(text), pieces, unkLogProb))
}
