package graft

import graft.functions.{ByteBpeDecode, ByteBpeEncode}
import graft.operators.TextStats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The native byte-BPE DECODE kernel: exact inverse of the encode
 * kernel on every string (byte-level BPE segments the UTF-8 bytes, it
 * never rewrites them), piece-exact on known ids, loud on
 * out-of-vocabulary ids unless skipUnknown — in which case the
 * one-past-vocab EOS/pad sentinels drop, the artifact-reading
 * contract the packed round-trip rows grade.
 */
class ByteBpeDecodeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val FixtureMerges = Seq(("74", "68"), ("7468", "65"),
    ("20", "746865"), ("69", "6E"), ("61", "6E"), ("616E", "64"),
    ("65", "72"), ("6F", "6E"))

  private def edgeDocs = Seq(
    (1L, "the théme of things"),
    (2L, ""),
    (3L, null.asInstanceOf[String]),
    (4L, "it's 2 cats!  and   another, online"),
    (5L, "émincé é́"),
    (6L, "a"),
    (7L, "    "),
    (8L, "ander andante ons online")
  ).toDF("doc_id", "text")

  private def roundTrip(df: org.apache.spark.sql.DataFrame,
                        merges: Seq[(String, String)]): Map[Long, String] =
    df.select(col("doc_id"),
      ByteBpeDecode.byteBpeDecode(
        ByteBpeEncode.byteBpeIds(col("text"), merges), merges).as("rt"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1)))
      .toMap

  test("decode(encode(text)) is the identity: edges + corpus, fixture merges") {
    val want = edgeDocs.collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1)))
      .toMap
    assert(roundTrip(edgeDocs, FixtureMerges) == want,
      "round trip must return every edge doc byte-for-byte (NULL -> NULL)")

    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val mismatches = d.select(col("doc_id"),
        ByteBpeDecode.byteBpeDecode(
          ByteBpeEncode.byteBpeIds(col("text"), FixtureMerges),
          FixtureMerges).as("rt"), col("text"))
      .filter(!(col("rt") <=> col("text"))).count()
    assert(mismatches == 0L, "corpus round trip must be exact on every doc")
  }

  test("decode(encode) identity under a TRAINED merge list") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val trained = TextStats.trainBpeBytesLocal(
      TextStats.bytePretokenCounts(d, "text"), numMerges = 200)
      .map(m => (m._1, m._2))
    val mismatches = d.select(
        ByteBpeDecode.byteBpeDecode(
          ByteBpeEncode.byteBpeIds(col("text"), trained), trained).as("rt"),
        col("text"))
      .filter(!(col("rt") <=> col("text"))).count()
    assert(mismatches == 0L,
      "trained-vocab round trip must be exact on every doc")
  }

  test("piece-exact decode of known ids; base bytes and merge results") {
    // 't','h','e' = 0x74 0x68 0x65; merge 0 (rank 256) = 'th',
    // merge 1 (257) = 'the', merge 2 (258) = ' the'
    val out = Seq((1L, Seq(0x74L, 0x68L, 0x65L)), (2L, Seq(256L, 0x65L)),
      (3L, Seq(257L)), (4L, Seq(258L)), (5L, Seq.empty[Long]))
      .toDF("id", "ids")
      .select(col("id"),
        ByteBpeDecode.byteBpeDecode(col("ids"), FixtureMerges).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "the", 2L -> "the", 3L -> "the", 4L -> " the",
      5L -> ""))
  }

  test("out-of-vocabulary ids: loud by default, EOS-dropping with skipUnknown") {
    val eos = 256L + FixtureMerges.size // one past the vocab: 264
    val df = Seq((1L, Seq(257L, eos))).toDF("id", "ids")
    val boom = intercept[Exception] {
      df.select(ByteBpeDecode.byteBpeDecode(col("ids"), FixtureMerges))
        .collect()
    }
    assert(boom.getMessage != null)
    val ok = df.select(ByteBpeDecode.byteBpeDecode(col("ids"), FixtureMerges,
      skipUnknown = true).as("t")).head().getString(0)
    assert(ok == "the", "the EOS sentinel must drop, the payload decode")
  }

  test("input contract: array<int> fails at ANALYSIS time (r19, ADVICE r18 #1)") {
    val bad = Seq((1L, Seq(116, 104))).toDF("id", "ids") // array<int>
    val boom = intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(ByteBpeDecode.byteBpeDecode(col("ids"), FixtureMerges))
    }
    assert(boom.getMessage.toLowerCase.contains("bigint") ||
      boom.getMessage.toLowerCase.contains("mismatch"),
      s"analysis error must name the type contract, got: ${boom.getMessage}")
  }

  test("NULL array elements: loud by default, dropped with skipUnknown (r19)") {
    val df = Seq(1L).toDF("id").select(col("id"),
      array(lit(0x74L), lit(null).cast("long"), lit(0x68L)).as("ids"))
    val boom = intercept[Exception] {
      df.select(ByteBpeDecode.byteBpeDecode(col("ids"), FixtureMerges))
        .collect()
    }
    assert(boom.getMessage != null)
    val ok = df.select(ByteBpeDecode.byteBpeDecode(col("ids"), FixtureMerges,
      skipUnknown = true).as("t")).head().getString(0)
    assert(ok == "th", "null elements must drop under skipUnknown")
  }

  test("sentinelIds: EXACTLY the listed ids drop; garbage still throws (r19, ADVICE r18 #4)") {
    val eos = 256L + FixtureMerges.size
    // the strict artifact-reading mode: eos drops...
    val packed = Seq((1L, Seq(257L, eos))).toDF("id", "ids")
    val ok = packed.select(ByteBpeDecode.byteBpeDecode(col("ids"),
      FixtureMerges, skipUnknown = false, sentinelIds = Seq(eos)).as("t"))
      .head().getString(0)
    assert(ok == "the", "the listed sentinel must drop")
    // ...but a wild id from corruption is NOT silently eaten
    val corrupt = Seq((1L, Seq(257L, 99999L)), (2L, Seq(257L, -3L)))
      .toDF("id", "ids")
    val boom = intercept[Exception] {
      corrupt.select(ByteBpeDecode.byteBpeDecode(col("ids"),
        FixtureMerges, skipUnknown = false, sentinelIds = Seq(eos)))
        .collect()
    }
    assert(boom.getMessage != null,
      "ids outside the sentinel set must still fail loudly")
    // NULL elements are sentinel-class (r20, ADVICE r19): strict
    // sentinel mode tolerates masked/absent cells without abandoning
    // strict out-of-vocabulary checking via skipUnknown
    val withNull = Seq((1L, Seq[java.lang.Long](257L, null, eos)))
      .toDF("id", "ids")
    val nullOk = withNull.select(ByteBpeDecode.byteBpeDecode(col("ids"),
      FixtureMerges, skipUnknown = false, sentinelIds = Seq(eos)).as("t"))
      .head().getString(0)
    assert(nullOk == "the",
      "null elements must drop when a sentinel list is given")
    // ...while with NO sentinel list and no skipUnknown, nulls still throw
    intercept[Exception] {
      withNull.select(ByteBpeDecode.byteBpeDecode(col("ids"),
        FixtureMerges, skipUnknown = false)).collect()
    }
  }
}
