package graft

import graft.operators.TextStats
import org.scalatest.funsuite.AnyFunSuite

class TextStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("repetitionProfile computes hand-checked ratios") {
    // words: a b a b c -> 5 words, 3 distinct -> dwr 0.6
    // bigrams: "a b","b a","a b","b c" -> 4 total, 3 distinct, top=2
    val docs = Seq((1L, "a b a b c"), (2L, "x y z w")).toDF("doc_id", "text")
    val out = TextStats.repetitionProfile(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_bigrams") == 4L)
    assert(r1.getAs[Double]("distinct_bigram_ratio") == 0.75)
    assert(r1.getAs[Double]("top_bigram_ratio") == 0.5)
    assert(r1.getAs[Double]("distinct_word_ratio") == 0.6)
    val r2 = out(2L) // no repetition at all
    assert(r2.getAs[Double]("distinct_bigram_ratio") == 1.0 &&
      r2.getAs[Double]("distinct_word_ratio") == 1.0)
  }

  test("repetitive boilerplate scores measurably worse than varied text") {
    val docs = Seq(
      (1L, Seq.fill(30)("click here to subscribe").mkString(" ")),
      (2L, "the quick brown fox jumps over the lazy dog while autumn leaves drift past")
    ).toDF("doc_id", "text")
    val out = TextStats.repetitionProfile(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("top_bigram_ratio")).toMap
    assert(out(1L) > 0.2 && out(2L) < 0.1)
  }

  test("CorpusClean drops duplicates, boilerplate, wrong-language and junk docs") {
    val good = "the house and the garden were quiet that morning and the light was very good"
    val docs = Seq(
      (1L, good),                                           // keeps
      (2L, good),                                           // exact dup of 1 -> dropped
      (3L, Seq.fill(20)("buy now buy now").mkString(" ")),  // repetitive -> dropped
      (4L, "der hund und die katze waren nicht in dem haus und das war auch gut"), // de
      (5L, "zz qq xx vv ww")                                // junk: low quality
    ).toDF("doc_id", "text")
    val kept = graft.operators.CorpusClean.clean(docs, "doc_id", "text",
      langs = Seq("en"), minQuality = 3, maxTopBigramRatio = 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L))
  }
}
