package graft

import graft.operators.Classifier.{LangidModel, LogRegModel}
import graft.sources.ModelStore
import org.scalatest.funsuite.AnyFunSuite

class ModelStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).resolve("artifact").toString

  test("BPE merges round-trip in training order") {
    val merges = Seq(("t", "h", 120L), ("th", "e", 80L), ("e", "r", 41L))
    val p = tmp("graft_ms_merges")
    ModelStore.saveMerges(spark, merges, p)
    assert(ModelStore.loadMerges(spark, p) == merges,
      "order IS the semantics — must survive the round-trip")
  }

  test("merge counts above 2^53 round-trip losslessly via the bigint slot") {
    // 2^53 + 1 is the first long a double cannot represent — the old
    // double-typed num column silently rounded it to 2^53
    val big = (1L << 53) + 1L
    val merges = Seq(("a", "b", big), ("ab", "c", Long.MaxValue))
    val p = tmp("graft_ms_merges_big")
    ModelStore.saveMerges(spark, merges, p)
    assert(ModelStore.loadMerges(spark, p) == merges)
  }

  test("unigram pieces round-trip including negative log-probs") {
    val pieces = Seq(("aaaa", -0.30103), ("bbbb", -0.30103),
      ("a", -1.69897), ("b", -1.69897))
    val p = tmp("graft_ms_pieces")
    ModelStore.savePieces(spark, pieces, p)
    assert(ModelStore.loadPieces(spark, p) == pieces)
  }

  test("logreg model round-trips weights and bias exactly") {
    val m = LogRegModel(Array(0.25, -1.5, 3.0e-7, 0.0), -0.125)
    val p = tmp("graft_ms_logreg")
    ModelStore.saveLogReg(spark, m, p)
    val back = ModelStore.loadLogReg(spark, p)
    assert(back.weights.toSeq == m.weights.toSeq && back.bias == m.bias,
      "doubles must round-trip bit-exactly through parquet")
    // malformed artifact refuses loudly
    intercept[IllegalArgumentException] {
      ModelStore.loadLogReg(spark, tmp("graft_ms_empty_seed") match {
        case q => ModelStore.savePieces(spark, Seq(("x", 1.0)), q); q
      })
    }
  }

  test("langid head stack round-trips and predicts identically") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val model = LangidModel(
      IndexedSeq("de", "en"),
      IndexedSeq(LogRegModel(Array.tabulate(64)(i => (i % 5 - 2) * 0.1), 0.3),
        LogRegModel(Array.tabulate(64)(i => (i % 3 - 1) * 0.2), -0.1)),
      dim = 64, nLo = 2, nHi = 3)
    val p = tmp("graft_ms_langid")
    ModelStore.saveLangid(spark, model, p)
    val back = ModelStore.loadLangid(spark, p)
    assert(back.labels == model.labels && back.dim == model.dim &&
      back.nLo == model.nLo && back.nHi == model.nHi)
    assert(back.heads.zip(model.heads).forall { case (a, b) =>
      a.weights.toSeq == b.weights.toSeq && a.bias == b.bias })
    // the loaded model scores a frame identically to the original
    val docs = Seq("straße und haus", "the quick brown fox").toDF("text")
    val a = graft.operators.Classifier.withLangid(docs, "text", model, "pred")
      .select("pred").collect().map(_.getString(0)).toSeq
    val b = graft.operators.Classifier.withLangid(docs, "text", back, "pred")
      .select("pred").collect().map(_.getString(0)).toSeq
    assert(a == b)
  }
}
