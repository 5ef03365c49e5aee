package graft

import graft.operators.Classifier
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import org.scalatest.funsuite.AnyFunSuite

class ClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("trainLogReg separates a hand-built 1-D problem") {
    val df = Seq(
      (Array(1.0f), 1), (Array(0.8f), 1), (Array(1.2f), 1),
      (Array(-1.0f), 0), (Array(-0.7f), 0), (Array(-1.3f), 0)
    ).toDF("vec", "label")
    val m = Classifier.trainLogReg(df, "vec", "label", iters = 50, lr = 2.0)
    assert(m.weights.length == 1 && m.weights(0) > 0,
      "positive class sits at positive x, weight must learn that")
    val out = Classifier.withScore(df, "vec", m).collect()
    out.foreach { r =>
      assert(r.getAs[Int]("pred") == r.getAs[Int]("label"))
      val s = r.getAs[Double]("score")
      if (r.getAs[Int]("label") == 1) assert(s > 0.5) else assert(s < 0.5)
    }
  }

  test("text classifier learns a token-presence concept well above base rate") {
    // label = the word "spark" appears (385 of 500 docs at sf0.01, so
    // base rate 0.77); hashed bag-of-words features make this
    // near-separable, but full-batch GD grows logistic margins only
    // logarithmically — measured 0.996 at (dim 1024, lr 400, 100
    // iters), so the contract is a threshold, not exactness (the
    // EXACT-recovery gate lives on the planted separable frame of
    // q_gate_classifier, where the margin is comfortable)
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), col("text"),
        array_contains(split(col("text"), " "), "spark")
          .cast(IntegerType).as("label"))
      .cache()
    val m = Classifier.trainTextClassifier(docs, "text", "label",
      dim = 1024, iters = 100, lr = 400.0)
    val feats = docs.select(col("label"),
      graft.functions.TextFunctions.hashingVector(col("text"), 1024).as("__f"))
    val acc = Classifier.withScore(feats, "__f", m)
      .agg(avg((col("pred") === col("label")).cast("double"))).head().getDouble(0)
    val baseRate = docs.agg(avg(col("label").cast("double"))).head().getDouble(0)
    assert(acc >= 0.95, s"expected >= 0.95 accuracy, got $acc")
    assert(acc > baseRate, s"must beat all-positive base rate $baseRate, got $acc")
    docs.unpersist()
  }

  test("scoring is a zero-shuffle projection (weights are plan literals)") {
    val df = Seq((Array(1.0f, 0.0f), 1), (Array(0.0f, 1.0f), 0)).toDF("vec", "label")
    val m = Classifier.trainLogReg(df, "vec", "label", iters = 5, lr = 1.0)
    val nodes = PlanWalk.executedNodes(Classifier.withScore(df, "vec", m))
    assert(!nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]),
      "scoring must not shuffle")
    assert(!nodes.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
      "scoring must not join")
  }
}
