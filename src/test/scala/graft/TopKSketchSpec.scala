package graft

import graft.operators.TextStats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exact regime: k >= distinct keys gives exact counts across partitions") {
    val docs = Seq.tabulate(200) { i =>
      (i.toLong, if (i % 4 == 0) "alpha beta" else if (i % 4 == 1) "alpha"
      else if (i % 4 == 2) "gamma alpha" else "beta")
    }.toDF("doc_id", "text").repartition(7)
    // true counts: alpha 150, beta 100, gamma 50
    val out = TextStats.approxTopTokens(docs, "text", sketchK = 16, topM = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("alpha", 150L), ("beta", 100L), ("gamma", 50L)),
      s"got ${out.toSeq}")
  }

  test("approximate regime honors the Misra-Gries error bound") {
    // heavy: a x1000, b x500; tail: 600 distinct singletons -> n = 2100
    val rows = Seq.fill(1000)("a") ++ Seq.fill(500)("b") ++
      (0 until 600).map(i => s"tail_$i")
    val docs = rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").repartition(9)
    val k = 4
    val n = 2100L
    val err = n / (k + 1) // 420
    val sk = TextStats.approxTopTokens(docs, "text", sketchK = k, topM = k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = Map("a" -> 1000L, "b" -> 500L).withDefaultValue(1L)
    // items with true count > n/(k+1) are guaranteed present
    assert(sk.contains("a") && sk.contains("b"),
      s"heavy hitters above n/(k+1)=$err must survive, got $sk")
    // every stored count is within [true - err, true]
    sk.foreach { case (t, c) =>
      assert(c <= truth(t) && c >= truth(t) - err,
        s"$t stored $c outside [${truth(t) - err}, ${truth(t)}]")
    }
  }

  test("approxTopTokensBy sketches per stratum independently") {
    val docs = Seq(
      (1L, "en", "cat cat cat dog"),
      (2L, "en", "cat dog bird"),
      (3L, "de", "hund hund katze"),
      (4L, "de", "katze katze katze hund")
    ).toDF("doc_id", "lang", "text").repartition(5)
    val out = TextStats.approxTopTokensBy(docs, "text", Seq("lang"),
      sketchK = 16, topM = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set(
      ("en", "cat", 4L), ("en", "dog", 2L),
      ("de", "katze", 4L), ("de", "hund", 3L)), s"got $out")
  }

  test("approxTopNgrams sketches bigram heavy hitters exactly when k suffices") {
    val docs = Seq(
      (1L, "the cat sat on the cat"),
      (2L, "the cat ran"),
      (3L, "solo")                       // shorter than n: contributes nothing
    ).toDF("doc_id", "text").repartition(3)
    val out = TextStats.approxTopNgrams(docs, "text", n = 2,
      sketchK = 64, topM = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("the cat", 3L), ("cat ran", 1L)),
      s"top-2 by (count desc, ngram asc); got ${out.toSeq}")
  }

  test("NULL items are ignored and the aggregate partially combines") {
    val docs = Seq(Some("x x y"), None, Some("x")).toDF("text")
    val out = TextStats.approxTopTokens(docs, "text", sketchK = 8, topM = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("x", 3L), ("y", 1L)))
    // scale shape: typed-imperative agg runs as partial + final
    // ObjectHashAggregate pair — the shuffle carries k-entry sketches,
    // not the token stream
    val plan = TextStats.approxTopTokens(docs, "text", 8, 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"expected ObjectHashAggregate, plan:\n$plan")
    assert(plan.contains("partial_graft_misra_gries") ||
      plan.split("ObjectHashAggregate").length >= 3,
      s"expected a partial sketch stage, plan:\n$plan")
  }
}
