package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

  test("hashSample is deterministic, key-stable and near the target fraction") {
    val a = Sampling.hashSample(docs, "doc_id", 0.3).select("doc_id")
      .as[Long].collect().toSet
    val b = Sampling.hashSample(docs, "doc_id", 0.3).select("doc_id")
      .as[Long].collect().toSet
    assert(a == b, "same fraction must select the same rows")
    val n = docs.count().toDouble
    assert(math.abs(a.size / n - 0.3) < 0.05, s"got ${a.size / n}")
    // monotone in fraction: a smaller sample is a subset of a larger one
    val small = Sampling.hashSample(docs, "doc_id", 0.1).select("doc_id")
      .as[Long].collect().toSet
    assert(small.subsetOf(a))
    // boundary fractions
    assert(Sampling.hashSample(docs, "doc_id", 0.0).isEmpty)
    assert(Sampling.hashSample(docs, "doc_id", 1.0).count() == docs.count())
  }

  test("stratifiedSample applies per-stratum fractions with a default") {
    val out = Sampling.stratifiedSample(docs, "lang", "doc_id",
      Map("en" -> 0.2, "de" -> 1.0), default = 0.0)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("de") == totals("de"), "fraction 1.0 keeps the whole stratum")
    val enRatio = byLang("en").toDouble / totals("en")
    assert(math.abs(enRatio - 0.2) < 0.06, s"en ratio $enRatio")
    // default 0.0 drops every unlisted stratum
    assert(byLang.keySet == Set("en", "de"), byLang.keySet.toString)
    // a stratum's kept set is hashSample's kept set (same uniform)
    val enIds = out.filter(col("lang") === "en").select("doc_id").as[Long].collect().toSet
    val direct = Sampling.hashSample(docs.filter(col("lang") === "en"), "doc_id", 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(enIds == direct)
  }

  test("fraction samplers are zero-shuffle filters (plan-asserted)") {
    assert(PlanWalk.shuffleCount(Sampling.hashSample(docs, "doc_id", 0.5)) == 0)
    assert(PlanWalk.shuffleCount(Sampling.stratifiedSample(docs, "lang", "doc_id",
      Map("en" -> 0.5), default = 0.1)) == 0)
  }

  test("stratifiedTopK takes exactly k per stratum and engages WindowGroupLimit") {
    val k = 7
    val out = Sampling.stratifiedTopK(docs, Seq("lang", "source"), "doc_id", k)
    val sizes = out.groupBy("lang", "source").count().collect().map(_.getLong(2))
    val strata = docs.select("lang", "source").distinct().count()
    assert(sizes.length == strata)
    assert(sizes.forall(_ <= k))
    // deterministic: same call, same rows
    val ids1 = out.select("doc_id").as[Long].collect().toSet
    val ids2 = Sampling.stratifiedTopK(docs, Seq("lang", "source"), "doc_id", k)
      .select("doc_id").as[Long].collect().toSet
    assert(ids1 == ids2)
    // the rank filter must engage the WindowGroupLimit pushdown, so the
    // exchange moves ~k rows per map-side stratum, not the corpus —
    // asserted by walking the finalized plan tree (ADVICE r7: never
    // string-match the plan rendering)
    val limits = PlanWalk.executedNodes(out)
      .count(_.isInstanceOf[org.apache.spark.sql.execution.window.WindowGroupLimitExec])
    assert(limits >= 1, "expected WindowGroupLimitExec in the finalized plan")
  }
}
