package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property-based invariants over generator-produced adversarial text
 * (unicode, control whitespace, punctuation runs, empties). Sampling
 * is SEEDED — the same 150 cases every run, so a failure here is a
 * real counterexample, never CI noise. Each property evaluates as ONE
 * Spark job over a single generated frame (per-case jobs would be
 * 100x slower for no extra coverage).
 */
class InvariantPropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    Iterator.from(0)
      .map(i => g.apply(Gen.Parameters.default, Seed(42L + i)))
      .flatten.take(n).toSeq

  private val textGen: Gen[String] =
    Gen.listOf(Gen.oneOf('a', 'b', 'Z', ' ', ' ', '\t', '\n', 'é', '木',
      '!', '.', '?', '0', '9', '-')).map(_.mkString)

  private lazy val texts: Seq[String] = samples(textGen, 150) ++
    Seq("", " ", "  ", "\t\n", "a", "é é é", "same same same")

  test("normalizeForDedup and normalizeAggressive are idempotent") {
    import graft.functions.TextFunctions
    val df = texts.toDF("t")
    val bad = df.select(
        TextFunctions.normalizeForDedup(col("t")).as("n1"),
        TextFunctions.normalizeForDedup(
          TextFunctions.normalizeForDedup(col("t"))).as("n2"),
        TextFunctions.normalizeAggressive(col("t")).as("a1"),
        TextFunctions.normalizeAggressive(
          TextFunctions.normalizeAggressive(col("t"))).as("a2"))
      .filter(col("n1") =!= col("n2") || col("a1") =!= col("a2"))
      .count()
    assert(bad == 0L)
  }

  test("redactPii is idempotent: a redacted text has nothing left to redact") {
    import graft.functions.TextFunctions
    val planted = texts.zipWithIndex.map { case (t, i) =>
      s"$t user$i@example.com 10.0.0.$i 123-45-6789 +1415555$i"
    }
    val bad = planted.toDF("t")
      .select(TextFunctions.redactPii(col("t")).as("r1"))
      .withColumn("r2", TextFunctions.redactPii(col("r1")))
      .filter(col("r1") =!= col("r2")).count()
    assert(bad == 0L)
  }

  test("exactDedup is idempotent and leaves unique keys") {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val once = graft.operators.Dedup.exactDedup(df, "text", "doc_id",
      byFingerprint = true)
    val twice = graft.operators.Dedup.exactDedup(once, "text", "doc_id",
      byFingerprint = true)
    val a = once.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = twice.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b, "second dedup must be a no-op")
    assert(a.toSeq.map(_._2).distinct.size == a.size, "texts must be unique")
  }

  test("assignSplit is growth-stable: a row's split never depends on the rest") {
    val ids = (1L to 157L).toDF("doc_id")
    val splits = Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)
    val full = graft.operators.Sampling.assignSplit(ids, "doc_id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val half = graft.operators.Sampling.assignSplit(
        ids.filter(col("doc_id") % 2 === 0), "doc_id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(half.forall { case (k, v) => full(k) == v },
      "subset rows must keep their full-corpus assignment")
  }

  test("applyBpe subword counts are monotone non-increasing in the merge list") {
    import graft.operators.TextStats
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val m1 = Seq(("a", "b"))
    val m2 = m1 ++ Seq(("ab", "a"), ("0", "9"), ("é", "木"))
    val c1 = TextStats.applyBpe(df, "doc_id", "text", m1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val c2 = TextStats.applyBpe(df, "doc_id", "text", m2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(c1.keySet == c2.keySet)
    assert(c1.forall { case (k, n) => c2(k) <= n },
      "extending the merge list can only merge more")
  }
}
