package graft

import graft.functions.QuantileSketch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QuantileSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val Probs = Seq(0.0, 0.25, 0.5, 0.9, 1.0)

  /** rank-definition quantile: smallest v with |{x <= v}| >= ceil(p*n) */
  private def exact(xs: Seq[Double], p: Double): Double = {
    val s = xs.sorted
    val target = math.max(1L, math.ceil(p * s.size).toLong)
    s((target - 1).toInt)
  }

  test("exact regime: group smaller than capacity reproduces rank quantiles") {
    import spark.implicits._
    // adversarial order + duplicates + negatives
    val xs = (1 to 500).map(i => ((i * 7919) % 997).toDouble - 100.0)
    val got = xs.toDF("v")
      .agg(QuantileSketch.quantiles(col("v"), capacity = 1024, Probs))
      .collect()(0).getSeq[Double](0)
    assert(got == Probs.map(p => exact(xs, p)),
      "below capacity the sketch must be bit-exact, not approximate")
  }

  test("exact regime survives partial-aggregate merges across partitions") {
    import spark.implicits._
    val xs = (1 to 800).map(i => ((i * 104729) % 1009).toDouble)
    val df = spark.sparkContext.parallelize(xs, 16).toDF("v")
    val got = df.agg(QuantileSketch.quantiles(col("v"), 4096, Probs))
      .collect()(0).getSeq[Double](0)
    assert(got == Probs.map(p => exact(xs, p)),
      "16 uncompacted partials concatenate below capacity -> still exact")
  }

  test("grouped: one summary per stratum, NULL for empty-input groups") {
    import spark.implicits._
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("b", Some(10.0)), ("c", None)).toDF("g", "v")
    val got = df.groupBy("g")
      .agg(QuantileSketch.quantiles(col("v"), 64, Seq(0.5)).as("q"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Double](1).head)).toMap
    assert(got("a") == 2.0 && got("b") == 10.0 && got("c") == null)
  }

  test("compacted regime: bounded rank error at 100k rows, capacity 256") {
    import spark.implicits._
    val n = 100000
    // deterministic non-sorted stream with a skewed tail
    val xs = (0 until n).map(i => ((i.toLong * 48271) % n).toDouble)
    val df = spark.sparkContext.parallelize(xs, 8).toDF("v")
    val got = df.agg(QuantileSketch.quantiles(col("v"), 256, Probs))
      .collect()(0).getSeq[Double](0)
    // values are a permutation of 0..n-1, so value distance IS rank
    // distance; accept <= 1% of n
    Probs.zip(got).foreach { case (p, v) =>
      val err = math.abs(v - exact(xs, p))
      assert(err <= n / 100.0, s"p=$p err=$err (${v} vs ${exact(xs, p)})")
    }
    // the extremes never leave the observed range
    assert(got.head >= 0.0 && got.last <= (n - 1).toDouble)
  }

  test("deterministic: same data, same partitioning, same summary") {
    import spark.implicits._
    val xs = (0 until 50000).map(i => ((i * 16807L) % 50000).toDouble)
    def run(): Seq[Double] =
      spark.sparkContext.parallelize(xs, 8).toDF("v")
        .agg(QuantileSketch.quantiles(col("v"), 128, Probs))
        .collect()(0).getSeq[Double](0)
    assert(run() == run(),
      "the deterministic compaction rule must make reruns bit-identical")
  }

  test("plan shape: partial aggregation before the exchange (objhash)") {
    import spark.implicits._
    val df = spark.sparkContext.parallelize(1 to 1000, 4)
      .toDF("v").withColumn("g", pmod(col("v"), lit(3)))
    val plan = df.groupBy("g")
      .agg(QuantileSketch.quantiles(col("v"), 64, Seq(0.5)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"typed imperative agg must run as ObjectHashAggregate, got:\n$plan")
    assert(plan.split("ObjectHashAggregate").length >= 3,
      "partial + final aggregate: summaries shuffle, never raw rows")
  }
}
