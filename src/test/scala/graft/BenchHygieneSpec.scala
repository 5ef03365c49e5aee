package graft

import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bench instrument hygiene (VERDICT r6 #1): the timing path must strip
  * the deterministic-output sort wrapper, and only that. */
class BenchHygieneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("withoutTopLevelSort strips exactly the top-level global sort, same rows") {
    val base = Seq((3L, "c"), (1L, "a"), (2L, "b")).toDF("id", "v")
    val sorted = base.orderBy(col("id").asc_nulls_first, col("v").asc_nulls_first)
    val stripped = GraftColumnBridge.withoutTopLevelSort(sorted)
    // the analyzed plan no longer ends in a global Sort...
    assert(!stripped.queryExecution.analyzed
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Sort])
    // ...but the row multiset is unchanged
    assert(stripped.collect().toSet == sorted.collect().toSet)
    // a frame with no top-level sort passes through untouched
    val untouched = GraftColumnBridge.withoutTopLevelSort(base)
    assert(untouched.queryExecution.analyzed eq base.queryExecution.analyzed)
    // sortWithinPartitions (local sort) is NOT stripped — only the global
    // RangePartitioning wrapper pays the double-eval the bench avoids
    val local = base.sortWithinPartitions("id")
    assert(GraftColumnBridge.withoutTopLevelSort(local)
      .queryExecution.analyzed eq local.queryExecution.analyzed)
  }

  test("every SparkEntry query's det() wrapper is strippable (sort is top-level)") {
    // guards the bench instrument against a future query accidentally
    // nesting the deterministic sort under another operator, which would
    // silently bring back the double-eval
    val sfDir = "/root/testdata/sf0.001"
    val unsorted = SparkEntry.queries.map { case (name, fn) =>
      val df = fn(spark, sfDir)
      val isSort = df.queryExecution.analyzed
        .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Sort]
      name -> isSort
    }.filter(!_._2).keys.toSeq.sorted
    // the JDBC-backed parity queries build their own deterministic order
    // internally; everything reading the sf parquet tables must be det()-
    // wrapped at the top
    assert(unsorted.isEmpty,
      s"queries whose plan does not end in a strippable global sort: $unsorted")
  }
}
