package graft

import graft.functions.CardinalitySketch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CardinalitySketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sparse regime is EXACT: per-lang distinct tokens equal count(DISTINCT)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val toks = docs.select(col("lang"),
      explode(graft.functions.TextFunctions.whitespaceTokens(col("text")))
        .as("tok"))
    val got = toks.groupBy("lang")
      .agg(CardinalitySketch.distinctCount(col("tok")).as("n"),
        CardinalitySketch.isExact(
          CardinalitySketch.sketch(col("tok"))).as("exact"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    val want = toks.groupBy("lang").agg(countDistinct(col("tok")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (lang, (n, exact)) =>
      assert(exact, s"$lang must stay sparse under the default capacity")
      assert(n == want(lang), s"$lang sparse estimate must be exact")
    }
  }

  test("dense regime: p=12 estimate within 5% on 100k distinct values") {
    val ids = spark.range(100000).select(col("id").cast("string").as("v"))
    val row = ids.agg(
      CardinalitySketch.distinctCount(col("v"), p = 12, sparseCap = 64).as("n"),
      CardinalitySketch.isExact(
        CardinalitySketch.sketch(col("v"), p = 12, sparseCap = 64)).as("exact"))
      .head()
    assert(!row.getBoolean(1), "100k >> 64 must fold dense")
    val err = math.abs(row.getLong(0) - 100000L) / 100000.0
    assert(err <= 0.05, s"dense estimate ${row.getLong(0)} off by $err")
  }

  test("duplicates never move the count; NULLs are skipped") {
    val df = Seq(Some("a"), Some("b"), Some("a"), None, Some("b"), Some("a"))
      .toDF("v")
    assert(df.agg(CardinalitySketch.distinctCount(col("v"))).head().getLong(0) == 2L)
  }

  test("merge of per-source sketches equals the global sketch (and the truth)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val toks = docs.select(col("source"),
      explode(graft.functions.TextFunctions.whitespaceTokens(col("text")))
        .as("tok"))
    val perSource = toks.groupBy("source")
      .agg(CardinalitySketch.sketch(col("tok")).as("sk"))
    val merged = perSource
      .agg(CardinalitySketch.estimate(
        CardinalitySketch.merge(col("sk"))).as("n"),
        CardinalitySketch.isExact(
          CardinalitySketch.merge(col("sk"))).as("exact"))
      .head()
    val truth = toks.agg(countDistinct(col("tok"))).head().getLong(0)
    assert(merged.getBoolean(1), "sparse union below capacity stays sparse")
    assert(merged.getLong(0) == truth,
      "merged per-source sketches must be exact in the sparse regime")
  }

  test("sketch bytes round-trip parquet; a dense+sparse merge folds dense") {
    val dir = java.nio.file.Files.createTempDirectory("hll").toString
    val a = spark.range(0, 5000)
      .select(col("id").cast("string").as("v"), lit("a").as("src"))
    val b = spark.range(4000, 9000)
      .select(col("id").cast("string").as("v"), lit("b").as("src"))
    // a is forced dense, b stays sparse
    a.agg(CardinalitySketch.sketch(col("v"), p = 12, sparseCap = 64).as("sk"))
      .withColumn("src", lit("a"))
      .unionByName(b.agg(CardinalitySketch.sketch(col("v"), p = 12).as("sk"))
        .withColumn("src", lit("b")))
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
      .agg(CardinalitySketch.estimate(CardinalitySketch.merge(col("sk"))).as("n"),
        CardinalitySketch.isExact(CardinalitySketch.merge(col("sk"))).as("exact"))
      .head()
    assert(!back.getBoolean(1), "any dense input folds the merge dense")
    val err = math.abs(back.getLong(0) - 9000L) / 9000.0
    assert(err <= 0.05, s"persisted+merged estimate ${back.getLong(0)} off by $err")
  }

  test("merging different precisions fails loudly") {
    val df = Seq("x").toDF("v")
    val sk4 = df.agg(CardinalitySketch.sketch(col("v"), p = 4).as("sk"))
    val sk8 = df.agg(CardinalitySketch.sketch(col("v"), p = 8).as("sk"))
    val e = intercept[Exception] {
      sk4.unionByName(sk8)
        .agg(CardinalitySketch.estimate(CardinalitySketch.merge(col("sk"))))
        .head()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("different precision")))
  }

  test("non-default-p merge survives empty partitions and NULL-only groups") {
    // regression: the partial-agg buffer of an empty partition used to
    // serialize as a DEFAULT p=12 sketch, so a global merge of p=8
    // sketches crashed at final merge on the precision check
    val sk8 = spark.range(100)
      .select(col("id").cast("string").as("v"), (col("id") % 3).as("g"))
      .groupBy("g")
      .agg(CardinalitySketch.sketch(col("v"), p = 8).as("sk"))
      .repartition(16) // 3 rows over 16 partitions → 13 empty partials
    val n = sk8.agg(
      CardinalitySketch.estimate(CardinalitySketch.merge(col("sk"))).as("n"))
      .head().getLong(0)
    assert(n == 100L, s"merged p=8 estimate must stay exact-sparse, got $n")
    // a group that never sees a sketch yields NULL, not a fake geometry
    val row = Seq((1, None: Option[Array[Byte]]))
      .toDF("g", "sk").groupBy("g")
      .agg(CardinalitySketch.merge(col("sk")).as("m"))
      .select(col("m").isNull.as("isnull")).head()
    assert(row.getBoolean(0), "NULL-only group must merge to NULL")
  }

  test("empty input: zero estimate, exact") {
    val empty = Seq.empty[String].toDF("v")
    val row = empty.agg(
      CardinalitySketch.distinctCount(col("v")).as("n"),
      CardinalitySketch.isExact(CardinalitySketch.sketch(col("v"))).as("e"))
      .head()
    assert(row.getLong(0) == 0L && row.getBoolean(1))
  }

  test("estimate is deterministic across partitionings (register max is order-free)") {
    val v = spark.range(50000).select(col("id").cast("string").as("v"))
    def est(parts: Int): Long = v.repartition(parts)
      .agg(CardinalitySketch.distinctCount(col("v"), p = 10, sparseCap = 16))
      .head().getLong(0)
    assert(est(2) == est(32), "dense estimate must not depend on merge order")
  }
}
