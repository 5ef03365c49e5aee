package graft

import graft.functions.FrequencySketch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FrequencySketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val toks = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(explode(
      graft.functions.TextFunctions.whitespaceTokens(col("text"))).as("tok"))

  test("estimates never undercount; heavy tokens stay within eps*N") {
    val truth = toks.groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("tok")).limit(50)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val n = toks.count()
    val sk = toks.agg(FrequencySketch.sketch(col("tok")).as("sk"))
    val probes = truth.map(_._1)
    val ests = sk.select(FrequencySketch.estimateAll(col("sk"),
      lit(probes)).as("e")).head().getSeq[Long](0)
    truth.zip(ests).foreach { case ((tok, t), e) =>
      assert(e >= t, s"'$tok' undercounted: $e < $t")
      assert(e <= t + math.ceil(1e-3 * n).toLong,
        s"'$tok' overcounted past eps*N: $e vs $t (N=$n)")
    }
  }

  test("single estimate agrees with estimateAll; unseen token ~ 0") {
    val sk = toks.agg(FrequencySketch.sketch(col("tok")).as("sk"))
    val row = sk.select(
      FrequencySketch.estimate(col("sk"), lit("the")).as("one"),
      FrequencySketch.estimateAll(col("sk"),
        lit(Array("the", "zzqqxx_never_seen"))).as("all")).head()
    assert(row.getLong(0) == row.getSeq[Long](1).head)
    val n = toks.count()
    assert(row.getSeq[Long](1)(1) <= math.ceil(1e-3 * n).toLong,
      "an unseen token can only carry collision mass")
  }

  test("merged per-source sketches equal the global sketch EXACTLY") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val st = docs.select(col("source"),
      explode(graft.functions.TextFunctions.whitespaceTokens(col("text")))
        .as("tok"))
    val global = st.agg(FrequencySketch.sketch(col("tok")).as("sk"))
    val merged = st.groupBy("source")
      .agg(FrequencySketch.sketch(col("tok")).as("sk"))
      .agg(FrequencySketch.merge(col("sk")).as("sk"))
    val probes = Seq("the", "of", "data", "zz_unseen")
    val g = global.select(FrequencySketch.estimateAll(col("sk"),
      lit(probes.toArray)).as("e")).head().getSeq[Long](0)
    val m = merged.select(FrequencySketch.estimateAll(col("sk"),
      lit(probes.toArray)).as("e")).head().getSeq[Long](0)
    assert(m == g, "CMS merge is pointwise addition — identical, not approximate")
  }

  test("sketch bytes round-trip parquet and keep answering") {
    val dir = java.nio.file.Files.createTempDirectory("cms").toString
    toks.agg(FrequencySketch.sketch(col("tok")).as("sk"))
      .write.mode("overwrite").parquet(dir)
    val n = spark.read.parquet(dir)
      .select(FrequencySketch.estimate(col("sk"), lit("the"))).head().getLong(0)
    val t = toks.filter(col("tok") === "the").count()
    assert(n >= t && t > 0)
  }

  test("merging mismatched geometries fails loudly; empty merge is NULL") {
    val a = Seq("x").toDF("v").agg(FrequencySketch.sketch(col("v"), eps = 1e-3).as("sk"))
    val b = Seq("x").toDF("v").agg(FrequencySketch.sketch(col("v"), eps = 1e-2).as("sk"))
    val e = intercept[Exception] {
      a.unionByName(b).agg(FrequencySketch.merge(col("sk"))).head()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.toLowerCase.contains("merge") ||
      m.toLowerCase.contains("incompatible")))
    val empty = Seq.empty[Array[Byte]].toDF("sk")
      .agg(FrequencySketch.merge(col("sk"))).head()
    assert(empty.isNullAt(0))
  }
}
