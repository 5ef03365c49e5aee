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

  test("weightedSample keeps by per-row probability, clamped, zero-shuffle") {
    // weight 0 drops everything, weight 1 (and clamped >1) keeps everything
    assert(Sampling.weightedSample(docs, "doc_id", lit(0.0)).isEmpty)
    assert(Sampling.weightedSample(docs, "doc_id", lit(1.0)).count() == docs.count())
    assert(Sampling.weightedSample(docs, "doc_id", lit(7.5)).count() == docs.count())
    assert(Sampling.weightedSample(docs, "doc_id", lit(-3.0)).isEmpty)
    // a constant weight is exactly hashSample at that fraction
    val w = Sampling.weightedSample(docs, "doc_id", lit(0.3))
      .select("doc_id").as[Long].collect().toSet
    val h = Sampling.hashSample(docs, "doc_id", 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(w == h)
    // per-row weights: high-weight rows survive more often than low-weight
    val skewed = Sampling.weightedSample(docs, "doc_id",
      when(col("lang") === "en", 0.9).otherwise(0.1))
    val kept = skewed.groupBy(col("lang") === "en").count().collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    val tot = docs.groupBy(col("lang") === "en").count().collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(kept(true).toDouble / tot(true) > 0.8)
    assert(kept(false).toDouble / tot(false) < 0.2)
    assert(PlanWalk.shuffleCount(skewed) == 0)
    // NULL weight = weight 0 (documented policy): dropped explicitly,
    // same result as lit(0.0), not a silent NULL-comparison artifact
    assert(Sampling.weightedSample(docs, "doc_id",
      lit(null).cast("double")).isEmpty)
    assert(Sampling.weightedSample(docs, "doc_id",
      when(col("lang") === "zz", 1.0)).isEmpty) // CASE with no ELSE -> NULL
  }

  test("tokenBudgetSampleBy applies per-stratum budgets, default drops") {
    val rows = (1 to 10).map(i => (i.toLong, "en", 10L)) ++
      (11 to 20).map(i => (i.toLong, "de", 10L)) ++
      (21 to 25).map(i => (i.toLong, "zz", 10L))
    val df = rows.toDF("doc_id", "lang", "toks")
    val out = Sampling.tokenBudgetSampleBy(df, "lang", "doc_id", col("toks"),
      Map("en" -> 35L, "de" -> 100L))
    val kept = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // en: 3 rows under 35, the crossing 4th kept; de: all fit; zz dropped
    assert(kept == Map("en" -> 4L, "de" -> 10L))
    // a positive default keeps a floor from unlisted strata
    val floored = Sampling.tokenBudgetSampleBy(df, "lang", "doc_id", col("toks"),
      Map("en" -> 35L), default = 5L)
    val byLang = floored.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("zz") == 1L && byLang("de") == 1L, "crossing row per stratum")
    // uniform map equals the uniform-budget operator exactly
    val uni = Sampling.tokenBudgetSample(df, Seq("lang"), "doc_id",
      col("toks"), budget = 35L).collect().map(_.getLong(0)).toSet
    val mapped = Sampling.tokenBudgetSampleBy(df, "lang", "doc_id", col("toks"),
      Map("en" -> 35L, "de" -> 35L, "zz" -> 35L)).collect().map(_.getLong(0)).toSet
    assert(uni == mapped)
  }

  test("percentileBuckets assigns equal-mass buckets, NULL scores excluded") {
    val df = ((1 to 9).map(i => (i.toLong, Some(i.toDouble))) :+
      (10L, Option.empty[Double])).toDF("id", "score")
    val out = Sampling.percentileBuckets(df, "score", 3)
    val got = out.collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) -1 else r.getInt(2))).toMap
    // cuts at the 1/3 and 2/3 interpolated percentiles of 1..9:
    // c1 = 3.666667, c2 = 6.333333 -> 1-3 | 4-6 | 7-9
    assert((1 to 3).forall(i => got(i.toLong) == 0))
    assert((4 to 6).forall(i => got(i.toLong) == 1))
    assert((7 to 9).forall(i => got(i.toLong) == 2))
    assert(got(10L) == -1, "NULL score gets a NULL bucket")
    // zero-shuffle: the bucketing itself is a literal CASE projection
    assert(PlanWalk.shuffleCount(out) == 0)
    // an all-NULL score column yields all-NULL buckets, no crash
    val empty = Sampling.percentileBuckets(
      Seq((1L, Option.empty[Double])).toDF("id", "score"), "score", 3)
    assert(empty.collect().forall(_.isNullAt(2)))
  }

  test("rebalanceMixture computes fractions from target shares and counts") {
    // strata: en 100 rows, de 50 rows -> targets 50/50:
    // n_max = min(100/0.5, 50/0.5) = 100; frac_en = 0.5, frac_de = 1.0
    val rows = (0 until 100).map(i => (i.toLong, "en")) ++
      (100 until 150).map(i => (i.toLong, "de")) ++
      (150 until 160).map(i => (i.toLong, "zz")) // untargeted: dropped
    val df = rows.toDF("doc_id", "lang")
    val out = Sampling.rebalanceMixture(df, "lang", "doc_id",
      Map("en" -> 0.5, "de" -> 0.5))
    val kept = out.collect().map(r => r.getLong(0) -> r.getString(1))
    assert(!kept.exists(_._2 == "zz"), "untargeted strata are dropped")
    assert(kept.count(_._2 == "de") == 50, "frac 1.0 keeps the whole stratum")
    val en = kept.count(_._2 == "en")
    assert(en > 30 && en < 70, s"~half of en expected, got $en")
    // frac_en must equal stratifiedSample at the computed 0.5 exactly
    val direct = Sampling.stratifiedSample(df.filter(col("lang") === "en"),
      "lang", "doc_id", Map("en" -> 0.5)).collect().map(_.getLong(0)).toSet
    assert(kept.filter(_._2 == "en").map(_._1).toSet == direct)
    // deterministic; scale shrinks proportionally
    assert(Sampling.rebalanceMixture(df, "lang", "doc_id",
      Map("en" -> 0.5, "de" -> 0.5)).collect().map(_.getLong(0)).toSet ==
      kept.map(_._1).toSet)
    val half = Sampling.rebalanceMixture(df, "lang", "doc_id",
      Map("en" -> 0.5, "de" -> 0.5), scale = 0.5)
    assert(half.count() < out.count())
    // a target stratum absent from the data is ignored, not a crash
    val noFr = Sampling.rebalanceMixture(df, "lang", "doc_id",
      Map("en" -> 0.5, "fr" -> 0.5))
    assert(noFr.select("lang").distinct().collect().map(_.getString(0)).toSeq
      == Seq("en"))
  }

  test("assignSplit covers every row, is growth-stable, zero-shuffle") {
    val out = Sampling.assignSplit(docs, "doc_id",
      Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
    val bypart = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count().toDouble
    assert(!bypart.contains(null), "fractions sum to 1 -> no NULL slice")
    assert(math.abs(bypart("train") / n - 0.8) < 0.05)
    assert(math.abs(bypart("valid") / n - 0.1) < 0.04)
    assert(math.abs(bypart("test") / n - 0.1) < 0.04)
    // growth stability: a doc's slice is identical when assigned within
    // a subset of the corpus (no re-drawing on dataset growth)
    val sub = Sampling.assignSplit(docs.filter(col("doc_id") < 100), "doc_id",
      Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val full = out.select("doc_id", "split").as[(Long, String)].collect().toMap
    sub.foreach { case (id, s) => assert(full(id) == s) }
    // under-allocated fractions leave a NULL holdout remainder
    val hold = Sampling.assignSplit(docs, "doc_id", Seq("train" -> 0.5))
    val nulls = hold.filter(col("split").isNull).count()
    assert(math.abs(nulls / n - 0.5) < 0.05)
    assert(PlanWalk.shuffleCount(out) == 0)
  }

  test("temperatureSample keeps the smallest stratum whole, flattens toward uniform") {
    val df = ((1 to 9).map(i => (i.toLong, "big")) :+ (100L, "small"))
      .toDF("doc_id", "lang")
    // α = 1: natural proportions — every stratum's fraction is 1
    assert(Sampling.temperatureSample(df, "lang", "doc_id", alpha = 1.0)
      .count() == 10L)
    // α = 0.5: shares (0.75, 0.25), nMax = 4 → big keeps 1/3, small all
    val out = Sampling.temperatureSample(df, "lang", "doc_id", alpha = 0.5)
    val by = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(by.getOrElse("small", 0L) == 1L, "smallest stratum must be kept whole")
    assert(by("big") < 9L, "big stratum must be downsampled")
    // deterministic re-run
    assert(Sampling.temperatureSample(df, "lang", "doc_id", alpha = 0.5)
      .count() == out.count())
    // null strata dropped
    val withNull = df.unionByName(Seq((200L, null.asInstanceOf[String]))
      .toDF("doc_id", "lang"))
    assert(Sampling.temperatureSample(withNull, "lang", "doc_id", alpha = 0.5)
      .filter(col("lang").isNull).count() == 0L)
  }

  test("assignSplitLeakSafe keeps a near-dup family in one slice") {
    val splits = Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)
    val d = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b") // family {1,2,3}
    val m = Sampling.assignSplitLeakSafe(d, "doc_id", pairs, "doc_a", "doc_b",
      splits).select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(m(1L) == m(2L) && m(2L) == m(3L), "family straddles slices")
    // the family draws as its min id; singletons draw as themselves
    val plain = Sampling.assignSplit(d, "doc_id", splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(m(1L) == plain(1L))
    assert(m(4L) == plain(4L))
    // output shape matches assignSplit: input columns + split only
    assert(Sampling.assignSplitLeakSafe(d, "doc_id", pairs, "doc_a", "doc_b",
      splits).columns.toSeq == Seq("doc_id", "split"))
  }

  test("tokenBudgetSample stays within budget + one doc, hash-first order") {
    val budget = 2000L
    val out = Sampling.tokenBudgetSample(docs, Seq("lang"), "doc_id",
      graft.functions.TextFunctions.tokenCount(col("text")), budget)
    val sizes = out.groupBy("lang")
      .agg(sum(graft.functions.TextFunctions.tokenCount(col("text"))).as("toks"),
        max(graft.functions.TextFunctions.tokenCount(col("text"))).as("mx"))
      .collect()
    assert(sizes.nonEmpty)
    sizes.foreach { r =>
      val total = r.getLong(1); val mx = r.getLong(2)
      assert(total < budget + mx,
        s"${r.getString(0)}: $total tokens exceeds budget+one-doc")
    }
    // the kept set is the hash-first prefix: every kept doc's uniform is
    // <= every dropped doc's uniform within its stratum (prefix property)
    val u = Sampling.hashUniform(col("doc_id"))
    val kept = out.select(col("lang"), u.as("u")).groupBy("lang")
      .agg(max("u").as("maxKept")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val dropped = docs.join(out.select("doc_id"), Seq("doc_id"), "left_anti")
      .select(col("lang"), u.as("u")).groupBy("lang")
      .agg(min("u").as("minDropped")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    dropped.foreach { case (lang, minDrop) =>
      assert(kept(lang) < minDrop, s"$lang: kept set is not a hash prefix")
    }
    // every stratum keeps at least one row, even under a tiny budget
    val tiny = Sampling.tokenBudgetSample(docs, Seq("lang"), "doc_id",
      graft.functions.TextFunctions.tokenCount(col("text")), 1L)
    assert(tiny.select("lang").distinct().count() ==
      docs.select("lang").distinct().count())
    // exactly ONE exchange (the stratum window), plan-asserted
    assert(PlanWalk.shuffleCount(out) == 1)
  }

  test("globalShuffle yields a reproducible bijective (shard, pos) order") {
    val out = Sampling.globalShuffle(docs, "doc_id", seed = 42L, shards = 8)
      .select("doc_id", "shard", "pos").as[(Long, Int, Long)].collect()
    assert(out.length == docs.count())
    // bijection: addresses are unique, and pos is contiguous 0..n-1 per shard
    assert(out.map(r => (r._2, r._3)).distinct.length == out.length)
    out.groupBy(_._2).foreach { case (_, rows) =>
      val ps = rows.map(_._3).sorted
      assert(ps.head == 0L && ps.last == ps.length - 1L)
    }
    // deterministic: identical on a second run
    val again = Sampling.globalShuffle(docs, "doc_id", seed = 42L, shards = 8)
      .select("doc_id", "shard", "pos").as[(Long, Int, Long)].collect()
    assert(out.sortBy(_._1).sameElements(again.sortBy(_._1)))
    // a different seed produces a genuinely different permutation
    val other = Sampling.globalShuffle(docs, "doc_id", seed = 43L, shards = 8)
      .select("doc_id", "shard", "pos").as[(Long, Int, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val moved = out.count(r => other(r._1) != ((r._2, r._3)))
    assert(moved > out.length / 2, s"only $moved rows moved under a new seed")
    // shuffled order is uncorrelated with input order: the first shard
    // positions are not simply ascending doc_ids
    val firstShard = out.filter(_._2 == 0).sortBy(_._3).map(_._1)
    assert(!firstShard.sameElements(firstShard.sorted))
    // exactly ONE exchange (the shard partition), plan-asserted
    assert(PlanWalk.shuffleCount(
      Sampling.globalShuffle(docs, "doc_id", 42L, 8)) == 1)
  }

  test("curriculumOrder: same shards as globalShuffle, score-sorted within") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "n_chars")
    val cur = Sampling.curriculumOrder(docs, "doc_id", "n_chars",
        seed = 42L, shards = 8)
      .select("doc_id", "n_chars", "shard", "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    // shard assignment is EXACTLY globalShuffle's (same seeded hash)
    val shuf = Sampling.globalShuffle(docs, "doc_id", seed = 42L, shards = 8)
      .select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cur.forall { case (id, _, sh, _) => shuf(id) == sh })
    // within every shard, pos follows (n_chars asc, doc_id) exactly
    cur.groupBy(_._3).foreach { case (_, rows) =>
      val byPos = rows.sortBy(_._4)
      assert(byPos.map(_._4).toSeq == byPos.indices.map(_.toLong).toSeq)
      val resorted = rows.sortBy(r => (r._2, r._1))
      assert(byPos.map(_._1).toSeq == resorted.map(_._1).toSeq,
        "within-shard order must be (score, key)")
    }
    // one exchange: the shard partition (globalShuffle's plan contract)
    assert(PlanWalk.shuffleCount(Sampling.curriculumOrder(
      docs, "doc_id", "n_chars", 42L, 8)) == 1)
  }

  test("lengthBucketBatches groups similar lengths, fills batches in order") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "n_chars")
    val out = Sampling.lengthBucketBatches(docs, "doc_id", "n_chars",
        edges = Seq(200L, 400L), batchSize = 4, seed = 7L, shards = 2)
      .select("doc_id", "n_chars", "bucket", "shard", "batch_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getInt(3), r.getLong(4)))
    // bucket boundaries honored
    out.foreach { case (_, len, bucket, _, _) =>
      val want = (if (len >= 200) 1 else 0) + (if (len >= 400) 1 else 0)
      assert(bucket == want)
    }
    // within each (shard, bucket): batches of <= 4, filled in length
    // order — every row of batch i is <= every row of batch i+1
    out.groupBy(r => (r._4, r._3)).foreach { case (_, rows) =>
      rows.groupBy(_._5).foreach { case (_, b) => assert(b.size <= 4) }
      val byBatch = rows.groupBy(_._5).toSeq.sortBy(_._1)
      byBatch.sliding(2).foreach {
        case Seq((_, lo), (_, hi)) =>
          assert(lo.map(_._2).max <= hi.map(_._2).min,
            "batches must partition the length order")
        case _ => ()
      }
      // all batches except possibly the last are FULL
      val sizes = byBatch.map(_._2.size)
      assert(sizes.dropRight(1).forall(_ == 4))
    }
    // deterministic + one exchange (the (shard, bucket) partition)
    assert(PlanWalk.shuffleCount(Sampling.lengthBucketBatches(
      docs, "doc_id", "n_chars", Seq(200L, 400L), 4, 7L, 2)) == 1)
  }

  test("lengthBucketBatches sends NULL lengths to a NULL bucket, not bucket 0") {
    val df = Seq((1L, Some(100L)), (2L, None), (3L, Some(50L)), (4L, None))
      .toDF("doc_id", "n_chars")
    val out = Sampling.lengthBucketBatches(df, "doc_id", "n_chars",
        edges = Seq(200L), batchSize = 2, seed = 7L, shards = 1)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(r.fieldIndex("bucket"))) None
         else Some(r.getInt(r.fieldIndex("bucket"))))).toMap
    assert(out(1L) == Some(0) && out(3L) == Some(0),
      "short non-null lengths belong in bucket 0")
    assert(out(2L) == None && out(4L) == None,
      "NULL lengths must carry a NULL bucket (batched together, not with shorts)")
  }

  test("epochPlan: temperature shares, the epoch cap, and degenerate strata") {
    // A: 100 tokens, B: 400 -> alpha .5 weights 10/20 -> shares 1/3, 2/3
    // budget 600: A target 200 -> 2.0 epochs (capped at 2.0 exactly),
    // B target 400 -> 1.0 epoch; C has no tokens -> share 0, NULL epochs
    val docs = Seq(
      ("A", Seq.fill(100)("w").mkString(" ")),
      ("B", Seq.fill(400)("w").mkString(" ")),
      ("C", "")).toDF("src", "text")
    val out = Sampling.epochPlan(docs, "text", "src",
        budgetTokens = 600L, alpha = 0.5, maxEpochs = 2.0)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("A").getAs[Long]("avail_tokens") == 100L)
    assert(out("A").getAs[Double]("share") == 0.333333)
    assert(out("A").getAs[Double]("epochs") == 2.0)
    assert(out("A").getAs[Double]("planned_tokens") == 200.0)
    assert(out("B").getAs[Double]("share") == 0.666667)
    assert(out("B").getAs[Double]("epochs") == 1.0)
    assert(out("B").getAs[Double]("planned_tokens") == 400.0)
    assert(out("C").getAs[Double]("share") == 0.0)
    assert(out("C").isNullAt(out("C").fieldIndex("epochs")))
    // the cap binds: a huge budget cannot push any stratum past maxEpochs
    val capped = Sampling.epochPlan(docs, "text", "src",
        budgetTokens = 1000000L, alpha = 0.5, maxEpochs = 3.0)
      .collect().flatMap(r => Option(r.getAs[java.lang.Double]("epochs")))
    assert(capped.forall(_ == 3.0))
  }

  test("exactNSample: exactly N, deterministic, TakeOrdered plan (no sort/window)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val s1 = graft.operators.Sampling.exactNSample(docs, "doc_id", 7)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val s2 = graft.operators.Sampling.exactNSample(docs, "doc_id", 7)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(s1.length == 7 && s1 == s2, "exactly N, bit-stable across runs")
    // growth consistency: the 5-sample is a prefix of the 7-sample's order
    val s3 = graft.operators.Sampling.exactNSample(docs, "doc_id", 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s3.subsetOf(s1.toSet), "smaller N must be a subset of larger N")
    // N >= corpus: everything
    val all = graft.operators.Sampling.exactNSample(docs, "doc_id", 1000000)
      .count()
    assert(all == docs.count())
    // NULL keys have no uniform and must not squat sample slots
    val withNulls = docs.select(
      when(col("doc_id") < 3, lit(null)).otherwise(col("doc_id")).as("doc_id"))
    val sampled = graft.operators.Sampling.exactNSample(withNulls, "doc_id", 5)
      .collect()
    assert(sampled.length == 5 && sampled.forall(!_.isNullAt(0)),
      "NULL keys are excluded, not ranked first")
    // scale shape: TakeOrderedAndProject, never a global Sort or Window
    val nodes = PlanWalk.executedNodes(
      graft.operators.Sampling.exactNSample(docs, "doc_id", 7))
    assert(nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.TakeOrderedAndProjectExec]),
      "expected TakeOrderedAndProject")
    assert(!nodes.exists(_.isInstanceOf[org.apache.spark.sql.execution.SortExec]),
      "must not globally sort the corpus")
  }

  test("interleaveByMixture: WFQ prefix proportions, determinism, sharded ranks") {
    val weights = Map("en" -> 4.0, "de" -> 2.0, "fr" -> 1.0)
    val out = graft.operators.Sampling.interleaveByMixture(
      docs, "lang", "doc_id", weights, seed = 42L, shards = 8)
    val rows = out.select("doc_id", "lang", "stratum_rank", "interleave_key")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    // unlisted strata (es, zh) drop
    assert(rows.forall(r => weights.contains(r._2)))
    // stratum_rank is a within-stratum permutation 0..n-1
    for ((lang, g) <- rows.groupBy(_._2))
      assert(g.map(_._3).sorted.toSeq == (0L until g.length).toSeq,
        s"ranks of $lang must be a 0-based permutation")
    // WFQ: in the key-sorted order, each prefix holds strata ~w-proportional
    // (until a stratum is exhausted) — check the first 140 rows: en:de:fr
    // should be near 4:2:1 = 80:40:20
    val order = rows.sortBy(r => (r._4, r._2, r._1)).take(140)
    val mix = order.groupBy(_._2).view.mapValues(_.length).toMap
    assert(math.abs(mix("en") - 80) <= 8 && math.abs(mix("de") - 40) <= 8 &&
      math.abs(mix("fr") - 20) <= 8, s"prefix mix $mix far from 4:2:1")
    // deterministic across runs
    val again = graft.operators.Sampling.interleaveByMixture(
      docs, "lang", "doc_id", weights, seed = 42L, shards = 8)
      .select("doc_id", "interleave_key").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(rows.forall(r => again(r._1) == r._4))
    // scale shape: every window partitions on (stratum, shard) — never
    // on the stratum alone (that would serialize a stratum into one task)
    // on the stratum alone: the corpus-side row_number window (the one
    // computing __r) must carry the shard in its partition spec — the
    // only single-column window allowed is the strata×shards-row
    // offsets frame (partitioned by __st)
    val winSpecs = PlanWalk.executedNodes(out).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec =>
        w.partitionSpec.map(_.toString)
    }
    assert(winSpecs.exists(s => s.length == 2 && s.exists(_.contains("__shard"))),
      s"corpus-side window must partition on (stratum, __shard), got $winSpecs")
    assert(winSpecs.forall(s => s.length == 2 || s.exists(_.contains("__st"))),
      s"no corpus window may partition on the stratum alone, got $winSpecs")
  }

  test("suppressSmallGroups: k floor, NULL quasi values form a real group") {
    import spark.implicits._
    val rows = Seq(
      (1L, Some("a")), (2L, Some("a")), (3L, Some("a")), // group of 3
      (4L, Some("b")), // singleton -> suppressed
      (5L, None), (6L, None), (7L, None) // NULL group of 3 SURVIVES
    ).toDF("id", "q")
    val out = Sampling.suppressSmallGroups(rows, Seq("q"), k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 5L, 6L, 7L),
      "the singleton is suppressed; the NULL group counts as a group")
    assert(out.values.forall(_ == 3L))
  }
}
