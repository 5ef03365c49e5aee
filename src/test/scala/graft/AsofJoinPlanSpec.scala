package graft

import graft.operators.Temporal
import graft.plans.{AsofJoinExec, GraftExtensions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsofJoinPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def sides() = {
    val e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = e.filter(col("event_type") === "view")
      .groupBy("user_id", "ts")
      .agg(expr("max_by(value, event_id)").as("v"))
    (clicks, views)
  }

  /** Run `body` with spark.sql.autoBroadcastJoinThreshold set. */
  private def withThreshold[T](v: String)(body: => T): T = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, v)
    try body finally spark.conf.set(key, old)
  }

  test("custom-node as-of equals the window encoding on real events (both paths, directions, tolerances)") {
    val (clicks, views) = sides()
    for (tol <- Seq(None, Some(86400.0)); dir <- Seq("backward", "forward")) {
      val want = Temporal.asofJoin(clicks, views, "user_id", "ts", Seq("v"),
        direction = dir, toleranceSeconds = tol).collect()
        .map(r => r.getLong(0) -> ((Option(r.getTimestamp(3)), Option(r.get(4)))))
        .toMap
      for (threshold <- Seq("-1", "10485760")) withThreshold(threshold) {
        val got = GraftExtensions.asofJoinExec(clicks, views, "user_id", "ts",
          Seq("v"), toleranceSeconds = tol, direction = dir).collect()
          .map(r => r.getLong(0) -> ((Option(r.getTimestamp(3)), Option(r.get(4)))))
          .toMap
        assert(got == want,
          s"custom-node as-of must match the window plan (dir=$dir, tol=$tol, thr=$threshold)")
      }
    }
  }

  test("plan shape: merge exec when broadcast is off — co-partitioning exchanges") {
    withThreshold("-1") {
      // plain (non-pre-aggregated) sides show the canonical shape: one
      // hash exchange per side, exactly like a sort-merge join
      val trades = Seq((1L, ts("2024-01-01 10:00:04"), 1L))
        .toDF("k", "ts", "id")
      val quotes = Seq((1L, ts("2024-01-01 10:00:00"), 5.0))
        .toDF("k", "ts", "v")
      val df = GraftExtensions.asofJoinExec(trades, quotes, "k", "ts", Seq("v"),
        skewShare = None) // tiny single-key fixture: pin the exec path
      df.collect()
      val nodes = PlanWalk.nodes(df)
      assert(nodes.exists(_.isInstanceOf[AsofJoinExec]),
        "the strategy must plan the custom physical node")
      assert(PlanWalk.shuffleCount(df) == 2,
        "one hash exchange per side, like a sort-merge join")
      assert(!nodes.exists(_.nodeName.toLowerCase.contains("window")),
        "the custom plan replaces the window encoding entirely")
    }
  }

  test("cost-based pick: small right side plans AsofBroadcastExec, fact side unshuffled") {
    val trades = Seq((1L, ts("2024-01-01 10:00:04"), 1L),
      (1L, ts("2024-01-01 09:00:00"), 2L)).toDF("k", "ts", "id")
    val quotes = Seq((1L, ts("2024-01-01 10:00:00"), 5.0),
      (1L, ts("2024-01-01 10:00:00"), 6.0), // dup ts: latest arrival wins
      (2L, ts("2024-01-01 10:00:00"), 7.0)).toDF("k", "ts", "v")
    val df = GraftExtensions.asofJoinExec(trades, quotes, "k", "ts", Seq("v"),
      skewShare = None) // tiny single-key fixture: pin the exec path
    val rows = df.collect().map(r => r.getLong(2) -> Option(r.get(4))).toMap
    val nodes = PlanWalk.nodes(df)
    assert(nodes.exists(_.isInstanceOf[graft.plans.AsofBroadcastExec]),
      "a 3-row right side sits under the default 10MB threshold")
    assert(PlanWalk.shuffleCount(df) == 0,
      "neither side shuffles on the broadcast path")
    assert(rows(1L) == Some(6.0), "binary search picks the latest duplicate")
    assert(rows(2L) == None)
  }

  test("NULL contract and tie behavior match the window operator") {
    val left = Seq(
      (Option(1L), Option(ts("2024-01-01 10:00:06")), 1L),
      (Option.empty[Long], Option(ts("2024-01-01 10:00:06")), 2L),
      (Option(1L), Option.empty[java.sql.Timestamp], 3L),
      (Option(7L), Option(ts("2024-01-01 10:00:06")), 4L) // key never on right
    ).toDF("k", "ts", "id")
    val right = Seq(
      (Option(1L), Option(ts("2024-01-01 10:00:00")), 1.0),
      (Option(1L), Option(ts("2024-01-01 10:00:00")), 2.0), // dup ts: last wins
      (Option.empty[Long], Option(ts("2024-01-01 10:00:00")), 9.0),
      (Option(1L), Option.empty[java.sql.Timestamp], 9.0)
    ).toDF("k", "ts", "v")
    val out = GraftExtensions.asofJoinExec(left, right, "k", "ts", Seq("v"),
      skewShare = None) // tiny few-key fixture: pin the exec path
      .collect().map(r => r.getLong(2) -> Option(r.get(4))).toMap
    assert(out(1L) == Some(2.0), "latest duplicate-(key,ts) right row wins")
    assert(out(2L) == None, "NULL left key never matches")
    assert(out(3L) == None, "NULL left ts never matches")
    assert(out(4L) == None, "unseen key is left-outer NULL")
  }

  test("SQL metrics: output/matched counts on both physical paths") {
    val trades = Seq((1L, ts("2024-01-01 10:00:04"), 1L),
      (2L, ts("2024-01-01 10:00:04"), 2L)).toDF("k", "ts", "id")
    val quotes = Seq((1L, ts("2024-01-01 10:00:00"), 5.0)).toDF("k", "ts", "v")
    for (threshold <- Seq("-1", "10485760")) withThreshold(threshold) {
      val df = GraftExtensions.asofJoinExec(trades, quotes, "k", "ts", Seq("v"),
        skewShare = None) // tiny two-key fixture: pin the exec path
      df.collect()
      val node = PlanWalk.nodes(df).collectFirst {
        case n: AsofJoinExec => n.metrics
        case n: graft.plans.AsofBroadcastExec => n.metrics
      }.get
      assert(node("numOutputRows").value == 2L,
        s"both trades emit (thr=$threshold)")
      assert(node("numMatched").value == 1L,
        s"only key 1 matches (thr=$threshold)")
    }
  }

  test("AsofFilterPushdown: left-only predicates sink below the node to the scan") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    val (clicks, views) = sides()
    val df = GraftExtensions.asofJoinExec(clicks, views, "user_id", "ts",
      Seq("v"))
      .filter(col("user_id") < lit(10L) && col("v").isNotNull)
    val opt = df.queryExecution.optimizedPlan
    // whatever Filter remains above the custom node must reference the
    // produced columns only — the left-side conjunct moved below
    opt.collect {
      case f: LFilter
        if f.find(_.isInstanceOf[graft.plans.AsofJoinNode]).isDefined =>
        assert(!f.condition.references.exists(_.name == "user_id"),
          s"left-only predicate must not remain above the node: ${f.condition}")
    }
    val node = opt.collectFirst { case n: graft.plans.AsofJoinNode => n }.get
    assert(node.left.find {
      case f: LFilter => f.condition.references.exists(_.name == "user_id")
      case _ => false
    }.isDefined, "the pushed predicate must sit inside the LEFT child")
    // the pushed predicate reaches the parquet scan as a data filter
    df.collect()
    val scans = PlanWalk.nodes(df).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.exists(_.metadata.getOrElse("PushedFilters", "")
      .contains("LessThan(user_id,10)")),
      "filter must ride the left parquet scan")
    // and semantics are unchanged vs filtering the materialized output
    val want = GraftExtensions.asofJoinExec(clicks, views, "user_id", "ts",
      Seq("v")).collect()
      .filter(r => r.getLong(1) < 10L && !r.isNullAt(4)).map(_.getLong(0)).toSet
    assert(df.collect().map(_.getLong(0)).toSet == want)
  }

  test("AsofColumnPruning: unused left columns fall out of the scan's ReadSchema") {
    // feed the FULL events schema (6 columns) into the node, then
    // select only two outputs — the unused left columns must never
    // reach the exchange or the scan
    val e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
    val full = e.filter(col("event_type") === "click") // keeps all 6 cols
    val views = e.filter(col("event_type") === "view")
      .groupBy("user_id", "ts")
      .agg(expr("max_by(value, event_id)").as("v"))
    val df = withThreshold("-1") {
      val out = GraftExtensions.asofJoinExec(full, views, "user_id", "ts",
        Seq("v")).select(col("event_id"), col("v"))
      out.collect()
      out
    }
    val node = df.queryExecution.optimizedPlan
      .collectFirst { case n: graft.plans.AsofJoinNode => n }.get
    val leftCols = node.left.output.map(_.name).toSet
    assert(leftCols == Set("event_id", "user_id", "ts"),
      s"only the selected + key/ts columns survive below the node, got $leftCols")
    val scans = PlanWalk.nodes(df).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.requiredSchema.fieldNames.toSet
    }
    assert(scans.exists(f => f.contains("event_id") && !f.contains("props") &&
      !f.contains("value")),
      s"the left parquet scan must not read pruned columns, got $scans")
    // semantics unchanged
    assert(df.count() == full.count())
  }

  test("SparkSessionExtensions registration injects the planner strategy") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions()(ext)
    val strategies = org.apache.spark.sql.GraftColumnBridge
      .plannerStrategies(ext, spark)
    assert(strategies.exists(_.isInstanceOf[graft.plans.AsofJoinStrategy]),
      "spark.sql.extensions=graft.plans.GraftExtensions must register the strategy")
  }

  test("ensure() is idempotent on the experimental hook") {
    GraftExtensions.ensure(spark)
    GraftExtensions.ensure(spark)
    assert(spark.experimental.extraStrategies
      .count(_.isInstanceOf[graft.plans.AsofJoinStrategy]) == 1)
  }

  /** One monster key holding 60% of both sides — the input AQE cannot
    * repair for the custom node (its skew-join splitting rewrites only
    * join operators it knows). */
  private def monsterSides() = {
    val n = 2000
    val left = spark.range(n).select(
      when(col("id") % 5 < 3, lit(7L)).otherwise(col("id") % 53).as("k"),
      timestamp_millis(lit(1700000000000L) + col("id") * 1000).as("ts"),
      col("id").as("lid"))
    val right = spark.range(n / 2).select(
      when(col("id") % 5 < 3, lit(7L)).otherwise(col("id") % 53).as("k"),
      timestamp_millis(lit(1700000000000L) + col("id") * 1713).as("ts"),
      (col("id") * 2).as("v"))
      .groupBy("k", "ts").agg(expr("max_by(v, v)").as("v"))
    (left, right)
  }

  test("heavyKeyExists: exact probe, NULL keys counted, empty input safe") {
    val skewed = Seq((Some(1L), 1), (Some(1L), 2), (Some(1L), 3), (Some(2L), 4))
      .toDF("k", "x")
    assert(GraftExtensions.heavyKeyExists(skewed, "k", 0.75))
    assert(!GraftExtensions.heavyKeyExists(skewed, "k", 0.8))
    val nulls = Seq((Option.empty[Long], 1), (Option.empty[Long], 2),
      (Some(3L), 3)).toDF("k", "x")
    assert(GraftExtensions.heavyKeyExists(nulls, "k", 0.5),
      "a monster NULL key serializes the window exactly like any other")
    assert(!GraftExtensions.heavyKeyExists(
      Seq.empty[(Long, Int)].toDF("k", "x"), "k", 0.1))
  }

  test("heavyKeyExistsSampled: identical routing to exact on planted and uniform frames") {
    // planted 60%-share monster key, large enough that the 2% sample
    // clears the minSample floor — sampled and exact must agree, and
    // the estimate sits ~25 standard errors from the 0.25 threshold
    val monster = spark.range(120000).select(
      when(col("id") % 5 < 3, lit(7L)).otherwise(col("id") % 997).as("k"))
    assert(GraftExtensions.heavyKeyExists(monster, "k", 0.25))
    assert(GraftExtensions.heavyKeyExistsSampled(monster, "k", 0.25),
      "sampled probe must route the 60% key exactly like the exact probe")
    val uniform = spark.range(120000).select((col("id") % 997).as("k"))
    assert(!GraftExtensions.heavyKeyExists(uniform, "k", 0.25))
    assert(!GraftExtensions.heavyKeyExistsSampled(uniform, "k", 0.25),
      "sampled probe must keep uniform keys on the plain plan")
    // an empty sample = the frame is far too small for any key to
    // serialize a task — the probe answers false (plain plan) in one
    // job; routing is a wall-clock choice, so this cannot be wrong
    val tiny = Seq((1L, 1), (1L, 2), (1L, 3), (2L, 4)).toDF("k", "x")
    assert(!GraftExtensions.heavyKeyExistsSampled(tiny, "k", 0.75),
      "a 4-row frame never routes to the bucketed plan")
    // a small-but-sampled monster frame still decides correctly in one
    // job: the 3σ band is miles below a 60% estimate at share=0.25
    val smallMonster = spark.range(3000).select(
      when(col("id") % 5 < 3, lit(7L)).otherwise(col("id") % 97).as("k"))
    assert(GraftExtensions.heavyKeyExistsSampled(smallMonster, "k", 0.25))
    // the memoized front door probes once per (plan, key, thresholds):
    // the second call answers from the cache without launching a job
    val before = GraftExtensions.probeCacheSize
    assert(GraftExtensions.heavyKeyProbeCached(smallMonster, "k", 0.25))
    assert(GraftExtensions.probeCacheSize == before + 1)
    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
        j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      assert(GraftExtensions.heavyKeyProbeCached(smallMonster, "k", 0.25))
      Thread.sleep(300)
      assert(jobs == 0, s"cached probe must not launch a job, saw $jobs")
    } finally spark.sparkContext.removeSparkListener(listener)
    // near-threshold band: a 25%-share key probed at share=0.25 lands
    // inside ±margin and must fall back to the exact answer
    val edge = spark.range(100000).select(
      when(col("id") % 4 === 0, lit(7L)).otherwise(col("id") % 997).as("k"))
    assert(GraftExtensions.heavyKeyExistsSampled(edge, "k", 0.25) ==
      GraftExtensions.heavyKeyExists(edge, "k", 0.25),
      "inside the margin band the sampled probe defers to exact")
  }

  test("distinctKeysAtLeastSampled: cardinality routing from a BOUNDED probe input (r19, VERDICT r18 #2)") {
    val uniform = spark.range(40000).select((col("id") % 20000).as("k"))
    // 20k distinct: clears a 100-key threshold, not a 1M-key one
    assert(GraftExtensions.distinctKeysAtLeastSampled(uniform, "k", 100L),
      "20k distinct keys must clear a 100-key threshold")
    assert(!GraftExtensions.distinctKeysAtLeastSampled(uniform, "k", 1000000L),
      "20k distinct keys must not clear a 1M-key threshold")
    // THE input bound: the probe aggregates the deterministic ~2%
    // hash sample, never the frame — pin the sample's size directly
    val probed = GraftExtensions.distinctProbeFrame(uniform, "k", 0.02).count()
    assert(probed > 0 && probed < 40000 / 10,
      s"the probe must sketch a bounded (~2%) sample, saw $probed of 40000 rows")
    // an empty/tiny sample = the frame is tiny: plain plan, one job
    val tiny = spark.range(5).select(col("id").as("k"))
    assert(!GraftExtensions.distinctKeysAtLeastSampled(tiny, "k", 1000000L),
      "a 5-row frame never routes to the sharded plan")
    // repeat-heavy frames err toward the sharded plan, never the
    // single-task one: distinct-in-sample approaches D itself, so the
    // decision boundary (threshold x fraction) can only over-route
    val repeats = spark.range(200000).select((col("id") % 5000).as("k"))
    assert(GraftExtensions.distinctKeysAtLeastSampled(repeats, "k", 5000L),
      "a frame AT the threshold must take the safe (sharded) side")
    // the memoized front door answers from the cache on the second call
    val before = GraftExtensions.probeCacheSize
    assert(GraftExtensions.distinctKeysProbeCached(uniform, "k", 100L))
    assert(GraftExtensions.probeCacheSize == before + 1)
    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
        j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      assert(GraftExtensions.distinctKeysProbeCached(uniform, "k", 100L))
      Thread.sleep(300)
      assert(jobs == 0, s"cached probe must not launch a job, saw $jobs")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("asofJoinExec: the ts-type gate fires before routing (distribution-independent)") {
    // a monster key would previously ROUTE to asofJoinSkewed, which
    // casts ts — so a string-ts call could succeed or throw depending
    // on the key distribution; the schema gate now throws either way
    val strTs = spark.range(3000).select(
      when(col("id") % 5 < 3, lit(7L)).otherwise(col("id") % 97).as("k"),
      concat(lit("2024-01-0"), (col("id") % 9 + 1)).as("ts"),
      col("id").as("lid"))
    val right = spark.range(100).select((col("id") % 97).as("k"),
      concat(lit("2024-01-0"), (col("id") % 9 + 1)).as("ts"),
      col("id").as("v"))
    val e1 = intercept[IllegalArgumentException] {
      GraftExtensions.asofJoinExec(strTs, right, "k", "ts", Seq("v"))
    }
    assert(e1.getMessage.contains("TIMESTAMP"))
    val e2 = intercept[IllegalArgumentException] {
      GraftExtensions.asofJoinExec(strTs, right, "k", "ts", Seq("v"),
        skewShare = None)
    }
    assert(e2.getMessage.contains("TIMESTAMP"),
      "same error with routing pinned off — behavior is distribution-independent")
  }

  test("skew routing: a monster key leaves the custom exec for the bucketed path") {
    val (left, right) = monsterSides()
    val routed = GraftExtensions.asofJoinExec(left, right, "k", "ts", Seq("v"))
    routed.collect()
    assert(!PlanWalk.nodes(routed).exists(n =>
      n.isInstanceOf[AsofJoinExec] ||
        n.isInstanceOf[graft.plans.AsofBroadcastExec]),
      "a 60% key must route to asofJoinSkewed")
    // pinned exec and routed plan agree row-for-row
    val want = GraftExtensions.asofJoinExec(left, right, "k", "ts", Seq("v"),
      skewShare = None)
      .collect().map(r => r.getLong(2) ->
        ((Option(r.getTimestamp(3)), Option(r.get(4))))).toMap
    val got = routed.collect().map(r => r.getLong(2) ->
      ((Option(r.getTimestamp(3)), Option(r.get(4))))).toMap
    assert(got == want)
    // a non-skewed input (events user_ids) stays on the custom exec
    val (clicks, views) = sides()
    val kept = withThreshold("-1") {
      val df = GraftExtensions.asofJoinExec(clicks, views, "user_id", "ts",
        Seq("v"))
      df.collect(); df
    }
    assert(PlanWalk.nodes(kept).exists(_.isInstanceOf[AsofJoinExec]),
      "the probe must keep well-distributed inputs on the custom exec")
  }

  test("AQE blindness: skew-join splitting never touches the exchanges feeding AsofJoinExec") {
    // even with AQE's skew handling forced to its most aggressive
    // settings, the custom node's exchanges are not split — AQE only
    // rewrites SortMergeJoin/ShuffledHashJoin it recognizes. This is
    // WHY asofJoinExec carries its own heavy-key probe.
    val (left, right) = monsterSides()
    val keys = Seq("spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val olds = keys.map(k => k -> spark.conf.getOption(k))
    Seq("true", "true", "1", "1b", "1b").zip(keys).foreach {
      case (v, k) => spark.conf.set(k, v)
    }
    try {
      val df = withThreshold("-1") {
        val d = GraftExtensions.asofJoinExec(left, right, "k", "ts", Seq("v"),
          skewShare = None)
        d.collect(); d
      }
      val nodes = PlanWalk.nodes(df)
      val exec = nodes.collectFirst { case n: AsofJoinExec => n }
      assert(exec.isDefined, "custom exec planned (skewShare pinned off)")
      val skewSplit = nodes.collect {
        case r: org.apache.spark.sql.execution.adaptive.AQEShuffleReadExec
          if r.hasSkewedPartition => r
      }
      assert(skewSplit.isEmpty,
        "AQE must NOT have split any partition feeding the custom node — " +
          "if this ever starts passing differently, the probe can retire")
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
