package graft

import graft.operators.{CapMetrics, Dedup}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r7 #3: the blocking caps are live in the graded queries but
  * their drop stats were spec-only Observations — a production corpus
  * tripping a cap lost pairs silently. These tests drive a planted hot
  * key through the GRADED query wiring (no Observation anywhere) and
  * assert the engine-level listener reports the firing. */
class CapMetricsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Listener delivery is async on the bus thread: before a NEGATIVE
    * (nothing-fired) assertion, drain until two consecutive quiet polls
    * so a straggler from an earlier query cannot land mid-assert. */
  private def settleDrain(): Unit = {
    var quiet = 0
    while (quiet < 2) {
      if (CapMetrics.drainFired().isEmpty) quiet += 1 else quiet = 0
      if (quiet < 2) Thread.sleep(100L)
    }
  }

  /** Run `body` with broadcast joins disabled: a broadcast-executed
    * blocking side reports no observed metrics (caveat documented on
    * Blocking.idPairs) — at scale the blocking join is a shuffle join,
    * but these tiny planted corpora would broadcast. */
  private def withoutBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("graded ngram query path reports dfCap firings through the engine hook") {
    CapMetrics.install(spark)
    CapMetrics.install(spark) // idempotent: second install must not double-report
    withoutBroadcast {
      // 150 docs sharing the stop-shingle "a b c d e" (df 150 > cap 100),
      // written as a documents table and run through the GRADED wiring.
      // The two identical z-docs give the query a NON-EMPTY final result:
      // an empty final result loses its observed metrics to AQE
      // empty-relation propagation (no-signal caveat on Blocking.idPairs),
      // which would make this test vacuous.
      val dir = java.nio.file.Files.createTempDirectory("graft_capmetrics").toString
      ((0L until 150L).map(i => (i, s"a b c d e u$i v$i w$i x$i y$i")) ++
        Seq((9000L, "z1 z2 z3 z4 z5 z6 z7 z8"), (9001L, "z1 z2 z3 z4 z5 z6 z7 z8")))
        .toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      CapMetrics.drainFired()
      val out = ExtensionQueries.queries("q_dedup_ngram_pairs")(spark, dir)
      out.collect()
      val fired = CapMetrics.awaitFired()
      assert(fired.nonEmpty, "hot stop-shingle did not surface through CapMetrics")
      assert(fired.exists(f => f.metric.startsWith(CapMetrics.Prefix) &&
        f.values.get("dropped_rows").exists(_ > 0L) &&
        f.values.get("max_key_count").exists(_ >= 150L)),
        s"unexpected firings: $fired")
      // the idempotent-install check: exactly one listener recorded it
      // per execution (a double registration would report every firing
      // twice per query)
      val perMetric = CapMetrics.drainFired().groupBy(_.metric).map(_._2.size)
      assert(perMetric.forall(_ == 1), s"duplicate listener reports: $perMetric")
    }
  }

  test("under-cap corpus reports nothing; direct operator calls are covered too") {
    CapMetrics.install(spark)
    withoutBroadcast {
      // 50 docs share the shingle (df 50 <= cap 100): caps engaged, no
      // drop. The identical z-docs keep the final result non-empty, so
      // the zero-drop metrics row actually flows (see first test).
      val calm = ((0L until 50L).map(i => (i, s"a b c d e u$i v$i w$i x$i y$i")) ++
        Seq((9000L, "z1 z2 z3 z4 z5 z6 z7 z8"), (9001L, "z1 z2 z3 z4 z5 z6 z7 z8")))
        .toDF("doc_id", "text")
      settleDrain()
      Dedup.ngramJaccardPairs(calm, "doc_id", "text", n = 5, threshold = 0.5,
        dfCap = 100).collect()
      assert(CapMetrics.awaitFired(1000L).isEmpty,
        "no rows were dropped but a cap firing was reported")
      // same corpus, cap below the hot key's df: the DIRECT operator call
      // (dropStats = None, production default) must report
      Dedup.ngramJaccardPairs(calm, "doc_id", "text", n = 5, threshold = 0.5,
        dfCap = 10).collect()
      val fired = CapMetrics.awaitFired()
      assert(fired.exists(_.values.get("dropped_rows").exists(_ > 0L)),
        s"direct-call cap firing not reported: $fired")
      CapMetrics.drainFired()
    }
  }

  test("explicit Observation still wins over the engine hook (no double metric)") {
    CapMetrics.install(spark)
    withoutBroadcast {
      val hot = ((0L until 30L).map(i => (i, s"a b c d e u$i v$i w$i x$i y$i")) ++
        Seq((9000L, "z1 z2 z3 z4 z5 z6 z7 z8"), (9001L, "z1 z2 z3 z4 z5 z6 z7 z8")))
        .toDF("doc_id", "text")
      settleDrain()
      val obs = new org.apache.spark.sql.Observation("explicit_dropstats")
      Dedup.ngramJaccardPairs(hot, "doc_id", "text", n = 5, threshold = 0.5,
        dfCap = 10, dropStats = Some(obs)).collect()
      val got = org.apache.spark.sql.GraftColumnBridge.observationGetOrEmpty(obs)
      assert(got.get("dropped_rows").exists(_.asInstanceOf[Long] > 0L))
      // the caller's Observation replaces the graft_cap_* node — the
      // engine hook must not see a second copy of these metrics
      assert(CapMetrics.awaitFired(1000L).isEmpty)
    }
  }
}
