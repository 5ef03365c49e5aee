package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/**
 * Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR.
 *
 * Hygiene (VERDICT r1 #8):
 *  - a JVM/codegen warmup query runs UNMEASURED first, so the first
 *    measured query isn't charged session startup;
 *  - failures are recorded as status, never as fake fast timings
 *    ("failed" list + per-query rows; a failed query reports -1 rows);
 *  - the result JSON is printed as one line AND written to
 *    SPARK_GRAFT_BENCH_OUT (default ./BENCH_OUT.json) so the harness can
 *    parse it without scraping sbt-prefixed stdout.
 *
 * Materialization (VERDICT r4 #1): timing `df.count()` lets Catalyst
 * rewrite the plan to a count-aggregate and PRUNE every projected column
 * down to a bare parquet scan — a third of round-4's rows were measuring
 * the scan, not the operator (q_dedup_simhash "0.26s" vs 5.3s real).
 * `force` instead executes the query's own physical plan via
 * queryExecution.toRdd: the plan's output schema is the full row, so
 * whole-stage codegen writes EVERY output column into each UnsafeRow
 * before the row is counted — same work Verify's parquet write does,
 * minus the IO. No extra hashing is layered on top, so the timing is the
 * operator's own cost.
 *
 * Sort stripping (VERDICT r5 #6 / r6 #1): every query wraps its output
 * in a deterministic global `orderBy` so the driver's row-hash oracle
 * compare is stable. That sort is NOT the operator: its
 * RangePartitioning bounds-sampling pass executes the child an EXTRA
 * time, roughly doubling the measured cost of expensive projections.
 * `force` drops the top-level global Sort before timing (Verify keeps
 * it — the oracle needs deterministic order).
 *
 * Isolation flags (VERDICT r6 #1 — single-JVM bench noise):
 *  - SPARK_GRAFT_BENCH_ONLY: comma-separated query names; only those
 *    run (isolated measurement of one query without 53 neighbors'
 *    GC/JIT noise);
 *  - SPARK_GRAFT_BENCH_REPEAT=N: run each query N times, report the
 *    MINIMUM (the standard noise floor estimator on a shared box).
 *    DEFAULTS to 3 (VERDICT r7 #6): single-shot numbers on a 60-query
 *    shared-JVM run carry up to 2x GC/JIT noise (q_dedup_collapse
 *    measured 4.12 s in-bench vs 2.1 s isolated), so the recorded
 *    bench takes the repeat floor unless explicitly overridden.
 *
 * Adaptive extra repeats (round 15 — VERDICT r14 #6): the sub-2 s rows
 * are the documented in-sequence noise class (GC debt from 250
 * neighbors can land inside ALL of a query's base repeats, so even a
 * min-of-3 reads up to 1.6x high and every round pays an isolated
 * re-bench to dismiss false regressions). When a row's base repeats
 * finish under 2 s with a spread wider than 25% of the floor, the
 * floor is suspect: up to 2 EXTRA repeats run (each behind its own
 * System.gc()) and the minimum absorbs them. Stable rows and
 * expensive rows pay nothing; a full 253-query run gains well under
 * two minutes.
 *
 * Inter-query GC (round 9): the repeat floor does NOT shed GC debt —
 * a 66-query run accumulates every query's broadcasts/shuffle state
 * until a multi-second collection lands on whichever query happens to
 * trigger it, and then ALL of that query's repeats sit in the same
 * dirty window (measured: q_sim_ann_lsh 27.3 s in-sequence vs 1.98 s
 * isolated — 14x, far beyond JIT noise; non-deterministic across
 * runs). An UNMEASURED System.gc() between queries collects each
 * query's garbage outside every measured window (and lets Spark's
 * ContextCleaner reap dead broadcasts), so a row prices the operator,
 * not its neighbors' leftovers.
 */
object Bench {
  /** Run df's full physical plan (all output columns materialized,
    * top-level deterministic sort stripped), return row count. */
  private def force(df: org.apache.spark.sql.DataFrame): Long =
    org.apache.spark.sql.GraftColumnBridge.withoutTopLevelSort(df)
      .queryExecution.toRdd.count()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_OUT.json")
    val only: Option[Set[String]] = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val repeat = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEAT", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      // Scale-adaptive AQE coalescing floor (r21, guide §2.2):
      // coalescePartitions.minPartitionSize 64k (default 1m). AQE's
      // byte-based coalescing misprices CPU-dense small-byte stages —
      // an IVF cell join's ~1.5MB of candidate keys coalesced to ONE
      // post-shuffle partition that enumerated millions of pairs on one
      // core (measured: q_sim_ann_ivf 2.92 -> 1.49 s isolated). At
      // production scale post-shuffle partitions are MBs-GBs, far above
      // either floor value, so the setting is inert there; it only
      // stops tiny-SF coalescing from serializing compute-heavy joins.
      // Env-overridable so the driver's low-core runs stay comparable.
      // (A files.minPartitionNum=cores scan floor was ALSO measured and
      // REJECTED: splitting sub-MB parquet into 32 splits re-pays the
      // per-task BPE table setup 32x — chat pack rows +0.5..1.5 s.)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PART_SIZE", "64k"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.operators.CapMetrics.install(spark) // cap firings WARN-log per query

    // warmup: exercise codegen/shuffle machinery once, unmeasured
    try force(SparkEntry.queries("q_pipeline_e2e")(spark, sfDir))
    catch { case _: Throwable => () }

    val rows = scala.collection.mutable.LinkedHashMap[String, Long]()
    val times = scala.collection.mutable.LinkedHashMap[String, Double]()
    val failed = scala.collection.mutable.ListBuffer[String]()
    // a typo'd BENCH_ONLY name must fail loudly, not produce a
    // plausible-looking empty all-green bench
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      if (unknown.nonEmpty) {
        System.err.println(
          s"[bench] unknown SPARK_GRAFT_BENCH_ONLY queries: ${unknown.mkString(",")}")
        spark.stop()
        sys.exit(1)
      }
    }
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    selected.foreach { case (name, fn) =>
      // unmeasured: pay the accumulated GC debt of the PREVIOUS queries
      // here, not inside the next measured window
      System.gc()
      var best = Double.MaxValue
      var worst = 0.0
      var ok = true
      def once(): Unit = {
        val t0 = System.nanoTime()
        try {
          rows(name) = force(fn(spark, sfDir))
          // only a SUCCESSFUL iteration's time may enter the minimum — a
          // fast mid-run failure must not be recorded as the query's
          // best time (the file's "no fake fast timings" contract)
          val sec = (System.nanoTime() - t0) / 1e9
          best = math.min(best, sec)
          worst = math.max(worst, sec)
        } catch {
          case e: Throwable =>
            ok = false
            rows(name) = -1L
            failed += name
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            if (best == Double.MaxValue)
              best = (System.nanoTime() - t0) / 1e9 // no success to report
        }
      }
      for (_ <- 1 to repeat if ok) once()
      // noise-class tightening: a cheap row whose repeats disagree is
      // reading someone else's GC — buy up to 2 clean extra samples
      var extra = 0
      while (ok && extra < 2 && best < 2.0 && worst > 1.25 * best) {
        System.gc()
        once()
        extra += 1
      }
      times(name) = best
    }

    val qs = times.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val rs = rows.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val fl = failed.map(n => s""""$n"""").mkString("[", ",", "]")
    val total = times.values.sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"rows":$rs,"failed":$fl,"sf":"$sfDir"}"""
    Files.writeString(Paths.get(outPath), json + "\n")
    // stop BEFORE the final prints so Spark's shutdown logging cannot
    // land after them; then print the full dump FOLLOWED by a compact
    // summary line. The driver keeps only a ~2000-char stdout tail and
    // parses its last line — the full 300+-query line blew that budget
    // (r19, VERDICT r18 "parsed: null"), so the LAST line is a short
    // summary (total, counts, failures, slowest rows) that always
    // fits; the complete per-query data stays in outPath (committed as
    // BENCH_OUT_r{N}) and in the full line above the summary.
    spark.stop()
    println(json)
    val slowest = times.toSeq.sortBy(-_._2).take(10)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir",""" +
      s""""n_queries":${times.size},"queries_truncated_to":10,""" +
      s""""queries":$slowest,"failed":$fl,"out":"$outPath"}""")
    Console.out.flush()
    if (failed.nonEmpty) sys.exit(1)
  }
}
