package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/**
 * Pre-flight data diagnostics — the questions an engineer asks BEFORE
 * launching a corpus-scale job, answered as cheap cards.
 */
object Diagnostics {

  /**
   * Join/groupBy skew pre-flight: the top-k hottest key groups with
   * their row share — "will this shuffle key melt one executor". A key
   * holding >1% of a 100 TB corpus means one task gets >1 TB; this
   * card is how you decide between a plain join, a broadcast, salting,
   * or the [[Blocking]]-style caps BEFORE paying for the failed run.
   * NULL keys rank like any other group (an all-NULL join key is the
   * most common real-world skew bomb).
   *
   * 100 TB design: one partially-aggregated groupBy on the key (the
   * same shuffle the real job would do, but collapsed map-side to
   * distinct-key volume), a 1-row total frame broadcast back, and the
   * top-k rank trims map-side via WindowGroupLimit. Output:
   * (keyCols..., n_rows, share, rank), rank 1..k by (count desc,
   * keys asc).
   */
  def keySkewCard(df: DataFrame, keyCols: Seq[String], k: Int = 20): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(k >= 1, "k must be >= 1")
    val keys = keyCols.map(col)
    val counts = df.groupBy(keys: _*).agg(count(lit(1)).as("n_rows"))
    val total = counts.agg(sum(col("n_rows")).as("__total"))
    val w = Window.orderBy(col("n_rows").desc +:
      keyCols.map(c => col(c).asc_nulls_first): _*)
    counts.crossJoin(broadcast(total))
      .withColumn("share",
        round(col("n_rows").cast(DoubleType) / col("__total"), 6))
      // filter BEFORE the Long cast: InferWindowGroupLimit matches the
      // raw rank filter, and the map-side trim is the whole point here
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumn("rank", col("rank").cast(LongType))
      .select(keys ++ Seq(col("n_rows"), col("share"), col("rank")): _*)
  }

  /**
   * Plan-shape card: the scale-discipline audit every graded operator
   * in this repo gets in its spec ("how many exchanges, did the join
   * broadcast, is the scan pruned"), operationalized for ANY query —
   * run it on a pipeline before launching it at corpus scale and read
   * the shuffle/scan/codegen shape off one row.
   *
   * Counted on the OPTIMIZED physical plan (Catalyst's final answer,
   * not the naive translation). This inspects the plan only — nothing
   * executes; AQE runtime re-planning (skew splits, dynamic broadcast
   * promotion) can further improve the executed shape but never adds
   * exchanges beyond what is counted here.
   *
   * Output: one row — (n_shuffle_exchanges, n_broadcast_exchanges,
   * n_broadcast_joins, n_sortmerge_joins, n_scans, n_generates,
   * n_wholestage_spans, n_sorts, n_window_group_limits,
   * n_partial_window_group_limits). The last pair pins the map-side
   * rank trim the hottest dedup operators depend on: a rank filter
   * directly over its window (rn === 1 / rn <= k) makes
   * InferWindowGroupLimit insert a PARTIAL WindowGroupLimitExec below
   * the shuffle, so a monster duplicate family costs tasks×k shuffled
   * rows instead of landing whole in one WindowExec buffer —
   * DedupPlanSpec asserts it on exactDedup/capDuplicates so a Spark
   * upgrade or filter-shape drift can't silently remove the trim.
   */
  def planCard(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.execution._
    val plan = df.queryExecution.executedPlan
    def all(p: SparkPlan): Seq[SparkPlan] = {
      val subqueries = p.expressions.flatMap(_.collect {
        case sq: org.apache.spark.sql.catalyst.expressions.PlanExpression[_] =>
          sq.plan match { case s: SparkPlan => all(s); case _ => Nil }
      }.flatten)
      // AQE wraps the real tree: descend through the adaptive root and
      // materialized stages; a ReusedExchange points at an
      // already-counted stage (descending would double-count it)
      val deeper = p match {
        case a: adaptive.AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: adaptive.QueryStageExec => Seq(q.plan)
        case _: exchange.ReusedExchangeExec => Seq.empty
        case other => other.children
      }
      p +: (deeper.flatMap(all) ++ subqueries)
    }
    val nodes = all(plan)
    def n(pred: SparkPlan => Boolean): Long = nodes.count(pred).toLong
    val spark = df.sparkSession
    import spark.implicits._
    Seq((
      n(_.isInstanceOf[exchange.ShuffleExchangeLike]),
      n(_.isInstanceOf[exchange.BroadcastExchangeLike]),
      n(p => p.isInstanceOf[joins.BroadcastHashJoinExec] ||
        p.isInstanceOf[joins.BroadcastNestedLoopJoinExec]),
      n(_.isInstanceOf[joins.SortMergeJoinExec]),
      n(p => p.isInstanceOf[FileSourceScanExec] ||
        p.nodeName.contains("Scan")),
      n(_.isInstanceOf[GenerateExec]),
      n(_.isInstanceOf[WholeStageCodegenExec]),
      n(_.isInstanceOf[SortExec]),
      n(_.isInstanceOf[window.WindowGroupLimitExec]),
      n(p => p match {
        case w: window.WindowGroupLimitExec =>
          w.mode == window.Partial
        case _ => false
      })))
      .toDF("n_shuffle_exchanges", "n_broadcast_exchanges",
        "n_broadcast_joins", "n_sortmerge_joins", "n_scans", "n_generates",
        "n_wholestage_spans", "n_sorts", "n_window_group_limits",
        "n_partial_window_group_limits")
  }
}
