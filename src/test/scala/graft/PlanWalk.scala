package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}

/** The one AQE-aware executed-plan traversal shared by every spec's
  * plan-shape assertion (VERDICT r6 #5: walk the tree, never
  * string-match the rendering). Descends into materialized query
  * stages; a ReusedExchange is a POINTER to an already-counted stage,
  * so it is reported but not descended into (descending would
  * double-count the reused subtree's scans/expressions). A plan with
  * no exchange at all never gets an adaptive root — handled. */
object PlanWalk {

  /** The AQE-aware subtree of one plan node (the node itself first). */
  def subtree(p: SparkPlan): Seq[SparkPlan] = {
    val deeper = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case _: ReusedExchangeExec => Seq.empty
      case other => other.children
    }
    p +: deeper.flatMap(subtree)
  }

  /** All nodes of the finalized plan, adaptive or not. Call after the
    * query has executed so AQE stages are final. */
  def nodes(df: DataFrame): Seq[SparkPlan] =
    subtree(df.queryExecution.executedPlan)

  /** Root-to-target node path through the finalized (AQE-aware) tree,
    * or None if `target` is not reachable (reference equality). */
  def pathTo(root: SparkPlan, target: SparkPlan): Option[List[SparkPlan]] = {
    if (root eq target) Some(List(root))
    else {
      val children = root match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _: ReusedExchangeExec => Seq.empty
        case other => other.children
      }
      children.iterator.flatMap(c => pathTo(c, target)).nextOption()
        .map(root :: _)
    }
  }

  /** Execute the frame, then return its final plan's nodes. */
  def executedNodes(df: DataFrame): Seq[SparkPlan] = {
    df.queryExecution.toRdd.count()
    nodes(df)
  }

  def shuffleCount(df: DataFrame): Int =
    executedNodes(df).count(_.isInstanceOf[ShuffleExchangeLike])
}
