package graft

import graft.operators.Diagnostics
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DiagnosticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("keySkewCard ranks hot keys incl. NULL, shares sum the corpus, k cut") {
    val df = (Seq.fill(6)("hot") ++ Seq.fill(3)("warm") ++
      Seq.fill(3)(null.asInstanceOf[String]) ++ Seq("cold"))
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "key")
    val out = Diagnostics.keySkewCard(df, Seq("key"), k = 3)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1),
        r.getDouble(2), r.getLong(3)))
    assert(out.length == 3, "k cut")
    assert(out.map(_._4).toSeq == Seq(1L, 2L, 3L))
    assert(out(0) == ((Some("hot"), 6L, round6(6.0 / 13), 1L)))
    // NULL ties "warm" at 3 rows; NULLS FIRST wins the tie-break
    assert(out(1) == ((None, 3L, round6(3.0 / 13), 2L)))
    assert(out(2) == ((Some("warm"), 3L, round6(3.0 / 13), 3L)))
    // the global rank must trim map-side: LimitPushDownThroughWindow
    // rewrites the empty-partition row_number <= k into
    // TakeOrderedAndProject (per-task k-row heap — even better than
    // WindowGroupLimit); accept either trim
    val nodes = PlanWalk.executedNodes(Diagnostics.keySkewCard(df, Seq("key"), 3))
    assert(nodes.exists(n =>
      n.isInstanceOf[org.apache.spark.sql.execution.TakeOrderedAndProjectExec] ||
        n.isInstanceOf[org.apache.spark.sql.execution.window.WindowGroupLimitExec]),
      "expected a map-side top-k trim for the hot-key rank")
  }

  private def round6(x: Double): Double = math.rint(x * 1e6) / 1e6

  test("planCard counts shuffles, joins and generates on known shapes") {
    import spark.implicits._
    val a = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    val b = Seq((1L, 10), (2L, 20)).toDF("id", "w")
    // zero-shuffle projection
    val proj = graft.operators.Diagnostics.planCard(a.select(upper(col("v"))))
      .collect()(0)
    assert(proj.getAs[Long]("n_shuffle_exchanges") == 0 &&
      proj.getAs[Long]("n_sortmerge_joins") == 0)
    // broadcast join: one broadcast exchange + join, no sort-merge
    val bj = graft.operators.Diagnostics.planCard(
      a.join(broadcast(b), "id")).collect()(0)
    assert(bj.getAs[Long]("n_broadcast_joins") == 1 &&
      bj.getAs[Long]("n_sortmerge_joins") == 0)
    // groupBy: exactly one shuffle
    val gb = graft.operators.Diagnostics.planCard(
      a.groupBy("v").count()).collect()(0)
    assert(gb.getAs[Long]("n_shuffle_exchanges") == 1)
    // explode: one generate
    val ex = graft.operators.Diagnostics.planCard(
      a.select(explode(split(col("v"), "")))).collect()(0)
    assert(ex.getAs[Long]("n_generates") == 1)
  }
}
