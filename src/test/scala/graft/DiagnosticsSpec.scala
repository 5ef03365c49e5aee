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
}
