package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/**
 * Measurement tooling (optimization rounds, guide §1.2/§7.2): dump
 * `.explain("formatted")` for a set of declared queries to files, so
 * plan-shape claims (Exchange count, join strategy, PushedFilters) are
 * committable evidence (`plans/r{N}/<query>_{before,after}.txt`).
 *
 * Usage: runMain graft.PlanDump <outDir> <suffix> <q1,q2,...>
 * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
 *      SPARK_GRAFT_CPUS (default 32).
 *
 * The dumped plan is the BENCH-timed plan: the top-level deterministic
 * orderBy is stripped exactly as graft.Bench's `force` does, so the
 * plan files describe what the bench measures.
 */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <q1,q2,...>")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val timed = org.apache.spark.sql.GraftColumnBridge.withoutTopLevelSort(df)
      val plan = timed.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), plan)
      println(s"[plandump] wrote ${name}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
