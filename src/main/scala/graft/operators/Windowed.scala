package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Batch window-function operators over event streams: sessionization and
 * time bucketing. The streaming flavors live in
 * [[graft.streaming.StreamingOps]]; these run over bounded history
 * (backfills, feature extraction over event logs).
 *
 * 100 TB design: both operators shuffle exactly once, on the partition
 * key (`userCol` / bucket). Sessionization is the classic two-window
 * lag + running-sum plan — state per row is one boolean + one running
 * int, no per-group materialization; Spark's window execution sorts
 * within partitions only.
 */
object Windowed {

  /**
   * Gap-based sessionization: rows belong to the same session while
   * consecutive events of a user are within `gapSeconds`. Returns one
   * row per session: (userCol, session_start, session_end, n_events).
   */
  def sessionizeBatch(events: DataFrame, userCol: String, tsCol: String,
                      gapSeconds: Long, tieBreakCol: Option[String] = None): DataFrame = {
    val order = col(tsCol) +: tieBreakCol.map(col).toSeq
    val byUser = Window.partitionBy(col(userCol)).orderBy(order: _*)
    val prev = lag(col(tsCol), 1).over(byUser)
    val newSession = when(
      prev.isNull ||
        col(tsCol).cast("double") - prev.cast("double") > gapSeconds, 1).otherwise(0)
    events
      .withColumn("__new", newSession)
      .withColumn("__sid", sum(col("__new")).over(byUser))
      .groupBy(col(userCol), col("__sid"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
      .drop("__sid")
  }

  /** Tumbling time-bucket aggregation: count + sum per (bucket, key).
    * `bucket` uses date_trunc so the bucketing is SQL-portable. */
  def timeBucketAgg(events: DataFrame, tsCol: String, keyCol: String,
                    valueCol: String, unit: String): DataFrame =
    events
      .groupBy(date_trunc(unit, col(tsCol)).as("bucket"), col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 2).as("sum_value"))
}
