package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SURVEY §7.4 LLM-pipeline operators (dedup, similarity, text analysis,
  * multimodal). Filled in incrementally; see graft.operators.*. */
object ExtensionQueries {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracleSql: Map[String, String] = Map()
}
