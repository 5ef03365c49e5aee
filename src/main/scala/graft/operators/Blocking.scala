package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared candidate-pair machinery for every blocked (LSH/inverted-index/
  * IVF) operator in this package. */
private[operators] object Blocking {

  /** a<b candidate id pairs from a blocking frame (`__id` + block-key
    * cols), as an ALIASED self-join: both join children are the identical
    * subplan, so Spark's ReuseExchange can materialize the blocking
    * exchange once instead of recomputing the upstream (shingling,
    * hashing, bucketing) per side. Pairs are deduped on ids only — the
    * cheapest possible shuffle rows. */
  def idPairs(blocks: DataFrame, keys: Seq[String],
              aOut: String, bOut: String): DataFrame = {
    val cond = keys.map(k => col(s"x.$k") === col(s"y.$k")).reduce(_ && _) &&
      col("x.__id") < col("y.__id")
    blocks.alias("x").join(blocks.alias("y"), cond)
      .select(col("x.__id").as(aOut), col("y.__id").as(bOut)).distinct()
  }
}
