package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Deterministic sampling for corpus balancing — the operators a
 * training-data pipeline runs between cleaning and packing: uniform
 * downsampling, per-stratum quotas, and mixture reweighting (e.g. "cap
 * web text at 30%, keep all books"). Everything here is HASH-derived,
 * not RNG-derived: `rand()` changes per run/partitioning and cannot be
 * reproduced by an external oracle, while a uniform computed from
 * md5(key) is stable across runs, engines (the DuckDB oracle computes
 * the identical value), partitionings, and re-executions — a sampled
 * corpus can be re-materialized bit-identically months later from the
 * same inputs.
 *
 * 100 TB design: the fraction-based samplers are pure FILTERS — zero
 * shuffle, zero driver state, riding the scan projection; only the
 * exact-quota sampler shuffles (one window keyed on the strata), and
 * its rank filter engages Spark's WindowGroupLimit pushdown so each
 * map task pre-trims to k rows per stratum before the exchange
 * (plan-asserted in SamplingSpec).
 */
object Sampling {

  /** Uniform double in [0, 1) derived from md5 of the key column —
    * the first 8 hex chars as an integer over 2^32. ~4e9 distinct
    * values: ample resolution for sampling fractions, reproducible
    * everywhere md5 exists. */
  def hashUniform(key: Column): Column =
    conv(substring(md5(key.cast(StringType)), 1, 8), 16, 10)
      .cast(DoubleType) / lit(4294967296.0)

  /** Keep ~`fraction` of rows, deterministically by key: a row survives
    * iff hashUniform(key) < fraction. Zero shuffle, zero state. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction not in [0,1]")
    df.filter(hashUniform(col(keyCol)) < lit(fraction))
  }

  /**
   * Mixture reweighting: keep a per-stratum fraction of rows (strata
   * value -> fraction, `default` for unlisted strata). The balancing
   * operator for language/source mixes — still a pure zero-shuffle
   * filter: the fraction lookup is a plan-literal CASE over the stratum
   * column, the survival test the same hash uniform as [[hashSample]].
   */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
                       fractions: Map[String, Double],
                       default: Double = 1.0): DataFrame = {
    require((default +: fractions.values.toSeq).forall(f => f >= 0 && f <= 1),
      "every fraction must be in [0,1]")
    val frac = fractions.foldLeft(lit(default)) { case (acc, (value, f)) =>
      when(col(stratumCol) === lit(value), lit(f)).otherwise(acc)
    }
    df.filter(hashUniform(col(keyCol)) < frac)
  }

  /**
   * Exact per-stratum quota: the `k` rows of each stratum with the
   * smallest hash uniform (deterministic order, ties broken by the key
   * itself). One shuffle on the strata; the `row_number <= k` filter
   * sits directly on the window so Spark's WindowGroupLimit pushdown
   * pre-trims every map task's input to k rows per stratum BEFORE the
   * exchange — the shuffle moves ~k rows per (task, stratum), not the
   * corpus.
   */
  def stratifiedTopK(df: DataFrame, strataCols: Seq[String], keyCol: String,
                     k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(hashUniform(col(keyCol)), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }
}
