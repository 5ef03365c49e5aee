package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton) interleaving for DATA LAYOUT clustering — the
 * write-time lever the read-side operators rely on at 100 TB: sorting
 * a table by the interleaved bits of several columns co-locates rows
 * that are close in ALL of them, so per-file/row-group min/max stats
 * become tight on every clustered column at once and multi-column
 * predicates prune files a single-column sort could never prune
 * (a layout clustered only by `user_id` has every file spanning the
 * full time range, and vice versa). Same idea as Delta/Iceberg
 * OPTIMIZE ZORDER; here it is plain Spark: a pure Column expression
 * (shift/mask/or fold — whole-stage codegen, no UDF, no custom
 * kernel) + `repartitionByRange` on the z-value.
 *
 * [[interleave]] assumes inputs already sit in `[0, 2^bitsPerCol)`;
 * higher bits are masked off (wrap), so callers normalize first —
 * [[normalizeToBits]] maps a known `[min, max]` integer range with
 * pure integer arithmetic (deterministic, SQL-portable). Bit `j` of
 * column `i` lands at position `j*n + i`.
 */
object ZOrder {

  /** Morton-interleave `cols` at `bitsPerCol` bits each into one
    * LONG. Static fold of shift/mask/or terms — codegen-friendly,
    * exactly `n*bitsPerCol` ops, total bits capped at 63. */
  def interleave(cols: Seq[Column], bitsPerCol: Int): Column = {
    val n = cols.size
    require(n >= 2, "z-order needs at least two columns")
    require(bitsPerCol >= 1 && n * bitsPerCol <= 63,
      s"n*bitsPerCol must fit a signed long, got $n*$bitsPerCol")
    val terms = for {
      (c, i) <- cols.zipWithIndex
      j <- 0 until bitsPerCol
    } yield shiftleft(
      shiftright(c.cast("long"), j).bitwiseAND(lit(1L)), j * n + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Map an integer column with known `[minV, maxV]` bounds onto
    * `[0, 2^bits)` with integer arithmetic (rounds down; constant
    * column maps to 0). Overflow-safe while
    * `(maxV-minV) * (2^bits - 1)` fits a long. */
  def normalizeToBits(c: Column, minV: Long, maxV: Long, bits: Int): Column = {
    require(maxV >= minV, s"empty range [$minV, $maxV]")
    val span = maxV - minV
    if (span == 0L) lit(0L)
    else {
      // `div`, not `/`: Column./ is DOUBLE division, which both
      // changes the type and loses exactness past 2^53
      val scaled = (c.cast("long") - lit(minV)) * lit((1L << bits) - 1)
      org.apache.spark.sql.GraftColumnBridge.column(
        new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          org.apache.spark.sql.GraftColumnBridge.expression(scaled),
          org.apache.spark.sql.GraftColumnBridge.expression(lit(span))))
    }
  }

  /**
   * Write `df` as parquet CLUSTERED by the z-value: range-partition
   * into `numFiles` z-ranges, sort within each, drop the helper
   * column, write. Every output file then covers a compact z-range —
   * compact in every interleaved dimension — which is what makes
   * min/max pruning fire for multi-column predicates. (The
   * range-partitioner samples the z distribution, so skewed data
   * still yields balanced files.)
   */
  def clusterWrite(df: DataFrame, zValue: Column, path: String,
                   numFiles: Int): Unit = {
    require(numFiles >= 1, "numFiles must be >= 1")
    df.withColumn("__z", zValue)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
