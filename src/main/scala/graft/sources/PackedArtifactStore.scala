package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * On-disk layout for a PACKED TOKEN ARTIFACT — the final write that
 * turns the token-stream operators into something a training job can
 * actually mount. One directory, four surfaces:
 *
 *   `<path>/windows/`   the packed windows
 *                       ([[graft.operators.TextStats.materializePackedTokenIds]]
 *                       or either SFT packer), parquet PARTITIONED BY
 *                       `shard` with every file internally sorted by
 *                       `seq_id` — a loader assigned a shard reads its
 *                       directory sequentially, in stream order, no
 *                       shuffle at read time;
 *   `<path>/spans/`     the doc-span address book (block-diagonal
 *                       attention / provenance), same shard layout;
 *   `<path>/manifest/`  the [[graft.operators.TextStats.packFileManifest]]
 *                       rollup — the per-file seek card;
 *   `<path>/meta/`      one row: budget, shards, windows_per_file,
 *                       eos_id — the numbers a loader must agree on.
 *
 * Read side restores the exact frames ([[readWindows]] casts the
 * directory-partition `shard` key back to the packers' LongType).
 * Spec-pinned round trip: write → read → [[graft.operators.TextStats.unpackTokenWindows]]
 * reproduces the SAME per-doc streams as unpacking the in-memory
 * frames (PackedArtifactStoreSpec).
 *
 * 100 TB design: the windows write is the one corpus-scale pass —
 * `repartition(shard)` + `sortWithinPartitions` is a single shuffle
 * into the layout the loader wants (Spark's external sort spills);
 * spans are scalar rows, manifest/meta are KB-scale. Nothing touches
 * the driver.
 */
object PackedArtifactStore {

  /** The loader contract numbers, persisted next to the data. */
  final case class Meta(budget: Int, shards: Int, windowsPerFile: Int,
                        eosId: Long)

  def write(packed: DataFrame, spans: DataFrame, path: String,
            meta: Meta): Unit = {
    require(meta.budget >= 1 && meta.shards >= 1 && meta.windowsPerFile >= 1,
      "meta fields must be >= 1")
    packed
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("seq_id"))
      .write.mode("overwrite").partitionBy("shard")
      .parquet(s"$path/windows")
    spans
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("seq_id"), col("doc_id"))
      .write.mode("overwrite").partitionBy("shard")
      .parquet(s"$path/spans")
    graft.operators.TextStats.packFileManifest(packed, meta.windowsPerFile)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/manifest")
    val spark = packed.sparkSession
    import spark.implicits._
    Seq((meta.budget, meta.shards, meta.windowsPerFile, meta.eosId))
      .toDF("budget", "shards", "windows_per_file", "eos_id")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** The packed windows, `shard` restored to the packers' LongType
    * (directory-partition keys read back as integers otherwise). */
  def readWindows(spark: SparkSession, path: String): DataFrame =
    restoreShard(spark.read.parquet(s"$path/windows"))

  /** The doc-span address book, same shard restoration. */
  def readSpans(spark: SparkSession, path: String): DataFrame =
    restoreShard(spark.read.parquet(s"$path/spans"))

  /** The per-file seek card. */
  def readManifest(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/manifest")

  def readMeta(spark: SparkSession, path: String): Meta = {
    val r = spark.read.parquet(s"$path/meta").head()
    Meta(r.getAs[Int]("budget"), r.getAs[Int]("shards"),
      r.getAs[Int]("windows_per_file"), r.getAs[Long]("eos_id"))
  }

  private def restoreShard(df: DataFrame): DataFrame = {
    val others = df.columns.filterNot(_ == "shard").map(col)
    df.select(col("shard").cast(LongType).as("shard") +: others.toIndexedSeq: _*)
  }

  /**
   * Loader-side INTEGRITY gate: recompute the file manifest from the
   * PERSISTED windows and diff it against the PERSISTED manifest — a
   * partial windows write, a stale manifest after a re-pack, or a
   * hand-edited card all surface as mismatched file rows before a
   * training run reads a single token. One row:
   * (n_files_stored, n_files_recomputed, n_mismatched_files, ok).
   *
   * 100 TB design: the recompute is the manifest rollup's one
   * file-cardinality shuffle over scalar columns (id arrays prune);
   * the diff runs at file cardinality (`exceptAll` both ways), never
   * token scale.
   */
  def validate(spark: SparkSession, path: String): DataFrame = {
    val meta = readMeta(spark, path)
    val fresh = graft.operators.TextStats.packFileManifest(
      readWindows(spark, path), meta.windowsPerFile)
    val stored = readManifest(spark, path)
    val nStored = stored.count()
    val nFresh = fresh.count()
    val mismatched = stored.exceptAll(fresh).count() +
      fresh.exceptAll(stored).count()
    import spark.implicits._
    Seq((nStored, nFresh, mismatched, mismatched == 0L && nStored == nFresh))
      .toDF("n_files_stored", "n_files_recomputed", "n_mismatched_files", "ok")
  }
}
