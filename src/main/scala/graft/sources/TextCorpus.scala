package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * JSONL corpus interchange — the lingua franca of LLM training-data
 * releases (Dolma, RedPajama, FineWeb all ship line-delimited JSON):
 * read and write document corpora as JSONL directories, so a pipeline
 * built on this engine can ingest a public release and publish one.
 * The reference engine is JDBC-only (its corpus IS the database);
 * this is the extension surface a text pipeline cannot do without.
 *
 * 100 TB design:
 *  - reads take an EXPLICIT schema: schema inference is a second full
 *    pass over the corpus before the first real job, and it mistypes
 *    sparse fields (a column that is null in the sampled files comes
 *    back as string) — at corpus scale you always know the schema you
 *    expect, so passing it is both the fast path and the correct one.
 *  - JSONL is splittable line-by-line, so Spark parallelizes a read by
 *    `spark.sql.files.maxPartitionBytes` ranges — EXCEPT gzip, which
 *    is a stream cipher: one .json.gz file = one task. Write
 *    compressed corpora in many files (`partitions`) or the read side
 *    serializes; the writer's knob exists exactly for that.
 *  - `mode = FAILFAST` is the default: a corrupt line in training data
 *    should stop the job, not silently become an all-null row
 *    (PERMISSIVE's behavior — opt into it deliberately for salvage
 *    runs, together with `columnNameOfCorruptRecord`).
 */
object TextCorpus {

  /** Read a JSONL corpus directory (or glob) with an explicit schema.
    * `mode` is Spark's JSON parse mode: FAILFAST (default), PERMISSIVE
    * or DROPMALFORMED. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType,
                mode: String = "FAILFAST"): DataFrame =
    spark.read.schema(schema).option("mode", mode).json(path)

  /** Write a corpus as a JSONL directory. `compression`: none (default),
    * "gzip", or any codec Spark supports; `partitions > 0` repartitions
    * first — bounded shard sizes for the downstream reader (mandatory
    * for gzip, see the class note). */
  def writeJsonl(df: DataFrame, path: String,
                 compression: Option[String] = None,
                 partitions: Int = 0): Unit = {
    val out = if (partitions > 0) df.repartition(partitions) else df
    val w = out.write.mode("overwrite")
    compression.fold(w)(c => w.option("compression", c)).json(path)
  }

  /** CSV/TSV corpus read — same contract as [[readJsonl]] (explicit
    * schema, FAILFAST default). `multiLine = true` is REQUIRED when
    * text fields can contain newlines (quoted-field records then span
    * lines) — but a multiLine CSV file is not line-splittable, so at
    * corpus scale prefer many files or JSONL, where escaping keeps one
    * record per line. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true, delimiter: String = ",",
              multiLine: Boolean = true,
              mode: String = "FAILFAST"): DataFrame =
    spark.read.schema(schema)
      .option("header", header).option("sep", delimiter)
      .option("multiLine", multiLine).option("escape", "\"")
      .option("ignoreLeadingWhiteSpace", false)
      .option("ignoreTrailingWhiteSpace", false)
      .option("mode", mode)
      .csv(path)

  /** CSV corpus write; Spark quotes/escapes fields with delimiters,
    * quotes or newlines. Same `partitions` contract as [[writeJsonl]]. */
  def writeCsv(df: DataFrame, path: String, header: Boolean = true,
               delimiter: String = ",",
               compression: Option[String] = None,
               partitions: Int = 0): Unit = {
    val out = if (partitions > 0) df.repartition(partitions) else df
    val w = out.write.mode("overwrite")
      .option("header", header).option("sep", delimiter)
      .option("escape", "\"")
      // the WRITER trims field whitespace by default — corpus text is
      // not whitespace-normalizable by a storage layer
      .option("ignoreLeadingWhiteSpace", false)
      .option("ignoreTrailingWhiteSpace", false)
    compression.fold(w)(c => w.option("compression", c)).csv(path)
  }

  /** Hive-layout partitioned parquet export (`path/col=value/...`) —
    * the storage layout that makes stratum-filtered reads FREE:
    * a query filtering on a partition column prunes whole directories
    * at planning time (PartitionFilters in the scan — the spec asserts
    * it), so "read only lang=en" never lists, opens, or decodes any
    * other stratum's bytes. Partition by LOW-cardinality columns only
    * (lang, source, split); partitioning by a high-cardinality key
    * produces a million tiny files — the classic small-files
    * pathology. */
  def writePartitionedParquet(df: DataFrame, path: String,
                              partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
  }
}
