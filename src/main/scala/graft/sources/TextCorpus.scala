package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, ceil, coalesce, col, count, greatest, lit, pmod, sum, xxhash64}
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
  /** ORC corpus read — Spark bundles the ORC reader, so this is the
    * zero-extra-dependency interchange with Hive-ecosystem consumers;
    * same explicit-schema contract as [[readJsonl]] (nested
    * conversation schemas included — ORC is a typed columnar format,
    * no parse mode applies). */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** ORC corpus write; `compression`: snappy (Spark's default), zlib,
    * lzo, zstd, or none. Same shard-bounding contract as
    * [[writeJsonl]]. */
  def writeOrc(df: DataFrame, path: String,
               compression: Option[String] = None,
               partitions: Int = 0): Unit = {
    val out = if (partitions > 0) df.repartition(partitions) else df
    val w = out.write.mode("overwrite")
    compression.fold(w)(c => w.option("compression", c)).orc(path)
  }

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
  /**
   * Small-files COMPACTION — the table-maintenance pass every
   * long-lived corpus needs: streaming intake and incremental
   * appends leave hundreds of KB-scale parquet files whose per-file
   * open/footer overhead eventually dominates scans. Rewrites `in`
   * to `out` at `ceil(totalBytes / targetBytes)` files (size taken
   * from the source listing, never a second scan) and reports
   * (filesBefore, filesAfter). The caller swaps directories —
   * rewrite-then-swap keeps readers consistent, and this utility
   * refuses in-place rewrites for exactly that reason.
   */
  def compactParquet(spark: SparkSession, in: String, out: String,
                     targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    require(targetBytes > 0, "targetBytes must be positive")
    // resolve each path against ITS OWN filesystem (hdfs://, s3a://,
    // file:…) — FileSystem.get(conf) would list the default FS for a
    // qualified path, and java.io.File canonicalization is meaningless
    // for non-local URIs
    val conf = spark.sparkContext.hadoopConfiguration
    val inPath = new org.apache.hadoop.fs.Path(in)
    val outPath = new org.apache.hadoop.fs.Path(out)
    val fs = inPath.getFileSystem(conf)
    require(fs.makeQualified(inPath) !=
      outPath.getFileSystem(conf).makeQualified(outPath),
      "compaction must write to a NEW directory (rewrite-then-swap)")
    val files = fs.listStatus(inPath)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val totalBytes = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(in).repartition(nOut)
      .write.mode("errorifexists").parquet(out)
    (files.length, nOut)
  }

  def writePartitionedParquet(df: DataFrame, path: String,
                              partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
  }

  /**
   * BOUNDED-TASK parquet write — the skew-proof export path. A naive
   * `partitionBy(lang)` write of a 90%-English corpus funnels 90% of
   * the rows through however many tasks happen to hold them; at 100 TB
   * that is a handful of multi-hour straggler tasks and multi-GB
   * files. Here every write task carries ~`targetRecordsPerFile` rows
   * by construction:
   *
   *  1. one TINY aggregate counts rows per partition value (partition
   *     columns are low-cardinality by contract — the same rule
   *     [[writePartitionedParquet]] documents);
   *  2. each value gets `ceil(count / target)` salt buckets, joined
   *     back broadcast; the salt is `xxhash64(saltCol) % buckets` —
   *     DETERMINISTIC (re-runs produce identical layout, unlike a
   *     rand() salt);
   *  3. one repartition on (partitionCols..., salt) into ~bucket-count
   *     tasks makes each task a small number of bounded slices (hash
   *     collisions can co-locate two slices — still bounded, vs. the
   *     unbounded monster task this replaces);
   *  4. `maxRecordsPerFile` rides along as the hard per-FILE cap for
   *     any remaining imbalance.
   *
   * With `partitionCols` empty the same logic sizes a flat write to
   * `ceil(total / target)` tasks. Returns (rows, directories, buckets)
   * for observability.
   */
  def writeSizedParquet(df: DataFrame, path: String,
                        targetRecordsPerFile: Long,
                        partitionCols: Seq[String],
                        saltCol: String): (Long, Long, Long) = {
    require(targetRecordsPerFile > 0, "targetRecordsPerFile must be positive")
    require(!df.columns.contains("__salt"), "df already has a __salt column")
    val counts = df
      .groupBy(partitionCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .withColumn("__buckets",
        ceil(col("__n").cast("double") / targetRecordsPerFile).cast("int"))
    val agg = counts.agg(
      coalesce(sum(col("__n")), lit(0L)).as("rows"),
      count(lit(1)).as("dirs"),
      coalesce(sum(col("__buckets").cast("long")), lit(0L)).as("buckets"))
      .head()
    val (rows, dirs, buckets) =
      (agg.getLong(0), agg.getLong(1), agg.getLong(2))
    val salted =
      if (partitionCols.isEmpty)
        df.withColumn("__salt",
          pmod(xxhash64(col(saltCol)),
            lit(math.max(1L, math.ceil(rows.toDouble / targetRecordsPerFile).toLong))))
      else {
        // NULL-SAFE join on the partition columns: a using-columns
        // join would never match a NULL stratum, sending its entire
        // row count to one salt bucket — the exact monster task this
        // function exists to prevent (counts groupBy DOES emit the
        // NULL group, so its quota exists; ADVICE r15 #3)
        val cnt = counts.select(
          partitionCols.map(c => col(c).as(s"__pc_$c")) :+
            col("__buckets"): _*)
        val cond = partitionCols.map(c => col(c) <=> col(s"__pc_$c"))
          .reduce(_ && _)
        df.join(broadcast(cnt), cond, "left")
          .drop(partitionCols.map(c => s"__pc_$c"): _*)
          .withColumn("__salt",
            pmod(xxhash64(col(saltCol)), greatest(col("__buckets"), lit(1))))
          .drop("__buckets")
      }
    val writer = salted
      .repartition(buckets.max(1L).min(Int.MaxValue).toInt,
        (partitionCols :+ "__salt").map(col): _*)
      .drop("__salt")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", targetRecordsPerFile)
    (if (partitionCols.isEmpty) writer
     else writer.partitionBy(partitionCols: _*)).parquet(path)
    (rows, dirs, buckets)
  }

  /**
   * Training-data RELEASE: JSONL shards plus the verification manifest
   * a release consumer checks against — the Dolma-style artifact. Per
   * shard file the manifest records (relative path, row count, byte
   * size, content md5); `_release.json` carries the run provenance
   * (caller blob + schema + totals). Both live under `path` with
   * underscore names, which every Spark reader ignores, so the release
   * directory reads back as a plain JSONL corpus.
   *
   * Layout determinism: when `partitionCols` is set, shards are
   * `partitionCols`-hash-repartitioned (each partition value lands in
   * exactly ONE task → one file per directory) and sorted within
   * partitions by `partitionCols ++ orderCols` — with a total
   * `orderCols` order the shard BYTES (hence the manifest md5) are
   * bit-stable across runs, which is what makes the manifest a real
   * reproducibility contract rather than a description of one run.
   *
   * 100 TB design: the manifest is computed DISTRIBUTED by re-reading
   * what was written — a text read counts rows per file, a binaryFile
   * read hashes each shard (one task per file; shard size is bounded
   * by the partitioning you chose, exactly the quantity that must fit
   * a task anyway) — joined per-file, never collected to the driver;
   * the manifest write is a coalesce(1) of file-count-many rows. Use
   * `partitionCols` on LOW-cardinality columns only (the
   * [[writePartitionedParquet]] warning applies verbatim).
   *
   * Returns the manifest frame: (path, n_rows, n_bytes, content_md5).
   */
  def writeRelease(df: DataFrame, path: String,
                   partitionCols: Seq[String] = Nil,
                   orderCols: Seq[String] = Nil,
                   compression: Option[String] = None,
                   provenance: Map[String, String] = Map.empty): DataFrame = {
    import org.apache.spark.sql.functions._
    val spark = df.sparkSession
    val arranged =
      if (partitionCols.nonEmpty)
        df.repartition(partitionCols.map(col): _*)
          .sortWithinPartitions((partitionCols ++ orderCols).map(col): _*)
      else if (orderCols.nonEmpty) df.sortWithinPartitions(orderCols.map(col): _*)
      else df
    val w = arranged.write.mode("overwrite")
    val wc = compression.fold(w)(c => w.option("compression", c))
    (if (partitionCols.nonEmpty) wc.partitionBy(partitionCols: _*) else wc)
      .json(path)

    // relative path = file URI minus the base directory prefix. The two
    // listings disagree on URI spelling (input_file_name: "file:///x",
    // binaryFile: "file:/x"), so normalize the scheme first — the join
    // key must be identical on both sides.
    val baseAbs = new java.io.File(path).getAbsolutePath.stripSuffix("/")
    def rel(c: org.apache.spark.sql.Column) =
      regexp_replace(
        regexp_replace(c, "^file:/+", "/"),
        java.util.regex.Pattern.quote(baseAbs) + "/?", "")

    val rowsPerFile = spark.read.format("text").load(path)
      .select(rel(input_file_name()).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_rows"))
    val bytesPerFile = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true").load(path)
      .select(rel(col("path")).as("path"),
        col("length").as("n_bytes"), md5(col("content")).as("content_md5"))
    // computed ONCE (each consumption would re-hash every shard), then
    // the tiny written manifest is what totals and the caller read
    bytesPerFile.join(rowsPerFile, Seq("path"))
      .select("path", "n_rows", "n_bytes", "content_md5")
      .coalesce(1).write.mode("overwrite").json(s"$path/_manifest")
    val manifest = spark.read
      .schema("path STRING, n_rows BIGINT, n_bytes BIGINT, content_md5 STRING")
      .json(s"$path/_manifest")
      .select("path", "n_rows", "n_bytes", "content_md5")

    val totals = manifest.agg(count(lit(1)).as("f"),
      coalesce(sum(col("n_rows")), lit(0L)).as("r"),
      coalesce(sum(col("n_bytes")), lit(0L)).as("b")).head()
    def js(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val prov = (provenance ++ Map(
      "format" -> ("jsonl" + compression.fold("")("+" + _)),
      "n_files" -> totals.getLong(0).toString,
      "n_rows" -> totals.getLong(1).toString,
      "n_bytes" -> totals.getLong(2).toString))
      .toSeq.sortBy(_._1)
      .map { case (k, v) => s"${js(k)}: ${js(v)}" }
      .mkString("{", ", ", s", ${js("schema")}: ${js(df.schema.json)}}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "_release.json"), prov)
    manifest
  }

  /**
   * Verify a release against its manifest — the CONSUMER half of
   * [[writeRelease]]'s contract: re-count and re-hash every shard on
   * disk, full-outer join against `_manifest`, and report per shard
   * whether rows, bytes and content hash still match. Detects
   * truncated copies, bit rot, post-release edits, and shards
   * added/removed outside the release process (`status` = `missing` /
   * `unexpected` — those survive the outer join with one side NULL).
   *
   * Output: (path, status, rows_ok, bytes_ok, hash_ok) with status
   * `ok` | `mismatch` | `missing` (in manifest, not on disk) |
   * `unexpected` (on disk, not in manifest);
   * `.filter($"status" =!= "ok")` empty ⇒ the release is intact.
   *
   * 100 TB design: one binaryFile scan (hashing streams shard bytes
   * through executors — never the driver) + one text-count scan,
   * joined against the tiny manifest; verification parallelism is the
   * shard count, exactly like the write.
   */
  def verifyRelease(spark: org.apache.spark.sql.SparkSession,
                    path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val baseAbs = new java.io.File(path).getAbsolutePath.stripSuffix("/")
    def rel(c: org.apache.spark.sql.Column) =
      regexp_replace(
        regexp_replace(c, "^file:/+", "/"),
        java.util.regex.Pattern.quote(baseAbs) + "/?", "")
    val manifest = spark.read
      .schema("path STRING, n_rows BIGINT, n_bytes BIGINT, content_md5 STRING")
      .json(s"$path/_manifest")
      .select(col("path"), col("n_rows").as("__mr"),
        col("n_bytes").as("__mb"), col("content_md5").as("__mh"))
    // ignoreMissingFiles: a shard deleted between listing and scan (or
    // present in a stale session file-status cache) must surface as a
    // `missing` VERDICT, not crash the verification mid-scan
    val rowsPerFile = spark.read.format("text")
      .option("ignoreMissingFiles", "true").load(path)
      .select(rel(input_file_name()).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("__ar"))
    val bytesPerFile = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .option("ignoreMissingFiles", "true").load(path)
      .select(rel(col("path")).as("path"),
        col("length").as("__ab"), md5(col("content")).as("__ah"))
      // the manifest dir itself is not release payload
      .filter(!col("path").startsWith("_manifest/"))
    val actual = bytesPerFile.join(rowsPerFile, Seq("path"), "left")
    manifest.join(actual, Seq("path"), "full_outer")
      .select(col("path"),
        when(col("__mr").isNull, lit("unexpected"))
          .when(col("__ah").isNull, lit("missing"))
          .when(col("__mr") === col("__ar") && col("__mb") === col("__ab") &&
            col("__mh") === col("__ah"), lit("ok"))
          .otherwise(lit("mismatch")).as("status"),
        (col("__mr") <=> col("__ar")).as("rows_ok"),
        (col("__mb") <=> col("__ab")).as("bytes_ok"),
        (col("__mh") <=> col("__ah")).as("hash_ok"))
  }
}
