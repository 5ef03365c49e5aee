package graft

import graft.sources.TextCorpus
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextCorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d.toString
  }

  test("jsonl round-trip is row-identical incl. newlines, unicode and nulls") {
    val docs = Seq(
      (1L, "plain ascii text", Some("en")),
      (2L, "line one\nline two\ttabbed", Some("en")), // escaped, stays one JSONL line
      (3L, "unicode: résumé — काम 😀 \"quoted\"", Some("fr")),
      (4L, "", None),
      (5L, null.asInstanceOf[String], Some("de"))
    ).toDF("doc_id", "text", "lang")
    val path = tmpDir("graft_jsonl_rt")
    TextCorpus.writeJsonl(docs, path, compression = Some("gzip"), partitions = 2)
    val back = TextCorpus.readJsonl(spark, path, docs.schema)
    val a = docs.collect().map(r => (r.getLong(0),
      Option(r.getString(1)), Option(r.getString(2)))).toSet
    val b = back.collect().map(r => (r.getLong(0),
      Option(r.getString(1)), Option(r.getString(2)))).toSet
    assert(a == b)
    // gzip + partitions: the directory really holds 2 compressed shards
    val shards = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".json.gz"))
    assert(shards.length == 2)
  }

  test("orc round-trip is row-identical incl. NESTED conversation columns") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val convType = ArrayType(StructType(Seq(
      StructField("role", StringType), StructField("content", StringType))))
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("conv", convType)))
    val rows = Seq(
      Row(1L, "plain", Seq(Row("user", "hi\nthere"), Row("assistant", "résumé 😀"))),
      Row(2L, null, Seq.empty[Row]),
      Row(3L, "", null))
    val docs = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val path = tmpDir("graft_orc_rt")
    TextCorpus.writeOrc(docs, path, compression = Some("zstd"), partitions = 2)
    val back = TextCorpus.readOrc(spark, path, schema)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), Option(r.getString(1)),
        Option(r.getSeq[Row](2)).map(_.map(t =>
          (t.getString(0), t.getString(1))).toList))).toSet
    assert(canon(back) == canon(docs),
      "ORC must carry the nested array<struct> byte-exactly")
  }

  test("csv round-trip is row-identical incl. quotes, delimiters and newlines") {
    val docs = Seq(
      (1L, "plain text", "en"),
      (2L, "comma, quote \" and\nnewline", "en"),
      (3L, "tab\tand trailing space ", "fr")).toDF("doc_id", "text", "lang")
    val path = tmpDir("graft_csv_rt")
    TextCorpus.writeCsv(docs, path, partitions = 2)
    val back = TextCorpus.readCsv(spark, path, docs.schema)
    val a = docs.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val b = back.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(a == b)
  }

  test("partitioned parquet export prunes non-matching strata at plan time") {
    val docs = Seq(
      (1L, "aa", "en"), (2L, "bb", "en"), (3L, "cc", "de"), (4L, "dd", "fr")
    ).toDF("doc_id", "text", "lang")
    val path = tmpDir("graft_part")
    TextCorpus.writePartitionedParquet(docs, path, Seq("lang"))
    // hive layout on disk
    assert(new java.io.File(path, "lang=en").isDirectory)
    val filtered = spark.read.parquet(path).filter(col("lang") === "en")
    assert(filtered.collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    // the scan must carry a partition filter and touch ONLY lang=en files
    val scan = PlanWalk.executedNodes(filtered).collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.partitionFilters.nonEmpty, "partition filter must reach the scan")
    val files = scan.relation.location.listFiles(
      scan.partitionFilters, scan.dataFilters)
      .flatMap(_.files).map(_.getPath.toString)
    assert(files.nonEmpty && files.forall(_.contains("lang=en")),
      s"pruned listing must touch only lang=en, got $files")
  }

  test("FAILFAST read throws on a corrupt line; PERMISSIVE salvages the rest") {
    val path = tmpDir("graft_jsonl_bad")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "part-000.json"),
      """{"doc_id": 1, "text": "good"}
        |this is not json
        |{"doc_id": 3, "text": "also good"}
        |""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    intercept[org.apache.spark.SparkException] {
      TextCorpus.readJsonl(spark, path, schema).collect()
    }
    val salvaged = TextCorpus.readJsonl(spark, path, schema, mode = "DROPMALFORMED")
      .collect().map(_.getLong(0)).toSet
    assert(salvaged == Set(1L, 3L))
  }

  test("writeRelease: manifest counts/hashes verify against a re-read; round-trip identical") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_release").toString
    val df = (0L until 100L).map(i => (i, s"doc $i body", (i % 3).toInt))
      .toDF("doc_id", "text", "shard")
    val man = TextCorpus.writeRelease(df, dir,
      partitionCols = Seq("shard"), orderCols = Seq("doc_id"),
      provenance = Map("source" -> "unit-test"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // one file per shard value; counts match the explicit key split
    assert(man.size == 3, man.keys.toString)
    assert(man.keys.forall(_.matches("shard=\\d/part-.*\\.json")))
    val rowsByShard = man.map { case (k, (n, _, _)) =>
      k.split("/")(0).stripPrefix("shard=").toInt -> n }
    assert(rowsByShard == Map(0 -> 34L, 1 -> 33L, 2 -> 33L))
    // every manifest entry verifies against the bytes actually on disk
    man.foreach { case (relPath, (nRows, nBytes, md5hex)) =>
      val f = java.nio.file.Paths.get(dir, relPath)
      val bytes = java.nio.file.Files.readAllBytes(f)
      assert(bytes.length.toLong == nBytes, s"$relPath byte size")
      val dig = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      assert(dig.map("%02x".format(_)).mkString == md5hex, s"$relPath md5")
      val lines = new String(bytes, "UTF-8").split("\n").count(_.nonEmpty)
      assert(lines.toLong == nRows, s"$relPath line count")
    }
    // the release reads back as a plain corpus, row-identical
    // (underscore artifacts are invisible to the reader)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val back = TextCorpus.readJsonl(spark, dir, schema)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back == (0L until 100L).map(i => i -> s"doc $i body").toMap)
    // provenance blob records totals + caller fields
    val rel = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_release.json")), "UTF-8")
    assert(rel.contains("\"n_rows\": \"100\"") && rel.contains("unit-test"), rel)
    // bit-stable: a second identical release produces identical hashes
    val dir2 = java.nio.file.Files.createTempDirectory("graft_release2").toString
    val man2 = TextCorpus.writeRelease(df, dir2,
      partitionCols = Seq("shard"), orderCols = Seq("doc_id"))
      .collect().map(r => r.getString(0).split("/")(0) -> r.getString(3)).toMap
    val man1 = man.map { case (k, (_, _, h)) => k.split("/")(0) -> h }
    assert(man2 == man1, "shard content hashes must be reproducible across runs")
  }

  test("verifyRelease: intact release all-ok; tampering, deletion and additions detected") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_verify").toString
    val df = (0L until 60L).map(i => (i, s"row $i", (i % 2).toInt))
      .toDF("doc_id", "text", "shard")
    TextCorpus.writeRelease(df, dir,
      partitionCols = Seq("shard"), orderCols = Seq("doc_id"))
    def statuses() = TextCorpus.verifyRelease(spark, dir)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val clean = statuses()
    assert(clean.size == 2 && clean.values.forall(_ == "ok"),
      s"fresh release must verify clean, got $clean")
    // tamper: append a byte to one shard -> mismatch (bytes + hash, rows intact).
    // Drop the Hadoop local-FS .crc sidecar first: it would reject the
    // tampered bytes at read time (object stores have no sidecars)
    val victim = clean.keys.head
    val vf = java.nio.file.Paths.get(dir, victim)
    java.nio.file.Files.deleteIfExists(
      vf.getParent.resolve("." + vf.getFileName.toString + ".crc"))
    java.nio.file.Files.write(vf, "x".getBytes,
      java.nio.file.StandardOpenOption.APPEND)
    val tampered = TextCorpus.verifyRelease(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4)))).toMap
    assert(tampered(victim)._1 == "mismatch")
    // the appended byte after the final newline is a new (partial) line,
    // so rows, bytes and hash ALL fail
    assert(!tampered(victim)._2 && !tampered(victim)._3 && !tampered(victim)._4)
    // an unexpected extra file surfaces; a deleted shard reports missing
    val extra = java.nio.file.Paths.get(dir, "rogue.json")
    java.nio.file.Files.write(extra, "{\"doc_id\":999}\n".getBytes)
    java.nio.file.Files.delete(vf)
    val after = statuses()
    assert(after("rogue.json") == "unexpected")
    assert(after(victim) == "missing")
  }

  test("writeSizedParquet: skewed write lands in bounded files, content identical") {
    import spark.implicits._
    // 90/10 skew: 'en' would be one monster task under plain partitionBy
    val df = (0 until 2000).map(i =>
      (i.toLong, if (i % 10 == 0) "de" else "en", s"text $i"))
      .toDF("doc_id", "lang", "text")
    val dir = java.nio.file.Files.createTempDirectory("sized").toString + "/out"
    val (rows, dirs, buckets) = TextCorpus.writeSizedParquet(
      df, dir, targetRecordsPerFile = 250, Seq("lang"), "doc_id")
    assert(rows == 2000L && dirs == 2L)
    assert(buckets == math.ceil(1800 / 250.0).toLong + math.ceil(200 / 250.0).toLong)
    val back = spark.read.parquet(dir)
    // content identical
    assert(back.count() == 2000L)
    assert(back.select("doc_id").as[Long].collect().sorted.toSeq ==
      (0L until 2000L))
    // file envelope: EVERY file respects the record cap, and the
    // monster stratum splits into ~bucket-count files instead of one
    val perFile = back.groupBy(input_file_name().as("f"), col("lang"))
      .count().collect()
    assert(perFile.forall(_.getLong(2) <= 250L),
      s"a file exceeds maxRecordsPerFile: ${perFile.map(_.getLong(2)).max}")
    val enFiles = perFile.count(_.getString(1) == "en")
    assert(enFiles >= 8 && enFiles <= 16,
      s"1800 en rows at 250/file must spread over ~8 files, got $enFiles")
    // flat (unpartitioned) flavor sizes to ceil(total/target) tasks
    val dir2 = java.nio.file.Files.createTempDirectory("sized").toString + "/flat"
    val (r2, d2, b2) = TextCorpus.writeSizedParquet(
      df, dir2, targetRecordsPerFile = 600, Seq.empty, "doc_id")
    assert(r2 == 2000L && d2 == 1L && b2 == 4L)
    val flat = spark.read.parquet(dir2)
    val flatFiles = flat.groupBy(input_file_name()).count().collect()
    assert(flatFiles.forall(_.getLong(1) <= 600L))
    assert(flat.count() == 2000L)
  }

  test("writeSizedParquet: a NULL stratum gets its count-derived buckets (null-safe join)") {
    import spark.implicits._
    // 90% of rows carry a NULL partition value — the using-columns
    // join never matched them (NULL != NULL), so the whole stratum
    // fell to ONE salt bucket / ONE write task (ADVICE r15 #3); the
    // null-safe join must spread it like any other stratum
    val df = (0 until 2000).map(i =>
      (i.toLong, if (i % 10 == 0) Some("de") else None, s"text $i"))
      .toDF("doc_id", "lang", "text")
    val dir = java.nio.file.Files.createTempDirectory("sizedn").toString + "/out"
    val (rows, dirs, buckets) = TextCorpus.writeSizedParquet(
      df, dir, targetRecordsPerFile = 250, Seq("lang"), "doc_id")
    assert(rows == 2000L && dirs == 2L)
    assert(buckets == math.ceil(1800 / 250.0).toLong + 1L,
      "the NULL stratum's quota must come from its own count")
    val back = spark.read.parquet(dir)
    assert(back.count() == 2000L &&
      back.filter(col("lang").isNull).count() == 1800L)
    // write-task spread: part file names carry the writing task's
    // partition index — pre-fix the whole NULL stratum came from ONE
    // task (files split only by the record cap), post-fix its salt
    // buckets land on several tasks
    val nullTasks = back.filter(col("lang").isNull)
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0).split("/").last.split("-")(1)).distinct
    assert(nullTasks.length >= 4,
      s"NULL stratum must spread over several write tasks, got ${nullTasks.length}")
    val perFile = back.groupBy(input_file_name()).count().collect()
    assert(perFile.forall(_.getLong(1) <= 250L))
  }

  test("compactParquet: many small files become few, content identical, no in-place") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("cmp_in").toString
    val out = java.nio.file.Files.createTempDirectory("cmp").toString + "/out"
    // 32 tiny files
    (1 to 320).map(i => (i.toLong, s"doc $i")).toDF("id", "t")
      .repartition(32).write.mode("overwrite").parquet(in)
    val (before, after) = TextCorpus.compactParquet(spark, in, out,
      targetBytes = 64L * 1024)
    assert(before == 32 && after < before,
      s"compaction must shrink the file count ($before -> $after)")
    val a = spark.read.parquet(in).collect().map(_.getLong(0)).sorted
    val b = spark.read.parquet(out).collect().map(_.getLong(0)).sorted
    assert(a.toSeq == b.toSeq, "content byte-for-row identical")
    val files = new java.io.File(out).listFiles
      .count(_.getName.endsWith(".parquet"))
    assert(files == after, "reported file count matches what landed")
    intercept[IllegalArgumentException] {
      TextCorpus.compactParquet(spark, in, in)
    }
  }
}
