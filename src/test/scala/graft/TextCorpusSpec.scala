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
}
