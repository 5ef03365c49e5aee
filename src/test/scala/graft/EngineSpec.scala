package graft

import graft.config._
import graft.sinks.ParquetSink
import graft.sources.{Catalog, ParquetCatalog}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

class EngineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** In-memory catalog over given frames (stub for JDBC in tests). */
  private case class MemCatalog(tables: Map[String, DataFrame]) extends Catalog {
    def table(name: String): DataFrame = tables(name)
    override def tableOpt(name: String): Option[DataFrame] = tables.get(name)
  }

  private def rule(src: String, tgt: String, ops: String = ""): MappingRule =
    MappingRule(source = Some(src), target = Some(tgt),
      transform = ops.split(",").map(_.trim).filter(_.nonEmpty).toList)

  test("migrate resolves lookups against the WRITTEN output of earlier tables") {
    val cat = MemCatalog(Map(
      "nations" -> Seq((1, "ALPHA"), (2, "BETA")).toDF("nid", "nname"),
      "people" -> Seq((10L, 1), (20L, 2), (30L, 3)).toDF("pid", "nation")))
    val out = java.nio.file.Files.createTempDirectory("engine_spec").toString
    val cfg = EtlConfig(GlobalConfig(), List(
      TableConfig(sourceTable = "nations", targetTable = "dim", mappings = List(
        rule("nid", "key"), rule("nname", "name", "lower"))),
      TableConfig(sourceTable = "people", targetTable = "out", mappings = List(
        rule("pid", "id"),
        rule("nation", "nation_name").copy(lookup =
          Some(LookupConfig("dim", "key", Some("name"), Some("null"))))))))
    val report = Engine.migrate(cfg, cat, ParquetSink(out))
    assert(report.tables.map(t => t.table -> t.rows).toMap == Map("dim" -> 2L, "out" -> 3L))
    val res = spark.read.parquet(s"$out/out.parquet")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // values come from the TARGET-side dim (lowercased by its transform)
    assert(res(10L) == "alpha" && res(20L) == "beta" && res(30L) == null)
  }

  test("independent tables run in one wave and all get written") {
    val cat = MemCatalog(Map(
      "a" -> Seq(1, 2, 3).toDF("x"),
      "b" -> Seq(4, 5).toDF("x"),
      "c" -> Seq(6).toDF("x")))
    val out = java.nio.file.Files.createTempDirectory("engine_par").toString
    val cfg = EtlConfig(GlobalConfig(), List("a", "b", "c").map(n =>
      TableConfig(sourceTable = n, targetTable = s"${n}_out",
        mappings = List(rule("x", "x")))))
    val report = Engine.migrate(cfg, cat, ParquetSink(out), maxParallelTables = 3)
    assert(report.totalRows == 6L)
    for (n <- Seq("a", "b", "c"))
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(out, s"${n}_out.parquet")))
  }

  test("migrate aborts before writing when an error-rule fires") {
    val cat = MemCatalog(Map("src" -> Seq("ok", "BAD").toDF("v")))
    val out = java.nio.file.Files.createTempDirectory("engine_abort").toString
    val cfg = EtlConfig(GlobalConfig(), List(
      TableConfig(sourceTable = "src", targetTable = "t", mappings = List(
        rule("v", "v").copy(validation =
          List(ValidationRule("regex", pattern = Some("[a-z]+$"), onFail = Some("error"))))))))
    intercept[IllegalStateException] {
      Engine.migrate(cfg, cat, ParquetSink(out))
    }
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(out, "t.parquet")))
  }

  test("migrate reports observe-counted skipped rows without a second pass") {
    val cat = MemCatalog(Map("src" -> Seq("aa", "bb", "XX", "YY", "cc").toDF("v")))
    val out = java.nio.file.Files.createTempDirectory("engine_skip").toString
    val cfg = EtlConfig(GlobalConfig(), List(
      TableConfig(sourceTable = "src", targetTable = "t", mappings = List(
        rule("v", "v").copy(validation =
          List(ValidationRule("regex", pattern = Some("[a-z]+$"), onFail = Some("skip"))))))))
    val report = Engine.migrate(cfg, cat, ParquetSink(out))
    assert(report.tables.head.rows == 3L)
    assert(report.tables.head.skippedRows == 2L)
  }

  test("quarantine sink receives skipped rows with the fired rule flag") {
    val cat = MemCatalog(Map("src" -> Seq("aa", "BAD", "cc").toDF("v")))
    val out = java.nio.file.Files.createTempDirectory("engine_quar").toString
    val qdir = java.nio.file.Files.createTempDirectory("engine_quar_rejects").toString
    val cfg = EtlConfig(GlobalConfig(), List(
      TableConfig(sourceTable = "src", targetTable = "t", mappings = List(
        rule("v", "v").copy(validation =
          List(ValidationRule("regex", pattern = Some("[a-z]+$"), onFail = Some("skip"))))))))
    val report = Engine.migrate(cfg, cat, ParquetSink(out),
      quarantine = Some(ParquetSink(qdir)))
    assert(report.tables.head.rows == 2L)
    val rejects = spark.read.parquet(s"$qdir/t_rejects.parquet").collect()
    assert(rejects.map(_.getString(0)).toSeq == Seq("BAD"))
    assert(rejects.head.getString(1).startsWith("__skip_")) // which rule fired
  }

  test("duplicate bare target names fail at schedule time, before any write") {
    val cat = MemCatalog(Map("src" -> Seq(1, 2).toDF("x")))
    val out = java.nio.file.Files.createTempDirectory("engine_dup").toString
    // lookups + the written-output map resolve by BARE target name, so
    // two tables mapping onto 't' (different schemas) are ambiguous
    val cfg = EtlConfig(GlobalConfig(), List(
      TableConfig(sourceTable = "src", targetTable = "t", targetSchema = "s1",
        mappings = List(rule("x", "x"))),
      TableConfig(sourceTable = "src", targetTable = "t", targetSchema = "s2",
        mappings = List(rule("x", "x")))))
    val e = intercept[IllegalArgumentException] {
      Engine.migrate(cfg, cat, ParquetSink(out))
    }
    assert(e.getMessage.contains("ambiguous"))
    assert(!java.nio.file.Files.list(java.nio.file.Paths.get(out)).findAny().isPresent,
      "must fail before writing anything")
  }

  test("skip-flag names are sanitized for non-identifier target columns") {
    // a '-' (or '.') in a target column name must not break the flag
    // references the compiler builds from it (col('a.b') parses as
    // struct access)
    val cat = MemCatalog(Map("src" -> Seq("aa", "BAD", "cc").toDF("v")))
    val out = java.nio.file.Files.createTempDirectory("engine_sanit").toString
    val qdir = java.nio.file.Files.createTempDirectory("engine_sanit_rejects").toString
    val cfg = EtlConfig(GlobalConfig(), List(
      TableConfig(sourceTable = "src", targetTable = "t", mappings = List(
        rule("v", "amt-usd").copy(validation =
          List(ValidationRule("regex", pattern = Some("[a-z]+$"), onFail = Some("skip"))))))))
    val report = Engine.migrate(cfg, cat, ParquetSink(out),
      quarantine = Some(ParquetSink(qdir)))
    assert(report.tables.head.rows == 2L && report.tables.head.skippedRows == 1L)
    val rejects = spark.read.parquet(s"$qdir/t_rejects.parquet").collect()
    assert(rejects.map(_.getString(0)).toSeq == Seq("BAD"))
    assert(rejects.head.getString(1) == "__skip_1_amt_usd_regex")
  }

  test("plan compiles against a parquet catalog end-to-end") {
    val compiled = Engine.plan(
      TableConfig(sourceTable = "nation", targetTable = "x",
        mappings = List(rule("n_nationkey", "id"), rule("n_name", "name", "lower"))),
      ParquetCatalog(spark, "/root/testdata/sf0.001"))
    assert(compiled.dataFrame.count() == 25)
  }
}
