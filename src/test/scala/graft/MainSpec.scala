package graft

import org.scalatest.funsuite.AnyFunSuite

class MainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("Main runs a YAML config end-to-end in parquet mode") {
    val dir = java.nio.file.Files.createTempDirectory("main_spec")
    val tables = dir.resolve("tables")
    java.nio.file.Files.createDirectories(tables)
    java.nio.file.Files.writeString(dir.resolve("config.yaml"),
      """global:
        |  tables_folder: tables
        |  table_files: [nation.yaml]
        |""".stripMargin)
    java.nio.file.Files.writeString(tables.resolve("nation.yaml"),
      """source_table: nation
        |target_table: nation_out
        |mappings:
        |  - source: n_nationkey
        |    target: id
        |  - source: n_name
        |    target: name
        |    transform: lower
        |""".stripMargin)
    val out = java.nio.file.Files.createTempDirectory("main_out").toString
    val report = Main.run(Array(dir.resolve("config.yaml").toString,
      "--parquet-source", "/root/testdata/sf0.001",
      "--parquet-target", out), spark)
    assert(report.totalRows == 25L)
    val res = spark.read.parquet(s"$out/nation_out.parquet")
    assert(res.count() == 25)
    assert(res.columns.toSeq == Seq("id", "name"))
  }

  test("wire fails fast with a clear message when no source is configured") {
    val cfg = graft.config.EtlConfig(graft.config.GlobalConfig(), Nil)
    val ex = intercept[IllegalArgumentException] {
      Main.wire(spark, cfg, None, Some("/tmp"))
    }
    assert(ex.getMessage.contains("--parquet-source"))
  }

  test("YAML-routed transform_override selects the table-level plugin chain end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("override_spec")
    val tables = dir.resolve("tables")
    java.nio.file.Files.createDirectories(tables)
    java.nio.file.Files.writeString(dir.resolve("config.yaml"),
      """global:
        |  tables_folder: tables
        |  table_files: [nation.yaml]
        |""".stripMargin)
    java.nio.file.Files.writeString(tables.resolve("nation.yaml"),
      """source_table: nation
        |target_table: nation_norm
        |transform_override: true
        |transform_plugins: [normalize_names]
        |mappings:
        |  - source: n_name
        |    target: name
        |    transform: normalize_names,upper
        |""".stripMargin)
    val out = java.nio.file.Files.createTempDirectory("override_out").toString
    val report = Main.run(Array(dir.resolve("config.yaml").toString,
      "--parquet-source", "/root/testdata/sf0.001",
      "--parquet-target", out,
      "--plugin", "graft.plugins.NormalizeNamesPlugin"), spark)
    assert(report.totalRows == 25L)
    val names = spark.read.parquet(s"$out/nation_norm.parquet")
      .collect().map(_.getString(0))
    // plugin chain replaced the default: normalized, and the builtin
    // 'upper' in the same transform list stayed INERT (not in the chain)
    assert(names.contains("nation_0"))
    assert(names.forall(n => n == n.toLowerCase))
  }

  test("config partition fields reach the JDBC source keyed by source table") {
    import graft.config._
    val cfg = EtlConfig(GlobalConfig(), List(
      TableConfig(sourceTable = "big", targetTable = "t1",
        partitionColumn = Some("id"), lowerBound = Some("0"),
        upperBound = Some("1000"), numPartitions = Some(16)),
      TableConfig(sourceTable = "probe_me", targetTable = "t2",
        partitionColumn = Some("ts")), // bounds/N absent -> probe + default 32
      TableConfig(sourceTable = "small", targetTable = "t3")))
    val p = Main.partitioningFromConfig(cfg)
    assert(p("big") == graft.sources.JdbcPartitioning("id", Some("0"), Some("1000"), 16))
    assert(p("probe_me") == graft.sources.JdbcPartitioning("ts", None, None, 32))
    assert(!p.contains("small"))
    // schema-qualified source keys by the QUALIFIED relation — the name
    // the Engine actually scans by
    val q = Main.partitioningFromConfig(EtlConfig(GlobalConfig(), List(
      TableConfig(sourceTable = "big", sourceSchema = Some("hr"), targetTable = "t",
        partitionColumn = Some("id")))))
    assert(q.contains("hr.big") && !q.contains("big"))
  }

  test("quarantine_target in YAML routes skip-rejected rows to <table>_rejects") {
    val dir = java.nio.file.Files.createTempDirectory("quar_spec")
    val tables = dir.resolve("tables")
    java.nio.file.Files.createDirectories(tables)
    val qdir = java.nio.file.Files.createTempDirectory("quar_rejects").toString
    java.nio.file.Files.writeString(dir.resolve("config.yaml"),
      s"""global:
         |  tables_folder: tables
         |  quarantine_target: $qdir
         |  table_files: [nation.yaml]
         |""".stripMargin)
    java.nio.file.Files.writeString(tables.resolve("nation.yaml"),
      """source_table: nation
        |target_table: nation_q
        |mappings:
        |  - source: n_nationkey
        |    target: id
        |  - source: n_name
        |    target: name
        |    validation:
        |      - type: regex
        |        pattern: "[A-M]"
        |        on_fail: skip
        |""".stripMargin)
    val out = java.nio.file.Files.createTempDirectory("quar_out").toString
    val report = Main.run(Array(dir.resolve("config.yaml").toString,
      "--parquet-source", "/root/testdata/sf0.001",
      "--parquet-target", out), spark)
    val kept = spark.read.parquet(s"$out/nation_q.parquet")
    val rejects = spark.read.parquet(s"$qdir/nation_q_rejects.parquet")
    assert(kept.count() + rejects.count() == 25)
    assert(report.tables.head.skippedRows == rejects.count())
    // every reject names the fired rule (column + type) for the audit
    assert(rejects.columns.contains("__rejected_by"))
    val labels = rejects.select("__rejected_by").collect().map(_.getString(0)).distinct
    assert(labels.forall(l => l.contains("name") && l.contains("regex")), labels.mkString(","))
    // and the CLI flag overrides the YAML value
    val qdir2 = java.nio.file.Files.createTempDirectory("quar_rejects2").toString
    Main.run(Array(dir.resolve("config.yaml").toString,
      "--parquet-source", "/root/testdata/sf0.001",
      "--parquet-target", out, "--quarantine-target", qdir2), spark)
    assert(spark.read.parquet(s"$qdir2/nation_q_rejects.parquet").count() == rejects.count())
  }

  test("parquet catalog/sink fail loudly on schema-qualified configs") {
    import graft.config._
    val catalog = graft.sources.ParquetCatalog(spark, "/root/testdata/sf0.001")
    val sink = graft.sinks.ParquetSink(
      java.nio.file.Files.createTempDirectory("schema_fail").toString)
    // source_schema over parquet: the scan must throw, not read the wrong file
    val srcCfg = EtlConfig(GlobalConfig(), List(
      TableConfig(sourceTable = "nation", sourceSchema = Some("hr"), targetTable = "out")))
    val e1 = intercept[IllegalArgumentException] {
      Engine.migrate(srcCfg, catalog, sink)
    }
    assert(e1.getMessage.contains("schema namespace"))
    // non-default target_schema over parquet: the write must throw
    val tgtCfg = EtlConfig(GlobalConfig(), List(
      TableConfig(sourceTable = "nation", targetTable = "out", targetSchema = "analytics")))
    val e2 = intercept[IllegalArgumentException] {
      Engine.migrate(tgtCfg, catalog, sink)
    }
    assert(e2.getMessage.contains("schema namespace"))
  }

  test("parseArgs rejects flag values that look like flags and trailing valueless flags") {
    intercept[IllegalArgumentException] {
      Main.run(Array("cfg.yaml", "--parquet-source", "--plugin"), spark)
    }
    intercept[IllegalArgumentException] {
      Main.run(Array("cfg.yaml", "--parquet-source"), spark)
    }
  }
}
