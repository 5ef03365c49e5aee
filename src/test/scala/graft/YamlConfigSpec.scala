package graft

import graft.config._
import org.scalatest.funsuite.AnyFunSuite

class YamlConfigSpec extends AnyFunSuite {

  test("full nested table config parses") {
    val cfg = YamlConfig.tableFromYaml(
      """source_table: HR.EMPLOYEES
        |target_table: employees
        |where: "status = 'ACTIVE'"
        |mappings:
        |  - source: EMP_ID
        |    target: id
        |    transform: to_int
        |    validation:
        |      - type: regex
        |        pattern: "[0-9]+"
        |        on_fail: error
        |  - source: DEPT_ID
        |    target: dept_name
        |    lookup:
        |      table: departments
        |      key_column: dept_id
        |      value_column: dept_name
        |      on_missing: "null"
        |""".stripMargin)
    assert(cfg.sourceTable == "HR.EMPLOYEES")
    assert(cfg.where.contains("status = 'ACTIVE'"))
    assert(cfg.mappings.head.transform == List("to_int"))
    assert(cfg.mappings.head.validation.head.onFail.contains("error"))
    val lk = cfg.mappings(1).lookup.get
    assert(lk == LookupConfig("departments", "dept_id", Some("dept_name"), Some("null")))
  }

  test("comma-string transform normalizes to an ordered list") {
    val cfg = YamlConfig.tableFromYaml(
      """source_table: s
        |target_table: t
        |mappings:
        |  - source: a
        |    target: a
        |    transform: "strip, capitalize"
        |""".stripMargin)
    assert(cfg.mappings.head.transform == List("strip", "capitalize"))
  }

  test("compact lookup encoding on_missing:table.key=value_col") {
    val cfg = YamlConfig.tableFromYaml(
      """source_table: s
        |target_table: t
        |mappings:
        |  - source: dept
        |    target: dept_name
        |    lookup: "skip:departments.dept_id=dept_name"
        |""".stripMargin)
    assert(cfg.mappings.head.lookup.get ==
      LookupConfig("departments", "dept_id", Some("dept_name"), Some("skip")))
  }

  test("compact lookup without on_missing prefix") {
    val cfg = YamlConfig.tableFromYaml(
      """source_table: s
        |target_table: t
        |mappings:
        |  - source: dept
        |    target: dept
        |    lookup: "departments.dept_id=dept_name"
        |""".stripMargin)
    val lk = cfg.mappings.head.lookup.get
    assert(lk.table == "departments" && lk.keyColumn == "dept_id"
      && lk.valueColumn.contains("dept_name") && lk.onMissing.isEmpty)
  }

  test("compact validation string regex+range+lookup") {
    val cfg = YamlConfig.tableFromYaml(
      """source_table: s
        |target_table: t
        |mappings:
        |  - source: v
        |    target: v
        |    validation: "regex:[0-9]+,range:0-100,lookup:dept.id:skip"
        |""".stripMargin)
    val vs = cfg.mappings.head.validation
    assert(vs.map(_.vtype) == List("regex", "range", "lookup"))
    assert(vs(0).pattern.contains("[0-9]+"))
    assert(vs(1).pattern.contains("0-100"))
    assert(vs(2).lookup.contains(LookupConfig("dept", "id", None, Some("skip"))))
    assert(vs(2).onFail.contains("skip"))
  }

  test("missing source_table/target_table throws") {
    intercept[IllegalArgumentException] {
      YamlConfig.tableFromYaml("target_table: t")
    }
    intercept[IllegalArgumentException] {
      YamlConfig.tableFromYaml("source_table: s")
    }
  }

  test("partitioned-read fields parse and default sensibly") {
    val t = YamlConfig.tableFromYaml(
      """source_table: big_events
        |target_table: events
        |partition_column: event_id
        |lower_bound: 0
        |upper_bound: 500000000
        |num_partitions: 64
        |""".stripMargin)
    assert(t.partitionColumn.contains("event_id"))
    assert(t.lowerBound.contains("0") && t.upperBound.contains("500000000"))
    assert(t.numPartitions.contains(64))
    // bounds optional: min/max probed at scan time
    val auto = YamlConfig.tableFromYaml(
      "source_table: s\ntarget_table: t\npartition_column: id\n")
    assert(auto.partitionColumn.contains("id"))
    assert(auto.lowerBound.isEmpty && auto.upperBound.isEmpty && auto.numPartitions.isEmpty)
    val none = YamlConfig.tableFromYaml("source_table: s\ntarget_table: t\n")
    assert(none.partitionColumn.isEmpty)
  }

  test("schema-bearing config round-trips and qualifies relations") {
    val t = YamlConfig.tableFromYaml(
      """source_table: employees
        |source_schema: hr
        |target_table: emp
        |target_schema: analytics
        |""".stripMargin)
    assert(t.sourceSchema.contains("hr") && t.targetSchema == "analytics")
    assert(t.qualifiedSource == "hr.employees")
    assert(t.qualifiedTarget == "analytics.emp")
    // defaults: no source schema, target schema "public" -> bare names
    // (the reference's parser default, mappings/parser.py:77-133)
    val d = YamlConfig.tableFromYaml("source_table: s\ntarget_table: t\n")
    assert(d.sourceSchema.isEmpty && d.targetSchema == "public")
    assert(d.qualifiedSource == "s" && d.qualifiedTarget == "t")
  }

  test("main config + table files load end-to-end in list order") {
    val dir = java.nio.file.Files.createTempDirectory("yamlcfg")
    val tables = dir.resolve("tables")
    java.nio.file.Files.createDirectories(tables)
    java.nio.file.Files.writeString(dir.resolve("config.yaml"),
      """global:
        |  tables_folder: tables
        |  batch_size: 100
        |  table_files: [b.yaml, a.yaml]
        |""".stripMargin)
    java.nio.file.Files.writeString(tables.resolve("a.yaml"),
      "source_table: sa\ntarget_table: ta\n")
    java.nio.file.Files.writeString(tables.resolve("b.yaml"),
      "source_table: sb\ntarget_table: tb\n")
    val cfg = YamlConfig.load(dir.resolve("config.yaml").toString)
    assert(cfg.global.batchSize == 100)
    assert(cfg.tables.map(_.targetTable) == List("tb", "ta")) // list order preserved
  }
}
