package graft

import graft.config._
import graft.plans.MigrationCompiler
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MigrationCompilerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rule(src: String, tgt: String, ops: String = ""): MappingRule =
    MappingRule(source = Some(src), target = Some(tgt),
      transform = ops.split(",").map(_.trim).filter(_.nonEmpty).toList)

  private val noDims: String => Option[DataFrame] = _ => None

  test("auto-mapping derives 1:1 rules from the target schema when resolvable") {
    val source = Seq((1, "a", "x")).toDF("id", "name", "extra")
    val target = Seq((0, "")).toDF("id", "name")
    val cfg = TableConfig(sourceTable = "s", targetTable = "t")
    val out = MigrationCompiler.compile(cfg, source,
      n => if (n == "t") Some(target) else None).dataFrame
    assert(out.columns.toSeq == Seq("id", "name")) // pruned to target shape
  }
  test("auto-mapping falls back to the source schema when target unknown") {
    val source = Seq((1, "a")).toDF("id", "name")
    val cfg = TableConfig(sourceTable = "s", targetTable = "t")
    val out = MigrationCompiler.compile(cfg, source, noDims).dataFrame
    assert(out.columns.toSeq == Seq("id", "name"))
  }
  test("missing source column degrades to NULL scan and is reported") {
    val source = Seq((1, "a")).toDF("id", "name")
    val cfg = TableConfig(sourceTable = "s", targetTable = "t",
      mappings = List(rule("id", "id"), rule("phone", "phone")))
    val compiled = MigrationCompiler.compile(cfg, source, noDims)
    assert(compiled.droppedColumns == Seq("phone"))
    assert(compiled.dataFrame.select("phone").collect().forall(_.isNullAt(0)))
  }
  test("where filter applies unless wherePushed") {
    val source = Seq((1, "x"), (2, "y")).toDF("id", "v")
    val cfg = TableConfig(sourceTable = "s", targetTable = "t",
      mappings = List(rule("id", "id")), where = Some("v = 'x'"))
    assert(MigrationCompiler.compile(cfg, source, noDims).dataFrame.count() == 1)
    assert(MigrationCompiler.compile(cfg, source, noDims, wherePushed = true)
      .dataFrame.count() == 2)
  }
  test("on_fail=error abort check fires on violating data BEFORE any write") {
    val source = Seq(("1"), ("xx")).toDF("code")
    val cfg = TableConfig(sourceTable = "s", targetTable = "t",
      mappings = List(rule("code", "code").copy(validation =
        List(ValidationRule("regex", pattern = Some("[0-9]+$"), onFail = Some("error"))))))
    val compiled = MigrationCompiler.compile(cfg, source, noDims)
    intercept[IllegalStateException] { compiled.assertValid() }
  }
  test("on_missing=error lookup abort fires on missing keys") {
    val source = Seq((1, "10"), (2, "99")).toDF("id", "k")
    val dim = Seq((10, "TEN")).toDF("dk", "dv")
    val cfg = TableConfig(sourceTable = "s", targetTable = "t",
      mappings = List(rule("id", "id"), rule("k", "k").copy(
        lookup = Some(LookupConfig("dim", "dk", Some("dv"), Some("error"))))))
    val compiled = MigrationCompiler.compile(cfg, source,
      n => if (n == "dim") Some(dim) else None)
    intercept[IllegalStateException] { compiled.assertValid() }
  }
  test("unresolvable lookup table fails plan-time with a clear message") {
    val source = Seq((1, "10")).toDF("id", "k")
    val cfg = TableConfig(sourceTable = "s", targetTable = "t",
      mappings = List(rule("k", "k").copy(
        lookup = Some(LookupConfig("nope", "x", None, Some("null"))))))
    val ex = intercept[IllegalArgumentException] {
      MigrationCompiler.compile(cfg, source, noDims)
    }
    assert(ex.getMessage.contains("nope"))
  }

  private def t(name: String, lookupInto: String*): TableConfig =
    TableConfig(sourceTable = name, targetTable = name,
      mappings = List(rule("x", "x")) ++ lookupInto.map(d =>
        rule("y", s"y_$d").copy(lookup = Some(LookupConfig(d, "k", None, Some("null"))))))

  test("schedule orders lookup dependencies before dependents") {
    val ordered = MigrationCompiler.schedule(List(t("b", "a"), t("a")))
    assert(ordered.map(_.targetTable) == List("a", "b"))
  }
  test("scheduleWaves groups independent tables into one concurrent wave") {
    val waves = MigrationCompiler.scheduleWaves(List(t("b", "a"), t("c"), t("a"), t("d", "a")))
    assert(waves.map(_.map(_.targetTable).toSet) == List(Set("c", "a"), Set("b", "d")))
  }
  test("cyclic lookups fall back to config order without hanging") {
    val waves = MigrationCompiler.schedule(List(t("a", "b"), t("b", "a")))
    assert(waves.map(_.targetTable) == List("a", "b"))
  }
  test("self-lookup does not create a scheduling dependency") {
    val selfT = TableConfig(sourceTable = "a", targetTable = "a",
      mappings = List(rule("x", "x").copy(lookup = Some(LookupConfig("a", "x", None, None)))))
    assert(MigrationCompiler.scheduleWaves(List(selfT)).head.map(_.targetTable) == List("a"))
  }
}
