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

  // ---- config-dispatched plugin chains (validation / auto-mapping / transform)

  test("a chained validation plugin claims its rule type; the default chain rejects it") {
    graft.plugins.PluginRegistry.install(new graft.plugins.LengthValidationPlugin)
    val source = Seq(("abc"), ("toolongvalue"), ("x")).toDF("code")
    val cfg = TableConfig(sourceTable = "s", targetTable = "t",
      mappings = List(rule("code", "code").copy(validation =
        List(ValidationRule("length", pattern = Some("2-5"), onFail = Some("skip"))))))
    val out = MigrationCompiler.compile(cfg, source, noDims,
      global = GlobalConfig(validationPlugins = List("length_validation", "default_validation")))
      .dataFrame.collect().map(_.getString(0)).toSet
    assert(out == Set("abc")) // "toolongvalue" and "x" skipped by the plugin rule
    // same config through the default chain: nothing claims 'length' -> loud error
    val ex = intercept[IllegalArgumentException] {
      MigrationCompiler.compile(cfg, source, noDims).dataFrame
    }
    assert(ex.getMessage.contains("length") && ex.getMessage.contains("validation chain"))
  }

  test("an unregistered validation plugin name in the chain fails loudly") {
    val source = Seq("a").toDF("code")
    val cfg = TableConfig(sourceTable = "s", targetTable = "t",
      mappings = List(rule("code", "code").copy(validation =
        List(ValidationRule("regex", pattern = Some("^a"))))))
    val ex = intercept[IllegalArgumentException] {
      MigrationCompiler.compile(cfg, source, noDims,
        global = GlobalConfig(validationPlugins = List("no_such_validator")))
    }
    assert(ex.getMessage.contains("no_such_validator"))
  }

  test("a configured auto-mapping plugin derives the rules; unregistered names throw") {
    object PrefixMapper extends graft.plugins.AutoMappingPlugin {
      def name = "prefix_strip_mapper"
      def derive(source: org.apache.spark.sql.types.StructType,
                 target: Option[org.apache.spark.sql.types.StructType]) =
        source.fields.toList.map(f =>
          MappingRule(source = Some(f.name), target = Some(f.name.stripPrefix("src_"))))
    }
    graft.plugins.PluginRegistry.install(PrefixMapper)
    val source = Seq((1, "a")).toDF("src_id", "src_name")
    val cfg = TableConfig(sourceTable = "s", targetTable = "t")
    val out = MigrationCompiler.compile(cfg, source, noDims,
      global = GlobalConfig(autoMappingPlugin = "prefix_strip_mapper")).dataFrame
    assert(out.columns.toSeq == Seq("id", "name")) // plugin visibly changed the plan
    val ex = intercept[IllegalArgumentException] {
      MigrationCompiler.compile(cfg, source, noDims,
        global = GlobalConfig(autoMappingPlugin = "missing_mapper"))
    }
    assert(ex.getMessage.contains("missing_mapper"))
  }

  test("transform_override replaces the global chain; unchained plugin ops never leak") {
    graft.plugins.PluginRegistry.loadAndInstall("graft.plugins.NormalizeNamesPlugin")
    val source = Seq(("  A B  ")).toDF("v")
    // chain = [normalize_names] ONLY: plugin op applies, builtin 'upper' is inert
    val overridden = TableConfig(sourceTable = "s", targetTable = "t",
      transformOverride = true, transformPlugins = List("normalize_names"),
      mappings = List(rule("v", "v", "normalize_names,upper")))
    val got = MigrationCompiler.compile(overridden, source, noDims).dataFrame
      .collect().head.getString(0)
    assert(got == "a_b") // snake-cased, NOT uppercased
    // default chain: the registered-but-unchained plugin op must NOT leak
    val defaultChain = TableConfig(sourceTable = "s", targetTable = "t",
      mappings = List(rule("v", "v", "normalize_names,upper")))
    val got2 = MigrationCompiler.compile(defaultChain, source, noDims).dataFrame
      .collect().head.getString(0)
    assert(got2 == "  A B  ".toUpperCase) // identity for the plugin op, builtin upper applies
    // unregistered chain name: loud error
    val ex = intercept[IllegalArgumentException] {
      MigrationCompiler.compile(
        defaultChain.copy(transformPlugins = List("ghost_plugin")), source, noDims)
    }
    assert(ex.getMessage.contains("ghost_plugin"))
  }

  test("chain order decides which plugin claims an op name") {
    object UpperShadow extends graft.plugins.TransformPlugin {
      def name = "upper_shadow"
      def ops: Map[String, graft.functions.TransformOps.Op] =
        Map("upper" -> ((_, _) => org.apache.spark.sql.functions.lit("CLAIMED")))
    }
    graft.plugins.PluginRegistry.install(UpperShadow)
    val source = Seq("abc").toDF("v")
    val cfg = TableConfig(sourceTable = "s", targetTable = "t",
      mappings = List(rule("v", "v", "upper")))
    def run(chain: List[String]): String =
      MigrationCompiler.compile(cfg, source, noDims,
        global = GlobalConfig(transformPlugins = chain)).dataFrame.collect().head.getString(0)
    // plugin BEFORE default_transform: the plugin claims 'upper'
    assert(run(List("upper_shadow", "default_transform")) == "CLAIMED")
    // default_transform first: the builtin claims it, the override is inert
    assert(run(List("default_transform", "upper_shadow")) == "ABC")
    // plugin registered but NOT in the chain: builtin untouched
    assert(run(List("default_transform")) == "ABC")
  }

  test("a rule-level plugin grants that rule the plugin's ops") {
    graft.plugins.PluginRegistry.loadAndInstall("graft.plugins.NormalizeNamesPlugin")
    val source = Seq(("  A B  ", "  C D  ")).toDF("x", "y")
    val cfg = TableConfig(sourceTable = "s", targetTable = "t",
      mappings = List(
        rule("x", "x", "normalize_names").copy(plugin = Some("normalize_names")),
        rule("y", "y", "normalize_names"))) // no rule plugin, default chain -> inert
    val row = MigrationCompiler.compile(cfg, source, noDims).dataFrame.collect().head
    assert(row.getString(0) == "a_b")
    assert(row.getString(1) == "  C D  ")
  }
}
