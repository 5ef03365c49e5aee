package graft

import graft.functions.TransformOps
import graft.plugins._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.scalatest.funsuite.AnyFunSuite

class PluginRegistrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("loadAndInstall resolves by class name and registers transform ops") {
    val p = PluginRegistry.loadAndInstall("graft.plugins.NormalizeNamesPlugin")
    assert(p.name == "normalize_names")
    assert(TransformOps.registered.contains("normalize_names"))
    val out = Seq("  José  GARCÍA-Lopez ").toDF("v")
      .select(TransformOps("normalize_names", col("v"), StringType))
      .collect().head.getString(0)
    // ascii letters snake_cased; non-ascii folded away by the [^a-z0-9] class
    assert(out == "jos_garc_a_lopez")
  }
  test("load rejects classes that are not graft plugins") {
    intercept[IllegalArgumentException] {
      PluginRegistry.load("java.lang.StringBuilder")
    }
  }
  test("load surfaces missing classes as ClassNotFoundException") {
    intercept[ClassNotFoundException] {
      PluginRegistry.load("graft.plugins.NoSuchPlugin")
    }
  }
  test("config-named fetcher plugin is honored by Engine.migrate") {
    import spark.implicits._
    PluginRegistry.loadAndInstall("graft.plugins.IncrementalFetcherPlugin")
    val out = java.nio.file.Files.createTempDirectory("inc_fetch").toString
    val cfg = graft.config.EtlConfig(
      graft.config.GlobalConfig(fetcherPlugin = "incremental_fetcher"),
      List(graft.config.TableConfig(sourceTable = "nation", targetTable = "n_out",
        where = Some("n_nationkey < 10"),
        mappings = List(graft.config.MappingRule(source = Some("n_nationkey"), target = Some("k"))))))
    val report = Engine.migrate(cfg,
      graft.sources.ParquetCatalog(spark, "/root/testdata/sf0.001"),
      graft.sinks.ParquetSink(out))
    assert(report.totalRows == 10L) // where still applied through the plugin scan
  }
  test("unregistered config-named plugin fails with a clear message") {
    val cfg = graft.config.EtlConfig(
      graft.config.GlobalConfig(fetcherPlugin = "no_such_fetcher"),
      List(graft.config.TableConfig(sourceTable = "nation", targetTable = "x",
        mappings = List(graft.config.MappingRule(source = Some("n_nationkey"), target = Some("k"))))))
    val ex = intercept[IllegalArgumentException] {
      Engine.migrate(cfg, graft.sources.ParquetCatalog(spark, "/root/testdata/sf0.001"),
        graft.sinks.ParquetSink("/tmp/never"))
    }
    assert(ex.getMessage.contains("no_such_fetcher"))
  }
  test("install registers capability-specific registries") {
    object FakeLoader extends LoaderPlugin {
      def name = "fake_loader"
      def sink(options: Map[String, String]) = graft.sinks.ParquetSink(options("dir"))
    }
    PluginRegistry.install(FakeLoader)
    assert(PluginRegistry.loader("fake_loader").isDefined)
    assert(PluginRegistry.fetcher("fake_loader").isEmpty)
  }
}
