package graft.config

import org.yaml.snakeyaml.Yaml
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/**
 * YAML config loader — same layout as the reference
 * (reference: mappings/parser.py:170-203): a main file with a `global`
 * section plus one YAML per table in `global.tables_folder`, processed
 * in `table_files` list order.
 *
 * Additionally accepts the compact string encodings the reference's
 * Excel front-end emits (reference: generate/generate_configs.py:106-187):
 *   lookup:     "on_missing:table.key=value_col"  (or "table.key=value_col")
 *   validation: "regex:^[0-9]+$,range:0-100,lookup:table.key:skip"
 */
object YamlConfig {

  def load(mainConfigPath: String): EtlConfig = {
    val path = Paths.get(mainConfigPath)
    val root = parseYaml(Files.readString(path))
    val g = loadGlobal(map(root.get("global")))
    val tablesDir = path.toAbsolutePath.getParent.resolve(g.tablesFolder)
    val tables = g.tableFiles.map { f =>
      loadTable(parseYaml(Files.readString(tablesDir.resolve(f))))
    }
    EtlConfig(g, tables)
  }

  /** Parse one table config from a YAML string (testing / programmatic use). */
  def tableFromYaml(yaml: String): TableConfig = loadTable(parseYaml(yaml))

  // ---------------------------------------------------------------- internals

  private def parseYaml(text: String): java.util.Map[String, Object] = {
    val parsed = new Yaml().load[Object](text)
    if (parsed == null) new java.util.HashMap()
    else parsed.asInstanceOf[java.util.Map[String, Object]]
  }

  private def map(o: Object): Map[String, Object] =
    if (o == null) Map.empty
    else o.asInstanceOf[java.util.Map[String, Object]].asScala.toMap

  private def str(m: Map[String, Object], k: String): Option[String] =
    m.get(k).flatMap(v => Option(v)).map(_.toString.trim).filter(_.nonEmpty)

  private def strList(o: Object): List[String] = o match {
    case null => Nil
    case s: String => s.split(",").map(_.trim).filter(_.nonEmpty).toList
    case l: java.util.List[_] => l.asScala.map(_.toString.trim).filter(_.nonEmpty).toList
    case other => List(other.toString)
  }

  private def bool(m: Map[String, Object], k: String, dflt: Boolean): Boolean =
    m.get(k) match {
      case Some(b: java.lang.Boolean) => b
      case Some(s: String) => Set("true", "1", "yes", "y").contains(s.trim.toLowerCase)
      case Some(i: java.lang.Integer) => i != 0
      case _ => dflt
    }

  private def loadGlobal(g: Map[String, Object]): GlobalConfig = {
    val conn = map(g.getOrElse("connectors", null))
    val ora = if (conn.contains("oracle")) {
      val o = map(conn("oracle"))
      Some(OracleConnectorConfig(str(o, "client_lib_dir"),
        str(o, "user").getOrElse(""), str(o, "password").getOrElse(""),
        str(o, "host").getOrElse(""), str(o, "port").getOrElse("1521"),
        str(o, "service_name").getOrElse("")))
    } else None
    val pg = if (conn.contains("postgres")) {
      val p = map(conn("postgres"))
      Some(PostgresConnectorConfig(
        str(p, "user").getOrElse(""), str(p, "password").getOrElse(""),
        str(p, "host").getOrElse(""), str(p, "port").getOrElse("5432"),
        str(p, "database").getOrElse("")))
    } else None
    GlobalConfig(
      tablesFolder = str(g, "tables_folder").getOrElse("tables"),
      batchSize = str(g, "batch_size").map(_.toInt).getOrElse(5000),
      autoMappingPlugin = str(g, "auto_mapping_plugin").getOrElse("default_auto_mapping"),
      fetcherPlugin = str(g, "fetcher_plugin").getOrElse("default_fetcher"),
      transformPlugins = g.get("transform_plugins").map(strList)
        .filter(_.nonEmpty).getOrElse(List("default_transform")),
      validationPlugins = g.get("validation_plugins").map(strList)
        .filter(_.nonEmpty).getOrElse(List("default_validation")),
      loaderPlugin = str(g, "loader_plugin").getOrElse("default_loader"),
      connectors = ConnectorsConfig(ora, pg),
      tableFiles = g.get("table_files").map(strList).getOrElse(Nil),
      quarantineTarget = str(g, "quarantine_target"),
    )
  }

  private def loadTable(t: java.util.Map[String, Object]): TableConfig = {
    val m = t.asScala.toMap
    TableConfig(
      sourceTable = str(m, "source_table").getOrElse(
        throw new IllegalArgumentException("table config needs source_table")),
      sourceSchema = str(m, "source_schema"),
      targetTable = str(m, "target_table").getOrElse(
        throw new IllegalArgumentException("table config needs target_table")),
      targetSchema = str(m, "target_schema").getOrElse("public"),
      fetcherPlugin = str(m, "fetcher_plugin"),
      mappings = m.get("mappings").map(loadMappings).getOrElse(Nil),
      where = str(m, "where"),
      transformOverride = bool(m, "transform_override", dflt = false),
      transformPlugins = m.get("transform_plugins").map(strList).getOrElse(Nil),
      loaderPlugin = str(m, "loader_plugin"),
      partitionColumn = str(m, "partition_column"),
      lowerBound = str(m, "lower_bound"),
      upperBound = str(m, "upper_bound"),
      numPartitions = str(m, "num_partitions").map(_.toInt),
    )
  }

  private def loadMappings(o: Object): List[MappingRule] =
    o.asInstanceOf[java.util.List[Object]].asScala.toList.map { r =>
      val m = map(r)
      MappingRule(
        source = str(m, "source"),
        target = str(m, "target"),
        transform = m.get("transform").map(strList).getOrElse(Nil),
        plugin = str(m, "plugin"),
        lookup = m.get("lookup").flatMap(parseLookup),
        validation = m.get("validation").map(parseValidations).getOrElse(Nil),
      )
    }

  /** Accepts both the nested-map form and the compact string form
    * "on_missing:table.key=value_col" (reference: generate/generate_configs.py:126-160). */
  private[config] def parseLookup(o: Object): Option[LookupConfig] = o match {
    case null => None
    case s: String =>
      // [on_missing:]table.key[=value_col]
      val (onMissingPart, base) = s.lastIndexOf(':') match {
        case -1 => (None, s)
        case i =>
          val head = s.substring(0, i).trim
          (Some(head).filter(h => h.nonEmpty && h.toLowerCase != "null"), s.substring(i + 1).trim)
      }
      val (tableKey, valueCol) = base.split("=", 2) match {
        case Array(tk, v) => (tk, Some(v.trim).filter(_.nonEmpty))
        case Array(tk) => (tk, None)
      }
      tableKey.split("\\.", 2) match {
        case Array(tbl, key) =>
          // value side may itself be "table.col" — keep only the column
          val vc = valueCol.map(v => v.split("\\.", 2).last)
          Some(LookupConfig(tbl.trim, key.trim, vc, onMissingPart))
        case _ =>
          throw new IllegalArgumentException(s"bad compact lookup encoding: '$s'")
      }
    case m: java.util.Map[_, _] =>
      val mm = m.asInstanceOf[java.util.Map[String, Object]].asScala.toMap
      Some(LookupConfig(
        str(mm, "table").getOrElse(throw new IllegalArgumentException("lookup needs table")),
        str(mm, "key_column").getOrElse(throw new IllegalArgumentException("lookup needs key_column")),
        str(mm, "value_column"),
        str(mm, "on_missing")))
    case other => throw new IllegalArgumentException(s"bad lookup config: $other")
  }

  /** Accepts both the list-of-maps form and the compact comma string
    * "regex:PATTERN,range:LOW-HIGH,lookup:table.key:on_missing"
    * (reference: generate/generate_configs.py:162-187). */
  private[config] def parseValidations(o: Object): List[ValidationRule] = o match {
    case null => Nil
    case s: String =>
      s.split(",").map(_.trim).filter(_.nonEmpty).toList.map { v =>
        val Array(typ, detail) = v.split(":", 2)
        typ match {
          case "regex" | "range" => ValidationRule(typ, pattern = Some(detail))
          case "lookup" =>
            val parts = detail.split(":", 2)
            val Array(tbl, key) = parts(0).split("\\.", 2)
            val onMissing = if (parts.length > 1) Some(parts(1)) else None
            ValidationRule("lookup",
              lookup = Some(LookupConfig(tbl, key, None, onMissing)),
              onFail = onMissing)
          case other => throw new IllegalArgumentException(s"unknown validation type: $other")
        }
      }
    case l: java.util.List[_] =>
      l.asScala.toList.map { r =>
        val m = map(r.asInstanceOf[Object])
        ValidationRule(
          vtype = str(m, "type").getOrElse(throw new IllegalArgumentException("validation needs type")),
          pattern = m.get("pattern").flatMap(v => Option(v)).map(_.toString),
          lookup = m.get("lookup").flatMap(parseLookup),
          // on_fail: null is MEANINGFUL (null-out action) vs absent key — the
          // reference treats both as None (null-out); we keep that collapse.
          onFail = str(m, "on_fail"),
        )
      }
    case other => throw new IllegalArgumentException(s"bad validation config: $other")
  }
}
