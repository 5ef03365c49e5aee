package graft.plugins

import graft.config.{MappingRule, ValidationRule}
import graft.functions.TransformOps
import graft.sinks.Sink
import graft.sources.Catalog
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.types.{DataType, StructType}

/**
 * Plugin SPI — the Scala equivalent of the reference's five plugin
 * interfaces (reference: plugin_interfaces/{fetcher,transform,validation,
 * loader,auto_mapping}_interface.py) and its dynamic registry
 * (core/plugin_registry.py:52-97, `importlib.import_module` + scan).
 *
 * A site plugin is a class with a no-arg constructor implementing one or
 * more of these traits; [[PluginRegistry.load]] resolves it by fully
 * qualified class name (`Class.forName` replaces importlib) and
 * [[PluginRegistry.install]] registers each capability. The named-but-
 * missing plugins in the reference's shipped config (incremental_fetcher,
 * bulk_loader, normalize_names, calculate_age_transform — see SURVEY
 * provenance note) are exactly the kinds of extensions these traits
 * carry.
 */
trait GraftPlugin {
  /** Registry name (the reference's module-name key). */
  def name: String
}

/** Contributes transform ops (reference: transform_interface.py). Ops are
  * Column rewrites — they compose into the same codegen'd chain as the
  * built-ins, never per-row functions. */
trait TransformPlugin extends GraftPlugin {
  def ops: Map[String, TransformOps.Op]
}

/** Alternative source scan (reference: fetcher_interface.py) — e.g. an
  * incremental fetcher restricting the scan to a watermark window. */
trait FetcherPlugin extends GraftPlugin {
  def scan(catalog: Catalog, table: String, where: Option[String]): (DataFrame, Boolean)
}

/** Custom validation predicate (reference: validation_interface.py):
  * return Some(okPredicate) for rule types this plugin owns. */
trait ValidationPlugin extends GraftPlugin {
  def okPredicate(rule: ValidationRule, value: Column, dt: DataType): Option[Column]
}

/** Alternative sink (reference: loader_interface.py) — e.g. a bulk
  * loader using COPY instead of batched INSERT. */
trait LoaderPlugin extends GraftPlugin {
  def sink(options: Map[String, String]): Sink
}

/** Mapping derivation (reference: auto_mapping_interface.py). */
trait AutoMappingPlugin extends GraftPlugin {
  def derive(source: StructType, target: Option[StructType]): List[MappingRule]
}

object PluginRegistry {

  private val fetchers = new java.util.concurrent.ConcurrentHashMap[String, FetcherPlugin]()
  private val validators = new java.util.concurrent.ConcurrentHashMap[String, ValidationPlugin]()
  private val loaders = new java.util.concurrent.ConcurrentHashMap[String, LoaderPlugin]()
  private val autoMappers = new java.util.concurrent.ConcurrentHashMap[String, AutoMappingPlugin]()
  private val transforms = new java.util.concurrent.ConcurrentHashMap[String, TransformPlugin]()

  /** Instantiate a plugin class by fully qualified name (the `Class.forName`
    * equivalent of the reference's importlib resolution). */
  def load(className: String): GraftPlugin =
    Class.forName(className).getDeclaredConstructor().newInstance() match {
      case p: GraftPlugin => p
      case other => throw new IllegalArgumentException(
        s"$className does not implement a graft plugin trait (got ${other.getClass})")
    }

  /** Register every capability the plugin implements (the reference scans
    * a module for all interface implementations, plugin_registry.py:78-91). */
  def install(plugin: GraftPlugin): Unit = {
    plugin match {
      case p: TransformPlugin =>
        transforms.put(p.name, p)
        // also into the global op registry for direct programmatic use;
        // CONFIG-scoped resolution (MigrationCompiler) shadows ops whose
        // plugin isn't in the table's configured chain.
        p.ops.foreach { case (n, op) => TransformOps.register(n, op) }
      case _ => ()
    }
    plugin match { case p: FetcherPlugin => fetchers.put(p.name, p); case _ => () }
    plugin match { case p: ValidationPlugin => validators.put(p.name, p); case _ => () }
    plugin match { case p: LoaderPlugin => loaders.put(p.name, p); case _ => () }
    plugin match { case p: AutoMappingPlugin => autoMappers.put(p.name, p); case _ => () }
  }

  def loadAndInstall(className: String): GraftPlugin = {
    val p = load(className); install(p); p
  }

  def fetcher(name: String): Option[FetcherPlugin] = Option(fetchers.get(name))
  def validator(name: String): Option[ValidationPlugin] = Option(validators.get(name))
  def loader(name: String): Option[LoaderPlugin] = Option(loaders.get(name))
  def autoMapper(name: String): Option[AutoMappingPlugin] = Option(autoMappers.get(name))
  def transform(name: String): Option[TransformPlugin] = Option(transforms.get(name))

  /** Every op name contributed by ANY registered transform plugin — the
    * set config-scoped resolution must shadow when the owning plugin is
    * not in a table's chain. */
  def allTransformOpNames: Set[String] = {
    import scala.jdk.CollectionConverters._
    transforms.values().asScala.flatMap(_.ops.keySet).toSet
  }

  /** Resolve a config-named plugin or fail loudly — a non-default name
    * that is not registered must never silently degrade to default
    * behavior (the reference resolves modules by exactly these config
    * fields, core/plugin_registry.py:52-97). */
  def required[P](name: String, get: String => Option[P], kind: String): P =
    get(name).getOrElse(throw new IllegalArgumentException(
      s"$kind plugin '$name' named in config but not registered — " +
        "load it via PluginRegistry.loadAndInstall or --plugin"))
}
