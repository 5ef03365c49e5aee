package graft.plugins

import graft.functions.TransformOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/**
 * Example site plugin: the `normalize_names` transform the reference's
 * shipped config names but does not ship
 * (reference: config/tables/table_example.yaml:20 — see SURVEY
 * provenance note). Loadable via
 * `PluginRegistry.loadAndInstall("graft.plugins.NormalizeNamesPlugin")`.
 */
final class NormalizeNamesPlugin extends TransformPlugin {
  override def name: String = "normalize_names"
  override def ops: Map[String, TransformOps.Op] = Map(
    // "  José  GARCÍA-Lopez " -> "jose_garcia_lopez" (ascii-fold, snake)
    "normalize_names" -> ((c, dt) =>
      if (dt != StringType) c
      else regexp_replace(
        regexp_replace(lower(trim(c)), "[^a-z0-9]+", "_"), "^_+|_+$", "")),
  )
}
