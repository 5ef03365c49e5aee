package graft.config

/**
 * Config ADT — the engine's "catalog"/logical-plan input.
 *
 * Mirrors the reference's Pydantic models (reference:
 * mappings/parser.py:16-167) one-to-one so existing YAML configs load
 * unchanged. The config IS the query plan: the compiler in
 * [[graft.plans.MigrationCompiler]] turns it into a Catalyst plan.
 */
final case class LookupConfig(
    table: String,
    keyColumn: String,
    valueColumn: Option[String] = None,
    onMissing: Option[String] = None, // null | skip | default:X | error (reference default: error)
)

/** reference: mappings/parser.py:42-55. `vtype` in {regex, range, lookup}. */
final case class ValidationRule(
    vtype: String,
    pattern: Option[String] = None,
    lookup: Option[LookupConfig] = None,
    onFail: Option[String] = None, // None=null-out | "skip" | "default:X" | anything else = error
)

/** reference: mappings/parser.py:60-75 (comma-string transform normalized to list). */
final case class MappingRule(
    source: Option[String] = None,
    target: Option[String] = None,
    transform: List[String] = Nil,
    plugin: Option[String] = None,
    lookup: Option[LookupConfig] = None,
    validation: List[ValidationRule] = Nil,
) {
  def targetName: String = target.orElse(source).getOrElse(
    throw new IllegalArgumentException("MappingRule needs source or target"))
  def sourceName: String = source.orElse(target).getOrElse(
    throw new IllegalArgumentException("MappingRule needs source or target"))
}

/** reference: mappings/parser.py:77-133.
  *
  * The `partition*` fields extend the reference's config with the one
  * thing its single-cursor fetch (connectors/oracle_connector.py:57-87)
  * cannot express: a range-partitioned parallel source read. When
  * `partitionColumn` is set the JDBC scan opens `numPartitions`
  * concurrent cursors over `[lowerBound, upperBound]`; absent bounds are
  * auto-derived from a one-row min/max probe at scan time. */
final case class TableConfig(
    sourceTable: String,
    sourceSchema: Option[String] = None,
    targetTable: String,
    targetSchema: String = "public",
    fetcherPlugin: Option[String] = None,
    mappings: List[MappingRule] = Nil,
    where: Option[String] = None,
    transformOverride: Boolean = false,
    transformPlugins: List[String] = Nil,
    loaderPlugin: Option[String] = None,
    partitionColumn: Option[String] = None,
    lowerBound: Option[String] = None,
    upperBound: Option[String] = None,
    numPartitions: Option[Int] = None,
) {
  /** Schema-qualified source relation — the reference fetches
    * `SELECT … FROM {schema}.{table}` (plugins/default_fetcher.py:39);
    * every scan must use this, never the bare `sourceTable`. */
  def qualifiedSource: String =
    sourceSchema.fold(sourceTable)(s => s"$s.$sourceTable")

  /** Schema-qualified target relation. The reference's default target
    * schema is "public" (mappings/parser.py:77-133), which is also the
    * Postgres search-path default — so the default stays unqualified
    * (bare writes resolve identically on Postgres, and non-Postgres
    * sinks like Derby/parquet have no "public" namespace to break on).
    * Any explicit non-default schema qualifies the write, the read-back
    * and the self-lookup fixup. */
  def qualifiedTarget: String =
    if (targetSchema == "public") targetTable else s"$targetSchema.$targetTable"
}

final case class OracleConnectorConfig(
    clientLibDir: Option[String],
    user: String, password: String, host: String, port: String, serviceName: String) {
  def jdbcUrl: String = s"jdbc:oracle:thin:@//$host:$port/$serviceName"
}
final case class PostgresConnectorConfig(
    user: String, password: String, host: String, port: String, database: String) {
  def jdbcUrl: String = s"jdbc:postgresql://$host:$port/$database"
}
final case class ConnectorsConfig(
    oracle: Option[OracleConnectorConfig], postgres: Option[PostgresConnectorConfig])

/** reference: mappings/parser.py:135-162. */
final case class GlobalConfig(
    tablesFolder: String = "tables",
    batchSize: Int = 5000, // kept for JDBC fetchsize/batchsize options
    autoMappingPlugin: String = "default_auto_mapping",
    fetcherPlugin: String = "default_fetcher",
    transformPlugins: List[String] = List("default_transform"),
    validationPlugins: List[String] = List("default_validation"),
    loaderPlugin: String = "default_loader",
    connectors: ConnectorsConfig = ConnectorsConfig(None, None),
    tableFiles: List[String] = Nil,
    // engine extension (no reference equivalent — it only warn-logs
    // skipped rows, pipeline.py:78-85): directory receiving each table's
    // skip-rejected rows as `<table>_rejects` parquet with a
    // `__rejected_by` column naming the fired rule(s).
    quarantineTarget: Option[String] = None,
) {
  require(batchSize >= 1, "batch_size must be >= 1")
}

final case class EtlConfig(global: GlobalConfig, tables: List[TableConfig])
