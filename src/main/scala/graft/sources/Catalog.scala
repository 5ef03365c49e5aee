package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Table resolver abstraction. The reference negotiates tables against
 * live Oracle/Postgres connections (reference:
 * connectors/oracle_connector.py:57-87, postgres_connector.py:52-79);
 * we resolve to DataFrames from any catalog: a parquet directory for
 * tests, partitioned JDBC for production.
 */
trait Catalog extends (String => DataFrame) {
  def table(name: String): DataFrame
  override def apply(name: String): DataFrame = table(name)

  /** Quiet resolution: Some(df) if the table exists, None otherwise —
    * without throwing (and stack-logging) an AnalysisException, so the
    * auto-mapping target probe stays silent on a missing target. */
  def tableOpt(name: String): Option[DataFrame] =
    scala.util.Try(table(name)).toOption

  /** Source scan for a table migration. Returns the frame plus whether the
    * `where` string was already applied (so the compiler must not re-apply
    * cfg.where). The where passed here may be RICHER than cfg.where — a
    * fetcher plugin can AND in a watermark — so the default implementation
    * applies it rather than dropping it; Catalyst still pushes the filter
    * into the file scan. JDBC overrides with a verbatim source-dialect
    * push (SURVEY §7.5.6). */
  def scan(name: String, where: Option[String]): (DataFrame, Boolean) =
    where match {
      case Some(w) => (table(name).filter(org.apache.spark.sql.functions.expr(w)), true)
      case None => (table(name), false)
    }
}

/** One parquet file per table under `dir` (the driver testdata layout).
  * A parquet directory has no schema namespace, so a schema-qualified
  * relation (config `source_schema`) FAILS LOUDLY instead of silently
  * scanning the wrong table — run schema-bearing configs against JDBC.
  * (`tableOpt` probes stay quiet: a qualified name simply doesn't
  * resolve, so the auto-mapping target probe never throws.) */
final case class ParquetCatalog(spark: SparkSession, dir: String) extends Catalog {
  def table(name: String): DataFrame = {
    require(!name.contains('.'),
      s"ParquetCatalog has no schema namespace: cannot scan '$name' — " +
        "remove source_schema/target_schema from the config or use a JDBC connector")
    spark.read.parquet(s"$dir/$name.parquet")
  }
  override def tableOpt(name: String): Option[DataFrame] =
    if (!name.contains('.') &&
        java.nio.file.Files.exists(java.nio.file.Paths.get(dir, s"$name.parquet")))
      Some(table(name))
    else None
}

/** Per-table range-partitioning spec for a JDBC scan. `lower`/`upper`
  * absent -> auto-derived from a one-row min/max probe at scan time
  * (one driver round-trip, like the reference's metadata probes,
  * postgres_connector.py:111-124). */
final case class JdbcPartitioning(
    column: String,
    lower: Option[String] = None,
    upper: Option[String] = None,
    numPartitions: Int = 32)

/**
 * Partitioned JDBC source — replaces the reference's single-cursor
 * single-thread fetch (reference: connectors/oracle_connector.py:57-87)
 * with N parallel range-partitioned reads.
 *
 * 100 TB design rules:
 *  - reads are partitioned whenever the table's config declares a
 *    numeric/timestamp `partition_column` (`partitioning` keys on the
 *    SOURCE table name): `numPartitions` concurrent cursors over the
 *    bound range; an unpartitioned JDBC read of a big table is a
 *    single-connection bottleneck — the reference's own pathology.
 *  - bounds not given in config are probed with ONE `SELECT min,max`
 *    over the (where-filtered) relation, so stale config can never
 *    skew the range split.
 *  - `fetchsize` maps the reference's batch_size (default 5000,
 *    reference: config/config.yaml:11) to the driver-side cursor page.
 *  - an Oracle-dialect `where` string is pushed VERBATIM via a
 *    subquery in `dbtable` so Oracle-only syntax never has to survive a
 *    round-trip through Catalyst's parser (SURVEY §7.5.6).
 */
final case class JdbcSource(
    spark: SparkSession,
    url: String,
    user: String,
    password: String,
    fetchSize: Int = 5000,
    partitioning: Map[String, JdbcPartitioning] = Map.empty) extends Catalog {

  private def reader = spark.read.format("jdbc")
    .option("url", url)
    .option("user", user)
    .option("password", password)
    .option("fetchsize", fetchSize)

  def table(name: String): DataFrame = reader.option("dbtable", name).load()

  /** Scan with verbatim (source-dialect) where-push and range partitioning.
    * The where string never round-trips through Catalyst's parser, so
    * Oracle-only syntax survives (SURVEY §7.5.6); `wherePushed=true` tells
    * the compiler not to re-apply it. */
  override def scan(table: String, where: Option[String]): (DataFrame, Boolean) = {
    val rel = where match {
      case Some(w) => s"(SELECT * FROM $table WHERE $w) graft_src"
      case None => table
    }
    val base = reader.option("dbtable", rel)
    val partitioned = partitioning.get(table) match {
      case Some(spec) =>
        probeBounds(rel, spec) match {
          case Some((lo, hi)) =>
            base.option("partitionColumn", spec.column)
              .option("lowerBound", lo).option("upperBound", hi)
              .option("numPartitions", spec.numPartitions)
          case None => base // empty table: nothing to split
        }
      case None => base
    }
    (partitioned.load(), where.isDefined)
  }

  /** Config bounds if complete, else one min/max round-trip over the
    * where-filtered relation (alias-without-AS: the one derived-table
    * spelling Oracle, Postgres AND Derby all accept). None when the
    * relation is empty. */
  private def probeBounds(rel: String, spec: JdbcPartitioning): Option[(String, String)] =
    (spec.lower, spec.upper) match {
      case (Some(lo), Some(hi)) => Some((lo, hi))
      case _ =>
        // the config-supplied column name is interpolated raw into the
        // probe SQL — validate it like JdbcSink.rawTableName does, so a
        // typo'd/hostile config fails with a clear message here rather
        // than a raw SQLException (or worse) at scan time
        require(spec.column.matches("""[A-Za-z_][A-Za-z0-9_$]*"""),
          s"illegal partition column name: '${spec.column}'")
        val c = java.sql.DriverManager.getConnection(url, user, password)
        try {
          val st = c.createStatement()
          try {
            val rs = st.executeQuery(
              s"SELECT MIN(${spec.column}), MAX(${spec.column}) FROM $rel")
            if (!rs.next()) None
            else (Option(rs.getObject(1)), Option(rs.getObject(2))) match {
              case (Some(lo), Some(hi)) =>
                Some((spec.lower.getOrElse(lo.toString), spec.upper.getOrElse(hi.toString)))
              case _ => None
            }
          } finally st.close()
        } finally c.close()
    }

  /** Startup connectivity probe (reference: cli.py:13-31) — JDBC-standard
    * `Connection.isValid`, no SQL text, so it works on every dialect
    * (Derby, for one, rejects FROM-less SELECT). */
  def checkConnectivity(): Unit = {
    val c = java.sql.DriverManager.getConnection(url, user, password)
    try require(c.isValid(5), s"connection to $url not valid") finally c.close()
  }
}
