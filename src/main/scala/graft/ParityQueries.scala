package graft

import graft.config._
import graft.plans.MigrationCompiler
import graft.sources.ParquetCatalog
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * SURVEY §2 parity inventory, one driver-verifiable query per operator.
 * Every query goes THROUGH the engine (TableConfig -> MigrationCompiler)
 * so the DuckDB hash-compare exercises the real compile path, not ad-hoc
 * DataFrame code. Each query ends with a total deterministic order
 * (all columns, ASC NULLS FIRST) matching the oracle's ORDER BY, so the
 * compare is stable regardless of partitioning.
 */
object ParityQueries {

  /** deterministic total order over every output column */
  private def det(df: DataFrame): DataFrame =
    df.orderBy(df.columns.map(c => col(c).asc_nulls_first).toIndexedSeq: _*)

  private def prep(s: SparkSession): Unit = {
    // permissive casts (invalid -> null), matching the reference's
    // Python coercion semantics; oracle SQL uses TRY_CAST for the same.
    s.conf.set("spark.sql.ansi.enabled", "false")
  }

  private def rule(src: String, tgt: String, ops: String = ""): MappingRule =
    MappingRule(source = Some(src), target = Some(tgt),
      transform = ops.split(",").map(_.trim).filter(_.nonEmpty).toList)

  private def compile(cfg: TableConfig, source: DataFrame,
                      resolve: String => Option[DataFrame]): DataFrame = {
    val compiled = MigrationCompiler.compile(cfg, source, resolve)
    compiled.assertValid()
    compiled.dataFrame
  }

  private def runTable(s: SparkSession, dir: String, cfg: TableConfig,
                       dims: Map[String, DataFrame] = Map.empty): DataFrame = {
    prep(s)
    val cat = ParquetCatalog(s, dir)
    val resolve: String => Option[DataFrame] = n => dims.get(n).orElse(cat.tableOpt(n))
    det(compile(cfg, cat.table(cfg.sourceTable), resolve))
  }

  private def runPrepared(s: SparkSession, dir: String, source: DataFrame,
                          cfg: TableConfig,
                          dims: Map[String, DataFrame] = Map.empty): DataFrame = {
    prep(s)
    val cat = ParquetCatalog(s, dir)
    val resolve: String => Option[DataFrame] = n => dims.get(n).orElse(cat.tableOpt(n))
    det(compile(cfg, source, resolve))
  }

  private def tbl(src: String, mappings: List[MappingRule],
                  where: Option[String] = None, target: String = "out"): TableConfig =
    TableConfig(sourceTable = src, targetTable = target, mappings = mappings, where = where)

  // ------------------------------------------------------------------ queries

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // 2.1a/b Oracle scan + projection pushdown
    "q_scan_projection" -> ((s, dir) => runTable(s, dir,
      tbl("customer", List(rule("c_custkey", "c_custkey"), rule("c_name", "c_name"))))),

    // 2.1c filter pushdown (config `where` string on source columns)
    "q_where_pushdown" -> ((s, dir) => runTable(s, dir,
      tbl("orders",
        List(rule("o_orderkey", "o_orderkey"), rule("o_orderstatus", "o_orderstatus"),
          rule("o_totalprice", "o_totalprice")),
        where = Some("o_orderstatus = 'F' AND o_totalprice > 100000.0")))),

    // 2.1d schema-degrading retry -> plan-time NULL scan of missing column
    "q_schema_degrade" -> ((s, dir) => runTable(s, dir,
      tbl("customer", List(rule("c_custkey", "c_custkey"),
        rule("c_phone", "phone"), rule("c_mktsegment", "segment"))))),

    // 2.1f generic statement exec -> SQL passthrough over registered tables
    "q_sql_passthrough" -> ((s, dir) => {
      prep(s)
      val cat = ParquetCatalog(s, dir)
      Seq("nation", "region").foreach(t => cat.table(t).createOrReplaceTempView(t))
      det(s.sql(
        """SELECT n_name, r_name FROM nation JOIN region
          |ON n_regionkey = r_regionkey WHERE r_name = 'ASIA'""".stripMargin))
    }),

    // 2.2 rename projection
    "q_rename_projection" -> ((s, dir) => runTable(s, dir,
      tbl("customer", List(rule("c_custkey", "id"), rule("c_name", "name"))))),

    // 2.3a strip (Python-style whitespace strip)
    "q_transform_strip" -> ((s, dir) => {
      val src = ParquetCatalog(s, dir).table("customer")
        .withColumn("c_name_padded", concat(lit("  \t"), col("c_name"), lit(" \n")))
      runPrepared(s, dir, src,
        tbl("customer", List(rule("c_custkey", "id"), rule("c_name_padded", "name", "strip"))))
    }),

    // 2.3b upper
    "q_transform_upper" -> ((s, dir) => runTable(s, dir,
      tbl("customer", List(rule("c_custkey", "id"), rule("c_name", "name", "upper"))))),

    // 2.3c lower
    "q_transform_lower" -> ((s, dir) => runTable(s, dir,
      tbl("customer", List(rule("c_custkey", "id"), rule("c_mktsegment", "segment", "lower"))))),

    // 2.3f capitalize (Python str.capitalize: first upper, rest lower)
    "q_transform_capitalize" -> ((s, dir) => runTable(s, dir,
      tbl("customer", List(rule("c_custkey", "id"), rule("c_mktsegment", "segment", "capitalize"))))),

    // 2.3d Y/N -> bool (op name merely contains "true"/"false")
    "q_transform_ynbool" -> ((s, dir) => {
      val src = ParquetCatalog(s, dir).table("lineitem")
        .withColumn("returned_flag", when(col("l_returnflag") === "R", lit("Y")).otherwise(lit("N")))
      runPrepared(s, dir, src,
        tbl("lineitem", List(rule("l_orderkey", "okey"), rule("l_linenumber", "lnum"),
          rule("returned_flag", "returned", "to_true_false"))))
    }),

    // 2.3e insert:VAL constant injection (incl. insert:null on a missing source)
    "q_transform_insert" -> ((s, dir) => runTable(s, dir,
      tbl("customer", List(rule("c_custkey", "id"),
        rule("c_custkey", "etl_flag", "insert:loaded"),
        MappingRule(target = Some("note"), transform = List("insert:null")))))),

    // 2.3f to_int (permissive cast)
    "q_transform_to_int" -> ((s, dir) => {
      val src = ParquetCatalog(s, dir).table("customer")
        .withColumn("idstr", regexp_extract(col("c_name"), "([0-9]+)", 1))
      runPrepared(s, dir, src,
        tbl("customer", List(rule("c_custkey", "id"), rule("idstr", "parsed_id", "to_int"))))
    }),

    // 2.3f to_date
    "q_transform_to_date" -> ((s, dir) => runTable(s, dir,
      tbl("orders", List(rule("o_orderkey", "id"), rule("o_orderdate", "odate", "to_date"))))),

    // 2.3g op chaining (ordered fold)
    "q_transform_chain" -> ((s, dir) => {
      val src = ParquetCatalog(s, dir).table("customer")
        .withColumn("seg_padded", concat(lit("  "), col("c_mktsegment"), lit("  ")))
      runPrepared(s, dir, src,
        tbl("customer", List(rule("c_custkey", "id"), rule("seg_padded", "segment", "strip,capitalize"))))
    }),

    // 2.4a regex validation, on_fail null / default / skip
    "q_validate_regex_null" -> ((s, dir) => runTable(s, dir,
      tbl("customer", List(rule("c_custkey", "id"),
        rule("c_mktsegment", "segment").copy(validation =
          List(ValidationRule("regex", pattern = Some("B.*")))))))),
    "q_validate_regex_default" -> ((s, dir) => runTable(s, dir,
      tbl("customer", List(rule("c_custkey", "id"),
        rule("c_mktsegment", "segment").copy(validation =
          List(ValidationRule("regex", pattern = Some("B.*"), onFail = Some("default:OTHER")))))))),
    "q_validate_regex_skip" -> ((s, dir) => runTable(s, dir,
      tbl("customer", List(rule("c_custkey", "id"),
        rule("c_mktsegment", "segment").copy(validation =
          List(ValidationRule("regex", pattern = Some("B.*"), onFail = Some("skip")))))))),

    // 2.4d on_fail=error with a clean column: passes through, assertion wired
    "q_validate_regex_error" -> ((s, dir) => runTable(s, dir,
      tbl("customer", List(rule("c_custkey", "id"),
        rule("c_name", "name").copy(validation =
          List(ValidationRule("regex", pattern = Some("Customer#[0-9]+"), onFail = Some("error")))))))),

    // 2.4b range validation "min-max" + default action
    "q_validate_range_default" -> ((s, dir) => runTable(s, dir,
      tbl("customer", List(rule("c_custkey", "id"),
        rule("c_acctbal", "acctbal").copy(validation =
          List(ValidationRule("range", pattern = Some("0-5000"), onFail = Some("default:0")))))))),

    // 2.4b range ">=X" form (the example config's unparseable-by-reference form)
    "q_validate_range_gte" -> ((s, dir) => runTable(s, dir,
      tbl("supplier", List(rule("s_suppkey", "id"),
        rule("s_acctbal", "acctbal").copy(validation =
          List(ValidationRule("range", pattern = Some(">=0")))))))),

    // 2.4b + 2.6 range with skip action (row drop)
    "q_validate_range_skip" -> ((s, dir) => runTable(s, dir,
      tbl("lineitem", List(rule("l_orderkey", "okey"), rule("l_linenumber", "lnum"),
        rule("l_quantity", "qty").copy(validation =
          List(ValidationRule("range", pattern = Some("1-25"), onFail = Some("skip")))))))),

    // 2.4e null bypass: NULL values pass every validation
    "q_validate_null_bypass" -> ((s, dir) => {
      val src = ParquetCatalog(s, dir).table("customer")
        .withColumn("bal", when(col("c_custkey") % 10 === 0, lit(null)).otherwise(col("c_acctbal")))
      runPrepared(s, dir, src,
        tbl("customer", List(rule("c_custkey", "id"),
          rule("bal", "bal").copy(validation =
            List(ValidationRule("range", pattern = Some("0-5000"), onFail = Some("skip")))))))
    }),

    // 2.4c lookup-existence validation (semi/anti join), null + skip actions
    "q_validate_lookup_null" -> ((s, dir) => {
      val dim = ParquetCatalog(s, dir).table("nation").filter(col("n_regionkey") === 0)
      runTable(s, dir,
        tbl("customer", List(rule("c_custkey", "id"),
          rule("c_nationkey", "nkey").copy(validation =
            List(ValidationRule("lookup", lookup = Some(LookupConfig("nation_r0", "n_nationkey"))))))),
        dims = Map("nation_r0" -> dim))
    }),
    "q_validate_lookup_skip" -> ((s, dir) => {
      val dim = ParquetCatalog(s, dir).table("nation").filter(col("n_regionkey") === 0)
      runTable(s, dir,
        tbl("customer", List(rule("c_custkey", "id"),
          rule("c_nationkey", "nkey").copy(validation =
            List(ValidationRule("lookup", lookup = Some(LookupConfig("nation_r0", "n_nationkey")),
              onFail = Some("skip")))))),
        dims = Map("nation_r0" -> dim))
    }),

    // 2.5a external lookup join, on_missing matrix
    "q_lookup_external_null" -> ((s, dir) => {
      val dim = ParquetCatalog(s, dir).table("nation").filter(col("n_regionkey").isin(0, 1))
      runTable(s, dir,
        tbl("customer", List(rule("c_custkey", "id"),
          rule("c_nationkey", "nation_name").copy(lookup =
            Some(LookupConfig("nation_r01", "n_nationkey", Some("n_name"), Some("null")))))),
        dims = Map("nation_r01" -> dim))
    }),
    "q_lookup_external_default" -> ((s, dir) => {
      val dim = ParquetCatalog(s, dir).table("nation").filter(col("n_regionkey").isin(0, 1))
      runTable(s, dir,
        tbl("customer", List(rule("c_custkey", "id"),
          rule("c_nationkey", "nation_name").copy(lookup =
            Some(LookupConfig("nation_r01", "n_nationkey", Some("n_name"), Some("default:N/A")))))),
        dims = Map("nation_r01" -> dim))
    }),
    "q_lookup_external_skip" -> ((s, dir) => {
      val dim = ParquetCatalog(s, dir).table("nation").filter(col("n_regionkey").isin(0, 1))
      runTable(s, dir,
        tbl("customer", List(rule("c_custkey", "id"),
          rule("c_nationkey", "nation_name").copy(lookup =
            Some(LookupConfig("nation_r01", "n_nationkey", Some("n_name"), Some("skip")))))),
        dims = Map("nation_r01" -> dim))
    }),

    // 2.5b/c self-lookup: FK re-keying through the table's own rows in one
    // self-join (vs the reference's tmp column + UPDATE…FROM fixup)
    "q_lookup_self" -> ((s, dir) => runTable(s, dir,
      TableConfig(sourceTable = "customer", targetTable = "customer",
        mappings = List(rule("c_custkey", "id"), rule("c_name", "name"),
          rule("c_nationkey", "parent_name").copy(lookup =
            Some(LookupConfig("customer", "id", Some("name")))))))),

    // 2.6 combined skip-filter with where
    "q_filter_skip" -> ((s, dir) => runTable(s, dir,
      tbl("customer",
        List(rule("c_custkey", "id"),
          rule("c_acctbal", "acctbal").copy(validation =
            List(ValidationRule("range", pattern = Some(">=0"), onFail = Some("skip")))),
          rule("c_mktsegment", "segment").copy(validation =
            List(ValidationRule("regex", pattern = Some("(B|A).*"), onFail = Some("skip"))))),
        where = Some("c_custkey % 2 = 0")))),

    // 2.7 sink: truncate-overwrite write + read-back round trip
    "q_sink_roundtrip" -> ((s, dir) => {
      prep(s)
      val cat = ParquetCatalog(s, dir)
      val out = java.nio.file.Files.createTempDirectory("graft_sink").toString
      val cfg = EtlConfig(GlobalConfig(), List(
        TableConfig(sourceTable = "nation", targetTable = "nation_out",
          mappings = List(rule("n_nationkey", "key"), rule("n_name", "name")))))
      Engine.migrate(cfg, cat, graft.sinks.ParquetSink(out))
      det(s.read.parquet(s"$out/nation_out.parquet"))
    }),

    // 2.8 auto-mapping: empty mappings -> 1:1 identity from schema
    "q_auto_mapping" -> ((s, dir) => runTable(s, dir,
      TableConfig(sourceTable = "region", targetTable = "region_out"))),

    // 2.12 YAML config path incl. the Excel front-end's COMPACT encodings
    // (reference: generate/generate_configs.py:106-187): the config text
    // below goes YAML -> TableConfig -> compile, nothing hand-built.
    "q_yaml_compact" -> ((s, dir) => runTable(s, dir,
      YamlConfig.tableFromYaml(
        """source_table: customer
          |target_table: customer_out
          |where: "c_mktsegment <> 'MACHINERY'"
          |mappings:
          |  - source: c_custkey
          |    target: id
          |  - source: c_name
          |    target: name
          |    transform: "strip, capitalize"
          |  - source: c_acctbal
          |    target: acctbal
          |    validation: "range:0-5000"
          |  - source: c_nationkey
          |    target: nation_name
          |    lookup: "null:nation.n_nationkey=n_name"
          |""".stripMargin))),

    // §7.2 flagship end-to-end slice: where + transforms + range-default +
    // broadcast lookup in one compiled plan
    "q_pipeline_e2e" -> ((s, dir) => runTable(s, dir,
      tbl("customer",
        List(rule("c_custkey", "id"),
          rule("c_name", "name", "strip,capitalize"),
          rule("c_acctbal", "acctbal").copy(validation =
            List(ValidationRule("range", pattern = Some("0.0-10000.0"), onFail = Some("default:0")))),
          rule("c_nationkey", "nation_name").copy(lookup =
            Some(LookupConfig("nation", "n_nationkey", Some("n_name"), Some("null"))))),
        where = Some("c_mktsegment = 'BUILDING'")))),
  )

  // ------------------------------------------------------------- oracle SQL

  private val N1 = "NULLS FIRST"

  val oracleSql: Map[String, String] = Map(
    "q_scan_projection" ->
      s"SELECT c_custkey, c_name FROM customer ORDER BY c_custkey $N1, c_name $N1",
    "q_where_pushdown" ->
      s"""SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
         |WHERE o_orderstatus = 'F' AND o_totalprice > 100000.0
         |ORDER BY o_orderkey $N1, o_orderstatus $N1, o_totalprice $N1""".stripMargin,
    "q_schema_degrade" ->
      s"""SELECT c_custkey, CAST(NULL AS VARCHAR) AS phone, c_mktsegment AS segment
         |FROM customer ORDER BY c_custkey $N1, phone $N1, segment $N1""".stripMargin,
    "q_sql_passthrough" ->
      s"""SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA' ORDER BY n_name $N1, r_name $N1""".stripMargin,
    "q_rename_projection" ->
      s"SELECT c_custkey AS id, c_name AS name FROM customer ORDER BY id $N1, name $N1",
    "q_transform_strip" ->
      s"SELECT c_custkey AS id, c_name AS name FROM customer ORDER BY id $N1, name $N1",
    "q_transform_upper" ->
      s"SELECT c_custkey AS id, upper(c_name) AS name FROM customer ORDER BY id $N1, name $N1",
    "q_transform_lower" ->
      s"SELECT c_custkey AS id, lower(c_mktsegment) AS segment FROM customer ORDER BY id $N1, segment $N1",
    "q_transform_capitalize" ->
      s"""SELECT c_custkey AS id,
         |upper(substr(c_mktsegment,1,1)) || lower(substr(c_mktsegment,2)) AS segment
         |FROM customer ORDER BY id $N1, segment $N1""".stripMargin,
    "q_transform_ynbool" ->
      s"""SELECT l_orderkey AS okey, l_linenumber AS lnum,
         |(l_returnflag = 'R') AS returned
         |FROM lineitem ORDER BY okey $N1, lnum $N1, returned $N1""".stripMargin,
    "q_transform_insert" ->
      s"""SELECT c_custkey AS id, 'loaded' AS etl_flag, CAST(NULL AS VARCHAR) AS note
         |FROM customer ORDER BY id $N1, etl_flag $N1, note $N1""".stripMargin,
    "q_transform_to_int" ->
      s"""SELECT c_custkey AS id,
         |TRY_CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS parsed_id
         |FROM customer ORDER BY id $N1, parsed_id $N1""".stripMargin,
    "q_transform_to_date" ->
      s"""SELECT o_orderkey AS id, CAST(o_orderdate AS DATE) AS odate
         |FROM orders ORDER BY id $N1, odate $N1""".stripMargin,
    "q_transform_chain" ->
      s"""SELECT c_custkey AS id,
         |upper(substr(c_mktsegment,1,1)) || lower(substr(c_mktsegment,2)) AS segment
         |FROM customer ORDER BY id $N1, segment $N1""".stripMargin,
    "q_validate_regex_null" ->
      s"""SELECT c_custkey AS id,
         |CASE WHEN c_mktsegment IS NULL OR regexp_matches(c_mktsegment, '^(?:B.*)')
         |     THEN c_mktsegment END AS segment
         |FROM customer ORDER BY id $N1, segment $N1""".stripMargin,
    "q_validate_regex_default" ->
      s"""SELECT c_custkey AS id,
         |CASE WHEN c_mktsegment IS NULL OR regexp_matches(c_mktsegment, '^(?:B.*)')
         |     THEN c_mktsegment ELSE 'OTHER' END AS segment
         |FROM customer ORDER BY id $N1, segment $N1""".stripMargin,
    "q_validate_regex_skip" ->
      s"""SELECT c_custkey AS id, c_mktsegment AS segment FROM customer
         |WHERE c_mktsegment IS NULL OR regexp_matches(c_mktsegment, '^(?:B.*)')
         |ORDER BY id $N1, segment $N1""".stripMargin,
    "q_validate_regex_error" ->
      s"SELECT c_custkey AS id, c_name AS name FROM customer ORDER BY id $N1, name $N1",
    "q_validate_range_default" ->
      s"""SELECT c_custkey AS id,
         |CASE WHEN c_acctbal IS NULL OR (c_acctbal >= 0 AND c_acctbal <= 5000)
         |     THEN c_acctbal ELSE 0.0 END AS acctbal
         |FROM customer ORDER BY id $N1, acctbal $N1""".stripMargin,
    "q_validate_range_gte" ->
      s"""SELECT s_suppkey AS id,
         |CASE WHEN s_acctbal IS NULL OR s_acctbal >= 0 THEN s_acctbal END AS acctbal
         |FROM supplier ORDER BY id $N1, acctbal $N1""".stripMargin,
    "q_validate_range_skip" ->
      s"""SELECT l_orderkey AS okey, l_linenumber AS lnum, l_quantity AS qty
         |FROM lineitem WHERE l_quantity IS NULL OR (l_quantity >= 1 AND l_quantity <= 25)
         |ORDER BY okey $N1, lnum $N1, qty $N1""".stripMargin,
    "q_validate_null_bypass" ->
      s"""WITH src AS (SELECT c_custkey,
         |  CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE c_acctbal END AS bal FROM customer)
         |SELECT c_custkey AS id, bal FROM src
         |WHERE bal IS NULL OR (bal >= 0 AND bal <= 5000)
         |ORDER BY id $N1, bal $N1""".stripMargin,
    "q_validate_lookup_null" ->
      s"""SELECT c_custkey AS id,
         |CASE WHEN c_nationkey IS NULL
         |       OR c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
         |     THEN c_nationkey END AS nkey
         |FROM customer ORDER BY id $N1, nkey $N1""".stripMargin,
    "q_validate_lookup_skip" ->
      s"""SELECT c_custkey AS id, c_nationkey AS nkey FROM customer
         |WHERE c_nationkey IS NULL
         |   OR c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
         |ORDER BY id $N1, nkey $N1""".stripMargin,
    "q_lookup_external_null" ->
      s"""SELECT c.c_custkey AS id, n.n_name AS nation_name FROM customer c
         |LEFT JOIN (SELECT n_nationkey, n_name FROM nation WHERE n_regionkey IN (0,1)) n
         |ON CAST(c.c_nationkey AS VARCHAR) = CAST(n.n_nationkey AS VARCHAR)
         |ORDER BY id $N1, nation_name $N1""".stripMargin,
    "q_lookup_external_default" ->
      s"""SELECT c.c_custkey AS id,
         |CASE WHEN c.c_nationkey IS NULL THEN NULL ELSE COALESCE(n.n_name, 'N/A') END AS nation_name
         |FROM customer c
         |LEFT JOIN (SELECT n_nationkey, n_name FROM nation WHERE n_regionkey IN (0,1)) n
         |ON CAST(c.c_nationkey AS VARCHAR) = CAST(n.n_nationkey AS VARCHAR)
         |ORDER BY id $N1, nation_name $N1""".stripMargin,
    "q_lookup_external_skip" ->
      s"""SELECT c.c_custkey AS id, n.n_name AS nation_name FROM customer c
         |JOIN (SELECT n_nationkey, n_name FROM nation WHERE n_regionkey IN (0,1)) n
         |ON CAST(c.c_nationkey AS VARCHAR) = CAST(n.n_nationkey AS VARCHAR)
         |ORDER BY id $N1, nation_name $N1""".stripMargin,
    "q_lookup_self" ->
      s"""SELECT t.c_custkey AS id, t.c_name AS name, s.c_name AS parent_name
         |FROM customer t LEFT JOIN customer s
         |ON CAST(t.c_nationkey AS VARCHAR) = CAST(s.c_custkey AS VARCHAR)
         |ORDER BY id $N1, name $N1, parent_name $N1""".stripMargin,
    "q_filter_skip" ->
      s"""SELECT c_custkey AS id, c_acctbal AS acctbal, c_mktsegment AS segment
         |FROM customer
         |WHERE c_custkey % 2 = 0
         |  AND (c_acctbal IS NULL OR c_acctbal >= 0)
         |  AND (c_mktsegment IS NULL OR regexp_matches(c_mktsegment, '^(?:(B|A).*)'))
         |ORDER BY id $N1, acctbal $N1, segment $N1""".stripMargin,
    "q_sink_roundtrip" ->
      s"SELECT n_nationkey AS key, n_name AS name FROM nation ORDER BY key $N1, name $N1",
    "q_auto_mapping" ->
      s"SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey $N1, r_name $N1",
    "q_yaml_compact" ->
      s"""SELECT c.c_custkey AS id,
         |  upper(substr(c.c_name,1,1)) || lower(substr(c.c_name,2)) AS name,
         |  CASE WHEN c.c_acctbal IS NULL OR (c.c_acctbal >= 0 AND c.c_acctbal <= 5000)
         |       THEN c.c_acctbal END AS acctbal,
         |  n.n_name AS nation_name
         |FROM customer c
         |LEFT JOIN nation n ON CAST(c.c_nationkey AS VARCHAR) = CAST(n.n_nationkey AS VARCHAR)
         |WHERE c.c_mktsegment <> 'MACHINERY'
         |ORDER BY id $N1, name $N1, acctbal $N1, nation_name $N1""".stripMargin,
    "q_pipeline_e2e" ->
      s"""SELECT c.c_custkey AS id,
         |  upper(substr(c.c_name,1,1)) || lower(substr(c.c_name,2)) AS name,
         |  CASE WHEN c.c_acctbal IS NULL OR (c.c_acctbal >= 0.0 AND c.c_acctbal <= 10000.0)
         |       THEN c.c_acctbal ELSE 0.0 END AS acctbal,
         |  n.n_name AS nation_name
         |FROM customer c
         |LEFT JOIN nation n ON CAST(c.c_nationkey AS VARCHAR) = CAST(n.n_nationkey AS VARCHAR)
         |WHERE c.c_mktsegment = 'BUILDING'
         |ORDER BY id $N1, name $N1, acctbal $N1, nation_name $N1""".stripMargin,
  )
}
