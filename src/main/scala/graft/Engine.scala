package graft

import graft.config.{EtlConfig, TableConfig}
import graft.plans.MigrationCompiler
import graft.sinks.Sink
import graft.sources.Catalog
import org.apache.spark.internal.Logging
import org.apache.spark.sql.DataFrame

/**
 * Engine facade: config -> scheduled, compiled, executed migration —
 * the set-at-a-time equivalent of the reference's `run_pipeline`
 * (reference: pipeline.py:18-129).
 *
 * Differences by design:
 *  - tables run in dependency (topological) order derived from lookup
 *    references instead of manual file order;
 *  - `on_fail=error` / `on_missing=error` abort BEFORE the write starts
 *    (the reference aborts mid-stream with partial batches committed);
 *  - per-table metrics come from the returned report instead of
 *    per-batch prints.
 */
object Engine extends Logging {

  final case class TableReport(table: String, rows: Long, droppedColumns: Seq[String], seconds: Double)
  final case class MigrationReport(tables: Seq[TableReport]) {
    def totalRows: Long = tables.map(_.rows).sum
  }

  /** Compile one table (no execution) — the unit the tests exercise. */
  def plan(cfg: TableConfig, catalog: Catalog, broadcastDims: Boolean = true): MigrationCompiler.CompiledTable =
    MigrationCompiler.compile(cfg, catalog.table(cfg.sourceTable), catalog.table, broadcastDims = broadcastDims)

  /** Full run: schedule -> compile -> assert error-rules -> write. */
  def migrate(cfg: EtlConfig, catalog: Catalog, sink: Sink): MigrationReport = {
    val ordered = MigrationCompiler.schedule(cfg.tables)
    val reports = ordered.map { t =>
      val t0 = System.nanoTime()
      val compiled = plan(t, catalog)
      compiled.assertValid()
      sink.preLoad(t.targetTable)
      // row count via observe: no cache, no second pass over the data
      // (replaces the reference's per-batch count logs, pipeline.py:100).
      val obs = new org.apache.spark.sql.Observation()
      val observed = compiled.dataFrame.observe(obs,
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("rows"))
      sink.write(t.targetTable, observed)
      sink.finalizeTable(t.targetTable)
      val rows = obs.get("rows").asInstanceOf[Long]
      val secs = (System.nanoTime() - t0) / 1e9
      logInfo(f"[${t.targetTable}] $rows rows in $secs%.2fs")
      TableReport(t.targetTable, rows, compiled.droppedColumns, secs)
    }
    MigrationReport(reports)
  }
}
