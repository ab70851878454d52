package graft.model

/**
 * Declarative pipeline definitions — the "config-as-query" surface.
 *
 * Mirrors the capabilities of the reference's YAML config object graph
 * (reference: model/config/Config.java:13-59,
 * model/config/TableMigrationDefinition.java:17-139), re-expressed as Scala
 * case classes that compile to a Spark DataFrame plan (see
 * [[graft.pipeline.MigrationPlanner]]). Nothing here executes — a definition
 * IS the logical query.
 */

/** A source or target table binding.
  *
  * The reference binds to live Cassandra keyspaces
  * (model/config/DBDefinition.java:5-16); we bind to any Spark DataSource
  * (parquet for tests/bench, the Cassandra DSv2 connector in production) —
  * the plan in between is identical.
  *
  * @param format Spark datasource format ("parquet", "csv", "json",
  *               "org.apache.spark.sql.cassandra", ...)
  * @param path path or table identifier
  * @param options datasource options
  */
final case class TableRef(
    format: String = "parquet",
    path: String = "",
    options: Map[String, String] = Map.empty)

/** One residual (in-memory) filter in the chain.
  *
  * Reference: model/config/TableDataFilterDefinition.java:32-72 — a class
  * name + options map. We keep two kinds:
  *  - `FieldValueFilter(expression)`: an MVEL-subset boolean over row columns
  *    (reference: implementation/FieldValueFilter.java:35-89)
  *  - `IfNotExistFilter`: drop rows whose PK exists in the target snapshot
  *    (reference sketch: implementation/IfNotExistFilter.java:49-96 — a stub
  *    there; a real left-anti join here)
  */
sealed trait FilterDef
final case class FieldValueFilter(expression: String) extends FilterDef
case object IfNotExistFilter extends FilterDef
/** A reflective plugin stage: `type:` carries a fully-qualified class name
  * implementing [[graft.plugin.GraftStage]] — the reference's
  * `Class.forName` extension contract
  * (TableDataFilterDefinition.java:53-71) re-expressed as a
  * DataFrame → DataFrame hook.
  */
final case class PluginFilter(className: String,
    options: Map[String, String] = Map.empty) extends FilterDef

/** A derived target column computed from source columns.
  *
  * Reference: "calculated columns" parsed from plugin options
  * (implementation/DefaultMigratorPlugin.java:137-173) and evaluated per row
  * via MVEL (:367-387). Here `expression` is the same MVEL-subset string
  * (`row.col` references allowed) translated at plan time to a Catalyst
  * expression — whole-stage-codegen instead of per-row interpretation.
  */
final case class CalculatedColumn(targetColumn: String, expression: String)

/** Sink write mode.
  *
  * Reference write paths (implementation/DefaultMigratorPlugin.java:276-325):
  * UPDATE upsert (default), INSERT IF NOT EXISTS (LWT), counter increment.
  */
sealed trait WriteMode
case object Upsert extends WriteMode // O13: keyed overwrite, keep-last per PK
case object InsertIfNotExists extends WriteMode // O14: anti-join + append
case object CounterIncrement extends WriteMode // O15: additive merge on PK

/** TTL handling (reference: DefaultMigratorPlugin.java:192-203, 360-365).
  *
  * @param ttlColumn   column carrying per-row remaining TTL (pseudo-column
  *                    `TTL(col)` in CQL; a plain column in parquet fixtures)
  * @param sourceTableTtl table-level default_time_to_live of the source
  * @param targetTableTtl table-level default_time_to_live of the target
  */
final case class TtlSpec(ttlColumn: String, sourceTableTtl: Long, targetTableTtl: Long)

/** One table migration — the unit of work, mirroring
  * TableMigrationDefinition.java:17-139 field-for-field where the field is a
  * query concept (thread/timeout knobs become Spark configs instead).
  *
  * @param tableName          source table (reference :29)
  * @param targetTableName    target table, defaults to source name (:38)
  * @param whereClause        pushdown predicate, SQL/CQL syntax (:55) — O3
  * @param maxReadRowCount    pre-filter LIMIT pushed to the scan (:60) — O7
  * @param maxWriteRowCount   post-filter LIMIT before the sink (:65) — O8
  * @param filters            ordered residual filter chain — O4/O5/O6
  * @param calculatedColumns  derived columns — O9
  * @param writeMode          upsert / insert-if-not-exists / counter — O13-O15
  * @param pkColumns          primary-key columns (partition ++ clustering);
  *                           discovered from cluster metadata in the
  *                           reference (MigrateTableTask.java:415-428),
  *                           declared or discovered here
  * @param counterColumns     additive-merge columns (counter types)
  * @param ttl                optional TTL re-basing — O10/O11
  * @param simulateOnly       dry-run: full plan, no write (:41-48) — O16
  * @param continueOnRowError row-level error tolerance; the reference makes
  *                           this mandatory-explicit
  *                           (MigrateTableTask.java:168-169) — O19
  * @param pageSize           micro-batch size bound in streaming mode
  *                           (reference pageSize, TableMigrationDefinition
  *                           .java:75 — maps to maxFilesPerTrigger); in
  *                           batch mode, the rows-per-page unit of the
  *                           pacing below
  * @param pauseMillisBetweenPages rate limiter (reference :86-91, O17):
  *                           the streaming trigger interval, and in batch
  *                           mode each task's pause between pageSize-row
  *                           pages on the way into the sink
  *                           ([[graft.pipeline.Throttle]])
  * @param patchNullsFromTarget CQL sparse-row upsert fidelity: a CQL
  *                           UPDATE leaves columns it doesn't set untouched
  *                           (reference DefaultMigratorPlugin.java:345-358);
  *                           with true, null source values are patched from
  *                           the existing target row (null = "unset"), and
  *                           target rows missing from the source are kept
  * @param orderingColumns    columns that define "last" for keep-last upsert
  *                           dedup (CQL upserts are last-write-wins; a bulk
  *                           engine needs an explicit ordering; extra columns
  *                           are tie-breakers for determinism)
  */
final case class TableMigrationDef(
    tableName: String,
    targetTableName: Option[String] = None,
    whereClause: Option[String] = None,
    maxReadRowCount: Option[Long] = None,
    maxWriteRowCount: Option[Long] = None,
    filters: Seq[FilterDef] = Nil,
    calculatedColumns: Seq[CalculatedColumn] = Nil,
    writeMode: WriteMode = Upsert,
    pkColumns: Seq[String] = Nil,
    counterColumns: Seq[String] = Nil,
    ttl: Option[TtlSpec] = None,
    simulateOnly: Boolean = true,
    continueOnRowError: Option[Boolean] = None,
    pageSize: Option[Int] = None,
    pauseMillisBetweenPages: Option[Long] = None,
    patchNullsFromTarget: Boolean = false,
    orderingColumns: Seq[String] = Nil) {
  def resolvedTargetName: String = targetTableName.getOrElse(tableName)
}

/** Whole-run config (reference: model/config/Config.java:13-59). Source and
  * target bindings plus the ordered list of table migrations. `parallel`
  * mirrors threadCount>1: when false, tables run sequentially in declared
  * order (the reference warns dependent tables must run in order —
  * Config.java:46-48).
  */
final case class MigrationConfig(
    source: TableRef,
    target: TableRef,
    tables: Seq[TableMigrationDef],
    parallel: Boolean = false,
    /** Periodic status-line interval (reference logs rowsRead/rowsMigrated
      * deltas on a timer, MigrateTableTask.java:369-413). None = final
      * result only.
      */
    statusIntervalMillis: Option[Long] = None)

/** One stage of a declarative training-data pipeline: a registered
  * operator name (or a fully-qualified [[graft.plugin.GraftStage]] class —
  * the reference's `Class.forName` plugin contract generalized,
  * TableDataFilterDefinition.java:53-71) plus its options.
  * `materialize` marks the stage's output for an eager localCheckpoint —
  * the lineage cut a multi-consumer stage needs (the c07 convention).
  */
final case class StageDef(
    stage: String,
    options: Map[String, String] = Map.empty,
    materialize: Boolean = false)

/** Config-as-query for the LLM-data operator family: the YAML front-end
  * the reference applies to table migrations
  * (model/config/TableMigrationDefinition.java:17-139), extended to
  * curation pipelines — a named, ordered `stages:` list compiling to the
  * exact same operators the Scala API exposes
  * ([[graft.pipeline.StagePipeline]]).
  */
final case class PipelineConfig(name: String, stages: List[StageDef])
