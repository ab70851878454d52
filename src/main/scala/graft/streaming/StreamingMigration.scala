package graft.streaming

import graft.model.{MigrationConfig, TableMigrationDef}
import graft.pipeline.MigrationPlanner
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * Streaming mode: the same migration plan under Structured Streaming.
 *
 * The reference "streams" by pulling pages of a static table in a loop
 * (reference: MigrateTableTask.java:304-345) with an optional sleep between
 * pages as a rate limit (:325-330, O17) and a write thread pool (O18). Here:
 *  - micro-batches replace pages (`maxFilesPerTrigger` bounds batch size,
 *    the trigger interval is the rate limiter — O17);
 *  - the narrow plan (filters, derived columns, TTL, projection) is BYTE
 *    IDENTICAL to batch mode — [[MigrationPlanner.narrowPlan]] is shared;
 *  - the sink-side write-mode transform (keep-last / counter pre-agg /
 *    anti-join) runs per micro-batch inside `foreachBatch`, exactly the
 *    reference's per-page semantics;
 *  - task parallelism inside a batch replaces the write pool (O18).
 *
 * At scale the checkpoint gives exactly-once sink batches (the reference's
 * counter path is NOT retry-safe; checkpointed batch IDs make ours
 * idempotent per batch — SURVEY §7.4 "counter idempotence").
 */
object StreamingMigration {

  /** Start the streaming migration for one table. Caller owns the returned
    * query lifecycle (`awaitTermination` / `stop`).
    */
  def start(
      spark: SparkSession,
      cfg: MigrationConfig,
      t: TableMigrationDef,
      checkpointDir: String,
      trigger: Trigger = null,
      maxFilesPerTrigger: Int = 0): StreamingQuery = {
    // explicit args win; otherwise the reference's config fields drive the
    // micro-batch size (pageSize) and rate limit (pauseMillisBetweenPages)
    val resolvedTrigger = Option(trigger).getOrElse(
      Trigger.ProcessingTime(t.pauseMillisBetweenPages.getOrElse(0L)))
    val resolvedMaxFiles =
      if (maxFilesPerTrigger > 0) maxFilesPerTrigger else t.pageSize.getOrElse(1)
    // schema comes from a static peek — streaming file sources need it declared
    val schema = Tables.load(spark, cfg.source, t.tableName).schema
    val path = Tables.tablePath(cfg.source, t.tableName)
    // streaming file sources want a directory basePath; fixture tables may
    // be single parquet FILES — anchor basePath at the parent directory
    val isFile = !path.contains("://") &&
      java.nio.file.Files.isRegularFile(java.nio.file.Paths.get(path))
    val stream = spark.readStream
      .format(cfg.source.format)
      .options(cfg.source.options)
      .schema(schema)
      .option("maxFilesPerTrigger", resolvedMaxFiles.toString)
      .load(if (isFile) path + "*" else path) // glob => basePath = parent dir

    val target = Tables.loadIfExists(spark, cfg.target, t.resolvedTargetName)
    val (narrow, _) = MigrationPlanner.narrowPlan(stream, target, t)

    narrow.writeStream
      .trigger(resolvedTrigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val out = MigrationPlanner.writeModeTransform(batch, target, t)
        if (t.simulateOnly) out.write.format("noop").mode("overwrite").save()
        else Tables.write(out, cfg.target, t.resolvedTargetName, mode = "append")
      }
      .start()
  }
}
