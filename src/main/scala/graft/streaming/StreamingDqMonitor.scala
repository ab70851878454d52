package graft.streaming

import graft.operators.DqAudit
import graft.operators.DqAudit.{DqRule, UniqueKey}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * Streaming data-quality monitor — the ingest-time form of the
 * [[DqAudit]] batch gate: every micro-batch runs the rule battery over
 * its own rows (null / range screens, referential integrity against
 * STATIC reference tables) and lands its violation counts in a
 * batch-keyed partition, so the accumulated report is always one
 * aggregation away and a replayed batch overwrites its own counts
 * (exactly-once, the e08 pattern).
 *
 * Rule scope: every rule must be BATCH-LOCAL — NotNull / RangeRule /
 * ForeignKey-against-static-reference distribute over batches (corpus
 * violations = Σ per-batch violations, which is what makes the drained
 * report equal the batch audit). [[UniqueKey]] is rejected: cross-batch
 * duplicates are invisible to a per-batch count (use the streaming
 * dedup/existence machinery for that contract).
 *
 * State: `countsDir/batch=<id>` — one tiny parquet per batch (one row
 * per rule). [[report]] folds them; the fold is rule-count-bounded.
 */
object StreamingDqMonitor {

  /** The accumulated audit after draining: (check, type, table,
    * violations, total) summed over all batches.
    */
  def report(spark: SparkSession, countsDir: String): DataFrame =
    spark.read.parquet(s"$countsDir/batch=*")
      .groupBy("check", "type", "table")
      .agg(sum(col("violations")).as("violations"),
        sum(col("total")).as("total"))

  def start(spark: SparkSession, source: DataFrame, tableName: String,
      refTables: Map[String, DataFrame], rules: Seq[DqRule],
      countsDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(!rules.exists(_.isInstanceOf[UniqueKey]),
      "UniqueKey rules are not batch-local (cross-batch duplicates are " +
        "invisible to per-batch counts) — use the streaming dedup / " +
        "existence-filter operators for uniqueness contracts")
    require(rules.forall(_.table == tableName),
      s"every rule must target the streaming table '$tableName'")
    refTables.values.foreach(r => require(!r.isStreaming,
      "reference tables must be bounded batch frames"))
    LsmParquetState.withPendingOwners(Seq(countsDir)) {
      source.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          processBatch(batch, batchId, tableName, refTables, rules, countsDir)
        }
        .option("checkpointLocation", checkpointDir)
        .trigger(trigger)
        .start()
    }
  }

  /** One micro-batch — split out so the replay spec can drive it with a
    * pinned `batchId` through the exact production path.
    */
  private[streaming] def processBatch(batch: DataFrame, batchId: Long,
      tableName: String, refTables: Map[String, DataFrame],
      rules: Seq[DqRule], countsDir: String): Unit =
    DqAudit.run(refTables + (tableName -> batch), rules)
      .write.mode("overwrite").parquet(s"$countsDir/batch=$batchId")
}
