package graft.streaming

import graft.operators.{CorpusStats, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * Streaming token-budget admission — ingest a document stream until a
 * global token budget is exhausted, then stop admitting. The gate a
 * training-data intake runs when the target corpus size is fixed (e.g.
 * "take the first N·10⁹ tokens of this crawl in arrival order"): each
 * micro-batch's documents are admitted in id order while the RUNNING
 * corpus total stays within budget; the batch that crosses the budget is
 * admitted partially; everything after it is rejected.
 *
 * State posture (the [[StreamingHeavyHitters]] rules): ONE tiny parquet
 * row per batch (`batch=<id>` partition: the tokens that batch STREAMED,
 * admitted or not — the budget covers the stream's head, so rejected
 * tokens still count against it),
 * overwritten on foreachBatch replay so a replayed batch can never
 * double-spend, batch 0 resets state and output outright. The prior
 * spend for batch b = sum of the `batch < b` state rows — a
 * batches-count-sized read, never a corpus scan.
 *
 * Per-batch distributed cost: one token-count pass over the batch plus
 * [[CorpusStats.globalRunningTotal]] for the in-batch running position —
 * range-partitioned parallel prefix sum, NOT a single-task global window,
 * so one oversized micro-batch cannot serialize onto one core.
 *
 * The drained output equals the batch computation by construction: admit
 * iff `prior + in-batch running total <= budget`, which telescopes to the
 * global running total over `(batch, id)` order — the e09 oracle replays
 * exactly that window relationally.
 */
object StreamingTokenBudget {

  /** Start the admission gate. Admitted rows land in
    * `outDir/batch=<id>` as (idCol, n_tokens, cum_tokens).
    */
  def start(spark: SparkSession, source: DataFrame, idCol: String,
      textCol: String, budget: Long, stateDir: String, outDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(budget >= 0, "budget must be non-negative")
    source.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val conf = s.sparkContext.hadoopConfiguration
        if (batchId == 0L) {
          // fresh run re-streams from scratch (a checkpoint resume never
          // re-enters batch 0 unless it crashed inside it, where reset IS
          // the replay): stale spend/output would double-count
          Seq(stateDir, outDir).foreach { d =>
            val p = new org.apache.hadoop.fs.Path(d)
            p.getFileSystem(conf).delete(p, true)
          }
        }
        val statePath = new org.apache.hadoop.fs.Path(stateDir)
        val fs = statePath.getFileSystem(conf)
        val prior: Long =
          if (!fs.exists(statePath)) 0L
          else s.read.option("basePath", stateDir).parquet(s"$stateDir/batch=*")
            .filter(col("batch") < batchId)
            .agg(coalesce(sum(col("spent_tokens")), lit(0L)))
            .head().getLong(0)
        val counted = batch.select(col(idCol),
          TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
        // ranked is backed by globalRunningTotal's snapshot: the token
        // count runs ONCE per batch even though two actions follow
        val ranked = CorpusStats
          .globalRunningTotal(counted, idCol, "n_tokens", cumCol = "cum_tokens")
        val admitted = ranked
          .withColumn("cum_tokens", col("cum_tokens") + lit(prior))
          .filter(col("cum_tokens") <= budget)
        admitted.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        // spend = the batch's TOTAL tokens, admitted or not: the contract
        // (and the oracle) is "the stream's head up to the budget" — one
        // running total over EVERYTHING in arrival order. Recording only
        // admitted tokens would let a small doc AFTER the budget-crossing
        // batch slip into the leftover slack (greedy knapsack, a
        // different operator)
        val spent = ranked.agg(coalesce(sum(col("n_tokens")), lit(0L)))
          .head().getLong(0)
        import s.implicits._
        Seq(spent).toDF("spent_tokens")
          .write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }
}
