package graft.streaming

import graft.functions.GraftFunctions
import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming decontamination screen: flag documents arriving on a stream
 * that share any word-n-gram with a (bounded) eval set.
 *
 * The batch [[graft.operators.TextAnalysis.decontaminateBloom]] carries
 * the sketch through the plan as an aggregate + broadcast; a stream can't
 * do that — the batch side of a stream-batch join is re-evaluated every
 * micro-batch, which is exactly the per-batch re-scan the keyed-state
 * existence filter was built to avoid. So here the Bloom filter is built
 * ONCE at plan time (one driver-side collect of a single constant-size
 * sketch row — same sanction as the bounded IVF centroid sample) and
 * embedded as a literal: every micro-batch then screens map-only, no
 * state store, no per-batch eval-set read, executor cost O(grams) per
 * document.
 *
 * Same guarantees as the batch screen: no false negatives (a
 * contaminated doc is never missed), false positives at the design rate
 * only admit extra docs for an exact downstream recheck.
 */
object StreamingDecontaminate {

  /** Returns `stream` with `n_maybe_shared` (grams possibly in the eval
    * set) and `flagged` columns appended. `evalDocs` must be a bounded
    * batch frame.
    */
  def screen(
      stream: DataFrame, evalDocs: DataFrame, textCol: String,
      n: Int = 5, expectedGrams: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    require(!evalDocs.isStreaming, "the eval set must be a bounded batch frame")
    val bloomBytes = graft.operators.TextAnalysis.buildGramBloom(
      evalDocs, textCol, n, expectedGrams, fpp)
    stream
      .withColumn("n_maybe_shared",
        GraftFunctions.bloom_count_contained(lit(bloomBytes),
          GraftFunctions.shingle_hashes(
            Dedup.normalized(col(textCol)), n, word = true)).cast("long"))
      .withColumn("flagged", col("n_maybe_shared") > 0)
  }
}
