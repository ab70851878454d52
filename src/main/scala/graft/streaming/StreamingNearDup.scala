package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * Streaming near-duplicate screening with PERSISTENT index state — the
 * production composition of [[graft.operators.Dedup.minhashNearDupPairsIncremental]]:
 * each micro-batch of new documents dedups against everything seen so far
 * (the seeded corpus plus all prior batches), then appends its own skinny
 * LSH index rows and doc rows so later batches see it.
 *
 * State lives in parquet, NOT executor memory — at corpus scale the index
 * is billions of skinny `(id, band, key)` rows, far past any state store.
 * Per-batch cost: the stored index is SCANNED (map-only — a broadcast
 * semi join restricts it to the delta's bucket keys before anything
 * shuffles, see [[Dedup.minhashNearDupPairsIncremental]]'s shuffle
 * accounting) but never exchanged; shuffled bytes are proportional to the
 * delta's touched buckets, not the corpus.
 *
 * Pair-set contract (spec-pinned): after draining the stream, `pairsDir`
 * holds exactly the batch run's pairs over (corpus ∪ all batches)
 * restricted to pairs involving at least one streamed doc — each pair
 * surfaces once, in the micro-batch of its later-arriving member.
 *
 * Delivery: pairs are at-least-once across RESTARTS (foreachBatch replays
 * the in-flight batch; a replay re-appends its pairs — dedup downstream by
 * (idA, idB) if exactly-once matters). Replayed index/doc appends are
 * harmless for pair correctness: candidates are `distinct`ed before
 * verification, so duplicate index rows can't duplicate or alter a pair.
 */
object StreamingNearDup {

  /** Seed the persistent state from the initial corpus: the LSH index
    * (the ONLY corpus state candidate generation ever reads) and the doc
    * store (read only for verification candidates).
    */
  def seedIndex(corpus: DataFrame, idCol: String, textCol: String,
      indexDir: String, docsDir: String,
      shingleK: Int = 5, bands: Int = 16, rowsPerBand: Int = 4): Unit = {
    Dedup.lshBuckets(corpus, idCol, textCol, shingleK, bands, rowsPerBand)
      .write.mode("overwrite").parquet(indexDir)
    corpus.select(idCol, textCol).write.mode("overwrite").parquet(docsDir)
  }

  /** Compact a persistent state directory (index or docs) in place: every
    * micro-batch appends one small parquet file per task, so a long-running
    * screen accumulates thousands of tiny files — the classic small-files
    * tax on every subsequent scan's listing and open cost. Rewrites the
    * directory to `ceil(rows / rowsPerFile)` files and swaps it in.
    *
    * Call BETWEEN runs (stream stopped): the swap is a filesystem
    * delete+rename, not atomic against a concurrent reader/writer. Safe
    * w.r.t. the stream's own state because the state is plain parquet —
    * no checkpoint metadata references these file names (the checkpoint
    * tracks the SOURCE, not foreachBatch's outputs).
    */
  def compactState(spark: SparkSession, dir: String,
      rowsPerFile: Long = 8L * 1024 * 1024): Unit = {
    val df = spark.read.parquet(dir)
    val n = math.max(1L, math.min(Int.MaxValue.toLong,
      (df.count() + rowsPerFile - 1) / rowsPerFile)).toInt
    val tmp = dir.stripSuffix("/") + ".compacting"
    df.repartition(n).write.mode("overwrite").parquet(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    val t = new org.apache.hadoop.fs.Path(tmp)
    if (!fs.delete(p, true))
      throw new java.io.IOException(s"could not remove $dir for compaction swap")
    if (!fs.rename(t, p))
      throw new java.io.IOException(
        s"compaction swap failed: state left at $tmp, $dir is GONE — restore by renaming")
  }

  /** Start the screen over a streaming frame of `(idCol, textCol)` docs.
    * Ids must be unique across the corpus and the stream. Rate limiting
    * belongs on the caller's source (`maxFilesPerTrigger` /
    * `maxOffsetsPerTrigger` on the readStream) — this method takes the
    * frame as-is.
    */
  def start(spark: SparkSession, source: DataFrame,
      idCol: String, textCol: String,
      indexDir: String, docsDir: String, pairsDir: String,
      checkpointDir: String,
      threshold: Double = 0.8, shingleK: Int = 5,
      bands: Int = 16, rowsPerBand: Int = 4, maxBucketSize: Int = 1000,
      trigger: Trigger = Trigger.AvailableNow(),
      restrictToTouched: Boolean = true): StreamingQuery = {
    source.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val delta = batch.select(idCol, textCol)
        val index = s.read.parquet(indexDir)
        val docs = s.read.parquet(docsDir)
        // the delta's LSH index is needed twice — candidate generation and
        // the state append — so it is computed ONCE and cached for the
        // batch (a second shingle+minhash kernel pass per micro-batch is
        // pure waste)
        val deltaIdx = Dedup.lshBuckets(delta, idCol, textCol, shingleK,
          bands, rowsPerBand).persist()
        try {
          // pairs materialize BEFORE the state appends below, so a batch
          // never pairs against its own appended rows twice
          // micro-batch deltas are small in production (the broadcast
          // touched-bucket restriction is the right default); callers
          // replaying corpus-scale batches can opt out to shuffle posture
          Dedup.minhashNearDupPairsIncremental(index, docs, delta, deltaIdx,
              idCol, textCol, threshold, shingleK, maxBucketSize,
              restrictToTouched, materializeIntermediates = true)
            .write.mode("append").parquet(pairsDir)
          deltaIdx.write.mode("append").parquet(indexDir)
          delta.write.mode("append").parquet(docsDir)
        } finally deltaIdx.unpersist(blocking = false)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }
}
