package graft.streaming

import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * Streaming end-to-end curation screen — the streaming sibling of the
 * batch c07 pipeline: each micro-batch of crawled documents passes the
 * quality gate (language ID + quality score + repetition screen, all
 * map-only), the graded decontamination drop against a bounded eval set,
 * and exact normalized dedup against EVERYTHING kept so far (the seeded
 * corpus plus every earlier batch), then appends its survivors.
 *
 * State lives in parquet (the [[StreamingNearDup]] posture): one 32-char
 * md5 fingerprint row per seen document — at corpus scale that is
 * billions of rows, past any state store. Per-batch cost: the fingerprint
 * index is SCANNED map-only — a broadcast semi join restricts it to the
 * batch's own fingerprints BEFORE the anti join, so the index never
 * shuffles and never broadcasts whole; shuffled bytes are proportional to
 * the BATCH, not the corpus. Use [[StreamingNearDup.compactState]] on the
 * index between runs to pay down the per-batch small-file appends.
 *
 * Decontamination screens against eval grams broadcast exactly (the t13
 * shape — eval sets are benchmark-sized). For eval sets too large to
 * broadcast, screen with [[StreamingDecontaminate]]'s constant-size Bloom
 * literal first and keep the exact recheck for flagged docs only.
 *
 * Output contract (oracle-gated as e05): a doc survives iff it passes the
 * gate and decon screens, its fingerprint appears in no earlier batch and
 * not in the seeded index, and it carries the minimum id among its own
 * batch's same-fingerprint survivors. Batch composition decides WHICH
 * duplicate survives (the earliest batch's min-id doc), never WHETHER
 * one does.
 *
 * Delivery: survivors are at-least-once across restarts (foreachBatch
 * replays the in-flight batch). The survivor append lands BEFORE the
 * fingerprint append on purpose: a replay after a crash between the two
 * re-emits sink rows (dedup downstream by id if exactly-once matters) —
 * the reverse order would let the replayed batch anti-join against its
 * own fingerprints and silently LOSE its survivors. Duplicate fingerprint
 * rows from replays are harmless: the anti join keys on the value.
 */
object StreamingCuration {

  /** Seed the fingerprint index from an already-curated corpus (empty
    * corpus frames are fine — the write still lays down the schema the
    * per-batch reads need).
    */
  def seedFingerprints(corpus: DataFrame, textCol: String,
      fpDir: String): Unit =
    corpus.select(md5(Dedup.normalized(col(textCol))).as("fp")).distinct()
      .write.mode("overwrite").parquet(fpDir)

  /** Start the screen over a streaming frame of `(idCol, textCol,
    * langCol)` docs. Ids must be unique across the stream. Rate limiting
    * belongs on the caller's source (`maxFilesPerTrigger` /
    * `maxOffsetsPerTrigger`), the [[StreamingNearDup]] convention.
    * Survivors land in `keptDir` as (idCol, langCol, quality).
    */
  def start(spark: SparkSession, source: DataFrame, evalDocs: DataFrame,
      idCol: String, textCol: String, langCol: String,
      fpDir: String, keptDir: String, checkpointDir: String,
      lang: String = "en", minQuality: Double = 0.9,
      maxDupBigramFrac: Double = 0.05,
      overlapN: Int = 5, overlapThreshold: Double = 0.5,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(!evalDocs.isStreaming, "the eval set must be a bounded batch frame")
    source.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val (dupB, _) = TextAnalysis.repetitionScores(col(textCol))
        val gated = batch.select(col(idCol), col(textCol), col(langCol),
            TextAnalysis.langId(col(textCol)).as("__pred"),
            TextAnalysis.qualityScore(col(textCol)).as("quality"),
            dupB.as("__dupb"))
          .filter(col("__pred") === lang && col("quality") >= minQuality &&
            col("__dupb") <= maxDupBigramFrac)
          .select(col(idCol), col(textCol), col(langCol), col("quality"))
        val flagged = TextAnalysis.contaminationOverlap(
            gated.select(col(idCol), col(textCol)), evalDocs, idCol, textCol,
            n = overlapN, threshold = overlapThreshold)
          .filter(col("contaminated")).select(idCol)
        val decon = gated.join(flagged, Seq(idCol), "left_anti")
        val deduped = Dedup.normalizedDedup(decon, idCol, textCol)
          .withColumn("__fp", md5(Dedup.normalized(col(textCol))))
        // restrict the stored index to the batch's fingerprints before the
        // anti join: `seen` is bounded by the batch, so both joins stay
        // broadcast-side-small and the index itself never exchanges
        val batchFps = deduped.select(col("__fp").as("fp")).distinct()
        val seen = s.read.parquet(fpDir)
          .join(broadcast(batchFps), Seq("fp"), "left_semi")
        // `fresh` feeds both appends — left lazy, the whole gate + decon +
        // dedup chain would execute twice per batch
        val fresh = deduped
          .join(broadcast(seen), col("__fp") === col("fp"), "left_anti")
          .persist()
        try {
          fresh.select(col(idCol), col(langCol), col("quality"))
            .write.mode("append").parquet(keptDir)
          fresh.select(col("__fp").as("fp")).distinct()
            .write.mode("append").parquet(fpDir)
        } finally fresh.unpersist(blocking = false)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }
}
