package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * Streaming audio fingerprint matching — the ingest-time twin of the
 * batch [[graft.operators.Multimodal.audioFingerprintPairs]] (m11),
 * closing the multimodal streaming family (text e-series, image e33,
 * audio here): each micro-batch of payloads collapses to constellation
 * landmarks (ONE kernel pass — [[graft.functions.HashKernels.constellationHashes]]),
 * probes the PERSISTENT landmark index for every asset seen so far,
 * aligns candidates through the per-pair OFFSET HISTOGRAM, and appends
 * its own landmarks so later batches see them. The duplicate-track /
 * clipped-rebroadcast screen an audio ingest runs before storing.
 *
 * Pair completeness across batches: an asset is ATOMIC (all its
 * landmarks land in its own batch), so when the later member of a pair
 * arrives, the earlier member's landmarks are all in the index — the
 * offset histogram computed in the later batch is the FULL histogram,
 * and each pair surfaces exactly once, in its later member's batch
 * (within-batch pairs in their own batch; the e33 contract).
 *
 * Index state: skinny `(id, __h, __a)` landmark rows in the
 * [[LsmParquetState]] LSM shape partitioned by `__hp = pmod(hash(__h),
 * 32)` — per batch the base is read through a PartitionFilter on the
 * delta's touched hash prefixes (bounded driver collect, ≤ 32 ints)
 * plus the small tail; scan I/O is O(touched prefixes + tail).
 *
 * Skew guard: hash groups over `maxHashGroup` DROP with the observed
 * `audio_fp_stream_skew_guard` (the batch m11 uses the same capBuckets
 * drop semantics, so — unlike e33's refine-vs-drop divergence — drained
 * == batch holds whenever BOTH runs' guards see the same group sizes;
 * at the gate's cap nothing drops on either side).
 *
 * Delivery: exactly-once — batch-keyed pair overwrites, batch-keyed
 * tail appends, own-tail-excluded scans (the house recipe).
 */
object StreamingAudioFingerprint {

  private val layout: LsmLayout = LsmLayout(
    partitionCols = Seq("__hp"),
    derivedCols = Seq("__hp"),
    derive = df => df.withColumn("__hp",
      pmod(hash(col("__h")), lit(32)).cast("int")))

  private def landmarks(media: DataFrame, idCol: String,
      payloadCol: String, windowBytes: Int, fanout: Int,
      zone: Int): DataFrame =
    media.select(col(idCol).as("__id"),
        graft.functions.GraftFunctions.constellation_hashes(
          col(payloadCol), windowBytes, fanout, zone).as("__c"))
      .filter(size(col("__c")) >= 2)
      .select(col("__id"), explode(expr(
        """transform(sequence(1, size(__c) div 2),
          |  i -> struct(element_at(__c, CAST(2*i-1 AS INT)) AS h,
          |              element_at(__c, CAST(2*i AS INT)) AS a))"""
          .stripMargin)).as("__p"))
      .select(col("__id"), col("__p.h").as("__h"), col("__p.a").as("__a"))

  /** Seed the index from an existing corpus (empty frame = cold start). */
  def seedIndex(corpus: DataFrame, idCol: String, payloadCol: String,
      indexDir: String, windowBytes: Int = 16, fanout: Int = 3,
      zone: Int = 16): Unit =
    LsmParquetState.seed(
      landmarks(corpus, idCol, payloadCol, windowBytes, fanout, zone),
      indexDir, layout)

  /** All drained pairs: (idA, idB, t_offset, n_aligned), each exactly
    * once.
    */
  def pairs(spark: SparkSession, pairsDir: String): DataFrame =
    spark.read.parquet(pairsDir)
      .select("idA", "idB", "t_offset", "n_aligned")

  def start(spark: SparkSession, source: DataFrame,
      idCol: String, payloadCol: String,
      indexDir: String, pairsDir: String, checkpointDir: String,
      windowBytes: Int = 16, fanout: Int = 3, zone: Int = 16,
      minAligned: Int = 3, maxHashGroup: Int = 10000,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    LsmParquetState.withPendingOwners(Seq(indexDir)) {
      source.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          processBatch(batch, batchId, idCol, payloadCol, indexDir,
            pairsDir, windowBytes, fanout, zone, minAligned, maxHashGroup)
        }
        .option("checkpointLocation", checkpointDir)
        .trigger(trigger)
        .start()
    }
  }

  /** One micro-batch — split out so the replay spec drives the exact
    * production path with a pinned `batchId`.
    */
  private[streaming] def processBatch(batch: DataFrame, batchId: Long,
      idCol: String, payloadCol: String, indexDir: String,
      pairsDir: String, windowBytes: Int, fanout: Int, zone: Int,
      minAligned: Int, maxHashGroup: Int): Unit = {
    val s = batch.sparkSession
    if (!LsmParquetState.exists(s, indexDir))
      LsmParquetState.seed(
        landmarks(batch.limit(0), idCol, payloadCol, windowBytes, fanout,
          zone), indexDir, layout)
    // one kernel pass; three consumers (touched set, probe, append)
    val delta = landmarks(batch, idCol, payloadCol, windowBytes, fanout,
      zone).localCheckpoint(eager = true)
    val prefixes = delta
      .select(pmod(hash(col("__h")), lit(32)).cast("int").as("p"))
      .distinct().collect().map(_.getInt(0)).toIndexedSeq
    val pred =
      if (prefixes.isEmpty) lit(false)
      else col("__hp").isin(prefixes: _*)
    val stored = LsmParquetState.scan(s, indexDir, layout, pred,
      excludeTailBatch = Some(batchId))
    // origin tags make the delta-delta direction unambiguous: a stored
    // landmark never probes (kept whatever the id order), but a
    // delta-delta landmark pair would surface from BOTH members' probes
    // and double every within-batch alignment count — the batch m11
    // counts each landmark pair once (idA < idB), so the delta side of
    // the probe keeps only the a.id < b.id direction
    val probe = graft.operators.Dedup.capBuckets(
      stored.withColumn("__src", lit(0))
        .unionByName(delta
          .select(stored.columns.map(col): _*)
          .withColumn("__src", lit(1))),
      Seq("__h"), maxHashGroup, "audio_fp_stream_skew_guard")
    val a = delta.select(col("__h"), col("__id").as("__ida"),
      col("__a").as("__aa"))
    val b = probe.select(col("__h"), col("__id").as("__idb"),
      col("__a").as("__ab"), col("__src"))
    a.join(b, Seq("__h"))
      .filter(col("__ida") =!= col("__idb"))
      .filter(col("__src") === 0 || col("__ida") < col("__idb"))
      // normalize pair order (a delta asset may be the pair's earlier
      // OR later id) and the offset direction with it
      .select(
        least(col("__ida"), col("__idb")).as("idA"),
        greatest(col("__ida"), col("__idb")).as("idB"),
        when(col("__ida") < col("__idb"), col("__ab") - col("__aa"))
          .otherwise(col("__aa") - col("__ab")).as("t_offset"))
      .groupBy(col("idA"), col("idB"), col("t_offset"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("idA"), col("idB"))
      .agg(max_by(struct(col("t_offset"), col("__n")),
        struct(col("__n"), (-col("t_offset")).as("__t"))).as("__b"))
      .select(col("idA"), col("idB"), col("__b.t_offset").as("t_offset"),
        col("__b.__n").as("n_aligned"))
      .filter(col("n_aligned") >= minAligned)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$pairsDir/batch=$batchId")
    LsmParquetState.append(delta, indexDir, Some(batchId))
    org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(delta)
  }

  /** Fold the tail into the partitioned base (between runs — guarded). */
  def compactState(spark: SparkSession, indexDir: String): Unit =
    LsmParquetState.compact(spark, indexDir, layout)
}
