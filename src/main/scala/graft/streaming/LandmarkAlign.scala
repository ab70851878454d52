package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The shared ingest-time LANDMARK-ALIGNMENT engine behind the streaming
 * offset-histogram twins — [[StreamingAudioFingerprint]] (e34, audio
 * constellation landmarks) and [[StreamingClipAlign]] (e37, video frame
 * digests): one micro-batch of skinny `(__id, __h, __a)` landmark rows
 * (hash/digest + temporal anchor) probes the persistent landmark index
 * for every asset seen so far, aligns candidates through the per-pair
 * offset histogram (groupBy(idA, idB, offset) + max_by best — the m11
 * arithmetic), writes the batch's pairs batch-keyed, and appends its
 * landmarks so later batches see them.
 *
 * One engine, two operators: the modality-specific part is ONLY the
 * landmark extractor (a kernel/digest projection the operator owns);
 * everything the e-series contract pins — pair completeness (assets are
 * atomic, so each pair's full histogram is computable at its later
 * member's batch and surfaces exactly once), the origin-tagged probe (a
 * delta–delta landmark pair must not be counted from both members'
 * probes), touched-prefix index reads, the capBuckets skew guard,
 * batch-keyed exactly-once delivery with own-tail-excluded scans — lives
 * here once, so the twins cannot drift from each other.
 *
 * Index state: [[LsmParquetState]] LSM shape partitioned by
 * `__hp = pmod(hash(__h), 32)`; per batch the base is read through a
 * PartitionFilter on the delta's touched prefixes (bounded driver
 * collect, ≤ 32 ints) plus the small tail — scan I/O is
 * O(touched prefixes + tail), never O(corpus).
 */
private[streaming] object LandmarkAlign {

  val layout: LsmLayout = LsmLayout(
    partitionCols = Seq("__hp"),
    derivedCols = Seq("__hp"),
    derive = df => df.withColumn("__hp",
      pmod(hash(col("__h")), lit(32)).cast("int")))

  /** Seed the index from already-extracted landmark rows. */
  def seed(landmarks: DataFrame, indexDir: String): Unit =
    LsmParquetState.seed(landmarks, indexDir, layout)

  /** All drained pairs: (idA, idB, <offsetCol>, n_aligned). */
  def pairs(spark: SparkSession, pairsDir: String,
      offsetCol: String): DataFrame =
    spark.read.parquet(pairsDir)
      .select("idA", "idB", offsetCol, "n_aligned")

  /** One micro-batch over already-extracted `(__id, __h, __a)` delta
    * landmarks — the operator's processBatch delegates here with its
    * extractor applied and its guard/offset names.
    */
  def processBatch(deltaLandmarks: DataFrame, batchId: Long,
      indexDir: String, pairsDir: String, offsetCol: String,
      minAligned: Int, maxHashGroup: Int, guardName: String): Unit = {
    val s = deltaLandmarks.sparkSession
    if (!LsmParquetState.exists(s, indexDir))
      seed(deltaLandmarks.limit(0), indexDir)
    // one extractor pass; three consumers (touched set, probe, append)
    val delta = deltaLandmarks.localCheckpoint(eager = true)
    try {
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
      // and double every within-batch alignment count — the batch
      // operators count each landmark pair once (idA < idB), so the
      // delta side of the probe keeps only the a.id < b.id direction
      val probe = graft.operators.Dedup.capBuckets(
        stored.withColumn("__src", lit(0))
          .unionByName(delta
            .select(stored.columns.map(col): _*)
            .withColumn("__src", lit(1))),
        Seq("__h"), maxHashGroup, guardName)
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
            .otherwise(col("__aa") - col("__ab")).as(offsetCol))
        .groupBy(col("idA"), col("idB"), col(offsetCol))
        .agg(count(lit(1)).as("__n"))
        .groupBy(col("idA"), col("idB"))
        .agg(max_by(struct(col(offsetCol), col("__n")),
          struct(col("__n"), (-col(offsetCol)).as("__t"))).as("__b"))
        .select(col("idA"), col("idB"),
          col(s"__b.$offsetCol").as(offsetCol),
          col("__b.__n").as("n_aligned"))
        .filter(col("n_aligned") >= minAligned)
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$pairsDir/batch=$batchId")
      LsmParquetState.append(delta, indexDir, Some(batchId))
    } finally
      org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(delta)
  }

  /** Fold the tail into the partitioned base (between runs — guarded). */
  def compact(spark: SparkSession, indexDir: String): Unit =
    LsmParquetState.compact(spark, indexDir, layout)
}
