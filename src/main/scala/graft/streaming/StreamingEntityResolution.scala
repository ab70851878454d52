package graft.streaming

import graft.operators.{Dedup, FuzzyJoin}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * Streaming incremental entity resolution — the ingest-time form of the
 * c14 batch composition: as records arrive, fuzzy-match their string
 * keys against the accumulated vocabulary (SymSpell deletion
 * neighborhoods, [[FuzzyJoin.deletionNeighborhoodJoin]]) and fold the
 * new match edges into a persisted cluster map with the contracted-graph
 * incremental closure ([[Dedup.clusterAssignmentsIncremental]] — the
 * c13 machinery), so each micro-batch costs O(delta names + touched
 * clusters), never a corpus re-closure.
 *
 * State (both VOCABULARY-scale — one row per distinct string, the ER
 * working set, not per record):
 *   - `namesDir/batch=<id>`: (name, name_id) — every distinct name seen
 *     through batch `id`, with its stable id;
 *   - `mapDir/batch=<id>`:   (name_id, cluster_id) — the closure after
 *     batch `id`.
 * Every batch WRITES a complete new snapshot keyed by its batch id and
 * READS the latest snapshot with batch id < its own — a foreachBatch
 * replay therefore sees exactly the pre-batch state and overwrites only
 * its own partitions: exactly-once state evolution with no swap dance.
 * [[compactState]] drops superseded snapshots between runs.
 *
 * Contracts:
 *   - record ids are monotonically non-decreasing across batches (the
 *     ingest norm); a name's stable `name_id` is the smallest record id
 *     that carried it, which under monotone ids equals the global
 *     minimum — so drained cluster labels are row-identical to the
 *     batch closure over everything streamed (the c13 guarantee).
 *   - cluster labels are RETROACTIVE (a later edge can merge two old
 *     clusters); the queryable result is the latest persisted map, not
 *     any per-batch emission — read it with [[resolvedMap]].
 */
object StreamingEntityResolution {

  /** Latest persisted snapshot with batch id strictly below `before`
    * (None on a fresh store) — the pre-batch read every replay sees.
    */
  private def latest(spark: SparkSession, dir: String,
      before: Long): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val ids = fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("batch=") =>
        s.stripPrefix("batch=").toLong }
      .filter(_ < before)
    if (ids.isEmpty) None
    else Some(spark.read.parquet(s"$dir/batch=${ids.max}"))
  }

  /** The resolved entity map after the last drained batch:
    * `(name, name_id, cluster_id)`.
    */
  def resolvedMap(spark: SparkSession, namesDir: String,
      mapDir: String): DataFrame = {
    val names = latest(spark, namesDir, Long.MaxValue)
      .getOrElse(throw new IllegalStateException(
        s"no entity state under $namesDir — nothing drained yet"))
    val m = latest(spark, mapDir, Long.MaxValue)
      .getOrElse(throw new IllegalStateException(
        s"no cluster state under $mapDir"))
    names.join(m, "name_id").select("name", "name_id", "cluster_id")
  }

  /** Drop all but the latest snapshot in each state dir. Call BETWEEN
    * runs (guarded like the LSM stores).
    */
  def compactState(spark: SparkSession, namesDir: String,
      mapDir: String): Unit = Seq(namesDir, mapDir).foreach { dir =>
    LsmParquetState.guardNotStreaming(dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val parts = fs.listStatus(p).toSeq.filter(_.isDirectory)
        .map(_.getPath)
        .filter(_.getName.startsWith("batch="))
      if (parts.size > 1) {
        val keep = parts.maxBy(_.getName.stripPrefix("batch=").toLong)
        parts.filterNot(_ == keep).foreach(fs.delete(_, true))
      }
    }
  }

  def start(spark: SparkSession, source: DataFrame,
      idCol: String, strCol: String,
      namesDir: String, mapDir: String, checkpointDir: String,
      maxDist: Int = 1,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    LsmParquetState.withPendingOwners(Seq(namesDir, mapDir)) {
      source.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          processBatch(batch, batchId, idCol, strCol, namesDir, mapDir,
            maxDist)
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
      idCol: String, strCol: String,
      namesDir: String, mapDir: String, maxDist: Int): Unit = {
    val s = batch.sparkSession
    val rows = batch.select(col(idCol).cast("long").as("__rid"),
      col(strCol).as("name"))
    val prevNames = latest(s, namesDir, batchId)
    val prevMap = latest(s, mapDir, batchId)
    val batchNames = rows.groupBy("name").agg(min(col("__rid")).as("name_id"))
    // a name already in the vocabulary keeps its stored id (monotone-ids
    // contract makes the stored id the global minimum)
    val newNames = prevNames match {
      case Some(p) =>
        batchNames.join(p.select("name"), Seq("name"), "left_anti")
      case None => batchNames
    }
    val allNames = prevNames match {
      case Some(p) => p.unionByName(newNames)
      case None => newNames
    }
    // match edges touching the delta only — stored-stored pairs are
    // already folded into the map
    val pairs = FuzzyJoin.deletionNeighborhoodJoin(
        newNames, "name_id", "name", allNames, "name_id", "name", maxDist)
      .filter(col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("idA"),
        greatest(col("id_a"), col("id_b")).as("idB"))
      .distinct()
    val newMap = prevMap match {
      case Some(base) => Dedup.clusterAssignmentsIncremental(
        base.select("name_id", "cluster_id"),
        newNames.select("name_id"), pairs, "name_id")
      case None => Dedup.clusterAssignments(pairs,
        allNames.select("name_id"), "name_id")
    }
    allNames.write.mode("overwrite").parquet(s"$namesDir/batch=$batchId")
    newMap.write.mode("overwrite").parquet(s"$mapDir/batch=$batchId")
  }
}
