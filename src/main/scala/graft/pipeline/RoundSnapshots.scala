package graft.pipeline

import org.apache.spark.sql.DataFrame

/**
 * Per-round materialization for iterative operators — the ONE place the
 * localCheckpoint-vs-durable trade-off lives, extracted from the pattern
 * proven in [[graft.operators.Dedup.clusterAssignments]] so every loop
 * operator (prefix doubling, PageRank, peeling fixpoints, HyperBall, MMR)
 * shares a single audited implementation.
 *
 * Why loops materialize at all: each round's frame references the previous
 * round's, so an unbroken lineage of N join+agg layers re-executes from the
 * scan every round and overwhelms the planner (the d06/d08 lesson). Two
 * materialization modes:
 *
 *  - `checkpointDir = None` (default): `localCheckpoint(eager)` — fastest
 *    (blocks stay in executor storage), but NOT fault-tolerant: the blocks
 *    have no lineage to recompute from, so an executor loss mid-iteration
 *    fails the whole job. The right default on local[*] and for short
 *    interactive runs.
 *  - `checkpointDir = Some(dir)`: each snapshot writes PARQUET under `dir`
 *    (HDFS/S3/local — whatever the Hadoop FS resolves) and reads it back.
 *    Rounds survive executor loss at the cost of a filesystem round-trip
 *    per round — the right trade on a 1000-executor cluster where losing
 *    one executor over an 8-round run is routine. `Dataset.checkpoint`
 *    is deliberately NOT used: it leaks every round's files until context
 *    stop and mutates the session-global checkpoint dir; an explicit
 *    parquet round-trip leaks nothing and touches no global state.
 *
 * When to flip the mode — measured guidance (BENCH_AB_r14, sf0.1 on
 * local[32] with a local-disk checkpointDir, alternating-mode A/B via
 * `graft.DurableBench`): durable rounds cost **1.3–1.6× end-to-end**
 * (d20 1.39×, d21 1.33×, s36 1.44×, s39 1.55×), with ≤ 9 residual files /
 * < 1 MB left after the result is consumed (the superseded-round
 * cleanup). Keep the default (localCheckpoint) on local[*] runs, short
 * interactive jobs, or anywhere a retry is cheaper than a 1.5× tax on
 * every run. Flip to durable when (expected executor losses per run) ×
 * (cost of a full restart) exceeds the tax — on a 1000-executor cluster
 * an 8-round loop over 100 TB virtually always loses an executor
 * mid-run, so durable is the production default there; on fast shared
 * storage (NVMe/S3-express) the round-trip share shrinks further while
 * the restart cost only grows with scale.
 *
 * Cleanup contract (both modes): superseded snapshots are released as the
 * loop advances ([[Roll]]); the FINAL result frame stays backed by its last
 * round's snapshot(s) — consume the result, then remove `dir`. The modes
 * are result-identical by construction: materialization is not arithmetic.
 *
 * Snapshot paths are uniqued by a per-instance counter, so one operator
 * invocation may snap many frames under one directory; concurrent
 * invocations must pass DISTINCT directories (the caller owns the dir).
 */
final class RoundSnapshots(checkpointDir: Option[String]) {
  private var counter = 0

  /** A materialized frame plus its backing file (durable mode only). */
  final case class Snap(df: DataFrame, path: Option[String])

  /** Eagerly materialize `df` under the configured mode. `label` names the
    * round file for post-mortem readability (`dir/label_N`).
    */
  def snap(df: DataFrame, label: String = "round"): Snap =
    checkpointDir match {
      case None => Snap(df.localCheckpoint(eager = true), None)
      case Some(dir) =>
        val p = s"${dir.stripSuffix("/")}/${label}_$counter"
        counter += 1
        df.write.mode("overwrite").parquet(p)
        Snap(df.sparkSession.read.parquet(p), Some(p))
    }

  /** Release a superseded snapshot: unpersist its executor blocks (local
    * mode) or delete its round file (durable mode). Only call once no live
    * plan references it — a snapshot is dead as soon as every frame built
    * on it has itself been eagerly materialized.
    */
  def free(s: Snap): Unit = s match {
    case Snap(df, None) =>
      org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(df)
    case Snap(df, Some(p)) =>
      val path = new org.apache.hadoop.fs.Path(p)
      path.getFileSystem(
        df.sparkSession.sparkContext.hadoopConfiguration)
        .delete(path, true)
  }

  /** Rolling per-round snapshot: `advance` materializes the new round and
    * frees everything older than the last `keep` predecessors. `keep = 0`
    * when only the current round is ever referenced (label propagation,
    * rank frames); `keep = 1` when the round AFTER a snapshot still reads
    * it lazily (peeling loops whose final degrees/support frame references
    * the previous round's live set).
    */
  final class Roll private[RoundSnapshots] (keep: Int, label: String) {
    private val live = scala.collection.mutable.Queue.empty[Snap]
    def advance(df: DataFrame): DataFrame = {
      val s = snap(df, label)
      live.enqueue(s)
      while (live.size > keep + 1) free(live.dequeue())
      s.df
    }
    /** Free retained snapshots beyond the newest `keepLast` — for loop
      * exits where older rounds are dead but the newest still backs the
      * result frame.
      */
    def trim(keepLast: Int): Unit =
      while (live.size > keepLast) free(live.dequeue())

    /** Free EVERYTHING still retained, current round included — for rolls
      * whose frames are all dead once the loop's consumer has itself been
      * materialized (intra-round scratch like the doubling pair frames).
      * Never call on a roll whose last round backs the operator's result.
      */
    def close(): Unit = trim(0)
  }

  def roll(label: String, keep: Int = 0): Roll = new Roll(keep, label)
}
