package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Change-data-capture operators: turn an append-only change log into
 * either a point-in-time history (SCD type 2) or a current snapshot
 * (CDC merge/apply). The batch-side generalization of the reference's
 * upsert keep-last write mode (`writeMode: Upsert`,
 * reference/src/main/java/.../MigrateTableTask.java) — same "latest
 * version of a key wins" contract, extended with validity intervals and
 * explicit delete ops.
 */
object Cdc {

  /** Keep the highest-`ord` change per group — max_by over a hash
    * aggregate, so duplicates combine map-side and the shuffle carries
    * one candidate per (partition × key), never a sorted window of the
    * whole log. Package-visible: [[graft.streaming.StreamingCdcMerge]]
    * pre-collapses each micro-batch and compacts its change store
    * through THIS arithmetic, so the streaming fold cannot drift from
    * the batch operator (max over a union of per-batch maxes is the
    * global max — the fold is batching-independent by construction).
    */
  private[graft] def keepLast(df: DataFrame, groupCols: Seq[String],
      ordCols: Seq[String]): DataFrame = {
    val payload = df.columns.filterNot(groupCols.contains)
    df.groupBy(groupCols.map(col): _*)
      .agg(max_by(struct(payload.map(col).toIndexedSeq: _*),
        struct(ordCols.map(col).toIndexedSeq: _*)).as("__r"))
      .select(df.columns.map { c =>
        if (groupCols.contains(c)) col(c) else col(s"__r.$c").as(c)
      }.toIndexedSeq: _*)
  }

  /** SCD2 history: one row per retained change with `valid_from` (its
    * version), `valid_to` (the next version for the same key, null while
    * current) and `is_current`. When `tieBreak` is given, colliding
    * versions of a key are first collapsed keep-last by it (hash agg);
    * without it, `(keys, versionCol)` must be unique or intervals
    * degenerate to zero length.
    *
    * Shape: the interval stitch is one `lead` window — a single shuffle
    * on the key columns and a partition-local sort by version; nothing
    * global.
    */
  def scd2History(changes: DataFrame, keyCols: Seq[String],
      versionCol: String, tieBreak: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val base =
      if (tieBreak.isEmpty) changes
      else keepLast(changes, keyCols :+ versionCol, tieBreak)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(versionCol).asc)
    base
      .withColumn("valid_from", col(versionCol))
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** CDC merge: apply a change log to a snapshot and return the new
    * snapshot. The latest change per key wins (`versionCol` then
    * `tieBreak`, exactly the upsert ordering-columns contract); a latest
    * op equal to `deleteOp` removes the key, anything else upserts the
    * change row's payload (insert when the key is new). `changes` must
    * carry every non-key snapshot column plus `opCol`.
    *
    * Shape: keep-last is a map-side-combining hash aggregate (the change
    * log never sorts), then ONE full-outer join against the snapshot —
    * no window, no second pass.
    */
  def applyCdc(snapshot: DataFrame, changes: DataFrame, keyCols: Seq[String],
      versionCol: String, opCol: String, deleteOp: String = "D",
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val payload = snapshot.columns.filterNot(keyCols.contains)
    val missing = (payload :+ opCol).filterNot(changes.columns.contains)
    require(missing.isEmpty,
      s"changes is missing column(s) ${missing.mkString(", ")}")
    val latest = keepLast(
      changes.select((((keyCols ++ payload) :+ opCol :+ versionCol) ++ tieBreak)
        .distinct.map(col).toIndexedSeq: _*),
      keyCols, versionCol +: tieBreak)
      .select(keyCols.map(col) ++ payload.map(c => col(c).as(s"__n_$c")) :+
        col(opCol).as("__op"): _*)
    snapshot.join(latest, keyCols, "full_outer")
      .filter(col("__op").isNull || col("__op") =!= lit(deleteOp))
      .select(keyCols.map(col) ++ payload.map(c =>
        when(col("__op").isNotNull, col(s"__n_$c")).otherwise(col(c)).as(c))
        : _*)
  }

  /** Version-aware CDC merge for incremental (micro-batch) application:
    * the snapshot itself carries `versionCol`, and a change only wins if
    * its version is higher than the stored one — so late/duplicate
    * deliveries of old changes are ignored instead of clobbering newer
    * state. This is the `foreachBatch` building block: fold each
    * micro-batch into the running snapshot and the result is independent
    * of how the log was batched (same max-semilattice as batch
    * [[applyCdc]]), with one caveat — a delete drops the row AND its
    * version, so an update older than an already-applied delete can
    * resurrect the key in a later batch. If the log can be that
    * disordered, retain tombstone rows instead of filtering them.
    *
    * Shape: union + one keep-last hash aggregate on the keys; no window,
    * no join.
    */
  def applyCdcVersioned(snapshot: DataFrame, changes: DataFrame,
      keyCols: Seq[String], versionCol: String, opCol: String,
      deleteOp: String = "D"): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(snapshot.columns.contains(versionCol),
      s"versioned snapshot must carry $versionCol")
    val cols = snapshot.columns
    val missing = (cols :+ opCol).filterNot(changes.columns.contains)
    require(missing.isEmpty,
      s"changes is missing column(s) ${missing.mkString(", ")}")
    // version ties resolve on an explicit numeric rank — update (2) >
    // stored snapshot row (1) > delete (0) — independent of the op
    // vocabulary's lexicographic order (a raw-string comparison would
    // invert the documented tie semantics for e.g. lowercase "d"/"u"
    // feeds, and conflate change rows whose op is literally "S" with
    // snapshot rows). Update-beats-stored covers idempotent redelivery
    // of the change that produced the stored version; delete-vs-stored
    // ties are vacuous (an applied delete means the key is absent).
    val snap2 = snapshot.withColumn(opCol, lit("S"))
      .withColumn("__rank", lit(1))
    val ch2 = changes.select((cols :+ opCol).map(col).toIndexedSeq: _*)
      .withColumn("__rank",
        when(col(opCol) === lit(deleteOp), lit(0)).otherwise(lit(2)))
    keepLast(snap2.unionByName(ch2), keyCols, Seq(versionCol, "__rank"))
      .filter(col("__rank") =!= lit(0))
      .drop(opCol, "__rank")
  }

  /** Snapshot diff — generate the change log between two keyed snapshots
    * (the inverse of [[applyCdc]]): a key present only in `after` emits
    * an insert `I` with the after-image, present only in `before` a
    * delete `D` with the before-image, present in both with ANY payload
    * column differing an update `U` with the after-image; identical rows
    * emit nothing. Comparison is null-safe (`<=>` — null equals null is
    * "unchanged"). Invariant: `applyCdc(before, diff)` reproduces
    * `after` (modulo the delete rows' payload, which applyCdc discards).
    *
    * Shape: ONE full-outer join on the key columns, classification and
    * image selection are map-side expressions over the joined row — the
    * minimum work a keyed diff can do; both snapshots shuffle exactly
    * once on the PK (co-partitioned/bucketed snapshots shuffle zero
    * times).
    */
  def snapshotDiff(before: DataFrame, after: DataFrame, keyCols: Seq[String],
      opCol: String = "op"): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(before.columns.sorted.toSeq == after.columns.sorted.toSeq,
      "snapshot schemas must match")
    val payload = before.columns.filterNot(keyCols.contains)
    val b = before.select(keyCols.map(col) ++
      payload.map(c => col(c).as(s"__b_$c")) :+ lit(true).as("__in_b"): _*)
    val a = after.select(keyCols.map(col) ++
      payload.map(c => col(c).as(s"__a_$c")) :+ lit(true).as("__in_a"): _*)
    val changed = payload.map(c => !(col(s"__b_$c") <=> col(s"__a_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    b.join(a, keyCols, "full_outer")
      .withColumn(opCol,
        when(col("__in_b").isNull, "I")
          .when(col("__in_a").isNull, "D")
          .when(changed, "U"))
      .filter(col(opCol).isNotNull)
      .select(keyCols.map(col) ++ payload.map(c =>
        when(col(opCol) === "D", col(s"__b_$c"))
          .otherwise(col(s"__a_$c")).as(c)) :+ col(opCol): _*)
  }
}
