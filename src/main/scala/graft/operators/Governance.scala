package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Data-governance operators: GDPR/CCPA-style erasure propagation across a
 * relational schema. The reference migrator moves rows between tables
 * (`MigrateTableTask.java:280-367`); the inverse operation a production
 * deployment needs — "delete this subject EVERYWHERE, and prove it" — is
 * the same table surface walked with anti/semi joins instead of copies.
 */
object Governance {

  /** One table in an erasure cascade: rows of `df` are purged when their
    * `fkCol` matches a purged key of `parent` (the root table's name or
    * an earlier entry's `name` — declare parents first); `keyCol` is this
    * table's own primary key, feeding any downstream child.
    */
  final case class CascadeTable(name: String, df: DataFrame, keyCol: String,
      parent: String, fkCol: String)

  /** Right-to-be-forgotten audit: given the erasure `subjects` (their
    * root keys) and a parent-first cascade over the schema, report per
    * table how many rows the erasure purges and how many survive —
    * the pre-flight a deletion job runs before issuing deletes, and the
    * post-hoc compliance evidence afterwards.
    *
    * Output: one row per table — (table_name, n_purged, n_retained),
    * root first, then `children` in declaration order.
    *
    * Plan shape (100 TB posture): the subject list broadcasts (erasure
    * batches are human-scale; set `broadcastSubjects = false` for bulk
    * purges and the root semi-join shuffles on the key instead); each
    * cascade level's purged-key frame is a SKINNY key-only projection of
    * a left-semi join — payload columns never move; every table is
    * scanned once for its semi-join and once for its total count (both
    * count-only aggregates, map-side combined). No window, no cartesian
    * beyond the two 1-row count attaches per table.
    */
  def erasureCascade(subjects: DataFrame, subjectKeyCol: String,
      rootName: String, root: DataFrame, rootKeyCol: String,
      children: Seq[CascadeTable],
      broadcastSubjects: Boolean = true): DataFrame = {
    val declared = rootName +: children.map(_.name)
    require(declared.distinct.size == declared.size,
      s"cascade table names must be unique, got $declared")
    children.zipWithIndex.foreach { case (c, i) =>
      require(declared.take(i + 1).contains(c.parent),
        s"table ${c.name} references parent ${c.parent} not declared before it")
    }
    val subj0 = subjects.select(col(subjectKeyCol).as(rootKeyCol)).distinct()
    val subj = if (broadcastSubjects) broadcast(subj0) else subj0
    val rootPurged = root.join(subj, Seq(rootKeyCol), "left_semi")
    var purgedKeys = Map(
      rootName -> rootPurged.select(col(rootKeyCol).as("__k")).distinct())
    var out = summarize(rootName, root, rootPurged)
    for (c <- children) {
      val parentKeys = purgedKeys(c.parent)
      val purged = c.df.join(
        parentKeys.select(col("__k").as(c.fkCol)), Seq(c.fkCol), "left_semi")
      purgedKeys += c.name -> purged.select(col(c.keyCol).as("__k")).distinct()
      out = out.unionByName(summarize(c.name, c.df, purged))
    }
    out
  }

  /** k-anonymity / l-diversity privacy audit (Sweeney; Machanavajjhala
    * et al.): group the table by its quasi-identifier columns — the
    * attribute combination an adversary could link to external data —
    * and flag every equivalence class that is smaller than `k`
    * (re-identifiable) or carries fewer than `l` distinct values of the
    * `sensitiveCol` (attribute-disclosing even when k-anonymous). The
    * pre-release gate a privacy review runs before shipping a dataset,
    * and the measurement that tells you WHICH generalization to apply.
    *
    * Output: one row per equivalence class —
    * (quasiIdCols..., n_rows, n_sensitive, k_anonymous, l_diverse).
    * NULL quasi-id values form their own class (GROUP BY semantics) —
    * suppressed values still need auditing.
    *
    * Plan shape (100 TB posture): ONE hash aggregate keyed on the
    * quasi-identifier tuple (count + exact count-distinct, partial-agg
    * combined map-side); the flags are map-only literal comparisons on
    * the agg output. No window, no join — payload columns beyond the
    * quasi-ids and the sensitive column are pruned at the scan.
    */
  def kAnonymityAudit(df: DataFrame, quasiIdCols: Seq[String],
      sensitiveCol: String, k: Long, l: Long): DataFrame = {
    require(quasiIdCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 1 && l >= 1, s"k and l must be positive, got k=$k l=$l")
    df.groupBy(quasiIdCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("k_anonymous", col("n_rows") >= k)
      .withColumn("l_diverse", col("n_sensitive") >= l)
  }

  /** (table_name, n_purged, n_retained) as two count-only aggregates
    * attached by 1-row joins (the scalar-model convention).
    */
  private def summarize(name: String, full: DataFrame,
      purged: DataFrame): DataFrame = {
    val total = full.agg(count(lit(1)).as("__total"))
    purged.agg(count(lit(1)).as("n_purged"))
      .crossJoin(total)
      .select(lit(name).as("table_name"), col("n_purged"),
        (col("__total") - col("n_purged")).as("n_retained"))
  }
}
