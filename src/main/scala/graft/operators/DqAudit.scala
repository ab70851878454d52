package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Declarative relational data-quality audit — the pre-flight gate a
 * migration or training-data build runs before trusting a source: null
 * screens, key uniqueness, referential integrity and domain-range rules,
 * each returning an exact violation count next to the row total. The
 * reference engine validates per ROW at copy time
 * (`implementation/RowFilter.java`, the O19 dead-letter split); this is
 * the set-level audit that tells you whether the dataset is sound
 * BEFORE the per-row machinery runs — and which rules to split on.
 *
 * Plan shape (100 TB posture):
 *   - all [[NotNull]]/[[RangeRule]] checks of one table fuse into ONE
 *     conditional aggregation over a single scan (`sum(when(violated))`
 *     per rule + one `count(*)` — map-side combined, no shuffle beyond
 *     one row per partition);
 *   - [[UniqueKey]] is `count(*) − count(distinct key)` in that same
 *     pass when it is the table's only distinct rule, else its own
 *     aggregate;
 *   - [[ForeignKey]] is one left-anti join against the referenced key
 *     column (skinny: only the two key columns move; AQE broadcasts
 *     dimension-sized reference sides).
 * Output: one row per rule — (check, type, table, violations, total).
 */
object DqAudit {

  sealed trait DqRule { def name: String; def table: String }
  /** `column` must be non-null. */
  final case class NotNull(name: String, table: String,
      column: String) extends DqRule
  /** `violation` (a boolean Column over the table) flags bad rows. */
  final case class RangeRule(name: String, table: String,
      violation: Column) extends DqRule
  /** `columns` must be unique per row (violations = surplus rows). */
  final case class UniqueKey(name: String, table: String,
      columns: Seq[String]) extends DqRule
  /** Every non-null `column` value must exist in `refTable.refColumn`. */
  final case class ForeignKey(name: String, table: String, column: String,
      refTable: String, refColumn: String) extends DqRule

  def run(tables: Map[String, DataFrame], rules: Seq[DqRule]): DataFrame = {
    require(rules.nonEmpty, "no rules to audit")
    rules.groupBy(r => (r.table, r.name)).foreach { case ((t, n), rs) =>
      require(rs.sizeIs == 1,
        s"duplicate rule name '$n' on table '$t' (${rs.size} rules); " +
          "fused rules become __v_<name> columns, so names must be unique per table")
    }
    rules.foreach { r =>
      require(tables.contains(r.table), s"unknown table ${r.table}")
      r match {
        case ForeignKey(_, _, _, ref, _) =>
          require(tables.contains(ref), s"unknown reference table $ref")
        case _ => ()
      }
    }
    val results: Seq[DataFrame] =
      // scan-fused rules: one conditional aggregation per table
      rules.collect {
        case r: NotNull => r.table ->
          (r.name, "not_null", col(r.column).isNull)
        case r: RangeRule => r.table -> (r.name, "range", r.violation)
      }.groupBy(_._1).toSeq.map { case (table, tagged) =>
        val df = tables(table)
        val aggs = tagged.map { case (_, (name, _, bad)) =>
          sum(when(bad, 1L).otherwise(0L)).as(s"__v_$name")
        } :+ count(lit(1)).as("__total")
        val row = df.agg(aggs.head, aggs.tail: _*)
        val out = tagged.map { case (_, (name, typ, _)) =>
          // coalesce: sum(...) over an EMPTY table is null, but the
          // UniqueKey/ForeignKey paths emit 0 — keep output consistent
          struct(lit(name).as("check"), lit(typ).as("type"),
            lit(table).as("table"),
            coalesce(col(s"__v_$name"), lit(0L)).as("violations"),
            col("__total").as("total"))
        }
        row.select(explode(array(out: _*)).as("__r")).select("__r.*")
      } ++
      rules.collect { case r: UniqueKey =>
        tables(r.table).agg(
          (count(lit(1)) -
            count_distinct(struct(r.columns.map(col): _*))).as("violations"),
          count(lit(1)).as("total"))
          .select(lit(r.name).as("check"), lit("unique_key").as("type"),
            lit(r.table).as("table"), col("violations"), col("total"))
      } ++
      rules.collect { case r: ForeignKey =>
        val base = tables(r.table)
        val orphans = base
          .filter(col(r.column).isNotNull)
          .join(tables(r.refTable)
            .select(col(r.refColumn).as(r.column)).distinct(),
            Seq(r.column), "left_anti")
          .agg(count(lit(1)).as("violations"))
        val total = base.agg(count(lit(1)).as("total"))
        orphans.crossJoin(total)
          .select(lit(r.name).as("check"), lit("foreign_key").as("type"),
            lit(r.table).as("table"), col("violations"), col("total"))
      }
    results.reduce(_.unionByName(_))
  }
}
