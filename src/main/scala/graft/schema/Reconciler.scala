package graft.schema

import org.apache.spark.sql.types._

/**
 * Plan-time schema reconciliation — the reference's "analyzer".
 *
 * Implements the four rules the reference applies when wiring a source
 * schema to a target schema (SURVEY §1.3):
 *  1. every target PK column must come from source or calculated columns,
 *     else hard error (reference: implementation/DefaultMigratorPlugin.java:249-254)
 *  2. target non-PK columns in neither source nor calculated set are dropped
 *     from the write with a warning (:256-269)
 *  3. calculated columns must name an existing target column and be unique
 *     (:156-161)
 *  4. calculated/source values must be cast-compatible with the target
 *     column type — the reference checks assignability per row at runtime
 *     (:380-383); we check `Cast.canCast` once at plan time. `canCast`
 *     admits lossy/failable casts (e.g. STRING→INT), so the per-VALUE
 *     outcome is governed downstream: `continueOnRowError=true` splits
 *     unconvertible rows to a dead letter (O19), otherwise the ANSI cast
 *     fails the write — mirroring the reference's continue/abort dispatch
 *
 * Plus the type gate: the reference enumerates supported CQL types and
 * aborts on anything else (util/CassandraSchemaUtil.java:153-157,165-211).
 * We keep the fail-fast contract over the equivalent Spark types (§1.2) and
 * additionally allow timestamp/date/binary, which Spark supports natively.
 */
object Reconciler {

  final case class Reconciliation(
      /** target columns to write, in target-schema order */
      writeColumns: Seq[String],
      /** target non-PK columns dropped because nothing maps to them (rule 2) */
      droppedColumns: Seq[String],
      warnings: Seq[String])

  final case class ReconcileError(msg: String) extends RuntimeException(msg)

  /** CQL-parity base types (SURVEY §1.2) + Spark-native extras. */
  private def typeSupported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DoubleType | FloatType |
        BooleanType | StringType | _: DecimalType | TimestampType | DateType |
        BinaryType | TimestampNTZType => true
    case ArrayType(et, _) => typeSupported(et)
    case MapType(kt, vt, _) => typeSupported(kt) && typeSupported(vt)
    case _ => false
  }

  /** Fail fast on unsupported column types — reference contract
    * (CassandraSchemaUtil.java:153-157).
    */
  def validateTypes(schema: StructType, table: String): Unit =
    schema.fields.foreach { f =>
      if (!typeSupported(f.dataType))
        throw ReconcileError(
          s"table '$table' column '${f.name}' has unsupported type ${f.dataType.sql}")
    }

  /** Apply rules 1-4. `calculated` maps target column name → the Spark type
    * the calculated expression produces.
    */
  def reconcile(
      source: StructType,
      target: StructType,
      targetPk: Seq[String],
      calculated: Map[String, DataType]): Reconciliation = {

    val sourceCols = source.fields.map(f => f.name -> f.dataType).toMap
    val targetCols = target.fields.map(f => f.name -> f.dataType).toMap

    // rule 3: calculated columns must name existing target columns
    calculated.keys.foreach { c =>
      if (!targetCols.contains(c))
        throw ReconcileError(
          s"calculated column '$c' does not exist in target table")
    }

    // rule 1: PK coverage
    targetPk.foreach { pk =>
      if (!sourceCols.contains(pk) && !calculated.contains(pk))
        throw ReconcileError(
          s"target PK column '$pk' is neither a source column nor a calculated column")
    }

    // rule 2: drop unmappable non-PK target columns, with a warning
    val (mapped, dropped) = target.fields.partition { f =>
      sourceCols.contains(f.name) || calculated.contains(f.name)
    }
    val warnings = dropped.map { f =>
      s"target column '${f.name}' has no source/calculated mapping - dropped from write"
    }

    // rule 4: plan-time cast-compatibility (replaces the per-row runtime
    // assignability check at DefaultMigratorPlugin.java:380-383)
    mapped.foreach { f =>
      val from = calculated.getOrElse(f.name, sourceCols(f.name))
      if (!org.apache.spark.sql.catalyst.expressions.Cast.canCast(from, f.dataType))
        throw ReconcileError(
          s"column '${f.name}': cannot cast ${from.sql} to target type ${f.dataType.sql}")
    }

    Reconciliation(mapped.map(_.name).toSeq, dropped.map(_.name).toSeq, warnings.toSeq)
  }
}
