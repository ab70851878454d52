package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.StructType

/**
 * Strict per-row insert-if-not-exists — the reference's LWT path
 * (reference: `INSERT … IF NOT EXISTS` per row,
 * DefaultMigratorPlugin.java:276-292), quarantined behind a pluggable
 * row-writer SPI because no live cluster (or its driver jar) exists in this
 * environment.
 *
 * Semantics vs the planner's anti-join InsertIfNotExists (SURVEY §7.4):
 * the anti-join is a SNAPSHOT check — rows inserted by a concurrent writer
 * between the snapshot and the write still collide. This sink trades
 * throughput for the reference's per-row linearizable guarantee: every row
 * is offered individually and the TARGET decides atomically. Use it when
 * the target is live and contended; use the anti-join plan when it is not.
 *
 * Scale shape: `foreachPartition` with one writer per partition (the
 * open-once-per-partition pattern a real driver session needs), row results
 * counted through accumulators — no collect, no driver round-trips. A
 * production binding implements [[LwtWriterFactory]] over the DataStax
 * driver (`session.execute(insert.ifNotExists())`, checking
 * `ResultSet.wasApplied()`); [[graft.sinks.InMemoryLwtWriter]] is the
 * in-JVM test double.
 */
object StrictSink {

  /** One open writer bound to a target table. Implementations must be
    * usable from a single task thread; `insertIfNotExists` returns whether
    * the row was APPLIED (true) or lost to an existing PK (false).
    */
  trait LwtRowWriter extends AutoCloseable {
    def insertIfNotExists(pk: Seq[Any], row: Row): Boolean
    override def close(): Unit = ()
  }

  /** Serializable factory shipped to executors; opened once per partition. */
  trait LwtWriterFactory extends Serializable {
    def open(schema: StructType, pkColumns: Seq[String]): LwtRowWriter
  }

  final case class StrictSinkResult(rowsApplied: Long, rowsRejected: Long)

  /** Write `df` row-by-row with insert-if-not-exists semantics.
    *
    * Accounting caveat (same as the reference's counters): the TARGET's
    * putIfAbsent is exactly-once per PK, but the applied/rejected COUNTS
    * ride accumulators, which re-add on task retry — after a task failure
    * the counts are at-least-once. The data can never duplicate; only the
    * report can over-count on retry.
    */
  def insertIfNotExists(
      df: DataFrame, pkColumns: Seq[String],
      factory: LwtWriterFactory): StrictSinkResult = {
    require(pkColumns.nonEmpty, "strict insert-if-not-exists needs pkColumns")
    val schema = df.schema
    val pkIdx = pkColumns.map(schema.fieldIndex)
    val spark = df.sparkSession
    val applied = spark.sparkContext.longAccumulator("graft_lwt_applied")
    val rejected = spark.sparkContext.longAccumulator("graft_lwt_rejected")
    df.foreachPartition { (rows: Iterator[Row]) =>
      val w = factory.open(schema, pkColumns)
      try rows.foreach { r =>
        val pk = pkIdx.map(r.get)
        if (w.insertIfNotExists(pk, r)) applied.add(1L) else rejected.add(1L)
      } finally w.close()
    }
    StrictSinkResult(applied.value, rejected.value)
  }
}

/** In-JVM LWT test double: a process-wide PK-keyed map with atomic
  * putIfAbsent — the linearization point a real LWT provides server-side.
  * Local-mode executors share the JVM, so concurrent tasks genuinely
  * contend on it, which is exactly what the tests need to prove.
  */
object InMemoryLwtStore {
  import java.util.concurrent.ConcurrentHashMap
  private val tables =
    new ConcurrentHashMap[String, ConcurrentHashMap[Seq[Any], Seq[Any]]]()

  def table(name: String): ConcurrentHashMap[Seq[Any], Seq[Any]] =
    tables.computeIfAbsent(name, _ => new ConcurrentHashMap)

  def drop(name: String): Unit = tables.remove(name)
}

final case class InMemoryLwtWriter(tableName: String) extends StrictSink.LwtWriterFactory {
  override def open(schema: StructType, pkColumns: Seq[String]): StrictSink.LwtRowWriter =
    new StrictSink.LwtRowWriter {
      private val t = InMemoryLwtStore.table(tableName)
      override def insertIfNotExists(pk: Seq[Any], row: Row): Boolean =
        t.putIfAbsent(pk, row.toSeq) == null
    }
}
