package graft.sources.memdb

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import scala.jdk.CollectionConverters._

/**
 * In-memory DSv2 table provider — the integration stand-in for the
 * production Cassandra binding (no cluster or connector jar exists in this
 * environment; with the real thing only the format string changes:
 * `graft.sources.memdb.MemDb` → `org.apache.spark.sql.cassandra`).
 *
 * What it makes testable, end to end through [[graft.sources.Tables]]:
 *  - table-ADDRESSED source/sink binding (`option("table", …)`) — the
 *    reference's keyspace.table identity
 *    (cassandra/CassandraConnectionAdapter.java:184-234);
 *  - schema + primary-key DISCOVERY through the DSv2 `Table.partitioning()`
 *    contract (the reference reads cluster metadata,
 *    MigrateTableTask.java:415-428) — PK columns surface as identity
 *    transforms, exactly how the Cassandra connector exposes partition keys;
 *  - writer OPTION handoff (e.g. the per-row TTL column option,
 *    DefaultMigratorPlugin.java:290-304): the store records each write's
 *    options for assertion.
 *
 * Tables must be created up front ([[MemStore.create]]) — live-DB
 * migrations target pre-existing tables, so absence is an error, not a
 * create-on-write.
 *
 * Semantics: append appends; SaveMode.Overwrite arrives as truncate+append
 * (`SupportsTruncate`). Commit is atomic per write (rows travel in commit
 * messages and land in one store update — a failed job leaves the table
 * untouched). Local-mode only by construction (one JVM): the store is a
 * process-wide map, which is exactly what an integration test needs.
 */
class MemDb extends TableProvider {

  override def supportsExternalMetadata(): Boolean = false

  private def tableId(options: CaseInsensitiveStringMap): (String, String) = (
    Option(options.get("db")).getOrElse("default"),
    Option(options.get("table")).getOrElse(
      throw new IllegalArgumentException("memdb requires option 'table'")))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val (db, table) = tableId(options)
    MemStore.get(db, table).map(_.schema).getOrElse(
      throw MemStore.noSuchTable(db, table))
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val (db, table) = tableId(opts)
    new MemTable(db, table)
  }
}

private[memdb] class MemTable(db: String, table: String)
    extends Table with SupportsRead with SupportsWrite {

  private def state: MemStore.TableState =
    MemStore.get(db, table).getOrElse(throw MemStore.noSuchTable(db, table))

  override def name(): String = s"$db.$table"
  override def schema(): StructType = state.schema

  /** PK columns as identity transforms — the discovery contract
    * ([[graft.sources.Discovery]] reads these, like it would from the
    * Cassandra connector's table).
    */
  override def partitioning(): Array[Transform] =
    state.pk.map(Expressions.identity).toArray

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  // ------------------------------------------------------------------ read

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = state.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        val rows = state.rows
        // a few partitions so the read exercises parallelism like a real
        // token-range scan would
        val slices = math.max(1, math.min(4, rows.length))
        (0 until slices).map(i =>
          MemPartition(rows.zipWithIndex.filter(_._2 % slices == i).map(_._1))
            : InputPartition).toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        (partition: InputPartition) => {
          val rows = partition.asInstanceOf[MemPartition].rows
          new PartitionReader[InternalRow] {
            private var i = -1
            override def next(): Boolean = { i += 1; i < rows.length }
            override def get(): InternalRow = rows(i)
            override def close(): Unit = ()
          }
        }
    }

  // ----------------------------------------------------------------- write

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var doTruncate = false
      private val writeOptions = info.options.asScala.toMap
      override def truncate(): WriteBuilder = { doTruncate = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new BatchWrite {
          override def createBatchWriterFactory(i: PhysicalWriteInfo): DataWriterFactory =
            new MemWriterFactory
          override def commit(messages: Array[WriterCommitMessage]): Unit = {
            val rows = messages.iterator.flatMap {
              case RowsMessage(rs) => rs
              case _ => Iterator.empty
            }.toVector
            MemStore.commit(db, table, rows, replace = doTruncate, writeOptions)
          }
          override def abort(messages: Array[WriterCommitMessage]): Unit = ()
        }
      }
    }
}

private[memdb] final case class MemPartition(rows: Vector[InternalRow])
    extends InputPartition

private[memdb] final case class RowsMessage(rows: Array[InternalRow])
    extends WriterCommitMessage

private[memdb] class MemWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = Array.newBuilder[InternalRow]
      override def write(record: InternalRow): Unit = buf += record.copy()
      override def commit(): WriterCommitMessage = RowsMessage(buf.result())
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}

/** The process-wide table store behind [[MemDb]]. */
object MemStore {

  final case class TableState(
      schema: StructType,
      pk: Seq[String],
      rows: Vector[InternalRow],
      lastWriteOptions: Map[String, String])

  private val tables = new ConcurrentHashMap[(String, String), TableState]()

  def create(db: String, table: String, schema: StructType,
      pk: Seq[String] = Nil): Unit =
    tables.put((db, table), TableState(schema, pk, Vector.empty, Map.empty))

  def get(db: String, table: String): Option[TableState] =
    Option(tables.get((db, table)))

  def drop(db: String, table: String): Unit = tables.remove((db, table))

  def commit(db: String, table: String, rows: Vector[InternalRow],
      replace: Boolean, options: Map[String, String]): Unit =
    tables.compute((db, table), (_, prev) => {
      if (prev == null) throw noSuchTable(db, table)
      prev.copy(
        rows = if (replace) rows else prev.rows ++ rows,
        lastWriteOptions = options)
    })

  /** Last write's DSv2 options — the TTL-handoff assertion point. */
  def lastWriteOptions(db: String, table: String): Map[String, String] =
    get(db, table).map(_.lastWriteOptions).getOrElse(Map.empty)

  private[memdb] def noSuchTable(db: String, table: String): Exception =
    new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(Seq(db, table))
}
