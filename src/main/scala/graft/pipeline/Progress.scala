package graft.pipeline

import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/**
 * Periodic progress reporting — O20 in full. The reference logs a delta
 * status line on a timer while the page loop runs: rows read / migrated /
 * failed plus a rows-per-second figure over the last interval
 * (reference: MigrateTableTask.java:369-413, interval config :146-151).
 *
 * Two Spark-native counterparts:
 *  - [[BatchProgressReporter]]: a `SparkListener` summing task input/output
 *    records + a daemon timer emitting interval deltas while a batch
 *    migration executes. Listener counts are task-granular, so long jobs
 *    produce meaningful intermediate lines (exactly what the reference's
 *    page counter gave).
 *  - [[StreamingProgressListener]]: a `StreamingQueryListener` that turns
 *    every micro-batch's `QueryProgressEvent` into the same delta line —
 *    micro-batch = the reference's page, so per-batch IS per-page.
 *
 * Lines go to a pluggable sink (default: the project logger) so tests can
 * capture them and operators can redirect them.
 */
object Progress {
  private[pipeline] lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  def defaultSink: String => Unit = line => log.info(line)
}

/** Interval-delta reporter for batch migrations. Start before the write,
  * stop (always) after; emits nothing on idle intervals.
  */
final class BatchProgressReporter(
    spark: SparkSession,
    table: String,
    intervalMillis: Long,
    sink: String => Unit = Progress.defaultSink) {

  private val rowsRead = new AtomicLong(0L)
  private val rowsWritten = new AtomicLong(0L)
  private val running = new AtomicBoolean(false)

  private val listener = new SparkListener {
    override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
      val m = taskEnd.taskMetrics
      if (m != null) {
        rowsRead.addAndGet(m.inputMetrics.recordsRead)
        rowsWritten.addAndGet(m.outputMetrics.recordsWritten)
      }
    }
  }

  private var thread: Thread = _

  def start(): Unit = {
    running.set(true)
    spark.sparkContext.addSparkListener(listener)
    thread = new Thread(() => {
      var lastRead = 0L
      var lastWritten = 0L
      try {
        while (running.get()) {
          Thread.sleep(intervalMillis)
          val r = rowsRead.get()
          val w = rowsWritten.get()
          if (running.get() && (r != lastRead || w != lastWritten)) {
            val rate = (r - lastRead) * 1000.0 / intervalMillis
            sink(f"[graft-progress] table=$table rowsRead=$r (+${r - lastRead}) " +
              f"rowsWritten=$w (+${w - lastWritten}) readRate=$rate%.0f rows/s")
            lastRead = r
            lastWritten = w
          }
        }
      } catch {
        case _: InterruptedException => // stop() interrupting the sleep: exit quietly
      }
    }, s"graft-progress-$table")
    thread.setDaemon(true)
    thread.start()
  }

  def stop(): Unit = {
    running.set(false)
    if (thread != null) thread.interrupt()
    spark.sparkContext.removeSparkListener(listener)
  }
}

/** Per-micro-batch status lines for streaming migrations (micro-batch =
  * the reference's page). Cumulative counts are tracked per query id.
  */
final class StreamingProgressListener(
    sink: String => Unit = Progress.defaultSink) extends StreamingQueryListener {

  private val cumulative = new java.util.concurrent.ConcurrentHashMap[java.util.UUID, Long]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
    sink(s"[graft-progress] stream=${e.name} started")

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val total = cumulative.merge(p.id, p.numInputRows, (a, b) => a + b)
    sink(f"[graft-progress] stream batch=${p.batchId} rows=${p.numInputRows} " +
      f"cumulative=$total rate=${p.processedRowsPerSecond}%.0f rows/s")
  }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = {
    cumulative.remove(e.id)
    sink(s"[graft-progress] stream terminated" +
      e.exception.map(x => s" (error: $x)").getOrElse(""))
  }
}
