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

/** Sliding-window latency percentiles — the reference keeps 60 s sliding
  * histograms of per-page fetch/write millis
  * (reference: MigrateTableTask.java:58,146-151). Samples older than
  * `windowMillis` age out on record/read; percentiles are nearest-rank
  * over the surviving window. Driver-side only (listener callbacks), so a
  * plain synchronized deque is plenty: the window holds one entry per
  * task/micro-batch, and sorting a few thousand longs per status line is
  * noise next to the interval itself.
  */
final class LatencyWindow(windowMillis: Long = 60000L) {
  private val samples = new java.util.ArrayDeque[Array[Long]]()

  def record(durationMillis: Long,
      now: Long = System.currentTimeMillis()): Unit = samples.synchronized {
    samples.addLast(Array(now, durationMillis))
    evict(now)
  }

  private def evict(now: Long): Unit =
    while (!samples.isEmpty && samples.peekFirst()(0) < now - windowMillis)
      samples.removeFirst()

  private def sortedValues(now: Long): Array[Long] = samples.synchronized {
    evict(now)
    val out = new Array[Long](samples.size())
    val it = samples.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next()(1); i += 1 }
    java.util.Arrays.sort(out)
    out
  }

  /** `p50=..ms p95=..ms p99=..ms max=..ms n=..` over the current window;
    * None when the window is empty (idle intervals stay quiet).
    */
  def summary(now: Long = System.currentTimeMillis()): Option[String] = {
    val s = sortedValues(now)
    if (s.isEmpty) None
    else {
      def pct(q: Double): Long =
        s(math.max(0, math.min(s.length - 1, math.ceil(q * s.length).toInt - 1)))
      Some(f"p50=${pct(0.50)}ms p95=${pct(0.95)}ms p99=${pct(0.99)}ms " +
        f"max=${s.last}ms n=${s.length}")
    }
  }
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
  // task duration is the Spark-native unit of "page took this long" —
  // the reference's pageFetch/writeBatch histograms, task-granular
  private val taskLatency = new LatencyWindow()

  private val listener = new SparkListener {
    override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
      val m = taskEnd.taskMetrics
      if (m != null) {
        rowsRead.addAndGet(m.inputMetrics.recordsRead)
        rowsWritten.addAndGet(m.outputMetrics.recordsWritten)
      }
      if (taskEnd.taskInfo != null) taskLatency.record(taskEnd.taskInfo.duration)
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
            val lat = taskLatency.summary()
              .map(s => s" taskMillis[$s]").getOrElse("")
            sink(f"[graft-progress] table=$table rowsRead=$r (+${r - lastRead}) " +
              f"rowsWritten=$w (+${w - lastWritten}) readRate=$rate%.0f rows/s" + lat)
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
  // batch total = the reference's per-page wall time; addBatch = its
  // writeBatchTookMillis (sink-side portion), both 60 s sliding windows
  private val batchLatency =
    new java.util.concurrent.ConcurrentHashMap[java.util.UUID, (LatencyWindow, LatencyWindow)]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
    sink(s"[graft-progress] stream=${e.name} started")

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val total = cumulative.merge(p.id, p.numInputRows, (a, b) => a + b)
    val (trigWin, writeWin) = batchLatency.computeIfAbsent(p.id,
      _ => (new LatencyWindow(), new LatencyWindow()))
    Option(p.durationMs.get("triggerExecution")).foreach(d => trigWin.record(d))
    Option(p.durationMs.get("addBatch")).foreach(d => writeWin.record(d))
    val lat = trigWin.summary().map(s => s" batchMillis[$s]").getOrElse("") +
      writeWin.summary().map(s => s" writeMillis[$s]").getOrElse("")
    sink(f"[graft-progress] stream batch=${p.batchId} rows=${p.numInputRows} " +
      f"cumulative=$total rate=${p.processedRowsPerSecond}%.0f rows/s" + lat)
  }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = {
    cumulative.remove(e.id)
    batchLatency.remove(e.id)
    sink(s"[graft-progress] stream terminated" +
      e.exception.map(x => s" (error: $x)").getOrElse(""))
  }
}
