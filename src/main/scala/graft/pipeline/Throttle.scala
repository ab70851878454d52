package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders, Row}

/**
 * Batch-mode throughput cap — O17 parity for the batch planner
 * (VERDICT r4 #4). The reference sleeps `pauseMillisBetweenPages` between
 * page writes (reference: MigrateTableTask.java:325-330); the Spark-native
 * unit of "page" in a batch write is `pageSize` rows within one task, so
 * each task pauses between its pages. Total cluster throughput is then
 * capped at roughly `parallelism × pageSize / pauseMillis` rows per
 * second (the reference is single-threaded, so its cap is one task's) —
 * size the pause for the TARGET's aggregate write tolerance, not per-task.
 *
 * This is deliberately a `mapPartitions`: a rate limiter is genuinely
 * imperative per-partition logic, and since its entire purpose is to make
 * the pipeline SLOWER, the ser/deser cost of leaving codegen is paid only
 * when a user explicitly asks for pacing.
 */
object Throttle {

  /** Emit `df` unchanged, pausing `pauseMillis` after every `pageSize`
    * rows within each partition (between pages — no trailing sleep after a
    * final partial page, matching the reference's loop shape).
    */
  def paced(df: DataFrame, pageSize: Int, pauseMillis: Long): DataFrame = {
    require(pageSize > 0, s"pageSize must be positive, got $pageSize")
    val enc = Encoders.row(df.schema)
    df.mapPartitions { it =>
      new Iterator[Row] {
        private var inPage = 0
        override def hasNext: Boolean = it.hasNext
        override def next(): Row = {
          if (inPage == pageSize) {
            Thread.sleep(pauseMillis)
            inPage = 0
          }
          inPage += 1
          it.next()
        }
      }
    }(enc).toDF()
  }
}
