package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Event-time SESSION windows under Structured Streaming — the
 * stream-native sibling of the batch `e02_sessionization` query. Uses
 * Spark's native `session_window` (gap-based, merging) so the state store
 * holds open sessions per key and closes them as the watermark passes
 * their gap — an endless stream never holds more than the open-session
 * set, and the merge logic (two events within `gap` extend one session)
 * is the engine's, not re-implemented per batch.
 *
 * Sums route through DECIMAL so micro-batch arrival order cannot perturb
 * the double result — the same discipline as the batch oracles, which is
 * what makes an exact batch-parity spec possible at all.
 */
object StreamingSessionAgg {

  /** Per-(key, session) aggregate: session bounds, event count, value sum.
    * A session extends while consecutive events per key arrive within
    * `gap`; the watermark closes sessions and prunes their state.
    */
  def sessionAgg(
      stream: DataFrame, tsCol: String, keyCol: String, valueCol: String,
      gap: String = "30 minutes", lateness: String = "1 hour"): DataFrame =
    stream
      .withWatermark(tsCol, lateness)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast(DecimalType(18, 6))).cast("double").as("sum_value"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col(keyCol), col("n_events"), col("sum_value"))
}
