package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Event-time windowed aggregation under Structured Streaming — the
 * stream-native sibling of the batch `e01_event_window_agg` query
 * (tumbling window + hash aggregate), with a watermark bounding state.
 *
 * Scale posture: state per (window × key), pruned as the watermark
 * advances — an endless stream holds only `lateness`-window state, never
 * stream-length state. The aggregation itself is the same partial/final
 * hash agg Catalyst plans for batch; sums route through DECIMAL so
 * micro-batch accumulation order cannot perturb the double result (same
 * discipline as the batch oracles).
 */
object StreamingWindowAgg {

  /** Tumbling-window count+sum per (window, key). `tsCol` must be a real
    * timestamp column; the watermark both tolerates `lateness` of disorder
    * and bounds the state store.
    */
  def windowedAgg(
      stream: DataFrame, tsCol: String, keyCol: String, valueCol: String,
      windowLength: String = "1 hour", lateness: String = "1 hour"): DataFrame =
    stream
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowLength), col(keyCol))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast(DecimalType(18, 6))).cast("double").as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col(keyCol), col("n_events"), col("sum_value"))
}
