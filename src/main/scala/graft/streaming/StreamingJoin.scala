package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Stream-stream event-time interval join — the streaming sibling of the
 * batch [[graft.operators.TemporalJoin.rangeJoin]]: pair each left event
 * with the right events sharing its key whose timestamps fall inside
 * `[leftTs - before, leftTs + after]` (the impressions-to-clicks /
 * requests-to-responses shape).
 *
 * Scale posture: BOTH sides are watermarked, and the join's time-bound
 * condition lets Spark prune each side's buffered state as the other
 * side's watermark advances — an endless stream holds only
 * `lateness + before/after` worth of rows, never stream-length state.
 * Without the range condition (or with only one watermark) the state
 * store grows unboundedly; the requires below make that misuse loud.
 */
object StreamingJoin {

  /** Inner interval join on `key` with `rightTs` in
    * `[leftTs - before, leftTs + after]`. Both inputs must be streaming
    * frames with real timestamp columns; column names must be disjoint
    * apart from `key` (rename upstream — this operator refuses to guess).
    */
  def intervalJoin(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      before: String = "0 seconds", after: String = "10 minutes",
      lateness: String = "1 hour"): DataFrame = {
    require(left.isStreaming && right.isStreaming,
      "intervalJoin is the streaming shape; use TemporalJoin.rangeJoin for batch")
    val overlap = left.columns.toSet.intersect(right.columns.toSet) - key
    require(overlap.isEmpty,
      s"ambiguous columns ${overlap.mkString(", ")}; rename before joining")
    val l = left.withWatermark(leftTs, lateness)
    val r = right.withWatermark(rightTs, lateness)
    l.join(r,
      l(key) === r(key) &&
        r(rightTs) >= l(leftTs) - expr(s"INTERVAL $before") &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $after"),
      "inner")
      .drop(r(key))
  }
}
