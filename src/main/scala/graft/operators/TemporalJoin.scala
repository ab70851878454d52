package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal join operators the reference's config language cannot express
 * but an event-log migration/analytics user reaches for immediately:
 * as-of joins ("latest right row at or before each left row") and
 * point-in-interval range joins. The reference stores raw event streams
 * (`events`-style CQL tables with a clustering timestamp) and leaves
 * temporal correlation to the consumer; here they are first-class,
 * Spark-shaped operators.
 *
 * Both are built so the shuffle cost is the cost of an ordinary keyed
 * shuffle — NO range-cross-product, NO broadcast of a whole table, no
 * per-row subqueries:
 *
 *  - [[asOfJoin]] is the union-merge formulation: tag both inputs, union,
 *    ONE shuffle+sort on `(keys, ts)`, and a running `last(ignoreNulls)`
 *    window carries the most recent right payload forward into each left
 *    row. O(n log n) per key group, k rows of state, and the plan is one
 *    Window over one Exchange regardless of how many right rows precede
 *    each left row (a naive range join is O(left × right) per key).
 *  - [[rangeJoin]] buckets time: each point lands in exactly one
 *    fixed-width bucket, each interval explodes into the buckets it
 *    covers, and the match becomes an equi-join on bucket plus a residual
 *    range predicate. Every qualifying pair meets in exactly one bucket
 *    (the point's), so no dedup pass is needed. Shuffle volume is
 *    |points| + Σ interval-spans — linear, not quadratic, and skew is
 *    bounded by the bucket width.
 */
object TemporalJoin {

  /**
   * For every left row, attach the payload of the matching right row with
   * the same `keys` — by `direction`:
   *
   *  - `"backward"` (default): the latest right row with `rightTs` <=
   *    `leftTs` (strictly <, when `allowExactMatch` is false)
   *  - `"forward"`: the earliest right row with `rightTs` >= `leftTs`
   *    (strictly >, when `allowExactMatch` is false)
   *  - `"nearest"`: whichever of the two is closer in time; exact
   *    distance ties go backward. Still one shuffle: both direction
   *    windows sort the SAME keyed exchange (the second Window reuses the
   *    exchange, paying only a re-sort).
   *
   * Left rows with no match keep null payload columns (left-outer
   * semantics); rows with a null timestamp on either side never match.
   *
   * `tolerance` (pandas merge_asof semantics): when set, a match farther
   * than `tolerance` time units from the left timestamp nulls out — the
   * direction picks the candidate FIRST, then the bound applies, so
   * "nearest" never falls back to its farther side. Same plan shape:
   * the check is one map-side conditional on the matched struct.
   *
   * When several right rows share the winning `(keys, ts)`, the one with
   * the greatest `tieBreak` value wins (whole-payload, atomically — the
   * payload travels as one struct, so the winner's columns are never
   * mixed with another row's). With no tie-break the winner among exact
   * ts duplicates is input-order-dependent; pass one whenever the right
   * side can hold duplicate timestamps per key.
   *
   * Payload columns are emitted as `prefix + name` alongside every left
   * column; include the right timestamp column in `payload` if the
   * output should carry it.
   */
  def asOfJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      prefix: String = "right_",
      allowExactMatch: Boolean = true,
      tieBreak: Option[String] = None,
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "asOfJoin requires at least one equi-key")
    require(payload.nonEmpty, "asOfJoin requires at least one payload column")
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got '$direction'")
    require(tolerance.forall(_ >= 0L), "tolerance must be non-negative")
    val outNames = payload.map(prefix + _)
    val clash = outNames.intersect(left.columns.toSeq)
    require(clash.isEmpty,
      s"payload output columns ${clash.mkString(", ")} collide with left " +
        "columns — pass a different prefix")

    // the right ts rides INSIDE the payload struct (field "__rts") so
    // "nearest" can compare distances without a second pass over `right`
    val payloadStruct = struct(col(rightTs).as("__rts") +: payload.map(col): _*)
    val payloadType = right.select(payloadStruct).schema.head.dataType
    val leftRowType = left.select(struct(left.columns.map(col).toIndexedSeq: _*))
      .schema.head.dataType
    // the tie-break keeps its NATIVE type: casting to double would
    // collapse 64-bit ids above 2^53 and make the "greatest wins"
    // contract input-order-dependent for snowflake-style ids
    val tieType = tieBreak.map(tb => right.schema(tb).dataType)
      .getOrElse(org.apache.spark.sql.types.IntegerType)

    val lPrep = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__ts"),
        lit(1).as("__side"),
        lit(null).cast(tieType).as("__tie"),
        struct(left.columns.map(col).toIndexedSeq: _*).as("__lrow"),
        lit(null).cast(payloadType).as("__payload")): _*)
    val rPrep = right
      // null timestamps never match; neither do null equi-keys (the
      // window's null partition would otherwise pair them, diverging
      // from join semantics where NULL = NULL is not a match)
      .filter(keys.map(col(_).isNotNull).reduce(_ && _) && col(rightTs).isNotNull)
      .select(
        keys.map(col) ++ Seq(
          col(rightTs).as("__ts"),
          lit(0).as("__side"),
          tieBreak.map(col(_)).getOrElse(lit(0)).cast(tieType).as("__tie"),
          lit(null).cast(leftRowType).as("__lrow"),
          payloadStruct.as("__payload")): _*)

    // In iteration order the right row must come BEFORE the left row to
    // be visible to it (<=/>= semantics) and after it for strict </>;
    // among right ts-duplicates ascending __tie puts the greatest
    // tie-break last, which is exactly the row last(ignoreNulls) picks
    // up — with NULL tie-breaks FIRST, so a row without a tie-break can
    // only win when no tie-broken row exists (max_by-style null
    // handling). The backward window iterates ts ascending, the forward
    // one descending — same partitioning, so they share one exchange.
    val sideOrder = if (allowExactMatch) col("__side").asc else col("__side").desc
    def w(tsOrder: Column) = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, sideOrder, col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wBack = w(col("__ts").asc_nulls_first)
    // desc puts nulls LAST by default: null-ts left rows would "see"
    // every right row — force them first so they match nothing
    val wFwd = w(col("__ts").desc_nulls_first)

    val union = lPrep.unionByName(rPrep)
    val withDirs = direction match {
      case "backward" =>
        union.withColumn("__mb", last(col("__payload"), ignoreNulls = true).over(wBack))
      case "forward" =>
        union.withColumn("__mf", last(col("__payload"), ignoreNulls = true).over(wFwd))
      case "nearest" =>
        union
          .withColumn("__mb", last(col("__payload"), ignoreNulls = true).over(wBack))
          .withColumn("__mf", last(col("__payload"), ignoreNulls = true).over(wFwd))
    }
    val matchedCol = direction match {
      case "backward" => col("__mb")
      case "forward" => col("__mf")
      case "nearest" =>
        when(col("__mb").isNull, col("__mf"))
          .when(col("__mf").isNull, col("__mb"))
          // backward wins exact-distance ties
          .when((col("__ts") - col("__mb.__rts")) <= (col("__mf.__rts") - col("__ts")),
            col("__mb"))
          .otherwise(col("__mf"))
    }
    // tolerance (pandas merge_asof semantics): the DIRECTION picks the
    // match first, then an out-of-tolerance match nulls out — nearest
    // does NOT fall back to its other side when the closer one is too
    // far. One abs() covers all directions (backward distance is >= 0,
    // forward <= 0).
    val tolerated = tolerance match {
      case None => matchedCol
      case Some(tol) =>
        when(abs(col("__ts") - matchedCol.getField("__rts")) <= tol, matchedCol)
    }
    val matched = withDirs
      .withColumn("__matched", when(col("__ts").isNotNull, tolerated))
      .filter(col("__side") === 1)

    val leftCols = left.columns.toSeq.map(c => col("__lrow").getField(c).as(c))
    val payloadCols = payload.zip(outNames).map { case (p, o) =>
      col("__matched").getField(p).as(o)
    }
    matched.select(leftCols ++ payloadCols: _*)
  }

  /**
   * Inner point-in-interval join: pairs every `points` row with every
   * `intervals` row (sharing `extraKeys`, if given) whose half-open
   * INTEGER window `[start, end)` contains `pointTs`. All three bound
   * columns must be integral (epoch micros/nanos, sequence numbers):
   * bucketing runs in exact 64-bit arithmetic — a double-division
   * formulation would misassign buckets above 2^53 (i.e. every
   * nanosecond epoch) and silently drop boundary pairs, and fractional
   * axes would under-cover an interval's final bucket.
   *
   * `bucketWidth` trades shuffle fan-out for residual-filter work: an
   * interval is replicated once per covered bucket, so pick a width near
   * the typical interval length (one-to-two buckets per interval).
   * Intervals spanning more than `maxBucketsPerInterval` buckets are
   * dropped, not exploded — the same default-on skew-guard contract as
   * the LSH `capBuckets` family — and the drop count is published via
   * `observe` as `dropped_intervals` under `metricName` (override it
   * when composing several rangeJoins in one query: Spark rejects two
   * observe nodes with the same name) so a production run can alert on
   * loss rather than silently eat a 10^6-bucket explosion. Degenerate
   * intervals (`end <= start`) contain no points and are likewise
   * dropped (uncounted).
   */
  private val integralTypes: Set[org.apache.spark.sql.types.DataType] =
    Set(org.apache.spark.sql.types.LongType, org.apache.spark.sql.types.IntegerType,
      org.apache.spark.sql.types.ShortType, org.apache.spark.sql.types.ByteType)

  private def requireIntegral(op: String,
      fields: Seq[org.apache.spark.sql.types.StructField]): Unit =
    fields.foreach(f => require(integralTypes(f.dataType),
      s"$op needs an integral time axis, got ${f.name}: ${f.dataType.sql}"))

  /** Exact floor division to a bucket id: subtract the (non-negative)
    * pmod remainder, then `div` (integral divide) — no doubles anywhere
    * on the bucket path; `/` would round through double and misassign
    * past 2^53.
    */
  private def bucketOf(bucketWidth: Long)(sqlVal: String): Column =
    expr(s"($sqlVal - pmod($sqlVal, ${bucketWidth}L)) div ${bucketWidth}L")

  private def bucketOfCol(bucketWidth: Long)(name: String): Column =
    bucketOf(bucketWidth)(s"CAST(`$name` AS BIGINT)")

  /** Shared interval-side preparation for [[rangeJoin]] and
    * [[intervalOverlapJoin]]: drop empty intervals, cap the per-interval
    * bucket span (an adversarial interval would otherwise explode into
    * millions of rows) with the drop count published under `metricName`,
    * then explode one row per covered bucket into `__bucket`.
    */
  private def bucketizeIntervals(df: DataFrame, start: String, end: String,
      bucketWidth: Long, maxBucketsPerInterval: Int,
      metricName: String): DataFrame = {
    val bucketEndM1 = bucketOf(bucketWidth)(s"(CAST(`$end` AS BIGINT) - 1)")
    val span = bucketEndM1 - bucketOfCol(bucketWidth)(start)
    df.filter(col(end) > col(start))
      .withColumn("__span", span)
      .observe(metricName,
        sum(when(col("__span") >= maxBucketsPerInterval, 1L).otherwise(0L))
          .as("dropped_intervals"))
      .filter(col("__span") < maxBucketsPerInterval)
      .withColumn("__bucket",
        explode(sequence(bucketOfCol(bucketWidth)(start), bucketEndM1)))
      .drop("__span")
  }

  def rangeJoin(
      points: DataFrame, intervals: DataFrame,
      pointTs: String, start: String, end: String,
      bucketWidth: Long, extraKeys: Seq[String] = Nil,
      maxBucketsPerInterval: Int = 1024,
      metricName: String = "range_join_guard"): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    requireIntegral("rangeJoin",
      Seq(points.schema(pointTs), intervals.schema(start), intervals.schema(end)))
    val guarded = bucketizeIntervals(intervals, start, end, bucketWidth,
      maxBucketsPerInterval, metricName)
    val bucketed = points.withColumn("__bucket", bucketOfCol(bucketWidth)(pointTs))
    bucketed.join(guarded, Seq("__bucket") ++ extraKeys)
      .where(col(pointTs) >= col(start) && col(pointTs) < col(end))
      .drop("__bucket")
  }

  /** Interval × interval overlap join — pairs whose half-open spans
    * `[lStart, lEnd)` and `[rStart, rEnd)` intersect (optionally within
    * `extraKeys` groups): span conflict detection, meeting/booking overlap,
    * validity-interval reconciliation. Same scale shape as [[rangeJoin]]:
    * BOTH sides explode into fixed-width buckets and meet in ONE
    * `(bucket, keys)` equi-join — never a nested-loop inequality scan —
    * with the residual overlap predicate after. A pair overlapping k
    * buckets would surface k times, so only the bucket containing the
    * overlap's START (`bucket(greatest(lStart, rStart))`) emits the pair:
    * exactly-once with plain column arithmetic, no distinct/dedup shuffle.
    * Both explodes carry the [[rangeJoin]] span cap with observe-reported
    * drop counts (`<metricName>_left` / `_right`).
    *
    * The frames must not share column names (callers pre-select/rename,
    * as with every join here); both time axes must be integral.
    */
  def intervalOverlapJoin(
      left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketWidth: Long, extraKeys: Seq[String] = Nil,
      maxBucketsPerInterval: Int = 1024,
      metricName: String = "interval_overlap_guard"): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val shared = left.columns.toSet.intersect(right.columns.toSet) -- extraKeys
    require(shared.isEmpty,
      s"left/right share non-key columns ${shared.mkString(", ")} — rename before joining")
    requireIntegral("intervalOverlapJoin",
      Seq(left.schema(lStart), left.schema(lEnd),
        right.schema(rStart), right.schema(rEnd)))
    bucketizeIntervals(left, lStart, lEnd, bucketWidth,
        maxBucketsPerInterval, s"${metricName}_left")
      .join(bucketizeIntervals(right, rStart, rEnd, bucketWidth,
        maxBucketsPerInterval, s"${metricName}_right"), Seq("__bucket") ++ extraKeys)
      .where(col(lStart) < col(rEnd) && col(rStart) < col(lEnd) &&
        bucketOf(bucketWidth)(
          s"greatest(CAST(`$lStart` AS BIGINT), CAST(`$rStart` AS BIGINT))")
          === col("__bucket"))
      .drop("__bucket")
  }
}
