package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TemporalJoinSpec extends SparkTestBase {
  import spark.implicits._

  // (id, key, ts, value) quotes; (id, key, ts) trades — classic as-of shape
  private def quotes = Seq(
    (1L, "a", 10L, 1.0),
    (2L, "a", 20L, 2.0),
    (3L, "a", 30L, 3.0),
    (4L, "b", 15L, 9.0)).toDF("q_id", "key", "q_ts", "price")

  private def trades = Seq(
    (100L, "a", 5L),   // before every quote
    (101L, "a", 20L),  // exactly on quote 2
    (102L, "a", 25L),  // between quotes 2 and 3
    (103L, "b", 14L),  // just before b's only quote
    (104L, "c", 50L)   // key with no quotes at all
  ).toDF("t_id", "key", "t_ts")

  test("asOfJoin: latest right row at-or-before each left row, per key") {
    val got = TemporalJoin.asOfJoin(
      trades, quotes, Seq("key"), "t_ts", "q_ts",
      payload = Seq("q_id", "price"), prefix = "q_")
      .select("t_id", "q_q_id", "q_price")
      .collect().map(r => r.getLong(0) -> (
        (if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) -1.0 else r.getDouble(2)))).toMap

    assert(got(100L) === (-1L, -1.0), "no quote at or before ts=5")
    assert(got(101L) === (2L, 2.0), "exact-ts match is visible by default")
    assert(got(102L) === (2L, 2.0))
    assert(got(103L) === (-1L, -1.0), "b's quote is later than the trade")
    assert(got(104L) === (-1L, -1.0), "unseen key matches nothing")
  }

  test("asOfJoin: allowExactMatch=false takes strictly-earlier rows only") {
    val got = TemporalJoin.asOfJoin(
      trades, quotes, Seq("key"), "t_ts", "q_ts",
      payload = Seq("q_id"), prefix = "q_", allowExactMatch = false)
      .select("t_id", "q_q_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got(101L) === 1L, "ts=20 must see quote 1 (ts=10), not quote 2 (ts=20)")
  }

  test("asOfJoin: tie-break picks one whole payload row, never a column mix") {
    // two right rows at the same (key, ts): winner = max tie-break, and
    // BOTH its fields must come from the same row
    val right = Seq(
      (1L, "a", 10L, "low"),
      (2L, "a", 10L, "high")).toDF("r_id", "key", "r_ts", "tag")
    val left = Seq((7L, "a", 11L)).toDF("l_id", "key", "l_ts")
    val row = TemporalJoin.asOfJoin(
      left, right, Seq("key"), "l_ts", "r_ts",
      payload = Seq("r_id", "tag"), tieBreak = Some("r_id")).collect()(0)
    assert(row.getAs[Long]("right_r_id") === 2L)
    assert(row.getAs[String]("right_tag") === "high")
  }

  test("asOfJoin: equivalent to the naive per-row max subquery on random data") {
    val rnd = new scala.util.Random(7)
    val l = (1 to 300).map(i =>
      (i.toLong, s"k${rnd.nextInt(5)}", rnd.nextInt(100).toLong))
      .toDF("l_id", "key", "l_ts")
    val r = (1 to 200).map(i =>
      (i.toLong + 1000, s"k${rnd.nextInt(6)}", rnd.nextInt(100).toLong))
      .toDF("r_id", "key", "r_ts")
    // naive oracle: unique winning r_id via (r_ts max, then r_id max)
    l.createOrReplaceTempView("l_v"); r.createOrReplaceTempView("r_v")
    val naive = spark.sql(
      """SELECT l_id, (SELECT max_by(r_id, struct(r_ts, r_id)) FROM r_v
                       WHERE r_v.key = l_v.key AND r_ts <= l_ts) AS want
         FROM l_v""").collect()
      .map(r0 => r0.getLong(0) -> (if (r0.isNullAt(1)) -1L else r0.getLong(1))).toMap
    val got = TemporalJoin.asOfJoin(
      l, r, Seq("key"), "l_ts", "r_ts",
      payload = Seq("r_id"), tieBreak = Some("r_id"))
      .collect().map(r0 => r0.getAs[Long]("l_id") ->
        (if (r0.isNullAt(r0.fieldIndex("right_r_id"))) -1L
         else r0.getAs[Long]("right_r_id"))).toMap
    assert(got === naive)
  }

  test("asOfJoin: 64-bit tie-breaks above 2^53 stay exact; null ties lose") {
    // ids differing only in the low bits a double would collapse
    val big = (1L << 60)
    val right = Seq(
      (big + 1L, "a", 10L, "low"),
      (big + 2L, "a", 10L, "high"),
      (-1L, "a", 10L, "junk")).toDF("r_id", "key", "r_ts", "tag")
    val nullTied = right.withColumn("r_id",
      when(col("tag") === "junk", lit(null).cast("long")).otherwise(col("r_id")))
    val left = Seq((7L, "a", 11L)).toDF("l_id", "key", "l_ts")
    val row = TemporalJoin.asOfJoin(
      left, nullTied, Seq("key"), "l_ts", "r_ts",
      payload = Seq("tag"), tieBreak = Some("r_id")).collect()(0)
    assert(row.getAs[String]("right_tag") === "high",
      "max 64-bit id must win exactly; a null tie-break must never beat it")
  }

  test("asOfJoin: null equi-keys never match (join semantics, not window)") {
    val right = Seq((1L, null.asInstanceOf[String], 10L))
      .toDF("r_id", "key", "r_ts")
    val left = Seq((7L, null.asInstanceOf[String], 20L), (8L, "a", 20L))
      .toDF("l_id", "key", "l_ts")
    val got = TemporalJoin.asOfJoin(
      left, right, Seq("key"), "l_ts", "r_ts", payload = Seq("r_id"))
      .select("l_id", "right_r_id")
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(got === Map(7L -> true, 8L -> true),
      "NULL = NULL is not a match, same as the equi-join and ASOF oracles")
  }

  test("asOfJoin: forward direction takes the earliest row at-or-after") {
    val got = TemporalJoin.asOfJoin(
      trades, quotes, Seq("key"), "t_ts", "q_ts",
      payload = Seq("q_id"), prefix = "q_", direction = "forward")
      .select("t_id", "q_q_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got(100L) === 1L, "ts=5 sees the ts=10 quote ahead")
    assert(got(101L) === 2L, "exact-ts match visible forward too")
    assert(got(102L) === 3L, "ts=25 sees ts=30")
    assert(got(103L) === 4L, "b's quote at ts=15 is ahead of the ts=14 trade")
    assert(got(104L) === -1L, "unseen key matches nothing")
  }

  test("asOfJoin: nearest picks the closer side, backward on ties") {
    val right = Seq(
      (1L, "a", 10L), (2L, "a", 20L)).toDF("r_id", "key", "r_ts")
    val left = Seq(
      (50L, "a", 11L),  // 1 back vs 9 fwd -> backward
      (51L, "a", 19L),  // 9 back vs 1 fwd -> forward
      (52L, "a", 15L),  // 5 vs 5 -> tie goes backward
      (53L, "a", 2L),   // nothing behind -> forward
      (54L, "a", 30L)   // nothing ahead -> backward
    ).toDF("l_id", "key", "l_ts")
    val got = TemporalJoin.asOfJoin(
      left, right, Seq("key"), "l_ts", "r_ts",
      payload = Seq("r_id"), direction = "nearest")
      .select("l_id", "right_r_id").as[(Long, Long)].collect().toMap
    assert(got === Map(50L -> 1L, 51L -> 2L, 52L -> 1L, 53L -> 1L, 54L -> 2L))
  }

  private def intervals = Seq(
    (1L, 0L, 10L),    // [0, 10)
    (2L, 10L, 30L),   // [10, 30) — spans multiple width-10 buckets
    (3L, 25L, 26L),   // sub-bucket interval
    (4L, 40L, 40L),   // degenerate (empty)
    (5L, 35L, 45L)    // straddles a bucket boundary
  ).toDF("i_id", "lo", "hi")

  test("asOfJoin: tolerance nulls far matches; nearest never falls back") {
    // backward: trade 102 (ts 25) matches quote 2 (ts 20) at distance 5 —
    // within tolerance 5, but outside tolerance 4; trade 100 matches
    // nothing either way
    def back(tol: Long) = TemporalJoin.asOfJoin(
      trades, quotes, Seq("key"), "t_ts", "q_ts",
      payload = Seq("q_id"), prefix = "q_", tolerance = Some(tol))
      .select("t_id", "q_q_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(back(5L)(102L) === 2L, "distance-5 match survives tolerance 5")
    assert(back(4L)(102L) === -1L, "distance-5 match nulls at tolerance 4")
    assert(back(4L)(101L) === 2L, "exact match always within tolerance")
    // nearest at trade 102: backward quote 2 (dist 5) beats forward quote
    // 3 (dist 5 — tie goes backward); tolerance 4 kills the PICKED match
    // even though the forward one is equally far — no re-selection
    val near = TemporalJoin.asOfJoin(
      trades, quotes, Seq("key"), "t_ts", "q_ts",
      payload = Seq("q_id"), prefix = "q_", direction = "nearest",
      tolerance = Some(4L))
      .select("t_id", "q_q_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(near(102L) === -1L, "nearest does not fall back past tolerance")
    assert(near(103L) === 4L, "b: quote at 15 is distance 1 from trade 14")
  }

  test("rangeJoin: half-open containment, each pair exactly once") {
    val points = Seq((1L, 0L), (2L, 9L), (3L, 10L), (4L, 25L), (5L, 29L),
      (6L, 40L), (7L, 44L), (8L, 45L)).toDF("p_id", "ts")
    val got = TemporalJoin.rangeJoin(points, intervals, "ts", "lo", "hi",
        bucketWidth = 10L)
      .select("p_id", "i_id").as[(Long, Long)].collect().toSeq.sorted
    assert(got === Seq(
      (1L, 1L), (2L, 1L),            // [0,10) gets ts 0 and 9
      (3L, 2L), (4L, 2L),            // [10,30) gets 10, 25, 29
      (4L, 3L), (5L, 2L),            // [25,26) gets 25
      (6L, 5L), (7L, 5L)             // [35,45) gets 40 and 44; 45 excluded
    ), "degenerate interval 4 matches nothing; no pair is duplicated")
  }

  test("rangeJoin: extra equi-keys restrict matches") {
    val points = Seq((1L, "u1", 5L), (2L, "u2", 5L)).toDF("p_id", "who", "ts")
    val ivs = Seq((10L, "u1", 0L, 10L)).toDF("i_id", "who", "lo", "hi")
    val got = TemporalJoin.rangeJoin(points, ivs, "ts", "lo", "hi",
        bucketWidth = 10L, extraKeys = Seq("who"))
      .select("p_id").as[Long].collect().toSeq
    assert(got === Seq(1L))
  }

  test("rangeJoin: equals the naive inequality join on random data") {
    val rnd = new scala.util.Random(13)
    val points = (1 to 500).map(i => (i.toLong, rnd.nextInt(1000).toLong))
      .toDF("p_id", "ts")
    val ivs = (1 to 200).map { i =>
      val lo = rnd.nextInt(1000).toLong
      (i.toLong, lo, lo + rnd.nextInt(50).toLong)
    }.toDF("i_id", "lo", "hi")
    val naive = points.crossJoin(ivs)
      .where(col("ts") >= col("lo") && col("ts") < col("hi"))
      .select("p_id", "i_id").as[(Long, Long)].collect().toSet
    // a width far from the interval scale stresses boundary handling
    Seq(7L, 64L, 1024L).foreach { width =>
      val got = TemporalJoin.rangeJoin(points, ivs, "ts", "lo", "hi",
          bucketWidth = width)
        .select("p_id", "i_id").as[(Long, Long)].collect()
      assert(got.length === got.toSet.size, s"width=$width produced dup pairs")
      assert(got.toSet === naive, s"width=$width diverged from the naive join")
    }
  }

  test("rangeJoin: over-cap intervals are dropped, not exploded") {
    val points = Seq((1L, 5L)).toDF("p_id", "ts")
    val ivs = Seq((1L, 0L, 10L), (2L, 0L, 1000000L)).toDF("i_id", "lo", "hi")
    val got = TemporalJoin.rangeJoin(points, ivs, "ts", "lo", "hi",
        bucketWidth = 10L, maxBucketsPerInterval = 100)
      .select("i_id").as[Long].collect().toSeq
    assert(got === Seq(1L), "the 100k-bucket interval must be guarded away")
  }

  test("rangeJoin: exact at nanosecond-epoch magnitudes (no double rounding)") {
    // values above 2^53 where double-divided buckets go wrong near
    // boundaries; width = 1e9 ns
    val base = 1700000000000000000L
    val w = 1000000000L
    val points = Seq((1L, base + w - 1), (2L, base + w), (3L, base + 2 * w - 1))
      .toDF("p_id", "ts")
    val ivs = Seq((10L, base, base + w), (11L, base + w, base + 2 * w))
      .toDF("i_id", "lo", "hi")
    val got = TemporalJoin.rangeJoin(points, ivs, "ts", "lo", "hi", bucketWidth = w)
      .select("p_id", "i_id").as[(Long, Long)].collect().toSeq.sorted
    assert(got === Seq((1L, 10L), (2L, 11L), (3L, 11L)))
  }

  test("intervalOverlapJoin: equals the naive inequality join, each pair exactly once") {
    val rnd = new scala.util.Random(7)
    val left = (0 until 120).map { i =>
      val s = rnd.nextInt(1000).toLong; (i.toLong, rnd.nextInt(4).toLong, s, s + 1 + rnd.nextInt(80))
    }.toDF("l_id", "k", "l_lo", "l_hi")
    val right = (0 until 120).map { i =>
      val s = rnd.nextInt(1000).toLong; (i.toLong, rnd.nextInt(4).toLong, s, s + 1 + rnd.nextInt(80))
    }.toDF("r_id", "k", "r_lo", "r_hi")
    val got = TemporalJoin.intervalOverlapJoin(left, right,
        "l_lo", "l_hi", "r_lo", "r_hi", bucketWidth = 32L, extraKeys = Seq("k"))
      .select("l_id", "r_id").as[(Long, Long)].collect().toSeq
    val want = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") &&
          col("l_lo") < col("r_hi") && col("r_lo") < col("l_hi"))
      .select("l_id", "r_id").as[(Long, Long)].collect().toSeq
    // exactly once: multiset equality, not just set equality
    assert(got.sorted === want.sorted)
    assert(got.size === got.distinct.size, "a pair surfaced more than once")
  }

  test("intervalOverlapJoin: touching endpoints (half-open) do not match") {
    val l = Seq((1L, 0L, 10L)).toDF("l_id", "l_lo", "l_hi")
    val r = Seq((2L, 10L, 20L), (3L, 9L, 20L)).toDF("r_id", "r_lo", "r_hi")
    val got = TemporalJoin.intervalOverlapJoin(l, r, "l_lo", "l_hi",
        "r_lo", "r_hi", bucketWidth = 8L)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 3L)))
  }

  test("intervalOverlapJoin: rejects shared non-key columns") {
    val l = Seq((1L, 0L, 10L)).toDF("id", "lo", "hi")
    val r = Seq((2L, 5L, 20L)).toDF("id", "r_lo", "r_hi")
    val e = intercept[IllegalArgumentException] {
      TemporalJoin.intervalOverlapJoin(l, r, "lo", "hi", "r_lo", "r_hi", 8L)
    }
    assert(e.getMessage.contains("share"))
  }

  test("rangeJoin: rejects a non-integral axis; metricName allows composition") {
    val p = Seq((1L, 5.0)).toDF("p_id", "ts")
    val iv = Seq((1L, 0L, 10L)).toDF("i_id", "lo", "hi")
    val e = intercept[IllegalArgumentException] {
      TemporalJoin.rangeJoin(p, iv, "ts", "lo", "hi", bucketWidth = 10L)
    }
    assert(e.getMessage.contains("integral"))
    // two guards in one query need distinct observe names
    val pts = Seq((1L, 5L)).toDF("p_id", "ts")
    val a = TemporalJoin.rangeJoin(pts, iv, "ts", "lo", "hi", 10L,
      metricName = "rj_a").select("p_id", "i_id")
    val b = TemporalJoin.rangeJoin(pts, iv, "ts", "lo", "hi", 10L,
      metricName = "rj_b").select("p_id", "i_id")
    assert(a.unionByName(b).count() === 2L)
  }
}
