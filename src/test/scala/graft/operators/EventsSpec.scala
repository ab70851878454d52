package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class EventsSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(rows: (Long, String, Long)*) =
    rows.toDF("user_id", "event_type", "ts")

  test("funnel: earliest-completion chain per user, partial progress " +
      "keeps nulls, non-starters are absent") {
    val events = ev(
      // user 1 completes: view@10 -> click@20 -> purchase@30; the later
      // view@15 and the pre-view click@5 must not matter
      (1L, "click", 5L), (1L, "view", 10L), (1L, "view", 15L),
      (1L, "click", 20L), (1L, "purchase", 30L),
      // user 2 stops after click; its purchase is BEFORE the click
      (2L, "view", 10L), (2L, "purchase", 12L), (2L, "click", 14L),
      // user 3 never views (clicks/purchases only) -> not in the funnel
      (3L, "click", 1L), (3L, "purchase", 2L))
    val got = Events.funnel(events, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .as[(Long, Long, Option[Long], Option[Long], Int)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == Map(
      1L -> ((10L, Some(20L), Some(30L), 3)),
      2L -> ((10L, Some(14L), None, 2))), got)
  }

  test("funnel: greedy earliest-first finds a chain whenever one exists " +
      "(the completeness property), and generalizes to k stages") {
    // the ONLY strictly-increasing a->b->c->d chain starts at the FIRST
    // a: a@1 b@2 c@3 d@4; a later a@5 would dead-end. Greedy takes a@1.
    val events = ev(
      (1L, "a", 1L), (1L, "b", 2L), (1L, "c", 3L), (1L, "d", 4L),
      (1L, "a", 5L))
    val got = Events.funnel(events, "user_id", "event_type", "ts",
      Seq("a", "b", "c", "d"))
      .as[(Long, Long, Option[Long], Option[Long], Option[Long], Int)]
      .collect().head
    assert(got == ((1L, 1L, Some(2L), Some(3L), Some(4L), 4)), got)
  }

  test("funnel plan: no window, no sequence sort, no cartesian — skinny " +
      "min-aggregates chained by user-key equi-joins") {
    val events = ev((1L, "view", 1L), (1L, "click", 2L))
    val plan = Events.funnel(events, "user_id", "event_type", "ts",
      Seq("view", "click")).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("topPaths: gap sessions split correctly, in-session order is " +
      "(ts, id), counting and tie-ranking follow (n DESC, path ASC)") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(min: Long) = new Timestamp(min * 60000L)
    val ev = Seq(
      // user 1, session 1: ordered view>click>purchase
      (1L, ts(0), 1L, "view"), (1L, ts(5), 2L, "click"),
      (1L, ts(10), 3L, "purchase"),
      // user 1, session 2 (40-min gap > 30): lone view
      (1L, ts(50), 4L, "view"),
      // user 2: same-ts tie resolves by event_id: view(5) then click(6)
      (2L, ts(0), 5L, "view"), (2L, ts(0), 6L, "click"),
      // user 3: a gap of EXACTLY the session gap merges (session_window
      // semantics: a new session needs diff > gap, not >=)
      (3L, ts(0), 7L, "view"), (3L, ts(30), 8L, "view")
    ).toDF("user_id", "ts", "event_id", "event_type").repartition(3)
    val got = Events.topPaths(ev, "user_id", "ts", "event_type", "event_id",
        "30 minutes", k = 10)
      .as[(Int, String, Long)].collect().toList
    assert(got === List(           // all ties at n=1: rank by path ASC
      (1, "view", 1L),             // u1 s2 (40-min gap split)
      (2, "view>click", 1L),
      (3, "view>click>purchase", 1L),
      (4, "view>view", 1L)))       // u3's boundary-gap merged session
  }

  test("rollingActiveUsers equals the brute-force distinct-user window " +
      "on random activity, only event-bearing days report") {
    import spark.implicits._
    val rnd = new scala.util.Random(79)
    val dayNs = 86400L * 1000000000L
    val evs = (0 until 400).map(_ =>
      (rnd.nextInt(25).toLong, rnd.nextInt(20).toLong * dayNs +
        rnd.nextInt(1000).toLong))
    val got = Events.rollingActiveUsers(evs.toDF("user_id", "ts"),
        "user_id", "ts", windowDays = 7)
      .as[(Long, Long)].collect().toMap
    val byDay = evs.map { case (u, ts) => (ts / dayNs, u) }.distinct
    val days = byDay.map(_._1).distinct
    days.foreach { d =>
      val want = byDay.filter { case (dd, _) => dd >= d - 6 && dd <= d }
        .map(_._2).distinct.size.toLong
      assert(got(d) === want, s"day $d")
    }
    assert(got.keySet === days.toSet, "only event-bearing days report")
  }

  test("topPaths equals a driver-side sessionization replay on random " +
      "event streams (gap rule: a new session needs diff STRICTLY > gap)") {
    import spark.implicits._
    import java.sql.Timestamp
    val rnd = new scala.util.Random(59)
    val types = Array("view", "click", "purchase")
    val evs = (0 until 300).map { i =>
      (rnd.nextInt(12).toLong, rnd.nextInt(500).toLong, i.toLong,
        types(rnd.nextInt(3)))
    }
    val df = evs.map { case (u, min, id, t) =>
      (u, new Timestamp(min * 60000L), id, t)
    }.toDF("user_id", "ts", "event_id", "event_type").repartition(5)
    val got = Events.topPaths(df, "user_id", "ts", "event_type", "event_id",
        "30 minutes", k = 10000)
      .select("path", "n_sessions").as[(String, Long)].collect().toMap
    // replay: per user order by (ts, id), split when gap > 30 minutes
    val paths = scala.collection.mutable.Map.empty[String, Long]
    evs.groupBy(_._1).foreach { case (_, g) =>
      val ordered = g.sortBy(e => (e._2, e._3))
      var cur = List.empty[String]
      var prev = Long.MinValue
      def flush(): Unit = if (cur.nonEmpty) {
        val p = cur.reverse.mkString(">")
        paths(p) = paths.getOrElse(p, 0L) + 1L
        cur = Nil
      }
      ordered.foreach { case (_, min, _, t) =>
        if (prev != Long.MinValue && min - prev > 30L) flush()
        cur = t :: cur
        prev = min
      }
      flush()
    }
    assert(got === paths.toMap)
  }

  test("topPaths: k bounds the output and the plan has no corpus-wide window") {
    import spark.implicits._
    import java.sql.Timestamp
    val ev = (0 until 100).map(i =>
      (i.toLong, new Timestamp(i * 3600000L), i.toLong, s"t$i"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Events.topPaths(ev, "user_id", "ts", "event_type", "event_id",
      "30 minutes", k = 7)
    assert(out.count() === 7)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }

  test("linearAttribution: equal split, strict-before touches, window cut, " +
      "zero-touch conversions earn nothing") {
    import spark.implicits._
    val ev = Seq( // (id, user, type, ts, value)
      (1L, 1L, "view", 10L, 0.0),
      (6L, 1L, "click", 15L, 0.0), // simultaneous with purchase 4: excluded there
      (4L, 1L, "purchase", 15L, 5.0), // only view@10 credits -> view 5.0
      (2L, 1L, "click", 20L, 0.0),
      (3L, 1L, "purchase", 30L, 12.0), // 3 touches -> 4.0 each
      (5L, 2L, "purchase", 50L, 9.0) // no touches -> no credit rows
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    val got = Events.linearAttribution(ev, "user_id", "event_type", "ts",
        "value", "event_id", "purchase", Seq("click", "view"), windowSize = 100L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got("click") === ((2L, 8.0)), "click@15 + click@20 credit 4.0 each")
    assert(got("view") === ((2L, 9.0)), "view@10 credits both purchases")

    val tight = Events.linearAttribution(ev, "user_id", "event_type", "ts",
        "value", "event_id", "purchase", Seq("click", "view"), windowSize = 12L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(tight("click") === ((1L, 12.0)), "only click@20 is within 12 of 30")
    assert(tight("view") === ((1L, 5.0)), "view@10 within 12 of purchase@15")

    val plan = Events.linearAttribution(ev, "user_id", "event_type", "ts",
      "value", "event_id", "purchase", Seq("click", "view"), 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("Cartesian"), plan)
  }

  test("intervalCoverage: overlapping/touching/degenerate intervals merge " +
      "into the exact union length and block count") {
    import spark.implicits._
    val iv = Seq( // (key, start, end)
      (1L, 0L, 10L), (1L, 5L, 15L),    // overlap -> [0,15]
      (1L, 20L, 30L), (1L, 30L, 40L),  // touching -> [20,40]
      (1L, 50L, 50L),                  // zero-length block
      (1L, 22L, 25L),                  // fully contained, adds nothing
      (2L, 7L, 3L),                    // end < start -> contributes 0
      (3L, 1L, 4L),
      (4L, 5L, 2L), (4L, 5L, 7L))      // degenerate shares a start: the
                                       // clamped running max merges it
      .toDF("k", "s", "e")
    val got = Events.intervalCoverage(iv, "k", "s", "e")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === ((6L, 35L, 3L)), s"union [0,15]+[20,40]+[50,50]: $got")
    assert(got(2L) === ((1L, 0L, 1L)))
    assert(got(3L) === ((1L, 3L, 1L)))
    assert(got(4L) === ((2L, 2L, 1L)),
      "[5,5]+[5,7] is ONE connected component, not two blocks")
    // naive sum(end-start) for key 1 is 43 — the union must be smaller
    val naive = 10L + 10L + 10L + 10L + 0L + 3L
    assert(got(1L)._2 < naive)
    // the window is per-key, never corpus-global
    val plan = Events.intervalCoverage(iv, "k", "s", "e")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window [") || plan.contains("partitionBy") ||
      plan.contains("windowspecdefinition(k#"), plan)
  }

  test("timeToConvert: power-of-two buckets from the greedy chain, " +
      "per consecutive pair only, non-funnel users absent") {
    import spark.implicits._
    val ev = Seq(
      (1L, "view", 0L), (1L, "click", 3L), (1L, "purchase", 10L),
      (2L, "view", 0L), (2L, "click", 1L),
      (3L, "click", 5L),                    // no view: not in the funnel
      (4L, "view", 0L), (4L, "click", 4L))
      .toDF("user_id", "event_type", "ts")
    val got = Events.timeToConvert(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .as[(String, String, Int, Long, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> ((r._4, r._5, r._6))).toMap
    // durations: u1 view->click 3 (bin '11' -> bucket 2), u2 1 (bucket
    // 1), u4 4 (bucket 3); u1 click->purchase 7 (bucket 3)
    assert(got(("view", "click", 1)) === ((1L, 1L, 1L)))
    assert(got(("view", "click", 2)) === ((1L, 3L, 3L)))
    assert(got(("view", "click", 3)) === ((1L, 4L, 4L)))
    assert(got(("click", "purchase", 3)) === ((1L, 7L, 7L)))
    assert(got.size === 4)
  }

  test("burstiness: metronome pins B = -1, hand-computed bursty key, " +
      "all-zero gaps pin 0, single-event keys are excluded") {
    import spark.implicits._
    val ev = Seq( // (key, ts, tie)
      (10L, 0L, 1L), (10L, 5L, 2L), (10L, 10L, 3L), (10L, 15L, 4L), // metronome
      (20L, 0L, 5L), (20L, 1L, 6L), (20L, 1L, 7L), (20L, 11L, 8L),  // bursty
      (30L, 7L, 9L), (30L, 7L, 10L),                                // same ts
      (40L, 3L, 11L))                                               // singleton
      .toDF("k", "ts", "id")
    val got = Events.burstiness(ev, "k", "ts", "id")
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(10L) === ((3L, 5L, 0.0, -1.0)),
      "equal gaps: sigma = 0 -> CV 0, B exactly -1")
    // gaps [1, 0, 10]: S=11, sumsq=101, D = 3*101 - 121 = 182
    val d = math.sqrt(182.0)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(20L) === ((3L, 3L, r6(d / 11.0),
      r6((d - 11.0) / (d + 11.0)))), "mean_gap floors 11/3")
    assert(got(30L) === ((1L, 0L, 0.0, 0.0)),
      "simultaneous events: S = 0 pins CV and B to 0, not 0/0")
    assert(!got.contains(40L), "one event has no gaps")
    // the lag window is per-key, never corpus-global
    val plan = Events.burstiness(ev, "k", "ts", "id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(k#"), plan)
  }

  test("linearAttribution hot user: the salted pair join is result-identical " +
      "and spreads the hot key over saltFactor reducers " +
      "(VERDICT r10 #7 — the v02-flagged-user escape hatch)") {
    import spark.implicits._
    // planted hot user 7: 200 touches and 40 conversions (the bot/service-
    // account shape the v02 skew report surfaces) next to a normal user
    val hot = (0 until 200).map(i =>
      (1000L + i, 7L, if (i % 2 == 0) "view" else "click", i.toLong, 0.0)) ++
      (0 until 40).map(i =>
        (2000L + i, 7L, "purchase", 5L + i * 5L, 10.0))
    val normal = Seq(
      (1L, 1L, "view", 10L, 0.0),
      (2L, 1L, "purchase", 15L, 6.0))
    val ev = (hot ++ normal)
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    def run(salt: Int) = Events.linearAttribution(ev, "user_id",
        "event_type", "ts", "value", "event_id", "purchase",
        Seq("click", "view"), windowSize = 50L, saltFactor = salt)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    val unsalted = run(1)
    val salted = run(8)
    assert(salted.toSeq === unsalted.toSeq,
      "salting must not change attribution results")
    // the salted plan joins on (__u, __salt) with the conversion side
    // replicated — the hot user's pair enumeration is spread 8 ways
    val plan = Events.linearAttribution(ev, "user_id", "event_type", "ts",
        "value", "event_id", "purchase", Seq("click", "view"), 50L,
        saltFactor = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), plan)
    assert(!plan.contains("Window") && !plan.contains("Cartesian"), plan)
    // pair degree stays bounded by the window: every conversion's census
    // counts only in-window touches (10 per conversion here), never the
    // hot user's full 200-touch history
    val census = unsalted.collect { case ("click", n, _) => n } ++
      unsalted.collect { case ("view", n, _) => n }
    assert(census.sum <= 40L * 50L,
      s"credited touches must be window-bounded, got ${census.sum}")
  }

  test("firstTouchAttribution: earliest in-window touch wins, timestamp " +
      "ties break by type, window boundaries are [pts-W, pts), and " +
      "unattributed conversions land in the (none) row") {
    import spark.implicits._
    val ev = Seq(
      // user 1: view and click tie at t=0 -> 'click' (type asc) wins
      (10L, 1L, "view", 0L, 0.0),
      (11L, 1L, "click", 0L, 0.0),
      (12L, 1L, "purchase", 10L, 5.0),
      // user 2: its only touch sits EXACTLY at pts - W (inclusive edge)
      (20L, 2L, "view", 50L, 0.0),
      (21L, 2L, "purchase", 100L, 2.0),
      // user 3: a touch AT the purchase instant is excluded (strict <)
      (30L, 3L, "click", 50L, 0.0),
      (31L, 3L, "purchase", 50L, 1.0))
      .toDF("event_id", "user_id", "event_type", "ts_us", "value")
    val got = graft.operators.Events.firstTouchAttribution(ev, "user_id",
        "event_type", "ts_us", "value", "event_id",
        conversionType = "purchase", touchTypes = Seq("click", "view"),
        windowSize = 50L)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(
      "click" -> ((1L, 5.0)),
      "view" -> ((1L, 2.0)),
      "(none)" -> ((1L, 1.0))))
  }

  test("survivalCurve: hand-computed KM/NA values, right-censored keys " +
      "leave the risk set without counting as deaths") {
    import spark.implicits._
    // newest observation 100, horizon 50: death iff last event < 50
    val ev = Seq(
      (1L, 0L), (1L, 10L), // dur 10, dead
      (2L, 0L), (2L, 10L), // dur 10, dead
      (3L, 0L), (3L, 20L), // dur 20, dead
      (4L, 80L), (4L, 100L), // dur 20, CENSORED (t1 = 100)
      (5L, 100L)) // dur 0, CENSORED
      .toDF("user_id", "ts_us")
    val got = graft.operators.Events
      .survivalCurve(ev, "user_id", "ts_us", censorHorizon = 50L)
      .as[(Long, Long, Long, Long, Double, Option[Double])].collect()
      .sortBy(_._1)
    // ln(1/2) = -0.69314718 -> grid -693147 -> -0.693147
    assert(got === Array(
      (0L, 5L, 0L, 1L, 0.0, Some(0.0)),
      (10L, 4L, 2L, 0L, 0.5, Some(-0.693147)),
      (20L, 2L, 1L, 1L, 1.0, Some(-1.386294))))
  }

  test("survivalCurve: a time whose deaths exhaust the risk set pins " +
      "survival 0 — km_log_s goes NULL from that point") {
    import spark.implicits._
    // newest 100, horizon 10: u1/u2 die at dur 5; u3 censored at dur 3
    val ev = Seq(
      (1L, 0L), (1L, 5L),
      (2L, 10L), (2L, 15L),
      (3L, 97L), (3L, 100L))
      .toDF("user_id", "ts_us")
    val got = graft.operators.Events
      .survivalCurve(ev, "user_id", "ts_us", censorHorizon = 10L)
      .as[(Long, Long, Long, Long, Double, Option[Double])].collect()
      .sortBy(_._1)
    assert(got === Array(
      (3L, 3L, 0L, 1L, 0.0, Some(0.0)),
      (5L, 2L, 2L, 0L, 1.0, None)))
  }

  test("transitionEntropy: uniform = ln k (norm 1), deterministic = 0 " +
      "(norm NULL), skewed matches the hand-computed value") {
    import spark.implicits._
    val counts = Seq(
      ("x", "p", 5L), ("x", "q", 5L), // uniform over 2
      ("y", "p", 7L),                 // single target
      ("z", "p", 3L), ("z", "q", 1L)) // 0.75 / 0.25
      .toDF("from_type", "to_type", "n")
    val got = Events.transitionEntropy(counts, "from_type", "n")
      .as[(String, Long, Long, Double, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("x")._1 === 10L && got("x")._2 === 2L)
    assert(got("x")._3 === BigDecimal(math.log(2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got("x")._4 === Some(1.0))
    assert(got("y") === ((7L, 1L, 0.0, None)))
    // H(z) = −(0.75·ln 0.75 + 0.25·ln 0.25) = 0.562335; /ln 2 = 0.811278
    assert(got("z")._3 === 0.562335)
    assert(got("z")._4 === Some(0.811278))
    // a DENSIFIED count frame (zero-count rows present) must not skew
    // n_targets or the ln(k) normalizer (ADVICE r12)
    val dense = counts.unionByName(Seq(
      ("y", "q", 0L), ("y", "r", 0L), ("z", "r", 0L))
      .toDF("from_type", "to_type", "n"))
    val got2 = Events.transitionEntropy(dense, "from_type", "n")
      .as[(String, Long, Long, Double, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got2 === got, "zero-count rows must be inert")
  }

  test("markovAttribution: hand-solved absorbing chain, post-conversion " +
      "truncation, touchless conversions keep P honest, unseen channel " +
      "zero effect, no-conversion corpus yields nulls, bad params rejected") {
    import spark.implicits._
    // u1: click→purchase; u2: view→(nothing); u3: purchase only;
    // u4: click→view→purchase (+ a post-conversion click that must drop)
    // transitions: START→{click:2, view:1, CONV:1}; click→{CONV:1, view:1};
    // view→{NULL:1, CONV:1}
    // P(view)=.5, P(click)=.75, P_base=.75; remove click → .375 (re=.5);
    // remove view → .5 (re=1/3); drops .375/.25 → shares .6/.4; nConv=3
    val ev = Seq(
      (1L, "click", 10L, 1L), (1L, "purchase", 20L, 2L),
      (2L, "view", 10L, 3L),
      (3L, "purchase", 10L, 4L),
      (4L, "click", 10L, 5L), (4L, "view", 20L, 6L),
      (4L, "purchase", 30L, 7L), (4L, "click", 40L, 8L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = Events.markovAttribution(ev, "user_id", "event_type", "ts",
        "event_id", "purchase", Seq("click", "view", "signup"))
      .as[(String, Double, Double, Option[Double], Option[Double],
        Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(got("click")._2 === 0.75 && got("view")._2 === 0.75)
    assert(got("click")._3 === 0.375)
    assert(got("click")._4 === Some(0.5))
    assert(got("view")._3 === 0.5)
    assert(got("view")._4 === Some(0.333333))
    assert(got("click")._5 === Some(0.6) && got("view")._5 === Some(0.4))
    assert(got("click")._6 === Some(1.8) && got("view")._6 === Some(1.2))
    // the unseen channel: removal changes nothing
    assert(got("signup")._3 === 0.75 && got("signup")._4 === Some(0.0) &&
      got("signup")._5 === Some(0.0))
    // no conversions anywhere -> effects and shares are null
    val none = Events.markovAttribution(
        ev.filter(col("event_type") =!= "purchase"),
        "user_id", "event_type", "ts", "event_id", "purchase",
        Seq("click", "view"))
      .as[(String, Double, Double, Option[Double], Option[Double],
        Option[Double])].collect()
    assert(none.forall(r => r._2 === 0.0 && r._4.isEmpty && r._5.isEmpty))
    intercept[IllegalArgumentException] {
      Events.markovAttribution(ev, "user_id", "event_type", "ts",
        "event_id", "purchase", Seq("purchase", "click"))
    }
    intercept[IllegalArgumentException] {
      Events.markovAttribution(ev, "user_id", "event_type", "ts",
        "event_id", "purchase", Seq.empty)
    }
  }
}
