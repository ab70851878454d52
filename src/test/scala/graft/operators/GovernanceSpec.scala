package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class GovernanceSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val cust = Seq(1L, 2L, 3L, 4L).toDF("ck")
  private lazy val ord = Seq( // (orderkey, custkey)
    (10L, 1L), (11L, 2L), (12L, 2L), (13L, 3L)).toDF("ok", "ck")
  private lazy val li = Seq( // (orderkey, line)
    (10L, 1), (11L, 1), (11L, 2), (12L, 1), (13L, 1), (99L, 1)).toDF("ok", "ln")

  private def cascade(subjects: Seq[Long]) =
    Governance.erasureCascade(subjects.toDF("ck"), "ck",
      "customer", cust, "ck",
      Seq(Governance.CascadeTable("orders", ord, "ok", "customer", "ck"),
        Governance.CascadeTable("lineitem", li, "ok", "orders", "ok")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  test("erasureCascade: purge counts cascade through both levels") {
    val out = cascade(Seq(2L))
    assert(out("customer") === ((1L, 3L)))
    assert(out("orders") === ((2L, 2L)), "both of customer 2's orders purge")
    assert(out("lineitem") === ((3L, 3L)), "their three line items purge")
  }

  test("erasureCascade: unknown subjects and duplicate subject rows are " +
      "harmless; empty subject list purges nothing") {
    val out = cascade(Seq(1L, 1L, 777L))
    assert(out("customer") === ((1L, 3L)))
    assert(out("orders") === ((1L, 3L)))
    assert(out("lineitem") === ((1L, 5L)))
    val none = cascade(Seq.empty[Long])
    assert(none("customer") === ((0L, 4L)))
    assert(none("lineitem") === ((0L, 6L)))
  }

  test("erasureCascade rejects a child declared before its parent") {
    val err = intercept[IllegalArgumentException] {
      Governance.erasureCascade(Seq(1L).toDF("ck"), "ck",
        "customer", cust, "ck",
        Seq(Governance.CascadeTable("lineitem", li, "ok", "orders", "ok"),
          Governance.CascadeTable("orders", ord, "ok", "customer", "ck")))
    }
    assert(err.getMessage.contains("orders"))
  }

  test("erasureCascade plan: subjects broadcast into the root semi-join") {
    val df = Governance.erasureCascade(Seq(2L).toDF("ck"), "ck",
      "customer", cust, "ck", Nil)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("Cartesian"), plan)
  }

  test("kAnonymityAudit: class sizes, sensitive diversity, and both flags; " +
      "NULL quasi-ids form their own class") {
    val rows = Seq( // (zip, age_band, disease)
      ("02139", "20s", "flu"), ("02139", "20s", "flu"),
      ("02139", "20s", "cold"),                       // 3 rows, 2 diseases
      ("94110", "30s", "flu"),                        // singleton -> at risk
      (null, "30s", "flu"), (null, "30s", "flu"))     // null zip class
      .toDF("zip", "age_band", "disease")
    val got = Governance.kAnonymityAudit(rows, Seq("zip", "age_band"),
        "disease", k = 2L, l = 2L)
      .collect()
      .map(r => (Option(r.getString(0)).getOrElse("∅"), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5))))
      .toMap
    assert(got(("02139", "20s")) === ((3L, 2L, true, true)))
    assert(got(("94110", "30s")) === ((1L, 1L, false, false)),
      "a singleton class is neither k-anonymous nor l-diverse")
    assert(got(("∅", "30s")) === ((2L, 1L, true, false)),
      "2 rows but a single disease: k-anonymous yet not l-diverse")
    assert(got.size === 3)
  }

  test("kAnonymityAudit plan: ONE hash aggregate keyed on the quasi-ids, " +
      "no window, no join") {
    val rows = Seq(("a", 1L, "x"), ("a", 1L, "y")).toDF("q1", "q2", "s")
    val df = Governance.kAnonymityAudit(rows, Seq("q1", "q2"), "s", 2L, 2L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("Window") && !plan.contains("Join"), plan)
    val err = intercept[IllegalArgumentException] {
      Governance.kAnonymityAudit(rows, Seq.empty, "s", 2L, 2L)
    }
    assert(err.getMessage.contains("quasi-identifier"))
  }

  test("erasureCascade bulk path (broadcastSubjects = false): result " +
      "identical to the broadcast path, root semi-join shuffles on the key " +
      "(VERDICT r10 #5 — the GDPR-backlog posture, previously ungated)") {
    val bulk = Governance.erasureCascade(Seq(2L).toDF("ck"), "ck",
      "customer", cust, "ck",
      Seq(Governance.CascadeTable("orders", ord, "ok", "customer", "ck"),
        Governance.CascadeTable("lineitem", li, "ok", "orders", "ok")),
      broadcastSubjects = false)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(bulk === cascade(Seq(2L)),
      "bulk path must reproduce the broadcast path row-for-row")
    // plan assertion: with broadcast conversion disabled (the corpus-scale
    // situation a bulk purge is in — the subject list is too big to
    // broadcast), the root semi-join must come out as a SHUFFLED join,
    // proving no stray broadcast() hint pins the small-batch posture
    val prevStatic = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf
      .getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Governance.erasureCascade(Seq(2L).toDF("ck"), "ck",
        "customer", cust, "ck", Nil, broadcastSubjects = false)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("LeftSemi"), plan)
      assert(!plan.contains("BroadcastHashJoin"), plan)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        plan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevStatic)
      prevAqe match {
        case Some(v) =>
          spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None =>
          spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }

  test("retentionAudit: strict-< cutoff, multi-hit rows count once in " +
      "n_rows_with_kind but fully in n_hits, empty expired set pins zeros") {
    import spark.implicits._
    val rows = Seq(
      (1L, 10L, "a@b.com and c@d.org plus 10.0.0.1"), // expired: 2 emails, 1 ip
      (2L, 20L, "e@f.net"), // AT the cutoff: NOT expired (strict <)
      (3L, 5L, "no pii here"), // expired, clean
      (4L, 30L, "g@h.io")) // not expired
      .toDF("id", "created_us", "text")
    val got = Governance.retentionAudit(rows, "created_us", "text",
        cutoff = 20L)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("email") === ((2L, 1L, 2L)),
      "two expired rows, one carries emails, two matches")
    assert(got("ipv4") === ((2L, 1L, 1L)))
    assert(got("phone") === ((2L, 0L, 0L)))
    val empty = Governance.retentionAudit(rows, "created_us", "text",
        cutoff = 0L)
      .as[(String, Long, Long, Long)].collect()
    assert(empty.length === 3 && empty.forall(r =>
      r._2 === 0L && r._3 === 0L && r._4 === 0L), empty.toSeq.toString)
  }

  test("tClosenessAudit categorical: hand-computed EMDs, null sensitive " +
      "rows carry no mass, a NULL quasi class audits as its own class") {
    import spark.implicits._
    // global (nulls dropped): flu 7, cold 1, hiv 4 -> N = 12
    val rows =
      Seq(("A", "flu"), ("A", "flu"), ("A", "cold"), ("A", "hiv"),
        ("A", null), ("A", null),
        ("B", "flu"), ("B", "hiv"), ("B", "hiv"), ("B", "hiv"),
        ("C", "flu"), ("C", "flu"),
        (null, "flu"), (null, "flu"))
        .toDF("zip", "disease")
    val got = Governance
      .tClosenessAudit(rows, Seq("zip"), "disease", t = 0.2)
      .as[(Option[String], Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // A: p=(1/2,1/4,1/4) vs q=(7/12,1/12,1/3) -> EMD 1/6; nulls excluded
    assert(got(Some("A")) === ((4L, 0.166666667, true)))
    // B: p=(1/4,0,3/4) -> EMD 5/12
    assert(got(Some("B")) === ((4L, 0.416666667, false)))
    // C and the null-quasi class: all-flu, p=(1,0,0) -> EMD 5/12
    assert(got(Some("C")) === ((2L, 0.416666667, false)))
    assert(got(None) === ((2L, 0.416666667, false)))
    assert(got.size === 4)
  }

  test("tClosenessAudit ordered: cumulative-difference EMD over the " +
      "global value grid; a single-value domain pins distance 0") {
    import spark.implicits._
    // domain {1,2,3} each x2 globally: X holds both 1s, Y the rest
    val rows = Seq(("X", 1L), ("X", 1L),
      ("Y", 2L), ("Y", 3L), ("Y", 2L), ("Y", 3L)).toDF("zip", "v")
    val got = Governance
      .tClosenessAudit(rows, Seq("zip"), "v", t = 0.3, ordered = true)
      .as[(String, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("X") === ((2L, 0.5, false)), "mass at one end: EMD 1/2")
    assert(got("Y") === ((4L, 0.25, true)))
    // same fixture under the categorical ground distance:
    // X p=(1,0,0) vs q=(1/3,1/3,1/3) -> EMD = (2/3+1/3+1/3)/2 = 2/3
    val cat = Governance.tClosenessAudit(rows, Seq("zip"), "v", t = 0.3)
      .as[(String, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(cat("X") === 0.666666667 && cat("Y") === 0.333333333,
      s"categorical EMDs: $cat")
    val one = Seq(("X", 5L), ("Y", 5L), ("Y", 5L)).toDF("zip", "v")
    val got1 = Governance
      .tClosenessAudit(one, Seq("zip"), "v", t = 0.3, ordered = true)
      .as[(String, Long, Double, Boolean)].collect()
    assert(got1.forall(r => r._3 === 0.0 && r._4),
      "single-value global domain must pin EMD 0 / t_close true")
  }

  test("dpNoisedCounts: seeded-deterministic, bounded noise scaling with " +
      "1/epsilon, non-negative integer release, bad epsilon rejected") {
    import spark.implicits._
    val rows = (Seq.fill(10)("a") ++ Seq.fill(5)("b")).toDF("k")
    def run(eps: Double, seed: String) =
      Governance.dpNoisedCounts(rows, Seq("k"), eps, seed)
        .as[(String, Double, Double, Long)].collect()
        .map(r => r._1 -> ((r._3, r._4))).toMap
    val g1 = run(0.5, "s1:")
    val g2 = run(0.5, "s1:")
    assert(g1 === g2, "same seed must replay identically")
    val g3 = run(0.5, "s2:")
    assert(g1("a")._1 !== g3("a")._1, "a new seed must redraw the noise")
    // clamp bound: |noise| <= b·ln(1e12) = 2·27.63
    assert(math.abs(g1("a")._1 - 10.0) <= 2 * 27.7)
    assert(g1.values.forall(_._2 >= 0L), "integer release must clamp at 0")
    // same seed, 20x the epsilon => exactly 1/20 the noise (pre-rounding)
    val tight = run(10.0, "s1:")
    val n1 = g1("a")._1 - 10.0
    val n2 = tight("a")._1 - 10.0
    assert(math.abs(n2 - n1 / 20.0) < 1e-5, s"noise must scale 1/eps: $n1 $n2")
    intercept[IllegalArgumentException] {
      Governance.dpNoisedCounts(rows, Seq("k"), 0.0, "s")
    }
  }

  test("dpNoisedCounts key encoding: multi-column tuples cannot collide " +
      "across the column boundary, and NULL key values draw real noise " +
      "(ADVICE r12)") {
    import spark.implicits._
    // ("a","bc") vs ("ab","c"): identical under naive concat — the
    // separator must force DIFFERENT noise draws
    val rows = (Seq.fill(3)(("a", "bc")) ++ Seq.fill(3)(("ab", "c")))
      .toDF("k1", "k2")
    val got = Governance.dpNoisedCounts(rows, Seq("k1", "k2"), 0.5, "s:")
      .as[(String, String, Double, Double, Long)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    val noiseA = got(("a", "bc"))
    val noiseB = got(("ab", "c"))
    assert(noiseA !== noiseB,
      "distinct tuples with equal naive concat must draw distinct noise")
    // NULL key part: the sentinel keeps the draw deterministic and
    // distinct from the empty string
    val withNull = Seq((Some("x"), None: Option[String]),
      (Some("x"), Some(""))).toDF("k1", "k2")
    val g = Governance.dpNoisedCounts(withNull, Seq("k1", "k2"), 0.5, "s:")
      .select(col("k2"), col("released")).collect()
      .map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    assert(!g(None).isNaN && g(None) != g(Some("")),
      "NULL and '' key parts must draw from different keys")
    val g2 = Governance.dpNoisedCounts(withNull, Seq("k1", "k2"), 0.5, "s:")
      .select(col("k2"), col("released")).collect()
      .map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    assert(g === g2, "NULL-keyed draws must replay deterministically")
  }

  test("dpNoisedMean: seeded-deterministic, values clamp into the public " +
      "bounds, nulls drop, denominator floors at 1, bad params rejected") {
    import spark.implicits._
    val rows = Seq(("a", 5.0), ("a", 500.0), ("a", -3.0), ("b", 10.0))
      .toDF("k", "v")
      .unionByName(Seq(("a", Option.empty[Double])).toDF("k", "v"))
    def run(eps: Double, seed: String) =
      Governance.dpNoisedMean(rows, Seq("k"), "v", 0.0, 100.0, eps, seed)
        .as[(String, Double, Double, Long)].collect()
        .map(r => r._1 -> ((r._3, r._4))).toMap
    val g1 = run(0.5, "s1:")
    assert(g1 === run(0.5, "s1:"), "same seed must replay identically")
    assert(g1("a")._1 !== run(0.5, "s2:")("a")._1,
      "a new seed must redraw the noise")
    // a: clamped sum = 5 + 100 + 0 = 105 over n = 3 (the null dropped);
    // noise bounds: |sum noise| <= 400·27.64, |count noise| <= 4·27.64,
    // denominator floored at 1 => mean lands in a wide but finite band
    val mean = g1("a")._1
    assert(!mean.isNaN && math.abs(mean) <= 105.0 + 400 * 27.7,
      s"released mean out of band: $mean")
    assert(g1.values.forall(_._2 >= 0L), "noisy n must clamp at 0")
    // the count draw is the C: domain at b = 2/eps — independent of the
    // sum draw: with a huge eps both collapse to the true stats
    val tight = run(1e9, "s1:")
    assert(math.abs(tight("a")._1 - 35.0) < 1e-3,
      "eps->inf must approach the true clamped mean 105/3")
    assert(tight("a")._2 === 3L, "eps->inf must approach the true count")
    intercept[IllegalArgumentException] {
      Governance.dpNoisedMean(rows, Seq("k"), "v", 5.0, 5.0, 0.5, "s")
    }
    intercept[IllegalArgumentException] {
      Governance.dpNoisedMean(rows, Seq("k"), "v", 0.0, 100.0, -1.0, "s")
    }
  }

  test("dpNoisedHistogram: the full public grid releases (empty buckets " +
      "draw noise too), values clamp into edge buckets, nulls drop, " +
      "eps->inf recovers true counts, bad params rejected") {
    import spark.implicits._
    val rows = Seq(Some(5.0), Some(15.0), Some(15.5), Some(500.0),
      Some(-3.0), None).toDF("v")
    def run(eps: Double, seed: String) =
      Governance.dpNoisedHistogram(rows, "v", 0.0, 100.0, 10, eps, seed)
        .as[(Int, Double, Double, Double, Double, Long)].collect()
        .sortBy(_._1)
    val g = run(0.5, "s1:")
    assert(g.length === 10, "every grid bucket must release")
    assert(g.map(_._2).toSeq === (0 until 10).map(_ * 10.0))
    assert(g.map(_._3).toSeq === (1 to 10).map(_ * 10.0))
    assert(g === run(0.5, "s1:"), "same seed must replay identically")
    assert(g.map(_._5).toSeq !== run(0.5, "s2:").map(_._5).toSeq,
      "a new seed must redraw")
    // empty buckets carry pure noise - released is NOT uniformly zero
    assert(g.count(_._5 != 0.0) > 5)
    // eps->inf: bucket0 = {5.0, -3.0 clamped}, bucket1 = {15.0, 15.5},
    // bucket9 = {500.0 clamped}; the null dropped; empties exactly 0
    val tight = run(1e9, "s1:")
    assert(tight.map(r => r._1 -> r._6).toMap ===
      (0 until 10).map(b => b ->
        (if (b == 0 || b == 1) 2L else if (b == 9) 1L else 0L)).toMap)
    intercept[IllegalArgumentException] {
      Governance.dpNoisedHistogram(rows, "v", 5.0, 5.0, 10, 0.5, "s")
    }
    intercept[IllegalArgumentException] {
      Governance.dpNoisedHistogram(rows, "v", 0.0, 100.0, 0, 0.5, "s")
    }
  }

  test("dpTokenRelease: contribution bounding (distinct per doc, " +
      "lexicographic cap), eps->inf releases exactly the >=tau " +
      "vocabulary at true counts, sub-threshold tokens suppressed, " +
      "seeded-deterministic, bad params rejected") {
    import spark.implicits._
    // d1 repeats 'a' (distinct-per-doc: counts once) and carries 'c'
    // BEYOND the L=2 lexicographic cap ([a, b] kept, c dropped); c's
    // released count must therefore be 2 (d4, d5 only), not 3
    val docs = Seq("b a a a c", "a b", "a zz", "c", "c").toDF("text")
    def run(eps: Double, tau: Double, seed: String) =
      Governance.dpTokenRelease(docs, "text", maxTokensPerDoc = 2,
          epsilon = eps, threshold = tau, seed = seed)
        .as[(String, Double, Double)].collect()
        .map(r => r._1 -> r._3).toMap
    // tau between the counts (1.5): a count exactly AT tau would flip on
    // the sign of the nano-noise — the threshold compares the raw value
    val exact = run(1e9, 1.5, "s1:")
    assert(exact === Map("a" -> 3.0, "b" -> 2.0, "c" -> 2.0),
      s"eps->inf must release the true >=tau vocabulary: $exact")
    // 'zz' (count 1) stays suppressed; 'c' counts 2, not 3 — the cap bit
    assert(!exact.contains("zz"), "a sub-threshold token leaked")
    val g1 = run(5.0, 1.5, "s1:")
    assert(g1 === run(5.0, 1.5, "s1:"), "same seed must replay")
    assert(run(5.0, 1.5, "s2:") !== g1, "a new seed must redraw")
    intercept[IllegalArgumentException] {
      Governance.dpTokenRelease(docs, "text", 0, 1.0, 2.0, "s")
    }
    intercept[IllegalArgumentException] {
      Governance.dpTokenRelease(docs, "text", 2, -1.0, 2.0, "s")
    }
    intercept[IllegalArgumentException] {
      Governance.dpTokenRelease(docs, "text", 2, 1.0, 0.5, "s")
    }
  }

  test("dpNoisedQuantiles: seeded-deterministic, eps->inf recovers the " +
      "bucketed quantile, releases stay on the public grid, bad params " +
      "rejected") {
    import spark.implicits._
    // 100 values 0.5, 1.5, ..., 99.5 — one per [i, i+1) bucket
    val rows = (0 until 100).map(_ + 0.5).map(Some(_))
      .toDF("v")
    def run(eps: Double, seed: String) =
      Governance.dpNoisedQuantiles(rows, "v", Seq(0.1, 0.5, 0.9),
          0.0, 100.0, 100, eps, seed)
        .as[(Double, Double, Double)].collect()
        .map(r => r._1 -> r._3).toMap
    val g = run(0.5, "s1:")
    assert(g.keySet === Set(0.1, 0.5, 0.9))
    assert(g === run(0.5, "s1:"), "same seed must replay identically")
    assert(g !== run(0.5, "s2:"), "a new seed must redraw")
    // every release sits on a grid edge of [0,100]/100
    assert(g.values.forall(v => v == math.rint(v) && v >= 0 && v <= 100))
    // eps->inf: utility dominates the Gumbel — rank(g_i) = i here, so the
    // argmax of -|i - q*100| is exactly the true quantile edge
    val tight = run(1e9, "s1:")
    assert(tight === Map(0.1 -> 10.0, 0.5 -> 50.0, 0.9 -> 90.0), tight)
    // low eps: the Gumbel dominates — at least one release strays from
    // the true edge (the privacy noise is real)
    val loose = run(1e-6, "s1:")
    assert(loose !== tight, "near-zero eps must be noise-dominated")
    intercept[IllegalArgumentException] {
      Governance.dpNoisedQuantiles(rows, "v", Seq(1.5), 0.0, 100.0, 10,
        0.5, "s")
    }
    intercept[IllegalArgumentException] {
      Governance.dpNoisedQuantiles(rows, "v", Seq(0.5), 5.0, 5.0, 10,
        0.5, "s")
    }
    intercept[IllegalArgumentException] {
      Governance.dpNoisedQuantiles(rows, "v", Seq.empty, 0.0, 100.0, 10,
        0.5, "s")
    }
  }

  test("dpNbModelRelease: per-label bounding, eps->inf releases true " +
      "counts with the exact smoothed-logp tail, seeded-deterministic") {
    import spark.implicits._
    // label x: 'a' appears in both docs (count 2), 'b' once, 'c' beyond
    // the L=2 cap of doc 1; label y: 'a' once, 'q' once
    val docs = Seq(
      ("x", "b a a c"), ("x", "a zz"),
      ("y", "a q")).toDF("label", "text")
    def run(eps: Double, tau: Double, seed: String) =
      Governance.dpNbModelRelease(docs, "text", "label",
          maxTokensPerDoc = 2, epsilon = eps, threshold = tau, seed = seed)
        .as[(String, String, Double, Double, Double)].collect()
        .map(r => (r._1, r._2) -> ((r._4, r._5))).toMap
    val exact = run(1e9, 1.5, "s1:")
    // released: only (x, a) count 2 clears tau = 1.5; everything else
    // (b 1, zz 1, y-a 1, q 1) is suppressed; c was capped out entirely
    assert(exact.keySet === Set(("x", "a")), s"got $exact")
    assert(exact(("x", "a"))._1 === 2.0)
    // post-processing tail over RELEASED values only: Nc = 2, V = 1
    val wantLogp = BigDecimal(math.log(3.0 / 3.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(exact(("x", "a"))._2 === wantLogp)
    val g1 = run(5.0, 1.5, "s1:")
    assert(g1 === run(5.0, 1.5, "s1:"), "same seed must replay")
    assert(run(5.0, 1.5, "s2:") !== g1, "a new seed must redraw")
    intercept[IllegalArgumentException] {
      Governance.dpNbModelRelease(docs, "text", "label", 0, 1.0, 2.0, "s")
    }
    intercept[IllegalArgumentException] {
      Governance.dpNbModelRelease(docs, "text", "label", 2, -1.0, 2.0, "s")
    }
    intercept[IllegalArgumentException] {
      Governance.dpNbModelRelease(docs, "text", "label", 2, 1.0, 0.5, "s")
    }
  }
}
