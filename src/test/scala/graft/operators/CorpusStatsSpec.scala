package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CorpusStatsSpec extends SparkTestBase {
  import spark.implicits._

  test("valueQuantiles: exact decile boundaries of a uniform 1..100 domain") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val got = CorpusStats.valueQuantiles(df, "v", 10)
    // boundary b = smallest v with cum >= ceil(b*100/10) = exactly 10b
    assert(got.toSeq === (1 to 10).map(b => 10.0 * b))
  }

  test("curriculumBuckets: boundary values stay in their own bucket, " +
      "assignment is exact and partitioning-independent") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val got = CorpusStats.curriculumBuckets(df.repartition(7), "v", 10)
      .select("v", "bucket").as[(Double, Int)].collect().toMap
    (1 to 100).foreach { i =>
      val expected = (i + 9) / 10 // ceil(i/10): 1..10 -> 1, 11..20 -> 2, ...
      assert(got(i.toDouble) === expected, s"value $i")
    }
  }

  test("curriculumBuckets: tied mass cannot split — all rows land in one bucket") {
    // deciles of a constant column are all that constant; nothing is
    // strictly below any boundary, so every row gets bucket 1 (the reason
    // c08 stratifies on length, not the tie-heavy rounded quality signal)
    val df = Seq.fill(50)(0.95).toDF("v")
    val buckets = CorpusStats.curriculumBuckets(df, "v", 10)
      .select("bucket").distinct().as[Int].collect().toSeq
    assert(buckets === Seq(1))
  }

  test("psiDrift: identical snapshots have zero drift in every bucket") {
    val a = (1 to 200).map(i => (i % 100) / 100.0).toDF("v")
    val got = CorpusStats.psiDrift(a, a, "v", nBuckets = 10)
      .select("psi_term").as[Double].collect()
    assert(got.nonEmpty && got.forall(_ === 0.0))
  }

  test("psiDrift: a shifted snapshot produces positive total PSI and " +
      "full-outer buckets on both sides") {
    val a = (1 to 100).map(_ => 0.15).toDF("v") // all in bucket 1
    val b = (1 to 100).map(_ => 0.85).toDF("v") // all in bucket 8
    val rows = CorpusStats.psiDrift(a, b, "v", nBuckets = 10)
      .select("bucket", "n_a", "n_b", "psi_term")
      .as[(Int, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(1, 8))
    assert(rows(0)._2 === 100L && rows(0)._3 === 0L)
    assert(rows(1)._2 === 0L && rows(1)._3 === 100L)
    // total drift is large and positive: (1 - eps)·ln(1/eps) per side
    assert(rows.map(_._4).sum > 20.0)
  }

  test("globalRunningTotal equals the single-task ORDER BY window on random data") {
    val rnd = new scala.util.Random(11)
    val df = rnd.shuffle((0 until 500).toList)
      .map(i => (i.toLong, rnd.nextInt(100).toLong))
      .toDF("id", "n").repartition(7)
    val got = CorpusStats.globalRunningTotal(df, "id", "n", "cum")
      .select("id", "cum").as[(Long, Long)].collect().toMap
    val w = org.apache.spark.sql.expressions.Window.orderBy($"id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val want = df.withColumn("cum", sum($"n").over(w))
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("globalRunningTotal on an empty frame yields an empty frame") {
    val df = Seq.empty[(Long, Long)].toDF("id", "n")
    assert(CorpusStats.globalRunningTotal(df, "id", "n").count() === 0L)
  }

  test("leakageSafeSplit: same group always lands on the same side, " +
      "fraction tracks trainFrac, and assignment is seed-deterministic") {
    val rows = (1L to 2000L).map(i => (i, i % 500)).toDF("id", "grp")
    val got = CorpusStats.leakageSafeSplit(rows, "grp", trainFrac = 0.8)
      .select("id", "grp", "split").as[(Long, Long, String)].collect()
    // no group straddles the boundary
    val perGroup = got.groupBy(_._2).values
    assert(perGroup.forall(_.map(_._3).distinct.length == 1))
    // fraction is near 0.8 at 500 groups (binomial, generous bound)
    val trainFrac = got.count(_._3 == "train").toDouble / got.length
    assert(trainFrac > 0.7 && trainFrac < 0.9, trainFrac)
    // deterministic: a second run is identical; a different seed is not
    val again = CorpusStats.leakageSafeSplit(rows, "grp", trainFrac = 0.8)
      .select("id", "grp", "split").as[(Long, Long, String)].collect()
    assert(got.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    val reseeded = CorpusStats.leakageSafeSplit(rows, "grp",
        trainFrac = 0.8, seed = 7L)
      .select("id", "grp", "split").as[(Long, Long, String)].collect()
    assert(got.sortBy(_._1).toSeq != reseeded.sortBy(_._1).toSeq)
  }

  test("mixtureSample: exact quotas, whole-stratum on over-quota, " +
      "off-recipe strata excluded, deterministic") {
    val docs = ((1L to 20L).map((_, "a")) ++ (21L to 25L).map((_, "b")) ++
      (26L to 30L).map((_, "c"))).toDF("id", "src")
    val got = CorpusStats.mixtureSample(docs, "src", "id",
        Map("a" -> 6, "b" -> 100))
      .as[(String, Long, Int)].collect()
    val bySrc = got.groupBy(_._1)
    assert(bySrc("a").length === 6, "quota not exact")
    assert(bySrc("b").length === 5, "over-quota must return the stratum")
    assert(!bySrc.contains("c"), "off-recipe stratum leaked")
    // ranks are 1..n and selection is reproducible
    assert(bySrc("a").map(_._3).sorted.toSeq === (1 to 6))
    val again = CorpusStats.mixtureSample(docs, "src", "id",
        Map("a" -> 6, "b" -> 100))
      .as[(String, Long, Int)].collect()
    assert(got.sortBy(r => (r._1, r._3)).toSeq ===
      again.sortBy(r => (r._1, r._3)).toSeq)
    // a different seed picks a different subset of 'a'
    val reseeded = CorpusStats.mixtureSample(docs, "src", "id",
        Map("a" -> 6, "b" -> 100), seed = 99L)
      .as[(String, Long, Int)].collect()
    assert(reseeded.filter(_._1 == "a").map(_._2).toSet !=
      got.filter(_._1 == "a").map(_._2).toSet)
  }

  test("sourceOverlap: a mirrored source scores jaccard 1.0 with its " +
      "original, disjoint sources are not emitted") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      ("mirror1", base), ("mirror2", base),
      ("partial", "alpha beta gamma delta epsilon different tail words here now"),
      ("disjoint", "one two three four five six seven eight nine ten"))
      .toDF("source", "text")
    val got = CorpusStats.sourceOverlap(docs, "source", "text")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // identical docs: full gram sets shared
    assert(got(("mirror1", "mirror2"))._2 === 1.0)
    // partial shares exactly the 5-grams inside 'alpha..epsilon': one
    // 5-gram window fits -> 1 shared of (6 + 6 - 1) = 11
    assert(got(("mirror1", "partial")) ===
      ((1L, BigDecimal(1.0 / 11).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // the disjoint source intersects nobody -> absent, not zero-padded
    assert(!got.keys.exists(k => k._1 == "disjoint" || k._2 == "disjoint"))
  }

  test("sourceOverlapShortlisted: the sketch floor screens out low-overlap " +
      "pairs, survivors carry the EXACT matrix values, and the exact join " +
      "runs behind a left-semi source restriction") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      ("mirror1", base), ("mirror2", base),
      // shares ONE gram window of 11 -> true J ~ 0.09, below the floor
      ("partial", "alpha beta gamma delta epsilon different tail words here now"),
      ("disjoint", "one two three four five six seven eight nine ten"))
      .toDF("source", "text")
    val got = CorpusStats.sourceOverlapShortlisted(docs, "source", "text",
      sketchK = 16, minJaccard = 0.5)
    val rows = got.as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // only the mirror pair clears the 0.5 floor; its values are the
    // exact sourceOverlap values, not estimates
    assert(rows.keySet == Set(("mirror1", "mirror2")), rows)
    assert(rows(("mirror1", "mirror2")) === ((6L, 1.0)))
    // plan pins: equi-joins only, and the exact gram pass sits behind
    // the shortlist's LeftSemi source restriction
    val plan = got.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Cartesian"), plan)
    assert(plan.contains("LeftSemi"), plan)
  }

  test("exclusivePrefixMinDesc equals the brute-force strict-greater min " +
      "on random distinct keys across partitionings") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = rnd.shuffle((0 until 200).toList)
      .map(k => (k.toDouble / 4.0, rnd.nextInt(50).toLong))
    val df = rows.toDF("q", "v").repartition(7)
    val got = CorpusStats.exclusivePrefixMinDesc(df, "q", "v", "m")
      .select("q", "m").as[(Double, Option[Long])].collect().toMap
    rows.foreach { case (q, _) =>
      val above = rows.filter(_._1 > q).map(_._2)
      val want = if (above.isEmpty) None else Some(above.min)
      assert(got(q) === want, s"q=$q")
    }
  }

  test("paretoFrontier equals the quadratic dominance check on random " +
      "points, ties on both axes all survive") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val pts = (0 until 300).map(i =>
      (i.toLong, rnd.nextInt(15).toDouble / 2.0, rnd.nextInt(40).toLong))
    val df = pts.toDF("id", "quality", "n").repartition(5)
    val got = CorpusStats.paretoFrontier(df, "quality", "n")
      .select("id").as[Long].collect().toSet
    val want = pts.filter { case (_, q, n) =>
      !pts.exists { case (_, q2, n2) =>
        q2 >= q && n2 <= n && (q2 > q || n2 < n)
      }
    }.map(_._1).toSet
    assert(got === want)
    // ties: duplicated frontier points must BOTH survive
    val sample = want.head
    val (_, q0, n0) = pts.find(_._1 == sample).get
    val df2 = (pts :+ ((999L, q0, n0))).toDF("id", "quality", "n")
    val got2 = CorpusStats.paretoFrontier(df2, "quality", "n")
      .select("id").as[Long].collect().toSet
    assert(got2.contains(sample) && got2.contains(999L))
  }

  test("quantileNormalize maps within-source ranks onto the exact global " +
      "positions of the integer formula, including 1-row sources and ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    // three sources of very different sizes, plenty of value ties
    val rows = ((0 until 60).map(i => (i.toLong, "a", rnd.nextInt(10).toLong)) ++
      (60 until 80).map(i => (i.toLong, "b", rnd.nextInt(10).toLong)) ++
      Seq((80L, "c", 5L))).toList
    val df = rows.toDF("id", "src", "v").repartition(6)
    val got = CorpusStats.quantileNormalize(df, "src", "v", "id")
      .select("id", "v_norm").as[(Long, Long)].collect().toMap
    val globalSorted = rows.sortBy(r => (r._3, r._1)).map(_._3)
    val bigN = globalSorted.size.toLong
    rows.groupBy(_._2).foreach { case (_, g) =>
      val inOrder = g.sortBy(r => (r._3, r._1))
      val n = g.size.toLong
      inOrder.zipWithIndex.foreach { case ((id, _, _), i) =>
        val r = i + 1L
        val p = if (n > 1) (r - 1) * (bigN - 1) / (n - 1) + 1 else (bigN + 1) / 2
        assert(got(id) === globalSorted((p - 1).toInt), s"id=$id")
      }
    }
  }

  test("skewReport: uniform keys score ratio 1, a planted hot key " +
      "dominates max and the exact p99 follows the histogram rule") {
    import spark.implicits._
    val uniform = (0 until 100).map(i => (i % 10).toLong).toDF("k")
    val u = CorpusStats.skewReport(uniform, Seq("k"))
      .as[(Long, Long, Long, Long, Double, Double)].head()
    assert(u === ((10L, 100L, 10L, 10L, 10.0, 1.0)))
    // 99 singleton keys + one hot key with 901 rows
    val hot = ((0 until 99).map(i => (i.toLong, 0)) ++
      (0 until 901).map(_ => (999L, 0))).toDF("k", "x")
    val h = CorpusStats.skewReport(hot, Seq("k"))
      .as[(Long, Long, Long, Long, Double, Double)].head()
    assert(h._1 === 100L && h._2 === 1000L && h._3 === 901L)
    // p99: cum >= ceil(99·100/100) = 99 is reached at count value 1
    assert(h._4 === 1L)
    assert(h._6 === 90.1)
  }

  test("property: skewReport matches the brute-force count summary on " +
      "random key distributions (p99 via the histogram bound rule)") {
    import spark.implicits._
    val rnd = new scala.util.Random(73)
    val keys = (0 until 800).map(_ => (rnd.nextInt(40) match {
      case k if k < 3 => k      // a few hot keys
      case k => k
    }).toLong)
    val got = CorpusStats.skewReport(keys.toDF("k"), Seq("k"))
      .as[(Long, Long, Long, Long, Double, Double)].head()
    val counts = keys.groupBy(identity).map(_._2.size.toLong).toSeq
    val nKeys = counts.size.toLong
    // histogram p99: smallest count value whose cumulative key count
    // reaches ceil(99·nKeys/100)
    val hist = counts.groupBy(identity).map { case (v, o) => (v, o.size.toLong) }
      .toSeq.sortBy(_._1)
    val target = (99L * nKeys + 99L) / 100L
    var cum = 0L
    val p99 = hist.collectFirst {
      case (v, c) if { cum += c; cum >= target } => v
    }.get
    assert(got._1 === nKeys && got._2 === 800L && got._3 === counts.max)
    assert(got._4 === p99)
    val mean = 800.0 / nKeys
    assert(got._5 === BigDecimal(mean)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got._6 === BigDecimal(counts.max / mean)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("datasetCard: hand-computed counts, entropy, mean quality and " +
      "dup fraction on a tiny corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma", "en"),
      (2L, "alpha beta gamma", "en"),    // exact normalized dup of doc 1
      (3L, "delta epsilon", "de"))
      .toDF("doc_id", "text", "lang")
    val got = CorpusStats.datasetCard(docs, "text", "lang")
      .as[(Long, Long, Long, Long, Double, Double, Double)].head()
    assert(got._1 === 3L)                      // n_docs
    assert(got._2 === 8L)                      // 3 + 3 + 2 tokens
    assert(got._3 === 5L)                      // distinct tokens
    assert(got._4 === 2L)                      // languages
    // entropy of (2/3, 1/3) via the rounded-term contract
    val terms = Seq(2.0 / 3, 1.0 / 3).map(p =>
      BigDecimal(p * math.log(p)).setScale(8, BigDecimal.RoundingMode.HALF_UP))
    val wantEnt = BigDecimal(-terms.sum.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got._5 === wantEnt)
    // dup fraction: 2 distinct normalized texts of 3 docs
    assert(got._7 === BigDecimal(1.0 - 2.0 / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got._6 > 0.0 && got._6 < 1.0)       // mean quality is a share
  }

  test("ksStatistic: identical samples give 0, disjoint supports give 1, " +
      "random samples match the brute-force CDF walk with min-value ties") {
    import spark.implicits._
    val a = (1 to 100).map(_.toLong % 10).toDF("v")
    val same = CorpusStats.ksStatistic(a, a, "v")
      .as[(Double, Double)].head()
    assert(same._1 === 0.0)
    val lo = Seq(1L, 2L, 3L).toDF("v")
    val hi = Seq(10L, 11L).toDF("v")
    val dis = CorpusStats.ksStatistic(lo, hi, "v").as[(Double, Double)].head()
    assert(dis._1 === 1.0 && dis._2 === 3.0,
      "full separation at the last value of the lower support")
    // fractional metric (the rounded-double quality contract): values
    // must NOT truncate to a shared integer
    val fa = Seq(0.1, 0.2, 0.3).toDF("v")
    val fb = Seq(0.7, 0.8).toDF("v")
    val fd = CorpusStats.ksStatistic(fa, fb, "v").as[(Double, Double)].head()
    assert(fd._1 === 1.0 && fd._2 === 0.3)
    val rnd = new scala.util.Random(23)
    val xs = (0 until 80).map(_ => rnd.nextInt(15).toLong)
    val ys = (0 until 50).map(_ => (rnd.nextInt(15) + 3).toLong)
    val got = CorpusStats.ksStatistic(xs.toDF("v"), ys.toDF("v"), "v")
      .as[(Double, Double)].head()
    val dom = (xs ++ ys).distinct.sorted
    val terms = dom.map { v =>
      val t = math.abs(xs.count(_ <= v).toDouble / xs.size -
        ys.count(_ <= v).toDouble / ys.size)
      v -> BigDecimal(t).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val mx = terms.map(_._2).max
    assert(got._1 === mx)
    assert(got._2 === terms.filter(_._2 == mx).map(_._1).min.toDouble)
  }

  test("winsorize clips exactly at the histogram p05/p95 bounds and " +
      "leaves interior values untouched") {
    import spark.implicits._
    val df = (1 to 100).map(_.toLong).toDF("v")
    val got = CorpusStats.winsorize(df, "v", nBuckets = 20,
        loBucket = 1, hiBucket = 19)
      .select("v", "v_wins").as[(Long, Double)].collect().toMap
    // uniform 1..100 at 20 buckets: bound b = smallest v with cum >= 5b,
    // so p05 = 5, p95 = 95
    assert(got(1L) === 5.0 && got(4L) === 5.0, "low tail clips to p05")
    assert(got(100L) === 95.0 && got(96L) === 95.0, "high tail clips to p95")
    (5 to 95).foreach(i => assert(got(i.toLong) === i.toDouble, s"v=$i"))
    intercept[IllegalArgumentException] {
      CorpusStats.winsorize(df, "v", nBuckets = 20, loBucket = 19, hiBucket = 1)
    }
  }

  test("budgetSelect keeps the exact best-first prefix under a composite " +
      "order with ties, and a roomy budget keeps everything") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val rows = (0 until 200).map(i =>
      (i.toLong, rnd.nextInt(10).toDouble, 1L + rnd.nextInt(30)))
    val df = rows.toDF("id", "q", "cost").repartition(6)
    val budget = 700L
    val got = CorpusStats.budgetSelect(df,
        Seq(col("q").desc, col("id").asc), "cost", budget)
      .select("id", "cum_cost").as[(Long, Long)].collect().toMap
    var cum = 0L
    val want = rows.sortBy { case (id, q, _) => (-q, id) }.takeWhile { r =>
      cum += r._3; cum <= budget
    }
    assert(got.keySet === want.map(_._1).toSet)
    // cum values replay exactly
    var c2 = 0L
    want.foreach { case (id, _, cost) =>
      c2 += cost
      assert(got(id) === c2, s"cum at id=$id")
    }
    val all = CorpusStats.budgetSelect(df,
      Seq(col("q").desc, col("id").asc), "cost", 1000000L)
    assert(all.count() === 200L)
  }

  test("quantileNormalize: after normalization every source's marginal " +
      "is drawn from the global value multiset") {
    import spark.implicits._
    val rows = (0 until 50).map(i => (i.toLong, if (i % 2 == 0) "x" else "y",
      (i * 7 % 23).toLong))
    val df = rows.toDF("id", "src", "v")
    val norm = CorpusStats.quantileNormalize(df, "src", "v", "id")
      .select("v_norm").as[Long].collect().toSet
    assert(norm.subsetOf(rows.map(_._3).toSet))
  }

  test("cohensKappa: the textbook 2x2 case, null-label exclusion, " +
      "constant-agreeing raters yield NULL kappa") {
    import spark.implicits._
    // Cohen's worked shape: contingency [[20,5],[10,15]] over 50 items:
    // po = 35/50 = 0.7, pe = (30*25 + 20*25)/50^2 = 0.5, kappa = 0.4
    val rows =
      Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n")) ++
      Seq((null, "y"), ("y", null)) // un-rated rows are excluded
    val got = CorpusStats.cohensKappa(rows.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(got === ((50L, 35L, 0.7, 0.5, 0.4)))
    // both raters constant and equal: pe = 1, kappa undefined -> NULL
    val const = CorpusStats.cohensKappa(
      Seq(("x", "x"), ("x", "x")).toDF("a", "b"), "a", "b")
      .select("kappa").collect().head
    assert(const.isNullAt(0), s"pe=1 must yield NULL kappa, got $const")
    // disagreement beyond chance goes negative: [[0,25],[25,0]]
    val anti = Seq.fill(25)(("y", "n")) ++ Seq.fill(25)(("n", "y"))
    val k = CorpusStats.cohensKappa(anti.toDF("a", "b"), "a", "b")
      .select("kappa").as[Double].head()
    assert(k === -1.0, s"perfect disagreement with equal marginals: $k")
  }

  test("rocAuc: hand-computed midrank case, perfect / inverted / " +
      "uninformative classifiers, degenerate one-class input") {
    def auc(rows: Seq[(Double, Int)]): Option[Double] = {
      val r = CorpusStats.rocAuc(rows.toDF("s", "y"), "s", "y").head()
      if (r.isNullAt(0)) None else Some(r.getDouble(0))
    }
    // ranks 1,2,{3,4 midrank 3.5},5 -> R+ = 3.5+5 -> (8.5-3)/6
    assert(auc(Seq((0.1, 0), (0.2, 0), (0.3, 1), (0.3, 0), (0.4, 1)))
      === Some(0.916667))
    assert(auc(Seq((0.1, 0), (0.2, 0), (0.8, 1), (0.9, 1))) === Some(1.0))
    assert(auc(Seq((0.9, 0), (0.8, 0), (0.1, 1), (0.2, 1))) === Some(0.0))
    assert(auc(Seq((0.5, 0), (0.5, 1), (0.5, 0), (0.5, 1))) === Some(0.5))
    assert(auc(Seq((0.1, 1), (0.9, 1))) === None, "one-class AUC undefined")
  }

  test("rocAuc counts and AUC match a brute-force pair comparison on " +
      "random scores") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(60)((math.floor(rnd.nextDouble() * 20) / 20.0,
      if (rnd.nextBoolean()) 1 else 0))
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val want = BigDecimal(wins / (pos.size * neg.size))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = CorpusStats.rocAuc(rows.toDF("s", "y"), "s", "y").head()
    assert(r.getDouble(0) === want)
    assert(r.getLong(1) === pos.size.toLong)
    assert(r.getLong(2) === neg.size.toLong)
  }

  test("neymanAllocation: variance-weighted shares, largest-remainder " +
      "integerization, population cap, zero-variance strata get zero") {
    val rows = Seq(
      ("a", 0L), ("a", 10L),
      ("b", 5L), ("b", 5L), ("b", 5L),
      ("c", 0L), ("c", 20L)).toDF("src", "m")
    val got = CorpusStats.neymanAllocation(rows, "src", "m", sampleN = 5L)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3))))
      .toMap
    // sd_a = sqrt(50), sd_c = sqrt(200); raws 1.67/0/3.33; floors 1/0/3;
    // the one leftover goes to a (remainder .67 > .33); c caps at its 2 rows
    assert(got("a") === ((2L, 7.071068, 2L)))
    assert(got("b") === ((3L, 0.0, 0L)))
    assert(got("c") === ((2L, 14.142136, 2L)))
    val err = intercept[Exception] {
      CorpusStats.neymanAllocation(
        Seq(("a", 5L), ("a", 5L)).toDF("src", "m"), "src", "m", 10L)
    }
    assert(err.getMessage.contains("zero variance"))
  }

  test("calibrationBins: clamped top bin, exact decimal-routed sums, " +
      "positive rates") {
    val rows = Seq((0.05, 0), (0.15, 1), (0.95, 1), (1.0, 1))
    val got = CorpusStats.calibrationBins(rows.toDF("s", "y"), "s", "y")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got(0) === ((1L, 0.05, 0L, 0.0)))
    assert(got(1) === ((1L, 0.15, 1L, 1.0)))
    assert(got(9) === ((2L, 1.95, 2L, 1.0)), "score 1.0 clamps into bin 9")
    assert(got.size === 3)
  }

  test("prAuc: hand-computed trapezoids with a score tie, perfect " +
      "classifier pins 1.0, all-negative input pins NULL") {
    import spark.implicits._
    // thresholds desc: 0.9 -> (TP 1, cnt 1), 0.8 (tie group) -> (2, 3)
    // terms: 0.5*1 + 0.5*((2/3 + 1)/2) = 0.5 + 5/12
    val mixed = Seq((0.9, 1), (0.8, 0), (0.8, 1), (0.5, 0)).toDF("s", "y")
    val got = CorpusStats.prAuc(mixed, "s", "y")
      .as[(Option[Double], Option[Double], Long, Long)].head()
    assert(got === ((Some(0.916667), Some(0.5), 2L, 2L)))
    val perfect = Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)).toDF("s", "y")
    assert(CorpusStats.prAuc(perfect, "s", "y")
      .as[(Option[Double], Option[Double], Long, Long)].head()
      === ((Some(1.0), Some(0.5), 2L, 2L)))
    val allNeg = Seq((0.9, 0), (0.1, 0)).toDF("s", "y")
    val neg = CorpusStats.prAuc(allNeg, "s", "y")
      .as[(Option[Double], Option[Double], Long, Long)].head()
    assert(neg === ((None, Some(0.0), 0L, 2L)),
      "no positives: PR-AUC undefined, baseline 0")
  }

  test("concentrationReport: hand-computed HHI / effective strata / top " +
      "share; a single-stratum group pins all three to 1.0") {
    import spark.implicits._
    val docs = Seq(
      ("en", "a"), ("en", "a"), ("en", "a"), ("en", "b"), // shares 3/4, 1/4
      ("fr", "c"), ("fr", "c"))
      .toDF("lang", "source")
    val got = CorpusStats.concentrationReport(docs, "lang", "source")
      .as[(String, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    // en: sq = 9 + 1 = 10, N^2 = 16 -> HHI 0.625, effective 1.6
    assert(got("en") === ((4L, 2L, 0.625, 1.6, 0.75)))
    assert(got("fr") === ((2L, 1L, 1.0, 1.0, 1.0)))
    val plan = CorpusStats.concentrationReport(docs, "lang", "source")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("Join"), plan)
  }

  test("count-frame entry points reproduce the row-level evals exactly: " +
      "prAucFromScoreCounts == prAuc and calibrationFromScoreCounts == " +
      "calibrationBins on a tie-heavy fixture (DECIMAL score*count is " +
      "exact)") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    // heavy repetition: 200 rows over 7 distinct scores, mixed labels
    val rows = (0 until 200).map { _ =>
      (Seq(0.05, 0.2, 0.2, 0.55, 0.8, 0.95, 1.0)(rnd.nextInt(7)),
        rnd.nextInt(2))
    }
    val df = rows.toDF("score", "y")
    val counts = df.select(col("score").as("__s"),
        col("y").cast("long").as("__y"))
      .groupBy("__s")
      .agg(count(lit(1)).as("__c"), sum(col("__y")).as("__p"))
    assert(CorpusStats.prAucFromScoreCounts(counts).collect().toSeq ===
      CorpusStats.prAuc(df, "score", "y").collect().toSeq)
    assert(CorpusStats.calibrationFromScoreCounts(counts, 10)
      .collect().toSet ===
      CorpusStats.calibrationBins(df, "score", "y", 10).collect().toSet)
  }

  test("krippendorffAlpha: hand-computed nominal alpha, unpairable units " +
      "drop, degenerate cases are NULL") {
    import spark.implicits._
    // u1 [a,a], u2 [a,b], u3 [b,b], u4 [a] (unpairable)
    // D_o = 0 + (4-2)/1 + 0 = 2; marginals a=3, b=3, n=6, Σnc²=18
    // D_e = (36-18)/5 = 3.6; α = 1 − 2/3.6 = 0.444444
    val df = Seq(
      (1L, 1, "a"), (1L, 2, "a"),
      (2L, 1, "a"), (2L, 2, "b"),
      (3L, 1, "b"), (3L, 2, "b"),
      (4L, 1, "a")).toDF("unit", "rater", "label")
    val r = CorpusStats.krippendorffAlpha(df, "unit", "label")
      .as[(Long, Long, Option[Double], Option[Double], Option[Double])].head()
    assert(r._1 === 3L && r._2 === 6L)
    assert(r._3 === Some(2.0))
    assert(r._4 === Some(3.6))
    assert(math.abs(r._5.get - 0.444444) < 1e-9)
    // perfect agreement across two categories => alpha = 1
    val perfect = Seq((1L, "a"), (1L, "a"), (2L, "b"), (2L, "b"))
      .toDF("unit", "label").withColumn("rater", lit(0))
    val p = CorpusStats.krippendorffAlpha(perfect, "unit", "label")
      .as[(Long, Long, Option[Double], Option[Double], Option[Double])].head()
    assert(p._5 === Some(1.0))
    // single category everywhere: D_e = 0, agreement undefined
    val mono = Seq((1L, "a"), (1L, "a")).toDF("unit", "label")
    val m = CorpusStats.krippendorffAlpha(mono, "unit", "label")
      .as[(Long, Long, Option[Double], Option[Double], Option[Double])].head()
    assert(m._5 === None)
    // nothing pairable: zero counts, NULL alpha
    val lone = Seq((1L, "a"), (2L, "b")).toDF("unit", "label")
    val l = CorpusStats.krippendorffAlpha(lone, "unit", "label")
      .as[(Long, Long, Option[Double], Option[Double], Option[Double])].head()
    assert(l._1 === 0L && l._2 === 0L && l._5 === None)
  }

  test("classifierEval: hand-computed P/R/F1, never-predicted and never-true classes") {
    // 'd' never occurs in truth but is predicted once; 'e' is true once
    // but never predicted
    val df = Seq(
      ("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"), ("b", "c"),
      ("c", "c"), ("e", "d")).toDF("truth", "pred")
    val got = CorpusStats.classifierEval(df, "truth", "pred")
      .as[(String, Long, Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    // a: tp=2, fp=0 (pred a twice, both true a), fn=1 -> P=1, R=2/3
    assert(got("a")._2 === 2L && got("a")._3 === 0L && got("a")._4 === 1L)
    assert(got("a")._5 === Some(1.0))
    assert(got("a")._6 === Some(BigDecimal(2.0 / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    assert(got("a")._7 === Some(BigDecimal(2.0 * 1.0 * (2.0 / 3.0) / (1.0 + 2.0 / 3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    // b: tp=1, fp=1 (a misread as b), fn=1 -> P=R=F1=0.5
    assert(got("b")._2 === 1L && got("b")._3 === 1L && got("b")._4 === 1L)
    assert(got("b")._7 === Some(0.5))
    // d: predicted once, never true -> fp=1, fn=0, precision 0, recall NULL, f1 NULL
    assert(got("d")._2 === 0L && got("d")._3 === 1L && got("d")._4 === 0L)
    assert(got("d")._5 === Some(0.0) && got("d")._6 === None && got("d")._7 === None)
    // e: true once, never predicted -> fp=0, fn=1, precision NULL
    assert(got("e")._2 === 0L && got("e")._3 === 0L && got("e")._4 === 1L)
    assert(got("e")._5 === None && got("e")._6 === Some(0.0) && got("e")._7 === None)
    assert(got.size === 5)
  }

  test("retrievalEval: hand-computed MRR/recall/nDCG, a query with nothing " +
      "retrieved pools as zeros") {
    def r9(x: Double): java.math.BigDecimal =
      new java.math.BigDecimal(x).setScale(9, java.math.RoundingMode.HALF_UP)
    // query 1: run = [d2(g1)@1, d9(-)@2, d1(g2)@3]; qrels d1:2, d2:1, d3:1
    // query 2: nothing relevant retrieved
    val runs = Seq(
      (1L, 2L, 1), (1L, 9L, 2), (1L, 1L, 3),
      (2L, 9L, 1), (2L, 8L, 2)).toDF("query_id", "doc_id", "rank")
    val qrels = Seq(
      (1L, 1L, 2), (1L, 2L, 1), (1L, 3L, 1),
      (2L, 5L, 1)).toDF("query_id", "doc_id", "grade")
    val got = CorpusStats.retrievalEval(runs, qrels, k = 3)
      .as[(Long, Double, Double, Double)].head()
    val dcg = r9(1.0 / math.log(2.0)).add(r9(3.0 / math.log(4.0)))
    val idcg = r9(3.0 / math.log(2.0)).add(r9(1.0 / math.log(3.0)))
      .add(r9(1.0 / math.log(4.0)))
    def r6mean2(a: java.math.BigDecimal): Double =
      new java.math.BigDecimal(a.doubleValue() / 2.0)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    assert(got._1 === 2L)
    // q1 rr = 1.0, q2 rr = 0 -> mean 0.5
    assert(got._2 === 0.5)
    // q1 recall = round9(2/3), q2 = 0
    assert(got._3 === r6mean2(r9(2.0 / 3.0)))
    // q1 ndcg = round9(dcg/idcg), q2 = 0
    assert(got._4 === r6mean2(r9(dcg.doubleValue() / idcg.doubleValue())))
  }
}
