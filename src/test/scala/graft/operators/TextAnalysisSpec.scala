package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("langId picks the stopword-dominant language, 'und' when none") {
    val df = Seq(
      (1L, "the cat and the dog went to the market for a stroll"),
      (2L, "der Hund und die Katze sind nicht mit der Maus"),
      (3L, "le chat est dans la maison pour le diner"),
      (4L, "xyzzy plugh qwerty")).toDF("doc_id", "text")
    val out = df.select($"doc_id", TextAnalysis.langId($"text").as("l"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) === "en")
    assert(out(2L) === "de")
    assert(out(3L) === "fr")
    assert(out(4L) === "und")
  }

  test("tokenCount counts whitespace tokens after normalization") {
    val df = Seq((1L, "  a  b\tc\nd  ")).toDF("id", "text")
    assert(df.select(TextAnalysis.tokenCount($"text")).as[Int].head() === 4)
  }

  test("bpeTokenEstimate: ~len/4 per long word, min 1 per word") {
    val df = Seq((1L, "a bb characterization")).toDF("id", "text")
    // 1 + 1 + ceil(16/4)=4 => 6
    assert(df.select(TextAnalysis.bpeTokenEstimate($"text")).as[Int].head() === 6)
  }

  test("qualityScore rewards clean prose, penalizes junk") {
    val df = Seq(
      (1L, "this is a perfectly reasonable sentence with normal words in it"),
      (2L, "@@@@#### !!!! 00" * 3)).toDF("id", "text")
    val scores = df.select($"id", TextAnalysis.qualityScore($"text").as("q"))
      .as[(Long, Double)].collect().toMap
    assert(scores(1L) > 0.9)
    assert(scores(2L) < 0.5)
    assert(scores.values.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("linearQualityClassify: sigmoid of the literal-weight margin; keep == (z >= 0)") {
    val w = Seq(-2.0, 1.5, 2.0, 1.0, 2.5)
    val df = Seq(
      (1L, "the cat sat on the mat and it is a good day for that to happen"),
      (2L, "@@@@#### !!!! 00" * 3),
      (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.linearQualityClassify(df, "text", w)
      .select($"doc_id", $"score", $"keep").as[(Long, Double, Boolean)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    // stopword-rich prose clears the margin; symbol soup and empty don't
    assert(out(1L)._2, s"prose dropped: ${out(1L)}")
    assert(!out(2L)._2 && !out(3L)._2)
    // score is the sigmoid: in (0,1), monotone with the margin, and
    // keep is score >= 0.5 exactly
    out.values.foreach { case (s, k) =>
      assert(s > 0.0 && s < 1.0)
      assert(k === (s >= 0.5))
    }
    // empty text: every feature 0, score = sigmoid(bias) exactly
    assert(math.abs(out(3L)._1 - 1.0 / (1.0 + math.exp(2.0))) < 1e-12)
  }

  test("weightedSample: deterministic, without replacement, weight-monotone") {
    val df = (1L to 200L).map(i => (i, if (i <= 100) 1L else 20L))
      .toDF("id", "w")
    val s1 = TextAnalysis.weightedSample(df, "id", "w", k = 40, seed = 1L)
      .select("id").as[Long].collect().toSeq
    // deterministic across runs
    val s2 = TextAnalysis.weightedSample(df, "id", "w", k = 40, seed = 1L)
      .select("id").as[Long].collect().toSeq
    assert(s1 === s2)
    // without replacement, exactly k
    assert(s1.size === 40 && s1.distinct.size === 40)
    // heavy ids (20× weight) must dominate the sample across seeds
    val heavyShare = (1L to 5L).map { seed =>
      TextAnalysis.weightedSample(df, "id", "w", k = 40, seed)
        .select("id").as[Long].collect().count(_ > 100)
    }.sum / 5.0
    assert(heavyShare > 30.0, s"heavy ids averaged $heavyShare of 40 — " +
      "weighting broken (expected ≈37 at 20:1 odds)")
    // zero/negative weights can never be drawn
    val withZero = df.withColumn("w", when($"id" === 1L, 0L).otherwise($"w"))
    val s3 = TextAnalysis.weightedSample(withZero, "id", "w", k = 200, seed = 1L)
      .select("id").as[Long].collect().toSeq
    assert(!s3.contains(1L) && s3.size === 199)
  }

  test("fingerprint is the poly hash of normalized text") {
    def poly(s: String): Long = s.foldLeft(0L)((h, c) => h * 31L + c.toLong)
    val df = Seq((1L, "  Hello   WORLD  ")).toDF("id", "text")
    assert(df.select(TextAnalysis.fingerprint($"text")).as[Long].head() ===
      poly("hello world"))
  }

  test("analyze attaches all columns") {
    val df = Seq((1L, "some text here")).toDF("id", "text")
    val out = TextAnalysis.analyze(df, "text")
    assert(Seq("pred_lang", "n_tokens", "n_tokens_bpe", "quality", "fingerprint")
      .forall(out.columns.contains))
  }

  test("packSequences: cumulative tokens and bins are monotone per group") {
    val docs = (1L to 100L).map(i => (i, ("word " * (i % 30 + 1).toInt).trim))
      .toDF("doc_id", "text")
    val packed = TextAnalysis.packSequences(docs, "doc_id", "text",
      tokenBudget = 40, numGroups = 4)
      .orderBy("pack_group", "doc_id")
      .select("pack_group", "doc_id", "n_tokens", "cum_tokens", "seq_no")
      .as[(Long, Long, Int, Long, Int)].collect()
    assert(packed.length === 100)
    packed.groupBy(_._1).values.foreach { grp =>
      val sorted = grp.sortBy(_._2)
      // cum_tokens is the running sum; seq_no = start offset / budget
      var cum = 0L
      sorted.foreach { case (_, _, n, c, s) =>
        assert(c === cum + n)
        assert(s === (cum / 40).toInt)
        cum = c
      }
    }
  }

  test("repetitionScores flag duplicated bigrams and lines") {
    val docs = Seq(
      (1L, "buy now buy now buy now buy now"), // heavy bigram repetition
      (2L, "each word appears only a single time here"),
      (3L, "line one\nline two\nline one\n\nline two")) // dup lines
      .toDF("doc_id", "text")
    val (dupB, dupL) = TextAnalysis.repetitionScores($"text")
    val out = docs.select($"doc_id", dupB.as("b"), dupL.as("l"))
      .as[(Long, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L)._1 > 0.5) // "buy now"/"now buy" repeat heavily
    assert(out(2L)._1 === 0.0)
    assert(out(2L)._2 === 0.0) // single line, no duplicates
    assert(out(3L)._2 === 0.5) // 4 nonempty lines, 2 duplicated
  }

  test("cleanText strips tags, entities and URLs, collapses whitespace") {
    val dirty = Seq(
      (1L, "<p>Hello &amp; welcome</p> to <b>the</b> site https://ex.com/a?b=1 now"),
      (2L, "already clean text"),
      (3L, "&amp;lt; stays escaped-once: &lt;tag&gt;")) // double-escape order
      .toDF("doc_id", "text")
    val out = dirty.select($"doc_id",
      TextAnalysis.cleanText($"text").as("clean")).as[(Long, String)].collect().toMap
    assert(out(1L) === "Hello & welcome to the site now")
    assert(out(2L) === "already clean text")
    assert(out(3L) === "&lt; stays escaped-once: <tag>")
  }

  test("stratifiedSample applies per-stratum rates with a default") {
    val docs = (1L to 300L).map(i =>
      (i, s"text body number $i", if (i % 3 == 0) "en" else if (i % 3 == 1) "zh" else "fr"))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.stratifiedSample(docs, "text", "lang",
      rates = Map("en" -> 0, "zh" -> 100), defaultPct = 50)
    val byLang = out.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    assert(!byLang.contains("en")) // 0% keeps nothing
    assert(byLang("zh") === 100L) // 100% keeps all 100 zh docs
    // default stratum keeps roughly half (deterministic, content-keyed)
    assert(byLang("fr") > 20L && byLang("fr") < 80L)
    // reproducible
    val again = TextAnalysis.stratifiedSample(docs, "text", "lang",
      rates = Map("en" -> 0, "zh" -> 100), defaultPct = 50)
      .select("doc_id").as[Long].collect().toSet
    assert(again === out.select("doc_id").as[Long].collect().toSet)
  }

  test("removeBoilerplateLines: shared lines vanish everywhere, unique prose survives in order") {
    val footer = "subscribe now"
    val df = Seq(
      (1L, s"alpha one\n$footer\nbeta two"),
      (2L, s"$footer\ngamma three"),
      (3L, s"delta four\n \nepsilon five"), // blank line is discarded, not boiler
      (4L, footer)).toDF("doc_id", "text")
    val out = TextAnalysis.removeBoilerplateLines(df, "doc_id", "text", minDocs = 3)
      .select($"doc_id", $"n_lines", $"n_boiler", $"text_clean")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) === ((3L, 1L, "alpha one\nbeta two")))
    assert(out(2L) === ((2L, 1L, "gamma three")))
    assert(out(3L) === ((2L, 0L, "delta four\nepsilon five")))
    // a document that was ALL boilerplate keeps an empty clean text
    assert(out(4L) === ((1L, 1L, "")))
    // below the doc-frequency threshold nothing is flagged
    val none = TextAnalysis.removeBoilerplateLines(df, "doc_id", "text", minDocs = 4)
      .agg(sum($"n_boiler")).as[Long].head()
    assert(none === 0L)
  }

  test("packingEfficiency: bin totals partition the corpus; fill = tokens/budget") {
    val df = (1L to 20L).map(i => (i, ("w " * i.toInt).trim)).toDF("doc_id", "text")
    val bins = TextAnalysis.packingEfficiency(df, "doc_id", "text",
        tokenBudget = 10, numGroups = 2)
      .as[(Long, Int, Long, Long, Double)].collect()
    // conservation: bin tokens sum to the corpus token count
    assert(bins.map(_._4).sum === (1L to 20L).sum)
    // every row accounted for exactly once
    assert(bins.map(_._3).sum === 20L)
    bins.foreach { case (_, _, _, tokens, fill) =>
      assert(math.abs(fill - tokens / 10.0) < 1e-9)
    }
  }

  test("deterministicSample is stable and content-keyed") {
    val docs = (1L to 200L).map(i => (i, s"document number $i with some text"))
      .toDF("doc_id", "text")
    val s1 = TextAnalysis.deterministicSample(docs, "text", 30)
      .select("doc_id").as[Long].collect().toSet
    val s2 = TextAnalysis.deterministicSample(docs, "text", 30)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 === s2) // reproducible
    assert(s1.nonEmpty && s1.size < 200)
    // keepPct=100 keeps everything; 0 keeps nothing
    assert(TextAnalysis.deterministicSample(docs, "text", 100).count() === 200L)
    assert(TextAnalysis.deterministicSample(docs, "text", 0).count() === 0L)
  }

  test("mixtureWeights: weight = target share / actual token share, default for unlisted strata") {
    val docs = Seq(
      (1L, "en", "one two three four"),          // 4 tokens
      (2L, "en", "five six seven eight"),        // 4 tokens
      (3L, "de", "eins zwei"),                   // 2 tokens
      (4L, "fr", "un deux")).toDF("doc_id", "lang", "text") // 2 tokens
    val got = TextAnalysis.mixtureWeights(docs, "lang", "text",
        Map("en" -> 0.5, "de" -> 0.4), defaultTarget = 0.1)
      .as[(String, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // total 12 tokens: en 8/12, de 2/12, fr 2/12
    assert(got("en")._3 === 8L)
    assert(math.abs(got("en")._6 - 0.5 / (8.0 / 12)) < 1e-12)
    assert(math.abs(got("de")._6 - 0.4 / (2.0 / 12)) < 1e-12, "de upweighted 2.4x")
    assert(got("fr")._5 === 0.1, "unlisted stratum gets the default target")
  }

  test("mixtureWeights: token-less stratum yields NULL share/weight, not Infinity") {
    // an all-null-text stratum has n_tokens NULL (sum over no non-null
    // inputs) — the one reachable case of the 0-or-null token guard
    val docs = Seq(
      (1L, "en", "one two three"),
      (2L, "yy", null),
      (3L, "yy", null)).toDF("doc_id", "lang", "text")
    val got = TextAnalysis.mixtureWeights(docs, "lang", "text",
        Map("en" -> 0.5), defaultTarget = 0.1)
      .select("lang", "actual_frac", "weight")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(!got("en").isNullAt(2) && got("en").getDouble(2).isFinite)
    assert(got("yy").isNullAt(1), "actual_frac must be NULL")
    assert(got("yy").isNullAt(2), "weight must be NULL, never Infinity")
  }

  test("applyMixture: exact-weight strata get exact copy counts") {
    // en: 3 docs x 10 tokens = 30; de: 1 doc x 10 = 10; total 40.
    // en at 750 permille -> w = 0.75*40/30 = 1 exactly -> 1 copy each;
    // de at 750 permille -> w = 0.75*40/10 = 3 exactly -> 3 copies
    val ten = "a b c d e f g h i j"
    val docs = Seq(
      (1L, "en", ten), (2L, "en", ten + " "), (3L, "en", " " + ten),
      (4L, "de", ten.toUpperCase)).toDF("doc_id", "lang", "text")
    val got = TextAnalysis.applyMixture(docs, "lang", "text",
        Map("en" -> 750, "de" -> 750), defaultPermille = 0)
      .select("doc_id", "n_copies").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L))
  }

  test("applyMixture: fractional weights keep the bucket share, deterministically") {
    val rnd = new scala.util.Random(11)
    val docs = (1L to 400L).map(i =>
      (i, "en", (1 to 10).map(_ => s"w${rnd.nextInt(50)}").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    // single stratum at 500 permille -> w = 0.5 -> ~half kept, one copy
    val got = TextAnalysis.applyMixture(docs, "lang", "text",
      Map("en" -> 500), defaultPermille = 0)
    val kept = got.select("doc_id").as[Long].collect().toSet
    assert(got.select("n_copies").as[Long].collect().forall(_ === 1L))
    assert(kept.size > 120 && kept.size < 280, s"~50% expected, got ${kept.size}")
    val again = TextAnalysis.applyMixture(docs, "lang", "text",
      Map("en" -> 500), defaultPermille = 0)
      .select("doc_id").as[Long].collect().toSet
    assert(again === kept, "keep decision must be deterministic")
  }

  test("applyMixture: rebalanced token shares land near the targets") {
    val rnd = new scala.util.Random(23)
    def doc(n: Int) = (1 to n).map(_ => s"w${rnd.nextInt(99)}").mkString(" ")
    // en over-represented 4:1; rebalance to 50/50
    val docs = ((1L to 400L).map(i => (i, "en", doc(10))) ++
      (401L to 500L).map(i => (i, "de", doc(10)))).toDF("doc_id", "lang", "text")
    val got = TextAnalysis.applyMixture(docs, "lang", "text",
        Map("en" -> 500, "de" -> 500), defaultPermille = 0)
      .groupBy("lang").agg(sum(col("n_copies") * 10).as("tokens"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = got.values.sum.toDouble
    // en w = 0.625 (keep ~62%), de w = 2.5 (2 or 3 copies) -> both
    // strata's post-mixture token shares approach the 50/50 target
    assert(math.abs(got("en") / total - 0.5) < 0.05,
      s"en share ${got("en") / total} should approach 0.5")
    assert(math.abs(got("de") / total - 0.5) < 0.05,
      s"de share ${got("de") / total} should approach 0.5")
  }

  test("applyMixture: zero-token strata and zero targets drop out") {
    val docs = Seq(
      (1L, "en", "one two three"),
      (2L, "yy", null.asInstanceOf[String]),
      (3L, "zz", "four five")).toDF("doc_id", "lang", "text")
    val got = TextAnalysis.applyMixture(docs, "lang", "text",
        Map("en" -> 1000, "zz" -> 0), defaultPermille = 0)
      .select("doc_id").as[Long].collect().toSet
    assert(!got.contains(2L), "null-text stratum cannot be rebalanced")
    assert(!got.contains(3L), "zero target drops the stratum")
    assert(got.contains(1L))
  }

  test("applyMixture: a NULL stratum is kept as its own stratum, not dropped") {
    val docs = Seq(
      (1L, "en", "one two three"),
      (2L, null.asInstanceOf[String], "four five six"),
      (3L, null.asInstanceOf[String], "seven eight nine")).toDF("doc_id", "lang", "text")
    // default target 500‰ covers the null stratum; its docs must flow
    // through (the old null-key equi-join silently discarded them)
    val got = TextAnalysis.applyMixture(docs, "lang", "text",
        Map("en" -> 500), defaultPermille = 500)
      .select("doc_id").as[Long].collect().toSet
    assert(got.contains(1L))
    assert((got - 1L).nonEmpty, "null-stratum docs must not vanish")
    // and a zero default drops the null stratum deliberately, not by accident
    val dropped = TextAnalysis.applyMixture(docs, "lang", "text",
        Map("en" -> 1000), defaultPermille = 0)
      .select("doc_id").as[Long].collect().toSet
    assert(dropped === Set(1L))
  }

  test("topTokens: exact top-k with (count DESC, token ASC) tie-break") {
    val docs = Seq(
      (1L, "apple apple apple banana banana cherry"),
      (2L, "banana cherry date   date"),
      (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.topTokens(docs, "text", 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    // apple=3, banana=3 (tie → apple first alphabetically), then cherry=2
    // vs date=2 tie → cherry
    assert(got === Seq((1, "apple", 3L), (2, "banana", 3L), (3, "cherry", 2L)))
  }

  test("redactPii: emails, IPs, phones replaced and counted; clean text untouched") {
    val docs = Seq(
      (1L, "mail a.b+c@ex-ample.org or b@x.io, host 10.0.255.7, call +1 555 010-9999"),
      (2L, "no pii here at all"),
      (3L, "edge 999.999.999.999 still shaped like an ip")).toDF("doc_id", "text")
    val got = TextAnalysis.redactPii(docs, "text")
      .select("doc_id", "text_redacted", "n_email", "n_ipv4", "n_phone")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L)._1 === "mail <EMAIL> or <EMAIL>, host <IPV4>, call <PHONE>")
    assert(got(1L)._2 === 2L && got(1L)._3 === 1L && got(1L)._4 === 1L)
    assert(got(2L) === (("no pii here at all", 0L, 0L, 0L)))
    assert(got(3L)._3 === 1L, "syntactic IPv4 shape is redacted (no range check)")
  }

  test("rareBigramFraction: gibberish scores high, repeated prose scores zero") {
    val prose = "the cat sat on the mat"
    val docs = ((1L to 6L).map(i => (i, prose)) :+ (99L, "zxqj#k@w%"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.rareBigramFraction(docs, "doc_id", "text", minCount = 5L)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // every prose bigram occurs 6x >= minCount => rare_frac 0; the
    // gibberish doc's bigrams are all singletons => rare_frac 1
    assert(got(1L)._4 === 0.0)
    assert(got(99L)._4 === 1.0)
    assert(got(99L)._2 === got(99L)._3, "all gibberish bigrams are rare")
  }

  test("decontaminate flags exactly the training docs sharing an n-gram with the eval set") {
    val training = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"), // contains eval 5-gram
      (2L, "one two three four five six seven"),       // disjoint
      (3L, "beta gamma delta epsilon zeta something else")) // shares the same window
      .toDF("doc_id", "text")
    val evalDocs = Seq(
      (100L, "beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val got = TextAnalysis.decontaminate(training, evalDocs, "doc_id", "text", n = 5)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 3L -> 1L), s"got $got")
  }

  test("decontaminate broadcasts the eval gram set (corpus grams never shuffle)") {
    val training = (1L to 50L).map(i => (i, s"doc $i has words w$i x$i y$i z$i q$i"))
      .toDF("doc_id", "text")
    val evalDocs = Seq((1L, "doc 1 has words w1 x1")).toDF("doc_id", "text")
    val p = TextAnalysis.decontaminate(training, evalDocs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"eval side not broadcast:\n$p")
  }

  test("encodeTokens: frequency-ranked ids, OOV as 0, original order kept") {
    val docs = Seq(
      (1L, "b a a c b a"), // a:3 b:2 c:1 corpus-wide
      (2L, "a c d")).toDF("doc_id", "text")
    // vocab size 2 -> a=1, b=2; c and d are OOV
    val got = TextAnalysis.encodeTokens(docs, "doc_id", "text", vocabSize = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(1L) === (("2 1 1 0 2 1", 1L)))
    assert(got(2L) === (("1 0 0", 2L)))
    // full vocab -> zero OOV, ties ranked token-ascending (b=2, c=3, d=4)
    val full = TextAnalysis.encodeTokens(docs, "doc_id", "text", vocabSize = 10)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(full(2L) === "1 3 4")
  }

  test("importanceWeights: exact linearized divergence matches brute force") {
    val docs = Seq(
      (1L, true, "good clean target text"),
      (2L, true, "good target words here"),
      (3L, false, "noisy junk spam junk"),
      (4L, false, "good mixed junk text")).toDF("doc_id", "is_t", "text")
    val buckets = 64
    val got = TextAnalysis.importanceWeights(docs, "doc_id", "text",
        col("is_t"), buckets)
      .select("doc_id", "score").as[(Long, Long)].collect().toMap

    // brute force: same hash kernel, driver-side integer arithmetic
    import org.apache.spark.unsafe.types.UTF8String
    def bucket(tok: String): Int = java.lang.Math.floorMod(
      graft.functions.HashKernels.stringHash64(UTF8String.fromString(tok)),
      buckets.toLong).toInt
    val corpus = Map(
      1L -> (true, "good clean target text"), 2L -> (true, "good target words here"),
      3L -> (false, "noisy junk spam junk"), 4L -> (false, "good mixed junk text"))
    val allToks = corpus.values.flatMap { case (_, s) => s.split(" ") }.toSeq
    val tToks = corpus.values.filter(_._1).flatMap(_._2.split(" ")).toSeq
    val s = allToks.groupBy(bucket).view.mapValues(_.size.toLong).toMap
    val t = tToks.groupBy(bucket).view.mapValues(_.size.toLong).toMap
    val (bigS, bigT) = (allToks.size.toLong, tToks.size.toLong)
    val expected = corpus.map { case (id, (_, text)) =>
      id -> text.split(" ").map { tok =>
        val b = bucket(tok)
        t.getOrElse(b, 0L) * bigS - s.getOrElse(b, 0L) * bigT
      }.sum
    }
    assert(got === expected)
    // the point of the score: target-like docs outrank pool-like docs
    assert(got(1L) > got(3L) && got(2L) > got(3L))
  }

  test("contaminationOverlap: exact shared-gram fractions and verdicts") {
    val train = Seq(
      (1L, "a b c"),       // grams (a b)(b c); shares (b c) -> 1/2
      (2L, "x y z"),       // no overlap -> 0
      (3L, "b c d")        // grams (b c)(c d); both shared -> 1
    ).toDF("doc_id", "text")
    val eval_ = Seq((100L, "b c d")).toDF("doc_id", "text")
    val got = TextAnalysis.contaminationOverlap(train, eval_, "doc_id", "text",
        n = 2, threshold = 0.5)
      .select($"doc_id", $"n_grams", $"n_shared", $"overlap_frac", $"contaminated")
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 2L, 1L, 0.5, true)))
    assert(got(2L) === ((2L, 2L, 0L, 0.0, false)))
    assert(got(3L) === ((3L, 2L, 2L, 1.0, true)))
  }

  test("importanceResample: max-score docs always keep, min-score never, " +
      "and the decision is a pure function of content") {
    val docs = Seq(
      (1L, true, "good clean target text"),
      (2L, true, "good target words here"),
      (3L, false, "noisy junk spam junk"),
      (4L, false, "good mixed junk text")).toDF("doc_id", "is_t", "text")
    val got = TextAnalysis.importanceResample(docs, "doc_id", "text",
        col("is_t"), buckets = 64)
      .select($"doc_id", $"score", $"keep_prob", $"kept")
      .as[(Long, Long, Double, Boolean)].collect()
    val byId = got.map(r => r._1 -> r).toMap
    val hi = got.map(_._2).max
    val lo = got.map(_._2).min
    // p = 1 → floor(p·res) = res > any coin; p = 0 → u < 0 is impossible
    got.filter(_._2 == hi).foreach(r => assert(r._4, s"max-score not kept: $r"))
    got.filter(_._2 == lo).foreach(r => assert(!r._4, s"min-score kept: $r"))
    assert(byId.values.forall(r => r._3 >= 0.0 && r._3 <= 1.0))
    // deterministic: a second run produces the identical decision set
    val again = TextAnalysis.importanceResample(docs, "doc_id", "text",
        col("is_t"), buckets = 64)
      .select($"doc_id", $"kept").as[(Long, Boolean)].collect().toMap
    assert(got.map(r => r._1 -> r._4).toMap === again)
  }

  test("importanceResample: degenerate corpus (all scores equal) keeps all") {
    val docs = Seq((1L, "same text"), (2L, "same text"), (3L, "same text"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.importanceResample(docs, "doc_id", "text",
        lit(true), buckets = 16)
      .select($"kept", $"keep_prob").as[(Boolean, Double)].collect()
    assert(got.forall(r => r._1 && r._2 === 1.0))
  }

  test("bigramLmScore: hand-computed add-one bigram log-probs") {
    // corpus: "a b a b", "a b", "solo" → c(a b)=3, c(b a)=1, contexts
    // c(a·)=3, c(b·)=1, V=3 (a, b, solo — the bigram-less doc still feeds
    // the vocabulary). logp(a b)=round(ln(4/6),4)=-0.4055,
    // logp(b a)=round(ln(2/4),4)=-0.6931
    val docs = Seq(
      (1L, "a b a b"),
      (2L, "a b"),
      (3L, "solo")) // one token → no bigrams → absent from output
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramLmScore(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet === Set(1L, 2L))
    assert(got(1L)._1 === 3L)
    assert(math.abs(got(1L)._2 - (-0.501367)) < 1e-9) // (2·-0.4055 + -0.6931)/3
    assert(got(2L) === ((1L, -0.4055)))
  }

  test("perplexityBuckets: reference-trained LM, zero backoff for unseen grams, tertile cut") {
    // reference slice (ref=true): "a b a b", "a b" → c(a b)=3, c(b a)=1,
    // contexts c(a·)=3, c(b·)=1, V={a,b}=2.
    //   logp(a b) = round(ln(4/5),4)  = -0.2231
    //   logp(b a) = round(ln(2/3),4)  = -0.4055
    // out-of-domain doc "x y" has an unseen bigram AND unseen context:
    //   logp(x y) = round(ln(1/2),4)  = -0.6931  (cb=0, cu=0 backoff)
    // doc 5 "solo" (no bigram) is absent; every present doc is scored
    // against the REFERENCE model even though docs 4/5 are not in it.
    val docs = Seq(
      (1L, "a b a b", true),
      (2L, "a b", true),
      (4L, "x y", false),
      (5L, "solo", false)).toDF("doc_id", "text", "ref")
    val got = TextAnalysis.perplexityBuckets(docs, "doc_id", "text",
        col("ref"), nBuckets = 3)
      .select($"doc_id", $"n_bigrams", $"avg_logp", $"bucket")
      .as[(Long, Long, Double, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet === Set(1L, 2L, 4L))
    assert(got(1L)._1 === 3L)
    assert(math.abs(got(1L)._2 - (-0.283900)) < 1e-9) // (2·-0.2231 + -0.4055)/3
    assert(got(2L)._2 === -0.2231)
    assert(got(4L)._2 === -0.6931)
    // tertile cut on 3 scored docs: one per bucket, ordered by score —
    // the out-of-domain doc lands in the tail, the best fit in the head
    assert(got(4L)._3 === 1)
    assert(got(1L)._3 === 2)
    assert(got(2L)._3 === 3)
  }

  test("temperatureMixture: alpha flattens shares toward uniform; alpha=1 is identity") {
    // strata: en 9 tokens, de 1 → p = 0.9/0.1. alpha=0.5: q ∝ √p →
    // exactly 0.75/0.25 (common factor cancels), weight = q/p
    val docs = Seq(
      ("en", "a b c d e f g h i"),
      ("de", "x")).toDF("lang", "text")
    val half = TextAnalysis.temperatureMixture(docs, "lang", "text", alpha = 0.5)
      .select($"lang", $"p", $"q", $"weight")
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(half("en") === ((0.9, 0.75, 0.833333)))
    assert(half("de") === ((0.1, 0.25, 2.5)))
    val id = TextAnalysis.temperatureMixture(docs, "lang", "text", alpha = 1.0)
      .select($"lang", $"q", $"weight")
      .as[(String, Double, Double)].collect()
    assert(id.forall(r => r._3 === 1.0))
    assert(id.map(r => r._1 -> r._2).toMap === Map("en" -> 0.9, "de" -> 0.1))
  }

  test("tokenBudgetPlan: epochs flag the repeated sources under a " +
      "flattened mixture; alpha=1 implies uniform epochs") {
    // en 9 tokens, de 1 → alpha=0.5 q = 0.75/0.25 (the c17 case). A
    // 100-token target: en needs 75 (epochs 8.333333 of its 9), de needs
    // 25 (epochs 25.0) — the small upweighted stratum multi-epochs first
    val docs = Seq(
      ("en", "a b c d e f g h i"),
      ("de", "x")).toDF("lang", "text")
    val got = TextAnalysis.tokenBudgetPlan(docs, "lang", "text",
        targetTokens = 100L, alpha = 0.5)
      .select($"lang", $"q", $"tokens_needed", $"epochs")
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("en") === ((0.75, 75.0, 8.333333)))
    assert(got("de") === ((0.25, 25.0, 25.0)))
    // natural proportions: every stratum runs the same epoch count T/N
    val nat = TextAnalysis.tokenBudgetPlan(docs, "lang", "text",
        targetTokens = 20L, alpha = 1.0)
      .select($"epochs").as[Double].collect()
    assert(nat.toSet === Set(2.0))
  }

  test("goodTuringMass: hand-counted hapax/dis legomena, empty docs " +
      "contribute nothing") {
    // tokens: a a a b b c d -> N=7, V=4, hapax {c,d}=2, dis {b}=1,
    // unseen = 2/7 = 0.285714
    val docs = Seq(("a a a b"), ("b c d"), (""), ("   "))
      .toDF("text")
    val got = TextAnalysis.goodTuringMass(docs, "text")
      .as[(Long, Long, Long, Long, Double)].head()
    assert(got === ((7L, 4L, 2L, 1L, 0.285714)))
  }

  test("chao1Richness: bias-corrected estimate and coverage on hand counts; " +
      "no-dis-legomena corpus stays finite") {
    // tokens: a a a b b d e -> V=4, hapax {d,e}=2, dis {b}=1,
    // chao1 = 4 + 2*1/(2*2) = 4.5, coverage = 4/4.5 = 0.888889
    val docs = Seq(("a a a b"), ("b d e"), (""), ("   ")).toDF("text")
    val got = TextAnalysis.chao1Richness(docs, "text")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(got === ((4L, 2L, 1L, 4.5, 0.888889)))
    // all-hapax, n2 = 0: the +1 correction keeps it finite
    // chao1 = 2 + 2*1/2 = 3.0, coverage = 2/3
    val hapaxOnly = Seq(("a b")).toDF("text")
    val got2 = TextAnalysis.chao1Richness(hapaxOnly, "text")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(got2 === ((2L, 2L, 0L, 3.0, 0.666667)))
  }

  test("distinctNgramDiversity: hand-counted distinct-1/2/3, degenerate " +
      "docs pin 0, and the plan is map-only (no exchange)") {
    val docs = Seq((1L, "the cat the cat"), (2L, "a b"), (3L, ""), (4L, "x"))
      .toDF("id", "text")
    val df = TextAnalysis.distinctNgramDiversity(docs, "id", "text")
    val got = df.as[(Long, Long, Long, Double, Long, Double, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    // "the cat the cat": bi grams [the cat, cat the, the cat] -> 2/3;
    // tri grams [the cat the, cat the cat] -> 2/2
    assert(got(1L) === ((1L, 4L, 2L, 0.5, 2L, 0.666667, 2L, 1.0)))
    assert(got(2L) === ((2L, 2L, 2L, 1.0, 1L, 1.0, 0L, 0.0)))
    assert(got(3L) === ((3L, 0L, 0L, 0.0, 0L, 0.0, 0L, 0.0)))
    assert(got(4L) === ((4L, 1L, 1L, 1.0, 0L, 0.0, 0L, 0.0)))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("readability: hand-computed Flesch/FK, punctuation-free text clamps " +
      "to one sentence, empty docs pin 0") {
    val docs = Seq(
      (1L, "The cat sat. It ran!"), // 5 words, 2 sentences, 5 vowel runs
      (2L, "hello world"),          // no sentence enders -> clamp to 1
      (3L, ""))
      .toDF("id", "text")
    val got = TextAnalysis.readability(docs, "id", "text")
      .as[(Long, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    // flesch = 206.835 - 1.015*(5/2) - 84.6*(5/5) = 119.6975
    // fk = 0.39*2.5 + 11.8*1 - 15.59 = -2.815
    assert(got(1L) === ((5L, 2L, 5L, 119.6975, -2.815)))
    // 2 words, 3 vowel runs (he-llo: e,o; world: o):
    // flesch = 206.835 - 1.015*2 - 84.6*1.5 = 77.905
    // fk = 0.39*2 + 11.8*1.5 - 15.59 = 2.89
    assert(got(2L) === ((2L, 0L, 3L, 77.905, 2.89)))
    assert(got(3L) === ((0L, 0L, 0L, 0.0, 0.0)))
    val plan = TextAnalysis.readability(docs, "id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("encodingAudit: replacement chars, C0/C1 controls (tab/newline " +
      "excused), and mojibake lead sequences; clean rows flagged") {
    val docs = Seq(
      (1L, "clean text.\nwith a line"),
      (2L, "bad \uFFFD here"),
      (3L, "caf\u00C3\u00A9 and \u00C2 nbsp"), // Latin-1-decoded e-acute, nbsp
      (4L, "a\u0000b\u0007\tok"),              // NUL + BEL, tab excused
      (5L, "don\u00E2\u20AC\u2122t"))          // cp1252-decoded right quote
      .toDF("id", "text")
    val got = TextAnalysis.encodingAudit(docs, "id", "text")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5, r._6))).toMap
    assert(got(1L) === ((0L, 0L, 0L, true)))
    assert(got(2L) === ((1L, 0L, 0L, false)))
    assert(got(3L) === ((0L, 0L, 2L, false)), "both lead bytes counted")
    assert(got(4L) === ((0L, 2L, 0L, false)), "tab is not a violation")
    assert(got(5L) === ((0L, 0L, 1L, false)))
    val plan = TextAnalysis.encodingAudit(docs, "id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("hot-path kernels reproduce the original column formulations bit-for-bit") {
    // the pre-kernel higher-order/regex formulations, inlined verbatim;
    // adversarial corpus: tabs, newlines, multi-byte, empties, dup lines
    val texts = Seq(
      "the cat the cat the cat",
      "  Tabs\tand\nnewlines  mixed\t\tend ",
      "a b a b\nline1\nline1\n  \nLINE1",
      "héllo wörld HÉLLO der die das",
      "", " ", "\n\n", "x",
      "的 是 的 是 不")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val toks = split(regexp_replace(lower(trim($"text")), "\\s+", " "), " ")
    val n = size(toks)
    val bigrams = when(n >= 2,
      zip_with(slice(toks, lit(1), greatest(n - 1, lit(1))),
        slice(toks, lit(2), greatest(n - 1, lit(1))),
        (a, b) => concat(a, lit(" "), b))).otherwise(array())
    val nb = size(bigrams)
    val oldDupB = when(nb > 0,
      round((nb - size(array_distinct(bigrams))).cast("double") / nb, 6))
      .otherwise(lit(0.0))
    val lines = filter(split($"text", "\n"), l => length(trim(l)) > 0)
    val nl = size(lines)
    val oldDupL = when(nl > 0,
      round((nl - size(array_distinct(lines))).cast("double") / nl, 6))
      .otherwise(lit(0.0))
    val oldAlpha = length(regexp_replace($"text", "[^a-zA-Z ]", ""))
    val langs = TextAnalysis.stopwords.toSeq.sortBy(_._1)
    def oldHits(words: Seq[String]) =
      size(filter(toks, t => t.isin(words.map(lit(_)): _*)))
    val (newB, newL) = TextAnalysis.repetitionScores($"text")
    val newHits = graft.functions.GraftFunctions.token_set_hits(
      coalesce($"text", lit("")), langs.map(_._2))
    df.select(
        oldDupB.as("ob"), newB.as("nb2"), oldDupL.as("ol"), newL.as("nl2"),
        oldAlpha.as("oa"),
        graft.functions.GraftFunctions.alpha_space_count($"text").as("na"),
        array(langs.map(l => oldHits(l._2)): _*).as("oh"), newHits.as("nh"))
      .collect().foreach { r =>
        assert(r.getDouble(0) === r.getDouble(1), s"dup_bigram mismatch: $r")
        assert(r.getDouble(2) === r.getDouble(3), s"dup_line mismatch: $r")
        assert(r.getInt(4) === r.getInt(5), s"alpha count mismatch: $r")
        assert(r.getSeq[Int](6) === r.getSeq[Int](7), s"lang hits mismatch: $r")
      }
  }

  test("bottomKSample: KMV keeps the k smallest hashes; small strata report exact counts") {
    val docs = ((1L to 20L).map(i => (i, s"text body $i", "en")) ++
      (26L to 30L).map(i => (i, s"text body $i", "de")))
      .toDF("doc_id", "text", "lang")
    val got = TextAnalysis.bottomKSample(docs, "lang", "doc_id", "text", k = 8)
      .as[(String, Int, Long, Long, Long, Double)].collect()
    val en = got.filter(_._1 == "en").sortBy(_._2)
    assert(en.length === 8)
    assert(en.map(_._2).toSeq === (1 to 8)) // dense ranks
    assert(en.map(_._4).toSeq === en.map(_._4).sorted.toSeq) // h ascending
    // the kept set IS the bottom-8 of the exact per-doc hashes
    val brute = docs.filter($"lang" === "en")
      .select($"doc_id", pmod(TextAnalysis.fingerprint($"text"), lit(1L << 40)))
      .as[(Long, Long)].collect().sortBy(r => (r._2, r._1)).take(8)
    assert(en.map(r => (r._3, r._4)).toSeq === brute.map(r => (r._1, r._2)).toSeq)
    // estimator: full stratum uses (k-1)·R/h_k …
    val hk = en.last._4
    assert(math.abs(en.head._6 -
      math.rint(7.0 * (1L << 40).toDouble / hk * 1000) / 1000) < 1e-9)
    // … under-full stratum reports its exact count
    val de = got.filter(_._1 == "de")
    assert(de.length === 5)
    assert(de.forall(r => r._5 === 5L && r._6 === 5.0))
  }

  test("bottomKSample: a stratum of all-zero hashes clamps h_k to 1 — " +
      "finite estimate, never Infinity (ADVICE r6)") {
    // empty normalized text fingerprints to 0, so 8+ empty docs give
    // h_1..h_k = 0; unclamped, (k-1)·R/h_k would divide by zero
    val docs = (1L to 10L).map(i => (i, "", "en")).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.bottomKSample(docs, "lang", "doc_id", "text", k = 8)
      .as[(String, Int, Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    assert(got.forall(r => !r._6.isInfinity && !r._6.isNaN),
      s"est_distinct not finite: ${got.take(3).toSeq}")
    assert(got.forall(_._6 === 7.0 * (1L << 40).toDouble), // h_k clamped to 1
      s"unexpected estimate: ${got.take(3).toSeq}")
  }

  test("capPerKey: at most N rows per key, kept set is the content-hash " +
      "bottom-N, deterministic under repartitioning") {
    val docs = ((1L to 30L).map(i => (i, s"page body number $i", "big.com")) ++
      (51L to 53L).map(i => (i, s"other text $i", "small.org")))
      .toDF("doc_id", "text", "domain")
    val got = TextAnalysis.capPerKey(docs, "domain", "doc_id", "text", 5)
      .select("doc_id", "text", "domain")
      .as[(Long, String, String)].collect()
    val byKey = got.groupBy(_._3).view.mapValues(_.map(_._1).toSet).toMap
    // under-full key keeps everything; hot key keeps exactly 5
    assert(byKey("small.org") === Set(51L, 52L, 53L))
    assert(byKey("big.com").size === 5)
    // the 5 ARE the bottom-5 by (40-bit fingerprint, id)
    val brute = docs.filter($"domain" === "big.com")
      .select($"doc_id", pmod(TextAnalysis.fingerprint($"text"), lit(1L << 40)))
      .as[(Long, Long)].collect().sortBy(r => (r._2, r._1)).take(5).map(_._1).toSet
    assert(byKey("big.com") === brute)
    // partitioning can't change the kept set
    val re = TextAnalysis.capPerKey(docs.repartition(7), "domain", "doc_id",
        "text", 5)
      .select("doc_id").as[Long].collect().toSet
    assert(re === got.map(_._1).toSet)
    // NULL keys form a capped group like any other (missing domains are
    // routine in crawl data) — a plain EqualTo join would drop them all
    val withNulls = docs.unionByName(
      (81L to 90L).map(i => (i, s"keyless page $i", null: String))
        .toDF("doc_id", "text", "domain"))
    val nullKept = TextAnalysis.capPerKey(withNulls, "domain", "doc_id",
        "text", 5)
      .filter($"domain".isNull).select("doc_id").as[Long].collect()
    assert(nullKept.length === 5, s"null-key group not capped: ${nullKept.toSeq}")
  }

  test("kmvSetOps: under-k sketches report exact set-operation values") {
    // 15 distinct texts, A = first 10, B = last 10, overlap = 5; k = 64
    // exceeds every distinct count, so sketches see everything and the
    // "estimates" must equal the exact counts bit-for-bit
    val rows = (1 to 15).map(i =>
      (i.toLong, s"document number $i with its own distinctive words",
        i <= 10, i >= 6))
    val df = rows.toDF("id", "text", "a", "b")
    val got = TextAnalysis.kmvSetOps(df, "text", $"a", $"b", k = 64)
      .as[(Int, Long, Long, Long, Long, Double, Double, Double, Double, Double)]
      .head()
    assert(got === ((64, 10L, 10L, 15L, 5L, 10.0, 10.0, 15.0,
      0.333333, 5.0))) // jaccard emitted rounded to 6 places
  }

  test("kmvSetOps: an empty slice estimates zero overlap, never NaN") {
    val df = (1 to 8).map(i => (i.toLong, s"text body number $i", true, false))
      .toDF("id", "text", "a", "b")
    val got = TextAnalysis.kmvSetOps(df, "text", $"a", $"b", k = 4)
      .select("est_b", "est_jaccard", "est_intersection")
      .as[(Double, Double, Double)].head()
    assert(got === ((0.0, 0.0, 0.0)))
  }

  test("capPerKey: null-text rows rank as empty text instead of vanishing") {
    // fingerprint(NULL) is NULL, and a null score never enters the bounded
    // heap — without the coalesce, every null-text row would be silently
    // DELETED (not capped) even in an under-cap group
    val docs = Seq((1L, "some body", "x.com"), (2L, null: String, "x.com"),
      (3L, "other body", "x.com")).toDF("doc_id", "text", "domain")
    val kept = TextAnalysis.capPerKey(docs, "domain", "doc_id", "text", 12)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 3L), s"null-text row dropped: $kept")
    // over cap, null text competes as the empty-string hash (0 — the
    // minimum), so it survives the cut deterministically
    val many = ((1L to 20L).map(i => (i, s"page body number $i", "y.com")) ++
      Seq((100L, null: String, "y.com"))).toDF("doc_id", "text", "domain")
    val capped = TextAnalysis.capPerKey(many, "domain", "doc_id", "text", 5)
      .select("doc_id").as[Long].collect().toSet
    assert(capped.size === 5)
    assert(capped.contains(100L), s"null-text row lost the hash-0 slot: $capped")
  }

  test("bpePairCounts: frequency-weighted adjacent pairs, single chars inert") {
    // "abab" x2 docs + "ab" + single-char "a" (no pairs)
    val docs = Seq((1L, "abab ab"), (2L, "abab a")).toDF("doc_id", "text")
    val got = TextAnalysis.bpePairCounts(docs, "text")
      .as[(String, Long)].collect().toMap
    // "abab" freq 2 contributes ab:2, ba:2, ab:2 -> ab 4, ba 2; "ab" adds ab 1
    assert(got == Map("ab" -> 5L, "ba" -> 2L), got)
    // minCount prunes below-threshold pairs
    val pruned = TextAnalysis.bpePairCounts(docs, "text", minCount = 3L)
      .as[(String, Long)].collect().toMap
    assert(pruned == Map("ab" -> 5L), pruned)
  }

  test("bigramLmScore: corpus-typical text outscores shuffled gibberish") {
    val fluent = (1 to 20).map(i => (i.toLong, "the cat sat on the mat"))
    val odd = Seq((100L, "mat the on sat cat the"))
    val got = TextAnalysis.bigramLmScore(
        (fluent ++ odd).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(got(1L) > got(100L))
  }

  test("pmiCollocations: a planted collocation scores above independent " +
      "co-occurrence; counts are exact; rare tail pruned") {
    // 'hong kong' always adjacent (collocation); 'the' pairs freely
    val docs = ((1 to 10).map(i => (i.toLong, "hong kong is the place")) ++
      (11 to 20).map(i => (i.toLong, "the cat saw the dog"))).toDF("doc_id", "text")
    val got = TextAnalysis.pmiCollocations(docs, "text", minPairCount = 2)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // exact counts: 'hong kong' 10 times; 'the cat' 10; 'the place' 10
    assert(got(("hong", "kong"))._1 === 10L)
    // PMI replay: N_uni = 10*5 + 10*5 = 100, N_big = 10*4 + 10*4 = 80
    // hong:10 kong:10 pair:10 -> ln(10*100*100 / (80*10*10))
    val want = math.log(10.0 * 100 * 100 / (80.0 * 10 * 10))
    assert(math.abs(got(("hong", "kong"))._2 -
      BigDecimal(want).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // 'hong kong' (always together) outranks 'the dog' (the is everywhere)
    assert(got(("hong", "kong"))._2 > got(("the", "dog"))._2)
    // a pair seen fewer than minPairCount times is pruned
    val one = TextAnalysis.pmiCollocations(docs, "text", minPairCount = 11)
    assert(one.count() === 0L)
  }

  test("canonicalUrl: scheme/host lowercase, default ports drop, tracking " +
      "params removed, params sort, fragment strips, empty path is /, " +
      "non-URL input nulls") {
    val in = Seq(
      "HTTPS://WWW.Example.COM:443/A/b?utm_source=x&z=1&a=2#frag",
      "http://host.org:8080/p?fbclid=f&b=1",
      "http://host.org:80",
      "https://h.io/path",
      // '?' inside the fragment is NOT a query (the fragment strips
      // first, so nothing survives as query text)
      "http://h.io/p#a?b",
      // userinfo keeps its case; only the host lowercases
      "http://UsEr:Pw@HOST.io/x",
      "not a url").toDF("u")
    val got = in.select(TextAnalysis.canonicalUrl(col("u")).as("c"))
      .as[Option[String]].collect().toSeq
    assert(got === Seq(
      Some("https://www.example.com/A/b?a=2&z=1"),
      Some("http://host.org:8080/p?b=1"),
      Some("http://host.org/"),
      Some("https://h.io/path"),
      Some("http://h.io/p"),
      Some("http://UsEr:Pw@host.io/x"),
      None))
  }

  test("resolveUrl: every RFC 3986 transform-references branch against a " +
      "fixed base; non-absolute base nulls") {
    val base = "http://h.io/a/b/page?bq=1"
    val cases = Seq(
      "https://o.net/x?q#z" -> Some("https://o.net/x?q#z"),
      "//cdn.net/lib.js" -> Some("http://cdn.net/lib.js"),
      "/rooted/x" -> Some("http://h.io/rooted/x"),
      "img/p.png" -> Some("http://h.io/a/b/img/p.png"),
      "../up" -> Some("http://h.io/a/up"),
      "../../up" -> Some("http://h.io/up"),
      "../../../over" -> Some("http://h.io/over"), // excess .. clamps at root
      "./here" -> Some("http://h.io/a/b/here"),
      "?page=2" -> Some("http://h.io/a/b/page?page=2"),
      "#sec" -> Some("http://h.io/a/b/page?bq=1#sec"),
      "" -> Some("http://h.io/a/b/page?bq=1"),
      "g/../h/./i/../j" -> Some("http://h.io/a/b/h/j"),
      "/abs/./x/../y?q#f" -> Some("http://h.io/abs/y?q#f"),
      // RFC oddity coverage: dot-segment-only relative ref
      ".." -> Some("http://h.io/a/"),
      "." -> Some("http://h.io/a/b/"),
      // §5.3: authority-less schemes recompose WITHOUT '//' — gluing
      // '://' on would corrupt them to 'mailto://…'
      "mailto:x@y.org" -> Some("mailto:x@y.org"),
      "javascript:void(0)" -> Some("javascript:void(0)"),
      "tel:+1-816-555-1212" -> Some("tel:+1-816-555-1212"))
    val got = cases.map(_._1).toDF("r")
      .select(TextAnalysis.resolveUrl(lit(base), col("r")).as("t"))
      .as[Option[String]].collect().toSeq
    assert(got === cases.map(_._2), s"got $got")
    val badBase = Seq("relative/base").toDF("b")
      .select(TextAnalysis.resolveUrl(col("b"), lit("x")).as("t"))
      .as[Option[String]].head()
    assert(badBase.isEmpty, "a non-absolute base must resolve to NULL")
  }

  test("distinctiveTerms: hand-computed Dunning G² on a 2-slice corpus, " +
      "zero cells contribute zero, exact-integer direction, minCount gate") {
    // slice A: tokens {x:3, y:1}; slice B: {y:4}
    // ct: x=3 y=5; rt: A=4 B=4; N=8
    val docs = Seq((1L, "A", "x x x y"), (2L, "B", "y y y y"))
      .toDF("doc_id", "lang", "text")
    val got = TextAnalysis.distinctiveTerms(docs, "lang", "text",
        minCount = 1L)
      .as[(String, String, Long, Long, Double, Boolean)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // (A,x): a=3 b=0 c=1 d=4 — the b cell is ZERO (contributes 0):
    // 2·(3·ln2 + 0 + ln(0.4) + 4·ln(1.6)) with per-term round-8
    val t1 = BigDecimal(3.0 * math.log(2.0))
      .setScale(8, BigDecimal.RoundingMode.HALF_UP)
    val t3 = BigDecimal(math.log(0.4))
      .setScale(8, BigDecimal.RoundingMode.HALF_UP)
    val t4 = BigDecimal(4.0 * math.log(1.6))
      .setScale(8, BigDecimal.RoundingMode.HALF_UP)
    val want = BigDecimal(2.0 * (t1 + t3 + t4).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ax = got(("A", "x"))
    assert(ax._3 === 3L && ax._4 === 0L)
    assert(ax._5 === want, s"G² mismatch: ${ax._5} vs $want")
    assert(ax._6, "x concentrates in A — overused")
    // the 2×2 G² is symmetric under transposition: (A,y) and (B,y)
    // carry the SAME statistic, opposite directions
    assert(got(("A", "y"))._5 === want)
    assert(got(("B", "y"))._5 === want)
    assert(!got(("A", "y"))._6 && got(("B", "y"))._6)
    // minCount prunes the (A,y) singleton cell
    val pruned = TextAnalysis.distinctiveTerms(docs, "lang", "text",
        minCount = 3L)
      .as[(String, String, Long, Long, Double, Boolean)].collect()
    assert(pruned.map(r => (r._1, r._2)).toSet ===
      Set(("A", "x"), ("B", "y")))
    intercept[IllegalArgumentException] {
      TextAnalysis.distinctiveTerms(docs, "lang", "text", minCount = 0L)
    }
  }

  test("substringSearch equals the full-scan contains truth: long patterns " +
      "via the trigram index + verify, short ones via the fallback, " +
      "misses absent") {
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "pack my box with five dozen jugs"),
      (3L, "quick boxes everywhere"),
      (4L, "")).toDF("doc_id", "text")
    val pats = Seq("quick b", "box", "zz", "never-there-pattern", "ox")
      .toDF("pattern")
    val got = TextAnalysis.substringSearch(docs, "doc_id", "text",
      pats, "pattern").as[(String, Long)].collect().toSet
    // independent truth: plain contains over the cross product
    val truth = (for {
      (id, text) <- Seq((1L, "the quick brown fox jumps"),
        (2L, "pack my box with five dozen jugs"),
        (3L, "quick boxes everywhere"), (4L, ""))
      p <- Seq("quick b", "box", "zz", "never-there-pattern", "ox")
      if text.contains(p)
    } yield (p, id)).toSet
    assert(got == truth, s"got $got\nwant $truth")
    // sanity on the planted expectations: 'quick b' hits 1 and 3 via the
    // index path, 'ox' (< q) hits 1, 2, 3 via the fallback, 'zz' misses
    assert(truth.contains(("quick b", 1L)) && truth.contains(("quick b", 3L)))
    assert(!truth.exists(_._1 == "zz"))
  }

  test("bpeTrain learns the hand-computed merge sequence with " +
      "deterministic ties, non-overlapping rewrites, and exhaustion stop") {
    import spark.implicits._
    // vocabulary: "aaaa" ×3, "ab" ×2 → pairs r1: (a,a) weight 3·3=9,
    // (a,b) 2 → merge 1 = (a,a,9). Rewrite: "aaaa"→[aa,aa], "ab"→[a,b].
    // r2: (aa,aa) 3, (a,b) 2 → merge 2 = (aa,aa,3). r3: only (a,b) 2 →
    // merge 3 = (a,b,2). r4: no pairs anywhere → training stops early.
    val docs = Seq(Seq.fill(3)("aaaa") ++ Seq.fill(2)("ab"))
      .map(_.mkString(" ")).toDF("text")
    val got = TextAnalysis.bpeTrain(docs, "text", numMerges = 10)
      .as[(Int, String, String, Long)].collect().toList.sortBy(_._1)
    assert(got === List((1, "a", "a", 9L), (2, "aa", "aa", 3L),
      (3, "a", "b", 2L)))
    // tie-break: (x,y) and (y,x)? equal counts resolve by (left, right)
    val tie = Seq("xy yx xy yx").toDF("text")
    val first = TextAnalysis.bpeTrain(tie, "text", numMerges = 1)
      .as[(Int, String, String, Long)].head()
    assert(first === ((1, "x", "y", 2L)))
  }

  test("bpeEncode applies trained merges in rank order: the training " +
      "corpus re-encodes to the trainer's final symbol state") {
    import spark.implicits._
    val docs = Seq((1L, "aaaa aaaa aaaa ab ab"), (2L, "aaab"), (3L, ""))
      .toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs.select("text"), "text", 10)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val got = TextAnalysis.bpeEncode(docs, "doc_id", "text", merges)
      .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // learned merges: (a,a,11), then the (a,b)/(aa,aa) count tie at 3
    // resolves to (a,b) by left-symbol order, then (aa,aa,3), (aa,ab,1)
    // — every word in the training corpus re-encodes to ONE symbol
    assert(merges.map(m => m._1 + "+" + m._2) ===
      Seq("a+a", "a+b", "aa+aa", "aa+ab"))
    assert(got(1L) === ((5L, "aaaa aaaa aaaa ab ab")))
    assert(got(2L) === ((1L, "aaab")))
    assert(got(3L) === ((0L, "")), "empty doc encodes to zero symbols")
  }

  test("unigramLmTrain: hand-computed two-round EM on a tiny corpus — " +
      "seed probs, Viterbi paths, pruning of unused chars, quantized " +
      "log-probs; bad params rejected") {
    import spark.implicits._
    // tokens: ab x3, cd x1. Seed counts: a/b/ab 3 each, c/d/cd 1 each,
    // total 12. q(ab) = round(ln(3/12)*1e6) = -1386294; [ab] beats [a,b]
    // (-1386294 > -2772588), [cd] beats [c,d] — so round 1 counts are
    // ab:3, cd:1 (total 4) and ALL single chars prune away (hard-EM
    // pruning); round 2 re-segments identically under the pruned vocab.
    val docs = Seq("ab ab ab", "cd").toDF("text")
    val got = TextAnalysis.unigramLmTrain(docs, "text", vocabSize = 10,
        numRounds = 2, maxPieceLen = 4, maxWordLen = 20)
      .as[(String, Long, Long)].collect().sortBy(_._1)
    def q(c: Long, tot: Long): Long =
      BigDecimal(math.log(c.toDouble / tot.toDouble) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    assert(got.toSeq === Seq(("ab", 3L, q(3, 4)), ("cd", 1L, q(1, 4))),
      got.toSeq.toString)
    intercept[IllegalArgumentException] {
      TextAnalysis.unigramLmTrain(docs, "text", 0, 1)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.unigramLmTrain(docs, "text", 10, 0)
    }
  }

  test("unigramLmTrain coverage: with all single chars seeded, every " +
      "training word stays segmentable through pruning rounds (piece " +
      "counts bound the word occurrences)") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val docs = (1 to 40).map(_ =>
      (1 to 6).map(_ => "abcde".charAt(rnd.nextInt(5))).mkString)
      .mkString(" ").split(" ").grouped(8).map(_.mkString(" ")).toSeq
      .toDF("text")
    val words = TextAnalysis.tokenCounts(docs, "text")
      .as[(String, Long)].collect()
    val model = TextAnalysis.unigramLmTrain(docs, "text", vocabSize = 20,
        numRounds = 3, maxPieceLen = 3, maxWordLen = 20)
      .as[(String, Long, Long)].collect()
    // every word segments into >= 1 piece per occurrence, and a word
    // shorter than 2*minPiece can't split more than its length
    val totalPieces = model.map(_._2).sum
    val totalWords = words.map(_._2).sum
    assert(totalPieces >= totalWords,
      s"unsegmentable words dropped from EM: $totalPieces < $totalWords")
    // log-probs normalize over the surviving vocab: Σ exp(q/1e6) ≈ 1
    val mass = model.map(m => math.exp(m._3.toDouble / 1e6)).sum
    assert(math.abs(mass - 1.0) < 1e-3, s"prob mass $mass")
  }

  test("unigramEncode round-trip: encode(train corpus) reproduces the " +
      "trainer's final segmentations (piece totals match), pieces emit " +
      "in document order, over-cap words and empty docs emit nothing") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab ab"), (2L, "cd"), (3L, "ab cd"),
      (4L, ""), (5L, "a" * 30)).toDF("doc_id", "text")
    val model = TextAnalysis.unigramLmTrain(docs, "text", vocabSize = 10,
        numRounds = 2, maxPieceLen = 4, maxWordLen = 20)
      .as[(String, Long, Long)].collect()
    val enc = TextAnalysis.unigramEncode(docs, "doc_id", "text",
        model.map(m => (m._1, m._3)).toSeq, maxPieceLen = 4,
        maxWordLen = 20)
      .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    // the trainer counted each word occurrence's best path; encoding the
    // same corpus must produce exactly that many pieces in total
    assert(enc.values.map(_._1).sum === model.map(_._2).sum,
      s"piece totals diverge: $enc vs ${model.toSeq}")
    // document order: "ab cd" must emit [ab, cd], not [cd, ab]
    assert(enc(3L) === ((2L, "ab cd")), enc(3L).toString)
    assert(enc(4L) === ((0L, "")), "empty doc encodes to zero pieces")
    assert(enc(5L) === ((0L, "")),
      "an over-cap word sits outside trained coverage and emits nothing")
  }

  test("unigram Viterbi kernel: max-score segmentation equals brute-force " +
      "enumeration (exact integer scores), empty/uncoverable words yield " +
      "the empty array") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    // random vocab over {a,b}: all chars + random multi pieces
    val vocab = Seq("a" -> -100000L, "b" -> -150000L) ++
      Seq("aa", "ab", "ba", "aab", "bba", "abab")
        .map(p => p -> (-50000L - rnd.nextInt(200000).toLong))
    val words = (1 to 60).map(_ =>
      (1 to (3 + rnd.nextInt(6))).map(_ => "ab".charAt(rnd.nextInt(2)))
        .mkString) :+ "xzq" :+ ""
    val got = words.toDF("w")
      .select(col("w"), graft.functions.GraftFunctions.unigram_viterbi(
        col("w"), vocab, 4).as("pieces"))
      .as[(String, Seq[String])].collect().toMap
    val table = vocab.toMap
    def allSegs(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to math.min(4, w.length)).flatMap { t =>
        val p = w.take(t)
        if (table.contains(p)) allSegs(w.drop(t)).map(p +: _)
        else Seq.empty
      }
    words.filter(w => w.nonEmpty && !w.contains('x')).foreach { w =>
      val best = allSegs(w).map(seg => seg.map(table).sum).max
      val gotScore = got(w).map(table).sum
      assert(got(w).mkString === w, s"$w: pieces must tile the word")
      assert(gotScore === best,
        s"$w: kernel score $gotScore != brute force $best")
    }
    assert(got("xzq") === Seq.empty, "uncoverable word yields empty")
    assert(got("") === Seq.empty, "empty word yields empty")
  }

  test("gopherRules: each rule trips on its planted violation, clean " +
      "prose passes all, and boundary ratios sit on the integer fence") {
    import spark.implicits._
    val clean = ("the quick brown fox jumps over the lazy dog and then " +
      "rests with some other animals that have gathered to watch it " +
      "leap again and again through the long afternoon be that as it may " +
      "nobody minded of course") // 40 words... pad to >= 50
    val cleanDoc = clean + " " + clean.split(" ").take(15).mkString(" ")
    val docs = Seq(
      (1L, cleanDoc),
      (2L, "short text"),                                  // word count
      (3L, Seq.fill(60)("a").mkString(" ")),               // mean word len < 3
      (4L, Seq.fill(60)("####word").mkString(" ")),        // symbols + alpha
      (5L, (1 to 60).map(_ => "12345").mkString(" ")),     // no alpha, no stop
      (6L, (1 to 60).map(i => s"- bullet line $i\n").mkString + "the be to of")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5),
          r.getBoolean(6), r.getBoolean(7), r.getBoolean(8),
          r.getBoolean(9))).toMap
    assert(got(1L)._8, s"clean doc must pass everything: ${got(1L)}")
    assert(!got(2L)._1, "short doc fails word count")
    assert(!got(3L)._2, "single-char words fail mean word length")
    assert(!got(4L)._3, "hash-heavy doc fails symbol ratio")
    assert(!got(5L)._4 && !got(5L)._5, "digit words fail alpha + stopwords")
    assert(!got(6L)._6, "bullet-dominated doc fails the bullet-line rule")
  }

  test("knBigramLmScore equals the driver-side Kneser-Ney replay; the " +
      "model is a proper distribution; versatile words beat " +
      "frequent-but-rigid ones as continuations") {
    import spark.implicits._
    val docs = Seq(
      (1L, "san francisco is big"),
      (2L, "san francisco is old"),
      (3L, "the city is big"),
      (4L, "the city is old"),
      (5L, "big is not old")).toDF("doc_id", "text")
    // driver replay with identical arithmetic
    val words = Seq("san francisco is big", "san francisco is old",
      "the city is big", "the city is old", "big is not old")
      .map(_.split(" ").toSeq)
    val bigrams = words.flatMap(ws => ws.zip(ws.tail))
    val cb = bigrams.groupBy(identity).map { case (k, v) => k -> v.size }
    val cu = bigrams.groupBy(_._1).map { case (k, v) => k -> v.size }
    val n1f = cb.keys.toSeq.groupBy(_._1).map { case (k, v) => k -> v.size }
    val n1b = cb.keys.toSeq.groupBy(_._2).map { case (k, v) => k -> v.size }
    val bt = cb.size.toDouble
    // the GENERAL interpolated form (max clips unseen pairs to backoff
    // only); the operator scores the training corpus, where c >= 1 and
    // the max is vacuous — exactly its documented contract
    def p(w1: String, w2: String): Double =
      math.max(cb.getOrElse((w1, w2), 0).toDouble - 0.75, 0.0) / cu(w1).toDouble +
        (0.75 * n1f(w1).toDouble / cu(w1).toDouble) *
          (n1b.getOrElse(w2, 0).toDouble / bt)
    val want = words.zipWithIndex.map { case (ws, i) =>
      val lps = ws.zip(ws.tail).map { case (a, b) =>
        BigDecimal(math.log(p(a, b)))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP) }
      (i + 1L, ws.size.toLong - 1,
        BigDecimal(lps.sum.toDouble / lps.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    val got = TextAnalysis.knBigramLmScore(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    assert(got === want)
    // proper distribution: over the FULL vocabulary, each context's
    // probabilities sum to exactly 1 (the interpolated-KN identity)
    val vocab = words.flatten.distinct
    cu.keys.foreach { w1 =>
      val total = vocab.map(p(w1, _)).sum
      assert(math.abs(total - 1.0) < 1e-9, s"context $w1 sums to $total")
    }
    // the KN insight: "francisco" is as frequent as "city" (2 each) but
    // follows ONLY "san" — as a continuation of an unrelated context it
    // must score below the versatile "old" (3 distinct histories)
    assert(p("is", "francisco") < p("is", "old"))
  }

  test("property: gopherRules flags equal the integer-arithmetic replay " +
      "on random noisy documents") {
    import spark.implicits._
    val rnd = new scala.util.Random(71)
    val pool = Array("the", "be", "to", "of", "and", "fox", "dog", "12345",
      "####", "run", "...", "a", "supercalifragilistic")
    val docs = (0 until 60).map { i =>
      val n = rnd.nextInt(120)
      val words = (0 until n).map(_ => pool(rnd.nextInt(pool.length)))
      val body = words.mkString(" ")
      val lines = if (rnd.nextBoolean()) body.split(" ").grouped(5)
        .map(g => (if (rnd.nextInt(3) == 0) "- " else "") + g.mkString(" "))
        .mkString("\n") else body
      (i.toLong, lines)
    }
    val got = TextAnalysis.gopherRules(docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (2 to 9).map(r.getBoolean)).toMap
    val probe = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    docs.foreach { case (id, text) =>
      val norm = text.toLowerCase.trim.replaceAll("\\s+", " ")
      val ws = norm.split(" ").filter(_.nonEmpty)
      val nW = ws.length.toLong
      val sumLen = ws.map(_.length.toLong).sum
      val hashes = text.count(_ == '#').toLong
      val ell = (text.length - text.replace("...", "").length) / 3L
      val alpha = ws.count(_.exists(c => c >= 'a' && c <= 'z')).toLong
      val stops = probe.count(ws.contains).toLong
      val lines = text.split("\n").map(_.trim).filter(_.nonEmpty)
      val nL = lines.length.toLong
      val bullets = lines.count(l => "-*•".contains(l.head)).toLong
      val ellEnd = lines.count(_.endsWith("...")).toLong
      val want = Seq(
        nW >= 50 && nW <= 100000,
        3 * nW <= sumLen && sumLen <= 10 * nW,
        10 * (hashes + ell) <= nW,
        10 * alpha >= 8 * nW,
        stops >= 2,
        10 * bullets <= 9 * nL,
        10 * ellEnd <= 3 * nL)
      assert(got(id).take(7) === want, s"doc $id: '$text'")
      assert(got(id)(7) === want.forall(identity), s"keep of doc $id")
    }
  }

  test("property: bpeTrain equals the driver-side census/argmax/fold " +
      "replay on random small-alphabet corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(67)
    val words = (0 until 120).map(_ =>
      (0 until (1 + rnd.nextInt(6))).map(_ => ('a' + rnd.nextInt(3)).toChar)
        .mkString)
    val docs = words.grouped(12).map(_.mkString(" ")).toSeq.toDF("text")
    val got = TextAnalysis.bpeTrain(docs, "text", numMerges = 4)
      .as[(Int, String, String, Long)].collect().toList.sortBy(_._1)
    // replay with identical rules
    var vocab: Map[List[String], Long] = words.groupBy(identity)
      .map { case (w, o) => w.toList.map(_.toString) -> o.size.toLong }
    val merges = List.newBuilder[(Int, String, String, Long)]
    var r = 1
    var done = false
    while (r <= 4 && !done) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        syms.zip(syms.drop(1)).foreach(p =>
          pairs(p) = pairs.getOrElse(p, 0L) + n)
      }
      if (pairs.isEmpty) done = true
      else {
        val ((a, b), c) = pairs.toSeq
          .sortBy { case ((x, y), n) => (-n, x, y) }.head
        merges += ((r, a, b, c))
        vocab = vocab.map { case (syms, n) =>
          val acc = scala.collection.mutable.ListBuffer.empty[String]
          syms.foreach { s =>
            if (acc.nonEmpty && acc.last == a && s == b) {
              acc.remove(acc.size - 1); acc += (a + b)
            } else acc += s
          }
          acc.toList -> n
        }
        r += 1
      }
    }
    assert(got === merges.result())
  }

  test("bpeEncode kernel reproduces the higher-order fold formulation " +
      "bit-for-bit, including unicode, ties and whitespace edges") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaaa aaab ab ba"),
      (2L, "  Mixed   CASE\twith \n whitespace  "),
      (3L, "中文 文本 中中文"),
      (4L, ""),
      (5L, "single")).toDF("doc_id", "text")
    val merges = Seq(("a", "a"), ("aa", "aa"), ("a", "b"), ("中", "文"))
    val fast = TextAnalysis.bpeEncode(docs, "doc_id", "text", merges)
      .as[(Long, Long, String)].collect().toSet
    val slow = TextAnalysis.bpeEncodeReference(docs, "doc_id", "text", merges)
      .as[(Long, Long, String)].collect().toSet
    assert(fast === slow)
  }

  test("zipfFit equals the exact integer-scaled OLS replayed in Scala, " +
      "and a perfect power law fits with slope -1") {
    import spark.implicits._
    // corpus with known counts: token w_i appears ceil(64 / i) times
    val counts = (1 to 30).map(i => f"w$i%02d" -> (64 + i - 1) / i)
    val docs = counts.flatMap { case (w, c) => Seq.fill(c)(w) }
      .grouped(17).map(_.mkString(" ")).toSeq.toDF("text")
    val got = TextAnalysis.zipfFit(docs, "text", topN = 30)
      .as[(Long, Double, Double)].head()
    // replay: ranks follow (count DESC, token ASC)
    val ranked = counts.sortBy { case (w, c) => (-c, w) }.map(_._2)
    val xs = ranked.indices.map(i => math.round(math.log(i + 1.0) * 1e6))
    val ys = ranked.map(c => math.round(math.log(c.toDouble) * 1e6))
    val n = ranked.size.toLong
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val num = (BigInt(n) * sxy - BigInt(sx) * sy).toDouble
    val den = (BigInt(n) * sxx - BigInt(sx) * sx).toDouble
    val slope = num / den
    val intercept = (sy.toDouble - slope * sx.toDouble) / (n.toDouble * 1e6)
    assert(got._1 === n)
    assert(got._2 === BigDecimal(slope).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got._3 === BigDecimal(intercept).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // ceil(64/i) is close to a perfect 1/i law: slope must sit near -1
    assert(got._2 < -0.8 && got._2 > -1.2)
  }

  test("zipfFit: topN truncates the rank range and the tiny-vocab edge " +
      "still fits") {
    import spark.implicits._
    val docs = Seq("aa aa aa bb bb cc").toDF("text")
    val got = TextAnalysis.zipfFit(docs, "text", topN = 2)
      .as[(Long, Double, Double)].head()
    assert(got._1 === 2L)
    // two points: slope = (y2-y1)/(x2-x1) exactly
    val x = Seq(1.0, 2.0).map(v => math.round(math.log(v) * 1e6))
    val y = Seq(3.0, 2.0).map(v => math.round(math.log(v) * 1e6))
    val s = (y(1) - y(0)).toDouble / (x(1) - x(0)).toDouble
    assert(math.abs(got._2 - s) < 1e-6)
  }

  test("phraseHits: word boundaries, overlapping occurrences, mixed phrase " +
      "lengths, short/degenerate docs, zero-hit phrases absent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Table  SCAN now and table scan later"),
      (2L, "x batch batch batch y"),
      (3L, "portable scanner is not a table scanner"),
      (4L, "tiny"),
      (5L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.phraseHits(docs, "doc_id", "text",
        Seq("table scan", "batch batch", "batch batch batch", "no such phrase"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got === Map(
      (1L, "table scan") -> 2L,
      (2L, "batch batch") -> 2L, // overlapping windows both count
      (2L, "batch batch batch") -> 1L))
    val plan = TextAnalysis.phraseHits(docs, "doc_id", "text",
        Seq("table scan", "batch batch batch"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("Window") && !plan.contains("Cartesian"), plan)
  }

  test("phraseHits returns the CALLER'S phrase string, not the normalized " +
      "form, so join-back against the input list works (ADVICE r10)") {
    import spark.implicits._
    val docs = Seq((1L, "a table scan runs here")).toDF("doc_id", "text")
    val got = TextAnalysis.phraseHits(docs, "doc_id", "text",
        Seq("Table  Scan"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, "Table  Scan", 1L)),
      s"the original unnormalized phrase must come back verbatim: ${got.toSeq}")
  }

  test("temperatureSensitivity: each swept slice equals the single-alpha " +
      "planner, and lowering alpha flattens the dominant share") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "a b c d e f g h i j k l m n o p"),
      (2L, "en", "a b c d e f g h"),
      (3L, "fr", "x y z w"),
      (4L, "de", "u v")).toDF("doc_id", "lang", "text")
    val curve = TextAnalysis.temperatureSensitivity(docs, "lang", "text",
        targetTokens = 1000L, alphas = Seq(0.3, 1.0))
      .as[(Double, String, Long, Long, Double, Double, Double)].collect()
    def slice(a: Double) = curve.filter(_._1 == a)
      .map(r => (r._2, r._3, r._4, r._5, r._6, r._7)).toSet
    def single(a: Double) = TextAnalysis.tokenBudgetPlan(docs, "lang",
        "text", targetTokens = 1000L, alpha = a)
      .as[(String, Long, Long, Double, Double, Double)].collect().toSet
    assert(slice(0.3) === single(0.3), "alpha 0.3 slice != single-alpha plan")
    assert(slice(1.0) === single(1.0), "alpha 1.0 slice != single-alpha plan")
    // flattening: the dominant stratum's share shrinks as alpha drops
    def qOf(a: Double, lang: String) =
      curve.find(r => r._1 == a && r._2 == lang).get._5
    assert(qOf(0.3, "en") < qOf(1.0, "en"),
      "lower temperature must flatten the dominant share")
    assert(qOf(0.3, "de") > qOf(1.0, "de"),
      "lower temperature must lift the rare share")
  }

  test("bm25TopK: hand-computed ranking, df cap drops ubiquitous terms, " +
      "ties break by id") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana cherry"),
      (2L, "apple apple durian"),
      (3L, "banana banana banana"),
      (4L, "unique quince zebra")).toDF("doc_id", "text")
    val q = Seq((10L, "apple banana"), (20L, "quince")).toDF("qid", "qtext")
    val out = TextAnalysis.bm25TopK(docs, q, "doc_id", "text", "qid", "qtext",
        k = 5, maxDfFrac = 1.0)
      .as[(Long, Long, Int, Double)].collect()
    // N=4, avgdl=3; df(apple)=df(banana)=2 => idf=ln(2); tf=1 & dl=3 =>
    // tfn=1 exactly, so d1 scores 2·ln2 ≈ 1.386294; tf=3 => 7.5/4.5·ln2
    // ≈ 1.155245 (d3); tf=2 => 5/3.5·ln2 ≈ 0.990210 (d2)
    val q10 = out.filter(_._1 == 10L).sortBy(_._3)
    assert(q10.map(_._2).toSeq === Seq(1L, 3L, 2L), s"ranking: ${q10.toSeq}")
    assert(math.abs(q10.head._4 - 2 * math.log(2)) < 1e-6)
    // rare-term query hits only its doc
    val q20 = out.filter(_._1 == 20L)
    assert(q20.map(_._2).toSeq === Seq(4L))
    // df cap 0.25 (df <= 1): apple/banana (df=2) drop from scoring, so
    // query 10 has no scorable term and vanishes; quince (df=1) survives
    val capped = TextAnalysis.bm25TopK(docs, q, "doc_id", "text", "qid",
        "qtext", k = 5, maxDfFrac = 0.25)
      .as[(Long, Long, Int, Double)].collect()
    assert(capped.filter(_._1 == 10L).isEmpty)
    assert(capped.filter(_._1 == 20L).map(_._2).toSeq === Seq(4L))
    // identical docs score identically; the lower id takes the lower rank
    val twins = Seq((7L, "pear kiwi"), (5L, "pear kiwi"), (9L, "fig"))
      .toDF("doc_id", "text")
    val tq = Seq((1L, "pear")).toDF("qid", "qtext")
    val t2 = TextAnalysis.bm25TopK(twins, tq, "doc_id", "text", "qid",
        "qtext", k = 5, maxDfFrac = 1.0)
      .as[(Long, Long, Int, Double)].collect().sortBy(_._3)
    assert(t2.map(_._2).toSeq === Seq(5L, 7L))
    assert(t2(0)._4 === t2(1)._4)
  }

  test("naiveBayesTrain: hand-computed smoothed log-probs over a 2-class corpus") {
    val docs = Seq(
      ("spam", "buy now buy"), ("spam", "buy cheap"),
      ("ham", "hello friend")).toDF("label", "text")
    val got = TextAnalysis.naiveBayesTrain(docs, "text", "label")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // vocab = {buy, now, cheap, hello, friend} -> V = 5
    // spam totals: 5 tokens; ham: 2
    def lp(cnt: Long, nc: Long) = BigDecimal(math.log((cnt + 1.0) / (nc + 5.0)))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(("spam", "buy")) === ((3L, lp(3, 5))))
    assert(got(("spam", "now")) === ((1L, lp(1, 5))))
    assert(got(("ham", "hello")) === ((1L, lp(1, 2))))
    // only observed (class, token) pairs appear in the model frame
    assert(!got.contains(("ham", "buy")))
    assert(got.size === 5)
  }

  test("naiveBayesClassify: marker docs classify right; unseen tokens fall back; ties break to smallest label") {
    // classes have EQUAL token totals (7 each) and EQUAL doc counts so
    // the all-unseen doc ties exactly (same floors, same priors)
    val train = Seq(
      (1L, "aa", "buy now buy cheap"), (2L, "aa", "buy cheap now"),
      (3L, "bb", "hello friend hello friend"),
      (4L, "bb", "friend hello hello")).toDF("doc_id", "label", "text")
    val test = Seq(
      (10L, "buy buy cheap"),          // spam-shaped -> aa
      (11L, "hello friend"),           // ham-shaped -> bb
      (12L, "zzz qqq")).toDF("doc_id", "text") // all-unseen: equal floors +
    // equal priors -> per-class scores tie exactly, MIN(label) wins
    val got = TextAnalysis.naiveBayesClassify(train, test, "doc_id", "text", "label")
      .as[(Long, String, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(got(10L) === "aa")
    assert(got(11L) === "bb")
    assert(got(12L) === "aa")
    // one verdict per test doc, even for the tie
    assert(got.size === 3)
  }

  test("naiveBayesClassify: zero-token test doc gets the prior-only argmax") {
    val train = Seq(
      (1L, "big", "x y"), (2L, "big", "x z"), (3L, "big", "y z"),
      (4L, "sml", "x q")).toDF("doc_id", "label", "text")
    val test = Seq((20L, "   ")).toDF("doc_id", "text")
    val got = TextAnalysis.naiveBayesClassify(train, test, "doc_id", "text", "label")
      .as[(Long, String, Double)].collect()
    assert(got.length === 1)
    // prior(big) = ln(3/4) > prior(sml) = ln(1/4); score is the prior alone
    assert(got.head._1 === 20L && got.head._2 === "big")
    val want = BigDecimal(math.log(3.0 / 4.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.head._3 === want)
  }

  test("naiveBayesCrossVal equals k explicit retrains (the subtraction " +
      "IS leave-one-fold-out training)") {
    val docs = Seq(
      (0L, "aa", "buy now buy"), (1L, "bb", "hello friend"),
      (2L, "aa", "buy cheap now"), (3L, "bb", "friend hello there"),
      (4L, "aa", "cheap buy"), (5L, "bb", "hello there friend"),
      (6L, "aa", "now now buy"), (7L, "bb", "   ")).toDF("doc_id", "label", "text")
    val cv = TextAnalysis.naiveBayesCrossVal(docs, "doc_id", "text", "label",
        numFolds = 2)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // explicit baseline: train on the complement, classify the fold
    val explicit = (0 until 2).map { f =>
      val train = docs.filter(col("doc_id") % 2 =!= f)
      val test = docs.filter(col("doc_id") % 2 === f)
      val pred = TextAnalysis.naiveBayesClassify(train, test,
        "doc_id", "text", "label").select(col("doc_id"), col("predicted"))
      val joined = test.select(col("doc_id"), col("label")).join(pred, "doc_id")
      val n = joined.count()
      val correct = joined.filter(col("predicted") === col("label")).count()
      f.toLong -> ((n, correct))
    }.toMap
    assert(cv(0L) === explicit(0L), s"fold 0: cv=${cv(0L)} explicit=${explicit(0L)}")
    assert(cv(1L) === explicit(1L), s"fold 1: cv=${cv(1L)} explicit=${explicit(1L)}")
    assert(cv(-1L) === ((explicit(0L)._1 + explicit(1L)._1,
      explicit(0L)._2 + explicit(1L)._2)))
  }

  test("lr_buckets kernel is bit-identical to the poly_hash64(md5) column formulation") {
    import graft.functions.GraftFunctions.{lr_buckets, poly_hash64}
    val docs = Seq((1L, "The quick   brown fox fox jumps high"),
      (2L, "unicode töken ünïque 漢字 mixed"), (3L, "")).toDF("id", "text")
    val viaKernel = docs.select($"id",
        explode(lr_buckets(Dedup.normalized($"text"), 64)).as("b"))
      .as[(Long, Int)].collect().toSet
    val viaColumns = docs.select($"id",
        explode(TextAnalysis.tokens(Dedup.normalized($"text"))).as("t"))
      .filter(length($"t") > 0)
      .select($"id", poly_hash64(md5($"t")).bitwiseAND(lit(63L)).cast("int").as("b"))
      .distinct().as[(Long, Int)].collect().toSet
    assert(viaKernel === viaColumns)
  }

  test("lrFeatures: binary bucket presence + the bias row; zero-token doc carries bias only") {
    val docs = Seq(
      (1L, 1, "aa bb aa aa"),   // repeated token: presence, not tf
      (2L, 0, "    ")).toDF("doc_id", "y", "text")
    val feat = TextAnalysis.lrFeatures(docs, "doc_id", $"y", "text", 16)
      .as[(Long, Int, Int, Double)].collect().sortBy(r => (r._1, r._3))
    // doc 1: two distinct token buckets (aa, bb hash apart at dim 16 on
    // this fixture) + bias; doc 2: bias alone
    val d1 = feat.filter(_._1 == 1L)
    val d2 = feat.filter(_._1 == 2L)
    assert(d2.toSeq === Seq((2L, 0, -1, 1.0)))
    assert(d1.count(_._3 == -1) === 1)
    assert(d1.forall(_._4 == 1.0))
    assert(d1.length === 3, s"expected 2 token buckets + bias, got ${d1.toSeq}")
  }

  test("logRegFit: one gradient round replays the hand-computed update") {
    // synthetic feature frame (bypasses hashing): doc 1 (y=1) lights
    // bucket 0, doc 2 (y=0) lights bucket 1, both carry the bias (-1).
    // Round 1 from w=0: every margin is 0, sigma = 0.5, so g = +-0.5;
    // grad(b0) = -0.5, grad(b1) = +0.5, grad(bias) = 0; with eta=1, N=2:
    // w(b0) = +0.25, w(b1) = -0.25, bias = 0.
    val feat = Seq(
      (1L, 1, 0, 1.0), (1L, 1, -1, 1.0),
      (2L, 0, 1, 1.0), (2L, 0, -1, 1.0)).toDF("doc_id", "y", "bucket", "x")
    val w = TextAnalysis.logRegFit(feat, "doc_id", dim = 2, rounds = 1, eta = 1.0)
      .as[(Int, java.math.BigDecimal)].collect()
      .map(r => r._1 -> BigDecimal(r._2)).toMap
    assert(w(-1) === BigDecimal("0.000000000"))
    assert(w(0) === BigDecimal("0.250000000"))
    assert(w(1) === BigDecimal("-0.250000000"))
  }

  test("logRegFit is replayable: two runs produce bit-identical weights") {
    val docs = Seq(
      (1L, 1, "ppp aa bb"), (2L, 1, "ppp bb cc"), (3L, 0, "nnn aa cc"),
      (4L, 0, "nnn bb aa")).toDF("doc_id", "y", "text")
    def weights() = TextAnalysis.logRegTrain(docs, "doc_id", "text", $"y",
        dim = 32, rounds = 4, eta = 5.0)
      .as[(Int, java.math.BigDecimal)].collect().sortBy(_._1).toSeq
    assert(weights() === weights())
  }

  test("logRegClassify: learns a planted marker; zero-token doc scores on the bias") {
    val train = (1L to 12L).map { i =>
      val pos = i % 2 == 0
      (i, if (pos) 1 else 0,
        s"shared tok${i % 3} " + (if (pos) "mkpos" else "mkneg"))
    }.toDF("doc_id", "y", "text")
    val test = Seq(
      (100L, "shared tok1 mkpos"), (101L, "shared tok2 mkneg"),
      (102L, "   ")).toDF("doc_id", "text")
    val got = TextAnalysis.logRegClassify(train, test, "doc_id", "text", $"y")
      .as[(Long, Int, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(100L)._1 === 1)
    assert(got(101L)._1 === 0)
    // every test doc gets a verdict, the blank one on the bias feature
    assert(got.contains(102L) && got.size === 3)
    // scores are valid round-6 sigmoids, ordered with the verdicts
    assert(got(100L)._2 > 0.5 && got(101L)._2 < 0.5)
  }

  test("bleuPairs: hand-computed clipping, brevity penalty and zero-guard") {
    def r9(x: Double) = new java.math.BigDecimal(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    def r6(x: Double) = new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val pairs = Seq(
      // exact copy: every p_n = 1, bp = 1, bleu = 1
      (1L, "a b c d e", "a b c d e"),
      // clipping: cand repeats 'a' 4x, ref has 2 -> p1 = min(4,2)/4 = 0.5;
      // no shared bigram+ -> p2..p4 = 0 -> bleu = 0
      (2L, "a a a a", "a b a c"),
      // short candidate: p_n = 1 for its grams, bp = exp(1 - 5/3)
      (3L, "a b c", "a b c d e")).toDF("pair_id", "cand", "ref")
    val got = TextAnalysis.bleuPairs(pairs, "pair_id", "cand", "ref")
      .as[(Long, Double, Double, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0)))
    assert(got(2L)._2 === 0.5 && got(2L)._5 === 0.0 && got(2L)._7 === 0.0)
    // pair 3: p1..p3 = 1 over its own grams; n=4: whole-text gram,
    // 'a b c' != any ref 4-gram -> p4 = 0 -> bleu 0? No: the SHORT-INPUT
    // rule hashes the whole cand text as the one 4-gram, and the ref has
    // 4-grams 'a b c d','b c d e' -> no match -> p4 = 0 -> bleu = 0
    assert(got(3L)._2 === 1.0 && got(3L)._4 === 1.0)
    assert(got(3L)._6 === r6(math.exp(1.0 - 5.0 / 3.0)))
    assert(got(3L)._7 === 0.0)
    // a 4-gram-capable near-copy carries the full geometric mean
    val p2 = Seq((9L, "a b c d e x", "a b c d e y"))
      .toDF("pair_id", "cand", "ref")
    val g9 = TextAnalysis.bleuPairs(p2, "pair_id", "cand", "ref")
      .as[(Long, Double, Double, Double, Double, Double, Double)].head()
    // p1 = 5/6, p2 = 4/5, p3 = 3/4, p4 = 2/3, bp = 1 (equal length)
    val want = r6(math.exp((r9(math.log(5.0 / 6.0)) + r9(math.log(4.0 / 5.0)) +
      r9(math.log(3.0 / 4.0)) + r9(math.log(2.0 / 3.0))) / 4.0))
    assert(g9._7 === want)
  }

  test("chrfPairs: hand-computed per-n precision/recall means and the " +
      "beta=2 F-score; identical pair scores 1") {
    def r9(x: Double) = new java.math.BigDecimal(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    def r6(x: Double) = new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val pairs = Seq(
      (1L, "abc", "abc"),
      // cand 'aa' vs ref 'ab' at maxN=2:
      // n=1: cand {a:2}, ref {a:1,b:1} -> m=1, P1=1/2, R1=1/2
      // n=2: cand {aa}, ref {ab} -> m=0, P2=0, R2=0
      (2L, "aa", "ab")).toDF("pair_id", "cand", "ref")
    val got = TextAnalysis.chrfPairs(pairs, "pair_id", "cand", "ref",
        maxN = 2, beta = 2.0)
      .as[(Long, Double, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 1.0, 1.0, 1.0)))
    val p = (r9(0.5) + r9(0.0)) / 2.0
    val r = (r9(0.5) + r9(0.0)) / 2.0
    assert(got(2L)._2 === r6(p) && got(2L)._3 === r6(r))
    assert(got(2L)._4 === r6(5.0 * p * r / (4.0 * p + r)))
    // total miss -> 0-guard
    val miss = TextAnalysis.chrfPairs(
        Seq((3L, "xyz", "abc")).toDF("pair_id", "cand", "ref"),
        "pair_id", "cand", "ref", maxN = 2)
      .as[(Long, Double, Double, Double)].head()
    assert(miss._4 === 0.0)
  }
}
