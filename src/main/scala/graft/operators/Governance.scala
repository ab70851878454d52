package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data-governance operators: GDPR/CCPA-style erasure propagation across a
 * relational schema. The reference migrator moves rows between tables
 * (`MigrateTableTask.java:280-367`); the inverse operation a production
 * deployment needs — "delete this subject EVERYWHERE, and prove it" — is
 * the same table surface walked with anti/semi joins instead of copies.
 */
object Governance {

  /** One table in an erasure cascade: rows of `df` are purged when their
    * `fkCol` matches a purged key of `parent` (the root table's name or
    * an earlier entry's `name` — declare parents first); `keyCol` is this
    * table's own primary key, feeding any downstream child.
    */
  final case class CascadeTable(name: String, df: DataFrame, keyCol: String,
      parent: String, fkCol: String)

  /** Right-to-be-forgotten audit: given the erasure `subjects` (their
    * root keys) and a parent-first cascade over the schema, report per
    * table how many rows the erasure purges and how many survive —
    * the pre-flight a deletion job runs before issuing deletes, and the
    * post-hoc compliance evidence afterwards.
    *
    * Output: one row per table — (table_name, n_purged, n_retained),
    * root first, then `children` in declaration order.
    *
    * Plan shape (100 TB posture): the subject list broadcasts (erasure
    * batches are human-scale; set `broadcastSubjects = false` for bulk
    * purges and the root semi-join shuffles on the key instead); each
    * cascade level's purged-key frame is a SKINNY key-only projection of
    * a left-semi join — payload columns never move; every table is
    * scanned once for its semi-join and once for its total count (both
    * count-only aggregates, map-side combined). No window, no cartesian
    * beyond the two 1-row count attaches per table.
    */
  def erasureCascade(subjects: DataFrame, subjectKeyCol: String,
      rootName: String, root: DataFrame, rootKeyCol: String,
      children: Seq[CascadeTable],
      broadcastSubjects: Boolean = true): DataFrame = {
    val declared = rootName +: children.map(_.name)
    require(declared.distinct.size == declared.size,
      s"cascade table names must be unique, got $declared")
    children.zipWithIndex.foreach { case (c, i) =>
      require(declared.take(i + 1).contains(c.parent),
        s"table ${c.name} references parent ${c.parent} not declared before it")
    }
    val subj0 = subjects.select(col(subjectKeyCol).as(rootKeyCol)).distinct()
    val subj = if (broadcastSubjects) broadcast(subj0) else subj0
    val rootPurged = root.join(subj, Seq(rootKeyCol), "left_semi")
    var purgedKeys = Map(
      rootName -> rootPurged.select(col(rootKeyCol).as("__k")).distinct())
    var out = summarize(rootName, root, rootPurged)
    for (c <- children) {
      val parentKeys = purgedKeys(c.parent)
      val purged = c.df.join(
        parentKeys.select(col("__k").as(c.fkCol)), Seq(c.fkCol), "left_semi")
      purgedKeys += c.name -> purged.select(col(c.keyCol).as("__k")).distinct()
      out = out.unionByName(summarize(c.name, c.df, purged))
    }
    out
  }

  /** k-anonymity / l-diversity privacy audit (Sweeney; Machanavajjhala
    * et al.): group the table by its quasi-identifier columns — the
    * attribute combination an adversary could link to external data —
    * and flag every equivalence class that is smaller than `k`
    * (re-identifiable) or carries fewer than `l` distinct values of the
    * `sensitiveCol` (attribute-disclosing even when k-anonymous). The
    * pre-release gate a privacy review runs before shipping a dataset,
    * and the measurement that tells you WHICH generalization to apply.
    *
    * Output: one row per equivalence class —
    * (quasiIdCols..., n_rows, n_sensitive, k_anonymous, l_diverse).
    * NULL quasi-id values form their own class (GROUP BY semantics) —
    * suppressed values still need auditing.
    *
    * Plan shape (100 TB posture): ONE hash aggregate keyed on the
    * quasi-identifier tuple (count + exact count-distinct, partial-agg
    * combined map-side); the flags are map-only literal comparisons on
    * the agg output. No window, no join — payload columns beyond the
    * quasi-ids and the sensitive column are pruned at the scan.
    */
  def kAnonymityAudit(df: DataFrame, quasiIdCols: Seq[String],
      sensitiveCol: String, k: Long, l: Long): DataFrame = {
    require(quasiIdCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 1 && l >= 1, s"k and l must be positive, got k=$k l=$l")
    df.groupBy(quasiIdCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("k_anonymous", col("n_rows") >= k)
      .withColumn("l_diverse", col("n_sensitive") >= l)
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) — the
    * third rung of the release-gate ladder after k-anonymity and
    * l-diversity ([[kAnonymityAudit]]): an equivalence class can be
    * large AND diverse yet still leak (99% of one diagnosis where the
    * population has 1%), so each class's SENSITIVE-VALUE DISTRIBUTION
    * must sit within Earth-Mover's Distance `t` of the corpus-global
    * one. Two published ground distances:
    *
    *  - `ordered = false` (categorical, equal ground distance):
    *    EMD = ½·Σᵢ|pᵢ − qᵢ|. The absent-value terms fold away
    *    algebraically — Σ_absent qᵢ = 1 − Σ_present qᵢ — so NO
    *    class×domain grid is ever built: one (class, value) aggregate,
    *    one vocabulary-bounded join against the global counts, a
    *    class-keyed window over each class's ≤ m value rows for the
    *    class total (null-class-safe where an equi-join is not), one
    *    per-class aggregate.
    *  - `ordered = true` (numeric domains): EMD = Σᵢ|Σ_{j≤i}(pⱼ−qⱼ)| /
    *    (m−1) over the ordered global domain. Cumulative terms need the
    *    absent values, so classes explode onto the m-value grid — a
    *    BROADCAST cross join bounded by the sensitive domain (the
    *    bounded-cardinality metric contract), with a per-class window
    *    over m rows, never a corpus window.
    *
    * Exactness (the c30 convention): pᵢ − qᵢ = (cᵢ·N − gᵢ·n)/(n·N), so
    * every |…| term is an exact DECIMAL(38,0) integer and the ONLY IEEE
    * operation is the single final division — engines cannot disagree on
    * a distance or a verdict. Null sensitive values carry no
    * distribution mass (the countDistinct convention) and are dropped
    * from both p and q; a class with only null sensitive rows does not
    * appear. A single-value global domain pins distance 0.
    *
    * Output: (quasi…, n_rows, emd, t_close) — emd rounded to 9, the
    * verdict compared on the RAW division.
    */
  def tClosenessAudit(df: DataFrame, quasiIdCols: Seq[String],
      sensitiveCol: String, t: Double,
      ordered: Boolean = false): DataFrame = {
    require(quasiIdCols.nonEmpty, "need at least one quasi-identifier")
    val q = quasiIdCols.map(col)
    val rows = df.filter(col(sensitiveCol).isNotNull)
      .select(q :+ col(sensitiveCol).as("__v"): _*)
    val global = rows.groupBy("__v").agg(count(lit(1)).as("__g"))
    val byClassVal = rows.groupBy(q :+ col("__v"): _*)
      .agg(count(lit(1)).as("__c"))
    tClosenessFromCounts(byClassVal, global, quasiIdCols, t, ordered)
  }

  /** The SHARED v04/v05 distance arithmetic over pre-aggregated counts —
    * `byClassVal` is (quasi…, __v, __c) and `global` is (__v, __g); the
    * batch audit ([[tClosenessAudit]]) derives both from the rows, the
    * streaming monitor ([[graft.streaming.StreamingTCloseness]])
    * resolves both from its LSM state — one arithmetic, zero drift by
    * construction (the e-series contract).
    */
  private[graft] def tClosenessFromCounts(byClassVal: DataFrame,
      global: DataFrame, quasiIdCols: Seq[String], t: Double,
      ordered: Boolean): DataFrame = {
    require(quasiIdCols.nonEmpty, "need at least one quasi-identifier")
    require(t > 0.0 && t <= 1.0, s"t must lie in (0, 1], got $t")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val q = quasiIdCols.map(col)
    val totals = global.agg(coalesce(sum(col("__g")), lit(0L)).as("__gt"),
      count(lit(1)).as("__m"))
    // per-class totals ride a CLASS-KEYED window over the class's ≤ m
    // value rows (vocabulary-bounded, never the corpus) instead of a
    // classN equi-join: a NULL quasi-id class is its own auditable class
    // (the kAnonymityAudit contract), and a null-unsafe join would drop
    // it — the window groups nulls like GROUP BY does
    val wcls = org.apache.spark.sql.expressions.Window.partitionBy(q: _*)
    if (!ordered) {
      val joined = byClassVal
        .join(global, "__v")
        .withColumn("__n", sum(col("__c")).over(wcls))
        .crossJoin(broadcast(totals))
      val per = joined
        .groupBy(q :+ col("__n") :+ col("__gt"): _*)
        .agg(sum(abs(col("__c").cast(dec) * col("__gt").cast(dec) -
            col("__g").cast(dec) * col("__n").cast(dec))).as("__s1"),
          sum(col("__g")).as("__s2"))
      val num = col("__s1") +
        (col("__gt") - col("__s2")).cast(dec) * col("__n").cast(dec)
      val emdRaw = num.cast("double") /
        (col("__n").cast(dec) * col("__gt").cast(dec) * lit(2).cast(dec))
          .cast("double")
      per.select(q :+ col("__n").as("n_rows") :+
        (round(emdRaw, 9) + lit(0.0)).as("emd") :+
        (emdRaw <= t).as("t_close"): _*)
    } else {
      import org.apache.spark.sql.expressions.Window
      val classN = byClassVal.groupBy(q: _*).agg(sum(col("__c")).as("__n"))
      // the grid join is NULL-SAFE on the quasi columns for the same
      // null-class reason as above
      val gridCond = (quasiIdCols.map(c =>
        col(s"cn.$c") <=> col(s"cv.$c")) :+
        (col("g.__v") === col("cv.__v"))).reduce(_ && _)
      val grid = classN.as("cn").crossJoin(broadcast(global).as("g"))
        .join(byClassVal.as("cv"), gridCond, "left")
        .select(quasiIdCols.map(c => col(s"cn.$c").as(c)) ++
          Seq(col("cn.__n").as("__n"), col("g.__v").as("__v"),
            col("g.__g").as("__g"),
            coalesce(col("cv.__c"), lit(0L)).as("__c")): _*)
      val w = Window.partitionBy(q: _*).orderBy(col("__v"))
      val per = grid
        .withColumn("__cc", sum(col("__c")).over(w))
        .withColumn("__cg", sum(col("__g")).over(w))
        .crossJoin(broadcast(totals))
        .groupBy(q :+ col("__n") :+ col("__gt") :+ col("__m"): _*)
        .agg(sum(abs(col("__cc").cast(dec) * col("__gt").cast(dec) -
          col("__cg").cast(dec) * col("__n").cast(dec))).as("__s1"))
      val emdRaw = col("__s1").cast("double") /
        (col("__n").cast(dec) * col("__gt").cast(dec) *
          (col("__m") - lit(1)).cast(dec)).cast("double")
      per.select(q :+ col("__n").as("n_rows") :+
        (when(col("__m") > 1, round(emdRaw, 9) + lit(0.0))
          .otherwise(lit(0.0))).as("emd") :+
        (when(col("__m") > 1, emdRaw <= t).otherwise(lit(true)))
          .as("t_close"): _*)
    }
  }

  /** PII retention audit — the GDPR storage-limitation gate next to the
    * erasure cascade: rows whose `tsCol` is STRICTLY before the retention
    * `cutoff` should have been purged or anonymized, so per PII kind
    * (the [[TextAnalysis.piiPatterns]] battery, shared verbatim with
    * redaction and the oracle) report how many EXPIRED rows still carry
    * that kind and how many matches they hold — the compliance evidence
    * a retention review starts from, and the blast-radius number before
    * a purge runs.
    *
    * Output: one row per kind — (kind, n_expired, n_rows_with_kind,
    * n_hits); an empty expired set pins zeros.
    *
    * Plan shape (100 TB posture): ONE map-only filtered pass (the ts
    * predicate reaches the scan) with per-kind regexp counts folded into
    * a single scalar aggregate; the per-kind rows come from a bounded
    * map explode of that 1-row frame. No join, no window, no shuffle
    * beyond the final 1-row aggregate.
    */
  def retentionAudit(df: DataFrame, tsCol: String, textCol: String,
      cutoff: Long): DataFrame = {
    val pats = TextAnalysis.piiPatterns
    val expired = df.filter(col(tsCol) < cutoff)
    val exprs = pats.flatMap { case (k, re) =>
      val c = regexp_count(col(textCol), lit(re)).cast("long")
      Seq(sum(when(c > 0, 1L).otherwise(0L)).as(s"__d_$k"),
        sum(c).as(s"__h_$k"))
    }
    expired
      .agg(count(lit(1)).as("n_expired"), exprs: _*)
      .select(col("n_expired"),
        explode(map(pats.flatMap { case (k, _) =>
          Seq(lit(k), struct(coalesce(col(s"__d_$k"), lit(0L)).as("d"),
            coalesce(col(s"__h_$k"), lit(0L)).as("h")))
        }: _*)).as(Seq("kind", "__v")))
      .select(col("kind"), col("n_expired"),
        col("__v.d").as("n_rows_with_kind"), col("__v.h").as("n_hits"))
  }

  /** Differentially-private count release (the Laplace mechanism, Dwork
    * et al. 2006): per-group counts with Laplace(1/ε) noise — the
    * aggregate-statistics publication gate next to the k-anonymity /
    * t-closeness audits. Count queries have L1 sensitivity 1 (one row
    * moves one group's count by one), so scale b = 1/ε gives
    * ε-differential privacy PER RELEASE.
    *
    * Noise derivation is SEEDED-DETERMINISTIC for testability and replay:
    * u = polyHash64(md5(seed ‖ key))/2⁶⁴ ∈ [0,1), then the Laplace inverse
    * CDF −b·sign(u−½)·ln(1−2|u−½|). A seeded release is formally a
    * fixed function of the data (re-releasing with the same seed spends
    * no extra budget, but a NEW seed per release is the caller's duty —
    * the privacy accounting contract lives with the publisher, as with
    * any DP system). The hash routes through DECIMAL(38,0) so the
    * unsigned→double conversion is ONE correctly-rounded step in both
    * engines; the CDF argument is clamped at 1e-12 (bounds |noise| ≤
    * 27.6·b, deterministic, measure-zero effect).
    *
    * Plan shape (100 TB posture): ONE map-side-combined hash aggregate
    * to the group-bounded count frame; noise is a map-only expression
    * over it. Nothing else moves.
    *
    * Output: (keyCols…, epsilon, released, released_count) — the noisy
    * real value and its non-negative integer rounding; the true count
    * is deliberately NOT emitted.
    */
  /** Seeded-deterministic Laplace(b) draw from a key string — the v07
    * recipe: u = polyHash64(md5(keyStr))/2⁶⁴ through ONE DECIMAL-routed
    * unsigned→double conversion, then the inverse CDF with the 1e-12
    * clamp (|noise| ≤ 27.6·b, deterministic). Shared by every DP
    * release so engine and oracle draw identical noise.
    *
    * The md5 expansion is load-bearing: the base-31 polynomial of a
    * SHORT key never wraps 2⁶⁴ (a 4-char key hashes below 2²⁵, so
    * u ≈ 0 and every draw collapses onto the clamp bound with the same
    * sign — seed-insensitive, maximally-biased noise). The 32-hex-char
    * md5 image wraps the modulus ~25 times over, giving the avalanche
    * the polynomial alone lacks, and both engines share md5 natively.
    */
  private def laplaceNoise(keyStr: Column, b: Double): Column = {
    val u = seededUniform(keyStr)
    lit(-b) * signum(u - lit(0.5)) *
      log(greatest(lit(1.0) - lit(2.0) * abs(u - lit(0.5)), lit(1e-12)))
  }

  /** The seeded uniform in [0,1) behind every DP draw — ONE
    * DECIMAL-routed unsigned→double conversion of poly_hash64(md5(key)),
    * shared by the Laplace inverse-CDF ([[laplaceNoise]]) and the Gumbel
    * draws of the exponential mechanism ([[dpNoisedQuantiles]]).
    *
    * SECURITY CONTRACT (applies to every release built on this draw —
    * dpNoisedCounts/Mean/Histogram/Quantiles/TokenRelease): the draws
    * are a DETERMINISTIC function of the seed, so the stated ε-DP
    * guarantee holds only when the seed is SECRET and high-entropy (a
    * per-release value from a CSPRNG, handled like a key). With a known
    * or guessable seed the noise is publicly computable and subtracts
    * off — the release degenerates to the raw statistic. The short
    * plan-literal seeds in the test fixtures ("v10:", "v11:", …) exist
    * for deterministic oracle REPLAY only; they are not a DP deployment
    * posture.
    */
  private def seededUniform(keyStr: Column): Column = {
    val fp = graft.functions.GraftFunctions.poly_hash64(md5(keyStr))
    val twoTo64 = lit(new java.math.BigDecimal("18446744073709551616"))
      .cast("decimal(38,0)")
    val unsignedD = (fp.cast("decimal(38,0)") +
      when(fp < 0, twoTo64).otherwise(lit(0).cast("decimal(38,0)")))
      .cast("double")
    unsignedD / lit(1.8446744073709552e19)
  }

  /** Seeded noise-draw key: seed and key parts joined with the unit
    * separator (U+001F — absent from the seed tags and any sane key
    * text), NULL encoded as the record-separator sentinel (U+001E).
    * Without the separator, distinct multi-column tuples could collide
    * (("a","bc") vs ("ab","c")) and draw identical noise; without the
    * sentinel, concat_ws would silently SKIP a NULL key part while the
    * oracle's `||` propagates NULL — divergent draws on NULL-keyed
    * groups. Oracles mirror both (chr(31) / chr(30)).
    */
  private def noiseKey(seed: String, parts: Seq[Column]): Column =
    concat_ws("\u001f", lit(seed) +: parts.map(p =>
      coalesce(p.cast("string"), lit("\u001e"))): _*)

  def dpNoisedCounts(df: DataFrame, keyCols: Seq[String], epsilon: Double,
      seed: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(epsilon > 0, "epsilon must be positive")
    val counts = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
    val keyStr = noiseKey(seed, keyCols.map(col))
    val noise = laplaceNoise(keyStr, 1.0 / epsilon)
    counts.select(
      keyCols.map(col) ++ Seq(
        lit(epsilon).as("epsilon"),
        (round(col("__n").cast("double") + noise, 6) + lit(0.0))
          .as("released"),
        greatest(round(col("__n").cast("double") + noise, 0), lit(0.0))
          .cast("long").as("released_count")): _*)
  }

  /** Differentially-private mean release — the standard noisy-average
    * composition (Dwork & Roth 2014 §3.4): per group, release
    * `(Σ clamp(v, lo, hi) + Lap(Δs/(ε/2))) / max(n + Lap(2/ε), 1)`,
    * clamping each value into the PUBLIC bounds [lo, hi] first (the
    * clamp is what gives the sum its finite L1 sensitivity
    * Δs = max(|lo|, |hi|) — one row entering or leaving moves the sum by
    * at most that). Numerator and denominator each spend ε/2; by
    * sequential composition the release is ε-DP. The two draws use
    * domain-separated key strings (`seed‖S:‖key`, `seed‖C:‖key`)
    * through the shared seeded-Laplace recipe, so engine and oracle
    * reproduce identical noise; the seed-accounting contract is the
    * caller's, as in [[dpNoisedCounts]].
    *
    * Null values are excluded before anything counts — a null carries no
    * subject signal and would otherwise deflate the mean.
    *
    * Determinism: clamped values cast to DECIMAL(28,6) and sum exactly
    * (order-free); every later step is a fixed-shape scalar expression.
    *
    * Plan shape (100 TB posture): ONE map-side-combined hash aggregate
    * to the group-bounded (Σ, n) frame; noise and the division are
    * map-only expressions over it. Nothing else moves.
    *
    * Output: (keyCols…, epsilon, released_mean, released_n) — the noisy
    * mean and the noisy non-negative row count; true values are
    * deliberately NOT emitted.
    */
  def dpNoisedMean(df: DataFrame, keyCols: Seq[String], valueCol: String,
      lo: Double, hi: Double, epsilon: Double, seed: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(epsilon > 0, "epsilon must be positive")
    require(lo < hi, "need lo < hi public bounds")
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    val sensSum = math.max(math.abs(lo), math.abs(hi))
    val clamped = least(greatest(col(valueCol).cast("double"), lit(lo)),
      lit(hi))
    val agg = df.filter(col(valueCol).isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(clamped.cast(dec)).as("__s"), count(lit(1)).as("__n"))
    def keyStr(tag: String) = noiseKey(seed + tag, keyCols.map(col))
    val noisySum = col("__s").cast("double") +
      laplaceNoise(keyStr("S:"), sensSum / (epsilon / 2.0))
    val noisyN = col("__n").cast("double") +
      laplaceNoise(keyStr("C:"), 2.0 / epsilon)
    agg.select(
      keyCols.map(col) ++ Seq(
        lit(epsilon).as("epsilon"),
        (round(noisySum / greatest(round(noisyN, 6), lit(1.0)), 6)
          + lit(0.0)).as("released_mean"),
        greatest(round(noisyN, 0), lit(0.0)).cast("long")
          .as("released_n")): _*)
  }

  /** Differentially-private histogram release — [[dpNoisedCounts]] over
    * a PUBLIC bucket grid: values clamp into [lo, hi), bucket into
    * `nBuckets` equal-width bins, and EVERY grid bucket releases a
    * noisy count — including empty ones. The empty buckets are the
    * point: releasing only observed buckets leaks which bins have any
    * data at all (a presence side-channel the noise never touches);
    * over the public grid, an empty bucket's release is pure
    * Laplace(1/ε) noise and indistinguishable from a sparse one.
    * Histogram queries have L1 sensitivity 1 under add/remove-one-row
    * (a row lands in exactly one bucket), so the WHOLE grid costs one ε
    * — the parallel-composition property that makes DP histograms
    * cheap.
    *
    * Plan shape (100 TB posture): ONE map-side-combined hash aggregate
    * to the ≤ nBuckets count frame, an outer join against the
    * generated literal grid (bucket-bounded), map-only noise. Nothing
    * corpus-scale moves.
    *
    * Output: one row per grid bucket —
    * (bucket, lo_edge, hi_edge, epsilon, released, released_count);
    * true counts deliberately NOT emitted. Nulls are excluded (no
    * subject signal); values at exactly `hi` clamp into the last
    * bucket.
    */
  def dpNoisedHistogram(df: DataFrame, valueCol: String, lo: Double,
      hi: Double, nBuckets: Int, epsilon: Double,
      seed: String): DataFrame = {
    require(lo < hi, "need lo < hi public bounds")
    require(nBuckets >= 1, "need at least one bucket")
    require(epsilon > 0, "epsilon must be positive")
    val width = (hi - lo) / nBuckets
    val bucket = least(
      floor((least(greatest(col(valueCol).cast("double"), lit(lo)),
        lit(hi)) - lit(lo)) / lit(width)).cast("int"),
      lit(nBuckets - 1))
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(bucket.as("bucket")).agg(count(lit(1)).as("__n"))
    val grid = df.sparkSession.range(nBuckets)
      .select(col("id").cast("int").as("bucket"))
    val noise = laplaceNoise(
      noiseKey(seed, Seq(col("bucket"))),
      1.0 / epsilon)
    grid.join(counts, Seq("bucket"), "left")
      .select(col("bucket"),
        (lit(lo) + col("bucket") * lit(width)).as("lo_edge"),
        (lit(lo) + (col("bucket") + 1) * lit(width)).as("hi_edge"),
        lit(epsilon).as("epsilon"),
        (round(coalesce(col("__n"), lit(0L)).cast("double") + noise, 6)
          + lit(0.0)).as("released"),
        greatest(round(coalesce(col("__n"), lit(0L)).cast("double") +
          noise, 0), lit(0.0)).cast("long").as("released_count"))
  }

  /** Differentially-private quantile release — the EXPONENTIAL mechanism
    * (McSherry & Talwar, FOCS 2007; Dwork & Roth 2014 §3.4) over a
    * PUBLIC value grid, completing the DP family next to the Laplace
    * releases ([[dpNoisedCounts]] / [[dpNoisedMean]] /
    * [[dpNoisedHistogram]]): for each requested quantile q the mechanism
    * selects grid point g with probability ∝ exp(ε·u(g)/2), utility
    * u(g) = −|rank(g) − q·n| — the negated rank error, whose
    * sensitivity is 1 under add/remove-one-row (one row moves every
    * rank by at most 1), so each released quantile is ε-DP. The
    * selection is drawn via the GUMBEL-MAX trick — argmax over the grid
    * of ε·u(g)/2 + Gumbel(seed, q, g) is distributionally identical to
    * the exponential mechanism and, with the seeded uniforms of the
    * sibling releases, DETERMINISTICALLY replayable: engine and oracle
    * draw the identical Gumbel at every (quantile, grid point) and
    * cannot disagree on the argmax. Each quantile in `quantiles` is its
    * own ε-DP release; composition accounting is the caller's, as in
    * the sibling releases.
    *
    * Rank semantics: values clamp into the public [lo, hi] and quantize
    * onto the `nBuckets` equal-width grid (the [[dpNoisedHistogram]]
    * bucketing); rank(gᵢ) = #values in buckets < i — the bucketed rank
    * at grid point i, the published "quantile over a public
    * discretization". Grid points are the nBuckets+1 bucket EDGES.
    *
    * Determinism: the Gumbel is −ln(−ln(u)) with u clamped into
    * [1e-12, 1−1e-12]; utility multiplies exact integer ranks by the
    * fixed q·n double — fixed-shape IEEE expressions both engines
    * evaluate identically; argmax ties (measure-zero) break to the
    * smaller grid index.
    *
    * Plan shape (100 TB posture): ONE map-side-combined hash aggregate
    * to the ≤ nBuckets count frame; ranks come from a triangular join of
    * the (nBuckets+1)-point grid against it (grid-bounded); scoring is a
    * |quantiles|×(nBuckets+1) literal cross of that bounded frame with
    * ONE max_by hash aggregate per quantile. Nothing corpus-scale moves
    * after the first aggregate.
    *
    * Output: one row per requested quantile —
    * (q, epsilon, released_value); true quantiles deliberately NOT
    * emitted. Nulls drop (no subject signal). The ε-DP claim inherits
    * [[seededUniform]]'s security contract: it holds only under a
    * secret high-entropy seed — fixture seeds are replay-only.
    */
  def dpNoisedQuantiles(df: DataFrame, valueCol: String,
      quantiles: Seq[Double], lo: Double, hi: Double, nBuckets: Int,
      epsilon: Double, seed: String): DataFrame = {
    require(quantiles.nonEmpty, "need at least one quantile")
    require(quantiles.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must lie in [0, 1], got $quantiles")
    require(lo < hi, "need lo < hi public bounds")
    require(nBuckets >= 1, "need at least one bucket")
    require(epsilon > 0, "epsilon must be positive")
    val spark = df.sparkSession
    val width = (hi - lo) / nBuckets
    val bucket = least(
      floor((least(greatest(col(valueCol).cast("double"), lit(lo)),
        lit(hi)) - lit(lo)) / lit(width)).cast("int"),
      lit(nBuckets - 1))
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(bucket.as("__b")).agg(count(lit(1)).as("__c"))
    val total = counts.agg(
      coalesce(sum(col("__c")), lit(0L)).as("__n"))
    val grid = spark.range(nBuckets + 1)
      .select(col("id").cast("int").as("__i"))
    // bucketed rank at each grid point: triangular join over the
    // grid-bounded count frame ((nBuckets+1)·nBuckets pairs at most)
    val ranks = grid.join(counts, col("__b") < col("__i"), "left")
      .groupBy(col("__i"))
      .agg(coalesce(sum(col("__c")), lit(0L)).as("__rank"))
    import spark.implicits._
    val qdf = quantiles.zipWithIndex.toDF("__q", "__qi")
    val u = seededUniform(noiseKey(seed, Seq(col("__qi"), col("__i"))))
    val gumbel = -log(-log(greatest(least(u, lit(1.0 - 1e-12)),
      lit(1e-12))))
    val util = -abs(col("__rank").cast("double") -
      col("__q") * col("__n").cast("double"))
    val scored = qdf.crossJoin(ranks).crossJoin(total)
      .select(col("__q"), col("__i"),
        (lit(epsilon / 2.0) * util + gumbel).as("__s"))
    scored.groupBy(col("__q"))
      .agg(max_by(col("__i"), struct(col("__s"), (-col("__i")).as("__t")))
        .as("__pick"))
      .select(col("__q").as("q"), lit(epsilon).as("epsilon"),
        (lit(lo) + col("__pick") * lit(width)).cast("double")
          .as("released_value"))
  }

  /** Differentially-private VOCABULARY release (the stability-histogram
    * pattern behind private heavy-hitter / private-SQL token releases —
    * Korolova et al. 2009; Wilson et al. 2020; see PAPERS.md): release a
    * token only when its noisy document frequency crosses a public
    * threshold, so rare (potentially identifying) strings never appear —
    * the unknown-domain case v07's per-group counts cannot handle
    * (releasing WHICH keys exist is itself the leak).
    *
    * Contribution bounding (the user-level-DP prerequisite): each
    * document contributes each token at most ONCE and at most
    * `maxTokensPerDoc` tokens — the lexicographically smallest distinct
    * tokens (deterministic, so both engines bound identically). One
    * document then changes at most `maxTokensPerDoc` counts by 1 each
    * (L1 sensitivity = maxTokensPerDoc), and each count draws seeded
    * Laplace(maxTokensPerDoc/ε) noise through the shared recipe.
    * τ calibration is the CALLER's: with Laplace(L/ε) noise, releasing
    * only counts whose noisy value ≥ τ bounds the probability a
    * unique-document token surfaces by ½·exp(−(τ−1)·ε/L) — pick τ for
    * the target δ.
    *
    * Plan shape (100 TB posture): one map-only bounded-token explode,
    * ONE vocab-bounded hash aggregate (map-side combined), map-only
    * noise + threshold. Nothing corpus-scale moves after the aggregate.
    *
    * Output: (token, epsilon, released) for tokens whose RAW noisy count
    * crosses `threshold` (the verdict compares unrounded; `released`
    * rounds at emission). True counts deliberately NOT emitted. The
    * (ε, δ)-DP claim inherits [[seededUniform]]'s security contract:
    * it holds only under a secret high-entropy seed — fixture seeds
    * are replay-only.
    */
  def dpTokenRelease(df: DataFrame, textCol: String,
      maxTokensPerDoc: Int, epsilon: Double, threshold: Double,
      seed: String): DataFrame = {
    require(maxTokensPerDoc >= 1, "need a positive per-doc token bound")
    require(epsilon > 0, "epsilon must be positive")
    require(threshold >= 1.0, "a sub-1 threshold releases noise as vocab")
    val toks = df.select(explode(expr(
        s"""slice(array_sort(filter(array_distinct(
           |  split(regexp_replace(lower(trim($textCol)), '\\\\s+', ' '),
           |    ' ')), x -> x != '')), 1, $maxTokensPerDoc)"""
          .stripMargin)).as("token"))
    val counts = toks.groupBy("token").agg(count(lit(1)).as("__n"))
    val noisy = col("__n").cast("double") +
      laplaceNoise(noiseKey(seed, Seq(col("token"))),
        maxTokensPerDoc.toDouble / epsilon)
    counts.select(col("token"), lit(epsilon).as("epsilon"),
        noisy.as("__nz"))
      .filter(col("__nz") >= threshold)
      .select(col("token"), col("epsilon"),
        (round(col("__nz"), 6) + lit(0.0)).as("released"))
  }

  /** Differentially-private Naive Bayes MODEL release — private
    * classifier training by noising the sufficient statistic (NB's
    * training IS counting, so privatizing the counts privatizes the
    * model; Vaidya et al. 2013, see PAPERS.md):
    *
    *   - Contribution bounding: each document contributes its first
    *     `maxTokensPerDoc` DISTINCT tokens (sorted — the v11
    *     derivation), each once. One document therefore changes at most
    *     `maxTokensPerDoc` coordinates of the (label, token) count
    *     vector by 1 each (all under its own label), so the vector's L1
    *     sensitivity is EXACTLY `maxTokensPerDoc`.
    *   - Release: seeded Laplace(maxTokensPerDoc/ε) per coordinate.
    *     The released NUMBERS are ε-DP post-processing, but the
    *     released VOCABULARY (which (label, token) coordinates clear
    *     the stability threshold) is data-dependent — a coordinate
    *     present only in one contributor's documents clears τ with
    *     probability ≤ ½·exp(−(τ−1)·ε/L) under D and probability 0
    *     under the neighbor D′, so the overall release is (ε, δ)-DP,
    *     NOT pure ε-DP. τ calibration is the CALLER's, exactly as on
    *     [[dpTokenRelease]]: with Laplace(L/ε) noise and
    *     L = maxTokensPerDoc, releasing only coordinates whose noisy
    *     count ≥ τ bounds that surfacing probability per coordinate;
    *     pick τ for the target δ (union-bounded over the ≤ L
    *     coordinates one document can touch). The smoothed
    *     log-probability tail over ALREADY-released values is genuine
    *     budget-free post-processing.
    *   - Model tail over released values only: logp = round-9
    *     ln((r + 1)/(N_c + V)) with r the round-6 released count
    *     (DECIMAL-routed on both engines), N_c the DECIMAL sum of the
    *     class's released counts, V the released vocabulary size.
    *
    * SECURITY CONTRACT: [[seededUniform]]'s — the guarantee holds only
    * under a secret high-entropy seed; fixture seeds are replay-only.
    * Output: (labelCol, token, epsilon, released, logp).
    */
  def dpNbModelRelease(df: DataFrame, textCol: String, labelCol: String,
      maxTokensPerDoc: Int, epsilon: Double, threshold: Double,
      seed: String): DataFrame = {
    require(maxTokensPerDoc >= 1, "need a positive per-doc token bound")
    dpNbReleaseTail(dpNbBoundedCounts(df, textCol, labelCol,
      maxTokensPerDoc), maxTokensPerDoc, epsilon, threshold, seed, labelCol)
  }

  /** The contribution-bounded (label, token) count frame behind
    * [[dpNbModelRelease]] — each doc's first `maxTokensPerDoc` sorted
    * DISTINCT tokens, once each. Strictly per-document, hence additive
    * across corpus splits: the streaming twin
    * ([[graft.streaming.StreamingDpNbRelease]]) banks these deltas
    * per batch. Output: (__lbl, token, __n).
    */
  private[graft] def dpNbBoundedCounts(df: DataFrame, textCol: String,
      labelCol: String, maxTokensPerDoc: Int): DataFrame = {
    require(maxTokensPerDoc >= 1, "need a positive per-doc token bound")
    val toks = df.select(col(labelCol).as("__lbl"), explode(expr(
        s"""slice(array_sort(filter(array_distinct(
           |  split(regexp_replace(lower(trim($textCol)), '\\\\s+', ' '),
           |    ' ')), x -> x != '')), 1, $maxTokensPerDoc)"""
          .stripMargin)).as("token"))
    toks.groupBy(col("__lbl"), col("token"))
      .agg(count(lit(1)).as("__n"))
  }

  /** The noise + post-processing tail of [[dpNbModelRelease]] over a
    * [[dpNbBoundedCounts]] frame. ONE release per seed: the draws are a
    * deterministic function of (seed, label, token), so re-reading the
    * SAME counts replays the same release (free), but releasing
    * EVOLVING counts under one seed reveals the exact count deltas
    * (correlated noise cancels in the difference) — callers releasing
    * more than once must use a fresh seed per release and account ε
    * per release by composition.
    */
  private[graft] def dpNbReleaseTail(counts: DataFrame,
      maxTokensPerDoc: Int, epsilon: Double, threshold: Double,
      seed: String, labelCol: String): DataFrame = {
    require(epsilon > 0, "epsilon must be positive")
    require(threshold >= 1.0, "a sub-1 threshold releases noise as vocab")
    val dec6 = org.apache.spark.sql.types.DecimalType(28, 6)
    val released = counts
      .withColumn("__nz", col("__n").cast("double") +
        laplaceNoise(noiseKey(seed, Seq(col("__lbl"), col("token"))),
          maxTokensPerDoc.toDouble / epsilon))
      .filter(col("__nz") >= threshold)
      .withColumn("__r", round(col("__nz"), 6).cast(dec6))
    val totals = released.groupBy(col("__lbl")).agg(sum(col("__r")).as("__nc"))
    val vocab = released.select(col("token")).distinct()
      .agg(count(lit(1)).as("__v"))
    released.join(totals, "__lbl").crossJoin(broadcast(vocab))
      .select(col("__lbl").as(labelCol), col("token"),
        lit(epsilon).as("epsilon"),
        col("__r").cast("double").as("released"),
        round(log((col("__r").cast("double") + lit(1.0)) /
          (col("__nc").cast("double") + col("__v").cast("double"))), 9)
          .as("logp"))
  }

  /** (table_name, n_purged, n_retained) as two count-only aggregates
    * attached by 1-row joins (the scalar-model convention).
    */
  private def summarize(name: String, full: DataFrame,
      purged: DataFrame): DataFrame = {
    val total = full.agg(count(lit(1)).as("__total"))
    purged.agg(count(lit(1)).as("n_purged"))
      .crossJoin(total)
      .select(lit(name).as("table_name"), col("n_purged"),
        (col("__total") - col("n_purged")).as("n_retained"))
  }
}
