package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus-level statistics over a bounded-cardinality metric column —
 * exact quantiles and curriculum bucketing, and distribution-drift
 * monitoring between two corpus snapshots. "Bounded cardinality" is the
 * rounding contract every graft quality signal already carries (e.g.
 * [[TextAnalysis.qualityScore]] rounds to 6 places, so its domain is at
 * most 10^6+1 values no matter how many rows exist): it is what makes
 * EXACT distributed quantiles affordable — a value histogram is one hash
 * aggregate whose size is the domain, not the corpus.
 */
object CorpusStats {

  /** The exact-arithmetic operators here sum/compare their metric as
    * LONG; a fractional column would silently truncate before the
    * comparison (mis-classifying frontier membership, under-counting a
    * budget) — reject it loudly instead and let the caller scale to an
    * integer grid (the c21/c19 convention).
    */
  private def requireIntegral(df: DataFrame, c: String, op: String): Unit = {
    import org.apache.spark.sql.types._
    df.schema(c).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case t => throw new IllegalArgumentException(
        s"$op requires an integral '$c' column, got $t — fractional values " +
          "would truncate silently; scale to an integer grid first")
    }
  }

  /** Exact value-histogram: (value, count) for the metric — the shuffle
    * carries one row per DISTINCT value (map-side combined), never per
    * input row.
    */
  private def histogram(df: DataFrame, valueCol: String): DataFrame =
    df.groupBy(col(valueCol).cast("double").as("__v"))
      .agg(count(lit(1)).as("__c"))

  /** Exact `nBuckets`-quantile boundaries of a bounded-cardinality metric:
    * boundary b (1-based) is the smallest value whose cumulative count
    * reaches `ceil(b·n / nBuckets)` — integer ceiling division, so the
    * rank targets are engine-exact (no float quantile-index arithmetic).
    *
    * The histogram collects to the driver (the IVF-centroid sanction: the
    * metric's rounded domain is plan-time-bounded state, NOT corpus-sized
    * — do not call this on an unrounded double column), and the cumulative
    * scan is a driver loop over the sorted domain.
    */
  def valueQuantiles(df: DataFrame, valueCol: String,
      nBuckets: Int): Array[Double] = {
    require(nBuckets >= 2, "need at least 2 buckets")
    val hist = histogram(df, valueCol).collect()
      .map(r => (r.getDouble(0), r.getLong(1))).sortBy(_._1)
    require(hist.nonEmpty, "empty corpus has no quantiles")
    val n = hist.iterator.map(_._2).sum
    val targets = (1 to nBuckets).map(b => (b * n + nBuckets - 1) / nBuckets)
    val bounds = new Array[Double](nBuckets)
    var cum = 0L
    var bi = 0
    hist.foreach { case (v, c) =>
      cum += c
      while (bi < nBuckets && cum >= targets(bi)) { bounds(bi) = v; bi += 1 }
    }
    bounds
  }

  /** Curriculum bucketing: assign every row the 1-based quantile bucket of
    * its metric value — the quality-stratified curriculum step (train on
    * easy/clean deciles first, or mix deciles at controlled rates).
    * Bucket b covers `boundary(b-1) < value <= boundary(b)`; the bucket
    * column is `1 + |{i < nBuckets : boundary(i) < value}|`, a map-only
    * expression over the plan-time boundary literals. Values above the
    * last boundary (impossible when the boundaries came from the same
    * data) clamp into the last bucket.
    */
  def curriculumBuckets(df: DataFrame, valueCol: String,
      nBuckets: Int): DataFrame = {
    val bounds = valueQuantiles(df, valueCol, nBuckets)
    val inner = typedLit(bounds.init.toSeq)
    df.withColumn("bucket",
      (lit(1) + size(filter(inner,
        b => col(valueCol).cast("double") > b))).cast("int"))
  }

  /** Exact two-sample Kolmogorov–Smirnov statistic between two corpus
    * snapshots over a bounded-cardinality metric: `max_v |CDF_A(v) −
    * CDF_B(v)|`, with the value attaining it (ties → smallest value).
    * The distribution-shift test that sees SHAPE differences PSI's fixed
    * buckets smear out — the complementary drift probe to [[psiDrift]].
    *
    * Plan shape: one value histogram per side (domain-bounded hash
    * aggregates), a full-outer merge on the value, TWO range-partitioned
    * parallel prefix sums ([[globalRunningTotalOrdered]] — never a
    * one-task window even when the domain is large), and one
    * max-by-struct argmax aggregate. Each side's total is a bounded
    * scalar collect. Per-value terms round to 6 before the max (the t21
    * convention) so engines agree exactly.
    *
    * Output: one row `(ks, at_value)`.
    */
  def ksStatistic(dfA: DataFrame, dfB: DataFrame, valueCol: String): DataFrame = {
    // double domain (the histogram() contract) — a long cast would
    // silently truncate the rounded-double quality metrics this runs on
    val ha = dfA.groupBy(col(valueCol).cast("double").as("__v"))
      .agg(count(lit(1)).as("__ca"))
    val hb = dfB.groupBy(col(valueCol).cast("double").as("__v"))
      .agg(count(lit(1)).as("__cb"))
    ksFromHistograms(ha, hb, dfA.count(), dfB.count())
  }

  /** The [[ksStatistic]] tail over pre-aggregated value histograms
    * (`(__v double, __ca)` / `(__v double, __cb)`) — the reusable unit
    * the streaming drift monitor feeds with its accumulated counts.
    */
  private[graft] def ksFromHistograms(ha: DataFrame, hb: DataFrame,
      na: Long, nb: Long): DataFrame = {
    require(na > 0 && nb > 0, "both sides must be non-empty")
    val u = ha.join(hb, Seq("__v"), "full_outer")
      .select(col("__v"),
        coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
    val cum = globalRunningTotalOrdered(
      globalRunningTotalOrdered(u, Seq(col("__v")), "__ca", "__cuma"),
      Seq(col("__v")), "__cb", "__cumb")
    val term = round(abs(
      col("__cuma").cast("double") / lit(na.toDouble) -
        col("__cumb").cast("double") / lit(nb.toDouble)), 6)
    cum.select(term.as("__t"), col("__v"))
      .agg(max(struct(col("__t"), (-col("__v")).as("__nv"))).as("__b"))
      .select((col("__b.__t") + lit(0.0)).as("ks"),
        (-col("__b.__nv")).as("at_value"))
  }

  /** One-row key-skew report for a prospective shuffle key: per-key row
    * counts summarized as `(n_keys, total_rows, max_rows, p99_rows,
    * mean_rows, skew_ratio = max/mean)` — the pre-flight diagnostic
    * behind every skew decision in this engine (salt or not, cap or
    * not, AQE skew-join thresholds). A ratio near 1 is uniform; hundreds
    * means one hot key owns the stage.
    *
    * Plan shape: ONE key-bounded hash aggregate (the counts), one
    * scalar aggregate over it, and the exact p99 via the
    * [[valueQuantiles]] histogram (domain = distinct COUNT values, tiny
    * — the histogram collect is bounded by it, not by keys). No sort,
    * no window.
    */
  def skewReport(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val counts = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
    val p99 = valueQuantiles(counts, "__n", 100)(98)
    counts.agg(
        count(lit(1)).as("n_keys"),
        sum(col("__n")).as("total_rows"),
        max(col("__n")).as("max_rows"))
      .select(col("n_keys"), col("total_rows"), col("max_rows"),
        lit(p99).cast("long").as("p99_rows"),
        (round(col("total_rows").cast("double") /
          col("n_keys").cast("double"), 6) + lit(0.0)).as("mean_rows"),
        (round(col("max_rows").cast("double") /
          (col("total_rows").cast("double") / col("n_keys").cast("double")), 6)
          + lit(0.0)).as("skew_ratio"))
  }

  /** Source-concentration report — Herfindahl–Hirschman concentration
    * of each group's rows over its strata (per language over sources
    * here): `HHI = Σᵢ shareᵢ²`, its inverse the EFFECTIVE source count
    * (1/HHI — "this slice really comes from ~2.3 sources no matter how
    * many are nominally present"), and the single largest share. The
    * diversity red-flag a mixture plan checks before trusting per-group
    * coverage: a language nominally fed by 10 sources but 95% one crawl
    * is a deduplication and bias hazard.
    *
    * Output: (groupCol, n_rows, n_strata, hhi, effective_strata,
    * top_share).
    *
    * Plan shape (100 TB posture): TWO hash aggregates — (group,
    * stratum) counts, then a per-group fold of Σn², max n, Σn — both
    * map-side combined; Σn² runs in DECIMAL(38,0) so it cannot wrap at
    * corpus scale, and the three emissions are single IEEE divisions of
    * exactly-computed integers.
    */
  def concentrationReport(df: DataFrame, groupCol: String,
      stratumCol: String): DataFrame = {
    val counts = df.groupBy(col(groupCol), col(stratumCol))
      .agg(count(lit(1)).as("__n"))
    val folded = counts.groupBy(col(groupCol)).agg(
      sum(col("__n")).as("n_rows"),
      count(lit(1)).as("n_strata"),
      sum(col("__n").cast("decimal(38,0)") * col("__n").cast("decimal(38,0)"))
        .as("__sq"),
      max(col("__n")).as("__maxn"))
    val n2 = (col("n_rows").cast("decimal(38,0)") *
      col("n_rows").cast("decimal(38,0)")).cast("double")
    folded.select(col(groupCol), col("n_rows"), col("n_strata"),
      (round(col("__sq").cast("double") / n2, 6) + lit(0.0)).as("hhi"),
      (round(n2 / col("__sq").cast("double"), 4) + lit(0.0))
        .as("effective_strata"),
      (round(col("__maxn").cast("double") / col("n_rows").cast("double"), 6)
        + lit(0.0)).as("top_share"))
  }

  /** One-row dataset-card summary ("Datasheets for Datasets", Gebru et
    * al. 2021 — the quantitative block): document/token/vocabulary
    * counts, language diversity (count + Shannon entropy of the language
    * marginal), mean quality, and the exact normalized-duplicate
    * fraction (`1 − distinct(md5(normalized))/n`, the d02 definition) —
    * the corpus headline a release ships with.
    *
    * Plan shape: three aggregates (one corpus pass for the scalar
    * stats, one vocab-bounded token count, one language-bounded
    * marginal), composed by 1-row broadcast attaches. Determinism: the
    * quality mean routes through DECIMAL (order-free sum); entropy terms
    * `p·ln(p)` round to 8 and sum as DECIMAL before the final negate +
    * round 6 (the t21 libm contract).
    */
  def datasetCard(df: DataFrame, textCol: String,
      langCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    // 1-row eager checkpoint: `stats` feeds both the entropy attach and
    // the final row — without it the corpus-pass aggregate runs twice
    val stats = df.agg(
      count(lit(1)).as("n_docs"),
      sum(TextAnalysis.tokenCount(col(textCol)).cast("long")).as("n_tokens"),
      countDistinct(md5(Dedup.normalized(col(textCol)))).as("__nd"),
      sum(TextAnalysis.qualityScore(col(textCol)).cast(dec)).as("__qs"))
      .localCheckpoint(true)
    val vocab = TextAnalysis.tokenCounts(df, textCol)
      .agg(count(lit(1)).as("vocab_size"))
    val langs = df.groupBy(col(langCol)).agg(count(lit(1)).as("__c"))
    val entropy = langs
      .crossJoin(broadcast(stats.select(col("n_docs").as("__n"))))
      .select(round(
          (col("__c").cast("double") / col("__n").cast("double")) *
            log(col("__c").cast("double") / col("__n").cast("double")), 8)
        .cast(org.apache.spark.sql.types.DecimalType(28, 10)).as("__t"))
      .agg(count(lit(1)).as("n_langs"), sum(col("__t")).as("__e"))
    stats.crossJoin(broadcast(vocab)).crossJoin(broadcast(entropy))
      .select(col("n_docs"), col("n_tokens"), col("vocab_size"),
        col("n_langs"),
        (round(-col("__e").cast("double"), 6) + lit(0.0)).as("lang_entropy"),
        (round(col("__qs").cast("double") / col("n_docs").cast("double"), 6)
          + lit(0.0)).as("mean_quality"),
        (round(lit(1.0) -
          col("__nd").cast("double") / col("n_docs").cast("double"), 6)
          + lit(0.0)).as("dup_frac"))
  }

  /** Winsorized clipping: clamp `valueCol` into its own exact
    * `[loBucket/nBuckets, hiBucket/nBuckets]` quantile bounds — the
    * robust-statistics step before means/variances feed a scaler (a
    * handful of 100 MB outlier documents otherwise dominate a corpus
    * length average). Bounds come from the same exact histogram-quantile
    * machinery as [[curriculumBuckets]] (bounded-cardinality contract)
    * and ship as plan-time literals; the apply is one map-only
    * greatest/least expression. Adds `<valueCol>_wins` (double).
    */
  def winsorize(df: DataFrame, valueCol: String, nBuckets: Int = 20,
      loBucket: Int = 1, hiBucket: Int = 19): DataFrame = {
    require(1 <= loBucket && loBucket < hiBucket && hiBucket <= nBuckets,
      s"need 1 <= loBucket < hiBucket <= nBuckets, got ($loBucket, $hiBucket, $nBuckets)")
    val bounds = valueQuantiles(df, valueCol, nBuckets)
    val lo = bounds(loBucket - 1)
    val hi = bounds(hiBucket - 1)
    df.withColumn(s"${valueCol}_wins",
      greatest(lit(lo), least(col(valueCol).cast("double"), lit(hi))))
  }

  /** Population-stability-index drift between two corpus snapshots over
    * fixed equal-width buckets of a [0,1] metric: per bucket,
    * `term = (p_a − p_b) · ln(p_a / p_b)` with both shares clamped to
    * `eps` (the standard empty-bucket guard). PSI ≥ 0.2 conventionally
    * flags a distribution shift worth investigating — the cheap health
    * probe between crawls/snapshots before any content-level diff.
    *
    * Determinism contract: shares are exact integer counts divided in
    * double; each bucket's term emits rounded to 6 (libm `ln` ulp drift
    * dies in the rounding — the t21 precedent); fractions emit rounded
    * to 6 with signed-zero canonicalization. One aggregate per side
    * (bucket-bounded shuffle), a tiny outer join on bucket id.
    * Output: (bucket, n_a, n_b, frac_a, frac_b, psi_term), one row per
    * non-empty-on-either-side bucket.
    */
  def psiDrift(dfA: DataFrame, dfB: DataFrame, valueCol: String,
      nBuckets: Int = 10, eps: Double = 1e-6): DataFrame = {
    require(nBuckets >= 2, "need at least 2 buckets")
    val a = bucketCounts(dfA, valueCol, nBuckets, "n_a")
    val b = bucketCounts(dfB, valueCol, nBuckets, "n_b")
    val na = dfA.count()
    val nb = dfB.count()
    psiFromCounts(a, b, na, nb, eps)
  }

  /** The [[psiDrift]] bucket formula as a reusable aggregate: counts per
    * `least(floor(v · nBuckets), nBuckets − 1)` bucket. The shuffle is
    * bucket-bounded (map-side combined).
    */
  def bucketCounts(df: DataFrame, valueCol: String, nBuckets: Int,
      out: String): DataFrame = df
    .groupBy(least(floor(col(valueCol).cast("double") * nBuckets), lit(nBuckets - 1))
      .cast("int").as("bucket"))
    .agg(count(lit(1)).as(out))

  /** The [[psiDrift]] arithmetic over PRE-AGGREGATED bucket counts —
    * shared verbatim with the streaming monitor
    * ([[graft.streaming.StreamingDrift]]) so the drained stream equals
    * the batch computation by construction, not by parallel maintenance.
    */
  def psiFromCounts(a: DataFrame, b: DataFrame, na: Long, nb: Long,
      eps: Double = 1e-6): DataFrame = {
    require(na > 0 && nb > 0, "both snapshots must be non-empty")
    val joined = a.join(b, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    val pa = greatest(col("n_a").cast("double") / lit(na.toDouble), lit(eps))
    val pb = greatest(col("n_b").cast("double") / lit(nb.toDouble), lit(eps))
    joined.select(col("bucket"), col("n_a"), col("n_b"),
      (round(col("n_a").cast("double") / lit(na.toDouble), 6) + lit(0.0)).as("frac_a"),
      (round(col("n_b").cast("double") / lit(nb.toDouble), 6) + lit(0.0)).as("frac_b"),
      (round((pa - pb) * log(pa / pb), 6) + lit(0.0)).as("psi_term"))
  }

  /** Leakage-safe train/holdout assignment: the split coin is tossed on a
    * GROUP key (a duplicate-cluster label, a normalized-content hash, a
    * source domain), never the row id — so no near-duplicate pair, exact
    * copy, or same-domain sibling ever straddles the boundary and leaks
    * training text into evaluation. The coin is the integer-exact
    * [[graft.functions.Mix64]] avalanche of the group key modulo 2^20
    * against `floor(trainFrac · 2^20)` (the t09/t24 convention: never a
    * float compare at the boundary), so assignment is deterministic,
    * reproducible across runs, and stable under corpus growth — rows
    * added to an existing group inherit its side. Map-only on an already
    * grouped frame: no shuffle beyond what produced the grouping.
    * Output: input columns + `split` ('train' | 'val').
    */
  /** Global running total of `valueCol` in `orderCol` order — the
    * distributed prefix sum. A single `ORDER BY` window computes this on
    * ONE task (the whole frame ships to it); instead: range-repartition
    * on the order key (partition p holds keys below partition p+1), run
    * the running total per partition IN PARALLEL (windows partitioned by
    * the partition id), and add each partition's exclusive offset — a
    * `numPartitions`-row driver-side collect, the same plan-time-state
    * convention as every model here. The range snapshot is pinned
    * (localCheckpoint) so the offsets and the final pass see the same
    * partition assignment.
    *
    * Output: input columns + `cumCol` (long). `valueCol` must be integral
    * (exact — no float summation-order hazards); `orderCol` must be
    * duplicate-free for a well-defined total order.
    */
  def globalRunningTotal(df: DataFrame, orderCol: String, valueCol: String,
      cumCol: String = "cum"): DataFrame =
    globalRunningTotalOrdered(df, Seq(col(orderCol)), valueCol, cumCol)

  /** [[globalRunningTotal]] over a COMPOSITE global order (e.g. quality
    * DESC then id for deterministic ties) — same range-partitioned
    * parallel-prefix shape: per-partition sums collected once (one long
    * per partition), exclusive offsets, partition-local running-sum
    * window.
    */
  def globalRunningTotalOrdered(df: DataFrame, orderCols: Seq[Column],
      valueCol: String, cumCol: String = "cum"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    requireIntegral(df, valueCol, "globalRunningTotal")
    val snap = df.repartitionByRange(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val partSums = snap.groupBy(col("__pid"))
      .agg(sum(col(valueCol).cast("long")).as("__s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val exclusive: Map[Int, Long] = {
      var acc = 0L
      partSums.map { case (pid, s) => val off = acc; acc += s; pid -> off }.toMap
    }
    val w = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offset =
      if (exclusive.isEmpty) lit(0L)
      else coalesce(element_at(typedLit(exclusive), col("__pid")), lit(0L))
    snap.withColumn(cumCol,
        sum(col(valueCol).cast("long")).over(w) + offset)
      .drop("__pid")
  }

  /** [[globalRunningTotalOrdered]] for SEVERAL value columns in one
    * pass: same range-partition + per-partition-sums-collect + exclusive
    * offsets + local running-sum shape, but the bounded collect carries
    * one long per (partition, column) so N cumulative columns cost ONE
    * repartition instead of N. Appends `<valueCol><cumSuffix>` per
    * column.
    */
  def globalRunningTotals(df: DataFrame, orderCols: Seq[Column],
      valueCols: Seq[String], cumSuffix: String = "_cum"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(valueCols.nonEmpty, "need at least one value column")
    valueCols.foreach(requireIntegral(df, _, "globalRunningTotals"))
    val snap = df.repartitionByRange(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val partSums = snap.groupBy(col("__pid"))
      .agg(valueCols.map(c => sum(col(c).cast("long")).as(s"__s_$c")).head,
        valueCols.tail.map(c => sum(col(c).cast("long")).as(s"__s_$c")): _*)
      .collect()
      .map(r => r.getInt(0) -> valueCols.indices.map(i => r.getLong(i + 1)))
      .sortBy(_._1)
    val w = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valueCols.zipWithIndex.foldLeft(snap) { case (acc, (c, i)) =>
      val exclusive: Map[Int, Long] = {
        var run = 0L
        partSums.map { case (pid, sums) =>
          val off = run; run += sums(i); pid -> off
        }.toMap
      }
      val offset =
        if (exclusive.isEmpty) lit(0L)
        else coalesce(element_at(typedLit(exclusive), col("__pid")), lit(0L))
      acc.withColumn(s"$c$cumSuffix",
        sum(col(c).cast("long")).over(w) + offset)
    }.drop("__pid")
  }

  /** Budget-constrained best-first selection: walk the corpus in
    * `orderCols` order (highest-value first — the caller encodes "best"
    * as the sort) accumulating `costCol`, keep every row whose RUNNING
    * total stays within `budget` — "the best N tokens the budget buys",
    * the final curation step before a training run. Costs are
    * non-negative, so the running total is monotone and the kept set is
    * an exact prefix of the order: the first row that would cross the
    * budget is excluded along with everything after it.
    *
    * One [[globalRunningTotalOrdered]] pass (range partition + parallel
    * prefix, never a one-task window) + a map-only filter. Output: the
    * kept rows with `cumCol` attached.
    */
  def budgetSelect(df: DataFrame, orderCols: Seq[Column], costCol: String,
      budget: Long, cumCol: String = "cum_cost"): DataFrame = {
    require(budget > 0, "budget must be positive")
    globalRunningTotalOrdered(df, orderCols, costCol, cumCol)
      .filter(col(cumCol) <= budget)
  }

  def leakageSafeSplit(assignments: DataFrame, groupCol: String,
      trainFrac: Double = 0.9, seed: Long = 0L): DataFrame = {
    require(trainFrac > 0.0 && trainFrac < 1.0, "trainFrac must be in (0,1)")
    val cut = math.floor(trainFrac * (1L << 20).toDouble).toLong
    val u = pmod(
      graft.functions.GraftFunctions.mix64(col(groupCol).cast("long"), seed)
        % lit(1L << 20), lit(1L << 20))
    assignments.withColumn("split",
      when(u < lit(cut), lit("train")).otherwise(lit("val")))
  }

  /** Deterministic mixture-recipe executor — the data-mixing step every
    * training run specifies as "exactly n_i documents from source i":
    * per stratum, the `quota(stratum)` rows with the smallest mix64
    * avalanche keys win (RNG-free — reproducible across runs and
    * engines, the t09/t28 convention), strata absent from the recipe are
    * excluded. Complements [[graft.operators.TextAnalysis]]'s
    * rate-based stratified sampler (t10): recipes fix COUNTS, rates
    * drift with corpus growth.
    *
    * Plan shape: ONE hash aggregate per stratum carrying a bounded
    * max-quota heap (k rows per stratum per partition on the shuffle —
    * the a05 posture), then a map-only rank-vs-quota filter against the
    * recipe literal. Quotas above a stratum's population return the
    * whole stratum.
    *
    * Output: (stratumCol, idCol, rank 1..quota) — rank is the selection
    * order, usable for curriculum truncation downstream.
    */
  def mixtureSample(df: DataFrame, stratumCol: String, idCol: String,
      quotas: Map[String, Int], seed: Long = 11L): DataFrame = {
    require(quotas.nonEmpty && quotas.values.forall(_ >= 1),
      "quotas must be positive")
    val kMax = quotas.values.max
    val key = shiftrightunsigned(
      graft.functions.GraftFunctions.mix64(col(idCol).cast("long"), seed), 11)
    val quota = element_at(typedLit(quotas), col(stratumCol))
    df.filter(quota.isNotNull)
      .select(col(stratumCol), col(idCol), (-key).as("__score"))
      .groupBy(stratumCol)
      .agg(graft.functions.GraftFunctions.top_k_by(col("__score"),
        col(idCol), kMax).as("__top"))
      .select(col(stratumCol), posexplode(col("__top")).as(Seq("__pos", "__e")))
      .select(col(stratumCol), col("__e.id").as(idCol),
        (col("__pos") + 1).cast("int").as("rank"))
      .filter(col("rank") <= element_at(typedLit(quotas), col(stratumCol)))
  }

  /** Cross-source duplication matrix — the corpus-governance report that
    * answers "which crawls/feeds are templated copies of each other":
    * per source pair, the EXACT Jaccard of the sources' distinct word
    * `shingleK`-gram sets (only intersecting pairs are emitted —
    * disjoint sources carry no signal and would quadratic-pad the
    * output). High overlap between two "independent" feeds means one is
    * a mirror and its weight should collapse before training.
    *
    * Plan shape: one kernel shingling pass → distinct `(source, gram)`
    * (rows bounded by Σ per-source distinct grams) → a gram self-join
    * whose per-gram bucket is bounded by the SOURCE COUNT (a gram can
    * appear once per source after the distinct) → one pair aggregate.
    * For catalogs with thousands of sources, pre-restrict to candidate
    * pairs or use the [[TextAnalysis.kmvSetOps]] sketch estimator — this
    * operator is the exact auditor for the shortlist.
    *
    * Output: (source_a, source_b, n_shared, jaccard), source_a <
    * source_b.
    */
  /** [[sourceOverlap]] behind a KMV-sketch candidate prefilter — the
    * catalog-scale form (thousands of sources, where the exact gram
    * join's per-gram buckets grow with the source count): a cheap
    * sketch pass shortlists the source pairs that could clear
    * `minJaccard`, and the exact matrix runs restricted to them.
    *
    *   1. Per source: the bottom-`sketchK` DISTINCT 40-bit gram
    *      fingerprints (`pmod(gramHash, 2^40)` — exactly representable
    *      in the bounded heap's double scores, the kmvSetOps/a05
    *      posture). One hash aggregate, `sketchK` rows per source.
    *   2. Candidate pairs = pairs sharing >= 1 sketch member (a skinny
    *      equi-join on the 40-bit value over `sketchK · sources` rows —
    *      never all-pairs). A pair with true Jaccard J shares a member
    *      with probability ~1 − (1−J)^sketchK, so recall at the floor
    *      is probabilistic-but-overwhelming for sketchK >> 1/minJaccard
    *      (and a missed pair is below-floor noise by construction).
    *   3. Per candidate pair: the standard mergeable-KMV estimate — the
    *      union sketch is the bottom-`sketchK` of the two sketches'
    *      union, Ĵ = |members in BOTH| / |union sketch| (Bar-Yossef et
    *      al. 2002; Beyer et al. 2007, see PAPERS.md) — a bounded
    *      per-pair heap over the pairs' own sketch rows. Floor filter.
    *   4. EXACT [[sourceOverlap]] over the rows of shortlisted sources
    *      only (left-semi restriction before the gram pass, so
    *      non-candidate sources never reach the quadratic-risk join),
    *      final left-semi on the shortlisted pairs.
    *
    * Output: the [[sourceOverlap]] schema, shortlisted pairs only.
    * Determinism: fingerprints, heap orders and the estimate arithmetic
    * are integer-exact, so an oracle replays the shortlist decision
    * bit-for-bit.
    */
  def sourceOverlapShortlisted(df: DataFrame, groupCol: String,
      textCol: String, shingleK: Int = 5, sketchK: Int = 128,
      minJaccard: Double = 0.2): DataFrame = {
    require(sketchK >= 2, "KMV needs sketchK >= 2")
    val R = 1L << 40
    val members = df.select(col(groupCol),
        explode(graft.functions.GraftFunctions.shingle_hashes(
          Dedup.normalized(col(textCol)), shingleK, word = true)).as("__g"))
      .select(col(groupCol), pmod(col("__g"), lit(R)).as("__v"))
      .distinct()
      .groupBy(groupCol)
      .agg(graft.functions.GraftFunctions.top_k_by(
        (-col("__v")).cast("double"), col("__v"), sketchK).as("__sk"))
      .select(col(groupCol), explode(col("__sk")).as("__e"))
      .select(col(groupCol), col("__e.id").as("__v"))
    val candPairs = members
      .select(col(groupCol).as("source_a"), col("__v"))
      .join(members.select(col(groupCol).as("source_b"), col("__v")), "__v")
      .filter(col("source_a") < col("source_b"))
      .select("source_a", "source_b").distinct()
    // the pairs' own sketch rows with membership flags — O(sketchK) per
    // candidate pair, flags folded into the heap id (v·4 + inA·2 + inB)
    val pm = candPairs
      .join(members.withColumnRenamed(groupCol, "source_a"), "source_a")
      .select(col("source_a"), col("source_b"), col("__v"),
        lit(true).as("__ina"), lit(false).as("__inb"))
      .unionByName(candPairs
        .join(members.withColumnRenamed(groupCol, "source_b"), "source_b")
        .select(col("source_a"), col("source_b"), col("__v"),
          lit(false).as("__ina"), lit(true).as("__inb")))
      .groupBy("source_a", "source_b", "__v")
      .agg(max(col("__ina")).as("__ina"), max(col("__inb")).as("__inb"))
    val shortlist = pm
      .groupBy("source_a", "source_b")
      .agg(graft.functions.GraftFunctions.top_k_by(
        (-col("__v")).cast("double"),
        col("__v") * 4 + col("__ina").cast("long") * 2 +
          col("__inb").cast("long"), sketchK).as("__sku"))
      .select(col("source_a"), col("source_b"),
        (size(filter(transform(col("__sku"), e => e.getField("id")),
          x => x % 4 === 3)).cast("double") /
          size(col("__sku")).cast("double")).as("__j"))
      .filter(col("__j") >= minJaccard)
      .select("source_a", "source_b")
    // exact pass over shortlisted sources only
    val sources = shortlist
      .select(explode(array(col("source_a"), col("source_b"))).as(groupCol))
      .distinct()
    sourceOverlap(df.join(sources, Seq(groupCol), "left_semi"),
        groupCol, textCol, shingleK)
      .join(shortlist, Seq("source_a", "source_b"), "left_semi")
  }

  /** Global row number over `orderCols` without a one-task global window —
    * the parallel-prefix recipe shared with [[globalRunningTotal]]: range
    * partition on the order, count rows per partition (ONE bounded collect,
    * one long per partition), turn the counts into exclusive offsets, and
    * number within each partition under a partition-local window. Output
    * adds `outCol` = 1-based global position.
    */
  private[operators] def globalRowNumber(df: DataFrame, orderCols: Seq[Column],
      outCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val snap = df.repartitionByRange(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val partCounts = snap.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val exclusive: Map[Int, Long] = {
      var acc = 0L
      partCounts.map { case (pid, c) => val off = acc; acc += c; pid -> off }.toMap
    }
    val w = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
    val offset =
      if (exclusive.isEmpty) lit(0L)
      else coalesce(element_at(typedLit(exclusive), col("__pid")), lit(0L))
    snap.withColumn(outCol, row_number().over(w).cast("long") + offset)
      .drop("__pid")
  }

  /** EXCLUSIVE prefix-min of `valueCol` over the global DESCENDING
    * `orderCol` order: each row gets the minimum value among rows with a
    * STRICTLY GREATER `orderCol` (null when no such row exists — rows of
    * `df` must be unique in `orderCol`, which the [[paretoFrontier]]
    * caller guarantees by aggregating first). Same parallel-prefix shape
    * as [[globalRowNumber]]: per-partition mins collect (one long per
    * partition), exclusive cross-partition min offsets, and a
    * partition-local `rowsBetween(-inf, -1)` running min — never a
    * one-task global window.
    */
  private[operators] def exclusivePrefixMinDesc(df: DataFrame,
      orderCol: String, valueCol: String, outCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = col(orderCol).desc
    val snap = df.repartitionByRange(ord)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val partMins = snap.groupBy(col("__pid"))
      .agg(min(col(valueCol).cast("long")).as("__m"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    // exclusive min of all PRECEDING partitions (higher orderCol ranges)
    val exclusive: Map[Int, Long] = {
      var acc = Option.empty[Long]
      partMins.flatMap { case (pid, m) =>
        val out = acc.map(pid -> _)
        acc = Some(acc.fold(m)(math.min(_, m)))
        out
      }.toMap
    }
    val w = Window.partitionBy(col("__pid")).orderBy(ord)
      .rowsBetween(Window.unboundedPreceding, -1)
    val within = min(col(valueCol).cast("long")).over(w)
    val offset =
      if (exclusive.isEmpty) lit(null).cast("long")
      else element_at(typedLit(exclusive), col("__pid"))
    // least() skips nulls (returns null only when BOTH are null) — exactly
    // the semantics an exclusive min with absent predecessors needs
    snap.withColumn(outCol, least(within, offset)).drop("__pid")
  }

  /** 2-D Pareto frontier (skyline): rows not dominated under (maximize
    * `maxCol`, minimize `minCol`) — `a` dominates `b` iff `a.max >= b.max
    * AND a.min <= b.min` with at least one strict. The multi-criteria
    * document-selection step (e.g. highest quality at every length
    * budget) a curation pipeline runs before fixing a token budget.
    *
    * Plan shape (100 TB posture): the classic quadratic skyline check is
    * replaced by the sorted-prefix formulation — a row survives iff its
    * `minCol` equals the minimum within its own `maxCol` value AND beats
    * the minimum over all STRICTLY higher `maxCol` values. That is ONE
    * skinny hash aggregate (distinct `maxCol` values), one parallel
    * exclusive prefix-min over those values ([[exclusivePrefixMinDesc]]),
    * and one equi-join back to the corpus — no window over the corpus, no
    * pair join, no cartesian. Ties on both axes all survive (none
    * dominates another).
    */
  def paretoFrontier(df: DataFrame, maxCol: String, minCol: String): DataFrame = {
    requireIntegral(df, minCol, "paretoFrontier")
    val perQ = df.groupBy(col(maxCol))
      .agg(min(col(minCol).cast("long")).as("__mEq"))
    val bounds = exclusivePrefixMinDesc(perQ, maxCol, "__mEq", "__mGt")
    df.join(bounds, Seq(maxCol))
      .filter(col(minCol).cast("long") === col("__mEq") &&
        (col("__mGt").isNull || col(minCol).cast("long") < col("__mGt")))
      .drop("__mEq", "__mGt")
  }

  /** Quantile normalization of `valueCol` across `sourceCol` groups: each
    * row's value is replaced by the GLOBAL distribution's value at the
    * row's within-source rank position — after it, every source has the
    * same marginal distribution (up to rank granularity), the standard
    * cross-source score-calibration step before mixing corpora. The
    * mapping is the exact integer-rank form (no interpolation — engines
    * cannot disagree on a float): within-source rank `r` of `n` maps to
    * global sorted position `p = (r-1)·(N-1) div (n-1) + 1` (the single
    * row of a 1-row source maps to the lower median, `p = (N+1) div 2`);
    * ties order by `idCol` on both sides, making every rank unique.
    *
    * Plan shape: ONE source-partitioned window for within-source ranks
    * (`sourceCol` is the natural partitioning; no global window), ONE
    * parallel-prefix [[globalRowNumber]] pass for the global order, and
    * ONE equi-join on the computed position. Adds `valueCol_norm`.
    */
  def quantileNormalize(df: DataFrame, sourceCol: String, valueCol: String,
      idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byVal = Seq(col(valueCol), col(idCol))
    val wRank = Window.partitionBy(col(sourceCol)).orderBy(byVal: _*)
    val wN = Window.partitionBy(col(sourceCol))
    val ranked = df
      .withColumn("__r", row_number().over(wRank).cast("long"))
      .withColumn("__n", count(lit(1)).over(wN))
    val pos = globalRowNumber(df.select(col(valueCol), col(idCol)), byVal, "__p")
      .select(col("__p"), col(valueCol).as(s"${valueCol}_norm"))
    // "__total" not "__N": Spark resolution is case-insensitive, so a
    // name differing from "__n" only by case would be ambiguous
    val total = pos.groupBy().agg(max(col("__p")).as("__total"))
    // p = (r-1)·(N-1) div (n-1) + 1, computed in the overflow-safe split
    // form (r-1)·q + (r-1)·rem div (n-1) + 1 with q = (N-1) div (n-1),
    // rem = (N-1) mod (n-1): exact in long arithmetic whenever each
    // SOURCE holds <= ~3·10^9 rows (vs. the naive product overflowing
    // once the whole CORPUS does). `div` is integral division.
    // 1-row scalar-model attach (the documented crossJoin pattern)
    val target = ranked.crossJoin(broadcast(total))
      .withColumn("__p",
        when(col("__n") > 1L, expr(
          """(__r - 1) * ((__total - 1) div (__n - 1))
             + ((__r - 1) * ((__total - 1) % (__n - 1))) div (__n - 1) + 1"""))
        .otherwise(expr("(__total + 1) div 2")))
      .drop("__total")
    target.join(pos, Seq("__p")).drop("__p", "__r", "__n")
  }

  def sourceOverlap(df: DataFrame, groupCol: String, textCol: String,
      shingleK: Int = 5): DataFrame = {
    val grams = df.select(col(groupCol),
        explode(graft.functions.GraftFunctions.shingle_hashes(
          Dedup.normalized(col(textCol)), shingleK, word = true)).as("__g"))
      .distinct()
    val sizes = grams.groupBy(groupCol).agg(count(lit(1)).as("__n"))
    val inter = grams.select(col(groupCol).as("source_a"), col("__g"))
      .join(grams.select(col(groupCol).as("source_b"), col("__g")), "__g")
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_shared"))
    inter
      .join(sizes.select(col(groupCol).as("source_a"),
        col("__n").as("__na")), "source_a")
      .join(sizes.select(col(groupCol).as("source_b"),
        col("__n").as("__nb")), "source_b")
      .select(col("source_a"), col("source_b"), col("n_shared"),
        round(col("n_shared").cast("double") /
          (col("__na") + col("__nb") - col("n_shared")), 6).as("jaccard"))
  }

  /** Neyman-optimal stratified sample allocation (Neyman 1934; Cochran,
    * Sampling Techniques §5.5): given a target sample size `sampleN`,
    * allocate n_h ∝ N_h·S_h — more samples to big AND high-variance
    * strata, the variance-minimizing design for estimating the metric's
    * mean. Integerization is largest-remainder (Hamilton): floor every
    * raw share, hand the leftovers out by remainder descending (ties by
    * stratum ascending), then cap each stratum at its population (a
    * capped allocation may sum below `sampleN` — documented, not
    * redistributed). Zero-variance strata get weight 0 (one would
    * suffice in theory; the textbook formula sends them 0 and this
    * implementation follows it). Output per stratum:
    * (stratum, n_rows, stddev, alloc), stddev the SAMPLE standard
    * deviation rounded at emission.
    *
    * Exactness: per-stratum count/sum/sum-of-squares are integer
    * aggregates (`metricCol` must be integral and small enough that
    * N·Σx² fits a long — true for any character/token-count metric);
    * S_h = √((N·Σx² − (Σx)²)/(N·(N−1))) and every later step is a
    * deterministic IEEE double op; the weight total folds in ASCENDING
    * stratum order (a pinned sequential sum an oracle replays with a
    * running-total window).
    *
    * Plan shape (100 TB posture): ONE map-side-combined hash aggregate
    * over the corpus (3 longs per stratum move); everything after runs
    * on the collected stratum table — bounded model state, the
    * curriculumBuckets sanction (strata are vocabulary-scale: sources,
    * languages, shards).
    */
  def neymanAllocation(df: DataFrame, stratumCol: String, metricCol: String,
      sampleN: Long): DataFrame = {
    require(sampleN >= 0, s"sample size must be non-negative, got $sampleN")
    val spark = df.sparkSession
    val m = col(metricCol).cast("long")
    val stats = df
      .groupBy(col(stratumCol).cast("string").as("__st"))
      .agg(count(lit(1)).as("__n"), sum(m).as("__sm"),
        sum(m * m).as("__sq"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val weighted = stats.map { case (st, n, sm, sq) =>
      // fail loudly where the documented "N·Σx² fits a long" precondition
      // is violated: a silent Long wrap would diverge exactly where the
      // oracle's BIGINT arithmetic raises. The difference itself cannot
      // overflow once both products fit (n·Σx² ≥ (Σx)² by Cauchy–Schwarz,
      // both non-negative).
      def exact(a: Long, b: Long, what: String): Long =
        try math.multiplyExact(a, b) catch {
          case _: ArithmeticException => throw new ArithmeticException(
            s"neymanAllocation: $what overflows a long for stratum '$st' " +
              s"(n=$n, sum=$sm, sum_sq=$sq) — rescale the metric")
        }
      val sd = if (n >= 2)
        math.sqrt((exact(n, sq, "N*sum_sq") - exact(sm, sm, "sum^2")).toDouble /
          exact(n, n - 1, "N*(N-1)").toDouble)
      else 0.0
      (st, n, sd, n.toDouble * sd)
    }
    val total = weighted.foldLeft(0.0)(_ + _._4)
    require(total > 0.0,
      "Neyman allocation undefined: every stratum has zero variance")
    val based = weighted.map { case (st, n, sd, w) =>
      val raw = (sampleN.toDouble * w) / total
      (st, n, sd, math.floor(raw).toLong, raw - math.floor(raw))
    }
    val leftover = math.max(0L, sampleN - based.map(_._4).sum)
    val bumped = based.sortBy { case (st, _, _, _, rem) => (-rem, st) }
      .zipWithIndex.map { case ((st, n, sd, fl, _), i) =>
        (st, n, sd, fl + (if (i < leftover) 1L else 0L))
      }
    import spark.implicits._
    bumped.sortBy(_._1).map { case (st, n, sd, al) =>
      (st, n,
        BigDecimal(sd).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble + 0.0,
        math.min(al, n))
    }.toSeq.toDF(stratumCol, "n_rows", "stddev", "alloc")
  }

  /** Exact ROC-AUC of a scored binary classifier (quality-filter eval):
    * the Mann–Whitney rank-sum identity AUC = (R⁺ − n⁺(n⁺+1)/2) /
    * (n⁺·n⁻) with ties at MIDRANKS — the textbook trapezoidal-ROC value.
    * Ranks run in ascending `scoreCol` order; `labelCol` is 0/1 (castable
    * to long). Output one row: (auc, n_pos, n_neg); `auc` is NULL when a
    * class is empty (undefined).
    *
    * Plan shape (100 TB posture): NEVER ranks rows — rows fold to ONE
    * hash aggregate per DISTINCT score (vocabulary-scale: (score, count,
    * positives)); the rank structure comes from a [[globalRunningTotal]]
    * parallel prefix sum over that skinny frame (range-partitioned, one
    * offsets collect — never a one-task global window); doubled midranks
    * (2·cumBefore + count + 1) keep the arithmetic INTEGER until the
    * final division, so engines agree bit-for-bit.
    */
  /** Cohen's kappa inter-annotator agreement between two categorical
    * label columns (Cohen 1960) — the labeling-QA staple: observed
    * agreement corrected for the agreement two independent raters with
    * these marginals would reach by chance. κ = (p_o − p_e)/(1 − p_e);
    * rows where either label is NULL are excluded (un-rated items).
    * Output one row: (n, n_agree, po, pe, kappa); `kappa` is NULL when
    * p_e = 1 (both raters constant and equal — agreement is undefined,
    * the textbook convention).
    *
    * Exactness: the kappa is computed from INTEGER-EXACT terms — ONE
    * division at the end: κ = (N·Σdiag − Σ_k r_k·c_k)/(N² − Σ_k r_k·c_k)
    * with every product in DECIMAL(38,0) (N up to ~10¹⁹ cannot overflow),
    * so engines agree bit-for-bit after the shared round-at-6 emission.
    *
    * Plan shape (100 TB posture): ONE map-side-combined hash aggregate
    * folds the corpus to the label-vocabulary-bounded contingency table;
    * marginals, the chance term and the totals are aggregates over that
    * skinny frame. No window, no corpus-scale join; the only crossJoin
    * is the 1-row scalar attach.
    */
  def cohensKappa(df: DataFrame, colA: String, colB: String): DataFrame = {
    val cont = df
      .filter(col(colA).isNotNull && col(colB).isNotNull)
      .groupBy(col(colA).cast("string").as("__a"),
        col(colB).cast("string").as("__b"))
      .agg(count(lit(1)).as("__n"))
    val rows = cont.groupBy("__a").agg(sum("__n").as("__ra"))
    val cols = cont.groupBy("__b").agg(sum("__n").as("__cb"))
    val chance = rows.join(cols, col("__a") === col("__b"))
      .agg(coalesce(sum(col("__ra").cast("decimal(19,0)") *
        col("__cb").cast("decimal(19,0)")), lit(0).cast("decimal(38,0)"))
        .as("__e"))
    val tD = col("__t").cast("decimal(19,0)")
    val dD = col("__d").cast("decimal(19,0)")
    cont
      .agg(coalesce(sum("__n"), lit(0L)).as("__t"),
        coalesce(sum(when(col("__a") === col("__b"), col("__n"))
          .otherwise(0L)), lit(0L)).as("__d"))
      .crossJoin(chance)
      .select(col("__t").as("n"), col("__d").as("n_agree"),
        (round(col("__d").cast("double") / col("__t").cast("double"), 6)
          + lit(0.0)).as("po"),
        (round(col("__e").cast("double") /
          (col("__t").cast("double") * col("__t").cast("double")), 6)
          + lit(0.0)).as("pe"),
        (when(tD * tD =!= col("__e"),
          round((tD * dD - col("__e")).cast("double") /
            (tD * tD - col("__e")).cast("double"), 6)) + lit(0.0))
          .as("kappa"))
  }

  /** Krippendorff's alpha inter-annotator agreement (nominal metric;
    * Krippendorff 2004) — the [[cohensKappa]] generalization a labeling
    * pipeline needs once raters vary per item: ANY number of raters,
    * MISSING ratings allowed (units keep whatever ratings they have;
    * units with fewer than two are unpairable and drop out). α = 1 −
    * D_o/D_e over the coincidence matrix; with the nominal distance the
    * terms collapse to per-unit counts:
    *
    *   D_o = Σ_u (m_u² − Σ_c n_uc²) / (m_u − 1)
    *   D_e = (n² − Σ_c n_c²) / (n − 1)
    *
    * where n_uc = ratings of value c in unit u, m_u = Σ_c n_uc, and the
    * marginals n_c count values across pairable units only.
    *
    * Determinism: every numerator is INTEGER-EXACT in DECIMAL(38,0);
    * the only non-exact step is each unit's D_o term (denominators
    * m_u − 1 differ per unit), which is IEEE-divided from exact
    * integers, rounded to 9 dp and DECIMAL-summed — order-independent,
    * so engines agree bit-for-bit after the shared round-at-6 emission.
    * α is NULL when D_e = 0 (all pairable ratings share one value) or
    * no pairable unit exists — agreement is undefined, matching the
    * kappa convention.
    *
    * Plan shape (100 TB posture): ONE hash aggregate folds ratings to
    * the (unit, value) frame; the per-unit moments, the marginals and
    * both totals are aggregates over that skinny frame (values join
    * back through a key-only left-semi). No window, no corpus-scale
    * join; the only crossJoin is the 1-row scalar attach.
    *
    * Output one row: (n_units, n_ratings, d_obs, d_exp, alpha).
    */
  def krippendorffAlpha(df: DataFrame, unitCol: String,
      valueCol: String): DataFrame = {
    val dec = "decimal(19,0)"
    val r = df.filter(col(unitCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(unitCol).as("__u"), col(valueCol).cast("string").as("__v"))
      .agg(count(lit(1)).as("__nuc"))
    val units = r.groupBy("__u")
      .agg(sum("__nuc").as("__m"),
        sum(col("__nuc").cast(dec) * col("__nuc").cast(dec)).as("__ss"))
      .filter(col("__m") >= 2)
    val doSum = units.agg(
      coalesce(sum(
        round((col("__m").cast(dec) * col("__m").cast(dec) - col("__ss"))
            .cast("double") / (col("__m") - 1).cast("double"), 9)
          .cast(org.apache.spark.sql.types.DecimalType(28, 9))),
        lit(0).cast(org.apache.spark.sql.types.DecimalType(28, 9))).as("__do"),
      count(lit(1)).as("n_units"))
    val marg = r.join(units.select("__u"), Seq("__u"), "left_semi")
      .groupBy("__v").agg(sum("__nuc").as("__nc"))
    val tot = marg.agg(sum(col("__nc")).as("__n"),
      coalesce(sum(col("__nc").cast(dec) * col("__nc").cast(dec)),
        lit(0).cast("decimal(38,0)")).as("__sc"))
    val nD = col("__n").cast(dec)
    doSum.crossJoin(tot).select(
      col("n_units"),
      coalesce(col("__n"), lit(0L)).as("n_ratings"),
      (round(col("__do").cast("double"), 6) + lit(0.0)).as("d_obs"),
      (round((nD * nD - col("__sc")).cast("double") /
        (col("__n") - 1).cast("double"), 6) + lit(0.0)).as("d_exp"),
      (when(nD * nD =!= col("__sc") && col("__n") > 1,
        round(lit(1.0) - col("__do").cast("double") /
          ((nD * nD - col("__sc")).cast("double") /
            (col("__n") - 1).cast("double")), 6)) + lit(0.0)).as("alpha"))
  }

  def rocAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val byScore = df
      .select(col(scoreCol).as("__s"), col(labelCol).cast("long").as("__y"))
      .groupBy("__s")
      .agg(count(lit(1)).as("__c"), sum(col("__y")).as("__p"))
    val ranked = globalRunningTotal(byScore, "__s", "__c", "__cum")
      .select(col("__c"), col("__p"),
        (lit(2L) * (col("__cum") - col("__c")) + col("__c") + lit(1L))
          .as("__m2"))
    ranked
      .agg(sum(col("__p") * col("__m2")).as("__s2"),
        sum(col("__p")).as("__np"), sum(col("__c")).as("__n"))
      .select(
        when(col("__np") > 0 && col("__n") > col("__np"),
          round((col("__s2") - col("__np") * (col("__np") + lit(1L)))
              .cast("double") /
            (lit(2.0) * col("__np") * (col("__n") - col("__np"))), 6)
            + lit(0.0))
          .as("auc"),
        col("__np").as("n_pos"), (col("__n") - col("__np")).as("n_neg"))
  }

  /** Precision–recall AUC by trapezoidal interpolation over the distinct
    * score thresholds — the [[rocAuc]] companion for IMBALANCED gates
    * (a contamination or toxicity filter at 0.1% prevalence can post
    * ROC-AUC 0.99 while its PR-AUC — the number that tracks alert
    * precision — sits near zero; `baseline` = prevalence is what a
    * random classifier scores). Thresholds descend through the distinct
    * scores; each threshold's trapezoid is SELF-CONTAINED (the previous
    * point's TP/count differ from this one's by exactly this score
    * group's own counts), so no lag window exists anywhere:
    * `term = ΔR · (P_i + P_{i−1})/2` with `ΔR = p_i/n_pos`. The curve
    * anchors at (R=0, P=1). Ties share a threshold (one curve point per
    * distinct score).
    *
    * Determinism: TP/FP/counts are exact integers from ONE
    * [[globalRunningTotals]] pass (range-partitioned parallel prefix
    * sums over the score-bounded frame — never a one-task global
    * window); each trapezoid is IEEE from exact integers, rounded to 10
    * then DECIMAL-summed so summation order cannot move a bit, final
    * round 6. Output one row: (pr_auc, baseline, n_pos, n_neg);
    * pr_auc/baseline NULL on an all-negative or empty input.
    */
  def prAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame =
    prAucFromScoreCounts(df
      .select(col(scoreCol).as("__s"), col(labelCol).cast("long").as("__y"))
      .groupBy("__s")
      .agg(count(lit(1)).as("__c"), sum(col("__y")).as("__p")))

  /** [[prAuc]] from a pre-aggregated per-distinct-score count frame
    * `(__s, __c rows, __p positives)` — the entry point streaming state
    * folds into (e25): per-score counts merge ADDITIVELY across batches,
    * so the cumulative frame here IS what the batch operator would
    * aggregate from the full history.
    */
  private[graft] def prAucFromScoreCounts(byScore: DataFrame): DataFrame = {
    val cum = globalRunningTotals(byScore, Seq(col("__s")),
      Seq("__c", "__p"))
    val totals = byScore.agg(
      coalesce(sum(col("__c")), lit(0L)).as("__n"),
      coalesce(sum(col("__p")), lit(0L)).as("__np"))
    val tp = col("__np") - col("__p_cum") + col("__p")
    val cnt = col("__n") - col("__c_cum") + col("__c")
    val tpPrev = col("__np") - col("__p_cum")
    val cntPrev = col("__n") - col("__c_cum")
    val pi = tp.cast("double") / cnt.cast("double")
    val pPrev = when(cntPrev === 0, lit(1.0))
      .otherwise(tpPrev.cast("double") / cntPrev.cast("double"))
    val term = when(col("__np") === 0, lit(0.0))
      .otherwise((col("__p").cast("double") / col("__np").cast("double")) *
        ((pi + pPrev) / lit(2.0)))
    cum.crossJoin(broadcast(totals))
      .select(col("__n"), col("__np"),
        round(term, 10).cast("decimal(28,12)").as("__t"))
      .groupBy("__n", "__np")
      .agg(sum(col("__t")).as("__area"))
      .select(
        (when(col("__np") > 0,
          round(col("__area").cast("double"), 6)) + lit(0.0)).as("pr_auc"),
        (when(col("__n") > 0,
          round(col("__np").cast("double") / col("__n").cast("double"), 6))
          + lit(0.0)).as("baseline"),
        col("__np").as("n_pos"), (col("__n") - col("__np")).as("n_neg"))
  }

  /** Classifier calibration table (reliability diagram): predictions in
    * [0, 1] fall into `bins` equal-width buckets; per bucket the row
    * count, the EXACT prediction sum (DECIMAL-routed so summation order
    * can't wiggle the last bit), positives, and the empirical positive
    * rate. A well-calibrated filter has frac_pos ≈ sum_pred/n per bin.
    *
    * Plan shape: map-only bin assignment + ONE hash aggregate over ≤
    * `bins` groups. Nothing else moves.
    */
  def calibrationBins(df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"need >= 2 calibration bins, got $bins")
    df.select(
        least(floor(col(scoreCol) * bins), lit(bins - 1)).cast("int")
          .as("bin"),
        col(scoreCol).as("__s"), col(labelCol).cast("long").as("__y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(col("__s").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast("double")
          .as("sum_pred"),
        sum(col("__y")).as("n_pos"))
      .withColumn("frac_pos",
        round(col("n_pos").cast("double") / col("n"), 6) + lit(0.0))
  }

  /** [[calibrationBins]] from the same per-distinct-score count frame
    * [[prAucFromScoreCounts]] consumes: the per-bin prediction sum is
    * Σ score·count over the bin's distinct scores — DECIMAL arithmetic
    * is exact, so multiplying a score by its multiplicity equals summing
    * it per row (spec-pinned against the row-level operator), and ONE
    * state store serves both drift reports.
    */
  private[graft] def calibrationFromScoreCounts(byScore: DataFrame,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"need >= 2 calibration bins, got $bins")
    byScore.select(
        least(floor(col("__s") * bins), lit(bins - 1)).cast("int").as("bin"),
        col("__s"), col("__c"), col("__p"))
      .groupBy("bin")
      .agg(sum(col("__c")).as("n"),
        sum(col("__s").cast(org.apache.spark.sql.types.DecimalType(18, 6)) *
          col("__c")).cast("double").as("sum_pred"),
        sum(col("__p")).as("n_pos"))
      .withColumn("frac_pos",
        round(col("n_pos").cast("double") / col("n"), 6) + lit(0.0))
  }

  /** Per-class precision / recall / F1 over (truth, predicted) label
    * pairs — the evaluation readout every classifier in the pipeline
    * (t54's NB, t31's language-ID, any quality filter) reports. A class
    * is any label appearing on EITHER side; never-predicted classes get
    * fp = 0 and NULL precision, never-true classes fn = 0 and NULL
    * recall (0/0 is undefined, the textbook convention); F1 is NULL
    * unless both terms exist and p + r > 0.
    *
    * Determinism: tp/fp/fn are exact integers; precision and recall are
    * ONE integer-ratio division each (IEEE-identical across engines),
    * F1 one expression over those two doubles — no summation of
    * doubles anywhere, so no DECIMAL routing is needed.
    *
    * Plan shape (100 TB posture): ONE map-side-combined hash aggregate
    * folds the pair frame to the |classes|²-bounded confusion table;
    * everything after is joins/aggregates over that skinny frame. No
    * window, no corpus-scale join.
    * Output: (label, tp, fp, fn, precision, recall, f1).
    */
  def classifierEval(df: DataFrame, truthCol: String,
      predCol: String): DataFrame =
    classifierEvalFromConfusion(df
      .filter(col(truthCol).isNotNull && col(predCol).isNotNull)
      .groupBy(col(truthCol).cast("string").as("__t"),
        col(predCol).cast("string").as("__p"))
      .agg(count(lit(1)).as("__n")))

  /** The [[classifierEval]] metric tail over a pre-built confusion frame
    * (`__t`, `__p`, `__n`) — split out so the streaming evaluation
    * monitor computes its metrics from SUMMED count deltas through the
    * identical arithmetic (drained == batch, one oracle). `cont` must
    * carry one row per (truth, predicted) pair; both producers group
    * before calling.
    */
  private[graft] def classifierEvalFromConfusion(
      confusion: DataFrame): DataFrame = {
    // the confusion table feeds FOUR consumers (classes, diagonal, both
    // marginals) — left lazy, the producer re-aggregates per consumer
    val cont = confusion.localCheckpoint(eager = true)
    val classes = cont.select(col("__t").as("label"))
      .union(cont.select(col("__p").as("label"))).distinct()
    val diag = cont.filter(col("__t") === col("__p"))
      .select(col("__t").as("label"), col("__n").as("__tp"))
    val predTotals = cont.groupBy(col("__p").as("label"))
      .agg(sum(col("__n")).as("__pred"))
    val truthTotals = cont.groupBy(col("__t").as("label"))
      .agg(sum(col("__n")).as("__truth"))
    val tp = coalesce(col("__tp"), lit(0L))
    val pd = tp.cast("double") / col("__pred").cast("double")
    val rd = tp.cast("double") / col("__truth").cast("double")
    classes
      .join(diag, Seq("label"), "left")
      .join(predTotals, Seq("label"), "left")
      .join(truthTotals, Seq("label"), "left")
      .select(col("label"),
        tp.as("tp"),
        (coalesce(col("__pred"), lit(0L)) - tp).as("fp"),
        (coalesce(col("__truth"), lit(0L)) - tp).as("fn"),
        (when(col("__pred") > 0, round(pd, 6)) + lit(0.0)).as("precision"),
        (when(col("__truth") > 0, round(rd, 6)) + lit(0.0)).as("recall"),
        (when(col("__pred") > 0 && col("__truth") > 0 && pd + rd > 0,
          round(lit(2.0) * pd * rd / (pd + rd), 6)) + lit(0.0)).as("f1"))
  }

  /** Ranked-retrieval evaluation — the readout harness for the retrieval
    * family (b02's BM25, b03's hybrid fusion, any (query, doc, rank)
    * run): MRR@k, recall@k, and graded nDCG@k against a qrels frame
    * (query_id, doc_id, grade >= 1), pooled over queries.
    *
    * Scale posture: the run is cut to rank <= k BEFORE the qrels join
    * (k rows per query), per-query aggregates are hash aggs over those
    * k rows, and the ideal-DCG window partitions by query over the
    * qrels frame alone — judged relevance is assessment-bounded (tiny
    * per query by construction), never corpus-bounded. The corpus never
    * appears: whoever produced the run paid that cost.
    *
    * The DCG discount uses the NATURAL log (1/ln(rank+1)) rather than
    * the textbook log₂ — the two differ by the constant 1/ln 2, which is
    * COMMON to DCG and ideal DCG and cancels in the reported nDCG ratio,
    * and ln is the one transcendental with an established IEEE-identical
    * cross-engine record here (the b02/t53 precedent; log2 has none).
    *
    * Determinism (the b03 convention): per-rank DCG terms, per-query
    * reciprocal ranks, recalls, and nDCG ratios all round to 9 decimals
    * and pool as DECIMAL(28,9) sums; the pooled means divide once and
    * round to 6. Queries with no relevant doc retrieved contribute 0 to
    * MRR and recall and 0 nDCG (their DCG is 0; IDCG > 0 since every
    * query carries qrels — enforced by the inner queries frame).
    * Output: ONE row (n_queries, mrr, recall_at_k, ndcg).
    */
  def retrievalEval(runs: DataFrame, qrels: DataFrame,
      k: Int = 10): DataFrame =
    retrievalPooled(retrievalPerQuery(runs, qrels, k))

  /** Per-query metric rows (query_id, __rr, __recall, __ndcg as
    * DECIMAL(28,9)) — the additive half of [[retrievalEval]]: rows for
    * disjoint query sets union to the full frame, which is what the
    * streaming twin ([[graft.streaming.StreamingRetrievalEval]]) banks
    * per batch.
    */
  private[graft] def retrievalPerQuery(runs: DataFrame, qrels: DataFrame,
      k: Int): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 9)
    val hits = runs.filter(col("rank") <= k)
      .join(qrels.filter(col("grade") > 0), Seq("query_id", "doc_id"))
    val perQ = hits.groupBy(col("query_id"))
      .agg(
        sum(round((pow(lit(2.0), col("grade").cast("double")) - lit(1.0)) /
            log(col("rank").cast("double") + lit(1.0)), 9).cast(dec))
          .as("__dcg"),
        min(col("rank")).as("__first"),
        count(lit(1)).as("__found"))
    val irank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("grade").desc, col("doc_id").asc)
    val ideal = qrels.filter(col("grade") > 0)
      .withColumn("__ir", row_number().over(irank))
      .groupBy(col("query_id"))
      .agg(
        sum(when(col("__ir") <= k,
            round((pow(lit(2.0), col("grade").cast("double")) - lit(1.0)) /
              log(col("__ir").cast("double") + lit(1.0)), 9).cast(dec))
          .otherwise(lit(0).cast(dec))).as("__idcg"),
        count(lit(1)).as("__nrel"))
    val zero = lit(0).cast(dec)
    ideal.join(perQ, Seq("query_id"), "left")
      .select(col("query_id"),
        when(col("__first").isNotNull,
            round(lit(1.0) / col("__first").cast("double"), 9).cast(dec))
          .otherwise(zero).as("__rr"),
        round(coalesce(col("__found"), lit(0L)).cast("double") /
            col("__nrel").cast("double"), 9).cast(dec).as("__recall"),
        round(coalesce(col("__dcg"), zero).cast("double") /
            col("__idcg").cast("double"), 9).cast(dec).as("__ndcg"))
  }

  /** The pooled tail over a [[retrievalPerQuery]] frame — DECIMAL sums,
    * one division per metric, round-6 means.
    */
  private[graft] def retrievalPooled(perQuery: DataFrame): DataFrame =
    perQuery.groupBy()
      .agg(count(lit(1)).as("n_queries"),
        sum(col("__rr")).as("__srr"),
        sum(col("__recall")).as("__sre"),
        sum(col("__ndcg")).as("__snd"))
      .select(col("n_queries"),
        round(col("__srr").cast("double") / col("n_queries").cast("double"), 6)
          .as("mrr"),
        round(col("__sre").cast("double") / col("n_queries").cast("double"), 6)
          .as("recall_at_k"),
        round(col("__snd").cast("double") / col("n_queries").cast("double"), 6)
          .as("ndcg"))
}
