package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Event-sequence operators over (user, event_type, timestamp) streams —
 * the session/conversion analytics a training-data pipeline runs on its
 * interaction logs. The reference engine processes rows independently
 * (`MigrateTableTask.java:311` — no sequence operators at all); these
 * are the set-level sequence statistics, built shuffle-lean.
 */
object Events {

  /** Ordered k-stage conversion funnel: per user, the EARLIEST-completion
    * chain through `stages` — `t_<stage1>` is the user's first stage-1
    * event, `t_<stageN>` the first stage-N event strictly after the
    * chain's stage-(N−1) time, and `stage` the number of stages reached.
    * Users without a stage-1 event are absent (they are not in the
    * funnel). Greedy earliest-first is completeness-optimal: if ANY
    * strictly-increasing stage chain exists for a user, the
    * earliest-first walk finds one of equal length (exchanging any chain
    * prefix for the earlier greedy prefix only loosens the constraint on
    * the suffix).
    *
    * Plan shape (100 TB posture): k skinny min-aggregates (one per
    * stage, map-side combined — the event table never shuffles whole,
    * only (user, chain-times) rows move) chained by k−1 equi-joins on
    * the user key, then k−1 left joins assembling the report. No window,
    * no per-user sequence sort, no cartesian. Timestamps are compared
    * with `>` on whatever orderable type `tsCol` holds.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.size >= 2, s"a funnel needs >= 2 stages, got $stages")
    require(stages.distinct.size == stages.size,
      s"funnel stages must be distinct, got $stages")
    val tCols = stages.map(st => s"t_$st")
    var acc = events.filter(col(typeCol) === stages.head)
      .groupBy(userCol).agg(min(col(tsCol)).as(tCols.head))
    val chain = Seq.newBuilder[DataFrame]
    chain += acc
    for (i <- 1 until stages.size) {
      acc = events.filter(col(typeCol) === stages(i))
        .join(acc, Seq(userCol))
        .filter(col(tsCol) > col(tCols(i - 1)))
        .groupBy((userCol +: tCols.take(i)).map(col): _*)
        .agg(min(col(tsCol)).as(tCols(i)))
      chain += acc
    }
    val stagesReached: Column = tCols.tail.foldLeft(lit(1)) {
      (n, c) => n + when(col(c).isNotNull, 1).otherwise(0)
    }
    chain.result().zipWithIndex.tail
      .foldLeft(chain.result().head) { case (out, (st, i)) =>
        out.join(st.select(col(userCol), col(tCols(i))), Seq(userCol), "left")
      }
      .select((col(userCol) +: tCols.map(col)) :+
        stagesReached.as("stage"): _*)
  }

  /** Funnel latency histogram — per CONSECUTIVE stage pair, the
    * distribution of how long conversion took, as power-of-two latency
    * buckets (`bucket = length of the duration's binary form`, the
    * HdrHistogram-style integer log2 — no IEEE log at bucket
    * boundaries): the "users click within minutes but purchase within
    * days" report behind funnel-latency SLOs and attribution-window
    * choices. Durations come from the [[funnel]]'s earliest-completion
    * chain, so they are the canonical (greedy) chain's latencies;
    * funnel's strict `>` makes every duration ≥ 1 unit.
    *
    * Output: (from_stage, to_stage, bucket, n_users, min_dur, max_dur)
    * — durations in `tsCol` units.
    *
    * Plan shape (100 TB posture): the funnel frame (k skinny
    * min-aggregates, user-keyed) computes ONCE; each stage pair is a
    * map-only filter + ONE small hash aggregate over ≤ 64 buckets.
    * Integer end to end.
    */
  def timeToConvert(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    val f = funnel(events, userCol, typeCol, tsCol, stages)
      .localCheckpoint(eager = true)
    stages.sliding(2).toSeq.map { case Seq(a, b) =>
      f.filter(col(s"t_$b").isNotNull)
        .select((col(s"t_$b") - col(s"t_$a")).as("__d"))
        .groupBy(length(bin(col("__d"))).cast("int").as("bucket"))
        .agg(count(lit(1)).as("n_users"),
          min(col("__d")).as("min_dur"), max(col("__d")).as("max_dur"))
        .select(lit(a).as("from_stage"), lit(b).as("to_stage"),
          col("bucket"), col("n_users"), col("min_dur"), col("max_dur"))
    }.reduce(_.unionByName(_))
  }

  /** RFM quartile scoring over per-user totals `(userCol, recency_ns,
    * frequency, monetary)` — each metric cut into exact quartiles via
    * the [[CorpusStats.curriculumBuckets]] histogram machinery (bounded
    * metric domains: ns timestamps, counts, 6-decimal sums; never an
    * ntile window over the user corpus), plus the concatenated segment
    * label. Shared by the batch g10 query and the streaming
    * [[graft.streaming.StreamingRfm]] report, so the two stay
    * definitionally identical.
    */
  def scoreRfm(per: DataFrame, userCol: String): DataFrame = {
    val r = CorpusStats.curriculumBuckets(per, "recency_ns", 4)
      .withColumnRenamed("bucket", "r_score")
    val f = CorpusStats.curriculumBuckets(r, "frequency", 4)
      .withColumnRenamed("bucket", "f_score")
    val m = CorpusStats.curriculumBuckets(f, "monetary", 4)
      .withColumnRenamed("bucket", "m_score")
    m.select(col(userCol), col("recency_ns"), col("frequency"),
      (round(col("monetary"), 6) + lit(0.0)).as("monetary"),
      col("r_score"), col("f_score"), col("m_score"),
      concat(col("r_score").cast("string"), col("f_score").cast("string"),
        col("m_score").cast("string")).as("segment"))
  }

  /** Rolling 7-day distinct active users per day — the engagement
    * headline metric. Distinct counts do not sum across days, so the
    * classic formulation is a per-day window over user sets; here it
    * stays EQUI-JOIN-ONLY: the distinct (day, user) pairs each replicate
    * onto the 7 report days they support (`explode(sequence(0,6))` —
    * a 7× blow-up of an already day-deduplicated skinny frame), one
    * `count(DISTINCT user)` hash aggregate per report day, and a
    * left-semi join restricts the report to days that actually have
    * events. `tsCol` holds epoch NANOSECONDS (the engine-wide `t()`
    * convention); `windowDays` generalizes the 7.
    * Output: (day, n_active) — `day` = epoch days.
    */
  def rollingActiveUsers(events: DataFrame, userCol: String, tsCol: String,
      windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, "window must span at least one day")
    val dayNs = 86400L * 1000000000L
    val du = events.select(
        expr(s"$tsCol div ${dayNs}L").as("__day"), col(userCol))
      .distinct()
    val days = du.select(col("__day")).distinct()
    val contrib = du.select(
      explode(sequence(lit(0), lit(windowDays - 1))).as("__o"),
      col("__day"), col(userCol))
      .select((col("__day") + col("__o")).as("__day"), col(userCol))
    contrib.join(days, Seq("__day"), "left_semi")
      .groupBy(col("__day").as("day"))
      .agg(countDistinct(col(userCol)).as("n_active"))
      .select(col("day"), col("n_active"))
  }

  /** Linear multi-touch attribution: every touch event in the
    * `windowSize` span strictly BEFORE a conversion shares that
    * conversion's value equally (credit = value / n_touches each), the
    * marketing-analytics counterpart of g11's last-touch rule. Per touch
    * type the report sums credited touches and total credit. Per-pair
    * credit is rounded to 6 decimals THEN summed as DECIMAL, so the
    * total is summation-order-independent and engines agree bit-for-bit.
    * `tsCol` must be integral (the epoch-micros convention); conversions
    * with zero in-window touches earn no rows.
    *
    * Plan shape (100 TB posture): ONE user-keyed equi-join pairs touches
    * with conversions (the residual time-range predicate rides the join;
    * pair degree is bounded by per-user activity × conversion rate — a
    * hot user is the v02 skew report's job to surface), ONE
    * conversion-keyed hash aggregate computes the touch census, a
    * map-only unpivot emits (type, count) terms, and ONE type-bounded
    * aggregate finishes. No window, no cartesian.
    *
    * Hot-user posture: when the v02 skew report surfaces a user holding
    * a disproportionate share of events (a bot, a shared service
    * account), pass `saltFactor > 1` — the pair join routes through
    * [[SkewJoin.saltedJoin]] (touches salted, conversions replicated
    * `saltFactor`×), spreading the hot user's pair enumeration over
    * `saltFactor` reducers. Results are identical either way
    * (spec-pinned on a planted hot user); the default stays unsalted
    * because replication taxes every NON-hot user too.
    */
  def linearAttribution(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, valueCol: String, idCol: String,
      conversionType: String, touchTypes: Seq[String],
      windowSize: Long, saltFactor: Int = 1): DataFrame = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(touchTypes.distinct.size == touchTypes.size,
      s"touch types must be distinct, got $touchTypes")
    require(!touchTypes.contains(conversionType),
      "the conversion type cannot also be a touch type")
    require(windowSize > 0, "attribution window must be positive")
    val conv = events.filter(col(typeCol) === conversionType)
      .select(col(idCol).as("__pid"), col(userCol).as("__u"),
        col(tsCol).as("__pts"), col(valueCol).as("__v"))
    val touches = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol).as("__u"), col(tsCol).as("__tts"),
        col(typeCol).as("__tt"))
    val joined =
      if (saltFactor > 1) SkewJoin.saltedJoin(touches, conv, Seq("__u"), saltFactor)
      else touches.join(conv, Seq("__u"))
    val pairs = joined
      .filter(col("__tts") < col("__pts") &&
        col("__tts") >= col("__pts") - windowSize)
    val census = pairs.groupBy(col("__pid"), col("__v"))
      .agg(count(lit(1)).as("__n"),
        touchTypes.map(tt =>
          sum(when(col("__tt") === tt, 1L).otherwise(0L)).as(s"__c_$tt")): _*)
    val terms = census.select(col("__v"), col("__n"),
        explode(map(touchTypes.flatMap(tt =>
          Seq(lit(tt), col(s"__c_$tt"))): _*)).as(Seq("touch_type", "__cnt")))
      .filter(col("__cnt") > 0)
    terms
      .select(col("touch_type"), col("__cnt"),
        round(col("__v") * col("__cnt") / col("__n"), 6)
          .cast(org.apache.spark.sql.types.DecimalType(18, 6)).as("__credit"))
      .groupBy("touch_type")
      .agg(sum(col("__cnt")).as("n_credited"),
        sum(col("__credit")).cast("double").as("total_credit"))
  }

  /** FIRST-touch attribution — completing the attribution triple next to
    * last-touch (g11) and linear (g13): every conversion credits the
    * EARLIEST same-user touch within the window (ties on timestamp break
    * by touch type ascending — deterministic), the acquisition-channel
    * view of the same pairing g13 splits evenly. Conversions with no
    * in-window touch surface as the `(none)` row rather than silently
    * dropping — the unattributed mass IS a channel report's denominator.
    *
    * Output: (touch_type, n_conversions, total_value) with DECIMAL-routed
    * value sums (order-free).
    *
    * Plan shape (100 TB posture): the [[linearAttribution]] pair
    * construction verbatim (user-keyed equi-join + window filter, salted
    * escape hatch for hot users), then ONE min(struct) aggregate per
    * conversion and one touch-type-bounded aggregate — no corpus window.
    */
  def firstTouchAttribution(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, valueCol: String, idCol: String,
      conversionType: String, touchTypes: Seq[String],
      windowSize: Long, saltFactor: Int = 1): DataFrame = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(touchTypes.distinct.size == touchTypes.size,
      s"touch types must be distinct, got $touchTypes")
    require(!touchTypes.contains(conversionType),
      "the conversion type cannot also be a touch type")
    require(windowSize > 0, "attribution window must be positive")
    val conv = events.filter(col(typeCol) === conversionType)
      .select(col(idCol).as("__pid"), col(userCol).as("__u"),
        col(tsCol).as("__pts"), col(valueCol).as("__v"))
    val touches = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol).as("__u"), col(tsCol).as("__tts"),
        col(typeCol).as("__tt"))
    val joined =
      if (saltFactor > 1) SkewJoin.saltedJoin(touches, conv, Seq("__u"), saltFactor)
      else touches.join(conv, Seq("__u"))
    val pairs = joined
      .filter(col("__tts") < col("__pts") &&
        col("__tts") >= col("__pts") - windowSize)
    val first = pairs.groupBy(col("__pid"))
      .agg(min(struct(col("__tts"), col("__tt"))).as("__f"))
    conv.join(first, Seq("__pid"), "left")
      .select(coalesce(col("__f.__tt"), lit("(none)")).as("touch_type"),
        col("__v"))
      .groupBy("touch_type")
      .agg(count(lit(1)).as("n_conversions"),
        sum(col("__v").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast("double").as("total_value"))
  }

  /** Per-key union length of possibly-overlapping intervals — the
    * "total active time" measure (billable session seconds, device
    * uptime, ad-exposure time) that naive `sum(end − start)` double
    * counts: intervals sorted within each key, each contributing
    * `max(0, end − max(start, running-max of previous CLAMPED ends
    * greatest(s, e)))` — the classic sweep-line identity. Touching
    * intervals merge; an interval with `end < start` contributes no
    * length but still marks its position. Also reports the merged
    * disjoint-block count (maximal connected components of the clamped
    * intervals — the representation the streaming form persists). Bounds must be integral (the epoch-nanos
    * convention — fractional bounds would truncate silently).
    *
    * Output: (keyCol, n_intervals, covered, n_blocks).
    *
    * Plan shape (100 TB posture): ONE key-partitioned window (the
    * natural per-user partitioning — never a corpus-global window) and
    * ONE hash aggregate; integer arithmetic end to end. A hot key is
    * the v02 skew report's job to surface.
    */
  def intervalCoverage(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types._
    Seq(startCol, endCol).foreach { c =>
      df.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType => ()
        case t => throw new IllegalArgumentException(
          s"intervalCoverage requires integral bounds, '$c' is $t")
      }
    }
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__s"), col("__e"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // the running max clamps ends to >= their own start (a degenerate
    // interval still MARKS its position), so n_blocks counts maximal
    // connected components of the clamped intervals — the property the
    // streaming state (merged disjoint blocks, e21) preserves exactly;
    // `covered` is unaffected: the extra clamp terms are starts <= the
    // current start, so max(s_i, pm) never changes
    df.select(col(keyCol), col(startCol).as("__s"), col(endCol).as("__e"))
      .withColumn("__pm", max(greatest(col("__e"), col("__s"))).over(w))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_intervals"),
        sum(greatest(
          col("__e") - greatest(col("__s"), coalesce(col("__pm"), col("__s"))),
          lit(0L))).as("covered"),
        sum(when(col("__pm").isNull || col("__s") > col("__pm"), 1L)
          .otherwise(0L)).as("n_blocks"))
  }

  /** Per-key inter-event burstiness (Goh & Barabási 2008): over the
    * gaps between a key's consecutive events, the coefficient of
    * variation `CV = σ/μ` and the burstiness parameter
    * `B = (σ−μ)/(σ+μ) ∈ [−1, 1)` — B ≈ −1 is a metronome (bots, cron),
    * B ≈ 0 is Poisson (organic arrivals), B → 1 is bursty (attack
    * traffic, flash crowds). The behavioral-signature statistic behind
    * bot filtering and traffic modeling. Keys need at least 2 events;
    * with population variance, `σ² = (n·Σg² − (Σg)²)/n²`, so both
    * emissions reduce to `√D` vs `S = Σg` with `D = n·Σg² − (Σg)²`
    * computed EXACTLY in DECIMAL(38,0) — only the final √/divisions are
    * IEEE. An all-zero-gap key (S = 0, simultaneous events) is pinned to
    * CV = 0, B = 0 rather than 0/0.
    *
    * Output: (keyCol, n_gaps, mean_gap, cv, burstiness) — gap units
    * follow `tsCol`; mean_gap is the floor-divided integral mean so the
    * only IEEE emissions are the two dimensionless ratios.
    *
    * Plan shape (100 TB posture): ONE key-partitioned lag window (the
    * natural per-user partitioning, never corpus-global) feeding ONE
    * hash aggregate of three exact moments; a hot key is the v02 skew
    * report's job to surface. Σg² overflow fails loudly (DECIMAL
    * arithmetic), never wraps.
    */
  def burstiness(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__t"), col("__i"))
    val g = df.select(col(keyCol), col(tsCol).as("__t"), col(tieCol).as("__i"))
      .withColumn("__prev", lag(col("__t"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .select(col(keyCol), (col("__t") - col("__prev")).as("__g"))
    val agg = g.groupBy(col(keyCol)).agg(
      count(lit(1)).as("__n"),
      sum(col("__g")).as("__s"),
      sum(col("__g").cast("decimal(38,0)") * col("__g").cast("decimal(38,0)"))
        .as("__sq"))
    val dD = (col("__n").cast("decimal(38,0)") * col("__sq") -
      col("__s").cast("decimal(38,0)") * col("__s").cast("decimal(38,0)"))
      .cast("double")
    val sd = col("__s").cast("double")
    agg.select(col(keyCol), col("__n").as("n_gaps"),
      expr("__s div __n").as("mean_gap"),
      when(col("__s") === 0, lit(0.0))
        .otherwise(round(sqrt(dD) / sd, 6) + lit(0.0)).as("cv"),
      when(col("__s") === 0, lit(0.0))
        .otherwise(round((sqrt(dD) - sd) / (sqrt(dD) + sd), 6) + lit(0.0))
        .as("burstiness"))
  }

  /** Top user paths: per (user, gap-based session) the ordered
    * event-type sequence joined with `">"`, counted corpus-wide, top `k`
    * paths by frequency — the navigation-pattern mining behind "what do
    * users actually do" dashboards. Ordering inside a session is
    * `(tsCol, idCol)` so concurrent events resolve deterministically;
    * ranking ties resolve by path string (the
    * [[TextAnalysis.topTokensFromCounts]] contract).
    *
    * Plan shape (100 TB posture): ONE session aggregation (gap sessions
    * via `session_window`, per-session `collect_list` bounded by session
    * length — sessions are human-scale no matter the corpus), ONE
    * path-bounded hash aggregate for counts, and ONE bounded top-`k` heap
    * — no global sort, no corpus-wide window. `tsCol` must be a
    * timestamp column.
    *
    * Output: (rank, path, n_sessions), rank 1-based.
    */
  def topPaths(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String, gap: String = "30 minutes",
      k: Int = 20): DataFrame = {
    val sessions = events
      .groupBy(col(userCol), session_window(col(tsCol), gap))
      .agg(array_join(transform(array_sort(collect_list(
          struct(col(tsCol), col(idCol), col(typeCol).as("__t")))),
        x => x.getField("__t")), ">").as("path"))
    val counts = sessions.groupBy("path").agg(count(lit(1)).as("n"))
    TextAnalysis.topTokensFromCounts(
        counts.select(col("path").as("token"), col("n")), k)
      .select(col("rank"), col("token").as("path"),
        col("n").as("n_sessions"))
  }

  /** Kaplan–Meier / Nelson–Aalen survival over per-key event lifetimes —
    * the churn curve (Kaplan & Meier 1958; Nelson 1972; Aalen 1978): a
    * key is "born" at its first event and "dies" at its last, UNLESS
    * that last event falls within `censorHorizon` of the corpus's
    * newest observation — such keys are RIGHT-CENSORED (still alive;
    * treating them as deaths is the classic retention-analysis bias
    * this estimator exists to fix). At each distinct lifetime `t` (in
    * the integer time unit of `tsCol`, micros by the events
    * convention): the at-risk count, deaths, censorings, the
    * Nelson–Aalen cumulative hazard Σ dᵢ/nᵢ, and the LOG Kaplan–Meier
    * survival Σ ln(1 − dᵢ/nᵢ) — emitted in log space deliberately:
    * exponentiating would stack a second libm call per row, while the
    * log form needs only `ln` under the t36 integer-grid convention
    * (terms round onto the 1e-6 grid as longs, cumulate exactly, ONE
    * final division per row — engines cannot disagree). If a time's
    * deaths exhaust its risk set, survival is exactly 0 and `km_log_s`
    * is NULL from that point on (log of 0), spec-pinned.
    *
    * Plan shape (100 TB posture): one key-bounded (min, max) aggregate,
    * one scalar max attach, one duration-bounded hash aggregate, then
    * TWO range-partitioned parallel prefix sums
    * ([[CorpusStats.globalRunningTotals]] — never a one-task global
    * window): the first derives at-risk counts, the second cumulates
    * the grid terms. No join beyond 1-row attaches, no corpus window.
    *
    * Output: (t, n_risk, n_death, n_censor, na_cum_hazard, km_log_s)
    * with one row per distinct lifetime.
    */
  def survivalCurve(df: DataFrame, keyCol: String, tsCol: String,
      censorHorizon: Long): DataFrame =
    survivalFromBounds(df
      .select(col(keyCol).as("__k"), col(tsCol).cast("long").as("__t"))
      .groupBy("__k")
      .agg(min(col("__t")).as("__t0"), max(col("__t")).as("__t1")),
      censorHorizon)

  /** [[survivalCurve]] from pre-aggregated per-key lifetime bounds
    * `(__t0, __t1)` — the entry point the streaming monitor folds into
    * (e26): min/max bounds merge associatively across batches, so the
    * cumulative bounds frame IS what the batch operator aggregates from
    * the full history.
    */
  private[graft] def survivalFromBounds(bounds: DataFrame,
      censorHorizon: Long): DataFrame = {
    require(censorHorizon >= 0, "censorHorizon must be non-negative")
    val subj = bounds
      .select((col("__t1") - col("__t0")).as("__dur"), col("__t1"))
    val newest = subj.agg(max(col("__t1")).as("__mx"))
    val perDur = subj.crossJoin(broadcast(newest))
      .select(col("__dur"),
        when(col("__t1") < col("__mx") - lit(censorHorizon), 1L)
          .otherwise(0L).as("__e"))
      .groupBy("__dur")
      .agg(sum(col("__e")).as("n_death"),
        sum(lit(1L) - col("__e")).as("n_censor"))
      .withColumn("__dc", col("n_death") + col("n_censor"))
    val totals = perDur.agg(
      coalesce(sum(col("__dc")), lit(0L)).as("__tot"))
    val risky = CorpusStats
      .globalRunningTotals(perDur, Seq(col("__dur")), Seq("__dc"))
      .crossJoin(broadcast(totals))
      .select(col("__dur"), col("n_death"), col("n_censor"),
        (col("__tot") - col("__dc_cum") + col("__dc")).as("n_risk"))
    val dD = col("n_death").cast("double")
    val nD = col("n_risk").cast("double")
    val prepped = risky
      .withColumn("__hz", round(dD / nD * lit(1e6), 0).cast("long"))
      .withColumn("__ln", when(col("n_death") < col("n_risk"),
        round(log((nD - dD) / nD) * lit(1e6), 0).cast("long"))
        .otherwise(lit(0L)))
      .withColumn("__z",
        when(col("n_death") === col("n_risk"), 1L).otherwise(0L))
    CorpusStats
      .globalRunningTotals(prepped, Seq(col("__dur")),
        Seq("__hz", "__ln", "__z"))
      .select(col("__dur").as("t"), col("n_risk"), col("n_death"),
        col("n_censor"),
        (round(col("__hz_cum").cast("double") / lit(1e6), 6) + lit(0.0))
          .as("na_cum_hazard"),
        when(col("__z_cum") === 0,
          round(col("__ln_cum").cast("double") / lit(1e6), 6) + lit(0.0))
          .as("km_log_s"))
  }

  /** Per-state Shannon entropy of a first-order transition-count frame
    * (the g08 matrix folded to the sequence-predictability scalar):
    * H(from) = −Σ_to p·ln p with p = n/Σn, plus the normalized
    * H/ln(k) ∈ [0,1] (NULL at k = 1, where predictability is trivial).
    * Low entropy = scripted/bot-like flows; high = organic browsing —
    * the session-modeling complement to the burstiness signature.
    *
    * Determinism: each −p·ln p term is IEEE from exact integer ratios,
    * rounded to 9 dp and DECIMAL-summed (order-free), one final
    * round-6 emission; ln(k) divides once.
    *
    * Plan shape (100 TB posture): the input count frame is state-
    * vocabulary-bounded (it already fit g08's output); two hash
    * aggregates and one equi-join over it — nothing corpus-scale.
    *
    * Output: (fromCol, n_transitions, n_targets, entropy, norm_entropy).
    */
  def transitionEntropy(counts: DataFrame, fromCol: String,
      nCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 9)
    // Zero-count rows carry no transition mass but would inflate
    // n_targets and the ln(k) normalizer (a densified count frame is a
    // legitimate caller input) — drop them before anything counts.
    val pos = counts.filter(col(nCol) > 0)
    val tot = pos.groupBy(fromCol)
      .agg(sum(col(nCol)).as("__tot"), count(lit(1)).as("__k"))
    val p = col(nCol).cast("double") / col("__tot").cast("double")
    pos.join(tot, fromCol)
      .select(col(fromCol), col("__tot"), col("__k"),
        round(p * log(p), 9).cast(dec).as("__t"))
      .groupBy(fromCol)
      .agg(max(col("__tot")).as("n_transitions"),
        max(col("__k")).as("n_targets"),
        (round((-sum(col("__t"))).cast("double"), 6) + lit(0.0))
          .as("entropy"),
        (when(max(col("__k")) > 1,
          round((-sum(col("__t"))).cast("double") /
            log(max(col("__k")).cast("double")), 6)) + lit(0.0))
          .as("norm_entropy"))
  }

  /** Markov-chain (removal-effect) multi-touch attribution (Anderl,
    * Becker, von Wangenheim & Schumann 2014, "Mapping the Customer
    * Journey"; see PAPERS.md) — the data-driven alternative to the
    * positional rules (g11 last-touch, g13 linear, g19 first-touch):
    * model journeys as a first-order absorbing Markov chain over the
    * touch channels plus START/CONV/NULL, and credit each channel by
    * how much the conversion probability DROPS when that channel's
    * value is removed (its state contributes zero — equivalently all
    * its inbound edges redirect to NULL):
    * `removal_effect(c) = 1 − P_removed(c)/P_base`, shares normalize
    * the P-drops. Removal can only shrink P (the chain is monotone in
    * state values), so effects are non-negative by construction.
    *
    * Journey model: one journey per user — the touch sequence strictly
    * BEFORE the user's first conversion event (ordered by (ts, tie);
    * post-conversion activity is a different journey and out of scope),
    * absorbed into CONV if the user converts, NULL otherwise; a
    * converting user with no prior touches contributes START→CONV mass
    * (unattributable, kept so P stays honest).
    *
    * Determinism: transition probabilities round to 12; P iterates a
    * FIXED `iterations` rounds of the value recursion
    * p(s) ← Σ_t round(q(s,t)·val(t), 12) with the terms summed as
    * exact scale-12 decimals — both engines run the identical
    * quantized arithmetic, so agreement does not depend on convergence.
    * The final emissions round to 6.
    *
    * Plan shape (100 TB posture): journeys build from ONE user-keyed
    * join (first-conversion key) + ONE user-keyed window (the g08
    * transition machinery); everything after the (from, to, n) hash
    * aggregate is CHANNEL-BOUNDED — the matrix collects as a literal
    * model (the k-means-centroid convention) and the fixed-point runs
    * driver-side on ≤ (channels+3)² numbers. Events never shuffle
    * except by user.
    *
    * Output: one row per touch channel (input order) —
    * (channel, p_base, p_removed, removal_effect, share,
    * attributed_conversions); share/attributed are NULL when the chain
    * has no conversions or no channel moves it.
    */
  def markovAttribution(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, tieCol: String, conversionType: String,
      touchTypes: Seq[String], iterations: Int = 60): DataFrame = {
    require(touchTypes.nonEmpty, "need at least one touch channel")
    require(!touchTypes.contains(conversionType),
      "conversionType must not be a touch channel")
    require(touchTypes.distinct.size == touchTypes.size,
      "touch channels must be distinct")
    require(iterations >= 1, "need at least one iteration")
    val START = "__START__"; val CONV = "__CONV__"; val NULLS = "__NULL__"
    val typed = events
      .filter(col(typeCol).isin((touchTypes :+ conversionType): _*))
      .select(col(userCol).as("__u"), col(typeCol).as("__t"),
        struct(col(tsCol), col(tieCol)).as("__k"))
    val convKeys = typed.filter(col("__t") === conversionType)
      .groupBy("__u").agg(min(col("__k")).as("__ck"))
    val touches = typed.filter(col("__t") =!= conversionType)
      .join(convKeys, Seq("__u"), "left")
      .filter(col("__ck").isNull || col("__k") < col("__ck"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__u").orderBy("__k")
    val seq = touches
      .withColumn("__rn", row_number().over(w))
      .withColumn("__next", lead(col("__t"), 1).over(w))
    val edges = seq.filter(col("__rn") === 1)
      .select(lit(START).as("__from"), col("__t").as("__to"))
      .unionByName(seq.filter(col("__next").isNotNull)
        .select(col("__t").as("__from"), col("__next").as("__to")))
      .unionByName(seq.filter(col("__next").isNull)
        .select(col("__t").as("__from"),
          when(col("__ck").isNotNull, CONV).otherwise(NULLS).as("__to")))
      .unionByName(convKeys
        .join(touches.select("__u").distinct(), Seq("__u"), "left_anti")
        .select(lit(START).as("__from"), lit(CONV).as("__to")))
    val counts = edges.groupBy("__from", "__to")
      .agg(count(lit(1)).as("__n")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val nConv = convKeys.count()
    markovFromCounts(events.sparkSession, counts, nConv, touchTypes,
      iterations)
  }

  /** The [[markovAttribution]] fixed-point tail over a pre-built
    * (from, to) → n transition map — split out so the streaming
    * attribution monitor runs the IDENTICAL quantized arithmetic on its
    * persisted counts (stream/batch equality by construction). The map
    * uses the operator's sentinel states `__START__`/`__CONV__`/
    * `__NULL__`; `nConv` is the converted-journey count the shares
    * scale to.
    */
  private[graft] def markovFromCounts(spark: SparkSession,
      counts: Map[(String, String), Long], nConv: Long,
      touchTypes: Seq[String], iterations: Int): DataFrame = {
    val START = "__START__"; val CONV = "__CONV__"; val NULLS = "__NULL__"
    // ----- driver-side fixed point over the channel-bounded matrix ----
    def round12(x: Double): java.math.BigDecimal =
      new java.math.BigDecimal(java.lang.Double.toString(x))
        .setScale(12, java.math.RoundingMode.HALF_UP)
    val outTot = counts.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val q = counts.map { case ((f, t), n) =>
      (f, t) -> round12(n.toDouble / outTot(f).toDouble).doubleValue()
    }
    val froms = outTot.keys.toSeq.sorted
    def converge(removed: Option[String]): Double = {
      val states = froms.filterNot(removed.contains)
      var p: Map[String, java.math.BigDecimal] =
        states.map(_ -> java.math.BigDecimal.ZERO).toMap
      def value(t: String): Double =
        if (t == CONV) 1.0
        else if (t == NULLS || removed.contains(t)) 0.0
        else p.getOrElse(t, java.math.BigDecimal.ZERO).doubleValue()
      (1 to iterations).foreach { _ =>
        // value() reads the PREVIOUS p: the new map builds strictly
        // before the reassignment
        val next = states.map { s =>
          val terms = q.collect { case ((f, t), qv) if f == s =>
            round12(qv * value(t))
          }
          s -> terms.foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
        }.toMap
        p = next
      }
      p.getOrElse(START, java.math.BigDecimal.ZERO).doubleValue()
    }
    val pBase = converge(None)
    val pRem = touchTypes.map(c => c -> converge(Some(c))).toMap
    // exact decimal drops -> order-free share denominator
    val drops = touchTypes.map(c =>
      c -> round12(pBase).subtract(round12(pRem(c)))).toMap
    val sumDrop = drops.values.foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
    def round6(x: Double): java.lang.Double =
      new java.math.BigDecimal(java.lang.Double.toString(x))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue() + 0.0
    val rows = touchTypes.map { c =>
      val re =
        if (pBase > 0.0) round6(1.0 - pRem(c) / pBase)
        else null.asInstanceOf[java.lang.Double]
      val (share, attributed) =
        if (pBase > 0.0 && sumDrop.signum() > 0) {
          val sh = drops(c).doubleValue() / sumDrop.doubleValue()
          (round6(sh), round6(sh * nConv.toDouble))
        } else (null.asInstanceOf[java.lang.Double],
          null.asInstanceOf[java.lang.Double])
      org.apache.spark.sql.Row(c, round6(pBase), round6(pRem(c)),
        re, share, attributed)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("channel",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("p_base",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("p_removed",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("removal_effect",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("share",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("attributed_conversions",
        org.apache.spark.sql.types.DoubleType)))
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
  }
}
