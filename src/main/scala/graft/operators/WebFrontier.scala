package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Crawl-frontier scheduling — the step that turns a link graph into the
 * next fetch list (Mercator/IRLbot shape: candidate URLs scored by
 * evidence, gated by politeness, budgeted per host so no site's queue
 * starves the fleet or hammers one origin):
 *
 *  1. candidate URLs aggregate to inlink counts (discovery evidence —
 *     the standard frontier priority signal);
 *  2. already-crawled URLs drop (key-only anti-join);
 *  3. robots admission gates each (host, path) ([[Robots.allowed]] —
 *     RFC 9309 longest-match);
 *  4. each host keeps its top-`budget` candidates by (inlinks DESC,
 *     url ASC).
 *
 * 100 TB posture: counts are one hash aggregate on the url key; the
 * crawled screen is a key-only anti-join; the per-host budget is the
 * bounded [[graft.functions.TopKByScore]] heap aggregate — k rows per
 * host per map partition shuffle, NEVER a per-host row_number window
 * (a hot host's million candidates would all land on one task). The
 * oracle replays the rank as the equivalent row_number ≤ k.
 */
object WebFrontier {

  /** Schedule the next fetch list. `candidates` carries one row per
    * link OCCURRENCE of `urlCol` (canonicalized — the caller picks the
    * key discipline); `crawled` is the visited url set; `robots` is
    * [[Robots.rules]] output. Output: (host, rank, url, n_inlinks) with
    * rank in 1..budget per host.
    */
  def schedule(candidates: DataFrame, crawled: DataFrame,
      robots: DataFrame, urlCol: String, budget: Int,
      agent: String = "*"): DataFrame =
    scheduleCounts(
      candidates.select(col(urlCol).as("url"))
        .groupBy("url").agg(count(lit(1)).as("n_inlinks")),
      crawled, robots, urlCol, budget, agent)

  /** [[schedule]] from PRE-AGGREGATED (url, n_inlinks) counts — the
    * surface the streaming twin drains through (per-batch counts are
    * additive facts; the read sums them and runs the identical
    * gate/budget logic, so drained == batch under any batching).
    */
  def scheduleCounts(counts: DataFrame, crawled: DataFrame,
      robots: DataFrame, urlCol: String, budget: Int,
      agent: String = "*"): DataFrame = {
    require(budget > 0, s"per-host budget must be > 0, got $budget")
    // NULL urls (canonicalization's documented drop) are unfetchable —
    // screened before the gate, since Robots.allowed's
    // every-row-comes-back contract would wave them through as allowed
    val fresh = counts.filter(col("url").isNotNull)
      .select(col("url"), col("n_inlinks"))
      .join(crawled.select(col(urlCol).as("url")), Seq("url"), "left_anti")
    gateAndBudget(fresh, robots, budget, agent)
      .select(col("host"), col("rank"), col("url"),
        // the heap's score IS the integer count (exact through double
        // far beyond any real inlink count)
        col("__score").cast("long").as("n_inlinks"))
  }

  /** [[scheduleCounts]] with the SITEMAP discovery channel folded in —
    * the other half of a real frontier (sites publish the pages they
    * WANT crawled): `sitemapEntries` is [[Sitemaps.entries]] output
    * (loc, priority, …), and a URL's score becomes
    * `n_inlinks + priority-hint` — the spec default 0.5 for a listed
    * entry with no `<priority>`, 0 for unlisted URLs, the max over
    * multiple listings. A sitemap-ONLY URL (zero inlinks — the whole
    * point of the channel) enters with its hint alone; the same
    * crawled screen, robots gate and per-host heap budget apply.
    * Output: (host, rank, url, n_inlinks, score).
    *
    * 100 TB posture: the merge is one url-keyed full-outer join of two
    * pre-aggregated frames; the budget output (≤ budget·hosts rows)
    * broadcasts back for the inlink-count attach, so no second scan
    * shuffles.
    */
  def scheduleWithSitemaps(counts: DataFrame, sitemapEntries: DataFrame,
      crawled: DataFrame, robots: DataFrame, urlCol: String, budget: Int,
      agent: String = "*"): DataFrame = {
    require(budget > 0, s"per-host budget must be > 0, got $budget")
    val sm = sitemapEntries
      .select(col("loc").as("url"),
        coalesce(col("priority"), lit(0.5)).as("__p"))
      .filter(col("url").isNotNull && col("url") =!= "")
      .groupBy("url").agg(max(col("__p")).as("__p"))
    // merged is read twice (the gate chain + the count attach) —
    // materialize once so the candidate/sitemap merge runs once
    val merged = new graft.pipeline.RoundSnapshots(None).snap(
      counts.filter(col("url").isNotNull)
        .select(col("url"), col("n_inlinks"))
        .join(sm, Seq("url"), "full_outer")
        .select(col("url"),
          coalesce(col("n_inlinks"), lit(0L)).as("n_inlinks"),
          (coalesce(col("n_inlinks"), lit(0L)).cast("double") +
            coalesce(col("__p"), lit(0.0))).as("__sc")),
      "sitemap_merged").df
    val fresh = merged
      .join(crawled.select(col(urlCol).as("url")), Seq("url"), "left_anti")
    val ranked = gateAndBudget(
      fresh.select(col("url"), col("__sc").as("n_inlinks")),
      robots, budget, agent)
    merged.select(col("url"), col("n_inlinks"))
      .join(broadcast(ranked), Seq("url"))
      .select(col("host"), col("rank"), col("url"), col("n_inlinks"),
        col("__score").as("score"))
  }

  /** Freshness RECRAWL scheduling — the sitemap channel's other half
    * (`lastmod` consumed): an already-crawled page re-schedules when
    * its sitemap `lastmod` is NEWER than its last fetch (`stale`), an
    * uncrawled listed page schedules as discovery (`new`), everything
    * else skips. Candidates rank per host by sitemap priority (spec
    * default 0.5, max over listings), gated by robots; `Crawl-delay`
    * paces each host's queue — `fetch_offset_sec = (rank − 1) · delay`
    * (1 s when the host declares none), the fetcher's dispatch
    * timeline. Dates compare as ISO-8601 STRINGS (lexicographic ==
    * chronological for same-format dates, identical on both engines);
    * entries without `lastmod` cannot prove staleness and only
    * schedule when uncrawled. `crawled` carries (url, fetched_at);
    * `delays` is [[Robots.crawlDelays]] output with hostCol `host`.
    * Output: (host, rank, url, reason, lastmod, fetch_offset_sec).
    *
    * 100 TB posture: one url-keyed pre-aggregate + one left join
    * against the crawl log, the shared robots/heap tail, and the
    * ≤ budget·hosts ranked rows broadcast back for the detail attach
    * and against the (tiny, per-host) delay frame.
    */
  def recrawlSchedule(entries: DataFrame, crawled: DataFrame,
      robots: DataFrame, delays: DataFrame, budget: Int,
      agent: String = "*"): DataFrame = {
    require(budget > 0, s"per-host budget must be > 0, got $budget")
    // cand is read twice (gate chain + detail attach) — materialize
    // once so the entry aggregation + crawl-log join run once
    val cand = new graft.pipeline.RoundSnapshots(None).snap(
      entries
        .select(col("loc").as("url"), col("lastmod"),
          coalesce(col("priority"), lit(0.5)).as("__p"))
        .filter(col("url").isNotNull && col("url") =!= "")
        .groupBy("url")
        .agg(max(col("lastmod")).as("lastmod"), max(col("__p")).as("__p"))
        .join(crawled.select(col("url"), col("fetched_at")), Seq("url"),
          "left")
        .withColumn("reason",
          when(col("fetched_at").isNull, "new")
            .when(col("lastmod") =!= "" &&
              col("lastmod") > col("fetched_at"), "stale"))
        .filter(col("reason").isNotNull),
      "recrawl_candidates").df
    val ranked = gateAndBudget(
      cand.select(col("url"), col("__p").as("n_inlinks")),
      robots, budget, agent)
    cand.select(col("url"), col("reason"), col("lastmod"))
      .join(broadcast(ranked), Seq("url"))
      .join(delays.filter(col("agent") === agent)
        .select(col("host"), col("crawl_delay")), Seq("host"), "left")
      .select(col("host"), col("rank"), col("url"), col("reason"),
        col("lastmod"),
        ((col("rank") - 1).cast("double") *
          coalesce(col("crawl_delay"), lit(1.0)))
          .as("fetch_offset_sec"))
  }

  /** The shared frontier tail: (host, path) parse, robots admission,
    * per-host bounded-heap budget — callers screen crawled/NULL urls
    * first (the recrawl path deliberately ranks ALREADY-crawled urls).
    * `scored` carries (url, n_inlinks) where n_inlinks is the RANKING
    * score (castable to double). Output: (host, rank, url, __score).
    */
  private def gateAndBudget(scored: DataFrame, robots: DataFrame,
      budget: Int, agent: String): DataFrame = {
    val pathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)"
    // materialize the skinny candidate frame ONCE before the robots
    // gate: Robots.allowed reads its input twice (the distinct verdict
    // side + the join-back), and without this each read re-evaluates
    // the whole upstream candidate chain — at crawl scale that is the
    // outlink extraction run twice (the t73 lesson applied here)
    val parsed = new graft.pipeline.RoundSnapshots(None).snap(
      scored
        .withColumn("host",
          regexp_extract(col("url"),
            "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
        .withColumn("path",
          when(regexp_extract(col("url"), pathRe, 1) === "", "/")
            .otherwise(regexp_extract(col("url"), pathRe, 1))),
      "frontier_candidates").df
    Robots.allowed(parsed, robots, "host", "path", agent)
      .filter(col("allowed"))
      .groupBy("host")
      .agg(GraftFunctions.top_k_by(col("n_inlinks").cast("double"),
        col("url"), budget).as("__topk"))
      .select(col("host"), posexplode(col("__topk")).as(Seq("__pos", "__e")))
      .select(col("host"), (col("__pos") + 1).cast("int").as("rank"),
        col("__e.id").as("url"), col("__e.score").as("__score"))
  }
}
