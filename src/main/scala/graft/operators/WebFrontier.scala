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
    // screen them here, since Robots.allowed's every-row-comes-back
    // contract would otherwise wave them through as allowed
    val fresh = counts.filter(col("url").isNotNull)
      .join(crawled.select(col(urlCol).as("url")), Seq("url"), "left_anti")
    val parsed = fresh
      .withColumn("host",
        regexp_extract(col("url"), "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
      .withColumn("path",
        when(regexp_extract(col("url"),
          "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1) === "", "/")
          .otherwise(regexp_extract(col("url"),
            "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)))
    Robots.allowed(parsed, robots, "host", "path", agent)
      .filter(col("allowed"))
      .groupBy("host")
      .agg(GraftFunctions.top_k_by(col("n_inlinks").cast("double"),
        col("url"), budget).as("__topk"))
      .select(col("host"), posexplode(col("__topk")).as(Seq("__pos", "__e")))
      .select(col("host"), (col("__pos") + 1).cast("int").as("rank"),
        col("__e.id").as("url"),
        // the heap's score IS the integer count (exact through double
        // far beyond any real inlink count)
        col("__e.score").cast("long").as("n_inlinks"))
  }
}
