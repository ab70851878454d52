package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * HTTP redirect-chain collapse — a real crawl is ~a fifth 3xx
 * responses, and every consumer (dedup keys, the web graph, the
 * frontier's crawled set) wants the FINAL target, not the hop: follow
 * each redirect source through the edge set until the target has no
 * outgoing redirect, bounded at `maxHops` (crawlers cap at 5–10; a
 * loop — `a→b→a` — never terminates, so the bound IS the loop guard).
 *
 * The walk is `maxHops − 1` LEFT self-joins of the EDGE frame (only
 * 3xx records — a sliver of the corpus), each hop one url-keyed
 * equi-join: no iteration state, no window, and the DuckDB oracle
 * replays the identical unrolled join chain. `resolved` is an
 * anti-lookup at the end: the final target has no outgoing edge (a
 * target OUTSIDE the crawl counts as resolved — it is simply
 * uncrawled); `resolved = false` means the chain was still redirecting
 * at the bound (a loop or a deeper-than-`maxHops` chain).
 *
 * Input `edges`: one row per redirect RESPONSE — (urlCol, targetCol),
 * target already RESOLVED against the request URI
 * ([[TextAnalysis.withResolvedUrl]] — RFC 9110 allows a relative
 * `Location`). Output: (urlCol, final_url, hops, resolved), one row
 * per redirect source.
 */
object Redirects {

  def collapse(edges: DataFrame, urlCol: String, targetCol: String,
      maxHops: Int = 5,
      checkpointDir: Option[String] = None): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    // the edge frame is referenced maxHops+1 times (every hop join +
    // the final anti-lookup) and Spark re-evaluates its producing plan
    // per reference — for crawl-derived edges that is the WHOLE
    // WARC-parse/resolve chain re-run per hop (measured 6× on t73).
    // Materialize the skinny (url, target) frame ONCE (the PageRank
    // `contrib` pattern): localCheckpoint by default, durable parquet
    // when checkpointDir is set.
    val snaps = new graft.pipeline.RoundSnapshots(checkpointDir)
    val eAll = snaps.snap(
      edges.select(col(urlCol).as("__eu"), col(targetCol).as("__et")),
      "redirect_edges").df
    val e = eAll
    var cur = eAll.select(col("__eu").as(urlCol),
      col("__et").as("final_url"), lit(1).as("hops"))
    for (_ <- 2 to maxHops) {
      cur = cur.join(e, cur("final_url") === e("__eu"), "left")
        .select(col(urlCol),
          coalesce(col("__et"), col("final_url")).as("final_url"),
          when(col("__et").isNotNull, col("hops") + 1)
            .otherwise(col("hops")).as("hops"))
    }
    cur.join(e.select(col("__eu")).distinct(),
        cur("final_url") === col("__eu"), "left")
      .select(col(urlCol), col("final_url"), col("hops"),
        col("__eu").isNull.as("resolved"))
  }
}
