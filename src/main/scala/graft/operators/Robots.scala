package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * robots.txt admission — the crawl-politeness gate every real pipeline
 * runs BEFORE fetching (and re-runs over an existing crawl before
 * training on it: pages a site has since disallowed are routinely
 * excluded from corpora). Implements the Robots Exclusion Protocol's
 * core (the 1994 convention as standardized by RFC 9309 §2):
 *
 *  - a robots body is LINE-structured: `User-agent:` lines open a
 *    group (consecutive user-agent lines stack onto the SAME group),
 *    `Allow:`/`Disallow:` lines attach to the group they follow;
 *    field names are case-insensitive, `#` comments strip, unknown
 *    lines are ignored;
 *  - an empty-value `Disallow:` permits everything (dropped at parse);
 *  - admission for a URL path: among the agent's group rules whose
 *    prefix matches the path, the MOST SPECIFIC (longest octet length)
 *    wins, `Allow` winning exact-length ties; no matching rule ⇒
 *    allowed (RFC 9309 §2.2.2).
 *
 * Out of scope (documented, not hidden): the `*`/`$` wildcard
 * extension, percent-encoding normalization, agent-name
 * longest-substring selection (callers pass the already-chosen agent
 * token, typically `*`), and `Crawl-delay`/`Sitemap` fields (ignored
 * lines). All parsing is RE2-safe line regexes, so the DuckDB oracle
 * replays the grammar AND the longest-match argmax relationally.
 *
 * 100 TB posture: parsing is one line-explode + two PER-HOST windows
 * (bounded — a robots body is one small file per host, the same
 * per-document-window posture as the scene/segment operators);
 * admission is one host equi-join against the (small, host-keyed) rule
 * frame with a prefix post-filter and ONE per-URL max(struct) argmax —
 * a hash aggregate, never a per-URL window. A host-partitioned crawl
 * co-locates both sides.
 */
object Robots {

  /** Parse robots.txt bodies into per-agent prefix rules. Input: one
    * row per host with its robots body. Output: (hostCol, agent,
    * rule_type ∈ {allow, disallow}, prefix) — one row per (group
    * member agent × rule).
    */
  def rules(df: DataFrame, hostCol: String, robotsCol: String): DataFrame = {
    val lines = df
      .select(col(hostCol), posexplode(split(col(robotsCol), "\n"))
        .as(Seq("__ln", "__raw")))
      .select(col(hostCol), col("__ln"),
        // strip comments + surrounding whitespace (RFC 9309 §2.1)
        trim(regexp_replace(col("__raw"), "#.*$", "")).as("__line"))
      .select(col(hostCol), col("__ln"),
        lower(regexp_extract(col("__line"),
          "(?i)^(user-agent|allow|disallow)\\s*:", 1)).as("__kind"),
        trim(regexp_extract(col("__line"),
          "(?i)^(?:user-agent|allow|disallow)\\s*:(.*)$", 1)).as("__val"))
      .filter(col("__kind") =!= "")
    // group id: a group OPENS at a user-agent line whose predecessor is
    // not one (consecutive user-agent lines stack onto the same group)
    val w = Window.partitionBy(hostCol).orderBy("__ln")
    val grouped = lines
      .withColumn("__isUa", col("__kind") === "user-agent")
      .withColumn("__opens",
        col("__isUa") && !coalesce(lag(col("__isUa"), 1).over(w),
          lit(false)))
      .withColumn("__grp",
        sum(when(col("__opens"), 1).otherwise(0)).over(w))
    val agents = grouped.filter(col("__isUa"))
      .select(col(hostCol), col("__grp"), col("__val").as("agent"))
    grouped
      .filter(!col("__isUa") && col("__val") =!= "")
      .select(col(hostCol), col("__grp"),
        col("__kind").as("rule_type"), col("__val").as("prefix"))
      .join(agents, Seq(hostCol, "__grp"))
      .select(col(hostCol), col("agent"), col("rule_type"), col("prefix"))
  }

  /** Admission verdict per URL row: longest-matching-prefix rule of
    * `agent`'s groups decides, Allow wins length ties, no match ⇒
    * allowed. `urls` carries (hostCol, pathCol, …); every input row
    * comes back with an `allowed` BOOLEAN appended.
    *
    * The argmax encodes (specificity, allow-beats-disallow) as ONE
    * integer — `2·octet_length(prefix) + (allow ? 1 : 0)` — so the
    * winning rule is a plain integer `max` both engines order
    * identically (no struct-comparison semantics to align), and the
    * verdict is the max's parity.
    */
  def allowed(urls: DataFrame, robots: DataFrame, hostCol: String,
      pathCol: String, agent: String = "*"): DataFrame = {
    val ruleFrame = robots.filter(col("agent") === agent)
      .select(col(hostCol).as("__rh"), col("rule_type"), col("prefix"))
    val verdicts = urls
      .select(col(hostCol).as("__uh"), col(pathCol).as("__up"))
      .distinct()
      .join(ruleFrame, col("__uh") === col("__rh") &&
        col("__up").startsWith(col("prefix")), "left")
      .groupBy(col("__uh"), col("__up"))
      .agg(max(length(col("prefix")) * 2 +
        when(col("rule_type") === "allow", 1).otherwise(0)).as("__best"))
      .select(col("__uh"), col("__up"),
        coalesce(pmod(col("__best"), lit(2)) === 1, lit(true))
          .as("allowed"))
    urls.join(verdicts,
        col(hostCol) === col("__uh") && col(pathCol) === col("__up"))
      .drop("__uh", "__up")
  }
}
