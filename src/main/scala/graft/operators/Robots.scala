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
 *  - admission for a URL path: among the agent's group rules matching
 *    the path, the MOST SPECIFIC (longest rule in octets) wins,
 *    `Allow` winning exact-length ties; no matching rule ⇒ allowed
 *    (RFC 9309 §2.2.2);
 *  - rule values are RFC 9309 §2.2.3 patterns: `*` matches any
 *    character sequence and a TRAILING `$` anchors the match at
 *    end-of-path (a mid-value `$` is literal, the reference-
 *    implementation reading); wildcard-free rules match as plain
 *    prefixes (the fast path — the overwhelmingly common case).
 *    Specificity counts the rule's own octets verbatim (wildcards
 *    included), the reference-implementation tiebreak.
 *
 * Out of scope (documented, not hidden): percent-encoding
 * normalization, agent-name longest-substring selection (callers pass
 * the already-chosen agent token, typically `*`), and
 * `Crawl-delay` fields (ignored lines; `Sitemap:` lines parse via
 * [[sitemaps]] for the frontier's discovery channel). All parsing is
 * RE2-safe line regexes and the wildcard compile is two rewrites + a
 * literal replace, so the DuckDB oracle replays the grammar, the
 * wildcard match AND the longest-match argmax relationally.
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

  /** Admission verdict per URL row: the longest-matching rule of
    * `agent`'s groups decides, Allow wins length ties, no match ⇒
    * allowed. `urls` carries (hostCol, pathCol, …); EVERY input row
    * comes back with an `allowed` BOOLEAN appended — rows with a NULL
    * host or path have no rules to match, so they come back `true`
    * (the no-matching-rule default; callers screening fetchability
    * should drop NULL keys themselves).
    *
    * Wildcard rules (§2.2.3) compile per RULE (the tiny frame) into an
    * anchored RE2 pattern — metacharacters escaped, `*` → `.*`, a
    * trailing `$` kept as the end anchor — and only rules that carry a
    * wildcard pay the regex; plain rules keep the `startsWith` fast
    * path. The argmax encodes (specificity, allow-beats-disallow) as
    * ONE integer — `2·octet_length(rule) + (allow ? 1 : 0)` — so the
    * winning rule is a plain integer `max` both engines order
    * identically (no struct-comparison semantics to align), and the
    * verdict is the max's parity.
    */
  def allowed(urls: DataFrame, robots: DataFrame, hostCol: String,
      pathCol: String, agent: String = "*"): DataFrame = {
    val endAnchor = col("prefix").endsWith("$")
    val core = regexp_replace(col("prefix"), "\\$$", "")
    val escaped = regexp_replace(core, "([.^$+?(){}\\[\\]|\\\\])", "\\\\$1")
    val wildRe = concat(lit("^"), replace(escaped, lit("*"), lit(".*")),
      when(endAnchor, lit("$")).otherwise(lit("")))
    val ruleFrame = robots.filter(col("agent") === agent)
      .select(col(hostCol).as("__rh"), col("rule_type"), col("prefix"),
        (col("prefix").contains("*") || endAnchor).as("__w"),
        wildRe.as("__re"))
    val matches = when(col("__w"), regexp_like(col("__up"), col("__re")))
      .otherwise(col("__up").startsWith(col("prefix")))
    val verdicts = urls
      .select(col(hostCol).as("__uh"), col(pathCol).as("__up"))
      .distinct()
      .join(ruleFrame, col("__uh") === col("__rh") && matches, "left")
      .groupBy(col("__uh"), col("__up"))
      .agg(max(octet_length(col("prefix")) * 2 +
        when(col("rule_type") === "allow", 1).otherwise(0)).as("__best"))
      .select(col("__uh"), col("__up"),
        coalesce(pmod(col("__best"), lit(2)) === 1, lit(true))
          .as("allowed"))
    // null-safe join-back: verdicts is exactly the distinct (host,
    // path) set INCLUDING null keys, so every input row matches one
    // verdict row; the left join + coalesce is belt-and-braces for the
    // documented every-row-comes-back contract
    urls.join(verdicts,
        col(hostCol) <=> col("__uh") && col(pathCol) <=> col("__up"),
        "left")
      .withColumn("allowed", coalesce(col("allowed"), lit(true)))
      .drop("__uh", "__up")
  }

  /** `Crawl-delay:` per agent group — the de-facto politeness field
    * (not in RFC 9309 but honored by most crawlers): same
    * line-grammar/stacked-group machinery as [[rules]], value parsed
    * as seconds (DOUBLE; non-numeric drops), the MAX over a group's
    * multiple lines (the conservative politeness read). Output:
    * (hostCol, agent, crawl_delay).
    */
  def crawlDelays(df: DataFrame, hostCol: String,
      robotsCol: String): DataFrame = {
    val lines = df
      .select(col(hostCol), posexplode(split(col(robotsCol), "\n"))
        .as(Seq("__ln", "__raw")))
      .select(col(hostCol), col("__ln"),
        trim(regexp_replace(col("__raw"), "#.*$", "")).as("__line"))
      .select(col(hostCol), col("__ln"),
        lower(regexp_extract(col("__line"),
          "(?i)^(user-agent|crawl-delay)\\s*:", 1)).as("__kind"),
        trim(regexp_extract(col("__line"),
          "(?i)^(?:user-agent|crawl-delay)\\s*:(.*)$", 1)).as("__val"))
      .filter(col("__kind") =!= "")
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
      .filter(!col("__isUa"))
      // try_cast: a real robots file ships garbage values ("10s") —
      // they must drop, not throw (ANSI cast would)
      .select(col(hostCol), col("__grp"),
        expr("try_cast(__val AS DOUBLE)").as("__d"))
      .filter(col("__d").isNotNull)
      .join(agents, Seq(hostCol, "__grp"))
      .groupBy(col(hostCol), col("agent"))
      .agg(max(col("__d")).as("crawl_delay"))
  }

  /** `Sitemap:` lines of a robots body — the discovery-channel pointer
    * RFC 9309 carries for the sitemaps.org protocol (the field is
    * group-INDEPENDENT per the sitemaps spec, so no group attribution:
    * one row per line). Output: (hostCol, sitemap_url).
    */
  def sitemaps(df: DataFrame, hostCol: String,
      robotsCol: String): DataFrame =
    df.select(col(hostCol), explode(split(col(robotsCol), "\n")).as("__raw"))
      .select(col(hostCol),
        trim(regexp_extract(trim(regexp_replace(col("__raw"), "#.*$", "")),
          "(?i)^sitemap\\s*:(.*)$", 1)).as("sitemap_url"))
      .filter(col("sitemap_url") =!= "")
}
