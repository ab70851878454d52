package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Sitemap URL-set parsing (sitemaps.org protocol) — the crawl
 * frontier's OTHER discovery channel besides outlinks: sites publish
 * the pages they WANT crawled, with freshness (`lastmod`) and weight
 * (`priority`) hints that frontier scheduling consumes alongside
 * inlink counts.
 *
 * Sitemap XML is rigidly machine-generated (the protocol fixes the
 * element set; no attributes on the fields, no nesting inside `<url>`),
 * so the standard crawler shortcut applies: split at `</url>`, parse
 * each block's `loc`/`lastmod`/`priority` with anchored RE2 regexes —
 * one split + one explode, map-only, and the DuckDB oracle replays the
 * identical parse. Out of scope (documented): sitemap INDEX files
 * (`<sitemapindex>` pointing at child sitemaps — recursion is the
 * fetcher's loop, not a frame op) and entity-encoded `<loc>` values
 * (the protocol requires XML-escaping; feed through the HTML entity
 * decode if a generator violates it).
 *
 * Output: (hostCol, loc, lastmod, priority) — `loc`
 * whitespace-trimmed (the spec tolerates it), `lastmod` '' when
 * absent, `priority` NULL when absent; blocks without a `loc` drop.
 */
object Sitemaps {

  def entries(df: DataFrame, hostCol: String, xmlCol: String): DataFrame =
    df.select(col(hostCol),
        explode(split(col(xmlCol), "</url>")).as("__b"))
      .select(col(hostCol),
        trim(regexp_extract(col("__b"), "(?s)<loc>([^<]*)</loc>", 1))
          .as("loc"),
        trim(regexp_extract(col("__b"),
          "(?s)<lastmod>([^<]*)</lastmod>", 1)).as("lastmod"),
        nullif(trim(regexp_extract(col("__b"),
          "(?s)<priority>([^<]*)</priority>", 1)), lit(""))
          .cast("double").as("priority"))
      .filter(col("loc") =!= "")
}
