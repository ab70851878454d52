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
 * so the standard crawler shortcut applies: split at the block's close
 * tag, parse each block's fields with anchored RE2 regexes — one split
 * + one explode, map-only, and the DuckDB oracle replays the identical
 * parse. Both surfaces GUARD on the document's root marker
 * (`<urlset` / `<sitemapindex`), so a mixed sitemap corpus routes each
 * document to the right parser and the other returns nothing for it.
 * Index recursion is ONE level by protocol (an index must not list
 * another index) — [[indexEntries]] + a loc-keyed join back into the
 * corpus IS the full recursion. Out of scope (documented):
 * entity-encoded `<loc>` values (the protocol requires XML-escaping;
 * feed through the HTML entity decode if a generator violates it).
 *
 * [[entries]] output: (hostCol, loc, lastmod, priority) — `loc`
 * whitespace-trimmed (the spec tolerates it), `lastmod` '' when
 * absent, `priority` NULL when absent; blocks without a `loc` drop.
 */
object Sitemaps {

  def entries(df: DataFrame, hostCol: String, xmlCol: String): DataFrame =
    df.filter(col(xmlCol).contains("<urlset"))
      .select(col(hostCol),
        explode(split(col(xmlCol), "</url>")).as("__b"))
      .select(col(hostCol),
        trim(regexp_extract(col("__b"), "(?s)<loc>([^<]*)</loc>", 1))
          .as("loc"),
        trim(regexp_extract(col("__b"),
          "(?s)<lastmod>([^<]*)</lastmod>", 1)).as("lastmod"),
        nullif(trim(regexp_extract(col("__b"),
          "(?s)<priority>([^<]*)</priority>", 1)), lit("")).as("__pr"))
      // try_cast: a generator shipping a garbage <priority> must yield
      // NULL (the absent-field value), not an ANSI cast failure
      .withColumn("priority", expr("try_cast(__pr AS DOUBLE)"))
      .drop("__pr")
      .filter(col("loc") =!= "")

  /** `<sitemapindex>` documents → their child-sitemap pointers, one row
    * per `<sitemap>` block (same split + explode + anchored-regex shape
    * as [[entries]]). Output: (hostCol, loc, lastmod) — join `loc`
    * back against the sitemap corpus to load the children (the
    * protocol's single recursion level).
    */
  def indexEntries(df: DataFrame, hostCol: String,
      xmlCol: String): DataFrame =
    df.filter(col(xmlCol).contains("<sitemapindex"))
      .select(col(hostCol),
        explode(split(col(xmlCol), "</sitemap>")).as("__b"))
      .select(col(hostCol),
        trim(regexp_extract(col("__b"), "(?s)<loc>([^<]*)</loc>", 1))
          .as("loc"),
        trim(regexp_extract(col("__b"),
          "(?s)<lastmod>([^<]*)</lastmod>", 1)).as("lastmod"))
      .filter(col("loc") =!= "")
}
