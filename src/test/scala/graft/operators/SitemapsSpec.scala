package graft.operators

import graft.SparkTestBase

class SitemapsSpec extends SparkTestBase {
  import spark.implicits._

  test("entries: per-block parse tolerates whitespace-padded locs, " +
      "optional lastmod/priority per entry, and drops loc-less blocks") {
    val xml = "<?xml version=\"1.0\"?><urlset>" +
      "<url><loc> http://h.io/a </loc><lastmod>2024-01-05</lastmod>" +
      "<priority>0.8</priority></url>" +
      "<url><loc>http://h.io/b</loc></url>" + // both hints absent
      "<url><lastmod>2024-02-02</lastmod></url>" + // no loc: drops
      "<url><loc>http://h.io/c</loc><priority>0.3</priority></url>" +
      "</urlset>"
    val got = Sitemaps.entries(Seq(("h.io", xml)).toDF("host", "xml"),
        "host", "xml")
      .as[(String, String, String, Option[Double])].collect()
      .sortBy(_._2).toSeq
    assert(got === Seq(
      ("h.io", "http://h.io/a", "2024-01-05", Some(0.8)),
      ("h.io", "http://h.io/b", "", None),
      ("h.io", "http://h.io/c", "", Some(0.3))), s"got $got")
  }

  test("indexEntries parses <sitemapindex> children; the root-marker " +
      "guards route a MIXED corpus to the right parser") {
    val idx = "<?xml version=\"1.0\"?><sitemapindex>" +
      "<sitemap><loc>http://h.io/sm-a.xml</loc>" +
      "<lastmod>2024-03-01</lastmod></sitemap>" +
      "<sitemap><loc> http://h.io/sm-b.xml </loc></sitemap>" +
      "</sitemapindex>"
    val urlset = "<?xml version=\"1.0\"?><urlset>" +
      "<url><loc>http://h.io/p</loc></url></urlset>"
    val corpus = Seq(("h.io", idx), ("h.io", urlset)).toDF("host", "xml")
    val kids = Sitemaps.indexEntries(corpus, "host", "xml")
      .as[(String, String, String)].collect().sortBy(_._2).toSeq
    assert(kids === Seq(("h.io", "http://h.io/sm-a.xml", "2024-03-01"),
      ("h.io", "http://h.io/sm-b.xml", "")), s"got $kids")
    // the urlset parser must NOT see the index doc (and vice versa)
    val locs = Sitemaps.entries(corpus, "host", "xml")
      .as[(String, String, String, Option[Double])].collect().toSeq
    assert(locs === Seq(("h.io", "http://h.io/p", "", None)), s"got $locs")
  }
}
