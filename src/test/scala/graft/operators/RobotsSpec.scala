package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RobotsSpec extends SparkTestBase {
  import spark.implicits._

  private val body =
    "User-agent: fancybot\nDisallow: /\n\n# comment here\n" +
      "User-agent: megabot\nUser-agent: *\nDisallow: /private/\n" +
      "Allow: /private/pub/\nDisallow: /tmp\nAllow: /cgi\nDisallow: /cgi\n" +
      "Disallow:\nSitemap: http://h/s.xml\n"

  test("rules: stacked user-agent groups share rules, foreign groups " +
      "stay separate, empty Disallow and unknown fields drop") {
    val r = Robots.rules(Seq(("h.io", body)).toDF("host", "robots"),
        "host", "robots")
      .as[(String, String, String, String)].collect().toSet
    // the * group's five rules, mirrored onto megabot (stacked UA lines)
    val starRules = r.filter(_._2 == "*").map(x => (x._3, x._4))
    assert(starRules === Set(("disallow", "/private/"),
      ("allow", "/private/pub/"), ("disallow", "/tmp"),
      ("allow", "/cgi"), ("disallow", "/cgi")))
    assert(r.filter(_._2 == "megabot").map(x => (x._3, x._4)) === starRules,
      "stacked user-agent lines must share the group's rules")
    assert(r.filter(_._2 == "fancybot").map(x => (x._3, x._4)) ===
      Set(("disallow", "/")), "foreign group must not leak")
  }

  test("allowed: longest prefix wins, Allow wins exact-length ties, no " +
      "match allows, prefix-boundary case, per-agent view") {
    val robots = Robots.rules(Seq(("h.io", body)).toDF("host", "robots"),
      "host", "robots")
    val urls = Seq(
      (1L, "h.io", "/articles/x"), // no rule -> allowed
      (2L, "h.io", "/private/x"), // disallow /private/
      (3L, "h.io", "/private/pub/x"), // longer allow wins
      (4L, "h.io", "/tmpfile"), // prefix match, no slash needed
      (5L, "h.io", "/cgi/x"), // exact-length tie -> allow
      (6L, "h.io", "/private/pub") // shorter than the allow prefix
    ).toDF("id", "host", "path")
    val got = Robots.allowed(urls, robots, "host", "path")
      .select("id", "allowed").as[(Long, Boolean)].collect().toMap
    assert(got === Map(1L -> true, 2L -> false, 3L -> true, 4L -> false,
      5L -> true, 6L -> false), s"got $got")
    // fancybot sees its own group: blanket disallow
    val fb = Robots.allowed(urls, robots, "host", "path", agent = "fancybot")
      .select("id", "allowed").as[(Long, Boolean)].collect().toMap
    assert(fb.values.forall(_ == false), s"fancybot blanket disallow: $fb")
  }

  test("allowed: RFC 9309 §2.2.3 wildcards — * any-sequence, trailing $ " +
      "anchor, longer Allow beats wildcard Disallow, literal $ escapes") {
    val wbody = "User-agent: *\nDisallow: /*.pdf$\nAllow: /pub/*.pdf$\n" +
      "Disallow: /search*\nAllow: /search/help\nDisallow: /d$r*\n"
    val robots = Robots.rules(Seq(("h.io", wbody)).toDF("host", "robots"),
      "host", "robots")
    val urls = Seq(
      (1L, "h.io", "/files/a.pdf"), // /*.pdf$ -> disallow
      (2L, "h.io", "/files/a.pdfx"), // $ anchor: no match -> allowed
      (3L, "h.io", "/pub/a.pdf"), // longer allow wins over /*.pdf$
      (4L, "h.io", "/search123"), // /search* -> disallow
      (5L, "h.io", "/search/help"), // longer literal allow wins
      (6L, "h.io", "/d$rx"), // literal mid-rule $ must match escaped
      (7L, "h.io", "/dzrx") // and must NOT behave as regex anchor
    ).toDF("id", "host", "path")
    val got = Robots.allowed(urls, robots, "host", "path")
      .select("id", "allowed").as[(Long, Boolean)].collect().toMap
    assert(got === Map(1L -> false, 2L -> true, 3L -> true, 4L -> false,
      5L -> true, 6L -> false, 7L -> true), s"got $got")
  }

  test("allowed: every input row comes back — NULL host/path rows get " +
      "the no-matching-rule default (true)") {
    val robots = Robots.rules(Seq(("h.io", body)).toDF("host", "robots"),
      "host", "robots")
    val urls = Seq(
      (1L, Some("h.io"), Some("/private/x")),
      (2L, None: Option[String], Some("/private/x")),
      (3L, Some("h.io"), None: Option[String])
    ).toDF("id", "host", "path")
    val got = Robots.allowed(urls, robots, "host", "path")
      .select("id", "allowed").as[(Long, Boolean)].collect().toMap
    assert(got === Map(1L -> false, 2L -> true, 3L -> true),
      s"NULL-key rows must come back allowed=true: $got")
  }

  test("crawlDelays: group-scoped, stacked agents share, max over " +
      "multiple lines, garbage values drop (never throw)") {
    val b = "User-agent: slowbot\nCrawl-delay: 30\n\n" +
      "User-agent: megabot\nUser-agent: *\nDisallow: /x\n" +
      "Crawl-delay: 2.5\nCrawl-delay: 1\nCrawl-delay: 10s\n"
    val got = Robots.crawlDelays(Seq(("h.io", b)).toDF("host", "robots"),
        "host", "robots")
      .as[(String, String, Double)].collect()
      .map { case (h, a, d) => (a, d) }.toMap
    // max(2.5, 1) for the */megabot group; '10s' drops; slowbot separate
    assert(got === Map("slowbot" -> 30.0, "megabot" -> 2.5, "*" -> 2.5),
      s"got $got")
  }

  test("sitemaps: Sitemap: lines parse per host, case-insensitive, " +
      "comments strip, other lines drop") {
    val b = "User-agent: *\nDisallow: /x\nSitemap: http://h/a.xml\n" +
      "sitemap: http://h/b.xml # the index\nCrawl-delay: 3\n"
    val got = Robots.sitemaps(Seq(("h.io", b)).toDF("host", "robots"),
        "host", "robots")
      .as[(String, String)].collect().toSeq
    assert(got === Seq(("h.io", "http://h/a.xml"), ("h.io", "http://h/b.xml")),
      s"got $got")
  }
}
