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
}
