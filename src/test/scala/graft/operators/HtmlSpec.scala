package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class HtmlSpec extends SparkTestBase {
  import spark.implicits._

  private val page =
    """<html><head><title>T</title><style>p{margin:0}</style></head><body>
      |<!-- chrome -->
      |<nav><ul><li><a href="/">Home</a></li><li><a href="/all">All docs</a></li></ul></nav>
      |<article><h1>Doc one</h1>
      |<p>the quick brown fox jumps over the lazy dog</p>
      |<p>Share <a href="/s">this</a></p></article>
      |<footer><p><a href="/t">Terms of service</a> <a href="/p">Privacy notice</a></p></footer>
      |</body></html>""".stripMargin

  test("htmlBlockFeatures: hand-computed block split, features and labels") {
    val df = Seq((1L, page)).toDF("doc_id", "html")
    val rows = Html.htmlBlockFeatures(df, "doc_id", "html")
      .orderBy("block_idx")
      .as[(Long, Int, String, Int, Int, Int, Int, Boolean)].collect()
    val byText = rows.map(r => r._3 -> r).toMap
    // six text-bearing blocks survive (whitespace-only splits drop)
    assert(rows.length === 6)
    // nav items: short AND all-link -> boilerplate
    assert(byText("Home") === ((1L, byText("Home")._2, "Home", 4, 4, 1, 0, false)))
    assert(byText("All docs")._4 === 7 && byText("All docs")._5 === 7 &&
      byText("All docs")._6 === 2 && !byText("All docs")._8)
    // short heading -> boilerplate by minWords (documented behavior)
    assert(byText("Doc one")._6 === 2 && byText("Doc one")._5 === 0 &&
      !byText("Doc one")._8)
    // the one running-text paragraph: 9 words, 35 non-ws chars, no links,
    // two 'the' stopword hits -> content
    val main = byText("the quick brown fox jumps over the lazy dog")
    assert(main._4 === 35 && main._5 === 0 && main._6 === 9 && main._7 === 2)
    assert(main._8)
    // 'Share this': 2 words -> boilerplate by length (link chars counted)
    assert(byText("Share this")._5 === 4 && !byText("Share this")._8)
    // footer: 5 words (passes minWords) but 27/27 link chars -> killed by
    // the link-density rule specifically
    val footer = byText("Terms of service Privacy notice")
    assert(footer._4 === 27 && footer._5 === 27 && footer._6 === 5 &&
      !footer._8)
    // block_idx strictly increasing in document order
    assert(rows.map(_._2).toSeq === rows.map(_._2).sorted.toSeq)
  }

  test("htmlMainContent rebuilds content blocks in order, map-only counts") {
    val df = Seq((1L, page)).toDF("doc_id", "html")
    val got = Html.htmlMainContent(df, "doc_id", "html")
      .as[(Long, String, Int, Int)].head()
    assert(got === ((1L,
      "the quick brown fox jumps over the lazy dog", 6, 1)))
  }

  test("entity decode (amp last), multi-paragraph order, tagless input") {
    val df = Seq(
      (1L, "<p>A &amp;lt; B &lt;x&gt; stays &quot;q&#39;s&quot; &nbsp;ok</p>" +
        "<p>second content block here with words enough</p>"),
      (2L, "plain text with no tags at all counts as one block")
    ).toDF("doc_id", "html")
    val rows = Html.htmlBlockFeatures(df, "doc_id", "html", minWords = 4)
      .orderBy("doc_id", "block_idx")
      .as[(Long, Int, String, Int, Int, Int, Int, Boolean)].collect()
    // &amp; decodes LAST: '&amp;lt;' -> '&lt;' literally, never '<'
    assert(rows(0)._3 === "A &lt; B <x> stays \"q's\" ok")
    val main = Html.htmlMainContent(df, "doc_id", "html", minWords = 4)
      .orderBy("doc_id").as[(Long, String, Int, Int)].collect()
    assert(main(0)._2 === "A &lt; B <x> stays \"q's\" ok " +
      "second content block here with words enough")
    assert(main(1) === ((2L,
      "plain text with no tags at all counts as one block", 1, 1)))
  }

  test("htmlMainContentSiteAware: a host-wide content-looking block dies " +
      "by page-count; unique blocks survive; small hosts keep it; hosts " +
      "never cross-contaminate") {
    val motto = "<p>our quality motto repeats on every page of this host</p>"
    def page(i: Long, body: String) =
      s"$motto<p>unique article number $i body with plenty of words here</p>$body"
    // host A: 5 pages (motto count 5 >= minRepeats) — motto dies
    // host B: 4 pages (count 4 < 5) — the SAME motto survives there
    val df = ((1L to 5L).map(i => (i, page(i, ""), "A")) ++
      (11L to 14L).map(i => (i, page(i, ""), "B")))
      .toDF("doc_id", "html", "host")
    val got = Html.htmlMainContentSiteAware(df, "doc_id", "html", "host",
        minWords = 5, minRepeats = 5)
      .as[(Long, String, Int, Int)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2 === "unique article number 1 body with plenty of words here")
    assert(got(1L)._3 === 1 && got(1L)._4 === 1,
      s"host A pages keep 1 block and drop the motto, got ${got(1L)}")
    assert(got(11L)._2 === ("our quality motto repeats on every page of " +
      "this host unique article number 11 body with plenty of words here"))
    assert(got(11L)._4 === 0, "a 4-page host is under minRepeats")
  }

  test("unclosed <script>/<style> text truncates at the next boundary " +
      "tag — the following block survives intact") {
    val df = Seq(
      (1L, "<p>first real paragraph with plenty of words</p>" +
        "<script>var leak = 'this must never reach a block'" +
        "<p>second real paragraph with plenty of words</p>" +
        "<style>.x{color:red}<p>third real paragraph with plenty of words</p>"))
      .toDF("doc_id", "html")
    val texts = Html.htmlBlockFeatures(df, "doc_id", "html", minWords = 3)
      .orderBy("block_idx").select("text").as[String].collect().toSeq
    assert(texts === Seq(
      "first real paragraph with plenty of words",
      "second real paragraph with plenty of words",
      "third real paragraph with plenty of words"), s"got $texts")
  }

  test("outlinks extracts single-quoted, unquoted and double-quoted " +
      "hrefs in document order") {
    val df = Seq(
      (1L, "<a href='/one'>a</a> <a href=/two?x=1>b</a> " +
        "<a class='z' href=\"/three\">c</a> <a href = '/four'>d</a>"))
      .toDF("doc_id", "html")
    val urls = Html.outlinks(df, "doc_id", "html")
      .select("url").as[String].collect().toSeq
    assert(urls === Seq("/one", "/two?x=1", "/three", "/four"), s"got $urls")
  }

  test("outlinks tag-soup edges: a self-closing tag's `/>` stays out of " +
      "a bare href value; an embedded double quote truncates it") {
    val df = Seq(
      (1L, "<a href=/doc/5/>x</a> <a href=/dir/5/ >y</a> " +
        "<a href=/a\"b>z</a> <a href=q/>w</a>")).toDF("doc_id", "html")
    val urls = Html.outlinks(df, "doc_id", "html")
      .select("url").as[String].collect().toSeq
    // /doc/5 (the / belongs to />), /dir/5/ (legit trailing slash —
    // whitespace before >), /a (truncated at the embedded quote), q
    assert(urls === Seq("/doc/5", "/dir/5/", "/a", "q"), s"got $urls")
  }

  test("anchorTexts: (href, cleaned inner text) pairs in document order " +
      "across quote styles; anchorTextEdges resolves relative targets " +
      "and keeps self-links") {
    val df = Seq((3L,
      "<a href='/doc/1'><b>bold  one</b></a> " +
        "<a href=\"../doc/2\">two &amp; more</a> " +
        "<a href=/doc/3#f>self</a> <a href=\"/nope\">off-graph</a>",
      "http://h.io/doc/3")).toDF("doc_id", "html", "base_uri")
    val pairs = Html.anchorTexts(df, "doc_id", "html")
      .select("url", "anchor").as[(String, String)].collect().toSeq
    assert(pairs === Seq(("/doc/1", "bold one"), ("../doc/2", "two & more"),
      ("/doc/3#f", "self"), ("/nope", "off-graph")), s"got $pairs")
    val edges = Html.anchorTextEdges(df, "doc_id", "html", "base_uri")
      .as[(Long, Long, String)].collect().sortBy(_._2).toSeq
    assert(edges === Seq((3L, 1L, "bold one"), (3L, 2L, "two & more"),
      (3L, 3L, "self")), s"resolution + self-link keep: $edges")
  }

  test("docLinkEdges honors <base href>: re-roots relative links, only " +
      "the first base counts, absolute links unaffected") {
    val df = Seq(
      // no base: relative resolves against the page URI
      (1L, "<a href=\"../doc/2\">x</a>", "http://h.io/sub/p1"),
      // rooted base re-roots the bare relative link
      (2L, "<base href=\"/doc/\"><a href=\"3\">x</a>", "http://h.io/sub/p2"),
      // only the FIRST base counts; absolute link unaffected
      (3L, "<base href='/doc/'><base href=\"/wrong/\"><a href=4>x</a>" +
        "<a href=\"http://h.io/doc/5\">y</a>", "http://h.io/sub/p3"),
      // without base, the bare relative misses the doc space: no edge
      (4L, "<a href=\"6\">x</a>", "http://h.io/sub/p4"))
      .toDF("doc_id", "html", "base_uri")
    val edges = Html.docLinkEdges(df, "doc_id", "html", "base_uri")
      .as[(Long, Long)].collect().toSet
    assert(edges === Set((1L, 2L), (2L, 3L), (3L, 4L), (3L, 5L)),
      s"got $edges")
  }

  test("meta robots + rel=nofollow: both attribute orders, 'none' means " +
      "both, nofollow page yields no edges, nofollow anchor drops") {
    val df = Seq(
      (1L, "<meta name='robots' content='noindex'><a href=\"/a\">x</a>"),
      (2L, "<meta content=\"nofollow\" name=robots><a href=\"/b\">x</a>"),
      (3L, "<meta name=robots content=none><a href=\"/c\">x</a>"),
      (4L, "<a rel=\"nofollow ugc\" href=\"/d\">x</a><a href=\"/e\">y</a>"),
      (5L, "<a rel=nofollow href=\"/f\">x</a>"),
      (6L, "plain <a href=\"/g\">x</a>")).toDF("doc_id", "html")
    val flags = df.select(col("doc_id"),
        Html.pageRobotsDirectives(col("html")).as("d"))
      .select(col("doc_id"), col("d.noindex"), col("d.nofollow"))
      .as[(Long, Boolean, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(flags === Map(1L -> ((true, false)), 2L -> ((false, true)),
      3L -> ((true, true)), 4L -> ((false, false)),
      5L -> ((false, false)), 6L -> ((false, false))), s"got $flags")
    val links = Html.outlinksFollowable(df, "doc_id", "html")
      .as[(Long, String)].collect().toSet
    assert(links === Set((1L, "/a"), (4L, "/e"), (6L, "/g")),
      s"nofollow pages/anchors must contribute no edges: $links")
  }

  test("canonicalDedup: both attribute orders, relative canonicals " +
      "resolve, no tag = self-canonical, lowest id kept per group") {
    val df = Seq(
      (1L, "<link rel=\"canonical\" href=\"/p/1\">", "http://h.io/p/1"),
      (2L, "<link href='/p/1' rel=canonical>", "http://h.io/p/2"),
      (3L, "<link rel=canonical href=../p/1>", "http://h.io/x/p3"),
      (4L, "no tag", "http://h.io/p/4")).toDF("doc_id", "html", "base_uri")
    val got = Html.canonicalDedup(df, "doc_id", "html", "base_uri")
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(("http://h.io/p/1", 1L, 3L),
      ("http://h.io/p/4", 4L, 1L)), s"got $got")
  }

  test("pageMetadata: title entity/ws chain, OG both attribute orders, " +
      "absent fields ''") {
    val df = Seq(
      (1L, "<title> A &amp; B </title>" +
        "<meta property=\"og:title\" content=\"T1\">" +
        "<meta content=\"D1\" property=\"og:description\">"),
      (2L, "<p>no head</p>")).toDF("doc_id", "html")
    val got = Html.pageMetadata(df, "doc_id", "html")
      .as[(Long, String, String, String)].collect().toSet
    assert(got === Set((1L, "A & B", "T1", "D1"), (2L, "", "", "")),
      s"got $got")
  }

  test("script/style/head/comment bodies drop; empty page yields no blocks") {
    val df = Seq(
      (1L, "<head><title>gone</title></head><script>var x='gone';</script>" +
        "<style>.x{}</style><!-- gone --><p>kept words here for sure</p>"),
      (2L, ""), (3L, "<div></div><p>  </p>")).toDF("doc_id", "html")
    val rows = Html.htmlBlockFeatures(df, "doc_id", "html", minWords = 3)
      .as[(Long, Int, String, Int, Int, Int, Int, Boolean)].collect()
    assert(rows.length === 1 && rows(0)._1 === 1L &&
      rows(0)._3 === "kept words here for sure" && rows(0)._8)
    val main = Html.htmlMainContent(df, "doc_id", "html", minWords = 3)
      .orderBy("doc_id").as[(Long, String, Int, Int)].collect()
    assert(main(1) === ((2L, "", 0, 0)) && main(2) === ((3L, "", 0, 0)))
  }
}
