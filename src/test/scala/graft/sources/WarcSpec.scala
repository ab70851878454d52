package graft.sources

import graft.SparkTestBase
import graft.functions.{GraftFunctions, WarcCodec}
import graft.plugin.WarcIngestStage
import org.apache.spark.sql.functions._

class WarcSpec extends SparkTestBase {
  import spark.implicits._

  private def rec(uri: String, body: String): String = {
    val len = body.getBytes("UTF-8").length
    s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
      s"Content-Length: $len\r\n\r\n$body\r\n\r\n"
  }

  test("warc framing is BYTE-exact (multibyte payloads), field parse " +
      "relational, torn tail drops, non-WARC null") {
    // second body is multibyte: 16 characters but 19 bytes — framing
    // on characters would misalign every later record
    val blob = rec("http://a/1", "plain ascii body") +
      rec("http://a/2", "café résumé body") +
      rec("http://a/3", "after the multibyte one") +
      "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 999\r\n\r\ntorn"
    val out = Warc.records(
        Seq((1L, blob), (2L, "not a warc at all")).toDF("warc_id", "warc"),
        "warc_id", "warc")
      .as[(Long, Int, String, String, Long, String)].collect().sortBy(_._2)
    assert(out.length === 3, s"torn tail must drop, non-WARC must drop: $out")
    assert(out(0) === ((1L, 0, "response", "http://a/1", 16L,
      "plain ascii body")))
    assert(out(1)._6 === "café résumé body" && out(1)._5 === 19L)
    assert(out(2)._6 === "after the multibyte one",
      "byte-exact framing must survive the multibyte record")
    // a payload containing header-lookalike TEXT must not resync framing
    val tricky = rec("http://a/9",
      "WARC/1.0\r\nContent-Length: 2\r\n\r\nfake inner record text")
    val t = Warc.records(Seq((1L, tricky)).toDF("warc_id", "warc"),
        "warc_id", "warc")
      .as[(Long, Int, String, String, Long, String)].collect()
    assert(t.length === 1 && t(0)._6.startsWith("WARC/1.0"),
      "length framing must carry the header-lookalike payload whole")
  }

  test("WarcIngestStage plugin: blob -> (doc_id, html, lang) by URI " +
      "parse; non-matching records drop; loads reflectively from YAML") {
    val blob = rec("http://example.com/doc/7", "<p>seven page body</p>") +
      rec("http://example.com/about", "<p>not a doc page</p>") +
      rec("http://example.com/doc/9", "<p>nine page body</p>")
    val cfg = graft.config.ConfigCodec.pipelineFromYaml(
      """pipeline:
        |  name: warc-in
        |  stages:
        |    - stage: graft.plugin.WarcIngestStage
        |""".stripMargin)
    val out = graft.pipeline.StagePipeline.compile(cfg,
        Seq((1L, blob)).toDF("warc_id", "warc"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(out.toSeq === Seq((7L, "<p>seven page body</p>", "und"),
      (9L, "<p>nine page body</p>", "und")))
  }

  test("version-line magic is case-SENSITIVE; Content-Length value must " +
      "be numeric and bounded") {
    // ISO 28500's version line is exact bytes — 'warc/1.0' must NOT frame
    val lower = Warc.records(
      Seq((1L, "warc/1.0\r\nContent-Length: 2\r\n\r\nxx\r\n\r\n"))
        .toDF("warc_id", "warc"), "warc_id", "warc").collect()
    assert(lower.isEmpty, "lowercase magic must be foreign input (null)")
    // header NAMES stay case-insensitive
    val mixed = "WARC/1.0\r\ncontent-length: 4\r\n\r\nbody\r\n\r\n"
    val ok = Seq((1L, mixed)).toDF("id", "w")
      .select(GraftFunctions.warc_records($"w")).as[Seq[String]].collect()
    assert(ok.head.size === 1)
    // a non-numeric Content-Length value must fail LOUDLY (a silent cl=0
    // would re-scan inside the payload), and so must a 19+-digit value
    for (bad <- Seq("WARC/1.0\r\nContent-Length: abc\r\n\r\nbody\r\n\r\n",
        "WARC/1.0\r\nContent-Length: 99999999999999999999\r\n\r\nx\r\n\r\n")) {
      val err = intercept[Exception] {
        Seq((1L, bad)).toDF("id", "w")
          .select(GraftFunctions.warc_records($"w")).collect()
      }
      val msg = err.getMessage + Option(err.getCause).map(_.getMessage).mkString
      assert(msg.contains("unparseable"), s"wanted loud CL failure, got $msg")
    }
  }

  private def gz(s: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(s.getBytes("UTF-8")); g.close()
    bos.toByteArray
  }

  test("gunzip_members: member-wise inflate; torn tail drops; foreign " +
      "null; CRC corruption mid-stream fails loudly") {
    val r1 = rec("http://a/1", "first body")
    val r2 = rec("http://a/2", "café second")
    val whole = gz(r1) ++ gz(r2)
    val torn = whole ++ gz(rec("http://a/3", "torn")).dropRight(6)
    val out = Warc.recordsGzip(
        Seq((1L, whole), (2L, torn), (3L, "no gzip".getBytes("UTF-8")))
          .toDF("warc_id", "warc"), "warc_id", "warc")
      .as[(Long, Int, String, String, Long, String)].collect()
      .sortBy(r => (r._1, r._2))
    assert(out.map(r => (r._1, r._2, r._6)).toSeq === Seq(
      (1L, 0, "first body"), (1L, 1, "café second"),
      (2L, 0, "first body"), (2L, 1, "café second")),
      s"two full members survive, torn trailing member + non-gzip drop: ${out.toSeq}")
    // flip a deflate byte of the FIRST member (not the tail) → loud
    val corrupt = whole.clone(); corrupt(14) = (corrupt(14) ^ 0x55).toByte
    val err = intercept[Exception] {
      Seq((1L, corrupt)).toDF("id", "w")
        .select(GraftFunctions.gunzip_members($"w")).collect()
    }
    val msg = err.getMessage + Option(err.getCause).map(_.getMessage).mkString
    assert(msg.contains("gzip member"), s"wanted loud gzip failure, got $msg")
    // a SINGLE trailing byte of a next member's magic is a torn tail
    // (drops), not lost sync — the <2-byte EOF-mid-header case
    val oneByteTail = whole ++ Array(0x1f.toByte)
    val kept = WarcCodec.gunzipMembers(oneByteTail)
    assert(new String(kept, "UTF-8") === r1 + r2,
      "a 1-byte torn next-member header must drop, keeping prior members")
  }

  test("dedupByDigest: earliest response wins (date, then uri), revisits " +
      "count but never win, dangling digests and digest-less records drop") {
    def full(typ: String, uri: String, date: String, dgst: String,
        body: String): String = {
      val len = body.getBytes("UTF-8").length
      s"WARC/1.0\r\nWARC-Type: $typ\r\nWARC-Target-URI: $uri\r\n" +
        s"WARC-Date: $date\r\n" +
        (if (dgst.nonEmpty) s"WARC-Payload-Digest: $dgst\r\n" else "") +
        s"Content-Length: $len\r\n\r\n$body\r\n\r\n"
    }
    val blob =
      full("response", "http://b/1", "2024-02-01T00:00:00Z", "md5:aa", "x") +
        full("response", "http://a/1", "2024-01-01T00:00:00Z", "md5:aa", "x") +
        full("response", "http://a/2", "2024-01-01T00:00:00Z", "md5:bb", "y") +
        full("revisit", "http://c/1", "2024-03-01T00:00:00Z", "md5:aa", "") +
        full("revisit", "http://c/2", "2024-03-01T00:00:00Z", "md5:zz", "") +
        full("response", "http://d/1", "2024-01-01T00:00:00Z", "", "w")
    val got = Warc.dedupByDigest(Warc.recordsFull(
        Seq((1L, blob)).toDF("warc_id", "warc"), "warc_id", "warc"))
      .as[(String, String, String, Long, Long, String)].collect()
      .sortBy(_._1).toSeq
    assert(got === Seq(
      ("md5:aa", "http://a/1", "2024-01-01T00:00:00Z", 3L, 1L, "x"),
      ("md5:bb", "http://a/2", "2024-01-01T00:00:00Z", 1L, 0L, "y")),
      s"got $got")
  }

  test("httpDechunk: reassembly, extensions/BWS tolerated, trailers " +
      "consumed; torn tail drops partial chunk; mid-stream corruption " +
      "and post-terminal bytes fail loudly; non-chunked null") {
    def b(s: String) = s.getBytes("UTF-8")
    // two chunks + empty trailer section
    assert(new String(WarcCodec.httpDechunk(
      b("5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n")), "UTF-8") === "hello world")
    // chunk extension and a trailer line
    assert(new String(WarcCodec.httpDechunk(
      b("5;ext=1\r\nhello\r\n0\r\nX-T: v\r\n\r\n")), "UTF-8") === "hello")
    // hex sizes beyond 9 (0x0b = 11 bytes)
    assert(new String(WarcCodec.httpDechunk(
      b("b\r\nhello world\r\n0\r\n\r\n")), "UTF-8") === "hello world")
    // torn mid-data: complete chunks survive, partial drops
    assert(new String(WarcCodec.httpDechunk(
      b("5\r\nhello\r\n6\r\n wo")), "UTF-8") === "hello")
    // torn mid-size-line
    assert(new String(WarcCodec.httpDechunk(
      b("5\r\nhello\r\n6")), "UTF-8") === "hello")
    // not chunked at all -> null
    assert(WarcCodec.httpDechunk(b("<html>hi</html>")) === null)
    // size lies (data not followed by CRLF) -> loud
    intercept[IllegalArgumentException] {
      WarcCodec.httpDechunk(b("3\r\nhello\r\n0\r\n\r\n"))
    }
    // garbage where a size line must start, after a complete chunk
    intercept[IllegalArgumentException] {
      WarcCodec.httpDechunk(b("5\r\nhello\r\nzz\r\n0\r\n\r\n"))
    }
    // bytes after the terminal chunk -> loud (mis-framed entity)
    intercept[IllegalArgumentException] {
      WarcCodec.httpDechunk(b("5\r\nhello\r\n0\r\n\r\nextra"))
    }
  }

  test("decodeCharsetDyn: WHATWG label mapping (latin-1 family -> " +
      "cp1252, gb2312 -> GBK), unknown/empty -> UTF-8, BOMs strip") {
    def d(bytes: Array[Byte], label: String): String =
      WarcCodec.decodeCharsetDyn(bytes,
        org.apache.spark.unsafe.types.UTF8String.fromString(label)).toString
    // 0x80 is € in cp1252; the iso-8859-1 LABEL must route there too
    assert(d(Array(0x80.toByte), "iso-8859-1") === "€")
    assert(d(Array(0x80.toByte), "Windows-1252") === "€")
    assert(d("café".getBytes("UTF-8"), "unknown-label") === "café")
    assert(d("café".getBytes("UTF-8"), "") === "café")
    assert(d("日本".getBytes("Shift_JIS"), "shift_jis") === "日本")
    assert(d("中文".getBytes("GBK"), "gb2312") === "中文")
    // BOMs strip: the text must not lead with U+FEFF
    assert(d(Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
      "x".getBytes("UTF-8"), "utf-8") === "x")
    assert(d(Array(0xFF.toByte, 0xFE.toByte) ++
      "ab".getBytes("UTF-16LE"), "utf-16le") === "ab")
    assert(d(Array(0xFE.toByte, 0xFF.toByte) ++
      "ab".getBytes("UTF-16BE"), "utf-16be") === "ab")
  }

  test("httpResponses: status/mime/charset/entity parse is relational; " +
      "non-HTTP payload -> NULL status; body lookalikes cannot false-match") {
    def http(status: String, ctype: String, body: String): String =
      s"HTTP/1.1 $status\r\nServer: x\r\nContent-Type: $ctype\r\n\r\n$body"
    val blob = rec("http://a/1",
        http("200 OK", "text/html; charset=UTF-8", "<p>page one</p>")) +
      rec("http://a/2", http("404 Not Found", "text/html", "<p>gone</p>")) +
      rec("http://a/3", http("200 OK", "text/plain", "robots here")) +
      rec("http://a/4", "no http layer at all") +
      rec("http://a/5", http("200 OK", "text/html",
        "body with\r\nContent-Type: text/evil\r\n\r\nlookalike"))
    val out = Warc.httpResponses(
        Warc.records(Seq((1L, blob)).toDF("warc_id", "warc"), "warc_id", "warc"),
        "body")
      .select("target_uri", "http_status", "mime", "charset", "http_body")
      .as[(String, Option[Int], String, String, String)].collect()
      .sortBy(_._1).toSeq
    assert(out === Seq(
      ("http://a/1", Some(200), "text/html", "utf-8", "<p>page one</p>"),
      ("http://a/2", Some(404), "text/html", "", "<p>gone</p>"),
      ("http://a/3", Some(200), "text/plain", "", "robots here"),
      ("http://a/4", None, "", "", ""),
      ("http://a/5", Some(200), "text/html", "",
        "body with\r\nContent-Type: text/evil\r\n\r\nlookalike")))
  }

  test("WarcIngestStage http mode routes only matching-status/mime " +
      "responses and drops non-response record types") {
    def http(status: String, ctype: String, body: String): String =
      s"HTTP/1.1 $status\r\nContent-Type: $ctype\r\n\r\n$body"
    def recT(tpe: String, uri: String, body: String): String = {
      val len = body.getBytes("UTF-8").length
      s"WARC/1.0\r\nWARC-Type: $tpe\r\nWARC-Target-URI: $uri\r\n" +
        s"Content-Length: $len\r\n\r\n$body\r\n\r\n"
    }
    val blob =
      recT("response", "http://e.com/doc/1",
        http("200 OK", "text/html", "<p>good</p>")) +
      recT("request", "http://e.com/doc/1", "GET /doc/1 HTTP/1.1\r\n\r\n") +
      recT("metadata", "http://e.com/doc/1",
        http("200 OK", "text/html", "<p>meta junk</p>")) +
      recT("response", "http://e.com/doc/2",
        http("404 Not Found", "text/html", "<p>dead</p>")) +
      recT("response", "http://e.com/doc/3",
        http("200 OK", "text/plain", "plain stuff"))
    val out = new WarcIngestStage()(
        Seq((1L, blob)).toDF("warc_id", "warc"), Map("http" -> "true"))
      .as[(Long, String, String)].collect().toSeq
    assert(out === Seq((1L, "<p>good</p>", "und")),
      s"request/metadata types and non-200/non-html responses must drop: $out")
  }

  test("recordsHttpDecoded: latin-1 and cp1252 entity bytes decode under " +
      "their declared charset; a String-typed path would have smashed " +
      "them to U+FFFD") {
    def rec(id: Long, cs: String, label: String, body: String): Array[Byte] = {
      val b = body.getBytes(java.nio.charset.Charset.forName(cs))
      val payload = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; " +
        s"charset=$label\r\n\r\n").getBytes("US-ASCII") ++ b
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://h/$id" +
        s"\r\nContent-Length: ${payload.length}\r\n\r\n")
        .getBytes("US-ASCII") ++ payload ++ "\r\n\r\n".getBytes("US-ASCII")
    }
    val blob = rec(1, "UTF-8", "UTF-8", "café utf") ++
      rec(2, "ISO-8859-1", "iso-8859-1", "café latin") ++
      rec(3, "windows-1252", "Windows-1252", "café € cp1252")
    val out = Warc.recordsHttpDecoded(
        Seq((1L, blob)).toDF("warc_id", "warc"), "warc_id", "warc")
      .select("target_uri", "charset", "text")
      .as[(String, String, String)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      ("http://h/1", "utf-8", "café utf"),
      ("http://h/2", "iso-8859-1", "café latin"),
      ("http://h/3", "windows-1252", "café € cp1252")), s"got $out")
  }

  test("mid-stream corruption fails loudly instead of resyncing") {
    val blob = rec("http://a/1", "ok body here") +
      "garbage that is not a record\r\n\r\n" + rec("http://a/2", "x")
    val err = intercept[Exception] {
      Seq((1L, blob)).toDF("id", "w")
        .select(GraftFunctions.warc_records($"w")).collect()
    }
    val msg = err.getMessage + Option(err.getCause).map(_.getMessage).mkString
    assert(msg.contains("lost sync"), s"wanted the lost-sync error, got $msg")
  }
}
