package graft.sources

import graft.SparkTestBase
import graft.functions.GraftFunctions
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
