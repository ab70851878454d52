package graft.pipeline

import graft.SparkTestBase
import graft.config.ConfigCodec
import graft.model.{PipelineConfig, StageDef}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A stage plugin for the reflective-pipeline path (the PluginSpec shape). */
class SuffixStage extends graft.plugin.GraftStage {
  override def apply(df: DataFrame, options: Map[String, String]): DataFrame =
    df.withColumn("text",
      concat(col("text"), lit(options.getOrElse("suffix", "!"))))
}

class StagePipelineSpec extends SparkTestBase {
  import spark.implicits._

  private val docsDir = "/root/testdata/sf0.001"

  test("pipelineFromYaml: stages parse with options and materialize; " +
      "empty pipelines and unknown stages fail closed before data moves") {
    val cfg = ConfigCodec.pipelineFromYaml(
      """pipeline:
        |  name: demo
        |  stages:
        |    - stage: qualityGate
        |      materialize: true
        |      options:
        |        lang: en
        |    - stage: exactDedup
        |""".stripMargin)
    assert(cfg === PipelineConfig("demo", List(
      StageDef("qualityGate", Map("lang" -> "en"), materialize = true),
      StageDef("exactDedup", Map.empty, materialize = false))))
    intercept[ConfigCodec.ConfigError] {
      ConfigCodec.pipelineFromYaml("pipeline:\n  name: empty\n")
    }
    // stage resolution happens at COMPILE time — a typo fails before any
    // frame builds (the reference's init-time plugin-load contract)
    val bad = PipelineConfig("x", List(StageDef("qualtyGate")))
    val e = intercept[StagePipeline.StageError] {
      StagePipeline.compile(bad, Seq((1L, "t", "en")).toDF("doc_id", "text", "lang"))
    }
    assert(e.getMessage.contains("unknown stage"))
    val noTable = PipelineConfig("x",
      List(StageDef("decontaminate", Map("eval" -> "missing"))))
    val e2 = intercept[StagePipeline.StageError] {
      StagePipeline.compile(noTable,
        Seq((1L, "t", "en")).toDF("doc_id", "text", "lang"))
    }
    assert(e2.getMessage.contains("not bound"))
  }

  test("config-built curation pipeline (c31) is row-identical to the " +
      "code-built c07 — one stage definition serves both") {
    val docs = spark.read.parquet(s"$docsDir/documents.parquet")
    val cfg = ConfigCodec.pipelineFromYaml(
      """pipeline:
        |  name: curation
        |  stages:
        |    - stage: qualityGate
        |      materialize: true
        |      options:
        |        lang: en
        |        minQuality: "0.9"
        |        maxDupBigramFrac: "0.05"
        |    - stage: decontaminate
        |      options:
        |        eval: benchmark
        |        n: "5"
        |        threshold: "0.5"
        |    - stage: exactDedup
        |      materialize: true
        |    - stage: importanceResample
        |      options:
        |        lang: en
        |        buckets: "1024"
        |""".stripMargin)
    val fromConfig = StagePipeline.compile(cfg, docs,
        Map("benchmark" -> graft.SparkEntry.c07EvalDocs(docs)))
      .as[(Long, Double, Double, Double)].collect().toSet
    val fromCode = graft.SparkEntry.c07Pipeline(docs)
      .as[(Long, Double, Double, Double)].collect().toSet
    assert(fromConfig === fromCode)
    assert(fromCode.nonEmpty, "fixture sanity: survivors exist")
  }

  test("generic stages: filter + limit compose; a fully-qualified class " +
      "name loads a GraftStage reflectively with its options") {
    val df = (1L to 10L).map(i => (i, s"t$i", "en"))
      .toDF("doc_id", "text", "lang")
    val cfg = PipelineConfig("generic", List(
      StageDef("filter", Map("expression" -> "doc_id >= 3")),
      StageDef("limit", Map("n" -> "4")),
      StageDef("graft.pipeline.SuffixStage", Map("suffix" -> "?"))))
    val out = StagePipeline.compile(cfg, df)
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(out.length === 4)
    assert(out.head === ((3L, "t3?", "en")))
    assert(out.forall(_._2.endsWith("?")))
  }

  test("nearDupScreen stage: the minimum id of every near-dup cluster " +
      "survives, singletons pass, bad options fail closed") {
    // 1 and 2 are near-identical (one word dropped), 7 is unrelated
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val df = Seq(
      (1L, base, "en"),
      (2L, base.stripPrefix("alpha "), "en"),
      (7L, "completely different content about spark shuffles and jaccard",
        "en")).toDF("doc_id", "text", "lang")
    val cfg = PipelineConfig("s", List(
      StageDef("nearDupScreen", Map("threshold" -> "0.7"))))
    val kept = StagePipeline.compile(cfg, df)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(1L, 7L), s"expected min-of-cluster + singleton, got $kept")
    // pass-through: every input column survives the screen
    assert(StagePipeline.compile(cfg, df).columns.toSeq ===
      Seq("doc_id", "text", "lang"))
    intercept[IllegalArgumentException] {
      StagePipeline.compile(PipelineConfig("s", List(
        StageDef("nearDupScreen", Map("threshold" -> "0.0")))), df)
    }
    intercept[NumberFormatException] {
      StagePipeline.compile(PipelineConfig("s", List(
        StageDef("nearDupScreen", Map("threshold" -> "high")))), df)
    }
  }

  test("piiRedact stage: text replaced in place, other columns and " +
      "column order untouched") {
    val df = Seq(
      (1L, "mail me at bob@example.com or call +1 555 0100 200 today", "en"),
      (2L, "nothing sensitive here", "fr")).toDF("doc_id", "text", "lang")
    val out = StagePipeline.compile(
      PipelineConfig("p", List(StageDef("piiRedact"))), df)
    assert(out.columns.toSeq === Seq("doc_id", "text", "lang"))
    val rows = out.as[(Long, String, String)].collect().sortBy(_._1)
    assert(rows(0)._2.contains("<EMAIL>") && rows(0)._2.contains("<PHONE>"))
    assert(!rows(0)._2.contains("bob@") && rows(0)._3 === "en")
    assert(rows(1) === ((2L, "nothing sensitive here", "fr")))
  }

  test("htmlExtract stage consumes a pre-existing text column instead of " +
      "emitting an ambiguous duplicate") {
    val df = Seq((1L, "stale previous text",
      "<p>the real page body has plenty of words to clear the gate</p>"))
      .toDF("doc_id", "text", "html")
    val out = StagePipeline.compile(
      PipelineConfig("p", List(StageDef("htmlExtract"))), df)
    assert(out.columns.count(_ == "text") === 1)
    assert(out.select("text").as[String].head()
      .startsWith("the real page body"))
  }

  test("stagesOf exposes every stage output under indexed names (the " +
      "funnel shape)") {
    val df = Seq((1L, "a", "en"), (2L, "b", "en")).toDF("doc_id", "text", "lang")
    val stages = StagePipeline.stagesOf(
      PipelineConfig("p", List(StageDef("filter",
        Map("expression" -> "doc_id = 1")))), df)
    assert(stages.map(_._1) === Seq("a0_input", "a1_filter"))
    assert(stages.last._2.count() === 1L)
  }
}
