package graft.plugin

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * WARC ingest as a PLUGIN stage — the blob→documents front of a crawl
 * pipeline, declarable from YAML by fully-qualified class name (the
 * reference's `Class.forName` plugin contract, exercised here by a REAL
 * shipped plugin rather than a test double): each input row's WARC blob
 * explodes into response records ([[graft.sources.Warc.records]] — the
 * byte-exact framing kernel + relational field parse), the document id
 * parses from the record's target URI, and the payload emerges as
 * `html` ready for the `htmlExtract` stage. Rows whose URI does not
 * match `idPattern` drop (metadata/request records a response-only
 * pipeline skips).
 *
 * Options: `warcCol` (default `warc`), `blobIdCol` (default `warc_id`),
 * `idPattern` (default `/doc/([0-9]+)` — group 1 must be the numeric
 * doc id), `lang` (the carried metadata value, default `und` — a raw
 * crawl has no prior language column; the gate decides on pred_lang).
 * Output: (doc_id, html, lang).
 */
class WarcIngestStage extends GraftStage {
  override def apply(df: DataFrame,
      options: Map[String, String]): DataFrame = {
    val idPattern = options.getOrElse("idPattern", "/doc/([0-9]+)")
    graft.sources.Warc.records(df,
        options.getOrElse("blobIdCol", "warc_id"),
        options.getOrElse("warcCol", "warc"))
      .select(
        regexp_extract(col("target_uri"), idPattern, 1).as("__d"),
        col("body").as("html"),
        lit(options.getOrElse("lang", "und")).as("lang"))
      .filter(col("__d") =!= "")
      .select(col("__d").cast("long").as("doc_id"), col("html"),
        col("lang"))
  }
}
