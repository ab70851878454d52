package graft.plugin

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * WARC ingest as a PLUGIN stage — the blob→documents front of a crawl
 * pipeline, declarable from YAML by fully-qualified class name (the
 * reference's `Class.forName` plugin contract, exercised here by a REAL
 * shipped plugin rather than a test double): each input row's WARC blob
 * explodes into records ([[graft.sources.Warc.records]] — the
 * byte-exact framing kernel + relational field parse), records that are
 * not `WARC-Type: response` drop (a real crawl interleaves request and
 * metadata records carrying the SAME target URI — URI matching alone
 * would ingest HTTP request headers as documents), the document id
 * parses from the record's target URI, and the payload emerges as
 * `html` ready for the `htmlExtract` stage.
 *
 * Real-crawl options:
 *  - `gzip: "true"` — blobs are concatenated RFC 1952 gzip members (the
 *    CommonCrawl shipping layout); inflates member-wise
 *    ([[graft.sources.Warc.recordsGzip]]) before framing.
 *  - `http: "true"` — response payloads are full HTTP responses (status
 *    line + headers + CRLFCRLF + entity body); parses the HTTP layer
 *    ([[graft.sources.Warc.httpResponses]]) and routes ONLY
 *    `httpStatus` (default 200) `httpMime` (default text/html) entities
 *    onward, with `html` being the entity body — without this, every
 *    downstream stage would see HTTP headers glued onto the page.
 *
 * Other options: `warcCol` (default `warc`), `blobIdCol` (default
 * `warc_id`), `idPattern` (default `/doc/([0-9]+)` — group 1 must be
 * the numeric doc id), `recordType` (default `response`; `any`
 * disables the type filter), `lang` (the carried metadata value,
 * default `und` — a raw crawl has no prior language column; the gate
 * decides on pred_lang). Output: (doc_id, html, lang).
 */
class WarcIngestStage extends GraftStage {
  override def apply(df: DataFrame,
      options: Map[String, String]): DataFrame = {
    val idPattern = options.getOrElse("idPattern", "/doc/([0-9]+)")
    val blobId = options.getOrElse("blobIdCol", "warc_id")
    val warcCol = options.getOrElse("warcCol", "warc")
    val recs0 =
      if (options.getOrElse("gzip", "false").toBoolean)
        graft.sources.Warc.recordsGzip(df, blobId, warcCol)
      else graft.sources.Warc.records(df, blobId, warcCol)
    val recordType = options.getOrElse("recordType", "response")
    val typed =
      if (recordType == "any") recs0
      else recs0.filter(col("warc_type") === recordType)
    val routed =
      if (options.getOrElse("http", "false").toBoolean)
        graft.sources.Warc.httpResponses(typed, "body")
          .filter(col("http_status") ===
            options.getOrElse("httpStatus", "200").toInt &&
            col("mime") === options.getOrElse("httpMime", "text/html"))
          .withColumn("body", col("http_body"))
      else typed
    routed
      .select(
        regexp_extract(col("target_uri"), idPattern, 1).as("__d"),
        col("body").as("html"),
        lit(options.getOrElse("lang", "und")).as("lang"))
      .filter(col("__d") =!= "")
      .select(col("__d").cast("long").as("doc_id"), col("html"),
        col("lang"))
  }
}
