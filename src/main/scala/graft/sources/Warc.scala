package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * WARC record source — the CommonCrawl container (ISO 28500), the
 * format every web-corpus pipeline reads BEFORE the stage-0 extraction
 * this engine already runs ([[graft.operators.Html]]): a crawl ships as
 * concatenated response records, each a header block (WARC-Type,
 * WARC-Target-URI, Content-Length, …), a blank line, and exactly
 * Content-Length payload bytes.
 *
 * Split of work (the codec discipline): byte-exact FRAMING — the only
 * part a regex cannot do safely, since payloads may contain anything
 * including header-lookalike text — is one codegen'd kernel call per
 * blob ([[graft.functions.WarcCodec.warcRecords]]); header-FIELD
 * parsing over already-framed records stays in plain relational
 * `regexp_extract`s, which is exactly what the DuckDB oracle replays.
 * Map-only + one explode; a 100 TB crawl reads as (blob per task) →
 * records without any shuffle.
 */
object Warc {

  /** Explode a frame of WARC blobs into records with their standard
    * header fields. Output: (idCol, record_no, warc_type, target_uri,
    * content_length, body) — `record_no` is the record's position in
    * its blob; non-WARC blobs drop (the kernel's null contract); torn
    * trailing records drop like a demuxer's torn last frame.
    */
  def records(df: DataFrame, idCol: String, warcCol: String): DataFrame =
    df.select(col(idCol),
        posexplode(graft.functions.GraftFunctions.warc_records(col(warcCol)))
          .as(Seq("record_no", "__rec")))
      .select(col(idCol), col("record_no"),
        regexp_extract(col("__rec"), "(?m)^WARC-Type: *([^\\r\\n]+)", 1)
          .as("warc_type"),
        regexp_extract(col("__rec"), "(?m)^WARC-Target-URI: *([^\\r\\n]+)", 1)
          .as("target_uri"),
        regexp_extract(col("__rec"), "(?m)^Content-Length: *([0-9]+)", 1)
          .cast("long").as("content_length"),
        regexp_extract(col("__rec"), "(?s)\\r\\n\\r\\n(.*)$", 1).as("body"))
}
