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

  /** [[records]] over gzip-shipped blobs — the byte layout CommonCrawl
    * actually uses (concatenated RFC 1952 members, one per record): one
    * member-wise inflate kernel
    * ([[graft.functions.WarcCodec.gunzipMembers]], BINARY → BINARY) in
    * front of the same byte-exact framing. Still map-only + one explode.
    */
  def recordsGzip(df: DataFrame, idCol: String, warcCol: String): DataFrame =
    records(
      df.withColumn(warcCol,
        graft.functions.GraftFunctions.gunzip_members(col(warcCol))),
      idCol, warcCol)

  /** The full real-crawl read for NON-UTF-8 bodies: BINARY record
    * framing ([[graft.functions.WarcCodec.warcRecordsBin]] — a
    * String-typed path would smash non-UTF-8 entity bytes to U+FFFD
    * before any decode could see them), header fields parsed over the
    * record's ASCII header region (a byte-preserving string wrap; the
    * U+FFFD replacement only ever lands in the entity region, which no
    * header pattern touches), the HTTP layer's status/mime/charset from
    * the payload's own header block, and the entity decoded FROM BYTES
    * under its declared charset — `charsets` lists the supported
    * non-UTF-8 labels (each becomes one literal-charset `decode`
    * branch; unlisted or absent charsets decode as UTF-8, the web
    * default). The entity bytes are the double kernel application:
    * entity(record) is the WARC payload, entity(payload) is the HTTP
    * body. Map-only + one explode. Output: (idCol, record_no,
    * warc_type, target_uri, http_status, mime, charset, text).
    */
  def recordsHttpDecoded(df: DataFrame, idCol: String, warcCol: String,
      charsets: Seq[String] = Seq("iso-8859-1", "windows-1252"))
      : DataFrame = {
    val G = graft.functions.GraftFunctions
    val staged = df.select(col(idCol),
        posexplode(G.warc_records_bin(col(warcCol)))
          .as(Seq("record_no", "__rec")))
      // byte-preserving wrap: header regexes only ever match ASCII
      .withColumn("__s", col("__rec").cast("string"))
      // HTTP header block = between the record's first CRLFCRLF (end of
      // WARC headers) and the next (end of HTTP headers)
      .withColumn("__hh",
        regexp_extract(col("__s"), "(?s)\\r\\n\\r\\n(.*?)\\r\\n\\r\\n", 1))
      // entity bytes: payload = entity(record), body = entity(payload)
      .withColumn("__body",
        G.http_entity_bytes(G.http_entity_bytes(col("__rec"))))
      .withColumn("charset",
        lower(regexp_extract(col("__hh"),
          "(?i)charset=\"?([A-Za-z0-9_.:-]+)", 1)))
    val G2 = graft.functions.GraftFunctions
    val text = charsets.foldLeft(G2.decode_charset(col("__body"), "UTF-8")) {
      (acc, cs) =>
        when(col("charset") === cs, G2.decode_charset(col("__body"), cs))
          .otherwise(acc)
    }
    staged.select(col(idCol), col("record_no"),
      regexp_extract(col("__s"), "(?m)^WARC-Type: *([^\\r\\n]+)", 1)
        .as("warc_type"),
      regexp_extract(col("__s"), "(?m)^WARC-Target-URI: *([^\\r\\n]+)", 1)
        .as("target_uri"),
      nullif(regexp_extract(col("__hh"), "^HTTP/[0-9.]+ ([0-9]{3})", 1),
        lit("")).cast("int").as("http_status"),
      lower(trim(regexp_extract(col("__hh"),
        "(?i)(?:^|\\r\\n)Content-Type: *([^;\\r\\n]+)", 1))).as("mime"),
      col("charset"), text.as("text"))
  }

  /** Parse the HTTP-response layer INSIDE a framed record's payload — a
    * real `WARC-Type: response` payload is an HTTP response (status
    * line, headers, CRLFCRLF, then the entity body), so reading `body`
    * as the page glues HTTP headers onto the HTML. Adds to `df`:
    *
    *  - `http_status` — the status-line code (INT; NULL when the payload
    *    is not an HTTP response — consumers filter on it),
    *  - `mime` — the `Content-Type` media type, lowercased, parameters
    *    stripped ('' when absent),
    *  - `charset` — the `Content-Type` charset parameter, lowercased
    *    ('' when absent),
    *  - `http_body` — the entity body after the first header/body
    *    CRLFCRLF boundary ('' for header-only responses).
    *
    * All plain relational `regexp_extract`s over the payload column
    * (RE2-safe: lazy quantifiers only, no lookaround, no backrefs), so
    * the DuckDB oracle replays this layer GENUINELY — unlike the WARC
    * framing itself, nothing here restates fixture ground truth. The
    * header search is restricted to the pre-CRLFCRLF header block, so
    * header-lookalike text in the entity body cannot false-match.
    * Map-only; `bodyCol` is consumed (replaced by the parse).
    */
  def httpResponses(df: DataFrame, bodyCol: String): DataFrame = {
    val others = df.columns.filterNot(_ == bodyCol).map(col).toIndexedSeq
    df.select(others :+
        regexp_extract(col(bodyCol), "(?s)^(.*?)\\r\\n\\r\\n", 1)
          .as("__hdr") :+ col(bodyCol).as("__pay"): _*)
      .select(others :+
        nullif(regexp_extract(col("__hdr"), "^HTTP/[0-9.]+ ([0-9]{3})", 1),
          lit("")).cast("int").as("http_status") :+
        lower(trim(regexp_extract(col("__hdr"),
          "(?i)\\r\\nContent-Type: *([^;\\r\\n]+)", 1))).as("mime") :+
        lower(regexp_extract(col("__hdr"),
          "(?i)charset=\"?([A-Za-z0-9_.:-]+)", 1)).as("charset") :+
        regexp_extract(col("__pay"), "(?s)\\r\\n\\r\\n(.*)$", 1)
          .as("http_body"): _*)
  }
}
