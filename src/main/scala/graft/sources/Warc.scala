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

  /** [[records]] with the capture-identity headers a crawl DEDUP needs:
    * `WARC-Date` (capture time), `WARC-Payload-Digest` (the content
    * digest CommonCrawl keys revisits by) and
    * `WARC-Refers-To-Target-URI` (a revisit's pointer at the original
    * capture). Same framing kernel, same explode; '' where a header is
    * absent. Output: (idCol, record_no, warc_type, target_uri,
    * warc_date, payload_digest, refers_to_uri, content_length, body).
    */
  def recordsFull(df: DataFrame, idCol: String,
      warcCol: String): DataFrame = {
    def hdr(name: String) =
      regexp_extract(col("__rec"), s"(?m)^$name: *([^\\r\\n]+)", 1)
    df.select(col(idCol),
        posexplode(graft.functions.GraftFunctions.warc_records(col(warcCol)))
          .as(Seq("record_no", "__rec")))
      .select(col(idCol), col("record_no"),
        hdr("WARC-Type").as("warc_type"),
        hdr("WARC-Target-URI").as("target_uri"),
        hdr("WARC-Date").as("warc_date"),
        hdr("WARC-Payload-Digest").as("payload_digest"),
        hdr("WARC-Refers-To-Target-URI").as("refers_to_uri"),
        hdr("Content-Length").cast("long").as("content_length"),
        regexp_extract(col("__rec"), "(?s)\\r\\n\\r\\n(.*)$", 1).as("body"))
  }

  /** Payload-digest crawl dedup — the REAL pipeline's first dedup,
    * BEFORE any MinHash: a recrawl of an unchanged page ships either a
    * full duplicate `response` or a bodyless `revisit` record carrying
    * only the digest, and training corpora keep ONE capture per
    * digest. Keeps the EARLIEST response per digest (order:
    * `warc_date`, ties by `target_uri` — both ASCII, so the encoded
    * `date|uri` min is the same lexicographic argmin on both engines),
    * counting every capture (responses + revisits) that pointed at it.
    * Digests with NO response in the frame (a revisit whose original
    * fell outside the crawl) drop — there is nothing to read
    * (documented; count them upstream if completeness tracking needs
    * them). Records without a digest drop (nothing to key on).
    *
    * 100 TB posture: ONE digest-keyed hash aggregate (map-side
    * combined) — `min_by` + counts, never a per-digest window; bodies
    * shuffle once, keyed by digest, exactly like the upsert operator
    * (O13). Input: a [[recordsFull]]-shaped frame. Output:
    * (payload_digest, target_uri, warc_date, n_captures, n_revisits,
    * body).
    */
  def dedupByDigest(records: DataFrame): DataFrame = {
    val ord = concat(col("warc_date"), lit("|"), col("target_uri"))
    records.filter(col("payload_digest") =!= "")
      .groupBy("payload_digest")
      .agg(
        min_by(struct(col("target_uri"), col("warc_date"), col("body")),
          when(col("warc_type") === "response", ord)).as("__w"),
        count(lit(1)).as("n_captures"),
        count(when(col("warc_type") === "revisit", 1)).as("n_revisits"))
      .filter(col("__w").isNotNull)
      .select(col("payload_digest"),
        col("__w.target_uri").as("target_uri"),
        col("__w.warc_date").as("warc_date"),
        col("n_captures"), col("n_revisits"),
        col("__w.body").as("body"))
  }

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

  /** The full real-crawl read for what servers ACTUALLY send: BINARY
    * record framing ([[graft.functions.WarcCodec.warcRecordsBin]] — a
    * String-typed path would smash non-UTF-8 entity bytes to U+FFFD
    * before any decode could see them), header fields parsed over the
    * record's ASCII header region (a byte-preserving string wrap; the
    * U+FFFD replacement only ever lands in the entity region, which no
    * header pattern touches), the HTTP layer's status/mime from the
    * payload's own header block, then the three entity-layer decodes
    * in wire order:
    *
    *  1. `Transfer-Encoding: chunked` → chunk reassembly
    *     ([[graft.functions.WarcCodec.httpDechunk]] — applied FIRST:
    *     transfer coding is the outermost layer);
    *  2. `Content-Encoding: gzip` → inflate
    *     ([[graft.functions.WarcCodec.gunzipMembers]]);
    *  3. charset decode FROM BYTES under the HTML5 precedence — a
    *     byte-order mark beats the HTTP `Content-Type` charset beats an
    *     in-page `<meta charset=…>` / `http-equiv` declaration (sniffed
    *     over the first ~1 KB, the spec's prescan window) beats the
    *     UTF-8 web default — via the per-row-label
    *     [[graft.functions.WarcCodec.decodeCharsetDyn]] kernel (WHATWG
    *     label mapping, one kernel instead of a per-charset
    *     `when`-fold that grows the plan with the label set).
    *
    * The entity bytes are the double kernel application: entity(record)
    * is the WARC payload, entity(payload) is the HTTP body. Map-only +
    * one explode; bytes never shuffle. Output: (idCol, record_no,
    * warc_type, target_uri, http_status, mime, transfer_encoding,
    * content_encoding, charset, text) — `charset` is the EFFECTIVE
    * label the decode used ('' = undeclared → UTF-8); `text` is NULL
    * when a declared coding lies structurally (says-chunked-but-isn't,
    * says-gzip-but-isn't — the foreign-input null contract surfacing
    * per row).
    */
  def recordsHttpDecoded(df: DataFrame, idCol: String,
      warcCol: String): DataFrame = {
    val G = graft.functions.GraftFunctions
    val bomUtf8 = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte)
    val bomLe = Array(0xFF.toByte, 0xFE.toByte)
    val bomBe = Array(0xFE.toByte, 0xFF.toByte)
    val staged = df.select(col(idCol),
        posexplode(G.warc_records_bin(col(warcCol)))
          .as(Seq("record_no", "__rec")))
      // byte-preserving wrap: header regexes only ever match ASCII
      .withColumn("__s", col("__rec").cast("string"))
      // HTTP header block = between the record's first CRLFCRLF (end of
      // WARC headers) and the next (end of HTTP headers)
      .withColumn("__hh",
        regexp_extract(col("__s"), "(?s)\\r\\n\\r\\n(.*?)\\r\\n\\r\\n", 1))
      .withColumn("__te", lower(trim(regexp_extract(col("__hh"),
        "(?i)(?:^|\\r\\n)Transfer-Encoding: *([^\\r\\n]+)", 1))))
      .withColumn("__ce", lower(trim(regexp_extract(col("__hh"),
        "(?i)(?:^|\\r\\n)Content-Encoding: *([^\\r\\n]+)", 1))))
      // entity bytes: payload = entity(record), body = entity(payload)
      .withColumn("__e0",
        G.http_entity_bytes(G.http_entity_bytes(col("__rec"))))
      .withColumn("__e1",
        when(col("__te").contains("chunked"), G.http_dechunk(col("__e0")))
          .otherwise(col("__e0")))
      .withColumn("__ent",
        when(col("__ce") === "gzip" || col("__ce") === "x-gzip",
          G.gunzip_members(col("__e1"))).otherwise(col("__e1")))
      .withColumn("__hcs", lower(regexp_extract(col("__hh"),
        "(?i)charset=\"?([A-Za-z0-9_.:-]+)", 1)))
      // meta prescan: ASCII declarations survive the byte-preserving
      // wrap even mid-mojibake; covers <meta charset=…> AND the
      // http-equiv content="…charset=…" form in one pattern
      .withColumn("__mcs", lower(regexp_extract(
        substring(col("__ent").cast("string"), 1, 1024),
        "(?i)<meta[^>]*\\bcharset\\s*=\\s*[\"']?([A-Za-z0-9_.:-]+)", 1)))
      .withColumn("__bom",
        when(substring(col("__ent"), 1, 3) === lit(bomUtf8), "utf-8")
          .when(substring(col("__ent"), 1, 2) === lit(bomLe), "utf-16le")
          .when(substring(col("__ent"), 1, 2) === lit(bomBe), "utf-16be")
          .otherwise(""))
      .withColumn("charset",
        when(col("__bom") =!= "", col("__bom"))
          .when(col("__hcs") =!= "", col("__hcs"))
          .otherwise(col("__mcs")))
    staged.select(col(idCol), col("record_no"),
      regexp_extract(col("__s"), "(?m)^WARC-Type: *([^\\r\\n]+)", 1)
        .as("warc_type"),
      regexp_extract(col("__s"), "(?m)^WARC-Target-URI: *([^\\r\\n]+)", 1)
        .as("target_uri"),
      nullif(regexp_extract(col("__hh"), "^HTTP/[0-9.]+ ([0-9]{3})", 1),
        lit("")).cast("int").as("http_status"),
      lower(trim(regexp_extract(col("__hh"),
        "(?i)(?:^|\\r\\n)Content-Type: *([^;\\r\\n]+)", 1))).as("mime"),
      col("__te").as("transfer_encoding"),
      col("__ce").as("content_encoding"),
      col("charset"),
      G.decode_charset_dyn(col("__ent"), col("charset")).as("text"))
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
    *  - `location` — the `Location` header verbatim ('' when absent;
    *    3xx responses carry the redirect target here, and RFC 9110
    *    allows it to be RELATIVE — resolve against the request URI,
    *    then collapse chains via [[graft.operators.Redirects]]),
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
        trim(regexp_extract(col("__hdr"),
          "(?i)\\r\\nLocation: *([^\\r\\n]+)", 1)).as("location") :+
        regexp_extract(col("__pay"), "(?s)\\r\\n\\r\\n(.*)$", 1)
          .as("http_body"): _*)
  }
}
