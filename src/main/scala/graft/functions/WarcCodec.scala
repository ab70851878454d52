package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/**
 * WARC/1.0 record framing (ISO 28500 — the CommonCrawl container): a
 * WARC file is concatenated records, each a CRLF-terminated header
 * block, a blank line, then EXACTLY `Content-Length` payload BYTES,
 * then two CRLFs. Framing is length-driven — a payload may contain
 * anything, including text that looks like a WARC header — so the
 * splitter must do byte arithmetic; regexes only parse the header
 * FIELDS of already-framed records (that half stays in relational
 * Column ops, [[graft.sources.Warc]]).
 *
 * Contract (the MediaCodecs discipline): input not starting with
 * `WARC/` → null (foreign rows drop); a structurally torn TRAILING
 * record (declared length overrunning the payload) drops like a
 * demuxer's torn last frame; a malformed header MID-STREAM fails
 * loudly (silently resynchronizing would mis-frame every later
 * record). Byte-exact: `Content-Length` counts bytes, not characters,
 * so multi-byte text frames correctly.
 */
object WarcCodec {

  private val Magic = "WARC/".getBytes("US-ASCII")
  private val ClKey = "\r\nCONTENT-LENGTH:".getBytes("US-ASCII")

  /** ASCII-case-insensitive prefix test — for header field NAMES only
    * (ISO 28500 makes names case-insensitive; the `WARC/` version line
    * is NOT, see [[startsWithExact]]).
    */
  private def startsWith(b: Array[Byte], at: Int, p: Array[Byte]): Boolean = {
    if (at + p.length > b.length) return false
    var i = 0
    while (i < p.length) {
      val c = b(at + i)
      val u = if (c >= 'a' && c <= 'z') (c - 32).toByte else c
      if (u != p(i)) return false
      i += 1
    }
    true
  }

  /** Exact-byte prefix test — the record-start magic is the ISO 28500
    * version line (`WARC/1.0`), which is case-SENSITIVE: `warc/1.0`
    * must NOT frame as a record.
    */
  private def startsWithExact(b: Array[Byte], at: Int,
      p: Array[Byte]): Boolean = {
    if (at + p.length > b.length) return false
    var i = 0
    while (i < p.length) {
      if (b(at + i) != p(i)) return false
      i += 1
    }
    true
  }

  /** [[warcRecords]] over a BINARY blob column — the shape a real crawl
    * ships (gzip members inflate to bytes, [[gunzipMembers]]); record
    * slices come back as UTF8String WRAPS of the raw record bytes
    * (Spark STRING does not validate UTF-8, so framing stays byte-exact
    * even for payload bytes that are not valid text).
    */
  def warcRecords(bytes: Array[Byte]): ArrayData = warcRecordsBytes(bytes)

  /** Split concatenated WARC records into per-record string slices
    * (header block + blank line + payload; the inter-record CRLFCRLF
    * consumed). ARRAY<STRING> in file order, or null for non-WARC input.
    */
  def warcRecords(s: UTF8String): ArrayData = warcRecordsBytes(s.getBytes)

  private def warcRecordsBytes(bytes: Array[Byte]): ArrayData = {
    if (bytes.length < Magic.length || !startsWithExact(bytes, 0, Magic))
      return null
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var pos = 0
    while (pos < bytes.length) {
      // skip stray inter-record CRLFs (tolerant readers do)
      while (pos < bytes.length &&
        (bytes(pos) == '\r' || bytes(pos) == '\n')) pos += 1
      if (pos >= bytes.length) return new GenericArrayData(out.toArray)
      if (!startsWithExact(bytes, pos, Magic))
        throw new IllegalArgumentException(
          s"WARC stream lost sync at byte $pos: expected a WARC/ record " +
            "header (a mid-stream resync would mis-frame every later record)")
      // header block ends at the first CRLFCRLF
      var he = pos
      while (he + 3 < bytes.length &&
        !(bytes(he) == '\r' && bytes(he + 1) == '\n' &&
          bytes(he + 2) == '\r' && bytes(he + 3) == '\n')) he += 1
      if (he + 3 >= bytes.length)
        return new GenericArrayData(out.toArray) // torn header: tail drops
      // Content-Length within the header block
      var cl = -1L
      var i = pos
      while (cl < 0 && i < he) {
        if (startsWith(bytes, i, ClKey)) {
          var j = i + ClKey.length
          while (j < he && bytes(j) == ' ') j += 1
          var v = 0L
          var digits = 0
          while (j < he && bytes(j) >= '0' && bytes(j) <= '9') {
            v = v * 10 + (bytes(j) - '0'); j += 1; digits += 1
          }
          // a non-numeric value must fail LOUDLY like a missing header —
          // a silent cl=0 mis-frame would re-scan inside the payload,
          // violating the fail-loudly-mid-stream contract; 19+ digits
          // would overflow the Long accumulator (and no real payload is
          // within 10^3 of that), so they are rejected the same way
          if (digits == 0 || digits > 18)
            throw new IllegalArgumentException(
              s"WARC record at byte $pos has an unparseable " +
                s"Content-Length value ($digits digits)")
          cl = v
        }
        i += 1
      }
      if (cl < 0)
        throw new IllegalArgumentException(
          s"WARC record at byte $pos has no Content-Length header")
      val end = he + 4 + cl
      if (end > bytes.length)
        return new GenericArrayData(out.toArray) // torn payload: tail drops
      out += UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(bytes, pos, end.toInt))
      pos = end.toInt
    }
    new GenericArrayData(out.toArray)
  }

  /** [[warcRecords]] with BINARY record slices — for payloads that are
    * NOT valid UTF-8 (a real crawl's entity bodies arrive in whatever
    * charset the server sent; any String-typed regexp would smash the
    * non-UTF-8 bytes to U+FFFD before a decode could see them). Same
    * framing walk, same contracts.
    */
  def warcRecordsBin(bytes: Array[Byte]): ArrayData = {
    val recs = warcRecordsBytes(bytes)
    if (recs == null) null
    else new GenericArrayData(
      (0 until recs.numElements()).map(i =>
        recs.getUTF8String(i).getBytes: Any).toArray)
  }

  /** The HTTP entity body as BYTES: everything after the first
    * header/body CRLFCRLF boundary of `payload` (empty when no boundary
    * exists — a non-HTTP payload has no entity). The binary complement
    * of [[graft.sources.Warc.httpResponses]]'s `http_body`, for bodies
    * whose charset is not UTF-8 (decode AFTER splitting, on raw bytes).
    */
  def httpEntityBytes(payload: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i + 3 < payload.length) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
        payload(i + 2) == '\r' && payload(i + 3) == '\n')
        return java.util.Arrays.copyOfRange(payload, i + 4, payload.length)
      i += 1
    }
    Array.emptyByteArray
  }

  /** Decode bytes under any JVM charset (Spark's `decode` whitelists a
    * handful and rejects e.g. windows-1252, which real crawls ship
    * constantly). Malformed sequences REPLACE (U+FFFD) — the lossy
    * tolerance a crawl pipeline wants for a server-declared charset the
    * server itself violates; the declared-vs-actual mismatch is a
    * quality-gate concern, not a crash.
    */
  def decodeCharset(bytes: Array[Byte], charset: String): UTF8String =
    UTF8String.fromString(
      new String(bytes, java.nio.charset.Charset.forName(charset)))

  /** The supported charset-LABEL table for [[decodeCharsetDyn]] —
    * lowercased server/page labels → JVM charset names, following the
    * WHATWG Encoding Standard's label mapping where it deviates from
    * the IANA name (the browser behavior a web corpus was authored
    * against): `iso-8859-1`/`latin1`/`us-ascii` decode as
    * windows-1252 (their C1 range 0x80–0x9F carries cp1252 symbols on
    * the real web), `gb2312` as GBK, bare `utf-16` as little-endian.
    * Unlisted or empty labels fall back to UTF-8, the web default.
    */
  private val charsetLabels: Map[String, java.nio.charset.Charset] = {
    import java.nio.charset.Charset.{forName => cs}
    Map(
      "utf-8" -> cs("UTF-8"), "utf8" -> cs("UTF-8"),
      "iso-8859-1" -> cs("windows-1252"), "latin-1" -> cs("windows-1252"),
      "latin1" -> cs("windows-1252"), "us-ascii" -> cs("windows-1252"),
      "ascii" -> cs("windows-1252"), "windows-1252" -> cs("windows-1252"),
      "cp1252" -> cs("windows-1252"),
      "iso-8859-2" -> cs("ISO-8859-2"), "iso-8859-15" -> cs("ISO-8859-15"),
      "windows-1250" -> cs("windows-1250"),
      "windows-1251" -> cs("windows-1251"),
      "windows-1254" -> cs("windows-1254"), "koi8-r" -> cs("KOI8-R"),
      "shift_jis" -> cs("Shift_JIS"), "shift-jis" -> cs("Shift_JIS"),
      "sjis" -> cs("Shift_JIS"), "x-sjis" -> cs("Shift_JIS"),
      "euc-jp" -> cs("EUC-JP"), "gbk" -> cs("GBK"), "gb2312" -> cs("GBK"),
      "gb18030" -> cs("GB18030"), "big5" -> cs("Big5"),
      "euc-kr" -> cs("EUC-KR"),
      "utf-16le" -> cs("UTF-16LE"), "utf-16be" -> cs("UTF-16BE"),
      "utf-16" -> cs("UTF-16LE"))
  }

  /** [[decodeCharset]] with the charset label as a PER-ROW argument —
    * the shape a real crawl needs (a corpus spans ~15+ charsets, and a
    * per-charset `when`-branch over the whole decode expression is
    * plan bloat that grows with the label set; here dispatch is one
    * map lookup inside one kernel). Label resolution via
    * [[charsetLabels]] (WHATWG mapping, unknown/NULL → UTF-8); a
    * leading byte-order mark the resolved charset owns (UTF-8's
    * EF BB BF, UTF-16's FF FE / FE FF) strips before the decode — the
    * text must not lead with U+FEFF. Malformed sequences REPLACE.
    */
  def decodeCharsetDyn(bytes: Array[Byte], label: UTF8String): UTF8String = {
    val l = if (label == null) "" else label.toString.trim.toLowerCase
    val cs = charsetLabels.getOrElse(l,
      java.nio.charset.StandardCharsets.UTF_8)
    val name = cs.name()
    val skip =
      if (name == "UTF-8" && bytes.length >= 3 &&
        (bytes(0) & 0xff) == 0xef && (bytes(1) & 0xff) == 0xbb &&
        (bytes(2) & 0xff) == 0xbf) 3
      else if (name == "UTF-16LE" && bytes.length >= 2 &&
        (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xfe) 2
      else if (name == "UTF-16BE" && bytes.length >= 2 &&
        (bytes(0) & 0xff) == 0xfe && (bytes(1) & 0xff) == 0xff) 2
      else 0
    UTF8String.fromString(
      new String(bytes, skip, bytes.length - skip, cs))
  }

  private def hexVal(b: Byte): Int =
    if (b >= '0' && b <= '9') b - '0'
    else if (b >= 'a' && b <= 'f') b - 'a' + 10
    else if (b >= 'A' && b <= 'F') b - 'A' + 10
    else -1

  /** Decode an HTTP/1.1 `Transfer-Encoding: chunked` entity (RFC 9112
    * §7.1: `<hex-size>[;ext]CRLF <data> CRLF` repeated, then
    * `0 CRLF [trailer lines] CRLF`) into the reassembled body bytes.
    * Chunk framing is length-driven — chunk data may contain anything,
    * including CRLF-plus-hex lookalikes — so this is a byte kernel,
    * same argument as the WARC/gzip framing.
    *
    * The codec discipline, mirrored from [[warcRecords]] /
    * [[gunzipMembers]]:
    *  - input that does not START with a hex chunk-size line → null
    *    (not actually chunked — a server that says chunked but ships
    *    identity is a quality concern, not a crash);
    *  - a structurally TORN tail (EOF mid size-line, mid chunk-data,
    *    or before the terminal 0-chunk) returns the COMPLETE chunks
    *    assembled so far — truncated responses are a crawl staple
    *    (`WARC-Truncated`); the torn partial chunk drops;
    *  - corruption MID-STREAM fails loudly: a complete chunk whose
    *    data is not followed by CRLF, garbage where a chunk-size line
    *    must start, or an unreasonable (>7 hex digit) size;
    *  - bytes after the terminal chunk's trailer section fail loudly
    *    (the entity is length-framed by its WARC record — extras mean
    *    the stream is mis-framed).
    */
  def httpDechunk(bytes: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var pos = 0
    var first = true
    while (true) {
      // hex chunk-size (≤7 digits = 256 MB: far beyond any real chunk;
      // an 8th digit is corruption, not a size)
      var p = pos
      var size = 0
      var digits = 0
      while (p < bytes.length && digits <= 7 && hexVal(bytes(p)) >= 0) {
        size = size * 16 + hexVal(bytes(p)); p += 1; digits += 1
      }
      if (digits == 0 || digits > 7) {
        if (first) return null
        throw new IllegalArgumentException(
          s"chunked stream lost sync at byte $pos: expected a hex " +
            "chunk-size line")
      }
      // chunk extension / BWS, then CRLF
      if (p < bytes.length &&
        !(bytes(p) == '\r' || bytes(p) == ';' || bytes(p) == ' ' ||
          bytes(p) == '\t')) {
        if (first) return null
        throw new IllegalArgumentException(
          s"chunked stream at byte $pos has garbage after the chunk size")
      }
      while (p < bytes.length && bytes(p) != '\r') p += 1
      if (p + 1 >= bytes.length) return out.toByteArray // torn size line
      if (bytes(p + 1) != '\n') {
        if (first) return null
        throw new IllegalArgumentException(
          s"chunked stream at byte $pos: chunk-size line not CRLF-terminated")
      }
      val dataStart = p + 2
      if (size == 0) {
        // trailer section: empty (immediate CRLF) or trailer lines
        // ending CRLFCRLF; EOF inside it is a torn-but-complete body
        var q = dataStart
        if (q + 1 < bytes.length && bytes(q) == '\r' && bytes(q + 1) == '\n')
          q += 2
        else {
          var found = false
          while (!found && q + 3 < bytes.length) {
            if (bytes(q) == '\r' && bytes(q + 1) == '\n' &&
              bytes(q + 2) == '\r' && bytes(q + 3) == '\n') {
              q += 4; found = true
            } else q += 1
          }
          if (!found) return out.toByteArray // torn trailer
        }
        if (q != bytes.length)
          throw new IllegalArgumentException(
            s"chunked stream has ${bytes.length - q} bytes after the " +
              "terminal chunk (mis-framed entity)")
        return out.toByteArray
      }
      val dataEnd = dataStart + size
      if (dataEnd + 2 > bytes.length) return out.toByteArray // torn chunk
      if (!(bytes(dataEnd) == '\r' && bytes(dataEnd + 1) == '\n'))
        throw new IllegalArgumentException(
          s"chunk at byte $pos: data not followed by CRLF (size lies " +
            "or stream corrupt)")
      out.write(bytes, dataStart, size)
      pos = dataEnd + 2
      first = false
    }
    throw new IllegalStateException("unreachable")
  }

  private def le32u(b: Array[Byte], at: Int): Long =
    (b(at) & 0xffL) | ((b(at + 1) & 0xffL) << 8) |
      ((b(at + 2) & 0xffL) << 16) | ((b(at + 3) & 0xffL) << 24)

  /** Inflate a stream of CONCATENATED gzip members (RFC 1952 — the
    * CommonCrawl WARC shipping format packs one member per record) into
    * the concatenated inflated bytes, pure-JVM (`java.util.zip.Inflater`
    * nowrap + a manual member-header/trailer walk — member boundaries
    * must be OURS to own, because the torn-tail/corruption contract
    * below is per member).
    *
    * The codec discipline, mirrored from [[warcRecords]]:
    *  - input not starting with the gzip magic (1f 8b) → null (foreign
    *    rows drop);
    *  - a structurally torn TRAILING member (EOF mid-header, mid-deflate
    *    or mid-trailer) drops — earlier members survive, like a torn
    *    trailing WARC record;
    *  - corruption MID-STREAM fails loudly: a CRC32 or ISIZE trailer
    *    mismatch, corrupt deflate data, an unsupported compression
    *    method, or post-member bytes that are not another member all
    *    throw (a silent resync would mis-frame every later member).
    */
  def gunzipMembers(bytes: Array[Byte]): Array[Byte] = {
    if (bytes.length < 2 || (bytes(0) & 0xff) != 0x1f ||
        (bytes(1) & 0xff) != 0x8b) return null
    val out = new java.io.ByteArrayOutputStream()
    var pos = 0
    while (pos < bytes.length) {
      // fewer than 2 bytes left cannot even hold the magic — that is a
      // torn trailing member header (e.g. a single 0x1f of a next
      // member), the documented tail-drops case, not lost sync
      if (pos + 2 > bytes.length) return out.toByteArray
      if (!((bytes(pos) & 0xff) == 0x1f && (bytes(pos + 1) & 0xff) == 0x8b))
        throw new IllegalArgumentException(
          s"gzip stream lost sync at byte $pos: expected a member header")
      if (pos + 10 > bytes.length) return out.toByteArray // torn tail
      if ((bytes(pos + 2) & 0xff) != 8)
        throw new IllegalArgumentException(
          s"gzip member at byte $pos has unsupported compression method " +
            s"${bytes(pos + 2) & 0xff} (only deflate/8 exists in practice)")
      val flg = bytes(pos + 3) & 0xff
      var p = pos + 10
      if ((flg & 4) != 0) { // FEXTRA
        if (p + 2 > bytes.length) return out.toByteArray
        p += 2 + ((bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8))
        if (p > bytes.length) return out.toByteArray
      }
      var skipZ = 0 // FNAME then FCOMMENT: zero-terminated fields
      while (skipZ < 2) {
        if ((flg & (if (skipZ == 0) 8 else 16)) != 0) {
          while (p < bytes.length && bytes(p) != 0) p += 1
          if (p >= bytes.length) return out.toByteArray
          p += 1
        }
        skipZ += 1
      }
      if ((flg & 2) != 0) { // FHCRC
        p += 2
        if (p > bytes.length) return out.toByteArray
      }
      val inf = new java.util.zip.Inflater(true)
      try {
        inf.setInput(bytes, p, bytes.length - p)
        val crc = new java.util.zip.CRC32()
        val member = new java.io.ByteArrayOutputStream()
        var inflated = 0L
        val buf = new Array[Byte](8192)
        while (!inf.finished()) {
          val n =
            try inf.inflate(buf)
            catch {
              case e: java.util.zip.DataFormatException =>
                throw new IllegalArgumentException(
                  s"gzip member at byte $pos has corrupt deflate data: " +
                    e.getMessage)
            }
          if (n > 0) {
            member.write(buf, 0, n); crc.update(buf, 0, n); inflated += n
          } else if (!inf.finished() && inf.needsInput())
            return out.toByteArray // deflate stream torn at EOF: tail drops
          else if (n == 0 && !inf.finished())
            throw new IllegalArgumentException(
              s"gzip member at byte $pos stalled mid-inflate")
        }
        val tpos = p + ((bytes.length - p) - inf.getRemaining)
        if (tpos + 8 > bytes.length) return out.toByteArray // torn trailer
        if (le32u(bytes, tpos) != crc.getValue)
          throw new IllegalArgumentException(
            s"gzip member at byte $pos fails its CRC32 trailer check")
        if (le32u(bytes, tpos + 4) != (inflated & 0xffffffffL))
          throw new IllegalArgumentException(
            s"gzip member at byte $pos fails its ISIZE trailer check")
        member.writeTo(out)
        pos = tpos + 8
      } finally inf.end()
    }
    out.toByteArray
  }
}
