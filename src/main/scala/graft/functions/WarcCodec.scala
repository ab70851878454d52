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

  private def startsWith(b: Array[Byte], at: Int, p: Array[Byte]): Boolean = {
    if (at + p.length > b.length) return false
    var i = 0
    while (i < p.length) {
      // ASCII-case-insensitive (WARC header names are case-insensitive)
      val c = b(at + i)
      val u = if (c >= 'a' && c <= 'z') (c - 32).toByte else c
      if (u != p(i)) return false
      i += 1
    }
    true
  }

  /** Split concatenated WARC records into per-record string slices
    * (header block + blank line + payload; the inter-record CRLFCRLF
    * consumed). ARRAY<STRING> in file order, or null for non-WARC input.
    */
  def warcRecords(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    if (bytes.length < Magic.length || !startsWith(bytes, 0, Magic))
      return null
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var pos = 0
    while (pos < bytes.length) {
      // skip stray inter-record CRLFs (tolerant readers do)
      while (pos < bytes.length &&
        (bytes(pos) == '\r' || bytes(pos) == '\n')) pos += 1
      if (pos >= bytes.length) return new GenericArrayData(out.toArray)
      if (!startsWith(bytes, pos, Magic))
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
          while (j < he && bytes(j) >= '0' && bytes(j) <= '9') {
            v = v * 10 + (bytes(j) - '0'); j += 1
          }
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
}
