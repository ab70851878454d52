package graft.functions

import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/**
 * Pure-JVM, dependency-free REAL-format parsers behind
 * [[graft.operators.BmpWavDecoder]] — the production-shaped
 * [[graft.operators.MediaDecoder]] binding this container can actually
 * run (no codec libraries ship here; BMP and WAV PCM are the two real
 * formats parseable from bytes alone).
 *
 * Formats (public layout specs):
 *   - BMP: BITMAPFILEHEADER (14 B: "BM", LE32 file size @2, LE32 raster
 *     offset @10) + BITMAPINFOHEADER (LE32 size @14, LE32 width @18,
 *     LE32 height @22 — positive = bottom-up raster, negative =
 *     top-down, LE16 bpp @28, LE32 compression @30 = 0 BI_RGB), rows
 *     padded to 4 bytes, 24-bit pixels stored B,G,R.
 *   - WAV: RIFF("WAVE") chunk stream; "fmt " carries LE16 audio format
 *     (1 = PCM), LE16 channels, LE16 block align, LE16 bits/sample;
 *     "data" carries the interleaved frames. Chunks pad to even offsets.
 *
 * Contract discipline (the [[graft.operators.MediaDecoder]] seam):
 * a payload that is NOT the expected format returns null (callers drop
 * null rows — a mixed-format corpus just skips foreign assets), while a
 * payload that IS the format but structurally truncated fails loudly —
 * silent partial decodes would surface as wrong hashes downstream.
 * All sampling/quantization arithmetic is integer-exact so a decode is
 * reproducible bit-for-bit on any JVM.
 */
object MediaCodecs {

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def isBmp(b: Array[Byte], off: Int): Boolean =
    b.length >= off + 2 && b(off) == 'B'.toByte && b(off + 1) == 'M'.toByte

  private def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** Integer ITU-R BT.601 luma — the published RGB→gray weights, scaled
    * to integers so every JVM grays identically.
    */
  private def luma(r: Int, g: Int, bl: Int): Int =
    (299 * r + 587 * g + 114 * bl) / 1000

  /** Decode ONE uncompressed 24-bit BMP starting at `off` into a 32×32
    * row-major grayscale grid (the [[graft.operators.MediaDecoder.pixelGrid]]
    * shape): integer luma per pixel, nearest-neighbor resampling
    * (src = (dst·srcDim)/32 — floor, exact). Returns null when the bytes
    * are not a BMP or use an unsupported bpp/compression; throws on a
    * BMP whose declared raster overruns the payload.
    */
  def bmpPixelGrid(bytes: Array[Byte]): ArrayData = {
    val g = bmpGray(bytes, 0)
    if (g == null) return null
    val (w, h, gray) = g
    val out = new Array[Int](1024)
    var y = 0
    while (y < 32) {
      val sy = (y * h) / 32
      var x = 0
      while (x < 32) {
        out(y * 32 + x) = gray(sy * w + (x * w) / 32)
        x += 1
      }
      y += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** The shared 24-bit BMP → (width, height, top-down gray raster)
    * decode; null when not a parseable/supported BMP record at `off`.
    */
  private def bmpGray(bytes: Array[Byte],
      off: Int): (Int, Int, Array[Int]) = {
    if (!isBmp(bytes, off) || bytes.length < off + 54) return null
    val dataOff = le32(bytes, off + 10)
    val width = le32(bytes, off + 18)
    val rawHeight = le32(bytes, off + 22)
    val bpp = le16(bytes, off + 28)
    val compression = le32(bytes, off + 30)
    // dataOff below the 54-byte header (or negative) is a malformed
    // header, not a foreign format quirk: decoding header bytes as
    // pixels (or indexing negatively inside codegen) must never happen —
    // null per the documented wrong-format contract
    if (bpp != 24 || compression != 0 || width <= 0 || rawHeight == 0 ||
        dataOff < 54)
      return null
    val height = math.abs(rawHeight)
    val bottomUp = rawHeight > 0
    val rowSize = ((3 * width + 3) / 4) * 4
    require(off + dataOff + rowSize.toLong * height <= bytes.length,
      s"BMP raster overruns payload: ${width}x$height needs " +
        s"${rowSize.toLong * height} bytes at offset ${off + dataOff}, " +
        s"payload has ${bytes.length}")
    val gray = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val srcRow = if (bottomUp) height - 1 - y else y
      val rowOff = off + dataOff + srcRow * rowSize
      var x = 0
      while (x < width) {
        val p = rowOff + 3 * x
        gray(y * width + x) = luma(bytes(p + 2) & 0xff,
          bytes(p + 1) & 0xff, bytes(p) & 0xff)
        x += 1
      }
      y += 1
    }
    (width, height, gray)
  }

  /** Split a "BMP reel" (concatenated BMP records — the uncompressed
    * motion container) into its per-frame byte slices via each record's
    * own declared file size (LE32 @2) — the
    * [[graft.operators.MediaDecoder.frameGrid]] shape. Stops at the
    * first non-BMP byte or partial trailing record (a truncated tail
    * drops, like a real demuxer's torn last frame); null when no
    * complete frame parses.
    */
  def bmpFrameGrid(bytes: Array[Byte]): ArrayData = {
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var pos = 0
    var ok = true
    while (ok && pos + 6 <= bytes.length && isBmp(bytes, pos)) {
      val size = le32(bytes, pos + 2)
      if (size < 54 || pos + size > bytes.length) ok = false
      else {
        frames += java.util.Arrays.copyOfRange(bytes, pos, pos + size)
        pos += size
      }
    }
    if (frames.isEmpty) null
    else new GenericArrayData(frames.toArray[Any])
  }

  /** Locate a WAV's fmt/data chunks; null when not PCM WAV. Returns
    * (channels, bitsPerSample, blockAlign, dataOff, dataLen).
    */
  private def wavLayout(bytes: Array[Byte]): (Int, Int, Int, Int, Int) = {
    if (!isWav(bytes)) return null
    var pos = 12
    var fmt: (Int, Int, Int) = null
    var data: (Int, Int) = null
    while ((fmt == null || data == null) && pos + 8 <= bytes.length) {
      val size = le32(bytes, pos + 4)
      require(size >= 0 && pos + 8 + size.toLong <= bytes.length,
        s"WAV chunk at $pos declares $size bytes, payload has ${bytes.length}")
      val id = new String(bytes, pos, 4, "US-ASCII")
      if (id == "fmt " && size >= 16) {
        val audioFormat = le16(bytes, pos + 8)
        if (audioFormat != 1) return null // non-PCM: not ours
        fmt = (le16(bytes, pos + 10), le16(bytes, pos + 22),
          le16(bytes, pos + 20))
      } else if (id == "data") data = (pos + 8, size)
      pos += 8 + size + (size & 1) // RIFF pads odd chunks
    }
    if (fmt == null || data == null) return null
    val (channels, bits, blockAlign) = fmt
    if (channels < 1 || (bits != 8 && bits != 16)) return null
    (channels, bits, blockAlign, data._1, data._2)
  }

  /** Channel-0 mean-absolute-amplitude envelope over fixed windows of
    * `windowSamples` PCM samples (trailing partial window dropped) —
    * the [[graft.operators.MediaDecoder.energyEnvelope]] shape. Each
    * energy is quantized BELOW 2¹⁴ (the constellation-packing
    * contract): 16-bit → mean|s| >> 2 (< 8192), 8-bit → mean|s−128| << 6
    * (≤ 8192) so both depths land on one loudness scale. Null when the
    * payload is not PCM WAV.
    */
  def wavEnergyEnvelope(bytes: Array[Byte], windowSamples: Int): ArrayData = {
    val lay = wavLayout(bytes)
    if (lay == null) return null
    val (channels, bits, _, dataOff, dataLen) = lay
    val bytesPerSample = bits / 8
    val stride = channels * bytesPerSample
    val nSamples = dataLen / stride
    val nWin = nSamples / windowSamples
    val out = new Array[Long](nWin)
    var w = 0
    while (w < nWin) {
      var sum = 0L
      var i = 0
      while (i < windowSamples) {
        val p = dataOff + (w * windowSamples + i) * stride
        val amp =
          if (bits == 16) math.abs(le16(bytes, p).toShort.toInt)
          else math.abs((bytes(p) & 0xff) - 128)
        sum += amp
        i += 1
      }
      val mean = sum / windowSamples
      out(w) = if (bits == 16) mean >> 2 else mean << 6
      w += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** `n` evenly-spaced slices of the WAV data chunk, each aligned DOWN
    * to the frame (blockAlign) boundary so no slice splits a sample —
    * the [[graft.operators.MediaDecoder.sampleFrames]] shape for audio.
    * Null when not PCM WAV.
    */
  def wavSampleFrames(bytes: Array[Byte], n: Int): ArrayData = {
    val lay = wavLayout(bytes)
    if (lay == null) return null
    val (_, _, blockAlign, dataOff, dataLen) = lay
    val align = math.max(blockAlign, 1)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val from = ((i.toLong * dataLen) / n).toInt / align * align
      val to = (((i + 1).toLong * dataLen) / n).toInt / align * align
      out(i) = java.util.Arrays.copyOfRange(bytes,
        dataOff + from, dataOff + math.max(to, from))
      i += 1
    }
    new GenericArrayData(out)
  }
}
