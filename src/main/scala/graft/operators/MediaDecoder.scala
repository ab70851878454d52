package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * The codec seam for the multimodal operators — the COMPILE-CHECKED
 * contract behind "a real decoder swaps ONE function": every m-family
 * operator that consumes payload content ([[Multimodal.pHash64]]'s pixel
 * grid, [[Multimodal.audioFingerprintPairs]]'s energy envelope,
 * [[Multimodal.frameNearDupPairs]] / [[Multimodal.videoClipAlign]]'s
 * frame streams) is parameterized over this trait; everything downstream
 * of these four methods — the DCT hash, the constellation landmark
 * algebra, the digest joins, the offset histograms, the skew guards —
 * is decoder-independent and stays byte-identical whichever binding
 * runs.
 *
 * [[ByteStubDecoder]] is the deterministic byte-level binding the tests
 * and oracles run (this environment ships no media libraries); a
 * production deployment implements this trait over a real codec (via a
 * codegen kernel or `mapPartitions` batch decode) and touches NOTHING
 * else — the m10/m11/m05/m12 gates pin that the stub binding reproduces
 * the pre-seam results exactly.
 *
 * Every method is a COLUMN transform (plan construction, map-only):
 * payload bytes never leave their partition; each decode output is a
 * bounded per-asset value (1024 ints, an energy array, frame images)
 * that collapses to hashes/digests before anything shuffles.
 */
trait MediaDecoder {

  /** 32×32 grayscale pixel grid — ARRAY<INT> of exactly 1024 values in
    * [0, 255], row-major — or NULL for an undecodable/empty payload
    * (callers drop null rows). Feeds [[Multimodal.pHash64]]'s DCT.
    */
  def pixelGrid(payload: Column): Column

  /** Fixed-hop audio energy envelope — ARRAY<BIGINT>, one value per
    * analysis window in temporal order, each QUANTIZED BELOW 2¹⁴ (the
    * constellation hash packs two peak energies plus Δt into one long;
    * the kernel fails loudly on overflow). Feeds
    * [[Multimodal.audioFingerprintPairs]]'s landmark extraction.
    */
  def energyEnvelope(payload: Column): Column

  /** `n` evenly-spaced frame images — ARRAY<BINARY> of length `n`,
    * temporal order (a real decoder samples n frames across the clip's
    * duration). Feeds the frame-SET digests
    * ([[Multimodal.frameNearDupPairs]] / [[Multimodal.frameJaccardPairs]]).
    */
  def sampleFrames(payload: Column, n: Int): Column

  /** The FULL fixed-rate frame stream — ARRAY<BINARY> in temporal
    * order, NULL/empty when the payload holds no complete frame (a real
    * decoder emits every frame at a fixed fps). Feeds the temporal
    * alignment join ([[Multimodal.videoClipAlign]]), whose offset
    * semantics need a length-independent frame grid.
    */
  def frameGrid(payload: Column): Column
}

/**
 * The deterministic byte-level decoder stand-in — the test/oracle
 * binding. Each method is the (unchanged, oracle-replayed) byte
 * transform the pre-seam operators inlined:
 *   - pixels: printable-ASCII stretch sampling over a STRING payload
 *     ([[graft.functions.HashKernels.stretchPixels]]);
 *   - energies: per-`windowBytes` unsigned byte sums over BINARY
 *     ([[graft.functions.HashKernels.byteWindowEnergies]] — w ≤ 64
 *     keeps every energy under 2¹⁴, the envelope contract);
 *   - frames: substring framing over BINARY (n-chunk for sampling,
 *     full `frameBytes`-sized frames for the grid).
 */
/**
 * REAL-codec binding over the pure-JVM parsers in
 * [[graft.functions.MediaCodecs]] — the production-shaped proof that the
 * seam holds: uncompressed 24-bit BMP for the image/video surfaces
 * (single image → [[pixelGrid]]; a "BMP reel" of concatenated records →
 * [[frameGrid]], demuxed by each record's own declared size) and PCM WAV
 * for the audio surfaces (channel-0 mean-|amplitude| windows quantized
 * below 2¹⁴ → [[energyEnvelope]]; block-aligned even slices of the data
 * chunk → [[sampleFrames]]). A payload in the WRONG format decodes to
 * null and the row drops — the MediaDecoder contract — so a corpus
 * mixing images and audio routes each asset to the operators that can
 * read it. All four remain map-only Column transforms (codegen'd kernel
 * call per row); every m-family gate is byte-identical under either
 * binding because everything past the decode is decoder-independent.
 */
final case class BmpWavDecoder(windowSamples: Int = 512)
    extends MediaDecoder {
  require(windowSamples >= 1, s"need a positive window, got $windowSamples")

  override def pixelGrid(payload: Column): Column =
    graft.functions.GraftFunctions.bmp_pixel_grid(payload.cast("binary"))

  override def energyEnvelope(payload: Column): Column =
    graft.functions.GraftFunctions.wav_energy_envelope(
      payload.cast("binary"), windowSamples)

  override def sampleFrames(payload: Column, n: Int): Column =
    graft.functions.GraftFunctions.wav_sample_frames(
      payload.cast("binary"), n)

  override def frameGrid(payload: Column): Column =
    graft.functions.GraftFunctions.bmp_frame_grid(payload.cast("binary"))
}

final case class ByteStubDecoder(windowBytes: Int = 16,
    frameBytes: Int = 16) extends MediaDecoder {
  require(windowBytes >= 1 && windowBytes <= 64,
    s"stub windows must be 1..64 bytes (energy under 2^14), got $windowBytes")
  require(frameBytes >= 1, s"need a positive frame size, got $frameBytes")

  override def pixelGrid(payload: Column): Column =
    // nullif (not a when-guard): the stripped text is computed ONCE per
    // row, empty/NULL collapses to NULL and the kernel's null-intolerant
    // eval passes it through — no row ever reaches stretchPixels empty
    graft.functions.GraftFunctions.stretch_pixels(
      nullif(regexp_replace(payload, "[^ -~]", ""), lit("")), 1024)

  override def energyEnvelope(payload: Column): Column =
    graft.functions.GraftFunctions.byte_window_energies(payload, windowBytes)

  override def sampleFrames(payload: Column, n: Int): Column = {
    val chunk = greatest(
      ceil(length(payload) / lit(n.toDouble)).cast("int"), lit(1))
    transform(sequence(lit(0), lit(n - 1)),
      i => payload.substr(i * chunk + 1, chunk))
  }

  override def frameGrid(payload: Column): Column = {
    val nf = floor(length(payload) / lit(frameBytes.toDouble)).cast("int")
    when(length(payload) >= frameBytes,
      transform(sequence(lit(0), nf - 1, lit(1)),
        i => payload.substr(i * frameBytes + 1, lit(frameBytes))))
  }
}
