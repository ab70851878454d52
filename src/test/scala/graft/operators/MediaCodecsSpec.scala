package graft.operators

import graft.SparkTestBase
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

/**
 * Real-format decode under the [[MediaDecoder]] seam: generated
 * uncompressed 24-bit BMP and PCM WAV assets (pure-JVM byte writers
 * below — the formats' public layouts), hand-computed decode values,
 * and the m-family algebra (pHash / audio fingerprint / clip align /
 * scene segmentation / frame Jaccard) re-run UNCHANGED under
 * [[BmpWavDecoder]] — the proof the r13 SPI actually takes a real
 * codec, not just the byte stub.
 */
class MediaCodecsSpec extends SparkTestBase {
  import spark.implicits._

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Uncompressed 24-bit BMP; `rgb` in TOP-DOWN row-major order. */
  private def bmp(w: Int, h: Int, rgb: Seq[(Int, Int, Int)],
      topDown: Boolean = false): Array[Byte] = {
    require(rgb.length == w * h)
    val rowSize = ((3 * w + 3) / 4) * 4
    val raster = new Array[Byte](rowSize * h)
    for (y <- 0 until h; x <- 0 until w) {
      val fileRow = if (topDown) y else h - 1 - y
      val (r, g, b) = rgb(y * w + x)
      val p = fileRow * rowSize + 3 * x
      raster(p) = b.toByte; raster(p + 1) = g.toByte; raster(p + 2) = r.toByte
    }
    Array[Byte]('B', 'M') ++ le32(54 + raster.length) ++ le32(0) ++
      le32(54) ++ le32(40) ++ le32(w) ++ le32(if (topDown) -h else h) ++
      le16(1) ++ le16(24) ++ le32(0) ++ le32(raster.length) ++
      le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0) ++ raster
  }

  /** PCM WAV; 16-bit samples interleaved across `channels`. */
  private def wav16(channels: Int, samples: Seq[Seq[Int]]): Array[Byte] = {
    val block = channels * 2
    val data = samples.flatMap(frame => frame.flatMap(le16)).toArray
    wavShell(channels, 16, block, data)
  }

  private def wav8(samples: Seq[Int]): Array[Byte] =
    wavShell(1, 8, 1, samples.map(_.toByte).toArray)

  private def wavShell(channels: Int, bits: Int, block: Int,
      data: Array[Byte]): Array[Byte] =
    "RIFF".getBytes ++ le32(36 + data.length) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(8000) ++ le32(8000 * block) ++ le16(block) ++ le16(bits) ++
      "data".getBytes ++ le32(data.length) ++ data

  private val white = (255, 255, 255)
  private val red = (255, 0, 0)
  private val green = (0, 255, 0)
  private val blue = (0, 0, 255)

  test("bmpPixelGrid: hand-computed luma + nearest-neighbor corners; " +
      "bottom-up and top-down rasters decode identically; padding works") {
    val quad = bmp(2, 2, Seq(white, red, green, blue))
    val df = Seq((1L, quad)).toDF("media_id", "content")
    val grid = df.select(GraftFunctions.bmp_pixel_grid($"content"))
      .as[Seq[Int]].head()
    assert(grid.length === 1024)
    // BT.601 integer luma: white 255, red 76, green 149, blue 29;
    // nearest-neighbor: quadrants of the 32x32 grid
    assert(grid(0) === 255 && grid(31) === 76)
    assert(grid(992) === 149 && grid(1023) === 29)
    assert(grid(15) === 255 && grid(16) === 76) // quadrant boundary
    val td = bmp(2, 2, Seq(white, red, green, blue), topDown = true)
    val gridTd = Seq((1L, td)).toDF("id", "c")
      .select(GraftFunctions.bmp_pixel_grid($"c")).as[Seq[Int]].head()
    assert(gridTd === grid, "top-down raster must decode identically")
    // odd width exercises 4-byte row padding (3*3=9 -> 12)
    val wide = bmp(3, 1, Seq(red, green, blue))
    val g3 = Seq((1L, wide)).toDF("id", "c")
      .select(GraftFunctions.bmp_pixel_grid($"c")).as[Seq[Int]].head()
    assert(g3(0) === 76 && g3(11) === 149 && g3(31) === 29)
  }

  test("format routing: wrong-format payloads decode to null (rows drop), " +
      "truncated BMP fails loudly") {
    val assets = Seq(
      (1L, bmp(2, 2, Seq(white, red, green, blue))),
      (2L, wav16(1, Seq(Seq(100), Seq(-100)))),
      (3L, "not media at all".getBytes)).toDF("media_id", "content")
    val px = assets.select($"media_id",
      GraftFunctions.bmp_pixel_grid($"content").as("g"))
      .filter($"g".isNotNull).select("media_id").as[Long].collect()
    assert(px.toSeq === Seq(1L))
    val en = assets.select($"media_id",
      GraftFunctions.wav_energy_envelope($"content", 1).as("e"))
      .filter($"e".isNotNull).select("media_id").as[Long].collect()
    assert(en.toSeq === Seq(2L))
    val torn = bmp(2, 2, Seq(white, red, green, blue)).dropRight(3)
    val err = intercept[Exception] {
      Seq((1L, torn)).toDF("id", "c")
        .select(GraftFunctions.bmp_pixel_grid($"c")).collect()
    }
    assert(err.getMessage.contains("overruns") ||
      (err.getCause != null && err.getCause.getMessage.contains("overruns")))
  }

  test("bmp dataOff below the 54-byte header (or negative) is a " +
      "malformed header -> null, never header-bytes-as-pixels") {
    val good = bmp(2, 2, Seq(white, red, green, blue))
    for (off <- Seq(0, 14, -4)) {
      val evil = good.clone()
      // dataOff lives at LE32 @10
      evil(10) = (off & 0xff).toByte; evil(11) = ((off >> 8) & 0xff).toByte
      evil(12) = ((off >> 16) & 0xff).toByte
      evil(13) = ((off >> 24) & 0xff).toByte
      val out = Seq((1L, evil)).toDF("id", "c")
        .select(GraftFunctions.bmp_pixel_grid($"c")).collect()
      assert(out.head.isNullAt(0), s"dataOff=$off must decode to null")
    }
  }

  test("wavEnergyEnvelope: hand-computed 16-bit/8-bit quantization, " +
      "channel-0 only, partial window drops") {
    // 16-bit mono, window 2: mean(|100|,|-100|)=100 >> 2 = 25;
    // mean(|200|,|-200|)=200 >> 2 = 50; trailing lone sample drops
    val e16 = Seq((1L, wav16(1, Seq(100, -100, 200, -200, 999).map(Seq(_)))))
      .toDF("id", "c")
      .select(GraftFunctions.wav_energy_envelope($"c", 2))
      .as[Seq[Long]].head()
    assert(e16 === Seq(25L, 50L))
    // 8-bit: |228-128| = 100 << 6 = 6400 (one loudness scale across depths)
    val e8 = Seq((1L, wav8(Seq(228, 228)))).toDF("id", "c")
      .select(GraftFunctions.wav_energy_envelope($"c", 2))
      .as[Seq[Long]].head()
    assert(e8 === Seq(6400L))
    // stereo: channel 0 carries 400s, channel 1 loud garbage — ch0 only
    val st = Seq((1L, wav16(2, Seq(Seq(400, 30000), Seq(-400, -30000)))))
      .toDF("id", "c")
      .select(GraftFunctions.wav_energy_envelope($"c", 2))
      .as[Seq[Long]].head()
    assert(st === Seq(100L))
    // envelope contract: every energy under 2^14 even at full scale
    val loud = Seq((1L, wav16(1, Seq.fill(4)(Seq(32767))))).toDF("id", "c")
      .select(GraftFunctions.wav_energy_envelope($"c", 4))
      .as[Seq[Long]].head()
    assert(loud.forall(e => e >= 0 && e < 16384) && loud === Seq(8191L))
  }

  test("wavSampleFrames: block-aligned even slices of the data chunk") {
    val w = wav16(1, (1 to 8).map(Seq(_))) // 16 data bytes, blockAlign 2
    val frames = Seq((1L, w)).toDF("id", "c")
      .select(GraftFunctions.wav_sample_frames($"c", 4))
      .as[Seq[Array[Byte]]].head()
    assert(frames.length === 4 && frames.forall(_.length === 4))
    assert(frames(0).toSeq === Seq[Byte](1, 0, 2, 0))
    assert(frames(3).toSeq === Seq[Byte](7, 0, 8, 0))
  }

  test("bmpFrameGrid: reel demux by declared record size; torn tail " +
      "drops; non-reel is null") {
    val f0 = bmp(2, 2, Seq(white, red, green, blue))
    val f1 = bmp(2, 2, Seq(blue, green, red, white))
    val reel = f0 ++ f1
    val frames = Seq((1L, reel)).toDF("id", "c")
      .select(GraftFunctions.bmp_frame_grid($"c"))
      .as[Seq[Array[Byte]]].head()
    assert(frames.length === 2)
    assert(frames(0).toSeq === f0.toSeq && frames(1).toSeq === f1.toSeq)
    val tornReel = f0 ++ f1.dropRight(5)
    val torn = Seq((1L, tornReel)).toDF("id", "c")
      .select(GraftFunctions.bmp_frame_grid($"c"))
      .as[Seq[Array[Byte]]].head()
    assert(torn.length === 1 && torn(0).toSeq === f0.toSeq)
    assert(Seq((1L, "RIFFxxxx".getBytes)).toDF("id", "c")
      .select(GraftFunctions.bmp_frame_grid($"c")).filter($"c".isNotNull)
      .as[Option[Seq[Array[Byte]]]].head().isEmpty)
  }

  private def frameBmp(i: Int): Array[Byte] =
    bmp(2, 2, Seq(((i * 37) % 256, (i * 59) % 256, (i * 83) % 256),
      ((i * 11) % 256, 0, 255), (0, (i * 29) % 256, 0), (255, 255, 0)))

  test("m10 algebra under the real codec: identical BMPs phash-equal " +
      "through the unchanged DCT, different images differ") {
    val imgA = bmp(2, 2, Seq(white, red, green, blue))
    val imgB = bmp(4, 1, Seq(red, red, blue, blue))
    val media = Seq((1L, imgA), (2L, imgA), (3L, imgB))
      .toDF("media_id", "content")
    val px = Multimodal.pixelGrid(media, "media_id", "content",
      BmpWavDecoder()).filter($"pixels".isNotNull)
    val ph = Multimodal.pHash64(px, "media_id", "pixels")
      .as[(Long, Long)].collect().toMap
    assert(ph(1L) === ph(2L), "same image bytes must phash identically")
    assert(ph(1L) !== ph(3L), "different images must differ")
  }

  test("m11 algebra under the real codec: a time-shifted WAV copy is " +
      "found at the exact window offset") {
    // 64 windows of 8 samples, deterministic varied loudness
    val winAmps = (0 until 64).map(w => 40 + (w * 7919) % 97 * 80)
    val samples = winAmps.flatMap(a => Seq.fill(8)(Seq(a)))
    val shiftW = 5
    val shifted = samples.drop(shiftW * 8)
    val media = Seq((1L, wav16(1, samples)), (2L, wav16(1, shifted)))
      .toDF("media_id", "content")
    val pairs = Multimodal.audioFingerprintPairs(media, "media_id",
        "content", minAligned = 3,
        decoder = Some(BmpWavDecoder(windowSamples = 8)))
      .as[(Long, Long, Long, Long)].collect()
    assert(pairs.length === 1)
    val (a, b, off, n) = pairs.head
    assert(Set(a, b) === Set(1L, 2L) && math.abs(off) === shiftW.toLong &&
      n >= 3, s"expected |offset| $shiftW, got $pairs")
  }

  test("m12 algebra under the real codec: a BMP-reel suffix clip aligns " +
      "at the exact frame offset") {
    val reelA = (0 until 10).map(frameBmp).reduce(_ ++ _)
    val reelB = (3 until 10).map(frameBmp).reduce(_ ++ _)
    val media = Seq((1L, reelA), (2L, reelB)).toDF("media_id", "content")
    val pairs = Multimodal.videoClipAlign(media, "media_id", "content",
        minAligned = 3, decoder = Some(BmpWavDecoder()))
      .as[(Long, Long, Long, Long)].collect()
    assert(pairs.length === 1)
    val (a, b, off, n) = pairs.head
    assert(Set(a, b) === Set(1L, 2L) && math.abs(off) === 3L && n === 7L,
      s"expected |offset| 3 n 7, got $pairs")
  }

  test("m13 algebra under the real codec: a loudness regime change in a " +
      "WAV cuts exactly one scene boundary") {
    val samples = (Seq.fill(16)(40) ++ Seq.fill(16)(4000)).map(Seq(_))
    val scenes = Multimodal.sceneSegments(
        Seq((1L, wav16(1, samples))).toDF("media_id", "content"),
        "media_id", "content", cutThreshold = 500,
        decoder = Some(BmpWavDecoder(windowSamples = 4)))
      .orderBy("scene_no")
      .as[(Long, Long, Int, Long, Int, Long)].collect().toSeq
    // 8 windows: 4 at energy 40>>2=10, 4 at 4000>>2=1000; cut at w=4
    assert(scenes === Seq((1L, 0L, 0, 4L, 0, 10L), (1L, 1L, 4, 4L, 4, 1000L)))
  }

  test("m05 algebra under the real codec: identical WAVs share all " +
      "sampled frames (jaccard 1), disjoint audio shares none") {
    val a = wav16(1, (1 to 32).map(Seq(_)))
    val c = wav16(1, (100 to 131).map(Seq(_)))
    val media = Seq((1L, a), (2L, a), (3L, c)).toDF("media_id", "content")
    val pairs = Multimodal.frameJaccardPairs(media, n = 4, threshold = 0.5,
        decoder = BmpWavDecoder())
      .as[(Long, Long, Long, Double)].collect()
    assert(pairs.length === 1 && pairs.head._1 === 1L &&
      pairs.head._2 === 2L && pairs.head._4 === 1.0)
  }
}
