package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video as opaque `BinaryType`
 * columns with typed metadata, plus decode / feature-extract / resize /
 * frame-sample operators.
 *
 * The Spark-side shape is real and tested — schema, partition-preserving
 * `mapPartitions` (the Scala analogue of Pandas-UDF `mapInPandas` batches),
 * batch iteration, metadata structs. The codec step itself is a
 * deterministic STUB (this environment ships no image/audio libraries):
 * `decodeStub` derives pseudo-dimensions from the byte content so tests are
 * reproducible. Swapping in a real codec changes ONE function, not the
 * pipeline.
 *
 * Scale posture: media bytes never shuffle — all operators here are
 * map-only (`mapPartitions` / column expressions); any downstream
 * aggregation happens on extracted features (small), not payloads.
 */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("n_bytes", LongType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true))), nullable = true)))

  /** Build a media table from any table with an id + string payload column
    * (the fixtures have no real binaries; text bytes stand in). Produces the
    * canonical (media_id, content, meta) layout.
    */
  def fromText(df: DataFrame, idCol: String, textCol: String, format: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("content"),
      struct(
        lit(format).as("format"),
        length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height")).as("meta"))

  /** Ingest-time payload integrity audit — the QC gate a media pipeline
    * runs BEFORE any decode is attempted: per payload,
    *   - `f_format`: declared format equals the expected one,
    *   - `f_size`: declared size inside the accepted band,
    *   - `f_nonempty`: the payload actually carries bytes,
    *   - `f_len_match`: ACTUAL byte length equals the declared
    *     `meta.n_bytes` — the truncated-upload / metadata-lies detector
    *     (the one check that needs no codec at all),
    * plus the conjunctive `ok`. One map-only pass; payload bytes never
    * shuffle (only their lengths are read). All-integer comparisons.
    */
  def integrityAudit(media: DataFrame, expectedFormat: String,
      minBytes: Long, maxBytes: Long): DataFrame = {
    require(minBytes >= 0 && minBytes <= maxBytes, "invalid size band")
    media.select(col("media_id"),
        (col("meta.format") === expectedFormat).as("f_format"),
        col("meta.n_bytes").between(minBytes, maxBytes).as("f_size"),
        (length(col("content")) > 0).as("f_nonempty"),
        (length(col("content")).cast("long") === col("meta.n_bytes"))
          .as("f_len_match"))
      .withColumn("ok",
        col("f_format") && col("f_size") && col("f_nonempty") &&
          col("f_len_match"))
  }

  /** STUB decode: deterministically derive (width, height) from content
    * bytes — stands in for an image decoder. Runs per-partition over an
    * iterator of rows, the exact execution shape a real codec needs
    * (open-once-per-partition, stream rows through).
    */
  /** Storage-level chunk-dedup report over binary payloads — the
    * content-defined-chunking measurement (Rabin/LBFS lineage, the
    * FastCDC boundary rule) behind media-corpus storage planning: how
    * many bytes would chunk-level dedup actually save? Payloads are cut
    * into content-defined chunks (boundaries re-synchronize after
    * insertions, so shifted copies of the same content still share
    * chunks — the property fixed-size blocks lack), chunk identity is
    * the (content-hash, length) pair, and the report compares total vs
    * distinct chunk bytes.
    *
    * Output one row: (n_docs, total_bytes, n_chunks, n_unique_chunks,
    * unique_bytes, dedup_ratio) — ratio 1.0 means nothing dedups; an
    * empty corpus pins ratio 1.0.
    *
    * Plan shape (100 TB posture): ONE codegen kernel pass per payload
    * (the [[graft.functions.HashKernels.cdcChunks]] walk) emitting
    * skinny (len, hash) pairs — payload bytes NEVER shuffle; the only
    * exchanges are a 16-byte-row hash aggregate on the chunk key and
    * three 1-row attaches.
    */
  def payloadChunkDedup(media: DataFrame, idCol: String,
      payloadCol: String, minSize: Int = 32, maskBits: Int = 6,
      maxSize: Int = 256): DataFrame = {
    require(minSize >= 1, s"minSize must be >= 1, got $minSize")
    require(maxSize >= minSize, s"maxSize $maxSize < minSize $minSize")
    require(maskBits >= 1 && maskBits <= 62, s"maskBits out of range: $maskBits")
    val pairs = media
      .select(graft.functions.GraftFunctions
        .cdc_chunks(col(payloadCol), minSize, maskBits, maxSize).as("__c"))
      .filter(size(col("__c")) >= 2) // empty payloads yield no chunks
      .select(explode(expr(
        """transform(sequence(1, size(__c) div 2),
          |  i -> struct(element_at(__c, CAST(2*i-1 AS INT)) AS len,
          |              element_at(__c, CAST(2*i AS INT)) AS hash))""".stripMargin))
        .as("__p"))
      .select(col("__p.len").as("__len"), col("__p.hash").as("__h"))
    val nDocs = media.agg(count(lit(1)).as("n_docs"))
    val tot = pairs.agg(count(lit(1)).as("n_chunks"),
      coalesce(sum(col("__len")), lit(0L)).as("total_bytes"))
    val uniq = pairs.groupBy(col("__h"), col("__len"))
      .agg(count(lit(1)).as("__dup"))
      .agg(count(lit(1)).as("n_unique_chunks"),
        coalesce(sum(col("__len")), lit(0L)).as("unique_bytes"))
    nDocs.crossJoin(tot).crossJoin(uniq)
      .select(col("n_docs"), col("total_bytes"), col("n_chunks"),
        col("n_unique_chunks"), col("unique_bytes"),
        when(col("total_bytes") === 0, lit(1.0))
          .otherwise(round(col("unique_bytes").cast("double") /
            col("total_bytes").cast("double"), 6) + lit(0.0))
          .as("dedup_ratio"))
  }

  def decodeStub(df: DataFrame): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val contentIdx = df.schema.fieldIndex("content")
    df.mapPartitions { rows =>
      // per-partition setup would open the codec here, once
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](contentIdx)
        if (bytes == null) Row.fromSeq(r.toSeq ++ Seq(null, null))
        else {
          // deterministic fake: dimensions from a rolling hash of the bytes
          var h = 1125899906842597L
          var i = 0
          while (i < math.min(bytes.length, 256)) { h = h * 31 + bytes(i); i += 1 }
          val w = 16 + math.floorMod(h, 1024).toInt
          val ht = 16 + math.floorMod(h >> 10, 1024).toInt
          Row.fromSeq(r.toSeq ++ Seq(w, ht))
        }
      }
    }(enc)
  }

  /** STUB feature extraction: fixed-length float feature vector from bytes
    * (stands in for an embedding model forward pass). Deterministic;
    * map-only; the output column is directly usable by
    * [[graft.operators.Similarity]].
    */
  def featureStub(df: DataFrame, dim: Int = 16): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = true))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val contentIdx = df.schema.fieldIndex("content")
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](contentIdx)
        if (bytes == null) Row.fromSeq(r.toSeq :+ null)
        else {
          val v = Array.tabulate(dim) { d =>
            var h = graft.functions.Mix64.mix(d.toLong ^ 0x5DEECE66DL)
            var i = d
            while (i < bytes.length) { h = h * 31 + bytes(i); i += dim }
            (graft.functions.Mix64.mix(h).toDouble / Long.MaxValue.toDouble).toFloat
          }
          Row.fromSeq(r.toSeq :+ v.toSeq)
        }
      }
    }(enc)
  }

  /** STUB resize: rescale the decoded (width, height) to fit `maxDim` and
    * produce a proportionally smaller payload — pure column expressions
    * (a real resize swaps the payload expression for a codec call; the
    * metadata/shape contract is what downstream operators consume).
    * stride = ceil(max(w,h)/maxDim); new dims = ceil(dim/stride); payload
    * truncated to new_w*new_h "pixels" (bytes stand in for pixels).
    */
  def resizeStub(decoded: DataFrame, maxDim: Int): DataFrame = {
    require(maxDim > 0, "maxDim must be positive")
    val stride = greatest(
      ceil(greatest(col("width"), col("height")) / lit(maxDim.toDouble)).cast("int"),
      lit(1))
    decoded
      .withColumn("new_width", ceil(col("width") / stride.cast("double")).cast("int"))
      .withColumn("new_height", ceil(col("height") / stride.cast("double")).cast("int"))
      .withColumn("resized_content",
        col("content").substr(lit(1), col("new_width") * col("new_height")))
  }

  /** Frame sampling: `n` evenly-spaced frame images per payload through
    * the [[MediaDecoder]] seam (the stub cuts the byte stream into `n`
    * chunks; a real decoder samples n frames across the clip) — pure
    * column expressions, no UDF: one output row per (media, frame) via
    * posexplode.
    */
  def frameSample(df: DataFrame, n: Int,
      decoder: MediaDecoder = ByteStubDecoder()): DataFrame =
    df.select(
      col("media_id"),
      posexplode(decoder.sampleFrames(col("content"), n))
        .as(Seq("frame_no", "frame_bytes")))

  /** STUB audio loudness: per fixed-size byte window, the unsigned byte
    * sum of the payload (one codegen'd kernel call per row — a real
    * pipeline swaps byte sums for decoded-PCM RMS, keeping the
    * one-row-per-(media, window) schema). Map-only until the explode;
    * payload bytes never shuffle.
    */
  def audioEnergyStub(df: DataFrame, windowBytes: Int = 64): DataFrame = {
    require(windowBytes >= 1, "window must be at least one byte")
    df.select(col("media_id"),
      posexplode(graft.functions.GraftFunctions.byte_window_energies(
        col("content"), windowBytes)).as(Seq("window_no", "energy")))
  }

  /** Frame-digest near-duplicate pairs — the media analogue of n-gram
    * containment dedup: two payloads are near-dups when they share at
    * least `minShared` of their `n` frame digests (re-encodes, trailing
    * edits, and container changes leave most frames bit-identical; a real
    * pipeline swaps the byte digest for a perceptual frame hash, keeping
    * the same pair-join shape). Empty frames (payload shorter than the
    * frame grid) are discarded — they carry no signal and their shared
    * digest would otherwise pair every short payload with every other.
    *
    * Scale shape: payload bytes never shuffle — each frame collapses to
    * its 16-byte digest map-side, the self-join is skinny
    * (digest, media_id), and the pair count is a hash aggregate. Digest
    * groups above `maxDigestGroup` are dropped by the standard skew
    * guard (boilerplate frames shared by millions of payloads would
    * otherwise quadratically explode the join; observe-reported like the
    * LSH guards).
    *
    * Output: (idA, idB, n_shared) with idA < idB.
    */
  def frameNearDupPairs(media: DataFrame, n: Int = 4, minShared: Int = 3,
      maxDigestGroup: Int = 10000,
      decoder: MediaDecoder = ByteStubDecoder()): DataFrame =
    sharedFramePairs(media, n, maxDigestGroup, decoder)
      .filter(col("n_shared") >= minShared)

  /** Whole-asset frame-set resemblance: per media pair, the Jaccard of
    * their DISTINCT frame-digest sets — the m05 containment count turned
    * into the normalized verdict a video-dedup pass thresholds on
    * (re-encodes/container changes share most frames → high resemblance;
    * a short clip inside a long asset shares few of the union → low).
    * Adds one media-keyed digest-count aggregate on top of the m05 skinny
    * digest join; payload bytes still never shuffle.
    *
    * Both the pair numerators AND the per-asset denominators come from the
    * SAME skew-guard-capped digest set, so a tripped
    * `frame_digest_skew_guard` cannot deflate jaccard (shared counts
    * excluding capped digests while set sizes include them) — and the
    * shared subtree lets the physical planner reuse one digest exchange
    * instead of decoding the payloads twice. NOTE the error DIRECTION
    * under a tripped guard: cap-consistency removes capped digests from
    * both numerator and denominator, so two assets that differ ONLY in
    * capped (boilerplate-hot) frames can score jaccard up to 1.0 —
    * resemblance is OVERSTATED relative to the true uncapped jaccard,
    * never understated. For a dedup threshold that is the
    * false-positive-MERGE direction: when `frame_digest_skew_guard`
    * reports drops, audit merges near the threshold (raise
    * `maxDigestGroup` or re-verify flagged pairs on the full digest
    * sets) rather than trusting borderline scores. This is the opposite
    * of the LSH guards, which only lose candidates (conservative); here
    * the capped digests are by construction near-universal frames whose
    * removal INFLATES the similarity of whatever remains. Untripped
    * guard ⇒ exact jaccard of the full frame-digest sets. The count
    * joins carry no
    * broadcast hint: per-asset counts are corpus-cardinality (one row PER
    * ASSET — billions at corpus scale), so the choice between broadcast
    * and shuffle-hash belongs to AQE's runtime statistics, never a hint.
    * Output: (idA, idB, n_shared, jaccard) with idA < idB.
    */
  def frameJaccardPairs(media: DataFrame, n: Int = 4,
      threshold: Double = 0.5, maxDigestGroup: Int = 10000,
      decoder: MediaDecoder = ByteStubDecoder()): DataFrame = {
    val capped = cappedFrameDigests(media, n, maxDigestGroup, decoder)
    val counts = capped.groupBy("media_id").agg(count(lit(1)).as("__nf"))
    pairsFromDigests(capped)
      .join(counts.select(col("media_id").as("idA"), col("__nf").as("__na")), "idA")
      .join(counts.select(col("media_id").as("idB"), col("__nf").as("__nb")), "idB")
      .select(col("idA"), col("idB"), col("n_shared"),
        (col("n_shared").cast("double") /
          (col("__na") + col("__nb") - col("n_shared"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** One distinct 16-byte digest row per (media, frame) — the shared
    * front half of [[frameNearDupPairs]] and [[frameJaccardPairs]].
    * Digest of the hex encoding (not the raw bytes) so the exact same
    * digest is computable by engines whose md5 is string-only.
    */
  private def frameDigests(media: DataFrame, n: Int,
      decoder: MediaDecoder): DataFrame =
    frameSample(media, n, decoder)
      .filter(length(col("frame_bytes")) > 0)
      .select(col("media_id"), md5(hex(col("frame_bytes"))).as("__d"))
      .distinct()

  private def cappedFrameDigests(media: DataFrame, n: Int,
      maxDigestGroup: Int, decoder: MediaDecoder): DataFrame = {
    require(n >= 1, "need at least one frame")
    Dedup.capBuckets(frameDigests(media, n, decoder), Seq("__d"),
      maxDigestGroup, "frame_digest_skew_guard")
  }

  private def pairsFromDigests(capped: DataFrame): DataFrame = {
    val a = capped.select(col("__d"), col("media_id").as("idA"))
    val b = capped.select(col("__d"), col("media_id").as("idB"))
    a.join(b, Seq("__d"))
      .filter(col("idA") < col("idB"))
      .groupBy("idA", "idB").agg(count(lit(1)).as("n_shared"))
  }

  private def sharedFramePairs(media: DataFrame, n: Int,
      maxDigestGroup: Int, decoder: MediaDecoder): DataFrame =
    pairsFromDigests(cappedFrameDigests(media, n, maxDigestGroup, decoder))

  /** The 8×32 fixed-point DCT basis behind [[pHash64]]: K(u,r) =
    * round(cos(π(2r+1)u/64)·2¹⁵) — quantized ONCE here and spliced as
    * integer literals into both the engine expression and the generated
    * DuckDB oracle, so the two engines share the exact table instead of
    * trusting their libm `cos` to agree at the last ULP.
    */
  private[graft] def dctK: Array[Array[Long]] =
    graft.functions.HashKernels.dctK

  /** STUB pixel grid: a deterministic 32×32 grayscale stand-in for an
    * image decoder + resizer — sample the printable-ASCII byte stream at
    * 1024 STRETCHED positions (sample i reads offset ⌊i·len/1024⌋, the
    * nearest-neighbor resize mapping, so content at 10% longer length
    * still samples the same relative regions — the resize invariance a
    * real pHash pipeline gets from its image resizer). Pure fixed-shape
    * expressions (mirrored in the oracle); a real pipeline swaps this one
    * function for decode+grayscale+resize and keeps everything downstream.
    * Empty/NULL payload text yields no row. Output: (idCol, pixels) with
    * pixels a 1024-int array in [0, 255], row-major 32×32.
    */
  def pixelGridStub(df: DataFrame, idCol: String, textCol: String): DataFrame =
    pixelGrid(df, idCol, textCol, ByteStubDecoder())

  /** Decoder-parameterized pixel grid — the [[MediaDecoder]] seam's
    * image entry: (idCol, pixels) with undecodable payloads dropped.
    * The stub binding reproduces [[pixelGridStub]]'s byte transform
    * exactly (ONE codegen kernel call per row — the transform/substring
    * HOF formulation evaluated 1024 interpreted expressions per
    * reference, most of m10's original cost; values bit-identical to
    * the SQL the oracle replays).
    */
  def pixelGrid(df: DataFrame, idCol: String, payloadCol: String,
      decoder: MediaDecoder): DataFrame =
    df.select(col(idCol), decoder.pixelGrid(col(payloadCol)).as("pixels"))
      .filter(col("pixels").isNotNull)

  /** 64-bit DCT perceptual hash (pHash — the published image near-dup
    * workhorse: 32×32 grayscale → 2D DCT-II → top-left 8×8 block →
    * median-threshold bits; see PAPERS.md) over a caller-supplied pixel
    * grid ([[pixelGridStub]] here; a real decoder at deployment). Two
    * documented departures that buy exact cross-engine replay:
    * the DCT drops the α(u) normalization (a per-coefficient positive
    * scale — the bit pattern is a *variant* hash, equally stable), and
    * the cosine basis is the FIXED-POINT integer table [[dctK]], so every
    * coefficient is an exact 64-bit integer both engines compute
    * identically. The separable form runs row-DCT (8×32 sums over 32)
    * then column-DCT (64 sums over 32) — ~10k integer multiply-adds per
    * asset, ONE map-only projection; nothing shuffles.
    *
    * Bits: the 63 non-DC coefficients of the 8×8 block, each compared to
    * their MEDIAN (the 32nd smallest of the 63 — odd count, no averaging
    * ambiguity); bit i set when coefficient i+1 exceeds it. The DC term
    * is excluded from bits and median (brightness — exactly what a
    * perceptual hash must ignore). Output: (idCol, phash) — a LONG with
    * bit 63 always clear.
    *
    * The whole DCT+threshold is ONE codegen kernel call per row
    * ([[graft.functions.HashKernels.pHashDct]]) — the higher-order
    * transform/aggregate formulation is a trap here: CollapseProject
    * inlines each stage's array expression into every downstream
    * element access, so the 1024-pixel stage re-evaluates ~10⁶ times
    * per row (measured as a never-finishing sf0.01 run).
    */
  def pHash64(pixels: DataFrame, idCol: String, pixelsCol: String): DataFrame =
    pixels.select(col(idCol),
      graft.functions.GraftFunctions.phash_dct(col(pixelsCol)).as("phash"))

  /** Perceptual near-duplicate pairs over [[pHash64]] signatures — the
    * d04 Hamming-band LSH recipe VERBATIM
    * ([[Dedup.simhashPairsFromSignatures]]): maxHamming+1 bands
    * (pigeonhole recall 1.0), over-cap buckets refined by secondary
    * banding, exact `bit_count(xor)` verification. Payloads never appear:
    * by this stage each asset is one (id, long) row.
    * Output: (idA, idB, hamming) with idA < idB, hamming ≤ maxHamming.
    */
  def pHashPairs(hashes: DataFrame, idCol: String, hashCol: String,
      maxHamming: Int = 10, maxBucketSize: Int = 10000): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 62,
      s"maxHamming must lie in [0, 62], got $maxHamming")
    Dedup.simhashPairsFromSignatures(hashes, idCol, hashCol, maxHamming,
      maxBucketSize)
  }

  /** Audio near-duplicate pairs by constellation fingerprint matching
    * (Wang 2003 — the Shazam scheme; see PAPERS.md), completing the
    * modality dedup family next to image pHash ([[pHashPairs]]) and
    * video frame digests ([[frameNearDupPairs]]): two assets match when
    * at least `minAligned` of their landmark fingerprints agree AT A
    * CONSISTENT TIME OFFSET — the offset histogram is what makes the
    * scheme robust to a clip starting mid-asset, which whole-payload
    * hashes and unanchored feature sets both miss. Fingerprints come
    * from the byte-window energy stand-in (one codegen kernel per
    * payload — [[graft.functions.HashKernels.constellationHashes]]; a
    * real pipeline swaps byte sums for STFT band peaks and keeps every
    * shape downstream, including the window-aligned-shift caveat an STFT
    * hop has too).
    *
    * Scale shape: payloads collapse map-side to skinny (hash, id,
    * anchor) rows; the candidate join is hash-keyed with the standard
    * [[Dedup.capBuckets]] skew guard (`audio_fp_skew_guard` — jingle/
    * silence fingerprints shared by millions of assets would otherwise
    * explode quadratically); the offset histogram and the per-pair best
    * offset are two hash aggregates. Nothing corpus-scale moves after
    * the kernel.
    *
    * Output: (idA, idB, t_offset, n_aligned) with idA < idB — the best
    * (most-aligned, ties to the smaller offset) alignment per pair, at
    * least `minAligned` strong.
    */
  def audioFingerprintPairs(media: DataFrame, idCol: String,
      payloadCol: String, windowBytes: Int = 16, fanout: Int = 3,
      zone: Int = 16, minAligned: Int = 3,
      maxHashGroup: Int = 10000,
      decoder: Option[MediaDecoder] = None): DataFrame = {
    require(minAligned >= 1, s"need minAligned >= 1, got $minAligned")
    // the decode half routes through the MediaDecoder seam (energy
    // envelope; `windowBytes` configures the default stub binding and is
    // ignored under an explicit decoder); the landmark algebra is the
    // decoder-independent kernel — the fused byte path is this exact
    // composition (spec-pinned bit-identical)
    val dec = decoder.getOrElse(ByteStubDecoder(windowBytes = windowBytes))
    val fps = media.select(col(idCol).as("__id"),
        graft.functions.GraftFunctions.constellation_from_energies(
          dec.energyEnvelope(col(payloadCol)), fanout, zone).as("__c"))
      .filter(size(col("__c")) >= 2)
      .select(col("__id"), explode(expr(
        """transform(sequence(1, size(__c) div 2),
          |  i -> struct(element_at(__c, CAST(2*i-1 AS INT)) AS h,
          |              element_at(__c, CAST(2*i AS INT)) AS a))"""
          .stripMargin)).as("__p"))
      .select(col("__id"), col("__p.h").as("__h"), col("__p.a").as("__a"))
    val capped = Dedup.capBuckets(fps, Seq("__h"), maxHashGroup,
      "audio_fp_skew_guard")
    val a = capped.select(col("__h"), col("__id").as("idA"),
      col("__a").as("__aa"))
    val b = capped.select(col("__h"), col("__id").as("idB"),
      col("__a").as("__ab"))
    a.join(b, Seq("__h"))
      .filter(col("idA") < col("idB"))
      .groupBy(col("idA"), col("idB"),
        (col("__ab") - col("__aa")).as("t_offset"))
      .agg(count(lit(1)).as("n_aligned"))
      .groupBy(col("idA"), col("idB"))
      .agg(max_by(struct(col("t_offset"), col("n_aligned")),
        struct(col("n_aligned"), (-col("t_offset")).as("__t"))).as("__b"))
      .select(col("idA"), col("idB"), col("__b.t_offset").as("t_offset"),
        col("__b.n_aligned").as("n_aligned"))
      .filter(col("n_aligned") >= minAligned)
  }

  /** Video clip alignment — the m-family's re-edit detector: find pairs
    * of video assets where one is a CLIP of the other (or both cut from
    * a common source) at a CONSISTENT temporal offset, which the
    * frame-SET operators ([[frameNearDupPairs]]/[[frameJaccardPairs]])
    * cannot see (a clip shares few of the union's frames) and
    * whole-payload hashes miss entirely. The recipe composes the two
    * proven pieces: m05's frame digests as the landmark stream — here
    * over a FIXED-size frame grid, so a frame-aligned cut leaves every
    * surviving frame bit-identical at a shifted index (the
    * [[frameSample]] n-chunk grid would rescale with the clip's length
    * and share nothing) — and m11's offset histogram
    * ([[audioFingerprintPairs]]'s groupBy(idA, idB, offset) + max_by
    * shape) as the alignment verdict: the pair's best offset is where
    * the aligned-frame count peaks.
    *
    * Only FULL `frameBytes`-sized frames digest (a partial tail frame
    * differs between source and clip by construction and would only add
    * noise); frames digest as md5 of their hex image (the m05
    * cross-engine convention). Boilerplate frames (intros, credits,
    * black frames — shared by millions of assets) are the quadratic
    * blowup here exactly as jingles are for audio: the standard
    * [[Dedup.capBuckets]] guard drops digest groups above
    * `maxDigestGroup`, observe-reported as `clip_frame_skew_guard`.
    *
    * Scale shape: payload bytes collapse map-side to skinny
    * (digest, id, frame_no) rows before anything shuffles; the
    * candidate join is digest-keyed; the histogram and best-offset pick
    * are two hash aggregates — the m11 plan over a different landmark
    * extractor (a real pipeline swaps the byte framing for decoded
    * frames + a perceptual frame hash and keeps every shape downstream).
    *
    * Output: (idA, idB, f_offset, n_aligned) with idA < idB — the best
    * (most-aligned, ties to the smaller offset) alignment per pair, at
    * least `minAligned` frames strong. `f_offset` = idB's frame index
    * minus idA's for the matched frames: a clip of idA starting at
    * frame k of the source aligns at `f_offset = -k`.
    */
  def videoClipAlign(media: DataFrame, idCol: String, payloadCol: String,
      frameBytes: Int = 16, minAligned: Int = 3,
      maxDigestGroup: Int = 10000,
      decoder: Option[MediaDecoder] = None): DataFrame = {
    require(frameBytes >= 1, s"need a positive frame size, got $frameBytes")
    require(minAligned >= 1, s"need minAligned >= 1, got $minAligned")
    // frame decode through the MediaDecoder seam (`frameBytes` configures
    // the default stub binding; posexplode skips the NULL grid of
    // frame-less payloads); digesting and everything after is
    // decoder-independent
    val dec = decoder.getOrElse(ByteStubDecoder(frameBytes = frameBytes))
    val digests = media
      .select(col(idCol).as("__id"),
        posexplode(dec.frameGrid(col(payloadCol)))
          .as(Seq("frame_no", "__f")))
      .select(col("__id"), col("frame_no"), md5(hex(col("__f"))).as("__d"))
    val capped = Dedup.capBuckets(digests, Seq("__d"), maxDigestGroup,
      "clip_frame_skew_guard")
    val a = capped.select(col("__d"), col("__id").as("idA"),
      col("frame_no").as("__fa"))
    val b = capped.select(col("__d"), col("__id").as("idB"),
      col("frame_no").as("__fb"))
    a.join(b, Seq("__d"))
      .filter(col("idA") < col("idB"))
      .groupBy(col("idA"), col("idB"),
        (col("__fb") - col("__fa")).as("f_offset"))
      .agg(count(lit(1)).as("n_aligned"))
      .groupBy(col("idA"), col("idB"))
      .agg(max_by(struct(col("f_offset"), col("n_aligned")),
        struct(col("n_aligned"), (-col("f_offset")).as("__t"))).as("__b"))
      .select(col("idA"), col("idB"), col("__b.f_offset").as("f_offset"),
        col("__b.n_aligned").as("n_aligned"))
      .filter(col("n_aligned") >= minAligned)
  }

  /** Video scene segmentation + keyframe selection — the clip-SPLITTING
    * operator a video pretraining pipeline runs before anything trains
    * on long assets (captioning, clip sampling, temporal grounding all
    * consume scenes, not whole videos): cut wherever the energy envelope
    * jumps by more than `cutThreshold` between adjacent windows (the
    * classic hard-cut detector — a real pipeline swaps the byte-sum
    * envelope for frame-difference scores through the SAME
    * [[MediaDecoder.energyEnvelope]] seam and keeps everything here),
    * then per scene: its bounds and its PEAK window (highest energy,
    * ties to the earlier window) — the keyframe stand-in.
    *
    * Scale shape: one decode kernel pass collapses payloads to skinny
    * (id, window, energy) rows; the cut/label pass is one window
    * partitioned BY ASSET (per-asset window counts are duration-bounded
    * — thousands, never corpus-scale — so the sort is partition-local
    * and skew-free); the scene roll-up is one hash aggregate. All
    * integer arithmetic: both engines agree on every cut exactly.
    *
    * Output: (media_id, scene_no, start_w, n_windows, peak_w,
    * peak_energy), scene_no 0-based per asset in temporal order.
    */
  def sceneSegments(media: DataFrame, idCol: String, payloadCol: String,
      windowBytes: Int = 16, cutThreshold: Long = 120,
      decoder: Option[MediaDecoder] = None): DataFrame = {
    require(cutThreshold >= 0, s"need a non-negative threshold, got $cutThreshold")
    val dec = decoder.getOrElse(ByteStubDecoder(windowBytes = windowBytes))
    val en = media.select(col(idCol).as("media_id"),
      posexplode(dec.energyEnvelope(col(payloadCol))).as(Seq("w", "e")))
    val byAsset = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("w")
    val run = byAsset.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    en
      // window 0 opens scene 0 (lag is NULL -> no cut), every
      // over-threshold jump opens the next: scene = running cut count
      .withColumn("__cut",
        when(abs(col("e") - lag(col("e"), 1).over(byAsset)) > cutThreshold,
          lit(1)).otherwise(lit(0)))
      .withColumn("scene_no", sum(col("__cut")).over(run))
      .groupBy(col("media_id"), col("scene_no"))
      .agg(min(col("w")).as("start_w"), count(lit(1)).as("n_windows"),
        max_by(struct(col("w"), col("e")),
          struct(col("e"), (-col("w")).as("__t"))).as("__p"))
      .select(col("media_id"), col("scene_no"), col("start_w"),
        col("n_windows"), col("__p.w").as("peak_w"),
        col("__p.e").as("peak_energy"))
  }

  /** Cross-modal candidate pair mining — the standard LLM-data need the
    * within-modality family (m05/m06 frame dedup, d-series text dedup)
    * does not cover: pair TEXT documents with IMAGE/AUDIO assets through
    * a SHARED embedding space (the CLIP-style contract: one encoder per
    * modality, one vector space), both sides CORPUS-scale. Each left-side
    * (text) vector gets its approximate top-`k` right-side (media)
    * neighbors with cosine ≥ `minCosine` — the candidate set a captioning
    * / alt-text / paired-pretraining pipeline verifies downstream.
    *
    * This IS [[Similarity.annJoin]] (the s32 bipartite recipe) over
    * per-modality embedding columns plus the mining threshold: coarse
    * centroids train on the media side, media assigns map-only, text
    * probes `nprobe` lists, candidates meet in the `(list, salt)` SHUFFLE
    * equi-join — `numCentroids` scales √N and `salts` sub-splits hot
    * lists (the replicated-join skew defense, spec-pinned at s32), so
    * neither a modest centroid count nor a popular-concept list collapses
    * onto one task. Payload bytes never appear: both sides are skinny
    * (id, vector) frames; `nprobe = numCentroids` degenerates exact (the
    * m09 gate configuration, oracle-replayed relationally).
    *
    * Output: (leftId, rightId, rank, cosine) with rank per left over the
    * UNthresholded candidate ranking, thresholded after — so rank 1
    * missing means "best match was below the bar", not a renumbering.
    */
  def crossModalPairs(left: DataFrame, right: DataFrame,
      leftId: String, leftVec: String, rightId: String, rightVec: String,
      k: Int, minCosine: Double, numCentroids: Int = 16, nprobe: Int = 4,
      salts: Int = 4): DataFrame = {
    require(minCosine >= -1.0 && minCosine <= 1.0,
      s"minCosine must lie in [-1, 1], got $minCosine")
    Similarity.annJoin(left, right, leftId, leftVec, rightId, rightVec,
        k, numCentroids, nprobe, salts)
      .filter(col("cosine") >= minCosine)
  }
}
