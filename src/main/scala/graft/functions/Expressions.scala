package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Custom Catalyst expressions (all codegen'd — `doGenCode`, no Scala UDF in
 * the hot path) plus their Column wrappers and SQL registration.
 *
 * These cover the JVM-specific semantics the reference exposes through MVEL
 * (e.g. `my_col.hashCode()` in
 * reference config/migration-config.example.yaml:112-120) and the
 * hashing primitives the LLM-pipeline operators (MinHash, SimHash,
 * fingerprinting) are built on. Native expressions keep the operators inside
 * whole-stage codegen — the reference's per-row MVEL interpretation
 * (implementation/DefaultMigratorPlugin.java:367-387) is replaced by
 * generated Java.
 *
 * Input types are fixed by construction (the planner builds these over known
 * columns), so instead of `ExpectsInputTypes` (whose `AbstractDataType` is
 * `private[sql]` in Spark 4.x) each expression casts in `eval`/codegen.
 */

/** Exact JVM `String.hashCode` as a Catalyst expression.
  *
  * Needed for parity with reference calculated columns like
  * `abs(my_col.hashCode()) % 32` whose expected values depend on JVM string
  * hashing (SURVEY §7.4 "MVEL generality").
  */
case class JavaHashCode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(v: Any): Any =
    v.asInstanceOf[UTF8String].toString.hashCode
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$c.toString().hashCode()")
  override protected def withNewChildInternal(newChild: Expression): JavaHashCode =
    copy(child = newChild)
  override def prettyName: String = "java_hash_code"
}

/** 64-bit polynomial rolling hash of a string (base-31, wrapping Long
  * arithmetic) — the document-fingerprinting primitive. Deterministic and
  * cheap (codegen: a tight loop over UTF-16 code units).
  */
case class PolyHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) { h = h * 31L + s.charAt(i).toLong; i += 1 }
    h
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
        java.lang.String $s = $c.toString();
        long $h = 0L;
        for (int $i = 0; $i < $s.length(); $i++) { $h = $h * 31L + (long) $s.charAt($i); }
        ${ev.value} = $h;
      """
    })
  override protected def withNewChildInternal(newChild: Expression): PolyHash64 =
    copy(child = newChild)
  override def prettyName: String = "poly_hash64"
}

/** MurmurHash3-finalizer-style avalanche of a long with a seed — the MinHash
  * family generator: `minhash_i(x) = avalanche(x ^ seed_i)`. One codegen'd
  * expression evaluates one hash family member; MinHash builds
  * `min over shingles` per family with built-in array functions.
  */
case class Mix64(child: Expression, seed: Long) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    Mix64.mix(v.asInstanceOf[Long] ^ seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val h = ctx.freshName("h")
      s"""
        long $h = $c ^ ${seed}L;
        $h ^= $h >>> 33; $h *= -49064778989728563L;
        $h ^= $h >>> 33; $h *= -4265267296055464877L;
        $h ^= $h >>> 33;
        ${ev.value} = $h;
      """
    })
  override protected def withNewChildInternal(newChild: Expression): Mix64 =
    copy(child = newChild)
  override def prettyName: String = "mix64"
}

object Mix64 {
  /** fmix64 from MurmurHash3 (public domain, Austin Appleby). */
  def mix(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }
}

/** Dot product of two float-array columns, accumulated in Double in index
  * order (deterministic). The scalar core of cosine similarity / embedding
  * near-dup (brute-force and LSH-bucketed paths both reduce to this).
  * Mismatched dimensions yield null (ADVICE r1: a truncated dot product
  * would be a silent-wrong cosine).
  */
/** Probe a serialized Spark `CountMinSketch` (the binary produced by the
  * built-in `count_min_sketch` aggregate) for a key's estimated count.
  * The sketch is expected to be a plan-time literal (the b01 pattern —
  * one bounded collected row, never a per-row join column), so the
  * deserialized sketch is cached by array reference and re-read only
  * when the bytes object changes. String keys probe by their UTF-8
  * bytes, matching the aggregate's add path; integral keys by value.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = LongType
  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedSketch: org.apache.spark.util.sketch.CountMinSketch = _
  override protected def nullSafeEval(s: Any, k: Any): Any = {
    val bytes = s.asInstanceOf[Array[Byte]]
    if (!(bytes eq cachedBytes)) {
      cachedSketch = org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(bytes))
      cachedBytes = bytes
    }
    k match {
      case u: UTF8String => cachedSketch.estimateCount(u.toString)
      case other => cachedSketch.estimateCount(other)
    }
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "cms_estimate"
}

/** Per-window unsigned-byte sums of a binary column (window size fixed at
  * plan time) — the audio-loudness stub kernel, codegen'd.
  */
case class ByteWindowEnergies(child: Expression, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    HashKernels.byteWindowEnergies(v.asInstanceOf[Array[Byte]], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.byteWindowEnergies($c, $w)")
  override protected def withNewChildInternal(newChild: Expression): ByteWindowEnergies =
    copy(child = newChild)
  override def prettyName: String = "byte_window_energies"
}

/** Unigram-LM Viterbi segmentation under a trained quantized-log-prob
  * vocabulary (see [[HashKernels.unigramViterbi]]) — the vocabulary is a
  * plan-time constant shipped as a codegen reference object (the
  * [[BpeEncodeSyms]] bounded-model pattern): one static call per word,
  * primitive DP loops, exact integer score comparisons.
  */
case class UnigramViterbi(child: Expression, vocab: Seq[(String, Long)],
    maxPieceLen: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  @transient private lazy val table: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (p, q) => m.put(p, java.lang.Long.valueOf(q)) }
    m
  }
  override protected def nullSafeEval(v: Any): Any =
    HashKernels.unigramViterbi(v.asInstanceOf[UTF8String], table, maxPieceLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramVocab", table, "java.util.HashMap")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.unigramViterbi($c, $ref, $maxPieceLen)")
  }
  override protected def withNewChildInternal(newChild: Expression): UnigramViterbi =
    copy(child = newChild)
  override def prettyName: String = "unigram_viterbi"
}

/** Unigram-LM document encode under a trained vocabulary (see
  * [[HashKernels.unigramEncodeSyms]]) — the [[UnigramViterbi]] kernel
  * lifted to whole normalized documents, one static call per row.
  */
case class UnigramEncodeSyms(child: Expression, vocab: Seq[(String, Long)],
    maxPieceLen: Int, maxWordLen: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  @transient private lazy val table: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (p, q) => m.put(p, java.lang.Long.valueOf(q)) }
    m
  }
  override protected def nullSafeEval(v: Any): Any =
    HashKernels.unigramEncodeSyms(v.asInstanceOf[UTF8String], table,
      maxPieceLen, maxWordLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramVocab", table, "java.util.HashMap")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.unigramEncodeSyms($c, $ref, " +
        s"$maxPieceLen, $maxWordLen)")
  }
  override protected def withNewChildInternal(newChild: Expression): UnigramEncodeSyms =
    copy(child = newChild)
  override def prettyName: String = "unigram_encode_syms"
}

/** Audio constellation fingerprint kernel (see
  * [[HashKernels.constellationHashes]]) — interleaved [hash, anchor]
  * pairs, one codegen call per payload.
  */
case class ConstellationHashes(child: Expression, w: Int, fanout: Int,
    zone: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    HashKernels.constellationHashes(v.asInstanceOf[Array[Byte]], w, fanout,
      zone)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.constellationHashes($c, $w, " +
        s"$fanout, $zone)")
  override protected def withNewChildInternal(newChild: Expression): ConstellationHashes =
    copy(child = newChild)
  override def prettyName: String = "constellation_hashes"
}

/** Constellation landmark extraction over an already-decoded energy
  * envelope (see [[HashKernels.constellationFromEnergies]]) — the
  * algorithm half of the [[graft.operators.MediaDecoder]] codec seam.
  */
case class ConstellationFromEnergies(child: Expression, fanout: Int,
    zone: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    HashKernels.constellationFromEnergies(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      fanout, zone)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.constellationFromEnergies($c, " +
        s"$fanout, $zone)")
  override protected def withNewChildInternal(
      newChild: Expression): ConstellationFromEnergies =
    copy(child = newChild)
  override def prettyName: String = "constellation_from_energies"
}

/** Real-format 24-bit BMP decode to the 32×32 grayscale grid (see
  * [[MediaCodecs.bmpPixelGrid]]) — null (not error) for a non-BMP
  * payload, so mixed-format corpora drop foreign rows.
  */
case class BmpPixelGrid(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    MediaCodecs.bmpPixelGrid(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MediaCodecs.bmpPixelGrid($c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): BmpPixelGrid =
    copy(child = newChild)
  override def prettyName: String = "bmp_pixel_grid"
}

/** BMP-reel demux into per-frame byte slices (see
  * [[MediaCodecs.bmpFrameGrid]]).
  */
case class BmpFrameGrid(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    MediaCodecs.bmpFrameGrid(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MediaCodecs.bmpFrameGrid($c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): BmpFrameGrid =
    copy(child = newChild)
  override def prettyName: String = "bmp_frame_grid"
}

/** WAV PCM channel-0 energy envelope (see
  * [[MediaCodecs.wavEnergyEnvelope]]).
  */
case class WavEnergyEnvelope(child: Expression, windowSamples: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    MediaCodecs.wavEnergyEnvelope(v.asInstanceOf[Array[Byte]], windowSamples)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MediaCodecs.wavEnergyEnvelope($c, $windowSamples);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(
      newChild: Expression): WavEnergyEnvelope = copy(child = newChild)
  override def prettyName: String = "wav_energy_envelope"
}

/** WAV PCM n-slice frame sampling (see [[MediaCodecs.wavSampleFrames]]). */
case class WavSampleFrames(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    MediaCodecs.wavSampleFrames(v.asInstanceOf[Array[Byte]], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MediaCodecs.wavSampleFrames($c, $n);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(
      newChild: Expression): WavSampleFrames = copy(child = newChild)
  override def prettyName: String = "wav_sample_frames"
}

/** WARC record framing (see [[WarcCodec.warcRecords]]) — null for
  * non-WARC input. Accepts STRING (test fixtures) or BINARY (the real
  * crawl shape — [[GunzipMembers]] output); either way the record
  * slices are byte-exact UTF8String wraps.
  */
case class WarcRecords(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any = v match {
    case s: UTF8String => WarcCodec.warcRecords(s)
    case b: Array[Byte] => WarcCodec.warcRecords(b)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // the generated call resolves the (UTF8String | byte[]) overload by
    // the child's static Java type
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.WarcCodec.warcRecords($c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): WarcRecords =
    copy(child = newChild)
  override def prettyName: String = "warc_records"
}

/** WARC framing with BINARY record slices (see
  * [[WarcCodec.warcRecordsBin]]) — for non-UTF-8 entity bodies.
  */
case class WarcRecordsBin(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    WarcCodec.warcRecordsBin(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.WarcCodec.warcRecordsBin($c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(
      newChild: Expression): WarcRecordsBin = copy(child = newChild)
  override def prettyName: String = "warc_records_bin"
}

/** Any-JVM-charset byte decode (see [[WarcCodec.decodeCharset]]) —
  * charset is a plan-time literal.
  */
case class DecodeCharset(child: Expression, charset: String)
    extends UnaryExpression {
  // fail at construction, not mid-task, on a typo'd charset name
  java.nio.charset.Charset.forName(charset)
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    WarcCodec.decodeCharset(v.asInstanceOf[Array[Byte]], charset)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cs = ctx.addReferenceObj("charset", charset, "java.lang.String")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WarcCodec.decodeCharset($c, $cs)")
  }
  override protected def withNewChildInternal(
      newChild: Expression): DecodeCharset = copy(child = newChild)
  override def prettyName: String = "decode_charset"
}

/** Chunked transfer-coding decode (see [[WarcCodec.httpDechunk]]) —
  * BINARY → BINARY, null for input that is not chunked.
  */
case class HttpDechunk(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    WarcCodec.httpDechunk(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.WarcCodec.httpDechunk($c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): HttpDechunk =
    copy(child = newChild)
  override def prettyName: String = "http_dechunk"
}

/** Per-ROW-label charset decode (see [[WarcCodec.decodeCharsetDyn]]) —
  * (BINARY, STRING label) → STRING; WHATWG label mapping, unknown →
  * UTF-8, BOM stripped. The data-dependent-dispatch replacement for a
  * per-charset `when`-fold over [[DecodeCharset]] branches.
  */
case class DecodeCharsetDyn(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(data: Any, label: Any): Any =
    WarcCodec.decodeCharsetDyn(data.asInstanceOf[Array[Byte]],
      label.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (d, l) => s"graft.functions.WarcCodec.decodeCharsetDyn($d, $l)")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): DecodeCharsetDyn = copy(left = l, right = r)
  override def prettyName: String = "decode_charset_dyn"
}

/** HTTP entity body as bytes (see [[WarcCodec.httpEntityBytes]]). */
case class HttpEntityBytes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(v: Any): Any =
    WarcCodec.httpEntityBytes(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WarcCodec.httpEntityBytes($c)")
  override protected def withNewChildInternal(
      newChild: Expression): HttpEntityBytes = copy(child = newChild)
  override def prettyName: String = "http_entity_bytes"
}

/** Concatenated-gzip-member inflation (see [[WarcCodec.gunzipMembers]])
  * — BINARY → BINARY, null for non-gzip input.
  */
case class GunzipMembers(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    WarcCodec.gunzipMembers(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.WarcCodec.gunzipMembers($c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): GunzipMembers =
    copy(child = newChild)
  override def prettyName: String = "gunzip_members"
}

/** Stretch-sampled pixel grid kernel (see [[HashKernels.stretchPixels]]). */
case class StretchPixels(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    HashKernels.stretchPixels(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.stretchPixels($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): StretchPixels =
    copy(child = newChild)
  override def prettyName: String = "stretch_pixels"
}

/** DCT perceptual-hash kernel over a 1024-int pixel grid (see
  * [[HashKernels.pHashDct]]) — an imperative kernel rather than the
  * transform/aggregate formulation because CollapseProject inlines each
  * HOF stage into every downstream element access (multiplicative
  * re-evaluation; the m10 lesson).
  */
case class PHashDct(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    HashKernels.pHashDct(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.pHashDct($c)")
  override protected def withNewChildInternal(newChild: Expression): PHashDct =
    copy(child = newChild)
  override def prettyName: String = "phash_dct"
}

/** One-pass repetition fractions kernel (see
  * [[HashKernels.dupFractions]]) — replaces the higher-order
  * filter/zip_with/array_distinct chain that broke whole-stage codegen
  * on the t12 hot path. Output: [dup_bigram_frac, dup_line_frac].
  */
case class DupFractions(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    HashKernels.dupFractions(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.dupFractions($c)")
  override protected def withNewChildInternal(newChild: Expression): DupFractions =
    copy(child = newChild)
  override def prettyName: String = "dup_fractions"
}

/** JVM-exact `String.length()` (UTF-16 code units — see
  * [[HashKernels.javaStrLen]]); powers the MVEL translator's `.length()`
  * fast path with the same JVM semantics the interpreter guarantees.
  */
case class JavaStrLen(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(v: Any): Any =
    HashKernels.javaStrLen(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.javaStrLen($c)")
  override protected def withNewChildInternal(newChild: Expression): JavaStrLen =
    copy(child = newChild)
  override def prettyName: String = "java_str_len"
}

/** JVM-exact `String.substring(from)` (see [[HashKernels.javaSubstring]]). */
case class JavaSubstringFrom(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(s: Any, f: Any): Any =
    HashKernels.javaSubstring(s.asInstanceOf[UTF8String], f.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, f) => s"graft.functions.HashKernels.javaSubstring($s, $f)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JavaSubstringFrom =
    copy(left = l, right = r)
  override def prettyName: String = "java_substring"
}

/** JVM-exact `String.substring(from, to)`. */
case class JavaSubstringRange(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(s: Any, f: Any, t: Any): Any =
    HashKernels.javaSubstring(s.asInstanceOf[UTF8String],
      f.asInstanceOf[Int], t.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, f, t) => s"graft.functions.HashKernels.javaSubstring($s, $f, $t)")
  override protected def withNewChildrenInternal(
      c1: Expression, c2: Expression, c3: Expression): JavaSubstringRange =
    copy(first = c1, second = c2, third = c3)
  override def prettyName: String = "java_substring"
}

/** JVM-exact `String.indexOf(String)` — UTF-16 index, −1 when absent. */
case class JavaIndexOf(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(s: Any, sub: Any): Any =
    HashKernels.javaIndexOf(s.asInstanceOf[UTF8String], sub.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, sub) => s"graft.functions.HashKernels.javaIndexOf($s, $sub)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JavaIndexOf =
    copy(left = l, right = r)
  override def prettyName: String = "java_index_of"
}

/** `[a-zA-Z ]` character count (see [[HashKernels.alphaSpaceCount]]) —
  * replaces a regexp_replace that materialized the filtered string only
  * to take its length on the quality-score hot path.
  */
case class AlphaSpaceCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(v: Any): Any =
    HashKernels.alphaSpaceCount(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.alphaSpaceCount($c)")
  override protected def withNewChildInternal(newChild: Expression): AlphaSpaceCount =
    copy(child = newChild)
  override def prettyName: String = "alpha_space_count"
}

/** Token-membership counts against a fixed family of word sets (see
  * [[HashKernels.tokenSetHits]]) — one normalization pass instead of one
  * higher-order filter per set. The set family is a plan-time constant
  * embedded via a codegen reference object.
  */
case class TokenSetHits(child: Expression, table: Seq[Seq[String]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  @transient private lazy val sets: Array[java.util.HashSet[String]] =
    table.map { ws =>
      val h = new java.util.HashSet[String](ws.length * 2)
      ws.foreach(h.add)
      h
    }.toArray
  override protected def nullSafeEval(v: Any): Any =
    HashKernels.tokenSetHits(v.asInstanceOf[UTF8String], sets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenSets", sets, "java.util.HashSet[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.tokenSetHits($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): TokenSetHits =
    copy(child = newChild)
  override def prettyName: String = "token_set_hits"
}

/** BPE encode under a rank-ordered merge list (see
  * [[HashKernels.bpeEncodeSyms]]) — the trained merge table is a plan-time
  * constant embedded via codegen reference objects; one static call per
  * document replaces a fixed-depth chain of interpreted higher-order
  * folds.
  */
case class BpeEncodeSyms(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  @transient private lazy val mergesA: Array[String] = merges.map(_._1).toArray
  @transient private lazy val mergesB: Array[String] = merges.map(_._2).toArray
  override protected def nullSafeEval(v: Any): Any =
    HashKernels.bpeEncodeSyms(v.asInstanceOf[UTF8String], mergesA, mergesB)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refA = ctx.addReferenceObj("bpeMergesA", mergesA, "java.lang.String[]")
    val refB = ctx.addReferenceObj("bpeMergesB", mergesB, "java.lang.String[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.bpeEncodeSyms($c, $refA, $refB)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeEncodeSyms =
    copy(child = newChild)
  override def prettyName: String = "bpe_encode_syms"
}

/** Morton/Z-order bit interleave of two long coordinates (low `bits` bits
  * each) — the layout key for multi-dimensional write clustering. Codegen'd
  * static call, no UDF boxing on the write path.
  */
case class InterleaveBits(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(l: Any, r: Any): Any =
    HashKernels.interleaveBits(l.asInstanceOf[Long], r.asInstanceOf[Long], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.HashKernels.interleaveBits($a, $b, $bits)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "interleave_bits"
}

case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(l: Any, r: Any): Any =
    HashKernels.hilbertIndex(l.asInstanceOf[Long], r.asInstanceOf[Long], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.HashKernels.hilbertIndex($a, $b, $bits)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "hilbert_index"
}

/** N-dimensional Hilbert index over an `array<bigint>` of scaled
  * coordinates — the Skilling-transform kernel
  * ([[HashKernels.hilbertIndexN]]) as one codegen'd call, the n-axis
  * sibling of [[HilbertIndex]].
  */
case class HilbertIndexN(child: Expression, bits: Int) extends UnaryExpression {
  // plan-time guard for the plan-time-constant half of the kernel's
  // contract (the n·bits <= 63 half needs the runtime array length and is
  // enforced in the kernel); bits = 0 would shift by -1 and emit silently
  // wrong keys
  require(bits >= 1 && bits <= 63,
    s"hilbert_index_n needs 1 <= bits <= 63, got $bits")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  // a null COORDINATE yields a null key, matching the 2-D kernel and the
  // N-D Morton key (unchecked, toLongArray would NPE interpreted or read
  // the null slot as 0 under codegen — a silently wrong cluster key)
  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    var i = 0
    var anyNull = false
    while (i < n && !anyNull) { anyNull = arr.isNullAt(i); i += 1 }
    if (anyNull) null else HashKernels.hilbertIndexN(arr.toLongArray(), bits)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      s"""
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = graft.functions.HashKernels.hilbertIndexN($a.toLongArray(), $bits);
         |}
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): HilbertIndexN =
    copy(child = newChild)
  override def prettyName: String = "hilbert_index_n"
}

case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val b = r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (a.numElements() != b.numElements()) null
    else {
      val n = a.numElements()
      var s = 0.0
      var i = 0
      while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
      s
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
        if ($a.numElements() != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          int $n = $a.numElements();
          double $s = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
          }
          ${ev.value} = $s;
        }
      """
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
  override def prettyName: String = "dot_product"
}

/** Jaccard of two sorted distinct long arrays (merge-based kernel). */
case class JaccardSorted(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(l: Any, r: Any): Any =
    HashKernels.sortedJaccard(
      l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashKernels.sortedJaccard($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSorted =
    copy(left = l, right = r)
  override def prettyName: String = "jaccard_sorted"
}

/** Column API + SQL registration for the expressions above. */
object GraftFunctions {
  def java_hash_code(c: Column): Column = Bridge.column(
    JavaHashCode(Bridge.expression(c)))
  def poly_hash64(c: Column): Column = Bridge.column(
    PolyHash64(Bridge.expression(c)))
  def mix64(c: Column, seed: Long): Column = Bridge.column(
    Mix64(Bridge.expression(c), seed))
  def dot_product(a: Column, b: Column): Column = Bridge.column(
    DotProduct(Bridge.expression(a), Bridge.expression(b)))
  def interleave_bits(a: Column, b: Column, bits: Int): Column = Bridge.column(
    InterleaveBits(Bridge.expression(a.cast("long")),
      Bridge.expression(b.cast("long")), bits))
  def hilbert_index(a: Column, b: Column, bits: Int): Column = Bridge.column(
    HilbertIndex(Bridge.expression(a.cast("long")),
      Bridge.expression(b.cast("long")), bits))
  def hilbert_index_n(coords: Column, bits: Int): Column = Bridge.column(
    HilbertIndexN(Bridge.expression(coords), bits))
  def byte_window_energies(c: Column, w: Int): Column = Bridge.column(
    ByteWindowEnergies(Bridge.expression(c), w))
  def dup_fractions(c: Column): Column = Bridge.column(
    DupFractions(Bridge.expression(c)))
  def phash_dct(c: Column): Column = Bridge.column(
    PHashDct(Bridge.expression(c)))
  def stretch_pixels(c: Column, n: Int): Column = Bridge.column(
    StretchPixels(Bridge.expression(c), n))
  def constellation_hashes(c: Column, w: Int, fanout: Int,
      zone: Int): Column = Bridge.column(
    ConstellationHashes(Bridge.expression(c), w, fanout, zone))
  def constellation_from_energies(c: Column, fanout: Int,
      zone: Int): Column = Bridge.column(
    ConstellationFromEnergies(Bridge.expression(c), fanout, zone))
  def unigram_viterbi(c: Column, vocab: Seq[(String, Long)],
      maxPieceLen: Int): Column = Bridge.column(
    UnigramViterbi(Bridge.expression(c), vocab, maxPieceLen))
  def unigram_encode_syms(c: Column, vocab: Seq[(String, Long)],
      maxPieceLen: Int, maxWordLen: Int): Column = Bridge.column(
    UnigramEncodeSyms(Bridge.expression(c), vocab, maxPieceLen, maxWordLen))
  def token_set_hits(c: Column, table: Seq[Seq[String]]): Column = Bridge.column(
    TokenSetHits(Bridge.expression(c), table))

  def warc_records(c: Column): Column = Bridge.column(
    WarcRecords(Bridge.expression(c)))
  def gunzip_members(c: Column): Column = Bridge.column(
    GunzipMembers(Bridge.expression(c)))
  def warc_records_bin(c: Column): Column = Bridge.column(
    WarcRecordsBin(Bridge.expression(c)))
  def http_entity_bytes(c: Column): Column = Bridge.column(
    HttpEntityBytes(Bridge.expression(c)))
  def decode_charset(c: Column, charset: String): Column = Bridge.column(
    DecodeCharset(Bridge.expression(c), charset))
  def decode_charset_dyn(c: Column, label: Column): Column = Bridge.column(
    DecodeCharsetDyn(Bridge.expression(c), Bridge.expression(label)))
  def http_dechunk(c: Column): Column = Bridge.column(
    HttpDechunk(Bridge.expression(c)))
  def bmp_pixel_grid(c: Column): Column = Bridge.column(
    BmpPixelGrid(Bridge.expression(c)))
  def bmp_frame_grid(c: Column): Column = Bridge.column(
    BmpFrameGrid(Bridge.expression(c)))
  def wav_energy_envelope(c: Column, windowSamples: Int): Column =
    Bridge.column(WavEnergyEnvelope(Bridge.expression(c), windowSamples))
  def wav_sample_frames(c: Column, n: Int): Column = Bridge.column(
    WavSampleFrames(Bridge.expression(c), n))
  def bpe_encode_syms(c: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeEncodeSyms(Bridge.expression(c), merges))
  def alpha_space_count(c: Column): Column = Bridge.column(
    AlphaSpaceCount(Bridge.expression(c)))
  def cms_estimate(sketch: Column, key: Column): Column = Bridge.column(
    CmsEstimate(Bridge.expression(sketch), Bridge.expression(key)))
  def shingle_hashes(c: Column, k: Int, word: Boolean = false,
      distinct: Boolean = true): Column =
    Bridge.column(ShingleHashes(Bridge.expression(c), k, word, distinct))
  def gram_overlap_counts(cand: Column, ref: Column, maxN: Int,
      word: Boolean): Column =
    Bridge.column(GramOverlapCounts(Bridge.expression(cand),
      Bridge.expression(ref), maxN, word))
  def lr_buckets(c: Column, dim: Int): Column =
    Bridge.column(LrBuckets(Bridge.expression(c), dim))
  def occurrence_expand(c: Column): Column =
    Bridge.column(OccurrenceExpand(Bridge.expression(c)))
  def winnow_hashes(c: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowHashes(Bridge.expression(c), k, w))
  def cdc_chunks(c: Column, minSize: Int, maskBits: Int,
      maxSize: Int): Column =
    Bridge.column(CdcChunks(Bridge.expression(c), minSize, maskBits, maxSize))
  def deletion_variant_hashes(c: Column, d: Int): Column =
    Bridge.column(DeletionVariantHashes(Bridge.expression(c), d))
  def minhash_sig(c: Column, numHashes: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(c), numHashes))
  def simhash64(c: Column): Column = Bridge.column(SimHash64(Bridge.expression(c)))
  def band_keys(c: Column, bands: Int, rowsPerBand: Int): Column =
    Bridge.column(BandKeys(Bridge.expression(c), bands, rowsPerBand))
  def jaccard_sorted(a: Column, b: Column): Column =
    Bridge.column(JaccardSorted(Bridge.expression(a), Bridge.expression(b)))
  def hll_distinct(c: Column, p: Int = 12): Column = Bridge.column(
    HllSketch(Bridge.expression(c), p).toAggregateExpression())
  def hll_init(c: Column, p: Int = 12): Column =
    Bridge.column(HllInitLong(Bridge.expression(c), p))
  def hll_merge(c: Column, p: Int = 12): Column = Bridge.column(
    HllMergeSketch(Bridge.expression(c), p).toAggregateExpression())
  def hll_card(c: Column, p: Int = 12): Column =
    Bridge.column(HllCardinality(Bridge.expression(c), p))
  def top_k_by(score: Column, id: Column, k: Int): Column = Bridge.column(
    TopKByScore(Bridge.expression(score.cast("double")), Bridge.expression(id), k)
      .toAggregateExpression())
  def bloom_agg(c: Column, numBits: Int, numHashes: Int): Column = Bridge.column(
    BloomFilterAgg(Bridge.expression(c), numBits, numHashes).toAggregateExpression())
  def bloom_might_contain(filter: Column, key: Column): Column = Bridge.column(
    BloomMightContain(Bridge.expression(filter), Bridge.expression(key)))
  def bloom_count_contained(filter: Column, keys: Column): Column = Bridge.column(
    BloomCountContained(Bridge.expression(filter), Bridge.expression(keys)))

  /** Register SQL names so `expr("java_hash_code(col)")` (and thus the MVEL
    * translator output) resolves. Reference parity for the plugin/UDF
    * surface (SURVEY §2 O22). Idempotent per REGISTRY, not per session: a
    * cloned session copies its parent's registry, so a session-keyed guard
    * set would re-register into the clone and trip the
    * "replaced a previously registered function" WARN on every query
    * (VERDICT r4 #5). Asking the registry itself is the only check that
    * survives cloning.
    */
  def register(spark: SparkSession): Unit = synchronized {
    // synchronized: the exists/register pair is check-then-act, and two
    // concurrent plan builds on one session would otherwise both pass the
    // exists check and the second would WARN "replaced a previously
    // registered function" — the exact noise the guard exists to prevent
    def ifAbsent(name: String)(builder: Seq[Expression] => Expression): Unit =
      if (!Bridge.functionExists(spark, name))
        Bridge.registerFunction(spark, name, builder)
    ifAbsent("java_hash_code")(es => JavaHashCode(es.head))
    ifAbsent("poly_hash64")(es => PolyHash64(es.head))
    ifAbsent("dot_product")(es => DotProduct(es.head, es(1)))
    ifAbsent("java_str_len")(es => JavaStrLen(es.head))
    ifAbsent("java_substring") {
      case Seq(s, f) => JavaSubstringFrom(s, f)
      case Seq(s, f, t) => JavaSubstringRange(s, f, t)
      case es => throw new IllegalArgumentException(
        s"java_substring takes 2 or 3 args, got ${es.length}")
    }
    ifAbsent("java_index_of")(es => JavaIndexOf(es.head, es(1)))
  }
}

/** Distinct sorted 64-bit hashes of the k-char-grams (word=false) or
  * k-word-grams (word=true) of a string. One generated call per row; the
  * O(len·k) loop runs in [[HashKernels]] — the shingling stage of the
  * MinHash pipeline (MMDS §3.2) without per-shingle expression overhead.
  */
/** Distinct hashed-feature buckets for the LR featurization — see
  * [[HashKernels.lrBuckets]].
  */
case class LrBuckets(child: Expression, dim: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    HashKernels.lrBuckets(v.asInstanceOf[UTF8String], dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.lrBuckets($c, $dim)")
  override protected def withNewChildInternal(newChild: Expression): LrBuckets =
    copy(child = newChild)
  override def prettyName: String = "lr_buckets"
}

/** Occurrence expansion of a hash multiset into a hash set for weighted
  * (multiset) Jaccard — see [[HashKernels.occurrenceExpand]].
  */
case class OccurrenceExpand(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    HashKernels.occurrenceExpand(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.occurrenceExpand($c)")
  override protected def withNewChildInternal(newChild: Expression): OccurrenceExpand =
    copy(child = newChild)
  override def prettyName: String = "occurrence_expand"
}

/** Per-n clipped gram-overlap counts of a (candidate, reference) string
  * pair — 3 longs per n (m, ctot, rtot), see
  * [[HashKernels.gramOverlapCounts]]. One kernel call per row replaces
  * the BLEU/chrF explode → (pair, n, gram) aggregate → join pipeline.
  */
case class GramOverlapCounts(left: Expression, right: Expression,
    maxN: Int, word: Boolean) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.gramOverlapCounts(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], maxN, word)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c1, c2) =>
      s"graft.functions.HashKernels.gramOverlapCounts($c1, $c2, $maxN, $word)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): GramOverlapCounts =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "gram_overlap_counts"
}

case class ShingleHashes(child: Expression, k: Int, word: Boolean,
    distinct: Boolean = true) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    if (word) HashKernels.wordShingleHashes(v.asInstanceOf[UTF8String], k, distinct)
    else HashKernels.charShingleHashes(v.asInstanceOf[UTF8String], k, distinct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (word) "wordShingleHashes" else "charShingleHashes"
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.$m($c, $k, $distinct)")
  }
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
  override def prettyName: String = "shingle_hashes"
}

/** Content-defined chunk (len, hash) pairs of a binary payload,
  * interleaved — the FastCDC-style boundary walk; see
  * [[HashKernels.cdcChunks]].
  */
case class CdcChunks(child: Expression, minSize: Int, maskBits: Int,
    maxSize: Int) extends UnaryExpression {
  // validate here so EVERY entry point (raw GraftFunctions.cdc_chunks,
  // StreamingChunkDedup, Multimodal) fails loudly at PLAN time: the
  // kernel sizes its output buffer as 2*(len/minSize + 2), so e.g.
  // maxSize < minSize would overrun it with an uninformative
  // executor-side ArrayIndexOutOfBoundsException
  require(minSize >= 1, s"cdc_chunks: minSize must be >= 1 (got $minSize)")
  require(maxSize >= minSize,
    s"cdc_chunks: maxSize ($maxSize) must be >= minSize ($minSize)")
  require(maskBits >= 1 && maskBits <= 62,
    s"cdc_chunks: maskBits must lie in [1, 62] (got $maskBits)")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    HashKernels.cdcChunks(v.asInstanceOf[Array[Byte]], minSize, maskBits,
      maxSize)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.cdcChunks($c, $minSize, $maskBits, $maxSize)")
  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
  override def prettyName: String = "cdc_chunks"
}

/** Winnowing fingerprint set of a string: distinct sorted sliding-window
  * minima of the positional k-char-gram hashes (window `w`) — the MOSS
  * selection rule with its ≥ w+k−1-char match-detection guarantee; see
  * [[HashKernels.winnowHashes]] for the O(n) deque.
  */
case class WinnowHashes(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    HashKernels.winnowHashes(v.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.winnowHashes($c, $k, $w)")
  override protected def withNewChildInternal(newChild: Expression): WinnowHashes =
    copy(child = newChild)
  override def prettyName: String = "winnow_hashes"
}

/** Distinct sorted content hashes of every ≤ d-code-point-deletion
  * variant of a string (itself included) — the SymSpell blocking keys,
  * assembled from positional polynomial prefix hashes in O(len·d) per
  * row instead of materializing O(len^(d+1)) characters of variant
  * strings (see [[HashKernels.deletionVariantHashes]]).
  */
case class DeletionVariantHashes(child: Expression, d: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    HashKernels.deletionVariantHashes(v.asInstanceOf[UTF8String], d)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.deletionVariantHashes($c, $d)")
  override protected def withNewChildInternal(
      newChild: Expression): DeletionVariantHashes = copy(child = newChild)
  override def prettyName: String = "deletion_variant_hashes"
}

/** MinHash signature (numHashes mins of seeded avalanche hashes) of an
  * array<long> of element hashes. Broder's resemblance sketch, one kernel
  * call per row.
  */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    HashKernels.minHashSig(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.minHashSig($c, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

/** 64-bit SimHash (Charikar) of an array<long> of element hashes. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    HashKernels.simHash(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.simHash($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

/** LSH band keys of a MinHash signature (bands × rowsPerBand layout). */
case class BandKeys(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    HashKernels.bandKeys(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], bands, rowsPerBand)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.bandKeys($c, $bands, $rowsPerBand)")
  override protected def withNewChildInternal(newChild: Expression): BandKeys =
    copy(child = newChild)
  override def prettyName: String = "band_keys"
}
