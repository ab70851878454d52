package graft.functions

import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/**
 * Tight-loop JVM kernels behind the MinHash / SimHash / LSH expressions.
 *
 * The naive formulation (higher-order `transform` lambdas over shingle
 * arrays) evaluates one interpreted expression per (shingle × hash-family)
 * element — measured 284 s for the sf0.1 near-dup query. These kernels do
 * the same math in generated-code-callable static methods: one virtual call
 * per ROW, then primitive long loops. Called from both the interpreted
 * `eval` and the Janino-generated code of the wrapper expressions (Scala
 * objects expose static forwarders, so `graft.functions.HashKernels.x(...)`
 * is valid generated Java).
 *
 * Algorithmic shape per PAPERS.md / MMDS ch.3: k-shingle → 64-bit hash
 * per shingle → per-family min of an avalanche-mixed hash (Broder
 * resemblance sketch) → banded keys for LSH bucketing.
 */
object HashKernels {

  /** Content hashes of every string obtainable from `s` by deleting at
    * most `d` CODE POINTS (`s` itself included), distinct-sorted —
    * WITHOUT materializing any variant string. The SymSpell blocking
    * step ([[graft.operators.FuzzyJoin]]) needs only that equal variant
    * strings hash equally, so each variant's hash is assembled from
    * precomputed positional polynomial prefix hashes in O(1):
    *
    *   pre(i) = H(s[0,i)) under H(t) = Σ tⱼ·B^(len−1−j) (wrapping);
    *   segment [a,b) hash = pre(b) − pre(a)·B^(b−a);
    *   delete i       →  pre(i)·B^(n−1−i) + seg(i+1, n)
    *   delete i<j     → (pre(i)·B^(j−i−1) + seg(i+1, j))·B^(n−1−j)
    *                     + seg(j+1, n)
    *
    * Total O(n·d) work per row instead of the O(n^(d+1)) characters the
    * string-materializing formulation copies and re-hashes — at d=2 on a
    * 50-char key that is ~60 KB of string traffic per row collapsed to
    * ~1.3k multiply-adds. Each raw polynomial value is finalized with a
    * length-salted fmix64 so near-identical variants spread across join
    * buckets. Hash equality is content-only (equal variants always
    * collide, the recall direction); a cross-content collision can only
    * ADD a candidate, which the exact Levenshtein verify removes.
    * Code-point deletions match Spark's code-point `levenshtein`/
    * `substr` semantics on supplementary characters.
    */
  /** Hard bound on input code-point length: at d=2 the variant count is
    * n·(n−1)/2 longs per ROW, so an accidental document-sized input would
    * OOM an executor (and past ~65k code points the Int count math would
    * overflow). The kernel is scoped to short key fields; fail loudly.
    */
  val MaxCodePoints = 4096

  def deletionVariantHashes(s: UTF8String, d: Int): ArrayData = {
    val str = s.toString
    val cp = str.codePoints().toArray
    val n = cp.length
    if (n > MaxCodePoints)
      throw new IllegalArgumentException(
        s"deletionVariantHashes: input of $n code points exceeds the " +
          s"$MaxCodePoints bound — this kernel targets short key fields " +
          "(at d=2 output is n(n-1)/2 longs per row); pre-truncate or " +
          "use a banding join for long text")
    val B = 0x100000001B3L
    val pow = new Array[Long](n + 1)
    val pre = new Array[Long](n + 1)
    pow(0) = 1L
    var i = 0
    while (i < n) {
      pow(i + 1) = pow(i) * B
      pre(i + 1) = pre(i) * B + cp(i).toLong
      i += 1
    }
    def seg(a: Int, b: Int): Long = pre(b) - pre(a) * pow(b - a)
    def fin(h: Long, len: Int): Long =
      Mix64.mix(h ^ (len.toLong * 0x9E3779B97F4A7C15L))
    val count = 1 + (if (d >= 1) n else 0) +
      (if (d >= 2) n * (n - 1) / 2 else 0)
    val out = new Array[Long](count)
    out(0) = fin(pre(n), n)
    var k = 1
    if (d >= 1) {
      i = 0
      while (i < n) {
        out(k) = fin(pre(i) * pow(n - 1 - i) + seg(i + 1, n), n - 1)
        k += 1
        i += 1
      }
    }
    if (d >= 2) {
      i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          out(k) = fin((pre(i) * pow(j - i - 1) + seg(i + 1, j)) *
            pow(n - 1 - j) + seg(j + 1, n), n - 2)
          k += 1
          j += 1
        }
        i += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(distinctSorted(out))
  }

  /** Base-31 polynomial hash of chars [from, to) finalized with fmix64. */
  private def windowHash(s: String, from: Int, to: Int): Long = {
    var h = 0L
    var i = from
    while (i < to) { h = h * 31L + s.charAt(i).toLong; i += 1 }
    Mix64.mix(h ^ 0x9E3779B97F4A7C15L)
  }

  private def distinctSorted(a: Array[Long]): Array[Long] = {
    if (a.isEmpty) return a
    java.util.Arrays.sort(a)
    var n = 1
    var i = 1
    while (i < a.length) {
      if (a(i) != a(n - 1)) { a(n) = a(i); n += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(a, n)
  }

  /** 64-bit hashes of all k-char-grams of `s`; `distinct` gives the sorted
    * shingle SET (for Jaccard), false keeps the multiset in order (for
    * SimHash weighting).
    */
  def charShingleHashes(s: UTF8String, k: Int, distinct: Boolean): ArrayData = {
    val out = charShingleLongs(s.toString, k)
    UnsafeArrayData.fromPrimitiveArray(if (distinct) distinctSorted(out) else out)
  }

  /** Winnowing fingerprint SET (Schleimer, Wilkerson & Aiken, SIGMOD
    * 2003 — the MOSS document-fingerprinting scheme): the distinct sorted
    * minima of every `w`-long sliding window over the positional k-gram
    * hash sequence of `s`. The winnowing guarantee: any match of length
    * ≥ w + k − 1 characters between two documents shares at least one
    * selected fingerprint, while expected fingerprint density is only
    * 2/(w+1) of the gram count — the detection floor of an every-gram
    * index at a fraction of its size.
    *
    * Selection is by window MINIMUM, so the fingerprint VALUE set is
    * independent of any tie rule (tie rules in the paper only change
    * which POSITION is recorded — positions are not emitted here); this
    * is what lets a relational oracle reproduce the set exactly.
    *
    * O(n) per row: the sliding minima come from an ascending-minima
    * deque (each hash enters and leaves the ring at most once), not the
    * O(n·w) per-window rescan a `transform`+`slice`+`array_min` column
    * formulation would run. Inputs shorter than one full window (fewer
    * than w gram hashes) contribute their single global minimum — the
    * whole short doc is still guaranteed-detectable.
    */
  def winnowHashes(s: UTF8String, k: Int, w: Int): ArrayData = {
    val str = s.toString
    if (str.isEmpty) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val nh = if (str.length < k) 1 else str.length - k + 1
    val hs = new Array[Long](nh)
    if (str.length < k) hs(0) = windowHash(str, 0, str.length)
    else {
      var i = 0
      while (i + k <= str.length) { hs(i) = windowHash(str, i, i + k); i += 1 }
    }
    if (nh <= w) {
      var m = hs(0)
      var i = 1
      while (i < nh) { if (hs(i) < m) m = hs(i); i += 1 }
      return UnsafeArrayData.fromPrimitiveArray(Array(m))
    }
    // ascending-minima deque over windows [i-w+1, i]: ring holds indices
    // of candidate minima in increasing hash order
    val ring = new Array[Int](nh)
    var head = 0
    var tail = 0 // ring occupancy is [head, tail)
    val out = new Array[Long](nh - w + 1)
    var i = 0
    while (i < nh) {
      while (tail > head && hs(ring(tail - 1)) >= hs(i)) tail -= 1
      ring(tail) = i
      tail += 1
      if (ring(head) <= i - w) head += 1
      if (i >= w - 1) out(i - w + 1) = hs(ring(head))
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(distinctSorted(out))
  }

  /** Distinct sorted 64-bit hashes of all k-word-grams of `s` (single-space
    * separated; callers normalize whitespace first). k=1 = token hashes.
    */
  def wordShingleHashes(s: UTF8String, k: Int, distinct: Boolean): ArrayData = {
    val out = wordShingleLongs(s.toString, k)
    UnsafeArrayData.fromPrimitiveArray(if (distinct) distinctSorted(out) else out)
  }

  /** Positional (multiset) k-char-gram hashes as a raw long array — the
    * exact values [[charShingleHashes]] emits with `distinct = false`,
    * without the ArrayData wrap. Shared by [[gramOverlapCounts]].
    */
  private def charShingleLongs(str: String, k: Int): Array[Long] = {
    if (str.length < k) {
      if (str.isEmpty) return Array.emptyLongArray
      return Array(windowHash(str, 0, str.length))
    }
    val out = new Array[Long](str.length - k + 1)
    var i = 0
    while (i + k <= str.length) { out(i) = windowHash(str, i, i + k); i += 1 }
    out
  }

  /** Positional (multiset) k-word-gram hashes as a raw long array — the
    * exact values [[wordShingleHashes]] emits with `distinct = false`.
    */
  private def wordShingleLongs(str: String, k: Int): Array[Long] = {
    if (str.isEmpty) return Array.emptyLongArray
    var words = 1
    var i = 0
    while (i < str.length) { if (str.charAt(i) == ' ') words += 1; i += 1 }
    val starts = new Array[Int](words + 1)
    var w = 1
    i = 0
    while (i < str.length) {
      if (str.charAt(i) == ' ') { starts(w) = i + 1; w += 1 }
      i += 1
    }
    starts(words) = str.length + 1
    if (words < k) return Array(windowHash(str, 0, str.length))
    val out = new Array[Long](words - k + 1)
    var g = 0
    while (g + k <= words) {
      out(g) = windowHash(str, starts(g), starts(g + k) - 1)
      g += 1
    }
    out
  }

  /** Per-n clipped-overlap counts between a candidate and a reference
    * string — the BLEU/chrF sufficient statistics computed in ONE kernel
    * call per row instead of `2·maxN` explode → corpus-wide (pair, n,
    * gram) hash aggregates → join (the r17 t59/t60 rewrite: the metric
    * is per-ROW, so nothing about it needs a shuffle).
    *
    * For n = 1..maxN over the SAME gram hashes the shingle kernels emit
    * (`word = false`: [[charShingleHashes]] multisets; `word = true`:
    * [[wordShingleHashes]] multisets — including the short-input
    * whole-text-as-one-gram rule), the output packs three longs per n:
    *
    *   out(3(n−1))   = m_n    = Σ_g min(tf_cand(g), tf_ref(g))  (clipped)
    *   out(3(n−1)+1) = ctot_n = total candidate grams at n
    *   out(3(n−1)+2) = rtot_n = total reference grams at n
    *
    * Equality of gram hashes stands in for equality of grams exactly as
    * in the join formulation (same 64-bit windowHash values). The counts
    * are exact integers; all rounding/decimal arithmetic stays in the
    * caller's Spark expressions, so the scores are bit-identical to the
    * aggregate formulation's.
    */
  def gramOverlapCounts(cand: UTF8String, ref: UTF8String, maxN: Int,
      word: Boolean): ArrayData = {
    val cs = cand.toString
    val rs = ref.toString
    val out = new Array[Long](3 * maxN)
    var n = 1
    while (n <= maxN) {
      val ca = if (word) wordShingleLongs(cs, n) else charShingleLongs(cs, n)
      val ra = if (word) wordShingleLongs(rs, n) else charShingleLongs(rs, n)
      java.util.Arrays.sort(ca)
      java.util.Arrays.sort(ra)
      var m = 0L
      var i = 0
      var j = 0
      while (i < ca.length && j < ra.length) {
        if (ca(i) < ra(j)) i += 1
        else if (ca(i) > ra(j)) j += 1
        else {
          val v = ca(i)
          var ci = 0
          var rj = 0
          while (i < ca.length && ca(i) == v) { ci += 1; i += 1 }
          while (j < ra.length && ra(j) == v) { rj += 1; j += 1 }
          m += math.min(ci, rj).toLong
        }
      }
      val base = 3 * (n - 1)
      out(base) = m
      out(base + 1) = ca.length.toLong
      out(base + 2) = ra.length.toLong
      n += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Distinct hashed-feature buckets of a space-separated (normalized)
    * document — the t56 featurization collapsed to ONE map-side kernel
    * pass: per token, bucket = polyFold(md5Hex(token)) & (dim−1),
    * bit-identical to the column formulation
    * `poly_hash64(md5(tok)) & (dim−1)` (md5 hex is lowercase in both;
    * dim a power of two so the signed mask equals the oracle's unsigned
    * mod), deduplicated and sorted HERE so the caller needs no
    * `distinct()` shuffle — binary presence features come out of the
    * scan map-only.
    */
  def lrBuckets(s: UTF8String, dim: Int): ArrayData = {
    val str = s.toString
    if (str.isEmpty) return UnsafeArrayData.fromPrimitiveArray(Array.emptyIntArray)
    val seen = new java.util.TreeSet[Integer]()
    val md = java.security.MessageDigest.getInstance("MD5")
    var start = 0
    var i = 0
    while (i <= str.length) {
      if (i == str.length || str.charAt(i) == ' ') {
        if (i > start) {
          val bytes = md.digest(str.substring(start, i)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          md.reset()
          var h = 0L
          var j = 0
          while (j < bytes.length) {
            val b = bytes(j) & 0xff
            val hex1 = Character.forDigit(b >>> 4, 16)
            val hex2 = Character.forDigit(b & 0xf, 16)
            h = h * 31L + hex1.toLong
            h = h * 31L + hex2.toLong
            j += 1
          }
          seen.add((h & (dim - 1).toLong).toInt)
        }
        start = i + 1
      }
      i += 1
    }
    val out = new Array[Int](seen.size)
    var k = 0
    val it = seen.iterator()
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Occurrence expansion of a hash MULTISET into a hash SET for
    * weighted (multiset) Jaccard: the k-th occurrence of value h in the
    * input rehashes as mix(h ^ k·φ) — so an element with multiplicity w
    * contributes w DISTINCT outputs (h,1)…(h,w), and plain SET
    * intersection over two expansions counts Σ_h min(tf_a, tf_b): set
    * Jaccard of the expansions IS weighted Jaccard of the multisets
    * (the integer-weight replication view of consistent weighted
    * sampling — see PAPERS.md). Feed it POSITIONAL (non-distinct)
    * shingle/token hashes; output is distinct-sorted for the
    * [[sortedJaccard]] merge and [[minhashSig]]. One pass, one
    * occurrence counter per row.
    */
  def occurrenceExpand(a: ArrayData): ArrayData = {
    val n = a.numElements()
    if (n == 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val occ = new java.util.HashMap[java.lang.Long, Integer]()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val h = a.getLong(i)
      val k = occ.merge(h, 1, (x, y) => x + y)
      out(i) = Mix64.mix(h ^ (k.toLong * 0x9E3779B97F4A7C15L))
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(distinctSorted(out))
  }

  /** MinHash signature: element i = min over hashes of fmix64(h ^ seed_i).
    * Null-free long array in, long array out.
    */
  def minHashSig(hashes: ArrayData, numHashes: Int): ArrayData = {
    val n = hashes.numElements()
    val sig = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      val seed = Mix64.mix(0x9E3779B97F4A7C15L * (i + 1))
      var min = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = Mix64.mix(hashes.getLong(j) ^ seed)
        if (v < min) min = v
        j += 1
      }
      sig(i) = min
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  /** 64-bit SimHash over element hashes (Charikar 2002): bit j set iff the
    * sum over elements of ±1 (by bit j of the element hash) is positive.
    */
  def simHash(hashes: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  /** LSH band keys: key b = fmix64 of the base-31 fold of signature rows
    * [b*rowsPerBand, (b+1)*rowsPerBand) xor'd with the band index (separates
    * band key spaces).
    */
  def bandKeys(sig: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 1125899906842597L
      var r = b * rowsPerBand
      val end = r + rowsPerBand
      while (r < end && r < sig.numElements()) { h = h * 31L + sig.getLong(r); r += 1 }
      out(b) = Mix64.mix(h ^ b.toLong)
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** 64-bit hash of a whole string (base-31 polynomial + fmix64). */
  def stringHash64(s: UTF8String): Long = {
    val str = s.toString
    windowHash(str, 0, str.length)
  }

  /** Jaccard similarity of two SORTED distinct long arrays via linear merge
    * — O(n+m) with zero allocation, vs hash-set building per pair in
    * `array_intersect`/`array_union`. The verification kernel for LSH
    * candidate pairs (millions of pairs on dup-heavy corpora).
    */
  def sortedJaccard(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    val m = b.numElements()
    if (n == 0 && m == 0) return 0.0
    var i = 0
    var j = 0
    var inter = 0
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (n + m - inter)
  }

  /** Per-window unsigned-byte sums of a binary payload: element k =
    * Σ bytes[kw, (k+1)w). The stub "loudness" kernel for audio-shaped
    * payloads — a real pipeline swaps byte sums for decoded-sample RMS,
    * keeping the schema and the one-kernel-call-per-row shape.
    */
  def byteWindowEnergies(bytes: Array[Byte], w: Int): ArrayData = {
    val n = (bytes.length + w - 1) / w
    val out = new Array[Long](n)
    var i = 0
    while (i < bytes.length) { out(i / w) += (bytes(i) & 0xff).toLong; i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Rabin-style content-defined chunking of a binary payload. The cut
    * decision at each position comes from a 16-byte SLIDING-window
    * base-31 hash (prefix poly for the first 15 positions), fmix64-mixed
    * — position-LOCAL, so it depends only on the surrounding content,
    * never on where the current chunk started: inserting bytes upstream
    * shifts the data but the boundary decisions re-synchronize on the
    * same content, which is the whole point of CDC (fixed-size blocks
    * lose all alignment after one inserted byte; a chunk-state-reset
    * hash would too — the spec pins this property). Cut after a byte
    * when the chunk has reached `minSize` and the mixed window hash's
    * low `maskBits` bits are zero (expected chunk ≈ min + 2^maskBits),
    * or unconditionally at `maxSize`; the trailing remainder is its own
    * chunk. Returns interleaved `[len0, hash0, len1, hash1, ...]` where
    * each hash is the CHUNK-content polynomial (reset per chunk)
    * finalized with fmix64 — identical bytes, identical hash.
    */
  def cdcChunks(bytes: Array[Byte], minSize: Int, maskBits: Int,
      maxSize: Int): ArrayData = {
    val mask = (1L << maskBits) - 1L
    val gold = 0x9E3779B97F4A7C15L
    var pow = 1L // 31^16 mod 2^64
    var t = 0
    while (t < 16) { pow *= 31L; t += 1 }
    val out = new Array[Long](2 * (bytes.length / math.max(minSize, 1) + 2))
    var hw = 0L
    var hc = 0L
    var cur = 0
    var n = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xffL
      hw = hw * 31L + b -
        (if (i >= 16) (bytes(i - 16) & 0xffL) * pow else 0L)
      hc = hc * 31L + b
      cur += 1
      if ((cur >= minSize && (Mix64.mix(hw ^ gold) & mask) == 0L) ||
          cur == maxSize) {
        out(n) = cur.toLong
        out(n + 1) = Mix64.mix(hc ^ gold)
        n += 2
        hc = 0L
        cur = 0
      }
      i += 1
    }
    if (cur > 0) {
      out(n) = cur.toLong
      out(n + 1) = Mix64.mix(hc ^ gold)
      n += 2
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, n))
  }

  /** Unigram-LM Viterbi segmentation kernel (the decode step of the
    * Kudo 2018 SentencePiece unigram model; see PAPERS.md): DP over a
    * word's CODE POINTS — best(i) = max over piece lengths t ≤
    * `maxPieceLen` of best(i−t) + q(piece), scores being the QUANTIZED
    * integer log-probs of the trained vocabulary (`table`), so the
    * argmax compares exact integers and engines cannot disagree. Ties
    * break to the SMALLEST split point j (= the LONGEST last piece):
    * j iterates ascending with a strict `>`. Returns the best path's
    * pieces in order; a word not fully coverable by the vocabulary
    * returns the EMPTY array (the caller's documented skip semantics —
    * with all single characters seeded the trainer never produces one,
    * since every piece on a previous best path survives pruning).
    * One imperative pass (O(len · maxPieceLen) map lookups) — the
    * per-stage DataFrame formulation would shuffle the vocabulary per
    * position; this is the [[bpeEncodeSyms]] bounded-model pattern.
    */
  def unigramViterbi(s: UTF8String, table: java.util.HashMap[String, java.lang.Long],
      maxPieceLen: Int): ArrayData = {
    val str = s.toString
    val cps = new java.util.ArrayList[String]()
    var ci = 0
    while (ci < str.length) {
      val cp = str.codePointAt(ci)
      val n = Character.charCount(cp)
      cps.add(str.substring(ci, ci + n))
      ci += n
    }
    val L = cps.size()
    if (L == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[AnyRef])
    val NEG = java.lang.Long.MIN_VALUE
    val best = Array.fill(L + 1)(NEG)
    val bp = new Array[Int](L + 1)
    best(0) = 0L
    var i = 1
    while (i <= L) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (best(j) != NEG) {
          val sb = new java.lang.StringBuilder()
          var k = j
          while (k < i) { sb.append(cps.get(k)); k += 1 }
          val q = table.get(sb.toString)
          if (q != null && best(j) + q > best(i)) {
            best(i) = best(j) + q
            bp(i) = j
          }
        }
        j += 1
      }
      i += 1
    }
    if (best(L) == NEG)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[AnyRef])
    val out = new java.util.ArrayList[UTF8String]()
    var pos = L
    while (pos > 0) {
      val j = bp(pos)
      val sb = new java.lang.StringBuilder()
      var k = j
      while (k < pos) { sb.append(cps.get(k)); k += 1 }
      out.add(0, UTF8String.fromString(sb.toString))
      pos = j
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[AnyRef](out.size())))
  }

  /** Unigram-LM encode of a WHITESPACE-NORMALIZED document (the
    * [[bpeEncodeSyms]] shape): per word, the [[unigramViterbi]] best
    * path's pieces, concatenated in document order. Words longer than
    * `maxWordLen` code points sit outside the trained coverage contract
    * (the trainer excluded them) and emit no pieces, as does a word the
    * pruned vocabulary cannot tile (cannot arise for training-corpus
    * words within the cap — the coverage invariant). One kernel call
    * per document, primitive loops only.
    */
  def unigramEncodeSyms(s: UTF8String,
      table: java.util.HashMap[String, java.lang.Long],
      maxPieceLen: Int, maxWordLen: Int): ArrayData = {
    val str = s.toString
    val out = new java.util.ArrayList[AnyRef]()
    var i = 0
    while (i <= str.length) {
      val sp = str.indexOf(' ', i)
      val e = if (sp < 0) str.length else sp
      if (e > i) {
        val w = str.substring(i, e)
        if (w.codePointCount(0, w.length) <= maxWordLen) {
          val pieces = unigramViterbi(UTF8String.fromString(w), table,
            maxPieceLen)
          var k = 0
          while (k < pieces.numElements()) {
            out.add(pieces.getUTF8String(k))
            k += 1
          }
        }
      }
      i = e + 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[AnyRef](out.size)))
  }

  /** Stretch-sampled pixel stand-in behind
    * [[graft.operators.Multimodal.pixelGridStub]]: sample `n` code
    * points of `s` at positions ⌊i·len/n⌋ (nearest-neighbor resize),
    * value = codepoint % 256. Bit-identical to the SQL formulation the
    * oracle replays (`unicode(substr(t, (i*len)//n + 1, 1)) % 256`);
    * kernelized because the higher-order transform evaluated 1024
    * interpreted substring expressions per REFERENCE of the pixels
    * column — multiplied by the band join's re-executions, that was
    * most of m10's 34 s at sf0.1.
    */
  def stretchPixels(s: UTF8String, n: Int): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val len = cps.length
    // fixed-shape contract: the grid is ALWAYS n samples. Empty input
    // has no position to sample, so it must fail HERE, at the sampling
    // step — a 0-length early return would surface as a confusing
    // "needs 1024 ints, got 0" require in pHashDct downstream. Callers
    // filter empties first (pixelGridStub's length > 0 gate).
    require(len > 0,
      s"stretchPixels needs a non-empty string to sample $n positions from")
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      out(i) = cps(((i.toLong * len) / n).toInt) % 256
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Audio constellation fingerprints (Wang 2003, "An Industrial-Strength
    * Audio Search Algorithm" — the Shazam scheme; see PAPERS.md) over the
    * byte-window energy stand-in ([[byteWindowEnergies]] — a real
    * pipeline swaps per-window byte sums for STFT band peaks, keeping
    * every shape downstream): energies per `w`-byte window → STRICT
    * interior local maxima as the constellation points → each peak pairs
    * with its next `fanout` peaks within `zone` windows, hashed as
    * e(a)·2²⁸ + e(b)·2¹⁴ + Δt (exact integers — w ≤ 64 keeps window
    * energies under 2¹⁴). Returns interleaved `[hash0, anchor0, hash1,
    * anchor1, …]` (anchors are 0-based window indices — the offset
    * histogram's evidence). One kernel pass per payload; bytes never
    * shuffle.
    */
  def constellationHashes(bytes: Array[Byte], w: Int, fanout: Int,
      zone: Int): ArrayData = {
    require(w >= 1 && w <= 64,
      s"window must be 1..64 bytes (energy must fit 14 bits), got $w")
    constellationFromEnergies(byteWindowEnergies(bytes, w), fanout, zone)
  }

  /** The ALGORITHM half of [[constellationHashes]], split at the
    * [[graft.operators.MediaDecoder]] codec seam: landmark extraction
    * (strict interior peaks → fanout-paired packed hashes) over an
    * already-decoded energy envelope. [[constellationHashes]] IS this
    * over [[byteWindowEnergies]] (bit-identical by construction —
    * spec-pinned), and a real decoder feeds STFT band energies in
    * instead. Peak energies must fit 14 bits (the hash packing) —
    * quantize decoder output; violations fail loudly at the landmark,
    * not as silently colliding hashes.
    */
  def constellationFromEnergies(energies: ArrayData, fanout: Int,
      zone: Int): ArrayData = {
    require(fanout >= 1 && zone >= 1 && zone < (1 << 14),
      s"need fanout >= 1 and 1 <= zone < 2^14, got $fanout/$zone")
    val e = energies.toLongArray()
    val n = e.length
    val peaks = new java.util.ArrayList[Int]()
    var i = 1
    while (i < n - 1) {
      if (e(i) > e(i - 1) && e(i) > e(i + 1)) peaks.add(i)
      i += 1
    }
    val out = new java.util.ArrayList[java.lang.Long]()
    var j = 0
    while (j < peaks.size) {
      var k = 1
      while (k <= fanout && j + k < peaks.size) {
        val a = peaks.get(j)
        val b = peaks.get(j + k)
        val dt = b - a
        if (dt <= zone) {
          require(e(a) < (1 << 14) && e(b) < (1 << 14),
            s"peak energy must fit 14 bits (got ${e(a)}/${e(b)}) — " +
              "quantize the decoder's energy envelope")
          out.add((e(a) << 28) | (e(b) << 14) | dt.toLong)
          out.add(a.toLong)
        }
        k += 1
      }
      j += 1
    }
    val arr = new Array[Long](out.size)
    i = 0
    while (i < arr.length) { arr(i) = out.get(i); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(arr)
  }

  /** The 8×32 fixed-point DCT basis behind [[pHashDct]]: K(u,r) =
    * round(cos(π(2r+1)u/64)·2¹⁵) — quantized ONCE here and spliced as
    * integer literals into the generated DuckDB oracle, so the two
    * engines share the exact table instead of trusting their libm `cos`
    * to agree at the last ULP.
    */
  val dctK: Array[Array[Long]] = Array.tabulate(8, 32)((u, r) =>
    Math.round(math.cos(math.Pi * (2 * r + 1) * u / 64.0) * 32768.0))

  /** 64-bit DCT perceptual-hash kernel: separable integer 2D DCT-II of a
    * row-major 32×32 pixel grid on the [[dctK]] fixed-point basis
    * (row pass: 8×32 sums over 32; column pass: 64 sums over 32 —
    * ~10k multiply-adds, exact in 64-bit), then the 63 non-DC
    * coefficients of the top-left 8×8 block median-threshold into bits
    * (median = the 32nd smallest of the 63; bit i set when coefficient
    * i+1 exceeds it). One imperative pass per row — the
    * transform/aggregate higher-order formulation is NOT usable here:
    * CollapseProject inlines each stage's array into every downstream
    * element access, re-evaluating the 1024-pixel stage per access
    * (measured: a multiplicative ~10¹⁰-ops-per-row blowup).
    */
  def pHashDct(pixels: ArrayData): Long = {
    require(pixels.numElements() == 1024,
      s"pHash needs a 32x32 grid (1024 ints), got ${pixels.numElements()}")
    val p = pixels.toIntArray()
    val k = dctK
    val rdct = new Array[Long](256)
    var u = 0
    while (u < 8) {
      var c = 0
      while (c < 32) {
        var s = 0L
        var r = 0
        while (r < 32) { s += p(r * 32 + c).toLong * k(u)(r); r += 1 }
        rdct(u * 32 + c) = s
        c += 1
      }
      u += 1
    }
    val coef = new Array[Long](64)
    u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0L
        var c = 0
        while (c < 32) { s += rdct(u * 32 + c) * k(v)(c); c += 1 }
        coef(u * 8 + v) = s
        v += 1
      }
      u += 1
    }
    val rest = java.util.Arrays.copyOfRange(coef, 1, 64)
    val sorted = rest.clone()
    java.util.Arrays.sort(sorted)
    val med = sorted(31)
    var h = 0L
    var i = 0
    while (i < 63) { if (rest(i) > med) h |= 1L << i; i += 1 }
    h
  }

  private val wsRun = java.util.regex.Pattern.compile("\\s+")

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Leading/trailing ASCII-space strip ONLY — the semantics of Spark's
    * `trim` function (tabs/CRs stay), used for the line filter below.
    */
  private def stripSpaces(s: String): String = {
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    s.substring(from, to)
  }

  /** Java `String.length()` — UTF-16 code units, not code points: the
    * MVEL translator's `.length()` mapping must agree with the JVM (an
    * astral char counts 2), so SQL `length` (code points) is not usable.
    * UTF-16 units = code points + astral count; astral code points are
    * exactly the 4-byte UTF-8 sequences (lead byte 0xF0-0xF4).
    */
  def javaStrLen(s: UTF8String): Int = {
    val n = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var astral = 0
    var i = 0L
    while (i < n) {
      if ((org.apache.spark.unsafe.Platform.getByte(base, off + i) & 0xF8) == 0xF0)
        astral += 1
      i += 1
    }
    s.numChars() + astral
  }

  /** Java `String.substring` — UTF-16 indices, JVM exceptions on
    * out-of-range (the task fails like an MVEL per-row throw would; the
    * SQL `substring`'s 1-based code-point clamping would silently compute
    * different slices than the user's JVM-tested expression).
    */
  def javaSubstring(s: UTF8String, from: Int): UTF8String =
    UTF8String.fromString(s.toString.substring(from))

  def javaSubstring(s: UTF8String, from: Int, to: Int): UTF8String =
    UTF8String.fromString(s.toString.substring(from, to))

  /** Java `String.indexOf(String)` — UTF-16 index, −1 when absent. */
  def javaIndexOf(s: UTF8String, sub: UTF8String): Int =
    s.toString.indexOf(sub.toString)

  /** Count of `[a-zA-Z ]` characters — the alpha-ratio numerator of the
    * quality score. Exactly `length(regexp_replace(text, "[^a-zA-Z ]",
    * ""))` (the targets are ASCII, so counting standalone ASCII bytes in
    * the UTF-8 encoding needs no string materialization at all).
    */
  def alphaSpaceCount(s: UTF8String): Int = {
    val n = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var count = 0
    var i = 0L
    while (i < n) {
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      if ((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') || b == ' ') count += 1
      i += 1
    }
    count
  }

  /** Per-set token-membership counts in ONE normalization pass — powers
    * the language-ID argmax. Tokens are the same trim → lower →
    * `\s+`-collapse → single-space split (empties kept) as the
    * column-expression formulation; `counts(i)` = how many tokens are
    * members of `sets(i)`. One kernel call replaces one higher-order
    * `filter` per language (each re-tokenizing the document).
    */
  def tokenSetHits(s: UTF8String,
      sets: Array[java.util.HashSet[String]]): ArrayData = {
    val norm = wsRun.matcher(s.trim().toLowerCase().toString).replaceAll(" ")
    val toks = norm.split(" ", -1)
    val counts = new Array[Int](sets.length)
    var i = 0
    while (i < toks.length) {
      var l = 0
      while (l < sets.length) {
        if (sets(l).contains(toks(i))) counts(l) += 1
        l += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(counts)
  }

  /** Gopher-style repetition fractions in ONE kernel pass — the exact
    * semantics of the original column-expression formulation
    * (`TextAnalysis.repetitionScores`), which fell out of whole-stage
    * codegen through its higher-order filter/zip_with/array_distinct
    * chain (measured 1.6 s → ~0.3 s for t12 at sf0.1):
    *  - bigram side: trim(spaces) → lower → collapse `\s+` → split on
    *    single spaces KEEPING empties (regex-split limit −1, as Spark's
    *    `split`), duplicated fraction of adjacent word pairs;
    *  - line side: RAW text split on `\n`, lines kept when non-empty
    *    after space-trim, duplicated fraction of the ORIGINAL lines.
    * Both fractions rounded HALF_UP to 6 places (Spark `round`); 0.0 for
    * degenerate inputs. Trim/lower ride the same UTF8String methods the
    * built-in expressions call, so outputs are bit-identical.
    * Returns [dup_bigram_frac, dup_line_frac].
    */
  def dupFractions(s: UTF8String): ArrayData = {
    val norm = wsRun.matcher(s.trim().toLowerCase().toString).replaceAll(" ")
    val toks = norm.split(" ", -1)
    var dupB = 0.0
    if (toks.length >= 2) {
      val nb = toks.length - 1
      val seen = new java.util.HashSet[String](nb * 2)
      var i = 0
      while (i < nb) { seen.add(toks(i) + " " + toks(i + 1)); i += 1 }
      dupB = round6((nb - seen.size).toDouble / nb)
    }
    val rawLines = s.toString.split("\n", -1)
    var nl = 0
    val lineSet = new java.util.HashSet[String](rawLines.length * 2)
    var j = 0
    while (j < rawLines.length) {
      if (stripSpaces(rawLines(j)).nonEmpty) { nl += 1; lineSet.add(rawLines(j)) }
      j += 1
    }
    val dupL = if (nl > 0) round6((nl - lineSet.size).toDouble / nl) else 0.0
    UnsafeArrayData.fromPrimitiveArray(Array(dupB, dupL))
  }

  /** Morton (Z-order) interleave of the low `bits` bits of two
    * non-negative scaled coordinates: bit j of `a` lands at output bit
    * 2j, bit j of `b` at 2j+1. With bits <= 31 the result stays well
    * under 2^63 — a total order whose prefix ranges approximate 2-D
    * boxes, the standard multi-column data-layout key.
    */
  def interleaveBits(a: Long, b: Long, bits: Int): Long = {
    var z = 0L
    var j = 0
    while (j < bits) {
      z |= ((a >> j) & 1L) << (2 * j)
      z |= ((b >> j) & 1L) << (2 * j + 1)
      j += 1
    }
    z
  }

  /** 2-D Hilbert curve index (xy→d) over a `bits`-bit grid — the classic
    * top-down quadrant walk (Hamilton's formulation as popularized on the
    * Hilbert-curve Wikipedia page): per level, the quadrant number
    * `(3·rx) ^ ry` contributes `s²` steps, then the lower quadrant is
    * rotated/reflected into canonical orientation. Unlike Morton order,
    * consecutive indices are always grid-adjacent (no diagonal jumps), so
    * range scans over the key touch tighter 2-D boxes.
    */
  def hilbertIndex(xIn: Long, yIn: Long, bits: Int): Long = {
    var x = xIn
    var y = yIn
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) != 0L) 1L else 0L
      val ry = if ((y & s) != 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** N-dimensional Hilbert curve index over a `bits`-bit grid per axis —
    * the Skilling transform (J. Skilling, "Programming the Hilbert
    * curve", AIP Conf. Proc. 707, 2004, the standard public n-D
    * formulation): axes → transpose form (inverse-undo + Gray encode),
    * then an MSB-first bit interleave with axis 0 most significant.
    * Requires `n · bits <= 63`. For n = 2 this walks the same curve as
    * [[hilbertIndex]] (pinned exhaustively in the layout spec).
    */
  def hilbertIndexN(coords: Array[Long], bits: Int): Long = {
    val n = coords.length
    // direct `hilbert_index_n` callers bypass Layout.scaledN's checks;
    // bits = 0 would silently compute m = 1L << -1 and return wrong keys
    require(bits >= 1 && n * bits <= 63,
      s"hilbert_index_n needs 1 <= bits and n*bits <= 63 (n=$n, bits=$bits)")
    val x = java.util.Arrays.copyOf(coords, n)
    val m = 1L << (bits - 1)
    // inverse undo
    var q = m
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0L) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = m
    while (q > 1) {
      if ((x(n - 1) & q) != 0L) t ^= q - 1
      q >>= 1
    }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // transpose → index: bit j of axis k lands at j·n + (n−1−k)
    var d = 0L
    var j = bits - 1
    while (j >= 0) {
      var k = 0
      while (k < n) {
        d = (d << 1) | ((x(k) >>> j) & 1L)
        k += 1
      }
      j -= 1
    }
    d
  }

  /** BPE encode of a WHITESPACE-NORMALIZED document (single-space
    * separated; the [[graft.operators.Dedup.normalized]] contract): per
    * word, split to CODE POINTS (matching SQL `substring` semantics on
    * both engines) and apply the merge pairs IN ORDER, each as the
    * left-to-right non-overlapping stack fold the trainer uses (push a
    * symbol; when the top two equal the pair, collapse). Returns the
    * document's full symbol sequence. O(chars · merges) primitive loops
    * — the higher-order fold-chain formulation this replaced did one
    * interpreted array copy per (symbol × merge) and measured 43 s at
    * sf0.1 where this kernel runs the same math map-only in codegen.
    * `mergesA`/`mergesB` are the rank-ordered pair sides.
    */
  def bpeEncodeSyms(s: UTF8String, mergesA: Array[String],
      mergesB: Array[String]): ArrayData = {
    val str = s.toString
    val out = new java.util.ArrayList[UTF8String]()
    val buf = new java.util.ArrayList[String]()
    var i = 0
    val n = str.length
    while (i <= n) {
      val sp = str.indexOf(' ', i)
      val end = if (sp < 0) n else sp
      if (end > i) {
        // word [i, end): seed with code points
        buf.clear()
        var k = i
        while (k < end) {
          val cp = str.codePointAt(k)
          val w = Character.charCount(cp)
          buf.add(str.substring(k, k + w))
          k += w
        }
        // apply merges in rank order; each pass is the stack fold
        var m = 0
        while (m < mergesA.length) {
          val a = mergesA(m)
          val b = mergesB(m)
          if (buf.size >= 2) {
            var top = 0 // stack height within buf (in-place)
            var r = 0
            while (r < buf.size) {
              val x = buf.get(r)
              if (top > 0 && buf.get(top - 1) == a && x == b) {
                buf.set(top - 1, a + b)
              } else {
                buf.set(top, x)
                top += 1
              }
              r += 1
            }
            while (buf.size > top) buf.remove(buf.size - 1)
          }
          m += 1
        }
        var e = 0
        while (e < buf.size) {
          out.add(UTF8String.fromString(buf.get(e)))
          e += 1
        }
      }
      i = end + 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[AnyRef](out.size)))
  }
}
