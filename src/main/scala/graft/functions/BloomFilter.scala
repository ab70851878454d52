package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/**
 * Standard Bloom filter (Bloom 1970; double hashing per Kirsch &
 * Mitzenmacher 2006) over 64-bit keys, as the membership-sketch tier of
 * the operator framework (same family as [[HllSketch]]): the built filter
 * replaces a broadcast hash set when "does this key appear in that other
 * dataset" must run at corpus scale. A 10^9-gram eval set is a ~1.7 GB
 * exact hash set but a ~170 MB Bloom filter at 1% false positives — and
 * false positives only ever ADD candidate rows for an exact recheck;
 * membership never goes missing (no false negatives), which is the
 * property decontamination needs.
 *
 * Wire format (self-describing so the probe side needs no parameters):
 * byte 0 = number of hash functions k, bytes 1..N = the bit array.
 * Aggregation is the natural Bloom way: map-side partial filters OR-merge
 * into the final — constant-size state per partition regardless of input
 * cardinality.
 */
object BloomFilterKernel {
  /** Mixing constant for deriving the second hash (golden-ratio odd). */
  private val Phi = 0x9E3779B97F4A7C15L

  /** Largest bit count an `Array[Byte]`-backed filter can hold with the
    * count itself still an Int (≈ 2^31 bits = 256 MB). Asking for more
    * clamps here — the false-positive rate degrades (never the no-false-
    * negative guarantee); eval sets needing more bits should shard into
    * multiple filters.
    */
  val MaxBits: Int = 2147483640 // Int.MaxValue floored to a multiple of 8

  def optimalBits(expectedItems: Long, fpp: Double): Int = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1)
    val ln2sq = math.log(2) * math.log(2)
    val bits = math.ceil(-expectedItems * math.log(fpp) / ln2sq).toLong
    // byte-align, floor 64 bits; clamp BEFORE narrowing — a Long→Int cast
    // of a 10^9-item filter size would wrap to a tiny/negative count and
    // silently flag everything
    math.min(math.max((bits + 7) / 8 * 8, 64L), MaxBits.toLong).toInt
  }

  def optimalHashes(numBits: Long, expectedItems: Long): Int =
    math.max(1, math.round(numBits.toDouble / expectedItems * math.log(2)).toInt)

  def create(numBits: Int, numHashes: Int): Array[Byte] = {
    require(numBits >= 8 && numBits % 8 == 0, "numBits must be a positive multiple of 8")
    require(numHashes >= 1 && numHashes <= 255, "numHashes must be in [1, 255]")
    val buf = new Array[Byte](1 + numBits / 8)
    buf(0) = numHashes.toByte
    buf
  }

  def put(buf: Array[Byte], v: Long): Unit = {
    val k = buf(0) & 0xff
    val nbits = (buf.length - 1).toLong << 3
    val h1 = Mix64.mix(v)
    val h2 = Mix64.mix(v ^ Phi) | 1L
    var i = 0
    while (i < k) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, nbits)
      val idx = 1 + (pos >>> 3).toInt
      buf(idx) = (buf(idx) | (1 << (pos & 7).toInt)).toByte
      i += 1
    }
  }

  def mightContain(buf: Array[Byte], v: Long): Boolean = {
    val k = buf(0) & 0xff
    val nbits = (buf.length - 1).toLong << 3
    val h1 = Mix64.mix(v)
    val h2 = Mix64.mix(v ^ Phi) | 1L
    var i = 0
    while (i < k) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, nbits)
      if ((buf(1 + (pos >>> 3).toInt) & (1 << (pos & 7).toInt)) == 0) return false
      i += 1
    }
    true
  }

  /** OR-merge b into a (same size and k required — both come from one
    * aggregate's buffers, so a mismatch is a programming error).
    */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == b.length && a(0) == b(0),
      "cannot merge Bloom filters of different geometry")
    var i = 1
    while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }

  /** How many of the array's longs MIGHT be members — the per-document
    * probe loop as one kernel call (the whole array is scanned inside one
    * generated call, mirroring the [[HashKernels]] convention: no
    * per-element HOF lambda interpretation on the hot path).
    */
  def countContained(
      buf: Array[Byte],
      arr: org.apache.spark.sql.catalyst.util.ArrayData): Int = {
    var c = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (mightContain(buf, arr.getLong(i))) c += 1
      i += 1
    }
    c
  }
}

/** Aggregate a LONG key column into a serialized Bloom filter (binary). */
case class BloomFilterAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_agg takes a BIGINT key (hash strings first), got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Byte] =
    BloomFilterKernel.create(numBits, numHashes)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) BloomFilterKernel.put(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    BloomFilterKernel.merge(a, b)

  override def eval(buf: Array[Byte]): Any = buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(offset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BloomFilterAgg =
    copy(child = c.head)
  override def prettyName: String = "bloom_agg"
}

/** Probe a serialized Bloom filter: true iff `value` MIGHT be a member
  * (false ⇒ definitely absent). Codegen'd straight into the kernel call —
  * the hot path of a corpus-scale membership scan stays inside
  * whole-stage codegen.
  */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "bloom_might_contain takes (BINARY filter, BIGINT key), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override protected def nullSafeEval(filter: Any, v: Any): Any =
    BloomFilterKernel.mightContain(
      filter.asInstanceOf[Array[Byte]], v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (f, v) => s"graft.functions.BloomFilterKernel.mightContain($f, $v)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): BloomMightContain = copy(left = l, right = r)
  override def prettyName: String = "bloom_might_contain"
}

/** Count of the elements of an `array<bigint>` that MIGHT be members of
  * the filter. One generated kernel call per row; with the filter as a
  * `Literal`, codegen references the byte array object once — carrying
  * the filter as a data COLUMN instead would memcpy the whole bit array
  * out of every probe row (measured 20 s vs 0.5 s on a 500k-probe scan).
  */
case class BloomCountContained(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_count_contained takes (BINARY filter, ARRAY<BIGINT> keys), " +
          s"got (${l.sql}, ${r.sql})")
    }

  override protected def nullSafeEval(filter: Any, arr: Any): Any =
    BloomFilterKernel.countContained(
      filter.asInstanceOf[Array[Byte]],
      arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (f, a) => s"graft.functions.BloomFilterKernel.countContained($f, $a)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): BloomCountContained = copy(left = l, right = r)
  override def prettyName: String = "bloom_count_contained"
}
