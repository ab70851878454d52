package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * HyperLogLog distinct-count sketch as a custom
 * `TypedImperativeAggregate` — the "custom sketch aggregate" tier of the
 * operator framework (SURVEY §7.3; Flajolet et al. 2007, the public HLL
 * paper). 2^p byte registers; standard bias-corrected estimate with the
 * small-range (linear counting) correction.
 *
 * Partial aggregation works the natural HLL way: register-wise max on
 * merge, so the shuffle carries one 2^p-byte sketch per partition per
 * group — constant-size state regardless of input cardinality, which is
 * the whole point at 100 TB.
 */
case class HllSketch(
    child: Expression,
    p: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  private val m = 1 << p

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  private def hash(v: Any): Long = v match {
    case s: UTF8String => HashKernels.stringHash64(s)
    case l: Long => Mix64.mix(l)
    case i: Int => Mix64.mix(i.toLong)
    case d: Double => Mix64.mix(java.lang.Double.doubleToLongBits(d))
    case other => Mix64.mix(other.hashCode.toLong)
  }

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = hash(v)
      val idx = (h >>> (64 - p)).toInt
      val rest = h << p
      val rank = (java.lang.Long.numberOfLeadingZeros(rest | 1L) + 1).min(64 - p)
      if (rank > buf(idx)) buf(idx) = rank.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += math.pow(2.0, -buf(i).toDouble)
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    var e = alpha * m * m / sum
    if (e <= 2.5 * m && zeros > 0) e = m * math.log(m.toDouble / zeros)
    math.round(e)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(offset: Int): HllSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HllSketch =
    copy(child = c.head)
  override def prettyName: String = "hll_distinct"
}

/**
 * Static kernels for HLL sketches carried AS DATA (binary columns) — the
 * HyperBall substrate ([[graft.operators.Graph.neighborhoodFunction]]):
 * unlike [[HllSketch]] (values in → ONE estimate out), iterative ball
 * growth needs sketches as first-class rows that initialize map-only,
 * merge under an aggregate, and estimate map-only.
 *
 * The estimate deliberately departs from [[HllSketch.eval]]'s floating
 * fold: Σ 2^(−reg) accumulates EXACTLY as the integer Σ 2^(rmax−reg)
 * (one BigInt per sketch, converted to double once), because m
 * power-of-two double terms spanning 58 binary orders round
 * order-dependently — and the oracle replays this estimate bit-for-bit,
 * so summation order must not exist.
 */
object HllOps {

  /** Sketch of a single long value — registers for one Mix64 hash. */
  def init(value: Long, p: Int): Array[Byte] = {
    val buf = new Array[Byte](1 << p)
    val h = Mix64.mix(value)
    val idx = (h >>> (64 - p)).toInt
    val rest = h << p
    val rank = (java.lang.Long.numberOfLeadingZeros(rest | 1L) + 1).min(64 - p)
    buf(idx) = rank.toByte
    buf
  }

  /** Register-wise max into `a` (mutating). Lengths must agree. */
  def mergeInto(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == b.length,
      s"sketch size mismatch: ${a.length} vs ${b.length} registers " +
        "(mixed p parameters)")
    var i = 0
    while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  /** Bias-corrected estimate with linear-counting small-range fix —
    * the [[HllSketch]] formula with the integer-exact register fold
    * (see the object doc) and the small-range `ln` under the shared
    * libm convention. Returns `round(e)` as a long.
    */
  def estimate(buf: Array[Byte], p: Int): Long = {
    val m = 1 << p
    require(buf.length == m,
      s"sketch has ${buf.length} registers, expected $m (p=$p)")
    val rmax = 64 - p
    var s = BigInt(0)
    var present = 0
    var i = 0
    while (i < m) {
      if (buf(i) > 0) { s += BigInt(1) << (rmax - buf(i)); present += 1 }
      i += 1
    }
    s += BigInt(m - present) << rmax
    val zeros = m - present
    val sumd = s.doubleValue / math.pow(2.0, rmax)
    val raw = 0.7213 / (1.0 + 1.079 / m) * m * m / sumd
    val e =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    math.round(e)
  }
}

/** Map-only single-value sketch constructor (BinaryType out). */
case class HllInitLong(child: Expression, p: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(p >= 4 && p <= 16, s"hll precision must lie in [4, 16], got $p")
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(v: Any): Any =
    HllOps.init(v.asInstanceOf[Long], p)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HllOps.init($c, $p)")
  override protected def withNewChildInternal(c: Expression): HllInitLong =
    copy(child = c)
  override def prettyName: String = "hll_init"
}

/** Map-only estimate of a sketch column (LongType out). */
case class HllCardinality(child: Expression, p: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(p >= 4 && p <= 16, s"hll precision must lie in [4, 16], got $p")
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    HllOps.estimate(v.asInstanceOf[Array[Byte]], p)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HllOps.estimate($c, $p)")
  override protected def withNewChildInternal(c: Expression): HllCardinality =
    copy(child = c)
  override def prettyName: String = "hll_card"
}

/** Register-wise-max MERGE of sketch columns — constant 2^p-byte state
  * per group however many sketches fold in, partial-merged map-side
  * (the [[HllSketch]] property, lifted to sketch-as-data inputs).
  */
case class HllMergeSketch(
    child: Expression,
    p: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 16, s"hll precision must lie in [4, 16], got $p")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](1 << p)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) HllOps.mergeInto(buf, v.asInstanceOf[Array[Byte]]) else buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    HllOps.mergeInto(a, b)

  override def eval(buf: Array[Byte]): Any = buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(offset: Int): HllMergeSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllMergeSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HllMergeSketch =
    copy(child = c.head)
  override def prettyName: String = "hll_merge"
}
