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
