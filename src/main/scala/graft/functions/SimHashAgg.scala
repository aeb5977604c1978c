package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, LongType}

/** 64-bit SimHash as a native Catalyst aggregate.
  *
  * Input rows are (wordHash: long, weight: long); the buffer is the
  * classic 64-cell counter array (+weight when the hash bit is 1,
  * -weight when 0); eval packs the sign bits into one long.
  *
  * Why an aggregate and not an explode: the expression-only encoding
  * needs 64 rows per word (posexplode over bit positions) and a wide
  * shuffle; this aggregate is a single map-side pass with a 512-byte
  * buffer and partial merge — the combiner pattern the reference's
  * MapReduce jobs relied on, except typed and codegen-scheduled.
  */
case class SimHashAgg(
    hashChild: Expression,
    weightChild: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(hashChild, weightChild)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val h = hashChild.eval(input)
    val w = weightChild.eval(input)
    if (h != null && w != null) {
      val hash = h.asInstanceOf[Long]
      val weight = w.asInstanceOf[Long]
      var i = 0
      while (i < 64) {
        if (((hash >>> i) & 1L) == 1L) buf(i) += weight else buf(i) -= weight
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    var sig = 0L
    var i = 0
    while (i < 64) { if (buf(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hashChild = newChildren(0), weightChild = newChildren(1))
}

object SimHashAgg {
  /** simhash64(wordHash, weight) aggregate Column. */
  def simhash(hash: Column, weight: Column): Column =
    Shim.toColumn(
      SimHashAgg(Shim.toExpression(hash), Shim.toExpression(weight))
        .toAggregateExpression())
}
