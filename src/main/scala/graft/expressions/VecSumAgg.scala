package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `graft_vecsum(v)` — element-wise integer-vector SUM aggregate over
  * `array<bigint>` columns: the centroid-update kernel of the Lloyd
  * refinements ([[graft.operators.Similarity.ivfUpdate]],
  * [[graft.operators.Imi.lloydStep]]).
  *
  * Why an aggregate and not posexplode→SUM→re-collect: the explode
  * form multiplies the update stream by the dimension count (64× at
  * the registered geometry) and pays TWO exchanges — (cell, dim)
  * partial sums, then the ordered re-collect per cell — where the
  * element-wise aggregate ships ONE dims-long buffer per (mapper,
  * group) across ONE exchange with full partial (map-side)
  * aggregation. Same integers, same order: vector addition is
  * element-wise long addition, commutative and associative, so the
  * result is bit-identical to the per-dim SUMs at any merge order.
  *
  * Null rows are skipped (SUM semantics); an empty group yields NULL.
  * Mismatched lengths within a group throw — a silent truncation
  * would corrupt a centroid. Buffer is a bare Array[Long] (O(dims)).
  */
case class VecSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_vecsum needs array<bigint>, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  // null sentinel: no non-null row seen yet (length-0 vectors are a
  // valid, distinct state — an empty array sums to an empty array)
  override def createAggregationBuffer(): Array[Long] = null

  private def addInto(buf: Array[Long], v: ArrayData): Array[Long] = {
    val n = v.numElements()
    if (buf == null) {
      val fresh = new Array[Long](n)
      var i = 0
      while (i < n) { fresh(i) = v.getLong(i); i += 1 }
      fresh
    } else {
      require(buf.length == n,
        s"graft_vecsum: vector length $n != accumulated ${buf.length}")
      var i = 0
      while (i < n) { buf(i) += v.getLong(i); i += 1 }
      buf
    }
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf else addInto(buf, v.asInstanceOf[ArrayData])
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] =
    if (other == null) buf
    else if (buf == null) other
    else {
      require(buf.length == other.length,
        s"graft_vecsum: merging length ${other.length} into ${buf.length}")
      var i = 0
      while (i < buf.length) { buf(i) += other(i); i += 1 }
      buf
    }

  override def eval(buf: Array[Long]): Any =
    if (buf == null) null else new GenericArrayData(buf)

  // one header byte distinguishes "no row seen" (null buffer) from a
  // legitimate LENGTH-0 vector sum — both would otherwise serialize to
  // zero bytes
  override def serialize(buf: Array[Long]): Array[Byte] =
    if (buf == null) Array.emptyByteArray
    else {
      val bb = java.nio.ByteBuffer.allocate(1 + buf.length * 8)
      bb.put(1: Byte)
      buf.foreach(bb.putLong)
      bb.array()
    }

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    if (bytes.isEmpty) null
    else {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      bb.get() // header
      val out = new Array[Long]((bytes.length - 1) / 8)
      var i = 0
      while (i < out.length) { out(i) = bb.getLong(); i += 1 }
      out
    }

  override def withNewMutableAggBufferOffset(o: Int): VecSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): VecSumAgg =
    copy(child = newChild)
  override def prettyName: String = "graft_vecsum"
}
