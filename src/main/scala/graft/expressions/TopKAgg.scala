package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType}

/** `graft_topk(e, k)` — bounded-heap top-k aggregate: returns the `k`
  * LARGEST values of any orderable expression (structs order
  * lexicographically, so `graft_topk(struct(score, tie), k)` is a
  * deterministic per-group top-k when (score, tie) is a total key),
  * sorted descending.
  *
  * Why an aggregate and not a window: ROW_NUMBER's per-group top-k
  * sorts EVERY group member after a full shuffle, and the
  * `sort_array(collect_list(..))` idiom this engine uses where windows
  * are too expensive still buffers the whole group per partition
  * before truncating. A TypedImperativeAggregate participates in
  * PARTIAL aggregation: each mapper keeps a k-bounded min-heap per
  * group and the shuffle carries at most k rows per (mapper, group) —
  * memory O(k), shuffle O(k·mappers) per group, no Window operator in
  * the plan at all. This is the aggregation-tier sibling of the
  * hierarchical top-k the kNN graph builds by hand, packaged as a
  * reusable function (the fourth Catalyst extension tier: scalar
  * Expression → optimizer Rule → planner Strategy/SparkPlan →
  * imperative AGGREGATE).
  *
  * Null inputs are skipped (collect_list semantics); fewer than k
  * survivors return a shorter array; an empty group returns an empty
  * array. Serialization rides the same single-column UnsafeProjection
  * device Spark's own Collect aggregates use.
  */
case class TopKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[Any]]
  with UnaryLike[Expression] {

  require(k > 0, s"graft_topk needs k > 0, got $k")

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(child.dataType, "graft_topk")

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false

  // min-heap of the current top-k: head is the SMALLEST retained value
  override def createAggregationBuffer(): mutable.PriorityQueue[Any] =
    mutable.PriorityQueue.empty[Any](ordering.reverse)

  private def offer(buf: mutable.PriorityQueue[Any], v: Any): Unit =
    if (v != null) {
      if (buf.size < k) buf.enqueue(InternalRow.copyValue(v))
      else if (ordering.gt(v, buf.head)) {
        buf.dequeue()
        buf.enqueue(InternalRow.copyValue(v))
      }
    }

  override def update(buf: mutable.PriorityQueue[Any], input: InternalRow)
      : mutable.PriorityQueue[Any] = {
    offer(buf, child.eval(input))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[Any],
      other: mutable.PriorityQueue[Any]): mutable.PriorityQueue[Any] = {
    // values in `other` were copied on entry; no re-copy needed, but
    // offer() copies defensively — correctness over a micro-alloc
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[Any]): Any =
    new GenericArrayData(buf.toArray.sorted(ordering.reverse))

  private lazy val serProj =
    UnsafeProjection.create(Array[DataType](dataType))

  override def serialize(buf: mutable.PriorityQueue[Any]): Array[Byte] =
    serProj(InternalRow(new GenericArrayData(buf.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Any] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val buf = createAggregationBuffer()
    row.getArray(0).foreach(child.dataType, (_, v) => offer(buf, v))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKAgg =
    copy(child = newChild)
  override def prettyName: String = "graft_topk"
}
