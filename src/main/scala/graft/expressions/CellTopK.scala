package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `graft_cell_topk(srcs, members, k, byLabel)` — the per-cell exact
  * top-k kernel of the grouped-row ANN tail
  * ([[graft.operators.Similarity.knnTopKFromCells]] /
  * `hardNegTopKFromCells`), natively evaluated.
  *
  * The declarative form — nested `transform`/`filter`/`array_sort`
  * higher-order functions over the collected member array — evaluates
  * every lambda interpretively: per candidate pair it pays closure
  * dispatch, a boxed struct allocation, and an interpreted comparator,
  * on top of the `graft_dot` eval call. That interpretation overhead
  * IS the measured cost of the trained-ANN family at bench scale
  * (occupancy² pairs per cell). This expression runs the identical
  * computation — exact integer dot, `-(dot / (√n2s·√n2m))` in the same
  * IEEE order, insertion top-k ordered by (ncos, id) — as one tight
  * JVM loop per cell row. Output is bit-identical to the HOF form
  * (same doubles, same sort, same slice), so the shared downstream
  * merge (`array_distinct` ∘ `array_sort` ∘ `flatten`) and every
  * oracle are unaffected; operators fall back to the HOF form when the
  * extension is not installed.
  *
  * Modes (the two grouped-row tails):
  *  - `byLabel = false`: members are `struct(vec_id, v, n2)`;
  *    candidates for `src` are members with a DIFFERENT vec_id; output
  *    element `struct(src, t: array<struct(ncos, nn_id)>)`.
  *  - `byLabel = true`: members are `struct(vec_id, label, v, n2)`;
  *    candidates are members with a DIFFERENT label; output element
  *    `struct(src, la, t: array<struct(ncos, neg_id, neg_label)>)`.
  *
  * Evaluated once per (small) cell row — CodegenFallback costs one
  * virtual call per cell, not per pair.
  */
case class CellTopK(
    srcs: Expression, members: Expression, k: Int, byLabel: Boolean)
  extends Expression with CodegenFallback with BinaryLike[Expression] {

  require(k > 0, s"graft_cell_topk needs k > 0, got $k")

  override def left: Expression = srcs
  override def right: Expression = members
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CellTopK =
    copy(srcs = newLeft, members = newRight)

  override def prettyName: String = "graft_cell_topk"
  override def nullable: Boolean = false
  override def foldable: Boolean = false

  private def memberFields: Int = if (byLabel) 4 else 3

  override def checkInputDataTypes(): TypeCheckResult = {
    // structural match ignoring nullability flags (asNullable is
    // private[spark])
    def same(a: DataType, b: DataType): Boolean = (a, b) match {
      case (ArrayType(x, _), ArrayType(y, _)) => same(x, y)
      case (x, y) => x == y
    }
    def ok(t: DataType): Boolean = t match {
      case ArrayType(StructType(fs), _) if fs.length == memberFields =>
        if (byLabel)
          same(fs(0).dataType, LongType) &&
            (fs(1).dataType match { // any scalar label type
              case _: ArrayType | _: StructType | _: MapType => false
              case _ => true
            }) &&
            same(fs(2).dataType, ArrayType(LongType, false)) &&
            same(fs(3).dataType, LongType)
        else
          same(fs(0).dataType, LongType) &&
            same(fs(1).dataType, ArrayType(LongType, false)) &&
            same(fs(2).dataType, LongType)
      case _ => false
    }
    if (ok(srcs.dataType) && ok(members.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName(byLabel=$byLabel) requires two " +
        s"array<struct[$memberFields]> inputs, got " +
        s"(${srcs.dataType.simpleString}, ${members.dataType.simpleString})")
  }

  /** Label type is whatever the member struct carries (string in the
    * text kernels, int in the embeddings table) — derived post-
    * resolution. */
  private lazy val labelType: DataType =
    members.dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType].fields(1).dataType

  private lazy val pairType: StructType =
    if (byLabel) StructType(Seq(
      StructField("ncos", DoubleType, nullable = false),
      StructField("neg_id", LongType, nullable = false),
      StructField("neg_label", labelType, nullable = true)))
    else StructType(Seq(
      StructField("ncos", DoubleType, nullable = false),
      StructField("nn_id", LongType, nullable = false)))

  override def dataType: DataType = {
    val fields =
      if (byLabel) Seq(
        StructField("src", LongType, nullable = false),
        StructField("la", labelType, nullable = true),
        StructField("t", ArrayType(pairType, containsNull = false),
          nullable = false))
      else Seq(
        StructField("src", LongType, nullable = false),
        StructField("t", ArrayType(pairType, containsNull = false),
          nullable = false))
    ArrayType(StructType(fields), containsNull = false)
  }

  override def eval(input: InternalRow): Any = {
    val srcAd = srcs.eval(input).asInstanceOf[ArrayData]
    val memAd = members.eval(input).asInstanceOf[ArrayData]
    val nM = memAd.numElements()
    // decode members once: ids, labels, vectors, √n2
    val ids = new Array[Long](nM)
    val labels = if (byLabel) new Array[Any](nM) else null
    val vecs = new Array[Array[Long]](nM)
    val roots = new Array[Double](nM)
    var i = 0
    while (i < nM) {
      val r = memAd.getStruct(i, memberFields)
      ids(i) = r.getLong(0)
      if (byLabel) {
        labels(i) = InternalRow.copyValue(r.get(1, labelType))
        vecs(i) = r.getArray(2).toLongArray()
        roots(i) = math.sqrt(r.getLong(3).toDouble)
      } else {
        vecs(i) = r.getArray(1).toLongArray()
        roots(i) = math.sqrt(r.getLong(2).toDouble)
      }
      i += 1
    }
    val nS = srcAd.numElements()
    val out = new Array[Any](nS)
    var s = 0
    while (s < nS) {
      val sr = srcAd.getStruct(s, memberFields)
      val sid = sr.getLong(0)
      val sLabel =
        if (byLabel) InternalRow.copyValue(sr.get(1, labelType))
        else null
      val sv = if (byLabel) sr.getArray(2).toLongArray()
        else sr.getArray(1).toLongArray()
      val sRoot = if (byLabel) math.sqrt(sr.getLong(3).toDouble)
        else math.sqrt(sr.getLong(2).toDouble)
      // bounded insertion top-k ordered ascending by (ncos, id) — the
      // exact order slice(array_sort(...), 1, k) produced
      val topN = new Array[Double](k)
      val topI = new Array[Int](k)
      var sz = 0
      var m = 0
      while (m < nM) {
        val excluded =
          if (byLabel) {
            // Catalyst's `=!=` over the label is null-safe FALSE when
            // either side is null (the filter keeps only true) — a
            // null label therefore excludes the candidate, matching
            // the HOF form exactly
            val ml = labels(m)
            sLabel == null || ml == null || sLabel.equals(ml)
          } else ids(m) == sid
        if (!excluded) {
          val mv = vecs(m)
          val n = math.min(sv.length, mv.length)
          var d = 0L
          var j = 0
          while (j < n) { d += sv(j) * mv(j); j += 1 }
          val ncos = -(d.toDouble / (sRoot * roots(m)))
          val mid = ids(m)
          // compare against current worst (last slot)
          val fits =
            if (sz < k) true
            else {
              val c = java.lang.Double.compare(ncos, topN(sz - 1))
              c < 0 || (c == 0 && mid < ids(topI(sz - 1)))
            }
          if (fits) {
            // find insertion point (k ≤ 5: linear scan)
            var p = if (sz < k) sz else k - 1
            while (p > 0 && {
              val c = java.lang.Double.compare(ncos, topN(p - 1))
              c < 0 || (c == 0 && mid < ids(topI(p - 1)))
            }) {
              topN(p) = topN(p - 1); topI(p) = topI(p - 1); p -= 1
            }
            topN(p) = ncos; topI(p) = m
            if (sz < k) sz += 1
          }
        }
        m += 1
      }
      val pairs = new Array[Any](sz)
      var t = 0
      while (t < sz) {
        pairs(t) =
          if (byLabel)
            new GenericInternalRow(Array[Any](
              topN(t), ids(topI(t)), labels(topI(t))))
          else
            new GenericInternalRow(Array[Any](topN(t), ids(topI(t))))
        t += 1
      }
      out(s) =
        if (byLabel)
          new GenericInternalRow(Array[Any](
            sid, sLabel, new GenericArrayData(pairs)))
        else
          new GenericInternalRow(Array[Any](
            sid, new GenericArrayData(pairs)))
      s += 1
    }
    new GenericArrayData(out)
  }
}
