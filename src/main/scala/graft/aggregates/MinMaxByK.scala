package graft.aggregates

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/**
 * Bounded top-k buffer: keeps the k best (order, value) pairs seen so far.
 * `keepSmallest=true` keeps the k smallest orders (min_by); the internal
 * heap is ordered worst-first so the root is evicted on overflow.
 *
 * Equal order keys tie-break on the VALUE (when its type is orderable), so
 * results are deterministic under partitioning/merge order — an oracle can
 * reproduce them with `ORDER BY o, v` (ADVICE r1: heap-insertion-order ties
 * were nondeterministic).
 */
final class TopKBuffer(val k: Int, val keepSmallest: Boolean,
    ord: Ordering[Any], valueOrd: Option[Ordering[Any]]) {

  private val pairOrd: Ordering[(Any, Any)] = new Ordering[(Any, Any)] {
    override def compare(a: (Any, Any), b: (Any, Any)): Int = {
      val c = ord.compare(a._1, b._1)
      if (c != 0) c else valueOrd.map(_.compare(a._2, b._2)).getOrElse(0)
    }
  }
  // worst-first: for min_by the LARGEST kept pair sits at the root.
  private val heapOrd = if (keepSmallest) pairOrd.reverse else pairOrd
  val heap = new java.util.PriorityQueue[(Any, Any)](
    math.max(1, math.min(k, 1024)),
    (a: (Any, Any), b: (Any, Any)) => heapOrd.compare(a, b))

  def insert(o: Any, v: Any): Unit = {
    val pair = (o, v)
    if (heap.size() < k) {
      heap.add(pair)
    } else {
      val worst = heap.peek()
      val better = if (keepSmallest) pairOrd.lt(pair, worst) else pairOrd.gt(pair, worst)
      if (better) { heap.poll(); heap.add(pair) }
    }
  }

  def mergeFrom(other: TopKBuffer): Unit = {
    val it = other.heap.iterator()
    while (it.hasNext) { val p = it.next(); insert(p._1, p._2) }
  }

  /** Would a pair with this order be rejected regardless of its value?
    * True iff the heap is full and the order alone loses STRICTLY to the
    * worst kept pair's order — an order-tie falls to the value tiebreak,
    * so ties return false. Callers use this to skip evaluating/copying
    * the VALUE expression for rows that cannot enter the heap: in the
    * brute-force vss macros the value is a struct carrying the full
    * right-side row (embedding included), and at sf10 ~99.9% of candidate
    * pairs lose on the score alone — materializing their structs was the
    * macro family's dominant cost (round 10). */
  def rejectsByOrder(o: Any): Boolean = {
    if (heap.size() < k) return false
    val c = ord.compare(o, heap.peek()._1)
    if (keepSmallest) c > 0 else c < 0
  }

  /** Values best-first: ascending order for min_by, descending for max_by. */
  def sortedValues: Array[Any] = {
    val arr = heap.toArray.map(_.asInstanceOf[(Any, Any)])
    val sorted = arr.sorted(if (keepSmallest) pairOrd else pairOrd.reverse)
    sorted.map(_._2)
  }
}

/**
 * k-argument `min_by(value, order, k)` / `max_by(value, order, k)` aggregate
 * returning a LIST of the values for the k smallest/largest orders, best
 * first — DuckDB-core semantics the reference depends on for its top-k
 * rewrite and macros (/root/reference/src/hnsw/hnsw_optimize_topk.cpp:83-94,
 * hnsw_index_macros.cpp:24-27). Spark's built-in min_by/max_by lack the k
 * argument (SURVEY §2 O10).
 *
 * Rows with a NULL order or NULL value are ignored (arg_min semantics).
 * Implemented as a bounded heap, so partial (map-side) aggregation ships at
 * most k pairs per group per partition — the property that makes
 * top-k-per-group scale without a full sort shuffle.
 */
case class MinMaxByK(
    first: Expression,   // value
    second: Expression,  // order
    third: Expression,   // k (foldable)
    keepSmallest: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with TernaryLike[Expression] {

  private lazy val k: Int = third.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case s: Short => s.toInt
    case b: Byte => b.toInt
    case other => throw new IllegalArgumentException(
      s"${prettyName} k must be a constant integer, got $other")
  }

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(second.dataType)

  @transient private lazy val valueOrdering: Option[Ordering[Any]] =
    if (RowOrdering.isOrderable(first.dataType))
      Some(TypeUtils.getInterpretedOrdering(first.dataType))
    else None

  @transient private lazy val pairProjection =
    UnsafeProjection.create(Array(second.dataType, first.dataType))

  override def checkInputDataTypes() = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (!RowOrdering.isOrderable(second.dataType)) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"${prettyName} does not support ordering on ${second.dataType}")
    } else if (!third.foldable) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"${prettyName} k must be a constant")
    } else if (k <= 0) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"${prettyName} k must be positive, got $k")
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    }
  }

  override def prettyName: String = if (keepSmallest) "min_by" else "max_by"
  override def dataType: DataType = ArrayType(first.dataType, containsNull = first.nullable)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKBuffer =
    new TopKBuffer(k, keepSmallest, ordering, valueOrdering)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val o = second.eval(input)
    // Order-first rejection: when the order alone cannot beat the worst
    // kept pair, the value expression is never evaluated or copied (see
    // TopKBuffer.rejectsByOrder). Semantics unchanged — such a row could
    // never enter the heap; NULL-value rows are still ignored as before.
    if (o != null && !buf.rejectsByOrder(o)) {
      val v = first.eval(input)
      if (v != null) {
        buf.insert(InternalRow.copyValue(o), InternalRow.copyValue(v))
      }
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKBuffer): Any = new GenericArrayData(buf.sortedValues)

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.heap.size())
    val it = buf.heap.iterator()
    while (it.hasNext) {
      val (o, v) = it.next()
      val row = pairProjection(InternalRow(o, v))
      out.writeInt(row.getSizeInBytes)
      out.write(row.getBytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    val row = new UnsafeRow(2)
    while (i < n) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      row.pointTo(arr, len)
      val o = InternalRow.copyValue(row.get(0, second.dataType))
      val v = InternalRow.copyValue(row.get(1, first.dataType))
      buf.insert(o, v)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinMaxByK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinMaxByK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): MinMaxByK =
    copy(first = f, second = s, third = t)
}
