package graft.aggregates

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/**
 * Exact key-presence bitmap over a CONTAINERED integral domain — the
 * build side of [[graft.ops.SemiJoins]]' bitmap semi/anti join.
 *
 * The domain is the union of 64Ki-key containers (key >> 16 ∈
 * `containers`, a sorted driver-collected list of the KEPT side's
 * occupied high-bits — the roaring-bitmap layout specialized to a fixed
 * container size). Key → bit: binary-search the container rank r, bit =
 * r·2¹⁶ + (key & 0xFFFF). This covers dense surrogate keys (one
 * container run) AND block-allocated / sharded id spaces — e.g. the
 * derived test fixtures, whose replicas spread 1.5M customer keys over a
 * 9.9e9 span that a flat bitmap cannot hold, but only 121 containers
 * (~970 KB of bitmap) actually contain keys.
 *
 * Keys whose container is absent are skipped by design: the container
 * list comes from the OTHER side of the semi join, so such keys could
 * never match. NULL keys are skipped, matching EXISTS semantics. The
 * per-task partial is containers × 8 KiB regardless of row count; merges
 * are word-wise ORs.
 */
case class KeyBitmapAgg(
    child: Expression,
    containers: IndexedSeq[Long],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(containers.nonEmpty, "containers must be non-empty")

  @transient private lazy val containerArr: Array[Long] = containers.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a LONG key column (cast upstream), got $other")
  }

  override def prettyName: String = "key_bitmap"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  private def nWords: Int = (containers.length << 16) >>> 6

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nWords)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val idx = BitmapKernel.index(containerArr, v.asInstanceOf[Long])
      if (idx >= 0) buf((idx >>> 6).toInt) |= 1L << (idx & 63)
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  /** Bit i lands in byte i>>3 at mask 1<<(i&7) — the layout
    * [[BitmapContains]] tests. */
  override def eval(buf: Array[Long]): Any = {
    val bytes = new Array[Byte](buf.length * 8)
    var i = 0
    while (i < bytes.length) {
      bytes(i) = ((buf(i >>> 3) >>> ((i & 7) << 3)) & 0xFFL).toByte
      i += 1
    }
    bytes
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bytes = new Array[Byte](buf.length * 8)
    java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asLongBuffer().put(buf)
    bytes
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asLongBuffer().get(buf)
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): KeyBitmapAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KeyBitmapAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): KeyBitmapAgg =
    copy(child = newChild)
}

/** Static kernels for [[KeyBitmapAgg]]/[[BitmapContains]] (Scala object
  * methods get static forwarders, same device as `VectorMath`). */
object BitmapKernel {
  /** Global bit index of `key`, or −1 if its container is absent.
    * Arithmetic >> keeps negative keys consistent on both sides. */
  def index(containers: Array[Long], key: Long): Long = {
    val c = java.util.Arrays.binarySearch(containers, key >> 16)
    if (c < 0) -1L else (c.toLong << 16) | (key & 0xFFFFL)
  }

  def contains(bm: Array[Byte], key: Long, containers: Array[Long]): Boolean = {
    val idx = index(containers, key)
    idx >= 0 && idx < bm.length.toLong * 8 &&
      (bm((idx >>> 3).toInt) & (1 << (idx & 7))) != 0
  }
}

/**
 * `bitmap_contains(key)` over a DRIVER-HELD bitmap — true iff `key`'s bit
 * is set in a [[KeyBitmapAgg]] bitmap built over the same `containers`.
 * The bitmap rides the expression itself (a codegen reference object in
 * the broadcast task binary), NOT a column: the first cut joined the
 * one-row aggregate in and read the BINARY column per probe row, and
 * UnsafeRow.getBinary COPIES the field — ~1 MB × 1.5M rows ≈ 1.4 TB of
 * memcpy, a 20 s filter stage for what is one binary search (≤ 12
 * compares at the container cap) + byte test per row once the bytes are
 * referenced directly. Standard null propagation (null in → null out);
 * [[graft.ops.SemiJoins]] wraps it in `coalesce(…, false)` so a NULL key
 * behaves exactly like EXISTS / NOT EXISTS (absent on the semi path,
 * kept on the anti path).
 */
case class BitmapContains(child: Expression, bitmap: Array[Byte],
    containers: IndexedSeq[Long])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with ExpectsInputTypes {

  @transient private lazy val containerArr: Array[Long] = containers.toArray

  override def inputTypes = Seq(LongType)
  override def prettyName: String = "bitmap_contains"
  override def dataType: DataType = BooleanType

  override def nullSafeEval(k: Any): Any =
    BitmapKernel.contains(bitmap, k.asInstanceOf[Long], containerArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bm = ctx.addReferenceObj("sjBitmap", bitmap, "byte[]")
    val arr = ctx.addReferenceObj("sjContainers", containerArr, "long[]")
    defineCodeGen(ctx, ev,
      k => s"graft.aggregates.BitmapKernel.contains($bm, $k, $arr)")
  }

  override protected def withNewChildInternal(newChild: Expression): BitmapContains =
    copy(child = newChild)
}
