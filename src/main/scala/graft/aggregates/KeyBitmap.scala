package graft.aggregates

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Static kernels for [[SparseKeyBitmapAgg]]/[[BitmapContains]] (Scala object
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
      (bm((idx >>> 3).toInt) & (1 << (idx & 7).toInt)) != 0
  }
}

/**
 * `bitmap_contains(key)` over a DRIVER-HELD bitmap — true iff `key`'s bit
 * is set in a bitmap built over the same `containers` (the dense view
 * of a merged [[SparseBitmap]]).
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
