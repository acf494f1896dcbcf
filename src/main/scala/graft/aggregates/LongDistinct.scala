package graft.aggregates

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/**
 * Open-addressing set of primitive longs — the buffer behind
 * [[CountDistinctLong]]. Linear probing over a power-of-2 table, zero
 * tracked out-of-band so the empty-slot sentinel stays 0L; grows at 50%
 * load. No boxing anywhere: insert is a finalizer hash + probe over a
 * long[], vs collect_set's per-row java.lang.Long allocation + generic
 * HashSet node.
 */
final class LongSet(initialCapacity: Int = 1 << 10) {
  private var cap = Integer.highestOneBit(math.max(initialCapacity, 8) * 2 - 1)
  private var data = new Array[Long](cap)
  private var used = 0
  private var hasZero = false

  // 64-bit finalizer (splitmix64) — uniform for sequential keys.
  @inline private def hash(v: Long): Int = {
    var x = v + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    ((x ^ (x >>> 31)) & (cap - 1)).toInt
  }

  def add(v: Long): Unit = {
    if (v == 0L) { hasZero = true; return }
    var i = hash(v)
    while (data(i) != 0L) {
      if (data(i) == v) return
      i = (i + 1) & (cap - 1)
    }
    data(i) = v
    used += 1
    if (used * 2 > cap) grow()
  }

  private def grow(): Unit = {
    val old = data
    cap <<= 1
    data = new Array[Long](cap)
    used = 0
    var i = 0
    while (i < old.length) {
      if (old(i) != 0L) add(old(i))
      i += 1
    }
  }

  def size: Long = used.toLong + (if (hasZero) 1 else 0)

  /** Visits every element exactly once (zero last, if present). */
  def foreach(f: Long => Unit): Unit = {
    var i = 0
    while (i < cap) {
      if (data(i) != 0L) f(data(i))
      i += 1
    }
    if (hasZero) f(0L)
  }
}

/**
 * Exact COUNT(DISTINCT x) for integral columns as a single ObjectHashAgg —
 * `count_distinct_long(x)`.
 *
 * Why not Spark's COUNT(DISTINCT …): with 2+ distinct aggregates in one
 * GROUP BY, Catalyst plans through Expand — every input row is replicated
 * once per distinct column before the partial aggregate, so a 3-aggregate
 * query hashes 3N wide rows. And why not collect_set+size: same plan shape
 * as this aggregate, but each row pays a boxed-Long set insert and each
 * group materializes its full distinct set as an ArrayData in the result
 * row before size() reads it. Here the buffer is a primitive open-addressing
 * [[LongSet]]; partials ship each task's distinct keys once (raw 8-byte
 * longs), merges are set unions, eval is the set size.
 *
 * Scale bound: per-(task, group) memory is the distinct-key count — the
 * same bound collect_set/Expand-distinct carry; this is the exact-distinct
 * floor. Use approx_count_distinct (HLL) when cardinality itself explodes.
 * NULLs are ignored, matching COUNT(DISTINCT x).
 */
case class CountDistinctLong(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongSet] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType | DateType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integral column, got $other")
  }

  private lazy val toLong: Any => Long = child.dataType match {
    case LongType => v => v.asInstanceOf[Long]
    case IntegerType | DateType => v => v.asInstanceOf[Int].toLong
    case ShortType => v => v.asInstanceOf[Short].toLong
    case ByteType => v => v.asInstanceOf[Byte].toLong
  }

  override def prettyName: String = "count_distinct_long"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): LongSet = new LongSet()

  override def update(buf: LongSet, input: InternalRow): LongSet = {
    val v = child.eval(input)
    if (v != null) buf.add(toLong(v))
    buf
  }

  override def merge(buf: LongSet, other: LongSet): LongSet = {
    other.foreach(buf.add)
    buf
  }

  override def eval(buf: LongSet): Any = buf.size

  override def serialize(buf: LongSet): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.size)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): LongSet = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readLong()
    val buf = new LongSet(math.min(n, 1L << 24).toInt)
    var i = 0L
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountDistinctLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountDistinctLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): CountDistinctLong =
    copy(child = c)
}
