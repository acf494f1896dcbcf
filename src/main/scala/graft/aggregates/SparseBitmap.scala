package graft.aggregates

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/**
 * Self-discovering containered key bitmap — the one-pass successor of the
 * KeyBitmapAgg device (r11, since removed), which needed a SEPARATE driver job to
 * discover the occupied 64Ki-key containers before the bitmap job could
 * run. Here containers materialize lazily as keys arrive: the buffer is a
 * sorted array of container highs (key >> 16) with one 8 KiB bit block
 * each, plus an exact stray [[LongSet]] for keys that arrive after the
 * per-task container cap is hit. Both shapes are exact, so the aggregate
 * is correct on EVERY key distribution:
 *
 *  - container-compact domains (dense surrogate keys, block-allocated /
 *    sharded id spaces — the fixtures' replicas spread keys over a 1e10
 *    span but only ~10² containers hold any) cost containers × 8 KiB per
 *    task regardless of row count;
 *  - scattered domains degrade GRACEFULLY: past the cap, keys land in the
 *    open-addressing stray set at ~16 B per distinct key — the same
 *    asymptotic bound as [[CountDistinctLong]], never worse than the set
 *    path it replaces.
 *
 * Inserts exploit arrival locality: consecutive rows usually share a
 * container, so a one-entry (hi → block) cache short-circuits the binary
 * search. Merges OR blocks pairwise and re-add strays (a stray in one
 * partial may be a set bit in another — [[distinctCount]] skips such
 * double-covered strays, so the count stays exact).
 *
 * Memory bound (stray-tolerant mode): a block is only KEPT when its
 * popcount ≥ 512 — the break-even where 8 KiB of bitmap beats ~16 B/key
 * of stray storage. [[demoteSparse]] converts below-break-even blocks to
 * point strays (a) once at the update path's first cap-hit — and when
 * that pass frees most of the cap, the stream is scattered and new
 * containers stray DIRECTLY from then on, so cap × 8 KiB is a one-time
 * transient, not the steady state — (b) after any merge that lands past
 * the cap, and (c) before a partial is serialized. Dense blocks never
 * expand, and a buffer (task partial, wire partial, or reducer merge of
 * T tasks' disjoint container sets) never exceeds
 * max(cap × 8 KiB, denseContainers × 8 KiB) + strays × ~16 B — i.e. at
 * most the cap allowance over the set path it replaces, on EVERY key
 * distribution. (The r12 revision accepted merged blocks unconditionally,
 * which on scattered domains let a reducer grow to T × cap × 8 KiB and a
 * scattered task partial sit at cap × 8 KiB for 4096 keys.)
 */
final class SparseBitmap(maxContainers: Int) {
  private[aggregates] var n = 0
  private[aggregates] var his = new Array[Long](math.min(math.max(maxContainers, 4), 16))
  private[aggregates] var blocks = new Array[Array[Long]](his.length)
  private[aggregates] val strays = new LongSet()
  /** Set in overflow-intolerant mode (strayCap = 0, the semi-join build):
    * any key past the cap poisons the buffer instead of going stray. */
  private[aggregates] var overflowed = false

  private var lastHi = Long.MinValue
  private var lastBlock: Array[Long] = null
  /** Update-path scatter detection: when the FIRST cap-hit demote frees
    * most of the blocks, the task's key stream is scattered — stop
    * allocating blocks for new containers (existing dense blocks still
    * absorb bits) and stray directly, so the cap × 8 KiB allocation is a
    * one-time transient, not the steady state. */
  private var demotedOnce = false
  private var preferStrays = false

  private def findOrInsert(hi: Long, allowInsert: Boolean): Array[Long] = {
    var lo = 0
    var up = n - 1
    while (lo <= up) {
      val mid = (lo + up) >>> 1
      val h = his(mid)
      if (h == hi) return blocks(mid)
      else if (h < hi) lo = mid + 1
      else up = mid - 1
    }
    if (!allowInsert || n >= maxContainers) return null
    if (n == his.length) {
      val cap2 = math.min(math.max(his.length * 2, 4), math.max(maxContainers, 4))
      his = java.util.Arrays.copyOf(his, cap2)
      blocks = java.util.Arrays.copyOf(blocks, cap2)
    }
    System.arraycopy(his, lo, his, lo + 1, n - lo)
    System.arraycopy(blocks.asInstanceOf[Array[AnyRef]], lo,
      blocks.asInstanceOf[Array[AnyRef]], lo + 1, n - lo)
    val b = new Array[Long](1024)
    his(lo) = hi
    blocks(lo) = b
    n += 1
    b
  }

  /** [[add]] restricted to an allowed container set (sorted highs): keys
    * in absent containers are silently skipped. The binary search runs
    * only on a container CHANGE — a block cached from the previous row
    * proves its container allowed (blocks only exist for allowed
    * containers on this path), so clustered/sorted key streams pay one
    * compare per row, matching add()'s own locality cache. */
  def addIfAllowed(key: Long, allowed: Array[Long]): Unit = {
    val hi = key >> 16
    if (hi == lastHi && lastBlock != null) {
      val lo = (key & 0xFFFF).toInt
      lastBlock(lo >>> 6) |= 1L << (lo & 63)
    } else if (java.util.Arrays.binarySearch(allowed, hi) >= 0) {
      add(key, strayTolerant = false)
    }
  }

  def add(key: Long, strayTolerant: Boolean): Unit = {
    if (overflowed) return
    val hi = key >> 16
    var b = if (hi == lastHi) lastBlock else null
    if (b == null) {
      b = findOrInsert(hi, allowInsert = !preferStrays)
      if (b == null) {
        if (!strayTolerant) { overflowed = true; return }
        if (!preferStrays && !demotedOnce) {
          // First cap-hit: demote sparse blocks once. If that freed most
          // of the cap the stream is scattered — flip to direct strays;
          // if the blocks are genuinely dense they stay, the freed slots
          // (if any) refill, and later cap-hits stray without re-scanning
          // (demotedOnce guards against a per-insert demote churn).
          demotedOnce = true
          val before = n
          demoteSparse()
          if (n <= before / 2) preferStrays = true
          else b = findOrInsert(hi, allowInsert = true)
        }
        if (b == null) { strays.add(key); return }
      }
      lastHi = hi
      lastBlock = b
    }
    val lo = (key & 0xFFFF).toInt
    b(lo >>> 6) |= 1L << (lo & 63)
  }

  def merge(other: SparseBitmap, strayTolerant: Boolean): Unit = {
    if (other.overflowed) { overflowed = true; return }
    if (overflowed) return
    var i = 0
    while (i < other.n) {
      val hi = other.his(i)
      val ob = other.blocks(i)
      val b = findOrInsertUnbounded(hi)
      var w = 0
      while (w < 1024) { b(w) |= ob(w); w += 1 }
      i += 1
    }
    lastHi = Long.MinValue
    lastBlock = null
    other.strays.foreach(k => add(k, strayTolerant))
    // Overflow-intolerant (semi-join) mode must poison PAST-CAP MERGES,
    // not just past-cap tasks: with probe keys CLUSTERED per task (sorted
    // layouts) no single task overflows, but a reducer merging disjoint
    // container sets would otherwise grow without bound — the driver's
    // containerCount check would never run because eval/serialize dies
    // first. The result is discarded on fallback anyway, so poisoning
    // here costs nothing. Stray-tolerant mode instead demotes sparse
    // blocks past the cap (see class doc) — kept blocks are dense enough
    // that the buffer is never asymptotically worse than a key set.
    if (n > maxContainers) {
      if (strayTolerant) demoteSparse() else overflowed = true
    }
  }

  /** Demote every block below the break-even popcount (512 set bits:
    * 512 strays × ~16 B = one 8 KiB block) to point strays. Exact — a
    * demoted key counts identically via the stray path — and monotone:
    * dense blocks are never expanded. Stray-tolerant consumers only
    * (strays are illegal in the semi-join/[[toDense]] mode). */
  private[graft] def demoteSparse(): Unit = {
    var keep = 0
    var i = 0
    while (i < n) {
      val b = blocks(i)
      var pc = 0
      var w = 0
      while (w < 1024) { pc += java.lang.Long.bitCount(b(w)); w += 1 }
      if (pc >= 512) {
        his(keep) = his(i)
        blocks(keep) = b
        keep += 1
      } else {
        val base = his(i) << 16 // low 16 bits zero, so OR-ing lo is exact for negative hi too
        var w2 = 0
        while (w2 < 1024) {
          var v = b(w2)
          while (v != 0L) {
            strays.add(base | ((w2.toLong << 6) |
              java.lang.Long.numberOfTrailingZeros(v)))
            v &= v - 1
          }
          w2 += 1
        }
      }
      i += 1
    }
    if (keep < n) {
      java.util.Arrays.fill(blocks.asInstanceOf[Array[AnyRef]], keep, n, null)
      n = keep
      lastHi = Long.MinValue
      lastBlock = null
    }
  }

  /** Merge-side insert: blocks are accepted past the cap (see class doc). */
  private def findOrInsertUnbounded(hi: Long): Array[Long] = {
    var lo = 0
    var up = n - 1
    while (lo <= up) {
      val mid = (lo + up) >>> 1
      val h = his(mid)
      if (h == hi) return blocks(mid)
      else if (h < hi) lo = mid + 1
      else up = mid - 1
    }
    if (n == his.length) {
      val cap2 = math.max(his.length * 2, 4)
      his = java.util.Arrays.copyOf(his, cap2)
      blocks = java.util.Arrays.copyOf(blocks, cap2)
    }
    System.arraycopy(his, lo, his, lo + 1, n - lo)
    System.arraycopy(blocks.asInstanceOf[Array[AnyRef]], lo,
      blocks.asInstanceOf[Array[AnyRef]], lo + 1, n - lo)
    val b = new Array[Long](1024)
    his(lo) = hi
    blocks(lo) = b
    n += 1
    b
  }

  /** Exact distinct count: block popcounts + strays not already covered by
    * a set bit (a key can be stray in one partial and a bit in another). */
  def distinctCount: Long = {
    var c = 0L
    var i = 0
    while (i < n) {
      val b = blocks(i)
      var w = 0
      while (w < 1024) { c += java.lang.Long.bitCount(b(w)); w += 1 }
      i += 1
    }
    strays.foreach { k =>
      val b = findOrInsert(k >> 16, allowInsert = false)
      if (b == null) c += 1
      else {
        val lo = (k & 0xFFFF).toInt
        if ((b(lo >>> 6) & (1L << (lo & 63))) == 0L) c += 1
      }
    }
    c
  }

  def containerCount: Int = n
  def isOverflowed: Boolean = overflowed

  /** Dense view for the semi-join probe: (sorted container highs, flat
    * bitmap bytes in [[BitmapContains]]' layout). Only valid when no
    * strays exist (strayCap = 0 mode). */
  def toDense: (IndexedSeq[Long], Array[Byte]) = {
    val cs = java.util.Arrays.copyOf(his, n)
    val bytes = new Array[Byte](n << 13)
    var i = 0
    while (i < n) {
      val b = blocks(i)
      val base = i << 13
      var w = 0
      while (w < 1024) {
        val v = b(w)
        val off = base + (w << 3)
        var j = 0
        while (j < 8) { bytes(off + j) = ((v >>> (j << 3)) & 0xFFL).toByte; j += 1 }
        w += 1
      }
      i += 1
    }
    (scala.collection.immutable.ArraySeq.unsafeWrapArray(cs), bytes)
  }

  def serialize: Array[Byte] = {
    // A poisoned buffer's content is discarded by every consumer — ship
    // only the flag, never the (possibly past-cap) blocks.
    if (overflowed) return Array[Byte](1)
    val strayN = strays.size
    // Size the array in LONG arithmetic: n × 8200 overflows Int at ~262k
    // containers (a 2 GB byte array is the JVM line anyway) — fail with a
    // diagnosis instead of a NegativeArraySizeException deep in a task.
    val size = 1L + 4 + n.toLong * (8 + 8192) + 8 + strayN * 8
    require(size <= Int.MaxValue, s"SparseBitmap too large to serialize: " +
      s"$n containers + $strayN strays = $size bytes (bitmap counting is " +
      "the wrong structure past ~260k containers — use the set path)")
    val bytes = new Array[Byte](size.toInt)
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(0.toByte)
    bb.putInt(n)
    var i = 0
    while (i < n) {
      bb.putLong(his(i))
      bb.asLongBuffer().put(blocks(i))
      bb.position(bb.position() + 8192)
      i += 1
    }
    bb.putLong(strayN)
    strays.foreach(v => bb.putLong(v))
    bytes
  }
}

object SparseBitmap {
  def deserialize(bytes: Array[Byte], maxContainers: Int): SparseBitmap = {
    val sb = new SparseBitmap(maxContainers)
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    sb.overflowed = bb.get() == 1
    if (sb.overflowed) return sb // flag-only form (serialize ships no content)
    val n = bb.getInt()
    if (n > 0) {
      sb.his = new Array[Long](n)
      sb.blocks = new Array[Array[Long]](n)
      sb.n = n
      var i = 0
      while (i < n) {
        sb.his(i) = bb.getLong()
        val b = new Array[Long](1024)
        bb.asLongBuffer().get(b)
        bb.position(bb.position() + 8192)
        sb.blocks(i) = b
        i += 1
      }
    }
    val strayN = bb.getLong()
    var i = 0L
    while (i < strayN) { sb.strays.add(bb.getLong()); i += 1 }
    sb
  }
}

/**
 * Exact COUNT(DISTINCT x) over a [[SparseBitmap]] buffer —
 * `bitmap_count_distinct(x)`.
 *
 * vs [[CountDistinctLong]] (the r8 device behind q12): on container-
 * compact key domains the per-(task, group) partial is containers × 8 KiB
 * instead of distinct-keys × ~16 B, updates are a cached binary search +
 * bit-set instead of a hash insert, and merges are word-wise ORs instead
 * of per-key set rebuilds — the measured floor of the salted-set plan.
 * On scattered domains the stray set bounds it by the SAME asymptotics as
 * the set path, so no salting or fallback plan is needed: one scan, one
 * shuffle, groups-way parallel merge, exact on any input. Partials are
 * [[SparseBitmap.demoteSparse demoted]] before hitting the wire, so a
 * scattered task's shuffle bytes are ~16 B/key, not cap × 8 KiB. NULLs
 * are ignored, matching COUNT(DISTINCT x).
 */
case class BitmapDistinctAgg(
    child: Expression,
    maxContainers: Int = 4096,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SparseBitmap] with UnaryLike[Expression] {

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

  override def prettyName: String = "bitmap_count_distinct"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): SparseBitmap = new SparseBitmap(maxContainers)

  override def update(buf: SparseBitmap, input: InternalRow): SparseBitmap = {
    val v = child.eval(input)
    if (v != null) buf.add(toLong(v), strayTolerant = true)
    buf
  }

  override def merge(buf: SparseBitmap, other: SparseBitmap): SparseBitmap = {
    buf.merge(other, strayTolerant = true)
    buf
  }

  override def eval(buf: SparseBitmap): Any = buf.distinctCount

  override def serialize(buf: SparseBitmap): Array[Byte] = {
    // Ship the cheaper representation per block: on scattered domains a
    // task partial holds up to cap sparse blocks (~32 MB as bitmaps, a few
    // hundred KB as strays); the popcount pass is one read of bytes that
    // were about to be written out anyway.
    buf.demoteSparse()
    buf.serialize
  }
  override def deserialize(bytes: Array[Byte]): SparseBitmap =
    SparseBitmap.deserialize(bytes, maxContainers)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapDistinctAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapDistinctAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): BitmapDistinctAgg =
    copy(child = c)
}

/**
 * One-pass build side for [[graft.ops.SemiJoins]]' bitmap path: folds the
 * probe side's keys into a [[SparseBitmap]] WITHOUT the separate container-
 * discovery job the r11 KeyBitmapAgg needed (kept-side scan → collect →
 * second job). Containers self-discover; a task that exceeds the cap
 * poisons its partial (overflow), and so does a reducer MERGE that crosses
 * it — the driver sees the flag and falls back. Emits the serialized
 * sparse buffer (BINARY); NULL keys are skipped, matching EXISTS.
 *
 * `allowed` (sorted container highs) restricts discovery to a KNOWN
 * domain — the retry tier for the compact-kept/scattered-probe regime:
 * probe keys in absent containers are SKIPPED (they cannot match a kept
 * key, exactly the r11 semantics), so with `allowed.size ≤ cap` overflow
 * is impossible and the bitmap stays kept-domain-sized no matter how
 * scattered the probe is.
 */
case class SparseKeyBitmapAgg(
    child: Expression,
    maxContainers: Int,
    allowed: Option[IndexedSeq[Long]] = None,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SparseBitmap] with UnaryLike[Expression] {

  @transient private lazy val allowedArr: Array[Long] =
    allowed.map(_.toArray).orNull

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a LONG key column (cast upstream), got $other")
  }

  override def prettyName: String = "sparse_key_bitmap"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): SparseBitmap = new SparseBitmap(maxContainers)

  override def update(buf: SparseBitmap, input: InternalRow): SparseBitmap = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[Long]
      if (allowedArr == null) buf.add(k, strayTolerant = false)
      else buf.addIfAllowed(k, allowedArr)
    }
    buf
  }

  override def merge(buf: SparseBitmap, other: SparseBitmap): SparseBitmap = {
    buf.merge(other, strayTolerant = false)
    buf
  }

  override def eval(buf: SparseBitmap): Any = buf.serialize

  override def serialize(buf: SparseBitmap): Array[Byte] = buf.serialize
  override def deserialize(bytes: Array[Byte]): SparseBitmap =
    SparseBitmap.deserialize(bytes, maxContainers)

  override def withNewMutableAggBufferOffset(newOffset: Int): SparseKeyBitmapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SparseKeyBitmapAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): SparseKeyBitmapAgg =
    copy(child = c)
}
