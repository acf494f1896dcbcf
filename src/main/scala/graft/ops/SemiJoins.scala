package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graftbridge.Bridge

/**
 * EXISTS / NOT EXISTS equi-joins with an exact containered-bitmap fast
 * path.
 *
 * The textbook distributed plan — dedup the probe side's keys, then
 * semi/anti join — shuffles every surviving key: q5's decomposition at
 * derived sf10 was a 68 MB exchange of 13M partially-deduped longs (the
 * map-side distinct removes only the in-partition repeats), 1.0 s of the
 * 1.9 s gate. When the probe side's keys occupy few 64Ki-key CONTAINERS —
 * dense surrogate keys (one container run) or block-allocated / sharded
 * id spaces (the derived fixtures: 1.5M keys over a 9.9e9 span, 121
 * occupied containers) — the whole key set folds into an exact
 * [[graft.aggregates.SparseKeyBitmapAgg]] bitmap whose per-task partial
 * is containers × 8 KiB REGARDLESS of row count, and the join collapses
 * to a broadcast byte array + one codegen'd bit test per kept-side row.
 *
 * ONE job builds it (r12; the r11 shape needed a separate kept-side
 * container-discovery job first — one of q9's four job boundaries):
 * containers self-discover inside the aggregate as probe keys arrive. The
 * speculation is bounded — a task that sees more than the container cap
 * poisons its partial, the driver detects overflow (or a past-cap merged
 * union) and falls back to the distinct + semi/anti join. The scattered-
 * key regime therefore pays one wasted probe-side pass where r11's
 * discovery aborted before it; that regime's real cost is the fallback
 * join itself, and `maxBitmapBits=0` turns speculation off for callers
 * who know their keys are scattered. Both paths are value-identical
 * (spec: random keys + nulls + out-of-domain probes, both paths).
 *
 * NULL semantics match SQL EXISTS exactly on both paths: a null kept-side
 * key never matches (dropped by `exists`, kept by `notExists`); null
 * probe-side keys are ignored. An EMPTY probe side stays on the bitmap
 * path (all bits unset: `exists` drops every row, `notExists` keeps all).
 */
object SemiJoins {

  /** Hard cap on the bitmap size in BITS (bits = occupied containers ×
    * 2¹⁶). The default 2²⁸ = a 32 MB broadcast-sized bitmap = 4096
    * containers. Above it the distinct + semi join fallback runs.
    * 0 disables the bitmap path entirely (A/B + escape hatch). */
  val MaxBitmapBitsKey = "spark.graft.semijoin.maxBitmapBits"
  val DefaultMaxBitmapBits: Long = 1L << 28

  /** Rows of `left` with at least one `right` row where
    * `left(leftKey) = right(rightKey)` (EXISTS). */
  def exists(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String): DataFrame =
    join(left, leftKey, right, rightKey, anti = false)

  /** Rows of `left` with NO `right` row where
    * `left(leftKey) = right(rightKey)` (NOT EXISTS). */
  def notExists(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String): DataFrame =
    join(left, leftKey, right, rightKey, anti = true)

  /** Bitmap equality is LONG equality, so the fast path is only sound for
    * key types whose cast to LONG is injective and matches native equality
    * — the integral family. A double key 1.5 must NOT match probe key 1,
    * and string '012' must not match '12'; those run the fallback, which
    * joins on the raw types. */
  private def integral(df: DataFrame, key: String): Boolean =
    df.schema(key).dataType match {
      case org.apache.spark.sql.types.ByteType
         | org.apache.spark.sql.types.ShortType
         | org.apache.spark.sql.types.IntegerType
         | org.apache.spark.sql.types.LongType => true
      case _ => false
    }

  private def join(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String, anti: Boolean): DataFrame = {
    val spark = left.sparkSession
    val maxBits = graft.spark.ExecTuning.confLong(spark,
      MaxBitmapBitsKey, DefaultMaxBitmapBits)
    // Hard ceiling of 2^15 containers (a 256 MB bitmap) regardless of how
    // far the conf is raised: containers.length << 16 must stay an Int and
    // the driver-held byte array sane.
    val maxContainers = (maxBits >>> 16).min(1L << 15).toInt
    val lk = col(leftKey).cast("long")
    val built: Option[(IndexedSeq[Long], Array[Byte])] =
      if (maxContainers <= 0 ||
          !integral(left, leftKey) || !integral(right, rightKey)) None
      else {
        // The ONE build job: fold the probe side's keys into per-task
        // sparse bitmaps and bring the merged result to the driver — the
        // probe filter then carries the bytes as a task-binary reference
        // object instead of reading (= copying) a binary COLUMN per row
        // (see BitmapContains' scaladoc for the 20 s lesson). A bare
        // global agg would funnel every map task's partial through ONE
        // reducer (a million-task 100 TB scan pushes ~a terabyte through
        // it), so partials group by partition-id mod `groups` and the
        // driver ORs the handful of sparse results. `groups` is sized so
        // the driver-collect worst case (groups × cap × 8 KiB — partials
        // are usually far smaller) stays ≤ 256 MB at every conf setting:
        // 8 at the default 4096-container cap.
        val groups: Int =
          ((256L << 20) / (maxContainers.toLong << 13)).max(1L).min(32L).toInt
        val partialsDf = right
          .where(col(rightKey).isNotNull)
          .select(col(rightKey).cast("long").as("_sj_k"))
          .groupBy((spark_partition_id() % groups).as("_sj_g"))
          .agg(Bridge.column(graft.aggregates.SparseKeyBitmapAgg(
            Bridge.composedExpression(col("_sj_k")), maxContainers)
            .toAggregateExpression()).as("_sj_bm"))
          .select(col("_sj_bm"))
        // Construction-time job: run it under the same sized-split policy
        // the caller's later action would apply (the rddBarrier lesson —
        // eager work escapes the action-scoped conf wrap otherwise).
        val partials =
          graft.spark.ExecTuning.withSizedAqe(partialsDf)(partialsDf.collect())
        val merged = new graft.aggregates.SparseBitmap(maxContainers)
        partials.foreach { row =>
          merged.merge(graft.aggregates.SparseBitmap.deserialize(
            row.getAs[Array[Byte]](0), maxContainers), strayTolerant = false)
        }
        // Overflow (any task past the cap) or a past-cap merged union =
        // scattered keys: fall back. An empty probe side is a valid
        // all-bits-unset bitmap.
        if (merged.isOverflowed || merged.containerCount > maxContainers) None
        else Some(merged.toDense)
      }
    built match {
      case Some((cs, bmBytes)) =>
        val contains = coalesce(
          Bridge.column(graft.aggregates.BitmapContains(
            Bridge.composedExpression(lk), bmBytes, cs)),
          lit(false))
        left.where(if (anti) !contains else contains)
      case None =>
        // Distinct + semi/anti: the general-domain shape (the deduped
        // keys still broadcast when small — AQE's call, exactly as
        // before the bitmap path existed). The probe key is aliased to a
        // fresh name first: with same-named keys (exists_join(..,'k','k'))
        // an unresolved col(leftKey) === col(rightKey) is ambiguous and
        // analysis throws — a data-dependent crash, since the bitmap path
        // handles that spelling fine until the domain scatters past the
        // cap. Both references are dataset-qualified so no spelling of
        // leftKey/rightKey (same-named, or either side carrying the
        // other's name) can be ambiguous.
        val rk = "_sj_rk"
        val keys = right.select(col(rightKey).as(rk)).distinct()
        left.join(keys, left(leftKey) === keys(rk),
          if (anti) "left_anti" else "left_semi")
    }
  }
}
