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
 * Three tiers, cheapest first, all value-identical (spec: random keys +
 * nulls + out-of-domain probes on every path):
 *
 *  1. SPECULATIVE one-job build (r12; the r11 shape needed a separate
 *     kept-side container-discovery job first — one of q9's four job
 *     boundaries): containers self-discover inside the aggregate as probe
 *     keys arrive, bounded — a task past the cap poisons its partial, and
 *     so does a past-cap reducer merge.
 *  2. On overflow, the KEPT-DOMAIN retry: one bounded kept-side discovery
 *     job, then the build rerun restricted to those containers (probe keys
 *     in absent containers cannot match — skipped in-aggregate and
 *     range-pruned at the scan; overflow impossible). This serves the
 *     compact-kept / scattered-probe regime the speculation cannot.
 *  3. Distinct + semi/anti join — the general shape, for scattered keys
 *     on BOTH sides (that regime's real cost is this join itself; the
 *     wasted speculative pass is the price of tier 1 being one job, and
 *     `maxBitmapBits=0` opts straight out for callers who know).
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
    // Resolve through the analyzer (df.select(col(key))), not a direct
    // StructType lookup: schema(key) is CASE-SENSITIVE, so a key spelling
    // that Spark's default case-insensitive resolution accepts everywhere
    // else would throw here before either join path ran.
    df.select(col(key)).schema.head.dataType match {
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

    /** The build job: fold the probe side's keys into per-task sparse
      * bitmaps and bring the merged result to the driver — the probe
      * filter then carries the bytes as a task-binary reference object
      * instead of reading (= copying) a binary COLUMN per row (see
      * BitmapContains' scaladoc for the 20 s lesson). A bare global agg
      * would funnel every map task's partial through ONE reducer (a
      * million-task 100 TB scan pushes ~a terabyte through it), so
      * partials group by partition-id mod `groups` and the driver ORs the
      * handful of sparse results; `groups` is sized so the driver-collect
      * worst case (groups × cap × 8 KiB — partials are usually far
      * smaller) stays ≤ 256 MB at every conf setting (8 at the default
      * 4096-container cap). Returns None on overflow (any task OR merge
      * past the cap); an empty probe side is a valid all-unset bitmap.
      * `allowed` restricts discovery to known kept-side containers (the
      * retry tier — overflow then impossible). */
    def buildBitmap(allowed: Option[IndexedSeq[Long]])
        : Option[(IndexedSeq[Long], Array[Byte])] = {
      val groups: Int =
        ((256L << 20) / (maxContainers.toLong << 13)).max(1L).min(32L).toInt
      val probe = allowed match {
        case Some(cs) =>
          // Pushed range bounds: probes outside the outermost kept
          // containers can't match and never leave the scan (r11 shape).
          right.where(col(rightKey).isNotNull)
            .select(col(rightKey).cast("long").as("_sj_k"))
            .where(col("_sj_k") >= (cs.head << 16) &&
              col("_sj_k") <= ((cs.last << 16) | 0xFFFFL))
        case None =>
          right.where(col(rightKey).isNotNull)
            .select(col(rightKey).cast("long").as("_sj_k"))
      }
      val partialsDf = probe
        .groupBy((spark_partition_id() % groups).as("_sj_g"))
        .agg(Bridge.column(graft.aggregates.SparseKeyBitmapAgg(
          Bridge.composedExpression(col("_sj_k")), maxContainers, allowed)
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
      if (merged.isOverflowed || merged.containerCount > maxContainers) None
      else Some(merged.toDense)
    }

    /** Retry tier for the compact-kept / scattered-probe regime the
      * speculative pass cannot serve (probe keys in containers the kept
      * side never occupies force its cap): ONE bounded job discovers the
      * KEPT side's containers (distinct highs, limit cap+1 — ≤ cap+1 longs
      * ever reach the driver; over-limit means the kept side itself is
      * scattered → fall through), then the build reruns restricted to
      * them, where overflow is impossible and out-of-domain probe keys are
      * skipped/range-pruned — the r11 two-job shape, now the RARE path. */
    def keptDomainRetry(): Option[(IndexedSeq[Long], Array[Byte])] = {
      val disc = left.where(lk.isNotNull)
        .select(shiftright(lk, 16).as("_sj_c")).distinct()
        .limit(maxContainers + 1)
      val rows = graft.spark.ExecTuning.withSizedAqe(disc)(disc.collect())
      if (rows.length > maxContainers) None
      else if (rows.isEmpty) {
        // No non-null kept keys: the answer is known without touching the
        // probe side at all — an all-unset bitmap (exists drops every row,
        // notExists keeps them; null kept keys behave as in SQL on the
        // probe filter either way).
        Some((IndexedSeq.empty[Long], Array.empty[Byte]))
      } else buildBitmap(Some(rows.map(_.getLong(0)).sorted.toIndexedSeq))
    }

    val built: Option[(IndexedSeq[Long], Array[Byte])] =
      if (maxContainers <= 0 ||
          !integral(left, leftKey) || !integral(right, rightKey)) None
      else buildBitmap(None).orElse(keptDomainRetry())
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
