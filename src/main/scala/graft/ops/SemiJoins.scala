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
 * 1.9 s gate. When the KEPT side's keys occupy few 64Ki-key CONTAINERS —
 * dense surrogate keys (one container run) or block-allocated / sharded
 * id spaces (the derived fixtures: 1.5M keys over a 9.9e9 span, 121
 * occupied containers) — the probe side's whole key set folds into an
 * exact [[graft.aggregates.KeyBitmapAgg]] bitmap whose per-task partial
 * is containers × 8 KiB REGARDLESS of row count, and the join collapses
 * to a broadcast byte array + one codegen'd bit test per kept-side row.
 *
 * Domain discovery costs ONE bounded job over the KEPT side — the side
 * the query returns anyway, and the smaller one in the EXISTS shape: the
 * distinct container highs with a cap+1 limit (≤ maxBitmapBits/2¹⁶ + 1
 * longs ever reach the driver). Probe keys in absent containers are
 * skipped by the aggregate: they cannot match. Above the cap — truly
 * scattered keys — the plan falls back to the distinct + semi/anti join
 * shape. Both paths are value-identical (spec: random keys + nulls +
 * out-of-domain probes, both paths).
 *
 * NULL semantics match SQL EXISTS exactly on both paths: a null kept-side
 * key never matches (dropped by `exists`, kept by `notExists`); null
 * probe-side keys are ignored.
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
    val containers: Option[IndexedSeq[Long]] =
      if (maxContainers <= 0 ||
          !integral(left, leftKey) || !integral(right, rightKey)) None
      else {
        // ONE bounded job discovers the domain: distinct container highs
        // with a limit of cap+1 — at most cap+1 longs ever reach the
        // driver, and an over-limit result (cap+1 rows back) means
        // "scattered keys, fall back" without needing the exact count.
        // Column-pruned to the key; cheap next to the probe-side exchange
        // it can replace.
        val probe = left.where(lk.isNotNull)
          .select(shiftright(lk, 16).as("_sj_c")).distinct()
          .limit(maxContainers + 1)
        // Construction-time job: run it under the same sized-split policy
        // the caller's later action would apply (the rddBarrier lesson —
        // eager work escapes the action-scoped conf wrap otherwise).
        val rows = graft.spark.ExecTuning.withSizedAqe(probe)(probe.collect())
        if (rows.isEmpty || rows.length > maxContainers) None
        else Some(rows.map(_.getLong(0)).sorted.toIndexedSeq)
      }
    containers match {
      case Some(cs) =>
        // Second job: fold the probe side into the bitmap and bring the
        // (containers × 8 KiB) bytes to the driver — the probe filter
        // then carries them as a task-binary reference object instead of
        // reading (= copying) a binary COLUMN per row (see
        // BitmapContains' scaladoc for the 20 s lesson). The reduce fans
        // out when it must: a bare global agg funnels every map task's
        // full-size partial through ONE reducer — fine for the tens of
        // local tasks (estimated partial volume under 256 MB keeps the
        // single-group shape and a one-bitmap collect), but a
        // million-task 100 TB scan would push ~a terabyte through it, so
        // larger scans group partials by partition-id mod ≤ 32 and the
        // driver ORs the handful of resulting bitmaps (bounded fan-in at
        // any task count; OR is associative). Unknown stats → fan out.
        val scanned = right.select(col(rightKey).cast("long").as("_sj_k"))
          // Pushed range bounds: probes outside the outermost containers
          // can't match and never leave the scan.
          .where(col("_sj_k") >= (cs.head << 16) &&
            col("_sj_k") <= ((cs.last << 16) | 0xFFFFL))
        val bmSize = cs.length.toLong << 13 // containers × 8 KiB
        val groups: Int = {
          // The session spells this conf with a byte suffix ('…728b') —
          // parse via Spark's byte-string reader, not a bare toLong.
          val split = spark.conf.getOption("spark.sql.files.maxPartitionBytes")
            .flatMap(v => scala.util.Try(
              org.apache.spark.network.util.JavaUtils.byteStringAsBytes(v)).toOption)
            .getOrElse(128L << 20).max(1L)
          val estTasks =
            try (graft.spark.ExecTuning.inputBytes(right) / split).toLong.max(1L)
            catch { case _: Exception => Long.MaxValue >> 20 }
          val fanInBytes = estTasks.min(1L << 40) * bmSize
          // The driver collects groups × bmSize bytes before the OR loop,
          // so the PRODUCT is what must stay bounded: 32 groups is right
          // for the default 32 MB ceiling, but a conf raised to the 2¹⁵
          // container ceiling makes bmSize itself 256 MB — scale groups
          // down so groups × bmSize ≤ 256 MB at every conf setting.
          if (fanInBytes <= (256L << 20)) 1
          else ((256L << 20) / bmSize).max(1L).min(32L).toInt
        }
        val partialsDf = scanned
          .groupBy((spark_partition_id() % groups).as("_sj_g"))
          .agg(Bridge.column(graft.aggregates.KeyBitmapAgg(
            Bridge.composedExpression(col("_sj_k")), cs)
            .toAggregateExpression()).as("_sj_bm"))
          .select(col("_sj_bm"))
        val partials =
          graft.spark.ExecTuning.withSizedAqe(partialsDf)(partialsDf.collect())
        val bmBytes = new Array[Byte](bmSize.toInt)
        partials.foreach { row =>
          val p = row.getAs[Array[Byte]](0)
          var i = 0
          while (i < bmBytes.length) { bmBytes(i) = (bmBytes(i) | p(i)).toByte; i += 1 }
        }
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
