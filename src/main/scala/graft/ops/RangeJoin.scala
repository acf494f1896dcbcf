package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Point-in-interval range join: match each left "point" row to every right
 * interval `[startCol, endCol]` (inclusive) containing it, optionally
 * scoped by equality keys.
 *
 * 100 TB design: Spark plans a bare `l.ts BETWEEN r.s AND r.e` join as a
 * broadcast-nested-loop — quadratic and broadcast-bound. This operator
 * bucketizes instead: points land in bucket `ts div w`, intervals explode
 * to every bucket they overlap, and the join is a plain EQUI-join on
 * (keys…, bucket) with an exact containment post-filter. Each point can
 * meet an interval only in the point's own bucket, so no dedup pass is
 * needed. Shuffle keys are (keys, bucket) — fine-grained and uniform;
 * interval blowup is bounded by ceil(len/w)+1 rows per interval, so pick
 * `bucketWidth` near the typical interval length (the classic
 * time-bucketed interval-join tradeoff).
 */
object RangeJoin {

  /**
   * @param keyCols     equality keys present on both sides (may be empty —
   *                    then bucketing alone bounds the join)
   * @param pointTs     left point column: TIMESTAMP / TIMESTAMP_NTZ /
   *                    integral (see [[EventTime]])
   * @param startCol/endCol right interval bounds, inclusive (same type
   *                    family as pointTs)
   * @param bucketWidth bucket size — MICROSECONDS for timestamp columns,
   *                    the columns' own units for integral ones
   * @param rightPrefix prefix for right-side output columns
   *
   * Inner-join semantics: points in no interval drop out; points in k
   * intervals emit k rows.
   */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keyCols: Seq[String], pointTs: String, startCol: String, endCol: String,
      bucketWidth: Long, rightPrefix: String = "iv_"): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val rightCols = intervals.columns.toSeq.filterNot(keyCols.contains)
    // Same guard as AsOfJoin: a points column equal to a prefixed interval
    // column would yield duplicate output names (every downstream col()
    // ambiguous). Fail at call time with a clear message.
    val collisions = rightCols.map(rightPrefix + _).toSet intersect
      points.columns.toSet
    require(collisions.isEmpty,
      s"prefixed interval column(s) ${collisions.mkString(", ")} collide with " +
        s"point columns; pass a different rightPrefix")
    // `div` (IntegralDivide) keeps the math exact on epoch longs — `/`
    // would detour through double and mis-bucket near bucket edges.
    // Truncation-vs-floor alignment at negative ts is harmless: bucketing
    // only needs a MONOTONE ts→bucket map applied identically to both
    // sides, and each point meets an interval in exactly one bucket (its
    // own), so matches are found once and exactly once. The normalized
    // epoch-longs (`_ts_l`/`_s_l`/`_e_l`) ride through the join for the
    // exact containment filter — casting a TIMESTAMP to BIGINT would
    // truncate to SECONDS and mis-match near interval edges.
    val p = points
      .withColumn("_ts_l", EventTime.toLong(points, pointTs))
      .withColumn("_bucket", expr(s"_ts_l div $bucketWidth"))
    val iv = intervals
      .withColumn("_s_l", EventTime.toLong(intervals, startCol))
      .withColumn("_e_l", EventTime.toLong(intervals, endCol))
      .withColumn("_bucket", explode(sequence(
        expr(s"_s_l div $bucketWidth"), expr(s"_e_l div $bucketWidth"))))
      .select((keyCols ++ Seq("_bucket", "_s_l", "_e_l")).map(col) ++
        rightCols.map(c => col(c).as(rightPrefix + c)): _*)
    p.join(iv, keyCols :+ "_bucket")
      .where(col("_ts_l").between(col("_s_l"), col("_e_l")))
      .drop("_bucket", "_ts_l", "_s_l", "_e_l")
  }

  /**
   * Point-in-interval join for DISJOINT intervals — when no two intervals of
   * the same key share any timestamp (endpoints included), each point has at
   * most one containing interval: the latest-starting interval at or before
   * it. That turns the range join into an as-of merge: union both sides,
   * ONE window over the keys carries the last-seen interval forward, and an
   * exact containment filter keeps matched points. Same output contract as
   * [[pointInInterval]] (inner semantics, `rightPrefix`ed interval columns).
   *
   * 100 TB cost: one shuffle of |points| + |intervals| rows + the window
   * sort — strictly less than the bucketized path's two join-side shuffles
   * plus interval explode, and there is no width to tune. Session intervals
   * (gap-based sessionization output) always qualify: a gap > 0 separates
   * consecutive sessions of a key.
   *
   * Disjointness is the caller's contract and is NOT verified (verification
   * would cost the window itself); overlapping intervals silently match
   * points only to the latest-starting one. Use [[pointInInterval]] when
   * intervals can overlap.
   */
  def pointInDisjointIntervals(points: DataFrame, intervals: DataFrame,
      keyCols: Seq[String], pointTs: String, startCol: String, endCol: String,
      rightPrefix: String = "iv_"): DataFrame = {
    val pointCols = points.columns.toSeq
    val rightCols = intervals.columns.toSeq.filterNot(keyCols.contains)
    val collisions = rightCols.map(rightPrefix + _).toSet intersect pointCols.toSet
    require(collisions.isEmpty,
      s"prefixed interval column(s) ${collisions.mkString(", ")} collide with " +
        s"point columns; pass a different rightPrefix")
    val pk = keyCols.map(col)
    def structTypeOf(df: DataFrame, cols: Seq[String]) =
      org.apache.spark.sql.types.StructType(cols.map(c => df.schema(c)))

    val pTagged = points.select(
      pk ++ Seq(
        EventTime.toLong(points, pointTs).as("_ts"), lit(0).as("_side"),
        struct(pointCols.map(col): _*).as("_p"),
        lit(null).cast(structTypeOf(intervals, rightCols)).as("_iv"),
        lit(null).cast("long").as("_ive")): _*)
    // NULL-endpoint intervals are dropped, matching [[pointInInterval]]
    // (whose bucket sequence over a null start explodes to nothing):
    // without the filter a null start sorts FIRST in the window and the
    // interval matches from -infinity — the two documented-equivalent
    // paths would return different rows on dirty data.
    val ivTagged = intervals
      .where(col(startCol).isNotNull && col(endCol).isNotNull)
      .select(
        pk ++ Seq(
          EventTime.toLong(intervals, startCol).as("_ts"), lit(1).as("_side"),
          lit(null).cast(structTypeOf(points, pointCols)).as("_p"),
          struct(rightCols.map(col): _*).as("_iv"),
          EventTime.toLong(intervals, endCol).as("_ive")): _*)

    // Interval-before-point on equal ts (_side desc) so a point AT an
    // interval's start matches it. `_ive` is non-null exactly where `_iv`
    // is, so the two last(ignoreNulls) calls pick the same interval row.
    val w = Window.partitionBy(pk: _*).orderBy(col("_ts").asc, col("_side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pTagged.unionByName(ivTagged)
      .withColumn("_m", last(col("_iv"), ignoreNulls = true).over(w))
      .withColumn("_me", last(col("_ive"), ignoreNulls = true).over(w))
      .where(col("_side") === 0 && col("_ts") <= col("_me"))
      .select(
        pointCols.map(c => col("_p").getField(c).as(c)) ++
          rightCols.map(c => col("_m").getField(c).as(rightPrefix + c)): _*)
  }

  /**
   * Measure a bucket width for [[pointInInterval]] from the intervals
   * themselves: the `quantile` of interval length (one cheap aggregate job
   * over the intervals plan — callers with an expensive upstream plan
   * should cache it or pass an explicit width).
   *
   * Width ≈ typical length bounds the explode blowup at ~`ceil(len/w)+1` ≈
   * 2 rows for the typical interval. The default quantile is 0.9, NOT the
   * median: heavy-tailed workloads (gap sessionization emits a majority of
   * single-event, zero-length sessions) have p50 = 0, and a tiny width
   * explodes the tail intervals into thousands of buckets. The result is
   * floored at 1 so degenerate all-zero-length inputs stay valid.
   */
  def suggestBucketWidth(intervals: DataFrame, startCol: String,
      endCol: String, quantile: Double = 0.9): Long = {
    require(quantile > 0 && quantile <= 1, s"quantile must be in (0,1], got $quantile")
    val len: Column = EventTime.toLong(intervals, endCol) -
      EventTime.toLong(intervals, startCol)
    // approx_percentile returns NULL on zero rows (or all-null bounds) —
    // land on the documented floor of 1 instead of unboxing an NPE.
    val row = intervals.select(
        approx_percentile(len, lit(quantile), lit(10000)).cast("long"))
      .head()
    val q = if (row.isNullAt(0)) 1L else row.getLong(0)
    math.max(q, 1L)
  }
}
