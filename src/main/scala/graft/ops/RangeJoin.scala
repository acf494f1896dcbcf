package graft.ops

import org.apache.spark.sql.DataFrame
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
}
