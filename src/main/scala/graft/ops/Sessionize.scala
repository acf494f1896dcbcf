package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Gap-based sessionization: assign each row a per-key `session_seq`
 * (1, 2, …) that increments whenever the gap to the previous event of the
 * same key exceeds `maxGap`. The standard event-stream building block for
 * engagement/funnel analytics over clickstreams.
 *
 * One window shuffle on the keys (lag → gap flag → running sum); no joins,
 * no state beyond the window sort. At 100 TB the bound is per-key event
 * volume in one task — the inherent window limit (pre-split hyperactive
 * keys upstream if one entity dominates). The streaming analogue is
 * `session_window` in Structured Streaming; this operator is the batch
 * path over the same semantics.
 */
object Sessionize {

  /**
   * @param keyCols  session scope (e.g. user_id)
   * @param tsCol    event-time column: TIMESTAMP / TIMESTAMP_NTZ / integral
   *                 (see [[EventTime]])
   * @param maxGap   max intra-session gap — MICROSECONDS for timestamp
   *                 columns, the column's own units for integral ones
   *
   * Output = input + `session_seq` (LONG, 1-based per key).
   */
  def sessionize(df: DataFrame, keyCols: Seq[String], tsCol: String,
      maxGap: Long): DataFrame = {
    val byKey = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol))
    val running = byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_ts_l", EventTime.toLong(df, tsCol))
      .withColumn("_prev_ts", lag(col("_ts_l"), 1).over(byKey))
      .withColumn("_new_session",
        when(col("_prev_ts").isNull ||
          col("_ts_l") - col("_prev_ts") > maxGap, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("_new_session")).over(running))
      .drop("_ts_l", "_prev_ts", "_new_session")
  }

  /** Per-session rollup: (keys…, session_seq, n_events, start_ts, end_ts). */
  def sessionStats(df: DataFrame, keyCols: Seq[String], tsCol: String,
      maxGap: Long): DataFrame =
    sessionize(df, keyCols, tsCol, maxGap)
      .groupBy((keyCols :+ "session_seq").map(col): _*)
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_ts"), max(col(tsCol)).as("end_ts"))

  /**
   * Per-EVENT session stats: input + `session_seq` + `n_events` /
   * `start_ts` / `end_ts` of the event's own session — the fused form of
   * "sessionize, roll up, then range-join events back to their session"
   * for the common case where the points being attributed ARE (a subset
   * of) the events that formed the sessions.
   *
   * That composed pipeline ([[sessionStats]] + `RangeJoin.
   * pointInDisjointIntervals`) scans the events twice and pays a second
   * key exchange for the interval merge; here the session aggregates ride
   * a second window over (keys…, session_seq) that REUSES the sessionize
   * exchange — `HashPartitioning(keys)` already satisfies the finer
   * clustering, so Spark inserts only a local re-sort (of data already in
   * (keys, ts) = (keys, session_seq) order). One scan, ONE shuffle total,
   * at any scale. Value-identical to the composed path for points drawn
   * from the sessionized events (spec'd in SessionizeSpec).
   */
  def sessionizeWithStats(df: DataFrame, keyCols: Seq[String], tsCol: String,
      maxGap: Long): DataFrame = {
    val bySession = Window.partitionBy((keyCols :+ "session_seq").map(col): _*)
    sessionize(df, keyCols, tsCol, maxGap)
      .withColumn("n_events", count(lit(1)).over(bySession))
      .withColumn("start_ts", min(col(tsCol)).over(bySession))
      .withColumn("end_ts", max(col(tsCol)).over(bySession))
  }
}
