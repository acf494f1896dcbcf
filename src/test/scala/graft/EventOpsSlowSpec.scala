package graft

import org.apache.spark.sql.functions._

import graft.ops.{AsOfJoin, RangeJoin, Sessionize}

/**
 * Event-operator scale-envelope test: 1M timestamp-typed events (10k users
 * x 100 events) with a closed-form truth, driven through the SAME
 * normalized-micros path the gates use. The construction: user u's event k
 * sits at k hours, plus an extra 4h+1s inserted before k=50 — so every
 * user has exactly two 50-event sessions under a 4h gap, every odd event's
 * backward as-of match is its preceding even event exactly 1h earlier, and
 * every event lands in exactly one session interval. Each operator's
 * output is checked against those invariants in aggregate (no collects of
 * the data, only counts).
 */
class EventOpsSlowSpec extends SparkSuite {

  private val HourUs = 3600L * 1000000L
  private val GapUs = 4L * HourUs

  // ts = k hours (+ 4h1s once k >= 50), staggered per user by u seconds so
  // user timelines don't align on identical instants.
  private lazy val events = spark.range(1000000L).select(
    (col("id") / 100).cast("long").as("user_id"),
    (col("id") % 100).cast("long").as("k"),
    timestamp_micros(
      (col("id") % 100) * HourUs +
        when(col("id") % 100 >= 50, GapUs + 1000000L).otherwise(0L) +
        (col("id") / 100).cast("long") * 1000000L).as("ts"))

  test("sessionize: 1M timestamp events -> exactly 2 sessions of 50 per user") {
    val stats = Sessionize.sessionStats(events, Seq("user_id"), "ts", maxGap = GapUs)
      .agg(count(lit(1)).as("n_sessions"),
        max(col("session_seq")).as("max_seq"),
        min(col("n_events")).as("min_n"), max(col("n_events")).as("max_n"))
      .collect().head
    assert(stats.getLong(0) == 20000L, "10k users x 2 sessions")
    assert(stats.getLong(1) == 2L)
    assert(stats.getLong(2) == 50L && stats.getLong(3) == 50L)
  }

  test("as-of join: every odd event matches its preceding even event, gap exactly 1h") {
    val left = events.where(col("k") % 2 === 1)
      .select(col("user_id"), col("k"), col("ts"))
    val right = events.where(col("k") % 2 === 0)
      .select(col("user_id"), col("k").as("rk"), col("ts"))
    val joined = AsOfJoin.asof(left, right, Seq("user_id"), "ts", "ts",
      rightPrefix = "m_")
    val stats = joined.agg(
      count(lit(1)).as("n"),
      count(col("m_rk")).as("n_matched"),
      sum(when(col("m_rk") === col("k") - 1 &&
        unix_micros(col("ts")) - unix_micros(col("m_ts")) === HourUs, 1L)
        .otherwise(0L)).as("n_exact"))
      .collect().head
    assert(stats.getLong(0) == 500000L)
    assert(stats.getLong(1) == 500000L, "every left row matched")
    assert(stats.getLong(2) == 500000L, "match is k-1, exactly 1h earlier")
  }

  test("range join: every event falls in exactly one session interval") {
    val sessions = Sessionize.sessionStats(events, Seq("user_id"), "ts", maxGap = GapUs)
    val matched = RangeJoin.pointInInterval(
      events.select(col("user_id"), col("k"), col("ts")), sessions,
      Seq("user_id"), "ts", "start_ts", "end_ts", bucketWidth = GapUs)
    assert(matched.count() == 1000000L)
    // and the session attribution is consistent: first half -> seq 1
    val wrong = matched.where(
      (col("k") < 50 && col("iv_session_seq") =!= 1) ||
        (col("k") >= 50 && col("iv_session_seq") =!= 2)).count()
    assert(wrong == 0L)
    // The disjoint-interval merge path (sessions never overlap) must
    // attribute identically at this scale.
    val merged = RangeJoin.pointInDisjointIntervals(
      events.select(col("user_id"), col("k"), col("ts")), sessions,
      Seq("user_id"), "ts", "start_ts", "end_ts")
    assert(merged.count() == 1000000L)
    assert(merged.where(
      (col("k") < 50 && col("iv_session_seq") =!= 1) ||
        (col("k") >= 50 && col("iv_session_seq") =!= 2)).count() == 0L)
  }
}
