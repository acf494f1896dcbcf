package graft

import org.apache.spark.sql.functions._

import graft.ops.Sessionize

/** Gap-based sessionization: seq assignment, per-key isolation, rollup. */
class SessionizeSpec extends SparkSuite {

  import spark.implicits._

  private lazy val events = Seq(
    ("u1", 100L), ("u1", 150L), ("u1", 400L), // gap 250 > 200 → new session
    ("u1", 450L),
    ("u2", 90L), ("u2", 500L), ("u2", 1000L)) // two breaks for u2
    .toDF("user", "ts")

  test("session_seq increments on gaps over maxGap, per key") {
    val r = Sessionize.sessionize(events, Seq("user"), "ts", maxGap = 200L)
      .select("user", "ts", "session_seq")
      .collect().map(x => (x.getString(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(r(("u1", 100L)) == 1L && r(("u1", 150L)) == 1L)
    assert(r(("u1", 400L)) == 2L && r(("u1", 450L)) == 2L)
    assert(r(("u2", 90L)) == 1L && r(("u2", 500L)) == 2L && r(("u2", 1000L)) == 3L)
  }

  test("boundary: gap exactly maxGap stays in-session") {
    val df = Seq(("u", 0L), ("u", 200L)).toDF("user", "ts")
    val r = Sessionize.sessionize(df, Seq("user"), "ts", maxGap = 200L)
      .select("session_seq").collect().map(_.getLong(0)).toSeq
    assert(r == Seq(1L, 1L))
  }

  test("sessionStats rolls up count/start/end per session") {
    val r = Sessionize.sessionStats(events, Seq("user"), "ts", maxGap = 200L)
      .orderBy("user", "session_seq")
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
    assert(r.toSeq == Seq(
      ("u1", 1L, 2L, 100L, 150L), ("u1", 2L, 2L, 400L, 450L),
      ("u2", 1L, 1L, 90L, 90L), ("u2", 2L, 1L, 500L, 500L), ("u2", 3L, 1L, 1000L, 1000L)))
  }

  test("TIMESTAMP_NTZ ts column: maxGap interpreted as micros") {
    import java.time.LocalDateTime
    val base = LocalDateTime.of(2024, 1, 1, 0, 0, 0)
    val df = Seq(("u", base), ("u", base.plusSeconds(1)), ("u", base.plusSeconds(10)))
      .toDF("user", "ts")
    assert(df.schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType)
    val r = Sessionize.sessionize(df, Seq("user"), "ts", maxGap = 5000000L) // 5 s
      .orderBy("ts").select("session_seq").collect().map(_.getLong(0)).toSeq
    assert(r == Seq(1L, 1L, 2L))
    // original ts type survives on the output
    val stats = Sessionize.sessionStats(df, Seq("user"), "ts", 5000000L)
    assert(stats.schema("start_ts").dataType == org.apache.spark.sql.types.TimestampNTZType)
  }

  test("TIMESTAMP ts column: maxGap interpreted as micros") {
    val df = Seq(("u", new java.sql.Timestamp(0L)), ("u", new java.sql.Timestamp(1000L)),
        ("u", new java.sql.Timestamp(10000L)))
      .toDF("user", "ts")
    assert(df.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    val r = Sessionize.sessionize(df, Seq("user"), "ts", maxGap = 5000000L) // 5 s
      .orderBy("ts").select("session_seq").collect().map(_.getLong(0)).toSeq
    assert(r == Seq(1L, 1L, 2L))
  }

  test("plan is one window shuffle — no join") {
    val plan = Sessionize.sessionize(events, Seq("user"), "ts", 200L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
  }

  test("sessionizeWithStats: per-event stats equal the per-session rollup") {
    val r = Sessionize.sessionizeWithStats(events, Seq("user"), "ts", 200L)
      .select("user", "ts", "session_seq", "n_events", "start_ts", "end_ts")
      .collect()
      .map(x => (x.getString(0), x.getLong(1)) ->
        (x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5))).toMap
    // every event carries its own session's rollup
    assert(r(("u1", 100L)) == (1L, 2L, 100L, 150L))
    assert(r(("u1", 150L)) == (1L, 2L, 100L, 150L))
    assert(r(("u1", 400L)) == (2L, 2L, 400L, 450L))
    assert(r(("u2", 1000L)) == (3L, 1L, 1000L, 1000L))
  }

  test("sessionizeWithStats == sessionStats + pointInDisjointIntervals " +
      "for points drawn from the sessionized events") {
    val points = events.where(col("ts") % 100 === 0) // an arbitrary subset
    val fused = Sessionize.sessionizeWithStats(events, Seq("user"), "ts", 200L)
      .where(col("ts") % 100 === 0)
      .select(col("user"), col("ts"), col("session_seq"), col("n_events"))
    val sessions = Sessionize.sessionStats(events, Seq("user"), "ts", 200L)
    val composed = graft.ops.RangeJoin.pointInDisjointIntervals(
        points, sessions, Seq("user"), "ts", "start_ts", "end_ts")
      .select(col("user"), col("ts"),
        col("iv_session_seq").as("session_seq"),
        col("iv_n_events").as("n_events"))
    val key = (x: org.apache.spark.sql.Row) =>
      (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3))
    assert(fused.collect().map(key).sorted.toSeq ==
      composed.collect().map(key).sorted.toSeq)
  }

  test("sessionizeWithStats preserves a TIMESTAMP_NTZ ts type on start/end") {
    import java.time.LocalDateTime
    val base = LocalDateTime.of(2024, 1, 1, 0, 0, 0)
    val df = Seq(("u", base), ("u", base.plusSeconds(1)), ("u", base.plusSeconds(10)))
      .toDF("user", "ts")
    val r = Sessionize.sessionizeWithStats(df, Seq("user"), "ts", 5000000L) // 5 s gap
    assert(r.schema("start_ts").dataType == org.apache.spark.sql.types.TimestampNTZType)
    assert(r.schema("end_ts").dataType == org.apache.spark.sql.types.TimestampNTZType)
    val rows = r.select("ts", "session_seq", "n_events")
      .collect().map(x => (x.getAs[LocalDateTime](0), x.getLong(1), x.getLong(2))).toSet
    assert(rows == Set((base, 1L, 2L), (base.plusSeconds(1), 1L, 2L),
      (base.plusSeconds(10), 2L, 1L)))
  }

  test("sessionize_stats TVF == the Scala fused API") {
    events.createOrReplaceTempView("szs_events")
    val viaSql = spark.sql(
      """SELECT user, ts, session_seq, n_events, start_ts, end_ts
         FROM sessionize_stats(TABLE(szs_events), 'user', 'ts', 200L)""")
      .collect().map(_.toSeq).toSet
    val viaApi = Sessionize.sessionizeWithStats(events, Seq("user"), "ts", 200L)
      .select("user", "ts", "session_seq", "n_events", "start_ts", "end_ts")
      .collect().map(_.toSeq).toSet
    assert(viaSql == viaApi && viaApi.nonEmpty)
  }

  test("sessionizeWithStats plan: ONE exchange — the stats window reuses " +
      "the sessionize partitioning") {
    val plan = Sessionize.sessionizeWithStats(events, Seq("user"), "ts", 200L)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, plan)
    assert(!plan.contains("Join"), plan)
  }
}
