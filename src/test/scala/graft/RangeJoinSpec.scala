package graft

import org.apache.spark.sql.functions._

import graft.ops.RangeJoin

/** Bucketized point-in-interval range join. */
class RangeJoinSpec extends SparkSuite {

  import spark.implicits._

  private lazy val points = Seq(
    ("a", 1L, 5L), ("a", 2L, 25L), ("a", 3L, 55L), ("b", 4L, 5L))
    .toDF("k", "pid", "ts")

  private lazy val intervals = Seq(
    ("a", 10L, 0L, 10L),    // catches pid 1
    ("a", 11L, 20L, 60L),   // long interval: catches pid 2 and 3
    ("a", 12L, 50L, 58L),   // overlapping: also catches pid 3
    ("b", 13L, 6L, 9L))     // misses pid 4 (ts 5 < 6)
    .toDF("k", "iid", "s", "e")

  test("matches every containing interval exactly once, across bucket widths") {
    for (w <- Seq(1L, 3L, 7L, 100L)) {
      val r = RangeJoin.pointInInterval(points, intervals, Seq("k"), "ts", "s", "e",
          bucketWidth = w)
        .select("pid", "iv_iid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(r == Set((1L, 10L), (2L, 11L), (3L, 11L), (3L, 12L)), s"width $w")
    }
  }

  test("inclusive bounds on both ends") {
    val ps = Seq(("a", 1L, 10L), ("a", 2L, 20L)).toDF("k", "pid", "ts")
    val iv = Seq(("a", 9L, 10L, 20L)).toDF("k", "iid", "s", "e")
    val r = RangeJoin.pointInInterval(ps, iv, Seq("k"), "ts", "s", "e", 4L)
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(r == Set(1L, 2L))
  }

  test("TIMESTAMP_NTZ columns: micros precision at sub-second interval edges") {
    import java.time.LocalDateTime
    val t0 = LocalDateTime.of(2024, 1, 1, 10, 0, 0)
    // A seconds-truncating implementation would put both points and the
    // interval start in the same second and wrongly match pid 1.
    val ps = Seq(("a", 1L, t0.plusNanos(200000000L)), ("a", 2L, t0.plusNanos(700000000L)))
      .toDF("k", "pid", "ts")
    val iv = Seq(("a", 9L, t0.plusNanos(500000000L), t0.plusSeconds(1).plusNanos(500000000L)))
      .toDF("k", "iid", "s", "e")
    assert(ps.schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType)
    val r = RangeJoin.pointInInterval(ps, iv, Seq("k"), "ts", "s", "e",
        bucketWidth = 1000000L) // 1 s in micros
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(r == Set(2L))
  }

  test("plan is an equi shuffle/broadcast join — never nested-loop") {
    val plan = RangeJoin.pointInInterval(points, intervals, Seq("k"), "ts", "s", "e", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
    assert(!plan.contains("Cartesian"), plan)
  }
}
