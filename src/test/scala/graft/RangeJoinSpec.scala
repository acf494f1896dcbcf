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

  // --- disjoint-interval merge path ---

  private lazy val disjointIntervals = Seq(
    ("a", 10L, 0L, 10L), ("a", 11L, 20L, 60L), ("a", 12L, 70L, 80L),
    ("b", 13L, 6L, 9L))
    .toDF("k", "iid", "s", "e")

  test("disjoint path agrees with the bucketized join on disjoint intervals") {
    // Randomized: per key, strictly separated intervals + scattered points.
    val rnd = new scala.util.Random(42)
    val ivRows = for (k <- Seq("x", "y", "z"); i <- 0 until 20) yield {
      val s = i * 100L + rnd.nextInt(30)
      (k, k.hashCode.toLong * 100 + i, s, s + rnd.nextInt(60)) // e < next s
    }
    val pRows = for (k <- Seq("x", "y", "z", "w"); i <- 0 until 200)
      yield (k, k.hashCode.toLong * 1000 + i, rnd.nextInt(2200).toLong)
    val iv = ivRows.toDF("k", "iid", "s", "e")
    val ps = pRows.toDF("k", "pid", "ts")
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.select("pid", "iv_iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketized = collect(
      RangeJoin.pointInInterval(ps, iv, Seq("k"), "ts", "s", "e", 50L))
    val merged = collect(
      RangeJoin.pointInDisjointIntervals(ps, iv, Seq("k"), "ts", "s", "e"))
    assert(merged == bucketized)
    assert(merged.nonEmpty)
  }

  test("NULL-endpoint intervals are dropped by BOTH paths identically") {
    // A null start used to sort first in the disjoint path's window and
    // match from -infinity, while the bucketized path's sequence over a
    // null start explodes to nothing — same input, different rows from
    // documented-equivalent paths.
    val iv = Seq(("a", 1L, Option.empty[Long], Option(100L)),
      ("a", 2L, Option(200L), Option.empty[Long]),
      ("a", 3L, Option(300L), Option(400L)))
      .toDF("k", "iid", "s", "e")
    val ps = Seq(("a", 10L, 50L), ("a", 11L, 250L), ("a", 12L, 350L))
      .toDF("k", "pid", "ts")
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.select("pid", "iv_iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketized = collect(
      RangeJoin.pointInInterval(ps, iv, Seq("k"), "ts", "s", "e", 50L))
    val merged = collect(
      RangeJoin.pointInDisjointIntervals(ps, iv, Seq("k"), "ts", "s", "e"))
    assert(merged == bucketized)
    assert(merged == Set((12L, 3L))) // only the fully-bounded interval matches
  }

  test("disjoint path: inclusive bounds, point at interval start, misses between") {
    val ps = Seq(("a", 1L, 0L), ("a", 2L, 10L), ("a", 3L, 15L), ("a", 4L, 20L),
      ("a", 5L, 60L), ("a", 6L, 65L), ("a", 7L, 99L), ("b", 8L, 5L))
      .toDF("k", "pid", "ts")
    val r = RangeJoin.pointInDisjointIntervals(ps, disjointIntervals,
        Seq("k"), "ts", "s", "e")
      .select("pid", "iv_iid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    // 3 (ts 15, between intervals), 6..7 (after), 8 (b before its interval) drop.
    assert(r == Set((1L, 10L), (2L, 10L), (4L, 11L), (5L, 11L)))
  }

  test("disjoint path costs exactly one shuffle") {
    val plan = RangeJoin.pointInDisjointIntervals(points, disjointIntervals,
        Seq("k"), "ts", "s", "e")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, plan)
    assert(!plan.contains("Join"), plan)
  }

  test("suggestBucketWidth survives a zero-length-majority (session-like) tail") {
    // 80% zero-length intervals (single-event sessions): the median is 0 —
    // a p50-derived width would explode the tail intervals into thousands
    // of buckets. The p90 default keeps the blowup bounded.
    val iv = ((0 until 800).map(i => ("k", i.toLong, i * 10000L, i * 10000L)) ++
      (0 until 200).map(i => ("s", 1000L + i, i * 10000L, i * 10000L + 3600L)))
      .toDF("k", "iid", "s", "e")
    val w = RangeJoin.suggestBucketWidth(iv, "s", "e")
    assert(w >= 1L)
    // Blowup factor at the suggested width: average exploded rows per
    // interval stays ~2 (the explicit check the gate design relies on).
    val blowup = iv.selectExpr(s"avg((e div $w) - (s div $w) + 1) AS b")
      .head().getDouble(0)
    assert(blowup <= 3.0, s"width $w blowup $blowup")
    // All-zero-length degenerate input still yields a valid width.
    val z = Seq(("k", 1L, 5L, 5L)).toDF("k", "iid", "s", "e")
    assert(RangeJoin.suggestBucketWidth(z, "s", "e") == 1L)
    // ZERO rows (upstream filter matched nothing): approx_percentile is
    // NULL — must land on the documented floor, not NPE.
    assert(RangeJoin.suggestBucketWidth(z.where(lit(false)), "s", "e") == 1L)
  }
}
