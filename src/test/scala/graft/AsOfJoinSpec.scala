package graft

import org.apache.spark.sql.functions._

import graft.ops.AsOfJoin

/** As-of join: backward/forward, tolerance, left-outer semantics. */
class AsOfJoinSpec extends SparkSuite {

  import spark.implicits._

  private lazy val facts = Seq(
    ("a", 10L, "f1"), ("a", 20L, "f2"), ("a", 30L, "f3"),
    ("b", 15L, "f4"), ("c", 5L, "f5"))
    .toDF("k", "ts", "fact")

  private lazy val quotes = Seq(
    ("a", 5L, 1.0), ("a", 20L, 2.0), ("a", 25L, 3.0),
    ("b", 100L, 4.0))
    .toDF("k", "ts", "price")

  test("backward as-of picks the greatest right ts <= left ts; unmatched stay NULL") {
    val r = AsOfJoin.asof(facts, quotes, Seq("k"), "ts", "ts")
      .select("fact", "asof_price").collect()
      .map(x => x.getString(0) -> (if (x.isNullAt(1)) null else x.getDouble(1))).toMap
    assert(r("f1") == 1.0)   // a@10 -> quote@5
    assert(r("f2") == 2.0)   // a@20 -> quote@20 (<= includes equality)
    assert(r("f3") == 3.0)   // a@30 -> quote@25
    assert(r("f4") == null)  // b@15: only quote is at 100 (future)
    assert(r("f5") == null)  // c has no quotes at all
  }

  test("forward as-of picks the smallest right ts >= left ts") {
    val r = AsOfJoin.asof(facts, quotes, Seq("k"), "ts", "ts", direction = "forward")
      .select("fact", "asof_price").collect()
      .map(x => x.getString(0) -> (if (x.isNullAt(1)) null else x.getDouble(1))).toMap
    assert(r("f1") == 2.0)   // a@10 -> quote@20
    assert(r("f2") == 2.0)   // equality
    assert(r("f3") == null)  // nothing after 30 for a
    assert(r("f4") == 4.0)   // b@15 -> quote@100
  }

  test("tolerance nulls matches beyond the gap") {
    val r = AsOfJoin.asof(facts, quotes, Seq("k"), "ts", "ts",
        tolerance = Some(5L))
      .select("fact", "asof_price").collect()
      .map(x => x.getString(0) -> (if (x.isNullAt(1)) null else x.getDouble(1))).toMap
    assert(r("f1") == 1.0)   // gap 5 <= 5
    assert(r("f2") == 2.0)   // gap 0
    assert(r("f3") == 3.0)   // gap 5
    val tight = AsOfJoin.asof(facts, quotes, Seq("k"), "ts", "ts",
        tolerance = Some(1L))
      .select("fact", "asof_price").collect()
      .map(x => x.getString(0) -> (if (x.isNullAt(1)) null else x.getDouble(1))).toMap
    assert(tight("f1") == null && tight("f2") == 2.0)
  }

  test("timestamp ts columns: comparison and tolerance in micros") {
    def t(ms: Long) = new java.sql.Timestamp(ms)
    val l = Seq(("a", t(10000), "f1")).toDF("k", "ts", "fact")
    val r = Seq(("a", t(8000), 1.0), ("a", t(2000), 2.0)).toDF("k", "ts", "price")
    val base = AsOfJoin.asof(l, r, Seq("k"), "ts", "ts").select("asof_price").collect()
    assert(base.head.getDouble(0) == 1.0)
    // the matched gap is 2 s = 2,000,000 us
    val tight = AsOfJoin.asof(l, r, Seq("k"), "ts", "ts", tolerance = Some(1999999L))
      .select("asof_price").collect()
    assert(tight.head.isNullAt(0))
    val loose = AsOfJoin.asof(l, r, Seq("k"), "ts", "ts", tolerance = Some(2000000L))
      .select("asof_price").collect()
    assert(loose.head.getDouble(0) == 1.0)
  }

  test("tolerance works when rightTs is also a partition column") {
    val l = Seq(("a", 10L, "f1"), ("b", 20L, "f2")).toDF("k", "ts", "fact")
    val r = Seq(("a", 10L, 1.0), ("b", 99L, 2.0)).toDF("k", "ts", "price")
    val out = AsOfJoin.asof(l, r, Seq("k", "ts"), "ts", "ts", tolerance = Some(0L))
      .select("fact", "asof_price").collect()
      .map(x => x.getString(0) -> (if (x.isNullAt(1)) null else x.getDouble(1))).toMap
    assert(out("f1") == 1.0 && out("f2") == null)
  }

  test("plan is one window shuffle — no join node, no cartesian") {
    val plan = AsOfJoin.asof(facts, quotes, Seq("k"), "ts", "ts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("Window"), plan)
  }
}
