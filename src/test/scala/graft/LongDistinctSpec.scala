package graft

import org.apache.spark.sql.functions._

import graft.aggregates.LongSet
import graft.functions.count_distinct_long

/** Exact unboxed COUNT(DISTINCT) aggregate (q12 kernel). */
class LongDistinctSpec extends SparkSuite {

  import spark.implicits._

  test("LongSet: zero, negatives, duplicates, growth past initial capacity") {
    val s = new LongSet(8)
    val keys = (-500L to 500L) ++ (-500L to 500L) ++ Seq(Long.MinValue, Long.MaxValue)
    keys.foreach(s.add)
    assert(s.size == 1003L) // 1001 distinct + the two extremes
    var seen = Set.empty[Long]
    s.foreach(seen += _)
    assert(seen == ((-500L to 500L).toSet + Long.MinValue + Long.MaxValue))
  }

  test("matches countDistinct across groups, with nulls and zero keys") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 20000).map { i =>
      val g = s"g${i % 5}"
      val v: java.lang.Long =
        if (rnd.nextInt(20) == 0) null
        else rnd.nextInt(700).toLong - 350 // includes 0 and negatives
      (g, v)
    }
    val df = rows.toDF("g", "v").repartition(7) // force partial/merge path
    val got = df.groupBy("g")
      .agg(count_distinct_long(col("v")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = df.groupBy("g")
      .agg(countDistinct(col("v")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("SQL registration and integer-typed input") {
    Seq((1, 10), (1, 10), (1, 20), (2, 30)).toDF("g", "v")
      .createOrReplaceTempView("cdl_t")
    val r = spark.sql(
      "SELECT g, count_distinct_long(v) AS n FROM cdl_t GROUP BY g ORDER BY g")
      .collect().map(x => (x.getInt(0), x.getLong(1))).toSeq
    assert(r == Seq((1, 2L), (2, 1L)))
    val err = intercept[Exception] {
      spark.sql("SELECT count_distinct_long(CAST(1.5 AS DOUBLE))").collect()
    }
    assert(err.getMessage.contains("integral"))
  }

  test("multi-distinct plan: single ObjectHashAggregate, no Expand") {
    val df = Seq((1L, 2L, "a")).toDF("a", "b", "g")
      .groupBy("g")
      .agg(count_distinct_long(col("a")), count_distinct_long(col("b")),
        count(lit(1)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Expand"), plan)
    // The builtin spelling of the same query DOES expand — the kernel's
    // reason to exist; guard that the assertion above stays meaningful.
    val builtin = Seq((1L, 2L, "a")).toDF("a", "b", "g")
      .groupBy("g")
      .agg(countDistinct(col("a")), countDistinct(col("b")), count(lit(1)))
    assert(builtin.queryExecution.executedPlan.toString.contains("Expand"))
  }
}
