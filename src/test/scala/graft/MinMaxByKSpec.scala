package graft

import org.apache.spark.sql.functions._

import graft.api.Vss
import graft.functions._

class MinMaxByKSpec extends SparkSuite {
  import spark.implicits._

  private def grid = {
    // F4 fixture: 729-grid with ids (hnsw_join_macro.test:6-19).
    val r = spark.range(1, 10).select(col("id").cast("int"))
    r.select(col("id").as("a"))
      .crossJoin(r.select(col("id").as("b")))
      .crossJoin(r.select(col("id").as("c")))
      .select(
        array(col("a").cast("float"), col("b").cast("float"), col("c").cast("float")).as("vec"))
      .withColumn("id", monotonically_increasing_id())
  }

  test("min_by_k returns k best values ascending") {
    val df = Seq((1, 10.0), (2, 5.0), (3, 7.0), (4, 1.0), (5, 99.0)).toDF("v", "o")
    val got = df.agg(min_by_k($"v", $"o", 3)).as[Seq[Int]].head()
    assert(got == Seq(4, 2, 3))
    val gotMax = df.agg(max_by_k($"v", $"o", 2)).as[Seq[Int]].head()
    assert(gotMax == Seq(5, 1))
  }

  test("min_by_k ignores null orders and values, handles k > n") {
    val df = Seq(
      (Some(1), Some(3.0)), (None, Some(1.0)), (Some(3), None), (Some(4), Some(2.0)))
      .toDF("v", "o")
    val got = df.agg(min_by_k($"v", $"o", 10)).as[Seq[Int]].head()
    assert(got == Seq(4, 1))
  }

  test("min_by_k SQL 3-arg + built-in 2-arg min_by still works") {
    Seq((1, 5.0), (2, 1.0), (3, 3.0)).toDF("v", "o").createOrReplaceTempView("mbk")
    assert(spark.sql("SELECT min_by(v, o, 2) FROM mbk").as[Seq[Int]].head() == Seq(2, 3))
    assert(spark.sql("SELECT min_by(v, o) FROM mbk").as[Int].head() == 2)
    assert(spark.sql("SELECT max_by(v, o) FROM mbk").as[Int].head() == 1)
  }

  test("min_by_k merges across partitions (map-side partial agg)") {
    val df = spark.range(0, 10000, 1, 16)
      .select(col("id"), (col("id") % 997).cast("double").as("o"))
    val got = df.agg(min_by_k($"id", $"o", 5)).as[Seq[Long]].head()
    // o == 0 for ids 0, 997*k ascending by id? ties on o → any of the 0-mod ids;
    // distances tie so just check the orders are the smallest.
    val orders = got.map(_ % 997)
    assert(orders.forall(_ <= 1))
    assert(got.size == 5)
  }

  test("hnsw_topk.test:28-31 — list_sum(flatten(min_by(vec, dist, 3))) in [45,50]") {
    val g = grid
    val got = g.agg(min_by_k($"vec", array_distance($"vec", lit_vector(Array(5f, 5f, 5f))), 3).as("vecs"))
      .select(aggregate(flatten($"vecs"), lit(0.0), (acc, x) => acc + x).as("s"))
      .as[Double].head()
    // (5,5,5) has dist 0 (sum 15); the six dist-1 neighbours have sums
    // {14,16}×3 — any valid top-3 totals 15 + two of {14,16} ∈ [43,47].
    // (The reference's asserted [45,50] just reflects its tie choice.)
    assert(got >= 43.0 && got <= 47.0, s"got $got")
  }

  test("vss_join: bool_and(score <= 1.0) for grid k=3 (hnsw_join_macro.test:22-35)") {
    val s = Seq(
      Tuple1(Array(5f, 5f, 5f)), Tuple1(Array(1f, 1f, 1f))).toDF("s_vec")
    val joined = Vss.vssJoin(s, grid, "s_vec", "vec", 3, "l2sq")
    assert(joined.count() == 6)
    val maxScore = joined.agg(max($"score")).as[Double].head()
    assert(maxScore <= 1.0, s"max score $maxScore")
  }

  test("vss_match: len(matches) = 3 per row (hnsw_join_macro.test:37-47)") {
    val s = Seq(
      Tuple1(Array(5f, 5f, 5f)), Tuple1(Array(1f, 1f, 1f))).toDF("s_vec")
    val matched = Vss.vssMatch(s, grid, "s_vec", "vec", 3, "l2sq")
    assert(matched.columns.toSeq == Seq("s_vec", "matches"))
    val sizes = matched.select(size($"matches")).as[Int].collect()
    assert(sizes.toSeq == Seq(3, 3))
    // best-first ordering: scores non-decreasing inside each match list
    val scores = matched.select(transform($"matches", m => m.getField("score")).as("ss"))
      .as[Seq[Double]].collect()
    scores.foreach(ss => assert(ss == ss.sorted))
  }

  test("vss_join cosine metric keeps k largest") {
    val l = Seq(Tuple1(Array(1f, 0f))).toDF("lv")
    val r = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0.9f, 0.1f)), (3L, Array(-1f, 0f)), (4L, Array(0f, 1f)))
      .toDF("rid", "rv")
    val got = Vss.vssJoin(l, r, "lv", "rv", 2, "cosine")
      .select($"right_tbl.rid").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("equal order keys tie-break deterministically on the value") {
    // 10 rows, all with the same order key; k=3 must keep the 3 smallest
    // values regardless of partitioning (ADVICE r1 determinism item).
    val df = spark.range(10).select((col("id") + 100).as("v"), lit(1.0).as("o"))
      .repartition(4)
    val got = df.agg(min_by_k(col("v"), col("o"), 3)).collect().head.getSeq[Long](0)
    assert(got == Seq(100L, 101L, 102L))
    val gotMax = df.agg(max_by_k(col("v"), col("o"), 3)).collect().head.getSeq[Long](0)
    assert(gotMax == Seq(109L, 108L, 107L))
  }
}
