package graft

import org.apache.spark.sql.functions._

import graft.ops.ColumnarUnitsSum

/** The vectorized grid-sum kernel (r15): value-identity with its own
  * declarative fallback (the semantics reference) across randomized
  * corpora — nulls, dim misses, range boundaries, multi-bucket, both
  * measure shapes — plus 128-bit carry correctness and the q7 gate's
  * old-vs-new spelling equality on the fixture. */
class ColumnarUnitsSumSpec extends SparkSuite {
  import spark.implicits._

  private def collectGrid(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getInt(0), r.getInt(1),
      r.getDecimal(2).stripTrailingZeros(), r.getLong(3))).toSet

  test("kernel path == declarative fallback on randomized corpora " +
      "(nulls, dim misses, boundaries, both measure shapes)") {
    val rnd = new scala.util.Random(7)
    val dim = (0 until 40).map(i => (i.toLong * 977 + 3, i % 7)) // non-dense keys
      .toDF("k", "g")
    val dimKeys = (0 until 40).map(_.toLong * 977 + 3)
    val rows = (1 to 4000).map { i =>
      val ts: java.lang.Long =
        if (i % 97 == 0) null
        else Long.box(rnd.nextLong(2000L)) // range will be [500, 1500)
      val key: java.lang.Long =
        if (i % 89 == 0) null
        else if (rnd.nextInt(5) == 0) Long.box(999999L) // dim miss
        else Long.box(dimKeys(rnd.nextInt(dimKeys.length)))
      val a: java.lang.Double =
        if (i % 101 == 0) null else Double.box(rnd.nextInt(20000) / 100.0)
      val b: java.lang.Double =
        if (i % 103 == 0) null else Double.box(rnd.nextInt(100) / 100.0)
      (ts, key, a, b)
    }
    val mem = rows.toDF("ts", "k", "a", "b") // LocalRelation -> fallback path
    val path = java.nio.file.Files.createTempDirectory("cus-spec").toString
    mem.write.mode("overwrite").parquet(path)
    val pq = spark.read.parquet(path) // vectorized scan -> kernel path

    for (bounds <- Seq(Array.empty[Long], Array(1000L), Array(700L, 900L, 1200L));
         mb <- Seq(None, Some((100L, "b", 2)))) {
      val viaKernel = ColumnarUnitsSum.gridSum(pq, "ts", 500L, 1500L, bounds,
        "k", dim, "k", "g", ("a", 2), mb, outScale = if (mb.isEmpty) 2 else 4)
      // The kernel path materializes eagerly: its plan is a local relation.
      assert(viaKernel.queryExecution.optimizedPlan.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.logical.LocalRelation],
        "parquet input did not take the kernel path")
      val viaFallback = ColumnarUnitsSum.gridSum(mem, "ts", 500L, 1500L, bounds,
        "k", dim, "k", "g", ("a", 2), mb, outScale = if (mb.isEmpty) 2 else 4)
      assert(!viaFallback.queryExecution.optimizedPlan.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
      assert(collectGrid(viaKernel) == collectGrid(viaFallback),
        s"bounds=${bounds.toSeq} measureB=$mb")
      assert(collectGrid(viaKernel).nonEmpty)
    }
  }

  test("128-bit accumulation: sums past Long.MaxValue are exact") {
    // 30k rows x 9e14 units = 2.7e19 > 2^63-1 (~9.2e18): a 64-bit grid
    // register would wrap; the two-long carry must not.
    val path = java.nio.file.Files.createTempDirectory("cus-overflow").toString
    spark.range(30000)
      .select(lit(100L).as("ts"), lit(1L).as("k"), lit(9.0e14).as("a"))
      .write.mode("overwrite").parquet(path)
    val dim = Seq((1L, 0)).toDF("k", "g")
    val got = ColumnarUnitsSum.gridSum(spark.read.parquet(path), "ts", 0L, 200L,
      Array.empty, "k", dim, "k", "g", ("a", 0), None, outScale = 0)
      .collect()
    assert(got.length == 1)
    assert(got.head.getDecimal(2) ==
      new java.math.BigDecimal("27000000000000000000")) // 3e4 * 9e14
    assert(got.head.getLong(3) == 30000L)
  }

  test("q7 gate: ColumnarUnitsSum spelling == the r14 declarative spelling " +
      "on the fixture") {
    import graft.functions.{double_units, sum128}
    val dir = sf("0.001")
    val gate = graft.queries.RelationalQueries
      .queries("q7_ship_volume")(spark, dir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2),
        r.getLong(3))).toSet
    val li = Tables.load(spark, dir, "lineitem")
      .where(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
    val sup = Tables.load(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    val old = li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey"),
        when(col("l_shipdate") < lit("1996-01-01").cast("timestamp"), 1995)
          .otherwise(1996).as("ship_year"))
      .agg(round(sum128(double_units(col("l_extendedprice"), 2) *
          (lit(100L) - double_units(col("l_discount"), 2)), 4)
        .cast("double"), 4).as("volume"),
        count(lit(1)).as("n_rows"))
      .join(broadcast(Tables.load(spark, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("ship_year"), col("volume"), col("n_rows"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2),
        r.getLong(3))).toSet
    assert(gate == old)
    assert(gate.nonEmpty)
  }

  test("guards: empty range, bad bounds, oversized dim group ids, " +
      "non-parquet falls back rather than failing") {
    val dim = Seq((1L, 0)).toDF("k", "g")
    val df = Seq((1L, 1L, 1.0)).toDF("ts", "k", "a")
    intercept[IllegalArgumentException](ColumnarUnitsSum.gridSum(df, "ts",
      5L, 5L, Array.empty, "k", dim, "k", "g", ("a", 2), None, 2))
    intercept[IllegalArgumentException](ColumnarUnitsSum.gridSum(df, "ts",
      0L, 10L, Array(20L), "k", dim, "k", "g", ("a", 2), None, 2))
    val badDim = Seq((1L, 1 << 23)).toDF("k", "g")
    intercept[IllegalArgumentException](ColumnarUnitsSum.gridSum(df, "ts",
      0L, 10L, Array.empty, "k", badDim, "k", "g", ("a", 2), None, 2))
    // In-memory frame: total, via the declarative path.
    val ok = ColumnarUnitsSum.gridSum(df, "ts", 0L, 10L, Array.empty,
      "k", dim, "k", "g", ("a", 2), None, 2).collect()
    assert(ok.length == 1 && ok.head.getLong(3) == 1L)
  }

  test("pre-filtered parquet fact falls back (bare-lineage guard) and the " +
      "filter is honored") {
    // A predicate above the scan reaches parquet only as row-group stats:
    // the kernel consuming batches directly would silently keep rows the
    // filter should drop. The guard must route this to the declarative
    // path, whose result honors the filter exactly.
    val path = java.nio.file.Files.createTempDirectory("cus-filtered").toString
    (1 to 1000).map(i => (i.toLong, 1L, 1.0, i % 2))
      .toDF("ts", "k", "a", "flag")
      .write.mode("overwrite").parquet(path)
    val dim = Seq((1L, 0)).toDF("k", "g")
    val filtered = spark.read.parquet(path).where(col("flag") === 1)
    val got = ColumnarUnitsSum.gridSum(filtered, "ts", 0L, 2000L, Array.empty,
      "k", dim, "k", "g", ("a", 0), None, 0)
    assert(!got.queryExecution.optimizedPlan.isInstanceOf[
      org.apache.spark.sql.catalyst.plans.logical.LocalRelation],
      "filtered lineage must NOT take the eager kernel path")
    val rows = got.collect()
    assert(rows.length == 1 && rows.head.getLong(3) == 500L,
      s"filter must be honored: ${rows.toSeq}")
    // Sanity: the SAME data unfiltered takes the kernel and counts all rows.
    val bare = ColumnarUnitsSum.gridSum(spark.read.parquet(path), "ts", 0L,
      2000L, Array.empty, "k", dim, "k", "g", ("a", 0), None, 0).collect()
    assert(bare.head.getLong(3) == 1000L)
  }

  test("duplicate dim keys fail loudly on both paths") {
    val dupDim = Seq((1L, 0), (1L, 1)).toDF("k", "g")
    val mem = Seq((1L, 1L, 1.0)).toDF("ts", "k", "a")
    val e1 = intercept[IllegalArgumentException](ColumnarUnitsSum.gridSum(
      mem, "ts", 0L, 10L, Array.empty, "k", dupDim, "k", "g", ("a", 0), None, 0))
    assert(e1.getMessage.contains("duplicate dim key"))
    val path = java.nio.file.Files.createTempDirectory("cus-dup").toString
    mem.write.mode("overwrite").parquet(path)
    val e2 = intercept[IllegalArgumentException](ColumnarUnitsSum.gridSum(
      spark.read.parquet(path), "ts", 0L, 10L, Array.empty, "k", dupDim,
      "k", "g", ("a", 0), None, 0))
    assert(e2.getMessage.contains("duplicate dim key"))
  }
}
