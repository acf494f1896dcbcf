package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Design spike (round-10 verdict item 7): would a BUCKETED lineitem layout
 * remove q2's residual — the 60M-row fact exchange — and is measuring on
 * it fair?
 *
 * Writes lineitem once as a Spark bucketed table (hash(l_orderkey) into N
 * buckets, the storage-partitioned-join layout a 100 TB warehouse would
 * maintain), then times q2's fact join against the flat parquet and the
 * bucketed table in the same session, interleaved. The bucketed scan
 * reports HashPartitioning(l_orderkey, N), so EnsureRequirements drops
 * the fact-side exchange and only the collapsed dim map shuffles.
 *
 *   sbt 'Test/runMain graft.tools.BucketSpike /tmp/graft_sf10 32 3'
 *
 * The DuckDB side of the fairness question is measured separately on the
 * SAME bucketed files (they are plain parquet to DuckDB) — see
 * PERF_VS_DUCKDB.md for the recorded decision.
 */
object BucketSpike {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/graft_sf10"
    val buckets = if (args.length > 1) args(1).toInt else 32
    val rounds = if (args.length > 2) args(2).toInt else 3
    val wh = "/tmp/graft_bucket_wh"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-bucketspike")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", (4L << 20).toString)
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.files.maxPartitionBytes", (4L << 20).toString)
      .config("spark.sql.files.openCostInBytes", (256L << 10).toString)
      .config("spark.sql.warehouse.dir", wh)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // One-time bucketed write, keyed by (dir, buckets) so a rerun with
    // different arguments can never silently reuse a stale table.
    val tbl = s"lineitem_b_${buckets}_${java.lang.Integer.toHexString(dir.hashCode)}"
    if (!spark.catalog.tableExists(tbl)) {
      // Repartition by the bucket key first: without it every map task
      // writes a file per bucket (326 tasks x 32 buckets = 10k tiny files
      // on the first attempt — the scan-side cost swamped the exchange
      // saving). One file per bucket is the layout a warehouse maintains.
      spark.read.parquet(s"$dir/lineitem.parquet")
        .repartition(buckets, col("l_orderkey"))
        .write.bucketBy(buckets, "l_orderkey")
        .mode("overwrite").format("parquet").saveAsTable(tbl)
      println(s"[spike] wrote $tbl ($buckets buckets) under $wh")
    }

    import graft.functions.{double_units, sum128}
    def q2(li: DataFrame): DataFrame = {
      val o = spark.read.parquet(s"$dir/orders.parquet")
      val c = spark.read.parquet(s"$dir/customer.parquet")
      val n = spark.read.parquet(s"$dir/nation.parquet")
      val dim = o.select(col("o_orderkey"), col("o_custkey"))
        .join(c.select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(n.select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("o_orderkey"), col("n_name"))
      li.select(col("l_orderkey"),
          (double_units(col("l_extendedprice"), 2) *
            (lit(100L) - double_units(col("l_discount"), 2))).as("_rev"))
        .join(dim.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name"))
        .agg(round(sum128(col("_rev"), 4).cast("double"), 4).as("revenue"),
          count(lit(1)).as("n_rows"))
        .orderBy("n_name")
    }

    def time(tag: String, df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      graft.spark.ExecTuning.withSizedAqe(df) {
        df.write.format("noop").mode("overwrite").save()
      }
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[spike] $tag%-8s $s%.3f s")
      s
    }

    // Warm both paths, then interleave measured rounds.
    time("warm-flat", q2(spark.read.parquet(s"$dir/lineitem.parquet")))
    time("warm-bkt", q2(spark.table(tbl)))
    val flat = (1 to rounds).map(_ => time("flat", q2(spark.read.parquet(s"$dir/lineitem.parquet"))))
    val bkt = (1 to rounds).map(_ => time("bucketed", q2(spark.table(tbl))))
    println(f"[spike] MIN flat=${flat.min}%.3f s bucketed=${bkt.min}%.3f s buckets=$buckets")
    println("[spike] bucketed plan:")
    q2(spark.table(tbl)).explain("formatted")
    spark.stop()
  }
}
