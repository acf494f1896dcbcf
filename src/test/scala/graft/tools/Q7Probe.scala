package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{double_units, sum128}
import graft.Tables

/** One-off decomposition of q7_ship_volume's fact stage (r11 verdict item
  * 2): times stripped variants of the 60M-row scan to attribute the
  * per-row cost between decode, filter, broadcast probe, and the
  * sum128 aggregate. Dev scratch — same session conf as StageProf/Bench. */
object Q7Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/graft_sf10"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", (4L << 20).toString)
      .config("spark.sql.autoBroadcastJoinThreshold", 64L << 20)
      .config("spark.sql.files.maxPartitionBytes", 4L << 20)
      .config("spark.sql.files.openCostInBytes", (256L << 10).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def outDq7(c: org.apache.spark.sql.Column) = round(c.cast("double"), 4)
    def li = Tables.load(spark, dir, "lineitem")
    val lo = lit("1995-01-01").cast("timestamp")
    val hi = lit("1997-01-01").cast("timestamp")
    val mid = lit("1996-01-01").cast("timestamp")
    def sup = Tables.load(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))

    def variants: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "a_scan_filter_count" -> (() =>
        li.where(col("l_shipdate") >= lo && col("l_shipdate") < hi)
          .groupBy().agg(count(lit(1)).as("n"))),
      "b_agg_no_join" -> (() =>
        li.where(col("l_shipdate") >= lo && col("l_shipdate") < hi)
          .groupBy(when(col("l_shipdate") < mid, 1995).otherwise(1996).as("y"))
          .agg(outDq7(sum128(double_units(col("l_extendedprice"), 2) *
            (lit(100L) - double_units(col("l_discount"), 2)), 4)).as("v"),
            count(lit(1)).as("n"))),
      "c_join_count" -> (() =>
        li.where(col("l_shipdate") >= lo && col("l_shipdate") < hi)
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_nationkey")).agg(count(lit(1)).as("n"))),
      "e_join_tiny_dim" -> (() => {
        // Same task count and probe count as c, but the broadcast build
        // side is 25 rows instead of 100k: if the per-task stage overhead
        // tracks RELATION SIZE it is a per-task copy/accounting of the
        // hashed relation; if it stays, it's fixed join-stage init.
        val nat = Tables.load(spark, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))
        li.where(col("l_shipdate") >= lo && col("l_shipdate") < hi)
          .join(broadcast(nat),
            pmod(col("l_suppkey"), lit(25)).cast("int") === col("n_nationkey"))
          .groupBy(col("n_nationkey")).agg(count(lit(1)).as("n"))
      }),
      "d_full" -> (() =>
        li.where(col("l_shipdate") >= lo && col("l_shipdate") < hi)
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_nationkey"),
            when(col("l_shipdate") < mid, 1995).otherwise(1996).as("y"))
          .agg(outDq7(sum128(double_units(col("l_extendedprice"), 2) *
            (lit(100L) - double_units(col("l_discount"), 2)), 4)).as("v"),
            count(lit(1)).as("n")))
    )
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for {
          a <- si.completionTime; b <- si.submissionTime
        } yield a - b).getOrElse(-1L)
        val m = si.taskMetrics
        stages.add(f"stage ${si.stageId}%3d ${ms}%6dms tasks=${si.numTasks}%3d " +
          f"input=${m.inputMetrics.recordsRead}%9d rows " +
          f"shufW=${m.shuffleWriteMetrics.recordsWritten}%7d")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val splitMb = sys.env.getOrElse("Q7_SPLIT_MB", "4").toLong
    spark.conf.set("spark.sql.files.maxPartitionBytes", (splitMb << 20).toString)
    for ((name, mk) <- variants) {
      val times = (1 to 3).map { i =>
        spark.catalog.clearCache()
        stages.clear()
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        if (i == 3) {
          Thread.sleep(300)
          stages.forEach(l => println(s"[q7probe]   $l"))
        }
        dt
      }
      println(f"[q7probe] $name%-22s min=${times.min}%.3f runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
