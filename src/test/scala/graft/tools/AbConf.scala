package graft.tools

import org.apache.spark.sql.SparkSession

/** In-session A/B of one session conf over one SparkEntry gate: runs the
  * gate 2×N times alternating the conf's values (ABBA order) in a single
  * JVM, which removes the cross-session window noise that swamped the
  * round-11 splitsPerCore comparison (±30% between sbt launches vs ±5%
  * within one session). Mirrors Bench's session conf like StageProf.
  *
  *   sbt 'Test/runMain graft.tools.AbConf q2_join_agg /tmp/graft_sf10 \
  *        spark.graft.scan.splitsPerCore 4 1'
  */
object AbConf {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: AbConf <gate> <dir> <confKey> <v1> [v2 ...]")
    val name = args(0)
    val dir = args(1)
    val key = args(2)
    val values = args.drop(3).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // Harness-level opt-in for ensureBucketed's sorted layouts (r14:
      // the library no longer sets it — mirror Bench/Verify).
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", (4L << 20).toString)
      .config("spark.sql.autoBroadcastJoinThreshold", 64L << 20)
      .config("spark.sql.files.maxPartitionBytes", 4L << 20)
      .config("spark.sql.files.openCostInBytes", (256L << 10).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    def once(): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      // Construct ONCE and reuse, exactly like Bench — a second fn() call
      // would re-run any construction-eager work (e.g. Mix's RDD barrier
      // under AQE) and double-charge it.
      val df = fn(spark, dir)
      graft.spark.ExecTuning.withSizedAqe(df) {
        df.write.format("noop").mode("overwrite").save()
      }
      (System.nanoTime() - t0) / 1e9
    }
    once() // warmup at default conf
    val rounds = sys.env.getOrElse("AB_ROUNDS", "3").toInt
    val times = scala.collection.mutable.Map[String, List[Double]]()
    // ABBA ordering: each round visits values forward then backward so
    // slow-window drift within the session cancels to first order.
    for (r <- 1 to rounds; v <- (if (r % 2 == 1) values else values.reverse)) {
      spark.conf.set(key, v)
      val t = once()
      times(v) = t :: times.getOrElse(v, Nil)
    }
    for (v <- values) {
      val ts = times(v).reverse
      println(f"[abconf] $name $key=$v%-6s min=${ts.min}%.3f med=${ts.sorted.apply(ts.size / 2)}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
