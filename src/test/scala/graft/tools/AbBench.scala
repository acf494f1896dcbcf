package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * In-session ABBA A/B harness: times a gate query under two values of one
 * session conf, alternating A B B A (x reps), and prints per-arm minima.
 * Cross-session bench comparisons on this box carry 20-50% window drift
 * (CPU probe 0.58-0.84 s single-thread across rounds); alternating arms
 * inside one session subtracts that drift from the comparison.
 *
 *   sbt 'Test/runMain graft.tools.AbBench <sfDir> <q1,q2,..> <key=valA|valB> [reps]'
 *
 * Test scope: measurement apparatus, not product surface.
 */
object AbBench {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "args: <sfDir> <q1,q2,...> <key=valA|valB> [reps]")
    val dir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val (key, vals) = {
      val i = args(2).indexOf('=')
      require(i > 0, s"third arg must be key=valA|valB, got ${args(2)}")
      val vs = args(2).drop(i + 1).split("\\|")
      require(vs.length == 2, "need exactly two |-separated values")
      (args(2).take(i), (vs(0), vs(1)))
    }
    val reps = if (args.length > 3) args(3).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-abbench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", (4L << 20).toString)
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.files.maxPartitionBytes", (4L << 20).toString)
      .config("spark.sql.files.openCostInBytes", (256L << 10).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def once(v: String): Double = {
        spark.conf.set(key, v)
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        graft.spark.ExecTuning.withSizedAqe(df) {
          df.write.format("noop").mode("overwrite").save()
        }
        (System.nanoTime() - t0) / 1e9
      }
      // Warm both arms once (codegen, page cache, layout builds).
      once(vals._1); once(vals._2)
      var a = List.empty[Double]
      var b = List.empty[Double]
      (1 to reps).foreach { _ =>
        a ::= once(vals._1); b ::= once(vals._2)
        b ::= once(vals._2); a ::= once(vals._1)
      }
      println(f"ABBA $name%-26s $key A=${vals._1}: min=${a.min}%.3f " +
        f"med=${a.sorted.apply(a.size / 2)}%.3f | B=${vals._2}: min=${b.min}%.3f " +
        f"med=${b.sorted.apply(b.size / 2)}%.3f  (B/A min=${b.min / a.min}%.2f)")
    }
    spark.stop()
  }
}
