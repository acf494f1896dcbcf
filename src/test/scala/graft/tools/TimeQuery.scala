package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch query timer: `sbt "Test/runMain graft.tools.TimeQuery <key> [sfDir] [reps]"`
  * — Bench methodology (noop write, min of reps) for one gate query. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val key = args.headOption.getOrElse("doc_jaccard_join")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val times = (1 to reps).map { _ =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(key)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"TIMING $key: min=${times.min}%.3f s runs=${times.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
