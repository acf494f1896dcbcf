package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: print a gate's optimized + executed plan under Bench's
  * session configuration (StageProf's sibling — structure, not timing).
  *
  *   sbt 'Test/runMain graft.tools.PlanDump doc_pipeline_e2e /tmp/graft_sf10'
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", 32)
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
    args.drop(2).foreach { kv =>
      val i = kv.indexOf('='); spark.conf.set(kv.take(i), kv.drop(i + 1))
    }
    val df = graft.SparkEntry.queries(name)(spark, dir)
    println("=== OPTIMIZED ===")
    println(df.queryExecution.optimizedPlan.treeString)
    println("=== EXECUTED (pre-AQE) ===")
    println(df.queryExecution.executedPlan.treeString)
    spark.stop()
  }
}
