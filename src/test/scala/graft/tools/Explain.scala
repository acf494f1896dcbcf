package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch plan auditor: `sbt "Test/runMain graft.tools.Explain <key> [sfDir]"`
  * prints the executed plan of one gate query — the `.explain` feedback loop
  * the build instructions call for, runnable without a REPL. */
object Explain {
  def main(args: Array[String]): Unit = {
    val key = args.headOption.getOrElse("doc_jaccard_join")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(key)(spark, dir)
    println("=== EXECUTED PLAN: " + key)
    println(df.queryExecution.executedPlan.toString.linesIterator
      .map(_.take(200)).mkString("\n"))
    spark.stop()
  }
}
