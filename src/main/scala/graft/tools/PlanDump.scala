package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

import graft.SparkEntry

/** Dump `.explain("formatted")` for named gate queries to files —
  * the plan receipts the optimization rounds commit under plans/rNN/.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> <q1,q2,...|all> [key=value ...]
  *
  * Trailing key=value args become session conf — lets a knob reproduce a
  * pre-optimization plan for an honest _before receipt.
  *
  * Writes <outDir>/<query>_<suffix>.txt. Builders with eager work (fits,
  * index CRUD) run that work here — the dump reflects the DataFrame the
  * gate returns, which is the object the bench times the noop write of.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "args: <sfDir> <outDir> <suffix> <q1,q2,...|all> [key=value ...]")
    val Array(sfDir, outDir, suffix, qlist) = args.take(4)
    val confs = args.drop(4).toSeq.map { kv =>
      val i = kv.indexOf('=')
      require(i > 0, s"conf arg must be key=value, got: $kv")
      (kv.take(i), kv.drop(i + 1))
    }
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
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
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    Files.createDirectories(Paths.get(outDir))
    val names =
      if (qlist == "all") SparkEntry.queries.keys.toSeq.sorted
      else qlist.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"unknown query: $name"))
      val df = fn(spark, sfDir)
      val txt = df.queryExecution.explainString(FormattedMode)
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), txt)
      System.err.println(s"[plandump] wrote $name ($suffix)")
    }
    spark.stop()
  }
}
