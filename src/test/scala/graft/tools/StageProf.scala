package graft.tools

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/**
 * Dev-only stage profiler: runs one SparkEntry gate against a parquet dir
 * and prints every completed stage's wall time, task count, input /
 * shuffle-read / shuffle-write bytes and record counts — the decomposition
 * `Bench`'s per-query totals can't show (which exchange, which sort).
 *
 *   sbt 'Test/runMain graft.tools.StageProf doc_source_mix /tmp/graft_sf10'
 *
 * Extra `key=value` args become session conf (A/B knobs without edits):
 *
 *   ... StageProf doc_pack_sequences /tmp/graft_sf10 spark.graft.mix.narrowInputBytes=1
 *
 * Test scope on purpose: a measurement harness, not product surface.
 */
object StageProf {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val confs = args.drop(2).toSeq.map { kv =>
      val i = kv.indexOf('=')
      require(i > 0, s"conf arg must be key=value, got: $kv")
      (kv.take(i), kv.drop(i + 1))
    }
    // Mirror Bench's session configuration exactly — a profile under
    // different broadcast/split/advisory settings decomposes a DIFFERENT
    // plan than the one the bench times (round-10 lesson: q9's probe
    // stayed shuffle-joined here while the bench broadcast it).
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-stageprof")
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
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    val stages = TrieMap.empty[Int, String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val ms = for {
          s <- si.submissionTime; c <- si.completionTime
        } yield c - s
        stages.put(si.stageId, f"stage ${si.stageId}%3d ${ms.getOrElse(-1L)}%6dms " +
          f"tasks=${si.numTasks}%3d input=${m.inputMetrics.bytesRead / 1e6}%8.1fMB/" +
          f"${m.inputMetrics.recordsRead}%9d " +
          f"shufR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%7.1fMB/" +
          f"${m.shuffleReadMetrics.recordsRead}%9d " +
          f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%7.1fMB/" +
          f"${m.shuffleWriteMetrics.recordsWritten}%9d  [${si.name.takeWhile(_ != '\n')}]")
      }
    })
    val fn = graft.SparkEntry.queries(name)
    // Warm run (layout builds, codegen), then the measured run.
    fn(spark, dir).write.format("noop").mode("overwrite").save()
    stages.clear()
    val t0 = System.nanoTime()
    val df = fn(spark, dir)
    graft.spark.ExecTuning.withSizedAqe(df) {
      df.write.format("noop").mode("overwrite").save()
    }
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300) // async listener bus
    stages.toSeq.sortBy(_._1).foreach(s => println(s._2))
    println(f"TOTAL $name $total%.3fs (measured run, after warmup)")
    spark.stop()
  }
}
