package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ScanFloor {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", 4L << 20)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(tag: String)(f: => Unit): Unit = {
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime(); f
        println(f"[floor] $tag ${(System.nanoTime()-t0)/1e9}%.3f s")
      }
    }
    val o = spark.read.parquet(s"$dir/orders.parquet")
    t("scan+filter+count") {
      o.where(col("o_totalprice") > 300000).select(col("o_custkey")).write.format("noop").mode("overwrite").save()
    }
    t("scan+filter+agg(sum)") {
      o.where(col("o_totalprice") > 300000).agg(sum(col("o_custkey"))).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
