package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * At-scale exercise of SemiJoins' kept-domain RETRY tier (r12): kept side
 * compact (1.5M dense keys ≈ 23 containers), probe side 15M keys each in
 * its OWN 64Ki container (the adversarial scattered layout) with a known
 * 1.5k-key matching slice. Tier 1 must overflow, tier 2 must answer
 * exactly, and the whole thing must stay in the same band as the fixture
 * gates — plus a fallback A/B (maxBitmapBits=0) for the floor.
 *
 *   sbt 'Test/runMain graft.tools.ScatterProbe'
 */
object ScatterProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val kept = spark.range(0, 1500000).select(col("id").as("k"))
    // 15M probe keys: most scattered one-per-container across a 1e12 span;
    // every 10_000th probe lands back inside the kept domain (1.5k hits).
    val probe = spark.range(0, 15000000).select(
      when(col("id") % 10000 === 0, col("id") / 10000)
        .otherwise(col("id") * 65536L + (1L << 40)).as("rk"))

    def time(tag: String)(f: => Long): Unit = (1 to 3).foreach { _ =>
      val t0 = System.nanoTime()
      val n = f
      println(f"[scatter] $tag rows=$n ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val expect = kept.join(probe, col("k") === col("rk"), "left_anti").count()
    println(s"[scatter] expected notExists rows = $expect")
    time("retry-tier") {
      val n = graft.ops.SemiJoins.notExists(kept, "k", probe, "rk").count()
      assert(n == expect, s"retry tier wrong: $n != $expect")
      n
    }
    spark.conf.set(graft.ops.SemiJoins.MaxBitmapBitsKey, "0")
    time("fallback") {
      val n = graft.ops.SemiJoins.notExists(kept, "k", probe, "rk").count()
      assert(n == expect)
      n
    }
    spark.stop()
  }
}
