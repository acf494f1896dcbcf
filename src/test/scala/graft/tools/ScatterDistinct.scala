package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * At-scale exercise of [[graft.aggregates.BitmapDistinctAgg]]'s
 * scattered-domain degrade (the r12 verdict's ask): q12's bitmap plan is
 * proven on BLOCK-ALLOCATED key domains; this probe pins what happens on
 * the adversarial layouts against the r8 salted-set plan
 * (`count_distinct_long` pre-aggregated by value salt) at sf10-like row
 * counts, value-checked against Spark's own countDistinct.
 *
 * Three regimes × 60M rows × 3 groups:
 *  - dense:     keys mod 2M (≈31 containers, popcounts 64Ki) — q12's shape
 *  - scattered: key = id·65536 (every key its OWN container — worst case;
 *               demotion + preferStrays must keep partials ~16 B/key)
 *  - sparse:    keys spread so containers hold ~100 bits each (below the
 *               512 break-even — demotion fires on every partial)
 *
 *   sbt 'Test/runMain graft.tools.ScatterDistinct'
 */
object ScatterDistinct {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val rows = 60000000L
    def df(key: org.apache.spark.sql.Column) =
      spark.range(0, rows, 1, 32)
        .select((col("id") % 3).cast("string").as("g"), key.as("k"))

    def check(tag: String, key: org.apache.spark.sql.Column): Unit = {
      val expect = df(key).groupBy("g").agg(countDistinct(col("k")).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      // A FRESH DataFrame per run: re-collecting one instance re-executes
      // its AdaptiveSparkPlan with already-materialized shuffle stages, so
      // repeat runs would time only the final stage.
      def run(label: String)(agg: () => org.apache.spark.sql.DataFrame): Unit =
        (1 to 3).foreach { _ =>
          val t0 = System.nanoTime()
          val got = agg().collect().map(r => (r.getString(0), r.getLong(1))).toMap
          assert(got == expect, s"$tag/$label wrong: $got vs $expect")
          println(f"[scatter-distinct] $tag $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
        }
      run("bitmap")(() =>
        df(key).groupBy("g")
          .agg(graft.functions.bitmap_count_distinct(col("k")).as("n")))
      run("salted-set")(() =>
        df(key).groupBy(col("g"), pmod(xxhash64(col("k")), lit(32L)).as("_s"))
          .agg(graft.functions.count_distinct_long(col("k")).as("_p"))
          .groupBy("g").agg(sum(col("_p")).as("n")))
      // CONTAINER-salted bitmap: salting by key>>16 keeps every container
      // intact in exactly one salt, so per-salt bitmap counts ADD exactly
      // (disjoint container sets) while the reducer merge parallelism goes
      // groups -> groups x 32 — the un-salted plan's one weakness on
      // scattered domains. A plan spelling, not a new kernel. The cap must
      // shrink with the live-buffer count (the default 4096 OOM'd here:
      // 96 live scattered buffers x 32 MB transient per task) — the
      // sizing rule on the bitmap_count_distinct(x, maxContainers)
      // overload.
      run("bitmap-csalt")(() =>
        df(key).groupBy(col("g"),
            pmod(xxhash64(shiftright(col("k"), 16)), lit(32L)).as("_s"))
          .agg(graft.functions.bitmap_count_distinct(col("k"), 128).as("_p"))
          .groupBy("g").agg(sum(col("_p")).as("n")))
    }

    check("dense", col("id") % 2000000L)
    check("scattered", col("id") * 65536L)
    // ~100 bits per container: 60M rows over 6M distinct keys placed 100
    // per container (id % 6M spread to every 655th slot of a container).
    // `div` (IntegralDivide), not `/` — Long / Long is DOUBLE division in
    // Spark SQL.
    check("sparse100", expr("((id % 6000000) div 100) * 65536 + (id % 100) * 655"))
    spark.stop()
  }
}
