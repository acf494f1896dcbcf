package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/**
 * Counter-audit apparatus for the `hnsw_recall_ann` driver-bench wall
 * (r15 verdict item 2: 0.214 → 0.296 → 0.778 s over r13→r15 — a monotone
 * climb, so the discipline is decomposition + counters, not adjudication
 * by shape). Times the gate's two halves SEPARATELY over repeated runs:
 *
 *  - ANN side: `Vss.annTopK` over the 20 fixture queries at ef = 64
 *    (graph quality + GraphCache behavior — the engine under test);
 *  - TRUTH side: the brute-force 20 × corpus crossJoin + window top-10
 *    (gate apparatus, pure Spark built-ins, no graft index code);
 *  - the joined gate body as the bench times it.
 *
 * Prints per-run walls and GraphCache hit/miss/load-ms so a wall
 * regression attributes to (a) graph search, (b) cache churn (misses > 0
 * after warmup), or (c) the truth crossJoin — three different fixes.
 *
 * Usage: `sbt "runMain graft.tools.RecallAudit [sfDir] [runs]"`.
 */
object RecallAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val runs = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.register(spark)

    val (l2, _) = graft.queries.HnswQueries.ensureIndexes(spark, sfDir)
    val emb = Tables.load(spark, sfDir, "embeddings")
    val queries = emb.where(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))

    def annSide() = {
      val prevEf = spark.conf.getOption(graft.Hnsw.EfSearchKey)
      spark.conf.set(graft.Hnsw.EfSearchKey,
        graft.index.IndexCatalog.DefaultEfSearch.toString)
      try graft.api.Vss.annTopK(queries, l2, "q_vec", 10)
        .select(col("q_id"), col("neighbor_id"))
      finally prevEf match {
        case Some(v) => spark.conf.set(graft.Hnsw.EfSearchKey, v)
        case None => spark.conf.unset(graft.Hnsw.EfSearchKey)
      }
    }
    def truthSide() = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("d"), col("vec_id"))
      queries.crossJoin(emb)
        .select(col("q_id"), col("vec_id"),
          graft.functions.array_distance(col("q_vec"), col("embedding")).as("d"))
        .withColumn("rn", row_number().over(w)).where(col("rn") <= 10)
        .select(col("q_id"), col("vec_id").as("neighbor_id"))
    }

    def time(label: String, body: () => Unit): Unit = {
      val walls = (1 to runs).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        body()
        (System.nanoTime() - t0) / 1e9
      }
      val (h, m, lms) = graft.index.GraphCache.stats
      println(f"[audit] $label%-12s walls=${walls.map(w => f"$w%.3f").mkString(",")} " +
        f"min=${walls.min}%.3f cache(h=$h m=$m load=${lms}ms)")
    }

    // Warmup: one full gate body (pays index build/footers/codegen).
    annSide().join(truthSide(), Seq("q_id", "neighbor_id")).count(): Unit

    time("ann-only", () => { annSide().write.format("noop").mode("overwrite").save() })
    time("truth-only", () => { truthSide().write.format("noop").mode("overwrite").save() })
    time("full-gate", () => {
      annSide().join(truthSide(), Seq("q_id", "neighbor_id"))
        .agg((count(lit(1)).cast("double") / lit(200.0) >= 0.9).as("recall_ok"))
        .write.format("noop").mode("overwrite").save()
    })
    spark.stop()
  }
}
