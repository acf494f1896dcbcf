package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

import graft.index.IndexCatalog

/**
 * 1M-row envelope test — the port of the reference's
 * test/sql/slow/hnsw_reclaim_storage.test_slow:12-22 (1M × FLOAT[3] build,
 * delete 10%, compact/reclaim, verify counts and search): proves the
 * multi-segment build, range-pruned distributed delete, compaction rebuild,
 * and GraphCache byte-bounding hold at the scale the reference's slow suite
 * uses. Construction params are lowered (M=8, ef_construction=32) — this
 * test exercises storage/reclaim mechanics; recall quality at default
 * params is covered by HnswIndexSpec's recall test.
 */
class HnswSlowSpec extends SparkSuite {

  private val base: String = {
    val d = Files.createTempDirectory("graft-slow").toFile.getAbsolutePath
    spark.conf.set(Hnsw.LocationKey, d)
    d
  }

  test("1M x FLOAT[3]: multi-segment build, search, delete 10%, compact (hnsw_reclaim_storage.test_slow)") {
    val n = 1000000L
    val df = spark.range(n).select(col("id"),
      array((col("id") % 97).cast("float"), (col("id") % 89).cast("float"),
        (col("id") % 83).cast("float")).as("vec"))
    val dir = Files.createTempDirectory("graft-slow-t").toFile.getAbsolutePath
    df.write.mode("overwrite").parquet(dir)
    val table = spark.read.parquet(dir)

    val t0 = System.nanoTime()
    Hnsw.createIndex(spark, "slow_1m", table, "vec", "id",
      Map("M" -> "8", "ef_construction" -> "32"), overwrite = true)
    info(f"build: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val meta = IndexCatalog.load(base, "slow_1m")
    assert(meta.count == n)
    assert(meta.segments.size == 4) // 262144 vectors per segment
    assert(meta.segmentRanges.size == 4)

    // Search: ids 0 and 716539 (≡0 mod lcm(97,89,83)) sit exactly at
    // (0,0,0); generous ef keeps the ANN beam deterministic enough to find
    // the exact hit. Results come back distance-ascending.
    val hits = Hnsw.searchRaw(spark, "slow_1m", Array(0f, 0f, 0f), 5, efOverride = Some(512))
    assert(hits.length == 5 && hits.head._2 == 0.0)
    assert(hits.map(_._2).toSeq == hits.map(_._2).sorted.toSeq)

    // Delete 10% (the reference deletes rowid % 10 = 5): range-pruned
    // distributed probe — 100k keys, driver never loads a graph.
    val victims = (0L until n).filter(_ % 10 == 5)
    val t1 = System.nanoTime()
    val afterDelete = Hnsw.delete(spark, "slow_1m", victims)
    info(f"delete 100k: ${(System.nanoTime() - t1) / 1e9}%.1f s")
    assert(afterDelete.count == n - n / 10)
    // id 5 sits exactly at (5,5,5) but was deleted; no deleted key returns.
    assert(Hnsw.searchRaw(spark, "slow_1m", Array(5f, 5f, 5f), 3, efOverride = Some(512))
      .forall { case (k, _) => k % 10 != 5 })

    // Compact reclaims: tombstones cleared, live rows rebuilt.
    val t2 = System.nanoTime()
    val compacted = Hnsw.compactIndex(spark, "slow_1m")
    info(f"compact: ${(System.nanoTime() - t2) / 1e9}%.1f s")
    assert(compacted.count == n - n / 10)
    assert(IndexCatalog.tombstones(base, "slow_1m").isEmpty)
    val hits2 = Hnsw.searchRaw(spark, "slow_1m", Array(1f, 1f, 1f), 5, efOverride = Some(512))
    assert(hits2.head._2 == 0.0) // id 1 (or 716540) survives at (1,1,1)
    assert(hits2.forall { case (k, _) => k % 10 != 5 })

    Hnsw.dropIndex(spark, "slow_1m")
  }

  test("1000x1000 lateral top-3: indexed equals brute force (hnsw_lateral_join_group_large.test_slow)") {
    import spark.implicits._
    val rnd = new scala.util.Random(1337)
    def table(n: Int): Seq[(Long, Array[Float])] =
      (1 to n).map(i => (i.toLong, Array.fill(3)(rnd.nextFloat())))
    val itemsDir = Files.createTempDirectory("graft-slow-items").toFile.getAbsolutePath
    table(1000).toDF("b_id", "b_vec").withColumn("b_vec", col("b_vec").cast("array<float>"))
      .write.mode("overwrite").parquet(itemsDir)
    val items = spark.read.parquet(itemsDir)
    val queries = table(1000).toDF("a_id", "a_vec")
      .withColumn("a_vec", col("a_vec").cast("array<float>"))

    def run() = graft.api.Vss.lateralTopK(queries, items, "a_vec", "b_vec", "a_id", 3)
      .select(col("a_id"), col("b_id"), col("rn"))

    // total cardinality = 3 per outer row (the reference's sanity checks)
    assert(run().count() == 3000L)
    val brute = run().collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    Hnsw.createIndex(spark, "slow_lat", items, "b_vec", "b_id",
      Map("ef_search" -> "100000"), overwrite = true)
    try {
      val planned = run()
      assert(planned.queryExecution.executedPlan.toString.contains("HnswIndexJoinCore"))
      assert(planned.count() == 3000L)
      // exhaustive ef → exact: identical neighbor sets per outer row
      val grouped = run().groupBy("a_id")
        .agg(sort_array(collect_list(col("b_id"))).as("nbrs")).orderBy("a_id")
        .collect().map(r => (r.getLong(0), r.getAs[scala.collection.Seq[Long]]("nbrs").toSeq)).toSeq
      val bruteGrouped = brute.groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (id, rows) => (id, rows.map(_._2).sorted.toSeq) }
      assert(grouped == bruteGrouped)
    } finally Hnsw.dropIndex(spark, "slow_lat")
  }
}
