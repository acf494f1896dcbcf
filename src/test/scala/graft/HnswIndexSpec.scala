package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

import graft.index.IndexCatalog

/** Index lifecycle: create/options/persist/insert/delete/compact/info —
  * ports of hnsw_options.test, hnsw_insert.test, hnsw_crud.test semantics. */
class HnswIndexSpec extends SparkSuite {

  // Strict val: the conf must be set before any test calls createIndex.
  private val base: String = {
    val d = Files.createTempDirectory("graft-idx").toFile.getAbsolutePath
    spark.conf.set(Hnsw.LocationKey, d)
    d
  }

  private def gridDf = {
    import spark.implicits._
    val rows = for (a <- 1 to 9; b <- 1 to 9; c <- 1 to 9)
      yield ((a - 1) * 81L + (b - 1) * 9 + (c - 1), Array(a.toFloat, b.toFloat, c.toFloat))
    rows.toDF("id", "vec").withColumn("vec", col("vec").cast("array<float>"))
  }

  test("option validation errors mirror the reference binder (hnsw_options.test)") {
    def err(opts: Map[String, String]): String =
      intercept[IllegalArgumentException](Hnsw.validateOptions(opts)).getMessage
    assert(err(Map("ef_construction" -> "foo")) == "HNSW index 'ef_construction' must be an integer")
    assert(err(Map("ef_construction" -> "0")) == "HNSW index 'ef_construction' must be at least 1")
    assert(err(Map("ef_search" -> "foo")) == "HNSW index 'ef_search' must be an integer")
    assert(err(Map("ef_search" -> "0")) == "HNSW index 'ef_search' must be at least 1")
    assert(err(Map("M" -> "foo")) == "HNSW index 'M' must be an integer")
    assert(err(Map("M" -> "0")) == "HNSW index 'M' must be at least 2")
    assert(err(Map("M0" -> "foo")) == "HNSW index 'M0' must be an integer")
    assert(err(Map("M0" -> "0")) == "HNSW index 'M0' must be at least 2")
    assert(err(Map("metric" -> "nope")) == "HNSW index 'metric' must be one of: l2sq, cosine, ip")
    assert(err(Map("bogus" -> "1")) == "Unknown option for HNSW index: 'bogus'")
    // All parameters in range — ok (hnsw_options.test:52)
    val ok = Hnsw.validateOptions(Map(
      "ef_construction" -> "100", "ef_search" -> "100", "M" -> "3", "M0" -> "3"))
    assert(ok == Hnsw.Options("l2sq", 100, 100, 3, 3))
    // Defaults match BASELINE.md: M=16, M0=32, efc=128, efs=64
    assert(Hnsw.validateOptions(Map.empty) == Hnsw.Options("l2sq", 128, 64, 16, 32))
    // M0 defaults to 2*M when only M is given (usearch convention)
    assert(Hnsw.validateOptions(Map("M" -> "8")).m0 == 16)
  }

  test("non-FLOAT[] key column rejected (hnsw_index_plan.cpp:88)") {
    import spark.implicits._
    val bad = Seq((1L, Array(1.0, 2.0))).toDF("id", "vec") // array<double>
    val e = intercept[IllegalArgumentException](
      Hnsw.createIndex(spark, "bad_idx", bad, "vec", "id"))
    assert(e.getMessage == "HNSW index keys must be of type FLOAT[N]")
  }

  test("create + search grid exactly (hnsw_result.test) and survive 'restart'") {
    Hnsw.createIndex(spark, "grid_idx", gridDf, "vec", "id", overwrite = true)
    val hits = Hnsw.searchRaw(spark, "grid_idx", Array(1f, 2f, 3f), 3)
    assert(hits.map(h => math.sqrt(h._2)).toSeq == Seq(0.0, 1.0, 1.0))
    // "restart": reload purely from disk artifacts (fresh catalog read +
    // invalidated cache), as the driver's restart directive does.
    graft.index.GraphCache.invalidate(base)
    val meta2 = IndexCatalog.load(base, "grid_idx")
    assert(meta2.count == 729 && meta2.dim == 3 && meta2.metric == "l2sq")
    val hits2 = Hnsw.searchRaw(spark, "grid_idx", Array(1f, 2f, 3f), 3)
    assert(hits2.map(h => math.sqrt(h._2)).toSeq == Seq(0.0, 1.0, 1.0))
  }

  test("multi-segment build searches across segments") {
    spark.conf.set(Hnsw.MaxVectorsPerPartitionKey, "100") // force 8 segments
    try {
      Hnsw.createIndex(spark, "grid_seg", gridDf, "vec", "id", overwrite = true)
      val meta = IndexCatalog.load(base, "grid_seg")
      assert(meta.segments.size == 8)
      val hits = Hnsw.searchRaw(spark, "grid_seg", Array(9f, 9f, 9f), 4)
      assert(math.sqrt(hits.head._2) == 0.0)
      assert(hits.map(h => math.sqrt(h._2)).toSeq == Seq(0.0, 1.0, 1.0, 1.0))
    } finally spark.conf.unset(Hnsw.MaxVectorsPerPartitionKey)
  }

  test("multi-segment delete: range-pruned distributed probe (no driver graph load)") {
    spark.conf.set(Hnsw.MaxVectorsPerPartitionKey, "100")
    try {
      Hnsw.createIndex(spark, "grid_del", gridDf, "vec", "id", overwrite = true)
      val meta = IndexCatalog.load(base, "grid_del")
      assert(meta.segments.size == 8)
      // Build records one (min,max) key range per segment; ranges are
      // disjoint (range partitioning on the key), so any key probes
      // exactly one segment — driver-side pruning needs no graph load.
      assert(meta.segmentRanges.size == meta.segments.size)
      assert(meta.segmentRanges.forall { case (lo, hi) => lo <= hi })
      assert((0L until 729L).forall(k => meta.segmentsForKey(k).size == 1))
      assert(meta.segmentsForKey(5000L).isEmpty)
      // Delete keys spanning several segments (+ one absent key): the probe
      // set exceeds the local threshold, exercising the distributed path.
      val victims = Seq(0L, 100L, 200L, 300L, 400L, 500L, 600L, 700L, 5000L)
      val updated = Hnsw.delete(spark, "grid_del", victims)
      assert(updated.count == 729L - 8)
      val hits = Hnsw.searchRaw(spark, "grid_del", Array(1f, 1f, 1f), 729)
      assert(victims.toSet.intersect(hits.map(_._1).toSet).isEmpty)
      assert(hits.length == 721)
      Hnsw.dropIndex(spark, "grid_del")
    } finally spark.conf.unset(Hnsw.MaxVectorsPerPartitionKey)
  }

  test("delete-by-DataFrame: 100k-key set never collected on the driver") {
    spark.conf.set(Hnsw.MaxVectorsPerPartitionKey, "100")
    try {
      Hnsw.createIndex(spark, "grid_del_df", gridDf, "vec", "id", overwrite = true)
      // 100k candidate keys as a distributed Dataset — the overload range-
      // joins them against broadcast segment ranges and probes per segment;
      // only actual hits (even ids < 729) reach the driver's tombstone file.
      val victims = spark.range(0L, 100000L).withColumn("id", col("id") * 2)
      val updated = Hnsw.delete(spark, "grid_del_df", victims.toDF("id"))
      val expectedHits = (0L until 729L).count(_ % 2 == 0)
      assert(updated.count == 729L - expectedHits)
      val hits = Hnsw.searchRaw(spark, "grid_del_df", Array(1f, 1f, 1f), 729)
      assert(hits.length == 729 - expectedHits)
      assert(hits.forall(_._1 % 2 == 1))
      // Dedup inside the overload: deleting the same keys again is a no-op.
      assert(Hnsw.delete(spark, "grid_del_df", victims.toDF("id")).count
        == 729L - expectedHits)
      Hnsw.dropIndex(spark, "grid_del_df")
    } finally spark.conf.unset(Hnsw.MaxVectorsPerPartitionKey)
  }

  test("insert tracks count (hnsw_insert.test) and delete+compact (hnsw_crud.test)") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("id", "vec")
      .withColumn("vec", col("vec").cast("array<float>"))
    Hnsw.createIndex(spark, "crud_idx", empty, "vec", "id", overwrite = true)
    assert(IndexCatalog.load(base, "crud_idx").count == 0)

    def ins(id: Long, v: Array[Float]) = Hnsw.insert(spark, "crud_idx",
      Seq((id, v)).toDF("id", "vec").withColumn("vec", col("vec").cast("array<float>")))
    ins(1L, Array(1f, 2f, 3f))
    ins(2L, Array(4f, 5f, 6f))
    assert(IndexCatalog.load(base, "crud_idx").count == 2)
    ins(3L, Array(7f, 8f, 9f))
    assert(IndexCatalog.load(base, "crud_idx").count == 3)
    assert(Hnsw.searchRaw(spark, "crud_idx", Array(4f, 5f, 6f), 1).head._1 == 2L)

    // delete marks only; search excludes; compact rebuilds
    Hnsw.delete(spark, "crud_idx", Seq(2L, 99L)) // 99 not present — no-op
    assert(IndexCatalog.load(base, "crud_idx").count == 2)
    assert(!Hnsw.searchRaw(spark, "crud_idx", Array(4f, 5f, 6f), 3).map(_._1).contains(2L))
    Hnsw.compactIndex(spark, "crud_idx")
    val meta = IndexCatalog.load(base, "crud_idx")
    assert(meta.count == 2)
    assert(IndexCatalog.tombstones(base, "crud_idx").isEmpty)
    assert(Hnsw.searchRaw(spark, "crud_idx", Array(1f, 2f, 3f), 2).map(_._1).toSet == Set(1L, 3L))

    // re-insert a deleted key revives it
    Hnsw.delete(spark, "crud_idx", Seq(1L))
    assert(IndexCatalog.load(base, "crud_idx").count == 1)
    ins(1L, Array(1f, 2f, 3f))
    assert(IndexCatalog.load(base, "crud_idx").count == 2)
    assert(Hnsw.searchRaw(spark, "crud_idx", Array(1f, 2f, 3f), 1).head._1 == 1L)
  }

  test("indexInfo reports catalog + graph stats (pragma_hnsw_index_info)") {
    Hnsw.createIndex(spark, "grid_info", gridDf, "vec", "id",
      Map("metric" -> "cosine", "M" -> "8"), overwrite = true)
    val info = Hnsw.indexInfo(spark)
    val row = info.where(col("index_name") === "grid_info").collect().head
    assert(row.getAs[String]("metric") == "cosine")
    assert(row.getAs[Int]("dimensions") == 3)
    assert(row.getAs[Long]("count") == 729L)
    assert(row.getAs[Int]("levels") >= 1)
    val stats = row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("level_stats")
    val lvl0 = stats.head
    assert(lvl0.getAs[Long]("nodes") == 729L)
    assert(lvl0.getAs[Long]("edges") > 0L)
    assert(row.getAs[Long]("approx_memory") > 0L)
    // Per-level allocated_bytes (hnsw_index_pragmas.cpp:73-77): positive at
    // every level and summing to the index's total memory estimate.
    assert(stats.forall(_.getAs[Long]("allocated_bytes") > 0L))
    assert(stats.map(_.getAs[Long]("allocated_bytes")).sum ==
      row.getAs[Long]("approx_memory"))
  }

  test("ANN recall@10 at default ef on real embeddings >= 0.9") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    Hnsw.createIndex(spark, "recall_idx", emb, "embedding", "vec_id", overwrite = true)
    import spark.implicits._
    val vecs = emb.select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    var recallSum = 0.0
    val queries = vecs.take(20)
    queries.foreach { case (_, q) =>
      val exact = vecs.map { case (id, v) =>
        (id, graft.expressions.VectorMath.l2Squared(q, v))
      }.sortBy(_._2).take(10).map(_._1).toSet
      val approx = Hnsw.searchRaw(spark, "recall_idx", q, 10).map(_._1).toSet // ef=64 default
      recallSum += (exact & approx).size / 10.0
    }
    val recall = recallSum / queries.length
    assert(recall >= 0.9, s"recall@10 = $recall")
    Hnsw.dropIndex(spark, "recall_idx")
  }

  test("dropIndex removes artifacts") {
    Hnsw.createIndex(spark, "tmp_idx", gridDf, "vec", "id", overwrite = true)
    assert(Hnsw.dropIndex(spark, "tmp_idx"))
    assert(!IndexCatalog.exists(base, "tmp_idx"))
    assert(!Hnsw.dropIndex(spark, "tmp_idx"))
  }
}
