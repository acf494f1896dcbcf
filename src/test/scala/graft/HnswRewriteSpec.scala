package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{array_cosine_similarity, array_distance, array_negative_inner_product, lit_vector}

/** O2/O3/O7: TopN → HNSW index scan rewrite + cosine expression rewrite.
  * Ports the EXPLAIN-regex and labeled-equality posture of hnsw_basic.test,
  * hnsw_metrics.test, hnsw_rewrite.test, where_clause_segfault.test. */
class HnswRewriteSpec extends SparkSuite {

  private val base: String = {
    val d = Files.createTempDirectory("graft-rw").toFile.getAbsolutePath
    spark.conf.set(Hnsw.LocationKey, d)
    d
  }

  /** 9³ grid written to parquet (rewrites need a file relation). */
  private lazy val grid: DataFrame = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-grid").toFile.getAbsolutePath
    val rows = for (a <- 1 to 9; b <- 1 to 9; c <- 1 to 9)
      yield ((a - 1) * 81L + (b - 1) * 9 + (c - 1), Array(a.toFloat, b.toFloat, c.toFloat))
    rows.toDF("id", "vec").withColumn("vec", col("vec").cast("array<float>"))
      .write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private def planOf(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("TopN over indexed relation uses HnswIndexScan (hnsw_basic.test:22-25)") {
    Hnsw.createIndex(spark, "rw_l2", grid, "vec", "id", overwrite = true)
    val q = grid.select(col("id"), array_distance(col("vec"), lit_vector(Array(1f, 2f, 3f))).as("d"))
      .orderBy("d").limit(3)
    assert(planOf(q).contains("HnswIndexScan"), planOf(q))
    // exact on the deterministic grid (hnsw_result.test:23-28)
    assert(q.collect().map(_.getDouble(1)).toSeq == Seq(0.0, 1.0, 1.0))
    assert(q.collect().head.getLong(0) == 11L)
  }

  test("rewrite also fires without a projection (Sort directly over scan)") {
    val q = grid.orderBy(array_distance(col("vec"), lit_vector(Array(9f, 9f, 9f)))).limit(2)
    assert(planOf(q).contains("HnswIndexScan"), planOf(q))
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(728L, 727L).take(2).sorted.reverse
      || q.collect().head.getLong(0) == 728L)
  }

  test("kill switch disables the rewrite; results identical (hnsw_rewrite.test)") {
    def q = grid.select(col("id"), array_distance(col("vec"), lit_vector(Array(5f, 5f, 5f))).as("d"))
      .orderBy("d").limit(1)
    val withIndex = q.collect()
    assert(planOf(q).contains("HnswIndexScan"))
    spark.conf.set(Hnsw.RewriteEnabledKey, "false")
    try {
      assert(!planOf(q).contains("HnswIndexScan"))
      assert(q.collect().toSeq == withIndex.toSeq)
    } finally spark.conf.set(Hnsw.RewriteEnabledKey, "true")
  }

  test("per-metric index selection (hnsw_metrics.test:26-39)") {
    Hnsw.createIndex(spark, "rw_cos", grid, "vec", "id", Map("metric" -> "cosine"), overwrite = true)
    Hnsw.createIndex(spark, "rw_ip", grid, "vec", "id", Map("metric" -> "ip"), overwrite = true)
    val qv = lit_vector(Array(1f, 0f, 0f))
    val l2Plan = planOf(grid.orderBy(array_distance(col("vec"), qv)).limit(3))
    assert(l2Plan.contains("index=rw_l2"), l2Plan)
    val cosPlan = planOf(grid.orderBy(lit(1.0) - array_cosine_similarity(col("vec"), qv)).limit(3))
    assert(cosPlan.contains("index=rw_cos"), cosPlan) // via CosineDistanceRewrite (O7)
    val ipPlan = planOf(grid.orderBy(array_negative_inner_product(col("vec"), qv)).limit(3))
    assert(ipPlan.contains("index=rw_ip"), ipPlan)
  }

  test("guards: DESC, multi-key, non-deterministic filter, non-literal query, big k → no rewrite") {
    val qv = lit_vector(Array(1f, 2f, 3f))
    val d = array_distance(col("vec"), qv)
    assert(!planOf(grid.orderBy(d.desc).limit(3)).contains("HnswIndexScan"))
    assert(!planOf(grid.orderBy(d, col("id")).limit(3)).contains("HnswIndexScan"))
    // dynamic-filter analogue (hnsw_optimize_scan.cpp:82-85): a
    // non-deterministic predicate blocks the filtered-scan rewrite
    assert(!planOf(grid.where(rand() < 0.5).orderBy(d).limit(3)).contains("HnswIndexScan"))
    assert(!planOf(grid.orderBy(array_distance(col("vec"), col("vec"))).limit(3)).contains("HnswIndexScan"))
    assert(!planOf(grid.orderBy(d).limit(3000)).contains("HnswIndexScan"))
  }

  test("filtered TopN uses a filtered index scan, exact SQL semantics (where_clause_segfault.test)") {
    val qv = lit_vector(Array(1f, 2f, 3f))
    val d = array_distance(col("vec"), qv)
    // WHERE id > 0 ORDER BY dist LIMIT 3 (where_clause_segfault.test:23-38):
    // index path fires and the plan shows the residual predicate.
    def q1 = grid.where(col("id") > 0).select(col("id"), d.as("dd")).orderBy("dd").limit(3)
    assert(planOf(q1).contains("HnswIndexScan"), planOf(q1))
    assert(planOf(q1).contains("filtered="), planOf(q1))
    assert(q1.collect().forall(r => r.getLong(0) > 0 && r.getDouble(1) <= 1.0))
    // Selective filter forces over-fetch escalation; equals brute force
    // (compare distance multisets — grid ties make ids ambiguous).
    def q2 = grid.where(col("id") % 7 === 0).select(col("id"), d.as("dd")).orderBy("dd").limit(5)
    spark.conf.set(Hnsw.RewriteEnabledKey, "false")
    val brute = try q2.collect().toSeq finally spark.conf.set(Hnsw.RewriteEnabledKey, "true")
    assert(planOf(q2).contains("filtered="), planOf(q2))
    val indexed = q2.collect().toSeq
    assert(indexed.map(_.getDouble(1)) == brute.map(_.getDouble(1)))
    assert(indexed.forall(_.getLong(0) % 7 == 0))
    // Starvation: fewer matching rows than k returns them all — standard
    // SQL semantics, not the reference's fewer-than-k post-filter cut.
    def q3 = grid.where(col("id") === 728).select(col("id"), d.as("dd")).orderBy("dd").limit(3)
    assert(planOf(q3).contains("filtered="), planOf(q3))
    val r3 = q3.collect()
    assert(r3.length == 1 && r3.head.getLong(0) == 728L)
    // Filter over a pruned projection under the sort also fires.
    def q4 = grid.where(col("id") > 100).orderBy(d).limit(3)
    assert(planOf(q4).contains("filtered="), planOf(q4))
    val r4 = q4.collect()
    assert(r4.length == 3 && r4.forall(_.getLong(0) > 100))
  }

  test("filtered TopN past the fetch budget falls back to distributed brute force") {
    val qv = lit_vector(Array(1f, 2f, 3f))
    val d = array_distance(col("vec"), qv)
    // Rows far from the query + a tiny fetch budget: the first over-fetch
    // round finds no survivors and the escalation immediately exceeds the
    // budget, so HnswIndexScanExec.bruteForce answers. Results must still
    // match the un-rewritten plan exactly (and not loop back into the
    // index path — NoRewriteTag guards the escape hatch).
    def q = grid.where(col("id") >= 720).select(col("id"), d.as("dd")).orderBy("dd").limit(5)
    spark.conf.set(Hnsw.RewriteEnabledKey, "false")
    val brute = try q.collect().toSeq finally spark.conf.set(Hnsw.RewriteEnabledKey, "true")
    spark.conf.set(Hnsw.FilteredMaxFetchKey, "8")
    try {
      assert(planOf(q).contains("filtered="), planOf(q))
      val fell = q.collect().toSeq
      assert(fell.map(_.getDouble(1)) == brute.map(_.getDouble(1)))
      assert(fell.forall(_.getLong(0) >= 720))
      assert(fell.length == 5)
    } finally spark.conf.unset(Hnsw.FilteredMaxFetchKey)
  }

  test("SQL surface: ORDER BY array_distance LIMIT k uses the index") {
    grid.createOrReplaceTempView("grid_t")
    val q = spark.sql(
      """SELECT id, array_distance(vec, CAST(array(1.0, 2.0, 3.0) AS ARRAY<FLOAT>)) AS d
         FROM grid_t ORDER BY d LIMIT 3""")
    assert(planOf(q).contains("HnswIndexScan"), planOf(q))
    assert(q.collect().map(_.getDouble(1)).toSeq == Seq(0.0, 1.0, 1.0))
  }

  test("min_by(col, dist, k) rewrite feeds the aggregate from the index (hnsw_topk.test:18-31)") {
    import graft.functions.min_by_k
    val qv = lit_vector(Array(1f, 2f, 3f))
    // def, not val: each reference re-plans, so conf changes take effect
    def q = grid.agg(min_by_k(col("id"), array_distance(col("vec"), qv), 3).as("ids"))
    assert(planOf(q).contains("HnswIndexScan"), planOf(q))
    val ids = q.collect().head.getSeq[Long](0)
    assert(ids.length == 3 && ids.head == 11L) // nearest is (1,2,3) itself
    // same result with the rewrite off
    spark.conf.set(Hnsw.RewriteEnabledKey, "false")
    try {
      assert(!planOf(q).contains("HnswIndexScan"))
      assert(q.collect().head.getSeq[Long](0).head == 11L)
    } finally spark.conf.set(Hnsw.RewriteEnabledKey, "true")
    // max_by (keepLargest) must NOT be rewritten
    val qMax = grid.agg(graft.functions.max_by_k(col("id"), array_distance(col("vec"), qv), 3))
    assert(!planOf(qMax).contains("HnswIndexScan"))
    // dist computed in a projection below the aggregate also matches
    val qProj = grid.withColumn("d", array_distance(col("vec"), qv))
      .agg(min_by_k(col("id"), col("d"), 3).as("ids"))
    assert(planOf(qProj).contains("HnswIndexScan"), planOf(qProj))
    assert(qProj.collect().head.getSeq[Long](0).head == 11L)
  }

  test("projection permutations all work on the index path (hnsw_projection.test:20-37)") {
    val qv = lit_vector(Array(1f, 2f, 3f))
    val d = array_distance(col("vec"), qv)
    val variants = Seq(
      grid.orderBy(d).limit(1),
      grid.select(col("vec"), col("id")).orderBy(d).limit(1),
      grid.orderBy(array_distance(col("vec"), qv)).limit(1).select(col("id")),
      grid.select(col("id"), col("vec")).orderBy(d).limit(1),
      grid.select(col("id"), col("vec"), d.as("dist")).orderBy("dist").limit(1),
      grid.select(d.as("dist"), col("id")).orderBy("dist").limit(1))
    variants.foreach { q =>
      val rows = q.collect()
      assert(rows.length == 1)
      assert(rows.head.getAs[Any]("id") == 11L)
    }
  }

  // Port of hnsw_experimental_persistence.test (binder error parity);
  // hnsw_insert_wal.test is N/A here — file-backed segment artifacts have
  // no WAL, every committed segment IS durable (SURVEY §2 O15).
  test("persistence gate conf blocks createIndex when disabled (O17)") {
    spark.conf.set(Hnsw.PersistenceKey, "false")
    try {
      val e = intercept[IllegalStateException](
        Hnsw.createIndex(spark, "gate_blocked", grid, "vec", "id", overwrite = true))
      assert(e.getMessage.contains("hnsw") || e.getMessage.contains(Hnsw.PersistenceKey))
    } finally spark.conf.set(Hnsw.PersistenceKey, "true")
  }

  test("SQL registration of pipeline functions") {
    val r = spark.sql(
      """SELECT lang_id('the cat is on the table and it is here') AS l,
                simhash64(array('a', 'b')) AS s,
                fingerprint64('abc') AS f,
                size(minhash_signature(array('x'), 8)) AS m""").collect().head
    assert(r.getString(0) == "en")
    assert(r.getLong(2) == ((97L * 1000003L + 98L) * 1000003L + 99L))
    assert(r.getInt(3) == 8)
    val t = spark.sql(
      """SELECT token_count('a b c') AS n, token_count_bpe('ab12!') AS b,
                quality_score('the quiet morning light settled over the harbor while boats returned') AS q,
                word_shingles('a b c d', 3) AS w,
                jaccard_sim(array('x', 'y'), array('y', 'z')) AS j,
                text_stats('ab cd').n_tokens AS st""").collect().head
    assert(t.getInt(0) == 3 && t.getInt(1) == 3)
    assert(t.getDouble(2) > 0.5)
    assert(t.getSeq[String](3) == Seq("a b c", "b c d"))
    assert(math.abs(t.getDouble(4) - 1.0 / 3.0) < 1e-9)
    assert(t.getInt(5) == 2)
  }

  test("many-segment index scans via the distributed segment fan-out") {
    spark.conf.set(Hnsw.MaxVectorsPerPartitionKey, "100") // 8 segments
    try {
      Hnsw.createIndex(spark, "rw_seg", grid, "vec", "id",
        Map("ef_search" -> "100000"), overwrite = true)
      // rw_l2 (1 segment) also matches this relation; drop it so the
      // many-segment index is the one selected.
      Hnsw.dropIndex(spark, "rw_l2")
      try {
        val q = grid.select(col("id"), array_distance(col("vec"), lit_vector(Array(1f, 2f, 3f))).as("d"))
          .orderBy("d").limit(3)
        assert(planOf(q).contains("index=rw_seg"), planOf(q))
        assert(q.collect().map(_.getDouble(1)).toSeq == Seq(0.0, 1.0, 1.0))
      } finally {
        Hnsw.dropIndex(spark, "rw_seg")
        Hnsw.createIndex(spark, "rw_l2", grid, "vec", "id", overwrite = true)
      }
    } finally spark.conf.unset(Hnsw.MaxVectorsPerPartitionKey)
  }

  test("fetch projection pushdown: scan outputs only consumed columns (hnsw_index_scan.cpp:95-121)") {
    val qv = lit_vector(Array(1f, 2f, 3f))
    // Outer projection keeps only `id`: the sort key's vector column is
    // served by the index, so the rowid fetch must not read `vec`.
    val q = grid.orderBy(array_distance(col("vec"), qv)).limit(3).select("id")
    val scans = q.queryExecution.executedPlan.collect {
      case e: graft.plans.HnswIndexScanExec => e
    }
    assert(scans.nonEmpty, q.queryExecution.executedPlan.toString)
    assert(scans.head.output.map(_.name) == Seq("id"), scans.head.output.toString)
    assert(q.collect().head.getLong(0) == 11L)
    // When the projection recomputes the distance, the vector column stays.
    val q2 = grid.select(col("id"), array_distance(col("vec"), qv).as("d"))
      .orderBy("d").limit(3)
    val scan2 = q2.queryExecution.executedPlan.collect {
      case e: graft.plans.HnswIndexScanExec => e
    }.head
    assert(scan2.output.map(_.name).toSet == Set("id", "vec"))
    assert(q2.collect().map(_.getDouble(1)).toSeq == Seq(0.0, 1.0, 1.0))
  }

  test("gate-shaped filtered TopN on real embeddings rides the index") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    Hnsw.createIndex(spark, "rw_emb_filter", emb, "embedding", "vec_id",
      Map("ef_search" -> "1000000"), overwrite = true)
    try {
      val q = emb.where(col("label") % 3 === 0)
        .select(col("vec_id"), col("label"),
          array_distance(col("embedding"), lit_vector(Array.fill(64)(0f))).as("d"))
        .orderBy("d").limit(10)
      assert(planOf(q).contains("filtered="), planOf(q))
      val rows = q.collect()
      assert(rows.length == 10 && rows.forall(_.getInt(1) % 3 == 0))
    } finally Hnsw.dropIndex(spark, "rw_emb_filter")
  }

  test("ef_search session conf reaches the scan (O16)") {
    spark.conf.set(Hnsw.EfSearchKey, "123")
    try {
      val p = planOf(grid.orderBy(array_distance(col("vec"), lit_vector(Array(1f, 2f, 3f)))).limit(3))
      assert(p.contains("ef=123"), p)
    } finally spark.conf.unset(Hnsw.EfSearchKey)
  }
}
