package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

import graft.functions.{array_distance, lit_vector}
import graft.index.IndexCatalog

/** SQL DDL surface: CREATE INDEX … USING HNSW, DROP INDEX, PRAGMA
  * hnsw_compact_index / hnsw_index_info — the statement shapes the
  * reference's test suite uses, adapted for explicit id columns. */
class SqlDdlSpec extends SparkSuite {

  private val base: String = {
    val d = Files.createTempDirectory("graft-ddl").toFile.getAbsolutePath
    spark.conf.set(Hnsw.LocationKey, d)
    d
  }

  private def setupTable(): Unit = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ddl-t").toFile.getAbsolutePath
    val rows = for (a <- 1 to 9; b <- 1 to 9; c <- 1 to 9)
      yield ((a - 1) * 81L + (b - 1) * 9 + (c - 1), Array(a.toFloat, b.toFloat, c.toFloat))
    rows.toDF("id", "vec").withColumn("vec", col("vec").cast("array<float>"))
      .write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("ddl_grid")
  }

  test("CREATE INDEX / PRAGMA info / DROP INDEX round-trip (hnsw_basic.test DDL)") {
    setupTable()
    spark.sql(
      """CREATE INDEX ddl_idx ON ddl_grid USING HNSW (vec)
         WITH (id_column = 'id', metric = 'l2sq', M = 8, ef_search = 100000)""")
    assert(IndexCatalog.exists(base, "ddl_idx"))
    val meta = IndexCatalog.load(base, "ddl_idx")
    assert(meta.m == 8 && meta.count == 729)
    // the index answers the O3 shape through the rewrite
    val q = spark.table("ddl_grid")
      .orderBy(array_distance(col("vec"), lit_vector(Array(1f, 2f, 3f)))).limit(1)
    assert(q.queryExecution.executedPlan.toString.contains("HnswIndexScan"))
    assert(q.collect().head.getLong(0) == 11L)
    // info pragma
    val info = spark.sql("PRAGMA hnsw_index_info")
    val row = info.where(col("index_name") === "ddl_idx").collect().head
    assert(row.getAs[Long]("count") == 729L && row.getAs[String]("metric") == "l2sq")
    // compaction pragma is a no-op without tombstones but must run
    spark.sql("PRAGMA hnsw_compact_index('ddl_idx')")
    assert(IndexCatalog.load(base, "ddl_idx").count == 729)
    // drop
    spark.sql("DROP INDEX ddl_idx")
    assert(!IndexCatalog.exists(base, "ddl_idx"))
    intercept[IllegalArgumentException](spark.sql("DROP INDEX ddl_idx"))
    spark.sql("DROP INDEX IF EXISTS ddl_idx") // no error
  }

  test("CREATE INDEX without id_column errors clearly") {
    setupTable()
    val e = intercept[IllegalArgumentException](
      spark.sql("CREATE INDEX ddl_noid ON ddl_grid USING HNSW (vec)"))
    assert(e.getMessage.contains("id_column"))
  }

  test("SQL TVFs vss_join / vss_match (hnsw_index_macros.cpp:109-113)") {
    setupTable()
    // vss_join with TABLE(...) arguments: k best right rows per left row.
    val j = spark.sql(
      """SELECT left_tbl.id AS l_id, right_tbl.id AS r_id, score
         FROM vss_join(TABLE(ddl_grid), TABLE(ddl_grid), 'vec', 'vec', 3)
         WHERE left_tbl.id = 0 ORDER BY score, r_id""").collect()
    assert(j.length == 3)
    assert(j.head.getAs[Long]("l_id") == 0L && j.head.getAs[Double]("score") == 0.0)
    // string-literal table names + metric argument work too
    val jc = spark.sql(
      "SELECT count(*) AS n FROM vss_join('ddl_grid', 'ddl_grid', 'vec', 'vec', 2, 'cosine')")
      .collect().head.getLong(0)
    assert(jc == 729L * 2)
    // vss_match: left.* plus a matches LIST<STRUCT<score, row>>
    val m = spark.sql(
      """SELECT id, size(matches) AS n, matches[0].score AS best
         FROM vss_match(TABLE(ddl_grid), TABLE(ddl_grid), 'vec', 'vec', 5)
         WHERE id < 3 ORDER BY id""").collect()
    assert(m.length == 3)
    assert(m.forall(r => r.getInt(1) == 5 && r.getDouble(2) == 0.0))
    // arity/argument errors are clear
    val e = intercept[Exception](
      spark.sql("SELECT * FROM vss_join('ddl_grid', 'ddl_grid', 'vec', 'vec')"))
    assert(e.getMessage.contains("5 to 7"))
  }

  test("SQL TVFs ann_topk / lateral_topk expose the index-backed paths") {
    setupTable()
    spark.sql(
      """CREATE INDEX ddl_ann_idx ON ddl_grid USING HNSW (vec)
         WITH (id_column = 'id', ef_search = 100000)""")
    try {
      // ann_topk: per-row neighbors straight off the index join core.
      val a = spark.sql(
        """SELECT id, neighbor_id, rn FROM
             ann_topk(TABLE(SELECT * FROM ddl_grid WHERE id < 2), 'ddl_ann_idx', 'vec', 3)
           ORDER BY id, rn""").collect()
      assert(a.length == 6)
      assert(a.head.getAs[Long]("neighbor_id") == 0L) // self is nearest
      // lateral_topk rewrites onto the index join when the index matches
      // (inner side keeps the indexed table's own column names — renames
      // block index binding, like any non-trivial projection would).
      val q = spark.sql(
        """SELECT a_id, id AS b_id, rn FROM lateral_topk(
             TABLE(SELECT id AS a_id, vec AS a_vec FROM ddl_grid WHERE id = 0),
             TABLE(ddl_grid),
             'a_vec', 'vec', 'a_id', 2)
           ORDER BY rn""")
      assert(q.queryExecution.executedPlan.toString.contains("HnswIndexJoinCore"),
        q.queryExecution.executedPlan.toString)
      val rows = q.collect()
      assert(rows.length == 2 && rows.head.getAs[Long]("b_id") == 0L)
      // arity errors are clear
      val e = intercept[Exception](
        spark.sql("SELECT * FROM ann_topk('ddl_grid', 'ddl_ann_idx', 'vec')"))
      assert(e.getMessage.contains("4 arguments"))
    } finally Hnsw.dropIndex(spark, "ddl_ann_idx")
  }

  test("SQL TVFs for the dedup family") {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "completely different content about spark engines"),
      (4L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text").createOrReplaceTempView("tvf_docs")
    val exact = spark.sql(
      "SELECT * FROM dedup_exact(TABLE(tvf_docs), 'text', 'doc_id')").collect()
    assert(exact.length == 1 && exact.head.getAs[Long]("keep_id") == 1L)
    val near = spark.sql(
      """SELECT id_a, id_b FROM dedup_near(TABLE(tvf_docs), 'text', 'doc_id', 0.5)
         ORDER BY id_a, id_b""").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(near.contains((1L, 4L)) && near.contains((1L, 2L)))
    val kept = spark.sql(
      """SELECT doc_id FROM dedup_drop(TABLE(tvf_docs), 'text', 'doc_id', 0.5)
         ORDER BY doc_id""").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L, 3L))
    val jj = spark.sql(
      """SELECT id_a, id_b FROM ngram_jaccard_join(TABLE(tvf_docs), 'text', 'doc_id', 1.0)
         ORDER BY id_a""").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(jj == Seq((1L, 4L)))
    val sh = spark.sql(
      "SELECT * FROM simhash_pairs(TABLE(tvf_docs), 'text', 'doc_id', 7)").collect()
    assert(sh.exists(r => r.getLong(0) == 1L && r.getLong(1) == 4L && r.getInt(2) == 0))
    Seq((1L, Array(1f, 0f, 0f)), (2L, Array(2f, 0f, 0f)), (3L, Array(0f, 1f, 0f)))
      .toDF("vec_id", "vec").createOrReplaceTempView("tvf_vecs")
    val em = spark.sql(
      """SELECT id_a, id_b FROM embedding_near_dup(TABLE(tvf_vecs), 'vec', 'vec_id', 0.99)
         ORDER BY id_a""").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(em == Seq((1L, 2L)))
    // semdedup_drop: the ClusterSpec chain corner through SQL — 2 and 3
    // drop (preds 1 and 2), 12 drops (pred 11); 1, 4, 11 stay.
    Seq((1L, Array(1.00f, 1f)), (2L, Array(1.25f, 1f)),
        (3L, Array(1.50f, 1f)), (4L, Array(3.00f, 3f)),
        (11L, Array(-1.00f, -1f)), (12L, Array(-1.25f, -1f)))
      .toDF("vec_id", "vec").createOrReplaceTempView("tvf_sdd")
    val sd = spark.sql(
      """SELECT vec_id FROM semdedup_drop(TABLE(tvf_sdd), 'vec', 'vec_id', 2, 600)
         ORDER BY vec_id""").collect().map(_.getLong(0)).toSeq
    assert(sd == Seq(1L, 4L, 11L))
    val err = intercept[Exception](
      spark.sql("SELECT * FROM dedup_near(TABLE(tvf_docs), 'text', 'doc_id')"))
    assert(err.getMessage.contains("4 to 4"))
  }

  test("SQL TVFs for the event-stream operators") {
    import spark.implicits._
    Seq(("a", 10L, "f1"), ("a", 25L, "f2")).toDF("k", "ts", "fact")
      .createOrReplaceTempView("tvf_facts")
    Seq(("a", 5L, 1.0), ("a", 20L, 2.0)).toDF("k", "ts", "price")
      .createOrReplaceTempView("tvf_quotes")
    val asof = spark.sql(
      """SELECT fact, asof_price FROM
         as_of_join(TABLE(tvf_facts), TABLE(tvf_quotes), 'k', 'ts', 'ts')
         ORDER BY fact""").collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(asof == Seq(("f1", 1.0), ("f2", 2.0)))
    // optional 7th arg: tolerance (f1's match at gap 5 survives, f2's at
    // gap 5 too; tolerance 4 nulls both)
    val tol = spark.sql(
      """SELECT fact, asof_price FROM
         as_of_join(TABLE(tvf_facts), TABLE(tvf_quotes), 'k', 'ts', 'ts', 'backward', 4)
         ORDER BY fact""").collect().map(r => (r.getString(0), r.isNullAt(1))).toSeq
    assert(tol == Seq(("f1", true), ("f2", true)))
    val tol5 = spark.sql(
      """SELECT fact, asof_price FROM
         as_of_join(TABLE(tvf_facts), TABLE(tvf_quotes), 'k', 'ts', 'ts', 'backward', 5)
         ORDER BY fact""").collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(tol5 == Seq(("f1", 1.0), ("f2", 2.0)))
    Seq(("u", 100L), ("u", 150L), ("u", 900L)).toDF("k", "ts")
      .createOrReplaceTempView("tvf_ev")
    val sess = spark.sql(
      "SELECT ts, session_seq FROM sessionize(TABLE(tvf_ev), 'k', 'ts', 200) ORDER BY ts")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(sess == Seq((100L, 1L), (150L, 1L), (900L, 2L)))
    // comma-separated multi-key: (k, region) scopes sessions separately
    Seq(("u", "eu", 100L), ("u", "us", 150L), ("u", "eu", 900L)).toDF("k", "region", "ts")
      .createOrReplaceTempView("tvf_ev2")
    val sess2 = spark.sql(
      """SELECT region, ts, session_seq
         FROM sessionize(TABLE(tvf_ev2), 'k, region', 'ts', 200) ORDER BY ts""")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(sess2 == Seq(("eu", 100L, 1L), ("us", 150L, 1L), ("eu", 900L, 2L)))
    Seq(("a", 1L, 15L)).toDF("k", "pid", "ts").createOrReplaceTempView("tvf_pts")
    Seq(("a", 9L, 10L, 20L)).toDF("k", "iid", "s", "e")
      .createOrReplaceTempView("tvf_iv")
    val rj = spark.sql(
      """SELECT pid, iv_iid FROM
         range_join(TABLE(tvf_pts), TABLE(tvf_iv), 'k', 'ts', 's', 'e', 8)""")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rj == Seq((1L, 9L)))
  }

  test("bad options surface the reference binder messages through SQL") {
    setupTable()
    val e = intercept[IllegalArgumentException](spark.sql(
      "CREATE INDEX ddl_bad ON ddl_grid USING HNSW (vec) WITH (id_column = 'id', M = '0')"))
    assert(e.getMessage == "HNSW index 'M' must be at least 2")
    // non-DDL statements still parse through the delegate
    assert(spark.sql("SELECT 1 + 1 AS v").collect().head.getInt(0) == 2)
  }
}
