package graft

import org.apache.spark.sql.functions.col


import graft.sql.DistanceOperators

/** The reference's distance-operator spellings `<->`/`<=>`/`<#>`
  * (hnsw_index.cpp:663-669) through the SQL surface. */
class DistanceOperatorSpec extends SparkSuite {
  import spark.implicits._

  private def ones = Seq((1L, Array(1f, 0f), Array(0f, 2f))).toDF("id", "a", "b")

  test("<-> is array_distance (L2)") {
    ones.createOrReplaceTempView("dop_t1")
    val d = spark.sql("SELECT a <-> b AS d FROM dop_t1").collect().head.getDouble(0)
    assert(math.abs(d - math.sqrt(5.0)) < 1e-9)
  }

  test("<#> is the negative inner product") {
    ones.createOrReplaceTempView("dop_t2")
    val d = spark.sql("SELECT a <#> a AS d FROM dop_t2").collect().head.getDouble(0)
    assert(d == -1.0)
  }

  test("<=> on FLOAT vectors is cosine distance; other types keep null-safe equality") {
    ones.createOrReplaceTempView("dop_t3")
    val d = spark.sql("SELECT a <=> b AS d FROM dop_t3").collect().head.getDouble(0)
    assert(math.abs(d - 1.0) < 1e-6) // orthogonal → cosine distance 1
    // Longs: Spark semantics untouched.
    val eq = spark.sql("SELECT id <=> 1L AS ok FROM dop_t3").collect().head.getBoolean(0)
    assert(eq)
    // Conf off: float vectors fall back to Spark's null-safe equality too.
    spark.conf.set(DistanceOperators.CosineOperatorKey, "false")
    try {
      val r = spark.sql("SELECT a <=> a AS ok FROM dop_t3").collect().head
      assert(r.getBoolean(0))
    } finally spark.conf.unset(DistanceOperators.CosineOperatorKey)
  }

  test("Column.eqNullSafe on float vectors is shadowed too (documented); conf restores it") {
    // The rule sees analyzed plans with no SQL-vs-API provenance, so the
    // DataFrame spelling of null-safe equality over two float vectors is
    // the same surface as SQL `<=>` — documented in DistanceOperators'
    // scaladoc; this pins the documented behavior.
    val df = ones
    val viaApi = df.select((col("a") <=> col("b")).as("d")).collect().head
    assert(math.abs(viaApi.getDouble(0) - 1.0) < 1e-6)
    spark.conf.set(DistanceOperators.CosineOperatorKey, "false")
    try {
      val r = df.select((col("a") <=> col("a")).as("ok")).collect().head
      assert(r.getBoolean(0))
    } finally spark.conf.unset(DistanceOperators.CosineOperatorKey)
  }

  test("operators bind tighter than comparisons and survive WHERE/ORDER BY") {
    val df = Seq((1L, Array(0f, 0f)), (2L, Array(3f, 4f)), (3L, Array(6f, 8f)))
      .toDF("id", "v")
    df.createOrReplaceTempView("dop_t4")
    val kept = spark.sql(
      "SELECT id FROM dop_t4 WHERE v <-> array(0.0F, 0.0F) < 6.0 ORDER BY v <-> array(0.0F, 0.0F)")
      .collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L, 2L))
  }

  test("tokens inside string literals and comments are untouched") {
    assert(DistanceOperators.rewrite("SELECT '<->' AS s, x <#> y FROM t") ==
      "SELECT '<->' AS s, x  - _graft_op_negip() -  y FROM t")
    assert(DistanceOperators.rewrite("SELECT 1 -- a <-> b\n, x") ==
      "SELECT 1 -- a <-> b\n, x")
    assert(DistanceOperators.rewrite("SELECT /* <#> */ 2") == "SELECT /* <#> */ 2")
    // Backslash-escaped quote inside a literal must not flip the scanner
    // out of string state (the rest of the literal would rewrite as code).
    assert(DistanceOperators.rewrite("SELECT 'a\\' <-> b' AS s") ==
      "SELECT 'a\\' <-> b' AS s")
    val plain = "SELECT a, b FROM t"
    assert(DistanceOperators.rewrite(plain) eq plain) // no-token fast path
    val r = spark.sql("SELECT '<->' AS s").collect().head.getString(0)
    assert(r == "<->")
  }

  test("<-> feeds the TopN index rewrite like the named function") {
    // The operator resolves to the SAME ArrayDistance expression the
    // rules match on, so ORDER BY v <-> q LIMIT k over an indexed table
    // plans as an index scan with no extra work.
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val name = "dop_idx"
    Hnsw.createIndex(spark, name, emb, "embedding", "vec_id",
      Map("ef_search" -> "1000000"), overwrite = true)
    try {
      emb.createOrReplaceTempView("dop_emb")
      val q = (0 until emb.select(col("embedding")).head.getSeq[Float](0).size)
        .map(_ => "0.0F").mkString("array(", ", ", ")")
      val df = spark.sql(
        s"SELECT vec_id FROM dop_emb ORDER BY embedding <-> $q LIMIT 3")
      val planned = df.queryExecution.executedPlan.toString
      assert(planned.contains("HnswIndexScan"),
        s"expected the operator spelling to hit the index rewrite:\n$planned")
      assert(df.collect().length == 3)
    } finally Hnsw.dropIndex(spark, name)
  }
}
