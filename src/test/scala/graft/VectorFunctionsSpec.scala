package graft

import org.apache.spark.sql.functions._

import graft.functions._

class VectorFunctionsSpec extends SparkSuite {
  import spark.implicits._

  private def grid729 = {
    // F1 fixture: 9^3 deterministic grid (hnsw_basic.test / hnsw_result.test).
    val r = spark.range(1, 10).select(col("id").cast("int"))
    r.select(col("id").as("a"))
      .crossJoin(r.select(col("id").as("b")))
      .crossJoin(r.select(col("id").as("c")))
      .select(array(col("a").cast("float"), col("b").cast("float"), col("c").cast("float")).as("vec"))
  }

  test("array_distance grid top-3 = 0.0, 1.0, 1.0 (hnsw_result.test:23-28)") {
    val got = grid729
      .select(array_distance(col("vec"), lit_vector(Array(1f, 2f, 3f))).as("d"))
      .orderBy("d").limit(3).as[Double].collect()
    assert(got.toSeq == Seq(0.0, 1.0, 1.0))
  }

  test("distance functions: known values") {
    val df = Seq((Array(1f, 2f, 3f), Array(4f, 6f, 8f))).toDF("a", "b")
    val row = df.select(
      array_distance($"a", $"b"),
      array_squared_distance($"a", $"b"),
      array_inner_product($"a", $"b"),
      array_negative_inner_product($"a", $"b"),
      array_cosine_similarity($"a", $"b"),
      array_cosine_distance($"a", $"b")).head()
    assert(math.abs(row.getDouble(0) - math.sqrt(50.0)) < 1e-12)
    assert(row.getDouble(1) == 50.0)
    assert(row.getDouble(2) == 4.0 + 12.0 + 24.0)
    assert(row.getDouble(3) == -40.0)
    val cos = 40.0 / (math.sqrt(14.0) * math.sqrt(116.0))
    assert(math.abs(row.getDouble(4) - cos) < 1e-12)
    assert(math.abs(row.getDouble(5) - (1.0 - cos)) < 1e-12)
  }

  test("cosine zero-vector semantics (usearch index_plugins.hpp:1002-1030)") {
    val df = Seq(
      (Array(0f, 0f), Array(0f, 0f)),
      (Array(0f, 0f), Array(1f, 2f)),
      (Array(1f, 2f), Array(0f, 0f))).toDF("a", "b")
    val got = df.select(array_cosine_distance($"a", $"b").as("d")).as[Double].collect()
    assert(got.toSeq == Seq(0.0, 1.0, 1.0))
  }

  test("null vector -> null result") {
    val df = Seq((Some(Array(1f, 2f)), None: Option[Array[Float]])).toDF("a", "b")
    val got = df.select(array_distance($"a", $"b")).head()
    assert(got.isNullAt(0))
  }

  test("SQL registration via extensions") {
    val d = spark.sql(
      "SELECT array_distance(array(1.0f, 2.0f), array(1.0f, 2.0f)) AS d").head().getDouble(0)
    assert(d == 0.0)
    val c = spark.sql(
      "SELECT array_cosine_similarity(array(1.0f, 0.0f), array(1.0f, 0.0f)) AS c").head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("properties: symmetry, non-negativity, self-distance zero (seeded)") {
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(50)((
      Array.fill(8)(rnd.nextFloat() * 200f - 100f),
      Array.fill(8)(rnd.nextFloat() * 200f - 100f)))
    val rows = pairs.toDF("a", "b").select(
      array_distance($"a", $"b"), array_distance($"b", $"a"),
      array_distance($"a", $"a"), array_cosine_distance($"a", $"b")).collect()
    rows.foreach { row =>
      assert(row.getDouble(0) == row.getDouble(1))
      assert(row.getDouble(0) >= 0.0)
      assert(row.getDouble(2) == 0.0)
      assert(row.getDouble(3) >= -1e-12 && row.getDouble(3) <= 2.0 + 1e-12)
    }
  }

  test("dimension mismatch raises") {
    val df = Seq((Array(1f, 2f), Array(1f, 2f, 3f))).toDF("a", "b")
    val e = intercept[Exception](df.select(array_distance($"a", $"b")).head())
    assert(e.getMessage != null)
  }
}
