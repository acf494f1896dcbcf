package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions._

/**
 * Correctness-gate queries for the scalar distance functions (SURVEY §2.2).
 *
 * Convention shared with the DuckDB oracle SQL:
 *  - the "query vector" is the embedding of `vec_id = 0` (self-join, so no
 *    float literals need to round-trip through SQL text);
 *  - both engines accumulate in DOUBLE (oracle casts `::DOUBLE[]`) and the
 *    final value is `round(x, 4)` so bit-level accumulation differences
 *    can't flip the hash compare;
 *  - deterministic output order by `vec_id`.
 */
object VectorFunctionQueries {

  private def withQueryVec(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "embeddings")
    val q = e.where(col("vec_id") === 0).select(col("embedding").as("qvec"))
    e.crossJoin(broadcast(q))
  }

  private def metricQuery(metric: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column)(
      s: SparkSession, dir: String): DataFrame =
    withQueryVec(s, dir)
      .select(col("vec_id"), round(metric(col("embedding"), col("qvec")), 4).as("d"))
      .orderBy("vec_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "vss_array_distance" -> (metricQuery(array_distance) _),
    "vss_cosine_distance" -> (metricQuery(array_cosine_distance) _),
    "vss_cosine_similarity" -> (metricQuery(array_cosine_similarity) _),
    "vss_inner_product" -> (metricQuery(array_inner_product) _),
    "vss_neg_inner_product" -> (metricQuery(array_negative_inner_product) _),
    "vss_topn_scan" -> ((s, dir) =>
      // The O3 shape: ORDER BY distance LIMIT k (brute-force path;
      // TakeOrderedAndProject — the HNSW rewrite is exercised in tests).
      withQueryVec(s, dir)
        .select(col("vec_id"), round(array_distance(col("embedding"), col("qvec")), 4).as("d"))
        .orderBy(col("d"), col("vec_id"))
        .limit(10))
  )

  private val fromClause =
    "FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q"

  private def metricSql(duckExpr: String): String =
    s"SELECT e.vec_id, round($duckExpr, 4) AS d $fromClause ORDER BY e.vec_id"

  val oracleSql: Map[String, String] = Map(
    "vss_array_distance" ->
      metricSql("list_distance(e.embedding::DOUBLE[], q.embedding::DOUBLE[])"),
    "vss_cosine_distance" ->
      metricSql("1.0 - list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[])"),
    "vss_cosine_similarity" ->
      metricSql("list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[])"),
    "vss_inner_product" ->
      metricSql("list_inner_product(e.embedding::DOUBLE[], q.embedding::DOUBLE[])"),
    "vss_neg_inner_product" ->
      metricSql("-list_inner_product(e.embedding::DOUBLE[], q.embedding::DOUBLE[])"),
    "vss_topn_scan" ->
      s"""SELECT e.vec_id, round(list_distance(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 4) AS d
          $fromClause ORDER BY d, e.vec_id LIMIT 10""".stripMargin
  )
}
