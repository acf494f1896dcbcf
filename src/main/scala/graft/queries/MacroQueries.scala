package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.api.Vss
import graft.functions.{array_distance, max_by_k, min_by_k}

/**
 * Correctness-gate queries for the k-arg min_by/max_by aggregate (O10) and
 * the vss_join / vss_match macros (O8/O9). DuckDB has native 3-arg
 * min_by/max_by, so the oracle exercises identical semantics.
 */
object MacroQueries {

  // NULL vectors are excluded on BOTH sides (the r16 null-hardened
  // fixture posture; DuckDB's list_distance errors on a NULL list).
  private def scoredVsQ0(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "embeddings").where(col("embedding").isNotNull)
    val q = e.where(col("vec_id") === 0).select(col("embedding").as("qvec"))
    e.crossJoin(broadcast(q))
      .withColumn("d", array_distance(col("embedding"), col("qvec")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "vss_min_by_k" -> ((s, dir) =>
      scoredVsQ0(s, dir).agg(min_by_k(col("vec_id"), col("d"), 8).as("ids"))),
    "vss_max_by_k" -> ((s, dir) =>
      scoredVsQ0(s, dir).agg(max_by_k(col("vec_id"), col("d"), 8).as("ids"))),
    "vss_min_by_k_grouped" -> ((s, dir) =>
      // per-label top-5 nearest ids — the top-k-per-group pattern at scale.
      // Gate output is a CSV string (driver comparator can't hash LIST
      // columns — CORRECTNESS_r01 err "unhashable numpy.ndarray").
      scoredVsQ0(s, dir).groupBy(col("label"))
        .agg(array_join(min_by_k(col("vec_id"), col("d"), 5).cast("array<string>"), ",").as("ids"))
        .orderBy("label")),
    "vss_join_macro" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings").where(col("embedding").isNotNull)
      Vss.vssJoin(e.where(col("vec_id") < 3), e, "embedding", "embedding", 5, "l2sq",
          leftKey = Some("vec_id"))
        .select(
          col("left_tbl").getField("vec_id").as("l_id"),
          col("right_tbl").getField("vec_id").as("r_id"),
          round(col("score"), 4).as("score"))
    }),
    "vss_join_sql" -> ((s, dir) => {
      // The same join as vss_join_macro, routed through the SQL TVF surface
      // (SELECT ... FROM vss_join(TABLE(...), ...)) — proving the
      // injectTableFunction registration end-to-end against the oracle.
      val e = Tables.load(s, dir, "embeddings").where(col("embedding").isNotNull)
      e.createOrReplaceTempView("emb_sql_all")
      e.where(col("vec_id") < 3).createOrReplaceTempView("emb_sql_q")
      s.sql(
        """SELECT left_tbl.vec_id AS l_id, right_tbl.vec_id AS r_id,
                  round(score, 4) AS score
           FROM vss_join(TABLE(emb_sql_q), TABLE(emb_sql_all), 'embedding', 'embedding', 5,
                         'l2sq', 'vec_id')""")
    }),
    "vss_match_macro" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings").where(col("embedding").isNotNull)
      Vss.vssMatch(e.where(col("vec_id") < 3), e, "embedding", "embedding", 5, "l2sq",
          leftKey = Some("vec_id"))
        .select(
          col("vec_id"),
          size(col("matches")).cast("long").as("n"),
          round(element_at(col("matches"), 1).getField("score"), 4).as("best"),
          array_join(transform(col("matches"), m => m.getField("row").getField("vec_id"))
            .cast("array<string>"), ",").as("match_ids"))
    })
  )

  private val q0 = "(SELECT embedding FROM embeddings WHERE vec_id = 0) q"
  private val eNN = "(SELECT * FROM embeddings WHERE embedding IS NOT NULL) e"
  private val dist = "list_distance(e.embedding::DOUBLE[], q.embedding::DOUBLE[])"

  // NOTE: oracle DuckDB is 1.0.0 (no 3-arg min_by/max_by) — express the
  // k-arg semantics with ordered list() + slicing instead.
  val oracleSql: Map[String, String] = Map(
    "vss_min_by_k" ->
      s"SELECT (list(e.vec_id ORDER BY $dist))[1:8] AS ids FROM $eNN, $q0",
    "vss_max_by_k" ->
      s"SELECT (list(e.vec_id ORDER BY $dist DESC))[1:8] AS ids FROM $eNN, $q0",
    "vss_min_by_k_grouped" ->
      s"""SELECT e.label, array_to_string((list(e.vec_id ORDER BY $dist))[1:5], ',') AS ids
          FROM $eNN, $q0 GROUP BY e.label""",
    "vss_join_macro" ->
      """WITH s AS (
           SELECT l.vec_id AS l_id, r.vec_id AS r_id,
                  list_distance(l.embedding::DOUBLE[], r.embedding::DOUBLE[]) AS score
           FROM embeddings l, embeddings r
           WHERE l.vec_id < 3 AND l.embedding IS NOT NULL
             AND r.embedding IS NOT NULL)
         SELECT l_id, r_id, round(score, 4) AS score
         FROM (SELECT *, row_number() OVER (PARTITION BY l_id ORDER BY score, r_id) AS rn FROM s)
         WHERE rn <= 5""",
    "vss_join_sql" ->
      """WITH s AS (
           SELECT l.vec_id AS l_id, r.vec_id AS r_id,
                  list_distance(l.embedding::DOUBLE[], r.embedding::DOUBLE[]) AS score
           FROM embeddings l, embeddings r
           WHERE l.vec_id < 3 AND l.embedding IS NOT NULL
             AND r.embedding IS NOT NULL)
         SELECT l_id, r_id, round(score, 4) AS score
         FROM (SELECT *, row_number() OVER (PARTITION BY l_id ORDER BY score, r_id) AS rn FROM s)
         WHERE rn <= 5""",
    "vss_match_macro" ->
      """WITH s AS (
           SELECT l.vec_id AS vec_id, r.vec_id AS rid,
                  list_distance(l.embedding::DOUBLE[], r.embedding::DOUBLE[]) AS score
           FROM embeddings l, embeddings r
           WHERE l.vec_id < 3 AND l.embedding IS NOT NULL
             AND r.embedding IS NOT NULL),
         m AS (SELECT vec_id,
                      (list(struct_pack(score := score, rid := rid) ORDER BY score))[1:5] AS matches
               FROM s GROUP BY vec_id)
         SELECT vec_id, len(matches) AS n, round(matches[1].score, 4) AS best,
                array_to_string(list_transform(matches, x -> x.rid), ',') AS match_ids
         FROM m"""
  )
}
