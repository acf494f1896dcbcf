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

  // NULL vectors are excluded from every distance computation on BOTH
  // sides (r16 null-hardened fixture): DuckDB's list_distance/cosine/ip
  // ERROR on a NULL list where Spark null-propagates, so the symmetric
  // cross-engine statement is exclusion — the same posture as the index
  // builders (a null vector never enters an index).
  private def withQueryVec(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "embeddings").where(col("embedding").isNotNull)
    val q = e.where(col("vec_id") === 0).select(col("embedding").as("qvec"))
    e.crossJoin(broadcast(q))
  }

  private def metricQuery(metric: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column)(
      s: SparkSession, dir: String): DataFrame =
    withQueryVec(s, dir)
      .select(col("vec_id"), round(metric(col("embedding"), col("qvec")), 4).as("d"))
      .orderBy("vec_id")

  private def operatorQuery(op: String)(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "embeddings").createOrReplaceTempView("graft_vfq_emb")
    s.sql(
      s"""SELECT /*+ BROADCAST(q) */ e.vec_id,
            round(e.embedding $op q.embedding, 4) AS d
          FROM graft_vfq_emb e,
            (SELECT embedding FROM graft_vfq_emb WHERE vec_id = 0) q
          WHERE e.embedding IS NOT NULL""")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "vss_array_distance" -> (metricQuery(array_distance) _),
    "vss_cosine_distance" -> (metricQuery(array_cosine_distance) _),
    "vss_cosine_similarity" -> (metricQuery(array_cosine_similarity) _),
    "vss_inner_product" -> (metricQuery(array_inner_product) _),
    "vss_neg_inner_product" -> (metricQuery(array_negative_inner_product) _),
    // The reference's operator SPELLINGS (hnsw_index.cpp:663-669) through
    // the SQL surface — same semantics as the named functions above, which
    // is exactly the claim these gates pin (the oracle side spells the
    // named DuckDB functions). BROADCAST(q) keeps the 1-row query side the
    // build side (the BNLJ self-join trap: both sides estimate equal).
    "vss_op_l2" -> (operatorQuery("<->") _),
    "vss_op_cos" -> (operatorQuery("<=>") _),
    "vss_op_negip" -> (operatorQuery("<#>") _),
    "vss_topn_scan" -> ((s, dir) =>
      // The O3 shape: ORDER BY distance LIMIT k (brute-force path;
      // TakeOrderedAndProject — the HNSW rewrite is exercised in tests).
      withQueryVec(s, dir)
        .select(col("vec_id"), round(array_distance(col("embedding"), col("qvec")), 4).as("d"))
        .orderBy(col("d"), col("vec_id"))
        .limit(10)),
    "vss_l2_normalize" -> ((s, dir) => {
      // Normalized vector checked via two dot products (a LIST output would
      // break the driver comparator): u·v recovers the norm, u·u ≈ 1.
      val e = Tables.load(s, dir, "embeddings").where(col("embedding").isNotNull)
      val n = array_l2_normalize(col("embedding"))
      e.select(col("vec_id"),
          round(array_inner_product(n, col("embedding")), 4).as("d"),
          round(array_inner_product(n, n), 4).as("unit"))
    }),
    "emb_kmeans" -> ((s, dir) => {
      // Deterministic integer-Lloyd clustering (SemDeDup's cluster stage):
      // quantize(round(x*64), clamp 127) -> k=8, 3 update steps, truncating
      // integer centroid division, argmin ties to the smallest cluster.
      // Every step is order-free integer math, so the oracle's unrolled
      // SQL replay must match byte-for-byte (cluster AND exact dist2).
      graft.embedding.Cluster.kmeansAssign(
          Tables.load(s, dir, "embeddings"), "embedding", "vec_id",
          k = 8, iters = 3)
        .select(col("vec_id"), col("cluster").cast("long").as("cluster"),
          col("dist2"))
    }),
    "emb_cluster_sample" -> ((s, dir) => {
      // The full SemDeDup selection end-to-end: integer-Lloyd clusters,
      // then the first 20 ids of each cluster in md5(id) order (the
      // library-wide deterministic fill order, via the min_by_k bounded
      // heap). Oracle = the kmeans replay + row_number over the same
      // (md5, id) order.
      graft.embedding.Cluster.clusterSample(
          Tables.load(s, dir, "embeddings"), "embedding", "vec_id",
          k = 8, perCluster = 20, iters = 3)
        .select(col("vec_id"), col("cluster").cast("long").as("cluster"))
    }),
    "emb_semdedup" -> ((s, dir) => {
      // The SemDeDup PRUNE stage end-to-end (r16): integer-Lloyd clusters,
      // then drop every vector within tau2 = 6000 (exact integer squared
      // L2 over the quantized vectors; the corpus' minimum pair distance
      // is 4049, p1 5821 — the threshold bites without flattening a
      // cluster) of a lower-id vector in the same cluster. All-integer →
      // the oracle replays clustering AND pruning exactly.
      graft.embedding.Cluster.semDedupDrop(
          Tables.load(s, dir, "embeddings"), "embedding", "vec_id",
          k = 8, tau2 = 6000L, iters = 3)
        .select(col("vec_id"))
    }),
    "vss_quantize_i8" -> ((s, dir) => {
      // Codes proven byte-exact via md5 of the comma-joined list; the
      // dequantized reconstruction closes the loop through
      // array_dequantize_i8. Formula order is the cross-engine contract —
      // see VectorMath.quantizeI8.
      val e = Tables.load(s, dir, "embeddings").where(col("embedding").isNotNull)
      e.withColumn("q", array_quantize_i8(col("embedding")))
        .select(col("vec_id"),
          round(col("q.scale").cast("double"), 6).as("scale"),
          md5(concat_ws(",", col("q.codes").cast("array<string>"))).as("codes_md5"),
          round(array_inner_product(
            array_dequantize_i8(col("q.codes"), col("q.scale")),
            col("embedding")), 4).as("recon_dot"))
    })
  )

  private val fromClause =
    """FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
       WHERE e.embedding IS NOT NULL"""

  private def metricSql(duckExpr: String): String =
    s"SELECT e.vec_id, round($duckExpr, 4) AS d $fromClause"

  /** Shared DuckDB replay of the integer Lloyd fit the emb_* gates pin
    * (k = 8, 3 update rounds, 64-dim, quantScale 64): CTE chain from `q`
    * (quantized vectors) to `af` (final assignment; `WHERE rn = 1` picks
    * the smallest-cluster argmin, the kernel's tiebreak). */
  private val kmeansReplayCtes: String =
    """q AS (
           SELECT vec_id,
             list_transform(embedding, x -> greatest(-127, least(127,
               CAST(round(CAST(x AS DOUBLE) * 64) AS BIGINT)))) AS v
           FROM embeddings WHERE embedding IS NOT NULL),
         c0 AS (
           SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS c,
                  v AS cent
           FROM (SELECT vec_id, v FROM q ORDER BY vec_id LIMIT 8)),
         a1 AS (
           SELECT vec_id, v, c, d2,
             row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
           FROM (SELECT q.vec_id, q.v, c0.c,
                   list_sum(list_transform(range(1, 65),
                     i -> (q.v[i] - c0.cent[i]) * (q.v[i] - c0.cent[i]))) AS d2
                 FROM q, c0)),
         s1 AS (
           SELECT c, i, sum(v[i]) AS s, count(*) AS n
           FROM (SELECT * FROM a1 WHERE rn = 1), range(1, 65) t(i)
           GROUP BY c, i),
         c1 AS (
           SELECT c0.c, coalesce(u.cent, c0.cent) AS cent
           FROM c0 LEFT JOIN (
             SELECT c, list(s // n ORDER BY i) AS cent FROM s1 GROUP BY c)
             u USING (c)),
         a2 AS (
           SELECT vec_id, v, c, d2,
             row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
           FROM (SELECT q.vec_id, q.v, c1.c,
                   list_sum(list_transform(range(1, 65),
                     i -> (q.v[i] - c1.cent[i]) * (q.v[i] - c1.cent[i]))) AS d2
                 FROM q, c1)),
         s2 AS (
           SELECT c, i, sum(v[i]) AS s, count(*) AS n
           FROM (SELECT * FROM a2 WHERE rn = 1), range(1, 65) t(i)
           GROUP BY c, i),
         c2 AS (
           SELECT c1.c, coalesce(u.cent, c1.cent) AS cent
           FROM c1 LEFT JOIN (
             SELECT c, list(s // n ORDER BY i) AS cent FROM s2 GROUP BY c)
             u USING (c)),
         a3 AS (
           SELECT vec_id, v, c, d2,
             row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
           FROM (SELECT q.vec_id, q.v, c2.c,
                   list_sum(list_transform(range(1, 65),
                     i -> (q.v[i] - c2.cent[i]) * (q.v[i] - c2.cent[i]))) AS d2
                 FROM q, c2)),
         s3 AS (
           SELECT c, i, sum(v[i]) AS s, count(*) AS n
           FROM (SELECT * FROM a3 WHERE rn = 1), range(1, 65) t(i)
           GROUP BY c, i),
         c3 AS (
           SELECT c2.c, coalesce(u.cent, c2.cent) AS cent
           FROM c2 LEFT JOIN (
             SELECT c, list(s // n ORDER BY i) AS cent FROM s3 GROUP BY c)
             u USING (c)),
         af AS (
           SELECT vec_id, c, d2,
             row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
           FROM (SELECT q.vec_id, c3.c,
                   list_sum(list_transform(range(1, 65),
                     i -> (q.v[i] - c3.cent[i]) * (q.v[i] - c3.cent[i]))) AS d2
                 FROM q, c3))"""

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
    "vss_op_l2" ->
      metricSql("list_distance(e.embedding::DOUBLE[], q.embedding::DOUBLE[])"),
    "vss_op_cos" ->
      metricSql("1.0 - list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[])"),
    "vss_op_negip" ->
      metricSql("-list_inner_product(e.embedding::DOUBLE[], q.embedding::DOUBLE[])"),
    "vss_topn_scan" ->
      s"""SELECT e.vec_id, round(list_distance(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 4) AS d
          $fromClause ORDER BY d, e.vec_id LIMIT 10""".stripMargin,
    "vss_l2_normalize" ->
      """WITH n AS (
           SELECT vec_id, embedding AS v,
             sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS nrm
           FROM embeddings WHERE embedding IS NOT NULL),
         nv AS (
           SELECT vec_id, v,
             CASE WHEN nrm = 0 THEN v
                  ELSE list_transform(v, x -> CAST(CAST(x AS DOUBLE) / nrm AS FLOAT))
             END AS nu
           FROM n)
         SELECT vec_id,
           round(list_inner_product(nu::DOUBLE[], v::DOUBLE[]), 4) AS d,
           round(list_inner_product(nu::DOUBLE[], nu::DOUBLE[]), 4) AS unit
         FROM nv""",
    // SemDeDup selection end-to-end: the kmeans replay + row_number over
    // the library-wide (md5(id), id) fill order, capped per cluster.
    "emb_cluster_sample" ->
      s"""WITH $kmeansReplayCtes,
         sel AS (SELECT vec_id, c FROM af WHERE rn = 1),
         rk AS (SELECT vec_id, c, row_number() OVER (PARTITION BY c
                  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
                FROM sel)
         SELECT vec_id, CAST(c AS BIGINT) AS cluster
         FROM rk WHERE rk <= 20""",
    // Integer Lloyd unrolled: init = 8 smallest vec_ids, three
    // assignment+update rounds, final assignment. All-integer (quantized
    // vectors, exact sums, truncating `//`), so the replay is exact.
    "emb_kmeans" ->
      s"""WITH $kmeansReplayCtes
         SELECT vec_id, CAST(c AS BIGINT) AS cluster, CAST(d2 AS BIGINT) AS dist2
         FROM af WHERE rn = 1""",
    "emb_semdedup" ->
      s"""WITH $kmeansReplayCtes,
         sel AS (SELECT vec_id, c FROM af WHERE rn = 1),
         dropd AS (
           SELECT DISTINCT b.vec_id
           FROM sel a JOIN sel b ON a.c = b.c AND a.vec_id < b.vec_id
           JOIN q qa ON qa.vec_id = a.vec_id
           JOIN q qb ON qb.vec_id = b.vec_id
           WHERE list_sum(list_transform(range(1, 65),
             i -> (qa.v[i] - qb.v[i]) * (qa.v[i] - qb.v[i]))) <= 6000)
         SELECT s.vec_id FROM sel s
         WHERE s.vec_id NOT IN (SELECT vec_id FROM dropd)
         UNION ALL
         -- NULL-vector rows have no cluster and are ALWAYS kept (the
         -- semDedupDrop contract); q/sel exclude them, so add them back.
         SELECT vec_id FROM embeddings WHERE embedding IS NULL""",
    "vss_quantize_i8" ->
      """WITH q AS (
           SELECT vec_id, embedding AS v,
             CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE) AS maxabs
           FROM embeddings WHERE embedding IS NOT NULL),
         enc AS (
           SELECT vec_id, v,
             CASE WHEN maxabs = 0 THEN CAST(0 AS FLOAT)
                  ELSE CAST(CAST(maxabs AS FLOAT) / CAST(127 AS FLOAT) AS FLOAT)
             END AS scale,
             CASE WHEN maxabs = 0
                  THEN list_transform(v, x -> CAST(0 AS TINYINT))
                  ELSE list_transform(v, x -> CAST(greatest(-127, least(127,
                         floor(CAST(x AS DOUBLE) * 127 / maxabs + 0.5))) AS TINYINT))
             END AS codes
           FROM q)
         SELECT vec_id,
           round(CAST(scale AS DOUBLE), 6) AS scale,
           md5(array_to_string(codes, ',')) AS codes_md5,
           round(list_inner_product(
             list_transform(codes, c -> CAST(CAST(c AS DOUBLE) * scale AS FLOAT))::DOUBLE[],
             v::DOUBLE[]), 4) AS recon_dot
         FROM enc"""
  )
}
