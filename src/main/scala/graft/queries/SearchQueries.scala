package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.api.Hybrid
import graft.functions.array_quantize_i8
import graft.text.Bm25

/**
 * Retrieval gates: BM25 lexical scoring/top-k and the hybrid
 * lexical+vector reciprocal-rank fusion.
 *
 * Cross-engine exactness strategy (every gate is value-checked, no digest
 * pins): BM25 scores are bit-identical by construction — idf is pinned to
 * integer ppm at fit (ln is the one non-portable op, see
 * [[graft.expressions.Bm25Kernel]]) and the oracle SQL below spells every
 * remaining IEEE op in the kernel's exact order, with DuckDB literals
 * CAST to DOUBLE so both engines run the same constants. The hybrid
 * gate's VECTOR leg deliberately rides the int8 quantization kernel
 * (byte-exact cross-engine contract, `vss_quantize_i8`) with an INTEGER
 * squared-L2 — float distance formulas are engine-internal and only
 * 4dp-portable (the metric gates round), but integer arithmetic over the
 * pinned codes is exact, so ranks (and therefore RRF) are deterministic.
 */
object SearchQueries {

  /** The gates' fixed query — common fixture terms (df ≈ 390/500 at
    * sf0.01), shared verbatim between the Spark side and the generated
    * oracle SQL. */
  private val QueryTerms = Seq("hash", "join", "window")
  private val TopN = 50 // per-retriever candidate depth for the fusion
  private val K = 10

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  private def bm25Scored(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    // fitQuery, not fit: the oracle computes df for the query terms only,
    // so the fair gate does the same work (one aggregate-only scan, no
    // vocabulary shuffle). fit == fitQuery on these terms is spec'd.
    val m = Bm25.fitQuery(d, "text", QueryTerms)
    d.where(col("text").isNotNull)
      .select(col("doc_id"),
        graft.text.TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
        Bm25.scoreColumn(col("text"), m, QueryTerms).as("score"))
  }

  /** Integer squared-L2 over the int8-quantized embeddings vs the
    * quantized vec_id-7 query — the exact-arithmetic vector ranking the
    * fusion gate uses (see class doc). */
  private def i8Distances(s: SparkSession, dir: String): DataFrame = {
    // Null embeddings are filtered on BOTH sides (the lex leg's
    // text.isNotNull posture): unfiltered, Spark's asc rank puts a NULL
    // d2 FIRST while DuckDB's ORDER BY puts it LAST — every rank below
    // would shift and the fused scores diverge.
    val e = Tables.load(s, dir, "embeddings")
      .where(col("embedding").isNotNull)
      .select(col("vec_id"), array_quantize_i8(col("embedding"))("codes").as("codes"))
    val q = e.where(col("vec_id") === 7).select(col("codes").as("qcodes"))
    e.crossJoin(broadcast(q))
      .select(col("vec_id"),
        aggregate(
          zip_with(col("codes"), col("qcodes"),
            (a, b) => (a.cast("long") - b.cast("long")) * (a.cast("long") - b.cast("long"))),
          lit(0L), (acc, x) => acc + x).as("d2"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "doc_bm25_score" -> ((s, dir) => {
      // The full scored corpus under the fixed query — the strongest form
      // of the contract: every doc's score double is bit-compared against
      // the DuckDB replay of fit + formula.
      bm25Scored(s, dir)
    }),
    "doc_bm25_topk" -> ((s, dir) => {
      // The retrieval shape itself: top-10 by (score DESC, doc_id) — the
      // TakeOrdered plan, deterministic because the scores are exact.
      val d = docs(s, dir)
      val m = Bm25.fitQuery(d, "text", QueryTerms)
      Bm25.topK(d, "text", "doc_id", m, QueryTerms, K)
    }),
    "hybrid_rrf_topk" -> ((s, dir) => {
      // Lexical top-50 (BM25) + vector top-50 (int8 squared-L2 to the
      // vec_id-7 query) fused by RRF, k=10. documents and embeddings
      // share the id domain by fixture construction (doc_id == vec_id).
      val lex = Hybrid.rankBy(bm25Scored(s, dir).select(col("doc_id"), col("score")),
        TopN, col("score").desc, col("doc_id"))
      val vec = Hybrid.rankBy(
        i8Distances(s, dir).withColumnRenamed("vec_id", "doc_id"),
        TopN, col("d2").asc, col("doc_id"))
      Hybrid.rrfFuse(Seq(lex, vec), "doc_id", K)
        .select(col("doc_id"), col("n_lists"), col("rrf_score"))
    })
  )

  // ------------------------------------------------------------- oracles

  /** Pinned-idf + avgdl CTE prologue shared by the BM25 oracles: replays
    * fit (n, total tokens, per-term df) and the ppm idf pin. */
  private def bm25Prologue: String = {
    val dfCols = QueryTerms.zipWithIndex.map { case (t, i) =>
      s"count(CASE WHEN list_contains(ts, '$t') THEN 1 END) AS df$i"
    }.mkString(",\n             ")
    val idfCols = QueryTerms.indices.map { i =>
      s"""round(ln(((CAST(st.n AS DOUBLE) - CAST(dfs.df$i AS DOUBLE)) + 0.5)
                / (CAST(dfs.df$i AS DOUBLE) + 0.5) + 1.0) * 1000000.0)
              / 1000000.0 AS idf$i"""
    }.mkString(",\n           ")
    s"""tok AS (
           SELECT doc_id, string_split(text, ' ') AS ts
           FROM documents WHERE text IS NOT NULL),
         st AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(len(ts)) AS BIGINT) AS tot FROM tok),
         dfs AS (
           SELECT $dfCols
           FROM tok),
         pin AS (
           SELECT CAST(st.tot AS DOUBLE) / st.n AS avgdl,
           $idfCols
           FROM st, dfs)"""
  }

  /** The per-doc score expression, spelled in the kernel's exact IEEE
    * order (see [[graft.expressions.Bm25Kernel.score]]): contributions in
    * term-index order, constants CAST to DOUBLE. */
  private def bm25ScoreExpr: String =
    QueryTerms.zipWithIndex.map { case (t, i) =>
      s"""(pin.idf$i * ((CAST(len(list_filter(ts, x -> x = '$t')) AS DOUBLE)
             * (CAST(1.2 AS DOUBLE) + 1.0))
           / (CAST(len(list_filter(ts, x -> x = '$t')) AS DOUBLE)
             + CAST(1.2 AS DOUBLE) * ((1.0 - CAST(0.75 AS DOUBLE))
               + CAST(0.75 AS DOUBLE) * (CAST(len(ts) AS DOUBLE) / pin.avgdl)))))"""
    }.mkString("\n         + ")

  /** The int8 code replay (vss_quantize_i8's oracle formula) + integer
    * squared-L2 to the vec_id-7 codes. */
  private def i8DistSql: String =
    """qenc AS (
           SELECT vec_id,
             CASE WHEN list_max(list_transform(embedding, x -> abs(x))) = 0
                  THEN list_transform(embedding, x -> CAST(0 AS TINYINT))
                  ELSE list_transform(embedding, x -> CAST(greatest(-127, least(127,
                         floor(CAST(x AS DOUBLE) * 127
                           / CAST(list_max(list_transform(embedding, y -> abs(y))) AS DOUBLE)
                           + 0.5))) AS TINYINT))
             END AS codes
           FROM embeddings WHERE embedding IS NOT NULL),
         qdist AS (
           SELECT e.vec_id AS doc_id,
             CAST(list_sum(list_transform(range(1, len(e.codes) + 1),
               i -> (CAST(e.codes[i] AS BIGINT) - CAST(q.codes[i] AS BIGINT))
                    * (CAST(e.codes[i] AS BIGINT) - CAST(q.codes[i] AS BIGINT))))
               AS BIGINT) AS d2
           FROM qenc e, (SELECT codes FROM qenc WHERE vec_id = 7) q)"""

  val oracleSql: Map[String, String] = Map(
    "doc_bm25_score" ->
      s"""WITH $bm25Prologue
          SELECT tok.doc_id, CAST(len(tok.ts) AS BIGINT) AS n_tokens,
            $bm25ScoreExpr AS score
          FROM tok, pin""",
    "doc_bm25_topk" ->
      s"""WITH $bm25Prologue
          SELECT tok.doc_id,
            $bm25ScoreExpr AS score
          FROM tok, pin
          ORDER BY score DESC, tok.doc_id
          LIMIT $K""",
    "hybrid_rrf_topk" ->
      s"""WITH $bm25Prologue,
          lexr AS (
            SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS r
            FROM (SELECT tok.doc_id, $bm25ScoreExpr AS score FROM tok, pin)
            ORDER BY r LIMIT $TopN),
          $i8DistSql,
          vecr AS (
            SELECT doc_id, CAST(row_number() OVER (ORDER BY d2 ASC, doc_id) AS BIGINT) AS r
            FROM qdist
            ORDER BY r LIMIT $TopN),
          fused AS (
            SELECT coalesce(lexr.doc_id, vecr.doc_id) AS doc_id,
              CAST((CASE WHEN lexr.r IS NOT NULL THEN 1 ELSE 0 END)
                 + (CASE WHEN vecr.r IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_lists,
              coalesce(1.0 / (CAST(60 AS DOUBLE) + CAST(lexr.r AS DOUBLE)), 0.0)
                + coalesce(1.0 / (CAST(60 AS DOUBLE) + CAST(vecr.r AS DOUBLE)), 0.0)
                AS rrf_score
            FROM lexr FULL OUTER JOIN vecr ON lexr.doc_id = vecr.doc_id)
          SELECT doc_id, n_lists, rrf_score
          FROM fused
          ORDER BY rrf_score DESC, doc_id
          LIMIT $K"""
  )
}
