package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graftbridge.Bridge

/**
 * Okapi BM25 lexical retrieval (Robertson & Zaragoza 2009) — the keyword
 * half of a retrieval stack; [[graft.api.Hybrid]] fuses it with the
 * vector half (the HNSW/IVF family) via reciprocal-rank fusion.
 *
 * Engine posture (same shape as [[Dsir]] / [[BucketLm]]):
 *  1. FIT — one corpus pass: doc count, total token count, and per-term
 *     document frequencies, capped to the `maxVocab` most-document-
 *     frequent terms ([[fit]]). Terms past the cap score with df = 0
 *     (max idf — the standard treatment for capped stats tables; the cap
 *     bounds driver/task memory, not correctness of in-cap terms).
 *  2. SCORE — a fused per-document codegen kernel
 *     ([[graft.expressions.Bm25Score]]): the query's terms and PINNED
 *     idf values ride the task binary, so the 100 TB scoring pass is
 *     scan + one byte-pass expression — no inverted index, no join, no
 *     explode. (A serving stack answering thousands of queries/second
 *     wants a real inverted index; this is the analytics/curation shape:
 *     score an entire corpus against a query set, one scan per batch.)
 *  3. TOP-K — `ORDER BY (score DESC, id)` + LIMIT ([[topK]]), the same
 *     TakeOrdered physical shape as the brute-force ANN macros.
 *
 * Cross-engine exactness: idf is pinned to integer ppm at fit
 * (`round(ln·10⁶)/10⁶` — ln is the one non-portable op; the DSIR
 * integer-ppm move), after which every score op is a correctly-rounded
 * IEEE double op in a spelled order, so the DuckDB oracle's scores are
 * bit-identical. See [[graft.expressions.Bm25Kernel]].
 */
object Bm25 {

  val DefaultK1 = 1.2
  val DefaultB = 0.75

  /** Fitted corpus statistics. `df` holds the `maxVocab` most-document-
    * frequent terms; [[idf]] treats absent terms as df = 0. */
  final case class Bm25Model(nDocs: Long, totalTokens: Long,
      df: Map[String, Long], k1: Double = DefaultK1, b: Double = DefaultB) {
    require(nDocs > 0, "empty corpus")

    def avgdl: Double = totalTokens.toDouble / nDocs

    /** Lucene-form idf, pinned to integer ppm (see class doc):
      * round(ln((N − df + 0.5)/(df + 0.5) + 1) · 10⁶) / 10⁶. */
    def idf(term: String): Double = {
      val d = df.getOrElse(term, 0L).toDouble
      val x = (nDocs.toDouble - d + 0.5) / (d + 0.5) + 1.0
      Math.round(Math.log(x) * 1e6) / 1.0e6
    }
  }

  /** Corpus fit in one WALL-clock pass. Document frequency counts each
    * term once per document: the `wordShingles(n=1)` byte kernel emits
    * each doc's DISTINCT tokens in one pass (no split array, no generic
    * array_distinct), the explode+count is a map-side-combined shuffle of
    * (term, df) — never a countDistinct. Corpus totals (doc count, total
    * tokens via the `tokenCount` byte kernel) are a SEPARATE
    * aggregate-only action submitted CONCURRENTLY with the df job (the
    * gridSum overlap device), NOT an `Observation` riding the df scan:
    * observed metrics accumulate per task ATTEMPT, so a shuffle-map
    * stage retry or a speculative duplicate would silently inflate
    * n/totalTokens on a real cluster — a plain action is exactly-once
    * and the wall cost stays max(two scans), not their sum.
    * Tokenization is the library-wide `split(text, ' ')` convention. */
  def fit(docs: DataFrame, textCol: String, maxVocab: Int = 1 << 20,
      k1: Double = DefaultK1, b: Double = DefaultB): Bm25Model = {
    require(maxVocab >= 1, s"maxVocab must be >= 1, got $maxVocab")
    val d = docs.where(col(textCol).isNotNull)
    // CONSTRAINT: this overlap must never run under the analyzer (e.g.
    // from a TVF builder invoked at resolution): the analyzer holds the
    // SessionCatalog lock, and the Future's own Dataset analysis blocks
    // on it while the main thread Awaits — a measured deadlock when r16
    // tried the same device inside Dsir.fitWeights (which dsir_select
    // resolves at TVF time). No TVF calls `fit` (bm25_topk uses the
    // Future-free fitQuery), and `fit` must stay off that path.
    val totalsF = scala.concurrent.Future {
      d.agg(count(lit(1)).as("n"),
        sum(TextFunctions.tokenCount(col(textCol)).cast("long")).as("tot"))
        .head()
    }(scala.concurrent.ExecutionContext.global)
    val dfRows = d
      .select(explode(TextFunctions.wordShingles(col(textCol), 1)).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("term"))
      .limit(maxVocab)
      .collect()
    val totals = scala.concurrent.Await.result(totalsF,
      scala.concurrent.duration.Duration.Inf)
    require(totals.getLong(0) > 0, "Bm25.fit: empty corpus (no non-null text)")
    Bm25Model(totals.getLong(0), totals.getLong(1),
      dfRows.map(r => (r.getString(0), r.getLong(1))).toMap, k1, b)
  }

  /** Query-restricted fit: exact stats for `terms` ONLY — one
    * aggregate-only scan (count, total tokens, one conditional-sum df per
    * term), no explode, no shuffle, no driver vocabulary. Produces the
    * same idf as [[fit]] for any in-cap term (spec'd), at the cost a
    * SQL engine answering one ad-hoc query would pay — use it when the
    * query set is known up front; use [[fit]] to build the reusable
    * full-vocabulary model once per corpus. */
  def fitQuery(docs: DataFrame, textCol: String, terms: Seq[String],
      k1: Double = DefaultK1, b: Double = DefaultB): Bm25Model = {
    val ts = terms.distinct
    require(ts.nonEmpty && ts.length <= 256, "fitQuery takes 1..256 terms")
    val d = docs.where(col(textCol).isNotNull)
    val toks = split(col(textCol), " ", -1)
    val aggs = Seq(
      count(lit(1)).as("n"),
      sum(TextFunctions.tokenCount(col(textCol)).cast("long")).as("tot")) ++
      ts.zipWithIndex.map { case (t, i) =>
        sum(when(array_contains(toks, t), 1L).otherwise(0L)).as(s"df$i")
      }
    val r = d.agg(aggs.head, aggs.tail: _*).head()
    require(r.getLong(0) > 0, "Bm25.fitQuery: empty corpus (no non-null text)")
    Bm25Model(r.getLong(0), r.getLong(1),
      ts.zipWithIndex.map { case (t, i) => (t, r.getLong(i + 2)) }.toMap, k1, b)
  }

  /** The fused per-document BM25 score for `query` under `model` (null
    * text → null). Duplicate query terms are collapsed (BM25 is a set-of-
    * terms model; a repeated term must not double its contribution). */
  def scoreColumn(text: Column, model: Bm25Model, query: Seq[String]): Column = {
    val terms = query.distinct.toArray
    Bridge.column(graft.expressions.Bm25Score(
      Bridge.composedExpression(text), terms, terms.map(model.idf),
      model.k1, model.b, model.avgdl))
  }

  /** Top-k documents for `query`: (idCol, score DOUBLE), best first, ties
    * broken by id — deterministic, and the TakeOrdered physical shape
    * (per-partition bounded heaps, no global sort). */
  def topK(docs: DataFrame, textCol: String, idCol: String,
      model: Bm25Model, query: Seq[String], k: Int): DataFrame =
    docs.where(col(textCol).isNotNull)
      .select(col(idCol), scoreColumn(col(textCol), model, query).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
}
