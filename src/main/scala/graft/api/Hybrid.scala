package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Hybrid retrieval: fuse a lexical ranking ([[graft.text.Bm25]]) with a
 * vector ranking (the brute-force macros or the HNSW/IVF index family)
 * by reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
 *
 *   rrf(d) = Σ_lists 1 / (rrfK + rank_list(d))     (absent ⇒ contributes 0)
 *
 * RRF is the standard score-free fusion — it needs only RANKS, so the two
 * retrievers' incomparable score scales never meet. rrfK = 60 per the
 * paper.
 *
 * Scale shape: each input is already a top-n list (bounded by
 * construction — TakeOrdered for BM25, index probes for ANN), so the
 * fusion is a union of tiny frames + one grouped sum over ≤ Σn rows —
 * driver-light, exchange-light, independent of corpus size. The FP sum is
 * order-safe for the common two-retriever case (IEEE addition is
 * commutative); for 3+ lists the grouped sum's combine order is
 * plan-dependent, fine for ranking (contributions are ≥ 0 and the
 * magnitudes differ in the first few ulps only under adversarial rrfK).
 */
object Hybrid {

  val DefaultRrfK = 60

  /** Attach dense 1-based ranks to a bounded top-n result: keep the n
    * best rows by `orderKeys` (ties MUST be broken by a unique trailing
    * key for a deterministic contract) and number them. The global window
    * is single-partition by construction — `limit(n)` has already
    * bounded the frame, so this is n rows on one task, not a global
    * sort of the input. */
  def rankBy(df: DataFrame, n: Int, orderKeys: Column*): DataFrame =
    df.orderBy(orderKeys: _*).limit(n)
      .withColumn("rank", row_number().over(Window.orderBy(orderKeys: _*)))

  /** Fuse ranked lists — each input must carry (`idCol`, `rank` INT,
    * 1-based, unique within its list). Output: the k best of
    * (idCol, n_lists BIGINT, rrf_score DOUBLE), ordered by
    * (rrf_score DESC, idCol) — deterministic under the exact-ties RRF
    * produces whenever a doc appears at the same rank set. */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, k: Int,
      rrfK: Int = DefaultRrfK): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(rrfK >= 0, s"rrfK must be non-negative, got $rrfK")
    val contributions = lists
      .map(_.select(col(idCol),
        (lit(1.0) / (lit(rrfK).cast("double") + col("rank").cast("double")))
          .as("_c")))
      .reduce(_.union(_))
    contributions
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lists"), sum(col("_c")).as("rrf_score"))
      .orderBy(col("rrf_score").desc, col(idCol))
      .limit(k)
  }
}
