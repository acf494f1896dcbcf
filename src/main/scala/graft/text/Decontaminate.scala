package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Eval-set decontamination: find (or drop) corpus documents that share
 * word-n-gram shingles with a benchmark/eval set — the overlap filter
 * every serious training-data pipeline runs so that test sets do not leak
 * into the training corpus (the n-gram-collision construction published
 * with GPT-3, appendix C; n is a parameter, 13 there, 3 by default here
 * to match this library's shingle convention).
 *
 * Plan shape (100 TB posture): the eval set is tiny relative to the
 * corpus, so its DISTINCT shingle set builds one side of an equi-join
 * that AQE broadcasts at runtime; the corpus side is never shuffled —
 * each scan task streams its documents' distinct shingles (fused
 * [[graft.expressions.WordShingles]] kernel, no intermediate strings
 * until explode) against the broadcast set, and only matching (doc,
 * shingle) rows reach the partial-aggregated count. Work is proportional
 * to corpus bytes + hits, not corpus x eval.
 */
object Decontaminate {

  /** One row per contaminated corpus doc: (idCol, n_hits) where n_hits is
    * the number of DISTINCT shingles the doc shares with `eval`. Docs with
    * no overlap are absent (the common case at scale). */
  def overlapCounts(corpus: DataFrame, eval: DataFrame, textCol: String,
      idCol: String, n: Int = 3): DataFrame = {
    val evalGrams = eval
      .select(explode(TextFunctions.wordShingles(col(textCol), n)).as("_g"))
      .distinct()
    // wordShingles emits per-doc DISTINCT shingles, so the inner join
    // yields each (doc, shared shingle) pair exactly once.
    corpus.select(col(idCol),
        explode(TextFunctions.wordShingles(col(textCol), n)).as("_g"))
      .join(evalGrams, "_g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** `corpus` minus every doc flagged by [[overlapCounts]] — the actual
    * decontamination step (left-anti on the bounded hit set). */
  def dropContaminated(corpus: DataFrame, eval: DataFrame, textCol: String,
      idCol: String, n: Int = 3): DataFrame =
    corpus.join(
      overlapCounts(corpus, eval, textCol, idCol, n).select(col(idCol)),
      Seq(idCol), "left_anti")
}
