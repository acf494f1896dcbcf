package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graftbridge.Bridge

/**
 * Perplexity filtering with a hashed-bucket n-gram LM — the CCNet-style
 * quality stage (Wenzek et al. 2020: score corpus text under an LM
 * trained on a high-quality reference; keep the low-perplexity tail;
 * CCNet itself uses a 5-gram KenLM). The LM here is a recursive
 * stupid-backoff model (Brants et al. 2007) of order `n ≤ 5` over
 * md5-hashed token buckets: fit is ONE hashed-n-gram count pass over the
 * REFERENCE corpus (all orders fused —
 * [[graft.expressions.DsirBucketsMulti]], the same featurizer family the
 * DSIR fit uses), and the model is `n` `buckets`-long count arrays.
 *
 * Scale shape mirrors [[Dsir]]: fit is paid once per reference corpus;
 * scoring — the 100 TB pass — is ONE fused codegen expression per
 * document ([[graft.expressions.BucketLmLogProb]]; all count tables ride
 * the task binary, n × 512 KB at the default width), no join, no
 * explode. Order 2 (the default) reproduces the r12 bigram model
 * bit-exactly.
 */
object BucketLm {

  val DefaultOrder = 2
  val MaxOrder = 5
  val DefaultBuckets = 65536
  val DefaultBackoff = 0.4

  /** Fitted model: per-bucket counts for orders 1..n (`counts(k-1)` =
    * order-k) + the unigram total. */
  case class Model(buckets: Int, counts: Array[Array[Long]],
      total: Long, backoff: Double) {
    def order: Int = counts.length
    def uni: Array[Long] = counts(0)
    /** Bigram counts (order ≥ 2 models). */
    def bi: Array[Long] = counts(1)
  }

  /** Fit on a reference corpus: one fused featurize+count pass covering
    * every order 1..n (ids = (order−1)·buckets + bucket). */
  def fit(reference: DataFrame, textCol: String,
      buckets: Int = DefaultBuckets,
      backoff: Double = DefaultBackoff,
      n: Int = DefaultOrder): Model = {
    require(n >= 1 && n <= MaxOrder, s"order must be in [1, $MaxOrder], got $n")
    // The backoff factor multiplies into a log argument — zero/negative/NaN
    // would poison every fallback score.
    require(backoff > 0.0 && backoff <= 1.0,
      s"backoff must be in (0, 1], got $backoff")
    val counts = Array.fill(n)(new Array[Long](buckets))
    reference.where(col(textCol).isNotNull)
      .select(explode(Bridge.column(graft.expressions.DsirBucketsMulti(
        Bridge.composedExpression(col(textCol)), n, buckets))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("c"))
      .collect()
      .foreach { r =>
        val id = r.getLong(0)
        counts((id / buckets).toInt)((id % buckets).toInt) = r.getLong(1)
      }
    Model(buckets, counts, counts(0).sum, backoff)
  }

  /** Mean token log-probability (null when the doc has < 2 tokens). */
  def logProbColumn(textCol: Column, model: Model): Column =
    Bridge.column(graft.expressions.BucketLmLogProb(
      Bridge.composedExpression(textCol),
      model.buckets, model.counts, model.total, model.backoff))

  /** Perplexity = exp(−mean log prob); lower = more reference-like. */
  def perplexityColumn(textCol: Column, model: Model): Column =
    exp(-logProbColumn(textCol, model))

  /** Rows whose perplexity under `model` is ≤ `maxPerplexity` (docs with
    * no predictions — < 2 tokens — are dropped, like CCNet's tail cut). */
  def filterByPerplexity(df: DataFrame, textCol: String, model: Model,
      maxPerplexity: Double): DataFrame =
    df.where(col(textCol).isNotNull &&
      perplexityColumn(col(textCol), model) <= maxPerplexity)
}
