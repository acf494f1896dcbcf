package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graftbridge.Bridge

/**
 * Perplexity filtering with a hashed-bucket bigram LM — the CCNet-style
 * quality stage (Wenzek et al. 2020: score corpus text under an LM
 * trained on a high-quality reference; keep the low-perplexity tail).
 * The LM here is a stupid-backoff bigram model (Brants et al. 2007) over
 * md5-hashed token buckets, so fit is exactly two hashed-n-gram count
 * passes over the REFERENCE corpus (the same featurizer the DSIR fit
 * uses — [[graft.expressions.DsirBuckets]] with n = 1 and n = 2), and
 * the model is two `buckets`-long count arrays.
 *
 * Scale shape mirrors [[Dsir]]: fit is paid once per reference corpus;
 * scoring — the 100 TB pass — is ONE fused codegen expression per
 * document ([[graft.expressions.BucketLmLogProb]]; both count tables
 * ride the task binary, default 2 × 512 KB), no join, no explode.
 */
object BucketLm {

  val DefaultBuckets = 65536
  val DefaultBackoff = 0.4

  /** Fitted model: per-bucket unigram/bigram counts + the unigram total. */
  case class Model(buckets: Int, uni: Array[Long], bi: Array[Long],
      total: Long, backoff: Double)

  /** Fit on a reference corpus: two featurize+count passes (n=1, n=2). */
  def fit(reference: DataFrame, textCol: String,
      buckets: Int = DefaultBuckets,
      backoff: Double = DefaultBackoff): Model = {
    def counts(n: Int): Array[Long] = {
      val arr = new Array[Long](buckets)
      Dsir.bucketCounts(reference, textCol, n, buckets).collect()
        .foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
      arr
    }
    val uni = counts(1)
    Model(buckets, uni, counts(2), uni.sum, backoff)
  }

  /** Mean token log-probability (null when the doc has < 2 tokens). */
  def logProbColumn(textCol: Column, model: Model): Column =
    Bridge.column(graft.expressions.BucketLmLogProb(
      Bridge.composedExpression(textCol),
      model.buckets, model.uni, model.bi, model.total, model.backoff))

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
