package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Hashed-n-gram kernels for DSIR-style importance-weighted data selection
 * (Xie et al. 2023, "Data Selection for Language Models via Importance
 * Resampling"): documents are featurized as counts over `buckets` hashed
 * word-n-gram buckets; a target/raw count contrast yields per-bucket
 * importance weights; a document's score sums its n-grams' log-weights.
 *
 * Cross-engine hash contract (the fit gate's oracle replays the hashing in
 * DuckDB): bucket = md5 of the n-gram's bytes, first 8 digest bytes read
 * LITTLE-endian, modulo `buckets` UNSIGNED — exactly DuckDB's
 * `md5_number_upper(g) % buckets` on the same string. N-grams follow the
 * library-wide `split(text, ' ')` convention (empty tokens kept), so the
 * n-gram's bytes are a contiguous slice of the document and equal the
 * oracle's `w[i] || ' ' || … || w[i+n-1]` reconstruction byte-for-byte.
 */
object DsirKernel {

  /** md5_number_upper(bytes[from, to)) % buckets, unsigned — see class
    * doc. Shared with [[BucketLmKernel]] (byte-identical hash contract). */
  private[expressions] def bucket(d: java.security.MessageDigest,
      bytes: Array[Byte], from: Int, to: Int, buckets: Long): Long = {
    d.reset()
    d.update(bytes, from, to - from)
    val out = d.digest()
    var h = 0L
    var i = 7
    while (i >= 0) { h = (h << 8) | (out(i) & 0xffL); i -= 1 }
    java.lang.Long.remainderUnsigned(h, buckets)
  }

  /** One bucket id per n-gram occurrence, in document order (LONG array;
    * empty for docs shorter than n tokens). */
  def buckets(s: UTF8String, n: Int, nBuckets: Long): ArrayData = {
    val bytes = s.getBytes
    val (starts, nTok) = TextHash.tokenBoundaries(bytes)
    val count = math.max(0, nTok - n + 1)
    val out = new Array[Long](count)
    val d = TextHash.md5Digest.get()
    var i = 0
    while (i < count) {
      val from = starts(i)
      val to = if (i + n == nTok) bytes.length else starts(i + n) - 1
      out(i) = bucket(d, bytes, from, to, nBuckets)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Σ logWeights(bucket) over the document's n-grams — the fused scoring
    * path: one pass, no explode, the weight table rides the task binary. */
  def score(s: UTF8String, n: Int, nBuckets: Long, logWeights: Array[Double]): Double = {
    val bytes = s.getBytes
    val (starts, nTok) = TextHash.tokenBoundaries(bytes)
    val count = math.max(0, nTok - n + 1)
    val d = TextHash.md5Digest.get()
    var sum = 0.0
    var i = 0
    while (i < count) {
      val from = starts(i)
      val to = if (i + n == nTok) bytes.length else starts(i + n) - 1
      sum += logWeights(bucket(d, bytes, from, to, nBuckets).toInt)
      i += 1
    }
    sum
  }
}

/**
 * Hashed-bucket bigram LM scorer with stupid backoff (Brants et al. 2007)
 * — the per-document kernel behind [[graft.text.BucketLm]]'s
 * CCNet-style perplexity filter. For each position i ≥ 1:
 *
 *   cBi = bi(bucket(tokᵢ₋₁ ⧺ ' ' ⧺ tokᵢ)); cPre = uni(bucket(tokᵢ₋₁))
 *   logp += if (cBi > 0 && cPre > 0) ln(cBi / cPre)
 *           else ln(backoff × (uni(bucket(tokᵢ)) + 1) / (total + buckets))
 *
 * and the result is the MEAN log prob (null for docs with < 2 tokens —
 * no predictions). Hash-bucket collisions conflate counts (a ratio can
 * even exceed 1), which is inherent to hashed LMs and harmless for
 * ranking; the cPre > 0 guard covers the bigram-collision-with-unseen-
 * prefix corner exactly. Buckets use the same md5_number_upper contract
 * as [[DsirKernel]]. Count tables ride the task binary.
 */
object BucketLmKernel {
  def meanLogProb(s: UTF8String, buckets: Long, uni: Array[Long],
      bi: Array[Long], total: Long, backoff: Double): Double = {
    val bytes = s.getBytes
    val (starts, nTok) = TextHash.tokenBoundaries(bytes)
    if (nTok < 2) return Double.NaN // mapped to null by the expression
    val d = TextHash.md5Digest.get()
    var lp = 0.0
    var i = 1
    while (i < nTok) {
      val preFrom = starts(i - 1)
      val preTo = starts(i) - 1 // the space before token i
      val wFrom = starts(i)
      val wTo = if (i + 1 == nTok) bytes.length else starts(i + 1) - 1
      val cBi = bi(DsirKernel.bucket(d, bytes, preFrom, wTo, buckets).toInt)
      val cPre = uni(DsirKernel.bucket(d, bytes, preFrom, preTo, buckets).toInt)
      lp +=
        (if (cBi > 0 && cPre > 0) math.log(cBi.toDouble / cPre)
         else math.log(backoff *
           (uni(DsirKernel.bucket(d, bytes, wFrom, wTo, buckets).toInt) + 1.0) /
           (total + buckets)))
      i += 1
    }
    lp / (nTok - 1)
  }
}

/** Mean token log-probability under a fitted [[graft.text.BucketLm]]
  * model; null for docs with no bigram predictions. */
case class BucketLmLogProb(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    buckets: Int, uni: Array[Long], bi: Array[Long], total: Long,
    backoff: Double)
  extends UnaryExpression with ExpectsInputTypes {

  require(uni.length == buckets && bi.length == buckets,
    s"count tables must have $buckets entries")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "bucket_lm_log_prob"

  override def nullSafeEval(s: Any): Any = {
    val v = BucketLmKernel.meanLogProb(s.asInstanceOf[UTF8String],
      buckets.toLong, uni, bi, total, backoff)
    if (v.isNaN) null else v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val u = ctx.addReferenceObj("lmUni", uni, "long[]")
    val b = ctx.addReferenceObj("lmBi", bi, "long[]")
    val value = ctx.freshName("lmLp")
    nullSafeCodeGen(ctx, ev, c => {
      s"""double $value = graft.expressions.BucketLmKernel.meanLogProb(
         |  $c, ${buckets}L, $u, $b, ${total}L, $backoff);
         |if (Double.isNaN($value)) { ${ev.isNull} = true; }
         |else { ${ev.value} = $value; }""".stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): BucketLmLogProb =
    copy(child = newChild)
}

/** `dsir_buckets(text, n, buckets)` — the fit-side featurizer (explode +
  * count it to get per-bucket corpus counts). */
case class DsirBuckets(child: org.apache.spark.sql.catalyst.expressions.Expression,
    n: Int, buckets: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, "dsir_buckets n must be >= 1")
  require(buckets >= 1, "dsir_buckets buckets must be >= 1")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "dsir_buckets"

  override def nullSafeEval(s: Any): Any =
    DsirKernel.buckets(s.asInstanceOf[UTF8String], n, buckets.toLong)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.DsirKernel.buckets($c, $n, ${buckets}L)")

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): DsirBuckets =
    copy(child = newChild)
}

/** Fused per-document DSIR importance score: Σ log-weight over the doc's
  * hashed n-grams. The per-bucket log-weight table (computed ONCE,
  * driver-side, by [[graft.text.Dsir.fitWeights]]) is a codegen reference
  * object in the task binary — no join, no explode, no per-row log. */
case class DsirScore(child: org.apache.spark.sql.catalyst.expressions.Expression,
    n: Int, buckets: Int, logWeights: Array[Double])
  extends UnaryExpression with ExpectsInputTypes {

  require(logWeights.length == buckets,
    s"logWeights length ${logWeights.length} != buckets $buckets")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dsir_score"

  override def nullSafeEval(s: Any): Any =
    DsirKernel.score(s.asInstanceOf[UTF8String], n, buckets.toLong, logWeights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("dsirLogWeights", logWeights, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.DsirKernel.score($c, $n, ${buckets}L, $tbl)")
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): DsirScore =
    copy(child = newChild)
}
