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

  /** All orders 1..maxN in ONE pass: for each order k and position, emit
    * `(k−1)·nBuckets + bucket` — the fused fit featurizer behind
    * [[graft.text.BucketLm.fit]], so an order-5 LM fit costs one corpus
    * scan + one count shuffle instead of five. Ids decompose back into
    * (order, bucket) driver-side; per-order counts equal [[buckets]]'s
    * exactly (same spans, same hash). */
  def bucketsUpTo(s: UTF8String, maxN: Int, nBuckets: Long): ArrayData = {
    val bytes = s.getBytes
    val (starts, nTok) = TextHash.tokenBoundaries(bytes)
    var count = 0
    var k = 1
    while (k <= maxN) { count += math.max(0, nTok - k + 1); k += 1 }
    val out = new Array[Long](count)
    val d = TextHash.md5Digest.get()
    var idx = 0
    k = 1
    while (k <= maxN) {
      val m = nTok - k + 1
      val base = (k - 1).toLong * nBuckets
      var i = 0
      while (i < m) {
        val from = starts(i)
        val to = if (i + k == nTok) bytes.length else starts(i + k) - 1
        out(idx) = base + bucket(d, bytes, from, to, nBuckets)
        idx += 1
        i += 1
      }
      k += 1
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
 * Hashed-bucket n-gram LM scorer with recursive stupid backoff (Brants
 * et al. 2007, eq. 5 — the smoothing KenLM-scale systems use when counts
 * are the only state) — the per-document kernel behind
 * [[graft.text.BucketLm]]'s CCNet-style perplexity filter. `counts(k-1)`
 * holds the order-k bucket counts. Each position i ≥ 1 is predicted from
 * its LONGEST available context, k = min(i, maxOrder−1) tokens, falling
 * one order per miss with a multiplicative backoff factor:
 *
 *   S(tokᵢ | ctx_k) = counts(k)(bucket(ctx_k ⧺ tokᵢ)) /
 *                       counts(k−1)(bucket(ctx_k))     when both > 0
 *                   = backoff · S(tokᵢ | ctx_{k−1})    otherwise
 *   S(tokᵢ | ε)     = (uni(bucket(tokᵢ)) + 1) / (total + buckets)
 *
 * and the result is the MEAN ln S (null for docs with < 2 tokens — no
 * predictions). At maxOrder = 2 this is bit-identical to the r12 bigram
 * formula (the accumulated factor enters the ln argument with the same
 * association, and ×1.0 is exact). Hash-bucket collisions conflate
 * counts (a ratio can even exceed 1), inherent to hashed LMs and
 * harmless for ranking; the context-count guard covers the
 * collision-with-unseen-prefix corner exactly. Buckets use the same
 * md5_number_upper contract as [[DsirKernel]]; all count tables ride the
 * task binary (order · buckets · 8 B — 2.5 MB for a 5-gram/64Ki model).
 */
object BucketLmKernel {
  def meanLogProb(s: UTF8String, buckets: Long, counts: Array[Array[Long]],
      total: Long, backoff: Double): Double = {
    val bytes = s.getBytes
    val (starts, nTok) = TextHash.tokenBoundaries(bytes)
    if (nTok < 2) return Double.NaN // mapped to null by the expression
    val d = TextHash.md5Digest.get()
    val uni = counts(0)
    var lp = 0.0
    var i = 1
    while (i < nTok) {
      val wFrom = starts(i)
      val wTo = if (i + 1 == nTok) bytes.length else starts(i + 1) - 1
      var k = math.min(i, counts.length - 1) // context length to try
      var bk = 1.0 // accumulated backoff factor
      var hit = false // NOT v.isNaN as the loop flag: a hit whose log is
      var v = 0.0 //     NaN (pathological backoff) must still terminate
      while (k >= 1 && !hit) {
        val from = starts(i - k)
        val cNg = counts(k)(DsirKernel.bucket(d, bytes, from, wTo, buckets).toInt)
        val cCtx = counts(k - 1)(
          DsirKernel.bucket(d, bytes, from, starts(i) - 1, buckets).toInt)
        if (cNg > 0 && cCtx > 0) { v = math.log(bk * cNg / cCtx); hit = true }
        else { bk *= backoff; k -= 1 }
      }
      if (!hit)
        v = math.log(bk *
          (uni(DsirKernel.bucket(d, bytes, wFrom, wTo, buckets).toInt) + 1.0) /
          (total + buckets))
      lp += v
      i += 1
    }
    lp / (nTok - 1)
  }
}

/** Mean token log-probability under a fitted [[graft.text.BucketLm]]
  * model (`counts(k-1)` = order-k bucket counts, order = counts.length);
  * null for docs with no predictions (< 2 tokens). */
case class BucketLmLogProb(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    buckets: Int, counts: Array[Array[Long]], total: Long,
    backoff: Double)
  extends UnaryExpression with ExpectsInputTypes {

  require(counts.nonEmpty && counts.forall(_.length == buckets),
    s"count tables must have $buckets entries each")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "bucket_lm_log_prob"

  override def nullSafeEval(s: Any): Any = {
    val v = BucketLmKernel.meanLogProb(s.asInstanceOf[UTF8String],
      buckets.toLong, counts, total, backoff)
    if (v.isNaN) null else v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("lmCounts", counts, "long[][]")
    val value = ctx.freshName("lmLp")
    nullSafeCodeGen(ctx, ev, c => {
      s"""double $value = graft.expressions.BucketLmKernel.meanLogProb(
         |  $c, ${buckets}L, $tbl, ${total}L, $backoff);
         |if (Double.isNaN($value)) { ${ev.isNull} = true; }
         |else { ${ev.value} = $value; }""".stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): BucketLmLogProb =
    copy(child = newChild)
}

/** `dsir_buckets_multi(text, maxN, buckets)` — all orders 1..maxN in one
  * pass, ids = (order−1)·buckets + bucket (see
  * [[DsirKernel.bucketsUpTo]]). Fit-side only: explode + count it once
  * to fit every order of a backoff LM. */
case class DsirBucketsMulti(child: org.apache.spark.sql.catalyst.expressions.Expression,
    maxN: Int, buckets: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(maxN >= 1, "dsir_buckets_multi maxN must be >= 1")
  require(buckets >= 1, "dsir_buckets_multi buckets must be >= 1")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "dsir_buckets_multi"

  override def nullSafeEval(s: Any): Any =
    DsirKernel.bucketsUpTo(s.asInstanceOf[UTF8String], maxN, buckets.toLong)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.DsirKernel.bucketsUpTo($c, $maxN, ${buckets}L)")

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): DsirBucketsMulti =
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
