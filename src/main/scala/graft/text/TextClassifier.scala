package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/**
 * Learned text classifier over hashed bag-of-tokens features — the
 * fasttext/CCNet-class quality- and language-scoring stage of a training
 *-data pipeline, as train-once / score-at-scale:
 *
 *  - **Train** ([[TextClassifier.train]]): Spark ML `HashingTF` (murmur3
 *    token hashing into `numFeatures` buckets, term counts) +
 *    `LogisticRegression` — one distributed fit over the labeled frame;
 *    the model collapses to a dense weight array + intercept
 *    ([[TextClassifier.Model]], ≤ a few MB at the 2^18 default).
 *  - **Score** ([[TextClassifier.score]]): a codegen'd Catalyst expression
 *    ([[HashedLinearScore]]) that REPLICATES the ML pipeline exactly —
 *    same whitespace split, same murmur3 seed-42 bucket index — as one
 *    byte pass per row accumulating `w[idx]` per token occurrence (term
 *    counts are linear, so Σ count·w = Σ-per-occurrence w), then the
 *    sigmoid. No Vector materialization, no ML runtime on the scoring
 *    path: the weights ride the task binary like the DSIR table, and the
 *    scan stays inside whole-stage codegen at 100 TB. Parity with
 *    `model.transform`'s probability is spec'd to 1e-9 per row
 *    (TextClassifierSpec) and asserted in-plan by the driver gate.
 *
 * Training labels come from the caller (weak supervision in practice:
 * known-good vs known-bad sources, an existing heuristic, a language
 * column). LBFGS coefficient low-order bits are not bit-stable across
 * cluster layouts, so pipelines should persist the trained Model (weights
 * + intercept) rather than re-fit per run when exact reproducibility of
 * downstream selections matters.
 */
object TextClassifier {

  /** Collapsed binary logistic model over hashed token counts. */
  final case class Model(weights: Array[Double], intercept: Double) {
    require(weights.nonEmpty, "empty weight vector")
    def numFeatures: Int = weights.length
  }

  /**
   * One distributed fit: label ∈ {0.0, 1.0} (`labelCol` cast to double).
   * A null text trains as "" (which, like every text, contributes its
   * space-split tokens — for "" that is one empty-string token, the same
   * bucket the scorer hashes it to); at SCORE time a null text returns
   * null (no row is silently scored as empty) — filter or coalesce
   * upstream if nulls should score.
   */
  def train(df: DataFrame, textCol: String, labelCol: String,
      numFeatures: Int = 1 << 18, maxIter: Int = 50,
      regParam: Double = 0.01): Model = {
    require(numFeatures >= 2 && numFeatures <= (1 << 24),
      s"numFeatures out of range: $numFeatures")
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.feature.HashingTF
    val prepared = df
      .select(split(coalesce(col(textCol), lit("")), " ").as("_tc_tokens"),
        col(labelCol).cast("double").as("_tc_label"))
    val tf = new HashingTF().setInputCol("_tc_tokens").setOutputCol("_tc_features")
      .setNumFeatures(numFeatures)
    val lr = new LogisticRegression().setFeaturesCol("_tc_features")
      .setLabelCol("_tc_label").setMaxIter(maxIter).setRegParam(regParam)
    val model = lr.fit(tf.transform(prepared))
    Model(model.coefficients.toArray, model.intercept)
  }

  /** P(label = 1) for `text` under `model` — the codegen'd scorer
    * (DOUBLE; null text → null). */
  def score(text: Column, model: Model): Column =
    Bridge.column(HashedLinearScore(Bridge.expression(text), model))
}

/** Sigmoid(w·x + b) over HashingTF-compatible hashed token counts — see
  * [[TextClassifier]]. */
case class HashedLinearScore(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    model: TextClassifier.Model)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types._
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any = HashedLinearScore.scoreText(
    v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], model)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tcModel", model,
      classOf[TextClassifier.Model].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.text.HashedLinearScore.scoreText($c, $ref)")
  }
  override def prettyName: String = "text_classifier_score"
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression) = copy(child = c)
}

object HashedLinearScore {

  /** HashingTF's bucket index for one token. Spark 3+'s ml.HashingTF
    * routes strings through FeatureHasher.murmur3Hash =
    * murmur3_x86_32.hashUnsafeBytes2 (NOT hashUnsafeBytes — the tail-byte
    * sign-extension differs) over the UTF-8 bytes with seed 42, then the
    * non-negative mod (verified against the shipped bytecode; parity with
    * `model.transform` spec'd to 1e-9). */
  private def bucket(bytes: Array[Byte], off: Int, len: Int, mod: Int): Int = {
    val h = org.apache.spark.unsafe.hash.Murmur3_x86_32
      .hashUnsafeBytes2(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off,
        len, 42)
    ((h % mod) + mod) % mod
  }

  /** One pass: split on single spaces exactly like `split(text, " ")`
    * (empty segments between consecutive spaces / at the ends ARE tokens,
    * matching the training pipeline's feature construction), accumulate
    * w[bucket] per occurrence, sigmoid. */
  def scoreText(s: org.apache.spark.unsafe.types.UTF8String,
      model: TextClassifier.Model): Double = {
    val bytes = s.getBytes
    val w = model.weights
    val mod = w.length
    var acc = model.intercept
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        acc += w(bucket(bytes, start, i - start, mod))
        start = i + 1
      }
      i += 1
    }
    1.0 / (1.0 + math.exp(-acc))
  }
}
