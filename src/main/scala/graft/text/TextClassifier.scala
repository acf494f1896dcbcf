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

  /** Collapsed binary logistic model over hashed token counts.
    *
    * equals/hashCode are VALUE-based over the weight array (case-class
    * default would compare Array by reference): two expressions built from
    * separately-constructed but identical models canonicalize equal, so
    * Catalyst common-subexpression elimination and plan dedup still fire. */
  final case class Model(weights: Array[Double], intercept: Double) {
    require(weights.nonEmpty, "empty weight vector")
    def numFeatures: Int = weights.length
    override def equals(o: Any): Boolean = o match {
      case m: Model => intercept == m.intercept &&
        java.util.Arrays.equals(weights, m.weights)
      case _ => false
    }
    override def hashCode: Int =
      31 * java.util.Arrays.hashCode(weights) + java.lang.Double.hashCode(intercept)
  }

  /** Collapsed MULTINOMIAL logistic model: one weight row + intercept per
    * class, labels carried so the scorer emits the caller's label values
    * (the langid use: labels are language codes). Value-based equality,
    * same rationale as [[Model]]. */
  final case class MulticlassModel(labels: Array[String],
      weights: Array[Array[Double]], intercepts: Array[Double]) {
    require(labels.length >= 2, "need >= 2 classes")
    require(weights.length == labels.length && intercepts.length == labels.length,
      "one weight row + intercept per class")
    require(weights.forall(_.length == weights(0).length),
      "ragged weight matrix")
    // Joint bound: the individually-documented caps (4096 classes, 2^24
    // features) jointly allow a ~512 GB dense matrix and a `flat` array
    // past Int.MaxValue (NegativeArraySizeException at SCORE time). Fail
    // the construction instead: 2^27 doubles = 1 GiB of task binary, the
    // practical ceiling for weights that ride every executor.
    require(labels.length.toLong * weights(0).length <= (1L << 27),
      s"classes x features too large: ${labels.length} x ${weights(0).length} " +
        s"> ${1L << 27} (dense weights must fit the task binary)")
    def numClasses: Int = labels.length
    def numFeatures: Int = weights(0).length
    /** Class-major → feature-major flat layout [idx*k + c]: one token's k
      * accumulator adds touch one cache line instead of k rows. Built once
      * per (deserialized) model, shared across the executor's tasks. */
    @transient lazy val flat: Array[Double] = {
      val k = numClasses
      val f = numFeatures
      val out = new Array[Double](k * f)
      var c = 0
      while (c < k) {
        val row = weights(c)
        var i = 0
        while (i < f) { out(i * k + c) = row(i); i += 1 }
        c += 1
      }
      out
    }
    /** Label UTF8Strings built once per (deserialized) model — the scorer
      * returns these shared immutable instances instead of re-encoding
      * per row. */
    @transient lazy val labelUtf8: Array[org.apache.spark.unsafe.types.UTF8String] =
      labels.map(org.apache.spark.unsafe.types.UTF8String.fromString)
    override def equals(o: Any): Boolean = o match {
      case m: MulticlassModel =>
        java.util.Arrays.equals(labels.asInstanceOf[Array[AnyRef]],
          m.labels.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.equals(intercepts, m.intercepts) &&
        weights.length == m.weights.length &&
        weights.indices.forall(i => java.util.Arrays.equals(weights(i), m.weights(i)))
      case _ => false
    }
    override def hashCode: Int = {
      var h = java.util.Arrays.hashCode(labels.asInstanceOf[Array[AnyRef]])
      h = 31 * h + java.util.Arrays.hashCode(intercepts)
      weights.foreach(w => h = 31 * h + java.util.Arrays.hashCode(w))
      h
    }
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

  /**
   * The MULTICLASS (softmax) fit — the langid analogue of [[train]],
   * completing fasttext-class parity for the language-filter stage: same
   * HashingTF feature pipeline, `LogisticRegression` forced to the
   * multinomial family, k weight rows collapsed out of the fit. Labels
   * are the DISTINCT values of `labelCol` (cast to string, sorted;
   * class-count-sized by contract — capped at 4096); null-label rows are
   * excluded from the fit. Null text trains as "" exactly like [[train]].
   */
  def trainMulticlass(df: DataFrame, textCol: String, labelCol: String,
      numFeatures: Int = 1 << 18, maxIter: Int = 50,
      regParam: Double = 0.01): MulticlassModel = {
    require(numFeatures >= 2 && numFeatures <= (1 << 24),
      s"numFeatures out of range: $numFeatures")
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.feature.HashingTF
    val maxClasses = 4096
    val labels: Array[String] = df
      .select(col(labelCol).cast("string").as("_tc_l"))
      .where(col("_tc_l").isNotNull)
      .distinct().orderBy(col("_tc_l"))
      .limit(maxClasses + 1)
      .collect().map(_.getString(0))
    require(labels.length >= 2, s"need >= 2 distinct labels, got ${labels.length}")
    require(labels.length <= maxClasses,
      s"labels must be class-count-sized (<= $maxClasses distinct values)")
    // Fail the FIT on the joint k x f bound (same check the model
    // constructor enforces) — a contract error here beats an array-size
    // crash at scoring time after a long distributed fit.
    require(labels.length.toLong * numFeatures <= (1L << 27),
      s"classes x features too large: ${labels.length} x $numFeatures " +
        s"> ${1L << 27} (dense weights must fit the task binary)")
    val idxExpr = labels.zipWithIndex.tail
      .foldLeft(when(col("_tc_l") === labels(0), lit(0.0))) {
        case (acc, (l, i)) => acc.when(col("_tc_l") === l, lit(i.toDouble))
      }
    val prepared = df
      .select(split(coalesce(col(textCol), lit("")), " ").as("_tc_tokens"),
        col(labelCol).cast("string").as("_tc_l"))
      .where(col("_tc_l").isNotNull)
      .withColumn("_tc_label", idxExpr)
    val tf = new HashingTF().setInputCol("_tc_tokens").setOutputCol("_tc_features")
      .setNumFeatures(numFeatures)
    val lr = new LogisticRegression().setFeaturesCol("_tc_features")
      .setLabelCol("_tc_label").setMaxIter(maxIter).setRegParam(regParam)
      .setFamily("multinomial")
    val model = lr.fit(tf.transform(prepared))
    val mat = model.coefficientMatrix
    val w = Array.tabulate(labels.length)(c =>
      Array.tabulate(numFeatures)(i => mat(c, i)))
    MulticlassModel(labels, w, model.interceptVector.toArray)
  }

  /** Predicted class for `text` under `model` — the codegen'd softmax
    * scorer: STRUCT(label STRING — the argmax class's label value, ties
    * to the lowest class index; prob DOUBLE — its softmax probability).
    * Null text → null, like [[score]]. */
  def scoreMulticlass(text: Column, model: MulticlassModel): Column =
    Bridge.column(HashedSoftmaxScore(Bridge.expression(text), model))
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
  private[text] def bucket(bytes: Array[Byte], off: Int, len: Int, mod: Int): Int = {
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

/** argmax + softmax probability over HashedTF-compatible hashed token
  * counts, k classes in one byte pass — see
  * [[TextClassifier.scoreMulticlass]]. */
case class HashedSoftmaxScore(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    model: TextClassifier.MulticlassModel)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types._
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("label", StringType, nullable = false),
    StructField("prob", DoubleType, nullable = false)))
  override def nullSafeEval(v: Any): Any = HashedSoftmaxScore.scoreText(
    v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], model)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tcmModel", model,
      classOf[TextClassifier.MulticlassModel].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.text.HashedSoftmaxScore.scoreText($c, $ref)")
  }
  override def prettyName: String = "text_classifier_multiclass"
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression) = copy(child = c)
}

object HashedSoftmaxScore {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.unsafe.types.UTF8String

  /** One pass, same split/hash conventions as [[HashedLinearScore
    * .scoreText]]: k accumulators seeded with the intercepts, each token
    * occurrence adds its bucket's k weights (feature-major flat layout —
    * one cache line per token, not k row strides), then max-subtracted
    * softmax. Argmax of the accumulated margins == argmax of softmax, so
    * only the winner's probability needs the exp loop; parity with
    * `model.transform`'s probability vector is spec'd to 1e-9. Ties go to
    * the lowest class index (deterministic — ML's argmax breaks ties the
    * same way). */
  def scoreText(s: UTF8String,
      model: TextClassifier.MulticlassModel): InternalRow = {
    val bytes = s.getBytes
    val k = model.numClasses
    val f = model.numFeatures
    val flat = model.flat
    val acc = model.intercepts.clone()
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        val base = HashedLinearScore.bucket(bytes, start, i - start, f) * k
        var c = 0
        while (c < k) { acc(c) += flat(base + c); c += 1 }
        start = i + 1
      }
      i += 1
    }
    var best = 0
    var c = 1
    while (c < k) { if (acc(c) > acc(best)) best = c; c += 1 }
    var denom = 0.0
    c = 0
    while (c < k) { denom += math.exp(acc(c) - acc(best)); c += 1 }
    new GenericInternalRow(Array[Any](model.labelUtf8(best), 1.0 / denom))
  }
}
