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

  /** Corpus-byte ceiling for the DRIVER-LOCAL fit path (0 disables it).
    * Under it, the labeled frame is collected in ONE job, featurized once
    * into CSR term counts (the scorer's exact tokenize+hash), and
    * optimized driver-side with the same breeze LBFGS Spark ML runs —
    * identical objective (feature standardization, mean log-loss, L2 on
    * the standardized coefficients, Spark's initial intercepts), so the
    * coefficients match `ml.fit` to floating-point-order noise
    * (TextClassifierSpec pins the parity). Motivation (r17 FitProf,
    * warm): `ml.fit` at the gate floor is ~1.1 s of FIXED cost (input
    * persist + summarizer pass + per-iteration treeAggregate job latency)
    * for a fit the driver computes in well under 0.1 s. Above the ceiling
    * the distributed `ml.fit` runs unchanged — the 100 TB train-once path
    * is untouched; this is the withSizedAqe size policy applied to the
    * fit. Default 16 MB: measured (ABBA, 32-core box) the local path is
    * 4.7-5.0x faster at 0.6 MB and 2.6-3.4x at 6 MB, but 0.7-0.8x (a
    * LOSS) at 56 MB where the driver's single-threaded featurize+LBFGS
    * falls behind the 32-way treeAggregates — the crossover sits around
    * ~25-35 MB, and 16 MB leaves margin for slower driver cores. */
  val LocalFitMaxBytesKey = "spark.graft.classifier.localFitMaxBytes"
  val DefaultLocalFitMaxBytes: Long = 16L << 20

  private def useLocalFit(df: DataFrame): Boolean = {
    val cap = graft.spark.ExecTuning.confLong(df.sparkSession,
      LocalFitMaxBytesKey, DefaultLocalFitMaxBytes)
    cap > 0 && (try graft.spark.ExecTuning.inputBytes(df) < cap
      catch { case _: Exception => false })
  }

  /**
   * One fit: label ∈ {0.0, 1.0} (`labelCol` cast to double). Distributed
   * `HashingTF` + `LogisticRegression` past [[LocalFitMaxBytesKey]];
   * under it, the equivalent driver-local LBFGS (same objective, same
   * optimizer — parity spec'd; degenerate single-class frames fall back
   * to `ml.fit`'s own handling). A null text trains as "" (which, like
   * every text, contributes its space-split tokens — for "" that is one
   * empty-string token, the same bucket the scorer hashes it to); at
   * SCORE time a null text returns null (no row is silently scored as
   * empty) — filter or coalesce upstream if nulls should score.
   */
  def train(df: DataFrame, textCol: String, labelCol: String,
      numFeatures: Int = 1 << 18, maxIter: Int = 50,
      regParam: Double = 0.01): Model = {
    require(numFeatures >= 2 && numFeatures <= (1 << 24),
      s"numFeatures out of range: $numFeatures")
    if (useLocalFit(df)) {
      val rows = df.select(coalesce(col(textCol), lit("")).cast("string"),
        col(labelCol).cast("double")).collect()
      val texts = rows.map(_.getString(0))
      val labels = rows.map(_.getDouble(1))
      val local =
        LocalLogistic.fitBinary(texts, labels, numFeatures, maxIter, regParam)
      if (local.isDefined) return local.get
    }
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
    if (useLocalFit(df)) {
      // One collect replaces BOTH the distinct-labels job and the fit's
      // own passes; labels derive locally (distinct, sorted — identical to
      // the distributed spelling). Contract checks unchanged.
      val rows = df.select(coalesce(col(textCol), lit("")).cast("string"),
          col(labelCol).cast("string"))
        .where(col(labelCol).cast("string").isNotNull).collect()
      val texts = rows.map(_.getString(0))
      val labelStrs = rows.map(_.getString(1))
      val labelsL = labelStrs.distinct.sorted
      require(labelsL.length >= 2,
        s"need >= 2 distinct labels, got ${labelsL.length}")
      require(labelsL.length <= maxClasses,
        s"labels must be class-count-sized (<= $maxClasses distinct values)")
      require(labelsL.length.toLong * numFeatures <= (1L << 27),
        s"classes x features too large: ${labelsL.length} x $numFeatures " +
          s"> ${1L << 27} (dense weights must fit the task binary)")
      return LocalLogistic.fitMulticlass(texts, labelStrs, labelsL,
        numFeatures, maxIter, regParam)
    }
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

/**
 * Driver-local logistic fit for corpora under
 * [[TextClassifier.LocalFitMaxBytesKey]] — the SAME optimization problem
 * Spark ML's `LogisticRegression` solves, computed without the
 * distributed machinery whose fixed cost (input persist, summarizer pass,
 * one treeAggregate job per LBFGS evaluation) dominates small fits:
 *
 *  - features: HashingTF-compatible term counts ([[HashedLinearScore
 *    .bucket]] over single-space splits — the scorer's exact convention),
 *    featurized ONCE into CSR so the optimizer loop never re-tokenizes;
 *  - standardization (the ML default): optimize over x̂ = x / std with
 *    std the unbiased column std over all rows (zeros included),
 *    constant columns dropped via invStd = 0, coefficients returned on
 *    the original scale (β = β̂ · invStd);
 *  - objective: weightSum-mean log-loss + (regParam/2)·Σ β̂² over the
 *    non-intercept coefficients (L2 in the standardized space —
 *    `standardization=true` semantics); intercept unregularized;
 *  - initial point: zeros, intercept = log(n₁/n₀) (binary) /
 *    interceptᶜ = log1p(countᶜ) − mean (multinomial) — ML's exact
 *    warm start;
 *  - optimizer: breeze LBFGS(maxIter, m=10, tol=1e-6) over a
 *    CachedDiffFunction — the identical optimizer object ML drives.
 *
 * With the same objective, initial point and optimizer, the trajectories
 * differ only by floating-point summation order (local loop vs
 * treeAggregate), so coefficients match `ml.fit` to numerical noise —
 * TextClassifierSpec pins the parity on both families.
 */
private[text] object LocalLogistic {
  import breeze.linalg.{DenseVector => BDV}
  import breeze.optimize.{CachedDiffFunction, DiffFunction, LBFGS => BreezeLBFGS}

  /** CSR term-count features + the standardization vectors. `scaledMean`
    * is mean·invStd — Spark ML since SPARK-34448/34860 CENTERS the
    * standardized features (fitWithMean) via a margin offset so sparse
    * features stay sparse; trajectory parity requires the same space. */
  private final class Csr(val rowPtr: Array[Int], val idx: Array[Int],
      val cnt: Array[Double], val invStd: Array[Double],
      val scaledMean: Array[Double])

  private def featurize(texts: Array[String], numFeatures: Int): Csr = {
    val n = texts.length
    val rowPtr = new Array[Int](n + 1)
    val idxB = new scala.collection.mutable.ArrayBuilder.ofInt
    val cntB = new scala.collection.mutable.ArrayBuilder.ofDouble
    val sum = new Array[Double](numFeatures)
    val sumSq = new Array[Double](numFeatures)
    val rowCounts = new scala.collection.mutable.LongMap[Double]
    var r = 0
    while (r < n) {
      rowCounts.clear()
      val bytes = texts(r).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var start = 0
      var i = 0
      while (i <= bytes.length) {
        if (i == bytes.length || bytes(i) == ' ') {
          val b = HashedLinearScore.bucket(bytes, start, i - start, numFeatures)
          rowCounts.update(b.toLong, rowCounts.getOrElse(b.toLong, 0.0) + 1.0)
          start = i + 1
        }
        i += 1
      }
      rowCounts.foreach { case (j, c) =>
        idxB += j.toInt
        cntB += c
        sum(j.toInt) += c
        sumSq(j.toInt) += c * c
      }
      rowPtr(r + 1) = rowPtr(r) + rowCounts.size
      r += 1
    }
    // Unbiased column std over ALL rows (implicit zeros included) — the
    // summarizer's statistic. n == 1 leaves every std 0 (invStd 0), the
    // same degenerate scaling ML produces.
    val invStd = new Array[Double](numFeatures)
    val scaledMean = new Array[Double](numFeatures)
    if (n > 1) {
      var j = 0
      while (j < numFeatures) {
        val mean = sum(j) / n
        val v = (sumSq(j) - n * mean * mean) / (n - 1)
        invStd(j) = if (v > 0) 1.0 / math.sqrt(v) else 0.0
        scaledMean(j) = mean * invStd(j)
        j += 1
      }
    }
    new Csr(rowPtr, idxB.result(), cntB.result(), invStd, scaledMean)
  }

  private def optimize(costFun: DiffFunction[BDV[Double]], init: BDV[Double],
      maxIter: Int): BDV[Double] = {
    val lbfgs = new BreezeLBFGS[BDV[Double]](maxIter, 10, 1e-6)
    val states = lbfgs.iterations(new CachedDiffFunction(costFun), init)
    var x = init
    while (states.hasNext) x = states.next().x
    x
  }

  /** Binary fit; None on a single-class frame (the caller falls back to
    * `ml.fit`, which owns the degenerate-label special cases). */
  def fitBinary(texts: Array[String], labels: Array[Double], numFeatures: Int,
      maxIter: Int, regParam: Double): Option[TextClassifier.Model] = {
    val n = texts.length
    if (n == 0) return None
    var n1 = 0.0
    labels.foreach { l =>
      require(l == 0.0 || l == 1.0,
        s"binary classification labels must be 0 or 1, got $l")
      if (l == 1.0) n1 += 1
    }
    val n0 = n - n1
    if (n0 == 0 || n1 == 0) return None
    val csr = featurize(texts, numFeatures)
    val f = numFeatures
    val invStd = csr.invStd
    val sm = csr.scaledMean
    val costFun = new DiffFunction[BDV[Double]] {
      override def calculate(x: BDV[Double]): (Double, BDV[Double]) = {
        // [0, f): coefficients over the CENTERED standardized features
        // (x·invStd − scaledMean); [f]: the centered-space intercept.
        // Centering rides a per-eval margin offset (the aggregator's
        // marginOffset device) so the sparse rows stay sparse.
        val beta = x.data
        val grad = new Array[Double](f + 1)
        var off = beta(f)
        var j = 0
        while (j < f) { off -= beta(j) * sm(j); j += 1 }
        var loss = 0.0
        var multSum = 0.0
        var r = 0
        while (r < n) {
          var m = off
          var p = csr.rowPtr(r)
          val end = csr.rowPtr(r + 1)
          while (p < end) {
            val jj = csr.idx(p)
            m += beta(jj) * csr.cnt(p) * invStd(jj)
            p += 1
          }
          val y = labels(r)
          loss += (if (m > 0) (1.0 - y) * m + math.log1p(math.exp(-m))
                   else -y * m + math.log1p(math.exp(m)))
          val mult = 1.0 / (1.0 + math.exp(-m)) - y
          multSum += mult
          p = csr.rowPtr(r)
          while (p < end) {
            val jj = csr.idx(p)
            grad(jj) += mult * csr.cnt(p) * invStd(jj)
            p += 1
          }
          r += 1
        }
        val invN = 1.0 / n
        var reg = 0.0
        j = 0
        while (j < f) {
          grad(j) = (grad(j) - sm(j) * multSum) * invN + regParam * beta(j)
          reg += beta(j) * beta(j)
          j += 1
        }
        grad(f) = multSum * invN
        (loss * invN + 0.5 * regParam * reg, new BDV(grad))
      }
    }
    val init = BDV.zeros[Double](f + 1)
    init(f) = math.log(n1 / n0)
    val x = optimize(costFun, init, maxIter)
    val w = Array.tabulate(f)(j => x(j) * invStd(j))
    // Map the centered-space intercept back: b = b̂ − β̂·scaledMean.
    var b = x(f)
    var j = 0
    while (j < f) { b -= x(j) * sm(j); j += 1 }
    Some(TextClassifier.Model(w, b))
  }

  /** Multinomial (softmax) fit; `labels` is the sorted distinct class
    * list (≥ 2 by the caller's contract, matching `ml.fit`'s validation). */
  def fitMulticlass(texts: Array[String], labelStrs: Array[String],
      labels: Array[String], numFeatures: Int, maxIter: Int,
      regParam: Double): TextClassifier.MulticlassModel = {
    val n = texts.length
    val k = labels.length
    val f = numFeatures
    val labelIdx = labels.zipWithIndex.toMap
    val y = labelStrs.map(labelIdx)
    val hist = new Array[Double](k)
    y.foreach(hist(_) += 1)
    val csr = featurize(texts, numFeatures)
    val invStd = csr.invStd
    val sm = csr.scaledMean
    // Flat layout [j*k + c] for coefficients and gradient (feature-major —
    // one contiguous k-run per touched feature, the scorer's layout);
    // intercepts at [f*k + c]. Centered space via per-class margin
    // offsets, like the binary path.
    val costFun = new DiffFunction[BDV[Double]] {
      override def calculate(x: BDV[Double]): (Double, BDV[Double]) = {
        val beta = x.data
        val grad = new Array[Double](f * k + k)
        val m = new Array[Double](k)
        val off = new Array[Double](k)
        val multSum = new Array[Double](k)
        var c = 0
        while (c < k) { off(c) = beta(f * k + c); c += 1 }
        var j = 0
        while (j < f) {
          val s = sm(j)
          if (s != 0.0) {
            val base = j * k
            c = 0
            while (c < k) { off(c) -= beta(base + c) * s; c += 1 }
          }
          j += 1
        }
        var loss = 0.0
        var r = 0
        while (r < n) {
          c = 0
          while (c < k) { m(c) = off(c); c += 1 }
          var p = csr.rowPtr(r)
          val end = csr.rowPtr(r + 1)
          while (p < end) {
            val jj = csr.idx(p)
            val xs = csr.cnt(p) * invStd(jj)
            if (xs != 0.0) {
              val base = jj * k
              c = 0
              while (c < k) { m(c) += beta(base + c) * xs; c += 1 }
            }
            p += 1
          }
          var maxM = m(0)
          c = 1
          while (c < k) { if (m(c) > maxM) maxM = m(c); c += 1 }
          var denom = 0.0
          c = 0
          while (c < k) { denom += math.exp(m(c) - maxM); c += 1 }
          loss += math.log(denom) + maxM - m(y(r))
          // p_c - 1{c == y} reused across the row's features via m()
          c = 0
          while (c < k) {
            m(c) = math.exp(m(c) - maxM) / denom - (if (c == y(r)) 1.0 else 0.0)
            multSum(c) += m(c)
            c += 1
          }
          p = csr.rowPtr(r)
          while (p < end) {
            val jj = csr.idx(p)
            val xs = csr.cnt(p) * invStd(jj)
            if (xs != 0.0) {
              val base = jj * k
              c = 0
              while (c < k) { grad(base + c) += m(c) * xs; c += 1 }
            }
            p += 1
          }
          r += 1
        }
        val invN = 1.0 / n
        var reg = 0.0
        j = 0
        while (j < f) {
          val base = j * k
          val s = sm(j)
          c = 0
          while (c < k) {
            grad(base + c) = (grad(base + c) - s * multSum(c)) * invN +
              regParam * beta(base + c)
            reg += beta(base + c) * beta(base + c)
            c += 1
          }
          j += 1
        }
        c = 0
        while (c < k) { grad(f * k + c) = multSum(c) * invN; c += 1 }
        (loss * invN + 0.5 * regParam * reg, new BDV(grad))
      }
    }
    // ML's multinomial warm start: intercepts log1p(count_c), centered.
    val init = BDV.zeros[Double](f * k + k)
    val rawInts = hist.map(math.log1p)
    val rawMean = rawInts.sum / k
    var c = 0
    while (c < k) { init(f * k + c) = rawInts(c) - rawMean; c += 1 }
    val x = optimize(costFun, init, maxIter)
    val w = Array.tabulate(k)(c => Array.tabulate(f)(j => x(j * k + c) * invStd(j)))
    // Map the centered-space intercepts back: b_c = b̂_c − β̂_c·scaledMean.
    val ints = Array.tabulate(k) { cc =>
      var b = x(f * k + cc)
      var j = 0
      while (j < f) { b -= x(j * k + cc) * sm(j); j += 1 }
      b
    }
    TextClassifier.MulticlassModel(labels, w, ints)
  }
}
