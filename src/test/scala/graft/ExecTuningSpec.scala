package graft

import org.apache.spark.sql.functions._

import graft.spark.ExecTuning

/** Size-based AQE choice: small inputs execute without AQE, big inputs and
  * opted-out sessions keep it; conf is always restored. */
class ExecTuningSpec extends SparkSuite {

  private def adaptiveNow: String = spark.conf.get("spark.sql.adaptive.enabled", "true")

  test("small-input query runs with AQE disabled, conf restored after") {
    val df = Tables.load(spark, sf("0.001"), "nation").groupBy(col("n_name")).count()
    assert(ExecTuning.inputBytes(df) < ExecTuning.DefaultSmallQueryBytes)
    val prev = adaptiveNow
    var inside: String = null
    ExecTuning.withSizedAqe(df) { inside = adaptiveNow }
    assert(inside == "false")
    assert(adaptiveNow == prev)
  }

  test("threshold 0 disables the policy; a tiny threshold keeps AQE on") {
    val df = Tables.load(spark, sf("0.001"), "nation").groupBy(col("n_name")).count()
    for (t <- Seq("0", "1")) { // 0 = policy off; 1 byte = nothing is small
      spark.conf.set(ExecTuning.SmallQueryBytesKey, t)
      try {
        var inside: String = null
        ExecTuning.withSizedAqe(df) { inside = adaptiveNow }
        assert(inside == "true", s"threshold=$t")
      } finally spark.conf.unset(ExecTuning.SmallQueryBytesKey)
    }
  }

  test("small-input query also trims shuffle partitions, conf restored") {
    val df = Tables.load(spark, sf("0.001"), "nation").groupBy(col("n_name")).count()
    val shufKey = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(shufKey)
    spark.conf.set(shufKey, "32")
    try {
      var inside: String = null
      ExecTuning.withSizedAqe(df) { inside = spark.conf.get(shufKey) }
      assert(inside == ExecTuning.DefaultSmallQueryShufflePartitions.toString)
      assert(spark.conf.get(shufKey) == "32")
      // the trim only ever narrows: a session already below it is untouched
      spark.conf.set(shufKey, "4")
      ExecTuning.withSizedAqe(df) { inside = spark.conf.get(shufKey) }
      assert(inside == "4")
      // trim conf of 0 disables the partition trim but keeps the AQE flip
      spark.conf.set(shufKey, "32")
      spark.conf.set(ExecTuning.SmallQueryShufflePartitionsKey, "0")
      try {
        var in2: (String, String) = null
        ExecTuning.withSizedAqe(df) {
          in2 = (spark.conf.get(shufKey), adaptiveNow)
        }
        assert(in2 == (("32", "false")))
      } finally spark.conf.unset(ExecTuning.SmallQueryShufflePartitionsKey)
    } finally spark.conf.set(shufKey, prev)
  }

  test("conf restored even when the body throws") {
    val df = Tables.load(spark, sf("0.001"), "nation")
    val prev = adaptiveNow
    intercept[RuntimeException] {
      ExecTuning.withSizedAqe(df) { throw new RuntimeException("boom") }
    }
    assert(adaptiveNow == prev)
  }

  test("large-input query raises scan split bytes to input/(cores*perCore), restored") {
    val df = Tables.load(spark, sf("0.001"), "nation").groupBy(col("n_name")).count()
    val splitKey = "spark.sql.files.maxPartitionBytes"
    val prevSplit = spark.conf.get(splitKey)
    // Force the large branch on the tiny fixture: threshold 1 byte means
    // nothing is "small", and splitsPerCore=1 with a floor'd prev makes the
    // computed target exceed it.
    spark.conf.set(ExecTuning.SmallQueryBytesKey, "1")
    spark.conf.set(splitKey, "1")
    try {
      val bytes = ExecTuning.inputBytes(df).toLong
      val cores = math.max(1, spark.sparkContext.defaultParallelism)
      spark.conf.set(ExecTuning.ScanSplitsPerCoreKey, "1")
      var inside: String = null
      ExecTuning.withSizedAqe(df) { inside = spark.conf.get(splitKey) }
      assert(inside.toLong == bytes / cores, s"inside=$inside bytes=$bytes")
      assert(spark.conf.get(splitKey) == "1")
      // perCore=0 disables the raise
      spark.conf.set(ExecTuning.ScanSplitsPerCoreKey, "0")
      ExecTuning.withSizedAqe(df) { inside = spark.conf.get(splitKey) }
      assert(inside == "1")
      // never lowers: a session already running coarser splits is untouched
      spark.conf.set(ExecTuning.ScanSplitsPerCoreKey, "1")
      spark.conf.set(splitKey, (1L << 30).toString)
      ExecTuning.withSizedAqe(df) { inside = spark.conf.get(splitKey) }
      assert(inside == (1L << 30).toString)
    } finally {
      spark.conf.unset(ExecTuning.SmallQueryBytesKey)
      spark.conf.unset(ExecTuning.ScanSplitsPerCoreKey)
      spark.conf.set(splitKey, prevSplit)
    }
  }

  test("results identical with and without the policy") {
    val mk = () => Tables.load(spark, sf("0.001"), "customer")
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n"))
      .orderBy("c_nationkey")
    val withPolicy = ExecTuning.withSizedAqe(mk())(mk().collect().toSeq)
    spark.conf.set(ExecTuning.SmallQueryBytesKey, "0")
    val without = try mk().collect().toSeq
      finally spark.conf.unset(ExecTuning.SmallQueryBytesKey)
    assert(withPolicy == without)
  }

  private def hasRepartition(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.analyzed.exists {
      case _: org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression => true
      case _ => false
    }

  test("spreadForKernel repartitions a small scan-shaped input to core parallelism") {
    val raw = Tables.load(spark, sf("0.001"), "documents")
      .select(col("doc_id"), col("text"))
    val spread = ExecTuning.spreadForKernel(raw, Seq(col("doc_id")))
    assert(hasRepartition(spread), "expected a repartition on the small scan")
    assert(spread.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    // value identity (rows are a set; both sides sorted for comparison)
    assert(spread.orderBy("doc_id").collect().toSeq ==
      raw.orderBy("doc_id").collect().toSeq)
  }

  test("spreadForKernel is the identity when disabled, keyless, or barrier-fed") {
    val raw = Tables.load(spark, sf("0.001"), "documents")
      .select(col("doc_id"), col("text"))
    // conf cap 0 disables
    spark.conf.set(ExecTuning.SpreadKernelMaxBytesKey, "0")
    try assert(!hasRepartition(ExecTuning.spreadForKernel(raw, Seq(col("doc_id")))))
    finally spark.conf.unset(ExecTuning.SpreadKernelMaxBytesKey)
    // no keys
    assert(!hasRepartition(ExecTuning.spreadForKernel(raw, Seq.empty)))
    // input already behind an exchange-inducing node (aggregate): identity —
    // the first r16 attempt re-shuffled such inputs and measurably regressed
    val agged = raw.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    assert(!hasRepartition(ExecTuning.spreadForKernel(agged, Seq(col("doc_id")))))
    // a cap below the input size: identity (stands in for the 100 TB case,
    // where the scan feeds the cores by itself)
    spark.conf.set(ExecTuning.SpreadKernelMaxBytesKey, "1")
    try assert(!hasRepartition(ExecTuning.spreadForKernel(raw, Seq(col("doc_id")))))
    finally spark.conf.unset(ExecTuning.SpreadKernelMaxBytesKey)
  }
}
