package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.text.Bpe.BpeMerges

/**
 * Streaming-compatibility proofs for the text pipeline's SCAN-ONLY
 * operators: the fused decontamination filter and the BPE token counter
 * are stateless per-row kernels (the eval-side table is collected at plan
 * time from a BATCH frame and broadcast), so a `readStream` corpus runs
 * them unchanged — micro-batch output must equal the batch run on the
 * same rows. This is the 100 TB ingest shape: filter/annotate documents
 * as they arrive, no state store, no watermark.
 */
class StreamingTextSpec extends SparkSuite {
  import spark.implicits._

  private def ckpt = Files.createTempDirectory("graft-text-ckpt").toString

  test("dropContaminated's fused scan filter runs unchanged on a stream") {
    val eval = Seq((9L, "the quick brown fox")).toDF("doc_id", "text")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    // Plan the streaming filter ONCE (plan-time eval collect + broadcast),
    // then feed batches through it.
    val query = graft.text.Decontaminate
      .dropContaminated(stream, eval, "text", "doc_id")
      .writeStream.format("memory").queryName("decontam_stream")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      val rows = Seq(
        (1L, "the quick brown fox ran away"), // contaminated
        (2L, "completely unrelated content here"),
        (3L, null: String),                   // null text is kept
        (4L, "quick brown fox jumps"))        // contaminated
      mem.addData(rows.take(2): _*)
      query.processAllAvailable()
      mem.addData(rows.drop(2): _*)
      query.processAllAvailable()
      val streamed = spark.table("decontam_stream")
        .select("doc_id").as[Long].collect().sorted.toSeq
      val batch = graft.text.Decontaminate
        .dropContaminated(rows.toDF("doc_id", "text"), eval, "text", "doc_id")
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(streamed == batch && streamed == Seq(2L, 3L))
    } finally query.stop()
  }

  test("classifier kernels score a stream (stateless codegen kernels): " +
      "binary HashedLinearScore and multiclass HashedSoftmaxScore, " +
      "micro-batch == batch") {
    // The r14/r15 scorers are pure per-row expressions (weights ride the
    // task binary) — the streaming ingest shape is "score documents as
    // they arrive", no state store. Train-once happens on a BATCH frame;
    // the collapsed model is what streams.
    val bin = graft.text.TextClassifier.Model(
      Array.tabulate(32)(i => (i % 5) * 0.1 - 0.2), intercept = 0.3)
    val multi = graft.text.TextClassifier.MulticlassModel(
      Array("de", "en", "fr"),
      Array(Array.tabulate(32)(_ * 0.01), Array.tabulate(32)(i => 0.3 - i * 0.01),
        Array.fill(32)(0.05)),
      Array(0.1, 0.0, -0.1))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    def scored(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("p", graft.text.TextClassifier.score(col("text"), bin))
      .withColumn("k",
        graft.text.TextClassifier.scoreMulticlass(col("text"), multi))
      .select(col("doc_id"), col("p"), col("k.label"), col("k.prob"))
    val query = scored(stream)
      .writeStream.format("memory").queryName("classifier_stream")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      val rows = Seq((1L, "the quick brown fox"), (2L, ""),
        (3L, null: String), (4L, "ein kleiner text mit mehr worten"))
      mem.addData(rows.take(2): _*)
      query.processAllAvailable()
      mem.addData(rows.drop(2): _*)
      query.processAllAvailable()
      val streamed = spark.table("classifier_stream")
        .collect().map(_.toSeq).toSet
      val batch = scored(rows.toDF("doc_id", "text"))
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
      assert(streamed.size == 4)
    } finally query.stop()
  }

  test("session stats on a stream: session_window rollup == the batch " +
      "sessionStats on the same rows") {
    // The q20 family's streaming analogue: gap-sessionization rides
    // Structured Streaming's session_window state machinery. Convention
    // note: session_window merges on gap < G (half-open window), the
    // batch operator on gap <= maxGap — identical whenever no gap equals
    // G exactly, which the fixture gaps (60 s / 180 s vs G = 90 s)
    // guarantee.
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val stream = mem.toDF().toDF("user_id", "ts")
    val query = stream
      .groupBy(col("user_id"), session_window(col("ts"), "90 seconds"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"))
      .select(col("user_id"), col("n_events"), col("start_ts"), col("end_ts"))
      .writeStream.format("memory").queryName("session_stream")
      .option("checkpointLocation", ckpt).outputMode("complete").start()
    try {
      def t(min: Int, sec: Int) =
        java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:$sec%02d")
      val rows = Seq(
        (1L, t(0, 0)), (1L, t(1, 0)), (1L, t(2, 0)),   // one session
        (1L, t(5, 0)), (1L, t(6, 0)),                  // gap 180s -> new
        (2L, t(0, 30)),                                // singleton
        (2L, t(3, 30)), (2L, t(4, 30)))                // gap 180s -> new
      mem.addData(rows.take(4): _*)
      query.processAllAvailable()
      mem.addData(rows.drop(4): _*)
      query.processAllAvailable()
      val streamed = spark.table("session_stream")
        .collect().map(_.toSeq).toSet
      val batch = graft.ops.Sessionize
        .sessionStats(rows.toDF("user_id", "ts"), Seq("user_id"), "ts",
          maxGap = 90L * 1000000L)
        .select(col("user_id"), col("n_events"), col("start_ts"), col("end_ts"))
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
      assert(streamed.size == 4) // 2 sessions for user 1, 2 for user 2
    } finally query.stop()
  }

  test("Bpe.tokenCount annotates a stream (stateless codegen kernel)") {
    val m = BpeMerges(Vector(("a", "b"), ("ab", "c")))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val query = stream
      .withColumn("n_bpe", graft.text.Bpe.tokenCount(col("text"), m))
      .writeStream.format("memory").queryName("bpe_stream")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      mem.addData((1L, "abc abc"), (2L, "xy"))
      query.processAllAvailable()
      val got = spark.table("bpe_stream")
        .select("doc_id", "n_bpe").as[(Long, Long)].collect().toMap
      assert(got == Map(1L -> 2L, 2L -> 2L))
    } finally query.stop()
  }

  test("Bm25.scoreColumn annotates a stream (stateless codegen kernel), micro-batch == batch") {
    // The BM25 scorer is the same shape as the classifier kernels: fit
    // happens once on a BATCH corpus, the pinned idfs ride the task
    // binary, and scoring is a pure per-row expression — so arriving
    // documents score under a frozen model with no state store.
    val corpus = Seq((1L, "spark scan fast"), (2L, "scan slow"), (3L, "fast fast scan"))
    val model = graft.text.Bm25.fit(corpus.toDF("doc_id", "text"), "text")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val query = stream
      .withColumn("s", graft.text.Bm25.scoreColumn(col("text"), model, Seq("scan", "fast")))
      .writeStream.format("memory").queryName("bm25_stream")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      val rows = Seq((10L, "fast scan fast"), (11L, "slow"), (12L, null: String))
      mem.addData(rows: _*)
      query.processAllAvailable()
      val streamed = spark.table("bm25_stream")
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
      val batch = rows.toDF("doc_id", "text")
        .select(col("doc_id"),
          graft.text.Bm25.scoreColumn(col("text"), model, Seq("scan", "fast")).as("s"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      assert(streamed == batch)
      assert(streamed(10L).exists(_ > 0.0) && streamed(12L).isEmpty)
    } finally query.stop()
  }
}
