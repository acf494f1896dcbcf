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
}
