package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

import graft.Hnsw

/**
 * Structured-Streaming surface for the engine. The reference is batch-only
 * (SURVEY §1.1: no streaming anywhere in src/), so this is additive: the
 * operators a continuously-ingesting training-data pipeline needs.
 *
 *  - [[maintainIndex]]: streaming HNSW maintenance — every micro-batch is
 *    appended to the index as a delta segment via [[Hnsw.insert]], the
 *    streaming analogue of the reference's INSERT hook
 *    (hnsw_index.cpp:421-478). Segments stay immutable; when the segment
 *    count passes `maxSegments`, the batch hook triggers
 *    [[Hnsw.compactIndex]], so an always-on stream can't grow the segment
 *    list (and with it per-search fan-out) without bound.
 *  - [[streamingExactDedup]]: drop byte-identical documents inside the
 *    watermark horizon using Spark's stateful dropDuplicates — the
 *    streaming version of [[graft.text.Dedup.exactDupGroups]].
 */
object StreamingIndex {

  /**
   * Configure a foreachBatch writer that keeps `indexName` up to date with
   * the stream of (id, vector) rows. Caller starts/stops the query:
   * {{{
   *   StreamingIndex.maintainIndex(stream, spark, "idx").start()
   * }}}
   * `maxSegments` bounds the index's segment count: after an append pushes
   * past it, the index is compacted inline (foreachBatch runs on the
   * driver between micro-batches — the natural maintenance point; pass
   * `Int.MaxValue` to opt out and schedule compaction externally).
   */
  def maintainIndex(stream: DataFrame, spark: SparkSession, indexName: String,
      maxSegments: Int = 16): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val meta = Hnsw.insert(spark, indexName, batch)
          if (meta.segments.size > maxSegments) { Hnsw.compactIndex(spark, indexName); () }
        }
      }

  /** Streaming exact dedup: first occurrence of each text hash within the
    * watermark wins; later identical payloads are dropped. */
  def streamingExactDedup(stream: DataFrame, textCol: String, tsCol: String,
      watermark: String = "10 minutes"): DataFrame =
    stream
      .withColumn("_text_hash", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicates("_text_hash")
      .drop("_text_hash")

  /**
   * Streaming gap-based sessionization — the continuous analogue of
   * [[graft.ops.Sessionize.sessionStats]], on Spark's native
   * `session_window` state store (merging windows, watermark eviction).
   * Emits one row per CLOSED session (append mode: a session is final once
   * the watermark passes its end) with the session bounds and event count.
   *
   * Semantics note vs the batch operator: `session_window`'s `end` is
   * last-event-time + gap (the window bound), where batch `sessionStats`
   * reports `end_ts` = the last event's timestamp; and sessions are
   * numbered in the batch API (`session_seq`) but unnumbered here — a
   * stream has no per-key total order to rank over until the watermark
   * closes it.
   *
   * @param gap session gap as a duration string (e.g. "4 hours"),
   *            matching `maxGap` micros in the batch operator
   */
  def streamingSessionStats(stream: DataFrame, keyCols: Seq[String],
      tsCol: String, gap: String,
      watermark: String = "10 minutes"): DataFrame = {
    require(keyCols.nonEmpty, "at least one session key")
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap) +: keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_events"))
      .select(keyCols.map(col) ++ Seq(
        col("session_window.start").as("start_ts"),
        col("session_window.end").as("end_ts"),
        col("n_events")): _*)
  }
}
