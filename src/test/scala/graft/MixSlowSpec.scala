package graft

import org.apache.spark.sql.functions._

import graft.text.Mix

/**
 * Scale-envelope test for [[graft.text.Mix.byTokenBudget]] under exactly the
 * skew it exists for: 500k docs where ONE source ("web") holds 90% of the
 * corpus and ten long-tail sources split the rest. Every doc carries a
 * constant 4 tokens, so the closed form is exact: a source with budget B
 * keeps min(n_docs, B/4) docs and its max cum_tokens is 4 × kept. Kept-set
 * MEMBERSHIP (which depends on the md5 fill order, not just counts) is
 * cross-checked against the textbook one-window cumsum via a per-source
 * doc_id checksum — the same equivalence the oracle gate proves at sf0.01,
 * here at 500k rows with a 45:1 group-size skew.
 */
class MixSlowSpec extends SparkSuite {
  import spark.implicits._

  test("tokenFrequencyStats at 1M docs: closed-form corpus counts") {
    // Every doc is "t<id%1000> common": token t<k> occurs exactly 1000
    // times corpus-wide, "common" occurs 1,000,000 times — so every doc's
    // stats are identical and known: n_tokens 2, freq_sum 1000 + 1M,
    // min_freq 1000. Verified in aggregate (no per-row collect).
    val docs = spark.range(1000000L).select(
      col("id").as("doc_id"),
      concat(lit("t"), (col("id") % 1000).cast("string"), lit(" common")).as("text"))
    val agg = graft.text.TextFunctions
      .tokenFrequencyStats(docs, "text", "doc_id")
      .agg(count(lit(1)), countDistinct(col("freq_sum")),
        min(col("freq_sum")), min(col("min_freq")), max(col("min_freq")),
        min(col("n_tokens")), max(col("n_tokens")))
      .collect().head
    assert(agg.getLong(0) == 1000000L)
    assert(agg.getLong(1) == 1L)
    assert(agg.getLong(2) == 1001000L)
    assert(agg.getLong(3) == 1000L && agg.getLong(4) == 1000L)
    assert(agg.getLong(5) == 2L && agg.getLong(6) == 2L)
  }

  private val Web = 450000L // docs 0 .. 449999
  private val TailSrc = 10  // s0..s9, 5k docs each

  private lazy val corpus = spark.range(500000L).select(
    col("id").as("doc_id"),
    when(col("id") < Web, lit("web"))
      .otherwise(concat(lit("s"), (col("id") % TailSrc).cast("string"))).as("source"),
    lit("w w w w").as("text"))

  test("500k docs, 90% one source: closed-form counts and window equivalence") {
    val budgets = (Seq(("web", 100000L)) ++
      (0 until TailSrc).map(i => (s"s$i", 100000L))).toDF("source", "budget")

    val kept = Mix.byTokenBudget(corpus, "doc_id", "text", "source", budgets)
      .groupBy("source")
      .agg(count(lit(1)).as("n"), max("cum_tokens").as("max_cum"),
        sum("doc_id").as("id_sum"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

    // web: budget 100k tokens / 4 per doc = 25k of 450k kept (cut mid-source);
    // every tail source: 5k docs = 20k tokens < budget -> all kept.
    assert(kept("web")._1 == 25000L && kept("web")._2 == 100000L)
    for (i <- 0 until TailSrc) {
      assert(kept(s"s$i")._1 == 5000L && kept(s"s$i")._2 == 20000L, s"s$i")
    }

    // Membership equivalence vs the one-window spelling (id checksums).
    corpus.createOrReplaceTempView("mix_slow_corpus")
    val expected = spark.sql(
      """WITH c AS (SELECT doc_id, source,
           sum(4) OVER (PARTITION BY source ORDER BY md5(CAST(doc_id AS STRING)), doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         FROM mix_slow_corpus)
         SELECT source, sum(doc_id) AS id_sum FROM c WHERE cum <= 100000
         GROUP BY source""")
      .as[(String, Long)].collect().toMap
    assert(kept.view.mapValues(_._3).toMap == expected)
  }

  test("packSequences + emitPackedSequences at 500k docs: closed form") {
    // Every doc carries exactly 4 tokens and L = 1024 is a multiple of 4,
    // so no doc ever crosses a boundary: total 2M tokens → 1954 sequences,
    // 1953 of them full, tail = 2,000,000 − 1953×1024 = 128 tokens; every
    // n_seqs is 1 and every seq_off is 0 mod 4. Verified in aggregate (no
    // per-row collect). spark.range input has no file stats, so this also
    // exercises the narrow+join-back default at width.
    val n = 500000L
    val docs = spark.range(n).select(
      col("id").as("doc_id"),
      concat(lit("w x y z")).as("text"))
    val coords = Mix.packSequences(docs, "doc_id", "text", 1024L)
    val ca = coords.agg(count(lit(1)), max(col("seq_id")),
        sum(col("n_seqs")), max(col("n_seqs")), max(col("seq_off") % 4))
      .collect().head
    assert(ca.getLong(0) == n)
    assert(ca.getLong(1) == 1953L)
    assert(ca.getLong(2) == n && ca.getLong(3) == 1L)
    assert(ca.getLong(4) == 0L)
    val seqs = Mix.emitPackedSequences(docs, "doc_id", "text", 1024L)
    val sa = seqs.agg(count(lit(1)), sum(col("n_tokens")),
        sum(when(col("n_tokens") === 1024L, 1L).otherwise(0L)),
        min(col("n_tokens")))
      .collect().head
    assert(sa.getLong(0) == 1954L)
    assert(sa.getLong(1) == 4L * n)
    assert(sa.getLong(2) == 1953L)
    assert(sa.getLong(3) == 128L)
  }
}
