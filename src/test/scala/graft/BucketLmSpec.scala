package graft

import org.apache.spark.sql.functions._

import graft.text.BucketLm

/** Hashed-bucket bigram LM perplexity (CCNet-style filter): hand-checked
  * stupid-backoff math, ranking behavior, and edge cases. */
class BucketLmSpec extends SparkSuite {
  import spark.implicits._

  test("hand-checked log probs: seen bigram, backoff, and unseen-everything") {
    // Reference corpus: one doc "a b a b" -> unigrams a:2 b:2 (total 4),
    // bigrams "a b":2, "b a":1. B large enough that collisions are
    // practically impossible for 4 distinct grams.
    val B = 4096
    val m = BucketLm.fit(Seq("a b a b").toDF("text"), "text", buckets = B)
    assert(m.total == 4L)
    def lp(doc: String): Double =
      Seq(doc).toDF("text")
        .select(BucketLm.logProbColumn(col("text"), m).as("lp"))
        .collect().head.getDouble(0)
    // "a b": seen bigram, ln(c(ab)/c(a)) = ln(2/2) = 0.
    assert(math.abs(lp("a b")) < 1e-12)
    // "b a": ln(1/2).
    assert(math.abs(lp("b a") - math.log(0.5)) < 1e-12)
    // "a z": unseen bigram -> backoff 0.4 * (c(z)+1)/(total+B) = 0.4*1/4100.
    assert(math.abs(lp("a z") - math.log(0.4 * 1.0 / (4 + B))) < 1e-12)
    // "z b": unseen bigram, seen continuation -> 0.4*(2+1)/(4+B).
    assert(math.abs(lp("z b") - math.log(0.4 * 3.0 / (4 + B))) < 1e-12)
    // Mean over multiple predictions: "a b a" = (ln(2/2) + ln(1/2)) / 2.
    assert(math.abs(lp("a b a") - math.log(0.5) / 2) < 1e-12)
  }

  test("hand-checked recursive backoff at order 3: trigram hit, one-level and two-level fallbacks") {
    // Corpus "a b c a b c": uni a:2 b:2 c:2 (total 6); bi ab:2 bc:2 ca:1;
    // tri abc:2 bca:1. B large enough that the 8 distinct grams cannot
    // collide in practice.
    val B = 4096
    val m = BucketLm.fit(Seq("a b c a b c").toDF("text"), "text",
      buckets = B, n = 3)
    assert(m.order == 3 && m.total == 6L)
    def lp(doc: String): Double =
      Seq(doc).toDF("text")
        .select(BucketLm.logProbColumn(col("text"), m).as("lp"))
        .collect().head.getDouble(0)
    // "a b c": position 1 has only bigram context (ln(c(ab)/c(a)) =
    // ln(2/2) = 0); position 2 uses the full trigram (ln(c(abc)/c(ab)) =
    // ln(2/2) = 0).
    assert(math.abs(lp("a b c")) < 1e-12)
    // "c a b c": every position is a HIT — pos 1 bigram ln(c(ca)/c(c)) =
    // ln(1/2); pos 2 trigram "c a b" occurs once over context "c a" once
    // (ln(1/1) = 0); pos 3 trigram ln(c(abc)/c(ab)) = ln(2/2) = 0.
    val exp2 = (math.log(0.5) + 0.0 + 0.0) / 3
    assert(math.abs(lp("c a b c") - exp2) < 1e-12)
    // "a a b": pos 1 misses bigram "a a" -> one-level fallback straight to
    // the smoothed unigram ln(0.4*(c(a)+1)/(total+B)); pos 2 misses
    // trigram "a a b" but HITS bigram "a b" after one backoff:
    // ln(0.4 * c(ab)/c(a)) — the trigram->bigram fallback tier.
    val exp2b = (math.log(0.4 * 3.0 / (6 + B)) + math.log(0.4 * 2.0 / 2)) / 2
    assert(math.abs(lp("a a b") - exp2b) < 1e-12)
    // "b c z": pos 1 hits bigram bc (ln(2/2)=0); pos 2 misses trigram
    // "b c z" AND bigram "c z" -> two-level fallback to the smoothed
    // unigram: ln(0.4 * 0.4 * (c(z)+1)/(total+B)).
    val exp3 = (0.0 + math.log(0.4 * 0.4 * 1.0 / (6 + B))) / 2
    assert(math.abs(lp("b c z") - exp3) < 1e-12)
  }

  test("order 2 of the generalized kernel is bit-identical to the r12 bigram model") {
    // The digest-pinned doc_lm_perplexity gate rests on this: same
    // corpus, old two-pass-fit formula replayed by hand vs the fused
    // multi-order fit + recursive kernel at n = 2 — EXACT equality.
    val rnd = new scala.util.Random(23)
    val vocab = Seq("x", "yy", "zzz", "", "w v")
    def doc() = (1 to 1 + rnd.nextInt(10)).map(_ => vocab(rnd.nextInt(4))).mkString(" ")
    val ref = (1 to 25).map(_ => doc()).toDF("text")
    val m = BucketLm.fit(ref, "text", buckets = 509) // default n = 2
    def bucket(s: String): Long = {
      val out = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      var h = 0L
      var i = 7
      while (i >= 0) { h = (h << 8) | (out(i) & 0xffL); i -= 1 }
      java.lang.Long.remainderUnsigned(h, 509)
    }
    def r12Lp(docText: String): Option[Double] = {
      val toks = docText.split(" ", -1)
      if (toks.length < 2) return None
      val lps = toks.sliding(2).map { case Array(a, b) =>
        val cBi = m.bi(bucket(s"$a $b").toInt)
        val cPre = m.uni(bucket(a).toInt)
        if (cBi > 0 && cPre > 0) math.log(cBi.toDouble / cPre)
        else math.log(m.backoff * (m.uni(bucket(b).toInt) + 1.0) /
          (m.total + m.buckets))
      }.toSeq
      Some(lps.sum / lps.size)
    }
    val docs = (1 to 50).map(i => (i.toLong, doc()))
    val got = docs.toDF("id", "text")
      .select(col("id"), BucketLm.logProbColumn(col("text"), m).as("lp"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    docs.foreach { case (id, text) =>
      assert(got(id) == r12Lp(text), s"doc $id not bit-identical") // EXACT, no epsilon
    }
  }

  test("fused multi-order fit equals per-order fits; order-5 model ranks reference-like text first") {
    val ref = (1 to 30).map(_ => "one two three four five six").toDF("text")
    val m5 = BucketLm.fit(ref, "text", buckets = 1021, n = 5)
    // Per-order counts from the single fused pass match independent
    // single-order DSIR count passes exactly.
    (1 to 5).foreach { k =>
      val arr = new Array[Long](1021)
      graft.text.Dsir.bucketCounts(ref, "text", n = k, buckets = 1021)
        .collect().foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
      assert(m5.counts(k - 1).toSeq == arr.toSeq, s"order $k")
    }
    val ppl = Seq((1L, "one two three four five"), (2L, "five one four two six"))
      .toDF("id", "text")
      .select(col("id"), BucketLm.perplexityColumn(col("text"), m5).as("p"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    // Exact 5-gram continuation beats the shuffled bag of the same words.
    assert(ppl(1L) < ppl(2L))
  }

  test("short docs score null; filterByPerplexity keeps the reference-like tail") {
    val ref = (1 to 50).map(_ => "the quick brown fox jumps").toDF("text")
    val m = BucketLm.fit(ref, "text")
    val corpus = Seq(
      (1L, "the quick brown fox"), // reference-like: low perplexity
      (2L, "zzz qqq xxx www yyy"), // all-backoff: high perplexity
      (3L, "single"), // no predictions -> null -> dropped
      (4L, "the quick brown fox jumps")).toDF("id", "text")
    val ppl = corpus
      .select(col("id"), BucketLm.perplexityColumn(col("text"), m).as("p"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(ppl(3L).isEmpty)
    assert(ppl(1L).get < ppl(2L).get)
    val kept = BucketLm.filterByPerplexity(corpus, "text", m,
      maxPerplexity = ppl(1L).get + 1e-9)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L))
  }

  test("model fit is deterministic") {
    val ref = Seq("alpha beta gamma", "beta gamma delta").toDF("text")
    val m1 = BucketLm.fit(ref, "text", buckets = 1024)
    val m2 = BucketLm.fit(ref, "text", buckets = 1024)
    assert(m1.uni.toSeq == m2.uni.toSeq && m1.bi.toSeq == m2.bi.toSeq &&
      m1.total == m2.total)
  }

  test("fused kernel matches an independent reference implementation, incl. empty tokens") {
    // Reference path reimplemented from the CONTRACT (md5_number_upper %
    // B over split(' ') byte slices with empties kept + the backoff
    // formula) — shares no code with the kernel.
    def bucket(s: String, b: Long): Long = {
      val out = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      var h = 0L
      var i = 7
      while (i >= 0) { h = (h << 8) | (out(i) & 0xffL); i -= 1 }
      java.lang.Long.remainderUnsigned(h, b)
    }
    def refLp(m: BucketLm.Model, doc: String): Option[Double] = {
      val toks = doc.split(" ", -1)
      if (toks.length < 2) return None
      val lps = toks.sliding(2).map { case Array(a, b) =>
        val cBi = m.bi(bucket(s"$a $b", m.buckets).toInt)
        val cPre = m.uni(bucket(a, m.buckets).toInt)
        if (cBi > 0 && cPre > 0) math.log(cBi.toDouble / cPre)
        else math.log(m.backoff * (m.uni(bucket(b, m.buckets).toInt) + 1.0) /
          (m.total + m.buckets))
      }.toSeq
      Some(lps.sum / lps.size)
    }
    val rnd = new scala.util.Random(11)
    val vocab = Seq("aa", "bb", "cc", "", "dd") // "" = empty-token coverage
    def doc() = (1 to 1 + rnd.nextInt(12)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val refCorpus = (1 to 20).map(_ => doc()).toDF("text")
    val m = BucketLm.fit(refCorpus, "text", buckets = 257)
    val docs = (1 to 40).map(i => (i.toLong, doc()))
    val got = docs.toDF("id", "text")
      .select(col("id"), BucketLm.logProbColumn(col("text"), m).as("lp"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    docs.foreach { case (id, text) =>
      val exp = refLp(m, text)
      (got(id), exp) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-12, s"doc $id")
        case (a, b) => assert(a == b, s"doc $id: $a vs $b")
      }
    }
  }
}
