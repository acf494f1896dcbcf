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
