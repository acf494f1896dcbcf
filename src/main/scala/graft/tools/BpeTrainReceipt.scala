package graft.tools

import graft.text.Bpe

/**
 * Production-vocabulary trainer receipt (r14 verdict item 4): time
 * [[Bpe.learnFromHistogram]] — the incremental pair-count merge loop — at
 * real tokenizer-training shape (32k+ merges over a 100k+-word histogram),
 * against the r14 full-recount loop on the same input.
 *
 * The fixture corpora cannot provide this input: the synthetic documents
 * tables draw from ~131 distinct words at every scale (the sf10 corpus
 * exhausts its pair inventory at ~89 merges — measured in the r14
 * PERF_VS_DUCKDB receipt), so the production-shape histogram here is
 * generated DETERMINISTICALLY (seeded RNG): `words` distinct words
 * composed of 2–6 syllables from a 420-syllable CV/CVC inventory with
 * Zipf(1.0) counts — the skewed, deeply-chaining pair statistics a natural
 * vocabulary has. The corpus-pass half of training (one distributed
 * histogram aggregate) is unchanged and separately receipted at sf10;
 * this receipt isolates the driver merge loop the r14 verdict flagged as
 * the scalability cliff.
 *
 * Usage: sbt "runMain graft.tools.BpeTrainReceipt [numMerges] [words]"
 *   (defaults 32768, 200000). Prints wall times for the incremental loop
 *   and — at a reduced merge count, linearly extrapolated, because the
 *   full recount at 32k merges runs for tens of minutes — the r14 loop.
 */
object BpeTrainReceipt {

  /** Deterministic Zipfian word histogram with natural-language-like
    * syllable structure (shared with BpeSpec's scale test). */
  private[graft] def syntheticHistogram(words: Int): Array[(String, Long)] = {
    val rnd = new scala.util.Random(20260816L)
    val consonants = "bcdfghjklmnpqrstvwz"
    val vowels = "aeiou"
    val syllables = (for (c <- consonants; v <- vowels) yield s"$c$v") ++
      (for (c <- consonants; v <- "aeio") yield s"$c${v}n")
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    while (seen.size < words) {
      val nSyl = 2 + rnd.nextInt(5)
      seen += (1 to nSyl).map(_ => syllables(rnd.nextInt(syllables.length)))
        .mkString: Unit
    }
    seen.iterator.zipWithIndex
      .map { case (w, i) => (w, math.max(1L, (words.toLong * 10) / (i + 1))) }
      .toArray
  }

  def main(args: Array[String]): Unit = {
    val numMerges = args.headOption.map(_.toInt).getOrElse(32768)
    val words = args.lift(1).map(_.toInt).getOrElse(200000)
    val hist = syntheticHistogram(words)
    println(s"histogram: ${hist.length} distinct words, " +
      s"${hist.map(_._2).sum} total occurrences, " +
      s"${hist.map(_._1.length.toLong).sum} chars across distinct words")

    // Warm the JIT on a small slice, then time the real run.
    Bpe.learnFromHistogram(hist.take(5000), 2000): Unit
    val t0 = System.nanoTime()
    val inc = Bpe.learnFromHistogram(hist, numMerges)
    val incS = (System.nanoTime() - t0) / 1e9
    println(f"incremental: ${inc.size} merges in $incS%.1f s")

    // Recount reference: a fraction of the merge budget, extrapolated
    // (its per-round cost is ~flat — every round rescans the histogram).
    val refMerges = math.max(256, numMerges / 64)
    val t1 = System.nanoTime()
    val ref = Bpe.learnFromHistogramRecount(hist, refMerges)
    val refS = (System.nanoTime() - t1) / 1e9
    println(f"recount (r14 loop): ${ref.size} merges in $refS%.1f s " +
      f"-> ~${refS * numMerges / refMerges / 60}%.0f min extrapolated " +
      f"to $numMerges merges")
    require(inc.take(ref.size) == ref,
      "incremental and recount loops diverged — spec violation")
    println(f"prefix equality: first ${ref.size} merges identical across loops")
  }
}
