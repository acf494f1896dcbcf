package graft.text

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/**
 * Real merges-table byte-pair encoding — the production-tokenizer analogue
 * of [[TextFunctions.tokenCountBpe]]'s run-count heuristic, so token
 * budgets / packing / perplexity currencies can match an actual BPE
 * vocabulary.
 *
 * == Conventions ==
 *
 * Pre-tokenization is the repo's BPE-run convention (the
 * `[a-z]+|[0-9]+|[^a-z0-9 ]` class split that `tokenCountBpe` counts, see
 * `TextHash.asciiClassCount`): maximal lowercase-letter runs and digit
 * runs are BPE units; every other non-space character is one token and
 * never merges. Merges therefore contain only `[a-z0-9]` — pure ASCII by
 * construction, so character-level == byte-level and the DuckDB oracle
 * replay (space-joined chars + a rank-ordered `replace` chain) is exact.
 *
 * The merges table uses the GPT-2 `merges.txt` wire FORMAT — one
 * space-separated pair per line, rank = line order, `#` comments — read
 * and written by [[Bpe.loadMerges]]/[[Bpe.mergesText]]. Note the
 * CONTENT contract is this library's `[a-z0-9]` run alphabet: a
 * vocabulary published for byte-level pre-tokenization (GPT-2's own
 * merges.txt, with its `Ġ`-prefixed tokens, capitals, punctuation) is
 * rejected LOUDLY by the alphabet require below — the wire format
 * round-trips, the token universe is deliberately narrower (see the
 * pre-tokenizer paragraph above; it is what makes the DuckDB replay
 * exact).
 *
 * == Training at 100 TB ==
 *
 * [[Bpe.learnMerges]] is the standard two-phase trainer every production
 * BPE implementation uses (Sennrich et al. 2016; HF tokenizers'
 * word-count phase): the CORPUS pass is one distributed
 * aggregate — pre-token word histogram, `groupBy(word).count` — capped at
 * `maxWords` highest-frequency words (deterministic tiebreak), and the
 * merge loop runs driver-local over that bounded histogram. The corpus is
 * touched exactly once regardless of vocabulary size; the dropped tail
 * below the cap is the lowest-frequency words, whose pair counts are
 * negligible by construction. Training is fully deterministic: max count,
 * then lexicographically smallest pair.
 *
 * == Encoding ==
 *
 * [[Bpe.tokenCount]] is a codegen'd Catalyst expression (no UDF): one
 * byte pass splits runs exactly like `asciiClassCount`, each run is
 * encoded with the canonical lowest-rank-first merge loop, memoized in a
 * per-thread word cache (natural-language word frequency is Zipfian — the
 * cache turns almost every row into hash lookups). Applying merges
 * exhaustively in rank order is equivalent: a merge produced at rank r
 * only creates adjacencies involving its output token, whose own merges
 * all rank AFTER r, and never creates a new instance of an earlier pair
 * (spec'd as a property against the naive spelling).
 */
object Bpe {

  /** An ordered merges table (rank = position). Pairs are over the
    * `[a-z0-9]` run alphabet; multi-character sides appear as earlier
    * merges' outputs, exactly like GPT-2's published merges.txt. */
  final case class BpeMerges(pairs: Vector[(String, String)]) {
    require(pairs.nonEmpty, "empty merges table")
    pairs.foreach { case (a, b) =>
      require((a + b).forall(c => (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')),
        s"merge '$a $b' outside the [a-z0-9] run alphabet") }
    // Creation-order validation: every multi-char side must be the output
    // of an EARLIER merge. The scaladoc'd rank-order-replay ==
    // lowest-rank-first equivalence (which the DuckDB oracle replay relies
    // on) holds only for such tables — a hand-written file ranking 'ab c'
    // before the 'a b' that produces 'ab' would silently break it, so
    // malformed tables fail loudly here instead (O(n) set check).
    locally {
      val producible = scala.collection.mutable.HashSet.empty[String]
      pairs.iterator.zipWithIndex.foreach { case ((a, b), r) =>
        require(a.length == 1 || producible.contains(a),
          s"merge #$r '$a $b': left side '$a' is not the output of an " +
            s"earlier merge — the table is not creation-ordered")
        require(b.length == 1 || producible.contains(b),
          s"merge #$r '$a $b': right side '$b' is not the output of an " +
            s"earlier merge — the table is not creation-ordered")
        producible += (a + b): Unit
      }
    }
    def size: Int = pairs.size
    /** GPT-2 merges.txt wire format. */
    def format: String = pairs.map { case (a, b) => s"$a $b" }.mkString("\n") + "\n"
    /** (pair -> rank) lookup keyed "left right" (tokens never contain a
      * space), built once per table. */
    lazy val ranks: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](pairs.size * 2)
      pairs.iterator.zipWithIndex.foreach { case ((a, b), r) =>
        m.putIfAbsent(a + " " + b, Integer.valueOf(r)): Unit }
      m
    }
    /** Per-thread word→count memo (Zipfian hit rate; bounded, cleared at
      * 64k entries). Lives on the merges table so distinct vocabularies
      * never share entries. */
    @transient lazy val countCache: ThreadLocal[java.util.HashMap[String, Integer]] =
      ThreadLocal.withInitial(() => new java.util.HashMap[String, Integer]())

    /** Deterministic token→id assignment (the GPT-2 byte-level
      * convention): ids 0–255 are the single-byte base alphabet, id
      * 256 + r is the OUTPUT string of merge rank r. Two merges producing
      * the same string (e.g. `a bc` and `ab c`) share the FIRST rank's
      * id — ids are per token string, and encode output never depends on
      * which merge path produced it. */
    lazy val tokenIds: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](pairs.size * 2)
      pairs.iterator.zipWithIndex.foreach { case ((a, b), r) =>
        m.putIfAbsent(a + b, Integer.valueOf(256 + r)): Unit }
      m
    }

    /** Per-thread word→ids memo — [[countCache]]'s analogue for
      * [[Bpe.encodeIds]] (same Zipfian rationale and 64k bound). */
    @transient lazy val idsCache: ThreadLocal[java.util.HashMap[String, Array[Int]]] =
      ThreadLocal.withInitial(() => new java.util.HashMap[String, Array[Int]]())
  }

  // -------------------------------------------------------------- training

  /**
   * Learn `numMerges` merges from the corpus (see the object scaladoc for
   * the two-phase design). Stops early when no pair occurs twice.
   *
   * @param maxWords histogram cap — driver memory bound (the broadcast-
   *                 contract analogue of Mix's dimension cap)
   */
  def learnMerges(df: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 100000): BpeMerges = {
    require(numMerges >= 1 && numMerges <= 65536, s"numMerges out of range: $numMerges")
    require(maxWords >= 1 && maxWords <= 10000000, s"maxWords out of range: $maxWords")
    // One corpus pass: run pre-tokens (train-time apparatus — the builtin
    // regex is fine off the serving path), histogram, deterministic top-N.
    val hist: Array[(String, Long)] = df
      .select(explode(
        regexp_extract_all(col(textCol), lit("[a-z]+|[0-9]+"), lit(0))).as("w"))
      .where(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))

    BpeMerges(learnFromHistogram(hist, numMerges))
  }

  /**
   * Driver-local merge loop over the bounded histogram — INCREMENTAL pair
   * counts (the HF-tokenizers design): per merge round, only the words
   * that actually contain the chosen pair are re-paired, and the deltas
   * flow into a lazy-deletion max-heap, so round cost is proportional to
   * the pair's footprint instead of the whole histogram. At production
   * vocabulary sizes (32k–50k merges over a 100k–1M-word histogram) the
   * r14 full-recount loop was O(numMerges × histogram-tokens) — tens of
   * minutes; this is seconds (receipt in FIXTURES.md). Merge-sequence
   * equality with the recount reference is spec'd (BpeSpec) on randomized
   * histograms; selection rule unchanged: max count (≥ 2), then
   * lexicographically smallest pair.
   *
   * Heap discipline: every time a pair's count CHANGES, the new (count,
   * pair) entry is pushed; a popped entry is valid iff its count equals
   * the pair's current count (stale entries — superseded counts — are
   * discarded on pop). The pair→word-ids index tolerates stale ids the
   * same way: a listed word is re-checked for the adjacency before it
   * contributes deltas.
   */
  private[graft] def learnFromHistogram(hist: Array[(String, Long)],
      numMerges: Int): Vector[(String, String)] = {
    val words: Array[Array[String]] = hist.map(_._1.map(_.toString).toArray)
    val wcount: Array[Long] = hist.map(_._2)

    val pairCounts = new java.util.HashMap[(String, String), java.lang.Long]()
    val pairWords = new java.util.HashMap[(String, String),
      scala.collection.mutable.ArrayBuffer[Int]]()
    // Max-heap: highest count first, then lexicographically SMALLEST pair.
    val heap = scala.collection.mutable.PriorityQueue.empty[
      (Long, String, String)](new Ordering[(Long, String, String)] {
        def compare(x: (Long, String, String), y: (Long, String, String)): Int = {
          val c = java.lang.Long.compare(x._1, y._1)
          if (c != 0) c
          else {
            val a = y._2.compareTo(x._2) // reversed: lex-smaller wins ties
            if (a != 0) a else y._3.compareTo(x._3)
          }
        }
      })

    def bump(p: (String, String), d: Long): Long = {
      val prev = pairCounts.get(p)
      val nc = (if (prev == null) 0L else prev.longValue()) + d
      if (nc <= 0L) pairCounts.remove(p) else pairCounts.put(p, nc)
      nc
    }
    def register(p: (String, String), id: Int): Unit = {
      var buf = pairWords.get(p)
      if (buf == null) {
        buf = scala.collection.mutable.ArrayBuffer.empty[Int]
        pairWords.put(p, buf)
      }
      if (buf.isEmpty || buf.last != id) buf += id: Unit
    }

    var id = 0
    while (id < words.length) {
      val toks = words(id)
      var i = 0
      while (i < toks.length - 1) {
        val p = (toks(i), toks(i + 1))
        bump(p, wcount(id)): Unit
        register(p, id)
        i += 1
      }
      id += 1
    }
    pairCounts.forEach((p, c) =>
      if (c >= 2L) heap.enqueue((c.longValue(), p._1, p._2)))

    val merges = Vector.newBuilder[(String, String)]
    var r = 0
    var exhausted = false
    val delta = new java.util.HashMap[(String, String), java.lang.Long]()
    while (r < numMerges && !exhausted) {
      // Pop to the first non-stale entry with count >= 2.
      var best: (String, String) = null
      while (best == null && heap.nonEmpty) {
        val (c, a, b) = heap.dequeue()
        val p = (a, b)
        val cur = pairCounts.get(p)
        if (cur != null && cur.longValue() == c && c >= 2L) best = p
      }
      if (best == null) exhausted = true
      else {
        merges += best
        val ids = pairWords.remove(best)
        delta.clear()
        val seen = new java.util.HashSet[Integer]()
        if (ids != null) ids.foreach { wid =>
          if (seen.add(wid)) {
            val toks = words(wid)
            var has = false
            var i = 0
            while (!has && i < toks.length - 1) {
              has = toks(i) == best._1 && toks(i + 1) == best._2
              i += 1
            }
            if (has) { // stale index entries re-checked, never trusted
              val c = wcount(wid)
              i = 0
              while (i < toks.length - 1) {
                val p = (toks(i), toks(i + 1))
                delta.merge(p, java.lang.Long.valueOf(-c), (x, y) =>
                  java.lang.Long.valueOf(x.longValue() + y.longValue())): Unit
                i += 1
              }
              val merged = mergePair(toks, best)
              words(wid) = merged
              i = 0
              while (i < merged.length - 1) {
                val p = (merged(i), merged(i + 1))
                delta.merge(p, java.lang.Long.valueOf(c), (x, y) =>
                  java.lang.Long.valueOf(x.longValue() + y.longValue())): Unit
                register(p, wid)
                i += 1
              }
            }
          }
        }
        delta.forEach { (p, d) =>
          if (d.longValue() != 0L) {
            val nc = bump(p, d.longValue())
            if (nc >= 2L) heap.enqueue((nc, p._1, p._2))
          }
        }
        r += 1
      }
    }
    merges.result()
  }

  /** The r14 full-recount merge loop, kept as the SPEC REFERENCE for
    * [[learnFromHistogram]] (BpeSpec proves merge-sequence equality on
    * randomized histograms). O(numMerges × histogram tokens) — do not
    * use at production vocabulary sizes. */
  private[graft] def learnFromHistogramRecount(hist: Array[(String, Long)],
      numMerges: Int): Vector[(String, String)] = {
    var words: Array[(Array[String], Long)] =
      hist.map { case (w, c) => (w.map(_.toString).toArray, c) }
    val merges = Vector.newBuilder[(String, String)]
    var r = 0
    var exhausted = false
    while (r < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (toks, c) =>
        var i = 0
        while (i < toks.length - 1) {
          val p = (toks(i), toks(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      var best: (String, String) = null
      var bestC = 1L // require count >= 2: merging a hapax is noise
      counts.foreach { case (p, c) =>
        if (c > bestC || (c == bestC && best != null &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
          best = p; bestC = c
        }
      }
      if (best == null) exhausted = true
      else {
        merges += best
        words = words.map { case (toks, c) => (mergePair(toks, best), c) }
        r += 1
      }
    }
    merges.result()
  }

  /** Merge every left-to-right non-overlapping occurrence of `pair` —
    * the per-rank application step (both engines' convention: scanning
    * resumes after the fused token). */
  private[graft] def mergePair(toks: Array[String],
      pair: (String, String)): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](toks.length)
    var i = 0
    while (i < toks.length) {
      if (i < toks.length - 1 && toks(i) == pair._1 && toks(i + 1) == pair._2) {
        out += toks(i) + toks(i + 1); i += 2
      } else { out += toks(i); i += 1 }
    }
    out.toArray
  }

  // -------------------------------------------------------------- encoding

  /** Canonical BPE encode of one run word: repeatedly merge the
    * lowest-rank adjacent pair (all its occurrences, left to right) until
    * none remains. Driver/test surface; the expression path counts through
    * the same code. */
  def encodeWord(word: String, merges: BpeMerges): Array[String] = {
    var toks: Array[String] = word.map(_.toString).toArray
    var done = false
    while (!done && toks.length > 1) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < toks.length - 1) {
        val rk = merges.ranks.get(toks(i) + " " + toks(i + 1))
        if (rk != null && rk < bestRank) { bestRank = rk; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) done = true
      else toks = mergePair(toks, merges.pairs(bestRank))
    }
    toks
  }

  private[text] def countWord(word: String, merges: BpeMerges): Int = {
    val cache = merges.countCache.get()
    val hit = cache.get(word)
    if (hit != null) return hit.intValue()
    val n = encodeWord(word, merges).length
    if (cache.size() >= 65536) cache.clear()
    cache.put(word, Integer.valueOf(n))
    n
  }

  /** BPE token count of a full text under the run convention: one byte
    * pass splits `[a-z]+` / `[0-9]+` runs (BPE-encoded) and other
    * non-space chars (1 token each; multi-byte chars count once via their
    * leading byte, like `asciiClassCount`).
    *
    * PUBLIC because it is a CODEGEN ENTRY POINT: generated Java calls
    * `graft.text.Bpe.countText(...)` as a static, and scalac emits NO
    * static forwarder for qualified-private members — as private[text]
    * this silently failed Janino compilation and every BpeTokenCount
    * stage fell back to interpreted eval (found r16; strict-codegen
    * spec'd in BpeSpec since). */
  def countText(s: org.apache.spark.unsafe.types.UTF8String,
      merges: BpeMerges): Long = {
    val n = s.numBytes
    var cnt = 0L
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      val lower = b >= 'a' && b <= 'z'
      val digit = b >= '0' && b <= '9'
      if (lower || digit) {
        val start = i
        if (lower) while (i < n && s.getByte(i) >= 'a' && s.getByte(i) <= 'z') i += 1
        else while (i < n && s.getByte(i) >= '0' && s.getByte(i) <= '9') i += 1
        val len = i - start
        if (len == 1) cnt += 1
        else {
          val bytes = new Array[Byte](len)
          var j = 0
          while (j < len) { bytes(j) = s.getByte(start + j); j += 1 }
          cnt += countWord(new String(bytes, StandardCharsets.US_ASCII), merges)
        }
      } else {
        if ((b & 0xC0) != 0x80 && b != ' ') cnt += 1 // char-start, not space
        i += 1
      }
    }
    cnt
  }

  /** Column surface: BPE token count under `merges` (LONG; null text →
    * null). Codegen'd expression — the merges table rides the task binary
    * as a reference object (a few KB), like the DSIR score table. */
  def tokenCount(text: Column, merges: BpeMerges): Column =
    Bridge.column(BpeTokenCount(Bridge.expression(text), merges))

  /** Token ids of one run word (the [[encodeWord]] tokens mapped through
    * [[BpeMerges.tokenIds]]): single-char tokens are their ASCII byte,
    * multi-char tokens 256 + first producing rank. Memoized per thread. */
  private[text] def idsWord(word: String, merges: BpeMerges): Array[Int] = {
    val cache = merges.idsCache.get()
    val hit = cache.get(word)
    if (hit != null) return hit
    val toks = encodeWord(word, merges)
    val out = new Array[Int](toks.length)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      out(i) =
        if (t.length == 1) t.charAt(0).toInt
        else merges.tokenIds.get(t).intValue() // total: every multi-char
                                               // encode token IS a merge output
      i += 1
    }
    if (cache.size() >= 65536) cache.clear()
    cache.put(word, out)
    out
  }

  /** Token-ID encode of a full text — the same byte pass as [[countText]]
    * emitting ids instead of counts: `[a-z]+`/`[0-9]+` runs BPE-encode to
    * their token ids; every other non-space char is one token whose id is
    * its leading UTF-8 byte (a multi-byte char carries ONE id, its leading
    * byte — the same lossy-but-consistent treatment the counting
    * convention gives it: ids 0–255 are the byte-level base vocabulary).
    * PUBLIC because it is a codegen entry point (see [[countText]]). */
  def encodeIdsText(s: org.apache.spark.unsafe.types.UTF8String,
      merges: BpeMerges): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = s.numBytes
    var buf = new Array[Int](math.max(8, n / 3))
    var m = 0
    def append(v: Int): Unit = {
      if (m == buf.length) buf = java.util.Arrays.copyOf(buf, buf.length * 2)
      buf(m) = v; m += 1
    }
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      val lower = b >= 'a' && b <= 'z'
      val digit = b >= '0' && b <= '9'
      if (lower || digit) {
        val start = i
        if (lower) while (i < n && s.getByte(i) >= 'a' && s.getByte(i) <= 'z') i += 1
        else while (i < n && s.getByte(i) >= '0' && s.getByte(i) <= '9') i += 1
        val len = i - start
        if (len == 1) append(b.toInt)
        else {
          val bytes = new Array[Byte](len)
          var j = 0
          while (j < len) { bytes(j) = s.getByte(start + j); j += 1 }
          val ids = idsWord(new String(bytes, StandardCharsets.US_ASCII), merges)
          var k = 0
          while (k < ids.length) { append(ids(k)); k += 1 }
        }
      } else {
        if ((b & 0xC0) != 0x80 && b != ' ') append(b & 0xFF)
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(buf, m))
  }

  /** Column surface: BPE token-ID encode under `merges`
    * (ARRAY&lt;INT&gt; not null elements; null text → null) — the stage a
    * training job actually consumes, completing tokenizer parity: count /
    * budget / pack by BPE units all exist, this emits the ids themselves.
    * Codegen'd expression; `size(encode_ids(t)) == token_count(t)` by
    * construction (spec'd). */
  def encodeIds(text: Column, merges: BpeMerges): Column =
    Bridge.column(BpeEncodeIds(Bridge.expression(text), merges))

  /** id → token bytes, dense by id: 0–255 the byte-level base vocabulary,
    * 256 + r merge rank r's OUTPUT string. Non-canonical ids (a rank
    * whose output token was first produced earlier) decode to the same
    * output string their rank names — [[encodeIdsText]] never emits them,
    * but any 256 + r is still a well-defined token. */
  def decodeTable(merges: BpeMerges): Array[Array[Byte]] = {
    val out = new Array[Array[Byte]](256 + merges.pairs.length)
    var b = 0
    while (b < 256) { out(b) = Array(b.toByte); b += 1 }
    var r = 0
    while (r < merges.pairs.length) {
      val (a, bb) = merges.pairs(r)
      out(256 + r) = (a + bb).getBytes(StandardCharsets.US_ASCII)
      r += 1
    }
    out
  }

  /** Token-ID decode: concatenate each id's token bytes. Returns NULL for
    * an id outside [0, 256 + numMerges) or a null element — a corrupt id
    * stream has no text, and the null surfaces rather than truncates.
    * Note decode∘encode is the original text MINUS the characters the
    * encoder drops: spaces (never tokens) and multi-byte chars' trailing
    * bytes (a multi-byte char carries one id, its lead byte) — on ASCII
    * text, exactly `text` with spaces removed (gate-pinned).
    * PUBLIC because it is a codegen entry point. */
  def decodeIdsText(ids: org.apache.spark.sql.catalyst.util.ArrayData,
      table: Array[Array[Byte]]): org.apache.spark.unsafe.types.UTF8String = {
    val n = ids.numElements()
    var total = 0
    var i = 0
    while (i < n) {
      if (ids.isNullAt(i)) return null
      val id = ids.getInt(i)
      if (id < 0 || id >= table.length) return null
      total += table(id).length
      i += 1
    }
    val bytes = new Array[Byte](total)
    var off = 0
    i = 0
    while (i < n) {
      val tok = table(ids.getInt(i))
      System.arraycopy(tok, 0, bytes, off, tok.length)
      off += tok.length
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromBytes(bytes)
  }

  /** Column surface: decode an ARRAY&lt;INT&gt; id sequence back to text
    * under `merges` — the inverse stage of [[encodeIds]] modulo the
    * encoder's dropped separators (see [[decodeIdsText]]). Null array or
    * invalid id → null. Codegen'd expression. */
  def decodeIds(ids: Column, merges: BpeMerges): Column =
    Bridge.column(BpeDecodeIds(Bridge.expression(ids), merges))

  // ------------------------------------------------------------- wire I/O

  /** Parse the GPT-2 merges.txt wire format (one `left right` pair per
    * line in rank order; blank lines and `#…` header/comment lines
    * skipped) — the loader a real published vocabulary drops into. */
  def parseMerges(content: String): BpeMerges =
    BpeMerges(content.linesIterator
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val sp = l.split(" ")
        require(sp.length == 2, s"malformed merges line: '$l'")
        (sp(0), sp(1))
      }.toVector)

  def loadMerges(path: String): BpeMerges =
    parseMerges(Files.readString(Paths.get(path), StandardCharsets.UTF_8))

  /** Load a merges table from the library classpath (the committed
    * fixture vocabulary lives at `graft/bpe_merges_fixture.txt`). */
  def loadMergesResource(name: String): BpeMerges = {
    val in = getClass.getClassLoader.getResourceAsStream(name)
    require(in != null, s"merges resource not found: $name")
    try parseMerges(new String(in.readAllBytes(), StandardCharsets.UTF_8))
    finally in.close()
  }

  def saveMerges(merges: BpeMerges, path: String): Unit = {
    Files.writeString(Paths.get(path), merges.format): Unit
  }

  /** GPT-2's byte↔printable-unicode mapping (encoder.py bytes_to_unicode,
    * public): printable latin byte ranges map to themselves, the rest
    * shift to 256 + n — so every byte token has a visible one-char key in
    * vocab.json. */
  private[text] lazy val byteToUnicode: Array[Char] = {
    val direct = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val out = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if (direct(b)) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    out
  }

  /** The deterministic vocabulary as GPT-2 `vocab.json` wire text:
    * 256 byte-level entries (keys via [[byteToUnicode]], ids 0–255) plus
    * one entry per distinct merge OUTPUT (id 256 + first producing rank).
    * With [[BpeMerges.format]] this is the full two-file wire pair a
    * published tokenizer ships. */
  def vocabJson(merges: BpeMerges): String = {
    val sb = new StringBuilder("{")
    var b = 0
    while (b < 256) {
      if (b > 0) sb.append(", ")
      sb.append(graft.JsonUtil.str(byteToUnicode(b).toString))
        .append(": ").append(b)
      b += 1
    }
    // In id order: iterate ranks, emit first-producing outputs only.
    merges.pairs.iterator.zipWithIndex.foreach { case ((a, bb), r) =>
      val tok = a + bb
      if (merges.tokenIds.get(tok).intValue() == 256 + r)
        sb.append(", ").append(graft.JsonUtil.str(tok))
          .append(": ").append(256 + r): Unit
    }
    sb.append("}\n").toString
  }

  def saveVocabJson(merges: BpeMerges, path: String): Unit = {
    Files.writeString(Paths.get(path), vocabJson(merges)): Unit
  }

  /** Parse a `vocab.json` object of token → id (the minimal JSON subset
    * the wire format uses: one flat object, string keys with standard
    * escapes, integer values). Interop surface: round-trips
    * [[vocabJson]] and reads published GPT-2-style files. */
  def parseVocabJson(content: String): Map[String, Int] = {
    val out = Map.newBuilder[String, Int]
    var i = 0
    val n = content.length
    def skipWs(): Unit = while (i < n && content(i).isWhitespace) i += 1
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"vocab.json parse error at $i: $msg")
    def expect(c: Char): Unit = {
      skipWs()
      if (i >= n || content(i) != c) fail(s"expected '$c'")
      i += 1
    }
    def parseString(): String = {
      expect('"')
      val sb = new StringBuilder
      while (i < n && content(i) != '"') {
        val c = content(i)
        if (c == '\\') {
          if (i + 1 >= n) fail("dangling escape")
          content(i + 1) match {
            case '"' => sb.append('"'); i += 2
            case '\\' => sb.append('\\'); i += 2
            case '/' => sb.append('/'); i += 2
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case 'u' =>
              if (i + 6 > n) fail("truncated \\u escape")
              sb.append(Integer.parseInt(content.substring(i + 2, i + 6), 16).toChar)
              i += 6
            case e => fail(s"bad escape \\$e")
          }
        } else { sb.append(c); i += 1 }
      }
      if (i >= n) fail("unterminated string")
      i += 1
      sb.toString
    }
    def parseInt(): Int = {
      skipWs()
      val start = i
      if (i < n && content(i) == '-') i += 1
      while (i < n && content(i).isDigit) i += 1
      if (i == start) fail("expected integer")
      content.substring(start, i).toInt
    }
    expect('{')
    skipWs()
    if (i < n && content(i) == '}') { i += 1; return out.result() }
    var done = false
    while (!done) {
      val k = parseString()
      expect(':')
      out += (k -> parseInt())
      skipWs()
      if (i < n && content(i) == ',') i += 1
      else { expect('}'); done = true }
    }
    out.result()
  }
}

/** `bpe_token_count(text)` under a bound merges table — see
  * [[Bpe.tokenCount]]. */
case class BpeTokenCount(child: org.apache.spark.sql.catalyst.expressions.Expression,
    merges: Bpe.BpeMerges)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types._
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    Bpe.countText(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], merges)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", merges, classOf[Bpe.BpeMerges].getName)
    defineCodeGen(ctx, ev, c => s"graft.text.Bpe.countText($c, $ref)")
  }
  override def prettyName: String = "bpe_token_count"
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression) = copy(child = c)
}

/** `bpe_encode_ids(text)` under a bound merges table — see
  * [[Bpe.encodeIds]]. */
case class BpeEncodeIds(child: org.apache.spark.sql.catalyst.expressions.Expression,
    merges: Bpe.BpeMerges)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types._
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    Bpe.encodeIdsText(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], merges)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", merges, classOf[Bpe.BpeMerges].getName)
    defineCodeGen(ctx, ev, c => s"graft.text.Bpe.encodeIdsText($c, $ref)")
  }
  override def prettyName: String = "bpe_encode_ids"
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression) = copy(child = c)
}

/** `bpe_decode_ids(ids)` under a bound merges table — see
  * [[Bpe.decodeIds]]. Null for invalid ids (out of range / null element):
  * the expression is nullable even on non-null input. */
case class BpeDecodeIds(child: org.apache.spark.sql.catalyst.expressions.Expression,
    merges: Bpe.BpeMerges)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types._

  @transient private lazy val table: Array[Array[Byte]] = Bpe.decodeTable(merges)

  override def inputTypes = Seq(ArrayType(IntegerType))
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    Bpe.decodeIdsText(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], table)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeDecodeTable", table, "byte[][]")
    val out = ctx.freshName("bpeDecoded")
    nullSafeCodeGen(ctx, ev, c => {
      s"""org.apache.spark.unsafe.types.UTF8String $out =
         |  graft.text.Bpe.decodeIdsText($c, $ref);
         |if ($out == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $out; }""".stripMargin
    })
  }
  override def prettyName: String = "bpe_decode_ids"
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression) = copy(child = c)
}
