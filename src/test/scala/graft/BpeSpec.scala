package graft

import org.apache.spark.sql.functions._

import graft.text.Bpe
import graft.text.Bpe.BpeMerges

/** Real merges-table BPE: trainer determinism, the Sennrich hand example,
  * canonical-encode == rank-order-replay == the DuckDB replace-chain
  * simulation (the oracle gate's mechanism), and the expression surface. */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  /** Naive rank-order replay: apply each merge exhaustively in rank order
    * (the DuckDB oracle's nested-replace semantics), independent of the
    * canonical lowest-rank-first loop in Bpe.encodeWord. */
  private def rankOrderEncode(word: String, m: BpeMerges): Array[String] =
    m.pairs.foldLeft(word.map(_.toString).toArray)((toks, p) => Bpe.mergePair(toks, p))

  /** Simulate the oracle's string-level replace chain (the exact DuckDB
    * mechanism): tokens separated by TWO spaces with double-space
    * sentinels at both ends; the rank-r pattern `␣x␣␣y␣` consumes only
    * the INNER space of each boundary pair, so the surviving outer spaces
    * serve as the boundary for an immediately-adjacent occurrence — a
    * single-space join would miss `[a,b,a,b]`'s second pair because
    * replace() resumes after the consumed shared space. Both Java's
    * String.replace and DuckDB's replace() scan left-to-right resuming
    * after each replacement. */
  private def replaceChainCount(word: String, m: BpeMerges): Int = {
    var s = "  " + word.toCharArray.mkString("  ") + "  "
    m.pairs.foreach { case (a, b) => s = s.replace(s" $a  $b ", s" $a$b ") }
    s.trim.split("  ").length
  }

  test("Sennrich hand example: low/lower/newest/widest learns the textbook merges") {
    // The classic BPE illustration (Sennrich et al. 2016, §3.2 adapted to
    // our no-</w> convention): 'es' and 'est' dominate, then 'lo' / 'low'.
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val m = Bpe.learnMerges(Seq(corpus).toDF("text"), "text", numMerges = 4)
    // e+s (9) -> es+t (9) -> l+o (7) -> lo+w (7)
    assert(m.pairs == Vector(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    assert(Bpe.encodeWord("newest", m).toSeq == Seq("n", "e", "w", "est"))
    assert(Bpe.encodeWord("lowest", m).toSeq == Seq("low", "est"))
    assert(Bpe.encodeWord("low", m).toSeq == Seq("low"))
  }

  test("training is deterministic and stops when no pair repeats") {
    val df = Seq("ab ab cd", "ab xyz").toDF("text")
    val m1 = Bpe.learnMerges(df, "text", numMerges = 100)
    val m2 = Bpe.learnMerges(df, "text", numMerges = 100)
    assert(m1 == m2)
    // 'ab' x3 merges; everything else is hapax-bounded.
    assert(m1.pairs.head == ("a", "b"))
    assert(m1.size < 100) // early stop, not the requested budget
  }

  test("canonical encode == rank-order replay == replace-chain simulation " +
      "on randomized words (the oracle-equivalence property)") {
    val rnd = new scala.util.Random(99)
    // Skewed small alphabet so merges genuinely chain (multi-char sides).
    def word(n: Int) = (1 to n).map(_ => "aabbcde".charAt(rnd.nextInt(7))).mkString
    val corpus = (1 to 300).map(_ => word(2 + rnd.nextInt(12))).mkString(" ")
    val m = Bpe.learnMerges(Seq(corpus).toDF("text"), "text", numMerges = 60)
    assert(m.size > 10, s"degenerate fixture: only ${m.size} merges")
    assert(m.pairs.exists(p => p._1.length + p._2.length > 2),
      "no chained merges — property would be vacuous")
    for (_ <- 1 to 2000) {
      val w = word(1 + rnd.nextInt(16))
      val canonical = Bpe.encodeWord(w, m)
      assert(canonical.toSeq == rankOrderEncode(w, m).toSeq, s"word '$w'")
      assert(canonical.length == replaceChainCount(w, m), s"word '$w'")
      assert(canonical.mkString == w, s"concat invariant broken for '$w'")
    }
  }

  test("tokenCount expression: runs encoded, symbols/digits/unicode counted " +
      "like the run convention; null -> null") {
    val m = BpeMerges(Vector(("a", "b"), ("ab", "c"), ("1", "2")))
    val rows = Seq(
      ("abc abc", 2L),          // 'abc' -> 1 token, twice
      ("abcabc", 2L),           // 'abcabc' -> ab+c ab+c -> abc abc
      ("ab1c", 3L),             // run 'ab' merges; '1' digit run; run 'c'
      ("a-b!", 4L),             // symbols break runs: a,-,b,!
      ("x 123 yz", 5L),         // x + (123 -> 12,3) + (yz -> y,z)
      ("", 0L),
      ("café", 4L))        // run caf (no merges apply: c,a,f) + one multi-byte char
      .toDF("text", "expected")
    val got = rows.withColumn("n", Bpe.tokenCount(col("text"), m))
      .select("text", "expected", "n").collect()
    got.foreach(r => assert(r.getLong(2) == r.getLong(1), s"text='${r.getString(0)}'"))
    val nul = Seq((null: String, 1)).toDF("text", "x")
      .select(Bpe.tokenCount(col("text"), m)).collect().head
    assert(nul.isNullAt(0))
  }

  test("expression agrees with driver-side encode over a learned table on fixture docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m = Bpe.learnMerges(docs, "text", numMerges = 80)
    assert(m.size >= 40, s"fixture corpus too degenerate: ${m.size} merges")
    val viaExpr = docs.where(col("text").isNotNull)
      .select(col("doc_id"), Bpe.tokenCount(col("text"), m).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val raw = docs.where(col("text").isNotNull)
      .select("doc_id", "text").collect()
    raw.foreach { r =>
      val expected = "[a-z]+|[0-9]+|[^a-z0-9 ]".r.findAllIn(r.getString(1)).map { w =>
        if (w.length > 1 && w.head.isLetterOrDigit) Bpe.encodeWord(w, m).length else 1
      }.sum
      assert(viaExpr(r.getLong(0)) == expected.toLong, s"doc ${r.getLong(0)}")
    }
  }

  test("BpeTokenCount and BpeEncodeIds compile under strict codegen " +
      "(no interpreter fallback)") {
    // The expressions' generated Java calls graft.text.Bpe.countText /
    // encodeIdsText as STATICS — scalac emits no static forwarder for
    // qualified-private members, so a private[text] entry point makes
    // Janino compilation fail and every stage silently falls back to
    // interpreted eval (this exact bug shipped r14–r15 for countText; the
    // entry points are public + scaladoc'd as codegen surface since r16).
    // ConvertToLocalRelation must be EXCLUDED or the optimizer folds the
    // projection interpreted at plan time and the test proves nothing
    // (the pre-r16 version of this test passed against the broken state).
    val m = BpeMerges(Vector(("a", "b")))
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
    try {
      val row = Seq("ab ab c").toDF("text")
        .select(Bpe.tokenCount(col("text"), m).as("n"),
          Bpe.encodeIds(col("text"), m).as("ids"))
        .collect().head
      assert(row.getLong(0) == 3L)
      assert(row.getSeq[Int](1) == Seq(256, 256, 'c'.toInt))
    } finally {
      spark.conf.unset("spark.sql.codegen.fallback")
      spark.conf.unset("spark.sql.codegen.factoryMode")
      spark.conf.unset("spark.sql.optimizer.excludedRules")
    }
  }

  test("encodeIds: ids match the encode tokens (size == tokenCount; " +
      "single chars = bytes, multi-char = 256 + first producing rank; " +
      "null -> null)") {
    // Duplicate-output table: ranks 0 ('a b' -> "ab"), 1 ('ab c' -> "abc"),
    // 2 ('a bc')... needs 'bc' producible first. Use ('b c') rank 1, then
    // ('a bc') rank 2 producing "abc", then ('ab c') rank 3 ALSO "abc":
    // the id for "abc" must be 258 (first producing rank 2), never 259.
    val m = BpeMerges(Vector(("a", "b"), ("b", "c"), ("a", "bc"), ("ab", "c")))
    assert(m.tokenIds.get("abc").intValue() == 258)
    val rows = Seq("abc xy 42 a!", null, "", "Ab c9 éz").toDF("text")
      .select(Bpe.encodeIds(col("text"), m).as("ids"),
        Bpe.tokenCount(col("text"), m).as("n"))
      .collect()
    // "abc" -> lowest-rank-first: 'a b'(r0) fires first -> [ab, c] -> 'ab c'
    // (r3) -> ["abc"] = id 258. "xy": no merges -> bytes. "42": digits, no
    // merges -> bytes. "a": single char run -> byte. "!": other -> byte.
    assert(rows(0).getSeq[Int](0) ==
      Seq(258, 'x'.toInt, 'y'.toInt, '4'.toInt, '2'.toInt, 'a'.toInt, '!'.toInt))
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
    assert(rows(2).getSeq[Int](0) == Seq.empty)
    // "Ab c9 éz": 'A' other byte 65; "b" run byte 98; "c"/"9" single
    // runs 99, 57; 'é' (U+00E9, UTF-8 C3 A9) -> leading byte 0xC3 =
    // 195; "z" -> 122.
    assert(rows(3).getSeq[Int](0) == Seq(65, 98, 99, 57, 195, 122))
    // size == tokenCount on every non-null row.
    rows.filterNot(_.isNullAt(0)).foreach { r =>
      assert(r.getSeq[Int](0).size.toLong == r.getLong(1))
    }
  }

  test("vocab.json wire format: deterministic ids, GPT-2 byte keys, " +
      "round-trip parse") {
    val m = BpeMerges(Vector(("a", "b"), ("b", "c"), ("a", "bc"), ("ab", "c")))
    val json = Bpe.vocabJson(m)
    val parsed = Bpe.parseVocabJson(json)
    // 256 byte entries + 3 distinct outputs (abc deduped to first rank).
    assert(parsed.size == 256 + 3)
    assert(parsed("ab") == 256 && parsed("bc") == 257 && parsed("abc") == 258)
    // GPT-2 byte->unicode: printable bytes map to themselves ('a' = 97),
    // non-printables shift into 256+n ordinally (0x00 -> U+0100, space
    // 0x20 is the 33rd non-printable... check two known points).
    assert(parsed("a") == 97 && parsed("!") == 33)
    assert(parsed("Ā") == 0) // byte 0x00, first shifted codepoint
    // Round-trip through a temp file.
    val p = java.nio.file.Files.createTempFile("vocab", ".json").toString
    Bpe.saveVocabJson(m, p)
    assert(Bpe.parseVocabJson(
      java.nio.file.Files.readString(java.nio.file.Paths.get(p))) == parsed)
  }

  test("bpe_token_count SQL TVF == the Scala API under the same merges file") {
    val m = BpeMerges(Vector(("a", "b"), ("ab", "c")))
    val path = java.nio.file.Files.createTempFile("bpe-tvf", ".txt").toString
    Bpe.saveMerges(m, path)
    val df = Seq((1L, "abc xyz"), (2L, "ababc"), (3L, null: String))
      .toDF("id", "text")
    df.createOrReplaceTempView("bpe_tvf_docs")
    val viaSql = spark.sql(
      s"""SELECT id, n_bpe_tokens
          FROM bpe_token_count(TABLE(bpe_tvf_docs), 'text', '$path')""")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    val viaApi = df.select(col("id"), Bpe.tokenCount(col("text"), m).as("n"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(viaSql == viaApi)
    assert(viaSql == Set((1L, 4L), (2L, 2L), (3L, -1L))) // abc + x,y,z; ab+abc; null
    // The ids TVF: same merges-path binding, array<int> output.
    val idsSql = spark.sql(
      s"""SELECT id, bpe_ids
          FROM bpe_encode_ids(TABLE(bpe_tvf_docs), 'text', '$path')""")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getSeq[Int](1))).toMap
    assert(idsSql(1L) == Seq(257, 'x'.toInt, 'y'.toInt, 'z'.toInt)) // abc=256+1
    assert(idsSql(2L) == Seq(256, 257)) // ab + abc
    assert(idsSql(3L) == null)
  }

  test("incremental trainer == full-recount reference on randomized " +
      "histograms (merge-sequence equality, r14 verdict item)") {
    // learnFromHistogram (delta updates over a pair->words index + a
    // lazy-deletion max-heap) must pick the exact same merge at every
    // round as the O(merges × histogram) recount loop — including the
    // count >= 2 stop rule and the lexicographic tiebreak, which the
    // skewed small alphabets here exercise constantly.
    for (seed <- Seq(1, 7, 42, 1234)) {
      val rnd = new scala.util.Random(seed)
      val alpha = "aabbccddef0123"
      val words = (1 to 400).map { _ =>
        val w = (1 to (1 + rnd.nextInt(12)))
          .map(_ => alpha.charAt(rnd.nextInt(alpha.length))).mkString
        (w, 1L + rnd.nextInt(50).toLong)
      }.distinct.toArray
      for (n <- Seq(1, 5, 50, 5000)) {
        val inc = Bpe.learnFromHistogram(words, n)
        val ref = Bpe.learnFromHistogramRecount(words, n)
        assert(inc == ref, s"seed=$seed numMerges=$n: $inc vs $ref")
        if (n == 5000) assert(inc.size < 5000, "exhaustion path not hit")
      }
    }
    // Degenerate edges: single word, overlapping self-pairs ('aaaa'),
    // hapax-only histograms (0 merges).
    for (hist <- Seq(Array(("aaaa", 3L)), Array(("ab", 1L), ("cd", 1L)),
        Array(("abab", 2L), ("baba", 2L), ("aabb", 5L)))) {
      assert(Bpe.learnFromHistogram(hist, 100) ==
        Bpe.learnFromHistogramRecount(hist, 100), hist.toSeq.toString)
    }
  }

  test("creation-order validation: a side that no earlier merge produces " +
      "is rejected (the oracle-replay equivalence precondition)") {
    // Valid chained table: 'ab' produced at rank 0, consumed at rank 1.
    BpeMerges(Vector(("a", "b"), ("ab", "c"), ("ab", "ab")))
    // 'ab c' before the 'a b' that produces 'ab' — rank-order replay
    // would silently diverge from lowest-rank-first; must fail loudly.
    val e1 = intercept[IllegalArgumentException](
      BpeMerges(Vector(("ab", "c"), ("a", "b"))))
    assert(e1.getMessage.contains("creation-ordered"))
    val e2 = intercept[IllegalArgumentException](
      BpeMerges(Vector(("a", "bc"))))
    assert(e2.getMessage.contains("creation-ordered"))
    // parseMerges routes through the same constructor check.
    intercept[IllegalArgumentException](Bpe.parseMerges("ab c\na b\n"))
    // The committed fixture and every trainer output are creation-ordered
    // by construction (loadMergesResource below re-validates the fixture).
  }

  test("merges wire format round-trips; resource table loads; alphabet guarded") {
    val m = BpeMerges(Vector(("t", "h"), ("th", "e"), ("1", "0")))
    assert(Bpe.parseMerges(m.format) == m)
    assert(Bpe.parseMerges("# header\n\nt h\nth e\n1 0\n") == m)
    intercept[IllegalArgumentException](BpeMerges(Vector(("a", "B"))))
    intercept[IllegalArgumentException](Bpe.parseMerges("a b c\n"))
    // The committed fixture vocabulary (LearnBpeFixture provenance tool:
    // sf0.01 documents exhaust their pair inventory at 89 merges — the
    // fixture corpus's full vocabulary).
    val fixture = Bpe.loadMergesResource("graft/bpe_merges_fixture.txt")
    assert(fixture.size >= 80 && fixture.pairs.exists(_ == ("jo", "in")))
  }
}
