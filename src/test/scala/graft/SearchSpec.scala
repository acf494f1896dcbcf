package graft

import org.apache.spark.sql.functions._

import graft.api.Hybrid
import graft.text.Bm25
import graft.text.Bpe

/** BM25 scoring (kernel == independently-spelled driver replay,
  * bit-exact), the idf ppm pin, hybrid RRF fusion against hand-computed
  * values, and the BPE id decoder's round-trip/contract corners. */
class SearchSpec extends SparkSuite {
  import spark.implicits._

  private val rng = new scala.util.Random(42)
  private val vocab = Array("alpha", "beta", "gamma", "delta", "eps", "zeta")

  private def randomDoc(): String =
    Array.fill(1 + rng.nextInt(30))(vocab(rng.nextInt(vocab.length))).mkString(" ")

  /** Independent driver-side BM25: java String.split tokens, Map-based
    * tf — same formula spelled once more, so a kernel tokenization or
    * accumulation bug cannot cancel out. */
  private def referenceScore(text: String, m: Bm25.Bm25Model,
      query: Seq[String]): Double = {
    val toks = text.split(" ", -1)
    val dl = toks.length.toDouble
    var sum = 0.0
    for (t <- query) {
      val f = toks.count(_ == t).toDouble
      if (f > 0)
        sum += m.idf(t) * ((f * (m.k1 + 1.0)) /
          (f + m.k1 * ((1.0 - m.b) + m.b * (dl / m.avgdl))))
    }
    sum
  }

  test("bm25: kernel scores equal the driver replay BIT-EXACTLY on a randomized corpus; strict codegen") {
    val docs = (0 until 200).map(i => (i.toLong, randomDoc())).toDF("id", "text")
    val m = Bm25.fit(docs, "text")
    val query = Seq("alpha", "gamma", "zeta")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val got = docs.select(col("id"), col("text"),
          Bm25.scoreColumn(col("text"), m, query).as("s"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      assert(got.length == 200)
      got.foreach { case (id, text, s) =>
        val want = referenceScore(text, m, query)
        assert(s == want, s"doc $id: kernel $s != reference $want")
      }
      assert(got.exists(_._3 > 0.0), "query terms occur in the corpus")
    } finally {
      spark.conf.unset("spark.sql.codegen.fallback")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("bm25: fit counts df per-document (not per-occurrence), caps vocab by df, pins idf to ppm") {
    val docs = Seq(
      (1L, "alpha alpha alpha beta"), // alpha 3x here but df(alpha)=2
      (2L, "alpha gamma"),
      (3L, "gamma gamma"),
      (4L, null: String)).toDF("id", "text")
    val m = Bm25.fit(docs, "text")
    assert(m.nDocs == 3 && m.totalTokens == 4 + 2 + 2)
    assert(m.df("alpha") == 2 && m.df("gamma") == 2 && m.df("beta") == 1)
    // cap keeps the most-document-frequent terms
    val capped = Bm25.fit(docs, "text", maxVocab = 2)
    assert(capped.df.size == 2 && !capped.df.contains("beta"))
    // absent term -> df 0 -> max idf; idf is an exact ppm multiple
    assert(capped.idf("beta") == Math.round(
      Math.log((3.0 - 0 + 0.5) / 0.5 + 1.0) * 1e6) / 1.0e6)
    assert((m.idf("alpha") * 1e6).isWhole)
  }

  test("bm25: fit rejects maxVocab < 1 loudly") {
    val docs = Seq((1L, "alpha")).toDF("id", "text")
    val e = intercept[IllegalArgumentException](Bm25.fit(docs, "text", maxVocab = 0))
    assert(e.getMessage.contains("maxVocab"))
  }

  test("bm25: fitQuery (aggregate-only serving fit) equals fit on the query terms exactly") {
    val docs = (0 until 150).map(i => (i.toLong, randomDoc())).toDF("id", "text")
    val full = Bm25.fit(docs, "text")
    val q = Seq("alpha", "zeta", "not-in-corpus")
    val restricted = Bm25.fitQuery(docs, "text", q)
    assert(restricted.nDocs == full.nDocs && restricted.totalTokens == full.totalTokens)
    q.foreach { t =>
      assert(restricted.df.getOrElse(t, 0L) == full.df.getOrElse(t, 0L), t)
      assert(restricted.idf(t) == full.idf(t), t)
    }
    assert(restricted.avgdl == full.avgdl)
  }

  test("bm25: null text scores null; duplicate query terms rejected at the expression, deduped by the API") {
    val docs = Seq((1L, "alpha"), (2L, null: String)).toDF("id", "text")
    val m = Bm25.fit(docs, "text")
    val rows = docs.select(col("id"),
        Bm25.scoreColumn(col("text"), m, Seq("alpha", "alpha")).as("s"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!rows(1L) && rows(2L))
    intercept[IllegalArgumentException] {
      graft.expressions.Bm25Score(
        org.apache.spark.sql.catalyst.expressions.Literal("x"),
        Array("a", "a"), Array(0.1, 0.1), 1.2, 0.75, 1.0)
    }
  }

  test("bm25: topK is (score DESC, id ASC) with deterministic ties") {
    // Two docs with identical text tie exactly; the lower id wins.
    val docs = Seq((5L, "alpha beta"), (3L, "alpha beta"), (1L, "beta beta"))
      .toDF("id", "text")
    val m = Bm25.fit(docs, "text")
    val top = Bm25.topK(docs, "text", "id", m, Seq("alpha"), 2)
      .collect().map(_.getLong(0))
    assert(top.sameElements(Array(3L, 5L)))
  }

  test("hybrid: rrfFuse matches hand-computed RRF; absent docs contribute zero; n_lists counts membership") {
    val lex = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val vec = Seq((20L, 1), (40L, 2)).toDF("id", "rank")
    val got = Hybrid.rrfFuse(Seq(lex, vec), "id", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def c(r: Int) = 1.0 / (60.0 + r)
    // 20 in both lists wins; then 10 (rank1) over 40 (rank2) over 30.
    assert(got.map(_._1).sameElements(Array(20L, 10L, 40L, 30L)))
    assert(got(0)._3 == c(2) + c(1) && got(0)._2 == 2)
    assert(got(1)._3 == c(1) && got(1)._2 == 1)
    assert(got(3)._3 == c(3))
  }

  test("hybrid: rankBy bounds to n and numbers 1-based in key order") {
    val df = Seq((1L, 0.5), (2L, 0.9), (3L, 0.9), (4L, 0.1)).toDF("id", "s")
    val ranked = Hybrid.rankBy(df, 3, col("s").desc, col("id"))
      .collect().map(r => (r.getLong(0), r.getInt(2)))
    assert(ranked.toSet == Set((2L, 1), (3L, 2), (1L, 3)))
  }

  test("bpe decode: decode ∘ encode == text minus spaces on random ASCII; strict codegen") {
    val merges = Bpe.learnMerges(
      Seq((0 until 300).map(_ => vocab(rng.nextInt(vocab.length))).mkString(" "))
        .toDF("text"), "text", numMerges = 12)
    val texts = (0 until 100).map { i =>
      val words = Array.fill(1 + rng.nextInt(12))(vocab(rng.nextInt(vocab.length)))
      (i.toLong, words.mkString(" ") + (if (i % 3 == 0) " x9. 42!" else ""))
    }
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val got = texts.toDF("id", "text")
        .select(col("id"), col("text"),
          Bpe.decodeIds(Bpe.encodeIds(col("text"), merges), merges).as("rt"))
        .collect()
      got.foreach { r =>
        assert(r.getString(2) == r.getString(1).replace(" ", ""))
      }
    } finally {
      spark.conf.unset("spark.sql.codegen.fallback")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("sql tvfs: bm25_topk / rrf_fuse / bpe_decode_ids equal their Scala surfaces") {
    val docs = (0 until 50).map(i => (i.toLong, randomDoc())).toDF("id", "text")
    docs.createOrReplaceTempView("search_docs")
    val m = Bm25.fit(docs, "text")
    val api = Bm25.topK(docs, "text", "id", m, Seq("alpha", "gamma"), 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val viaSql = spark.sql(
      "SELECT * FROM bm25_topk(TABLE(search_docs), 'text', 'id', 'alpha gamma', 5)")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(api.sameElements(viaSql))

    Seq((10L, 1), (20L, 2)).toDF("id", "rank").createOrReplaceTempView("search_lex")
    Seq((20L, 1), (30L, 2)).toDF("id", "rank").createOrReplaceTempView("search_vec")
    val fusedApi = Hybrid.rrfFuse(
        Seq(spark.table("search_lex"), spark.table("search_vec")), "id", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val fusedSql = spark.sql(
      "SELECT * FROM rrf_fuse(TABLE(search_lex), TABLE(search_vec), 'id', 3)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(fusedApi.sameElements(fusedSql))

    val merges = Bpe.BpeMerges(Vector(("a", "l"), ("al", "p"), ("alp", "h"), ("alph", "a")))
    val mPath = java.nio.file.Files.createTempFile("graft_merges", ".txt").toString
    Bpe.saveMerges(merges, mPath)
    docs.select(col("id"), Bpe.encodeIds(col("text"), merges).as("ids"))
      .createOrReplaceTempView("search_ids")
    val decoded = spark.sql(
      s"SELECT id, decoded FROM bpe_decode_ids(TABLE(search_ids), 'ids', '$mPath')")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    docs.collect().foreach { r =>
      assert(decoded(r.getLong(0)) == r.getString(1).replace(" ", ""))
    }
  }

  test("bpe decode: invalid ids null out; empty decodes empty; non-canonical rank ids decode to their output") {
    val merges = Bpe.BpeMerges(Vector(("a", "b"), ("ab", "c")))
    val table = Bpe.decodeTable(merges)
    assert(table.length == 258)
    def dec(ids: Seq[Int]): Option[String] = {
      val out = Bpe.decodeIdsText(
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(ids.toArray), table)
      Option(out).map(_.toString)
    }
    assert(dec(Seq(256, 'z'.toInt)) == Some("abz"))
    assert(dec(Seq(257)) == Some("abc"))
    assert(dec(Seq()) == Some(""))
    assert(dec(Seq(258)).isEmpty && dec(Seq(-1)).isEmpty)
    // Column surface: null array -> null, out-of-range id -> null row
    val rows = Seq((1L, Seq(256, 99)), (2L, Seq(9999)), (3L, null: Seq[Int]))
      .toDF("id", "ids")
      .select(col("id"), Bpe.decodeIds(col("ids"), merges).as("t"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(rows(1L) == "abc" && rows(2L) == null && rows(3L) == null)
  }
}
