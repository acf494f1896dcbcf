package graft

import org.apache.spark.sql.functions._

import graft.text.{Mix, TextFunctions => TF}

/** PII scrubbing, token-budget mix sampling, corpus top-ngrams. */
class PipelineOpsSpec extends SparkSuite {
  import spark.implicits._

  test("redactPii replaces emails, phones, and IPv4 addresses") {
    val rows = Seq(
      "write to jane.doe+spam@mail-host.co.uk today",
      "server at 10.0.255.3 is down",
      "call +44-020-7946-0958 now",
      "a@b.io and c_d%x@e.f.gg plus 1.2.3.4",
      "no pii here at all",
      "half-formed user@host and 300.300 and +1-12-3-4 stay put").toDF("t")
    val got = rows.select(TF.redactPii($"t")).as[String].collect()
    assert(got(0) == "write to <EMAIL> today")
    assert(got(1) == "server at <IP> is down")
    assert(got(2) == "call <PHONE> now")
    assert(got(3) == "<EMAIL> and <EMAIL> plus <IP>")
    assert(got(4) == "no pii here at all")
    // user@host: no dot-TLD → not an email; 300.300: not a quad;
    // +1-12-3-4: wrong group widths — all intentionally untouched.
    assert(got(5) == "half-formed user@host and 300.300 and +1-12-3-4 stay put")
  }

  test("piiStats counts per category without rewriting") {
    val df = Seq("x@y.com then z@w.org at 1.2.3.4 and 5.6.7.8 call +1-555-123-4567")
      .toDF("t")
    val r = df.select(TF.piiStats($"t").as("p"))
      .select($"p.n_emails", $"p.n_ips", $"p.n_phones").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 2L, 1L)))
  }

  test("redactPii does not cross word boundaries mid-digit-run") {
    // \b keeps 1234.5.6.7 (leading run too wide for a quad start) intact.
    val got = Seq("seq 1234.5.6.7 x").toDF("t")
      .select(TF.redactPii($"t")).as[String].head()
    assert(got == "seq 1234.5.6.7 x")
  }

  test("PII kernel matches java.util.regex on adversarial random strings") {
    // The kernel's spec is the regex composition; fuzz the equivalence over
    // strings dense in pattern-relevant bytes (plus a non-ASCII char to pin
    // the byte-level \b handling).
    import java.util.regex.Pattern
    val email = Pattern.compile(TF.EmailRe)
    val phone = Pattern.compile(TF.PhoneRe)
    val ip = Pattern.compile(TF.Ipv4Re)
    def regexRedact(s: String): String =
      ip.matcher(phone.matcher(email.matcher(s).replaceAll("<EMAIL>"))
        .replaceAll("<PHONE>")).replaceAll("<IP>")
    def count(p: Pattern, s: String): Long = {
      val m = p.matcher(s); var c = 0L; while (m.find()) c += 1; c
    }
    val alphabet = "ab1@.-+_% 9é".toCharArray.toSeq
    val strGen = org.scalacheck.Gen.chooseNum(0, 40).flatMap(n =>
      org.scalacheck.Gen.listOfN(n, org.scalacheck.Gen.oneOf(alphabet)).map(_.mkString))
    val prop = org.scalacheck.Prop.forAll(strGen) { s =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
      val kr = graft.expressions.PiiScrub.redact(u).toString
      val st = graft.expressions.PiiScrub.stats(u)
      kr == regexRedact(s) &&
        st.getLong(0) == count(email, s) &&
        st.getLong(1) == count(ip, s) &&
        st.getLong(2) == count(phone, s)
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(3000), prop)
    assert(res.passed, res.status.toString)
  }

  test("PII kernel matches the regexp_* Column spelling through Spark") {
    // The java.util.regex fuzz above pins the kernel to the JVM regex
    // semantics; this pins it to Spark's regexp_replace/regexp_count
    // codegen path as well, over a deterministic adversarial batch.
    val alphabet = "ab1@.-+_% 9é".toCharArray
    val rnd = new scala.util.Random(42)
    val strs = (1 to 400).map { _ =>
      val n = rnd.nextInt(41)
      (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    } ++ Seq(
      "mail a.b@c.de now", "+1-555-123-4567", "10.0.0.1", "x999.1.1.1y",
      "a@b.co 1.2.3.4 +44-202-555-0000 b@c.io")
    val df = strs.toDF("t")
    val got = df.select(
      TF.redactPii($"t").as("kr"), TF.redactPiiRegex($"t").as("rr"),
      TF.piiStats($"t").as("ks"), TF.piiStatsRegex($"t").as("rs"))
    val bad = got.where($"kr" =!= $"rr" || $"ks" =!= $"rs").collect()
    assert(bad.isEmpty, bad.take(3).mkString("; "))
  }

  // --- Mix.byTokenBudget ---------------------------------------------------

  private def mixCorpus = {
    // 3 sources, values sized so budgets cut mid-source. Tokens = words.
    val docs = (1 to 60).map { i =>
      val src = s"s${i % 3}"
      val words = 1 + (i * 7) % 5 // 1..5 tokens
      (i.toLong, src, Seq.fill(words)("w").mkString(" "))
    }
    docs.toDF("doc_id", "source", "text")
  }

  private def oneWindowExpected(budget: Long): Set[Long] = {
    // The textbook single-window spelling, as plain SQL on the same session.
    mixCorpus.createOrReplaceTempView("mix_corpus")
    spark.sql(
      s"""WITH t AS (SELECT doc_id, source, size(split(text, ' ')) AS toks,
                      md5(CAST(doc_id AS STRING)) AS h FROM mix_corpus),
          c AS (SELECT doc_id, sum(toks) OVER (PARTITION BY source ORDER BY h, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM t)
          SELECT doc_id FROM c WHERE cum <= $budget""")
      .as[Long].collect().toSet
  }

  test("md5Longs (h1, h2) order equals md5Hex lexicographic order, prefix exact") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.expressions.TextHash
    val rnd = new scala.util.Random(11)
    val strs = ((1 to 400).map(_ =>
      rnd.alphanumeric.take(rnd.nextInt(12) + 1).mkString) :+ "").distinct
    def hex(s: String) = TextHash.md5Hex(UTF8String.fromString(s)).toString
    def longs(s: String) = {
      val r = TextHash.md5Longs(UTF8String.fromString(s))
      (r.getLong(0), r.getLong(1))
    }
    assert(strs.sortBy(hex) == strs.sortBy(longs))
    // 16-bit bucket prefix: (h1 un-flipped) >>> 48 == first four hex chars
    strs.foreach { s =>
      val h1raw = longs(s)._1 ^ Long.MinValue
      assert((h1raw >>> 48) == java.lang.Long.parseLong(hex(s).take(4), 16), s)
    }
  }

  test("byTokenBudget matches the one-window spelling at every bucket width") {
    val budgets = Seq(("s0", 20L), ("s1", 20L), ("s2", 20L)).toDF("source", "budget")
    val expected = oneWindowExpected(20L)
    assert(expected.nonEmpty && expected.size < 60, "budget must cut mid-source")
    for (buckets <- Seq(1, 4, 256)) {
      val got = Mix.byTokenBudget(mixCorpus, "doc_id", "text", "source", budgets,
        buckets = buckets).select("doc_id").as[Long].collect().toSet
      assert(got == expected, s"buckets=$buckets")
    }
  }

  test("tokenBudgetManifest equals byTokenBudget's projection at every bucket width") {
    val budgets = Seq(("s0", 20L), ("s1", 14L), ("s2", 25L)).toDF("source", "budget")
    for (buckets <- Seq(1, 4, 256)) {
      val full = Mix.byTokenBudget(mixCorpus, "doc_id", "text", "source", budgets,
          buckets = buckets)
        .select("doc_id", "source", "cum_tokens")
        .as[(Long, String, Long)].collect().toSet
      val manifest = Mix.tokenBudgetManifest(mixCorpus, "doc_id", "text", "source",
          budgets, buckets = buckets)
        .as[(Long, String, Long)].collect().toSet
      assert(manifest == full, s"buckets=$buckets")
    }
  }

  test("tokenBudgetManifest expression-budget form equals the table form " +
      "fed the same formula, and plans zero extra jobs") {
    // budget = 14 + 3·(last digit of source) — a formula of the group,
    // evaluated inline by the expression form and materialized as a dim
    // table for the reference.
    val budgetExpr = lit(14) + lit(3) * substring(col("source"), 2, 1).cast("int")
    val budgetsTable = mixCorpus.select(col("source")).distinct()
      .withColumn("budget", budgetExpr.cast("long"))
    for (buckets <- Seq(1, 4, 256)) {
      val viaTable = Mix.tokenBudgetManifest(mixCorpus, "doc_id", "text",
          "source", budgetsTable, buckets = buckets)
        .as[(Long, String, Long)].collect().toSet
      val viaExpr = Mix.tokenBudgetManifest(mixCorpus, "doc_id", "text",
          "source", budgetExpr, buckets)
        .as[(Long, String, Long)].collect().toSet
      assert(viaExpr == viaTable, s"buckets=$buckets")
      assert(viaExpr.nonEmpty)
    }
    // Exactly ONE broadcast join in the expression form's plan (the grid
    // offsets join every cumsum carries) — the budget apparatus join is
    // gone, not just cheaper. The table form carries two.
    def nJoins(p: String): Int = "BroadcastHashJoin".r.findAllIn(p).length
    val exprPlan = Mix.tokenBudgetManifest(mixCorpus, "doc_id", "text", "source",
      budgetExpr).queryExecution.executedPlan.toString
    val tablePlan = Mix.tokenBudgetManifest(mixCorpus, "doc_id", "text", "source",
      budgetsTable).queryExecution.executedPlan.toString
    assert(nJoins(exprPlan) == 1, exprPlan)
    assert(nJoins(tablePlan) == 2, tablePlan)
  }

  test("packManifestBy(weight) generalizes packManifest: identical with the " +
      "whitespace weight, different-and-consistent with a custom currency") {
    val ws = Mix.packManifest(mixCorpus, "doc_id", "text", seqLen = 7L)
      .as[(Long, Long, Long, Long)].collect().toSet
    val byWs = Mix.packManifestBy(mixCorpus, "doc_id",
        graft.text.TextFunctions.tokenCount(col("text")), seqLen = 7L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(byWs == ws)
    // A doubled currency halves the capacity of each sequence: total
    // spanned sequences (max seq_id+n_seqs) must strictly grow.
    val doubled = Mix.packManifestBy(mixCorpus, "doc_id",
        graft.text.TextFunctions.tokenCount(col("text")) * 2, seqLen = 7L)
      .as[(Long, Long, Long, Long)].collect()
    def lastSeq(rows: Iterable[(Long, Long, Long, Long)]) =
      rows.map(r => r._2 + r._4).max
    assert(lastSeq(doubled) > lastSeq(ws))
  }

  test("countBudgetManifest expression-cap form equals the table form on " +
      "both paths; zero joins on the heap path; maxCap contract enforced") {
    val capExpr = lit(2) + substring(col("source"), 2, 1).cast("int") % 2 // 2..3
    val capsTable = mixCorpus.select(col("source")).distinct()
      .withColumn("budget", capExpr.cast("long"))
    def viaTable = Mix.countBudgetManifest(mixCorpus, "doc_id", "source", capsTable)
      .as[(Long, String, Long)].collect().toSet
    def viaExpr = Mix.countBudgetManifest(mixCorpus, "doc_id", "source", capExpr, maxCap = 3)
      .as[(Long, String, Long)].collect().toSet
    assert(viaExpr == viaTable) // heap path
    assert(viaExpr.nonEmpty)
    val plan = Mix.countBudgetManifest(mixCorpus, "doc_id", "source", capExpr, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan) // ONE aggregate, no dim join at all
    spark.conf.set(Mix.HeapCapMaxKKey, "0") // force the cumsum fallback
    try assert(viaExpr == viaTable)
    finally spark.conf.unset(Mix.HeapCapMaxKKey)
    // maxCap contract: an under-declared bound fails loudly, never truncates
    val boom = intercept[Exception] {
      Mix.countBudgetManifest(mixCorpus, "doc_id", "source", capExpr, maxCap = 2)
        .collect()
    }
    assert(boom.getMessage != null)
  }

  test("expression-form null contracts fail loudly: null weight, null " +
      "budget, null cap all raise instead of silently dropping (r14 advice)") {
    // Null WEIGHT: no defined position in the layout/fill order.
    val withNullText = mixCorpus.withColumn("text",
      when(col("doc_id") === 7L, lit(null: String)).otherwise(col("text")))
    val nullW = graft.text.TextFunctions.tokenCount(col("text")).cast("long")
    val wBoom = intercept[Exception] {
      Mix.weightBudgetManifestBy(withNullText, "doc_id", nullW, "source",
        lit(1000L)).collect()
    }
    assert(wBoom.getMessage.contains("weight must be non-null"),
      wBoom.getMessage)
    val pBoom = intercept[Exception] {
      Mix.packManifestBy(withNullText, "doc_id", nullW, seqLen = 7L).collect()
    }
    assert(pBoom.getMessage.contains("weight must be non-null"),
      pBoom.getMessage)
    // ... and coalesce-to-0 is the documented fix: runs clean, and the
    // null-text doc fills with 0 tokens exactly like the oracle's window
    // sum skipping a NULL.
    assert(Mix.weightBudgetManifestBy(withNullText, "doc_id",
      coalesce(nullW, lit(0L)), "source", lit(1000L)).count() == 60L)
    // Null BUDGET: would drop the whole group through cum <= null.
    val nullBudget = when(col("source") === "s1", lit(null).cast("long"))
      .otherwise(lit(1000L))
    val bBoom = intercept[Exception] {
      Mix.weightBudgetManifestBy(mixCorpus, "doc_id",
        graft.text.TextFunctions.tokenCount(col("text")).cast("long"),
        "source", nullBudget).collect()
    }
    assert(bBoom.getMessage.contains("budget must be non-null"),
      bBoom.getMessage)
    // Null CAP, both paths (heap and cumsum fallback).
    val nullCap = when(col("source") === "s2", lit(null).cast("long"))
      .otherwise(lit(3L))
    val cBoom = intercept[Exception] {
      Mix.countBudgetManifest(mixCorpus, "doc_id", "source", nullCap,
        maxCap = 3).collect()
    }
    assert(cBoom.getMessage.contains("null/uncastable"), cBoom.getMessage)
    spark.conf.set(Mix.HeapCapMaxKKey, "0")
    try {
      val cBoom2 = intercept[Exception] {
        Mix.countBudgetManifest(mixCorpus, "doc_id", "source", nullCap,
          maxCap = 3).collect()
      }
      assert(cBoom2.getMessage.contains("null/uncastable"), cBoom2.getMessage)
    } finally spark.conf.unset(Mix.HeapCapMaxKKey)
  }

  test("countBudgetManifest equals byCountBudget's projection on both paths") {
    val caps = Seq(("s0", 3L), ("s1", 2L), ("s2", 4L)).toDF("source", "budget")
    def full = Mix.byCountBudget(mixCorpus, "doc_id", "source", caps)
      .select("doc_id", "source", "cum_docs")
      .as[(Long, String, Long)].collect().toSet
    def manifest = Mix.countBudgetManifest(mixCorpus, "doc_id", "source", caps)
      .as[(Long, String, Long)].collect().toSet
    assert(manifest == full) // heap path (caps <= default heapCapMaxK)
    spark.conf.set(Mix.HeapCapMaxKKey, "0") // force the cumsum fallback
    try assert(manifest == full)
    finally spark.conf.unset(Mix.HeapCapMaxKKey)
  }

  test("packManifest equals packSequences' projection") {
    val full = Mix.packSequences(mixCorpus, "doc_id", "text", seqLen = 7L)
      .select("doc_id", "seq_id", "seq_off", "n_seqs")
      .as[(Long, Long, Long, Long)].collect().toSet
    val manifest = Mix.packManifest(mixCorpus, "doc_id", "text", seqLen = 7L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(manifest == full)
  }

  test("byTokenBudget cum_tokens is the inclusive prefix sum and ≤ budget") {
    val budgets = Seq(("s0", 25L), ("s1", 10L), ("s2", 0L)).toDF("source", "budget")
    val rows = Mix.byTokenBudget(mixCorpus, "doc_id", "text", "source", budgets)
      .select($"source", $"cum_tokens", size(split($"text", " ")).cast("long").as("toks"))
      .collect()
    assert(rows.nonEmpty)
    // budget 0 drops the whole group
    assert(!rows.exists(_.getString(0) == "s2"))
    val bySrc = rows.groupBy(_.getString(0))
    for ((src, rs) <- bySrc) {
      val cap = if (src == "s0") 25L else 10L
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.last.getLong(1) <= cap)
      // inclusive prefix sums: cum differences are exactly the row's tokens
      sorted.zip(0L +: sorted.map(_.getLong(1)).init).foreach { case (r, prev) =>
        assert(r.getLong(1) - prev == r.getLong(2))
      }
    }
  }

  test("byCountBudget caps docs per group in deterministic order") {
    val budgets = Seq(("s0", 5L), ("s1", 0L), ("s2", 100L)).toDF("source", "budget")
    val kept = Mix.byCountBudget(mixCorpus, "doc_id", "source", budgets)
      .select($"source", $"cum_docs").as[(String, Long)].collect()
    val bySrc = kept.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(bySrc("s0") == (1L to 5L))       // capped at 5, ranks contiguous
    assert(!bySrc.contains("s1"))           // cap 0 drops the group
    assert(bySrc("s2") == (1L to 20L))      // cap above group size keeps all
    // the kept 5 are the FIRST 5 in md5 order — same prefix the window picks
    mixCorpus.createOrReplaceTempView("mix_corpus_caps")
    val expect = spark.sql(
      """SELECT doc_id FROM (
           SELECT doc_id, row_number() OVER (PARTITION BY source
             ORDER BY md5(CAST(doc_id AS STRING)), doc_id) AS rn
           FROM mix_corpus_caps WHERE source = 's0') WHERE rn <= 5""")
      .as[Long].collect().toSet
    val got = Mix.byCountBudget(mixCorpus, "doc_id", "source", budgets)
      .where($"source" === "s0").select("doc_id").as[Long].collect().toSet
    assert(got == expect)
  }

  test("md5 digest evaluates once per row in the heap path's plan (r11 advice)") {
    // The two-step struct projection keeps CollapseProject from inlining
    // the digest into both field extractions; the optimized plan must
    // carry exactly one md5Longs per corpus row. (An inlined duplicate
    // shows up as two occurrences — the guaranteed double evaluation in
    // interpreted/fallback paths the r10 advice flagged.)
    val budgets = Seq(("s0", 5L), ("s1", 3L), ("s2", 4L)).toDF("source", "budget")
    // Parquet-backed corpus: over a LocalRelation the optimizer evaluates
    // the projection chain eagerly (ConvertToLocalRelation) and no
    // expression survives to count.
    val dir = java.nio.file.Files.createTempDirectory("mix-md5-plan").toFile
    mixCorpus.write.mode("overwrite").parquet(dir.getAbsolutePath)
    val corpus = spark.read.parquet(dir.getAbsolutePath)
    val plan = Mix.byCountBudget(corpus, "doc_id", "source", budgets)
      .queryExecution.optimizedPlan
    var n = 0
    plan.foreach(_.expressions.foreach(_.foreach {
      case _: graft.expressions.Md5Longs => n += 1
      case _ =>
    }))
    assert(n == 1, s"expected exactly one md5Longs in the plan, found $n:\n$plan")
  }

  test("byTokenBudget guards: >256 buckets real, dup budgets rejected, no column capture") {
    val budgets = Seq(("s0", 20L), ("s1", 20L), ("s2", 20L)).toDF("source", "budget")
    // buckets > 256 used to silently collapse to 256 (8-bit prefix); the
    // 16-bit prefix makes 1024 a real fan-out, still equal to the 1-bucket
    // spelling (bucketing is an order-preserving decomposition).
    val wide = Mix.byTokenBudget(mixCorpus, "doc_id", "text", "source", budgets,
      buckets = 1024).select("doc_id").as[Long].collect().toSet
    assert(wide == oneWindowExpected(20L))
    intercept[IllegalArgumentException] {
      Mix.byTokenBudget(mixCorpus, "doc_id", "text", "source", budgets,
        buckets = 65537)
    }
    // Duplicate group rows in budgets would silently multiply corpus rows.
    val dup = budgets.union(Seq(("s0", 5L)).toDF("source", "budget"))
    val e = intercept[IllegalArgumentException] {
      Mix.byTokenBudget(mixCorpus, "doc_id", "text", "source", dup)
    }
    assert(e.getMessage.contains("exactly one row"), e.getMessage)
    // A corpus already carrying `budget` (or `rate`) passes through
    // unchanged — the join temporaries are underscore-renamed.
    val withBudget = mixCorpus.withColumn("budget", lit(999L))
    val kept = Mix.byTokenBudget(withBudget, "doc_id", "text", "source", budgets)
    assert(kept.columns.contains("budget"))
    assert(kept.select("budget").distinct().as[Long].collect().toSeq == Seq(999L))
    assert(kept.select("doc_id").as[Long].collect().toSet == oneWindowExpected(20L))
    val withRate = mixCorpus.withColumn("rate", lit(0.25))
    val rates = Seq(("s0", 1.0), ("s1", 1.0), ("s2", 1.0)).toDF("source", "rate")
    val rkept = Mix.bySampleRates(withRate, "doc_id", "source", rates)
    assert(rkept.count() == 60 &&
      rkept.select("rate").distinct().as[Double].collect().toSeq == Seq(0.25))
    // Reserved temporaries are rejected up front, not silently clobbered.
    val clash = intercept[IllegalArgumentException] {
      Mix.byTokenBudget(mixCorpus.withColumn("_mix_h", lit(1)),
        "doc_id", "text", "source", budgets)
    }
    assert(clash.getMessage.contains("collide"), clash.getMessage)
  }

  test("byTokenBudget drops groups missing from the budget table") {
    val budgets = Seq(("s0", 1000L)).toDF("source", "budget")
    val got = Mix.byTokenBudget(mixCorpus, "doc_id", "text", "source", budgets)
    assert(got.select("source").distinct().as[String].collect().toSeq == Seq("s0"))
    // generous budget keeps all 20 of s0's docs
    assert(got.count() == 20)
  }

  test("packSequences: coordinates equal the one-window spelling, spans exact") {
    // Docs of 1..9 tokens; L=7 forces frequent boundary crossings.
    val docs = (1 to 40).map { i =>
      (i.toLong, Seq.fill(1 + (i * 5) % 9)("w").mkString(" "))
    }.toDF("doc_id", "text")
    docs.createOrReplaceTempView("pack_corpus")
    val expected = spark.sql(
      """WITH t AS (SELECT doc_id, size(split(text, ' ')) AS toks,
                     md5(CAST(doc_id AS STRING)) AS h FROM pack_corpus),
         c AS (SELECT doc_id, toks, sum(toks) OVER (ORDER BY h, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM t)
         SELECT doc_id, (cum - toks) div 7 AS seq_id, (cum - toks) % 7 AS seq_off,
                greatest(cum - 1, cum - toks) div 7 - (cum - toks) div 7 + 1 AS n_seqs
         FROM c""")
      .as[(Long, Long, Long, Long)].collect().toSet
    for (buckets <- Seq(1, 4, 256)) {
      val got = Mix.packSequences(docs, "doc_id", "text", 7L, buckets = buckets)
        .select($"doc_id", $"seq_id", $"seq_off", $"n_seqs")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == expected, s"buckets=$buckets")
    }
    // Spans: total tokens and per-doc spans reconcile with L.
    val rows = Mix.packSequences(docs, "doc_id", "text", 7L)
      .select($"seq_off", size(split($"text", " ")).cast("long").as("toks"), $"n_seqs")
      .collect()
    rows.foreach { r =>
      val (off, toks, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(off >= 0 && off < 7)
      assert(n == (off + math.max(toks, 1) - 1) / 7 + 1, s"off=$off toks=$toks n=$n")
    }
  }

  test("narrow and wide cumsum shapes are value-identical (budget fill + packing)") {
    val budgets = Seq(("s0", 20L), ("s1", 20L), ("s2", 20L)).toDF("source", "budget")
    def run(): (Set[(Long, Long)], Set[(Long, Long, Long, Long)]) = (
      Mix.byTokenBudget(mixCorpus, "doc_id", "text", "source", budgets)
        .select($"doc_id", $"cum_tokens").as[(Long, Long)].collect().toSet,
      Mix.packSequences(mixCorpus, "doc_id", "text", 7L)
        .select($"doc_id", $"seq_id", $"seq_off", $"n_seqs")
        .as[(Long, Long, Long, Long)].collect().toSet)
    val key = Mix.NarrowInputBytesKey
    spark.conf.set(key, "1") // everything is "large" → narrow + join-back
    val narrow = try run() finally spark.conf.unset(key)
    spark.conf.set(key, "0") // narrow path disabled → direct wide window
    val wide = try run() finally spark.conf.unset(key)
    assert(narrow == wide && narrow._1.nonEmpty && narrow._2.nonEmpty)
  }

  test("byCountBudget heap and cumsum paths are value-identical") {
    // Caps that cut mid-group, a cap-0 group, and a cap above group size —
    // every branch of the rank-vs-budget filter, proven equal across the
    // bounded-heap path (default: kMax=25 <= 1024) and the bucketed
    // cumsum (heap path disabled via conf).
    val budgets = Seq(("s0", 3L), ("s1", 0L), ("s2", 25L)).toDF("source", "budget")
    def run(): Set[(Long, String, Long)] =
      Mix.byCountBudget(mixCorpus, "doc_id", "source", budgets)
        .select($"doc_id", $"source", $"cum_docs")
        .as[(Long, String, Long)].collect().toSet
    val heap = run()
    spark.conf.set(Mix.HeapCapMaxKKey, "0") // heap path off → cumsum
    val cumsum = try run() finally spark.conf.unset(Mix.HeapCapMaxKKey)
    assert(heap == cumsum && heap.nonEmpty)
    assert(heap.count(_._2 == "s0") == 3 && !heap.exists(_._2 == "s1"))
    // pass-through contract holds on the heap path too
    val cols = Mix.byCountBudget(mixCorpus, "doc_id", "source", budgets).columns
    assert(cols.toSeq == mixCorpus.columns.toSeq :+ "cum_docs")
  }

  test("null keys are excluded from every fill path — no offset shift") {
    // The fill order is a function of the key, so a null key has no
    // position in it. Before the explicit filter, the cumsum path let the
    // null-hash row occupy a sorts-first slot (shifting every real rank)
    // while the heap path's min_by_k ignored it — divergent paths.
    val withNull = mixCorpus.select($"doc_id".cast("long").as("doc_id"),
        $"source", $"text")
      .union(Seq((null.asInstanceOf[java.lang.Long], "s0", "w w w"))
        .toDF("doc_id", "source", "text").select($"doc_id".cast("long"),
          $"source", $"text"))
    val budgets = Seq(("s0", 3L), ("s1", 2L), ("s2", 25L)).toDF("source", "budget")
    def counts(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      Mix.byCountBudget(df, "doc_id", "source", budgets)
        .select($"doc_id", $"cum_docs").as[(Long, Long)].collect().toSet
    val clean = counts(mixCorpus)
    assert(counts(withNull) == clean) // heap path: null row invisible
    spark.conf.set(Mix.HeapCapMaxKKey, "0")
    try assert(counts(withNull) == clean) // cumsum path: same
    finally spark.conf.unset(Mix.HeapCapMaxKKey)
    // token path too (wide + narrow shapes share withCumWeight's filter)
    val tb = Seq(("s0", 20L), ("s1", 20L), ("s2", 20L)).toDF("source", "budget")
    val tokClean = Mix.byTokenBudget(mixCorpus, "doc_id", "text", "source", tb)
      .select($"doc_id", $"cum_tokens").as[(Long, Long)].collect().toSet
    val tokNull = Mix.byTokenBudget(withNull, "doc_id", "text", "source", tb)
      .select($"doc_id", $"cum_tokens").as[(Long, Long)].collect().toSet
    assert(tokNull == tokClean)
  }

  test("packSequences: empty docs occupy a position without consuming tokens") {
    val docs = Seq((1L, ""), (2L, "a b c"), (3L, "")).toDF("doc_id", "text")
    val got = Mix.packSequences(docs, "doc_id", "text", 2L)
      .select($"doc_id", $"n_seqs").as[(Long, Long)].collect().toMap
    // split("", " ") yields one empty token under both engines' token-count
    // convention (len(string_split) — documented in the oracle contract),
    // so "empty" docs weigh 1; all spans are positive either way.
    assert(got.values.forall(_ >= 1))
    assert(got.keySet == Set(1L, 2L, 3L))
  }

  test("emitPackedSequences: full sequences of L, docs split across boundaries") {
    val docs = (1 to 30).map { i =>
      (i.toLong, (1 to (1 + (i * 5) % 9)).map(j => s"d${i}t$j").mkString(" "))
    }.toDF("doc_id", "text")
    val L = 7L
    val seqs = Mix.emitPackedSequences(docs, "doc_id", "text", L)
      .orderBy("seq_id")
      .select($"seq_id", $"n_tokens", $"text")
      .as[(Long, Long, String)].collect()
    val total = docs.select(sum(size(split($"text", " ")))).as[Long].head()
    assert(seqs.map(_._2).sum == total)
    assert(seqs.map(_._1).toSeq == seqs.indices.map(_.toLong)) // dense 0..n-1
    seqs.dropRight(1).foreach { case (id, n, t) =>
      assert(n == L && t.split(" ", -1).length == L, s"seq $id")
    }
    assert(seqs.last._2 <= L)
    // The concatenated stream reassembles exactly: joining all sequences
    // equals joining all docs in (md5(doc_id), doc_id) order.
    val stream = seqs.map(_._3).mkString(" ")
    val docOrder = docs
      .orderBy(md5($"doc_id".cast("string")), $"doc_id")
      .select($"text").as[String].collect().mkString(" ")
    assert(stream == docOrder)
    // Coordinates agree with packSequences: each doc's first token sits at
    // (seq_id, seq_off) in the emitted layout.
    val coords = Mix.packSequences(docs, "doc_id", "text", L)
      .select($"doc_id", $"seq_id", $"seq_off").as[(Long, Long, Long)].collect()
    val byId = seqs.map(s => s._1 -> s._3.split(" ", -1)).toMap
    coords.foreach { case (doc, sid, off) =>
      assert(byId(sid)(off.toInt) == s"d${doc}t1", s"doc $doc at ($sid,$off)")
    }
  }

  test("SQL surface: emit_packed_sequences TVF matches the API") {
    val docs = (1 to 12).map(i => (i.toLong, s"a$i b$i c$i")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("emit_tvf_corpus")
    val viaTvf = spark.sql(
      """SELECT seq_id, n_tokens, text
         FROM emit_packed_sequences(TABLE(emit_tvf_corpus), 'doc_id', 'text', 5)""")
      .as[(Long, Long, String)].collect().toSet
    val viaApi = Mix.emitPackedSequences(docs, "doc_id", "text", 5L)
      .select($"seq_id", $"n_tokens", $"text")
      .as[(Long, Long, String)].collect().toSet
    assert(viaTvf == viaApi && viaTvf.nonEmpty)
  }

  test("packSequences guards: bad seqLen, reserved columns") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Mix.packSequences(docs, "doc_id", "text", 0L)
    }
    intercept[IllegalArgumentException] {
      Mix.packSequences(docs.withColumn("seq_id", lit(1)), "doc_id", "text", 4L)
    }
    intercept[IllegalArgumentException] {
      Mix.packSequences(docs.withColumn("_mix_h", lit(1)), "doc_id", "text", 4L)
    }
  }

  test("SQL surface: pack_sequences TVF") {
    val docs = (1 to 10).map(i => (i.toLong, "a b c")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("pack_tvf_corpus")
    val viaTvf = spark.sql(
      """SELECT doc_id, seq_id, seq_off, n_seqs
         FROM pack_sequences(TABLE(pack_tvf_corpus), 'doc_id', 'text', 4)""")
      .as[(Long, Long, Long, Long)].collect().toSet
    val viaApi = Mix.packSequences(docs, "doc_id", "text", 4L)
      .select($"doc_id", $"seq_id", $"seq_off", $"n_seqs")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(viaTvf == viaApi && viaTvf.nonEmpty)
  }

  test("bySampleRates: per-group rates, consistent with the global sampler") {
    val rates = Seq(("s0", 1.0), ("s1", 0.0), ("s2", 0.5)).toDF("source", "rate")
    val kept = Mix.bySampleRates(mixCorpus, "doc_id", "source", rates)
      .select($"doc_id", $"source").as[(Long, String)].collect()
    val bySrc = kept.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(bySrc.getOrElse("s0", Set.empty).size == 20) // rate 1.0 keeps all
    assert(!bySrc.contains("s1"))                        // rate 0.0 drops all
    // rate-0.5 membership == the GLOBAL deterministic sampler at 0.5
    // restricted to that group (same hash, same threshold — the property
    // that makes per-group rates composable with global splits)
    val globalHalf = TF.deterministicSample(mixCorpus, "doc_id", 0.5)
      .where($"source" === "s2").select("doc_id").as[Long].collect().toSet
    assert(bySrc.getOrElse("s2", Set.empty) == globalHalf)
  }

  test("assignSplit: n-way deterministic, consistent with the sampler") {
    val df = spark.range(2000).select($"id")
    val splits = df.select($"id",
      TF.assignSplit($"id", Seq("train" -> 0.5, "val" -> 0.25)).as("s"))
      .as[(Long, Option[String])].collect()
    val byLabel = splits.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    // rough proportions (hash-uniform over 2000 keys)
    assert(byLabel(Some("train")).size > 800 && byLabel(Some("train")).size < 1200)
    assert(byLabel(Some("val")).size > 350 && byLabel(Some("val")).size < 650)
    assert(byLabel(None).size > 350) // unlabeled remainder
    // consistency: the 'train' split IS deterministicSample at 0.5
    val half = TF.deterministicSample(df, "id", 0.5).as[Long].collect().toSet
    assert(byLabel(Some("train")) == half)
    // nesting: train ∪ val == the 0.75 sample
    val threeQ = TF.deterministicSample(df, "id", 0.75).as[Long].collect().toSet
    assert(byLabel(Some("train")) ++ byLabel(Some("val")) == threeQ)
  }

  test("stopword filter: distinct-set semantics, Gopher default list") {
    val df = Seq(
      (1L, "the cat and the dog have fun"), // the, and, have -> 3 distinct
      (2L, "the the the the"),              // 'the' once distinct -> 1
      (3L, "no common words here")).toDF("doc_id", "text")
    val n = df.select(TF.distinctWordsPresent($"text", TF.GopherStopwords))
      .as[Int].collect().toSeq
    assert(n == Seq(3, 1, 0))
    val kept = TF.filterByStopwords(df, "text", minDistinct = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }

  test("urlHost kernel matches the regex spelling on adversarial strings") {
    // Same device as the PII kernel: the regex is the SPEC, the byte
    // kernel is property-tested against it through Spark's own
    // regexp_extract + lower path (exercising codegen on both sides).
    val rnd = new scala.util.Random(7)
    val alphabet = "htps:/?#.abZ09-%é中 "
    val cases = Seq("", "h", "http://", "https://", "http://a",
      "https://A.B.c/x", "HTTP://x.y", "httpss://x", "http:/x",
      "https://:80", "https://#f", "https://?q", "http:///x",
      "http://éXample.ORG/p", "https://host", "httpx://y") ++
      (1 to 3000).map(_ => (0 until rnd.nextInt(24))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val rows = cases.toDF("u")
      .select(TF.extractDomain($"u").as("k"), TF.extractDomainRegex($"u").as("r"))
      .collect()
    rows.zip(cases).foreach { case (r, c) =>
      assert(r.getString(0) == r.getString(1),
        s"input '$c': kernel='${r.getString(0)}' regex='${r.getString(1)}'")
    }
  }

  test("extractDomain + blocklist filter") {
    val df = Seq(
      (1L, "https://News.Example.org/a?q=1"),
      (2L, "http://blocked.net/x"),
      (3L, "ftp://not-http.org/y"),
      (4L, "https://sub.keep.io:8080/z")).toDF("id", "url")
    val doms = df.select(TF.extractDomain($"url")).as[String].collect().toSeq
    assert(doms == Seq("news.example.org", "blocked.net", "", "sub.keep.io"))
    val bl = Seq("blocked.net").toDF("domain")
    val kept = TF.filterByDomainBlocklist(df, "url", bl)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L))
    df.createOrReplaceTempView("url_sql_t")
    assert(spark.sql("SELECT extract_domain(url) FROM url_sql_t WHERE id = 4")
      .as[String].head() == "sub.keep.io")
  }

  // --- topNgrams -----------------------------------------------------------

  test("topNgrams counts sliding bigrams with a deterministic tiebreak") {
    val df = Seq(
      "a b a b c", // bigrams: "a b","b a","a b","b c"
      "a b",       // "a b"
      "z",         // too short → none
      null.asInstanceOf[String]).toDF("text")
    val got = TF.topNgrams(df, "text", n = 2, k = 3)
      .as[(String, Long)].collect().toSeq
    // "b a" < "b c" — the count tie at 1 breaks on the gram itself
    assert(got == Seq(("a b", 3L), ("b a", 1L), ("b c", 1L)))
  }

  test("SQL surface: redact_pii / pii_stats / top_ngrams / sample_by_budget") {
    Seq((1L, "s0", "mail me a@b.io now please")).toDF("doc_id", "source", "text")
      .createOrReplaceTempView("pii_sql_t")
    assert(spark.sql("SELECT redact_pii(text) FROM pii_sql_t").as[String].head()
      == "mail me <EMAIL> now please")
    assert(spark.sql("SELECT pii_stats(text).n_emails FROM pii_sql_t")
      .as[Long].head() == 1L)

    Seq("a b a", "a b").toDF("text").createOrReplaceTempView("ng_sql_t")
    val grams = spark.sql(
      "SELECT * FROM top_ngrams(TABLE(ng_sql_t), 'text', 2, 10)")
      .as[(String, Long)].collect().toSeq
    assert(grams == Seq(("a b", 2L), ("b a", 1L)))

    mixCorpus.createOrReplaceTempView("mix_sql_t")
    Seq(("s0", 20L), ("s1", 20L), ("s2", 20L)).toDF("source", "budget")
      .createOrReplaceTempView("mix_sql_b")
    val got = spark.sql(
      """SELECT doc_id FROM sample_by_budget(TABLE(mix_sql_t), TABLE(mix_sql_b),
                                             'doc_id', 'text', 'source')""")
      .as[Long].collect().toSet
    assert(got == oneWindowExpected(20L))
  }

  test("dropExactDuplicates keeps the smallest id; nulls pass through") {
    val df = Seq((5L, "x"), (2L, "x"), (3L, "y"),
      (4L, null.asInstanceOf[String]), (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val kept = graft.text.Dedup.dropExactDuplicates(df, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L, 4L, 6L))
    df.createOrReplaceTempView("dde_sql_t")
    val viaSql = spark.sql(
      "SELECT doc_id FROM dedup_drop_exact(TABLE(dde_sql_t), 'text', 'doc_id')")
      .as[Long].collect().toSet
    assert(viaSql == kept)
  }

  test("SQL surface: sample_by_rates / cap_by_count") {
    mixCorpus.createOrReplaceTempView("mix_tvf_t")
    Seq(("s0", 1.0), ("s1", 0.0), ("s2", 0.5)).toDF("source", "rate")
      .createOrReplaceTempView("mix_tvf_rates")
    val rated = spark.sql(
      """SELECT source, count(*) AS n
         FROM sample_by_rates(TABLE(mix_tvf_t), TABLE(mix_tvf_rates),
                              'doc_id', 'source')
         GROUP BY source""").as[(String, Long)].collect().toMap
    assert(rated("s0") == 20L && !rated.contains("s1"))

    Seq(("s0", 5L), ("s1", 3L), ("s2", 100L)).toDF("source", "budget")
      .createOrReplaceTempView("mix_tvf_caps")
    val capped = spark.sql(
      """SELECT source, count(*) AS n, max(cum_docs) AS mx
         FROM cap_by_count(TABLE(mix_tvf_t), TABLE(mix_tvf_caps),
                           'doc_id', 'source')
         GROUP BY source""").as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(capped("s0") == ((5L, 5L)))
    assert(capped("s1") == ((3L, 3L)))
    assert(capped("s2") == ((20L, 20L)))
  }

  test("dropRepeatedChunks: first occurrence wins, docs rebuilt in order") {
    val df = Seq(
      (1L, "a b c d"),      // chunks (size 2): "a b", "c d"
      (2L, "a b x y"),      // "a b" repeated -> rebuilt "x y"
      (3L, "c d a b")       // both repeated -> doc vanishes
    ).toDF("doc_id", "text")
    val got = graft.text.Dedup.dropRepeatedChunks(df, "text", "doc_id", size = 2)
      .orderBy("doc_id")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "a b c d", 2L), (2L, "x y", 1L)))
  }

  test("tokenFrequencyStats: corpus-relative counts, hand-checked") {
    // corpus: "a a b" (doc 1), "a c" (doc 2) → counts: a=3, b=1, c=1
    val df = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = TF.tokenFrequencyStats(df, "text", "doc_id")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // doc 1: 3 tokens, freq_sum 3+3+1=7, min 1; doc 2: 2 tokens, 3+1=4, min 1
    assert(got == Seq((1L, 3L, 7L, 1L), (2L, 2L, 4L, 1L)))
    df.createOrReplaceTempView("tf_sql_t")
    val viaSql = spark.sql(
      "SELECT * FROM token_freq(TABLE(tf_sql_t), 'text', 'doc_id') ORDER BY doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(viaSql == got)
  }

  test("tokenFrequencyStats fused-kernel and shuffle-join paths agree") {
    // The small-corpus plan scores docs in one fused pass against a
    // collected hash-keyed vocabulary; BroadcastVocabBytesKey=0 forces
    // the adaptive token-keyed join plan. Same rows either way —
    // including empty-segment tokens (split on ' ' keeps empties).
    val df = Seq((1L, "a  a b"), (2L, ""), (3L, "a c")).toDF("doc_id", "text")
    def run(): Seq[(Long, Long, Long, Long)] =
      TF.tokenFrequencyStats(df, "text", "doc_id").orderBy("doc_id")
        .as[(Long, Long, Long, Long)].collect().toSeq
    val fused = run()
    spark.conf.set("spark.graft.text.broadcastVocabBytes", "0")
    val joined = try run()
    finally spark.conf.unset("spark.graft.text.broadcastVocabBytes")
    assert(fused == joined)
    // tokens of doc 1: "a","","a","b" → counts: a=3, ""=2, b=1, c=1
    // (doc 2 is the empty string = one "" token)
    assert(fused == Seq((1L, 4L, 9L, 1L), (2L, 1L, 2L, 2L), (3L, 2L, 4L, 1L)))
  }

  test("topNgrams trigram windows drop short tails") {
    val df = Seq("p q r s").toDF("text") // trigrams: "p q r", "q r s"
    val got = TF.topNgrams(df, "text", n = 3, k = 10)
      .as[(String, Long)].collect().toSet
    assert(got == Set(("p q r", 1L), ("q r s", 1L)))
  }
}
