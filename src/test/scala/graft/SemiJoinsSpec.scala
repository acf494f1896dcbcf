package graft

import org.apache.spark.sql.functions._

import graft.ops.SemiJoins

/** Bitmap EXISTS / NOT EXISTS vs Spark's own semi/anti joins: both paths
  * must be value-identical on every key shape. */
class SemiJoinsSpec extends SparkSuite {
  import spark.implicits._

  // Kept side: keys 10..59 plus nulls and a duplicate; probe side: dense
  // hits, repeats, out-of-domain keys (below lo, above hi), and nulls.
  private def leftDf = ((10L to 59L).map(k => (Some(k), s"l$k")) ++
    Seq((None: Option[Long], "lnull1"), (None, "lnull2"), (Some(25L), "ldup")))
    .toDF("k", "tag")
  private def rightDf = (Seq(12L, 12L, 25L, 40L, 59L, 5L, 999L, -3L)
    .map(Some(_)) ++ Seq(None: Option[Long]))
    .toDF("rk")

  private def tags(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select("tag").collect().map(_.getString(0)).sorted.toSeq

  private def sparkSemi(anti: Boolean): Seq[String] =
    tags(leftDf.join(rightDf, col("k") === col("rk"),
      if (anti) "left_anti" else "left_semi"))

  test("bitmap path matches Spark semi/anti joins (nulls, dups, out-of-domain)") {
    assert(tags(SemiJoins.exists(leftDf, "k", rightDf, "rk")) == sparkSemi(false))
    assert(tags(SemiJoins.notExists(leftDf, "k", rightDf, "rk")) == sparkSemi(true))
    // Sanity on the shape itself: 12/25/40/59 hit (25 twice via the dup row).
    assert(tags(SemiJoins.exists(leftDf, "k", rightDf, "rk")) ==
      Seq("l12", "l25", "l40", "l59", "ldup"))
  }

  test("fallback path (bitmap disabled) is identical") {
    spark.conf.set(SemiJoins.MaxBitmapBitsKey, "0")
    try {
      assert(tags(SemiJoins.exists(leftDf, "k", rightDf, "rk")) == sparkSemi(false))
      assert(tags(SemiJoins.notExists(leftDf, "k", rightDf, "rk")) == sparkSemi(true))
    } finally spark.conf.unset(SemiJoins.MaxBitmapBitsKey)
  }

  test("scattered keys take the bitmap path via containers; cap overflow falls back") {
    // Two keys 2^40 apart = two occupied 64Ki containers — the containered
    // bitmap handles what a flat span bitmap never could.
    val sparseLeft = Seq((Some(1L), "a"), (Some(1L << 40), "b"), (None: Option[Long], "c"))
      .toDF("k", "tag")
    val probe = Seq(1L, 99L).map(Some(_)).toDF("rk")
    assert(tags(SemiJoins.exists(sparseLeft, "k", probe, "rk")) == Seq("a"))
    assert(tags(SemiJoins.notExists(sparseLeft, "k", probe, "rk")) == Seq("b", "c"))
    // Cap = one container < the two occupied: the fallback must produce
    // the identical result.
    spark.conf.set(SemiJoins.MaxBitmapBitsKey, "65536")
    try {
      assert(tags(SemiJoins.exists(sparseLeft, "k", probe, "rk")) == Seq("a"))
      assert(tags(SemiJoins.notExists(sparseLeft, "k", probe, "rk")) == Seq("b", "c"))
    } finally spark.conf.unset(SemiJoins.MaxBitmapBitsKey)
  }

  test("negative keys (arithmetic container shift on both sides)") {
    val l = Seq((Some(-70000L), "n1"), (Some(-1L), "n2"), (Some(3L), "p"))
      .toDF("k", "tag")
    val r = Seq(-70000L, -1L, 5L).map(Some(_)).toDF("rk")
    assert(tags(SemiJoins.exists(l, "k", r, "rk")) == Seq("n1", "n2"))
    assert(tags(SemiJoins.notExists(l, "k", r, "rk")) == Seq("p"))
  }

  test("degenerate kept sides: empty and all-null keys") {
    val empty = Seq.empty[(Option[Long], String)].toDF("k", "tag")
    assert(SemiJoins.exists(empty, "k", rightDf, "rk").count() == 0)
    assert(SemiJoins.notExists(empty, "k", rightDf, "rk").count() == 0)
    val allNull = Seq((None: Option[Long], "x"), (None, "y")).toDF("k", "tag")
    assert(SemiJoins.exists(allNull, "k", rightDf, "rk").count() == 0)
    assert(tags(SemiJoins.notExists(allNull, "k", rightDf, "rk")) == Seq("x", "y"))
  }

  test("empty probe side: exists drops everything, notExists keeps everything") {
    val noProbe = Seq.empty[Option[Long]].toDF("rk")
    assert(SemiJoins.exists(leftDf, "k", noProbe, "rk").count() == 0)
    assert(SemiJoins.notExists(leftDf, "k", noProbe, "rk").count() == leftDf.count())
  }

  test("exists_join / not_exists_join SQL TVF surface") {
    leftDf.createOrReplaceTempView("sj_tvf_l")
    rightDf.createOrReplaceTempView("sj_tvf_r")
    val ex = spark.sql(
      "SELECT tag FROM exists_join(TABLE(sj_tvf_l), TABLE(sj_tvf_r), 'k', 'rk') ORDER BY tag")
      .collect().map(_.getString(0)).toSeq
    assert(ex == Seq("l12", "l25", "l40", "l59", "ldup"))
    val nex = spark.sql(
      """SELECT count(*) AS n
         FROM not_exists_join(TABLE(sj_tvf_l), TABLE(sj_tvf_r), 'k', 'rk')""")
      .collect().head.getLong(0)
    assert(nex == leftDf.count() - 5)
  }

  test("non-integral key types keep native equality (no lossy LONG cast)") {
    // double 1.5 must NOT match probe 1; string '012' must NOT match '12';
    // uncastable strings must not vanish. The bitmap path's LONG cast would
    // get all three wrong — these types must route to the fallback.
    val dl = Seq((Some(1.5), "half"), (Some(1.0), "one"), (None: Option[Double], "dn"))
      .toDF("k", "tag")
    val dr = Seq(Some(1.0), None: Option[Double]).toDF("rk")
    assert(tags(SemiJoins.exists(dl, "k", dr, "rk")) == Seq("one"))
    assert(tags(SemiJoins.notExists(dl, "k", dr, "rk")) == Seq("dn", "half"))
    val sl = Seq(("012", "zeroTwelve"), ("12", "twelve"), ("abc", "alpha"))
      .toDF("k", "tag")
    val sr = Seq("12", "abc").toDF("rk")
    assert(tags(SemiJoins.exists(sl, "k", sr, "rk")) == Seq("alpha", "twelve"))
    assert(tags(SemiJoins.notExists(sl, "k", sr, "rk")) == Seq("zeroTwelve"))
  }

  test("same-named keys resolve on both paths (fallback alias)") {
    val l = Seq((Some(1L), "a"), (Some(2L), "b")).toDF("k", "tag")
    val r = Seq(Some(1L)).toDF("k")
    assert(tags(SemiJoins.exists(l, "k", r, "k")) == Seq("a"))
    // Force the fallback (the crash the alias fix prevents).
    spark.conf.set(SemiJoins.MaxBitmapBitsKey, "0")
    try {
      assert(tags(SemiJoins.exists(l, "k", r, "k")) == Seq("a"))
      assert(tags(SemiJoins.notExists(l, "k", r, "k")) == Seq("b"))
    } finally spark.conf.unset(SemiJoins.MaxBitmapBitsKey)
    // A string-keyed same-name spelling always lands on the fallback.
    val sl = Seq(("x", "sx"), ("y", "sy")).toDF("k", "tag")
    val sr = Seq("x").toDF("k")
    assert(tags(SemiJoins.exists(sl, "k", sr, "k")) == Seq("sx"))
  }

  test("conf raised to the container ceiling stays correct (fan-in cap path)") {
    // 2^31 bits = 2^15 containers — the ceiling where bmSize alone is
    // 256 MB; groups must scale down so groups × bmSize ≤ 256 MB. On the
    // small fixture only correctness is observable; the cap formula is
    // exercised on this path.
    spark.conf.set(SemiJoins.MaxBitmapBitsKey, (1L << 31).toString)
    try {
      assert(tags(SemiJoins.exists(leftDf, "k", rightDf, "rk")) == sparkSemi(false))
      assert(tags(SemiJoins.notExists(leftDf, "k", rightDf, "rk")) == sparkSemi(true))
    } finally spark.conf.unset(SemiJoins.MaxBitmapBitsKey)
  }

  test("compact kept side + scattered probe lands on the kept-domain retry, exactly") {
    // Kept keys in 2 containers; probe keys scattered over ~60 containers
    // (2^20 apart). Cap = 4 containers: the speculative build overflows,
    // the retry discovers the kept domain and serves it — results must
    // match Spark's joins exactly, including the out-of-domain probes.
    val l = (Seq(1L, 2L, 70000L).map(Some(_)) ++ Seq(None: Option[Long]))
      .zipWithIndex.map { case (k, i) => (k, s"k$i") }.toDF("k", "tag")
    val r = ((0 until 60).map(i => i.toLong << 20) ++ Seq(2L, 70000L))
      .map(Some(_)).toDF("rk")
    spark.conf.set(SemiJoins.MaxBitmapBitsKey, (4L << 16).toString)
    try {
      val ex = tags(SemiJoins.exists(l, "k", r, "rk"))
      val exSpark = tags(l.join(r, col("k") === col("rk"), "left_semi"))
      assert(ex == exSpark && ex == Seq("k1", "k2"))
      assert(tags(SemiJoins.notExists(l, "k", r, "rk")) ==
        tags(l.join(r, col("k") === col("rk"), "left_anti")))
    } finally spark.conf.unset(SemiJoins.MaxBitmapBitsKey)
  }

  test("SparseBitmap: a past-cap reducer merge poisons in overflow-intolerant mode") {
    import graft.aggregates.SparseBitmap
    // Two partials, each within the cap (2), whose union has 3 containers:
    // the merged buffer must poison (the sorted-layout regime where no
    // single task overflows).
    val a = new SparseBitmap(2)
    Seq(1L, 1L << 20).foreach(a.add(_, strayTolerant = false))
    val b = new SparseBitmap(2)
    Seq(1L << 40).foreach(b.add(_, strayTolerant = false))
    assert(!a.isOverflowed && !b.isOverflowed)
    a.merge(b, strayTolerant = false)
    assert(a.isOverflowed)
    // Stray-tolerant (distinct-count) mode accepts the same merge exactly.
    val c = new SparseBitmap(2)
    Seq(1L, 1L << 20).foreach(c.add(_, strayTolerant = true))
    val d = new SparseBitmap(2)
    Seq(1L << 40).foreach(d.add(_, strayTolerant = true))
    c.merge(d, strayTolerant = true)
    assert(!c.isOverflowed && c.distinctCount == 3)
  }

  test("case-insensitive key resolution reaches the bitmap path") {
    val l = Seq((Some(1L), "a"), (Some(9L), "b")).toDF("k", "tag")
    val r = Seq(Some(1L)).toDF("rk")
    assert(tags(SemiJoins.exists(l, "K", r, "RK")) == Seq("a"))
    assert(tags(SemiJoins.notExists(l, "K", r, "RK")) == Seq("b"))
  }

  test("randomized equivalence across both paths") {
    val rnd = new scala.util.Random(42)
    val l = (1 to 500).map(_ => (Some(rnd.nextInt(200).toLong - 100), "t"))
      .zipWithIndex.map { case ((k, _), i) => (k, s"t$i") }.toDF("k", "tag")
    val r = (1 to 800).map(_ => Some(rnd.nextInt(400).toLong - 200)).toDF("rk")
    val viaBitmap = tags(SemiJoins.exists(l, "k", r, "rk"))
    val viaSpark = tags(l.join(r, col("k") === col("rk"), "left_semi"))
    assert(viaBitmap == viaSpark)
    val antiBitmap = tags(SemiJoins.notExists(l, "k", r, "rk"))
    val antiSpark = tags(l.join(r, col("k") === col("rk"), "left_anti"))
    assert(antiBitmap == antiSpark)
  }
}
