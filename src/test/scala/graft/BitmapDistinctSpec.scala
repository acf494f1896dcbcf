package graft

import org.apache.spark.sql.functions._

import graft.aggregates.SparseBitmap
import graft.functions.bitmap_count_distinct

/** [[graft.aggregates.BitmapDistinctAgg]] — exact COUNT(DISTINCT) over the
  * self-discovering containered bitmap — against Spark's own countDistinct
  * on every key shape, plus unit coverage of the SparseBitmap buffer. */
class BitmapDistinctSpec extends SparkSuite {
  import spark.implicits._

  test("matches countDistinct: grouped, with nulls and duplicates") {
    val df = Seq(
      ("a", Some(1L)), ("a", Some(1L)), ("a", Some(2L)), ("a", None),
      ("b", Some(0L)), ("b", Some(-1L)), ("b", Some(0L)),
      ("c", None), ("c", None)).toDF("g", "k")
    val got = df.groupBy("g").agg(bitmap_count_distinct(col("k")).as("n"))
      .orderBy("g").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 2L), ("b", 2L), ("c", 0L)))
  }

  test("randomized equivalence incl. negative and container-scattered keys") {
    val rnd = new scala.util.Random(7)
    // Three regimes mixed: dense small ints, block-allocated (replica
    // offsets), and scattered 2^40-spaced keys.
    val keys = (1 to 5000).map { _ =>
      rnd.nextInt(3) match {
        case 0 => rnd.nextInt(1000).toLong - 500
        case 1 => rnd.nextInt(5).toLong * 100000000L + rnd.nextInt(2000)
        case 2 => rnd.nextInt(200).toLong << 40
      }
    }
    val df = keys.zipWithIndex.map { case (k, i) => (s"g${i % 4}", k) }.toDF("g", "k")
    val exp = df.groupBy("g").agg(countDistinct(col("k")).as("n"))
      .orderBy("g").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = df.groupBy("g").agg(bitmap_count_distinct(col("k")).as("n"))
      .orderBy("g").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == exp)
  }

  test("global aggregate (no grouping) and multiple distinct columns in one agg") {
    val df = (1 to 2000).map(i => (i.toLong % 97, i.toLong % 13)).toDF("a", "b")
    val r = df.agg(bitmap_count_distinct(col("a")).as("na"),
      bitmap_count_distinct(col("b")).as("nb"), count(lit(1)).as("n")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (97L, 13L, 2000L))
  }

  test("SparseBitmap: cap overflow degrades to exact strays; merge double-cover stays exact") {
    // cap=2: third container's keys go stray.
    val a = new SparseBitmap(2)
    Seq(1L, 2L, 1L << 20, (1L << 30) + 5, (1L << 30) + 5, (1L << 40))
      .foreach(a.add(_, strayTolerant = true))
    assert(a.distinctCount == 5)
    // Partial B holds (1<<30)+5 as a BIT (room under its own cap): after
    // merge the same key is both a stray (from A) and a bit (from B) —
    // counted once.
    val b = new SparseBitmap(2)
    Seq((1L << 30) + 5, (1L << 30) + 6).foreach(b.add(_, strayTolerant = true))
    a.merge(b, strayTolerant = true)
    assert(a.distinctCount == 6)
  }

  test("SparseBitmap: serialization round-trips blocks, strays, and overflow flag") {
    val a = new SparseBitmap(2)
    Seq(7L, -70000L, 1L << 33).foreach(a.add(_, strayTolerant = true))
    val back = SparseBitmap.deserialize(a.serialize, 2)
    assert(back.distinctCount == a.distinctCount)
    val o = new SparseBitmap(1)
    o.add(1L, strayTolerant = false)
    o.add(1L << 33, strayTolerant = false) // second container -> poisoned
    val ob = SparseBitmap.deserialize(o.serialize, 1)
    assert(ob.isOverflowed)
    // Overflow propagates through merge in either direction.
    val clean = new SparseBitmap(4)
    clean.add(5L, strayTolerant = false)
    clean.merge(ob, strayTolerant = false)
    assert(clean.isOverflowed)
  }

  test("SparseBitmap: past-cap merges demote sparse blocks; dense blocks survive") {
    // Two partials with DISJOINT one-key-per-container domains (the
    // scattered regime the r12 merge grew unboundedly on): after a
    // past-cap merge the container count is back under the cap and the
    // count is exact via the stray path.
    val cap = 4
    val a = new SparseBitmap(cap)
    (0 until 4).foreach(i => a.add(i.toLong << 20, strayTolerant = true))
    val b = new SparseBitmap(cap)
    (4 until 8).foreach(i => b.add(i.toLong << 20, strayTolerant = true))
    a.merge(b, strayTolerant = true)
    assert(a.containerCount <= cap)
    assert(a.distinctCount == 8)
    // Dense blocks (popcount >= 512, the break-even) are never demoted:
    // three dense containers stay three blocks past a cap of two.
    val d = new SparseBitmap(2)
    (0 until 600).foreach(i => d.add(i.toLong, strayTolerant = true))
    (0 until 600).foreach(i => d.add((1L << 20) + i, strayTolerant = true))
    val e = new SparseBitmap(2)
    (0 until 600).foreach(i => e.add((1L << 30) + i, strayTolerant = true))
    d.merge(e, strayTolerant = true)
    assert(d.containerCount == 3)
    assert(d.distinctCount == 1800)
  }

  test("SparseBitmap: demotion is value-identical and shrinks scattered partials on the wire") {
    val rnd = new scala.util.Random(11)
    val keys = (1 to 3000).map(_ => rnd.nextLong()).distinct
    val a = new SparseBitmap(64)
    keys.foreach(a.add(_, strayTolerant = true))
    val before = a.distinctCount
    a.demoteSparse()
    // Random 64-bit keys essentially never share a container: every block
    // is below break-even, so all demote and the buffer is pure strays.
    assert(a.containerCount == 0)
    assert(a.distinctCount == before)
    val wire = a.serialize
    assert(SparseBitmap.deserialize(wire, 64).distinctCount == before)
    // ~16 B/key territory, not 64 containers x 8 KiB.
    assert(wire.length < keys.size * 24,
      s"scattered partial serialized to ${wire.length} bytes")
    // Negative-key containers reconstruct exactly through demotion.
    val neg = new SparseBitmap(4)
    val negKeys = Seq(-1L, -65536L, Long.MinValue, -(1L << 40) - 7)
    negKeys.foreach(neg.add(_, strayTolerant = true))
    neg.demoteSparse()
    assert(neg.distinctCount == negKeys.size)
  }

  test("SparseBitmap: toDense matches BitmapContains' layout") {
    val a = new SparseBitmap(8)
    val keys = Seq(0L, 1L, 65535L, 65536L, (1L << 40) + 123, -5L)
    keys.foreach(a.add(_, strayTolerant = false))
    val (cs, bytes) = a.toDense
    val arr = cs.toArray
    keys.foreach { k =>
      assert(graft.aggregates.BitmapKernel.contains(bytes, k, arr), s"key $k")
    }
    Seq(2L, 65537L, 1L << 41, -6L).foreach { k =>
      assert(!graft.aggregates.BitmapKernel.contains(bytes, k, arr), s"non-key $k")
    }
  }
}
