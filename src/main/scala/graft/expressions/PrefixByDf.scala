package graft.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * prefix_by_df(shingles) -> ARRAY<STRUCT<g: STRING, rn: INT>> — the per-doc
 * prefix-filter stage of the exact Jaccard join (Chaudhuri et al. SSJoin),
 * fused into one expression so it costs ZERO shuffles: grams are ranked
 * rarest-first against a broadcast map of global document frequencies (only
 * grams with df > 1 are in the map — absence means df = 1 exactly, which
 * keeps the map proportional to the repeated-gram vocabulary, not the
 * corpus), and the first `sz - ceil(sz * num/denom) + 1` grams of the
 * (df, gram) order are returned with their 1-based ranks.
 *
 * The broadcast map is the small-vocabulary fast path; when the repeated
 * vocabulary exceeds the driver cap, [[graft.text.Dedup.ngramJaccardPairs]]
 * falls back to an equivalent join + groupBy derivation (same (df, gram)
 * order, so the two paths are interchangeable mid-corpus only in whole —
 * one path is chosen per query).
 *
 * Evaluated once per document (not per gram) above an explode, so
 * interpreted eval is off the per-row hot path; the per-doc work is one
 * hash lookup per gram plus an O(sz log sz) sort of at most a few hundred
 * entries.
 */
case class PrefixByDf(child: Expression,
    dfMap: Broadcast[java.util.HashMap[UTF8String, java.lang.Long]],
    num: Long, denom: Long)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(num > 0 && num <= denom, "threshold rational must be in (0, 1]")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override val dataType: DataType = ArrayType(
    StructType(Seq(StructField("g", StringType, nullable = true),
      StructField("rn", IntegerType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val sh = v.asInstanceOf[ArrayData]
    val n = sh.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val map = dfMap.value
    val grams = new Array[UTF8String](n)
    val dfs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val g = if (sh.isNullAt(i)) null else sh.getUTF8String(i)
      grams(i) = g
      val d = if (g == null) null else map.get(g)
      dfs(i) = if (d == null) 1L else d.longValue()
      i += 1
    }
    val idx = new Array[Integer](n)
    i = 0
    while (i < n) { idx(i) = i; i += 1 }
    java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val c = java.lang.Long.compare(dfs(a), dfs(b))
        if (c != 0) c
        else {
          val (ga, gb) = (grams(a), grams(b))
          if (ga == null && gb == null) 0
          else if (ga == null) -1 // nulls-first, matching sort_array asc
          else if (gb == null) 1
          // binaryCompare: compareTo re-reads SPARK_TESTING from the
          // process env per call (see TextHash.Utf8Cmp); binary order is
          // the default-collation order sort_array uses.
          else ga.binaryCompare(gb)
        }
      }
    })
    // prefix length: sz - ceil(sz * num / denom) + 1, exact long arithmetic
    val L = (n - ((n.toLong * num + denom - 1) / denom) + 1).toInt
    val out = new Array[Any](math.max(L, 0))
    var j = 0
    while (j < L) {
      out(j) = InternalRow(grams(idx(j)), j + 1)
      j += 1
    }
    new GenericArrayData(out)
  }

  override def prettyName: String = "prefix_by_df"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** [[PrefixByDf]] over 64-bit gram HASHES: same rarest-first prefix, but
  * grams are [[TextHash.wordShingleHashesSorted]] longs and the frequency
  * table is two broadcast sorted parallel arrays (hash → df, binary
  * search — no boxed map). Prefix filtering is exact under ANY fixed
  * total gram order; (df, hash) is one. The long spelling exists because
  * the string posting/prefix/verify pipeline held UTF8String-heavy
  * structures that OOM'd a 60x corpus where the long pipeline is ~3x
  * smaller end to end. */
case class PrefixByDfLongs(child: Expression,
    keys: Broadcast[Array[Long]], dfs: Broadcast[Array[Long]],
    num: Long, denom: Long)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(num > 0 && num <= denom, "threshold rational must be in (0, 1]")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override val dataType: DataType = ArrayType(
    StructType(Seq(StructField("g", LongType, nullable = false),
      StructField("rn", IntegerType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val sh = v.asInstanceOf[ArrayData]
    val n = sh.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val ks = keys.value
    val ds = dfs.value
    // pack (df, gram) into sortable pairs; sort by df then gram
    val pairs = new Array[Array[Long]](n)
    var i = 0
    while (i < n) {
      val g = sh.getLong(i)
      val idx = java.util.Arrays.binarySearch(ks, g)
      pairs(i) = Array(if (idx >= 0) ds(idx) else 1L, g)
      i += 1
    }
    java.util.Arrays.sort(pairs, new java.util.Comparator[Array[Long]] {
      override def compare(a: Array[Long], b: Array[Long]): Int = {
        val c = java.lang.Long.compare(a(0), b(0))
        if (c != 0) c else java.lang.Long.compare(a(1), b(1))
      }
    })
    // prefix length: sz - ceil(sz * num / denom) + 1, exact long arithmetic
    val L = (n - ((n.toLong * num + denom - 1) / denom) + 1).toInt
    val out = new Array[Any](math.max(L, 0))
    var j = 0
    while (j < L) {
      out(j) = InternalRow(pairs(j)(1), j + 1)
      j += 1
    }
    new GenericArrayData(out)
  }

  override def prettyName: String = "prefix_by_df_longs"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
