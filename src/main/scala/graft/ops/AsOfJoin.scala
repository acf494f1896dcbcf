package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join — "for every left row, the temporally closest right row at or
 * before it" (direction="backward"; "forward" flips the inequality). The
 * standard event-stream enrichment: attach the most recent sensor reading /
 * price / session marker to each fact row.
 *
 * 100 TB design: NOT a range join (whose candidate set is |left| × matching
 * window) and NOT a per-key loop. Both sides are unioned with a side tag and
 * a single window over the partition keys computes, per left row, the last
 * preceding right payload (`last(_, ignoreNulls)` over rows unbounded-
 * preceding..current). Cost = ONE shuffle on the partition keys + a sort
 * within partitions — the same plan shape as any windowed aggregation, so
 * it scales exactly as far as Spark windows do. Skew note: partitions are
 * (key)-hashed; a single hot key serializes in one task, the inherent
 * window-function bound (salt upstream if one entity dominates).
 */
object AsOfJoin {

  /**
   * @param partitionCols equality keys (e.g. user_id) — both sides
   * @param leftTs/rightTs  event-time column name on each side: TIMESTAMP /
   *                        TIMESTAMP_NTZ / integral (see [[EventTime]]);
   *                        the two sides may even mix types — comparison is
   *                        on the normalized epoch-long
   * @param direction "backward" (greatest rightTs <= leftTs) or
   *                  "forward" (smallest rightTs >= leftTs)
   * @param tolerance  optional max |leftTs - rightTs| — MICROSECONDS for
   *                   timestamp columns, the columns' own units for integral
   *                   ones; matches beyond it become NULL
   * @param rightPrefix prefix for right-side output columns
   *
   * Left-outer semantics: every left row survives; unmatched rows carry
   * NULL right columns. Right rows tying on (keys, rightTs) are broken
   * arbitrarily (as in DuckDB/pandas ASOF; make rightTs unique per key for
   * deterministic output).
   */
  def asof(left: DataFrame, right: DataFrame, partitionCols: Seq[String],
      leftTs: String, rightTs: String, direction: String = "backward",
      tolerance: Option[Long] = None, rightPrefix: String = "asof_"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be 'backward' or 'forward', got '$direction'")
    val leftCols = left.columns.toSeq
    val rightCols = right.columns.toSeq.filterNot(partitionCols.contains)
    val collisions = rightCols.map(rightPrefix + _).toSet intersect leftCols.toSet
    require(collisions.isEmpty,
      s"prefixed right column(s) ${collisions.mkString(", ")} collide with left " +
        s"columns; pass a different rightPrefix")
    val pk = partitionCols.map(col)

    // Left columns ride FLAT through the union/shuffle/sort under
    // positional aliases (collision-proof against user column names):
    // packing them into a struct paid a nested-row header + offset per
    // LEFT row, and left is the fact side by convention (asof enriches
    // facts), so the header tax lands on the big side. The price is one
    // fixed 8-byte null slot per left column on RIGHT rows — cheap when
    // the left projection is reasonably narrow, and the win grows with
    // left width (q18's raw-events left: −0.3–0.45 s at sf10; q14's
    // 3-column left: a wash). Only the right payload needs a struct: it
    // is carried as ONE value by last(ignoreNulls) over the window.
    // Partition keys already ride as themselves and are not duplicated.
    val lcCols = leftCols.filterNot(partitionCols.contains)
    val leftTagged = left.select(
      pk ++ Seq(
        EventTime.toLong(left, leftTs).as("_ts"), lit(0).as("_side")) ++
        lcCols.zipWithIndex.map { case (c, i) => col(c).as(s"_lc$i") } :+
        lit(null).cast(structTypeOf(right, rightCols)).as("_r"): _*)
    val rightTagged = right.select(
      pk ++ Seq(
        EventTime.toLong(right, rightTs).as("_ts"), lit(1).as("_side")) ++
        lcCols.zipWithIndex.map { case (c, i) =>
          lit(null).cast(left.schema(c).dataType).as(s"_lc$i") } :+
        struct(rightCols.map(col): _*).as("_r"): _*)

    // Backward: ascending ts, right-before-left on equal ts so "<=" holds;
    // forward: descending ts gives "the smallest rightTs >= leftTs" as the
    // last preceding right row in scan order.
    val ord: Seq[Column] =
      if (direction == "backward") Seq(col("_ts").asc, col("_side").desc)
      else Seq(col("_ts").desc, col("_side").desc)
    val w = Window.partitionBy(pk: _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // `_mts` is non-null exactly where `_r` is (right rows), so the two
    // `last(ignoreNulls)` calls pick the same row: the matched right row's
    // normalized ts rides alongside its payload. This keeps the tolerance
    // check independent of the payload struct — it works even when rightTs
    // is also a partition key (and hence excluded from `_r`).
    val matched = leftTagged.unionByName(rightTagged)
      .withColumn("_mts", when(col("_side") === 1, col("_ts")))
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .withColumn("_match_ts", last(col("_mts"), ignoreNulls = true).over(w))
      .where(col("_side") === 0)
    val withTol = tolerance match {
      case Some(t) =>
        val gap = abs(col("_ts") - col("_match_ts"))
        matched.withColumn("_match", when(gap <= t, col("_match")))
      case None => matched
    }
    val lcIdx = lcCols.zipWithIndex.toMap
    withTol.select(
      leftCols.map(c =>
        if (partitionCols.contains(c)) col(c)
        else col(s"_lc${lcIdx(c)}").as(c)) ++
        rightCols.map(c => col("_match").getField(c).as(rightPrefix + c)): _*)
  }

  private def structTypeOf(df: DataFrame, cols: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      cols.map(c => df.schema(c)))
}
