package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/**
 * Event-time normalization shared by the event-stream operators.
 *
 * AsOfJoin / Sessionize / RangeJoin do integer arithmetic on the event-time
 * column (gaps, tolerances, bucket ids). Real event tables carry TIMESTAMP
 * or TIMESTAMP_NTZ far more often than LONG (the driver fixture's `ts` is
 * `timestamp[us]`), so every operator accepts all three:
 *
 *  - TimestampType     → `unix_micros(ts)`
 *  - TimestampNTZType  → `unix_micros(ts)` with the wall-clock interpreted in
 *                        the session time zone; under
 *                        `spark.sql.session.timeZone=UTC` this is the
 *                        naive-as-UTC epoch — exactly DuckDB's `epoch_us(ts)`
 *                        on the same parquet column
 *  - any integral type → cast to LONG, units are the caller's
 *
 * Gap / tolerance / bucket-width parameters are therefore MICROSECONDS when
 * the column is timestamp-typed, and the column's own units otherwise.
 * The mapping is monotone per type, so window orderings on the original
 * column and on the normalized value agree.
 */
object EventTime {

  /** Epoch-long view of an event-time column (see class doc for units). */
  def toLong(dt: DataType, c: Column): Column = dt match {
    case TimestampType    => unix_micros(c)
    case TimestampNTZType => unix_micros(c.cast(TimestampType))
    case _                => c.cast(LongType)
  }

  def toLong(df: DataFrame, name: String): Column =
    toLong(df.schema(name).dataType, col(name))
}
