package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-time column dispatch shared by every batch event-time operator.
  *
  * Parquet written by different writers lands in Spark as different types
  * for the "same" timestamp column: TIMESTAMP (isAdjustedToUTC=true),
  * TIMESTAMP_NTZ (naive micros, `isAdjustedToUTC=false` — what pandas/
  * pyarrow write by default), or a raw integer epoch. `unix_millis` only
  * accepts TIMESTAMP, so every operator that reduces a timestamp to
  * epoch-millis routes through [[millis]] instead of calling `unix_millis`
  * directly, and operators that need a true TIMESTAMP column (e.g. for
  * `window()`) first route through [[normalize]].
  *
  * NTZ→TIMESTAMP casts interpret the wall-clock value in the session time
  * zone; the harness pins `spark.sql.session.timeZone=UTC`, so the cast is
  * value-preserving for UTC-naive data (the only kind the pipeline emits).
  */
private[graft] object Ts {

  /** `df` with `tsCol` usable as a session-TZ TIMESTAMP: TIMESTAMP_NTZ and
    * DATE are cast, TIMESTAMP passes through. Anything else throws — the
    * caller needs calendar semantics a bare number cannot supply. */
  def normalize(df: DataFrame, tsCol: String): DataFrame =
    df.schema(tsCol).dataType match {
      case TimestampType => df
      case TimestampNTZType | DateType =>
        df.withColumn(tsCol, col(tsCol).cast(TimestampType))
      case other => throw new IllegalArgumentException(
        s"column `$tsCol` must be TIMESTAMP / TIMESTAMP_NTZ / DATE, got $other")
    }

  /** A date/timestamp literal cast to `tsCol`'s OWN dtype, for use on one
    * side of a scan filter. Comparing a TIMESTAMP_NTZ column against a
    * TIMESTAMP literal makes the analyzer cast the COLUMN, which blocks
    * parquet predicate pushdown — casting the literal instead keeps the
    * comparison scan-native on every encoding. */
  def literal(df: DataFrame, tsCol: String, value: String): Column =
    df.schema(tsCol).dataType match {
      case t @ (TimestampType | TimestampNTZType | DateType) =>
        lit(value).cast(t)
      case other => throw new IllegalArgumentException(
        s"column `$tsCol` must be TIMESTAMP / TIMESTAMP_NTZ / DATE, got $other")
    }

  /** Epoch-millis of `tsCol` as a LongType column, whatever the physical
    * encoding. Numeric columns pass through as `cast(long)` — callers that
    * already carry an epoch number keep their unit untouched. */
  def millis(df: DataFrame, tsCol: String): Column =
    df.schema(tsCol).dataType match {
      case TimestampType => unix_millis(col(tsCol))
      case TimestampNTZType | DateType =>
        unix_millis(col(tsCol).cast(TimestampType))
      case _: NumericType => col(tsCol).cast("long")
      case other => throw new IllegalArgumentException(
        s"column `$tsCol` must be TIMESTAMP / TIMESTAMP_NTZ / DATE / numeric, got $other")
    }
}
