package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Timestamp-type normalization at operator ingress.
  *
  * Parquet footers can carry event time as TIMESTAMP(NANOS) (legacy),
  * TIMESTAMP(isAdjustedToUTC=true, MICROS) → `TimestampType`, or
  * TIMESTAMP(isAdjustedToUTC=false, MICROS) → `TimestampNTZType` — and a
  * generator regenerating data can silently switch shapes (it did between
  * rounds 7 and 8). The [[graft.sources.Tables]] loader normalizes the
  * driver tables, but any operator that is timestamp-STRICT
  * (`unix_micros`, the as-of join's TimestampType requirement) would crash
  * on an NTZ column arriving from a future source that doesn't go through
  * that loader. This helper is the per-operator guard: cast NTZ columns to
  * instant timestamps. Under a UTC session timezone (pinned in build.sbt /
  * Verify / Bench) the cast is value-identity — the same microsecond count
  * reinterpreted as an instant.
  */
object TsNorm {
  /** Cast every `TimestampNTZType` column among `cols` (all columns when
    * `cols` is empty) to `TimestampType`; other columns pass through. */
  def instant(df: DataFrame, cols: String*): DataFrame = {
    val target: String => Boolean =
      if (cols.isEmpty) _ => true else cols.toSet
    df.schema.fields.foldLeft(df) { (d, f) =>
      if (target(f.name) && f.dataType == TimestampNTZType)
        d.withColumn(f.name, col(f.name).cast(TimestampType))
      else d
    }
  }
}
