package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Order-independent numeric aggregation.
  *
  * Double sums are order-dependent (IEEE addition is not associative), and a
  * distributed engine gives no ordering guarantee across shuffle partitions —
  * at 1000 executors the partial-aggregate combine order changes run to run.
  * Accumulating in DECIMAL(38,4) makes the sum exact and therefore
  * order-independent, so results are bit-stable across cluster sizes AND
  * bit-comparable with any other engine (the DuckDB oracle) using the same
  * decimal accumulation.
  *
  * The SQL mirror of `dsum(x)` is `CAST(SUM(CAST(x AS DECIMAL(38,4))) AS DOUBLE)`.
  */
object Exact {
  private val Dec = DecimalType(38, 4)

  /** Exact sum of a double expression, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast("double")

  /** Exact mean: exact decimal sum divided (in double) by the count. */
  def davg(c: Column): Column = sum(c.cast(Dec)).cast("double") / count(lit(1))

  /** SQL fragments mirroring the above, for oracle strings. */
  def sqlSum(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(38,4))) AS DOUBLE)"
  def sqlAvg(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(38,4))) AS DOUBLE) / COUNT(*)"
}
