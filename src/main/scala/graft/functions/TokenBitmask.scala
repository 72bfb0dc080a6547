package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dictionary-encoded token-set bitmasks: when the global vocabulary fits
  * in 62 bits, a token set becomes one long and set similarity becomes
  * integer bit_count work. Single home for the kernel shared by the
  * MinHash-LSH pipeline (DedupOps) and the blocked Jaccard query (TextOps);
  * at 100 TB the analog is a fixed-width hashed bitmap per document.
  */
object TokenBitmask {

  /** Largest dictionary a single long mask can hold (shiftleft wraps
    * silently past 63, so callers MUST check vocab size first). */
  val MaxVocab = 62

  /** Deterministic bit index per distinct token (tiny frame: ≤ MaxVocab
    * rows, so the single-partition window is free). */
  def dictionary(vocab: DataFrame, tokCol: String = "__tok"): DataFrame =
    vocab.withColumn("__idx",
      row_number().over(Window.orderBy(col(tokCol))) - 1)

  /** One mask per group from an exploded (group..., token) frame, plus any
    * extra aggregates computed in the same single pass. */
  def masks(exploded: DataFrame, dict: DataFrame, groupCols: Seq[String],
      tokCol: String = "__tok", extraAggs: Seq[Column] = Nil): DataFrame = {
    val maskAgg = bit_or(expr("shiftleft(CAST(1 AS BIGINT), __idx)")).as("__mask")
    exploded.join(broadcast(dict), tokCol)
      .groupBy(groupCols.map(col): _*)
      .agg(maskAgg, extraAggs: _*)
  }

  /** |A ∩ B| on mask columns. */
  def intersectCount(a: Column, b: Column): Column =
    bit_count(a.bitwiseAND(b))

  /** |A ∪ B| on mask columns. */
  def unionCount(a: Column, b: Column): Column =
    bit_count(a.bitwiseOR(b))

  /** Exact Jaccard similarity on mask columns. */
  def jaccard(a: Column, b: Column): Column =
    intersectCount(a, b).cast("double") / unionCount(a, b).cast("double")
}
