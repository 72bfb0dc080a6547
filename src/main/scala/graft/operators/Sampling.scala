package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Shared deterministic per-group sampler: the bottom-K rows of each group
  * ordered by PortableHash(id) — a uniform, layout-independent sample both
  * engines can reproduce exactly. q78 (sampled quantiles) and q108
  * (feature binning) FIT on this same sample; keeping the definition in
  * one place keeps their stated equivalence a compile-time fact.
  *
  * Scale: the rank-limit window is a per-group top-K (map-side group
  * limit) — wide groups never reach a reducer whole, which is what rules
  * out exact per-group sorts at 100 TB.
  */
object Sampling {

  /** Sample size shared by every bottom-K fit (q78, q108). */
  val K = 128

  /** Rows of `df` whose PortableHash(id) ranks in the bottom `k` of their
    * `key` group. Adds columns `h` (the hash) and `rn` (the rank); `id`
    * must be unique per row so the (h, id) order is total. */
  def bottomKByHash(df: DataFrame, key: String, id: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col("h").asc, col(id).asc)
    df.withColumn("h", PortableHash.tokenHashP(col(id)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  /** DuckDB CTE body matching [[bottomKByHash]]: selects `cols` plus the
    * same (hash, id) rank as `rn` from `from`; consumers keep `rn <= k`. */
  def bottomKByHashSql(cols: String, from: String, key: String, id: String): String = {
    val h = PortableHash.tokenHashPSql(id)
    s"""SELECT $cols,
       |    ROW_NUMBER() OVER (PARTITION BY $key
       |                       ORDER BY $h ASC, $id ASC) AS rn
       |  FROM $from""".stripMargin
  }
}
