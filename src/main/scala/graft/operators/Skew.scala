package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Exact
import graft.sources.Tables

/** Skew mitigation by key salting (SURVEY.md §2.10 / prompt: "salting for
  * skew"). AQE's skew-join handles sort-merge cases at runtime; explicit
  * salting is the lever when one key dominates so heavily that even a
  * split partition is one task's worth of work, or for skewed
  * aggregations (two-phase partial-then-merge).
  */
object Skew {

  /** Salted two-phase aggregation: count per key without a hot-key
    * straggler. Phase 1 groups on (key, salt) — the hot key's rows spread
    * over `saltBuckets` tasks; phase 2 merges the partials per key. */
  def saltedCount(df: DataFrame, keyCol: String,
      saltBuckets: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id()
        + monotonically_increasing_id(), lit(saltBuckets)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as("n"))

  /** Salted broadcast-side explosion for a skewed join: the big (skewed)
    * side gets a random-ish salt in [0, saltBuckets); the small side is
    * replicated once per salt value so `key AND salt` equi-join semantics
    * equal the plain key join. Use when the small side fits broadcast but
    * the big side's hot key would otherwise pin one task. */
  def saltJoin(big: DataFrame, small: DataFrame, key: String,
      saltBuckets: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets.toLong)))
    val explodedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1))))
    saltedBig.join(explodedSmall, Seq(key, "__salt")).drop("__salt")
  }

  // ---------------------------------------------------------------- q61
  /** Supplier-nation revenue through the salted join: the salt changes
    * only the physical row distribution (every hot l_suppkey spreads over
    * 16 sub-keys), never the result — which is exactly what the oracle's
    * plain join verifies. */
  type Q = (SparkSession, String) => DataFrame
  private val q61: Q = (s, dir) => {
    import s.implicits._
    val li = Tables(s, dir, "lineitem")
      .select($"l_suppkey".as("suppkey"), $"l_extendedprice", $"l_discount")
    val sup = Tables(s, dir, "supplier")
      .select($"s_suppkey".as("suppkey"), $"s_nationkey")
    saltJoin(li, sup, "suppkey")
      .groupBy($"s_nationkey")
      .agg(count(lit(1)).as("n_lines"),
        Exact.dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"))
          .as("revenue"))
      .orderBy($"s_nationkey")
  }
  private val q61Sql =
    s"""SELECT s_nationkey, COUNT(*) AS n_lines,
       |  ${Exact.sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
       |GROUP BY s_nationkey
       |ORDER BY s_nationkey""".stripMargin

  val queries: Map[String, Q] = Map("q61_salted_join" -> q61)
  val oracleSql: Map[String, String] = Map("q61_salted_join" -> q61Sql)
}
