package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Exact
import graft.sources.Tables

/** Range (point-in-interval) join — an operator shape Spark has no native
  * node for (a bare `BETWEEN` join falls back to BroadcastNestedLoopJoin,
  * which is O(n·m) and explodes at scale).
  *
  * Scale architecture: quantize the domain into fixed-width buckets. Each
  * interval is exploded to the buckets it covers (bounded fan-out =
  * interval_width / bucket_width + 1), each point belongs to exactly ONE
  * bucket — so bucket equality becomes an equi-join key that Catalyst can
  * hash-partition, and the exact BETWEEN predicate refines candidates
  * inside each bucket. No candidate pair is produced twice (the point's
  * bucket is unique), so no dedup pass is needed. At 100 TB both sides
  * shuffle once on the bucket key; a skewed bucket salts like any other
  * hot equi-key (graft.operators.Skew).
  *
  * Works for any totally-ordered numeric domain; timestamps join via their
  * epoch-µs longs.
  */
object RangeJoin {
  type Q = (SparkSession, String) => DataFrame

  /** Join `points` to every interval in `intervals` containing the point:
    * output = point columns + interval columns, one row per containment.
    * `loCol`/`hiCol` are inclusive bounds. `bucketWidth` trades fan-out
    * (small buckets → more interval copies) against candidate density
    * (large buckets → more false candidates); pick ≈ median interval
    * width. */
  def pointInInterval(points: DataFrame, pCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("__bucket",
      floor(col(pCol).cast("long") / bucketWidth))
    val iv = intervals.withColumn("__bucket",
      explode(sequence(
        floor(col(loCol).cast("long") / bucketWidth),
        floor(col(hiCol).cast("long") / bucketWidth))))
    p.join(iv, Seq("__bucket"))
      .filter(col(pCol) >= col(loCol) && col(pCol) <= col(hiCol))
      .drop("__bucket")
  }

  // ---------------------------------------------------------------- q54
  /** Parts binned into overlapping nation-derived size intervals
    * [2k, 2k+5]: a genuine many-to-many range join (each size matches ≤3
    * intervals), aggregated per interval. The oracle states the same join
    * as a plain BETWEEN — DuckDB's nested-loop is fine at oracle scale;
    * the Spark side must survive 100 TB, hence the bucketed plan. */
  private val q54: Q = (s, dir) => {
    import s.implicits._
    val sizeRanges = Tables(s, dir, "nation")
      .select($"n_nationkey".cast("long").as("range_id"),
        ($"n_nationkey" * 2L).as("lo"), ($"n_nationkey" * 2L + 5L).as("hi"))
    val joined = pointInInterval(
      Tables(s, dir, "part").select($"p_partkey", $"p_size", $"p_retailprice"),
      "p_size", sizeRanges, "lo", "hi", bucketWidth = 6L)
    joined.groupBy($"range_id", $"lo", $"hi")
      .agg(count(lit(1)).as("n_parts"),
        Exact.dsum($"p_retailprice").as("sum_price"))
      .orderBy($"range_id")
  }
  private val q54Sql =
    s"""SELECT n_nationkey AS range_id,
       |  CAST(n_nationkey * 2 AS BIGINT) AS lo,
       |  CAST(n_nationkey * 2 + 5 AS BIGINT) AS hi,
       |  CAST(COUNT(*) AS BIGINT) AS n_parts,
       |  ${Exact.sqlSum("p_retailprice")} AS sum_price
       |FROM part JOIN nation
       |  ON p_size BETWEEN n_nationkey * 2 AND n_nationkey * 2 + 5
       |GROUP BY 1, 2, 3
       |ORDER BY range_id""".stripMargin

  // ---------------------------------------------------------------- q63
  /** Range join on the TIME domain: count all events inside each early
    * user's first active hour. Timestamps join through their epoch-µs
    * longs with 15-minute buckets — the same operator, same plan shape;
    * time is just another totally-ordered domain. */
  private val q63: Q = (s, dir) => {
    import s.implicits._
    val ev = Tables(s, dir, "events")
    val windows = ev.filter($"user_id" < 10)
      .groupBy($"user_id")
      .agg(min(unix_micros($"ts")).as("lo"))
      .withColumn("hi", $"lo" + lit(3600L * 1000000L))
    val points = ev.select(unix_micros($"ts").as("t"))
    pointInInterval(points, "t", windows, "lo", "hi",
        bucketWidth = 15L * 60L * 1000000L)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events_in_window"))
      .orderBy($"user_id")
  }
  private val q63Sql =
    """WITH w AS (
      |  SELECT user_id, MIN(epoch_us(ts)) AS lo,
      |         MIN(epoch_us(ts)) + 3600000000 AS hi
      |  FROM events WHERE user_id < 10 GROUP BY user_id)
      |SELECT w.user_id AS user_id,
      |       CAST(COUNT(*) AS BIGINT) AS n_events_in_window
      |FROM events e JOIN w
      |  ON epoch_us(e.ts) >= w.lo AND epoch_us(e.ts) <= w.hi
      |GROUP BY w.user_id
      |ORDER BY user_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q54_range_join" -> q54,
    "q63_time_range_join" -> q63)
  val oracleSql: Map[String, String] = Map(
    "q54_range_join" -> q54Sql,
    "q63_time_range_join" -> q63Sql)
}
