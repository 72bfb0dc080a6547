package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Exact._
import graft.sources.Tables

/** Streaming analytics operators (SURVEY.md §2.10 streaming row): tumbling /
  * sliding / session windows with watermark-driven late-data handling.
  *
  * `window()` / `session_window()` are streaming-capable operators that also
  * run in batch — the q28/q29 registrations exercise them in batch against
  * the DuckDB oracle, and StreamAnalyticsSpec drives the same functions
  * through MemoryStream with watermarks (the part SQL cannot express).
  */
object StreamAnalytics {
  type Q = (SparkSession, String) => DataFrame

  /** Tumbling-window aggregate (works in batch and streaming). */
  def tumblingCounts(df: DataFrame, tsCol: String, duration: String,
      extraKeys: Seq[String] = Nil): DataFrame = {
    val keys = window(col(tsCol), duration) +: extraKeys.map(col)
    df.groupBy(keys: _*)
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
  }

  /** Sliding-window aggregate. */
  def slidingCounts(df: DataFrame, tsCol: String, duration: String,
      slide: String): DataFrame =
    df.groupBy(window(col(tsCol), duration, slide))
      .agg(count(lit(1)).as("n_events"))

  /** Session windows per key: gap-based sessionization. */
  def sessionWindows(df: DataFrame, tsCol: String, keyCol: String,
      gap: String): DataFrame =
    df.groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))

  /** Late-data policy: rows older than `delay` behind the max event time
    * are dropped from stateful operators (streaming only). */
  def withLateDataDropped(stream: DataFrame, tsCol: String,
      delay: String): DataFrame =
    stream.withWatermark(tsCol, delay)

  /** Stream-stream interval join (attribution shape): each left row joins
    * right rows with the same key whose time falls in
    * [leftTs, leftTs + maxDelay]. In streaming, BOTH inputs must carry
    * watermarks — the interval bound is what lets Spark expire join state
    * (a left row can stop waiting once the right watermark passes
    * leftTs + maxDelay); without it state grows forever. In batch the same
    * expression is a plain equi-join with a range refine — the key keeps
    * it hash-partitionable at any scale. Column names must be disjoint. */
  def intervalJoin(left: DataFrame, leftKey: String, leftTs: String,
      right: DataFrame, rightKey: String, rightTs: String,
      maxDelay: String): DataFrame =
    left.join(right,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $maxDelay"))

  /** Stream-static enrichment: every streaming row joined to a STATIC
    * dimension frame on `key` — the dimension-lookup shape of an ingest
    * pipeline (event -> user/geo attributes). The static side is
    * re-planned per micro-batch and broadcast (stream-static joins are
    * stateless — no watermark, no state store), and the join is LEFT so
    * an event never drops because its dimension row is missing; the
    * unmatched columns arrive null, the reference's `.get(..., default)`
    * posture (pipeline.py:113-115) at the enrichment seam. */
  def enrichWithStatic(stream: DataFrame, dim: DataFrame,
      key: String): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim),
      Seq(key), "left")

  private val fmt = "yyyy-MM-dd HH:mm:ss"
  private val fmtSql = "%Y-%m-%d %H:%M:%S"

  // ---------------------------------------------------------------- q28
  /** Tumbling 1-hour windows over events, via the streaming `window()`
    * operator in batch mode; DuckDB mirror is date_trunc (identical
    * epoch-aligned buckets). */
  private val q28: Q = (s, dir) => {
    import s.implicits._
    tumblingCounts(Tables(s, dir, "events"), "ts", "1 hour", Seq("event_type"))
      .select(
        date_format($"window.start", fmt).as("hour_start"),
        $"event_type", $"n_events", $"sum_value")
      .orderBy($"hour_start", $"event_type")
  }
  private val q28Sql =
    s"""SELECT strftime(date_trunc('hour', ts), '$fmtSql') AS hour_start,
       |  event_type,
       |  COUNT(*) AS n_events,
       |  ${sqlSum("value")} AS sum_value
       |FROM events
       |GROUP BY 1, 2
       |ORDER BY hour_start, event_type""".stripMargin

  // ---------------------------------------------------------------- q29
  /** Session windows per user (30-minute gap) via `session_window()`;
    * DuckDB mirror is the gaps-and-islands construction. Session end is
    * last-event + gap (Spark's session_window semantics). */
  private val q29: Q = (s, dir) => {
    import s.implicits._
    sessionWindows(Tables(s, dir, "events"), "ts", "user_id", "30 minutes")
      .select(
        $"user_id",
        date_format($"session_window.start", fmt).as("session_start"),
        date_format($"session_window.end", fmt).as("session_end"),
        $"n_events")
      .orderBy($"user_id", $"session_start")
  }
  private val q29Sql =
    s"""WITH brk AS (
       |  SELECT user_id, ts,
       |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
       |              >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS b
       |  FROM events),
       |sess AS (
       |  SELECT user_id, ts,
       |    SUM(b) OVER (PARTITION BY user_id ORDER BY ts
       |                 ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM brk)
       |SELECT user_id,
       |  strftime(MIN(ts), '$fmtSql') AS session_start,
       |  strftime(MAX(ts) + INTERVAL '30 minutes', '$fmtSql') AS session_end,
       |  COUNT(*) AS n_events
       |FROM sess
       |GROUP BY user_id, sid
       |ORDER BY user_id, session_start""".stripMargin

  // ---------------------------------------------------------------- q59
  /** View→purchase attribution: the stream-stream interval join (batch
    * registration; StreamAnalyticsSpec drives the same operator through
    * two MemoryStreams with watermarks). */
  private val q59: Q = (s, dir) => {
    import s.implicits._
    val e = Tables(s, dir, "events")
    val views = e.filter($"event_type" === "view")
      .select($"event_id".as("view_id"), $"user_id", $"ts".as("view_ts"))
    val purchases = e.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id".as("p_user"),
        $"ts".as("purchase_ts"))
    intervalJoin(views, "user_id", "view_ts",
        purchases, "p_user", "purchase_ts", "1 HOUR")
      .select($"user_id", $"view_id", $"purchase_id",
        (unix_micros($"purchase_ts") - unix_micros($"view_ts")).as("delay_us"))
      .orderBy($"user_id", $"view_id", $"purchase_id")
  }
  private val q59Sql =
    """SELECT v.user_id AS user_id, v.event_id AS view_id,
      |  p.event_id AS purchase_id,
      |  epoch_us(p.ts) - epoch_us(v.ts) AS delay_us
      |FROM events v JOIN events p
      |  ON v.user_id = p.user_id
      | AND v.event_type = 'view' AND p.event_type = 'purchase'
      | AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
      |ORDER BY 1, 2, 3""".stripMargin

  val queries: Map[String, Q] = Map(
    "q28_hourly_windows" -> q28,
    "q29_session_windows" -> q29,
    "q59_interval_join_attribution" -> q59)

  val oracleSql: Map[String, String] = Map(
    "q28_hourly_windows" -> q28Sql,
    "q29_session_windows" -> q29Sql,
    "q59_interval_join_attribution" -> q59Sql)
}
