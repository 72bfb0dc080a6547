package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Exact._
import graft.sources.Tables

/** Second relational wave: CUBE, the full ranking-window family, exact
  * statistical aggregates, as-of join, pivot, and windowed median — each
  * with a bit-exact DuckDB oracle (SURVEY.md §2.10 relational core).
  */
object Relational2 {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  // ---------------------------------------------------------------- q14
  /** CUBE grouping sets (all 4 combinations), nulls folded to 'ALL'. */
  private val q14: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "lineitem")
      .cube($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"), dsum($"l_quantity").as("sum_qty"))
      .select(
        coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
        coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
        $"n", $"sum_qty")
      .orderBy($"returnflag", $"linestatus")
  }
  private val q14Sql =
    s"""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       |       COALESCE(l_linestatus, 'ALL') AS linestatus,
       |       COUNT(*) AS n,
       |       ${sqlSum("l_quantity")} AS sum_qty
       |FROM lineitem
       |GROUP BY CUBE(l_returnflag, l_linestatus)
       |ORDER BY returnflag, linestatus""".stripMargin

  // ---------------------------------------------------------------- q15
  /** Ranking-window family: rank, dense_rank, lead, ntile in one pass
    * (one shuffle on the partition key serves all four). */
  private val q15: Q = (s, dir) => {
    import s.implicits._
    val byPrice = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    val byDate = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
    t(s, dir, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_totalprice",
        rank().over(byPrice).cast("long").as("rnk"),
        dense_rank().over(byPrice).cast("long").as("drnk"),
        ntile(4).over(byPrice).cast("long").as("quartile"),
        lead($"o_totalprice", 1).over(byDate).as("next_price"))
      .orderBy($"o_custkey", $"o_orderkey")
  }
  private val q15Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  RANK() OVER w AS rnk,
      |  DENSE_RANK() OVER w AS drnk,
      |  NTILE(4) OVER w AS quartile,
      |  LEAD(o_totalprice, 1) OVER (PARTITION BY o_custkey
      |                              ORDER BY o_orderdate ASC, o_orderkey ASC)
      |    AS next_price
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey
      |             ORDER BY o_totalprice DESC, o_orderkey ASC)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q16
  /** Statistical aggregates rebuilt from exact decimal sums, so stddev and
    * correlation are bit-identical across engines (native stddev/corr
    * implementations differ in accumulation order). Squares/products of
    * 2-decimal inputs have ≤4 decimals, so DECIMAL(38,4) holds them
    * exactly. */
  private val q16: Q = (s, dir) => {
    import s.implicits._
    val x = $"l_quantity"
    val y = $"l_extendedprice"
    t(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        dsum(x).as("sx"), dsum(y).as("sy"),
        dsum(x * x).as("sxx"), dsum(y * y).as("syy"),
        dsum(x * y).as("sxy"))
      .select($"l_returnflag", $"n",
        ($"sx" / $"n").as("mean_qty"),
        round(sqrt(($"sxx" - $"sx" * $"sx" / $"n") / ($"n" - 1)), 9)
          .as("stddev_qty"),
        // 9 dp: the decimal→double boundary arithmetic differs by an ulp
        // between engines at some scale factors (observed at sf0.001) —
        // same collapse-the-drift treatment as q55's ln
        round(($"n" * $"sxy" - $"sx" * $"sy") /
          (sqrt($"n" * $"sxx" - $"sx" * $"sx") *
            sqrt($"n" * $"syy" - $"sy" * $"sy")), 9).as("corr_qty_price"))
      .orderBy($"l_returnflag")
  }
  private val q16Sql = {
    val sx = sqlSum("l_quantity"); val sy = sqlSum("l_extendedprice")
    val sxx = sqlSum("l_quantity * l_quantity")
    val syy = sqlSum("l_extendedprice * l_extendedprice")
    val sxy = sqlSum("l_quantity * l_extendedprice")
    s"""SELECT l_returnflag, n,
       |  sx / n AS mean_qty,
       |  ROUND(sqrt((sxx - sx * sx / n) / (n - 1)), 9) AS stddev_qty,
       |  ROUND((n * sxy - sx * sy)
       |    / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 9)
       |    AS corr_qty_price
       |FROM (SELECT l_returnflag, COUNT(*) AS n,
       |             $sx AS sx, $sy AS sy, $sxx AS sxx, $syy AS syy, $sxy AS sxy
       |      FROM lineitem GROUP BY l_returnflag)
       |ORDER BY l_returnflag""".stripMargin
  }

  // ---------------------------------------------------------------- q17
  /** As-of join: for each error event, the most recent signup of the same
    * user at-or-before it. Spark lacks ASOF JOIN; the scalable form is the
    * union + last_value(ignoreNulls) window — one shuffle on (user, time),
    * no range explosion. DuckDB oracles it with its native ASOF JOIN. */
  private val q17: Q = (s, dir) => {
    import s.implicits._
    val ev = t(s, dir, "events")
    val signups = ev.filter($"event_type" === "signup")
      .select($"user_id", $"ts", lit(0).as("kind"), lit(null).cast("long").as("event_id"))
    val probes = ev.filter($"event_type" === "error")
      .select($"user_id", $"ts", lit(1).as("kind"), $"event_id")
    // kind sorts signups before probes at equal ts → ties count as matched
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"kind".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    signups.union(probes)
      .withColumn("last_signup_ts",
        last(when($"kind" === 0, $"ts"), ignoreNulls = true).over(w))
      .filter($"kind" === 1)
      .select($"event_id", $"user_id",
        date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("event_time"),
        date_format($"last_signup_ts", "yyyy-MM-dd HH:mm:ss").as("last_signup_time"))
      .orderBy($"event_id")
  }
  private val q17Sql =
    """SELECT e.event_id, e.user_id,
      |  strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS event_time,
      |  strftime(s.ts, '%Y-%m-%d %H:%M:%S') AS last_signup_time
      |FROM (SELECT * FROM events WHERE event_type = 'error') e
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      |  ON e.user_id = s.user_id AND e.ts >= s.ts
      |ORDER BY e.event_id""".stripMargin

  // ---------------------------------------------------------------- q18
  /** Pivot: order counts per year × status as columns (explicit value list
    * keeps the schema static — required for both determinism and scale). */
  private val q18: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "orders")
      .groupBy(year($"o_orderdate").as("order_year"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select($"order_year",
        $"F".as("n_f"), $"O".as("n_o"), $"P".as("n_p"))
      .orderBy($"order_year")
  }
  private val q18Sql =
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
      |FROM orders
      |GROUP BY 1
      |ORDER BY order_year""".stripMargin

  // ---------------------------------------------------------------- q19
  /** Median via explicit windowed construction (interpolating percentile
    * implementations differ across engines in ulp; picking the middle
    * row(s) and averaging is formula-identical on both sides). */
  private val q19: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".asc, $"o_orderkey".asc)
    t(s, dir, "orders")
      .select($"o_orderpriority", $"o_totalprice",
        row_number().over(w).as("rn"),
        count(lit(1)).over(Window.partitionBy($"o_orderpriority")).as("n"))
      .filter($"rn" === (($"n" + 1) / 2).cast("long") ||
        $"rn" === (($"n" + 2) / 2).cast("long"))
      .groupBy($"o_orderpriority")
      .agg((sum($"o_totalprice") / count(lit(1))).as("median_price"),
        max($"n").as("n_orders"))
      .orderBy($"o_orderpriority")
  }
  private val q19Sql =
    """SELECT o_orderpriority,
      |  SUM(o_totalprice) / COUNT(*) AS median_price,
      |  MAX(n) AS n_orders
      |FROM (SELECT o_orderpriority, o_totalprice,
      |             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |                                ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn,
      |             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      |      FROM orders)
      |WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // --------------------------------------------------------------- q17b
  /** Same as-of semantics as q17, but through the custom operator stack
    * (AsOfJoinPlan logical node → AsOfStrategy → AsOfJoinExec merge scan,
    * graft.plans) — the driver verifies the custom physical operator
    * against DuckDB's native ASOF JOIN. */
  private val q17b: Q = (s, dir) => {
    import s.implicits._
    val ev = t(s, dir, "events")
    val probes = ev.filter($"event_type" === "error")
      .select($"user_id", $"ts", $"event_id")
    val refs = ev.filter($"event_type" === "signup")
      .select($"user_id", $"ts")
    graft.plans.AsOf.join(probes, refs, "user_id", "ts")
      .select($"event_id", $"user_id",
        date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("event_time"),
        date_format($"matched_time", "yyyy-MM-dd HH:mm:ss").as("last_signup_time"))
      .orderBy($"event_id")
  }

  val queries: Map[String, Q] = Map(
    "q17b_asof_custom_operator" -> q17b,
    "q14_cube_flags" -> q14,
    "q15_window_family" -> q15,
    "q16_exact_stats" -> q16,
    "q17_asof_join" -> q17,
    "q18_pivot_status" -> q18,
    "q19_windowed_median" -> q19)

  val oracleSql: Map[String, String] = Map(
    "q17b_asof_custom_operator" -> q17Sql, // identical semantics to q17
    "q14_cube_flags" -> q14Sql,
    "q15_window_family" -> q15Sql,
    "q16_exact_stats" -> q16Sql,
    "q17_asof_join" -> q17Sql,
    "q18_pivot_status" -> q18Sql,
    "q19_windowed_median" -> q19Sql)
}
