package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Third relational wave: full-row dedup, explicit GROUPING SETS, array
  * scalar functions, and multiset (ALL) set operations. */
object Relational3 {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  // ---------------------------------------------------------------- q45
  /** Full-row exact dedup (dropDuplicates over every column) — the
    * hash-groupBy dedup shape: one shuffle on the full row hash. */
  private val q45: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "events")
      .select($"event_id", $"user_id", $"event_type", $"value")
      .dropDuplicates()
      .orderBy($"event_id")
  }
  private val q45Sql =
    """SELECT DISTINCT event_id, user_id, event_type, value
      |FROM events
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q46
  /** Explicit GROUPING SETS — (type), (user bucket), and grand total in one
    * pass (distinct from rollup/cube: an arbitrary set list). */
  private val q46: Q = (s, dir) => {
    import s.implicits._
    val e = t(s, dir, "events")
      .withColumn("user_bucket", ($"user_id" % 10).cast("int"))
    e.groupingSets(
        Seq(Seq($"event_type"), Seq($"user_bucket"), Seq()),
        $"event_type", $"user_bucket")
      .agg(count(lit(1)).as("n"))
      .select(
        coalesce($"event_type", lit("ALL")).as("event_type"),
        coalesce($"user_bucket", lit(-1)).as("user_bucket"),
        $"n")
      .orderBy($"event_type", $"user_bucket")
  }
  private val q46Sql =
    """SELECT COALESCE(event_type, 'ALL') AS event_type,
      |       COALESCE(CAST(user_id % 10 AS INTEGER), -1) AS user_bucket,
      |       COUNT(*) AS n
      |FROM events
      |GROUP BY GROUPING SETS ((event_type), (CAST(user_id % 10 AS INTEGER)), ())
      |ORDER BY event_type, user_bucket""".stripMargin

  // ---------------------------------------------------------------- q47
  /** Array scalar functions over the embedding column: size, element
    * access, slice, max/min (widened to double for cross-engine type
    * parity), membership. */
  private val q47: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "embeddings")
      .select(
        $"vec_id",
        size($"embedding").cast("long").as("dim"),
        element_at($"embedding", 1).cast("double").as("first_component"),
        element_at($"embedding", -1).cast("double").as("last_component"),
        array_max(slice($"embedding", 1, 8)).cast("double").as("head_max"),
        array_min($"embedding").cast("double").as("vec_min"),
        ($"vec_id" % 2 === 0).as("even_id"))
      .orderBy($"vec_id")
  }
  private val q47Sql =
    """SELECT vec_id,
      |  CAST(len(embedding) AS BIGINT) AS dim,
      |  CAST(embedding[1] AS DOUBLE) AS first_component,
      |  CAST(embedding[-1] AS DOUBLE) AS last_component,
      |  CAST(list_max(embedding[1:8]) AS DOUBLE) AS head_max,
      |  CAST(list_min(embedding) AS DOUBLE) AS vec_min,
      |  vec_id % 2 = 0 AS even_id
      |FROM embeddings
      |ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- q48
  /** Multiset set operations: INTERSECT ALL / EXCEPT ALL preserve
    * duplicate counts (bag semantics), unlike their DISTINCT forms.
    *
    * Implemented via the bag-count identity — |A ∩all B|(v) = min(a_v, b_v),
    * |A ∖all B|(v) = max(a_v − b_v, 0) — over per-value counts. The
    * row-level `intersectAll`/`exceptAll` operators hash-partition every
    * ROW by value, which on a 3-value column sends the whole table to 3
    * reducers; per-side counts are map-side partial aggregates with a
    * 3-row shuffle instead. Relational3Spec asserts this form equals the
    * built-in operators row-for-row. */
  private val q48: Q = (s, dir) => {
    import s.implicits._
    val lc = t(s, dir, "lineitem").groupBy($"l_linestatus".as("status"))
      .agg(count(lit(1)).as("__ln"))
    val oc = t(s, dir, "orders").groupBy($"o_orderstatus".as("status"))
      .agg(count(lit(1)).as("__on"))
    lc.join(oc, Seq("status"), "full_outer")
      .na.fill(0L, Seq("__ln", "__on"))
      .select($"status",
        least($"__ln", $"__on").as("n_inter"),
        greatest($"__on" - $"__ln", lit(0L)).as("n_except"))
      .filter($"n_inter" > 0 || $"n_except" > 0)
      .orderBy($"status")
  }
  private val q48Sql =
    """WITH i AS (
      |  SELECT status, COUNT(*) AS n_inter FROM (
      |    SELECT l_linestatus AS status FROM lineitem
      |    INTERSECT ALL
      |    SELECT o_orderstatus FROM orders) GROUP BY status),
      |e AS (
      |  SELECT status, COUNT(*) AS n_except FROM (
      |    SELECT o_orderstatus AS status FROM orders
      |    EXCEPT ALL
      |    SELECT l_linestatus FROM lineitem) GROUP BY status)
      |SELECT COALESCE(i.status, e.status) AS status,
      |       COALESCE(n_inter, 0) AS n_inter,
      |       COALESCE(n_except, 0) AS n_except
      |FROM i FULL OUTER JOIN e ON i.status = e.status
      |ORDER BY status""".stripMargin

  // ---------------------------------------------------------------- q49
  /** Left outer join with zero-preserving counts: every customer appears,
    * including those with no orders (count = 0, sum = 0). */
  private val q49: Q = (s, dir) => {
    import s.implicits._
    import graft.functions.Exact._
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy($"c_custkey", $"c_mktsegment")
      .agg(
        count($"o_orderkey").as("n_orders"), // count(col) skips nulls
        coalesce(dsum($"o_totalprice"), lit(0.0)).as("sum_spent"))
      .orderBy($"c_custkey")
  }
  private val q49Sql =
    s"""SELECT c_custkey, c_mktsegment,
       |  COUNT(o_orderkey) AS n_orders,
       |  COALESCE(${graft.functions.Exact.sqlSum("o_totalprice")}, 0.0) AS sum_spent
       |FROM customer
       |LEFT OUTER JOIN orders ON c_custkey = o_custkey
       |GROUP BY c_custkey, c_mktsegment
       |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q52
  /** Unpivot (wide → long) via stack: per-year status counts as rows. */
  private val q52: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "orders")
      .groupBy(year($"o_orderdate").as("order_year"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select($"order_year", expr(
        "stack(3, 'F', F, 'O', O, 'P', P) AS (status, n_orders)"))
      .filter($"n_orders" > 0)
      .orderBy($"order_year", $"status")
  }
  private val q52Sql =
    """SELECT order_year, status, n_orders FROM (
      |  SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
      |         o_orderstatus AS status,
      |         COUNT(*) AS n_orders
      |  FROM orders GROUP BY 1, 2)
      |WHERE n_orders > 0
      |ORDER BY order_year, status""".stripMargin

  // ---------------------------------------------------------------- q53
  /** JSON parse → project → re-serialize round trip (P7 + P8 shape):
    * extract from props, rebuild a normalized JSON string. */
  private val q53: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "events")
      .select($"event_id",
        coalesce(get_json_object($"props", "$.k").cast("long"), lit(0L)).as("k"))
      .select($"event_id",
        to_json(struct($"k")).as("normalized_json"))
      .orderBy($"event_id")
  }
  private val q53Sql =
    """SELECT event_id,
      |  to_json(struct_pack(
      |    k := COALESCE(CAST(json_extract_string(props, '$.k') AS BIGINT), 0)))
      |    AS normalized_json
      |FROM events
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q62
  /** Remaining window-function family: percent_rank / cume_dist (exact
    * int-ratio doubles → bit-identical), nth_value under the ANSI default
    * frame, first/last_value with an explicit full ROWS frame, and a
    * peers-inclusive RANGE frame count. One shuffle on the partition key
    * serves every function (all windows share it). */
  private val q62: Q = (s, dir) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val byPrice = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    val fullFrame = byPrice.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val rangeFrame = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_totalprice",
        percent_rank().over(byPrice).as("pr"),
        cume_dist().over(byPrice).as("cd"),
        nth_value($"o_totalprice", 2).over(byPrice).as("second_price"),
        first_value($"o_totalprice").over(fullFrame).as("max_price"),
        last_value($"o_totalprice").over(fullFrame).as("min_price"),
        count(lit(1)).over(rangeFrame).as("n_ge_price"))
      .orderBy($"o_custkey", $"o_orderkey")
  }
  private val q62Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  PERCENT_RANK() OVER w AS pr,
      |  CUME_DIST() OVER w AS cd,
      |  NTH_VALUE(o_totalprice, 2) OVER w AS second_price,
      |  FIRST_VALUE(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
      |    AND UNBOUNDED FOLLOWING) AS max_price,
      |  LAST_VALUE(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
      |    AND UNBOUNDED FOLLOWING) AS min_price,
      |  COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC
      |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_ge_price
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey
      |             ORDER BY o_totalprice DESC, o_orderkey ASC)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q70
  /** Grouped EXACT quantiles (p50/p90/p99 with linear interpolation) —
    * `percentile()` in Spark and `quantile_cont()` in DuckDB share the
    * textbook definition (index p·(n−1) into the sorted values, linear
    * interpolation between neighbors), so exact quantiles are
    * cross-engine hash-comparable where approximate sketches
    * (percentile_approx / approx_quantile) are not. Exact per-group
    * quantiles need per-group order statistics — the 100 TB note is the
    * same as q19's: group cardinality bounds the per-reducer sort, and
    * the documented scale path for wide groups is percentile_approx
    * (mergeable GK sketch) at the cost of oracle-ability. */
  private val q70: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "events")
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        percentile($"value", lit(0.5)).as("p50"),
        percentile($"value", lit(0.9)).as("p90"),
        percentile($"value", lit(0.99)).as("p99"))
      .orderBy($"event_type")
  }
  private val q70Sql =
    """SELECT event_type, COUNT(*) AS n,
      |  quantile_cont(value, 0.5) AS p50,
      |  quantile_cont(value, 0.9) AS p90,
      |  quantile_cont(value, 0.99) AS p99
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q78
  /** Grouped APPROXIMATE quantiles via a deterministic fixed-size sample —
    * the documented scale path q70's scaladoc names, made oracle-able.
    * percentile_approx's GK sketch is engine-specific (never
    * cross-engine comparable); instead each group keeps its bottom-K rows
    * by PortableHash of the unique event_id — a uniform fixed-size
    * per-group sample both engines reconstruct bit-identically — and
    * takes EXACT quantiles of the sample (percentile == quantile_cont
    * bitwise, the q70 parity). Sampling error is the textbook
    * order-statistic bound (~0.5/√K quantile points at p50);
    * Relational3Spec measures it against a known distribution.
    *
    * Scale: the sample is found with one per-group sort bounded by the
    * hash order — and because h is uniform on [0,P), a plain
    * `h < P·c/E[group]` pre-filter keeps the window input at O(K) rows
    * per group before the sort, so wide groups never hit a reducer whole
    * (the failure mode that rules out q70's exact form at 100 TB). */
  private val sampleK = Sampling.K

  /** The reusable operator behind q78: per-group bottom-K rows by
    * PortableHash(id) (a deterministic uniform sample, the shared
    * [[Sampling.bottomKByHash]] fit), then exact quantiles of the
    * sample. `id` must be unique per row. */
  def sampledQuantiles(df: DataFrame, key: String, value: String,
      id: String, k: Int): DataFrame = {
    Sampling.bottomKByHash(
        df.select(col(key), col(id), col(value)), key, id, k)
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_sample"),
        percentile(col(value), lit(0.5)).as("p50"),
        percentile(col(value), lit(0.9)).as("p90"),
        percentile(col(value), lit(0.99)).as("p99"))
      .orderBy(col(key))
  }

  private val q78: Q = (s, dir) =>
    sampledQuantiles(t(s, dir, "events"),
      "event_type", "value", "event_id", sampleK)
  private val q78Sql = {
    val smp = Sampling.bottomKByHashSql(
      "event_type, value", "events", "event_type", "event_id")
    s"""WITH smp AS (
       |  $smp)
       |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_sample,
       |  quantile_cont(value, 0.5) AS p50,
       |  quantile_cont(value, 0.9) AS p90,
       |  quantile_cont(value, 0.99) AS p99
       |FROM smp WHERE rn <= $sampleK
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q70_grouped_quantiles" -> q70,
    "q78_sampled_quantiles" -> q78,
    "q62_window_frames" -> q62,
    "q52_unpivot_stack" -> q52,
    "q53_json_roundtrip" -> q53,
    "q49_left_outer_counts" -> q49,
    "q45_full_row_dedup" -> q45,
    "q46_grouping_sets" -> q46,
    "q47_array_functions" -> q47,
    "q48_multiset_setops" -> q48)

  val oracleSql: Map[String, String] = Map(
    "q70_grouped_quantiles" -> q70Sql,
    "q78_sampled_quantiles" -> q78Sql,
    "q52_unpivot_stack" -> q52Sql,
    "q53_json_roundtrip" -> q53Sql,
    "q49_left_outer_counts" -> q49Sql,
    "q45_full_row_dedup" -> q45Sql,
    "q46_grouping_sets" -> q46Sql,
    "q47_array_functions" -> q47Sql,
    "q48_multiset_setops" -> q48Sql,
    "q62_window_frames" -> q62Sql)
}
