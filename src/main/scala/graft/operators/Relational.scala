package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.Exact._
import graft.sources.Tables

/** Relational operator suite over the TPC-H-ish tables (repo:TESTDATA.md).
  *
  * The reference contains no joins / GROUP BY / windows / sorts / set-ops
  * (SURVEY.md §2.11); these come from the driver-mandated extension
  * (SURVEY.md §2.10) and give the engine its relational core.
  *
  * Scale notes (designed for 100 TB, tested at sf≤0.1):
  *  - `nation`/`region`/`part`/`supplier` are dimension tables → explicit
  *    `broadcast()` so the fact-table join never shuffles the big side.
  *  - fact-fact joins (orders⋈lineitem) shuffle on the join key — that is
  *    the correct plan at scale; AQE handles skew.
  *  - every aggregate over doubles uses decimal accumulation (Exact.dsum)
  *    so results are order-independent → stable across any cluster size.
  *  - every query ends in a deterministic total ORDER BY for the oracle
  *    hash-compare (SURVEY.md §7.5.4).
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** revenue expression used by several queries; SQL mirror below */
  private def revenue(s: SparkSession) = {
    import s.implicits._
    $"l_extendedprice" * (lit(1.0) - $"l_discount")
  }
  private val revenueSql = "l_extendedprice * (1.0 - l_discount)"

  // ---------------------------------------------------------------- q01
  /** TPC-H Q1-shaped pricing summary: grouped aggregate with exact sums.
    * Map-side partial aggregation + single shuffle on the (tiny) group key. */
  private val q01: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "lineitem")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        dsum(revenue(s)).as("sum_disc_price"),
        davg($"l_quantity").as("avg_qty"),
        davg($"l_extendedprice").as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }
  private val q01Sql =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sqlSum("l_quantity")} AS sum_qty,
       |  ${sqlSum("l_extendedprice")} AS sum_base_price,
       |  ${sqlSum(revenueSql)} AS sum_disc_price,
       |  ${sqlAvg("l_quantity")} AS avg_qty,
       |  ${sqlAvg("l_extendedprice")} AS avg_price,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q02
  /** 5-way join: fact tables shuffled on keys, dims broadcast. The widest
    * table (lineitem) is pre-aggregated per order key BEFORE any join —
    * partial decimal sums are exact, so this is semantics-preserving — and
    * its shuffle carries 3 narrow columns instead of full rows; the
    * orderkey partitioning feeds the orders join without a re-shuffle.
    * At 100 TB this turns the |lineitem|-row join into an |orders|-row
    * join. */
  private val q02: Q = (s, dir) => {
    import s.implicits._
    val lpart = t(s, dir, "lineitem")
      .groupBy($"l_orderkey")
      .agg(sum(revenue(s).cast("decimal(38,4)")).as("__rev"),
        count(lit(1)).as("__n"))
    t(s, dir, "orders").select($"o_orderkey", $"o_custkey")
      .join(lpart, $"o_orderkey" === $"l_orderkey")
      .join(t(s, dir, "customer").select($"c_custkey", $"c_nationkey"),
        $"c_custkey" === $"o_custkey")
      .join(broadcast(t(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(t(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(sum($"__rev").cast("double").as("revenue"),
        sum($"__n").as("n_items"))
      .orderBy($"r_name", $"n_name")
  }
  private val q02Sql =
    s"""SELECT r_name, n_name,
       |  ${sqlSum(revenueSql)} AS revenue,
       |  COUNT(*) AS n_items
       |FROM customer
       |JOIN orders   ON c_custkey = o_custkey
       |JOIN lineitem ON o_orderkey = l_orderkey
       |JOIN nation   ON c_nationkey = n_nationkey
       |JOIN region   ON n_regionkey = r_regionkey
       |GROUP BY r_name, n_name
       |ORDER BY r_name, n_name""".stripMargin

  // ---------------------------------------------------------------- q03
  /** Broadcast dimension join: part is small at every SF → broadcast. */
  private val q03: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")), $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        count(lit(1)).as("n_lines"),
        davg($"l_extendedprice").as("avg_price"))
      .orderBy($"p_brand")
  }
  private val q03Sql =
    s"""SELECT p_brand,
       |  ${sqlSum("l_quantity")} AS sum_qty,
       |  COUNT(*) AS n_lines,
       |  ${sqlAvg("l_extendedprice")} AS avg_price
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY p_brand
       |ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------- q04
  /** Semi join (EXISTS): filter pushed below the join, no row duplication. */
  private val q04: Q = (s, dir) => {
    import s.implicits._
    val bigLines = t(s, dir, "lineitem").filter($"l_quantity" >= 45)
    t(s, dir, "orders")
      .join(bigLines, $"o_orderkey" === $"l_orderkey", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy($"o_orderpriority")
  }
  private val q04Sql =
    """SELECT o_orderpriority, COUNT(*) AS n_orders
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q05
  /** Anti join (NOT EXISTS): customers that never placed a high-value order. */
  private val q05: Q = (s, dir) => {
    import s.implicits._
    val bigOrders = t(s, dir, "orders").filter($"o_totalprice" > 300000.0)
    t(s, dir, "customer")
      .join(bigOrders, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"), dsum($"c_acctbal").as("sum_acctbal"))
      .orderBy($"c_mktsegment")
  }
  private val q05Sql =
    s"""SELECT c_mktsegment, COUNT(*) AS n_customers,
       |  ${sqlSum("c_acctbal")} AS sum_acctbal
       |FROM customer
       |WHERE NOT EXISTS (SELECT 1 FROM orders
       |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
       |GROUP BY c_mktsegment
       |ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q06
  /** Ranking window: top-3 orders per customer. Single shuffle on the
    * partition key; deterministic tiebreak (o_orderkey) in the frame order. */
  private val q06: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
      .orderBy($"o_custkey", $"rn")
  }
  private val q06Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn
      |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
      |             ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |      FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  // ---------------------------------------------------------------- q07
  /** Running-total window with exact (decimal) accumulation, so the frame
    * evaluation strategy (running vs segment tree) cannot change the value.
    * The window order extends through the price columns because the
    * synthetic lineitem table does NOT have a unique (orderkey, linenumber)
    * key (~2% duplicated at every SF, and one sf0.1 pair collides on
    * suppkey+shipdate too) — a tie in a running-sum order makes the
    * prefix sums engine-order-dependent; the full value tuple is unique. */
  private val q07: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"l_suppkey")
      .orderBy($"l_shipdate".asc, $"l_orderkey".asc, $"l_linenumber".asc,
        $"l_extendedprice".asc, $"l_discount".asc, $"l_quantity".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "lineitem")
      .select(
        $"l_suppkey", $"l_orderkey", $"l_linenumber",
        $"l_shipdate".cast("date").as("ship_date"),
        sum(revenue(s).cast(DecimalType(38, 4))).over(w)
          .cast("double").as("running_rev"))
      // running_rev closes the output order: the duplicate-key pair ties
      // on all four name columns but carries distinct prefix sums
      .orderBy($"l_suppkey", $"ship_date", $"l_orderkey", $"l_linenumber",
        $"running_rev")
  }
  private val q07Sql =
    s"""SELECT l_suppkey, l_orderkey, l_linenumber,
       |  CAST(l_shipdate AS DATE) AS ship_date,
       |  CAST(SUM(CAST(($revenueSql) AS DECIMAL(38,4)))
       |       OVER (PARTITION BY l_suppkey
       |             ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC,
       |                      l_extendedprice ASC, l_discount ASC, l_quantity ASC
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
       |    AS running_rev
       |FROM lineitem
       |ORDER BY l_suppkey, ship_date, l_orderkey, l_linenumber,
       |         running_rev""".stripMargin

  // ---------------------------------------------------------------- q08
  /** ROLLUP grouping sets; grouping nulls folded to 'ALL' to keep ordering
    * semantics identical across engines (Spark sorts nulls first, DuckDB last). */
  private val q08: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "lineitem")
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"), dsum($"l_quantity").as("sum_qty"))
      .select(
        coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
        coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
        $"n", $"sum_qty")
      .orderBy($"returnflag", $"linestatus")
  }
  private val q08Sql =
    s"""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       |       COALESCE(l_linestatus, 'ALL') AS linestatus,
       |       COUNT(*) AS n,
       |       ${sqlSum("l_quantity")} AS sum_qty
       |FROM lineitem
       |GROUP BY ROLLUP(l_returnflag, l_linestatus)
       |ORDER BY returnflag, linestatus""".stripMargin

  // ---------------------------------------------------------------- q09
  /** Set operations: INTERSECT / EXCEPT / UNION ALL over nation keys. */
  private val q09: Q = (s, dir) => {
    import s.implicits._
    val cn = t(s, dir, "customer").select($"c_nationkey".as("nationkey"))
    val sn = t(s, dir, "supplier").select($"s_nationkey".as("nationkey"))
    cn.intersect(sn).withColumn("tag", lit("both"))
      .union(cn.except(sn).withColumn("tag", lit("customers_only")))
      .union(sn.except(cn).withColumn("tag", lit("suppliers_only")))
      .select($"tag", $"nationkey")
      .orderBy($"tag", $"nationkey")
  }
  private val q09Sql =
    """SELECT tag, nationkey FROM (
      |  SELECT 'both' AS tag, nationkey
      |  FROM (SELECT c_nationkey AS nationkey FROM customer
      |        INTERSECT SELECT s_nationkey FROM supplier)
      |  UNION ALL
      |  SELECT 'customers_only' AS tag, nationkey
      |  FROM (SELECT c_nationkey AS nationkey FROM customer
      |        EXCEPT SELECT s_nationkey FROM supplier)
      |  UNION ALL
      |  SELECT 'suppliers_only' AS tag, nationkey
      |  FROM (SELECT s_nationkey AS nationkey FROM supplier
      |        EXCEPT SELECT c_nationkey FROM customer))
      |ORDER BY tag, nationkey""".stripMargin

  // ---------------------------------------------------------------- q10
  /** Top-K by value with a unique tiebreak: TakeOrderedAndProject — no full
    * sort, each partition keeps K rows, driver merges. l_quantity closes
    * the tiebreak chain: (orderkey, linenumber) is NOT unique in the
    * synthetic lineitem, so a boundary tie on the first three keys could
    * otherwise admit either of two rows with different quantities. */
  private val q10: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice", $"l_quantity")
      .orderBy($"l_extendedprice".desc, $"l_orderkey".asc, $"l_linenumber".asc,
        $"l_quantity".asc)
      .limit(10)
  }
  private val q10Sql =
    """SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity
      |FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC,
      |         l_quantity ASC
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q11
  /** Date extraction + conditional aggregation per order year. */
  private val q11: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "orders")
      .groupBy(year($"o_orderdate").as("order_year"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(when($"o_orderstatus" === "F", 1L).otherwise(0L)).as("n_finished"),
        dsum($"o_totalprice").as("sum_price"),
        max($"o_totalprice").as("max_price"))
      .orderBy($"order_year")
  }
  private val q11Sql =
    s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
       |  COUNT(*) AS n_orders,
       |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
       |  ${sqlSum("o_totalprice")} AS sum_price,
       |  MAX(o_totalprice) AS max_price
       |FROM orders
       |GROUP BY 1
       |ORDER BY order_year""".stripMargin

  // ---------------------------------------------------------------- q12
  /** Scalar string functions — all codegen'd builtins, no UDFs. */
  private val q12: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "part")
      .select(
        $"p_partkey",
        upper($"p_name").as("name_upper"),
        length($"p_name").cast("long").as("name_len"),
        substring($"p_type", 1, 5).as("type_prefix"),
        concat_ws("-", $"p_brand", $"p_type").as("brand_type"),
        regexp_replace(lower($"p_name"), " ", "_").as("slug"))
      .orderBy($"p_partkey")
  }
  private val q12Sql =
    """SELECT p_partkey,
      |  UPPER(p_name) AS name_upper,
      |  CAST(LENGTH(p_name) AS BIGINT) AS name_len,
      |  SUBSTR(p_type, 1, 5) AS type_prefix,
      |  CONCAT_WS('-', p_brand, p_type) AS brand_type,
      |  REPLACE(LOWER(p_name), ' ', '_') AS slug
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- q13
  /** DISTINCT projection (shuffle dedup on the pair). */
  private val q13: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "lineitem")
      .select($"l_returnflag", $"l_linestatus")
      .distinct()
      .orderBy($"l_returnflag", $"l_linestatus")
  }
  private val q13Sql =
    """SELECT DISTINCT l_returnflag, l_linestatus
      |FROM lineitem
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  val queries: Map[String, Q] = Map(
    "q01_pricing_summary" -> q01,
    "q02_revenue_by_nation" -> q02,
    "q03_brand_volume" -> q03,
    "q04_priority_semi_join" -> q04,
    "q05_customers_without_orders" -> q05,
    "q06_top_orders_per_customer" -> q06,
    "q07_supplier_running_revenue" -> q07,
    "q08_rollup_flags" -> q08,
    "q09_setops_nations" -> q09,
    "q10_topk_lineitems" -> q10,
    "q11_orders_yearly" -> q11,
    "q12_part_strings" -> q12,
    "q13_distinct_flags" -> q13)

  val oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" -> q01Sql,
    "q02_revenue_by_nation" -> q02Sql,
    "q03_brand_volume" -> q03Sql,
    "q04_priority_semi_join" -> q04Sql,
    "q05_customers_without_orders" -> q05Sql,
    "q06_top_orders_per_customer" -> q06Sql,
    "q07_supplier_running_revenue" -> q07Sql,
    "q08_rollup_flags" -> q08Sql,
    "q09_setops_nations" -> q09Sql,
    "q10_topk_lineitems" -> q10Sql,
    "q11_orders_yearly" -> q11Sql,
    "q12_part_strings" -> q12Sql,
    "q13_distinct_flags" -> q13Sql)
}
