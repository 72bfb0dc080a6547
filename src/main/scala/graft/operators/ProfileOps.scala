package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Data-quality profiling — the audit stage a production pipeline runs
  * before trusting a new batch (the Deequ/expectations shape, reduced to
  * engine-pure aggregates): per column, row/null/distinct counts and
  * numeric bounds, all computed in ONE pass over the table.
  */
object ProfileOps {
  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- q97
  /** Column profile of `events`: one row per column with total rows,
    * nulls, exact distinct count, and numeric min/max (timestamps as
    * epoch-microseconds, strings as null — double formatting never
    * crosses an engine boundary). Everything folds into a single
    * aggregate row that `stack` unpivots, so the table is scanned once.
    *
    * Scale: one two-phase aggregate; the distinct counts are the only
    * expensive members (exact per-column distinct = one expand +
    * partial aggregate each — the documented approximate path is HLL
    * (q27) when exactness isn't contractual). The unpivot runs over a
    * 1-row frame. */
  private val profCols: Seq[(String, String)] = Seq(
    // (column, kind) — kind picks the numeric min/max rendering
    "event_id" -> "long", "user_id" -> "long", "event_type" -> "str",
    "value" -> "double", "ts" -> "micros", "props" -> "str")

  private val q97: Q = (s, dir) => {
    import s.implicits._
    val e = Tables(s, dir, "events")
    def num(c: String, kind: String): (Column, Column) = kind match {
      case "long" | "double" =>
        (min(col(c)).cast("double"), max(col(c)).cast("double"))
      case "micros" =>
        (min(unix_micros(col(c))).cast("double"),
          max(unix_micros(col(c))).cast("double"))
      case _ =>
        (min(lit(null).cast("double")), max(lit(null).cast("double")))
    }
    val aggs = profCols.flatMap { case (c, kind) =>
      val (mn, mx) = num(c, kind)
      Seq(count(col(c)).as(s"nn_$c"),
        count_distinct(col(c)).as(s"nd_$c"),
        mn.as(s"mn_$c"), mx.as(s"mx_$c"))
    } :+ count(lit(1)).as("n_rows")
    val one = e.agg(aggs.head, aggs.tail: _*)
    val stacked = profCols.map { case (c, _) =>
      s"'$c', n_rows, n_rows - nn_$c, nd_$c, mn_$c, mx_$c"
    }.mkString(", ")
    one.selectExpr(s"stack(${profCols.size}, $stacked) AS " +
        "(column_name, n_rows, n_nulls, n_distinct, min_num, max_num)")
      .selectExpr("column_name", "CAST(n_rows AS BIGINT) AS n_rows",
        "CAST(n_nulls AS BIGINT) AS n_nulls",
        "CAST(n_distinct AS BIGINT) AS n_distinct",
        "min_num", "max_num")
      .orderBy("column_name")
  }
  private val q97Sql = {
    val selects = profCols.map { case (c, kind) =>
      val (mn, mx) = kind match {
        case "long" | "double" =>
          (s"CAST(MIN($c) AS DOUBLE)", s"CAST(MAX($c) AS DOUBLE)")
        case "micros" =>
          (s"CAST(MIN(epoch_us($c)) AS DOUBLE)",
            s"CAST(MAX(epoch_us($c)) AS DOUBLE)")
        case _ => ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)")
      }
      s"""SELECT '$c' AS column_name,
         |  CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_nulls,
         |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  $mn AS min_num, $mx AS max_num
         |FROM events""".stripMargin
    }
    selects.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  }

  val queries: Map[String, Q] = Map("q97_data_profile" -> q97)
  val oracleSql: Map[String, String] = Map("q97_data_profile" -> q97Sql)
}
