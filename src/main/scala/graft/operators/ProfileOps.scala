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

  // --------------------------------------------------------------- q107
  /** Referential-integrity audit over the star schema: for each declared
    * relationship, BOTH directions of breakage — child rows whose key has
    * no parent (orphans; a real FK violation, expected 0 on intact data
    * — the zeros ARE the assertion) and parent keys no child references
    * (childless; genuine coverage gaps, e.g. customers who never
    * ordered). The events.user_id -> customer edge audits the one
    * relationship the schema never declared.
    *
    * Scale: each edge aggregates the child side to (key, count) BEFORE
    * the join (two-phase agg, one key shuffle), full-outer joins the
    * parent's key set, and reduces to one row — per-edge cost is one
    * key-partitioned join, and the audit output is edge-count-sized. */
  private val fkEdges: Seq[(String, String, String, String, String)] = Seq(
    ("events.user_id -> customer", "events", "user_id",
      "customer", "c_custkey"),
    ("lineitem.l_orderkey -> orders", "lineitem", "l_orderkey",
      "orders", "o_orderkey"),
    ("lineitem.l_partkey -> part", "lineitem", "l_partkey",
      "part", "p_partkey"),
    ("orders.o_custkey -> customer", "orders", "o_custkey",
      "customer", "c_custkey"))

  private val q107: Q = (s, dir) => {
    val per = fkEdges.map { case (label, ct, ck, pt, pk) =>
      // NULL keys are EXCLUDED on both sides, explicitly and identically
      // in both engines: a NULL FK is not a reference (SQL FK semantics —
      // it can be neither an orphan nor a match), and a NULL parent key
      // can't be referenced. Without the filters the engines disagree on
      // dirty data: Spark's full-outer join emits the NULL-key rows and
      // the hit/cnt tests count them, while the oracle's COUNT(p.k) and
      // equi-join skip them. The outer coalesce keeps the sums 0 (not
      // NULL) over an empty edge, matching COALESCE(SUM(..), 0).
      val child = Tables(s, dir, ct).filter(col(ck).isNotNull)
        .groupBy(col(ck).as("k")).agg(count(lit(1)).as("cnt"))
      val parent = Tables(s, dir, pt).filter(col(pk).isNotNull)
        .select(col(pk).as("k")).distinct().withColumn("hit", lit(1))
      child.join(parent, Seq("k"), "full_outer")
        .agg(
          coalesce(sum(coalesce(col("cnt"), lit(0L))), lit(0L))
            .as("n_child"),
          coalesce(sum(when(col("hit").isNull, col("cnt"))
            .otherwise(lit(0L))), lit(0L)).as("n_orphan_child"),
          count(col("hit")).as("n_parent"),
          count(when(col("hit").isNotNull && col("cnt").isNull, 1))
            .as("n_childless_parent"))
        .selectExpr(s"'$label' AS fk",
          "CAST(n_child AS BIGINT) AS n_child",
          "CAST(n_orphan_child AS BIGINT) AS n_orphan_child",
          "CAST(n_parent AS BIGINT) AS n_parent",
          "CAST(n_childless_parent AS BIGINT) AS n_childless_parent")
    }
    per.reduce(_ unionByName _).orderBy(col("fk"))
  }
  private val q107Sql = fkEdges.map { case (label, ct, ck, pt, pk) =>
    s"""SELECT '$label' AS fk,
       |  CAST(COALESCE(SUM(c.cnt), 0) AS BIGINT) AS n_child,
       |  CAST(COALESCE(SUM(CASE WHEN p.k IS NULL THEN c.cnt
       |    ELSE 0 END), 0) AS BIGINT) AS n_orphan_child,
       |  CAST(COUNT(p.k) AS BIGINT) AS n_parent,
       |  CAST(COUNT(CASE WHEN p.k IS NOT NULL AND c.k IS NULL
       |    THEN 1 END) AS BIGINT) AS n_childless_parent
       |FROM (SELECT $ck AS k, COUNT(*) AS cnt FROM $ct
       |      WHERE $ck IS NOT NULL GROUP BY 1) c
       |FULL OUTER JOIN (SELECT DISTINCT $pk AS k FROM $pt
       |                 WHERE $pk IS NOT NULL) p
       |  ON c.k = p.k""".stripMargin
  }.mkString("", "\nUNION ALL\n", "\nORDER BY fk")

  // --------------------------------------------------------------- q142
  /** Distribution DRIFT report — the train/serve-skew monitor every
    * production feature pipeline runs: the first week of events is the
    * reference window, the rest is current; `value` buckets into 10
    * equal-width bins over the GLOBAL range (fixed bins, so both
    * windows are measured on the same ruler), and each bin reports both
    * windows' counts, probability masses, and the |p_ref − p_cur| L1
    * contribution. L1 (total variation ×2) instead of PSI/KL
    * deliberately: it needs no logarithm — `ln` is not guaranteed
    * correctly-rounded and may differ between engines, while
    * subtraction/abs are exact — so the whole report stays bit-exact
    * cross-engine.
    *
    * Scale: ONE conditional two-phase aggregate over the table (bin +
    * window flag are row-local), 10 output rows; the min/max bounds are
    * one columnar min/max job. */
  private val q142: Q = (s, dir) => {
    import s.implicits._
    val e = Tables(s, dir, "events")
    val b = e.agg(min($"value"), max($"value")).head()
    val (mn, mx) = (b.getDouble(0), b.getDouble(1))
    val cutUs = java.time.Instant.parse("2024-01-08T00:00:00Z")
      .getEpochSecond * 1000000L
    val bucket = least(lit(9L), greatest(lit(0L),
      floor(($"value" - lit(mn)) / lit(mx - mn) * 10).cast("long")))
    val agg = e
      .withColumn("bucket", bucket)
      .withColumn("is_ref", unix_micros($"ts") < cutUs)
      .groupBy($"bucket")
      .agg(sum(when($"is_ref", 1L).otherwise(0L)).as("n_ref"),
        sum(when(!$"is_ref", 1L).otherwise(0L)).as("n_cur"))
    val tot = agg.agg(sum($"n_ref"), sum($"n_cur")).head()
    val (tr, tc) = (tot.getLong(0), tot.getLong(1))
    agg
      .withColumn("p_ref", $"n_ref".cast("double") / lit(tr.toDouble))
      .withColumn("p_cur", $"n_cur".cast("double") / lit(tc.toDouble))
      .withColumn("l1_contrib", abs($"p_ref" - $"p_cur"))
      .orderBy($"bucket")
  }
  private val q142Sql =
    """WITH bounds AS (
      |  SELECT MIN("value") AS mn, MAX("value") AS mx FROM events),
      |binned AS (
      |  SELECT
      |    LEAST(9, GREATEST(0, CAST(floor(
      |      ("value" - mn) / (mx - mn) * 10) AS BIGINT))) AS bucket,
      |    ts < TIMESTAMP '2024-01-08 00:00:00' AS is_ref
      |  FROM events CROSS JOIN bounds),
      |agg AS (
      |  SELECT bucket,
      |    CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_ref,
      |    CAST(SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_cur
      |  FROM binned GROUP BY bucket),
      |tot AS (
      |  SELECT CAST(SUM(n_ref) AS DOUBLE) AS tr,
      |         CAST(SUM(n_cur) AS DOUBLE) AS tc FROM agg)
      |SELECT bucket, n_ref, n_cur,
      |  CAST(n_ref AS DOUBLE) / tr AS p_ref,
      |  CAST(n_cur AS DOUBLE) / tc AS p_cur,
      |  abs(CAST(n_ref AS DOUBLE) / tr - CAST(n_cur AS DOUBLE) / tc)
      |    AS l1_contrib
      |FROM agg CROSS JOIN tot
      |ORDER BY bucket""".stripMargin

  // --------------------------------------------------------------- q145
  /** k-anonymity audit — the re-identification gate a pipeline runs
    * before releasing or training on user-adjacent tables (Sweeney 2002:
    * a row is k-anonymous when at least k rows share its quasi-identifier
    * combination): equivalence classes over (nation, market segment,
    * account-balance band), each reporting its size and whether it meets
    * k = 5. The balance band (floor(bal/2000)) is the generalization
    * step — auditing the RAW balance would make nearly every row its own
    * class; the report tells the curator which strata still need
    * coarsening or suppression before release.
    *
    * Scale: one two-phase groupBy over row-local derived columns; output
    * is equivalence-class-sized. Division/floor on doubles is
    * correctly-rounded IEEE — identical in both engines. */
  private val q145: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "customer")
      .withColumn("bal_band", floor($"c_acctbal" / 2000.0).cast("long"))
      .groupBy($"c_nationkey".cast("long").as("nation"),
        $"c_mktsegment".as("segment"), $"bal_band")
      .agg(count(lit(1)).as("n"))
      .withColumn("k_anonymous", $"n" >= 5)
      .orderBy($"nation", $"segment", $"bal_band")
  }
  private val q145Sql =
    """SELECT CAST(c_nationkey AS BIGINT) AS nation,
      |  c_mktsegment AS segment,
      |  CAST(FLOOR(c_acctbal / 2000.0) AS BIGINT) AS bal_band,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  COUNT(*) >= 5 AS k_anonymous
      |FROM customer
      |GROUP BY 1, 2, 3
      |ORDER BY nation, segment, bal_band""".stripMargin

  // --------------------------------------------------------------- q163
  /** l-DIVERSITY audit (Machanavalajhala et al. ICDE'06 — the successor
    * privacy gate to q145's k-anonymity): a k-anonymous class still
    * leaks when every member shares the same SENSITIVE value, so each
    * quasi-identifier class (q145's (nation, segment, balance-band))
    * must also carry ≥ l DISTINCT sensitive values — here the order
    * priorities observed across the class's customers (joined through
    * orders; customers without orders contribute none). One join + one
    * two-phase distinct aggregate; the report names the classes still
    * below l = 3 so the curator knows where generalization must
    * coarsen further. */
  private val q163: Q = (s, dir) => {
    import s.implicits._
    val c = Tables(s, dir, "customer")
      .withColumn("bal_band", floor($"c_acctbal" / 2000.0).cast("long"))
      .select($"c_nationkey".cast("long").as("nation"),
        $"c_mktsegment".as("segment"), $"bal_band", $"c_custkey")
    val o = Tables(s, dir, "orders")
      .select($"o_custkey".as("c_custkey"), $"o_orderpriority")
    c.join(o, Seq("c_custkey"), "left")
      .groupBy($"nation", $"segment", $"bal_band")
      .agg(countDistinct($"c_custkey").as("n_members"),
        countDistinct($"o_orderpriority").as("l"))
      .withColumn("l_diverse", $"l" >= 3)
      .orderBy($"nation", $"segment", $"bal_band")
  }
  private val q163Sql =
    """SELECT CAST(c.c_nationkey AS BIGINT) AS nation,
      |  c.c_mktsegment AS segment,
      |  CAST(FLOOR(c.c_acctbal / 2000.0) AS BIGINT) AS bal_band,
      |  CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS n_members,
      |  CAST(COUNT(DISTINCT o.o_orderpriority) AS BIGINT) AS l,
      |  COUNT(DISTINCT o.o_orderpriority) >= 3 AS l_diverse
      |FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      |GROUP BY 1, 2, 3
      |ORDER BY nation, segment, bal_band""".stripMargin

  /** WEIGHTED QUANTILES over a bounded-cardinality value column: for
    * each target fraction `num/den`, the smallest value `q` whose
    * cumulative weight first covers the fraction — `cum·den ≥
    * total·num`, exact cross-multiplied long arithmetic, so no float
    * quantile drift across engines. The LLM-
    * pipeline use is quality-filter CALIBRATION: "what score threshold
    * keeps exactly a quarter / half / 90 % of the token mass?" — the
    * question a curation pipeline answers before committing to a filter,
    * asked in token (weight) space rather than document count, because
    * training budgets are token budgets.
    *
    * Plan: ONE corpus scan into per-value (weight, count) totals — the
    * bounded-cardinality contract of q176's strata — then everything
    * downstream (cumulative sums, the per-fraction argmin, the kept
    * tokens/docs AT each threshold) runs over the distinct-value frame.
    * The unpartitioned window is value-cardinality-bounded, never
    * data-bounded (q26's documented pattern); the fraction × cumulative
    * probe is an intentional bounded nested-loop (fracs × values).
    * Returns (num, den, threshold, kept_weight, kept_rows). */
  def weightedQuantiles(df: DataFrame, valueCol: String,
      weightCol: String, fracs: Seq[(Int, Int)]): DataFrame = {
    require(fracs.nonEmpty && fracs.forall { case (n, d) =>
      n >= 1 && n <= d }, s"fractions must satisfy 1 <= num <= den: $fracs")
    val spark = df.sparkSession
    import org.apache.spark.sql.expressions.Window
    val perV = df.groupBy(col(valueCol))
      .agg(sum(col(weightCol)).cast("long").as("__w"),
        count(lit(1)).as("__n"))
    val w = Window.orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perV
      .withColumn("kept_weight", sum(col("__w")).over(w))
      .withColumn("kept_rows", sum(col("__n")).over(w))
    val total = cum.agg(sum(col("__w")).cast("long").as("__total"))
    import spark.implicits._
    val fr = fracs.toDF("num", "den")
    val th = broadcast(fr).crossJoin(broadcast(total))
      .join(cum,
        col("kept_weight") * col("den") >= col("__total") * col("num"))
      .groupBy(col("num"), col("den"))
      .agg(min(col(valueCol)).as("threshold"))
    th.join(cum.withColumnRenamed(valueCol, "threshold"), Seq("threshold"))
      .select(col("num"), col("den"), col("threshold"),
        col("kept_weight"), col("kept_rows"))
  }

  // --------------------------------------------------------------- q183
  /** Filter calibration through the gate: an integer quality proxy over
    * `documents` (n_chars div 16), thresholds for a quarter / half /
    * 90 % of the corpus's TOKEN mass. The emitted (threshold,
    * kept-token, kept-doc) triples must equal the oracle's window
    * cumsum — an off-by-one in the cumulative order, a `>` for a `>=`,
    * or float quantile math all hash-mismatch. */
  private val q183: Q = (s, dir) => {
    import s.implicits._
    val t = Tables(s, dir, "documents").select(
      expr("n_chars div 16").as("score"),
      size(split($"text", " ")).cast("long").as("tok"))
    weightedQuantiles(t, "score", "tok", Seq((1, 4), (1, 2), (9, 10)))
      .select($"num", $"den", $"threshold",
        $"kept_weight".cast("long").as("kept_tokens"),
        $"kept_rows".cast("long").as("kept_docs"))
      .orderBy($"num", $"den")
  }
  private val q183Sql: String =
    s"""WITH t AS (
       |  SELECT n_chars // 16 AS score,
       |    CAST(len(str_split(text, ' ')) AS BIGINT) AS tok
       |  FROM documents),
       |p AS (SELECT score, SUM(tok) AS w, COUNT(*) AS n
       |      FROM t GROUP BY score),
       |c AS (
       |  SELECT score,
       |    SUM(w) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING) AS cum,
       |    SUM(n) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING) AS cumn
       |  FROM p),
       |tot AS (SELECT SUM(tok) AS total FROM t),
       |f(num, den) AS (SELECT * FROM (VALUES (1, 4), (1, 2), (9, 10))),
       |th AS (
       |  SELECT num, den, MIN(score) AS threshold
       |  FROM f, c, tot
       |  WHERE c.cum * den >= tot.total * num
       |  GROUP BY num, den)
       |SELECT th.num, th.den, th.threshold,
       |  CAST(c.cum AS BIGINT) AS kept_tokens,
       |  CAST(c.cumn AS BIGINT) AS kept_docs
       |FROM th JOIN c ON c.score = th.threshold
       |ORDER BY num, den""".stripMargin

  val queries: Map[String, Q] =
    Map("q97_data_profile" -> q97, "q107_referential_audit" -> q107,
      "q142_drift_report" -> q142, "q145_k_anonymity" -> q145,
      "q163_l_diversity" -> q163, "q183_weighted_quantiles" -> q183)
  val oracleSql: Map[String, String] =
    Map("q97_data_profile" -> q97Sql, "q107_referential_audit" -> q107Sql,
      "q142_drift_report" -> q142Sql, "q145_k_anonymity" -> q145Sql,
      "q163_l_diversity" -> q163Sql, "q183_weighted_quantiles" -> q183Sql)
}
