package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Declarative data-quality expectations — the validation gate a training
  * pipeline runs before consuming a table (the reference's
  * verify-every-event posture, pipeline.py:96-102, generalized from
  * per-row filters to table-level contracts). Each expectation compiles
  * to a conditional aggregate; all ROW-LOCAL expectations over one table
  * evaluate in a SINGLE pass (one scan, one partial-aggregated reduce —
  * no per-constraint jobs), and set-level expectations (uniqueness,
  * referential integrity) evaluate as the minimal grouped/anti-join
  * aggregates they require, unioned into one report.
  *
  * Scale shape: a 100 TB table pays one scan for any number of row-local
  * constraints; uniqueness shuffles once on the key; referential
  * integrity is a broadcast or shuffled anti-join on the key — all
  * map-side-combinable counts, nothing driver-sized.
  */
object Expectations {
  type Q = (SparkSession, String) => DataFrame

  /** One table-level contract: `name` labels the report row, `violates`
    * is a row-local predicate that is TRUE when a row breaks the
    * contract. */
  final case class Expect(name: String, violates: Column)

  def notNull(name: String, c: Column): Expect =
    Expect(name, c.isNull)
  def inRange(name: String, c: Column, lo: Double, hi: Double): Expect =
    Expect(name, c.isNull || c < lo || c > hi)
  def matches(name: String, c: Column, regex: String): Expect =
    Expect(name, c.isNull || !c.rlike(regex))

  /** Row-local expectations over one table in ONE pass: each constraint
    * becomes a `sum(case when violates)` column of a single aggregate,
    * then the one result row unpivots to (expectation, violations)
    * rows. Returns (expectation, violations, total, pass). */
  def report(df: DataFrame, exps: Seq[Expect]): DataFrame = {
    require(exps.nonEmpty, "at least one expectation")
    val aggs = count(lit(1)).cast("long").as("__total") +:
      exps.map(e => sum(when(e.violates, 1L).otherwise(0L))
        .cast("long").as(e.name))
    val row = df.agg(aggs.head, aggs.tail: _*)
    row.unpivot(Array(col("__total")), exps.map(e => col(e.name)).toArray,
        "expectation", "violations")
      .select(col("expectation"), col("violations"),
        col("__total").as("total"),
        (col("violations") === 0L).as("pass"))
  }

  /** Set-level: `keyCols` form a unique key — violations = rows beyond
    * the first of each duplicated key (one shuffle on the key,
    * map-side-combinable counts). */
  def unique(df: DataFrame, name: String,
      keyCols: Seq[String]): DataFrame = {
    val total = df.groupBy().agg(count(lit(1)).cast("long").as("total"))
    val dups = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .agg(coalesce(sum(col("n") - 1L), lit(0L)).cast("long")
        .as("violations"))
    dups.crossJoin(total)
      .select(lit(name).as("expectation"), col("violations"), col("total"),
        (col("violations") === 0L).as("pass"))
  }

  /** Set-level: every non-null `fkCol` value exists in `ref`'s `pkCol`
    * (the referential-integrity contract; an anti-join count). */
  def references(df: DataFrame, name: String, fkCol: String,
      ref: DataFrame, pkCol: String): DataFrame = {
    val total = df.groupBy().agg(count(lit(1)).cast("long").as("total"))
    val orphans = df.filter(col(fkCol).isNotNull)
      .join(ref.select(col(pkCol)).distinct(),
        col(fkCol) === col(pkCol), "left_anti")
      .groupBy().agg(count(lit(1)).cast("long").as("violations"))
    orphans.crossJoin(total)
      .select(lit(name).as("expectation"), col("violations"), col("total"),
        (col("violations") === 0L).as("pass"))
  }

  // ------------------------------------------------- incremental gate
  /** Incremental row-local gate over an append-only
    * [[graft.sinks.ManifestSink]] history: violation counts and row
    * totals are SUMS over rows, so the report at `toV` = the report at
    * `fromV` + the report over exactly the batches the manifest diff
    * names ([[graft.sinks.ManifestSink.changes]] — zero data reads to
    * plan). A daily quality check on a 100 TB table then scans one day's
    * arrivals, not the corpus ([[graft.sinks.IncrementalAgg]]'s identity
    * applied to the quality report). Refuses non-append histories — a
    * rewrite can retract violations, which a fold cannot see; recompute
    * from the snapshot then (same contract as IncrementalAgg.refresh).
    * `state` None means "from empty" (fromV = -1 bootstraps). */
  def refreshRowLocal(spark: SparkSession, state: Option[DataFrame],
      tableDir: String, fromV: Long, toV: Long,
      exps: Seq[Expect]): DataFrame = {
    val (_, removed) =
      graft.sinks.ManifestSink.changedEntries(spark, tableDir, fromV, toV)
    require(removed.isEmpty,
      s"history $fromV→$toV removed entries $removed: " +
        "recompute the report from the snapshot instead")
    val delta = report(
      graft.sinks.ManifestSink.changes(spark, tableDir, fromV, toV), exps)
    state.fold(delta)(st => st.unionByName(delta)
      .groupBy(col("expectation"))
      .agg(sum(col("violations")).cast("long").as("violations"),
        sum(col("total")).cast("long").as("total"))
      .select(col("expectation"), col("violations"), col("total"),
        (col("violations") === 0L).as("pass")))
  }

  /** Per-key count state for INCREMENTAL uniqueness — the one set-level
    * contract that maintains under appends, at the price of key-sized
    * state (row-local state is report-sized): new batches fold per-key
    * counts into the state, and Σ(n−1) over keys with n > 1 reads the
    * violation count off the state without touching the table. */
  def uniqueState(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("__n"))

  /** Fold the manifest-diff batches' per-key counts into `state` (same
    * append-only contract as [[refreshRowLocal]]). */
  def refreshUnique(spark: SparkSession, state: Option[DataFrame],
      tableDir: String, fromV: Long, toV: Long,
      keyCols: Seq[String]): DataFrame = {
    val (_, removed) =
      graft.sinks.ManifestSink.changedEntries(spark, tableDir, fromV, toV)
    require(removed.isEmpty,
      s"history $fromV→$toV removed entries $removed: " +
        "recompute the state from the snapshot instead")
    val delta = uniqueState(
      graft.sinks.ManifestSink.changes(spark, tableDir, fromV, toV), keyCols)
    state.fold(delta)(st => st.unionByName(delta)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__n")).cast("long").as("__n")))
  }

  /** The (expectation, violations, total, pass) row the per-key state
    * implies — interchangeable with [[unique]] run on the full table. */
  def uniqueReportFromState(state: DataFrame, name: String): DataFrame =
    state.agg(
        coalesce(sum(col("__n") - 1L), lit(0L)).cast("long")
          .as("violations"),
        coalesce(sum(col("__n")), lit(0L)).cast("long").as("total"))
      .select(lit(name).as("expectation"), col("violations"), col("total"),
        (col("violations") === 0L).as("pass"))

  // ------------------------------------------------- quarantine split
  /** Enforce row-local expectations as a WRITE GATE: split a batch into
    * passing rows and quarantined violators (each violator labeled with
    * the FIRST failed expectation, in declaration order — deterministic,
    * so both the split and the labels are oracle-able). Both sides are
    * plain filters over one scan each; at 100 TB the split is map-side
    * work at the scan with no shuffle at all — the
    * expectations-with-quarantine action of declarative pipeline
    * frameworks, where bad rows are retained for triage instead of
    * silently dropped. */
  def quarantine(df: DataFrame,
      exps: Seq[Expect]): (DataFrame, DataFrame) = {
    require(exps.nonEmpty, "at least one expectation")
    val anyViolation = exps.map(_.violates).reduce(_ || _)
    val firstFailed = exps.reverse.foldLeft(lit(null).cast("string")) {
      (acc, e) => when(e.violates, lit(e.name)).otherwise(acc)
    }
    val pass = df.filter(!coalesce(anyViolation, lit(false)))
    val quarantined = df.filter(coalesce(anyViolation, lit(false)))
      .withColumn("failed_expectation", firstFailed)
    (pass, quarantined)
  }

  // --------------------------------------------------------------- q122
  /** The expectations gate over the TPC-H-ish fixture: row-local
    * contracts on lineitem evaluate in one scan (quantity range, price
    * positivity, flag vocabulary, date ordering), plus a uniqueness
    * contract on orders' key and lineitem→orders referential integrity —
    * the exact report a pipeline would gate a training run on. The
    * deliberate seeded violations (duplicate lineitem keys exist in the
    * fixture) keep the report honest: `pass` is computed, not assumed. */
  private val q122: Q = (s, dir) => {
    val li = Tables(s, dir, "lineitem")
    val orders = Tables(s, dir, "orders")
    val rowLocal = report(li, Seq(
      inRange("li_quantity_1_50", col("l_quantity"), 1, 50),
      Expect("li_price_positive",
        col("l_extendedprice").isNull || col("l_extendedprice") <= 0),
      matches("li_returnflag_vocab", col("l_returnflag"), "^[ARN]$"),
      inRange("li_discount_fraction", col("l_discount"), 0, 1)))
    val uniq = unique(li, "li_key_unique",
      Seq("l_orderkey", "l_linenumber"))
    val fk = references(li, "li_orderkey_references_orders",
      "l_orderkey", orders, "o_orderkey")
    rowLocal.unionByName(uniq).unionByName(fk)
      .orderBy(col("expectation"))
  }
  private val q122Sql =
    """WITH rowlocal AS (
      |  SELECT
      |    CAST(COUNT(*) AS BIGINT) AS total,
      |    CAST(SUM(CASE WHEN l_quantity IS NULL OR l_quantity < 1
      |      OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS li_quantity_1_50,
      |    CAST(SUM(CASE WHEN l_extendedprice IS NULL
      |      OR l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS li_price_positive,
      |    CAST(SUM(CASE WHEN l_returnflag IS NULL
      |      OR NOT regexp_matches(l_returnflag, '^[ARN]$')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS li_returnflag_vocab,
      |    CAST(SUM(CASE WHEN l_discount IS NULL OR l_discount < 0
      |      OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS li_discount_fraction
      |  FROM lineitem),
      |melted AS (
      |  SELECT 'li_quantity_1_50' AS expectation, li_quantity_1_50 AS violations, total FROM rowlocal
      |  UNION ALL
      |  SELECT 'li_price_positive', li_price_positive, total FROM rowlocal
      |  UNION ALL
      |  SELECT 'li_returnflag_vocab', li_returnflag_vocab, total FROM rowlocal
      |  UNION ALL
      |  SELECT 'li_discount_fraction', li_discount_fraction, total FROM rowlocal
      |  UNION ALL
      |  SELECT 'li_key_unique',
      |    CAST(COALESCE((SELECT SUM(n - 1) FROM (
      |      SELECT COUNT(*) AS n FROM lineitem
      |      GROUP BY l_orderkey, l_linenumber) g WHERE n > 1), 0) AS BIGINT),
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem)
      |  UNION ALL
      |  SELECT 'li_orderkey_references_orders',
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
      |     WHERE l.l_orderkey IS NOT NULL
      |       AND NOT EXISTS (SELECT 1 FROM orders o
      |                       WHERE o.o_orderkey = l.l_orderkey)),
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem))
      |SELECT expectation, violations, total,
      |  violations = 0 AS pass
      |FROM melted
      |ORDER BY expectation""".stripMargin

  val queries: Map[String, Q] = Map(
    "q122_expectations_gate" -> q122)

  val oracleSql: Map[String, String] = Map(
    "q122_expectations_gate" -> q122Sql)
}
