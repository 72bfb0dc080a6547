package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator is registered here as a named query (the
  * driver's correctness gate) with a DuckDB-runnable oracle SQL where the
  * semantics are SQL-expressible (SURVEY.md §5.2.1).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++ operators.Relational2.queries ++
      operators.Relational3.queries ++ operators.Relational4.queries ++
      operators.EventOps.queries ++
      operators.TextOps.queries ++ operators.DedupOps.queries ++
      operators.VectorOps.queries ++ operators.MultimodalOps.queries ++
      operators.AudioOps.queries ++
      operators.RangeJoin.queries ++ operators.TrainingOps.queries ++
      operators.Skew.queries ++ operators.SinkOps.queries ++
      operators.ProfileOps.queries ++ operators.GraphOps.queries ++
      operators.Expectations.queries ++
      streaming.StreamAnalytics.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracleSql ++ operators.Relational2.oracleSql ++
      operators.Relational3.oracleSql ++ operators.Relational4.oracleSql ++
      operators.EventOps.oracleSql ++
      operators.TextOps.oracleSql ++ operators.DedupOps.oracleSql ++
      operators.VectorOps.oracleSql ++ operators.MultimodalOps.oracleSql ++
      operators.AudioOps.oracleSql ++
      operators.RangeJoin.oracleSql ++ operators.TrainingOps.oracleSql ++
      operators.Skew.oracleSql ++ operators.SinkOps.oracleSql ++
      operators.ProfileOps.oracleSql ++ operators.GraphOps.oracleSql ++
      operators.Expectations.oracleSql ++
      streaming.StreamAnalytics.oracleSql
}
