package graft

import org.apache.spark.sql.SparkSession

/** One-call adoption surface for an EXISTING SparkSession:
  *
  * {{{
  *   graft.Graft.install(spark)          // operators + SQL functions
  *   graft.Graft.registerTables(spark, "/data/sf1")  // optional views
  * }}}
  *
  * New sessions should prefer the extension class instead —
  * `spark.sql.extensions=graft.plans.GraftExtensions` — which wires the
  * same components at session construction. `install` covers the notebook
  * / shared-session case where rebuilding the session isn't an option:
  * planner strategies and optimizer rules go through the public
  * `spark.experimental` hooks, SQL functions through the registry. */
object Graft {

  /** Idempotent: installing twice adds nothing. */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(plans.AsOfStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ plans.AsOfStrategy
    if (!spark.experimental.extraOptimizations.contains(plans.RangeJoinRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ plans.RangeJoinRule
    plans.ViewRewrite.install(spark) // inert until a view is registered
    functions.GraftFunctions.register(spark)
  }

  /** Expose a scale-factor directory as temp views named like the tables. */
  def registerTables(spark: SparkSession, dir: String): Unit =
    functions.GraftFunctions.registerTables(spark, dir)
}
