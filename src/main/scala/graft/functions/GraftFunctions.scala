package graft.functions

import org.apache.spark.sql.SparkSession

import graft.sources.Tables

/** SQL surface of the engine: register graft's native expressions and the
  * table set so `spark.sql` users get the same operators as the DataFrame
  * API (the registration surface the reference lacks, SURVEY.md §2.11). */
object GraftFunctions {

  /** Register custom expressions for SQL use (e.g.
    * `SELECT seq_dot(a.embedding, b.embedding) ...`,
    * `SELECT kmv_sketch(h, 128).kth ...`). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "seq_dot", exprs => SequentialDot(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmv_sketch", exprs => KmvSketch(exprs(0),
        exprs(1).eval().asInstanceOf[Int]), "built-in")
  }

  /** Expose a scale-factor directory as temp views named like the tables. */
  def registerTables(spark: SparkSession, dir: String): Unit =
    Tables.all.foreach { name =>
      Tables(spark, dir, name).createOrReplaceTempView(name)
    }
}
