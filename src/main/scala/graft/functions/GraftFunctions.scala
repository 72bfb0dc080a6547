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
      "kmv_sketch", exprs => KmvSketch(exprs(0), kmvK(exprs(1))), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "space_saving",
      exprs => SpaceSaving(exprs(0), intLit(exprs(1), "space_saving", "m")),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_array",
      exprs => ShingleArray(exprs(0), intLit(exprs(1), "shingle_array", "n")),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_bands",
      exprs => MinhashBands(exprs(0),
        intLit(exprs(1), "minhash_bands", "numHashes"),
        intLit(exprs(2), "minhash_bands", "bands")),
      "built-in")
  }

  /** `k` for `kmv_sketch(col, k)` — see [[intLit]]. */
  private def kmvK(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
    intLit(e, "kmv_sketch", "k")

  /** Integer-literal structural parameter (it sizes an aggregation buffer
    * or a loop, so a per-row value is meaningless). Accepts any integral
    * width — `128`, a BIGINT `128L`, a TINYINT cast (a cast literal is not
    * a `Literal` node yet at analysis time, so foldables are folded here
    * rather than bounced) — and rejects everything else with an
    * analysis-time error instead of a ClassCastException out of eval().
    * `IntegralType` is protected[sql] in the Scala signature, hence the
    * concrete-type enumeration. */
  private def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression,
      fn: String, param: String): Int = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}
    def isIntegral(dt: DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val folded = e match {
      case Literal(v: Number, dt) if isIntegral(dt) => Some(v.longValue())
      case _ if e.foldable && isIntegral(e.dataType) =>
        Option(e.eval()).map(_.asInstanceOf[Number].longValue())
      case _ => None
    }
    folded match {
      case Some(v) if v >= 1 && v <= Int.MaxValue => v.toInt
      case _ => throw new IllegalArgumentException(
        s"$fn: $param must be a positive integer literal, got ${e.sql}")
    }
  }

  /** Expose a scale-factor directory as temp views named like the tables. */
  def registerTables(spark: SparkSession, dir: String): Unit =
    Tables.all.foreach { name =>
      Tables(spark, dir, name).createOrReplaceTempView(name)
    }
}
