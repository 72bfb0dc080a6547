package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class Relational3Spec extends SparkSpec {
  import spark.implicits._

  test("q48 count-based multiset ops equal the built-in ALL operators") {
    val ls = Seq("F", "F", "O", "O", "O", "P").toDF("status")
    val os = Seq("F", "O", "O", "X", "X").toDF("status")
    // count-based form (the q48 shape)
    val lc = ls.groupBy($"status").agg(count(lit(1)).as("__ln"))
    val oc = os.groupBy($"status").agg(count(lit(1)).as("__on"))
    val fast = lc.join(oc, Seq("status"), "full_outer")
      .na.fill(0L, Seq("__ln", "__on"))
      .select($"status",
        least($"__ln", $"__on").as("n_inter"),
        greatest($"__on" - $"__ln", lit(0L)).as("n_except"))
      .filter($"n_inter" > 0 || $"n_except" > 0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // built-in row-level operators
    val slow = ls.intersectAll(os).groupBy($"status")
      .agg(count(lit(1)).as("n_inter"))
      .join(os.exceptAll(ls).groupBy($"status")
        .agg(count(lit(1)).as("n_except")), Seq("status"), "full_outer")
      .na.fill(0L, Seq("n_inter", "n_except"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(fast === slow)
    assert(fast === Set(("F", 1L, 0L), ("O", 2L, 0L), ("X", 0L, 2L)))
  }

  test("q78 sampled quantiles bound error against a known distribution") {
    // uniform value==id on [0, 20000): quantile error reads directly in
    // value units. The hash sample is deterministic, so these bounds are
    // exact regression pins, sized at ~3σ of the K=128 order-statistic
    // error (σ_p ≈ √(p(1−p)/K) · range)
    val n = 20000
    val df = spark.range(0, n).select(
      lit("g").as("event_type"), $"id".as("event_id"),
      $"id".cast("double").as("value"))
    val r = Relational3.sampledQuantiles(
      df, "event_type", "value", "event_id", 128).head()
    assert(r.getLong(1) === 128L) // n_sample
    assert(math.abs(r.getDouble(2) - 9999.5) < 0.14 * n, s"p50=${r.getDouble(2)}")
    assert(math.abs(r.getDouble(3) - 17999.1) < 0.09 * n, s"p90=${r.getDouble(3)}")
    assert(math.abs(r.getDouble(4) - 19799.01) < 0.05 * n, s"p99=${r.getDouble(4)}")
  }

  test("q78 reduces to the exact q70 form when K covers the group") {
    val df = spark.range(0, 500).select(
      ($"id" % 2).cast("string").as("event_type"), $"id".as("event_id"),
      ($"id" * 3).cast("double").as("value"))
    val sampled = Relational3.sampledQuantiles(
        df, "event_type", "value", "event_id", 1000)
      .drop("n_sample").collect().map(_.toString).toSeq
    val exact = df.groupBy($"event_type")
      .agg(percentile($"value", lit(0.5)).as("p50"),
        percentile($"value", lit(0.9)).as("p90"),
        percentile($"value", lit(0.99)).as("p99"))
      .orderBy($"event_type").collect().map(_.toString).toSeq
    assert(sampled === exact)
  }
}
