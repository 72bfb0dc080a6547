package graft

import org.apache.spark.sql.functions._

/** Runtime-skew evidence, the AQE companion to `Skew.scala`'s explicit
  * salting (q61): when one join key dominates, AQE's skew-join rule
  * splits the oversized shuffle partition into subpartitions at runtime —
  * no code change, no salt column. The executed plan marks the join
  * `skew=true`; this spec pins that the mechanism actually engages on a
  * skewed input under thresholds scaled to test data, which is what makes
  * it trustworthy at 100 TB under the default thresholds.
  *
  * Both mitigations stay in the library's story deliberately: salting is
  * partitioning-stable (works on any engine path, composable with
  * bucketing); AQE skew handling is zero-maintenance but only triggers on
  * sort-merge joins under AQE. A 100 TB deployment wants both available.
  */
class AqeSkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed join partition at runtime (skew=true)") {
    val confs = Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k =>
      k -> scala.util.Try(spark.conf.get(k)).toOption).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // key 0 carries 200k of 210k rows — one shuffle partition dwarfs
      // the rest exactly like a hot entity at production scale
      val fact = spark.range(0, 200000).select(lit(0L).as("k"),
          $"id".as("payload"))
        .unionAll(spark.range(0, 10000).select(($"id" % 100 + 1).as("k"),
          $"id".as("payload")))
      val dim = spark.range(0, 101).select($"id".as("k"),
        concat(lit("d"), $"id").as("name"))
      val joined = fact.join(dim, "k")
        .groupBy($"name").agg(count(lit(1)).as("n"))
      val rows = joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(plan.contains("SortMergeJoin"), plan.take(1500))
      assert(plan.contains("skew=true"),
        "AQE did not mark the join skewed:\n" + plan.take(3000))
      // semantics unchanged by the split
      assert(rows.map(_.getLong(1)).sum === 210000L)
      assert(rows.find(_.getString(0) == "d0").get.getLong(1) === 200000L)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
