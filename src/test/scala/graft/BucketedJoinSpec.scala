package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Evidence for the co-located-join story in PLANS.md: bucketing both
  * sides of a recurring equi-join on the join key removes the per-query
  * shuffle entirely — the layout pays the partitioning cost ONCE at write
  * time, and every subsequent join reads co-located buckets. At 100 TB
  * this is the difference between re-shuffling the fact table on every
  * query and never shuffling it at all (the reference's single-node
  * design has no notion of this; it is pure Spark leverage).
  *
  * The assertions read the EXECUTED plan: a sort-merge join whose
  * children carry no Exchange is the physical proof of co-location.
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def executed(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // force AQE to finalize the plan
    // AQE's toString prints "== Final Plan ==" then "== Initial Plan ==";
    // only the final section reflects what actually ran
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("bucketed tables equi-join without any Exchange") {
    // external-table paths, so the (static) warehouse conf never matters
    val wh = Files.createTempDirectory("graft_bucketed_").toString
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
    orders.write.mode("overwrite")
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/orders_b").saveAsTable("orders_b")
    lineitem.write.mode("overwrite")
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/lineitem_b").saveAsTable("lineitem_b")
    try {
      // disable broadcast so the join would otherwise need two exchanges
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"),
          $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderstatus")
        .agg(sum($"l_quantity").as("qty"))
      val plan = executed(joined)
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      // the join children read bucketed scans directly: the ONLY
      // exchange in the whole plan is the one the aggregation needs
      val exchanges = "Exchange hashpartitioning".r
        .findAllIn(plan).length
      assert(exchanges == 1,
        s"expected only the aggregate's exchange, got $exchanges:\n" +
          plan.take(3000))
      // correctness unchanged vs the unbucketed plan
      val expected = orders.join(lineitem, $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderstatus").agg(sum($"l_quantity").as("qty"))
        .collect().map(r => r.getString(0) -> r.get(1)).toMap
      val got = joined.collect()
        .map(r => r.getString(0) -> r.get(1)).toMap
      assert(got === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("bucket pruning: an equality filter on the bucket key reads 1 bucket") {
    val wh = Files.createTempDirectory("graft_bucketedp_").toString
    spark.read.parquet(s"$sf/orders.parquet").write.mode("overwrite")
      .bucketBy(8, "o_orderkey")
      .option("path", s"$wh/orders_bp").saveAsTable("orders_bp")
    try {
      // the auto rule drops bucketed scans when no join/agg needs the
      // distribution — but that also forfeits bucket pruning; pin it on
      spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val key = spark.table("orders_bp").select(min($"o_orderkey"))
        .head().get(0)
      val q = spark.table("orders_bp").filter($"o_orderkey" === key)
      val plan = executed(q)
      // SelectedBucketsCount appears only when bucket pruning kicked in
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
        plan.take(2000))
      assert(q.count() >= 1)
    } finally {
      spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS orders_bp")
    }
  }
}
