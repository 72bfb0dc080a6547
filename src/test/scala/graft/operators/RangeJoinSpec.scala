package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed point-in-interval join matches a plain BETWEEN join") {
    val points = Seq(1L, 5L, 10L, 17L, 23L, 42L).toDF("v")
    val intervals = Seq((0L, 0L, 9L), (1L, 5L, 17L), (2L, 18L, 18L),
      (3L, 40L, 60L)).toDF("iv_id", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "v", intervals,
        "lo", "hi", bucketWidth = 7L)
      .select($"v", $"iv_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val want = points.crossJoin(intervals)
      .filter($"v" >= $"lo" && $"v" <= $"hi")
      .select($"v", $"iv_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(got === want)
    // overlap check: v=5 and v=10 each land in multiple intervals
    assert(want.count(_._1 == 5L) === 2)
  }

  test("no duplicate pairs even when an interval spans many buckets") {
    val points = Seq(50L).toDF("v")
    val intervals = Seq((1L, 0L, 100L)).toDF("iv_id", "lo", "hi")
    val rows = RangeJoin.pointInInterval(points, "v", intervals,
      "lo", "hi", bucketWidth = 3L).count()
    assert(rows === 1L) // interval exploded to 34 buckets; point matched once
  }

  test("bucketed join is an equi-join, not a nested-loop, in the plan") {
    val points = Seq(1L, 2L).toDF("v")
    val intervals = Seq((1L, 0L, 3L)).toDF("iv_id", "lo", "hi")
    val plan = RangeJoin.pointInInterval(points, "v", intervals,
      "lo", "hi", bucketWidth = 2L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
  }
}
