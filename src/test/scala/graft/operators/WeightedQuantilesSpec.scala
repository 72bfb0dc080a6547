package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** weightedQuantiles' contract: exact cross-multiplied coverage (never a
  * float quantile), inclusive kept mass at the threshold, and boundary
  * behavior when a fraction lands exactly on a value's cumulative edge. */
class WeightedQuantilesSpec extends SparkSpec {
  import spark.implicits._

  // values 1..4 with weights 10, 20, 30, 40 (total 100)
  private def df = Seq(
    (1L, 4L), (1L, 6L), (2L, 20L), (3L, 30L), (4L, 25L), (4L, 15L))
    .toDF("v", "w")

  private def run(fracs: (Int, Int)*) =
    ProfileOps.weightedQuantiles(df, "v", "w", fracs)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  test("thresholds cover the fraction minimally and inclusively") {
    val out = run((1, 10), (1, 4), (3, 10), (1, 2), (9, 10), (1, 1))
    // cum: v1=10, v2=30, v3=60, v4=100
    assert(out((1, 10)) === ((1L, 10L, 2L))) // 10 ≥ 10: exact edge at v1
    assert(out((1, 4)) === ((2L, 30L, 3L)))  // 25 needs v2
    assert(out((3, 10)) === ((2L, 30L, 3L))) // 30 ≥ 30: exact edge at v2
    assert(out((1, 2)) === ((3L, 60L, 4L)))
    assert(out((9, 10)) === ((4L, 100L, 6L)))
    assert(out((1, 1)) === ((4L, 100L, 6L)))
  }

  test("single distinct value answers every fraction with itself") {
    val one = Seq((7L, 5L), (7L, 5L)).toDF("v", "w")
    val out = ProfileOps.weightedQuantiles(one, "v", "w",
      Seq((1, 3), (1, 1))).collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getLong(2) === 7L && r.getLong(3) === 10L &&
        r.getLong(4) === 2L)
    }
  }

  test("invalid fractions are refused") {
    intercept[IllegalArgumentException] {
      ProfileOps.weightedQuantiles(df, "v", "w", Seq((0, 4)))
    }
    intercept[IllegalArgumentException] {
      ProfileOps.weightedQuantiles(df, "v", "w", Seq((5, 4)))
    }
    intercept[IllegalArgumentException] {
      ProfileOps.weightedQuantiles(df, "v", "w", Nil)
    }
  }
}
