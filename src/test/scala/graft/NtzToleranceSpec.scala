package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

import graft.functions.TsNorm

/** Footer-shape drift guard (round-8 regression class): every
  * timestamp-strict operator family must accept a `TimestampNTZType` time
  * column — either natively or through the [[TsNorm]] ingress guard — and
  * produce the same values as the `TimestampType` equivalent. The driver
  * tables are normalized by the Tables loader; this pins the behavior for
  * any future source that does NOT go through that loader.
  */
class NtzToleranceSpec extends SparkSpec {
  import spark.implicits._

  /** 20 events, 4 users, 1 s apart, as (instant, ntz) frame pair. */
  private def frames: (DataFrame, DataFrame) = {
    val base = spark.range(20).select(
      ($"id" % 4).as("user_id"),
      timestamp_micros(lit(1700000000000000L) + $"id" * 1000000L).as("ts"),
      ($"id" + 1).cast("double").as("value"))
    (base, base.withColumn("ts", $"ts".cast(TimestampNTZType)))
  }

  test("TsNorm.instant casts NTZ to instant, leaves others untouched") {
    val (inst, ntz) = frames
    val fixed = TsNorm.instant(ntz, "ts")
    assert(fixed.schema("ts").dataType === TimestampType)
    assert(fixed.schema("value").dataType === inst.schema("value").dataType)
    // value-identity under the UTC session
    assert(fixed.select(unix_micros($"ts")).collect().map(_.getLong(0)).sorted
      === inst.select(unix_micros($"ts")).collect().map(_.getLong(0)).sorted)
    // no-arg form normalizes every NTZ column; instant frames pass through
    assert(TsNorm.instant(ntz).schema("ts").dataType === TimestampType)
    assert(TsNorm.instant(inst).schema("ts").dataType === TimestampType)
  }

  test("as-of join accepts NTZ time columns (ingress normalization)") {
    val (inst, ntz) = frames
    def run(df: DataFrame): Seq[(Long, Long)] = {
      val probes = df.select($"user_id", $"ts")
      val refs = df.filter($"value" <= 10)
        .select($"user_id", $"ts")
      graft.plans.AsOf.join(probes, refs, "user_id", "ts")
        .select($"user_id", unix_micros($"matched_time").as("mt"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    }
    assert(run(ntz) === run(inst))
  }

  test("window operators accept NTZ natively, same buckets as instant") {
    val (inst, ntz) = frames
    def tumble(df: DataFrame) = streaming.StreamAnalytics
      .tumblingCounts(df, "ts", "10 seconds")
      // window() on an NTZ input yields an NTZ window struct — cast at
      // readback (value-identity under UTC) to compare with the instant run
      .select(unix_micros($"window.start".cast(TimestampType)).as("ws"),
        $"n_events", $"sum_value")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(tumble(ntz) === tumble(inst))
    def sess(df: DataFrame) = streaming.StreamAnalytics
      .sessionWindows(df, "ts", "user_id", "5 seconds")
      .select($"user_id", $"n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(sess(ntz) === sess(inst))
  }

  test("interval join accepts NTZ on both sides, same matches as instant") {
    val (inst, ntz) = frames
    def run(df: DataFrame) = {
      val l = df.select($"user_id".as("lk"), $"ts".as("lts"))
      val r = df.select($"user_id".as("rk"), $"ts".as("rts"))
      streaming.StreamAnalytics
        .intervalJoin(l, "lk", "lts", r, "rk", "rts", "3 seconds")
        .count()
    }
    assert(run(ntz) === run(inst))
  }

  test("unix_micros sites work on NTZ frames after the TsNorm guard") {
    // the ProfileOps / RangeJoin / Relational4 ingress pattern
    val (inst, ntz) = frames
    def profile(df: DataFrame) = TsNorm.instant(df, "ts")
      .agg(min(unix_micros($"ts")), max(unix_micros($"ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).head
    assert(profile(ntz) === profile(inst))
  }
}
