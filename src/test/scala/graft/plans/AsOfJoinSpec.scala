package graft.plans

import java.sql.Timestamp

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("custom as-of exec matches hand-computed expectations") {
    val probes = Seq(
      (7L, ts("2024-01-01 09:00:00"), 1L), // before any ref
      (7L, ts("2024-01-01 10:00:00"), 2L), // equal ts → matched
      (7L, ts("2024-01-01 11:00:00"), 3L),
      (7L, ts("2024-01-01 13:00:00"), 4L), // after 2nd ref
      (8L, ts("2024-01-01 13:30:00"), 5L) // other key, no refs
    ).toDF("user_id", "ts", "event_id")
    val refs = Seq(
      (7L, ts("2024-01-01 10:00:00")),
      (7L, ts("2024-01-01 12:00:00"))
    ).toDF("user_id", "ts")
    val out = AsOf.join(probes, refs, "user_id", "ts")
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[Timestamp]("matched_time")))
      .toMap
    assert(out(1L) === None)
    assert(out(2L) === Some(ts("2024-01-01 10:00:00")))
    assert(out(3L) === Some(ts("2024-01-01 10:00:00")))
    assert(out(4L) === Some(ts("2024-01-01 12:00:00")))
    assert(out(5L) === None)
  }

  test("null keys/times follow SQL semantics (never match, never error)") {
    val probes = Seq(
      (Some(7L), Some(ts("2024-01-01 11:00:00")), 1L), // normal match
      (None, Some(ts("2024-01-01 11:00:00")), 2L),     // null key → null
      (Some(7L), None, 3L),                            // null time → null
      (Some(9L), Some(ts("2024-01-01 11:00:00")), 4L)  // key with only-null refs
    ).toDF("user_id", "ts", "event_id")
    val refs = Seq(
      (Some(7L), Some(ts("2024-01-01 10:00:00"))),
      (None, Some(ts("2024-01-01 09:00:00"))), // null right key: no-op
      (Some(9L), None)                         // null right time: no-op
    ).toDF("user_id", "ts")
    val out = AsOf.join(probes, refs, "user_id", "ts")
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[Timestamp]("matched_time")))
      .toMap
    assert(out(1L) === Some(ts("2024-01-01 10:00:00")))
    assert(out(2L) === None)
    assert(out(3L) === None)
    assert(out(4L) === None)
  }

  test("custom exec agrees with the compositional q17 on real data") {
    val custom = Relational2Compare.custom(spark, sf)
    val composed = Relational2Compare.composed(spark, sf)
    assert(custom === composed)
  }

  test("physical plan contains the custom exec node") {
    val probes = Seq((1L, ts("2024-01-01 10:00:00"), 1L))
      .toDF("user_id", "ts", "event_id")
    val refs = Seq((1L, ts("2024-01-01 09:00:00"))).toDF("user_id", "ts")
    val plan = AsOf.join(probes, refs, "user_id", "ts")
      .queryExecution.sparkPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(500))
  }
}

/** helper: run both as-of variants and canonicalize for comparison */
object Relational2Compare {
  import org.apache.spark.sql.SparkSession
  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted
  def custom(s: SparkSession, dir: String): Seq[String] =
    canon(graft.operators.Relational2.queries("q17b_asof_custom_operator")(s, dir))
  def composed(s: SparkSession, dir: String): Seq[String] =
    canon(graft.operators.Relational2.queries("q17_asof_join")(s, dir))
}
