package graft.operators

import graft.SparkSpec

class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct is within 5% of exact (HLL++ default rsd)") {
    val r = EventOps.queries("q27_approx_distinct")(spark, sf).head()
    val approxUsers = r.getAs[Long]("approx_users").toDouble
    val exactUsers = r.getAs[Long]("exact_users").toDouble
    assert(math.abs(approxUsers - exactUsers) / exactUsers <= 0.05)
    assert(r.getAs[Long]("approx_types") === r.getAs[Long]("exact_types"))
  }

  test("retention query keeps exactly the newest ids") {
    val rows = EventOps.queries("q22_retention_keep_newest")(spark, sf).collect()
    val ids = rows.map(_.getAs[Long]("event_id"))
    assert(ids.length === 1000 || ids.length === ids.distinct.length)
    assert(ids.max - ids.min < 1000)
  }

  test("first-wins dedup emits one row per (user, type)") {
    val df = EventOps.queries("q21_events_dedup_first_wins")(spark, sf)
    val n = df.count()
    val nKeys = df.select("user_id", "event_type").distinct().count()
    assert(n === nKeys)
  }

  test("funnel steps are strictly ordered in time, never merely present") {
    import java.sql.Timestamp
    def t(min: Int) = Timestamp.valueOf(f"2026-01-01 00:$min%02d:00")
    // u1 converts in order; u2 clicked BEFORE its first view (must stay
    // depth 1); u3 purchased before clicking (depth 2, purchase ignored)
    val ev = Seq(
      (1L, "view", t(1)), (1L, "click", t(2)), (1L, "purchase", t(3)),
      (2L, "click", t(1)), (2L, "view", t(2)),
      (3L, "purchase", t(1)), (3L, "view", t(2)), (3L, "click", t(3))
    ).toDF("user_id", "event_type", "ts")
    val dir = java.nio.file.Files.createTempDirectory("funnel_").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val depths = EventOps.queries("q89_funnel_steps")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("depth")).toMap
    assert(depths === Map(1L -> 3L, 2L -> 1L, 3L -> 2L))
  }
}
