package graft.operators

import graft.SparkSpec

class EventOpsSpec extends SparkSpec {

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
}
