package graft.operators

import graft.SparkSpec

class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct is within 5% of exact (HLL++ rsd pinned " +
      "at 0.02 — a 2.5x guardband inside the contract)") {
    // q27 emits the tolerance verdicts directly (engine-invariant
    // booleans — the oracle recomputes the same checks on DuckDB's own
    // sketch); all four must hold on real data
    val r = EventOps.queries("q27_approx_distinct")(spark, sf).head()
    assert(r.getAs[Long]("exact_users") > 0L)
    assert(r.getAs[Boolean]("approx_users_ok"))
    assert(r.getAs[Boolean]("approx_types_ok"))
    assert(r.getAs[Boolean]("approx_p50_ok"))
    assert(r.getAs[Boolean]("approx_p99_ok"))
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

  test("ema fold matches the scalar recurrence, per type, gaps skipped") {
    import java.sql.Timestamp
    // type a: days 1,2,4 (gap on 3) with counts 3,1,2; type b: one day
    val ev = Seq(
      (1L, "a", Timestamp.valueOf("2024-01-01 10:00:00")),
      (2L, "a", Timestamp.valueOf("2024-01-01 11:00:00")),
      (3L, "a", Timestamp.valueOf("2024-01-01 12:00:00")),
      (4L, "a", Timestamp.valueOf("2024-01-02 10:00:00")),
      (5L, "a", Timestamp.valueOf("2024-01-04 10:00:00")),
      (6L, "a", Timestamp.valueOf("2024-01-04 11:00:00")),
      (7L, "b", Timestamp.valueOf("2024-01-03 09:00:00"))
    ).map { case (id, t, ts) => (id, t, ts, 0L, 0.0, "{}") }
      .toDF("event_id", "event_type", "ts", "user_id", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("ema_").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventOps.queries("q113_ema_daily")(spark, dir)
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        r.getLong(2), r.getLong(3)))
    // recurrence: e0 = c0*1000; e_i = (e_{i-1} + c_i*1000) div 2 over
    // OBSERVED days only (the gap day contributes no point)
    assert(out.toSeq === Seq(
      ("a", "2024-01-01", 3L, 3000L),
      ("a", "2024-01-02", 1L, (3000L + 1000L) / 2),
      ("a", "2024-01-04", 2L, ((3000L + 1000L) / 2 + 2000L) / 2),
      ("b", "2024-01-03", 1L, 1000L)))
  }
  test("q27 value-space precondition holds at every SF fixture: the " +
      "rank-0.1% band stays under the 5% value tolerance at p50 and p99") {
    // executable form of the documented assumption (r16 verdict #4):
    // percentile_approx guarantees RANK error <= eps*n; q27's booleans
    // compare VALUES at 5% relative tolerance, which is only SOUND
    // while the exact value band across [q-eps, q+eps] stays inside
    // that tolerance. Measured (r17, DuckDB-cross-checked): p50
    // 0.6-0.9% at every SF; p99 1.9% / 3.2% / 4.5% at sf0.001/0.01/
    // 0.1 — the fixture's tail makes the p99 WORST-CASE band approach
    // the tolerance while the sketch's observed deviation stays
    // <= 0.3%. Asserted at the soundness line so a regenerated fixture
    // that reshapes `events.value` past it flips THIS test, not the
    // oracle; p50 additionally pinned at its measured-comfortable 2%.
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      assume(new java.io.File(s"$dir/events.parquet").exists())
      val bands = EventOps.q27ValueBands(spark, dir)
      for ((q, band) <- bands)
        assert(band < 0.05,
          s"$sf $q: the rank-eps band maps to ${band * 100}% in value " +
            "— at or past the 5% relative tolerance, the booleans are " +
            "no longer rank-error-sound")
      assert(bands("p50") <= 0.02,
        s"$sf p50 band ${bands("p50") * 100}% — measured <= 0.9%, a " +
          "2x move means the fixture's body reshaped")
    }
  }

  test("quantileValueBand refuses a zero exact percentile (relative " +
      "tolerance is meaningless there)") {
    val df = Seq.fill(100)(0.0).toDF("value")
    val e = intercept[IllegalArgumentException] {
      EventOps.quantileValueBand(df, "value", 0.5, 0.001)
    }
    assert(e.getMessage.contains("p0.5"))
  }
}
