package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Exact._
import graft.sources.Tables

/** Wiki-pipeline-shaped operators over the `events` table, driver-verifiable
  * against DuckDB. The faithful recentchange pipeline (graft.ingest) is
  * exercised by unit tests on the JSONL fixture; these queries re-express the
  * same operator semantics (SURVEY.md §2.3-§2.8) on the provided parquet:
  *
  *   q20  F2 type filter + P7 JSON parse + P1/P3 extract/default + P2 rename
  *        + P4 derived arithmetic + P6 timestamp normalize + P9 projection
  *   q21  D1 first-write-wins dedup (deterministic window form)
  *   q22  R1 keep-newest-N retention + A5 scalar greatest
  *   q23  S3 resume offset (MAX(event_timestamp)) + A4
  *   q24  A1/A2/A3 dashboard snapshot (count, min/max id, id span)
  *   q25  A6 velocity (per-minute counts + exact value sums)
  *   q26  A7 running delta (lag over the minute series)
  */
object EventOps {
  type Q = (SparkSession, String) => DataFrame

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")

  /** Timestamp normalize (P6): the reference folds ISO8601 to a naive
    * second-resolution string (pipeline.py:120); both engines format
    * identically, sidestepping parquet ns/µs annotation mismatches. */
  private val tsFmt = "yyyy-MM-dd HH:mm:ss"
  private val tsFmtSqlSec = "%Y-%m-%d %H:%M:%S"
  private val minuteFmt = "yyyy-MM-dd HH:mm"
  private val minuteFmtSql = "%Y-%m-%d %H:%M"

  // ---------------------------------------------------------------- q20
  private val q20: Q = (s, dir) => {
    import s.implicits._
    val k = coalesce(get_json_object($"props", "$.k").cast("long"), lit(0L))
    ev(s, dir)
      .filter($"event_type".isin("view", "click")) // F2
      .select( // P9
        $"event_id",
        date_format($"ts", tsFmt).as("event_time"), // P6
        $"user_id".as("actor_id"), // P2
        $"event_type",
        k.as("k"), // P7+P1+P3+P5
        $"value",
        ($"value" - k).as("value_minus_k")) // P4
      .orderBy($"event_id")
  }
  private val q20Sql =
    s"""SELECT event_id,
       |  strftime(ts, '$tsFmtSqlSec') AS event_time,
       |  user_id AS actor_id,
       |  event_type,
       |  COALESCE(CAST(json_extract_string(props, '$$.k') AS BIGINT), 0) AS k,
       |  value,
       |  value - COALESCE(CAST(json_extract_string(props, '$$.k') AS BIGINT), 0)
       |    AS value_minus_k
       |FROM events
       |WHERE event_type IN ('view', 'click')
       |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q21
  /** First-write-wins dedup per (user_id, event_type): deterministic via
    * (ts, event_id) order — the window form of the reference's UNIQUE
    * constraint skip (pipeline.py:173-174). */
  private val q21: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id", $"event_type")
      .orderBy($"ts".asc, $"event_id".asc)
    ev(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_type",
        $"event_id".as("first_event_id"),
        date_format($"ts", tsFmt).as("first_time"),
        $"value".as("first_value"))
      .orderBy($"user_id", $"event_type")
  }
  private val q21Sql =
    s"""SELECT user_id, event_type, event_id AS first_event_id,
       |  strftime(ts, '$tsFmtSqlSec') AS first_time,
       |  value AS first_value
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
       |                                   ORDER BY ts ASC, event_id ASC) AS rn
       |      FROM events)
       |WHERE rn = 1
       |ORDER BY user_id, event_type""".stripMargin

  // --------------------------------------------------------------- q21b
  /** Last-write-wins dedup — the UPSERT-shaped counterpart of q21 (CDC /
    * mutable-state compaction keeps the NEWEST record per key; the
    * reference's insert-or-skip keeps the oldest). Same window form,
    * reversed order. */
  private val q21b: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id", $"event_type")
      .orderBy($"ts".desc, $"event_id".desc)
    ev(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_type",
        $"event_id".as("last_event_id"),
        date_format($"ts", tsFmt).as("last_time"),
        $"value".as("last_value"))
      .orderBy($"user_id", $"event_type")
  }
  private val q21bSql =
    s"""SELECT user_id, event_type, event_id AS last_event_id,
       |  strftime(ts, '$tsFmtSqlSec') AS last_time,
       |  value AS last_value
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
       |                                   ORDER BY ts DESC, event_id DESC) AS rn
       |      FROM events)
       |WHERE rn = 1
       |ORDER BY user_id, event_type""".stripMargin

  // --------------------------------------------------------------- q21c
  /** Incremental (anti-join) dedup: given an already-ingested "sink" half
    * and an arriving batch with replay overlap, emit only the genuinely
    * new keys — the standalone form of the sink-level UNIQUE absorption
    * (appendWithRetention's left_anti). One hash-partitionable anti-join
    * on the key. */
  private val q21c: Q = (s, dir) => {
    import s.implicits._
    val all = ev(s, dir)
    val sink = all.filter($"event_id" % 2 === 0)
      .select($"user_id", $"event_type")
    val batch = all.filter($"event_id" % 4 =!= 1) // overlaps sink + new keys
    batch.join(sink, Seq("user_id", "event_type"), "left_anti")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_new"))
      .orderBy($"user_id")
  }
  private val q21cSql =
    """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_new
      |FROM (SELECT * FROM events WHERE event_id % 4 <> 1) b
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM (SELECT user_id, event_type FROM events
      |                 WHERE event_id % 2 = 0) s
      |  WHERE s.user_id = b.user_id AND s.event_type = b.event_type)
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q22
  /** Keep-newest retention (R1): survivors of
    * `DELETE WHERE id < MAX(0, max_id - N)` — delegates to the library
    * operator so the boundary semantics live in exactly one place. */
  private val q22: Q = (s, dir) => {
    import s.implicits._
    graft.ingest.WikiIngest.retention(ev(s, dir), "event_id", 1000L)
      .select($"event_id", $"user_id", $"event_type", $"value")
      .orderBy($"event_id")
  }
  private val q22Sql =
    """SELECT event_id, user_id, event_type, value
      |FROM events
      |WHERE event_id >= GREATEST(0, (SELECT MAX(event_id) FROM events) - 1000)
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q23
  /** Resume offset (S3/A4): MAX(event_timestamp) of the sink — the
    * reference's `?since=` recovery point (pipeline.py:226-227). */
  private val q23: Q = (s, dir) => {
    import s.implicits._
    ev(s, dir).agg(
      date_format(max($"ts"), tsFmt).as("last_ts"),
      count(lit(1)).as("n_events"))
  }
  private val q23Sql =
    s"""SELECT strftime(MAX(ts), '$tsFmtSqlSec') AS last_ts,
       |  COUNT(*) AS n_events
       |FROM events""".stripMargin

  // ---------------------------------------------------------------- q24
  /** Dashboard snapshot (A1/A2/A3, dashboard.py:39-40): count, id bounds,
    * and the reference's `MAX(id)-MIN(id)+1` row estimate. */
  private val q24: Q = (s, dir) => {
    import s.implicits._
    ev(s, dir).agg(
      count(lit(1)).as("n_rows"),
      min($"event_id").as("min_id"),
      max($"event_id").as("max_id"),
      (max($"event_id") - min($"event_id") + lit(1L)).as("id_span"))
  }
  private val q24Sql =
    """SELECT COUNT(*) AS n_rows,
      |  MIN(event_id) AS min_id,
      |  MAX(event_id) AS max_id,
      |  MAX(event_id) - MIN(event_id) + 1 AS id_span
      |FROM events""".stripMargin

  // ---------------------------------------------------------------- q25
  /** Velocity (A6, dashboard.py:46-49): events/minute as a proper
    * time-bucketed aggregate instead of ΔMAX(id) polling. */
  private val q25: Q = (s, dir) => {
    import s.implicits._
    ev(s, dir)
      .groupBy(date_format($"ts", minuteFmt).as("minute"))
      .agg(count(lit(1)).as("n_events"), dsum($"value").as("sum_value"))
      .orderBy($"minute")
  }
  private val q25Sql =
    s"""SELECT strftime(ts, '$minuteFmtSql') AS minute,
       |  COUNT(*) AS n_events,
       |  ${sqlSum("value")} AS sum_value
       |FROM events
       |GROUP BY 1
       |ORDER BY minute""".stripMargin

  // ---------------------------------------------------------------- q26
  /** Prev-vs-current delta (A7, dashboard.py:56-70): lag over the minute
    * series. Unpartitioned window is fine here — the minute series is tiny
    * relative to the input (one row per minute, not per event). */
  private val q26: Q = (s, dir) => {
    import s.implicits._
    val perMinute = ev(s, dir)
      .groupBy(date_format($"ts", minuteFmt).as("minute"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.orderBy($"minute")
    perMinute
      .withColumn("delta",
        $"n_events" - coalesce(lag($"n_events", 1).over(w), lit(0L)))
      .orderBy($"minute")
  }
  private val q26Sql =
    s"""SELECT minute, n_events,
       |  n_events - COALESCE(LAG(n_events) OVER (ORDER BY minute), 0) AS delta
       |FROM (SELECT strftime(ts, '$minuteFmtSql') AS minute,
       |             COUNT(*) AS n_events
       |      FROM events GROUP BY 1)
       |ORDER BY minute""".stripMargin

  // ---------------------------------------------------------------- q27
  /** Approximate distinct (A-series extension): HLL++ sketch vs exact.
    * approx_count_distinct is a constant-memory sketch — the 100 TB path
    * for cardinality (exact countDistinct shuffles every distinct value).
    *
    * ORACLE CONTRACT (r14 verdict: retire the rows-only exemption): the
    * raw sketch estimates are engine-specific (Spark HLL++ vs DuckDB's
    * HLL — different hash, different registers), so the query emits the
    * exact counts plus ENGINE-INVARIANT accuracy booleans — each engine
    * checks ITS OWN sketch against ITS OWN exact value at the same 5%
    * relative tolerance. Both sketches are deterministic algorithms over
    * the same data with measured error well inside the bound (≤1.5%
    * across all three SFs on the DuckDB side; Spark HLL++ rsd 0.05 with
    * empirical error ≪5% at these cardinalities), so the booleans are
    * stable, hash-comparable facts — and a genuine sketch regression in
    * either engine flips one loudly.
    *
    * The HLL rsd is pinned at 0.02 (not the 0.05 default) so the
    * configured accuracy sits comfortably inside the 5% contract (a
    * 2.5σ guardband): at sf0.1's 1500 users the default-rsd sketch
    * landed OUTSIDE the tolerance (caught by the tri-SF check), while
    * rsd 0.02 passes at all three SFs. Constant memory either way
    * (2^p registers).
    *
    * VALUE-SPACE ASSUMPTION for the p50/p99 booleans (r15 advice):
    * percentile_approx/approx_quantile guarantee error in RANK space
    * (within ε·n positions at accuracy 1000 ⇒ ε = 0.1%), not in the
    * value read off at that rank, so a relative-VALUE tolerance is only
    * meaningful when the distribution is value-stable around the probed
    * quantiles — in particular abs(e50)·tol collapses to zero when the
    * exact percentile is 0, and a heavy tail can move the rank-ε value
    * band past 5%. The precondition is EXECUTABLE (r16 verdict #4):
    * [[quantileValueBand]] computes the exact value band across the
    * rank window [q−ε, q+ε], and EventOpsSpec requires it under
    * [[ApproxTol]] at all three SF fixtures. Measured (r17, exact
    * percentiles, DuckDB-cross-checked): p50 0.6–0.9% at every SF;
    * p99 1.9% / 3.2% / 4.5% at sf0.001/0.01/0.1 — the fixture's
    * lognormal-ish tail means the WORST-CASE band at p99 sits just
    * inside the 5% tolerance, while the sketch's OBSERVED deviation is
    * ≤0.3% (its actual rank error runs ~10× under the ε bound). So the
    * booleans hold with a wide empirical margin but a thin worst-case
    * one at p99: a redeploy over a heavier-tailed value column must
    * either raise percentile_approx's accuracy or compare ranks, not
    * values — and the spec flips before the oracle does. */
  private val ApproxTol = 0.05

  /** Executable form of the VALUE-SPACE ASSUMPTION above (r16 verdict
    * #4: "a fixture change flips a test, not the oracle"): the relative
    * width of the EXACT value band across the rank window [q−ε, q+ε] —
    * the worst value error a rank-ε-correct quantile sketch can report
    * at quantile q. q27's p50/p99 booleans are SOUND exactly while
    * this band stays under [[ApproxTol]]; EventOpsSpec asserts that at
    * every SF fixture (measured: ≤0.9% at p50 everywhere, p99 up to
    * 4.5% at sf0.1 — see the ORACLE CONTRACT note for why the thin
    * worst-case p99 margin still carries a wide empirical one), so a
    * regenerated or reshaped `events.value` that breaks the assumption
    * fails a unit test instead of silently destabilizing the oracle.
    * One exact-percentile pass (array form), driver-cheap. */
  private[graft] def quantileValueBand(df: DataFrame, col: String,
      q: Double, eps: Double): Double = {
    val r = df.selectExpr(
      s"percentile($col, array(${q - eps}, $q, ${q + eps})) AS b").head()
    val b = r.getSeq[Double](0)
    require(b(1) != 0.0, s"value-space precondition: exact p$q of " +
      s"'$col' is 0 — a relative value tolerance is meaningless here")
    (b(2) - b(0)) / math.abs(b(1))
  }

  /** Spec/ritual entry for [[quantileValueBand]] over the events
    * fixture at a given SF dir. */
  private[graft] def q27ValueBands(s: SparkSession,
      dir: String): Map[String, Double] = {
    val df = ev(s, dir)
    // ε = 1/accuracy for percentile_approx at the accuracy q27 pins
    Map("p50" -> quantileValueBand(df, "value", 0.5, 0.001),
        "p99" -> quantileValueBand(df, "value", 0.99, 0.001))
  }
  private val q27: Q = (s, dir) => {
    import s.implicits._
    ev(s, dir).agg(
      countDistinct($"user_id").cast("long").as("exact_users"),
      approx_count_distinct($"user_id", 0.02).as("__au"),
      countDistinct($"event_type").cast("long").as("exact_types"),
      approx_count_distinct($"event_type", 0.02).as("__at"),
      percentile_approx($"value", lit(0.5), lit(1000)).as("__p50"),
      expr("percentile(value, 0.5)").as("__e50"),
      percentile_approx($"value", lit(0.99), lit(1000)).as("__p99"),
      expr("percentile(value, 0.99)").as("__e99"))
      .select($"exact_users",
        (abs($"__au" - $"exact_users") <=
          $"exact_users" * ApproxTol).as("approx_users_ok"),
        $"exact_types",
        (abs($"__at" - $"exact_types") <=
          $"exact_types" * ApproxTol).as("approx_types_ok"),
        (abs($"__p50" - $"__e50") <=
          abs($"__e50") * ApproxTol).as("approx_p50_ok"),
        (abs($"__p99" - $"__e99") <=
          abs($"__e99") * ApproxTol).as("approx_p99_ok"))
  }
  private val q27Sql =
    s"""WITH a AS (
       |  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       |         approx_count_distinct(user_id) AS au,
       |         CAST(COUNT(DISTINCT event_type) AS BIGINT) AS exact_types,
       |         approx_count_distinct(event_type) AS aty,
       |         approx_quantile(value, 0.5) AS p50,
       |         quantile_cont(value, 0.5) AS e50,
       |         approx_quantile(value, 0.99) AS p99,
       |         quantile_cont(value, 0.99) AS e99
       |  FROM events)
       |SELECT exact_users,
       |  (abs(au - exact_users) <= exact_users * $ApproxTol)
       |    AS approx_users_ok,
       |  exact_types,
       |  (abs(aty - exact_types) <= exact_types * $ApproxTol)
       |    AS approx_types_ok,
       |  (abs(p50 - e50) <= abs(e50) * $ApproxTol) AS approx_p50_ok,
       |  (abs(p99 - e99) <= abs(e99) * $ApproxTol) AS approx_p99_ok
       |FROM a""".stripMargin

  // --------------------------------------------------------------- q27b
  /** KMV (k-minimum-values) distinct sketch — the deterministic,
    * cross-engine-exact counterpart to q27's HLL++: hash every key to
    * [0, P), keep the k smallest distinct hashes; the k-th smallest h_k
    * estimates n ≈ (k−1)·P / h_k. Constant memory like HLL, but built on
    * [[graft.functions.PortableHash]] so DuckDB reproduces it bit-for-bit
    * (q27's HLL side instead oracles engine-invariant tolerance
    * booleans — this KMV twin is the value-exact sketch). At scale
    * the k-smallest pass is a map-side partial (top-k per partition) +
    * one tiny merge, same shape as any global top-k. */
  private val KmvK = 128
  private val q27b: Q = (s, dir) => {
    import s.implicits._
    import graft.functions.{KmvSketch, PortableHash}
    // single-pass native sketch aggregate (graft.functions.KmvSketch):
    // partial sketches map-side, k longs per partition cross the wire —
    // the distinct-then-top-k formulation the oracle uses shuffles every
    // distinct hash; results are identical by construction
    ev(s, dir)
      .select(PortableHash.tokenHashP($"user_id").as("h"))
      .agg(KmvSketch.sketch($"h", KmvK).as("sk"))
      .crossJoin(ev(s, dir).agg(
        countDistinct($"user_id").cast("long").as("exact_users")))
      .select(
        when($"sk.n_sketch" >= KmvK,
          lit((KmvK - 1).toDouble * PortableHash.P) / $"sk.kth")
          .otherwise($"sk.n_sketch".cast("double")).as("kmv_users"),
        $"sk.n_sketch".as("n_sketch"),
        $"exact_users")
  }
  private val q27bSql = {
    import graft.functions.PortableHash.{P, tokenHashPSql}
    s"""WITH h AS (
       |  SELECT DISTINCT ${tokenHashPSql("user_id")} AS h FROM events),
       |topk AS (SELECT h FROM h ORDER BY h LIMIT $KmvK),
       |sk AS (SELECT MAX(h) AS hk, COUNT(*) AS n_sketch FROM topk),
       |ex AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
       |       FROM events)
       |SELECT
       |  CASE WHEN n_sketch >= $KmvK
       |       THEN CAST(${(KmvK - 1).toLong * P} AS DOUBLE) / hk
       |       ELSE CAST(n_sketch AS DOUBLE) END AS kmv_users,
       |  CAST(n_sketch AS BIGINT) AS n_sketch,
       |  exact_users
       |FROM sk CROSS JOIN ex""".stripMargin
  }

  // ---------------------------------------------------------------- q89
  /** Ordered funnel (view → click → purchase): per user, the first view,
    * the first click strictly AFTER that view, and the first purchase
    * strictly after that click — the product-analytics sequence query
    * (each step must follow the previous one in time, not merely occur).
    * Emits per-user step timestamps and the reached depth; left joins keep
    * every user who entered the funnel.
    *
    * Scale: three conditional MIN aggregations and two left joins, all
    * keyed on user_id — one hash partitioning reused end to end; no
    * windows, no self-join explosion (each stage aggregates BEFORE
    * joining the next, so the join inputs are one row per user). */
  private val q89: Q = (s, dir) => {
    import s.implicits._
    val e = ev(s, dir).select($"user_id", $"event_type", $"ts")
    val v = e.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("t1"))
    val c = e.filter($"event_type" === "click").join(v, "user_id")
      .filter($"ts" > $"t1")
      .groupBy($"user_id").agg(min($"ts").as("t2"))
    val p = e.filter($"event_type" === "purchase").join(c, "user_id")
      .filter($"ts" > $"t2")
      .groupBy($"user_id").agg(min($"ts").as("t3"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .select($"user_id",
        date_format($"t1", tsFmt).as("view_ts"),
        date_format($"t2", tsFmt).as("click_ts"),
        date_format($"t3", tsFmt).as("purchase_ts"),
        when($"t3".isNotNull, 3L).when($"t2".isNotNull, 2L)
          .otherwise(1L).as("depth"))
      .orderBy($"user_id")
  }
  private val q89Sql =
    s"""WITH v AS (
       |  SELECT user_id, MIN(ts) AS t1 FROM events
       |  WHERE event_type = 'view' GROUP BY user_id),
       |c AS (
       |  SELECT e.user_id, MIN(e.ts) AS t2
       |  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
       |  WHERE e.event_type = 'click' GROUP BY e.user_id),
       |p AS (
       |  SELECT e.user_id, MIN(e.ts) AS t3
       |  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
       |  WHERE e.event_type = 'purchase' GROUP BY e.user_id)
       |SELECT v.user_id,
       |  strftime(v.t1, '$tsFmtSqlSec') AS view_ts,
       |  strftime(c.t2, '$tsFmtSqlSec') AS click_ts,
       |  strftime(p.t3, '$tsFmtSqlSec') AS purchase_ts,
       |  CAST(CASE WHEN p.t3 IS NOT NULL THEN 3
       |            WHEN c.t2 IS NOT NULL THEN 2
       |            ELSE 1 END AS BIGINT) AS depth
       |FROM v
       |LEFT JOIN c ON v.user_id = c.user_id
       |LEFT JOIN p ON v.user_id = p.user_id
       |ORDER BY v.user_id""".stripMargin

  // ---------------------------------------------------------------- q90
  /** Weekly cohort retention: users grouped by their first active week
    * (the cohort), counted once per subsequent week of activity — the
    * classic retention matrix (cohort week × week offset → active users).
    * Both engines truncate weeks to Monday 00:00, and the offset is whole
    * days / 7 (exact for midnight-truncated weeks).
    *
    * Scale: one hash partitioning on user_id for the first-week aggregate
    * and the cohort join, then a distinct + count on the (cohort, offset)
    * matrix — whose cardinality is weeks², tiny at any data size. */
  private val q90: Q = (s, dir) => {
    import s.implicits._
    val e = ev(s, dir)
      .select($"user_id", date_trunc("week", $"ts").as("wk"))
    val cohorts = e.groupBy($"user_id").agg(min($"wk").as("cohort"))
    e.join(cohorts, "user_id")
      .select($"cohort",
        (datediff($"wk", $"cohort") / 7).cast("long").as("week_offset"),
        $"user_id")
      .distinct()
      .groupBy($"cohort", $"week_offset")
      .agg(count(lit(1)).as("n_active"))
      .select(date_format($"cohort", "yyyy-MM-dd").as("cohort_week"),
        $"week_offset", $"n_active")
      .orderBy($"cohort_week", $"week_offset")
  }
  private val q90Sql =
    """WITH e AS (
      |  SELECT user_id, date_trunc('week', ts) AS wk FROM events),
      |f AS (SELECT user_id, MIN(wk) AS cohort FROM e GROUP BY user_id),
      |a AS (
      |  SELECT DISTINCT f.cohort,
      |    date_diff('day', f.cohort, e.wk) // 7 AS week_offset,
      |    e.user_id
      |  FROM e JOIN f ON e.user_id = f.user_id)
      |SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week,
      |  CAST(week_offset AS BIGINT) AS week_offset,
      |  CAST(COUNT(*) AS BIGINT) AS n_active
      |FROM a
      |GROUP BY cohort, week_offset
      |ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q91
  /** Batch gap-based sessionization (the lag + cumulative-sum assignment,
    * complementing q29's streaming session windows): a new session starts
    * when a user's inter-event gap exceeds 30 minutes; emits one row per
    * session with bounds, event count, and duration. Ordering within a
    * user is (ts, event_id) — a total order, so ties cannot make engines
    * disagree on session boundaries.
    *
    * Scale: both windows partition by user_id (one hash partitioning,
    * per-user sequences are bounded), and the per-session rollup is a
    * hash aggregate on (user_id, session_idx) — no global window
    * anywhere. */
  private val q91: Q = (s, dir) => {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val gapSec = unix_timestamp($"ts") -
      unix_timestamp(lag($"ts", 1).over(byUser))
    ev(s, dir)
      .select($"user_id", $"event_id", $"ts")
      .withColumn("new_session",
        when(gapSec.isNull || gapSec > 1800L, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum($"new_session").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"session_idx")
      .agg(count(lit(1)).as("n_events"),
        date_format(min($"ts"), tsFmt).as("session_start"),
        date_format(max($"ts"), tsFmt).as("session_end"),
        (unix_timestamp(max($"ts")) - unix_timestamp(min($"ts")))
          .as("duration_sec"))
      .orderBy($"user_id", $"session_idx")
  }
  private val q91Sql =
    s"""WITH g AS (
       |  SELECT user_id, event_id, ts,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR date_diff('second', lag(ts) OVER w, ts) > 1800
       |         THEN 1 ELSE 0 END AS new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |sess AS (
       |  SELECT user_id, ts,
       |    SUM(new_session) OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS session_idx
       |  FROM g)
       |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       |  CAST(COUNT(*) AS BIGINT) AS n_events,
       |  strftime(MIN(ts), '$tsFmtSqlSec') AS session_start,
       |  strftime(MAX(ts), '$tsFmtSqlSec') AS session_end,
       |  date_diff('second', MIN(ts), MAX(ts)) AS duration_sec
       |FROM sess
       |GROUP BY user_id, session_idx
       |ORDER BY user_id, session_idx""".stripMargin

  // --------------------------------------------------------------- q155
  /** Concurrency curve over session INTERVALS — the sweep-line
    * aggregation (how many sessions were simultaneously live, hour by
    * hour: capacity planning's first question). Sessions are q91's
    * gap-1800s intervals, occupying [start, end + 1s); each contributes
    * a +1 boundary at start and a −1 at end+1, and the concurrency at
    * any boundary is the running sum of deltas in (t, delta) order
    * (delta ascending puts ends before starts at the same instant).
    *
    * The prefix sum is SHARDED, never global (q73's pattern): per-hour
    * delta totals roll up map-side; one tiny window over the HOUR KEYS
    * (bounded by the timespan, not the data) turns them into
    * entering-the-hour offsets; the within-hour running sum partitions
    * by hour. Per hour: boundary count, entering concurrency, and the
    * peak (entering level included — an hour of pure endings peaks at
    * entry). Tie order among equal (t, delta) rows cannot change any
    * emitted value: equal deltas commute, so the running-sum multiset —
    * and its max — is deterministic. Hours without boundaries carry the
    * previous level implicitly and are not emitted. */
  private val q155: Q = (s, dir) => {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val gapSec = unix_timestamp($"ts") -
      unix_timestamp(lag($"ts", 1).over(byUser))
    val sess = ev(s, dir)
      .select($"user_id", $"event_id", $"ts")
      .withColumn("new_session",
        when(gapSec.isNull || gapSec > 1800L, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum($"new_session").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"session_idx")
      .agg(unix_timestamp(min($"ts")).as("s"),
        (unix_timestamp(max($"ts")) + 1L).as("e"))
    val bounds = sess.select(explode(array(
        struct($"s".as("t"), lit(1L).as("delta")),
        struct($"e".as("t"), lit(-1L).as("delta")))).as("b"))
      .select($"b.t".as("t"), $"b.delta".as("delta"))
      .withColumn("hr", expr("t div 3600"))
    val hourTot = bounds.groupBy($"hr")
      .agg(sum($"delta").as("hd"), count(lit(1)).as("n_boundaries"))
    // hour-key prefix: a window over ~timespan/3600 rows, not data rows
    val wh = Window.orderBy($"hr")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = hourTot.withColumn("entering",
      coalesce(sum($"hd").over(wh), lit(0L)))
    val wIn = Window.partitionBy($"hr").orderBy($"t", $"delta")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val run = bounds.withColumn("rs", sum($"delta").over(wIn))
      .groupBy($"hr").agg(max($"rs").as("max_rs"))
    offsets.join(run, "hr")
      .select($"hr".as("hour"), $"n_boundaries", $"entering",
        greatest($"entering", $"entering" + $"max_rs")
          .as("peak_concurrency"))
      .orderBy($"hour")
  }
  private val q155Sql =
    s"""WITH g AS (
       |  SELECT user_id, event_id, ts,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR date_diff('second', lag(ts) OVER w, ts) > 1800
       |         THEN 1 ELSE 0 END AS new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |sess AS (
       |  SELECT user_id, ts,
       |    SUM(new_session) OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS session_idx
       |  FROM g),
       |iv AS (
       |  SELECT
       |    date_diff('second', TIMESTAMP '1970-01-01 00:00:00', MIN(ts))
       |      AS s,
       |    date_diff('second', TIMESTAMP '1970-01-01 00:00:00', MAX(ts))
       |      + 1 AS e
       |  FROM sess GROUP BY user_id, session_idx),
       |b AS (
       |  SELECT s AS t, 1 AS delta FROM iv
       |  UNION ALL
       |  SELECT e AS t, -1 AS delta FROM iv),
       |hb AS (SELECT t, delta, t // 3600 AS hr FROM b),
       |ht AS (
       |  SELECT hr, SUM(delta) AS hd, COUNT(*) AS n_boundaries
       |  FROM hb GROUP BY hr),
       |off AS (
       |  SELECT hr, n_boundaries,
       |    COALESCE(SUM(hd) OVER (ORDER BY hr
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS entering
       |  FROM ht),
       |run AS (
       |  SELECT hr, MAX(rs) AS max_rs FROM (
       |    SELECT hr,
       |      SUM(delta) OVER (PARTITION BY hr ORDER BY t, delta
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rs
       |    FROM hb)
       |  GROUP BY hr)
       |SELECT o.hr AS hour,
       |  CAST(o.n_boundaries AS BIGINT) AS n_boundaries,
       |  CAST(o.entering AS BIGINT) AS entering,
       |  CAST(GREATEST(o.entering, o.entering + r.max_rs) AS BIGINT)
       |    AS peak_concurrency
       |FROM off o JOIN run r ON o.hr = r.hr
       |ORDER BY hour""".stripMargin

  // --------------------------------------------------------------- q106
  /** SCD Type-2 interval build — event-sourced dimension versioning: per
    * user, consecutive runs of the same event_type collapse into one
    * versioned row with [valid_from, valid_to) bounds, the open version
    * flagged current — the slowly-changing-dimension table a warehouse
    * derives from a change stream. Run detection is the q91 lag +
    * cumulative-sum machinery keyed on attribute change instead of time
    * gaps; ordering within a user is the total (ts, event_id), so run
    * boundaries are engine-identical.
    *
    * Scale: both windows and the rollup partition on user_id — one hash
    * partitioning end-to-end, per-user sequences bounded, no global
    * window. */
  private val q106: Q = (s, dir) => {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val prevType = lag($"event_type", 1).over(byUser)
    val runs = ev(s, dir)
      .select($"user_id", $"event_id", $"ts", $"event_type")
      // null-SAFE distinctness: `prevType =!= x` is NULL (not true) when
      // either side is NULL, which would glue a NULL-typed row onto the
      // previous run while still splitting the rollup group — duplicate
      // version numbers + a lead() tie. <=> makes every transition
      // involving NULL an explicit run boundary (and a leading NULL run
      // its own run 0), matching the oracle's IS DISTINCT FROM.
      .withColumn("chg",
        when(!(prevType <=> $"event_type"), 1L).otherwise(0L))
      .withColumn("run_idx",
        sum($"chg").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"run_idx", $"event_type")
      .agg(count(lit(1)).as("n_events"), min($"ts").as("vf"))
    val byRun = Window.partitionBy($"user_id").orderBy($"run_idx")
    runs
      .withColumn("vt", lead($"vf", 1).over(byRun))
      .select($"user_id", $"run_idx".cast("long").as("version"),
        $"event_type",
        date_format($"vf", tsFmt).as("valid_from"),
        date_format($"vt", tsFmt).as("valid_to"),
        $"vt".isNull.as("is_current"),
        $"n_events".cast("long").as("n_events"))
      .orderBy($"user_id", $"version")
  }
  private val q106Sql =
    s"""WITH g AS (
       |  SELECT user_id, event_id, ts, event_type,
       |    CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
       |         THEN 1 ELSE 0 END AS chg
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |r AS (
       |  SELECT user_id, ts, event_type,
       |    SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_idx
       |  FROM g),
       |runs AS (
       |  SELECT user_id, run_idx, event_type,
       |    CAST(COUNT(*) AS BIGINT) AS n_events, MIN(ts) AS vf
       |  FROM r GROUP BY user_id, run_idx, event_type)
       |SELECT user_id, CAST(run_idx AS BIGINT) AS version, event_type,
       |  strftime(vf, '$tsFmtSqlSec') AS valid_from,
       |  strftime(lead(vf) OVER v, '$tsFmtSqlSec') AS valid_to,
       |  (lead(vf) OVER v IS NULL) AS is_current,
       |  n_events
       |FROM runs
       |WINDOW v AS (PARTITION BY user_id ORDER BY run_idx)
       |ORDER BY user_id, version""".stripMargin

  // --------------------------------------------------------------- q128
  /** POINT-IN-TIME feature join against a versioned (SCD2) dimension —
    * the leakage-free enrichment a training pipeline needs: each
    * purchase event joins the user's behavioral regime (q106's run
    * versioning over the NON-purchase stream) as it stood AT purchase
    * time, never a later version — the feature-store "as-of"
    * correctness rule that keeps future information out of training
    * examples.
    *
    * The Spark-first shape: an SCD2 interval lookup is NOT a range join
    * — because versions tile each user's timeline, "the version valid
    * at t" ≡ "the latest version starting ≤ t", i.e. an AS-OF join.
    * Union dimension starts and facts, one (user, time, kind, tie)
    * sort, one last(ignoreNulls) carry — a single hash exchange on
    * user_id, no interval explosion, per-user sequences bound every
    * window. Ties: a version starting exactly at purchase time counts
    * as active (kind orders dim rows first); two runs starting at the
    * same instant resolve to the later version (tie = version), which
    * the oracle mirrors by deduping equal-start versions to the
    * highest. */
  private val q128: Q = (s, dir) => {
    import s.implicits._
    val evs = ev(s, dir)
      .select($"user_id", $"event_id", $"ts", $"event_type")
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val prevType = lag($"event_type", 1).over(byUser)
    val dim = evs.filter($"event_type" =!= "purchase")
      .withColumn("chg",
        when(!(prevType <=> $"event_type"), 1L).otherwise(0L))
      .withColumn("version",
        sum($"chg").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"version", $"event_type")
      .agg(min($"ts").as("vf"))
      .select($"user_id", $"vf".as("ts"), lit(0).as("kind"),
        $"version".cast("long").as("tie"),
        $"event_type".as("regime"), lit(null).cast("long").as("event_id"))
    val facts = evs.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", lit(1).as("kind"),
        $"event_id".as("tie"), lit(null).cast("string").as("regime"),
        $"event_id")
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts".asc, $"kind".asc, $"tie".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dim.union(facts)
      .withColumn("st", last(when($"kind" === 0,
          struct($"regime", $"tie".as("version"), $"ts".as("vf"))),
        ignoreNulls = true).over(w))
      .filter($"kind" === 1)
      .select($"event_id", $"user_id",
        date_format($"ts", tsFmt).as("purchase_time"),
        $"st.regime".as("regime"),
        $"st.version".as("regime_version"),
        date_format($"st.vf", tsFmt).as("regime_since"))
      .orderBy($"event_id")
  }
  private val q128Sql =
    s"""WITH b AS (
       |  SELECT user_id, event_id, ts, event_type,
       |    CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
       |         THEN 1 ELSE 0 END AS chg
       |  FROM events WHERE event_type <> 'purchase'
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |r AS (
       |  SELECT user_id, ts, event_type,
       |    SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version
       |  FROM b),
       |runs AS (
       |  SELECT user_id, version, event_type AS regime, MIN(ts) AS vf
       |  FROM r GROUP BY user_id, version, event_type),
       |dedup AS (
       |  SELECT user_id, version, regime, vf,
       |    ROW_NUMBER() OVER (PARTITION BY user_id, vf
       |                       ORDER BY version DESC) AS rn
       |  FROM runs),
       |d AS (SELECT * FROM dedup WHERE rn = 1),
       |f AS (SELECT event_id, user_id, ts FROM events
       |      WHERE event_type = 'purchase')
       |SELECT f.event_id, f.user_id,
       |  strftime(f.ts, '$tsFmtSqlSec') AS purchase_time,
       |  d.regime,
       |  CAST(d.version AS BIGINT) AS regime_version,
       |  strftime(d.vf, '$tsFmtSqlSec') AS regime_since
       |FROM f ASOF LEFT JOIN d
       |  ON f.user_id = d.user_id AND f.ts >= d.vf
       |ORDER BY event_id""".stripMargin

  // --------------------------------------------------------------- q113
  /** Exponential moving average over per-type daily counts — the
    * time-series smoothing stage of a monitoring dashboard, and a pattern
    * class nothing else in the tree exercises: a SEQUENTIAL RECURRENCE
    * (ema_i depends on ema_{i-1}) that no window frame expresses. The
    * scale-honest shape: the recurrence is inherently serial *within* a
    * series, so collapse each series to an array — bounded by the TIME
    * DOMAIN (days), not data volume, because it folds the pre-aggregated
    * daily counts — and run the fold as one `aggregate` prefix scan per
    * group, groups in parallel. α = 1/2 in fixed-point (×1000) integer
    * arithmetic: every step is add + truncating halve, so engines cannot
    * disagree (DuckDB mirrors with a recursive CTE over the row index,
    * depth = series length). */
  private val q113: Q = (s, dir) => {
    import s.implicits._
    val daily = ev(s, dir)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("cnt"))
    daily.groupBy($"event_type")
      .agg(array_sort(collect_list(struct($"day", $"cnt"))).as("xs"))
      .select($"event_type", explode(expr(
        """zip_with(xs,
          |  aggregate(xs, cast(array() as array<bigint>), (acc, x) ->
          |    acc || array(CASE WHEN size(acc) = 0 THEN x.cnt * 1000L
          |      ELSE (element_at(acc, -1) + x.cnt * 1000L) div 2 END)),
          |  (x, e) -> struct(x.day as day, x.cnt as cnt, e as ema_fp))"""
          .stripMargin)).as("r"))
      .select($"event_type", $"r.day".as("day"), $"r.cnt".as("cnt"),
        $"r.ema_fp".as("ema_fp"))
      .orderBy($"event_type", $"day")
  }
  private val q113Sql =
    """WITH RECURSIVE daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |         CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |idx AS (
      |  SELECT event_type, day, cnt,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
      |  FROM daily),
      |ema AS (
      |  SELECT event_type, day, cnt, rn, cnt * 1000 AS ema_fp
      |  FROM idx WHERE rn = 1
      |  UNION ALL
      |  SELECT i.event_type, i.day, i.cnt, i.rn,
      |         (e.ema_fp + i.cnt * 1000) // 2
      |  FROM ema e JOIN idx i
      |    ON i.event_type = e.event_type AND i.rn = e.rn + 1)
      |SELECT event_type, day, cnt, CAST(ema_fp AS BIGINT) AS ema_fp
      |FROM ema
      |ORDER BY event_type, day""".stripMargin

  // --------------------------------------------------------------- q137
  /** Rolling anomaly detection — the monitoring query a metrics pipeline
    * runs over every series it ingests: each user's hourly mean value is
    * scored against the mean/stddev of their own PREVIOUS 24 observed
    * hours (a trailing baseline that excludes the current point, so a
    * spike can't mask itself), z = (v − μ)/σ, flagged at |z| > 3. Scores
    * are emitted only once 8 prior observations exist (cold series don't
    * alarm) and σ > 0 (a constant baseline scores nothing rather than
    * ±∞).
    *
    * Cross-engine exactness: the rolling μ and σ derive from DECIMAL
    * frame sums of v and v² ([[graft.functions.Exact]] — the
    * order-independent accumulation), variance via the fixed-order
    * E[v²]−μ² form floored at 0 (catastrophic cancellation on a
    * near-constant series must not produce NaN on one engine and 0 on
    * the other), and sqrt/divide are correctly-rounded IEEE — every z
    * is bit-identical in DuckDB.
    *
    * Scale: one (user, hour) hash aggregate, then ONE sort-window per
    * user ordered by hour computing all three frame aggregates — the
    * same single-exchange shape as every per-entity window here; frames
    * are 24 rows whatever the history length. */
  private val q137: Q = (s, dir) => {
    import s.implicits._
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 4)
    val hourly = Tables(s, dir, "events")
      .groupBy($"user_id", date_trunc("hour", $"ts").as("hour"))
      .agg(count(lit(1)).as("n_obs"), dsum($"value").as("sv"))
      .withColumn("v", $"sv".cast("double") / $"n_obs".cast("double"))
      .withColumn("hidx", (unix_timestamp($"hour") / 3600L).cast("long"))
    val wTrail = Window.partitionBy($"user_id").orderBy($"hidx")
      .rowsBetween(-24, -1)
    val scored = hourly
      .withColumn("n_prior", count(lit(1)).over(wTrail))
      .withColumn("s1", sum($"v".cast(dec)).over(wTrail).cast("double"))
      .withColumn("s2",
        sum(($"v" * $"v").cast(dec)).over(wTrail).cast("double"))
      .withColumn("mu", $"s1" / $"n_prior".cast("double"))
      .withColumn("sigma", sqrt(greatest(
        $"s2" / $"n_prior".cast("double") - $"mu" * $"mu", lit(0.0))))
      .withColumn("z", when($"n_prior" >= 8 && $"sigma" > 0,
        ($"v" - $"mu") / $"sigma"))
    scored.select($"user_id", $"hidx", $"v", $"n_prior", $"z",
        coalesce(abs($"z") > 3.0, lit(false)).as("is_anomaly"))
      .orderBy($"user_id", $"hidx")
  }
  private val q137Sql =
    """WITH hourly AS (
      |  SELECT user_id, date_trunc('hour', ts) AS hh,
      |    CAST(COUNT(*) AS BIGINT) AS n_obs,
      |    CAST(SUM(CAST("value" AS DECIMAL(38,4))) AS DOUBLE) AS sv
      |  FROM events GROUP BY user_id, hh),
      |hv AS (
      |  SELECT user_id, CAST(epoch(hh) AS BIGINT) // 3600 AS hidx,
      |    sv / CAST(n_obs AS DOUBLE) AS v
      |  FROM hourly),
      |roll AS (
      |  SELECT user_id, hidx, v,
      |    COUNT(*) OVER w AS n_prior,
      |    CAST(SUM(CAST(v AS DECIMAL(38,4))) OVER w AS DOUBLE) AS s1,
      |    CAST(SUM(CAST(v * v AS DECIMAL(38,4))) OVER w AS DOUBLE) AS s2
      |  FROM hv
      |  WINDOW w AS (PARTITION BY user_id ORDER BY hidx
      |               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
      |scored AS (
      |  SELECT user_id, hidx, v, n_prior,
      |    s1 / CAST(n_prior AS DOUBLE) AS mu,
      |    sqrt(GREATEST(
      |      s2 / CAST(n_prior AS DOUBLE)
      |        - (s1 / CAST(n_prior AS DOUBLE))
      |          * (s1 / CAST(n_prior AS DOUBLE)), 0.0)) AS sigma
      |  FROM roll)
      |SELECT user_id, hidx, v, n_prior,
      |  CASE WHEN n_prior >= 8 AND sigma > 0
      |       THEN (v - mu) / sigma END AS z,
      |  COALESCE(abs(CASE WHEN n_prior >= 8 AND sigma > 0
      |                    THEN (v - mu) / sigma END) > 3.0, false)
      |    AS is_anomaly
      |FROM scored ORDER BY user_id, hidx""".stripMargin

  // --------------------------------------------------------------- q138
  /** Consecutive-run pattern detection (MATCH_RECOGNIZE's workhorse
    * case, relationally): per user, maximal runs of CONSECUTIVE
    * same-type events — broken by any other event type or a gap over
    * 10 minutes — surfaced where the type is `error` and the run is ≥ 3
    * long: the "three failures in a row" alerting shape. Gaps-and-
    * islands: one lag window marks run breaks, a running sum numbers
    * the islands, one grouped aggregate per island; q91's session
    * operator breaks on time alone — this breaks on value AND time,
    * which is what distinguishes a burst from a busy session. Time
    * arithmetic is integer microseconds (`unix_micros`/`epoch_us`), so
    * every duration is engine-exact.
    *
    * Scale: both windows and the island aggregate partition on
    * user_id — ONE hash exchange end to end; island state is a running
    * sum, never a buffered partition. */
  private val q138: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val marked = Tables(s, dir, "events")
      .select($"user_id", $"event_type", $"event_id",
        unix_micros($"ts").as("us"))
      .withColumn("brk", when(
        lag($"event_type", 1).over(w).isNull ||
          $"event_type" =!= lag($"event_type", 1).over(w) ||
          $"us" - lag($"us", 1).over(w) > 600000000L, 1L).otherwise(0L))
      .withColumn("run", sum($"brk")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    marked.groupBy($"user_id", $"event_type", $"run")
      .agg(count(lit(1)).as("n_events"),
        min($"event_id").as("first_event_id"),
        max($"event_id").as("last_event_id"),
        (max($"us") - min($"us")).as("duration_us"))
      .filter($"event_type" === "error" && $"n_events" >= 3)
      .select($"user_id", $"first_event_id", $"last_event_id",
        $"n_events", $"duration_us")
      .orderBy($"user_id", $"first_event_id")
  }
  private val q138Sql =
    """WITH e AS (
      |  SELECT user_id, event_type, event_id, epoch_us(ts) AS us
      |  FROM events),
      |marked AS (
      |  SELECT *, CASE WHEN prev_type IS NULL OR event_type <> prev_type
      |                   OR us - prev_us > 600000000 THEN 1 ELSE 0 END
      |              AS brk
      |  FROM (SELECT *,
      |          LAG(event_type) OVER w AS prev_type,
      |          LAG(us) OVER w AS prev_us
      |        FROM e
      |        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))),
      |runs AS (
      |  SELECT *, SUM(brk) OVER
      |    (PARTITION BY user_id ORDER BY us, event_id
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      |  FROM marked)
      |SELECT user_id,
      |  MIN(event_id) AS first_event_id,
      |  MAX(event_id) AS last_event_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  MAX(us) - MIN(us) AS duration_us
      |FROM runs
      |GROUP BY user_id, event_type, run
      |HAVING event_type = 'error' AND COUNT(*) >= 3
      |ORDER BY user_id, first_event_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q138_error_bursts" -> q138,
    "q137_rolling_anomaly" -> q137,
    "q113_ema_daily" -> q113,
    "q106_scd2_intervals" -> q106,
    "q128_pit_scd2_join" -> q128,
    "q91_gap_sessions" -> q91,
    "q155_concurrency_curve" -> q155,
    "q90_cohort_retention" -> q90,
    "q89_funnel_steps" -> q89,
    "q27_approx_distinct" -> q27,
    "q27b_kmv_distinct" -> q27b,
    "q21b_dedup_last_wins" -> q21b,
    "q21c_incremental_dedup" -> q21c,
    "q20_events_transform" -> q20,
    "q21_events_dedup_first_wins" -> q21,
    "q22_retention_keep_newest" -> q22,
    "q23_resume_offset" -> q23,
    "q24_dashboard_snapshot" -> q24,
    "q25_events_per_minute" -> q25,
    "q26_minute_deltas" -> q26)

  val oracleSql: Map[String, String] = Map(
    "q138_error_bursts" -> q138Sql,
    "q137_rolling_anomaly" -> q137Sql,
    "q113_ema_daily" -> q113Sql,
    "q106_scd2_intervals" -> q106Sql,
    "q128_pit_scd2_join" -> q128Sql,
    "q91_gap_sessions" -> q91Sql,
    "q155_concurrency_curve" -> q155Sql,
    "q90_cohort_retention" -> q90Sql,
    "q89_funnel_steps" -> q89Sql,
    "q27_approx_distinct" -> q27Sql,
    "q27b_kmv_distinct" -> q27bSql,
    "q21b_dedup_last_wins" -> q21bSql,
    "q21c_incremental_dedup" -> q21cSql,
    "q20_events_transform" -> q20Sql,
    "q21_events_dedup_first_wins" -> q21Sql,
    "q22_retention_keep_newest" -> q22Sql,
    "q23_resume_offset" -> q23Sql,
    "q24_dashboard_snapshot" -> q24Sql,
    "q25_events_per_minute" -> q25Sql,
    "q26_minute_deltas" -> q26Sql)
}
