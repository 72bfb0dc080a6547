package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinRuleSpec extends AnyFunSuite with BeforeAndAfterAll {

  /** Detach this suite's extensions session from the JVM-wide default so
    * later suites' getOrCreate builds a clean session (same context). */
  override def afterAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    super.afterAll()
  }

  /** Session with GraftExtensions installed and broadcast disabled (so the
    * rule's own size guard doesn't defer to broadcast nested-loop at this
    * test's toy scale). Separate from the shared SparkSpec session because
    * extensions bind at session construction; `withExtensions` (not the
    * `spark.sql.extensions` static conf) so they also apply when an
    * earlier suite already created the shared SparkContext. */
  private lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions()(_))
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config(RangeJoinRule.WidthKey, "10")
      .getOrCreate()
  }

  import spark.implicits._

  private def naiveJoin(pts: Seq[Long], ivs: Seq[(Long, Long, Long)]) = {
    val p = pts.toDF("v")
    val i = ivs.toDF("iv_id", "lo", "hi")
    p.join(i, $"v" >= $"lo" && $"v" <= $"hi")
  }

  test("naive BETWEEN join is rewritten to a bucketed equi-join") {
    val df = naiveJoin(Seq(1L, 5L, 23L, 42L, -7L),
      Seq((1L, 0L, 9L), (2L, 5L, 17L), (3L, -10L, 60L), (4L, 43L, 43L)))
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin"), physical.take(900))
    assert(!physical.contains("CartesianProduct"), physical.take(900))
    val got = df.select($"v", $"iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // negative values exercise the floor-division path (truncation toward
    // zero would assign -7 to the wrong bucket and drop its match)
    val want = Set((1L, 1L), (5L, 1L), (5L, 2L), (23L, 3L), (42L, 3L),
      (1L, 3L), (5L, 3L), (-7L, 3L))
    assert(got === want)
  }

  test("strict bounds keep exact semantics through the bucket superset") {
    val p = Seq(5L, 9L, 10L).toDF("v")
    val i = Seq((1L, 5L, 10L)).toDF("iv_id", "lo", "hi")
    val got = p.join(i, $"v" > $"lo" && $"v" < $"hi")
      .select($"v").collect().map(_.getLong(0)).toSet
    assert(got === Set(9L))
  }

  test("equi conjunct present → rule stands down (built-in hash join)") {
    val p = Seq((1L, 5L)).toDF("k", "v")
    val i = Seq((1L, 0L, 9L)).toDF("k2", "lo", "hi")
    val df = p.join(i, $"k" === $"k2" && $"v" >= $"lo" && $"v" <= $"hi")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("__graft_pb"), optimized)
    assert(df.count() === 1)
  }

  test("non-integral point type → rule stands down (no wrong buckets)") {
    val p = Seq(1.5, 7.2).toDF("v")
    val i = Seq((1L, 0.0, 9.0)).toDF("iv_id", "lo", "hi")
    val df = p.join(i, $"v" >= $"lo" && $"v" <= $"hi")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("__graft_pb"), optimized)
    assert(df.count() === 2) // still correct through the built-in join
  }

  test("extensions also provide the as-of strategy") {
    import java.sql.Timestamp
    val probes = Seq((7L, Timestamp.valueOf("2024-01-01 11:00:00"), 1L))
      .toDF("user_id", "ts", "event_id")
    val refs = Seq((7L, Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("user_id", "ts")
    val out = AsOf.join(probes, refs, "user_id", "ts").collect()
    assert(out.length === 1)
    assert(out.head.getAs[Timestamp]("matched_time") ===
      Timestamp.valueOf("2024-01-01 10:00:00"))
  }
}
