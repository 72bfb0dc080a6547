package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Exact
import graft.sinks.{IncrementalAgg, ManifestSink}

/** The transparent materialized-view rewrite: every arm must be either a
  * full rewrite (only scan = the state parquet) or a clean fallback (the
  * base scan, unmodified results) — never a half-translated plan. */
class ViewRewriteSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("k1", "k2")

  /** Root paths of every file scan in the executed plan (through AQE). */
  private def scanPaths(df: DataFrame): Seq[String] = {
    val p = df.queryExecution.executedPlan
    val inner = p match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case other => other
    }
    inner.collect {
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.toString)
    }.flatten
  }

  private def servedByState(df: DataFrame, stateDir: String): Boolean = {
    val paths = scanPaths(df)
    paths.nonEmpty && paths.forall(_.contains("/state"))
  }

  /** Rows of `df` as a sorted, fully-rendered seq (null-safe compare). */
  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** Fixture: a two-append sink (nulls, negatives, an all-null group),
    * its folded IncrementalAgg state, registered. Returns
    * (baseDir, stateDir). */
  private def fixture(tag: String): (String, String) = {
    val root = java.nio.file.Files
      .createTempDirectory(s"graft_vr_$tag").toString
    val (base, stateDir) = (root + "/b", root + "/state")
    val b1 = Seq(
      ("a", "x", Some(1.5)), ("a", "x", Some(2.25)), ("a", "y", Some(-3.0)),
      ("b", "x", None), ("b", "x", Some(10.0)), ("n", "n", None))
      .toDF("k1", "k2", "v")
    val b2 = Seq(
      ("a", "x", Some(100.0)), ("b", "x", Some(-1.0)), ("n", "n", None),
      ("c", "z", Some(0.0625)))
      .toDF("k1", "k2", "v")
    ManifestSink.append(b1, base)
    val v0 = ManifestSink.version(spark, base)
    val s0 = IncrementalAgg.aggregate(ManifestSink.read(spark, base),
      keys, "v")
    ManifestSink.append(b2, base)
    val v1 = ManifestSink.version(spark, base)
    IncrementalAgg.refresh(spark, s0, base, v0, v1, keys, "v")
      .write.parquet(stateDir)
    ViewRewrite.install(spark)
    ViewRewrite.registerForSink(spark, base, keys, "v", stateDir)
    (base, stateDir)
  }

  private def userAgg(base: String): DataFrame =
    ManifestSink.read(spark, base)
      .groupBy($"k1", $"k2")
      .agg(count(lit(1)).as("n_rows"),
        Exact.dsum($"v").as("sum_v"),
        min($"v").as("min_v"),
        max($"v").as("max_v"),
        Exact.davg($"v").as("avg_v"))

  test("full mergeable family served from the state, bit-equal to base") {
    val (base, stateDir) = fixture("serve")
    try {
      val served = userAgg(base)
      assert(servedByState(served, stateDir),
        s"expected state-only scan, got ${scanPaths(served)}")
      ViewRewrite.clear()
      val direct = userAgg(base)
      assert(scanPaths(direct).forall(_.contains("/b")))
      assert(canon(served) === canon(direct))
      // null semantics: the all-null group carries null sum/min/max/avg
      val nn = served.filter($"k1" === "n").collect()
      assert(nn.length === 1 && nn(0).getLong(2) === 2L && nn(0).isNullAt(3)
        && nn(0).isNullAt(4) && nn(0).isNullAt(5) && nn(0).isNullAt(6))
    } finally ViewRewrite.clear()
  }

  test("count(*), permuted grouping order, and bare sum all rewrite") {
    val (base, stateDir) = fixture("shapes")
    try {
      // groupBy order differs from the registered key order; count(*)
      // via the star path; sum without the decimal cast
      val q = ManifestSink.read(spark, base).groupBy($"k2", $"k1")
        .agg(count(lit(1)).as("n"), sum($"v").as("s"))
      assert(servedByState(q, stateDir))
      ViewRewrite.clear()
      assert(canon(q) === canon(
        ManifestSink.read(spark, base).groupBy($"k2", $"k1")
          .agg(count(lit(1)).as("n"), sum($"v").as("s"))))
    } finally ViewRewrite.clear()
  }

  test("staleness is structural: a new commit stops the rewrite") {
    val (base, stateDir) = fixture("stale")
    try {
      ManifestSink.append(
        Seq(("a", "x", Some(7.0))).toDF("k1", "k2", "v"), base)
      val q = userAgg(base)
      // path set changed → no match → base scan, and the NEW row counts
      assert(!servedByState(q, stateDir))
      val ax = q.filter($"k1" === "a" && $"k2" === "x").collect()(0)
      assert(ax.getLong(2) === 4L && ax.getDouble(3) === 110.75)
      // re-pinning after a refresh restores the rewrite
      val v2 = ManifestSink.version(spark, base)
      val st2 = IncrementalAgg.aggregate(
        ManifestSink.readAt(spark, base, v2), keys, "v")
      val state2 = stateDir + "2"
      st2.write.parquet(state2)
      ViewRewrite.registerForSink(spark, base, keys, "v", state2)
      val q2 = userAgg(base)
      assert(scanPaths(q2).forall(_.contains("/state")))
      assert(canon(q2) === canon(q))
    } finally ViewRewrite.clear()
  }

  test("unservable shapes veto the whole node and stay correct") {
    val (base, stateDir) = fixture("veto")
    try {
      def read() = ManifestSink.read(spark, base)
      val vetoed: Seq[(String, DataFrame)] = Seq(
        "filter under agg" ->
          read().filter($"v" > 0).groupBy($"k1", $"k2")
            .agg(sum($"v").as("s")),
        "null-sensitive count(col)" ->
          read().groupBy($"k1", $"k2").agg(count($"v").as("c")),
        "distinct agg" ->
          read().groupBy($"k1", $"k2").agg(countDistinct($"v").as("c")),
        "plain avg (order-dependent double)" ->
          read().groupBy($"k1", $"k2").agg(avg($"v").as("a")),
        "wrong grouping keys" ->
          read().groupBy($"k1").agg(sum($"v").as("s")),
        "non-value column" ->
          read().groupBy($"k1", $"k2").agg(sum(length($"k2")).as("s")),
        "global aggregate (no grouping)" ->
          read().agg(sum($"v").as("s")))
      vetoed.foreach { case (why, df) =>
        assert(!scanPaths(df).exists(_.contains("/state")),
          s"'$why' must not be served from the state")
        df.collect() // and still executes correctly against the base
      }
      // sanity: the happy shape still rewrites in the same session
      assert(servedByState(
        read().groupBy($"k1", $"k2").agg(sum($"v").as("s")), stateDir))
    } finally ViewRewrite.clear()
  }

  test("the SQL surface serves too: a spark.sql aggregate over a temp " +
      "view of the sink read rewrites to the state") {
    val (base, stateDir) = fixture("sql")
    try {
      ManifestSink.read(spark, base).createOrReplaceTempView("vr_sql_t")
      val q = spark.sql(
        """SELECT k1, k2, count(1) AS n, sum(v) AS s, min(v) AS mn
          |FROM vr_sql_t GROUP BY k1, k2""".stripMargin)
      assert(servedByState(q, stateDir),
        s"SQL aggregate not served: ${scanPaths(q)}")
      ViewRewrite.clear()
      val direct = spark.sql(
        """SELECT k1, k2, count(1) AS n, sum(v) AS s, min(v) AS mn
          |FROM vr_sql_t GROUP BY k1, k2""".stripMargin)
      assert(canon(q) === canon(direct))
    } finally {
      ViewRewrite.clear()
      spark.catalog.dropTempView("vr_sql_t")
    }
  }

  test("registerForSink refuses tombstoned snapshots") {
    val (base, _) = fixture("tomb")
    try {
      ManifestSink.deleteKeysMergeOnRead(
        Seq(("a", "y")).toDF("k1", "k2"), base, keys)
      val e = intercept[IllegalArgumentException] {
        ViewRewrite.registerForSink(spark, base, keys, "v", base)
      }
      assert(e.getMessage.contains("tombstones"))
    } finally ViewRewrite.clear()
  }

  // -------------------------------------------------------- join arm

  /** Join fixture: two sink tables sharing only `okey`, their
    * materialized join view, registered. Returns (l, r, view). */
  private def joinFixture(tag: String): (String, String, String) = {
    import graft.sinks.IncrementalJoinView
    val root = java.nio.file.Files
      .createTempDirectory(s"graft_vrj_$tag").toString
    val (l, r, v) = (root + "/l", root + "/r", root + "/view")
    ManifestSink.append(
      Seq((1L, 10.0), (2L, 20.0), (2L, 21.0), (7L, 70.0))
        .toDF("okey", "x"), l)
    ManifestSink.append(
      Seq((1L, "a"), (2L, "b"), (9L, "z")).toDF("okey", "y"), r)
    IncrementalJoinView.create(spark, v, l, r, "okey")
    ViewRewrite.install(spark)
    ViewRewrite.registerJoinForView(spark, v, l, r, "okey")
    (l, r, v)
  }

  private def userJoin(l: String, r: String) =
    ManifestSink.read(spark, l)
      .join(ManifestSink.read(spark, r), Seq("okey"))

  test("join of registered sources serves from the view; any parent " +
      "composes on top") {
    val (l, r, _) = joinFixture("serve")
    try {
      val q = userJoin(l, r).groupBy($"y")
        .agg(count(lit(1)).as("n"), avg($"x").as("ax"))
      assert(scanPaths(q).forall(_.contains("/view")),
        s"expected view-only scan, got ${scanPaths(q)}")
      // the bare (un-aggregated) join read serves too
      val bare = userJoin(l, r)
      assert(scanPaths(bare).forall(_.contains("/view")))
      ViewRewrite.clear()
      val direct = userJoin(l, r).groupBy($"y")
        .agg(count(lit(1)).as("n"), avg($"x").as("ax"))
      assert(canon(q) === canon(direct))
      assert(canon(bare) === canon(userJoin(l, r)))
    } finally ViewRewrite.clear()
  }

  test("join staleness is structural: a commit on either source stops " +
      "the rewrite; re-register after refresh restores it") {
    import graft.sinks.IncrementalJoinView
    val (l, r, v) = joinFixture("stale")
    try {
      ManifestSink.append(Seq((7L, "g")).toDF("okey", "y"), r)
      val q = userJoin(l, r)
      assert(!scanPaths(q).exists(_.contains("/view")))
      assert(q.count() === 4) // the new (7, g) row matches (7, 70.0)
      val (_, folded) =
        IncrementalJoinView.refresh(spark, v, l, r, "okey")
      assert(folded)
      ViewRewrite.registerJoinForView(spark, v, l, r, "okey")
      val q2 = userJoin(l, r)
      assert(scanPaths(q2).forall(_.contains("/view")))
      assert(q2.count() === 4)
      assert(canon(q2) === canon(q))
    } finally ViewRewrite.clear()
  }

  test("single-side filters and extra conjuncts commute: they re-apply " +
      "above the view scan instead of vetoing") {
    val (l, r, _) = joinFixture("commute")
    try {
      val served = Seq(
        "filtered left side" ->
          (() => ManifestSink.read(spark, l).filter($"x" > 15.0)
            .join(ManifestSink.read(spark, r), Seq("okey"))),
        "filters on both sides" ->
          (() => ManifestSink.read(spark, l).filter($"x" > 15.0)
            .join(ManifestSink.read(spark, r).filter($"y" =!= "z"),
              Seq("okey"))),
        "extra cross conjunct" ->
          (() => ManifestSink.read(spark, l).as("l")
            .join(ManifestSink.read(spark, r).as("r"),
              $"l.okey" === $"r.okey" && $"x" > lit(15.0))))
      served.foreach { case (why, mk) =>
        val df = mk()
        assert(scanPaths(df).forall(_.contains("/view")),
          s"'$why' should serve from the view with the filter re-applied")
      }
      val got = served.map { case (_, mk) => canon(mk()) }
      ViewRewrite.clear()
      val want = served.map { case (_, mk) => canon(mk()) }
      assert(got === want)
    } finally ViewRewrite.clear()
  }

  test("unservable join shapes fall back to the base scans") {
    val (l, r, _) = joinFixture("veto")
    try {
      val vetoed = Seq(
        "left outer join" ->
          ManifestSink.read(spark, l).join(ManifestSink.read(spark, r),
            Seq("okey"), "left_outer"),
        "non-deterministic filter" ->
          ManifestSink.read(spark, l).filter(rand() < 0.5)
            .join(ManifestSink.read(spark, r), Seq("okey")),
        "no key equality" ->
          ManifestSink.read(spark, l).as("l")
            .join(ManifestSink.read(spark, r).as("r"),
              $"l.okey" < $"r.okey"))
      vetoed.foreach { case (why, df) =>
        assert(!scanPaths(df).exists(_.contains("/view")),
          s"'$why' must not be served from the view")
        df.collect()
      }
      // happy shape still serves in the same session
      assert(scanPaths(userJoin(l, r)).forall(_.contains("/view")))
    } finally ViewRewrite.clear()
  }

  test("stacked join views rewrite transitively: one 3-way user query " +
      "lands on the second-level view through both registrations") {
    import graft.sinks.IncrementalJoinView
    val (l, r, v) = joinFixture("stack")
    try {
      val root = java.nio.file.Files
        .createTempDirectory("graft_vrj_stack2").toString
      val (c, v2) = (root + "/c", root + "/view2")
      ManifestSink.append(
        Seq((1L, 100L), (2L, 200L), (7L, 700L)).toDF("okey", "z"), c)
      // second-level view: the first view (a normal sink table) ⋈ C
      IncrementalJoinView.create(spark, v2, v, c, "okey")
      ViewRewrite.registerJoinForView(spark, v2, v, c, "okey")
      def threeWay() = ManifestSink.read(spark, l)
        .join(ManifestSink.read(spark, r), Seq("okey"))
        .join(ManifestSink.read(spark, c), Seq("okey"))
        .groupBy($"y").agg(sum($"z").as("sz"), count(lit(1)).as("n"))
      val q = threeWay()
      // inner join → view v, then (v ⋈ c) → view v2, all in one pass
      assert(scanPaths(q).forall(_.contains("/view2")),
        s"expected second-level view scan, got ${scanPaths(q)}")
      ViewRewrite.clear()
      assert(canon(q) === canon(threeWay()))
    } finally ViewRewrite.clear()
  }

  test("register validates the state schema") {
    val (base, _) = fixture("schema")
    try {
      val bad = java.nio.file.Files
        .createTempDirectory("graft_vr_badstate").toString + "/s"
      Seq(("a", 1L)).toDF("k1", "n").write.parquet(bad)
      val e = intercept[IllegalArgumentException] {
        ViewRewrite.register(spark,
          ManifestSink.currentDataPaths(spark, base), keys, "v", bad)
      }
      assert(e.getMessage.contains("lacks columns"))
    } finally ViewRewrite.clear()
  }
}
