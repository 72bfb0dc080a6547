package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Exact
import graft.sources.Tables

/** Skew mitigation by key salting (SURVEY.md §2.10 / prompt: "salting for
  * skew"). AQE's skew-join handles sort-merge cases at runtime; explicit
  * salting is the lever when one key dominates so heavily that even a
  * split partition is one task's worth of work, or for skewed
  * aggregations (two-phase partial-then-merge).
  */
object Skew {

  /** Salted two-phase aggregation: count per key without a hot-key
    * straggler. Phase 1 groups on (key, salt) — the hot key's rows spread
    * over `saltBuckets` tasks; phase 2 merges the partials per key. */
  def saltedCount(df: DataFrame, keyCol: String,
      saltBuckets: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id()
        + monotonically_increasing_id(), lit(saltBuckets)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as("n"))

  /** Salted broadcast-side explosion for a skewed join: the big (skewed)
    * side gets a random-ish salt in [0, saltBuckets); the small side is
    * replicated once per salt value so `key AND salt` equi-join semantics
    * equal the plain key join. Use when the small side fits broadcast but
    * the big side's hot key would otherwise pin one task. */
  def saltJoin(big: DataFrame, small: DataFrame, key: String,
      saltBuckets: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets.toLong)))
    val explodedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1))))
    saltedBig.join(explodedSmall, Seq(key, "__salt")).drop("__salt")
  }

  // ---------------------------------------------------------------- q61
  /** Supplier-nation revenue through the salted join: the salt changes
    * only the physical row distribution (every hot l_suppkey spreads over
    * 16 sub-keys), never the result — which is exactly what the oracle's
    * plain join verifies. */
  type Q = (SparkSession, String) => DataFrame
  private val q61: Q = (s, dir) => {
    import s.implicits._
    val li = Tables(s, dir, "lineitem")
      .select($"l_suppkey".as("suppkey"), $"l_extendedprice", $"l_discount")
    val sup = Tables(s, dir, "supplier")
      .select($"s_suppkey".as("suppkey"), $"s_nationkey")
    saltJoin(li, sup, "suppkey")
      .groupBy($"s_nationkey")
      .agg(count(lit(1)).as("n_lines"),
        Exact.dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"))
          .as("revenue"))
      .orderBy($"s_nationkey")
  }
  private val q61Sql =
    s"""SELECT s_nationkey, COUNT(*) AS n_lines,
       |  ${Exact.sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
       |GROUP BY s_nationkey
       |ORDER BY s_nationkey""".stripMargin

  /** Skew DIAGNOSIS — the report that tells a pipeline to reach for
    * [[saltJoin]]/[[saltedCount]] BEFORE a straggler does: one two-phase
    * aggregate per key candidate yields (rows, distinct keys, mean and
    * max per-key rows); verdict `salt` when the hottest key carries more
    * than 4× the mean key's rows — the single-reducer-pins-the-stage
    * shape AQE's skew split can only partially absorb. All arithmetic is
    * integral (DIV), so the report is externally reproducible; the
    * classic real-world hit is a SENTINEL key (null/default foreign key
    * coalesced to one value) owning half the table — q139's fixture. */
  def skewReport(df: DataFrame, key: Column, label: String): DataFrame =
    df.groupBy(key.as("k")).agg(count(lit(1)).as("c"))
      .agg(sum(col("c")).cast("long").as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("c")).as("max_key_rows"))
      .withColumn("candidate", lit(label))
      .withColumn("avg_key_rows", expr("n_rows DIV n_keys"))
      .withColumn("skew_x100", expr("max_key_rows * 100 DIV avg_key_rows"))
      .withColumn("verdict",
        when(col("max_key_rows") > col("avg_key_rows") * 4, "salt")
          .otherwise("ok"))
      .select(col("candidate"), col("n_rows"), col("n_keys"),
        col("avg_key_rows"), col("max_key_rows"), col("skew_x100"),
        col("verdict"))

  // --------------------------------------------------------------- q139
  /** Skew report through the gate: three join-key candidates — a
    * uniform user key (`ok` at every SF), the lineitem FK (borderline:
    * the synthetic generator's lines-per-order tail crosses the 4× rule
    * at sf0.1 — a MEASURED verdict, which is the point), and the
    * SENTINEL-key pathology (half the rows coalesced onto one default
    * key — the null-FK hotspot every real warehouse eventually grows)
    * which flags `salt` at 280× mean everywhere. The oracle recomputes
    * every count and the same integral decision — a report that
    * measured frequencies wrong or rounded differently
    * hash-mismatches. */
  private val q139: Q = (s, dir) => {
    import s.implicits._
    val ev = Tables(s, dir, "events")
    val li = Tables(s, dir, "lineitem")
    skewReport(ev, $"user_id", "events.user_id")
      .unionByName(skewReport(li, $"l_orderkey", "lineitem.l_orderkey"))
      .unionByName(skewReport(ev,
        when($"user_id" % 10 < 5, -1L).otherwise($"user_id"),
        "events.sentinel_user"))
      .orderBy($"candidate")
  }
  private val q139Sql = {
    def block(label: String, keyExpr: String, table: String) =
      s"""SELECT '$label' AS candidate,
         |  CAST(SUM(c) AS BIGINT) AS n_rows,
         |  CAST(COUNT(*) AS BIGINT) AS n_keys,
         |  CAST(SUM(c) // COUNT(*) AS BIGINT) AS avg_key_rows,
         |  CAST(MAX(c) AS BIGINT) AS max_key_rows,
         |  CAST(MAX(c) * 100 // (SUM(c) // COUNT(*)) AS BIGINT)
         |    AS skew_x100,
         |  CASE WHEN MAX(c) > (SUM(c) // COUNT(*)) * 4
         |       THEN 'salt' ELSE 'ok' END AS verdict
         |FROM (SELECT $keyExpr AS k, CAST(COUNT(*) AS BIGINT) AS c
         |      FROM $table GROUP BY 1)""".stripMargin
    s"""${block("events.user_id", "user_id", "events")}
       |UNION ALL
       |${block("lineitem.l_orderkey", "l_orderkey", "lineitem")}
       |UNION ALL
       |${block("events.sentinel_user",
         "CASE WHEN user_id % 10 < 5 THEN -1 ELSE user_id END", "events")}
       |ORDER BY candidate""".stripMargin
  }

  /** Execute [[graft.sinks.ManifestSink.joinPlan]]'s `prefilter_semi`
    * verdict: when the key intersection is a sliver of the big side's
    * key set, first broadcast the dimension's DISTINCT keys as a
    * left-semi filter (the relational form of a bloom prefilter — rows
    * that cannot match die map-side, BEFORE the join shuffle moves
    * them), then run the real join on the survivors. Semantically
    * identical to the plain inner join for any inputs — the prefilter
    * only removes rows the join would drop — which is exactly what the
    * q140 oracle checks with a plain-join mirror. At 100 TB the payoff
    * is the shuffle that never happens: ~96 % of the fact side in the
    * q134 fixture would otherwise be partitioned, shipped, and then
    * discarded by the probe. `bigKey` and `dimKey` must differ (rename
    * one side otherwise). */
  def prefilteredJoin(big: DataFrame, dim: DataFrame, bigKey: String,
      dimKey: String): DataFrame = {
    require(bigKey != dimKey,
      "prefilteredJoin needs distinct key names; rename one side")
    val keys = dim.select(col(dimKey).as(bigKey)).distinct()
    big.join(broadcast(keys), Seq(bigKey), "left_semi")
      .join(dim, col(bigKey) === col(dimKey))
  }

  /** AUTO-DISPATCHING metadata join: read both sides' manifest stats,
    * evaluate [[graft.sinks.ManifestSink.joinPlan]]'s verdict, and emit
    * the corresponding physical plan — the planner's loop closed
    * without a human in it. q134 computes the verdict; q140 executes
    * ONE verdict by hand; this operator is what a 100 TB deployment
    * actually calls: per-query, the storage layer's own statistics pick
    * the join strategy before any data is read.
    *
    *   - `broadcast` — the smaller side (by manifest row count) gets
    *     the broadcast hint: no shuffle at all.
    *   - `prefilter_semi` — the smaller-NDV side is the dimension; its
    *     distinct keys broadcast as a left-semi prefilter killing the
    *     fact side's non-matching rows map-side BEFORE the join shuffle
    *     (q140's [[prefilteredJoin]], now chosen automatically).
    *   - `salted` — a stored heavy-hitter stat
    *     ([[graft.sinks.ManifestSink.maxKeyRows]]) shows one key
    *     holding > 4× the average key's rows on a side (the q139 skew
    *     rule, decided from manifest metadata instead of a data scan):
    *     the skewed side gets a random salt, the other side replicates
    *     per salt value, and the hot key's rows spread over
    *     `saltBuckets` reducers instead of pinning one
    *     ([[saltJoin]]'s shape, chosen automatically).
    *   - `shuffle` — the plain hash-partitioned join, Catalyst's
    *     default physical pick.
    *   - no verdict (either side lacks counts/sketches) — the plain
    *     join: plan from data when metadata can't answer, never guess.
    *
    * Every arm returns the SAME rows as the plain inner join on
    * `colA = colB` (the broadcast hint only places data; the semi
    * prefilter only removes rows the join would drop) — which is
    * exactly what the q165 oracle pins with a plain-join mirror across
    * fixtures landing all three verdicts. `colA` and `colB` must
    * differ (rename one side otherwise); output columns are A's then
    * B's, both key columns retained. */
  def planAwareJoin(spark: SparkSession, dirA: String, colA: String,
      dirB: String, colB: String, broadcastRows: Long): DataFrame = {
    import graft.sinks.ManifestSink
    require(colA != colB,
      "planAwareJoin needs distinct key names; rename one side")
    val plan = ManifestSink.joinPlan(spark, dirA, colA, dirB, colB,
      broadcastRows)
    val a = ManifestSink.read(spark, dirA)
    val b = ManifestSink.read(spark, dirB)
    dispatchVerdict(plan, a, b, colA, colB)
  }

  /** The physical dispatch shared by [[planAwareJoin]] and
    * [[planAwareFilteredJoin]]: execute a [[graft.sinks.ManifestSink
    * .JoinPlan]] verdict over the two (possibly pre-filtered) frames.
    * Every arm returns the same rows as `a JOIN b ON colA = colB`. */
  private def dispatchVerdict(
      plan: Option[graft.sinks.ManifestSink.JoinPlan],
      a: DataFrame, b: DataFrame, colA: String,
      colB: String): DataFrame = {
    plan match {
      case Some(p) if p.strategy == "broadcast" =>
        if (p.rowsA <= p.rowsB)
          broadcast(a).join(b, col(colA) === col(colB))
        else a.join(broadcast(b), col(colA) === col(colB))
      case Some(p) if p.strategy == "prefilter_semi" =>
        // the dimension (whose keys prefilter the other side) is the
        // smaller key set; the fact side is where rows die map-side
        if (p.ndvA <= p.ndvB) {
          prefilteredJoin(b, a, colB, colA)
            .select(a.columns.map(col) ++ b.columns.map(col): _*)
        } else prefilteredJoin(a, b, colA, colB)
      case Some(p) if p.strategy == "salted" =>
        // salt the HOT side (bigger recorded max-key count), replicate
        // the other per salt value — [[saltJoin]] semantics, columns
        // restored to the plain join's (both key columns present)
        val buckets = 16
        def salted(hot: DataFrame, hotKey: String, other: DataFrame,
            otherKey: String): DataFrame = {
          val otherR = other.withColumnRenamed(otherKey, hotKey)
          saltJoin(hot, otherR, hotKey, buckets)
            .withColumn(otherKey, col(hotKey))
        }
        val j =
          if (p.maxKeyRowsA >= p.maxKeyRowsB) salted(a, colA, b, colB)
          else salted(b, colB, a, colA)
        j.select(a.columns.map(col) ++ b.columns.map(col): _*)
      case _ => a.join(b, col(colA) === col(colB))
    }
  }

  /** [[planAwareJoin]] for a FILTERED fact side — the decision a plain
    * table-level verdict gets wrong: `joinPlan` sees two huge tables
    * and says shuffle, but the query only joins rows with
    * `filterCol BETWEEN lo AND hi`, and the manifest's equi-depth
    * histograms ([[graft.sinks.ManifestSink.rangeEstimateMicro]]) can
    * say — from metadata alone, before any data is read — that the
    * SURVIVING side fits a broadcast. When the estimate is at or under
    * `broadcastRows`, the filtered side broadcasts (no shuffle at all,
    * whatever the unfiltered verdict said); otherwise, or when any
    * entry lacks a histogram, the unfiltered [[planAwareJoin]] verdict
    * dispatches unchanged over the filtered frame — absence degrades
    * to the table-level plan, never to a guess. The filter itself
    * applies AT THE SCAN either way ([[graft.sinks.ManifestSink
    * .readWhere]] prunes whole entries by their recorded bounds), so
    * every arm returns exactly the rows of
    * `a.filter(between).join(b, colA === colB)`. */
  def planAwareFilteredJoin(spark: SparkSession, dirA: String,
      colA: String, filterCol: String, lo: Double, hi: Double,
      dirB: String, colB: String, broadcastRows: Long): DataFrame = {
    import graft.sinks.ManifestSink
    require(colA != colB,
      "planAwareFilteredJoin needs distinct key names; rename one side")
    val a = ManifestSink.readWhere(spark, dirA, filterCol,
      Some(lo), Some(hi))
    val b = ManifestSink.read(spark, dirB)
    val est = ManifestSink.rangeEstimateMicro(spark, dirA, filterCol,
      lo, hi)
    est match {
      case Some(micro) if micro <= broadcastRows * 1000000L =>
        broadcast(a).join(b, col(colA) === col(colB))
      case _ =>
        dispatchVerdict(ManifestSink.joinPlan(spark, dirA, colA, dirB,
          colB, broadcastRows), a, b, colA, colB)
    }
  }

  /** One edge of a star: a dimension sink and the key pair joining it to
    * the fact. `factKey` and `dimKey` must differ (rename one side). */
  final case class DimSpec(dir: String, factKey: String, dimKey: String)

  /** One planned edge, in execution order: the strategy the manifests
    * chose and the metadata cardinality estimate that ordered it
    * (`unplanned` + -1 when either side lacked stats). */
  final case class StarStep(dimDir: String, factKey: String,
      strategy: String, estRows: Double)

  /** MULTI-WAY metadata join planning — [[planAwareJoin]] extended from
    * one edge to a star: a fact table joins N dimensions, and BOTH
    * decisions a cost-based planner makes per query come off the
    * manifests alone, before any data is read:
    *
    *   - JOIN ORDER — edges execute most-selective first, ascending by
    *     [[graft.sinks.ManifestSink.joinPlan]]'s cardinality estimate
    *     (`rowsF/ndvF · rowsD/ndvD · |keys∩|`). The edge that kills 96 %
    *     of the fact runs before the edges with fanout 1, so every later
    *     join sees the shrunken intermediate — the System R greedy
    *     ordering, driven by stored sketches instead of a data scan.
    *     Edges with no verdict (missing stats) run LAST, in call order,
    *     as plain joins: plan from data when metadata can't answer.
    *   - PER-EDGE STRATEGY — each edge dispatches its own verdict
    *     exactly as [[planAwareJoin]] does: broadcast hint / broadcast
    *     left-semi prefilter / salted spread / plain shuffle.
    *
    * Verdicts are computed fact-manifest vs dim-manifest (not against
    * the shrinking intermediate) — the conservative direction: inner
    * joins only remove fact rows, so a broadcast or prefilter that was
    * right for the full fact stays right for any subset of it.
    *
    * Every arm and every ordering returns the SAME rows as the plain
    * left-deep inner join (inner joins commute and associate; the
    * prefilter only drops rows its own join would drop) — the q179
    * oracle pins that with a plain-SQL mirror. Fact and dim column
    * names must be pairwise disjoint. Returns the joined frame plus the
    * executed steps so callers and audits can see what the planner
    * decided. */
  def planAwareStarJoin(spark: SparkSession, factDir: String,
      dims: Seq[DimSpec], broadcastRows: Long,
      saltBuckets: Int = 16): (DataFrame, Seq[StarStep]) = {
    import graft.sinks.ManifestSink
    dims.foreach(d => require(d.factKey != d.dimKey,
      s"star edge ${d.dir} needs distinct key names; rename one side"))
    val planned = dims.zipWithIndex.map { case (d, i) =>
      (d, i, ManifestSink.joinPlan(spark, factDir, d.factKey, d.dir,
        d.dimKey, broadcastRows))
    }
    val ordered = planned.sortBy { case (_, i, p) =>
      (p.isEmpty, p.map(_.estJoinRows).getOrElse(Double.MaxValue), i)
    }
    var acc = ManifestSink.read(spark, factDir)
    val steps = ordered.map { case (d, _, p) =>
      val dim = ManifestSink.read(spark, d.dir)
      val clash = acc.columns.toSet.intersect(dim.columns.toSet)
      require(clash.isEmpty,
        s"star columns must be disjoint; ${d.dir} clashes on $clash")
      val outCols = (acc.columns ++ dim.columns).map(col).toSeq
      val strategy = p.map(_.strategy).getOrElse("unplanned")
      acc = strategy match {
        case "broadcast" =>
          if (p.get.rowsB <= broadcastRows)
            acc.join(broadcast(dim), col(d.factKey) === col(d.dimKey))
          else broadcast(acc).join(dim, col(d.factKey) === col(d.dimKey))
        case "prefilter_semi" =>
          prefilteredJoin(acc, dim, d.factKey, d.dimKey)
        case "salted" =>
          val j =
            if (p.get.maxKeyRowsA >= p.get.maxKeyRowsB)
              saltJoin(acc,
                dim.withColumnRenamed(d.dimKey, d.factKey), d.factKey,
                saltBuckets).withColumn(d.dimKey, col(d.factKey))
            else
              saltJoin(dim,
                acc.withColumnRenamed(d.factKey, d.dimKey), d.dimKey,
                saltBuckets).withColumn(d.factKey, col(d.dimKey))
          j.select(outCols: _*)
        case _ => acc.join(dim, col(d.factKey) === col(d.dimKey))
      }
      StarStep(d.dir, d.factKey, strategy,
        p.map(_.estJoinRows).getOrElse(-1.0))
    }
    (acc, steps)
  }

  // --------------------------------------------------------------- q179
  /** The planner triangle's N-WAY leg through the gate: lineitem (with
    * NDV sketches on all three keys) stars into a 1/25th order slice, a
    * part dim, and a supplier dim via [[planAwareStarJoin]]. The
    * manifests alone must (a) order the slice edge FIRST — its estimate
    * is fact/25 vs fanout-1 for the others — and (b) land three
    * DIFFERENT verdicts (prefilter_semi / shuffle / broadcast),
    * asserted in-query; the emitted brand×status revenue (which also
    * sums a supplier column, so a dropped or doubled edge shows) must
    * equal the oracle's plain three-join SQL — ordering and placement,
    * never semantics.
    *
    * Scale: this is the shape of every fact-to-dims query at 100 TB —
    * N small manifest reads pick the join order and each edge's
    * physical strategy with zero data scanned and no human in the
    * loop. */
  private val q179: Q = (s, dir) => {
    import s.implicits._
    import graft.sinks.ManifestSink
    val li = Tables(s, dir, "lineitem").select(
      $"l_orderkey", $"l_partkey", $"l_suppkey",
      $"l_extendedprice", $"l_discount")
    val ords = Tables(s, dir, "orders")
      .select($"o_orderkey", $"o_orderstatus")
    val maxO = ords.agg(max($"o_orderkey")).head().getLong(0)
    val root = SinkOps.freshScratch("graft_q179", dir)
    def sink(name: String, df: DataFrame, key: String): String = {
      val p = root + "/" + name
      ManifestSink.appendWithStats(df, p, Seq(key), ndvCols = Seq(key))
      p
    }
    val fact = root + "/fact"
    ManifestSink.appendWithStats(li, fact, Seq("l_orderkey"),
      ndvCols = Seq("l_orderkey", "l_partkey", "l_suppkey"))
    val low = sink("low", ords.filter($"o_orderkey" <= maxO / 25),
      "o_orderkey")
    val part = sink("part",
      Tables(s, dir, "part").select($"p_partkey", $"p_brand"), "p_partkey")
    val sup = sink("sup",
      Tables(s, dir, "supplier").select($"s_suppkey", $"s_acctbal"),
      "s_suppkey")
    val bc = ManifestSink.rowCount(s, fact).get / 200
    val (joined, steps) = planAwareStarJoin(s, fact, Seq(
      DimSpec(part, "l_partkey", "p_partkey"),
      DimSpec(sup, "l_suppkey", "s_suppkey"),
      DimSpec(low, "l_orderkey", "o_orderkey")), bc)
    // the selective slice must be planned first, and all three verdicts
    // must be the distinct trio — a planner regression fails loudly here
    require(steps.head.factKey == "l_orderkey" &&
      steps.head.strategy == "prefilter_semi" &&
      steps.map(_.strategy).sorted ==
        Seq("broadcast", "prefilter_semi", "shuffle"),
      s"unexpected star plan: $steps")
    joined.groupBy($"o_orderstatus", $"p_brand")
      .agg(count(lit(1)).as("n_lines"),
        Exact.dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"))
          .as("revenue"),
        Exact.dsum($"s_acctbal").as("sum_acctbal"))
      .orderBy($"o_orderstatus", $"p_brand")
  }
  private val q179Sql =
    s"""WITH mx AS (SELECT MAX(o_orderkey) AS m FROM orders)
       |SELECT o_orderstatus, p_brand,
       |  CAST(COUNT(*) AS BIGINT) AS n_lines,
       |  ${Exact.sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |  ${Exact.sqlSum("s_acctbal")} AS sum_acctbal
       |FROM lineitem
       |JOIN (SELECT o_orderkey, o_orderstatus
       |      FROM orders CROSS JOIN mx WHERE o_orderkey <= m // 25) o
       |  ON l_orderkey = o_orderkey
       |JOIN part ON l_partkey = p_partkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |GROUP BY o_orderstatus, p_brand
       |ORDER BY o_orderstatus, p_brand""".stripMargin

  // --------------------------------------------------------------- q140
  /** The prefilter_semi verdict EXECUTED (q134 diagnosed this exact
    * pair): lineitem joins the bottom-1/25th order slice through
    * [[prefilteredJoin]] — the broadcast semi kills ~96 % of lineitem
    * before the join — and the per-status revenue must equal the plain
    * join the oracle runs. Closes the planner's loop the way
    * applyRecommendations closes the layout advisor's: the
    * recommendation is not advice, it is an executable plan whose
    * semantics are gated. */
  private val q140: Q = (s, dir) => {
    import s.implicits._
    val ords = Tables(s, dir, "orders")
    val maxO = ords.agg(max($"o_orderkey")).head().getLong(0)
    val low = ords.filter($"o_orderkey" <= maxO / 25)
      .select($"o_orderkey", $"o_orderstatus")
    val li = Tables(s, dir, "lineitem")
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    prefilteredJoin(li, low, "l_orderkey", "o_orderkey")
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_lines"),
        Exact.dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"))
          .as("revenue"))
      .orderBy($"o_orderstatus")
  }
  private val q140Sql =
    s"""WITH mx AS (SELECT MAX(o_orderkey) AS m FROM orders)
       |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_lines,
       |  ${Exact.sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem
       |JOIN (SELECT o_orderkey, o_orderstatus
       |      FROM orders CROSS JOIN mx WHERE o_orderkey <= m // 25) o
       |  ON l_orderkey = o_orderkey
       |GROUP BY o_orderstatus
       |ORDER BY o_orderstatus""".stripMargin

  val queries: Map[String, Q] = Map(
    "q61_salted_join" -> q61,
    "q139_skew_report" -> q139,
    "q140_prefiltered_join" -> q140,
    "q179_star_plan_join" -> q179)
  val oracleSql: Map[String, String] = Map(
    "q61_salted_join" -> q61Sql,
    "q139_skew_report" -> q139Sql,
    "q140_prefiltered_join" -> q140Sql,
    "q179_star_plan_join" -> q179Sql)
}
