package graft

import graft.SparkSpec

/** Enforced version of PLANS.md: the physical-plan invariants the engine
  * claims are asserted against the real executed plans at sf0.001. Sizes
  * differ at scale (broadcast↔SMJ flips are fine and expected — those are
  * size-adaptive strategies over the same declaration); the invariants
  * below are the ones that must hold at ANY size. */
class PlanAuditSpec extends SparkSpec {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("no accidental cartesian/nested-loop joins anywhere") {
    // a CartesianProduct or BroadcastNestedLoopJoin usually means a join
    // lost its keys — the classic silent scale killer. The allowlist below
    // is every INTENTIONAL one: a broadcast of a scalar or a bounded probe
    // set against the fact side, which stays O(|fact| · tiny) at any scale.
    val intentional = Set(
      "q22_retention_keep_newest", // crossJoin(broadcast(1-row max id))
      "q27b_kmv_distinct",         // crossJoin(broadcast(1-row exact count))
      "q55_tfidf_top_terms",       // crossJoin(broadcast(1-row corpus size))
      "q41_knn_brute_force",       // broadcast(10 query vectors) ⋈ ≠
      "q58_ann_ivf_cells",         // crossJoin(broadcast(16 centroids))
      "q58b_ann_ivf_lloyd",        // crossJoin(broadcast(16 refined centroids))
      "q75_lm_quality",            // crossJoin(broadcast(1-row token total))
      "q77_ann_recall",            // q41/q58/q58b/q94 subtrees + 4-row method frame
      "q82_semdedup",              // crossJoin(broadcast(16 centroids))
      "q86_bm25_ranking",          // crossJoin(broadcast(1-row corpus stats))
      "q94_ann_pq",                // broadcast(10 query vectors) ⋈ ≠ (ADC scan)
      "q185_ann_sq8",              // broadcast(10 query vectors) ⋈ ≠ (ADC scan)
      "q117_ann_ivf_indexed",      // q58's pipeline over stored centroids
      "q118_ann_ivf_lloyd_indexed",// q58b's pipeline over stored centroids
      "q119_ann_pq_indexed",       // q94's ADC scan over stored recon
      "q120_ann_ivf_pruned",       // broadcast(16 stored centroids) routing
      "q121_index_recommendation", // 4 targets × 5-method panel summary
      "q122_expectations_gate",    // 1-row × 1-row report joins
      "q150_filtered_ann",         // broadcast(16 centroids) routing
      "q152_semantic_decontamination", // crossJoin(broadcast(16 centroids))
      "q166_normalized_dedup",     // 1-row × 1-row metric joins
      "q183_weighted_quantiles",   // 3 fracs × distinct-scores probe
      "q195_hybrid_rrf",           // 1-row corpus stats + 1-row query vec
      "q204_bigram_lm",            // crossJoin(broadcast(1-row vocab size))
      "q221_ccnet_buckets",        // q204's 1-row vocab broadcast, bucketed
      // q206's broadcast(10 query vectors) ⋈ ≠ shortlist runs EAGERLY
      // (decision-sized collect); the returned plan is the local MMR
      // result — not listed, like q216's stored-artifact build
      "q208_indexed_bm25",         // crossJoin(broadcast(1-row corpus stats))
      "q210_nb_quality",           // crossJoin(broadcast(1-row class totals))
      "q211_dsir_selection",       // crossJoin(broadcast(1-row histogram totals))
      "q213_hard_negatives",       // broadcast(50 anchors) ⋈ ≠ label
      "q213b_hard_negatives_indexed", // same bounded anchor broadcasts +
                                      // crossJoin(broadcast(16 centroids))
      "q214_incremental_classifier", // q210's 1-row totals over the view state
      "q215_cluster_balanced")     // crossJoin(broadcast(16 centroids))
      // q216's mask-pair ⋈ < runs inside its stored-artifact BUILD; the
      // registered query's plan is the 3-row panel read — not listed
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { q =>
      val p = plan(q)
      if (p.contains("CartesianProduct") ||
          p.contains("BroadcastNestedLoopJoin")) Some(q) else None
    }
    assert(offenders.toSet === intentional,
      s"unintentional nested-loop/cartesian joins in: " +
        s"${offenders.filterNot(intentional)}")
  }

  test("scans prune columns: q03 reads only what it needs") {
    val p = plan("q03_brand_volume")
    // lineitem scan must not read all 11 columns for a 3-column aggregate
    val readSchemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(p).map(_.group(1)).toList
    assert(readSchemas.nonEmpty)
    assert(!readSchemas.exists(_.contains("l_shipdate")),
      s"q03 reads unneeded columns: $readSchemas")
  }

  test("filters are pushed to the scan (q17 error-type probe)") {
    val p = plan("q17_asof_join")
    assert(p.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,error)]")
      || p.contains("EqualTo(event_type,error)"), p.take(1200))
  }

  test("rank filters prune before the window shuffle (WindowGroupLimit)") {
    val p = plan("q06_top_orders_per_customer")
    assert(p.contains("WindowGroupLimit"), p.take(800))
  }

  test("global top-k uses TakeOrderedAndProject, not a global sort") {
    val p = plan("q10_topk_lineitems")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("custom kernels execute inside codegen stages") {
    assert(plan("q41_knn_brute_force").contains("sequentialdot"))
    // q60's shingle pass now runs inside bandSelfJoin's eager
    // localCheckpoint job (the r13 cache-residue fix), so the registered
    // query's returned plan is over the checkpointed blocks; pin the
    // kernel-in-codegen property on the projection directly instead
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val sh = graft.sources.Tables(spark, sf, "documents")
      .select(graft.operators.DedupOps.shingles(split($"text", " "), 3)
        .as("sh"))
    val p = sh.queryExecution.executedPlan.toString
    // the `*(n)` star prefix marks a WholeStageCodegen stage in toString
    assert(p.linesIterator.exists(l =>
      l.contains("shingle_array") && l.trim.startsWith("*(")), p.take(800))
  }

  test("aggregates are two-phase (partial map-side combine)") {
    val p = plan("q01_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).length >= 2, p.take(800))
  }

  test("kmv sketch aggregates via ObjectHashAggregate, no sort") {
    val p = plan("q27b_kmv_distinct")
    assert(p.contains("ObjectHashAggregate"), p.take(800))
  }

  test("space-saving heavy hitters: ObjectHashAggregate partials build " +
      "map-side — only m (item,cnt,err) triples per (partition, lang) " +
      "cross the wire, never the token stream") {
    val p = plan("q220_heavy_hitters")
    assert(p.contains("ObjectHashAggregate"), p.take(800))
    // two-phase: a partial_ aggregate below the exchange and a merge
    // above it — the exchange between them carries summaries, not tokens
    assert(p.contains("partial_space_saving") ||
      "ObjectHashAggregate".r.findAllIn(p).length >= 2, p.take(1200))
    // the one-pass regime guard must not have reintroduced an extra
    // corpus aggregation (the r15 #4 done-criterion): EXACTLY one
    // partial/final pair, and no aggregate of any other kind — a
    // re-added NDV pre-pass (countDistinct, approx_count_distinct, a
    // second sketch) would surface as extra aggregate nodes here
    assert("ObjectHashAggregate".r.findAllIn(p).length === 2,
      "q220 must aggregate in exactly one partial/final pair:\n" +
        p.take(1200))
    assert(!"(?<!Object)HashAggregate".r.findFirstIn(p).isDefined &&
      !p.contains("SortAggregate"),
      "q220 must not pay any additional aggregation pass:\n" + p.take(1200))
  }

  test("AQE splits skewed join partitions at runtime (skew=true)") {
    // 90% of left rows share one key; with thresholds lowered to fire at
    // test scale, AQE must split the hot partition (SMJ skew=true +
    // AQEShuffleRead skewed) instead of pinning one task. Note: the rule
    // stands down if the join's partitioning feeds the next operator, so
    // the downstream aggregate keys on something else.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "10KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1KB")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = spark.range(0, 200000)
        .select(when($"id" % 10 === 0, $"id" % 100).otherwise(7L).as("k"),
          $"id".as("v"))
      val right = spark.range(0, 100).select($"id".as("k"), ($"id" * 2).as("w"))
      val j = left.join(right, "k").groupBy(($"v" % 3).as("g")).count()
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), p.take(1500))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("plans compose with runtime bloom-filter pruning (fact side)") {
    // a selective dim filter should inject a bloom probe into the fact
    // scan when the join shuffles — the runtime row-pruning lever on top
    // of static pushdown; thresholds lowered to fire at test scale
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1B")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      val li = graft.sources.Tables(spark, sf, "lineitem")
      val o = graft.sources.Tables(spark, sf, "orders")
        .filter($"o_orderpriority" === "1-URGENT")
      val j = li.join(o, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority").count()
      assert(j.queryExecution.optimizedPlan.toString.contains("bloom"),
        "runtime bloom filter not injected")
      assert(j.count() === 1)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("incremental-quantile delta sampling gets WindowGroupLimit " +
      "(map-side group limit before the window shuffle)") {
    // the IncrementalQuantiles scale claim: the bottom-k-by-hash window
    // over a delta prunes per-partition BEFORE the exchange, so a wide
    // group never reaches one reducer whole. Pin it on the executed plan.
    import spark.implicits._
    val delta = graft.sources.Tables(spark, sf, "events")
      .select($"event_id", $"event_type", $"value")
    val st = graft.sinks.IncrementalQuantiles.sampleState(
      delta, "event_type", "event_id", "value", 16)
    st.collect()
    val p = st.queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p.take(1500))
  }

  test("prefilteredJoin kills non-matching rows with a broadcast semi " +
      "BEFORE the real join (q140's executed shape)") {
    // the prefilter_semi verdict executed: the big side must meet a
    // LeftSemi broadcast of the dimension's distinct keys before any
    // equi-join — rows that cannot match die map-side, so the join
    // shuffle (at scale) never moves them
    val p = plan("q140_prefiltered_join")
    val lines = p.linesIterator.toSeq
    // the semi is a broadcast (key lists are decision-sized)
    assert(lines.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftSemi")),
      "no broadcast LeftSemi prefilter in the plan")
    assert(lines.exists(l => l.contains("Join") && l.contains("Inner")),
      "no inner join alongside the semi prefilter")
  }

  test("planAwareJoin dispatches each verdict to its physical shape") {
    // The auto-dispatching metadata join (Skew.planAwareJoin): three
    // fixtures land the three joinPlan verdicts, and the EXECUTED plan
    // must carry the corresponding shape. autoBroadcastJoinThreshold is
    // disabled so the only BroadcastHashJoin that can appear is the one
    // the operator's own hint placed — the assertion is on OUR
    // dispatch, not Catalyst's size estimate.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.sinks.ManifestSink
    import graft.operators.Skew
    val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val root = java.nio.file.Files.createTempDirectory("paj").toString
      def sink(name: String, df: org.apache.spark.sql.DataFrame,
          c: String): String = {
        val p = s"$root/$name"
        ManifestSink.appendWithStats(df, p, Seq(c), ndvCols = Seq(c))
        p
      }
      val bigA = sink("bigA", spark.range(0, 10000).toDF("ka"), "ka")
      val tiny = sink("tiny", spark.range(0, 20).toDF("kb"), "kb")
      val bigB = sink("bigB", spark.range(0, 10000)
        .select(($"id" % 5000).as("kb")), "kb")
      val low = sink("low", spark.range(0, 300).toDF("kb"), "kb")

      def shapes(a: String, b: String, bc: Long, want: String)
          : String = {
        assert(ManifestSink.joinPlan(spark, a, "ka", b, "kb", bc)
          .get.strategy === want, s"fixture did not land $want")
        val df = Skew.planAwareJoin(spark, a, "ka", b, "kb", bc)
        df.count() // settle AQE: assert on the FINAL physical plan
        df.queryExecution.executedPlan.toString
      }
      // broadcast: the 20-row side ships to every task, no shuffle join
      val pB = shapes(bigA, tiny, 100, "broadcast")
      assert(pB.contains("BroadcastHashJoin"), s"no broadcast hint:\n$pB")
      // shuffle: both big, keys coextensive — plain sort-merge, and NO
      // broadcast anywhere (the threshold is off; a BHJ here would mean
      // the operator hinted when the verdict said not to)
      val pS = shapes(bigA, bigB, 10, "shuffle")
      assert(pS.contains("SortMergeJoin"), s"no shuffle join:\n$pS")
      assert(!pS.contains("BroadcastHashJoin"),
        s"unexpected broadcast under shuffle verdict:\n$pS")
      // prefilter_semi: the dimension's distinct keys broadcast as a
      // LeftSemi killing the fact side map-side, then the real join
      val pP = shapes(bigA, low, 10, "prefilter_semi")
      val lines = pP.linesIterator.toSeq
      assert(lines.exists(l =>
        l.contains("BroadcastHashJoin") && l.contains("LeftSemi")),
        s"no broadcast LeftSemi prefilter:\n$pP")
      assert(lines.exists(l => l.contains("SortMergeJoin")),
        s"no real join after the prefilter:\n$pP")
      // and every arm returns plain-join rows (the q165 oracle's claim,
      // pinned here at spec scale too)
      assert(Skew.planAwareJoin(spark, bigA, "ka", tiny, "kb", 100)
        .count() === 20)
      assert(Skew.planAwareJoin(spark, bigA, "ka", bigB, "kb", 10)
        .count() === 10000)
      assert(Skew.planAwareJoin(spark, bigA, "ka", low, "kb", 10)
        .count() === 300)
      // no metadata → no verdict → the plain join, never a guess: a
      // sink committed WITHOUT ndv sketches can't answer joinPlan
      val bare = s"$root/bare"
      ManifestSink.append(spark.range(0, 20).toDF("kb"), bare)
      assert(ManifestSink.joinPlan(spark, bigA, "ka", bare, "kb", 100)
        .isEmpty)
      val pF = {
        val df = Skew.planAwareJoin(spark, bigA, "ka", bare, "kb", 100)
        assert(df.count() === 20)
        df.queryExecution.executedPlan.toString
      }
      assert(!pF.contains("BroadcastHashJoin"),
        s"metadata-less pair must take the unhinted plain join:\n$pF")

      // salted: a stored heavy hitter (90% of rows on one key) fires
      // the q139 rule from metadata; the executed join carries the salt
      // key; rows are identical to the plain join. The SAME skewed data
      // WITHOUT the heavy-hitter stat must stay on the plain shuffle —
      // absent stats degrade to the standard plan, never to a guess.
      def skewDf = spark.range(0, 20000)
        .select(when($"id" % 10 === 0, $"id").otherwise(lit(-1L)).as("ka"))
      val hotStats = s"$root/hotStats"
      ManifestSink.appendWithStats(skewDf, hotStats, Seq("ka"),
        ndvCols = Seq("ka"), topKCols = Seq("ka"))
      val hotBare = s"$root/hotBare"
      ManifestSink.appendWithStats(skewDf, hotBare, Seq("ka"),
        ndvCols = Seq("ka")) // NDV but no heavy hitters
      val dimB = s"$root/dimB"
      ManifestSink.appendWithStats(
        skewDf.select($"ka".as("kb")).distinct(), dimB, Seq("kb"),
        ndvCols = Seq("kb"), topKCols = Seq("kb"))
      assert(ManifestSink.maxKeyRows(spark, hotStats, "ka").get === 18000L)
      assert(ManifestSink.joinPlan(spark, hotStats, "ka", dimB, "kb", 10)
        .get.strategy === "salted")
      assert(ManifestSink.joinPlan(spark, hotBare, "ka", dimB, "kb", 10)
        .get.strategy === "shuffle")
      val js = Skew.planAwareJoin(spark, hotStats, "ka", dimB, "kb", 10)
      assert(js.count() === 20000)
      val pSalt = js.queryExecution.executedPlan.toString
      assert(pSalt.contains("__salt"),
        s"salted verdict did not execute the salt-key join:\n$pSalt")
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("planAwareFilteredJoin: histogram estimate flips the verdict to " +
      "broadcast; over-budget and histogram-less cases keep the shuffle") {
    // q190's dispatch: both sides are far above the broadcast budget
    // (table-level verdict = shuffle), but the fact side's equi-depth
    // histogram prices a narrow range filter under the budget — the
    // FILTERED side must broadcast, with Spark's own size-based rule
    // disabled so the only possible BroadcastHashJoin is the one our
    // estimate placed. A wide filter and a histogram-less copy must
    // both stay on the plain sort-merge join.
    import spark.implicits._
    import graft.sinks.ManifestSink
    import graft.operators.Skew
    val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val root = java.nio.file.Files.createTempDirectory("pafj").toString
      val facts = spark.range(0, 10000)
        .select($"id".as("ka"), $"id".cast("long").as("v"))
      val aHist = s"$root/aHist"
      ManifestSink.appendWithStats(facts, aHist, Seq("v"),
        ndvCols = Seq("ka"), histCols = Seq("v"))
      val aPlain = s"$root/aPlain"
      ManifestSink.appendWithStats(facts, aPlain, Seq("v"),
        ndvCols = Seq("ka"))
      val b = s"$root/b"
      ManifestSink.appendWithStats(
        spark.range(0, 10000).toDF("kb"), b, Seq("kb"),
        ndvCols = Seq("kb"))
      // table-level verdict: shuffle (both sides 20x the budget)
      assert(ManifestSink.joinPlan(spark, aHist, "ka", b, "kb", 500)
        .get.strategy === "shuffle")
      def run(dirA: String, lo: Double, hi: Double): (Long, String) = {
        val df = Skew.planAwareFilteredJoin(spark, dirA, "ka", "v",
          lo, hi, b, "kb", 500)
        val n = df.count() // settle AQE; assert on the final plan
        (n, df.queryExecution.executedPlan.toString)
      }
      // narrow: est ~101 rows <= 500 → the filtered side broadcasts
      val (nN, pN) = run(aHist, 0.0, 100.0)
      assert(nN === 101)
      assert(pN.contains("BroadcastHashJoin"),
        s"histogram under budget but no broadcast:\n$pN")
      // wide: est ~5001 rows > 500 → table-level shuffle verdict holds
      val (nW, pW) = run(aHist, 0.0, 5000.0)
      assert(nW === 5001)
      assert(pW.contains("SortMergeJoin") &&
        !pW.contains("BroadcastHashJoin"),
        s"over-budget estimate must keep the shuffle:\n$pW")
      // histogram-less: absence degrades to the table-level plan
      val (nP, pP) = run(aPlain, 0.0, 100.0)
      assert(nP === 101)
      assert(!pP.contains("BroadcastHashJoin"),
        s"histogram-less side must not broadcast on a guess:\n$pP")
      // the filter pruned at the manifest too: a second, range-sliced
      // table scans only overlapping entries for the same narrow range
      val sliced = s"$root/sliced"
      (0 until 4).foreach { i =>
        ManifestSink.appendWithStats(
          facts.filter($"v" >= i * 2500 && $"v" < (i + 1) * 2500),
          sliced, Seq("v"), ndvCols = Seq("ka"), histCols = Seq("v"))
      }
      val (kept, skipped) = ManifestSink.prunedEntries(spark, sliced,
        Seq(ManifestSink.Range("v", Some(0L), Some(100L))))
      assert(kept.size === 1 && skipped.size === 3)
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("balancedSample pushes the per-class top-k below the exchange " +
      "(WindowGroupLimit) and keeps exactly k per class") {
    import spark.implicits._
    val df = graft.operators.TrainingOps.balancedSample(
      spark.range(0, 10000)
        .select(($"id" % 5).cast("string").as("c"), $"id".as("k")),
      "c", "k", 10)
    assert(df.count() === 50)
    val p = df.queryExecution.executedPlan.toString
    // the map-side group limit is the scale claim: each task forwards
    // at most k rows per class — the shuffle never carries the corpus
    assert(p.contains("WindowGroupLimit"),
      s"rank-limit did not compile to WindowGroupLimit:\n$p")
  }

  test("planAwareStarJoin executes all three verdicts in one plan, " +
      "broadcast hint placed by the operator alone") {
    // q179's star (slice prefilter + part shuffle + supplier broadcast)
    // with autoBroadcastJoinThreshold off: the one BroadcastHashJoin in
    // the non-semi position must be the operator's own hint, the slice
    // edge must appear as a broadcast LeftSemi, and the part edge as a
    // SortMergeJoin. The in-query require already pins the ORDER (the
    // selective edge first) and the verdict trio.
    val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("q179_star_plan_join")(spark, sf)
      df.count() // settle AQE: assert on the FINAL physical plan
      val p = df.queryExecution.executedPlan.toString
      val lines = p.linesIterator.toSeq
      assert(lines.exists(l =>
        l.contains("BroadcastHashJoin") && l.contains("LeftSemi")),
        s"no broadcast LeftSemi prefilter for the slice edge:\n$p")
      assert(lines.exists(l =>
        l.contains("BroadcastHashJoin") && !l.contains("LeftSemi")),
        s"no operator-placed broadcast for the supplier edge:\n$p")
      assert(p.contains("SortMergeJoin"),
        s"no plain shuffle join for the part edge:\n$p")
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("star planner: EVERY StarStep's verdict materializes as its " +
      "physical node, matched per edge key (r12 verdict #6)") {
    // q179's star plus a fourth, violently skewed edge, so all FOUR
    // verdicts land in ONE executed plan; each step is then matched to
    // the physical node carrying ITS join key — a silent dispatch
    // regression (a salted edge planning as a plain shuffle, a
    // broadcast hint lost) fails here by name, the way BucketedJoinSpec
    // pins q212's zero-exchange claim. autoBroadcastJoinThreshold off:
    // every BroadcastHashJoin in the plan is the operator's own hint.
    import org.apache.spark.sql.functions._
    import graft.operators.Skew
    import graft.sinks.ManifestSink
    import graft.sources.Tables
    import spark.implicits._
    val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val root = java.nio.file.Files.createTempDirectory("starshape")
        .toString
      val li = Tables(spark, sf, "lineitem").select(
        $"l_orderkey", $"l_partkey", $"l_suppkey",
        when($"l_orderkey" % 4 =!= 0, lit(-1L)).otherwise($"l_orderkey")
          .as("l_hot"))
      val fact = s"$root/fact"
      ManifestSink.appendWithStats(li, fact, Seq("l_orderkey"),
        ndvCols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_hot"),
        topKCols = Seq("l_hot"))
      def sink(name: String, df: org.apache.spark.sql.DataFrame,
          key: String, topK: Boolean = false): String = {
        val p = s"$root/$name"
        ManifestSink.appendWithStats(df, p, Seq(key), ndvCols = Seq(key),
          topKCols = if (topK) Seq(key) else Nil)
        p
      }
      val ords = Tables(spark, sf, "orders")
        .select($"o_orderkey", $"o_orderstatus")
      val maxO = ords.agg(max($"o_orderkey")).head().getLong(0)
      val low = sink("low", ords.filter($"o_orderkey" <= maxO / 25),
        "o_orderkey")
      val part = sink("part", Tables(spark, sf, "part")
        .select($"p_partkey", $"p_brand"), "p_partkey")
      val sup = sink("sup", Tables(spark, sf, "supplier")
        .select($"s_suppkey", $"s_acctbal"), "s_suppkey")
      val hot = sink("hot", li.select($"l_hot".as("d_hot")).distinct(),
        "d_hot", topK = true)
      val bc = ManifestSink.rowCount(spark, fact).get / 200
      val (joined, steps) = Skew.planAwareStarJoin(spark, fact, Seq(
        Skew.DimSpec(part, "l_partkey", "p_partkey"),
        Skew.DimSpec(sup, "l_suppkey", "s_suppkey"),
        Skew.DimSpec(low, "l_orderkey", "o_orderkey"),
        Skew.DimSpec(hot, "l_hot", "d_hot")), bc)
      assert(steps.map(_.strategy).sorted ===
        Seq("broadcast", "prefilter_semi", "salted", "shuffle"),
        s"fixture no longer lands all four verdicts: $steps")
      joined.count() // settle AQE: assert on the FINAL physical plan
      val lines = joined.queryExecution.executedPlan.toString
        .linesIterator.toSeq
      steps.foreach { st =>
        val k = st.factKey
        st.strategy match {
          case "broadcast" => assert(lines.exists(l =>
              l.contains("BroadcastHashJoin") && !l.contains("LeftSemi") &&
                l.contains(k)),
            s"edge $k planned broadcast but no BroadcastHashJoin on $k")
          case "prefilter_semi" => assert(lines.exists(l =>
              l.contains("BroadcastHashJoin") && l.contains("LeftSemi") &&
                l.contains(k)),
            s"edge $k planned prefilter_semi but no LeftSemi BHJ on $k")
          case "salted" => assert(lines.exists(l =>
              (l.contains("SortMergeJoin") ||
                l.contains("ShuffledHashJoin")) &&
                l.contains("__salt") && l.contains(k)),
            s"edge $k planned salted but no __salt shuffle join on $k")
          case "shuffle" => assert(lines.exists(l =>
              (l.contains("SortMergeJoin") ||
                l.contains("ShuffledHashJoin")) &&
                !l.contains("__salt") && l.contains(k)),
            s"edge $k planned shuffle but no shuffle join on $k")
          case other => fail(s"unexpected strategy $other for edge $k")
        }
      }
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
