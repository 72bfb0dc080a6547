package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical data-scale sweep (r12 verdict #1): every 100 TB claim so
  * far rests on plan shape audited at sf0.1 — this main MEASURES the
  * scaling law by generating a 10× corpus and timing the heavy read
  * families at both scales. A hidden superlinearity (per-group state
  * growing with corpus size, a candidate space quietly quadratic) shows
  * up as a wall-time ratio well above the data ratio; near-linear
  * ratios validate the plan-shape argument with data.
  *
  * The 10× corpus derives from the driver's sf0.1 fixtures by
  * REPLICA-DISJOINT replication — the scaling a real corpus exhibits
  * (more content, not more copies):
  *   - documents: replica r > 0 gets every token prefixed `r<r>·` —
  *     token sets across replicas are DISJOINT, so within-replica
  *     near-dup structure replicates (output scales ×k) while
  *     cross-replica Jaccard is zero (verbatim replication would square
  *     the pair count and measure the fixture, not the engine);
  *   - embeddings: replica vectors are circular shifts of the originals
  *     (norms and value distribution preserved, cross-replica
  *     correlation broken); query/centroid ids (vec_id < 16) stay the
  *     replica-0 originals so routing semantics match the registered
  *     queries;
  *   - events: user/event ids offset per replica (disjoint key spaces —
  *     windows and graphs scale by components, the production shape);
  *   - TPC-H: every key column offset by replica × (max key + 1), so
  *     the join/graph structure becomes k disjoint copies — component
  *     and triangle counts scale exactly ×k. nation/region stay shared
  *     (small dims are shared in production too).
  *
  * Exclusions, stated not hidden: q216's exact-truth tier REQUIRES a
  * ≤ 62-token vocabulary (TokenBitmask bitmaps); the disjoint-replica
  * corpus multiplies the 31-token vocab by k, so the panel's own
  * bounded-vocab contract excludes it here (its banding measurements
  * are corpus-local anyway). q143/q151 flip from the bitmap-verify tier
  * to the open-vocab tier at 10× for the same reason — which is the
  * tier a real 100 TB corpus runs, so the sweep measures the right arm.
  *
  * Also runs the ADVERSARIAL q169 fixture the r12 verdict asked for: a
  * pathologically self-repetitive document (one token × 20k — every
  * position matches every other) beside normal docs, timing the
  * substring-dedup pass whose token×span fanout was flagged as the
  * quadratic risk.
  *
  * Usage: `runMain graft.ScaleSweep [outDir]` (default /tmp/graft-sf1).
  * Prints one JSON line per (sf, query) and a total line per sf.
  * Generation is marker-gated like [[Stress]].
  */
object ScaleSweep {

  /** The heavy read families the r12 verdict named: LSH/containment/
    * substring dedup, components, entity resolution, graph, ANN panel. */
  val sweepQueries: Seq[String] = Seq(
    "q36_minhash_near_dup",
    "q38_jaccard_near_dup",
    "q60_shingle_near_dup",
    "q143_exact_prefix_join",
    "q151_containment_join",
    "q158_simhash_multiprobe",
    "q114_entity_clusters",
    "q71_dedup_components",
    "q71b_components_twostar",
    "q167_substring_coverage",
    "q169_substring_dedup",
    // the SAMPLED recall panel (q216's open-vocab variant) — the banding
    // recall/cost measurement q216's <=62-token contract excluded from
    // the sweep (r13 verdict #2); rows = 3 configs regardless of scale
    "q216b_sampled_recall",
    "q104_nation_pagerank",
    "q112_triangle_count",
    "q117_ann_ivf_indexed",
    "q118_ann_ivf_lloyd_indexed",
    "q119_ann_pq_indexed",
    "q120_ann_ivf_pruned",
    "q185_ann_sq8",
    // q44 deliberately absent: it is the documented EXACT blocked-pairs
    // baseline (all pairs within label above cosine 0.4 — its own
    // scaladoc names q42's LSH buckets as the 100 TB swap), and on a
    // random-ish corpus a fixed low-threshold all-pairs OUTPUT is
    // intrinsically quadratic in corpus size whatever the plan; the
    // sweep grades the scale paths (q82 below IS q44's celled path)
    "q82_semdedup",
    "q211_dsir_selection")

  /** Recursive delete with the walk stream CLOSED deterministically —
    * Files.walk holds directory handles until close, and a sweep walks
    * multi-GB trees often enough to exhaust ulimit -n if left to GC. */
  private def rmTree(p: java.nio.file.Path): Unit = {
    if (!Files.exists(p)) return
    val s = Files.walk(p)
    try s.sorted(java.util.Comparator.reverseOrder())
      .forEach(q => Files.delete(q))
    finally s.close()
  }

  private def tokPrefix(df: DataFrame, r: Int): DataFrame =
    if (r == 0) df
    else df.withColumn("text",
        array_join(transform(split(col("text"), " "),
          t => concat(lit(s"r$r"), t)), " "))
      .withColumn("n_chars", length(col("text")))

  /** RESHAPED-corpus seam (r16 verdict #3's A/B medium): stretch every
    * document to `times` its length by concatenating locally-prefixed
    * copies of its own tokens (copy c > 0 gets `y<c>·` prefixes, so
    * the copies' shingle sets are disjoint — unique shingles per doc
    * scale ×times, not ×1 as verbatim repetition would after
    * array_distinct). Near-dup STRUCTURE is preserved (both members of
    * a pair stretch identically), while the corpus SHAPE — shingle
    * rows per parquet byte, i.e. the resident-blocks-per-input-byte
    * ratio the auto-sizer's 800× prior was calibrated on — shifts,
    * which is exactly what the observed-resident resize must absorb.
    * Enabled by SPARK_GRAFT_SWEEP_LONGDOC=<times> at generation. */
  private def longDoc(df: DataFrame, times: Int): DataFrame =
    if (times <= 1) df
    else df.withColumn("text",
        array_join(flatten(transform(sequence(lit(0), lit(times - 1)),
          c => transform(split(col("text"), " "),
            t => when(c === 0, t)
              .otherwise(concat(lit("y"), c.cast("string"),
                lit("·"), t))))), " "))
      .withColumn("n_chars", length(col("text")))

  /** Generate the k× corpus under `out` from `base`. */
  def generate(spark: SparkSession, base: String, out: String,
      k: Int): Unit = {
    def rd(t: String): DataFrame = spark.read.parquet(s"$base/$t.parquet")
    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head().getLong(0) + 1

    def replicate(df: DataFrame)(f: (DataFrame, Int) => DataFrame)
        : DataFrame =
      (0 until k).map(r => f(df, r)).reduce(_ unionByName _)

    val docs = rd("documents")
    val dStride = maxOf(docs, "doc_id")
    val stretch =
      sys.env.get("SPARK_GRAFT_SWEEP_LONGDOC").map(_.toInt).getOrElse(1)
    longDoc(replicate(docs) { (d, r) =>
      tokPrefix(d.withColumn("doc_id", col("doc_id") + lit(r * dStride)), r)
    }, stretch).write.parquet(s"$out/documents.parquet")

    val emb = rd("embeddings")
    val vStride = maxOf(emb, "vec_id")
    replicate(emb) { (e, r) =>
      // per-replica RANDOM-SIGN DIAGONAL transform: x_i -> x_i·s(r,i),
      // s = ±1 from a hash. Norms preserved; E[cos(D_r v, D_s w)] = 0
      // whatever the vectors' structure. (The first cut used circular
      // shifts, which decorrelate only unstructured vectors — the
      // driver corpus's clustered embeddings stayed shift-correlated
      // and exploded q44's cross-replica pair space ~100x at the x100
      // decade: a fixture artifact, not an engine behavior.)
      val signed = if (r == 0) col("embedding")
        else zip_with(col("embedding"),
          transform(sequence(lit(0), lit(63)),
            i => when(pmod(xxhash64(lit(r), i), lit(2L)) === 0, lit(1.0f))
              .otherwise(lit(-1.0f))),
          (x, sgn) => x * sgn)
      e.select((col("vec_id") + lit(r * vStride)).as("vec_id"),
        signed.cast("array<float>").as("embedding"), col("label"))
    }.write.parquet(s"$out/embeddings.parquet")

    val ev = rd("events")
    val eStride = maxOf(ev, "event_id")
    val uStride = maxOf(ev, "user_id")
    replicate(ev) { (e, r) =>
      e.withColumn("event_id", col("event_id") + lit(r * eStride))
        .withColumn("user_id", col("user_id") + lit(r * uStride))
    }.write.parquet(s"$out/events.parquet")

    val cust = rd("customer"); val cStride = maxOf(cust, "c_custkey")
    val supp = rd("supplier")
    val sStride = supp.agg(max(col("s_suppkey"))).head().getLong(0) + 1
    val part = rd("part")
    val pStride = part.agg(max(col("p_partkey"))).head().getLong(0) + 1
    val ord = rd("orders"); val oStride = maxOf(ord, "o_orderkey")
    replicate(cust)((d, r) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(r * cStride)))
      .write.parquet(s"$out/customer.parquet")
    replicate(supp)((d, r) =>
      d.withColumn("s_suppkey", col("s_suppkey") + lit(r * sStride)))
      .write.parquet(s"$out/supplier.parquet")
    replicate(part)((d, r) =>
      d.withColumn("p_partkey", col("p_partkey") + lit(r * pStride)))
      .write.parquet(s"$out/part.parquet")
    replicate(ord) { (d, r) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(r * oStride))
        .withColumn("o_custkey", col("o_custkey") + lit(r * cStride))
    }.write.parquet(s"$out/orders.parquet")
    replicate(rd("lineitem")) { (d, r) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(r * oStride))
        .withColumn("l_partkey", col("l_partkey") + lit(r * pStride))
        .withColumn("l_suppkey", col("l_suppkey") + lit(r * sStride))
    }.write.parquet(s"$out/lineitem.parquet")

    for (t <- Seq("region", "nation"))
      Files.createSymbolicLink(Paths.get(out, s"$t.parquet"),
        Paths.get(s"$base/$t.parquet"))
  }

  /** The adversarial q169 corpus: one token × 20k (every alignment
    * matches every other — the worst span fanout) beside a normal
    * slice. */
  def genAdversarial(spark: SparkSession, base: String,
      out: String): Unit = {
    import spark.implicits._
    val normal = spark.read.parquet(s"$base/documents.parquet")
      .filter(col("doc_id") < 500)
    val evil = Seq((1000000L, Seq.fill(20000)("spark").mkString(" "),
      "en", "src0")).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
    normal.unionByName(evil).write.parquet(s"$out/documents.parquet")
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft-sf1")
    // SPARK_GRAFT_SWEEP_K overrides the multiplier (the x100 decade runs
    // as a second invocation with K=100 and its own outDir)
    val k = sys.env.get("SPARK_GRAFT_SWEEP_K").map(_.toInt).getOrElse(10)
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // OWNED shuffle-scratch root: a sweep that dies mid-query (the ×100
    // scratch-overflow lesson) leaves tens of GB of blockmgr-*/spark-*
    // dirs that Spark's shutdown hook never ran for — so each run pins
    // local.dir to this path, SWEEPS THE PREDECESSOR'S RESIDUE at
    // startup, and deletes its own in a finally. Single-operator
    // harness: two concurrent sweeps on one host would share it.
    // Ownership-gated like outDir: only a dir holding the sentinel a
    // previous sweep wrote (or an empty/absent one) is auto-reclaimed —
    // a mistyped SPARK_GRAFT_SWEEP_SCRATCH pointing at foreign data
    // must refuse, not wipe it.
    val scratch = Paths.get(sys.env.getOrElse("SPARK_GRAFT_SWEEP_SCRATCH",
      "/tmp/graft-sweep-scratch"))
    val scratchMark = scratch.resolve("_SWEEP_SCRATCH")
    if (Files.exists(scratch)) {
      val empty = {
        val s = Files.list(scratch)
        try !s.findAny().isPresent finally s.close()
      }
      require(empty || Files.exists(scratchMark),
        s"refusing to delete scratch '$scratch': non-empty and not " +
          "marked by a previous sweep — looks like foreign data")
      rmTree(scratch)
    }
    Files.createDirectories(scratch)
    Files.createFile(scratchMark)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.local.dir", scratch.toString)
      .config("spark.sql.shuffle.partitions", cpus)
      // THE fixed-partition-count scale break, found by the x100 decade:
      // 32 shuffle partitions put ~billions of candidate rows per
      // reducer at 100x and the pair-distinct aggregates die with
      // AGGREGATE_OUT_OF_MEMORY. The production shape decouples the
      // knob from data volume: a high INITIAL partition count with AQE
      // coalescing small stages back down — exactly what a 1000-executor
      // deployment runs, and measured here to restore the q143/q38 runs
      // at 100x with no effect on the small scales (AQE coalesces).
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * math.max(k, 4)).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_LINEAGE=reliable runs the whole sweep with
    // checkpoint-dir-backed lineage cuts (graft.iterative.checkpoint —
    // the preemptible-fleet deployment shape, [[operators.Lineage]])
    // instead of the default local zero-copy blocks, so the reliable
    // path is exercised at data scale, not just LineageSpec's unit
    // sizes. The checkpoint dir lives under the sweep-owned scratch:
    // reclaimed with the shuffle residue in the same finally.
    sys.env.get("SPARK_GRAFT_LINEAGE").foreach { mode =>
      spark.conf.set(operators.Lineage.ModeKey, mode)
      if (mode == "reliable") spark.sparkContext.setCheckpointDir(
        scratch.resolve("checkpoints").toString)
    }
    val dir = Paths.get(out)
    val marker = dir.resolve("_GENERATED")
    if (!Files.exists(marker)) { // completion marker, not dir existence
      if (Files.isDirectory(dir)) {
        // Only auto-reclaim a dir THIS harness owns: a half-finished
        // generation leaves `documents.parquet` (the first table
        // written) without the marker. A non-empty dir with neither is
        // somebody else's data — a mistyped CLI arg must not wipe it;
        // the operator opts in with SPARK_GRAFT_SWEEP_FORCE=1.
        val force = sys.env.get("SPARK_GRAFT_SWEEP_FORCE").contains("1")
        val ownedPartial = Files.exists(dir.resolve("documents.parquet"))
        val empty = {
          val s = Files.list(dir)
          try !s.findAny().isPresent finally s.close()
        }
        require(empty || ownedPartial || force,
          s"refusing to delete non-empty '$out': no _GENERATED marker " +
            "and no partial sweep tables — looks like foreign data. " +
            "Set SPARK_GRAFT_SWEEP_FORCE=1 to override.")
        rmTree(dir)
      }
      Files.createDirectories(dir)
      generate(spark, base, out, k)
      genAdversarial(spark, base, s"$out/adv")
      val stretch =
        sys.env.getOrElse("SPARK_GRAFT_SWEEP_LONGDOC", "1")
      Files.write(marker,
        java.util.Arrays.asList(base, k.toString, s"longdoc=$stretch"))
    }
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    // SPARK_GRAFT_SWEEP_ONLY=q38,...   — subset for targeted A/Bs
    // SPARK_GRAFT_SWEEP_TAGS=base,x10  — subset of the three corpora
    val only = sys.env.get("SPARK_GRAFT_SWEEP_ONLY").map(_.split(",").toSet)
    val tags = sys.env.get("SPARK_GRAFT_SWEEP_TAGS").map(_.split(",").toSet)
    def wanted(tag: String) = tags.forall(_.contains(tag))
    def sweep(tag: String, sfDir: String, qs0: Seq[String]): Unit = {
      if (!wanted(tag)) return
      val qs = qs0.filter(q => only.forall(_.contains(q)))
      var total = 0.0; var nErr = 0
      qs.foreach { name =>
        val t0 = System.nanoTime()
        val res =
          try Right(SparkEntry.queries(name)(spark, sfDir).count())
          // NonFatal only: a query-level failure (spill exhaustion,
          // analysis error) becomes a JSON error line and the sweep
          // continues; a FATAL error (OOMError, thread death) must kill
          // the run — folding it into a line would report a corrupted
          // JVM's remaining timings as data.
          catch { case scala.util.control.NonFatal(e) =>
            Left(e.toString.take(200)) }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(false))
        res match {
          case Right(rows) =>
            total += dt
            println(s"""{"sweep":"$tag","q":"$name","sec":${num(dt)},""" +
              s""""rows":$rows}""")
          case Left(err) =>
            nErr += 1
            val esc = err.replace("\\", "\\\\").replace("\"", "'")
              .replace("\n", " ")
            println(s"""{"sweep":"$tag","q":"$name","sec":${num(dt)},""" +
              s""""error":"$esc"}""")
        }
      }
      println(s"""{"sweep":"$tag","q":"TOTAL","sec":${num(total)},""" +
        s""""n":${qs.size},"n_err":$nErr}""")
    }
    try {
      sweep("base", base, sweepQueries)
      sweep(s"x$k", out, sweepQueries)
      // adversarial self-repetitive doc, q169 only (+ q167, same kernel)
      sweep("adv", s"$out/adv",
        Seq("q169_substring_dedup", "q167_substring_coverage"))
    } finally {
      spark.stop()
      rmTree(scratch)
    }
  }
}
