package graft
import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warm-up at the smallest SF (standard steady-state
    // benchmarking: generated code and JIT compilation are per-plan-shape,
    // so a tiny-data pass compiles everything the timed pass runs).
    // Disable with SPARK_GRAFT_WARMUP=0.
    // Several pipelines persist() intermediates; each invocation builds a
    // fresh frame, so the previous run's cached blocks are garbage the
    // ContextCleaner reclaims only on GC. Dropping them eagerly between
    // queries keeps ~200 query runs (warmup + reps × |queries|) from
    // accumulating dead storage memory that evicts/thrashes later
    // queries — each timed rep still pays for building its own cache.
    def clearLeakedCache(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    val warmDir = "/root/testdata/sf0.001"
    // optional comma-separated query filter (builder tooling for targeted
    // perf iteration; the driver never sets it). Warmup honors it: warming
    // the OTHER ~170 queries before a single-query measurement both wastes
    // minutes and DISTORTS the number — JIT profile/code-cache pollution
    // from registry-wide warmup is worth ~25% on some queries, and it
    // grows with the registry (r12 pinned A/B on identical q42b code:
    // min-of-5 read 2.1 s after a 171-query warmup, 1.8 s after r10's
    // 156-query warmup, 1.55 s after none — the apparent cross-round
    // "regression" was warmup residue, not code; a post-warmup
    // System.gc() drain does NOT recover it, so it is compiled-code
    // state, not collectable references). The full driver bench warms
    // everything it times — same conditions every round — but its
    // per-query numbers carry this registry-size-dependent floor;
    // cross-round comparisons of a single query should pin the code and
    // the warmup set (bench-variance ritual).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    if (sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") == "1" &&
        new java.io.File(warmDir).isDirectory && warmDir != sfDir) {
      SparkEntry.queries
        .filter { case (name, _) => only.forall(_.contains(name)) }
        .foreach { case (_, fn) =>
          try fn(spark, warmDir).count() catch { case NonFatal(_) => () }
        }
      clearLeakedCache()
    }
    // Steady-state timing: best of SPARK_GRAFT_BENCH_REPS runs per query
    // (default 3 — observed run-to-run variance on this machine is ±20%,
    // and min-of-2 still passes an unlucky pair through). Single-shot
    // numbers on a shared machine mix scheduler noise into the
    // measurement; min-of-N is the standard estimator for the code's
    // actual cost.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val rawTimes = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      // A rep that THROWS must not masquerade as a (fast) timing: analysis
      // errors fail in milliseconds and r8 reported three crashed queries
      // as 0.05 s "wins". A query with any failed rep is reported as an
      // explicit error, and errored queries are excluded from the total.
      // (NonFatal: an OOM must kill the bench loudly, not fold into an
      // "err" entry that reads like a query-level failure — r14 advice.)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
                 catch { case NonFatal(_) => false }
        val dt = (System.nanoTime() - t0) / 1e9
        clearLeakedCache()
        if (ok) Some(dt) else None
      }
      name -> times
    }
    val results = rawTimes.map { case (name, times) =>
      name -> (if (times.forall(_.isDefined)) Some(times.flatten.min)
               else None)
    }
    // Family split (r10 verdict #5): write-path GATES spend their time
    // in the manifest mutations they exist to verify (append / replace /
    // merge / CDC / clone on EVERY invocation) — inherent cost that must
    // not be triaged like a read-plan regression. Membership derives
    // from the registries that define sink-mutation gates, so new gates
    // classify themselves; the amortized index/panel builders
    // (q117-q121) READ after their first build and stay in the read
    // family.
    val writeGateNames = operators.SinkOps.queries.keySet ++
      operators.Expectations.queries.keySet
    artifactLines(results, rawTimes, writeGateNames, sfDir, calibrate(spark))
      .foreach(println)
    spark.stop()
  }

  /** Host-state calibration probe (r16 verdict #6): a FIXED synthetic
    * micro-bench — plan-identical every round — timed right after the
    * query reps, so cross-day artifact totals can be normalized against
    * measured host drift instead of re-litigated (r15→r16: identical
    * plans moved 1.6-1.7× on host state alone; the q194/q217 "risers"
    * were indistinguishable from drift without a same-day A/B). Three
    * probes, min-of-3 each after a JIT pass: scan+shuffle (a fixed
    * range → modular keys → hash agg, one exchange), parquet write
    * (fixed 2M-row frame to scratch — the write-gate family's medium),
    * and parquet read-back (scan + filter + count). ~2-3 s total. */
  private[graft] def calibrate(spark: SparkSession): Seq[(String, Double)] = {
    def minOf3(body: => Unit): Double = {
      body // JIT/codegen pass, untimed
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.min
    }
    val scanShuffle = minOf3 {
      spark.range(0L, 32L << 20, 1L, 32)
        .selectExpr("id % 9973 AS k", "id AS v")
        .groupBy("k").sum("v").count(); ()
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft-calib")
    try {
      val write = minOf3 {
        spark.range(0L, 2L << 20, 1L, 8)
          .selectExpr("id", "id % 1024 AS v")
          .write.mode("overwrite").parquet(s"$tmp/p")
      }
      val read = minOf3 {
        spark.read.parquet(s"$tmp/p").where("v < 512").count(); ()
      }
      Seq("scan_shuffle" -> scanShuffle, "write" -> write, "read" -> read)
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(tmp)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path])
        .iterator.asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
  }

  /** The artifact, as ordered stdout lines — pure, so the layout
    * contracts the driver depends on are spec-pinned (BenchArtifactSpec)
    * instead of re-discovered by breaking a round:
    *
    *  - every line is self-contained valid JSON;
    *  - the TOTAL line prints both FIRST and LAST (identical): the r6
    *    artifact parsed as null though the trailing total was intact, so
    *    the driver's extractor is neither strictly-last-line nor
    *    tail-based — bracketing lands any first-match / last-match /
    *    bounded-buffer heuristic on it;
    *  - SIZE CONTRACT (r15 verdict #1): the driver captures only the
    *    LAST ~2000 chars of stdout, so the total line stays compact
    *    (header + top-20 pairs, ~1 KB). r15 packed spread_pct and the
    *    full ~50-entry write-gate map INTO it (~4.6 KB), the tail window
    *    truncated it mid-JSON, and BENCH_r15.json parsed as null — the
    *    round's best-ever bench was invisible to the driver. Those maps
    *    are their own digest lines before the final total, where
    *    truncation costs only the cheap head, never parseability;
    *  - per-query timings print as 10-per-line DIGESTS (121 one-per-line
    *    entries overflowed the ~35-line tail capture in r7), sorted
    *    cheapest-first (r9 #3: a tail-buffered capture drops the HEAD,
    *    so the slowest queries — the ones triage needs — land last,
    *    right before the total; errors sort after the slowest);
    *  - each timing digest carries its queries' family tags ("fam") AND
    *    their across-reps spread ("spread_pct", all queries — r15 #6)
    *    in the SAME object (r16 advice: separate spread lines doubled
    *    the artifact to ~51 lines and pushed the cheap ~140 queries'
    *    timings outside the ~35-line tail capture — folding keeps the
    *    full artifact at 1 + ceil(N/10) + 1 + 1 + 1 ≈ 28 lines for the
    *    231-query registry, and a digest's timing and spread can never
    *    be separated by a capture cut);
    *  - a host-calibration line (`calib`, see [[calibrate]]) prints
    *    before the write-gate map, and its sum rides IN the total line
    *    as "calib_sec" so drift normalization survives even a one-line
    *    capture;
    *  - the complete write-gate map (the ±30%-spread family on this
    *    host) prints slowest-first as one line. */
  private[graft] def artifactLines(
      results: Map[String, Option[Double]],
      rawTimes: Map[String, Seq[Option[Double]]],
      writeGateNames: String => Boolean,
      sfDir: String,
      calib: Seq[(String, Double)] = Nil): Seq[String] = {
    // Locale.ROOT: the default-locale f-interpolator would print a comma
    // decimal separator under e.g. de_DE and break the JSON parse.
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    def pair(k: String, t: Option[Double]): String = t match {
      case Some(v) => s""""$k":${num(v)}"""
      case None    => s""""$k":"err""""
    }
    val byCost = results.toSeq
      .sortBy { case (_, t) => t.getOrElse(Double.MaxValue) }
    val total = results.values.flatten.sum
    val nErr = results.values.count(_.isEmpty)
    def famSum(p: String => Boolean): Double =
      results.collect { case (k, Some(t)) if p(k) => t }.sum
    val writeSec = famSum(writeGateNames)
    val readSec = famSum(k => !writeGateNames(k))
    // across-reps spread ((max−min)/min, percent): a "regressed" query
    // whose own reps spread 25% is noise; a tight spread around a
    // higher min is a plan change
    def spreadPct(name: String): Option[Double] = {
      val ok = rawTimes(name).flatten
      if (ok.size < 2) None else Some((ok.max - ok.min) / ok.min * 100.0)
    }
    val top20 = byCost.takeRight(20).reverse
    val top = top20.map { case (k, t) => pair(k, t) }.mkString(",")
    val nWrite = results.keysIterator.count(writeGateNames)
    val calibField =
      if (calib.isEmpty) ""
      else s""","calib_sec":${num(calib.map(_._2).sum)}"""
    val totalLine =
      s"""{"metric":"total","value":${num(total)},"unit":"sec","sf":"$sfDir","n_queries":${results.size},"n_err":$nErr,"read_sec":${num(readSec)},"n_read":${results.size - nWrite},"write_gate_sec":${num(writeSec)},"n_write_gate":$nWrite$calibField,"queries":{$top}}"""
    val timingLines = byCost.grouped(10).map { group =>
      val pairs = group.map { case (k, t) => pair(k, t) }
      val fams = group.map { case (k, _) =>
        s""""$k":"${if (writeGateNames(k)) "w" else "r"}"""" }
      val sp = group.flatMap { case (k, _) =>
        spreadPct(k).map(s => s""""$k":${num(s)}""") }
      val spField =
        if (sp.isEmpty) "" else s""","spread_pct":{${sp.mkString(",")}}"""
      s"""{"queries":{${pairs.mkString(",")}},"fam":{${fams.mkString(",")}}$spField}"""
    }.toSeq
    val calibLines =
      if (calib.isEmpty) Nil
      else Seq(s"""{"calib":{${calib
        .map { case (k, v) => s""""$k":${num(v)}""" }.mkString(",")}}}""")
    val gates = byCost.filter { case (k, _) => writeGateNames(k) }
      .reverse.map { case (k, t) => pair(k, t) }.mkString(",")
    (totalLine +: timingLines) ++ calibLines ++
      Seq(s"""{"write_gates":{$gates}}""", totalLine)
  }
}
