package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adversarial-scale stress runner (r10 verdict #7): generates a SKEWED
  * corpus — hot near-dup clusters, giant documents, one-user event
  * bursts, a collapsed embedding cell — at ~4× the sf0.1 row counts,
  * then drives the near-dup + window + semantic families against it.
  *
  * Small uniform SFs verify correctness; this exists to surface the bug
  * class uniform data cannot: quadratic blowup in a hot LSH bucket,
  * stragglers from a giant doc's shingle list, window state on a single
  * hot key, a degenerate IVF cell holding half the corpus. (The r10
  * sf0.1 sweep caught a total-order bug the small SFs missed; skew is
  * the next axis.)
  *
  * Usage: `runMain graft.Stress [outDir]` — generates under outDir
  * (default /tmp/graft-stress), symlinks the sf0.1 TPC-H tables beside
  * the skewed ones so every registered query resolves, runs the stress
  * families, prints one JSON line per query (secs, rows) and a final
  * total line. Deterministic (seeded per row id); re-running regenerates
  * only if the directory is missing.
  */
object Stress {

  /** Skewed documents: 20k rows —
    *   - ids [0, 6000): ONE hot near-dup cluster (tiny per-doc suffix
    *     mutations of a shared base → nearly all shingles collide: the
    *     pathological LSH bucket the cap exists for);
    *   - ids [6000, 6020): GIANT docs (~120k chars, distinct content:
    *     the shingle-explosion straggler);
    *   - rest: zipfian vocabulary text, occasional exact dups. */
  def genDocuments(spark: SparkSession, n: Int = 20000): DataFrame = {
    import spark.implicits._
    val words = Vector("spark", "batch", "line", "column", "order", "sort",
      "hash", "group", "agg", "filter", "query", "value", "scan", "key",
      "window", "join", "shuffle", "page", "view", "edit", "user", "data")
    val base = (0 until 60).map(i => words(i * 7 % words.size)).mkString(" ")
    spark.range(n).select($"id".as("doc_id")).as[Long].map { d =>
      val text =
        if (d < 6000) s"$base tail${d % 7} v${d % 3}"
        else if (d < 6020) {
          val r = new scala.util.Random(d)
          val sb = new StringBuilder(130000)
          var i = 0
          while (i < 20000) { sb.append(words(r.nextInt(words.size))); sb.append(' '); i += 1 }
          sb.toString
        } else if (d % 97 == 0) base // sprinkled exact dups of the hot base
        else {
          val r = new scala.util.Random(d * 31 + 7)
          // zipf-ish: low word indexes much more likely
          (0 until (30 + (d % 50).toInt)).map { _ =>
            val z = math.min(words.size - 1,
              (math.pow(r.nextDouble(), 2.5) * words.size).toInt)
            words(z)
          }.mkString(" ")
        }
      (d, text, if (d % 5 == 0) "zh" else "en", s"src${d % 3}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  /** Skewed events: 400k rows — 50% on ONE user, 100k of them inside a
    * single one-minute burst; heavy-tailed values. */
  def genEvents(spark: SparkSession, n: Int = 400000): DataFrame = {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    spark.range(n).select($"id".as("event_id")).as[Long].map { e =>
      val r = new scala.util.Random(e * 13 + 1)
      val hot = e % 2 == 0 // 50% hot user
      val user = if (hot) 0L else 1L + r.nextInt(5000).toLong
      val ts = // hot user's first 100k events land in ONE minute
        if (hot && e < 200000) t0 + (e % 60000)
        else t0 + (e % 864000) * 100L // the rest spread over 24h
      val value = if (r.nextInt(1000) == 0) 1e6 * r.nextDouble()
                  else 100.0 * r.nextDouble()
      (e, new java.sql.Timestamp(ts), user,
        Seq("view", "edit", "error")(r.nextInt(3)),
        math.rint(value * 100) / 100, s"""{"k": ${r.nextInt(100)}}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  /** Skewed embeddings: 4k vectors, HALF collapsed into one tight
    * cluster around a single direction (degenerate IVF cell / SemDeDup
    * hot cell), the rest spread. Dim 64 like the driver corpus. */
  def genEmbeddings(spark: SparkSession, n: Int = 4000): DataFrame = {
    import spark.implicits._
    spark.range(n).select($"id".as("vec_id")).as[Long].map { v =>
      val r = new scala.util.Random(v * 101 + 3)
      val vec = new Array[Float](64)
      if (v % 2 == 0 && v >= 16) { // half the corpus in one tight cluster
        var i = 0
        while (i < 64) { vec(i) = (if (i == 0) 1f else 0f) + (r.nextFloat() - 0.5f) * 0.01f; i += 1 }
      } else {
        var i = 0
        while (i < 64) { vec(i) = r.nextFloat() - 0.5f; i += 1 }
      }
      (v, vec.toSeq, (v % 5).toInt)
    }.toDF("vec_id", "embedding", "label")
  }

  /** The stress families: every query here reads only documents /
    * events / embeddings (the skewed tables) or the symlinked TPC-H
    * tables, and each exercises a skew-sensitive code path. */
  val stressQueries: Seq[String] = Seq(
    "q36_minhash_near_dup",   // hot LSH bucket → cap decomposition path
    "q38_jaccard_near_dup",   // bitmap verify under a hot bucket
    "q60_shingle_near_dup",   // giant-doc shingle straggler
    "q143_exact_prefix_join", // prefix buckets under tiny-vocab skew
    "q151_containment_join",  // asymmetric probe + bitmap tier under clones
    "q158_simhash_multiprobe",// 13x probe index under hash clustering
    "q144_dup_ngram_coverage",
    "q83_span_dedup",
    "q35_fingerprint_dedup",
    "q25_events_per_minute",  // one-minute 100k-row burst window
    "q26_minute_deltas",
    "q28_hourly_windows",
    "q135_resample_ffill",
    "q139_skew_report",       // must DIAGNOSE the skew it reads
    "q82_semdedup",           // degenerate half-corpus cell
    "q44_embedding_near_dup",
    "q167_substring_coverage",// sliding-window explode on giant docs
    "q211_dsir_selection",    // hashed-bigram histograms on giant docs
    "q215_cluster_balanced")  // flattening the degenerate half-corpus cell

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft-stress")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC") // minute/hour-window
      // row counts must not depend on the host timezone (same pin as
      // Verify/SparkSpec)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = Paths.get(out)
    // The completion MARKER (not directory existence) gates reuse: a
    // crashed prior run leaves a partial directory whose queries would
    // fail confusingly — regenerate from scratch in that case.
    val marker = dir.resolve("_GENERATED")
    if (!Files.exists(marker)) {
      if (Files.isDirectory(dir)) { // partial leftovers: clear them
        val s = Files.walk(dir)
        try s.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.delete(p))
        finally s.close()
      }
      Files.createDirectories(dir)
      genDocuments(spark).write.parquet(s"$out/documents.parquet")
      genEvents(spark).write.parquet(s"$out/events.parquet")
      genEmbeddings(spark).write.parquet(s"$out/embeddings.parquet")
      // the relational tables are not the stress subject: symlink sfDir
      for (t <- Seq("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem"))
        Files.createSymbolicLink(dir.resolve(s"$t.parquet"),
          Paths.get(s"$sfDir/$t.parquet"))
      Files.write(marker, java.util.Arrays.asList(sfDir))
    }
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    var total = 0.0
    var nErr = 0
    val lines = stressQueries.map { name =>
      val t0 = System.nanoTime()
      val res =
        try Right(SparkEntry.queries(name)(spark, out).count())
        catch { case e: Throwable => Left(e.toString.take(200)) }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      res match {
        case Right(rows) =>
          total += dt
          s"""{"stress":"$name","sec":${num(dt)},"rows":$rows}"""
        case Left(err) =>
          nErr += 1
          val esc = err.replace("\\", "\\\\").replace("\"", "'")
            .replace("\n", " ")
          s"""{"stress":"$name","sec":${num(dt)},"error":"$esc"}"""
      }
    }
    lines.foreach(println)
    println(s"""{"stress":"TOTAL","sec":${num(total)},"n":${stressQueries.size},"n_err":$nErr}""")
    spark.stop()
  }
}
