package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.GraftConfig
import graft.ingest.WikiIngest

/** Structured Streaming assembly of the reference pipeline (SURVEY.md §3.1):
  *
  * {{{
  * readStream (raw JSON lines)            S1/S4 source
  *   → parse/filter/transform             F1-F4, P1-P9  (graft.ingest)
  *   → withWatermark + dropDuplicatesWithinWatermark    D1, bounded state
  *   → writeStream.trigger(ProcessingTime(2s))          K3 commit cadence
  *       .foreachBatch(append K1 + retention R1/F6)
  *       .option(checkpointLocation)                    S2/S3 resume
  * }}}
  *
  * Deliberate divergence from the reference (SURVEY.md §7.5.1): the SQLite
  * UNIQUE index dedups against *all history* with unbounded state; the
  * watermarked dedup holds only the replay-overlap window in the state
  * store — the property that makes the pipeline run forever on a cluster.
  * The reference's `?since=` re-delivery overlap is exactly what the
  * watermark must cover.
  */
object WikiStream {

  /** Streaming (or batch) raw lines → deduped typed wiki_events frame.
    * The frame carries an `observe` metric node ("graft_ingest":
    * rows_typed + bytes of length churn) — the A8 counter surface
    * (pipeline.py:25,34) as Spark observable metrics: per-micro-batch
    * values arrive in `StreamingQueryProgress.observedMetrics` with no
    * extra action or accumulator plumbing. */
  def fromRawLines(raw: DataFrame, rawCol: String = "value",
      watermarkDelay: String = "10 seconds"): DataFrame = {
    val typed = typedWithMetrics(raw, rawCol)
    if (typed.isStreaming)
      typed.withWatermark("event_timestamp", watermarkDelay)
        .dropDuplicatesWithinWatermark("event_timestamp", "username", "title")
    else
      WikiIngest.dedup(typed)
  }

  /** Parse/filter/transform + the `observe` metric node, WITHOUT the
    * stateful watermark dedup — the typed surface the late-aware path
    * builds on: Spark's own watermark DISCARDS late rows inside stateful
    * operators, so a pipeline that wants to LAND them (dead-letter, see
    * [[LateDataChannel]]) must not put a watermarked operator between
    * source and sink. Dedup then happens wholly at the sink (batch-local
    * + anti-join across epochs — the reference's UNIQUE-index shape). */
  private def typedWithMetrics(raw: DataFrame, rawCol: String): DataFrame =
    WikiIngest.transform(
        WikiIngest.filterEvents(WikiIngest.parseRaw(raw, rawCol)), rawCol)
      .observe("graft_ingest",
        count(lit(1)).as("rows_typed"),
        sum(abs(col("length_diff_bytes"))).as("bytes_changed"))

  /** Dedup key of the sink table — the reference's UNIQUE constraint
    * (pipeline.py:216). */
  val DedupKey: Seq[String] = Seq("event_timestamp", "username", "title")

  /** K1 append + R1 retention with F6 hysteresis, run per micro-batch.
    * At scale the rewrite becomes a partition drop / Delta DELETE; on plain
    * parquet it is a compact-and-swap of the sink directory.
    *
    * D1 at the SINK: before appending, rows already present under the
    * UNIQUE key are anti-joined away — the reference's IntegrityError-skip
    * (pipeline.py:173-174). This is what makes a replayed micro-batch
    * (foreachBatch retries are at-least-once) idempotent even though the
    * in-stream watermarked dedup has already forgotten old keys. At scale
    * the anti-join does not scan history: replays only re-deliver recent
    * data (bounded by checkpoint + watermark), so a time-partitioned sink
    * prunes the probe to the newest partitions. */
  def appendWithRetention(batch: DataFrame, sinkDir: String,
      cfg: GraftConfig): Unit = {
    require(cfg.dbMaxEvents <= Int.MaxValue,
      s"dbMaxEvents ${cfg.dbMaxEvents} exceeds the limit-based compaction " +
        "range; use time-partitioned retention (ParquetSink) instead")
    batch.persist()
    try {
      val spark = batch.sparkSession
      val sinkExists = {
        val p = new Path(sinkDir)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
      }
      val fresh =
        if (!sinkExists) batch
        else batch.join(spark.read.parquet(sinkDir).select(
          DedupKey.map(col): _*), DedupKey, "left_anti")
      fresh.write.mode("append").parquet(sinkDir)
      val sink = spark.read.parquet(sinkDir)
      if (WikiIngest.needsCleanup(sink.count(), cfg.dbMaxEvents,
          cfg.cleanupHysteresis)) {
        // Same survivor boundary as WikiIngest.retention and the reference's
        // `DELETE WHERE id < MAX(0, max_id - N)` (pipeline.py:45-48): the
        // newest N+1 rows survive (survivors satisfy id >= max - N). The
        // sink has no id column, so "newest" is the (event_timestamp,
        // username, title) total order the dedup key already defines.
        val retained = sink
          .orderBy(col("event_timestamp").desc, col("username"), col("title"))
          .limit(cfg.dbMaxEvents.toInt + 1)
        val tmp = new Path(sinkDir + "__compact")
        retained.write.mode("overwrite").parquet(tmp.toString)
        // swap via rename-aside so a failure at any step leaves a
        // recoverable directory instead of silently losing the sink;
        // rename results are checked (object stores can return false)
        val fs = tmp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val live = new Path(sinkDir)
        val old = new Path(sinkDir + "__old")
        if (fs.exists(old)) fs.delete(old, true)
        require(fs.rename(live, old), s"failed to move $live aside to $old")
        require(fs.rename(tmp, live),
          s"failed to promote $tmp to $live; previous data is at $old")
        fs.delete(old, true)
      }
    } finally batch.unpersist()
  }

  /** [[appendWithRetention]] on a [[graft.sinks.ManifestSink]] table:
    * same K1/D1/R1/F6 semantics, but every step is a manifest commit —
    * the append is snapshot-isolated, the retention rewrite is an atomic
    * `replace` (readers never observe the mid-compaction state the
    * rename-swap sink exposes on stores with non-atomic directory
    * rename), and replaced data is reclaimed by `vacuum`. */
  def appendWithRetentionManifest(batch: DataFrame, sinkDir: String,
      cfg: GraftConfig): Unit = {
    import graft.sinks.ManifestSink
    require(cfg.dbMaxEvents <= Int.MaxValue,
      s"dbMaxEvents ${cfg.dbMaxEvents} exceeds the limit-based compaction " +
        "range; use time-partitioned retention (ParquetSink) instead")
    batch.persist()
    try {
      val spark = batch.sparkSession
      val fresh =
        if (ManifestSink.version(spark, sinkDir) < 0) batch
        else batch.join(ManifestSink.read(spark, sinkDir)
          .select(DedupKey.map(col): _*), DedupKey, "left_anti")
      ManifestSink.append(fresh, sinkDir)
      // the threshold check is manifest METADATA (per-entry row counts)
      // — no table scan per micro-batch; the fallback covers histories
      // with pre-rowcount entries
      val n = ManifestSink.rowCount(spark, sinkDir)
        .getOrElse(ManifestSink.read(spark, sinkDir).count())
      if (WikiIngest.needsCleanup(n, cfg.dbMaxEvents,
          cfg.cleanupHysteresis)) {
        val retained = ManifestSink.read(spark, sinkDir)
          .orderBy(col("event_timestamp").desc, col("username"), col("title"))
          .limit(cfg.dbMaxEvents.toInt + 1)
        ManifestSink.replace(retained, sinkDir)
        ManifestSink.vacuum(spark, sinkDir)
      }
    } finally batch.unpersist()
  }

  /** [[appendWithRetentionManifest]] with O(1) replay protection: the
    * micro-batch folds via [[graft.sinks.ManifestSink.appendOnce]], whose
    * epoch marker commits ATOMICALLY with the data in the manifest
    * header — a replayed epoch (foreachBatch is at-least-once) is
    * skipped from manifest metadata alone, and the marker survives the
    * retention `replace` (headers carry forward). The anti-join variant
    * additionally dedups ACROSS epochs (the reference's UNIQUE-index
    * semantics); this variant assumes the upstream already key-dedups
    * (e.g. `dropDuplicatesWithinWatermark`) and pays ZERO table reads
    * per replay check — the at-scale trade when the table is 100 TB and
    * the batch is megabytes. */
  def appendOnceWithRetentionManifest(batch: DataFrame, batchId: Long,
      sinkDir: String, cfg: GraftConfig): Unit = {
    import graft.sinks.ManifestSink
    require(cfg.dbMaxEvents <= Int.MaxValue,
      s"dbMaxEvents ${cfg.dbMaxEvents} exceeds the limit-based compaction " +
        "range; use time-partitioned retention (ParquetSink) instead")
    // watermark-advance epochs deliver empty batches: folding one would
    // commit an empty manifest version per trigger. Skipping is safe
    // WITHOUT advancing the marker — replaying an empty epoch is a no-op
    // whatever the marker says. The guard is count(), not isEmpty():
    // Spark's state-store commit validation requires foreachBatch to
    // process EVERY partition (isEmpty touches one), and the full count
    // also covers appendOnce's own read-nothing skip path on replays.
    if (batch.persist().count() == 0L) { batch.unpersist(); return }
    val spark = batch.sparkSession
    try ManifestSink.appendOnce(batch, sinkDir, batchId)
    finally batch.unpersist()
    // metadata-only threshold check — with the O(1) replay guard this
    // makes the whole no-cleanup trigger path free of table reads
    val n = ManifestSink.rowCount(spark, sinkDir)
      .getOrElse(ManifestSink.read(spark, sinkDir).count())
    if (WikiIngest.needsCleanup(n, cfg.dbMaxEvents,
        cfg.cleanupHysteresis)) {
      val retained = ManifestSink.read(spark, sinkDir)
        .orderBy(col("event_timestamp").desc, col("username"), col("title"))
        .limit(cfg.dbMaxEvents.toInt + 1)
      ManifestSink.replace(retained, sinkDir)
      ManifestSink.vacuum(spark, sinkDir)
    }
  }

  /** LAST-write-wins variant of [[appendWithRetentionManifest]]: instead
    * of skipping rows whose key is already committed (the reference's
    * IntegrityError-skip), each micro-batch UPSERTS — its newest row per
    * key replaces the committed row via [[graft.sinks.ManifestSink.merge]]
    * (the UNIQUE-constraint `ON CONFLICT UPDATE` analog of
    * pipeline.py:216; q21b pins the same last-wins semantics as a batch
    * query). Batch-internal duplicates resolve to the min raw_json per
    * key first (duplicate wiki events carry identical payloads, so any
    * deterministic tiebreak is content-preserving) — merge requires
    * key-unique updates. Replays stay idempotent: re-merging the same
    * rows rewrites them to the same content. */
  def upsertWithRetentionManifest(batch: DataFrame, sinkDir: String,
      cfg: GraftConfig): Unit = {
    import graft.sinks.ManifestSink
    require(cfg.dbMaxEvents <= Int.MaxValue,
      s"dbMaxEvents ${cfg.dbMaxEvents} exceeds the limit-based compaction " +
        "range; use time-partitioned retention (ParquetSink) instead")
    val spark = batch.sparkSession
    val unique = graft.ingest.WikiIngest.dedupFirstWins(
      batch, DedupKey, Seq("raw_json")) // key-unique survivor, see scaladoc
    ManifestSink.merge(unique, sinkDir, DedupKey)
    val n = ManifestSink.rowCount(spark, sinkDir)
      .getOrElse(ManifestSink.read(spark, sinkDir).count())
    if (WikiIngest.needsCleanup(n, cfg.dbMaxEvents,
        cfg.cleanupHysteresis)) {
      val retained = ManifestSink.read(spark, sinkDir)
        .orderBy(col("event_timestamp").desc, col("username"), col("title"))
        .limit(cfg.dbMaxEvents.toInt + 1)
      ManifestSink.replace(retained, sinkDir)
      ManifestSink.vacuum(spark, sinkDir)
    }
  }

  /** v1 raw-capture mode (main.py:6-37, "bronze layer"): store each raw
    * payload line unparsed into a 1-column table (K2), batched per
    * micro-batch (the K4 count-based commit becomes the trigger boundary;
    * `maxFilesPerTrigger` bounds batch size at the source). */
  def startRawCapture(spark: SparkSession, sourceDir: String, sinkDir: String,
      checkpointDir: String, maxFilesPerTrigger: Int = 10): StreamingQuery =
    spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(sourceDir)
      .filter(col("value").isNotNull && col("value") =!= "") // F1
      .select(col("value").as("message"))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .format("parquet")
      .option("path", sinkDir)
      .outputMode("append")
      .start()

  /** Start the full pipeline over a LIVE SSE endpoint — the reference's
    * `main()` assembly (pipeline.py:237-252): recover `since` from the
    * sink's newest event (pipeline.py:225-236, `MAX(event_timestamp)`),
    * O4-guard SINCE_OVERRIDE to an empty sink only (pipeline.py:230-233),
    * then stream `sse-http` (keep-alive, 5 s reconnect) → F1 message
    * filter → parse/transform/dedup → manifest-sink append with
    * retention. The capture file doubles as the raw bronze layer (K2). */
  def startLive(spark: SparkSession, url: String, capturePath: String,
      sinkDir: String, checkpointDir: String, cfg: GraftConfig = GraftConfig(),
      userAgent: String = null, backoffMs: Long = -1L,
      trigger: Option[Trigger] = null,
      watermarkDelay: String = "10 seconds",
      lateDir: String = null, lateDelayUs: Long = 10_000_000L,
      maintenance: graft.sinks.MaintenancePolicy = null): StreamingQuery = {
    // unset per-call knobs fall back to the config layer, like the
    // reference's main() forwarding config.user_agent etc. (main.py:241-248)
    val ua = Option(userAgent).getOrElse(cfg.userAgent)
    val backoff =
      if (backoffMs >= 0) backoffMs else cfg.reconnectBackoffSeconds * 1000L
    val trig = Option(trigger).getOrElse(Some(
      Trigger.ProcessingTime(s"${cfg.commitIntervalSeconds} seconds")))
    import graft.sinks.ManifestSink
    val lastTs: Option[String] =
      if (ManifestSink.version(spark, sinkDir) < 0) None
      else Option(ManifestSink.read(spark, sinkDir)
        .agg(date_format(max(col("event_timestamp")),
          "yyyy-MM-dd'T'HH:mm:ss'Z'").as("ts"))
        .head().getString(0))
    require(lastTs.isEmpty || cfg.sinceOverride.isEmpty,
      s"SINCE_OVERRIDE is set but sink $sinkDir is not empty")
    val since = lastTs.orElse(cfg.sinceOverride)
    val raw = spark.readStream.format("sse-http")
      .option("url", url)
      .option("capturePath", capturePath)
      .option("userAgent", ua)
      .option("backoffMs", backoff.toString)
      .options(since.map("since" -> _).toMap)
      .load()
      .filter(col("event") === "message").select(col("data").as("value"))
    // Late-aware mode (`lateDir` set): the stateful watermark dedup is
    // BYPASSED — Spark's watermark would silently drop exactly the rows
    // the dead-letter channel exists to land — and the full D1 contract
    // moves to the sink (batch-local dedup + cross-epoch anti-join in
    // [[appendLateAwareManifest]]). Default mode is unchanged.
    val out =
      if (lateDir == null) fromRawLines(raw, "value", watermarkDelay)
      else typedWithMetrics(raw, "value")
    val writer = out.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (lateDir == null) appendWithRetentionManifest(batch, sinkDir, cfg)
        else appendLateAwareManifest(batch, batchId, sinkDir, lateDir, cfg,
          lateDelayUs)
        // in-loop maintenance (pipeline.py:43-51's retention-inside-the-
        // cadence, lakehouse-shaped): every Nth epoch reads the plan —
        // one manifest read — and executes only what it flags. Runs
        // AFTER the epoch's fold, so the exactly-once marker it must
        // carry forward is already in the header it rebases over.
        graft.sinks.Maintenance.onEpoch(spark, sinkDir, batchId,
          maintenance)
        ()
      }
    trig.foreach(writer.trigger)
    writer.start()
  }

  /** [[appendWithRetentionManifest]] behind the late-data dead-letter
    * split ([[LateDataChannel.ingestVia]]): rows whose event time is
    * behind the main table's stored watermark (or null) land in
    * `lateDir` for triage/backfill; on-time rows go through the same
    * D1 dedup (batch-local first-wins + anti-join against committed
    * keys) and R1/F6 retention as the default path; the watermark
    * advances in the SAME atomic commit as the main append. Replay-safe:
    * both sides fold under the epoch marker, and the anti-join makes a
    * re-delivered row a no-op even across epochs.
    *
    * `catalogDir` non-null lifts the PAIR to atomic visibility: after
    * both tables' epoch commits land, one [[graft.sinks.Catalog]]
    * publish pins `main` and `late` together — a reader resolving both
    * through the catalog can never observe a torn epoch (late side
    * landed, main side not), which per-table exactly-once alone cannot
    * promise. A crash between the table commits and the publish leaves
    * the catalog one epoch behind — consistent, never torn — and the
    * replayed epoch's fold re-publishes the caught-up pins; unchanged
    * pins (empty or fully-replayed epochs) publish nothing, so catalog
    * versions track PROGRESS, not triggers. */
  def appendLateAwareManifest(batch: DataFrame, batchId: Long,
      sinkDir: String, lateDir: String, cfg: GraftConfig,
      delayUs: Long, catalogDir: String = null): Unit = {
    import graft.sinks.ManifestSink
    require(cfg.dbMaxEvents <= Int.MaxValue,
      s"dbMaxEvents ${cfg.dbMaxEvents} exceeds the limit-based compaction " +
        "range; use time-partitioned retention (ParquetSink) instead")
    LateDataChannel.ingestVia(batch, batchId, sinkDir, lateDir,
      "event_timestamp", delayUs) { (onTime, header) =>
      val spark = onTime.sparkSession
      val unique = WikiIngest.dedup(onTime) // batch-local D1
      val fresh =
        if (ManifestSink.version(spark, sinkDir) < 0) unique
        else unique.join(ManifestSink.read(spark, sinkDir)
          .select(DedupKey.map(col): _*), DedupKey, "left_anti")
      // even a fully-deduped batch commits: the watermark header must
      // still advance (monotonic merge makes replays harmless)
      ManifestSink.appendOnceWithHeader(fresh, sinkDir, batchId, header)
      val n = ManifestSink.rowCount(spark, sinkDir)
        .getOrElse(ManifestSink.read(spark, sinkDir).count())
      if (WikiIngest.needsCleanup(n, cfg.dbMaxEvents,
          cfg.cleanupHysteresis)) {
        val retained = ManifestSink.read(spark, sinkDir)
          .orderBy(col("event_timestamp").desc, col("username"), col("title"))
          .limit(cfg.dbMaxEvents.toInt + 1)
        ManifestSink.replace(retained, sinkDir)
        // catalog readers resolve main through the LAST published pin
        // (one epoch behind right now) — retention cleanup must not
        // reclaim what they can still reach
        ManifestSink.vacuum(spark, sinkDir, protectVersions =
          if (catalogDir == null) Nil
          else graft.sinks.Catalog.pinnedVersions(spark, catalogDir,
            sinkDir))
      }
    }
    if (catalogDir != null) {
      val spark = batch.sparkSession
      val pins = Seq("main" -> sinkDir, "late" -> lateDir).flatMap {
        case (n, d) =>
          val v = ManifestSink.version(spark, d)
          if (v >= 0) Some(n -> (d, v)) else None
      }.toMap
      // publish AFTER both table commits, and only on progress: a
      // replayed or empty epoch re-derives identical pins and stays
      // silent, so catalog versions form the exactly-once epoch ledger
      if (pins.nonEmpty &&
          graft.sinks.Catalog.pins(spark, catalogDir) != pins)
        graft.sinks.Catalog.publish(spark, catalogDir, pins)
    }
  }

  /** Start the full pipeline over a text-file source directory (the raw
    * capture surface, S4; [[startLive]] is the network-source variant). */
  def start(spark: SparkSession, sourceDir: String, sinkDir: String,
      checkpointDir: String, cfg: GraftConfig = GraftConfig(),
      trigger: Option[Trigger] = Some(Trigger.ProcessingTime("2 seconds")),
      watermarkDelay: String = "10 seconds"): StreamingQuery = {
    // O4 fresh-DB guard: SINCE_OVERRIDE only seeds an empty sink
    // (pipeline.py:230-233)
    if (cfg.sinceOverride.isDefined) {
      val fs = new Path(sinkDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      require(!fs.exists(new Path(sinkDir)),
        s"SINCE_OVERRIDE is set but sink $sinkDir is not empty")
    }
    val raw = spark.readStream.text(sourceDir)
    val out = fromRawLines(raw, "value", watermarkDelay)
    val writer = out.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        appendWithRetention(batch, sinkDir, cfg)
      }
    trigger.foreach(writer.trigger)
    writer.start()
  }

  /** [[start]] with upsert semantics on a manifest table: each
    * micro-batch MERGEs into the sink under the UNIQUE key (last write
    * wins) instead of skipping already-present keys — the streaming
    * entrypoint for [[upsertWithRetentionManifest]]. */
  def startUpsert(spark: SparkSession, sourceDir: String, sinkDir: String,
      checkpointDir: String, cfg: GraftConfig = GraftConfig(),
      trigger: Option[Trigger] = Some(Trigger.ProcessingTime("2 seconds")),
      watermarkDelay: String = "10 seconds"): StreamingQuery = {
    val raw = spark.readStream.text(sourceDir)
    val out = fromRawLines(raw, "value", watermarkDelay)
    val writer = out.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsertWithRetentionManifest(batch, sinkDir, cfg)
      }
    trigger.foreach(writer.trigger)
    writer.start()
  }

  /** [[start]] with the EXACTLY-ONCE manifest sink: each micro-batch
    * folds via [[appendOnceWithRetentionManifest]], keyed by the
    * epoch's batchId — a restarted query resuming from the checkpoint
    * replays its last uncommitted epoch and the sink skips the half of
    * it that already landed, from manifest metadata alone.
    *
    * `lateDir` non-null routes every epoch through the dead-letter
    * split ([[appendLateAwareManifest]] / [[LateDataChannel]]) — the
    * same marker-per-table crash-window contract [[startLive]] wires
    * for the network source, here on the file source (which is what
    * the crash-kill e2e drives: CrashKillSpec SIGKILLs this query
    * mid-epoch and restarts it from the checkpoint).
    * `maxFilesPerTrigger` > 0 caps files per epoch (epoch-sizing lever;
    * also what gives a deterministic epoch sequence under test). */
  def startExactlyOnce(spark: SparkSession, sourceDir: String,
      sinkDir: String, checkpointDir: String,
      cfg: GraftConfig = GraftConfig(),
      trigger: Option[Trigger] = Some(Trigger.ProcessingTime("2 seconds")),
      watermarkDelay: String = "10 seconds",
      lateDir: String = null,
      lateDelayUs: Long = 10000000L,
      maxFilesPerTrigger: Int = 0,
      catalogDir: String = null,
      maintenance: graft.sinks.MaintenancePolicy = null): StreamingQuery = {
    require(catalogDir == null || lateDir != null,
      "catalogDir atomicity is the late-aware pair's contract — " +
        "single-table mode is already atomic per commit")
    val reader = spark.readStream
    if (maxFilesPerTrigger > 0)
      reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
    val raw = reader.text(sourceDir)
    // Late-aware mode bypasses the stateful watermark dedup, same as
    // [[startLive]]: Spark's watermark would silently DROP exactly the
    // rows the dead-letter channel exists to land (CrashKillSpec caught
    // this live — stragglers vanished from both tables); the D1 dedup
    // contract moves wholly to the sink's batch-local + anti-join fold.
    val out =
      if (lateDir == null) fromRawLines(raw, "value", watermarkDelay)
      else typedWithMetrics(raw, "value")
    val writer = out.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (lateDir == null)
          appendOnceWithRetentionManifest(batch, batchId, sinkDir, cfg)
        else appendLateAwareManifest(batch, batchId, sinkDir, lateDir,
          cfg, lateDelayUs, catalogDir)
        // in-loop maintenance, same cadence contract as [[startLive]]:
        // the plan is one manifest read; the cure rebases over any
        // interleaved append and carries the epoch marker forward, so
        // replays stay no-ops across a maintenance commit
        graft.sinks.Maintenance.onEpoch(spark, sinkDir, batchId,
          maintenance)
        ()
      }
    trigger.foreach(writer.trigger)
    writer.start()
  }
}
