package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{GraftConfig, SparkSpec}

class WikiStreamSpec extends SparkSpec {
  import spark.implicits._

  private def fixtureLines: Seq[String] =
    scala.io.Source.fromFile(fixturePath("recentchange_fixture.jsonl"))
      .getLines().toSeq

  test("memory-stream pipeline yields the 3 fixture survivors") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[String]
    val out = WikiStream.fromRawLines(src.toDF())
    val q = out.writeStream.format("memory").queryName("wiki_mem")
      .outputMode("append").start()
    try {
      src.addData(fixtureLines: _*)
      q.processAllAvailable()
      val rows = spark.table("wiki_mem")
      assert(rows.count() === 3)
      assert(rows.select("username").as[String].collect().toSet ===
        Set("Alice", "Bob", "Dave"))
    } finally q.stop()
  }

  test("duplicate arriving in a later batch within the watermark is dropped") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[String]
    val q = WikiStream.fromRawLines(src.toDF(), watermarkDelay = "1 hour")
      .writeStream.format("memory").queryName("wiki_dup")
      .outputMode("append").start()
    try {
      src.addData(fixtureLines: _*)
      q.processAllAvailable()
      src.addData(fixtureLines.head) // replay of Alice's event, same key
      q.processAllAvailable()
      assert(spark.table("wiki_dup").count() === 3)
    } finally q.stop()
  }

  test("file-source end-to-end with checkpoint + foreachBatch sink") {
    val srcDir = Files.createTempDirectory("wiki_src").toString
    val sinkDir = Files.createTempDirectory("wiki_sink").toString + "/out"
    val ckpt = Files.createTempDirectory("wiki_ckpt").toString
    Files.write(java.nio.file.Paths.get(srcDir, "batch1.jsonl"),
      fixtureLines.mkString("\n").getBytes)
    val q = WikiStream.start(spark, srcDir, sinkDir, ckpt,
      GraftConfig(dbMaxEvents = 100), trigger = None)
    try q.processAllAvailable() finally q.stop()
    val sink = spark.read.parquet(sinkDir)
    assert(sink.count() === 3)
    assert(sink.columns.toSet.contains("length_diff_bytes"))
  }

  test("retention compacts the sink once hysteresis is exceeded") {
    val sinkDir = Files.createTempDirectory("wiki_ret").toString + "/out"
    val cfg = GraftConfig(dbMaxEvents = 50)
    // 120 distinct synthetic rows in wiki_events shape
    val rows = spark.range(0, 120).select(
      concat(lit("{\"n\":"), $"id", lit("}")).as("raw_json"),
      timestamp_seconds(lit(1700000000L) + $"id").as("event_timestamp"),
      concat(lit("T"), $"id").as("title"),
      lit("u").as("title_url"),
      lit(false).as("bot"),
      lit("user").as("username"),
      lit(0L).as("length_bytes_old"),
      $"id".as("length_bytes_new"),
      $"id".as("length_diff_bytes"))
    WikiStream.appendWithRetention(rows, sinkDir, cfg)
    val after = spark.read.parquet(sinkDir)
    // N+1 survivors — the same boundary as WikiIngest.retention and the
    // reference's DELETE (survivors satisfy id >= max - N)
    assert(after.count() === 51)
    // survivors are the newest by event_timestamp
    val minTs = after.agg(min("event_timestamp")).head().getTimestamp(0)
    assert(minTs.getTime / 1000 === 1700000000L + 69)
  }

  test("observed ingest metrics surface per micro-batch (A8)") {
    val srcDir = Files.createTempDirectory("wiki_obs").toString
    Files.write(java.nio.file.Paths.get(srcDir, "batch1.jsonl"),
      fixtureLines.mkString("\n").getBytes)
    val raw = spark.readStream.text(srcDir)
    val q = WikiStream.fromRawLines(raw)
      .writeStream.format("memory").queryName("wiki_obs")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val observed = q.recentProgress.flatMap(p =>
        Option(p.observedMetrics.get("graft_ingest")))
      assert(observed.nonEmpty)
      // fixture: 4 typed rows pass the filters (pre-dedup)
      assert(observed.map(_.getAs[Long]("rows_typed")).sum === 4L)
      assert(observed.map(_.getAs[Long]("bytes_changed")).sum === 800L)
    } finally q.stop()
  }

  test("replayed batch is idempotent at the sink (D1 UNIQUE semantics)") {
    val sinkDir = Files.createTempDirectory("wiki_idem").toString + "/out"
    val cfg = GraftConfig(dbMaxEvents = 1000)
    val rows = spark.range(0, 20).select(
      concat(lit("{\"n\":"), $"id", lit("}")).as("raw_json"),
      timestamp_seconds(lit(1700000000L) + $"id").as("event_timestamp"),
      concat(lit("T"), $"id").as("title"),
      lit("u").as("title_url"),
      lit(false).as("bot"),
      lit("user").as("username"),
      lit(0L).as("length_bytes_old"),
      $"id".as("length_bytes_new"),
      $"id".as("length_diff_bytes"))
    WikiStream.appendWithRetention(rows, sinkDir, cfg)
    // foreachBatch retry: the same batch arrives again, plus 5 new rows
    val replayPlusNew = spark.range(10, 25).select(
      concat(lit("{\"n\":"), $"id", lit("}")).as("raw_json"),
      timestamp_seconds(lit(1700000000L) + $"id").as("event_timestamp"),
      concat(lit("T"), $"id").as("title"),
      lit("u").as("title_url"),
      lit(false).as("bot"),
      lit("user").as("username"),
      lit(0L).as("length_bytes_old"),
      $"id".as("length_bytes_new"),
      $"id".as("length_diff_bytes"))
    WikiStream.appendWithRetention(replayPlusNew, sinkDir, cfg)
    val after = spark.read.parquet(sinkDir)
    assert(after.count() === 25) // overlap absorbed, new rows kept
    assert(after.select("title").distinct().count() === 25)
  }

  test("manifest-sink variant: same retention + idempotence semantics") {
    import graft.sinks.ManifestSink
    val sinkDir = Files.createTempDirectory("wiki_msink").toString + "/t"
    val cfg = GraftConfig(dbMaxEvents = 50)
    def rows(from: Long, to: Long) = spark.range(from, to).select(
      concat(lit("{\"n\":"), $"id", lit("}")).as("raw_json"),
      timestamp_seconds(lit(1700000000L) + $"id").as("event_timestamp"),
      concat(lit("T"), $"id").as("title"),
      lit("u").as("title_url"),
      lit(false).as("bot"),
      lit("user").as("username"),
      lit(0L).as("length_bytes_old"),
      $"id".as("length_bytes_new"),
      $"id".as("length_diff_bytes"))
    WikiStream.appendWithRetentionManifest(rows(0, 40), sinkDir, cfg)
    // replay overlap (30..40) + new rows → idempotent, then compaction
    WikiStream.appendWithRetentionManifest(rows(30, 120), sinkDir, cfg)
    val after = ManifestSink.read(spark, sinkDir)
    assert(after.count() === 51) // N+1 boundary, same as the flat sink
    assert(after.select("title").distinct().count() === 51)
    val minTs = after.agg(min("event_timestamp")).head().getTimestamp(0)
    assert(minTs.getTime / 1000 === 1700000000L + 69)
  }

  test("exactly-once manifest variant: replayed epoch skipped in O(1)") {
    import graft.sinks.ManifestSink
    val sinkDir = Files.createTempDirectory("wiki_eo").toString + "/t"
    val cfg = GraftConfig(dbMaxEvents = 50)
    def rows(from: Long, to: Long) = spark.range(from, to).select(
      concat(lit("{\"n\":"), $"id", lit("}")).as("raw_json"),
      timestamp_seconds(lit(1700000000L) + $"id").as("event_timestamp"),
      concat(lit("T"), $"id").as("title"),
      lit("u").as("title_url"),
      lit(false).as("bot"),
      lit("user").as("username"),
      lit(0L).as("length_bytes_old"),
      $"id".as("length_bytes_new"),
      $"id".as("length_diff_bytes"))
    WikiStream.appendOnceWithRetentionManifest(rows(0, 40), 0L, sinkDir, cfg)
    // foreachBatch retry: the SAME epoch replays — skipped by the header
    // marker, not by reading the table
    WikiStream.appendOnceWithRetentionManifest(rows(0, 40), 0L, sinkDir, cfg)
    assert(ManifestSink.read(spark, sinkDir).count() === 40)
    // the next epoch trips retention; the marker survives the replace
    WikiStream.appendOnceWithRetentionManifest(rows(40, 120), 1L, sinkDir, cfg)
    val after = ManifestSink.read(spark, sinkDir)
    assert(after.count() === 51)
    assert(ManifestSink.lastBatchId(spark, sinkDir) === 1L)
    // replaying epoch 1 AFTER the retention rewrite is still absorbed
    WikiStream.appendOnceWithRetentionManifest(rows(40, 120), 1L, sinkDir, cfg)
    assert(ManifestSink.read(spark, sinkDir).count() === 51)
  }

  test("upsert manifest variant: last write wins under the UNIQUE key") {
    import graft.sinks.ManifestSink
    val sinkDir = Files.createTempDirectory("wiki_upsert").toString + "/t"
    val cfg = GraftConfig(dbMaxEvents = 1000)
    def rows(from: Long, to: Long, gen: Long) = spark.range(from, to).select(
      concat(lit("{\"n\":"), $"id", lit(",\"gen\":"), lit(gen), lit("}"))
        .as("raw_json"),
      timestamp_seconds(lit(1700000000L) + $"id").as("event_timestamp"),
      concat(lit("T"), $"id").as("title"),
      lit("u").as("title_url"),
      lit(false).as("bot"),
      lit("user").as("username"),
      lit(0L).as("length_bytes_old"),
      ($"id" + lit(gen * 1000)).as("length_bytes_new"),
      $"id".as("length_diff_bytes"))
    WikiStream.upsertWithRetentionManifest(rows(0, 20, gen = 1), sinkDir, cfg)
    // overlapping keys 10..20 arrive again with CHANGED content: unlike
    // the append variant (first-wins skip), the upsert must replace them
    WikiStream.upsertWithRetentionManifest(rows(10, 25, gen = 2), sinkDir, cfg)
    val after = ManifestSink.read(spark, sinkDir)
    assert(after.count() === 25)
    val byTitle = after.select($"title", $"length_bytes_new").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTitle("T5") === 1005L)  // untouched first-gen row
    assert(byTitle("T15") === 2015L) // overlapped key: second write won
    assert(byTitle("T24") === 2024L) // pure insert
  }

  test("streaming upsert e2e: replayed stream file merges, not duplicates") {
    import graft.sinks.ManifestSink
    val srcDir = Files.createTempDirectory("wiki_upsrc").toString
    val sinkDir = Files.createTempDirectory("wiki_upsink").toString + "/t"
    val ckpt = Files.createTempDirectory("wiki_upckpt").toString
    Files.write(java.nio.file.Paths.get(srcDir, "b1.jsonl"),
      fixtureLines.mkString("\n").getBytes)
    val q = WikiStream.startUpsert(spark, srcDir, sinkDir, ckpt,
      GraftConfig(dbMaxEvents = 100), trigger = None)
    try q.processAllAvailable() finally q.stop()
    assert(ManifestSink.read(spark, sinkDir).count() === 3)
    // a second query over the same data with a FRESH checkpoint re-delivers
    // every row (at-least-once replay): the merge path must absorb it
    val ckpt2 = Files.createTempDirectory("wiki_upckpt2").toString
    val q2 = WikiStream.startUpsert(spark, srcDir, sinkDir, ckpt2,
      GraftConfig(dbMaxEvents = 100), trigger = None)
    try q2.processAllAvailable() finally q2.stop()
    val after = ManifestSink.read(spark, sinkDir)
    assert(after.count() === 3)
    assert(after.select("title").distinct().count() === 3)
  }

  test("exactly-once streaming e2e: checkpoint replay lands no duplicates") {
    import graft.sinks.ManifestSink
    val srcDir = Files.createTempDirectory("wiki_eosrc").toString
    val sinkDir = Files.createTempDirectory("wiki_eosink").toString + "/t"
    val ckpt = Files.createTempDirectory("wiki_eockpt").toString
    Files.write(java.nio.file.Paths.get(srcDir, "b1.jsonl"),
      fixtureLines.mkString("\n").getBytes)
    val q = WikiStream.startExactlyOnce(spark, srcDir, sinkDir, ckpt,
      GraftConfig(dbMaxEvents = 100), trigger = None)
    try q.processAllAvailable() finally q.stop()
    assert(ManifestSink.read(spark, sinkDir).count() === 3)
    assert(ManifestSink.lastBatchId(spark, sinkDir) === 0L)
    // crash-replay: a FRESH checkpoint re-delivers epoch 0 in full — the
    // header marker absorbs it without reading the table
    val ckpt2 = Files.createTempDirectory("wiki_eockpt2").toString
    val q2 = WikiStream.startExactlyOnce(spark, srcDir, sinkDir, ckpt2,
      GraftConfig(dbMaxEvents = 100), trigger = None)
    try q2.processAllAvailable() finally q2.stop()
    assert(ManifestSink.read(spark, sinkDir).count() === 3)
    // a resumed query with NEW data advances the epoch and folds it
    Files.write(java.nio.file.Paths.get(srcDir, "b2.jsonl"),
      ("""{"meta":{"dt":"2026-01-08T22:40:00Z"},"type":"edit",""" +
        """"title":"Second Epoch","title_url":"u","user":"Eve",""" +
        """"bot":false,"length":{"old":1,"new":2},"wiki":"enwiki"}""")
        .getBytes)
    val q3 = WikiStream.startExactlyOnce(spark, srcDir, sinkDir, ckpt,
      GraftConfig(dbMaxEvents = 100), trigger = None)
    try q3.processAllAvailable() finally q3.stop()
    val after = ManifestSink.read(spark, sinkDir)
    assert(after.count() === 4)
    assert(after.select("title").distinct().count() === 4)
    // the resumed checkpoint assigned the new epoch a HIGHER batch id
    assert(ManifestSink.lastBatchId(spark, sinkDir) >= 1L)
  }

  test("v1 raw capture stores unparsed lines in a 1-column table (K2/K4)") {
    val srcDir = Files.createTempDirectory("raw_src").toString
    val sinkDir = Files.createTempDirectory("raw_sink").toString + "/out"
    val ckpt = Files.createTempDirectory("raw_ckpt").toString
    Files.write(java.nio.file.Paths.get(srcDir, "b1.jsonl"),
      (fixtureLines :+ "").mkString("\n").getBytes)
    val q = WikiStream.startRawCapture(spark, srcDir, sinkDir, ckpt)
    try {
      q.processAllAvailable()
      assert(q.lastProgress.numInputRows > 0) // A8 rows-added metric surface
    } finally q.stop()
    val sink = spark.read.parquet(sinkDir)
    assert(sink.columns.toSeq === Seq("message"))
    assert(sink.count() === 7) // all non-empty lines, even malformed JSON
  }

  test("SINCE_OVERRIDE guard refuses a non-empty sink (O4)") {
    val sinkDir = Files.createTempDirectory("wiki_guard").toString
    val cfg = GraftConfig(sinceOverride = Some("2026-01-01T00:00:00Z"))
    intercept[IllegalArgumentException] {
      WikiStream.start(spark, sinkDir, sinkDir, sinkDir + "_ckpt", cfg)
    }
  }

  test("config precedence: env overrides defaults (O3)") {
    val cfg = GraftConfig.load(Map(
      "ETL_USER_AGENT" -> "TestAgent",
      "ETL_DB_MAX_EVENTS" -> "250000",
      "ETL_CLEANUP_HYSTERESIS" -> "1.25",
      "ETL_RECONNECT_BACKOFF_SECONDS" -> "9"))
    assert(cfg.userAgent === "TestAgent")
    assert(cfg.dbMaxEvents === 250000L)
    assert(cfg.cleanupHysteresis === 1.25)
    assert(cfg.reconnectBackoffSeconds === 9)
    assert(cfg.streamUrl === GraftConfig().streamUrl) // default kept
    assert(cfg.commitIntervalSeconds === 2)
  }

  test("yaml layer sits between env and defaults (O3 precedence)") {
    val yml = java.nio.file.Files.createTempFile("graft", ".yaml")
    java.nio.file.Files.write(yml,
      """# reference-shaped flat config
        |stream_url: "https://example.org/stream"
        |db_max_events: 250000   # comment after value
        |user_agent: YamlAgent
        |""".stripMargin.getBytes)
    val cfg = GraftConfig.loadWithYaml(yml.toString,
      Map("ETL_USER_AGENT" -> "EnvAgent"))
    assert(cfg.userAgent === "EnvAgent") // env beats yaml
    assert(cfg.streamUrl === "https://example.org/stream") // yaml beats default
    assert(cfg.dbMaxEvents === 250000L)
    assert(cfg.commitIntervalSeconds === 2) // default kept
    // missing file degrades to env > default
    val cfg2 = GraftConfig.loadWithYaml("/nonexistent.yaml", Map.empty)
    assert(cfg2 === GraftConfig())
  }
}
