package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val distinctA = "the quick brown fox jumps over the lazy dog today"
  private val distinctB = "spark shuffles partitions across executors with hash keys"
  private val distinctC = "completely different words about databases and storage engines"

  test("band hashes: identical texts collide on all bands, disjoint on none") {
    val df = Seq((1L, distinctA), (2L, distinctA), (3L, distinctB))
      .toDF("doc_id", "text")
      .select($"doc_id", StreamingDedup.bandHashes($"text").as("bb"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Long](1).zipWithIndex.map(_.swap).toSet).toMap
    assert(df(1L) === df(2L))            // same text → same 4 buckets
    assert(df(1L).intersect(df(3L)).isEmpty) // disjoint tokens → none shared
    assert(df(1L).map(_._1) === Set(0, 1, 2, 3))
  }

  test("band hashes are token-SET semantics, order/multiplicity invariant") {
    val df = Seq((1L, "alpha beta gamma delta"),
        (2L, "delta gamma beta alpha alpha"))
      .toDF("doc_id", "text")
      .select($"doc_id", StreamingDedup.bandHashes($"text").as("bb"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(df(1L) === df(2L))
  }

  test("codegen kernel is identical to the interpreted higher-order form") {
    val docs = graft.sources.Tables(spark, sf, "documents")
      .select($"doc_id", $"text")
    val diff = docs.select(
      StreamingDedup.bandHashes($"text").as("k"),
      org.apache.spark.sql.functions.transform(
        StreamingDedup.bandBucketsHof($"text"),
        bb => bb.getField("bucket")).as("h"))
      .filter(org.apache.spark.sql.functions.not($"k" <=> $"h")).count()
    assert(diff === 0L)
  }

  test("normalization on-ramp routing parity: streaming normalize=true " +
      "matches the batch rule over normalized text; raw arm does not " +
      "collapse the variants") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextNorm
    // case/diacritic variant corpus (q219's fixture shape): ids increase
    // in arrival order so the batch min-id rule and the sequential
    // stream claim buckets identically
    val accent = (t: String) => t.replace("a", "á").replace("e", "é")
    val docs = Seq(
      (1L, distinctA), (2L, distinctA.toUpperCase), (3L, accent(distinctA)),
      (4L, distinctB), (5L, accent(distinctB).toUpperCase),
      (6L, distinctC))
    // batch arm: q81's band-bucket-first admission over NORMALIZED text
    val wB = org.apache.spark.sql.expressions.Window
      .partitionBy($"band", $"bucket")
    val batchAdmit = docs.toDF("doc_id", "text")
      .select($"doc_id",
        StreamingDedup.bandHashes(TextNorm.normalize($"text")).as("bb"))
      .select($"doc_id", posexplode($"bb").as(Seq("band", "bucket")))
      .withColumn("first_doc", min($"doc_id").over(wB))
      .groupBy($"doc_id")
      .agg(min($"doc_id" === $"first_doc").as("admit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(batchAdmit === Map(1L -> true, 2L -> false, 3L -> false,
      4L -> true, 5L -> false, 6L -> true))

    // streaming arm, one doc per micro-batch, normalize=true
    def streamAdmit(normalize: Boolean): Map[Long, Boolean] = {
      implicit val sqlCtx = spark.sqlContext
      val src = MemoryStream[(Long, String)]
      val verdicts = StreamingDedup.bandVerdicts(
        src.toDF().toDF("doc_id", "text"), normalize = normalize)
      val admitted = mutable.Map[Long, Boolean]()
      val q = verdicts.toDF().writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          StreamingDedup.admissions(batch).collect().foreach(r =>
            admitted(r.getLong(0)) = r.getBoolean(1))
        }.start()
      try {
        docs.foreach { d => src.addData(d); q.processAllAvailable() }
      } finally q.stop()
      admitted.toMap
    }
    assert(streamAdmit(normalize = true) === batchAdmit,
      "streaming and batch arms must route identically")
    // the raw arm must NOT collapse case/diacritic variants — their
    // token sets are disjoint without normalization
    assert(streamAdmit(normalize = false) ===
      Map(1L -> true, 2L -> true, 3L -> true, 4L -> true, 5L -> true,
        6L -> true))
  }

  test("streaming admission: duplicates rejected across micro-batches, state persists") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    val verdicts = StreamingDedup.bandVerdicts(
      src.toDF().toDF("doc_id", "text"))
    val admitted = mutable.Map[Long, (Boolean, Option[Long])]()
    val q = verdicts.toDF().writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamingDedup.admissions(batch).collect().foreach { r =>
          admitted(r.getLong(0)) =
            (r.getBoolean(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))
        }
      }
      .start()
    try {
      // batch 1: two distinct docs — both admitted
      src.addData((1L, distinctA), (2L, distinctB))
      q.processAllAvailable()
      assert(admitted(1L) === ((true, None)))
      assert(admitted(2L) === ((true, None)))
      // batch 2: doc 3 re-delivers doc 1's text → all four bands collide
      // with state from the PREVIOUS batch; doc 4 is new — admitted
      src.addData((3L, distinctA), (4L, distinctC))
      q.processAllAvailable()
      assert(admitted(3L) === ((false, Some(1L))))
      assert(admitted(4L) === ((true, None)))
      // batch 3: near-dup of doc 1 (one token changed out of ten) must
      // collide on at least one band (most signature rows are unchanged);
      // and a re-delivery of doc 4's exact text is rejected against it
      src.addData((5L, distinctA.replace("today", "tonight")),
        (6L, distinctC))
      q.processAllAvailable()
      assert(admitted(5L)._1 === false)
      assert(admitted(5L)._2 === Some(1L))
      assert(admitted(6L) === ((false, Some(4L))))
    } finally q.stop()
  }

  test("transformWithState registry matches flatMapGroupsWithState semantics") {
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val src = MemoryStream[(Long, String)]
      val verdicts = StreamingDedup.bandVerdictsTws(
        src.toDF().toDF("doc_id", "text"))
      val admitted = mutable.Map[Long, (Boolean, Option[Long])]()
      val q = verdicts.toDF().writeStream
        .outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          StreamingDedup.admissions(batch).collect().foreach { r =>
            admitted(r.getLong(0)) =
              (r.getBoolean(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))
          }
        }
        .start()
      try {
        src.addData((1L, distinctA), (2L, distinctB))
        q.processAllAvailable()
        assert(admitted(1L) === ((true, None)))
        assert(admitted(2L) === ((true, None)))
        // cross-batch state + exact re-delivery, same as the fMGWS test
        src.addData((3L, distinctA), (4L, distinctC))
        q.processAllAvailable()
        assert(admitted(3L) === ((false, Some(1L))))
        assert(admitted(4L) === ((true, None)))
      } finally q.stop()
    } finally {
      prior match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("state size equals live buckets, measured from stateOperators") {
    // turns the bounded-state CLAIM ("one long per live bucket") into a
    // measurement: after every micro-batch, the state store's row count
    // must equal the number of distinct (band, bucket) pairs delivered so
    // far — and must NOT scale with the number of documents
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    val verdicts = StreamingDedup.bandVerdicts(
      src.toDF().toDF("doc_id", "text"))
    val q = verdicts.toDF().writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.count(): Unit // consume: state commits require execution
      }
      .start()
    def stateRows: Long = q.lastProgress.stateOperators(0).numRowsTotal
    def liveBuckets(texts: Seq[String]): Long =
      texts.toDF("text")
        .select(org.apache.spark.sql.functions.posexplode(
          StreamingDedup.bandHashes($"text")))
        .distinct().count()
    try {
      src.addData((1L, distinctA), (2L, distinctB))
      q.processAllAvailable()
      assert(stateRows === liveBuckets(Seq(distinctA, distinctB)))
      // 20 exact re-deliveries of doc 1's text: zero state growth
      src.addData((10L to 29L).map(i => (i, distinctA)): _*)
      q.processAllAvailable()
      assert(stateRows === liveBuckets(Seq(distinctA, distinctB)))
      // one genuinely new document: growth = its unclaimed buckets only
      src.addData((30L, distinctC))
      q.processAllAvailable()
      assert(stateRows ===
        liveBuckets(Seq(distinctA, distinctB, distinctC)))
    } finally q.stop()
  }

  test("TTL expires idle buckets: state shrinks, not just grows") {
    implicit val sqlCtx = spark.sqlContext
    // processing-time-timeout queries run EMPTY micro-batches to fire
    // expirations; those batches can skip partitions under foreachBatch,
    // which deadlocks Spark 4.1's store-commit tracking — turn the
    // validation off for this query (it exists to catch partial
    // foreachBatch consumption, which b.count() below rules out)
    val cvKey = "spark.sql.streaming.stateStore.commitValidation.enabled"
    val cvPrior = spark.conf.getOption(cvKey)
    spark.conf.set(cvKey, "false")
    val src = MemoryStream[(Long, String)]
    val verdicts = StreamingDedup.bandVerdicts(
      src.toDF().toDF("doc_id", "text"), stateTtl = Some("1 second"))
    // NOTE: with ProcessingTimeTimeout the engine re-triggers batches on
    // its own to fire expirations — shouldRunAnotherBatch is ALWAYS true
    // for this timeout mode, so (a) the query must be PACED by an explicit
    // trigger or it busy-loops empty micro-batches, and (b)
    // processAllAvailable NEVER returns (noNewData is never set); every
    // wait below polls lastProgress with a deadline instead
    val q = verdicts.toDF().writeStream.outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("500 milliseconds"))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.count(): Unit // consume: state commits require execution
      }
      .start()
    def stateRows: Long =
      Option(q.lastProgress).map(_.stateOperators(0).numRowsTotal)
        .getOrElse(-1L)
    def awaitStateRows(expect: Long): Unit = {
      val deadline = System.currentTimeMillis + 60000
      while (stateRows != expect && System.currentTimeMillis < deadline)
        Thread.sleep(250)
    }
    def buckets(texts: String*): Long =
      texts.toDF("text")
        .select(org.apache.spark.sql.functions.posexplode(
          StreamingDedup.bandHashes($"text")))
        .distinct().count()
    try {
      src.addData((1L, distinctA), (2L, distinctB))
      val abBuckets = buckets(distinctA, distinctB)
      awaitStateRows(abBuckets)
      val before = stateRows
      assert(before === abBuckets)
      Thread.sleep(1500) // let the processing-time TTL lapse
      // subsequent paced batches fire the timeouts and claim C's buckets:
      // only distinctC's buckets survive
      src.addData((3L, distinctC))
      awaitStateRows(buckets(distinctC))
      assert(stateRows === buckets(distinctC),
        s"expected TTL to shrink state to ${buckets(distinctC)} rows, " +
          s"got $stateRows (was $before)")
    } finally {
      q.stop()
      cvPrior match {
        case Some(v) => spark.conf.set(cvKey, v)
        case None => spark.conf.unset(cvKey)
      }
    }
  }

  test("within-batch contention: smallest doc_id claims the bucket") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    val verdicts = StreamingDedup.bandVerdicts(
      src.toDF().toDF("doc_id", "text"))
    val out = mutable.ArrayBuffer[Row]()
    val q = verdicts.toDF().writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        out ++= StreamingDedup.admissions(batch).collect(): Unit
      }.start()
    try {
      src.addData((9L, distinctA), (7L, distinctA))
      q.processAllAvailable()
      val byId = out.map(r => r.getLong(0) ->
        (r.getBoolean(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
      assert(byId(7L) === ((true, None)))
      assert(byId(9L) === ((false, Some(7L))))
    } finally q.stop()
  }

  test("streaming IMAGE admission: dHash bands through the shared registry") {
    import graft.operators.MultimodalOps
    import graft.operators.MultimodalOps.Media
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, Array[Byte])]
    val verdicts = StreamingDedup.imageBandVerdicts(
      src.toDF().toDF("doc_id", "payload").as[Media])
    val admitted = mutable.Map[Long, (Boolean, Option[Long])]()
    val q = verdicts.toDF().writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamingDedup.admissions(batch).collect().foreach { r =>
          admitted(r.getLong(0)) =
            (r.getBoolean(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))
        }
      }
      .start()
    try {
      // batch 1: two distinct images — both admitted
      src.addData(
        (1L, MultimodalOps.syntheticFramePng(11L, 0)),
        (2L, MultimodalOps.syntheticFramePng(5L, 0)))
      q.processAllAvailable()
      assert(admitted(1L) === ((true, None)))
      assert(admitted(2L) === ((true, None)))
      // batch 2: doc 3 is pixel-identical to doc 1 → all 4 bands collide
      // with the PREVIOUS batch's state; doc 4 is doc 1's brightness
      // variant — chosen so its dHash shares exactly one 16-bit band with
      // doc 1's (the near-dup-caught-through-one-band case)
      src.addData(
        (3L, MultimodalOps.syntheticFramePng(11L, 0)),
        (4L, MultimodalOps.syntheticFramePng(11L, 1)))
      q.processAllAvailable()
      assert(admitted(3L) === ((false, Some(1L))))
      assert(admitted(4L) === ((false, Some(1L))))
      // batch 3: an undecodable payload claims nothing and emits no
      // verdict (per-row skip, streaming edition); a fresh image admits
      src.addData(
        (5L, Array[Byte](1, 2, 3)),
        (6L, MultimodalOps.syntheticFramePng(3L, 0)))
      q.processAllAvailable()
      assert(!admitted.contains(5L))
      assert(admitted(6L) === ((true, None)))
    } finally q.stop()
  }

  test("streaming AUDIO admission: fingerprint bands through the shared registry") {
    import graft.operators.AudioOps
    import graft.operators.MultimodalOps.Media
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, Array[Byte])]
    val verdicts = StreamingDedup.audioBandVerdicts(
      src.toDF().toDF("doc_id", "payload").as[Media])
    val admitted = mutable.Map[Long, (Boolean, Option[Long])]()
    val q = verdicts.toDF().writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamingDedup.admissions(batch).collect().foreach { r =>
          admitted(r.getLong(0)) =
            (r.getBoolean(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))
        }
      }
      .start()
    try {
      // batch 1: two distinct clips (bases 10 and 5 share no fingerprint
      // band) — both admitted
      src.addData(
        (1L, AudioOps.syntheticWavVariant(10L, 0)),
        (2L, AudioOps.syntheticWavVariant(5L, 0)))
      q.processAllAvailable()
      assert(admitted(1L) === ((true, None)))
      assert(admitted(2L) === ((true, None)))
      // batch 2: doc 3 is sample-identical to doc 1 → all 4 bands collide
      // with the PREVIOUS batch's state; doc 4 is base 10's click-shifted
      // variant — its fingerprint differs from doc 1's by Hamming 2 and
      // shares exactly 2 of the 4 bands (the near-dup-caught-through-a-
      // shared-band case, cross-batch)
      src.addData(
        (3L, AudioOps.syntheticWavVariant(10L, 0)),
        (4L, AudioOps.syntheticWavVariant(10L, 1)))
      q.processAllAvailable()
      assert(admitted(3L) === ((false, Some(1L))))
      assert(admitted(4L) === ((false, Some(1L))))
      // batch 3: an unparseable payload claims nothing and emits no
      // verdict (per-row skip); a fresh clip (base 3, disjoint bands)
      // admits
      src.addData(
        (5L, Array[Byte](1, 2, 3)),
        (6L, AudioOps.syntheticWavVariant(3L, 0)))
      q.processAllAvailable()
      assert(!admitted.contains(5L))
      assert(admitted(6L) === ((true, None)))
    } finally q.stop()
  }

  test("streaming VIDEO admission: frame-aligned bands through the " +
      "shared registry") {
    import graft.operators.MultimodalOps
    implicit val sqlCtx = spark.sqlContext
    // one row per sampled frame: (doc_id, frame_idx, payload)
    val src = MemoryStream[(Long, Int, Array[Byte])]
    val verdicts = StreamingDedup.videoBandVerdicts(
      src.toDF().toDF("doc_id", "frame_idx", "payload")
        .as[MultimodalOps.Frame])
    val admitted = mutable.Map[Long, (Boolean, Option[Long])]()
    val q = verdicts.toDF().writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamingDedup.admissions(batch).collect().foreach { r =>
          admitted(r.getLong(0)) =
            (r.getBoolean(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))
        }
      }
      .start()
    try {
      // batch 1: video 1 = frames {0: pattern 11, 2: pattern 12} admits
      src.addData(
        (1L, 0, MultimodalOps.syntheticFramePng(11L, 0)),
        (1L, 2, MultimodalOps.syntheticFramePng(12L, 0)))
      q.processAllAvailable()
      assert(admitted(1L) === ((true, None)))
      // batch 2: video 2 re-cuts video 1's frames at SHIFTED indices
      // {2, 4} — same pixels, different alignment → no aligned bucket
      // collides → admits (bag-of-frames would wrongly reject here)
      src.addData(
        (2L, 2, MultimodalOps.syntheticFramePng(11L, 0)),
        (2L, 4, MultimodalOps.syntheticFramePng(12L, 0)))
      q.processAllAvailable()
      assert(admitted(2L) === ((true, None)))
      // batch 3: video 3 aligns with video 1 — frame 0 is pattern 11's
      // brightness variant (shares a band, the image-spec fixture),
      // frame 2 pixel-identical → rejected against batch-1 state
      src.addData(
        (3L, 0, MultimodalOps.syntheticFramePng(11L, 1)),
        (3L, 2, MultimodalOps.syntheticFramePng(12L, 0)))
      q.processAllAvailable()
      assert(admitted(3L) === ((false, Some(1L))))
      // batch 4: a video whose only frame is undecodable claims nothing
      // and emits no verdict; a fresh aligned video admits
      src.addData(
        (5L, 0, Array[Byte](9, 9, 9)),
        (6L, 0, MultimodalOps.syntheticFramePng(3L, 0)))
      q.processAllAvailable()
      assert(!admitted.contains(5L))
      assert(admitted(6L) === ((true, None)))
    } finally q.stop()
  }
}
