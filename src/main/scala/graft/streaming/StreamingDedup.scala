package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.PortableHash

/** Streaming near-duplicate admission — the MinHash-LSH dedup family
  * (DedupOps, batch q36/q60) at INGEST time: each arriving document is
  * admitted only if none of its LSH band buckets has been claimed by an
  * earlier document. This is the training-data shape where the corpus is
  * an unbounded stream and re-crawls/mirrors must be dropped before they
  * reach storage, not compacted away afterwards.
  *
  * Pipeline:
  * {{{
  * docs.select(doc_id, explode(bandBuckets(text)))   // row-local, no agg
  *   .groupByKey((band, bucket))
  *   .flatMapGroupsWithState(...)                    // 1 long per bucket
  *   → per-(doc, band) verdicts (append stream)
  *   → admissions(batch) in foreachBatch             // stateless reduce
  * }}}
  *
  * Scale shape: the only shuffle is the groupByKey on (band, bucket) —
  * the same key the batch pipeline equi-joins on — and state is ONE long
  * per live bucket, expiring after `stateTtl` idle. Bounded state is the
  * contract: like `dropDuplicatesWithinWatermark`, the operator dedups
  * within its retention window and leaves anything older to the sink-level
  * UNIQUE anti-join (WikiStream.appendWithRetention). A rejected document
  * still holds the buckets it was first to claim, so later documents
  * near-BOTH a survivor and a reject are caught through either — the same
  * candidate-graph transitivity the batch LSH join has.
  */
object StreamingDedup {

  /** Per-(band, bucket) verdict for one document (public: Catalyst codegen
    * instantiates it). `prior_doc_id` is the bucket's first claimant —
    * equal to `doc_id` when this document claimed it. */
  final case class BandVerdict(doc_id: Long, band: Int, bucket: Long,
      first_in_bucket: Boolean, prior_doc_id: Long)

  /** First-writer registration for one LSH bucket (public for codegen). */
  final case class BucketReg(first_doc_id: Long)

  /** Row-local MinHash band hashes as `array<long>` (band index =
    * position): distinct tokens are hashed ONCE (PortableHash 48-bit
    * sha256 slice), each of `numHashes` affine perms keeps a running min,
    * and each band folds its signature rows seeded by the band index —
    * producing the same band hashes as the batch pipeline's
    * explode+groupBy signatures (a min over the same set under the same
    * perms), but with NO aggregation, which is what makes the signature
    * step legal in an append-mode stream.
    *
    * Backed by the codegen'd [[graft.functions.MinhashBands]] kernel —
    * ONE tight loop per row; consume with `posexplode` (pos = band) so
    * the kernel is evaluated once. [[bandBucketsHof]] is the interpreted
    * reference the spec holds it equal to. */
  def bandHashes(text: Column, numHashes: Int = 16, bands: Int = 4): Column =
    graft.functions.MinhashBands.bands(split(text, " "), numHashes, bands)

  /** Interpreted higher-order reference implementation of [[bandHashes]]
    * (as `array<struct<band,bucket>>`) — kept as the equivalence oracle
    * for the codegen kernel (StreamingDedupSpec asserts equality over
    * real documents). */
  def bandBucketsHof(text: Column, numHashes: Int = 16,
      bands: Int = 4): Column = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands
    val toksH = transform(array_distinct(split(text, " ")),
      t => PortableHash.tokenHashP(t))
    val sigs = (0 until numHashes).map(i =>
      array_min(transform(toksH, h => PortableHash.perm(i, h))))
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        PortableHash.fold(b.toLong, sigs.slice(b * rows, (b + 1) * rows))
          .as("bucket"))
    }: _*)
  }

  /** Streaming verdicts: one row per (document, band), first-writer-wins
    * per bucket across micro-batches. Within a batch the smallest doc_id
    * claims contested buckets (replays reprocess whole batches, so the
    * winner is replay-stable). `stateTtl` (e.g. "30 minutes") expires idle
    * buckets via processing-time timeout; None keeps state forever (tests,
    * bounded corpora). */
  def bandVerdicts(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", numHashes: Int = 16, bands: Int = 4,
      stateTtl: Option[String] = None,
      normalize: Boolean = false): Dataset[BandVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // opt-in normalization ON-RAMP (the q219 placement, streaming arm):
    // case/diacritic variants shingle to identical band buckets and
    // dedup at admission; off by default — byte-exact semantics stay
    // the baseline contract
    val t = if (normalize) graft.functions.TextNorm.normalize(col(textCol))
            else col(textCol)
    val exploded = docs
      .select(col(idCol).cast("long").as("doc_id"),
        bandHashes(t, numHashes, bands).as("bb"))
      .select($"doc_id", posexplode($"bb").as(Seq("band", "bucket")))
      .as[(Long, Int, Long)]
    verdictsFromExploded(exploded, stateTtl)
  }

  /** The first-writer-wins bucket registry over ANY (doc, band, bucket)
    * stream — the stateful core [[bandVerdicts]] (text MinHash bands) and
    * [[imageBandVerdicts]] (pixel dHash bands) both feed. Admission
    * semantics are band-source-agnostic: a document is a near-dup of the
    * first claimant of any band bucket it shares. */
  def verdictsFromExploded(exploded: Dataset[(Long, Int, Long)],
      stateTtl: Option[String] = None): Dataset[BandVerdict] = {
    val spark = exploded.sparkSession
    import spark.implicits._
    implicit val regEnc = Encoders.product[BucketReg]
    implicit val outEnc = Encoders.product[BandVerdict]
    val timeout =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    exploded.groupByKey(r => (r._2, r._3))
      .flatMapGroupsWithState[BucketReg, BandVerdict](
        OutputMode.Append, timeout) {
        case ((band, bucket), rows, state: GroupState[BucketReg]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.map(_._1).toArray.sorted
            var reg = state.getOption
            val out = sorted.map { docId =>
              reg match {
                case Some(r) => BandVerdict(docId, band, bucket,
                  first_in_bucket = r.first_doc_id == docId, r.first_doc_id)
                case None =>
                  reg = Some(BucketReg(docId))
                  BandVerdict(docId, band, bucket,
                    first_in_bucket = true, docId)
              }
            }
            reg.foreach(state.update)
            stateTtl.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }

  /** [[bandVerdicts]]'s bucket registry as a Spark 4 `StatefulProcessor` —
    * the `transformWithState` successor API to flatMapGroupsWithState:
    * named state variables with per-state native TTL (no timeout-handling
    * branch in user code), timers available when needed. Public class:
    * serialized into tasks. Requires the RocksDB state store provider. */
  class BucketRegistryProcessor(ttl: Option[java.time.Duration])
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        (Int, Long), (Long, Int, Long), BandVerdict] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TTLConfig, TimeMode, TimerValues}
    @transient private var reg:
      org.apache.spark.sql.streaming.ValueState[BucketReg] = _

    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      reg = getHandle.getValueState[BucketReg]("bucketReg",
        Encoders.product[BucketReg],
        ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE))

    override def handleInputRows(key: (Int, Long),
        rows: Iterator[(Long, Int, Long)],
        timers: TimerValues): Iterator[BandVerdict] = {
      val (band, bucket) = key
      val sorted = rows.map(_._1).toArray.sorted
      var cur = if (reg.exists()) Some(reg.get()) else None
      sorted.iterator.map { docId =>
        cur match {
          case Some(r) => BandVerdict(docId, band, bucket,
            first_in_bucket = r.first_doc_id == docId, r.first_doc_id)
          case None =>
            cur = Some(BucketReg(docId))
            reg.update(BucketReg(docId))
            BandVerdict(docId, band, bucket,
              first_in_bucket = true, docId)
        }
      }
    }
  }

  /** [[bandVerdicts]] on the `transformWithState` API — identical
    * semantics (StreamingDedupSpec runs the same scenario through both);
    * state expiry is declarative TTL on the value state instead of manual
    * timeout handling. The session must use the RocksDB state store
    * provider (`spark.sql.streaming.stateStore.providerClass`), which is
    * the provider a 100 TB deployment wants anyway: state spills to disk
    * with changelog checkpointing instead of living on the executor heap. */
  def bandVerdictsTws(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", numHashes: Int = 16, bands: Int = 4,
      stateTtl: Option[java.time.Duration] = None,
      normalize: Boolean = false): Dataset[BandVerdict] = {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode}
    val spark = docs.sparkSession
    import spark.implicits._
    implicit val outEnc = Encoders.product[BandVerdict]
    val t = if (normalize) graft.functions.TextNorm.normalize(col(textCol))
            else col(textCol)
    val exploded = docs
      .select(col(idCol).cast("long").as("doc_id"),
        bandHashes(t, numHashes, bands).as("bb"))
      .select($"doc_id", posexplode($"bb").as(Seq("band", "bucket")))
      .as[(Long, Int, Long)]
    val timeMode =
      if (stateTtl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    exploded.groupByKey(r => (r._2, r._3))
      .transformWithState(new BucketRegistryProcessor(stateTtl),
        timeMode, OM.Append())
  }

  /** Per-document admission from a batch of verdicts: admit iff the
    * document was first in EVERY one of its bands; otherwise report one of
    * the prior documents it collided with. Stateless — run inside
    * `foreachBatch` after [[bandVerdicts]] (a streaming aggregation after
    * flatMapGroupsWithState is not supported by Spark, and doesn't need to
    * be: all of a document's bands are emitted in the same micro-batch its
    * text arrived in). */
  def admissions(verdicts: DataFrame): DataFrame =
    verdicts.groupBy(col("doc_id"))
      .agg(min(col("first_in_bucket")).as("admit"),
        max(when(!col("first_in_bucket"), col("prior_doc_id")))
          .as("dup_of"))

  /** The 4×16-bit Hamming bands every 64-bit fingerprint modality feeds
    * the bucket registry with (the batch q115/q116 band layout): position
    * in the array = band index, value = that band's 16 bits. */
  private def hamming64Bands(lo: Column, hi: Column): Column = array(
    lo.bitwiseAND(65535),
    shiftright(lo, 16).bitwiseAND(65535),
    hi.bitwiseAND(65535),
    shiftright(hi, 16).bitwiseAND(65535))

  /** (doc, band, bucket) rows from a (doc_id, lo, hi) fingerprint frame —
    * the shared on-ramp from any 64-bit-fingerprint modality into
    * [[verdictsFromExploded]]. */
  private def fingerprintExploded(fps: DataFrame, lo: String,
      hi: String): Dataset[(Long, Int, Long)] = {
    val spark = fps.sparkSession
    import spark.implicits._
    fps.select(col("doc_id"),
      posexplode(hamming64Bands(col(lo), col(hi)))
        .as(Seq("band", "bucket")))
      .as[(Long, Int, Long)]
  }

  /** Streaming IMAGE near-dup admission: decode each payload through the
    * real ImageIO seam, dHash it, band the 64 bits into 4×16-bit exact
    * keys (the batch q115 pipeline's bands), and run the same first-writer
    * bucket registry as the text path. The decode is a stateless
    * mapPartitions — append-legal in a stream — and everything after it is
    * [[verdictsFromExploded]], so text and image admission share one
    * stateful core and one set of replay/TTL semantics. Undecodable
    * payloads are skipped row by row (they claim nothing, admit nothing). */
  def imageBandVerdicts(media: Dataset[graft.operators.MultimodalOps.Media],
      stateTtl: Option[String] = None): Dataset[BandVerdict] =
    verdictsFromExploded(
      fingerprintExploded(
        graft.operators.MultimodalOps.dhashBatch(media).toDF(),
        "dhash_lo", "dhash_hi"),
      stateTtl)

  /** Streaming AUDIO near-dup admission — the fourth modality through the
    * shared registry: really decode each WAVE payload
    * ([[graft.operators.AudioOps.fingerprintBatch]]'s AudioSystem seam),
    * take the 64-bit zero-crossing fingerprint, and band it exactly like
    * the image dHash (both are 64-bit Hamming-space fingerprints, so they
    * share [[hamming64Bands]] — the batch q116 pipeline's bands).
    * Unparseable payloads skip row by row: they claim no buckets and
    * admit nothing, same contract as the image path. */
  def audioBandVerdicts(media: Dataset[graft.operators.MultimodalOps.Media],
      stateTtl: Option[String] = None): Dataset[BandVerdict] =
    verdictsFromExploded(
      fingerprintExploded(
        graft.operators.AudioOps.fingerprintBatch(media).toDF(),
        "fp_lo", "fp_hi"),
      stateTtl)

  /** Streaming VIDEO near-dup admission — the FIFTH modality through the
    * shared registry: each arriving video's sampled frames (one
    * [[graft.operators.MultimodalOps.Frame]] row per kept frame,
    * `frame_idx` < 64 — the batch q123 packing contract) decode through
    * the image seam, and every frame's dHash registers its 4 bands under
    * band index `frame_idx·4 + j` — the batch
    * [[graft.operators.MultimodalOps.videoNearDup]] band layout, so
    * aligned frames compete in aligned buckets and a frame-shifted
    * re-cut does NOT collide (alignment is part of the key, exactly as
    * in the batch semantics). A video is rejected iff a prior video
    * claimed any of its aligned-frame buckets. Undecodable frames skip
    * row by row: they claim no buckets; the video's remaining frames
    * still register (an all-corrupt video emits no verdict and admits
    * nothing). */
  def videoBandVerdicts(
      frames: Dataset[graft.operators.MultimodalOps.Frame],
      stateTtl: Option[String] = None): Dataset[BandVerdict] = {
    val spark = frames.sparkSession
    import spark.implicits._
    val packed = frames.map(f => graft.operators.MultimodalOps.Media(
      f.doc_id * 64 + f.frame_idx, f.payload))
    val fh = graft.operators.MultimodalOps.dhashBatch(packed).toDF()
      .select(shiftright(col("doc_id"), 6).as("doc_id"),
        col("doc_id").bitwiseAND(63).cast("int").as("k"),
        col("dhash_lo"), col("dhash_hi"))
    val exploded = fh
      .select(col("doc_id"), col("k"),
        posexplode(hamming64Bands(col("dhash_lo"), col("dhash_hi")))
          .as(Seq("j", "bucket")))
      .select(col("doc_id"),
        (col("k") * 4 + col("j")).cast("int").as("band"), col("bucket"))
      .as[(Long, Int, Long)]
    verdictsFromExploded(exploded, stateTtl)
  }
}
