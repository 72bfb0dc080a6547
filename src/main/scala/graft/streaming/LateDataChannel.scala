package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sinks.ManifestSink

/** Late-data dead-letter channel for streaming ingestion — the rows the
  * watermark would silently drop, captured instead.
  *
  * Structured Streaming's watermark semantics DISCARD rows that arrive
  * behind the watermark in stateful operators; a production ingestion
  * pipeline (the reference is an SSE ingester — out-of-order delivery is
  * its normal condition) needs those rows LANDED somewhere auditable, not
  * vanished. This operator maintains its own event-time watermark in the
  * main table's manifest header and splits every micro-batch:
  *
  *  - on-time rows (event time ≥ the watermark established BEFORE this
  *    batch) append to the main table;
  *  - late rows — and rows with a NULL event time, which can never be
  *    ordered — append to the dead-letter table for triage/backfill;
  *  - the watermark then advances to max(previous, batch max − delay),
  *    committed in the SAME atomic commit as the main append (numeric
  *    headers merge monotonically, so neither a replay nor a rebase can
  *    ever regress it).
  *
  * Exactly-once under foreachBatch's at-least-once delivery: BOTH tables
  * fold via batchId-marked appends ([[ManifestSink.appendOnce]] /
  * `appendOnceWithHeader`), each guarded by its own marker, so a replayed
  * epoch — including one that crashed BETWEEN the two commits — re-lands
  * only the side that never committed, and converges. Late-side first:
  * a crash after the late commit replays into a late-side skip + main
  * commit, never a double.
  *
  * At 100 TB: per trigger this reads the batch plus two manifest headers;
  * the split is a row-local predicate against a broadcast-scalar
  * watermark; no state beyond the two header longs.
  */
object LateDataChannel {

  /** Header key holding the event-time watermark in epoch MICROSECONDS —
    * numeric, so [[ManifestSink]]'s header merge advances it
    * monotonically. */
  val WatermarkKey = "graft.late.watermark_us"

  /** The main table's current watermark (epoch µs), or Long.MinValue
    * before any batch established one. */
  def watermarkUs(spark: org.apache.spark.sql.SparkSession,
      mainDir: String): Long = {
    val v = ManifestSink.version(spark, mainDir)
    if (v < 0) Long.MinValue
    else ManifestSink.manifestHeader(spark, mainDir, v)
      .get(WatermarkKey).flatMap(_.toLongOption).getOrElse(Long.MinValue)
  }

  /** Fold one micro-batch: split on the PRE-BATCH watermark, land late
    * rows in `lateDir`, on-time rows in `mainDir`, and advance the
    * watermark to max(previous, max(on-time event time) − `delayUs`).
    * Safe under foreachBatch replays (see object doc). `tsCol` must be a
    * timestamp column. */
  def ingest(batch: DataFrame, batchId: Long, mainDir: String,
      lateDir: String, tsCol: String, delayUs: Long): Unit = {
    val spark = batch.sparkSession
    val wmPrev = watermarkUs(spark, mainDir)
    val b = batch.persist() // both splits and the max probe read it once
    val tsUs = unix_micros(col(tsCol))
    val isLate = tsUs.isNull || tsUs < lit(wmPrev)
    // late side FIRST (its own marker makes the replay of a mid-crash
    // epoch skip here and complete the main side)
    ManifestSink.appendOnce(b.filter(isLate), lateDir, batchId)
    val onTime = b.filter(!isLate)
    val mx = onTime.agg(max(tsUs)).head()
    val wmNew =
      if (mx.isNullAt(0)) wmPrev
      else math.max(wmPrev, mx.getLong(0) - delayUs)
    ManifestSink.appendOnceWithHeader(onTime, mainDir, batchId,
      if (wmNew == Long.MinValue) Map.empty
      else Map(WatermarkKey -> wmNew.toString))
    b.unpersist()
  }

  /** [[ingest]] with a PLUGGABLE main-side lander — the seam that lets a
    * full sink policy (dedup, retention, partitioning) sit behind the
    * late split: the channel owns the split and the watermark advance;
    * `landMain(onTime, header)` owns HOW on-time rows commit, and MUST
    * fold `header` into the same atomic commit as the rows (e.g.
    * `ManifestSink.appendOnceWithHeader`) and be replay-idempotent.
    * Empty batches are skipped whole (the count probe still touches
    * every partition, which Spark's state-store commit validation
    * requires of a foreachBatch body); an empty LATE side is skipped
    * too — no dead-letter version churn on healthy triggers — but the
    * main lander always runs so the watermark can advance. */
  def ingestVia(batch: DataFrame, batchId: Long, mainDir: String,
      lateDir: String, tsCol: String, delayUs: Long)(
      landMain: (DataFrame, Map[String, String]) => Unit): Unit = {
    val spark = batch.sparkSession
    val wmPrev = watermarkUs(spark, mainDir)
    val b = batch.persist()
    try {
      if (b.count() == 0L) return
      val tsUs = unix_micros(col(tsCol))
      val isLate = tsUs.isNull || tsUs < lit(wmPrev)
      val late = b.filter(isLate)
      // late side FIRST (see [[ingest]]): a mid-crash replay skips the
      // landed late side and completes the main side
      if (late.count() > 0L) ManifestSink.appendOnce(late, lateDir, batchId)
      val onTime = b.filter(!isLate)
      val mx = onTime.agg(max(tsUs)).head()
      val wmNew =
        if (mx.isNullAt(0)) wmPrev
        else math.max(wmPrev, mx.getLong(0) - delayUs)
      landMain(onTime,
        if (wmNew == Long.MinValue) Map.empty
        else Map(WatermarkKey -> wmNew.toString))
    } finally b.unpersist()
  }
}
