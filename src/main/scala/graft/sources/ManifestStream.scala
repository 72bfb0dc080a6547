package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.sinks.ManifestSink

/** TABLE-AS-STREAM: a Structured Streaming source over a committed
  * [[ManifestSink]] table — the sink is also a source, so pipelines
  * CHAIN (bronze table → stream → silver table) with the manifest
  * versions as the offsets. `spark.readStream.format("manifest-stream")
  * .option("path", dir).load()`.
  *
  * Offsets are COMMITTED VERSIONS: batch (fromV, toV] is exactly the
  * rows those commits appended (read through the assembled read, so
  * in-window tombstones apply position-correctly), and because
  * manifests and data files are immutable, a replayed batch re-reads
  * byte-identical rows — deterministic replay, which is what makes
  * downstream exactly-once sinks (`appendOnce`) compose. The very first
  * batch is the table snapshot as of the latest version (history
  * versions collapse into it; `startingVersion` narrows this).
  *
  * Non-append commits follow the log-structured streaming contract
  * (the Delta-source shape): a window with REMOVED entries (rewrite /
  * compaction) fails loudly unless `ignoreChanges=true` (then the added
  * directories stream, which may re-emit rewritten rows — document your
  * downstream dedup); a window adding merge-on-read tombstones fails
  * unless `ignoreDeletes=true` or `ignoreChanges=true` (retractions are
  * not emitted — the stream carries inserts only).
  *
  * CDC MODE (`mode=cdc`, `keys=k1,k2`): batches become the key-exact
  * row-level diff ([[ManifestSink.changesByKey]]) with `_change_type` ∈
  * insert / update / delete — deletes, upserts, and rewrites all STREAM
  * instead of refusing, because the diff is computed between the two
  * snapshots rather than from the added files. The price is the CDC
  * price: each batch joins the window's two snapshots on the key
  * (entry-pruned when the window shares its tombstone set) instead of
  * scanning only added directories. The first batch is all-insert (the
  * snapshot diffed against empty).
  *
  * Options: `path` (required, committed table), `startingVersion`
  * (default 0 — the first batch is the snapshot), `maxVersionsPerTrigger`
  * (cap versions per micro-batch), `ignoreDeletes`, `ignoreChanges`,
  * `mode` (`inserts` default / `cdc`), `keys` (required for cdc).
  *
  * Scale: `getOffset` is one manifest hint read; `getBatch` plans from
  * the manifest diff and scans ONLY the window's added directories —
  * a day's commits stream at the cost of reading the day. */
class ManifestStreamProvider extends StreamSourceProvider
    with DataSourceRegister {
  override def shortName(): String = "manifest-stream"

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val base = schema.getOrElse(
      ManifestSink.read(ctx.sparkSession,
        ManifestStreamProvider.path(parameters), mergeSchema = true)
        .schema)
    (shortName(),
      if (ManifestStreamProvider.cdcKeys(parameters).isEmpty) base
      else base.add("_change_type", org.apache.spark.sql.types.StringType))
  }

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new ManifestStreamSource(ctx.sparkSession,
      ManifestStreamProvider.path(parameters),
      parameters.get("startingVersion").map(_.toLong).getOrElse(0L),
      parameters.get("maxVersionsPerTrigger").map(_.toLong),
      parameters.get("ignoreDeletes").exists(_.toBoolean),
      parameters.get("ignoreChanges").exists(_.toBoolean),
      ManifestStreamProvider.cdcKeys(parameters))
}

private object ManifestStreamProvider {
  def path(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "manifest-stream requires option 'path' (a committed ManifestSink)"))

  /** CDC key columns, or Nil in plain inserts mode. */
  def cdcKeys(parameters: Map[String, String]): Seq[String] =
    parameters.get("mode").map(_.toLowerCase) match {
      case Some("cdc") =>
        val ks = parameters.getOrElse("keys", "").split(",")
          .map(_.trim).filter(_.nonEmpty).toSeq
        require(ks.nonEmpty, "manifest-stream mode=cdc requires 'keys'")
        ks
      case Some("inserts") | None => Nil
      case Some(m) => throw new IllegalArgumentException(
        s"manifest-stream mode must be 'inserts' or 'cdc', got $m")
    }
}

class ManifestStreamSource(spark: SparkSession, dir: String,
    startingVersion: Long, maxVersionsPerTrigger: Option[Long],
    ignoreDeletes: Boolean, ignoreChanges: Boolean,
    cdcKeys: Seq[String] = Nil) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  require(startingVersion >= 0,
    s"startingVersion must be >= 0, got $startingVersion")
  require(maxVersionsPerTrigger.forall(_ >= 1),
    "maxVersionsPerTrigger must be >= 1")

  import org.apache.spark.sql.connector.read.streaming.{Offset => V2Offset,
    ReadLimit, ReadMaxFiles}

  private val tableSchema = {
    val base = ManifestSink.read(spark, dir, mergeSchema = true).schema
    if (cdcKeys.isEmpty) base
    else base.add("_change_type", org.apache.spark.sql.types.StringType)
  }
  // AvailableNow fixes its catch-up target at query start (the
  // FileStreamSource shape), so a capped source still drains fully
  private var availableNowTarget: Option[Long] = None

  override def schema: StructType = tableSchema

  override def getOffset: Option[Offset] = throw
    new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-control entry")

  override def getDefaultReadLimit: ReadLimit =
    maxVersionsPerTrigger.fold(ReadLimit.allAvailable())(m =>
      ReadLimit.maxFiles(m.toInt)) // "files" = manifest versions here

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(ManifestSink.version(spark, dir))

  override def latestOffset(startOffset: V2Offset,
      limit: ReadLimit): V2Offset = {
    val cur = ManifestSink.version(spark, dir)
    val target = availableNowTarget.fold(cur)(math.min(cur, _))
    if (target < startingVersion) return null
    val from = Option(startOffset)
      .map(_.json.trim.toLong).getOrElse(startingVersion - 1L)
    val capped = limit match {
      case m: ReadMaxFiles => math.min(target, from + m.maxFiles())
      case _               => target
    }
    if (capped <= from) null else ColumnBridge.longOffset(capped)
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(_.json.trim.toLong).getOrElse(startingVersion - 1L)
    val to = end.json.trim.toLong
    val batch =
      if (cdcKeys.nonEmpty)
        // key-exact diff: deletes/upserts/rewrites all stream; fromV < 0
        // is the all-insert snapshot
        ManifestSink.changesByKey(spark, dir, from, to, cdcKeys)
      else if (from < 0L)
        ManifestSink.readAt(spark, dir, to, mergeSchema = true)
      else {
        val (_, removed) = ManifestSink.changedEntries(spark, dir, from, to)
        if (removed.nonEmpty && !ignoreChanges)
          throw new IllegalStateException(
            s"manifest-stream at $dir: window ($from,$to] removed entries " +
              s"(rewrite/compaction) — set ignoreChanges=true to stream " +
              "the added directories (rewritten rows may re-emit)")
        if (ManifestSink.tombstonesAdded(spark, dir, from, to) &&
            !ignoreDeletes && !ignoreChanges)
          throw new IllegalStateException(
            s"manifest-stream at $dir: window ($from,$to] committed " +
              "merge-on-read deletes — retractions are not streamable; " +
              "set ignoreDeletes=true to stream the inserts only")
        ManifestSink.changesApplied(spark, dir, from, to)
      }
    // align to the source schema: evolved windows may add columns (drop
    // them) or predate late-added ones (null-backfill), so every batch
    // carries the schema the query was planned with
    val aligned = batch.select(tableSchema.fields.map(f =>
      if (batch.columns.contains(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)).toSeq: _*)
    ColumnBridge.asStreamingFrame(spark, aligned)
  }

  override def stop(): Unit = ()
}
