package graft.operators

import java.security.MessageDigest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sinks.ManifestSink

/** Persistence + reuse for derived ANN index artifacts (IVF centroids,
  * Lloyd-refined means, PQ reconstructions) — the amortization seam the
  * r9 verdict named as the biggest remaining 100 TB lever: index BUILD is
  * a corpus-scale job (a Lloyd pass is a full posexplode+groupBy over
  * every vector; PQ encoding is an argmin over every (vector, subspace)),
  * while index USE is broadcast-tiny (centroids) or a cheap scan
  * (reconstructions). Rebuilding inside every query charges the build to
  * every invocation; storing the artifact beside the data charges it once
  * per corpus version.
  *
  * Storage is the engine's own [[graft.sinks.ManifestSink]]: the artifact
  * rows commit atomically WITH a provenance marker
  * (`graft.index.corpus_fp` in the manifest header, same conditional-put
  * commit), so a reader can never observe an index whose fingerprint it
  * can't check, and time-travel/vacuum semantics come for free. Freshness
  * is a metadata-only corpus fingerprint — file names, lengths, and
  * modification times of the corpus files, hashed — the same listing the
  * planner already does to read the corpus, so checking freshness costs
  * no data I/O at any scale. Any append/rewrite/regeneration of the
  * corpus changes the listing → the fingerprint → the next
  * [[loadOrBuild]] rebuilds; a byte-identical corpus reuses the stored
  * artifact across queries, sessions, and processes.
  *
  * Determinism note: every builder in VectorOps is deterministic and its
  * artifact round-trips parquet bit-exactly (float and double arrays),
  * so a query reading a stored index is hash-identical to one that just
  * built it — the DuckDB oracles don't know (or care) which path ran.
  */
object VectorIndex {

  /** Manifest-header key carrying the corpus fingerprint the stored
    * artifact was built from. The value is a non-numeric string on
    * purpose: ManifestSink merges numeric header values monotonically
    * (max), while a provenance marker must always be REPLACED by the
    * rewriting commit's value. */
  val FingerprintKey = "graft.index.corpus_fp"

  /** Metadata-only fingerprint of a corpus path: SHA-256 over the sorted
    * (path, length, mtime) listing of every file under it. Conservative
    * by design — a rewrite that produces identical bytes with a new
    * mtime re-fingerprints (and so rebuilds); nothing that changes data
    * can keep the fingerprint. O(files) namenode/listing calls, zero
    * data reads. */
  def corpusFingerprint(spark: SparkSession, corpusPath: String): String =
    fingerprintOf(listEntries(spark, corpusPath))

  /** Read the artifact at `indexDir` if its stored fingerprint matches
    * `corpusFp`; otherwise run `build` ONCE, commit its result with the
    * fingerprint (one atomic ManifestSink commit), and read that. The
    * returned frame always READS the committed parquet — both paths give
    * the same physical source, so downstream plans don't fork on
    * freshness.
    *
    * Concurrency: two sessions racing to rebuild the same stale index can
    * both attempt the replace; the ManifestSink conditional put lets one
    * win. The loser re-checks the winner's header — if the winner stamped
    * the same fingerprint (the common race: same corpus, same builder)
    * the loser simply reads the winner's commit; a genuinely conflicting
    * fingerprint propagates the failure. */
  def loadOrBuild(spark: SparkSession, indexDir: String, corpusFp: String)(
      build: => DataFrame): DataFrame = {
    def storedFp: Option[String] = {
      val v = ManifestSink.version(spark, indexDir)
      if (v < 0) None
      else ManifestSink.manifestHeader(spark, indexDir, v).get(FingerprintKey)
    }
    if (!storedFp.contains(corpusFp)) {
      try ManifestSink.replaceWithHeader(build, indexDir,
        Map(FingerprintKey -> corpusFp))
      catch {
        case e: Throwable if storedFp.contains(corpusFp) =>
          () // lost a rebuild race to a commit with the right fingerprint
      }
    }
    ManifestSink.read(spark, indexDir)
  }

  /** One corpus file's identity for delta detection: path plus the same
    * (length, mtime) metadata the fingerprint hashes. */
  private def listEntries(spark: SparkSession,
      corpusPath: String): Seq[(String, String)] = {
    val p = new Path(corpusPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val s = it.next()
      // skip writer metadata (_SUCCESS, .crc sidecars, hidden files) —
      // the same convention Spark's own file listing applies; a delta
      // build must never be handed a non-data file to read
      val name = s.getPath.getName
      if (!name.startsWith("_") && !name.startsWith("."))
        out += (s.getPath.toString ->
          s"${s.getLen}|${s.getModificationTime}")
    }
    out.sortBy(_._1).toSeq
  }

  private def fingerprintOf(entries: Seq[(String, String)]): String = {
    val md = MessageDigest.getInstance("SHA-256")
    entries.foreach { case (path, meta) =>
      md.update((new Path(path).toUri.getPath + "|" + meta + "\n")
        .getBytes("UTF-8"))
    }
    "sha:" + md.digest().map("%02x".format(_)).mkString.take(32)
  }

  /** [[loadOrBuild]] with DELTA maintenance for per-vector artifacts
    * (e.g. PQ reconstructions): when the corpus change is a PURE APPEND —
    * every previously-listed file still present with identical length
    * and mtime, plus new files — only the NEW files are passed to
    * `buildFrom` and the result is APPENDED to the stored artifact (one
    * atomic commit carrying the new fingerprint). Any other change
    * (rewrite, delete, first build) falls back to a full rebuild over
    * the complete file list. At 100 TB this is the difference between
    * re-encoding the corpus and encoding the day's arrivals — legitimate
    * exactly when the artifact is row-per-vector and the model it is
    * encoded against (codebooks, centroids) derives from data the append
    * did not touch, which the CALLER must guarantee (PQ codebooks from
    * the frozen sample qualify; Lloyd means over all vectors do not —
    * use [[loadOrBuild]] there).
    *
    * The file listing that delta detection diffs against is stored as a
    * sibling ManifestSink table (`<indexDir>_listing`). It is advisory:
    * the artifact's own fingerprint header remains the source of truth,
    * so a crash between the artifact commit and the listing refresh
    * degrades to a full rebuild on the next call, never to a stale or
    * doubled artifact. */
  def loadOrBuildIncremental(spark: SparkSession, indexDir: String,
      corpusPath: String)(
      buildFrom: Seq[String] => DataFrame): DataFrame = {
    maintainIncremental(spark, indexDir, corpusPath)(
      appendFn = (delta, fp) =>
        ManifestSink.appendWithHeader(buildFrom(delta), indexDir,
          Map(FingerprintKey -> fp)),
      replaceFn = (all, fp) =>
        ManifestSink.replaceWithHeader(buildFrom(all), indexDir,
          Map(FingerprintKey -> fp)))
    ManifestSink.read(spark, indexDir)
  }

  /** [[loadOrBuildIncremental]] in the PARTITIONED manifest layout: the
    * artifact commits one entry per `partCol` value, so equality scans
    * ([[ManifestSink.readWhereEq]]) prune to exactly the partitions a
    * query probes — the posting-list shape an IVF index wants (probe 2
    * of 4096 cells → read 2 entries' files, plan from manifest metadata
    * alone). Returns nothing: callers read SELECTIVELY via the pruned
    * readers rather than materializing the whole index. */
  def ensurePartitionedIncremental(spark: SparkSession, indexDir: String,
      corpusPath: String, partCol: String, statsCols: Seq[String] = Nil)(
      buildFrom: Seq[String] => DataFrame): Unit =
    maintainIncremental(spark, indexDir, corpusPath)(
      appendFn = (delta, fp) =>
        ManifestSink.appendPartitionedHeader(buildFrom(delta), indexDir,
          partCol, Map(FingerprintKey -> fp), statsCols),
      replaceFn = (all, fp) =>
        ManifestSink.replacePartitionedWithHeader(buildFrom(all), indexDir,
          partCol, Map(FingerprintKey -> fp), statsCols))

  /** The shared maintenance decision: fresh → nothing; pure append →
    * `appendFn(deltaFiles, fp)`; anything else → `replaceFn(allFiles,
    * fp)`; then refresh the advisory listing table. Rebuild races are
    * absorbed when the winner stamped the same fingerprint. */
  private def maintainIncremental(spark: SparkSession, indexDir: String,
      corpusPath: String)(
      appendFn: (Seq[String], String) => Unit,
      replaceFn: (Seq[String], String) => Unit): Unit = {
    val listDir = indexDir + "_listing"
    val cur = listEntries(spark, corpusPath)
    val fp = fingerprintOf(cur)
    def storedFp: Option[String] = {
      val v = ManifestSink.version(spark, indexDir)
      if (v < 0) None
      else ManifestSink.manifestHeader(spark, indexDir, v).get(FingerprintKey)
    }
    if (!storedFp.contains(fp)) {
      val old: Seq[(String, String)] =
        if (ManifestSink.version(spark, listDir) < 0) Nil
        else ManifestSink.read(spark, listDir).collect()
          .map(r => r.getString(0) -> r.getString(1))
          .sortBy(_._1).toSeq // parquet row order ≠ listing order; the
          // fingerprint check below hashes in path order
      val curMap = cur.toMap
      // Delta-append is legal ONLY when the artifact was built from
      // EXACTLY the corpus state the stored listing describes: the
      // artifact's fingerprint must equal the fingerprint OF that old
      // listing. The listing refresh below is a separate commit from the
      // artifact's, so a crash between them leaves the two skewed —
      // without this check, a stale listing would make the next append
      // re-encode files the artifact already holds (doubled rows), and a
      // listing that ran ahead would under-append (silently missing
      // rows). Any skew, in either direction, now degrades to a full
      // rebuild — never to a wrong artifact.
      val pureAppend = old.nonEmpty &&
        storedFp.contains(fingerprintOf(old)) &&
        old.forall { case (p, m) => curMap.get(p).contains(m) } &&
        cur.size > old.size
      try {
        if (pureAppend) {
          val oldPaths = old.map(_._1).toSet
          val delta = cur.collect {
            case (p, _) if !oldPaths.contains(p) => p
          }
          appendFn(delta, fp)
        } else replaceFn(cur.map(_._1), fp)
        import spark.implicits._
        ManifestSink.replace(cur.toDF("path", "meta"), listDir)
      } catch {
        case e: Throwable if storedFp.contains(fp) =>
          () // lost a maintenance race to a commit with the right fp
      }
    }
  }

  /** Index root for a corpus directory: a deterministic per-corpus-path
    * location under the JVM temp dir (test/driver environments run
    * against read-only corpus dirs, so the artifact cannot live beside
    * the data; a deployment owning its storage would point this at a
    * sibling of the corpus table). Stable across processes on one host —
    * which is exactly the reuse the fingerprint then guards. */
  def indexRoot(corpusDir: String): String = {
    val safe = corpusDir.replaceAll("[^A-Za-z0-9._-]", "_")
    s"${sys.props("java.io.tmpdir")}/graft-index/$safe"
  }
}
