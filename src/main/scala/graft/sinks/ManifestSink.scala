package graft.sinks

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-committed parquet sink: snapshot isolation without renaming
  * data files.
  *
  * Layout:
  * {{{
  *   dir/data/<batch-uuid>/part-*.parquet   — immutable once written
  *   dir/_manifests/<version>.manifest      — newline list of data dirs
  *   dir/_latest                            — current version number
  * }}}
  *
  * A commit writes new data files, then publishes the next manifest via
  * write-temp + rename to a NEVER-REUSED name (`<version>.manifest`) —
  * that single rename of a small file is the commit point, and because
  * the target name never pre-exists, no delete precedes it: there is no
  * instant at which the sink has fewer committed versions than before.
  * The current version is the LARGEST numbered manifest present;
  * `_latest` is only a one-read fast-path hint, refreshed after commit
  * and cross-checked against the listing (a stale or missing hint —
  * e.g. a crash between the manifest rename and the hint write — is
  * repaired by the listing, never trusted over it). Readers resolve
  * version → manifest → file list, so they always see a complete
  * snapshot: never a half-written batch, never a half-compacted swap
  * (the failure mode directory-rename sinks have on object stores where
  * rename is copy+delete). Unreferenced data from `replace` commits
  * stays on disk until [[vacuum]] — the same
  * write-new/flip-pointer/collect-garbage protocol as log-structured
  * table formats, reduced to the minimum the engine needs (single
  * writer; the reference is single-writer too, pipeline.py WAL mode).
  * On a true object store the rename becomes copy+delete of one tiny
  * object — still safe here because the name is never contended; with
  * multiple writers you'd want a conditional-put on the manifest name
  * instead.
  */
object ManifestSink {

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readSmall(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** Publish `content` at `p` via temp + rename. The caller guarantees `p`
    * does not already exist (manifest names are never reused), so the
    * rename needs no preceding delete — the commit never passes through a
    * state with the target missing. */
  private def publishNew(f: FileSystem, p: Path, content: String): Unit = {
    val tmp = new Path(p.getParent, p.getName + ".tmp")
    val out = f.create(tmp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
    require(f.rename(tmp, p), s"failed to commit $p")
  }

  /** Best-effort overwrite of the `_latest` hint — NOT load-bearing: a
    * crash at any point here leaves at worst a stale/missing hint, which
    * [[version]] repairs from the manifest listing. */
  private def writeHint(f: FileSystem, p: Path, content: String): Unit = {
    val tmp = new Path(p.getParent, p.getName + ".tmp")
    val out = f.create(tmp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
    if (f.exists(p)) f.delete(p, false)
    f.rename(tmp, p)
  }

  private val ManifestName = """(\d+)\.manifest""".r

  /** Largest committed manifest number, or -1 for an empty sink — the
    * source of truth (crash-safe: a manifest exists iff its commit's
    * rename completed). */
  private def listedVersion(f: FileSystem, dir: String): Long = {
    val mdir = new Path(dir, "_manifests")
    if (!f.exists(mdir)) return -1L
    f.listStatus(mdir).foldLeft(-1L) { (acc, st) =>
      st.getPath.getName match {
        case ManifestName(v) => math.max(acc, v.toLong)
        case _               => acc // .tmp of an in-flight/aborted commit
      }
    }
  }

  /** Current committed version, or -1 for an empty sink. Trusts the
    * `_latest` hint only when it agrees with the manifest listing; a
    * missing, stale, or corrupt hint falls back to the listing, so a
    * crash between manifest publish and hint refresh never rolls the
    * table back (or, worse, orphans every previously committed batch on
    * the next commit). */
  def version(spark: SparkSession, dir: String): Long = {
    val f = fs(spark, dir)
    val listed = listedVersion(f, dir)
    val latest = new Path(dir, "_latest")
    if (f.exists(latest)) {
      // a torn hint write can leave unparseable bytes or a checksum
      // mismatch (local FS keeps a CRC sidecar) — treat either as stale
      val hinted = scala.util.Try(readSmall(f, latest).trim.toLong)
        .getOrElse(-1L)
      if (hinted == listed) return hinted
    }
    listed
  }

  private def manifestEntries(spark: SparkSession, dir: String,
      v: Long): Seq[String] = {
    if (v < 0) return Nil
    val f = fs(spark, dir)
    readSmall(f, new Path(dir, s"_manifests/$v.manifest"))
      .split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
  }

  private def commit(spark: SparkSession, dir: String, df: DataFrame,
      baseEntries: Seq[String]): Long = {
    val batch = java.util.UUID.randomUUID().toString
    val dataDir = s"$dir/data/$batch"
    df.write.parquet(dataDir)
    val prev = version(spark, dir)
    val entries = baseEntries :+ s"data/$batch"
    val next = prev + 1
    val f = fs(spark, dir)
    // commit point: this rename (new name — nothing is deleted first)
    publishNew(f, new Path(dir, s"_manifests/$next.manifest"),
      entries.mkString("\n"))
    writeHint(f, new Path(dir, "_latest"), next.toString)
    next
  }

  /** Append a batch as a new commit. Returns the committed version. */
  def append(df: DataFrame, dir: String): Long = {
    val spark = df.sparkSession
    commit(spark, dir, df,
      manifestEntries(spark, dir, version(spark, dir)))
  }

  /** Replace the whole table content (compaction/retention commit):
    * previous data files become unreferenced, reclaim via [[vacuum]]. */
  def replace(df: DataFrame, dir: String): Long =
    commit(df.sparkSession, dir, df, Nil)

  /** Keyed MERGE (upsert): every row of `updates` replaces the committed
    * row sharing its key; unmatched keys insert. Copy-on-write with
    * file-level pruning — only the batch directories that actually
    * CONTAIN a matched key are rewritten (located by one semi-join over
    * the snapshot); untouched directories are carried into the next
    * manifest by reference, so a merge touching one batch of a
    * 10 000-batch table rewrites one batch plus the updates, not the
    * table. This is the log-structured MERGE shape (Delta/Iceberg
    * copy-on-write without deletion vectors): the previous version stays
    * readable (time travel), and replaced directories become
    * unreferenced for [[vacuum]]. Same single-writer contract as
    * append/replace.
    *
    * `updates` must be unique per key (enforced): with several update
    * rows per key there is no deterministic winner — last-wins ordering
    * is the CALLER's semantics to resolve before the merge (e.g.
    * max-timestamp per key, the reference's UNIQUE-upsert analog,
    * pipeline.py:216). Returns the committed version. */
  def merge(updates: DataFrame, dir: String, keys: Seq[String]): Long = {
    require(keys.nonEmpty, "merge requires at least one key column")
    val spark = updates.sparkSession
    import org.apache.spark.sql.functions.{col, count, input_file_name,
      lit, regexp_extract}
    val keyCols = keys.map(col)
    require(updates.groupBy(keyCols: _*).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1).isEmpty,
      s"merge updates must be unique per key ${keys.mkString("(", ",", ")")}")
    val prev = version(spark, dir)
    if (prev < 0) return commit(spark, dir, updates, Nil)
    if (updates.isEmpty) return prev // no-op merge: no new version
    val entries = manifestEntries(spark, dir, prev)
    // one pass over the snapshot finds the directories holding matched
    // keys; the result is manifest-entry-scale metadata (≤ #entries), so
    // collecting it on the driver mirrors the manifest read itself
    val touched = read(spark, dir)
      .withColumn("__e", regexp_extract(input_file_name(), "(data/[^/]+)/", 1))
      .join(updates.select(keyCols: _*), keys, "left_semi")
      .select("__e").distinct().collect().map(_.getString(0)).toSet
    val kept = entries.filterNot(touched)
    val rewritten =
      if (touched.isEmpty) updates
      else spark.read
        .parquet(entries.filter(touched).map(e => s"$dir/$e"): _*)
        .join(updates.select(keyCols: _*), keys, "left_anti")
        .unionByName(updates)
    commit(spark, dir, rewritten, kept)
  }

  /** Read the current snapshot (empty sink → empty frame is an error —
    * check [[version]] first, mirroring spark.read on a missing path). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val v = version(spark, dir)
    require(v >= 0, s"ManifestSink at $dir has no committed version")
    val paths = manifestEntries(spark, dir, v).map(e => s"$dir/$e")
    spark.read.parquet(paths: _*)
  }

  /** Time-travel read: the snapshot exactly as committed at version `v`.
    * Valid while `v`'s manifest is inside the [[vacuum]] retention
    * window (manifests are immutable and data files are never rewritten
    * in place, so an unvacuumed old version reads byte-identically). */
  def readAt(spark: SparkSession, dir: String, v: Long): DataFrame = {
    require(v >= 0, s"version must be >= 0, got $v")
    val entries = manifestEntries(spark, dir, v)
    require(entries.nonEmpty, s"version $v has no manifest at $dir")
    spark.read.parquet(entries.map(e => s"$dir/$e"): _*)
  }

  /** Data directories added and removed between two committed versions —
    * the file-granular change log (manifest-diff only: no data is read).
    * `fromV = -1` means "from empty". */
  def changedEntries(spark: SparkSession, dir: String, fromV: Long,
      toV: Long): (Seq[String], Seq[String]) = {
    require(fromV <= toV, s"fromV $fromV must be <= toV $toV")
    val from = manifestEntries(spark, dir, fromV).toSet
    val to = manifestEntries(spark, dir, toV)
    (to.filterNot(from), (from -- to).toSeq.sorted)
  }

  /** Incremental read: all rows in data directories the `toV` snapshot
    * references that `fromV` did not — for an append-only history this
    * is EXACTLY the rows inserted in (fromV, toV], read without touching
    * any carried-over file (the incremental-consumer pattern: checkpoint
    * the version, read only what's new). After a [[merge]] or
    * [[replace]], added directories also carry rewritten rows —
    * key-exact semantics for that case are [[changesByKey]]. */
  def changes(spark: SparkSession, dir: String, fromV: Long,
      toV: Long): DataFrame = {
    val (added, _) = changedEntries(spark, dir, fromV, toV)
    if (added.isEmpty) readAt(spark, dir, toV).limit(0)
    else spark.read.parquet(added.map(e => s"$dir/$e"): _*)
  }

  /** Key-exact row-level CDC between two snapshots: one row per changed
    * key with `_change_type` ∈ insert / update / delete (update compares
    * every non-key column null-safely). Three distributed joins on the
    * key — never a full-table collect; at scale each is hash-partitioned
    * on the same key, and AQE plans the small side as broadcast. */
  def changesByKey(spark: SparkSession, dir: String, fromV: Long,
      toV: Long, keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, struct}
    require(keys.nonEmpty, "changesByKey requires at least one key column")
    val a = if (fromV < 0) readAt(spark, dir, toV).limit(0)
            else readAt(spark, dir, fromV)
    val b = readAt(spark, dir, toV)
    val dataCols = b.columns.toSeq.filterNot(keys.contains)
    val inserts = b.join(a.select(keys.map(col): _*), keys, "left_anti")
      .select(b.columns.map(col).toSeq :+
        lit("insert").as("_change_type"): _*)
    val deletes = a.join(b.select(keys.map(col): _*), keys, "left_anti")
      .select(a.columns.map(col).toSeq :+
        lit("delete").as("_change_type"): _*)
    val bothKeys = b.as("nw").join(a.as("old"), keys)
    val updates = bothKeys
      .filter(!(struct(dataCols.map(c => col(s"nw.$c")): _*) <=>
        struct(dataCols.map(c => col(s"old.$c")): _*)))
      .select(keys.map(col) ++ dataCols.map(c => col(s"nw.$c")) :+
        lit("update").as("_change_type"): _*)
    inserts.unionByName(updates).unionByName(deletes)
  }

  /** Garbage-collect: keep the newest `keepVersions` manifests (the
    * time-travel window); delete older manifest files and any data
    * directory no retained manifest references (replaced compactions,
    * aborted writes). Returns deleted data dirs. */
  def vacuum(spark: SparkSession, dir: String,
      keepVersions: Int = 1): Seq[String] = {
    require(keepVersions >= 1, "must keep at least the current version")
    val f = fs(spark, dir)
    val dataRoot = new Path(dir, "data")
    if (!f.exists(dataRoot)) return Nil
    val current = version(spark, dir)
    val keepFrom = math.max(0L, current - keepVersions + 1)
    val referenced = (keepFrom to current)
      .flatMap(v => manifestEntries(spark, dir, v)).toSet
    (0L until keepFrom).foreach { v =>
      f.delete(new Path(dir, s"_manifests/$v.manifest"), false)
    }
    f.listStatus(dataRoot).toSeq
      .filter(st => !referenced.contains(s"data/${st.getPath.getName}"))
      .map { st =>
        require(f.delete(st.getPath, true), s"failed to vacuum ${st.getPath}")
        st.getPath.getName
      }
  }
}
