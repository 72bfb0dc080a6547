package graft.sinks

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cross-table CONSISTENT snapshots: a catalog is a tiny versioned file
  * mapping table name → (table dir, pinned manifest version), republished
  * as a whole through the same conditional-put commit primitive as
  * [[ManifestSink]] manifests (hard links on local filesystems, rename on
  * HDFS, the registered If-None-Match seam on object stores).
  *
  * Per-table commits give snapshot isolation WITHIN a table; they cannot
  * give a reader a consistent view ACROSS tables (fact + dimension
  * updated together, a corpus and its ANN index, a table and its
  * aggregate view): between two per-table commits every reader sees one
  * side moved and the other not. The catalog closes that gap the way
  * catalog-commit table formats do: writers commit each table normally,
  * then publish ALL the new versions as ONE catalog version — a single
  * atomic metadata swap. A reader that resolves every table through one
  * catalog read gets either all of a transaction's pins or none. A crash
  * between table commits and the catalog publish leaves the tables ahead
  * of the catalog — invisible, not torn (the data is immutable and
  * unreferenced-by-pin, exactly like an unpublished manifest batch).
  *
  * Pins are MONOTONIC per (name, dir): a publisher that raced and lost
  * rebases onto the winner's catalog, and a stale pin (lower version than
  * already published) is refused rather than silently rolling the table
  * back — explicit rollbacks opt in via `allowRollback` (the restore
  * workflow). Catalog versions are retained like manifest versions, so
  * the consistent view itself time-travels: [[pinsAt]] + [[readTableAt]]
  * reproduce any historical cross-table snapshot until expired.
  *
  * Scale: a catalog file is one line per table — KB-sized whatever the
  * data volume — and the publish is one conditional put; contention is
  * arbitrated on metadata, never data. Reference analog: the reference
  * app's single SQLite file IS its whole-database snapshot
  * (pipeline.py's one-connection commit); at lakehouse scale the catalog
  * is the piece that restores that whole-database atomicity.
  */
object Catalog {

  private val CatName = """(\d+)\.catalog""".r

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(
      s.getBytes(StandardCharsets.UTF_8))

  private def unb64(s: String): String =
    new String(java.util.Base64.getDecoder.decode(s),
      StandardCharsets.UTF_8)

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

  /** Current catalog version, from the listing alone (no hint file —
    * catalogs are republished rarely enough that the listing is the
    * source of truth). -1 = no catalog published yet. */
  def version(spark: SparkSession, catalogDir: String): Long = {
    val f = fs(spark, catalogDir)
    val cdir = new Path(catalogDir, "_catalog")
    if (!f.exists(cdir)) return -1L
    f.listStatus(cdir).foldLeft(-1L) { (acc, st) =>
      st.getPath.getName match {
        case CatName(v) => math.max(acc, v.toLong)
        case _          => acc
      }
    }
  }

  /** The pin set of one catalog version: name → (table dir, version). */
  def pinsAt(spark: SparkSession, catalogDir: String,
      v: Long): Map[String, (String, Long)] = {
    if (v < 0) return Map.empty
    val f = fs(spark, catalogDir)
    readSmall(f, new Path(catalogDir, s"_catalog/$v.catalog"))
      .split("\n").toSeq.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val Array(n, d, ver) = l.split("\t", 3)
        unb64(n) -> (unb64(d), ver.toLong)
      }.toMap
  }

  /** The current pin set. */
  def pins(spark: SparkSession,
      catalogDir: String): Map[String, (String, Long)] =
    pinsAt(spark, catalogDir, version(spark, catalogDir))

  /** Publish `newPins` merged over the current pin set as the next
    * catalog version — ONE conditional put, so every pin in the map
    * becomes visible atomically. Each pinned version must already be
    * committed in its table (refused otherwise: a catalog must never
    * point at a version that doesn't exist), and must not move a table
    * BACKWARD relative to its current pin unless `allowRollback` — a
    * publisher that lost a race rebases onto the winner and re-checks,
    * so two transactions pinning disjoint tables both land, while a
    * stale pin of a table someone else advanced fails loudly instead of
    * silently undoing their commit. Returns the committed catalog
    * version. */
  def publish(spark: SparkSession, catalogDir: String,
      newPins: Map[String, (String, Long)],
      allowRollback: Boolean = false): Long = {
    require(newPins.nonEmpty, "publish requires at least one pin")
    newPins.foreach { case (name, (dir, v)) =>
      val committed = ManifestSink.version(spark, dir)
      require(v >= 0 && v <= committed,
        s"cannot pin $name to $dir@v$v: table is at v$committed")
    }
    val f = fs(spark, catalogDir)
    var committed = -1L
    var attempts = 0
    while (committed < 0) {
      val prev = version(spark, catalogDir)
      val base = pinsAt(spark, catalogDir, prev)
      if (!allowRollback) newPins.foreach { case (name, (dir, v)) =>
        base.get(name).foreach { case (curDir, curV) =>
          require(curDir != dir || v >= curV,
            s"stale pin: $name is already at $dir@v$curV, refusing v$v " +
              "(pass allowRollback=true for an explicit rollback)")
        }
      }
      val merged = base ++ newPins
      val lines = Seq(s"#ts=${System.currentTimeMillis}") ++
        merged.toSeq.sortBy(_._1).map { case (n, (d, v)) =>
          s"${b64(n)}\t${b64(d)}\t$v"
        }
      val next = prev + 1
      if (ManifestSink.tryPublishNew(f,
          new Path(catalogDir, s"_catalog/$next.catalog"),
          lines.mkString("\n"))) committed = next
      else {
        attempts += 1
        require(attempts < 1000,
          s"catalog publish at $catalogDir starved: lost $attempts races")
      }
    }
    committed
  }

  /** Every version of `tableDir` pinned by ANY retained catalog version
    * — the protection set for [[ManifestSink.vacuum]]'s
    * `protectVersions`: expiring a table's history must never break a
    * published cross-table snapshot, so vacuum with this set keeps
    * every catalog-reachable manifest (and its data) alive while still
    * reclaiming everything unpinned. Dir equality is resolved through
    * qualified paths, so relative and absolute spellings of the same
    * table agree. Cost: one small-file read per catalog version. */
  def pinnedVersions(spark: SparkSession, catalogDir: String,
      tableDir: String): Seq[Long] = {
    val want = fs(spark, tableDir)
      .makeQualified(new Path(tableDir)).toString
    (0L to version(spark, catalogDir)).flatMap { cv =>
      pinsAt(spark, catalogDir, cv).values.collect {
        case (d, v)
            if fs(spark, d).makeQualified(new Path(d)).toString == want =>
          v
      }
    }.distinct.sorted
  }

  /** Read one table AT ITS PINNED VERSION under the current catalog —
    * the consistent-snapshot read path: resolve every table of a
    * multi-table query through the same catalog version and no
    * in-flight transaction can tear the view. */
  def readTable(spark: SparkSession, catalogDir: String,
      name: String): DataFrame =
    readTableAt(spark, catalogDir, version(spark, catalogDir), name)

  /** [[readTable]] against a HISTORICAL catalog version — cross-table
    * time travel: the pins of catalog version `v` reproduce the exact
    * multi-table snapshot a reader saw then (manifest versions retained
    * permitting, as with any time travel). */
  def readTableAt(spark: SparkSession, catalogDir: String, v: Long,
      name: String): DataFrame = {
    val pinned = pinsAt(spark, catalogDir, v)
    val (dir, tv) = pinned.getOrElse(name,
      throw new NoSuchElementException(
        s"table $name not in catalog $catalogDir@v$v " +
          s"(tables: ${pinned.keys.toSeq.sorted.mkString(", ")})"))
    ManifestSink.readAt(spark, dir, tv)
  }
}
