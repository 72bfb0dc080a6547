package graft.sinks

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.SparkSession

/** METADATA-scale sweep — the axis the data-scale sweep
  * ([[graft.ScaleSweep]]) does not touch: how commit, planning, and
  * version resolution cost grow with ENTRIES PER TABLE (E — at the
  * 100 TB shape ~400 k files) and VERSIONS PER TABLE (V — a 2 s
  * streaming commit loop makes tens of thousands per day).
  *
  * The legacy full-snapshot-per-commit format makes an APPEND cost
  * O(E): it re-reads and re-writes the whole entry list to add one
  * line. The delta-manifest log ([[ManifestSink.manifestCheckpointEvery]])
  * makes it O(batch + E/checkpointEvery amortized): deltas carry only
  * their own lines, every Nth commit writes the full checkpoint.
  * This main MEASURES both shapes side by side — commit wall, manifest
  * bytes written, head-resolution wall, version() wall — with
  * synthetic entry lines (no data files: data write cost is identical
  * in both shapes and would only blur the metadata numbers).
  *
  * Usage: `runMain graft.sinks.MetaSweep`. One JSON line per
  * (entries, checkpointEvery) cell plus one deep-history line.
  */
object MetaSweep {

  // walk streams closed deterministically (directory handles otherwise
  // live until GC — 8 sweep cells × hundreds of files adds up)
  private def rmTree(p: Path): Unit = {
    if (!Files.exists(p)) return
    val s = Files.walk(p)
    try s.sorted(Comparator.reverseOrder()).forEach(q => Files.delete(q))
    finally s.close()
  }

  private def dirBytes(p: Path): Long = {
    if (!Files.exists(p)) return 0L
    val s = Files.walk(p)
    try s.filter(Files.isRegularFile(_)).mapToLong(Files.size(_)).sum()
    finally s.close()
  }

  private def num(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  private def medianOf(reps: Int)(f: => Unit): Double = {
    val xs = (0 until reps).map(_ => time(f)).sorted
    xs(reps / 2)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val saved = ManifestSink.manifestCheckpointEvery
    try run(spark)
    finally {
      ManifestSink.manifestCheckpointEvery = saved
      spark.stop()
    }
  }

  private def run(spark: SparkSession): Unit = {
    val batchLines = 1000
    // a representative stat-carrying entry line (~60 B), one per file
    def lines(commit: Int): Seq[String] =
      (0 until batchLines).map(j =>
        ManifestSink.Entry(s"data/f$commit-$j",
          Map("rows" -> ManifestSink.ColStats('l', "4096", "4096"))).line)

    for (e <- Seq(10000, 100000, 400000); every <- Seq(1, 16)) {
      val root = Files.createTempDirectory(s"meta-$e-$every")
      val dir = root.resolve("t").toString
      ManifestSink.manifestCheckpointEvery = every
      try {
        val commits = e / batchLines
        val build = time {
          (0 until commits).foreach(i =>
            ManifestSink.commitAppendLines(spark, dir, lines(i), Map.empty))
        }
        val mBytes = dirBytes(Paths.get(dir, "_manifests"))
        val commitOne = medianOf(5) {
          ManifestSink.commitAppendLines(spark, dir,
            Seq(ManifestSink.Entry(s"data/one-${System.nanoTime()}",
              Map.empty).line), Map.empty)
        }
        val resolve = medianOf(5) {
          ManifestSink.manifestEntries(spark, dir,
            ManifestSink.version(spark, dir))
        }
        val ver = medianOf(5)(ManifestSink.version(spark, dir))
        println(s"""{"meta":"E","entries":$e,"checkpoint_every":$every,""" +
          s""""commits":$commits,"build_s":${num(build)},""" +
          s""""manifest_mb":${num(mBytes / 1e6)},""" +
          s""""commit1_s":${num(commitOne)},""" +
          s""""resolve_s":${num(resolve)},"version_s":${num(ver)}}""")
      } finally rmTree(root)
    }

    // deep-history axis: V one-line commits (the streaming dribble) —
    // in delta mode the remaining per-commit cost is version()'s
    // directory listing, O(V) names per call
    for (v <- Seq(1000, 10000)) {
      val root = Files.createTempDirectory(s"meta-v$v")
      val dir = root.resolve("t").toString
      ManifestSink.manifestCheckpointEvery = 16
      try {
        val build = time {
          (0 until v).foreach(i =>
            ManifestSink.commitAppendLines(spark, dir,
              Seq(ManifestSink.Entry(s"data/d$i", Map.empty).line),
              Map.empty))
        }
        val ver = medianOf(5)(ManifestSink.version(spark, dir))
        val resolve = medianOf(5) {
          ManifestSink.manifestEntries(spark, dir,
            ManifestSink.version(spark, dir))
        }
        val mBytes = dirBytes(Paths.get(dir, "_manifests"))
        // the audit surface over the whole log (q172/q187): one
        // incremental walk, O(V) reads
        val hist = time(ManifestSink.history(spark, dir).collect())
        println(s"""{"meta":"V","versions":$v,"build_s":${num(build)},""" +
          s""""manifest_mb":${num(mBytes / 1e6)},""" +
          s""""version_s":${num(ver)},"resolve_s":${num(resolve)},""" +
          s""""history_s":${num(hist)}}""")
      } finally rmTree(root)
    }
  }
}
