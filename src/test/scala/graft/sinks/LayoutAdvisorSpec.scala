package graft.sinks

import java.nio.file.Files

import graft.SparkSpec

class LayoutAdvisorSpec extends SparkSpec {
  import spark.implicits._

  test("diagnoses small files / overlap / healthy, and the zorder " +
      "verdict clears after the recommended compaction") {
    val root = Files.createTempDirectory("advisor").toString
    // interleaved: two appends both spanning [1,100] → overlapping ranges
    val inter = root + "/inter"
    ManifestSink.appendWithStats(
      Seq(1L, 50L, 100L).toDF("k"), inter, Seq("k"))
    ManifestSink.appendWithStats(
      Seq(2L, 60L, 99L).toDF("k"), inter, Seq("k"))
    // ranged: two appends with disjoint ranges
    val ranged = root + "/ranged"
    ManifestSink.appendWithStats(Seq(1L, 2L, 3L).toDF("k"), ranged, Seq("k"))
    ManifestSink.appendWithStats(Seq(4L, 5L, 6L).toDF("k"), ranged, Seq("k"))

    def rec(smallRows: Long) = LayoutAdvisor.report(spark,
        Seq("inter" -> inter, "ranged" -> ranged), "k", smallRows)
      .collect().map(r => r.getString(0) -> (r.getLong(4), r.getString(5)))
      .toMap

    val r1 = rec(smallRows = 1L)
    assert(r1("inter") === ((1L, "zorder")))
    assert(r1("ranged") === ((0L, "healthy")))
    // small-file floor outranks clustering
    val r2 = rec(smallRows = 10L)
    assert(r2("inter")._2 === "compact")
    assert(r2("ranged")._2 === "compact")

    // acting on the recommendation clears it: compact(sort by k) rewrites
    // inter as one clustered batch → no overlapping pair, not small
    ManifestSink.compact(spark, inter, statsCols = Seq("k"),
      sortCols = Seq("k"))
    val r3 = rec(smallRows = 1L)
    assert(r3("inter") === ((0L, "healthy")))
  }

  test("tombstone-debt maintenance compacts only over-debt tables") {
    val root = Files.createTempDirectory("advdebt").toString
    val hot = root + "/hot"
    val cold = root + "/cold"
    ManifestSink.append((0L until 100L).toDF("k"), hot)
    ManifestSink.append((0L until 100L).toDF("k"), cold)
    // three MoR operations pile three tombstones onto hot
    ManifestSink.deleteKeysMergeOnRead(Seq(1L, 2L).toDF("k"), hot, Seq("k"))
    ManifestSink.deleteRangeMergeOnRead(spark, hot, "k", Some(90L), None)
    ManifestSink.mergeOnRead(Seq(5L).toDF("k"), hot, Seq("k"))
    assert(ManifestSink.tombstoneDebt(spark, hot)._1 === 3)
    assert(ManifestSink.tombstoneDebt(spark, cold) === ((0, 1)))
    val before = ManifestSink.read(spark, hot)
      .collect().map(_.getLong(0)).sorted.toSeq
    val coldV = ManifestSink.version(spark, cold)
    val acted = LayoutAdvisor.maintainTombstoneDebt(spark,
        Seq("hot" -> hot, "cold" -> cold), maxTombstones = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(3)))
      .toMap
    assert(acted("hot") === ((3L, "compacted")))
    assert(acted("cold") === ((0L, "none")))
    // debt gone, content identical, under-debt table saw no commit
    assert(ManifestSink.tombstoneDebt(spark, hot)._1 === 0)
    assert(ManifestSink.read(spark, hot)
      .collect().map(_.getLong(0)).sorted.toSeq === before)
    assert(ManifestSink.version(spark, cold) === coldV)
  }

  test("applyRecommendations maintains unhealthy tables and leaves " +
      "healthy ones uncommitted") {
    val root = Files.createTempDirectory("advisorapply").toString
    val frag = root + "/frag"
    (1L to 6L).foreach(i =>
      ManifestSink.appendWithStats(Seq(i).toDF("k"), frag, Seq("k")))
    val ranged = root + "/ranged"
    ManifestSink.appendWithStats(Seq(1L, 2L, 3L).toDF("k"), ranged, Seq("k"))
    ManifestSink.appendWithStats(Seq(4L, 5L, 6L).toDF("k"), ranged, Seq("k"))
    val rangedV = ManifestSink.version(spark, ranged)
    val tables = Seq("frag" -> frag, "ranged" -> ranged)
    val acted = LayoutAdvisor
      .applyRecommendations(spark, tables, "k", smallRows = 2L)
      .collect().map(r => r.getString(0) -> r.getString(6)).toMap
    assert(acted === Map("frag" -> "compacted_sorted", "ranged" -> "none"))
    // the maintained table re-reports healthy; content is unchanged
    val after = LayoutAdvisor.report(spark, tables, "k", 2L)
      .collect().map(r => r.getString(0) -> r.getString(5)).toMap
    assert(after === Map("frag" -> "healthy", "ranged" -> "healthy"))
    assert(ManifestSink.read(spark, frag).collect().map(_.getLong(0))
      .sorted.toSeq === (1L to 6L))
    // healthy table saw NO commit
    assert(ManifestSink.version(spark, ranged) === rangedV)
  }

  test("conjunctive multi-column overlap: a column-striped layout is " +
      "healthy, and a 2-D zorder verdict repairs via real compactZOrder") {
    val root = Files.createTempDirectory("advisor2d").toString
    // striped: disjoint on a, fully overlapping on b — no conjunctive
    // range query co-scans the batches, so the 2-col verdict is healthy
    // (a single-column diagnosis on b would demand a recluster)
    val striped = root + "/striped"
    ManifestSink.appendWithStats(
      Seq((1L, 10L), (2L, 90L)).toDF("a", "b"), striped, Seq("a", "b"))
    ManifestSink.appendWithStats(
      Seq((5L, 20L), (6L, 80L)).toDF("a", "b"), striped, Seq("a", "b"))
    // interleaved on BOTH columns: genuinely co-scannable
    val inter = root + "/inter"
    val mk = (off: Long) => (0L until 64L)
      .map(i => (off + i * 3 % 61, off + i * 7 % 61)).toDF("a", "b")
    ManifestSink.appendWithStats(mk(0L), inter, Seq("a", "b"))
    ManifestSink.appendWithStats(mk(1L), inter, Seq("a", "b"))

    val rep = LayoutAdvisor.report(spark,
        Seq("striped" -> striped, "inter" -> inter), Seq("a", "b"), 1L)
      .collect().map(r => r.getString(0) -> (r.getLong(4), r.getString(5)))
      .toMap
    assert(rep("striped") === ((0L, "healthy")))
    assert(rep("inter") === ((1L, "zorder")))
    // single-column-on-b sanity: the stripe WOULD have been misdiagnosed
    assert(LayoutAdvisor.report(spark, Seq("s" -> striped), "b", 1L)
      .head().getString(5) === "zorder")

    val before = ManifestSink.read(spark, inter)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val acted = LayoutAdvisor.applyRecommendations(spark,
        Seq("striped" -> striped, "inter" -> inter), Seq("a", "b"), 1L)
      .collect().map(r => r.getString(0) -> r.getString(6)).toMap
    assert(acted("inter") === "zordered")
    assert(acted("striped") === "none")
    // content identical, and the re-report goes healthy by z-prefix
    // disjointness (every z-bucket pair separates on some dimension)
    assert(ManifestSink.read(spark, inter)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      === before)
    val rep2 = LayoutAdvisor.report(spark, Seq("inter" -> inter),
      Seq("a", "b"), 1L).head()
    assert(rep2.getLong(4) === 0L && rep2.getString(5) === "healthy")
  }

  test("a stats-less batch is range-undecidable and counts as overlapping") {
    val root = Files.createTempDirectory("advisor").toString
    val t = root + "/t"
    ManifestSink.appendWithStats(Seq(1L, 2L).toDF("k"), t, Seq("k"))
    ManifestSink.append(Seq(100L, 200L).toDF("k"), t) // no stats recorded
    val row = LayoutAdvisor.report(spark, Seq("t" -> t), "k", 1L)
      .collect().head
    assert(row.getLong(4) === 1L) // conservative: assumed overlapping
    assert(row.getString(5) === "zorder")
  }
}
