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
