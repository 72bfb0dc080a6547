package graft.sinks

import java.nio.file.Files

import graft.SparkSpec

class NdvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("per-entry KMV sketches merge to the table NDV from metadata " +
      "alone; exact below k; cross-batch duplicates never double-count") {
    val dir = Files.createTempDirectory("ndv").toString + "/t"
    // three appends with OVERLAPPING user sets: u0..u9, u5..u14, u10..u19
    // → 20 distinct users, 30 rows
    ManifestSink.appendWithStats(
      (0 until 10).map(i => s"u$i").toDF("u"), dir, Seq("u"),
      ndvCols = Seq("u"))
    ManifestSink.appendWithStats(
      (5 until 15).map(i => s"u$i").toDF("u"), dir, Seq("u"),
      ndvCols = Seq("u"))
    ManifestSink.appendWithStats(
      (10 until 20).map(i => s"u$i").toDF("u"), dir, Seq("u"),
      ndvCols = Seq("u"))
    // 20 < k=128 → the merged sketch is EXACT
    assert(ManifestSink.ndvEstimate(spark, dir, "u") === Some(20.0))
    // a column without sketches answers None, not a guess
    assert(ManifestSink.ndvEstimate(spark, dir, "missing") === None)
  }

  test("ndvOverlap: exact Jaccard/intersection below k; None when a " +
      "side lacks sketches") {
    val root = Files.createTempDirectory("ndvov").toString
    val a = root + "/a"
    val b = root + "/b"
    // A = u0..u29, B = u20..u49 → |A∩B| = 10, |A∪B| = 50, J = 0.2
    ManifestSink.appendWithStats((0 until 30).map(i => s"u$i").toDF("k"),
      a, Seq("k"), ndvCols = Seq("k"))
    ManifestSink.appendWithStats((20 until 50).map(i => s"u$i").toDF("k"),
      b, Seq("k"), ndvCols = Seq("k"))
    val (j, inter, union) = ManifestSink.ndvOverlap(spark, a, "k", b, "k").get
    assert(j === 0.2)
    assert(inter === 10.0)
    assert(union === 50.0)
    // disjoint sides → zero overlap
    val c = root + "/c"
    ManifestSink.appendWithStats((100 until 110).map(i => s"u$i").toDF("k"),
      c, Seq("k"), ndvCols = Seq("k"))
    assert(ManifestSink.ndvOverlap(spark, a, "k", c, "k").get._1 === 0.0)
    // a sketch-less side degrades to None
    val d = root + "/d"
    ManifestSink.append(Seq("x").toDF("k"), d)
    assert(ManifestSink.ndvOverlap(spark, a, "k", d, "k") === None)
  }

  test("full sketches estimate within KMV error; a sketch-less entry " +
      "degrades to None") {
    val dir = Files.createTempDirectory("ndvfull").toString + "/t"
    val n = 5000
    ManifestSink.appendWithStats(
      (0 until n).map(i => s"user_$i").toDF("u"), dir, Seq("u"),
      ndvCols = Seq("u"))
    val est = ManifestSink.ndvEstimate(spark, dir, "u").get
    // k=128 → standard error ~1/sqrt(k) ≈ 9%; allow 4 sigma
    assert(math.abs(est - n) / n < 0.36, s"estimate $est vs $n")
    // an append WITHOUT the sketch makes table NDV unanswerable from
    // metadata (absence degrades, never silently underestimates)
    ManifestSink.append(Seq("another").toDF("u"), dir)
    assert(ManifestSink.ndvEstimate(spark, dir, "u") === None)
  }

  test("joinPlan decides broadcast/prefilter/shuffle from metadata and " +
      "degrades to None when a side lacks sketches") {
    val root = Files.createTempDirectory("jplan").toString
    def mk(name: String, vals: Seq[Long]): String = {
      val d = root + "/" + name
      ManifestSink.appendWithStats(vals.toDF("k"), d, Seq("k"),
        ndvCols = Seq("k"))
      d
    }
    val big = mk("big", (1L to 100L) ++ (1L to 100L)) // 200 rows, 100 keys
    val dim = mk("dim", 1L to 100L)                    // full overlap
    val low = mk("low", 1L to 2L)                      // 2% of big's keys
    // broadcast: the 100-row dim fits under the floor
    assert(ManifestSink.joinPlan(spark, big, "k", dim, "k", 100L)
      .get.strategy === "broadcast")
    // shuffle: both sides over the floor, keys coextensive
    assert(ManifestSink.joinPlan(spark, big, "k", dim, "k", 50L)
      .get.strategy === "shuffle")
    // prefilter: overlap is 2 of big's 100 keys — under the 1/20 rule
    val p = ManifestSink.joinPlan(spark, big, "k", low, "k", 1L).get
    assert(p.strategy === "prefilter_semi")
    // exact-below-k sketches make the estimate exact: 200/100 * 2/2 * 2
    assert(p.estJoinRows === 4.0)
    // a side without sketches can't be planned from metadata
    val bare = root + "/bare"
    ManifestSink.append((1L to 10L).toDF("k"), bare)
    assert(ManifestSink.joinPlan(spark, big, "k", bare, "k", 1L) === None)
  }
}
