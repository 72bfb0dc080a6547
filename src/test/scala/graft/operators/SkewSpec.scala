package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val skewed = spark.range(0, 10000)
    .select(when($"id" < 9000, lit("hot")).otherwise(concat(lit("k"), $"id"))
      .as("key"), $"id".as("v"))

  test("salted count equals plain count per key") {
    val plain = skewed.groupBy($"key").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(skewed, "key")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
    assert(salted("hot") === 9000L)
  }

  test("salted join equals plain join") {
    val small = Seq(("hot", 1.0), ("k9001", 2.0)).toDF("key", "w")
    val plain = skewed.join(small, "key").agg(
      count(lit(1)), sum($"v" * $"w")).head()
    val salted = Skew.saltJoin(skewed, small, "key").agg(
      count(lit(1)), sum($"v" * $"w")).head()
    assert(salted.getLong(0) === plain.getLong(0))
    assert(salted.getDouble(1) === plain.getDouble(1))
  }

  test("planAwareStarJoin: selective edge first, stat-less edge last, " +
      "rows equal the plain join") {
    import graft.sinks.ManifestSink
    val root = java.nio.file.Files
      .createTempDirectory("graft_star").toString
    val fact = root + "/fact"
    // 1000 fact rows over 100 k-keys, 10 s-keys, 50 u-keys
    val f = spark.range(0, 1000).select($"id".as("fid"),
      ($"id" % 100).as("fk"), ($"id" % 10).as("fs"), ($"id" % 50).as("fu"))
    ManifestSink.appendWithStats(f, fact, Seq("fk"),
      ndvCols = Seq("fk", "fs", "fu"))
    // dk: 25 rows but only 4 of the 100 keys — above the broadcast
    // threshold, low key overlap → selective prefilter edge
    val dSel = root + "/sel"
    ManifestSink.appendWithStats(
      spark.range(0, 25).select(($"id" % 4).as("dk"), lit("sel").as("sv")),
      dSel, Seq("dk"), ndvCols = Seq("dk"))
    // ds: 10 rows ≤ broadcast threshold → broadcast edge, fanout 1
    val dBc = root + "/bc"
    ManifestSink.appendWithStats(
      spark.range(0, 10).select($"id".as("ds"), lit("bc").as("bv")),
      dBc, Seq("ds"), ndvCols = Seq("ds"))
    // du: NO ndv stats → no verdict → unplanned, must run LAST
    val dNo = root + "/no"
    ManifestSink.append(
      spark.range(0, 50).select($"id".as("du"), lit("no").as("nv")), dNo)
    val (joined, steps) = Skew.planAwareStarJoin(spark, fact, Seq(
      Skew.DimSpec(dNo, "fu", "du"),
      Skew.DimSpec(dBc, "fs", "ds"),
      Skew.DimSpec(dSel, "fk", "dk")), broadcastRows = 20)
    assert(steps.map(_.strategy) ===
      Seq("prefilter_semi", "broadcast", "unplanned"))
    assert(steps.map(_.factKey) === Seq("fk", "fs", "fu"))
    val plain = ManifestSink.read(spark, fact)
      .join(ManifestSink.read(spark, dSel), $"fk" === $"dk")
      .join(ManifestSink.read(spark, dBc), $"fs" === $"ds")
      .join(ManifestSink.read(spark, dNo), $"fu" === $"du")
    assert(joined.count() === plain.count())
    assert(joined.agg(sum($"fid")).head().getLong(0) ===
      plain.agg(sum($"fid")).head().getLong(0))
    assert(joined.columns.sorted === plain.columns.sorted)
  }

  test("planAwareStarJoin refuses clashing column names") {
    import graft.sinks.ManifestSink
    val root = java.nio.file.Files
      .createTempDirectory("graft_star_clash").toString
    ManifestSink.append(
      spark.range(0, 5).select($"id".as("k"), lit(1).as("x")), root + "/f")
    ManifestSink.append(
      spark.range(0, 5).select($"id".as("dk"), lit(2).as("x")), root + "/d")
    val e = intercept[IllegalArgumentException] {
      Skew.planAwareStarJoin(spark, root + "/f",
        Seq(Skew.DimSpec(root + "/d", "k", "dk")), 10)
    }
    assert(e.getMessage.contains("disjoint"))
  }
}
