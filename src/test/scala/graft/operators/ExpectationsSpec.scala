package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import graft.sinks.ManifestSink
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private def reportMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap

  test("row-local report: one pass, per-constraint counts, honest pass") {
    val df = Seq(
      (1L, 10.0, "A"), (2L, -5.0, "A"), (3L, 200.0, "Z"), (4L, 30.0, "R")
    ).toDF("id", "v", "flag")
    val rep = reportMap(Expectations.report(df, Seq(
      Expectations.inRange("v_in_range", col("v"), 0, 100),
      Expectations.matches("flag_vocab", col("flag"), "^[AR]$"),
      Expectations.notNull("id_not_null", col("id")))))
    assert(rep("v_in_range") === ((2L, 4L, false)))
    assert(rep("flag_vocab") === ((1L, 4L, false)))
    assert(rep("id_not_null") === ((0L, 4L, true)))
  }

  test("quarantine splits exactly, labels with the FIRST failed " +
      "expectation in declaration order") {
    val df = Seq(
      (1L, 10.0, "A"),   // clean
      (2L, -5.0, "A"),   // fails range (declared first)
      (3L, 200.0, "Z"),  // fails range AND vocab → labeled range
      (4L, 30.0, "Z")    // fails vocab only
    ).toDF("id", "v", "flag")
    val (pass, quar) = Expectations.quarantine(df, Seq(
      Expectations.inRange("v_in_range", col("v"), 0, 100),
      Expectations.matches("flag_vocab", col("flag"), "^[AR]$")))
    assert(pass.collect().map(_.getLong(0)).toSet === Set(1L))
    val labels = quar.collect()
      .map(r => r.getLong(0) -> r.getAs[String]("failed_expectation"))
      .toMap
    assert(labels === Map(2L -> "v_in_range", 3L -> "v_in_range",
      4L -> "flag_vocab"))
    // split is a partition: nothing lost, nothing duplicated
    assert(pass.count() + quar.count() === df.count())
  }

  test("incremental row-local gate folds only the delta and matches " +
      "the full recompute") {
    val dir = Files.createTempDirectory("expinc").toString + "/t"
    val exps = Seq(
      Expectations.inRange("v_in_range", col("v"), 0, 100),
      Expectations.notNull("id_not_null", col("id")))
    val v0 = ManifestSink.append(
      Seq((1L, 10.0), (2L, -5.0)).toDF("id", "v"), dir)
    val s0 = Expectations.refreshRowLocal(spark, None, dir, -1L, v0, exps)
    assert(reportMap(s0)("v_in_range") === ((1L, 2L, false)))
    val v1 = ManifestSink.append(
      Seq((3L, 300.0), (4L, 40.0), (5L, 50.0)).toDF("id", "v"), dir)
    val s1 = Expectations.refreshRowLocal(spark, Some(s0), dir, v0, v1, exps)
    // fold == full recompute over the snapshot
    val full = reportMap(Expectations.report(
      ManifestSink.read(spark, dir), exps))
    assert(reportMap(s1) === full)
    assert(reportMap(s1)("v_in_range") === ((2L, 5L, false)))
    // no-change refresh is an exact no-op
    val s2 = Expectations.refreshRowLocal(spark, Some(s1), dir, v1, v1, exps)
    assert(reportMap(s2) === reportMap(s1))
    // a rewrite retracts history → the fold refuses
    val v2 = ManifestSink.replace(Seq((9L, 1.0)).toDF("id", "v"), dir)
    intercept[IllegalArgumentException] {
      Expectations.refreshRowLocal(spark, Some(s1), dir, v1, v2, exps)
    }
  }

  test("incremental uniqueness: per-key state folds appends; cross-batch " +
      "duplicates surface that a per-batch check would miss") {
    val dir = Files.createTempDirectory("expuni").toString + "/t"
    val keys = Seq("k")
    val v0 = ManifestSink.append(Seq(1L, 2L, 3L).toDF("k"), dir)
    val st0 = Expectations.refreshUnique(spark, None, dir, -1L, v0, keys)
    assert(reportMap(Expectations.uniqueReportFromState(st0, "k_unique"))
      ("k_unique") === ((0L, 3L, true)))
    // batch 2 is internally duplicate-free but repeats key 2 → only the
    // folded cross-batch state can see the violation
    val v1 = ManifestSink.append(Seq(2L, 4L).toDF("k"), dir)
    val st1 = Expectations.refreshUnique(spark, Some(st0), dir, v0, v1, keys)
    val rep = reportMap(
      Expectations.uniqueReportFromState(st1, "k_unique"))("k_unique")
    assert(rep === ((1L, 5L, false)))
    // state-implied report == unique() run on the full snapshot
    val full = reportMap(Expectations.unique(
      ManifestSink.read(spark, dir), "k_unique", keys))("k_unique")
    assert(rep === full)
  }
}
