package graft.sinks

import java.nio.file.Files

import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private val attrs = Seq("seg", "tier")

  private def snap(dir: String): Seq[(Long, String, Long, Long, Option[Long], Boolean)] =
    ManifestSink.read(spark, dir)
      .select("k", "seg", "tier", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getBoolean(5))).sortBy(t => (t._1, t._4)).toSeq

  private def updates(rows: (Long, Long, String, Long)*) =
    rows.toDF("k", "seq", "seg", "tier")

  test("batched application equals the single-shot chain") {
    val root = Files.createTempDirectory("scd2").toString
    val all = Seq[(Long, Long, String, Long)](
      (1L, 10L, "a", 1L), (1L, 20L, "a", 1L), // no-change: collapses
      (1L, 30L, "b", 1L), (1L, 40L, "b", 2L), (1L, 50L, "b", 2L),
      (2L, 15L, "x", 9L), (2L, 45L, "y", 9L),
      (3L, 25L, "z", 5L)) // single-version key
    // single-shot
    val one = root + "/one"
    Scd2.applyUpdates(updates(all: _*), one, "k", "seq", attrs)
    // three chronological batches, split mid-run of key 1's "b" phase
    val many = root + "/many"
    Seq(all.filter(_._2 <= 20L), all.filter(u => u._2 > 20L && u._2 <= 40L),
      all.filter(_._2 > 40L)).foreach(b =>
      Scd2.applyUpdates(updates(b: _*), many, "k", "seq", attrs))
    assert(snap(many) === snap(one))
    // the read-optimized copy-on-write path lands the identical table
    val cow = root + "/cow"
    Seq(all.filter(_._2 <= 20L), all.filter(u => u._2 > 20L && u._2 <= 40L),
      all.filter(_._2 > 40L)).foreach(b =>
      Scd2.applyUpdates(updates(b: _*), cow, "k", "seq", attrs,
        copyOnWrite = true))
    assert(snap(cow) === snap(one))
    // the collapsed chain: key 1 has versions at 10 (a,1), 30 (b,1),
    // 40 (b,2) — the no-change updates at 20 and 50 created none
    assert(snap(one).filter(_._1 == 1L).map(_._4) === Seq(10L, 30L, 40L))
    assert(snap(one).count(_._6) === 3) // one current row per key
  }

  test("exact epoch replay is a no-op at every crash point") {
    val root = Files.createTempDirectory("scd2r").toString
    val dir = root + "/dim"
    val b1 = updates((1L, 10L, "a", 1L), (1L, 20L, "a", 1L))
    // b2's last update COLLAPSES (equal attrs), so the stored current
    // valid_from (30) is older than the batch's max seq (40) — the
    // replay must still be a no-op through the dedup, not staleness
    val b2 = updates((1L, 30L, "b", 1L), (1L, 40L, "b", 1L),
      (2L, 35L, "x", 2L))
    Scd2.applyUpdates(b1, dir, "k", "seq", attrs)
    Scd2.applyUpdates(b2, dir, "k", "seq", attrs)
    val once = snap(dir)
    val vOnce = ManifestSink.version(spark, dir)
    Scd2.applyUpdates(b2, dir, "k", "seq", attrs) // replay last epoch
    assert(snap(dir) === once)
    Scd2.applyUpdates(b1, dir, "k", "seq", attrs) // replay an OLD epoch
    assert(snap(dir) === once)
    // replays commit NOTHING — the version number itself is stable
    assert(ManifestSink.version(spark, dir) === vOnce)
    // and replay must not block genuinely new versions afterwards
    Scd2.applyUpdates(updates((1L, 50L, "c", 1L)), dir, "k", "seq", attrs)
    assert(snap(dir).filter(_._1 == 1L).map(_._4) === Seq(10L, 30L, 50L))
  }

  test("a real AvailableNow stream maintains the dimension exactly-once") {
    val root = Files.createTempDirectory("scd2st").toString
    val dir = root + "/dim"
    // five chronological epochs over two keys, with a no-change update
    // (seq 3) and an attribute flip-back (key 1: a -> b -> a)
    val rows = Seq((1L, 1L, "a", 1L), (1L, 2L, "b", 1L), (2L, 3L, "x", 9L),
      (2L, 4L, "x", 9L), (1L, 5L, "a", 1L))
    val srcDir = Files.createTempDirectory("scd2_src").toString
    rows.zipWithIndex.foreach { case ((k, seq, seg, tier), i) =>
      Files.write(java.nio.file.Paths.get(srcDir, f"f$i%02d.csv"),
        s"$k,$seq,$seg,$tier\n".getBytes("UTF-8"))
    }
    val ckpt = Files.createTempDirectory("scd2_ckpt").toString
    import org.apache.spark.sql.types._
    def run(): Unit = {
      val q = spark.readStream
        .schema(StructType(Seq(StructField("k", LongType),
          StructField("seq", LongType), StructField("seg", StringType),
          StructField("tier", LongType))))
        .option("maxFilesPerTrigger", 1)
        .csv(srcDir)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          Scd2.applyUpdates(b, dir, "k", "seq", attrs)
          ()
        }
        .start()
      q.awaitTermination(120000L)
    }
    run()
    // streamed epochs == the single-shot chain
    val one = Files.createTempDirectory("scd2st1").toString + "/one"
    Scd2.applyUpdates(updates(rows: _*), one, "k", "seq", attrs)
    assert(snap(dir) === snap(one))
    assert(snap(dir).filter(_._1 == 1L).map(_._4) === Seq(1L, 2L, 5L))
    // full checkpoint replay: no new files -> no epochs -> no commits
    val vAfter = ManifestSink.version(spark, dir)
    run()
    assert(ManifestSink.version(spark, dir) === vAfter)
  }

  test("stale updates drop; closed history is immutable; asOf probes") {
    val root = Files.createTempDirectory("scd2s").toString
    val dir = root + "/dim"
    Scd2.applyUpdates(updates((1L, 100L, "a", 1L), (1L, 200L, "b", 1L)),
      dir, "k", "seq", attrs)
    val before = snap(dir)
    // a batch entirely at/before the current valid_from: no new version,
    // history byte-identical
    Scd2.applyUpdates(updates((1L, 150L, "zzz", 7L), (1L, 200L, "w", 0L)),
      dir, "k", "seq", attrs)
    assert(snap(dir) === before)
    // a fresh update closes the current row in place
    Scd2.applyUpdates(updates((1L, 300L, "c", 1L)), dir, "k", "seq", attrs)
    val after = snap(dir)
    assert(after.map(t => (t._4, t._5)) ===
      Seq((100L, Some(200L)), (200L, Some(300L)), (300L, None)))
    // asOf: exactly one row per key, interval containment
    assert(Scd2.asOf(spark, dir, 250L).select("seg").as[String]
      .collect().toSeq === Seq("b"))
    assert(Scd2.asOf(spark, dir, 99L).count() === 0)
    assert(Scd2.asOf(spark, dir, 300L).select("seg").as[String]
      .collect().toSeq === Seq("c"))
    // duplicate (key, seq) within a batch refuses loudly
    val err = intercept[IllegalArgumentException] {
      Scd2.applyUpdates(updates((5L, 1L, "a", 1L), (5L, 1L, "b", 1L)),
        dir, "k", "seq", attrs)
    }
    assert(err.getMessage.contains("unique"))
  }
}
