package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.streaming.Trigger

import graft.GraftConfig
import graft.SparkSpec
import graft.sinks.{Catalog, ManifestSink}

/** Per-epoch catalog publication on the late-aware exactly-once path:
  * every published catalog version must pin a CONSISTENT (main, late)
  * pair — the union of the two tables at any catalog version is an
  * exact epoch prefix of the input, never a torn epoch — and replay
  * publishes nothing new (catalog versions track progress, not
  * triggers). */
class EpochCatalogSpec extends SparkSpec {

  private val lateIdx = Set(3, 7)

  private def line(i: Int): String = {
    val dt =
      if (lateIdx(i)) f"2026-01-08T21:00:${i}%02dZ"
      else f"2026-01-08T22:${i}%02d:00Z"
    f"""{"meta":{"dt":"$dt"},"type":"edit","title":"T$i%02d",""" +
      """"title_url":"u","user":"Eve","bot":false,""" +
      """"length":{"old":1,"new":2},"wiki":"enwiki"}"""
  }

  test("every catalog version pins an exact epoch prefix; replay is silent") {
    val srcDir = Files.createTempDirectory("ec_src").toString
    val sinkDir = Files.createTempDirectory("ec_sink").toString + "/t"
    val lateDir = Files.createTempDirectory("ec_late").toString + "/l"
    val catDir = Files.createTempDirectory("ec_cat").toString + "/c"
    val ckpt = Files.createTempDirectory("ec_ckpt").toString

    val mtimeBase = System.currentTimeMillis() - 120000L
    (0 until 12).foreach { i =>
      val f = Files.write(Paths.get(srcDir, f"b$i%02d.jsonl"),
        line(i).getBytes("UTF-8"))
      // distinct increasing mtimes: epoch i carries file i (the file
      // source orders by modification time)
      Files.setLastModifiedTime(f,
        java.nio.file.attribute.FileTime.fromMillis(mtimeBase + i * 1000L))
    }

    def run(): Unit = {
      val q = WikiStream.startExactlyOnce(spark, srcDir, sinkDir, ckpt,
        GraftConfig(), trigger = Some(Trigger.AvailableNow()),
        lateDir = lateDir, maxFilesPerTrigger = 1, catalogDir = catDir)
      try q.awaitTermination(180000L) finally q.stop()
    }
    run()

    val all = (0 until 12).map(i => f"T$i%02d")
    def titlesAt(cv: Long, name: String): Seq[String] = {
      val pins = Catalog.pinsAt(spark, catDir, cv)
      if (!pins.contains(name)) Nil
      else Catalog.readTableAt(spark, catDir, cv, name)
        .select("title").collect().map(_.getString(0)).toSeq
    }

    val finalCv = Catalog.version(spark, catDir)
    assert(finalCv >= 0, "no catalog version was ever published")
    // every published version is an exact PREFIX of the epoch sequence
    var prevN = -1
    (0L to finalCv).foreach { cv =>
      val union = titlesAt(cv, "main") ++ titlesAt(cv, "late")
      assert(union.size === union.distinct.size,
        s"catalog v$cv shows doubled rows")
      assert(union.sorted === all.take(union.size),
        s"catalog v$cv is not an epoch prefix: ${union.sorted}")
      assert(union.size >= prevN, s"catalog v$cv went backward")
      prevN = union.size
    }
    // the final version carries everything, stragglers on the late side
    assert((titlesAt(finalCv, "main") ++ titlesAt(finalCv, "late"))
      .sorted === all)
    assert(lateIdx.map(i => f"T$i%02d")
      .subsetOf(titlesAt(finalCv, "late").toSet))
    // final pins == current table versions (the catalog caught up)
    assert(Catalog.pins(spark, catDir)("main")._2 ===
      ManifestSink.version(spark, sinkDir))
    assert(Catalog.pins(spark, catDir)("late")._2 ===
      ManifestSink.version(spark, lateDir))

    // replay: same checkpoint, no new input — tables and catalog silent
    run()
    assert(Catalog.version(spark, catDir) === finalCv,
      "a fully-replayed run published catalog churn")
    assert((titlesAt(finalCv, "main") ++ titlesAt(finalCv, "late"))
      .sorted === all)
  }
}
