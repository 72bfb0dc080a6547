package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.sinks.ManifestSink

/** Crash-kill e2e (r11 ask #5): SIGKILL a LIVE exactly-once streaming
  * query mid-epoch — real process death in a separate JVM, not a
  * simulated replay — restart it from the same checkpoint, and assert
  * the exactly-once contract ACROSS main + dead-letter tables: every
  * input row lands in exactly one of the two, none lost, none doubled.
  * This exercises the marker-per-table crash-window logic
  * ([[LateDataChannel]] late-side-first + `appendOnceWithHeader`) at
  * whatever commit point the kill happens to land on: 40 single-file
  * epochs give the kill a wide window population (mid parquet write,
  * between the late and main commits, after main before checkpoint
  * advance, …) and the invariant must hold for ALL of them. */
class CrashKillSpec extends SparkSpec {

  /** classpath for the child JVM, derived from live classes — the graft
    * build output plus the Spark distribution jars. */
  private def childClasspath: String = {
    val classesDir = Paths.get(WikiStream.getClass // main classes dir
      .getProtectionDomain.getCodeSource.getLocation.toURI)
    val sparkJar = Paths.get(classOf[org.apache.spark.SparkContext]
      .getProtectionDomain.getCodeSource.getLocation.toURI)
    s"$classesDir:${sparkJar.getParent}/*"
  }

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def launchChild(logTo: java.io.File,
      args: String*): Process = {
    val java = Paths.get(System.getProperty("java.home"), "bin", "java")
    val cmd = (Seq(java.toString) ++ addOpens ++
      Seq("-Xmx2g", "-cp", childClasspath,
        "graft.streaming.CrashChild") ++ args)
    new ProcessBuilder(cmd: _*)
      .redirectErrorStream(true).redirectOutput(logTo).start()
  }

  test("SIGKILL mid-epoch + checkpoint restart: no lost, no doubled " +
      "rows across main + dead-letter") {
    val srcDir = Files.createTempDirectory("ck_src").toString
    val sinkDir = Files.createTempDirectory("ck_sink").toString + "/t"
    val lateDir = Files.createTempDirectory("ck_late").toString + "/l"
    val ckpt = Files.createTempDirectory("ck_ckpt").toString
    val log = Files.createTempFile("ck_child", ".log").toFile

    // 40 one-event files = 40 epochs (child runs maxFilesPerTrigger=1).
    // Unique titles T00..T39; event times step forward one minute per
    // file except three LATE stragglers carrying times an hour behind —
    // behind any watermark the channel will have established by then.
    val lateFiles = Set(25, 30, 35)
    def line(i: Int): String = {
      val dt =
        if (lateFiles(i)) f"2026-01-08T21:00:${i}%02dZ"
        else f"2026-01-08T22:${i}%02d:00Z"
      f"""{"meta":{"dt":"$dt"},"type":"edit","title":"T$i%02d","""  +
        """"title_url":"u","user":"Eve","bot":false,""" +
        """"length":{"old":1,"new":2},"wiki":"enwiki"}"""
    }
    val mtimeBase = System.currentTimeMillis() - 120000L
    (0 until 40).foreach { i =>
      val f = Files.write(Paths.get(srcDir, f"b$i%02d.jsonl"),
        line(i).getBytes("UTF-8"))
      // the file source orders by modification time: pin DISTINCT,
      // increasing mtimes so epoch i always carries file i (written in
      // one tight loop they would otherwise tie within a clock tick)
      Files.setLastModifiedTime(f,
        java.nio.file.attribute.FileTime.fromMillis(mtimeBase + i * 1000L))
    }

    // run 1: live stream; kill it WHILE COMMITTING, once the sink shows
    // ~8 landed epochs (well before the 40th — the stream is mid-flight)
    val p1 = launchChild(log, srcDir, sinkDir, lateDir, ckpt, "run")
    try {
      val deadline = System.nanoTime() + 180L * 1000000000L
      var v = -1L
      while (v < 8 && System.nanoTime() < deadline) {
        Thread.sleep(100)
        v = try ManifestSink.version(spark, sinkDir)
            catch { case _: Throwable => -1L }
      }
      assert(v >= 8, s"child never reached 8 sink versions (log: $log)")
    } finally {
      p1.destroyForcibly() // SIGKILL — no shutdown hooks, no flush
      p1.waitFor()
    }
    val vAtKill = ManifestSink.version(spark, sinkDir)

    // run 2: same checkpoint, AvailableNow — drain the rest and exit
    val p2 = launchChild(log, srcDir, sinkDir, lateDir, ckpt, "finish")
    assert(p2.waitFor(300, java.util.concurrent.TimeUnit.SECONDS) &&
        p2.exitValue() === 0,
      s"finish run failed (log: ${scala.io.Source.fromFile(log)
        .getLines().toSeq.takeRight(25).mkString("\n")})")
    assert(ManifestSink.version(spark, sinkDir) > vAtKill,
      "finish run committed nothing — the kill landed after completion?")

    // THE contract: main ∪ late = all 40 inputs, disjoint, exactly once
    val main = ManifestSink.read(spark, sinkDir)
      .select("title").collect().map(_.getString(0)).toSeq
    val late = ManifestSink.read(spark, lateDir)
      .select("title").collect().map(_.getString(0)).toSeq
    val all = (0 until 40).map(i => f"T$i%02d")
    assert(main.size === main.distinct.size,
      s"doubled rows in main: ${main.diff(main.distinct)}")
    assert(late.size === late.distinct.size,
      s"doubled rows in dead-letter: ${late.diff(late.distinct)}")
    assert(main.intersect(late).isEmpty,
      s"rows landed in BOTH tables: ${main.intersect(late)}")
    assert((main ++ late).sorted === all,
      s"lost rows: ${all.diff(main ++ late)}; " +
        s"unexpected: ${(main ++ late).diff(all)}")
    // the stragglers are late by construction — they must be in the
    // dead-letter table, not silently dropped by any watermark
    assert(Set("T25", "T30", "T35").subsetOf(late.toSet),
      s"straggler rows missing from dead-letter: $late")
  }

  test("SIGKILL with the per-epoch catalog: every published catalog " +
      "version stays an exact epoch prefix across real process death") {
    import graft.sinks.Catalog
    val srcDir = Files.createTempDirectory("ckc_src").toString
    val sinkDir = Files.createTempDirectory("ckc_sink").toString + "/t"
    val lateDir = Files.createTempDirectory("ckc_late").toString + "/l"
    val catDir = Files.createTempDirectory("ckc_cat").toString + "/c"
    val ckpt = Files.createTempDirectory("ckc_ckpt").toString
    val log = Files.createTempFile("ckc_child", ".log").toFile

    val lateFiles = Set(7, 13)
    def line(i: Int): String = {
      val dt =
        if (lateFiles(i)) f"2026-01-08T21:00:${i}%02dZ"
        else f"2026-01-08T22:${i}%02d:00Z"
      f"""{"meta":{"dt":"$dt"},"type":"edit","title":"T$i%02d",""" +
        """"title_url":"u","user":"Eve","bot":false,""" +
        """"length":{"old":1,"new":2},"wiki":"enwiki"}"""
    }
    val mtimeBase = System.currentTimeMillis() - 120000L
    (0 until 20).foreach { i =>
      val f = Files.write(Paths.get(srcDir, f"b$i%02d.jsonl"),
        line(i).getBytes("UTF-8"))
      Files.setLastModifiedTime(f,
        java.nio.file.attribute.FileTime.fromMillis(mtimeBase + i * 1000L))
    }

    // run 1: kill once the CATALOG (not just the sink) shows progress —
    // the kill then lands somewhere inside commit-late / commit-main /
    // publish-catalog with live epochs on both sides of it
    val p1 = launchChild(log, srcDir, sinkDir, lateDir, ckpt, "run", catDir)
    try {
      val deadline = System.nanoTime() + 180L * 1000000000L
      var cv = -1L
      while (cv < 4 && System.nanoTime() < deadline) {
        Thread.sleep(100)
        cv = try Catalog.version(spark, catDir)
             catch { case _: Throwable => -1L }
      }
      assert(cv >= 4, s"child never reached 4 catalog versions (log: $log)")
    } finally {
      p1.destroyForcibly()
      p1.waitFor()
    }

    // run 2: drain from the same checkpoint
    val p2 = launchChild(log, srcDir, sinkDir, lateDir, ckpt, "finish",
      catDir)
    assert(p2.waitFor(300, java.util.concurrent.TimeUnit.SECONDS) &&
        p2.exitValue() === 0,
      s"finish run failed (log: ${scala.io.Source.fromFile(log)
        .getLines().toSeq.takeRight(25).mkString("\n")})")

    val all = (0 until 20).map(i => f"T$i%02d")
    def titlesAt(cv: Long, name: String): Seq[String] = {
      val pins = Catalog.pinsAt(spark, catDir, cv)
      if (!pins.contains(name)) Nil
      else Catalog.readTableAt(spark, catDir, cv, name)
        .select("title").collect().map(_.getString(0)).toSeq
    }
    val finalCv = Catalog.version(spark, catDir)
    assert(finalCv >= 4)
    // EVERY catalog version published across the kill is an exact,
    // monotone epoch prefix — no doubles, no tears, nothing lost
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
    // the final version carries all 20, stragglers on the late side
    assert((titlesAt(finalCv, "main") ++ titlesAt(finalCv, "late"))
      .sorted === all)
    assert(Set("T07", "T13")
      .subsetOf(titlesAt(finalCv, "late").toSet))
    // and the catalog caught up to the tables (no permanently-lagging pin)
    assert(Catalog.pins(spark, catDir)("main")._2 ===
      ManifestSink.version(spark, sinkDir))
    assert(Catalog.pins(spark, catDir)("late")._2 ===
      ManifestSink.version(spark, lateDir))
  }
}
