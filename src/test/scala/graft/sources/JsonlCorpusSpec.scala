package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType}

import graft.SparkSpec

class JsonlCorpusSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("s", StringType)))

  test("good, partial, mistyped, truncated, empty, and null lines") {
    val dir = Files.createTempDirectory("jsonl").toString
    Files.write(java.nio.file.Paths.get(dir, "a.jsonl"), Seq(
      """{"id":1,"s":"x"}""",       // good
      """{"id":2}""",               // valid JSON, missing field -> good
      """{"id":"nope","s":"y"}""",  // mistyped FIELD -> dead (corrupt col)
      """{"id":3,"s":"unterm""",    // truncated -> dead
      "",                           // empty -> dead
      "null"                        // literal null -> dead
    ).mkString("\n").getBytes("UTF-8"))
    val good = JsonlCorpus.read(spark, dir, schema)
      .collect().map(r => (r.get(0), r.get(1))).toSet
    assert(good === Set((1L, "x"), (2L, null)))
    val dead = JsonlCorpus.deadLetters(spark, dir, schema)
      .collect().map(_.getString(0)).toSet
    assert(dead === Set("""{"id":"nope","s":"y"}""",
      """{"id":3,"s":"unterm""", "", "null"))
    // the tagged frame carries both channels in one scan
    assert(JsonlCorpus.tagged(spark, dir, schema).count() === 6)
    // reserved corrupt column refused loudly
    intercept[IllegalArgumentException] {
      JsonlCorpus.read(spark, dir, StructType(Seq(
        StructField("_corrupt_jsonl", StringType))))
    }
  }

  test("streaming ingest splits channels exactly-once per epoch") {
    import graft.sinks.ManifestSink
    val src = Files.createTempDirectory("jsonlst").toString
    val root = Files.createTempDirectory("jsonlsink").toString
    val (good, dead) = (root + "/good", root + "/dead")
    Seq("""{"id":1,"s":"a"}""", """{"id":2,"s":"b"}""", "broken{",
      """{"id":3,"s":"c"}""").zipWithIndex.foreach { case (l, i) =>
      Files.write(java.nio.file.Paths.get(src, f"f$i%02d.jsonl"),
        (l + "\n").getBytes("UTF-8"))
    }
    val ckpt = Files.createTempDirectory("jsonlckpt").toString
    def run(): Unit = {
      val q = JsonlCorpus.taggedStream(spark, src, schema,
          Map("maxFilesPerTrigger" -> "1"))
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          val ok = b.filter(b("_ok")).drop("_raw", "_ok")
          val bad = b.filter(!b("_ok")).select(b("_raw"))
          if (!ok.isEmpty) ManifestSink.appendOnce(ok, good, id)
          if (!bad.isEmpty) ManifestSink.appendOnce(bad, dead, id)
          ()
        }
        .start()
      q.awaitTermination(120000L)
    }
    run()
    assert(ManifestSink.read(spark, good)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(1L, 2L, 3L))
    assert(ManifestSink.read(spark, dead)
      .collect().map(_.getString(0)).toSeq === Seq("broken{"))
    // checkpoint replay: no new files, no epochs, no commits
    val (vg, vd) = (ManifestSink.version(spark, good),
      ManifestSink.version(spark, dead))
    run()
    assert(ManifestSink.version(spark, good) === vg)
    assert(ManifestSink.version(spark, dead) === vd)
  }
}
