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
}
