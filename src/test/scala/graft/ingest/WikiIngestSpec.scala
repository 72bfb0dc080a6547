package graft.ingest

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Reference-faithful pipeline semantics on the FIXTURES.md §1 JSONL:
  * 7 input lines → 3 surviving rows (fate table in FIXTURES.md). */
class WikiIngestSpec extends SparkSpec {
  import spark.implicits._

  private lazy val raw = spark.read.text(fixturePath("recentchange_fixture.jsonl"))

  test("full pipeline keeps exactly the 3 expected rows") {
    val out = WikiIngest.pipeline(raw).orderBy("event_timestamp")
    val rows = out.collect()
    assert(rows.length === 3)
    assert(rows.map(_.getAs[String]("title")).toSeq ===
      Seq("Spark (disambiguation)", "New Article", "No length"))
  }

  test("missing length.old defaults to 0 and diff is new-old (P3/P4)") {
    val out = WikiIngest.pipeline(raw)
    val bob = out.filter($"username" === "Bob").head()
    assert(bob.getAs[Long]("length_bytes_old") === 0L)
    assert(bob.getAs[Long]("length_bytes_new") === 300L)
    assert(bob.getAs[Long]("length_diff_bytes") === 300L)
    val dave = out.filter($"username" === "Dave").head()
    assert(dave.getAs[Long]("length_bytes_old") === 0L)
    assert(dave.getAs[Long]("length_diff_bytes") === 0L)
  }

  test("corrupt JSON and non-edit/new types are dropped (F2/F3)") {
    val parsed = WikiIngest.parseRaw(raw)
    assert(parsed.count() === 6) // malformed line dropped
    val filtered = WikiIngest.filterEvents(parsed)
    assert(filtered.count() === 4) // log + categorize dropped, dup still in
  }

  test("dedup removes the duplicate (ts, username, title) row (D1)") {
    val before = WikiIngest.transform(
      WikiIngest.filterEvents(WikiIngest.parseRaw(raw)))
    assert(before.count() === 4)
    assert(WikiIngest.dedup(before).count() === 3)
  }

  test("dedup is idempotent") {
    val once = WikiIngest.pipeline(raw)
    assert(WikiIngest.dedup(once).count() === once.count())
  }

  test("replay overlap is absorbed (resume semantics, SURVEY §1.4.3)") {
    // ingesting batch ++ tail-of-batch == ingesting batch
    val replayed = raw.union(raw.limit(3))
    assert(WikiIngest.pipeline(replayed).count() ===
      WikiIngest.pipeline(raw).count())
  }

  test("raw_json preserves the original line bytes (P8)") {
    val out = WikiIngest.pipeline(raw).filter($"username" === "Alice").head()
    assert(out.getAs[String]("raw_json").contains("\"dt\":\"2026-01-08T22:35:51Z\""))
  }

  test("retention keeps ids >= max-N, the reference's DELETE boundary (R1)") {
    // DELETE WHERE id < MAX(0, max_id - N): survivors are [max-N, max],
    // i.e. N+1 rows for contiguous ids (pipeline.py:45-48)
    val df = spark.range(0, 100).select($"id".as("event_id"))
    val kept = WikiIngest.retention(df, "event_id", 10).collect().map(_.getLong(0))
    assert(kept.sorted.toSeq === (89L until 100L))
    // under capacity nothing is deleted (threshold clamps to 0)
    val small = spark.range(0, 50).select($"id".as("event_id"))
    assert(WikiIngest.retention(small, "event_id", 1000).count() === 50)
  }

  test("cleanup hysteresis triggers at int(1.1x) like the reference (F6)") {
    // pipeline.py:44 compares against int(1.1*db_max_events) — the float
    // artifact (1.1*100 == 110.0000...01) is truncated away by int()
    assert(!WikiIngest.needsCleanup(109, 100))
    assert(WikiIngest.needsCleanup(110, 100))
    assert(WikiIngest.needsCleanup(111, 100))
    assert(WikiIngest.needsCleanup(250, 100))
  }

  test("event_timestamp parses ISO8601 to UTC timestamp (P6)") {
    val out = WikiIngest.pipeline(raw).filter($"username" === "Alice").head()
    assert(out.getAs[java.sql.Timestamp]("event_timestamp").toString
      === "2026-01-08 22:35:51.0")
  }
}
