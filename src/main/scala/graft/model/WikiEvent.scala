package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** The reference engine's data model (SURVEY.md §1).
  *
  * Source side: the public `mediawiki.recentchange` event, declared as an
  * explicit superset StructType (reference reads a handful of fields and
  * keeps the whole payload as `raw_json` — pipeline.py:119-128,160).
  * Sink side: the 9-column `wiki_events` table (pipeline.py:205-218).
  */
object WikiEvent {

  /** Superset schema of the recentchange event (FIXTURES.md §1); parsed
    * with `from_json` in PERMISSIVE mode so corrupt/missing data yields
    * nulls — mirroring the reference's skip-on-error (pipeline.py:96-102). */
  val sourceSchema: StructType = StructType(Seq(
    StructField("$schema", StringType),
    StructField("meta", StructType(Seq(
      StructField("uri", StringType),
      StructField("request_id", StringType),
      StructField("id", StringType),
      StructField("dt", StringType), // ISO8601 "2026-01-08T22:35:51Z"
      StructField("domain", StringType),
      StructField("stream", StringType),
      StructField("topic", StringType),
      StructField("partition", IntegerType),
      StructField("offset", LongType)))),
    StructField("id", LongType),
    StructField("type", StringType), // edit|new|log|categorize|external
    StructField("namespace", IntegerType),
    StructField("title", StringType),
    StructField("title_url", StringType),
    StructField("comment", StringType),
    StructField("parsedcomment", StringType),
    StructField("timestamp", LongType), // unix epoch seconds
    StructField("user", StringType),
    StructField("bot", BooleanType),
    StructField("minor", BooleanType),
    StructField("patrolled", BooleanType),
    StructField("length", StructType(Seq( // ABSENT on type=log/categorize
      StructField("old", LongType),
      StructField("new", LongType)))),
    StructField("revision", StructType(Seq(
      StructField("old", LongType),
      StructField("new", LongType)))),
    StructField("server_url", StringType),
    StructField("server_name", StringType),
    StructField("server_script_path", StringType),
    StructField("wiki", StringType),
    StructField("notify_url", StringType)))

  /** The typed sink row (`wiki_events`, pipeline.py:205-218) minus the
    * SQLite autoincrement id (no gap-free ids in a distributed engine —
    * SURVEY.md §1.4.1; row identity is the dedup key). */
  final case class Row(
      raw_json: String,
      event_timestamp: Timestamp,
      title: String,
      title_url: String,
      bot: Boolean,
      username: String,
      length_bytes_old: Long,
      length_bytes_new: Long,
      length_diff_bytes: Long)

  /** Dedup key of the sink table — UNIQUE(event_timestamp, username, title),
    * pipeline.py:216. */
  val dedupKey: Seq[String] = Seq("event_timestamp", "username", "title")
}
