package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, from_json}
import org.apache.spark.sql.types.StructType

/** Schema-on-read JSONL corpus ingest with a dead-letter channel — the
  * raw web-corpus on-ramp (Common-Crawl-style line-delimited JSON): one
  * text scan, `from_json` per line (codegen'd; PERMISSIVE, so a
  * malformed line parses to a null struct instead of failing the job),
  * and callers split good rows from dead letters off the SAME tagged
  * frame — no second validation pass, no driver involvement.
  *
  * Scale: the text source splits by line inside each file, `from_json`
  * is a row-local expression, and neither channel shuffles — ingest is
  * one parallel scan whatever the corpus size. Dead letters keep the
  * RAW line (the only honest representation of a record that failed to
  * parse) for quarantine-and-replay, mirroring the SSE path's corrupt
  * frame channel (reference F3, pipeline.py:87-90).
  *
  * Documented contract: an empty or literal-`null` line also lands in
  * the dead channel (`from_json` yields a null struct for both); a
  * syntactically valid object with missing or mistyped FIELDS parses
  * with nulls inside — field-level validation is the
  * [[graft.operators.Expectations]] gate's job, not the parser's. */
object JsonlCorpus {

  /** One row per input line: `schema`'s columns (null on parse failure)
    * plus `_raw` (the original line) and `_ok` (parse success).
    *
    * Parse-failure detection uses the corrupt-record column, NOT struct
    * nullness: PERMISSIVE `from_json` yields a row of nulls — a
    * non-null struct — for a malformed line (SPARK-25243), so the only
    * reliable malformed signal is `columnNameOfCorruptRecord` carrying
    * the raw text. A literal `null` / empty line parses to a null
    * struct with a null corrupt column and is dead too. */
  def tagged(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    project(spark.read.text(path), schema)

  /** STREAMING [[tagged]]: the identical row-local projection over
    * `readStream.text`, so good rows and dead letters ride one
    * micro-batch scan — wire each channel's filter into its own sink
    * (or both through one `foreachBatch`) and the corrupt-frame
    * quarantine becomes part of the live ingest, exactly like the SSE
    * path's dead-letter channel. `maxFilesPerTrigger` etc. pass through
    * `options`. */
  def taggedStream(spark: SparkSession, path: String, schema: StructType,
      options: Map[String, String] = Map.empty): DataFrame =
    project(spark.readStream.options(options).text(path), schema)

  private def project(lines: DataFrame, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not contain the reserved column $CorruptCol")
    val withCorrupt = schema
      .add(CorruptCol, org.apache.spark.sql.types.StringType)
    lines
      .select(from_json(col("value"), withCorrupt,
          java.util.Collections.singletonMap(
            "columnNameOfCorruptRecord", CorruptCol)).as("__r"),
        col("value").as("_raw"))
      .select((schema.fieldNames.map(f => col(s"__r.$f")) ++
        Seq(col("_raw"), (col("__r").isNotNull &&
          col(s"__r.$CorruptCol").isNull).as("_ok"))): _*)
  }

  private val CorruptCol = "_corrupt_jsonl"

  /** The good channel: parsed rows, schema columns only. */
  def read(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    tagged(spark, path, schema).filter(col("_ok")).drop("_raw", "_ok")

  /** The dead-letter channel: the raw unparseable lines. */
  def deadLetters(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    tagged(spark, path, schema).filter(!col("_ok")).select(col("_raw"))
}
