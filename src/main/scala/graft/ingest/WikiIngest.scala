package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.WikiEvent

/** The reference's v2 ingest pipeline (pipeline.py:60-177) re-expressed as
  * narrow Spark transformations — every stage is codegen'd, shuffle-free
  * except dedup (one shuffle on the dedup key).
  *
  * Stage map (SURVEY.md §2/§3.1):
  *   parseRaw      F1 frame filter + P7 JSON parse + F3 corrupt skip
  *   filterEvents  F2 type filter + F4 missing-key skip
  *   transform     P1-P9 (nested extraction, rename, coalesce defaults,
  *                 derived arithmetic, casts, timestamp normalize, raw keep)
  *   dedup         D1 UNIQUE(event_timestamp, username, title)
  *   retention     R1 keep-newest-N (+ A5 scalar greatest)
  */
object WikiIngest {

  /** F1+P7+F3: parse raw JSON lines; drop empty frames and corrupt records.
    * PERMISSIVE from_json yields null structs for malformed input, exactly
    * mirroring the reference's JSONDecodeError skip (pipeline.py:96-98). */
  def parseRaw(raw: DataFrame, rawCol: String = "value"): DataFrame =
    raw
      .filter(col(rawCol).isNotNull && col(rawCol) =!= "") // F1
      .withColumn("event", from_json(col(rawCol), WikiEvent.sourceSchema))
      // from_json returns a struct of all-nulls (not null) for corrupt rows;
      // meta.dt is required downstream, so use it as the corrupt marker (F3)
      .filter(col("event").isNotNull && col("event.meta.dt").isNotNull)

  /** F2+F4: keep edit/new events that carry every directly-accessed field
    * (the reference's KeyError skip, pipeline.py:100-102). */
  def filterEvents(parsed: DataFrame): DataFrame =
    parsed
      .filter(col("event.type").isin("edit", "new")) // F2
      .filter(col("event.title").isNotNull && // F4: direct dict access
        col("event.title_url").isNotNull &&
        col("event.user").isNotNull &&
        col("event.bot").isNotNull)

  /** P1-P9 (`transform_data`, pipeline.py:104-130): typed 9-column view.
    * The original line is retained as raw_json (exact bytes — P8). */
  def transform(filtered: DataFrame, rawCol: String = "value"): DataFrame = {
    val old = coalesce(col("event.length.old"), lit(0L)) // P1+P3
    val nw = coalesce(col("event.length.new"), lit(0L))
    filtered.select(
      col(rawCol).as("raw_json"), // P8
      to_timestamp(col("event.meta.dt")).as("event_timestamp"), // P6
      col("event.title").as("title"), // P9
      col("event.title_url").as("title_url"),
      col("event.bot").as("bot"), // P5 (kept boolean, SURVEY §1.3)
      col("event.user").as("username"), // P2 rename
      old.as("length_bytes_old"),
      nw.as("length_bytes_new"),
      (nw - old).as("length_diff_bytes")) // P4
  }

  /** D1: insert-time unique-key dedup. Duplicate events are identical
    * payloads, so an arbitrary survivor equals first-write-wins
    * (SURVEY.md §1.4.2). One shuffle on the key. */
  def dedup(events: DataFrame): DataFrame =
    events.dropDuplicates(WikiEvent.dedupKey)

  /** Deterministic first-write-wins variant (for oracle-able queries):
    * survivor is the minimum (orderCol) row per key. */
  def dedupFirstWins(df: DataFrame, key: Seq[String],
      order: Seq[String]): DataFrame = {
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(order.map(c => col(c).asc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** R1: keep the newest rows by `idCol` — the reference's
    * `DELETE WHERE id < MAX(0, max_id - N)` (pipeline.py:45-48) expressed
    * as the retained-set filter: survivors satisfy `id >= max(0, max-N)`,
    * i.e. N+1 rows for contiguous ids (the reference's exact boundary).
    * The scalar max travels via a 1-row broadcast join, not a driver
    * collect. */
  def retention(df: DataFrame, idCol: String, maxEvents: Long): DataFrame = {
    val mx = df.agg(max(col(idCol)).as("__max_id"))
    df.crossJoin(broadcast(mx))
      .filter(col(idCol) >= greatest(lit(0L), col("__max_id") - lit(maxEvents)))
      .drop("__max_id")
  }

  /** Cleanup-trigger predicate (F6): retention runs only once the row count
    * reaches `int(hysteresis × maxEvents)` — the reference truncates the
    * product (pipeline.py:44 `int(1.1*db_max_events)`), so e.g.
    * 110 rows DO trigger cleanup at maxEvents=100 despite
    * 1.1*100 == 110.00000000000001 in IEEE double. */
  def needsCleanup(rowCount: Long, maxEvents: Long,
      hysteresis: Double = 1.1): Boolean =
    rowCount >= (hysteresis * maxEvents).toLong

  /** Full batch pipeline: raw JSON lines → deduped `wiki_events` frame. */
  def pipeline(raw: DataFrame, rawCol: String = "value"): DataFrame =
    dedup(transform(filterEvents(parseRaw(raw, rawCol)), rawCol))
}
