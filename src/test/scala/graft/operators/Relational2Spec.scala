package graft.operators

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec

/** The as-of join's union+last_value construction is subtle enough to
  * deserve a hand-built case beyond the DuckDB oracle. */
class Relational2Spec extends SparkSpec {
  import spark.implicits._

  test("asof join picks the latest signup at-or-before each error") {
    val dir = Files.createTempDirectory("asof").toString
    def ts(s: String) = Timestamp.valueOf(s)
    Seq(
      (1L, ts("2024-01-01 09:00:00"), 7L, "error", 0.0, "{}"), // before any signup
      (2L, ts("2024-01-01 10:00:00"), 7L, "signup", 0.0, "{}"),
      (3L, ts("2024-01-01 10:00:00"), 7L, "error", 0.0, "{}"), // equal ts → matched
      (4L, ts("2024-01-01 11:00:00"), 7L, "error", 0.0, "{}"), // after 1st signup
      (5L, ts("2024-01-01 12:00:00"), 7L, "signup", 0.0, "{}"),
      (6L, ts("2024-01-01 13:00:00"), 7L, "error", 0.0, "{}"), // after 2nd signup
      (7L, ts("2024-01-01 13:30:00"), 8L, "error", 0.0, "{}") // other user, no signup
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val out = Relational2.queries("q17_asof_join")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> Option(r.getString(3)))
      .toMap
    assert(out(1L) === None)
    assert(out(3L) === Some("2024-01-01 10:00:00"))
    assert(out(4L) === Some("2024-01-01 10:00:00"))
    assert(out(6L) === Some("2024-01-01 12:00:00"))
    assert(out(7L) === None)
  }

  test("windowed median equals the middle value for odd groups") {
    val dir = Files.createTempDirectory("med").toString
    def ts(s: String) = Timestamp.valueOf(s)
    Seq(
      (1L, 1L, "F", 10.0, ts("2024-01-01 00:00:00"), "A"),
      (2L, 1L, "F", 30.0, ts("2024-01-01 00:00:00"), "A"),
      (3L, 1L, "F", 20.0, ts("2024-01-01 00:00:00"), "A"),
      (4L, 1L, "F", 100.0, ts("2024-01-01 00:00:00"), "B"),
      (5L, 1L, "F", 200.0, ts("2024-01-01 00:00:00"), "B")
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val med = Relational2.queries("q19_windowed_median")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(med("A") === 20.0)
    assert(med("B") === 150.0)
  }
}
