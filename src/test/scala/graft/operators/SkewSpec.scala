package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val skewed = spark.range(0, 10000)
    .select(when($"id" < 9000, lit("hot")).otherwise(concat(lit("k"), $"id"))
      .as("key"), $"id".as("v"))

  test("salted count equals plain count per key") {
    val plain = skewed.groupBy($"key").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(skewed, "key")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
    assert(salted("hot") === 9000L)
  }

  test("salted join equals plain join") {
    val small = Seq(("hot", 1.0), ("k9001", 2.0)).toDF("key", "w")
    val plain = skewed.join(small, "key").agg(
      count(lit(1)), sum($"v" * $"w")).head()
    val salted = Skew.saltJoin(skewed, small, "key").agg(
      count(lit(1)), sum($"v" * $"w")).head()
    assert(salted.getLong(0) === plain.getLong(0))
    assert(salted.getDouble(1) === plain.getDouble(1))
  }
}
