package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.PortableHash

/** shuffleShards' contract: the sharded rank IS the single-window global
  * row_number (bit-identical at any bucket count), ranks form a
  * permutation, and shard sizes are equal to ±1. */
class ShuffleShardsSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    (0 until 157).map(i => ("d" + i, i.toLong)).toDF("doc_id", "payload")
  }

  test("sharded rank equals the single-window row_number at any bucket count") {
    val w = Window.orderBy(PortableHash.tokenHash(col("doc_id")),
      col("doc_id"))
    val want = docs.withColumn("rank", row_number().over(w).cast("long"))
      .select("doc_id", "rank").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for (b <- Seq(1, 2, 17, 256)) {
      val got = TrainingOps.shuffleShards(docs, "doc_id", 8, buckets = b)
        .select("doc_id", "rank").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === want, s"bucket count $b diverged")
    }
  }

  test("ranks are a permutation and shards are equal to ±1") {
    val out = TrainingOps.shuffleShards(docs, "doc_id", 5)
      .select("rank", "shard").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(out.map(_._1).sorted.toSeq === (1L to 157L))
    val sizes = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes.keySet === (0 until 5).toSet)
    assert(sizes.values.max - sizes.values.min <= 1,
      s"shard sizes not balanced: $sizes")
    // shard assignment is monotone in rank (contiguous rank ranges)
    val byShard = out.groupBy(_._2).view
      .mapValues(v => (v.map(_._1).min, v.map(_._1).max)).toMap
    (0 until 4).foreach { s0 =>
      assert(byShard(s0)._2 < byShard(s0 + 1)._1,
        "shards must partition the rank order contiguously")
    }
  }

  test("payload columns survive and empty input is refused") {
    val out = TrainingOps.shuffleShards(docs, "doc_id", 3)
    assert(out.columns.toSeq === Seq("doc_id", "payload", "rank", "shard"))
    assert(out.agg(sum(col("payload"))).head().getLong(0) ===
      (0 until 157).map(_.toLong).sum)
    val e = intercept[IllegalArgumentException] {
      TrainingOps.shuffleShards(docs.limit(0), "doc_id", 3).count()
    }
    assert(e.getMessage.contains("non-empty"))
  }
}
