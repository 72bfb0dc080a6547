package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.PortableHash

/** epochUpsample's contract: exact full-epoch repeat counts, the epoch
  * cap, a deterministic hash-prefix partial epoch, and exclusion of
  * unbudgeted sources. */
class EpochUpsampleSpec extends SparkSpec {
  import spark.implicits._

  // two sources: A = 10 docs × 3 tokens (30), B = 5 docs × 4 tokens (20)
  private def docs =
    ((0 until 10).map(i => (i.toLong, "A", 3L)) ++
      (10 until 15).map(i => (i.toLong, "B", 4L)))
      .toDF("doc_id", "src", "tok")

  private def run(budgetA: Long, budgetB: Long, maxE: Int) =
    TrainingOps.epochUpsample(docs, "src", "doc_id", "tok",
      Seq(("A", budgetA), ("B", budgetB)).toDF("src", "budget"), maxE)

  test("full epochs repeat every doc exactly e times; remainder is the " +
      "maximal hash prefix") {
    // A: budget 75 = 2 full epochs (60) + 15-token partial (5 docs);
    // B: budget 20 = 1 full epoch, zero remainder
    val out = run(75L, 20L, maxE = 5)
      .select("doc_id", "src", "tok", "epoch").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val a = out.filter(_._2 == "A")
    assert(a.count(_._4 == 0) === 10 && a.count(_._4 == 1) === 10)
    val partial = a.filter(_._4 == 2).map(_._1).sorted.toSeq
    assert(partial.size === 5 && a.map(_._4).max === 2L)
    // the partial epoch is exactly the first 5 ids in (hash, id) order
    val w = Window.partitionBy($"src")
      .orderBy(PortableHash.tokenHash($"doc_id"), $"doc_id")
    val want = docs.filter($"src" === "A")
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 5).select("doc_id").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(partial === want)
    val b = out.filter(_._2 == "B")
    assert(b.map(_._4).distinct.toSeq === Seq(0L) && b.size === 5)
  }

  test("the epoch cap zeroes the remainder; under-one-epoch budgets are " +
      "partial-only; unbudgeted sources are excluded") {
    // A: budget 1000 → 33 epochs uncapped, capped at 2, NO partial
    val capped = run(1000L, 0L, maxE = 2)
    val a = capped.filter($"src" === "A").groupBy($"epoch").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === Map(0L -> 10L, 1L -> 10L))
    // B budget 0 → nothing at all
    assert(capped.filter($"src" === "B").count() === 0)
    // under one epoch: A budget 10 → partial-only at epoch 0 (3 docs ≤ 10 tokens)
    val partialOnly = run(10L, 0L, maxE = 3).filter($"src" === "A")
    assert(partialOnly.select("epoch").distinct().collect()
      .map(_.getLong(0)).toSeq === Seq(0L))
    assert(partialOnly.agg(sum($"tok")).head().getLong(0) <= 10L)
    // a source absent from the budget frame contributes nothing
    val noB = TrainingOps.epochUpsample(docs, "src", "doc_id", "tok",
      Seq(("A", 30L)).toDF("src", "budget"), 2)
    assert(noB.filter($"src" === "B").count() === 0)
    assert(noB.filter($"src" === "A").count() === 10)
  }

  test("token accounting: materialized mass never exceeds the budget " +
      "and fills it to within one document") {
    val out = run(75L, 33L, maxE = 5)
    val mass = out.groupBy($"src").agg(sum($"tok").as("m")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mass("A") <= 75L && mass("A") > 75L - 3L)
    assert(mass("B") <= 33L && mass("B") > 33L - 4L)
  }
}
