package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.PortableHash

/** tokenBudgetSample's contract: whatever the bucket count, the kept set
  * is EXACTLY the maximal hash-ordered prefix within each stratum's
  * budget — the sharded classification (keep_all / drop_all / boundary)
  * is an execution shape, never a semantics change. */
class TokenBudgetSampleSpec extends SparkSpec {

  /** Deterministic corpus: 3 strata × 40 docs with varying token sizes
    * (arithmetic in doc id so sizes are irregular but reproducible). */
  private def corpus: DataFrame = {
    import spark.implicits._
    (for {
      s <- Seq("a", "b", "c")
      i <- 0 until 40
    } yield (s + "_" + i, s, 1L + (i * 7 + s.hashCode.abs) % 23))
      .toDF("doc_id", "lang", "tok")
  }

  /** The spec: one global cumsum window per stratum (the shape the
    * distributed form exists to avoid). */
  private def reference(df: DataFrame, budgets: DataFrame): Set[String] = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(PortableHash.tokenHash(col("doc_id")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.join(budgets, Seq("lang"))
      .withColumn("cum", sum(col("tok")).over(w))
      .filter(col("cum") <= col("budget"))
      .select("doc_id").collect().map(_.getString(0)).toSet
  }

  test("every bucket count reproduces the single-window reference") {
    import spark.implicits._
    val df = corpus
    val budgets = df.groupBy($"lang")
      .agg(expr("sum(tok) div 3").as("budget"))
    val want = reference(df, budgets)
    assert(want.nonEmpty && want.size < 120, "cut must land mid-corpus")
    for (b <- Seq(1, 2, 7, 256)) {
      val got = TrainingOps
        .tokenBudgetSample(df, "lang", "doc_id", "tok", budgets, buckets = b)
        .select("doc_id").collect().map(_.getString(0)).toSet
      assert(got === want, s"bucket count $b diverged from the reference")
    }
  }

  test("budget edge cases: zero, everything, absent stratum") {
    import spark.implicits._
    val df = corpus
    // zero budget keeps nothing (tokens >= 1)
    val zero = df.select($"lang").distinct()
      .withColumn("budget", lit(0L))
    assert(TrainingOps
      .tokenBudgetSample(df, "lang", "doc_id", "tok", zero).count() === 0L)
    // budget >= stratum total keeps the whole stratum
    val all = df.groupBy($"lang").agg(sum($"tok").as("budget"))
    assert(TrainingOps
      .tokenBudgetSample(df, "lang", "doc_id", "tok", all).count() ===
      df.count())
    // a stratum with no budget row is dropped, others untouched
    val onlyA = all.filter($"lang" === "a")
    val kept = TrainingOps
      .tokenBudgetSample(df, "lang", "doc_id", "tok", onlyA)
    assert(kept.select("lang").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("a"))
    assert(kept.count() === df.filter($"lang" === "a").count())
  }

  test("the sharded plan classifies buckets; only the boundary is windowed") {
    import spark.implicits._
    val df = corpus
    val budgets = df.groupBy($"lang")
      .agg(expr("sum(tok) div 3").as("budget"))
    // with few buckets each stratum must see all three classes at least
    // once across strata: a keep_all (prefix fits), a drop_all (past the
    // budget), and exactly one boundary per stratum that CUTS
    val h = PortableHash.tokenHash($"doc_id")
    val bucketed = df.join(budgets, Seq("lang"))
      .withColumn("b", shiftright(h * lit(8L), 48))
      .groupBy($"lang", $"b")
      .agg(sum($"tok").as("btok"), first($"budget").as("bud"))
    val wB = Window.partitionBy($"lang").orderBy($"b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val classes = bucketed
      .withColumn("prefix", sum($"btok").over(wB) - $"btok")
      .withColumn("cls",
        when($"prefix" + $"btok" <= $"bud", "keep_all")
          .when($"prefix" >= $"bud", "drop_all").otherwise("boundary"))
      .groupBy($"cls").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(classes.contains("keep_all") && classes.contains("drop_all"),
      s"degenerate classification: $classes")
    assert(classes.getOrElse("boundary", 0L) <= 3L,
      "at most one boundary bucket per stratum")
  }
}
