package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SpaceSavingSpec extends SparkSpec {
  import spark.implicits._

  /** A skewed stream: item `w<i>` appears (vocab - i)^2 times — a few
    * unmistakable heavy hitters over a long tail. */
  private def zipfish(vocab: Int): Seq[String] =
    (0 until vocab).flatMap(i =>
      Seq.fill((vocab - i) * (vocab - i))(s"w$i"))

  private def truthHas(items: Seq[String], it: String, n: Long,
      m: Int): Boolean =
    items.count(_ == it).toLong > n / m

  private def summarize(items: Seq[String], m: Int, parts: Int)
      : Seq[(String, Long, Long)] =
    items.toDF("tok").repartition(parts)
      .agg(SpaceSaving.summary($"tok", m).as("hh"))
      .select(explode($"hh").as("e"))
      .select($"e.item", $"e.cnt", $"e.err")
      .as[(String, Long, Long)].collect().toSeq

  test("exact regime: capacity >= NDV gives the exact ordered table, " +
      "any partitioning") {
    val items = zipfish(40)
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy { case (it, c) => (-c, it) }
    for (parts <- Seq(1, 7, 32)) {
      val got = summarize(items, 64, parts)
      assert(got.map { case (it, c, e) => (it, c) } === truth,
        s"parts=$parts")
      assert(got.forall(_._3 == 0L), s"err must pin at 0, parts=$parts")
    }
  }

  test("approximate regime: bounds hold and true heavies survive, " +
      "any partitioning") {
    val vocab = 100
    val m = 16
    // zipfish(100) tops out at 10k occurrences over n≈338k — below every
    // n/m threshold — so plant one unmistakable heavy above it
    val items = zipfish(vocab) ++ Seq.fill(400000)("MEGA")
    val n = items.size.toLong
    assert(truthHas(items, "MEGA", n, m), "fixture must have a true heavy")
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 5, 32)) {
      val got = summarize(items, m, parts)
      assert(got.size == m)
      got.foreach { case (it, cnt, err) =>
        val t = truth.getOrElse(it, 0L)
        assert(cnt >= t, s"upper bound broken for $it: $cnt < $t")
        assert(cnt - err <= t,
          s"lower bound broken for $it: $cnt - $err > $t")
      }
      // heavy survival: single-pass Space-Saving guarantees presence
      // above n/m; the min-floor merge can in principle prune a
      // NEAR-threshold heavy, so this fixture's heavy carries a ~9x
      // margin — the skew shape the sketch exists for
      val reported = got.map(_._1).toSet
      truth.collect { case (it, c) if c > n / m => it }.foreach(it =>
        assert(reported.contains(it), s"heavy $it missing, parts=$parts"))
    }
  }

  test("merged-partials survival bound: a heavy just above 2n/m " +
      "survives ENGINEERED per-partition floors, any partitioning") {
    // The adversarial shape for the min-floor merge (r14 verdict #7):
    // every partition carries its OWN m-item filler vocabulary at a
    // uniform count, so each partial is full, its minimum counter is
    // maximal for its mass, and every cross-partition merge inflates
    // absent items by that worst-case floor. The heavy sits just above
    // the PROVEN merged threshold 2n/m (scaladoc derivation): it must
    // survive the prune under any split; competitors' inflated
    // estimates cannot outrank it m deep.
    val m = 8
    val perPart = 16 // partitions worth of disjoint filler vocabularies
    val fill = 50L   // occurrences per filler item
    val fillers = (0 until perPart).flatMap(p =>
      (0 until m).flatMap(i => Seq.fill(fill.toInt)(s"f${p}_$i"))
        .map(tok => (p, tok)))
    val nFill = fillers.size.toLong
    // choose the heavy's count H so that H > 2(nFill + H)/m, with a
    // thin ~10% margin above the bound — the survival-margin case
    val h = (2.2 * nFill / (m - 2.2)).toLong
    val heavy = (0 until perPart).flatMap(p =>
      Seq.fill((h / perPart).toInt)((p, "HEAVY")))
    val items = fillers ++ heavy
    val n = items.size.toLong
    val trueH = heavy.size.toLong
    assert(trueH * m > 2 * n && trueH * m < 3 * n,
      s"fixture must sit just above the 2n/m bound: H=$trueH n=$n")
    for (parts <- Seq(1, 5, 8, 32)) {
      val got = items.toDF("pid", "tok")
        .repartition(parts, $"pid") // co-locate each filler vocabulary
        .agg(SpaceSaving.summary($"tok", m).as("hh"))
        .select(explode($"hh").as("e"))
        .select($"e.item", $"e.cnt", $"e.err")
        .as[(String, Long, Long)].collect().toSeq
      val hh = got.find(_._1 == "HEAVY")
      assert(hh.isDefined, s"heavy at the 2n/m margin pruned, parts=$parts")
      val (_, cnt, err) = hh.get
      assert(cnt >= trueH && cnt - err <= trueH,
        s"bounds broken at the margin: ($cnt, $err) vs $trueH")
    }
  }

  test("nulls and empties: null ignored, empty input gives empty summary") {
    val got = Seq(Some("a"), None, Some("a"), Some("b")).toDF("tok")
      .agg(SpaceSaving.summary($"tok", 8).as("hh"))
      .select(explode($"hh").as("e")).select($"e.item", $"e.cnt")
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("a", 2L), ("b", 1L)))
    val empty = Seq.empty[String].toDF("tok")
      .agg(SpaceSaving.summary($"tok", 8).as("hh"))
      .select(size($"hh")).head().getInt(0)
    assert(empty === 0)
  }

  test("SQL surface: space_saving(tok, m) registered") {
    GraftFunctions.register(spark)
    Seq("x", "x", "y").toDF("tok").createOrReplaceTempView("ss_toks")
    val got = spark.sql(
      "SELECT space_saving(tok, 4)[0].item AS top FROM ss_toks")
      .head().getString(0)
    assert(got === "x")
  }

  test("non-string items are rejected at analysis time, not with an " +
      "executor ClassCastException") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L, 2L).toDF("id")
        .agg(SpaceSaving.summary($"id", 4)).collect()
    }
    assert(e.getMessage.contains("space_saving"))
  }

  test("eval order is (cnt desc, item asc) — a total order") {
    val got = summarize(Seq("b", "a", "a", "b", "c"), 8, 1)
    assert(got === Seq(("a", 2L, 0L), ("b", 2L, 0L), ("c", 1L, 0L)))
  }

  private def exactSummarize(items: Seq[String], m: Int, parts: Int)
      : Seq[(String, Long, Long)] =
    items.toDF("tok").repartition(parts)
      .agg(SpaceSaving.exactSummary($"tok", m).as("hh"))
      .select(explode($"hh").as("e"))
      .select($"e.item", $"e.cnt", $"e.err")
      .as[(String, Long, Long)].collect().toSeq

  test("exactSummary: identical to summary while the regime holds, " +
      "any partitioning — including NDV == m exactly") {
    val items = zipfish(40) // NDV 40
    for ((m, parts) <- Seq((64, 1), (64, 32), (40, 7), (40, 32))) {
      assert(exactSummarize(items, m, parts) === summarize(items, m, parts),
        s"m=$m parts=$parts")
    }
  }

  test("exactSummary: REFUSES when any group's vocabulary outgrows the " +
      "capacity — the in-pass regime guard (r15 #4)") {
    // NDV = m + 1: the single extra item forces exactly one eviction (or
    // one merge floor, depending on the split) — the thinnest possible
    // violation, and it must still trip under every partitioning.
    val m = 8
    val items = (0 to m).map(i => s"w$i") ++ Seq.fill(100)("w0")
    for (parts <- Seq(1, 5, 32)) {
      val e = intercept[org.apache.spark.SparkException] {
        exactSummarize(items, m, parts)
      }
      assert(e.getCause.getMessage.contains("exact regime violated"),
        s"parts=$parts: ${e.getCause}")
    }
    // the plain summary on the same input stays a non-throwing sketch
    assert(summarize(items, m, 5).size == m)
  }

  test("exactSummary: the inexact flag survives serialization and " +
      "merge even when the violating items are pruned away") {
    // A full side whose evicted evidence could vanish under the prune:
    // one partition holds m+4 distinct low-count items (evicts, then its
    // survivors may all be out-ranked), the other holds m high-count
    // items that win every prune slot. Exactness was lost on partition
    // 0 regardless of what the final summary shows — the sticky flag,
    // not the surviving (cnt, err) values, must carry that fact.
    val m = 4
    val losers = (0 until m + 4).map(i => (0, s"lo$i"))
    val winners = (0 until m).flatMap(i =>
      Seq.fill(50)((1, s"WIN$i")))
    val e = intercept[org.apache.spark.SparkException] {
      (losers ++ winners).toDF("pid", "tok")
        .repartition(2, $"pid")
        .agg(SpaceSaving.exactSummary($"tok", m).as("hh"))
        .collect()
    }
    assert(e.getCause.getMessage.contains("exact regime violated"))
  }
}
