package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based invariants for the round-2 operators (complements the
  * example-based specs and the DuckDB oracle). Deterministically-sampled
  * scalacheck generators, small case counts — each case is a Spark job. */
class OperatorPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def sample[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(2024L + i)))

  test("bucketed range join ≡ cross-join-filter for any data and width") {
    val caseGen = for {
      ps <- Gen.listOfN(25, Gen.chooseNum(-50L, 120L))
      ivs <- Gen.listOfN(12, for {
        lo <- Gen.chooseNum(-60L, 110L)
        len <- Gen.chooseNum(0L, 40L)
      } yield (lo, lo + len))
      w <- Gen.chooseNum(1L, 25L)
    } yield (ps, ivs, w)
    sample(caseGen, 5).foreach { case (ps, ivs, w) =>
      val points = ps.toDF("v")
      val intervals = ivs.zipWithIndex
        .map { case ((lo, hi), i) => (i.toLong, lo, hi) }
        .toDF("iv_id", "lo", "hi")
      val got = RangeJoin.pointInInterval(points, "v", intervals,
          "lo", "hi", w)
        .groupBy("iv_id").count().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val want = points.crossJoin(intervals)
        .filter($"v" >= $"lo" && $"v" <= $"hi")
        .groupBy("iv_id").count().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got === want, s"width=$w")
    }
  }

  test("near-dup results: every pair meets the threshold; exact dups always found") {
    val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps",
      "zeta", "eta", "theta")
    val docGen = Gen.chooseNum(3, 8)
      .flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))
    sample(Gen.listOfN(12, docGen), 4).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = DedupOps.minhashNearDup(docs, "doc_id", "text",
        numHashes = 16, bands = 8, threshold = 0.9)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // soundness: reported pairs are ordered, deduped, and ≥ threshold
      assert(out.forall { case (a, b, j) => a < b && j >= 0.9 })
      assert(out.map(p => (p._1, p._2)).distinct.length === out.length)
      // completeness for exact duplicates: same token SET ⇒ must appear
      val sets = texts.map(_.split(" ").toSet).zipWithIndex
      val expectDup = for {
        (sa, ia) <- sets; (sb, ib) <- sets
        if ia < ib && sa == sb
      } yield (ia.toLong, ib.toLong)
      val found = out.map(p => (p._1, p._2)).toSet
      expectDup.foreach(p => assert(found.contains(p), s"missing $p"))
    }
  }
}
