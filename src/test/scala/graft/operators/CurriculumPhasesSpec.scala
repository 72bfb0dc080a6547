package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.PortableHash

/** curriculumPhases' contract: the sharded token offset IS the
  * single-window exclusive running sum over (tier, hash, id) order at any
  * bucket count; phases cut token mass at exact integer boundaries; a
  * straddling document goes with its first token. */
class CurriculumPhasesSpec extends SparkSpec {

  // 3 tiers × uneven token lengths; ids interleave tiers so tier
  // ordering is doing real work
  private def docs = {
    import spark.implicits._
    (0 until 91).map { i =>
      ("d" + i, (i % 7 + 1).toLong, i % 3)
    }.toDF("doc_id", "tok", "tier")
  }

  test("sharded offset equals the one-window exclusive sum at any " +
      "bucket count") {
    val w = Window.orderBy(col("tier"),
      PortableHash.tokenHash(col("doc_id")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = docs
      .withColumn("start_offset",
        coalesce(sum(col("tok")).over(w), lit(0L)))
      .select("doc_id", "start_offset").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for (b <- Seq(1, 2, 17, 256)) {
      val got = TrainingOps
        .curriculumPhases(docs, "doc_id", "tok", "tier", Seq(1L),
          buckets = b)
        .select("doc_id", "start_offset").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === want, s"bucket count $b diverged")
    }
  }

  test("offsets tile the token stream and tiers are contiguous in it") {
    val out = TrainingOps
      .curriculumPhases(docs, "doc_id", "tok", "tier", Seq(1L))
      .select("start_offset", "tok", "tier").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .sortBy(_._1)
    // exclusive offsets tile exactly: each doc starts where the
    // previous ended, first at 0, ending at the total
    var expect = 0L
    out.foreach { case (off, tok, _) =>
      assert(off === expect, s"gap/overlap at offset $off")
      expect += tok
    }
    assert(expect === out.map(_._2).sum)
    // ascending tiers form contiguous offset segments
    assert(out.map(_._3).toSeq === out.map(_._3).sorted.toSeq)
  }

  test("phase boundaries are exact integer token cuts; straddlers go " +
      "with their first token") {
    val weights = Seq(7L, 2L, 1L)
    val out = TrainingOps
      .curriculumPhases(docs, "doc_id", "tok", "tier", weights)
      .select("start_offset", "tok", "phase").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val total = out.map(_._2).sum
    val (c1, c2) = (total * 7 / 10, total * 9 / 10)
    out.foreach { case (off, _, ph) =>
      val want = (if (off >= c1) 1 else 0) + (if (off >= c2) 1 else 0)
      assert(ph === want, s"offset $off got phase $ph, want $want")
    }
    // every phase is non-empty under these weights, and a straddler
    // exists (cuts don't land exactly on a doc boundary for this corpus)
    assert(out.map(_._3).distinct.sorted.toSeq === Seq(0, 1, 2))
    val straddle = out.exists { case (off, tok, ph) =>
      ph == 0 && off < c1 && off + tok > c1
    }
    assert(straddle, "fixture should exercise a boundary-straddling doc")
  }

  test("single phase assigns everything to phase 0; bad inputs refused") {
    val one = TrainingOps
      .curriculumPhases(docs, "doc_id", "tok", "tier", Seq(5L))
      .select("phase").distinct().collect().map(_.getInt(0)).toSeq
    assert(one === Seq(0))
    intercept[IllegalArgumentException] {
      TrainingOps.curriculumPhases(docs, "doc_id", "tok", "tier",
        Seq(1L, 0L))
    }
    intercept[IllegalArgumentException] {
      TrainingOps.curriculumPhases(docs.limit(0), "doc_id", "tok",
        "tier", Seq(1L))
    }
  }
}
