package graft.sinks

import java.nio.file.Files

import graft.SparkSpec
import graft.functions.{KmvSketch, PortableHash}
import org.apache.spark.sql.functions._

class IncrementalDistinctSpec extends SparkSpec {
  import spark.implicits._

  test("sketchValues returns the sorted k smallest DISTINCT hashes") {
    val df = Seq(5L, 3L, 9L, 3L, 1L, 7L, 5L).toDF("h")
    val got = df.agg(KmvSketch.sketchValues(col("h"), 4)).collect()
      .head.getSeq[Long](0)
    assert(got === Seq(1L, 3L, 5L, 7L))
    // fewer distinct values than k → the whole distinct set, sorted
    val small = Seq(2L, 2L, 8L).toDF("h")
      .agg(KmvSketch.sketchValues(col("h"), 4)).collect()
      .head.getSeq[Long](0)
    assert(small === Seq(2L, 8L))
  }

  test("relational merge of split sketches equals the one-pass sketch " +
      "(order-ideal property)") {
    val k = 8
    val all = (1L to 100L).map(i => (s"g${i % 3}", i * 37 % 101))
    val (left, right) = all.splitAt(41)
    def state(rows: Seq[(String, Long)]) = IncrementalDistinct.sketchState(
      rows.toDF("g", "h"), Seq("g"), col("h"), k)
    val merged = IncrementalDistinct.merge(
        state(left), state(right), Seq("g"), k)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val direct = state(all)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(merged === direct)
  }

  test("refresh folds only manifest-diff batches and equals a " +
      "from-scratch sketch; rewrites are refused") {
    val dir = Files.createTempDirectory("kmvinc").toString + "/t"
    val k = 4
    val h = PortableHash.tokenHashP(col("u"))
    val v0 = ManifestSink.append(
      Seq(("a", "u1"), ("a", "u2"), ("b", "u1")).toDF("g", "u"), dir)
    val s0 = IncrementalDistinct.refresh(
      spark, None, dir, -1L, v0, Seq("g"), h, k)
    val v1 = ManifestSink.append(
      Seq(("a", "u2"), ("a", "u3"), ("b", "u9")).toDF("g", "u"), dir)
    val s1 = IncrementalDistinct.refresh(
      spark, Some(s0), dir, v0, v1, Seq("g"), h, k)
    val folded = IncrementalDistinct.present(s1, Seq("g"), k, PortableHash.P)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // exact while under k: a has 3 distinct users, b has 2
    assert(folded === Map("a" -> 3L, "b" -> 2L))
    // folded state == sketching the whole snapshot from scratch
    val scratch = IncrementalDistinct.sketchState(
        ManifestSink.read(spark, dir), Seq("g"), h, k)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val st1 = s1.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(st1 === scratch)
    // a rewrite can retract values the sketch cannot un-see → refuse
    val v2 = ManifestSink.replace(Seq(("a", "u1")).toDF("g", "u"), dir)
    intercept[IllegalArgumentException] {
      IncrementalDistinct.refresh(spark, Some(s1), dir, v1, v2, Seq("g"), h, k)
    }
  }
}
