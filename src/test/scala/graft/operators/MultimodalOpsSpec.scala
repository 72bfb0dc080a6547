package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.MultimodalOps.Media

class MultimodalOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "hello binary world this is payload one"),
    (2L, "another payload with different bytes")
  ).toDF("doc_id", "text")

  test("binary conversion preserves byte length and is deterministic") {
    val b = MultimodalOps.asBinary(docs)
    val r = b.select($"doc_id", length($"payload").as("n")).collect()
      .map(x => (x.getLong(0), x.getInt(1))).toMap
    assert(r(1L) === 38)
    assert(b.schema("payload").dataType.typeName === "binary")
  }

  test("decode stub is deterministic and in-range") {
    val out = docs.transform(MultimodalOps.asBinary)
      .select($"doc_id", MultimodalOps.decodeStub($"payload").as("m"))
      .select($"doc_id", $"m.width", $"m.height", $"m.channels")
      .collect()
    val again = docs.transform(MultimodalOps.asBinary)
      .select($"doc_id", MultimodalOps.decodeStub($"payload").as("m"))
      .select($"doc_id", $"m.width", $"m.height", $"m.channels")
      .collect()
    assert(out.toSeq === again.toSeq)
    out.foreach { r =>
      assert(r.getInt(1) >= 32 && r.getInt(1) < 257)
      assert(r.getInt(3) === 3)
    }
  }

  test("feature stub yields dim values in [0,1)") {
    val f = docs.transform(MultimodalOps.asBinary)
      .select(MultimodalOps.featureStub($"payload", 8).as("f"))
      .head().getSeq[Double](0)
    assert(f.length === 8)
    assert(f.forall(v => v >= 0.0 && v < 1.0))
  }

  test("frame sampling cuts fixed-size strided windows") {
    val frames = docs.filter($"doc_id" === 1)
      .transform(MultimodalOps.asBinary)
      .select(MultimodalOps.frameSample($"payload", 4, 10, 5).as("fr"))
      .head().getSeq[Array[Byte]](0)
    assert(frames.length === 4) // 38 bytes, strides at 0,10,20,30
    assert(new String(frames.head) === "hell")
  }

  test("real ImageIO decode roundtrips the encoded pattern exactly") {
    val ids = Seq(0L, 7L, 62L, 123L, 499L)
    val media = ids.map(d => Media(d, MultimodalOps.syntheticPng(d))).toDS()
    val stats = MultimodalOps.decodeBatch(media).collect()
      .map(st => st.doc_id -> st).toMap
    assert(stats.size === ids.size)
    ids.foreach { d =>
      val (w, h) = MultimodalOps.imageDims(d)
      val st = stats(d)
      assert(st.width === w && st.height === h && st.channels === 3)
      // PNG is lossless: every decoded stat equals the closed form.
      def s(off: Int): Seq[Long] =
        (0 until w * h).map(i => MultimodalOps.pixelValue(d, i, off).toLong)
      assert(st.sum_r === s(0).sum && st.sum_g === s(101).sum &&
        st.sum_b === s(202).sum)
      assert(st.min_r === s(0).min && st.max_r === s(0).max)
      assert(st.min_g === s(101).min && st.max_g === s(101).max)
      assert(st.min_b === s(202).min && st.max_b === s(202).max)
    }
    // deterministic across runs
    assert(MultimodalOps.decodeBatch(media).collect().sortBy(_.doc_id).toSeq
      === stats.values.toSeq.sortBy(_.doc_id))
  }

  test("undecodable payloads are skipped row-by-row, not fatal") {
    // mirrors the reference's per-event corrupt-JSON skip (pipeline.py:96-102)
    val valid = Media(1L, MultimodalOps.syntheticPng(1L))
    val garbage = Media(2L, Array[Byte](1, 2, 3, 4, 5))
    val textBytes = Media(3L, "not an image at all".getBytes("UTF-8"))
    val truncated = Media(4L, MultimodalOps.syntheticPng(4L).take(20))
    val empty = Media(5L, Array.emptyByteArray)
    val out = MultimodalOps
      .decodeBatch(Seq(valid, garbage, textBytes, truncated, empty).toDS())
      .collect()
    assert(out.map(_.doc_id).toSeq === Seq(1L))
  }
}
