package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.MultimodalOps.{Media, MediaMeta}

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

  test("mapPartitions decode batch produces one meta row per media row") {
    val media = docs.transform(MultimodalOps.asBinary)
      .as[(Long, Array[Byte])]
      .map { case (id, p) => Media(id, p) }
    val metas = MultimodalOps.decodeBatch(media).collect()
    assert(metas.length === 2)
    assert(metas.forall(m => m.channels === 3 && m.n_bytes > 0))
    // deterministic across runs
    assert(MultimodalOps.decodeBatch(media).collect().toSeq === metas.toSeq)
    // and consistent with the expression-side decodeStub kernel
    val stub = docs.transform(MultimodalOps.asBinary)
      .select($"doc_id", MultimodalOps.decodeStub($"payload").as("m"))
      .select($"doc_id", $"m.width", $"m.height").collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2)))).toMap
    metas.foreach(m => assert(stub(m.doc_id) === (m.width, m.height)))
  }
}
