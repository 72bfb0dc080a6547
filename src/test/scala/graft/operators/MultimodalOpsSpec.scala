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

  test("real pixel features match the closed form (hist, lum, edge)") {
    val ids = Seq(0L, 7L, 62L, 123L, 499L)
    val media = ids.map(d => Media(d, MultimodalOps.syntheticPng(d))).toDS()
    val feats = MultimodalOps.featureBatch(media).collect()
      .map(f => f.doc_id -> f).toMap
    assert(feats.size === ids.size)
    ids.foreach { d =>
      val (w, h) = MultimodalOps.imageDims(d)
      val red = (0 until w * h).map(i => MultimodalOps.pixelValue(d, i, 0))
      val f = feats(d)
      val hist = Seq(f.hist_0, f.hist_1, f.hist_2, f.hist_3,
        f.hist_4, f.hist_5, f.hist_6, f.hist_7)
      (0 until 8).foreach { b =>
        assert(hist(b) === red.count(_ >> 5 == b).toLong, s"doc $d bin $b")
      }
      assert(hist.sum === (w * h).toLong)
      val expLum = (0 until w * h).map { i =>
        (MultimodalOps.pixelValue(d, i, 0) +
          MultimodalOps.pixelValue(d, i, 101) +
          MultimodalOps.pixelValue(d, i, 202)).toLong
      }.sum
      assert(f.lum_sum === expLum)
      val expEdge = (0 until w * h).map { i =>
        val hEdge = if (i % w != w - 1) math.abs(red(i + 1) - red(i)) else 0
        val vEdge = if (i < w * (h - 1)) math.abs(red(i + w) - red(i)) else 0
        (hEdge + vEdge).toLong
      }.sum
      assert(f.edge_energy === expEdge)
    }
  }

  test("video frames: stride sampling before decode, per-frame closed form") {
    val ids = Seq(0L, 3L, 11L, 42L)
    val frames = ids.flatMap { d =>
      val nf = (4 + d % 5).toInt
      (0 until nf by 2).map(k =>
        MultimodalOps.Frame(d, k, MultimodalOps.syntheticFramePng(d, k)))
    }.toDS()
    val stats = MultimodalOps.decodeFrames(frames).collect()
      .map(s => (s.doc_id, s.frame_idx) -> s).toMap
    ids.foreach { d =>
      val nf = (4 + d % 5).toInt
      val sampledK = (0 until nf by 2)
      assert(stats.keys.count(_._1 == d) === sampledK.size)
      val (w, h) = MultimodalOps.imageDims(d)
      sampledK.foreach { k =>
        val s = stats((d, k.toLong))
        assert(s.width === w.toLong && s.height === h.toLong)
        val red = (0 until w * h)
          .map(i => MultimodalOps.framePixelValue(d, k, i, 0))
        val expLum = (0 until w * h).map { i =>
          (MultimodalOps.framePixelValue(d, k, i, 0) +
            MultimodalOps.framePixelValue(d, k, i, 101) +
            MultimodalOps.framePixelValue(d, k, i, 202)).toLong
        }.sum
        assert(s.lum_sum === expLum)
        assert(s.min_r === red.min.toLong && s.max_r === red.max.toLong)
      }
    }
    // distinct frames of one doc differ (offset 13·k actually applied)
    assert(stats((11L, 0L)).lum_sum !== stats((11L, 2L)).lum_sum)
  }

  test("featureBatch skips undecodable payloads like decodeBatch") {
    val out = MultimodalOps.featureBatch(Seq(
      Media(1L, MultimodalOps.syntheticPng(1L)),
      Media(2L, Array[Byte](9, 9, 9))).toDS()).collect()
    assert(out.map(_.doc_id).toSeq === Seq(1L))
  }

  test("imageDims rejects negative doc_id (oracle floor-div divergence)") {
    intercept[IllegalArgumentException](MultimodalOps.imageDims(-1L))
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

  test("dHash: identical pixels hash equal, brightness shift stays near, " +
      "different base is far") {
    val media = Seq(
      Media(0L, MultimodalOps.syntheticFramePng(9L, 0)),
      Media(1L, MultimodalOps.syntheticFramePng(9L, 0)), // exact dup of 0
      Media(2L, MultimodalOps.syntheticFramePng(9L, 1)), // brightness shift
      Media(3L, MultimodalOps.syntheticFramePng(10L, 0)) // different pattern
    ).toDS()
    val h = MultimodalOps.dhashBatch(media).collect()
      .map(r => r.doc_id -> (r.dhash_lo, r.dhash_hi)).toMap
    def ham(a: Long, b: Long) =
      java.lang.Long.bitCount(h(a)._1 ^ h(b)._1) +
        java.lang.Long.bitCount(h(a)._2 ^ h(b)._2)
    assert(ham(0L, 1L) === 0)
    // the synthetic pattern is adversarially high-frequency (adjacent
    // pixels differ by 7 mod 256), so a +13 shift wraps more bits than it
    // would on a natural image — the invariant worth pinning is ORDER:
    // shifted variant strictly nearer than a different pattern
    assert(ham(0L, 2L) < ham(0L, 3L))
    assert(ham(0L, 3L) > 12) // unrelated pattern ~half the bits differ
  }

  test("dhashNearDup: exact + near pairs found, unrelated skipped, " +
      "hot-bucket cap is result-identical") {
    val media = (0L until 40L).map(d =>
      Media(d, MultimodalOps.syntheticFramePng(d % 4, ((d / 4) % 3).toInt)))
    def pairs(cap: Int) = MultimodalOps.dhashNearDup(
        MultimodalOps.dhashBatch(media.toDS()).toDF(), maxHamming = 4,
        maxBucket = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted
    val got = pairs(Int.MaxValue)
    // docs 0 and 12 share (base 0, variant 0): pixel-identical
    assert(got.contains((0L, 12L, 0L)))
    // all pairs relate same-base docs; base differs → no pair
    got.foreach { case (a, b, _) => assert(a % 4 === b % 4) }
    // the decomposed path (cap 2 forces block pairs) is result-identical
    assert(got === pairs(2))
  }

  test("videoNearDup: aligned frames match, frame-count/index mismatches " +
      "reject, hot-bucket cap is result-identical") {
    // hand-built frame hashes: (doc, frame k, lo, hi)
    val fh = Seq(
      // doc 1 and doc 2: same frames {0,2}, aligned hamming 1 on frame 2
      (1L, 0, 0x1234L, 0x5678L), (1L, 2, 0xff00L, 0x00ffL),
      (2L, 0, 0x1234L, 0x5678L), (2L, 2, 0xff01L, 0x00ffL),
      // doc 3: pixel-identical signature to doc 1 (exact-dup cluster)
      (3L, 0, 0x1234L, 0x5678L), (3L, 2, 0xff00L, 0x00ffL),
      // doc 4: same hashes as doc 1 but one extra frame → count mismatch
      (4L, 0, 0x1234L, 0x5678L), (4L, 2, 0xff00L, 0x00ffL),
      (4L, 4, 0xaaaaL, 0xbbbbL),
      // doc 5: same count as doc 1, same hashes, DIFFERENT frame indices
      (5L, 1, 0x1234L, 0x5678L), (5L, 3, 0xff00L, 0x00ffL),
      // doc 6: same frames as doc 1, one frame far away (> threshold)
      (6L, 0, 0x1234L, 0x5678L), (6L, 2, 0x0000L, 0x0000L)
    ).toDF("doc_id", "k", "lo", "hi")
    def run(cap: Int) = MultimodalOps.videoNearDup(fh, maxFrameHamming = 2,
        maxBucket = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted
    val got = run(Int.MaxValue)
    // exact cluster (1,3) at 0; near pairs (1,2) and (2,3) at 1
    assert(got.contains((1L, 3L, 0L)))
    assert(got.contains((1L, 2L, 1L)))
    assert(got.contains((2L, 3L, 1L)))
    // 4 (extra frame), 5 (shifted indices), 6 (far frame) pair with no one
    got.foreach { case (a, b, _) =>
      assert(!Set(4L, 5L, 6L).contains(a) && !Set(4L, 5L, 6L).contains(b)) }
    // the capped decomposition path returns identical pairs
    assert(got === run(1))
  }

  test("gifFrameStats: the animated-GIF container round-trips frame-" +
      "exact; truncated or garbage containers skip whole") {
    val good = Media(1L, MultimodalOps.encodeGifVideo(
      (0 until 3).map(k => MultimodalOps.syntheticGrayFrame(4L, k))))
    val truncated = Media(2L,
      good.payload.take(good.payload.length / 4)) // dies inside frame 0
    val garbage = Media(3L, Array[Byte](1, 2, 3, 4))
    val out = MultimodalOps.gifFrameStats(
      Seq(good, truncated, garbage).toDS()).collect()
    assert(out.forall(_.doc_id == 1L),
      "corrupt containers must skip whole, never partially emit")
    assert(out.map(_.frame_idx).sorted.toSeq === Seq(0L, 1L, 2L))
    // frame 1's stats match the closed form: v = (4*31 + 13 + 7i) % 256
    val (w, h) = MultimodalOps.imageDims(4L)
    val vals = (0 until w * h).map(i => (4 * 31 + 13 + 7 * i) % 256)
    val f1 = out.find(_.frame_idx == 1L).get
    assert(f1.lum_sum === 3L * vals.sum)
    assert(f1.min_r === vals.min.toLong && f1.max_r === vals.max.toLong)
  }

  test("resizeBatch: identity dims are a pixel copy, resized output is " +
      "re-decodable at the target dims, corrupt payloads skip") {
    val m = Seq(Media(5L, MultimodalOps.syntheticPng(5L))).toDS()
    val orig = MultimodalOps.decodeBatch(m).collect().head
    // nearest-neighbor at the source dims samples every pixel exactly
    // once at its own index — a lossless round trip
    val ident = MultimodalOps.decodeBatch(
      MultimodalOps.resizeBatch(m, orig.width, orig.height)).collect().head
    assert(ident === orig)
    val rs = MultimodalOps.decodeBatch(
      MultimodalOps.resizeBatch(m, 16, 12)).collect().head
    assert(rs.width === 16 && rs.height === 12 && rs.channels === 3)
    assert(rs.sum_r > 0 && rs.sum_r <= 255L * 192)
    assert(MultimodalOps.resizeBatch(
      Seq(Media(1L, Array[Byte](9, 9))).toDS(), 8, 8).collect().isEmpty)
  }

  test("dhashContentAddressed: row-identical to the per-row seam, and " +
      "the decode side is distinct-payload-sized") {
    // 30 docs over 6 distinct payloads — a re-upload-heavy corpus
    val media = (0L until 30L).map(d =>
      Media(d, MultimodalOps.syntheticFramePng(d % 3, (d % 2).toInt)))
    val perRow = MultimodalOps.dhashBatch(media.toDS()).collect()
      .map(r => (r.doc_id, r.dhash_lo, r.dhash_hi)).toSeq.sorted
    val ca = MultimodalOps.dhashContentAddressed(media.toDS()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(ca === perRow)
    // the collapse really is content-addressed: 6 distinct payloads
    val nDistinct = media.toDS().toDF()
      .select(sha2(col("payload"), 256)).distinct().count()
    assert(nDistinct === 6L)
    // a corrupt payload is skipped for every carrier, same as per-row
    val withBad = media ++ Seq(Media(97L, Array[Byte](1, 2, 3)),
      Media(98L, Array[Byte](1, 2, 3)))
    val caBad = MultimodalOps.dhashContentAddressed(withBad.toDS())
      .collect().map(_.getLong(0)).toSet
    assert(!caBad.contains(97L) && !caBad.contains(98L))
    assert(caBad.size === 30)
  }
}
