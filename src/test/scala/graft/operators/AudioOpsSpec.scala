package graft.operators

import graft.SparkSpec
import graft.operators.MultimodalOps.Media

class AudioOpsSpec extends SparkSpec {
  import spark.implicits._

  test("real WAVE decode roundtrips the encoded PCM pattern exactly") {
    val ids = Seq(0L, 1L, 5L, 42L, 299L)
    val media = ids.toDS().map(d => Media(d, AudioOps.syntheticWav(d)))
    val stats = AudioOps.decodeWavBatch(media).collect()
      .map(s => s.doc_id -> s).toMap
    assert(stats.keySet === ids.toSet)
    ids.foreach { d =>
      val n = AudioOps.nSamples(d)
      val samples = (0 until n).map(i => AudioOps.sampleValue(d, i))
      val s = stats(d)
      assert(s.sample_rate === AudioOps.sampleRate(d))
      assert(s.channels === 1 && s.bits === 16)
      assert(s.n_samples === n.toLong)
      assert(s.sum_s === samples.map(_.toLong).sum)
      assert(s.min_s === samples.min && s.max_s === samples.max)
      assert(s.energy === samples.map(v => v.toLong * v).sum)
      val zc = samples.sliding(2).count(p => (p(0) < 0) != (p(1) < 0))
      assert(s.zero_crossings === zc.toLong)
    }
  }

  test("frame energies tile the waveform: energies sum to total, tail ragged") {
    val media = Seq(7L).toDS().map(d => Media(d, AudioOps.syntheticWav(d)))
    val frames = AudioOps.frameEnergyBatch(media).collect().sortBy(_.frame_idx)
    val n = AudioOps.nSamples(7L) // 207 -> frames of 100, 100, 7
    assert(frames.map(_.frame_n).toSeq === Seq(100L, 100L, n % 100L))
    val total = AudioOps.decodeWavBatch(media).head().energy
    assert(frames.map(_.energy).sum === total)
    frames.foreach(f =>
      assert(f.active === (f.energy > AudioOps.ActiveEnergyThreshold)))
  }

  test("unparseable payloads are skipped row-by-row, not fatal") {
    val media = Seq(
      Media(1L, AudioOps.syntheticWav(1L)),
      Media(2L, Array[Byte](1, 2, 3, 4)), // not a RIFF container
      Media(3L, "RIFF????WAVEfmt ".getBytes), // torn header
      Media(4L, Array.emptyByteArray),
      Media(5L, AudioOps.syntheticWav(5L))
    ).toDS()
    val out = AudioOps.decodeWavBatch(media).collect().map(_.doc_id).toSet
    assert(out === Set(1L, 5L))
  }

  test("nSamples rejects negative doc_id (oracle floor-div divergence)") {
    intercept[IllegalArgumentException](AudioOps.nSamples(-1L))
  }

  test("audio fingerprint: variants near, different bases far, " +
      "corrupt payloads skipped") {
    val media = Seq(
      Media(0L, AudioOps.syntheticWavVariant(7L, 0)),
      Media(1L, AudioOps.syntheticWavVariant(7L, 0)), // identical clip
      Media(2L, AudioOps.syntheticWavVariant(7L, 1)), // click-shifted variant
      Media(3L, AudioOps.syntheticWavVariant(8L, 0)), // different base
      Media(4L, Array[Byte](9, 9, 9))                 // unparseable
    ).toDS()
    val h = AudioOps.fingerprintBatch(media).collect()
      .map(r => r.doc_id -> (r.fp_lo, r.fp_hi)).toMap
    assert(!h.contains(4L)) // skipped row-by-row, not a crash
    def ham(a: Long, b: Long) =
      java.lang.Long.bitCount(h(a)._1 ^ h(b)._1) +
        java.lang.Long.bitCount(h(a)._2 ^ h(b)._2)
    assert(ham(0L, 1L) === 0)
    assert(ham(0L, 2L) <= 2)  // sign bits see through the click track
    assert(ham(0L, 3L) > 10)  // different base clip ~uncorrelated signs
  }
}
