package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.MultimodalOps.Media
import graft.sources.Tables

/** Audio-modality plumbing (driver-mandated multimodal extension,
  * SURVEY.md §2.10) — the third modality beside images (q76/q79) and
  * video frames (q80), built on the same two principles:
  *
  *   1. The decode path is REAL. `decodeWavBatch` parses RIFF/WAVE
  *      containers with `javax.sound.sampled.AudioSystem` (JDK-only, no
  *      audio hardware needed — file parsing is pure) inside the
  *      partition-batched seam, skipping unparseable payloads row by row
  *      the way the reference skips corrupt events (pipeline.py:96-102).
  *   2. The oracle is closed-form. Payloads are WAVE-encoded (also via
  *      `AudioSystem`) from a deterministic per-doc PCM pattern; WAV PCM
  *      is lossless, so every decoded sample equals an integer function
  *      of (doc_id, sample index) that DuckDB reproduces with arithmetic
  *      over an UNNEST(range(n)) grid — no audio library needed.
  *
  * Stats stay in integer space end-to-end (sums, mins, maxes, sum of
  * squares, sign-change counts): nothing for float rounding to disagree
  * on between engines.
  */
object AudioOps {
  type Q = (SparkSession, String) => DataFrame

  /** Decoded-audio summary: container metadata + exact waveform stats.
    * `duration_us` is integer microseconds (n·1e6 / rate, floor). */
  final case class AudioStats(doc_id: Long, sample_rate: Int, channels: Int,
      bits: Int, n_samples: Long, duration_us: Long, sum_s: Long,
      min_s: Int, max_s: Int, energy: Long, zero_crossings: Long)

  /** One fixed-length analysis window of a decoded waveform (the
    * voice-activity-detection shape): exact energy + an active flag. */
  final case class AudioFrame(doc_id: Long, frame_idx: Long, frame_n: Long,
      energy: Long, active: Boolean)

  // ------------------------------------------------ closed-form fixture
  /** Per-doc sample count 200..499: 2–5 analysis frames of 100, with a
    * ragged tail, small enough that the oracle's per-sample UNNEST stays
    * cheap. Same docId >= 0 precondition as the image fixtures (Scala's
    * truncating `%` diverges from DuckDB's floor `%` on negatives). */
  def nSamples(docId: Long): Int = {
    require(docId >= 0, s"nSamples requires nonnegative doc_id, got $docId")
    (200 + docId % 300).toInt
  }

  /** Per-doc sample rate 8000/12000/16000 Hz — varied so rate-derived
    * columns (duration) are not constant across the corpus. */
  def sampleRate(docId: Long): Int = (8000 + (docId % 3) * 4000).toInt

  /** PCM sample at index `i`: the closed form the DuckDB oracle
    * replicates. Range [-2048, 2047] — comfortably inside 16-bit. */
  @inline def sampleValue(docId: Long, i: Int): Int =
    (((docId * 37 + i.toLong * 11) % 4096) - 2048).toInt

  /** Per-frame activity threshold for the VAD-shaped q111: mean square of
    * a uniform [-2048,2047] sample is ~1.4e6, so a 100-sample frame sits
    * around 1.4e8 — this splits frames nondegenerately. */
  val ActiveEnergyThreshold: Long = 140000000L

  /** REAL WAVE encode (javax.sound.sampled, JDK-only): renders the
    * deterministic pattern as 16-bit signed little-endian mono PCM and
    * writes an actual RIFF/WAVE container. The byte stream is part of the
    * WAV spec (44-byte canonical header) but is never oracled; the
    * *decoded samples* are exact because PCM is lossless. */
  def syntheticWav(docId: Long): Array[Byte] =
    encodeWav(Array.tabulate(nSamples(docId))(i => sampleValue(docId, i)),
      sampleRate(docId))

  /** 16-bit signed little-endian mono PCM → RIFF/WAVE bytes. */
  private def encodeWav(samples: Array[Int], rate: Int): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      val v = samples(i)
      pcm(i * 2) = (v & 0xff).toByte
      pcm(i * 2 + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1,
      true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Fingerprint-fixture sample (q116): QUADRATIC phase so the sign
    * pattern is pseudo-random per base — the linear q110 pattern walks in
    * constant +11 steps, which gives every doc the same sign-run
    * structure and makes any content fingerprint degenerate. `v` selects
    * a variant of the same base clip: +500 on every 31st sample, offset
    * by the variant — the small additive corruption (a click track) a
    * near-dup fingerprint must see through. Range ±2548, inside 16-bit. */
  @inline def fpSampleValue(base: Long, v: Int, i: Int): Int =
    (((base * 1000003L + i.toLong * i * 7919L + i.toLong * 104729L)
      % 4096L) - 2048L).toInt + (if ((i + v) % 31 == 0) 500 else 0)

  /** The q116 fixture payload: a real WAVE of the variant pattern. */
  def syntheticWavVariant(base: Long, v: Int): Array[Byte] =
    encodeWav(Array.tabulate(nSamples(base))(i => fpSampleValue(base, v, i)),
      sampleRate(base))

  /** Shared WAVE read with the reference's per-row corrupt-payload skip
    * (pipeline.py:96-102): unparseable bytes or a non-16-bit-PCM format
    * → None, never a task crash. Returns container metadata + decoded
    * samples (channels interleaved, as the container stores them). */
  private def readWav(
      payload: Array[Byte]): Option[(Int, Int, Int, Array[Int])] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val f = ais.getFormat
        val signedPcm16 =
          f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
            f.getSampleSizeInBits == 16
        if (!signedPcm16) None
        else {
          val bytes = ais.readAllBytes()
          val n = bytes.length / 2
          val out = new Array[Int](n)
          var i = 0
          if (f.isBigEndian)
            while (i < n) {
              out(i) = (bytes(i * 2) << 8) | (bytes(i * 2 + 1) & 0xff)
              i += 1
            }
          else
            while (i < n) {
              out(i) = (bytes(i * 2 + 1) << 8) | (bytes(i * 2) & 0xff)
              i += 1
            }
          Some((f.getSampleRate.toInt, f.getChannels, 16, out))
        }
      } finally ais.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** REAL partition-batched WAVE decode through typed mapPartitions — the
    * same decoder-initialized-once-per-partition seam as the image path
    * (MultimodalOps.decodeBatch). Emits container metadata plus exact
    * integer waveform stats: sum / min / max, energy (sum of squares,
    * ≤ 2048²·500 per doc — far inside Long), and zero crossings (strict
    * sign flips between consecutive samples). */
  def decodeWavBatch(media: Dataset[Media]): Dataset[AudioStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        readWav(m.payload).map { case (rate, ch, bits, s) =>
          var sum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
          var energy = 0L; var zc = 0L
          var i = 0
          while (i < s.length) {
            val v = s(i)
            sum += v
            if (v < mn) mn = v
            if (v > mx) mx = v
            energy += v.toLong * v
            if (i > 0 && ((s(i - 1) < 0) != (v < 0))) zc += 1
            i += 1
          }
          AudioStats(m.doc_id, rate, ch, bits, s.length.toLong,
            s.length.toLong * 1000000L / rate, sum, mn, mx, energy, zc)
        }
      }
    }
  }

  /** REAL windowed feature extraction over decoded samples (the audio
    * analog of the image featureBatch): fixed 100-sample analysis frames
    * (ragged tail kept), exact per-frame energy, and an active flag —
    * the voice-activity-detection stage of an audio curation pipeline.
    * Decode-once-emit-many: one WAV parse feeds every frame row. */
  def frameEnergyBatch(media: Dataset[Media],
      frameLen: Int = 100,
      threshold: Long = ActiveEnergyThreshold): Dataset[AudioFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        readWav(m.payload).toSeq.flatMap { case (_, _, _, s) =>
          s.indices.grouped(frameLen).zipWithIndex.map { case (idx, k) =>
            var energy = 0L
            idx.foreach { i => energy += s(i).toLong * s(i) }
            AudioFrame(m.doc_id, k.toLong, idx.length.toLong, energy,
              energy > threshold)
          }
        }
      }
    }
  }

  // ---------------------------------------------------------------- q110
  /** REAL audio decode end-to-end: per doc, WAVE-encode the deterministic
    * PCM pattern, parse it back through the AudioSystem seam, and emit
    * container metadata + exact waveform stats. DuckDB reproduces every
    * column with integer arithmetic over an UNNEST(range(n)) sample grid
    * (PCM is lossless). The WAV byte size is deliberately NOT emitted
    * (header layout is writer-dependent). */
  private val q110: Q = (s, dir) => {
    import s.implicits._
    val media = Tables(s, dir, "documents").select($"doc_id").as[Long]
      .mapPartitions(it => it.map(d => Media(d, syntheticWav(d))))
    decodeWavBatch(media).toDF()
      .select($"doc_id",
        $"sample_rate".cast("long").as("sample_rate"),
        $"channels".cast("long").as("channels"),
        $"bits".cast("long").as("bits"),
        $"n_samples", $"duration_us", $"sum_s",
        $"min_s".cast("long").as("min_s"),
        $"max_s".cast("long").as("max_s"),
        $"energy", $"zero_crossings")
      .orderBy($"doc_id")
  }
  private val q110Sql =
    """WITH d AS (
      |  SELECT doc_id,
      |         200 + doc_id % 300 AS n,
      |         8000 + (doc_id % 3) * 4000 AS rate
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, n, rate, i,
      |         (doc_id * 37 + i * 11) % 4096 - 2048 AS v,
      |         CASE WHEN i > 0 THEN
      |           (doc_id * 37 + (i - 1) * 11) % 4096 - 2048 END AS pv
      |  FROM d, UNNEST(range(0, n)) AS t(i))
      |SELECT doc_id,
      |  CAST(rate AS BIGINT) AS sample_rate,
      |  CAST(1 AS BIGINT) AS channels,
      |  CAST(16 AS BIGINT) AS bits,
      |  CAST(n AS BIGINT) AS n_samples,
      |  CAST(n * 1000000 // rate AS BIGINT) AS duration_us,
      |  CAST(SUM(v) AS BIGINT) AS sum_s,
      |  CAST(MIN(v) AS BIGINT) AS min_s,
      |  CAST(MAX(v) AS BIGINT) AS max_s,
      |  CAST(SUM(v * v) AS BIGINT) AS energy,
      |  CAST(SUM(CASE WHEN pv IS NOT NULL
      |                 AND (pv < 0) <> (v < 0) THEN 1 ELSE 0 END)
      |       AS BIGINT) AS zero_crossings
      |FROM s
      |GROUP BY doc_id, n, rate
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q111
  /** REAL windowed audio features end-to-end: decode once, then exact
    * 100-sample frame energies with an active (VAD-style) flag. One row
    * per (doc, frame); the ragged tail frame is kept with its true
    * length. */
  private val q111: Q = (s, dir) => {
    import s.implicits._
    val media = Tables(s, dir, "documents").select($"doc_id").as[Long]
      .mapPartitions(it => it.map(d => Media(d, syntheticWav(d))))
    frameEnergyBatch(media).toDF()
      .orderBy($"doc_id", $"frame_idx")
  }
  private val q111Sql =
    """WITH d AS (
      |  SELECT doc_id, 200 + doc_id % 300 AS n FROM documents),
      |s AS (
      |  SELECT doc_id, i, (doc_id * 37 + i * 11) % 4096 - 2048 AS v
      |  FROM d, UNNEST(range(0, n)) AS t(i))
      |SELECT doc_id,
      |  CAST(i // 100 AS BIGINT) AS frame_idx,
      |  CAST(COUNT(*) AS BIGINT) AS frame_n,
      |  CAST(SUM(v * v) AS BIGINT) AS energy,
      |  SUM(v * v) > 140000000 AS active
      |FROM s
      |GROUP BY doc_id, i // 100
      |ORDER BY doc_id, frame_idx""".stripMargin

  // ------------------------------------------------------ FINGERPRINT
  /** 64-bit audio fingerprint row, carried as two 32-bit halves (the same
    * signed-safe layout as the image dHash). */
  final case class AudioFp(doc_id: Long, fp_lo: Long, fp_hi: Long)

  /** Zero-crossing-pattern fingerprint over REALLY-decoded samples: 64
    * nearest-neighbor grid points across the clip (length-invariant — a
    * clip resampled to a different rate keeps its grid), bit j =
    * sample(j·n/64) > 0. Sign bits survive amplitude scaling exactly and
    * small additive corruption mostly — the robustness class an audio
    * near-dup needs — while the grid keeps the bit count fixed so the
    * hash bands like any other 64-bit fingerprint. Same partition-batched
    * AudioSystem seam as [[decodeWavBatch]]; unparseable payloads skip. */
  def fingerprintBatch(media: Dataset[Media]): Dataset[AudioFp] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        readWav(m.payload).map { case (_, _, _, s) =>
          val n = s.length
          var lo = 0L; var hi = 0L
          var j = 0
          while (j < 64 && n > 0) {
            if (s(j * n / 64) > 0) {
              if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
            }
            j += 1
          }
          AudioFp(m.doc_id, lo, hi)
        }
      }
    }
  }

  // ---------------------------------------------------------------- q116
  /** Audio near-dup end-to-end — the FOURTH modality in the dedup matrix
    * (text MinHash, embedding SemDeDup, pixel dHash, now waveform): each
    * doc WAVE-encodes a click-corrupted variant of a base clip, really
    * decodes it, fingerprints the sign pattern, and finds near pairs at
    * Hamming ≤ 2 through the SAME Hamming-banded machinery as q115
    * ([[MultimodalOps.dhashNearDup]]: identical-hash collapse, 4×16-bit
    * pigeonhole bands, hot-bucket-capped bandSelfJoin, xor+popcount
    * verify). The oracle replicates fingerprint, bands, candidates, and
    * verification in integer arithmetic. */
  private val q116: Q = (s, dir) => {
    import s.implicits._
    val media = Tables(s, dir, "documents").select($"doc_id").as[Long]
      .mapPartitions(it => it.map(d =>
        Media(d, syntheticWavVariant(d % 20, ((d / 20) % 3).toInt))))
    MultimodalOps.dhashNearDup(
        fingerprintBatch(media).toDF().select($"doc_id",
          $"fp_lo".as("dhash_lo"), $"fp_hi".as("dhash_hi")),
        maxHamming = 2)
      .orderBy($"id_a", $"id_b")
  }
  private val q116Sql =
    """WITH d AS (
      |  SELECT doc_id, doc_id % 20 AS base, (doc_id // 20) % 3 AS v,
      |         200 + (doc_id % 20) % 300 AS n
      |  FROM documents),
      |bits AS (
      |  SELECT doc_id, j,
      |    CASE WHEN
      |      (base*1000003 + (j*n//64)*(j*n//64)*7919 + (j*n//64)*104729)
      |        % 4096 - 2048
      |      + CASE WHEN ((j*n//64) + v) % 31 = 0 THEN 500 ELSE 0 END > 0
      |    THEN 1 ELSE 0 END AS b
      |  FROM d, UNNEST(range(0, 64)) AS t(j)),
      |hash AS (
      |  SELECT doc_id,
      |    CAST(SUM(CASE WHEN j < 32
      |      THEN b * (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS lo,
      |    CAST(SUM(CASE WHEN j >= 32
      |      THEN b * (CAST(1 AS BIGINT) << (j - 32)) ELSE 0 END) AS BIGINT) AS hi
      |  FROM bits GROUP BY doc_id),
      |bands AS (
      |  SELECT doc_id, lo, hi,
      |    UNNEST([lo & 65535, (lo >> 16) & 65535,
      |            hi & 65535, (hi >> 16) & 65535]) AS bhash,
      |    UNNEST([0, 1, 2, 3]) AS bidx
      |  FROM hash),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM bands a JOIN bands b
      |    ON a.bidx = b.bidx AND a.bhash = b.bhash AND a.doc_id < b.doc_id)
      |SELECT c.id_a, c.id_b,
      |  CAST(bit_count(xor(ha.lo, hb.lo))
      |     + bit_count(xor(ha.hi, hb.hi)) AS BIGINT) AS hamming
      |FROM cand c
      |JOIN hash ha ON ha.doc_id = c.id_a
      |JOIN hash hb ON hb.doc_id = c.id_b
      |WHERE bit_count(xor(ha.lo, hb.lo)) + bit_count(xor(ha.hi, hb.hi)) <= 2
      |ORDER BY id_a, id_b""".stripMargin

  val queries: Map[String, Q] = Map(
    "q110_audio_decode" -> q110,
    "q111_audio_frames" -> q111,
    "q116_audio_fingerprint_dedup" -> q116)

  val oracleSql: Map[String, String] = Map(
    "q110_audio_decode" -> q110Sql,
    "q111_audio_frames" -> q111Sql,
    "q116_audio_fingerprint_dedup" -> q116Sql)
}
