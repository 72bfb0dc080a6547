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
  def syntheticWav(docId: Long): Array[Byte] = {
    val n = nSamples(docId)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = sampleValue(docId, i)
      pcm(i * 2) = (v & 0xff).toByte
      pcm(i * 2 + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate(docId).toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

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

  val queries: Map[String, Q] = Map(
    "q110_audio_decode" -> q110,
    "q111_audio_frames" -> q111)

  val oracleSql: Map[String, String] = Map(
    "q110_audio_decode" -> q110Sql,
    "q111_audio_frames" -> q111Sql)
}
