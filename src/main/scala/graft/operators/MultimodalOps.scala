package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing (driver-mandated extension, SURVEY.md §2.10):
  * media payloads as opaque `binary` columns with typed metadata, plus
  * decode / feature-extract / frame-sample stages.
  *
  * The image decode path is REAL: `decodeBatch` runs `javax.imageio`
  * (JDK-only, no new dependencies) over binary PNG payloads inside the
  * partition-batched seam, skipping undecodable payloads the way the
  * reference skips corrupt events (pipeline.py:96-102). It is exercised
  * end-to-end by q76 on PNGs *encoded* (also via ImageIO) from a
  * deterministic per-doc pixel pattern, which is what makes a DuckDB
  * hash-oracle possible: the decoded stats equal a closed-form function of
  * (doc_id, pixel index) that SQL can compute without any image library.
  * The feature surface is REAL too: `featureBatch` (q79) computes
  * histogram / luminance / edge-energy features from decoded pixels, and
  * `decodeFrames` (q80) really decodes stride-sampled video frames — both
  * JDK-only and both hash-oracled via the same closed-form-pattern trick
  * as q76. The `*Stub` sha-derived kernels are retained only as
  * deterministic fixtures pinning the q51/q68 plumbing (arbitrary-binary
  * payloads, where no real decode is possible by construction).
  */
object MultimodalOps {
  type Q = (SparkSession, String) => DataFrame

  /** Media row: opaque payload + typed metadata (the "image table" shape). */
  final case class Media(doc_id: Long, payload: Array[Byte])

  /** Decoded-image summary: dimensions + per-channel pixel stats. */
  final case class ImageStats(doc_id: Long, width: Int, height: Int,
      channels: Int, sum_r: Long, sum_g: Long, sum_b: Long,
      min_r: Int, min_g: Int, min_b: Int, max_r: Int, max_g: Int, max_b: Int)

  /** REAL pixel features computed from a decoded image: 8-bin red-channel
    * histogram (bin = r/32), total luminance (sum of r+g+b), and 4-neighbor
    * edge energy (sum of |Δred| over horizontal + vertical neighbors) —
    * all integers, so the DuckDB oracle reproduces them bit-exactly from
    * the closed-form pattern. */
  final case class ImageFeatures(doc_id: Long,
      hist_0: Long, hist_1: Long, hist_2: Long, hist_3: Long,
      hist_4: Long, hist_5: Long, hist_6: Long, hist_7: Long,
      lum_sum: Long, edge_energy: Long)

  /** One sampled frame of a multi-frame (video-shaped) payload. */
  final case class Frame(doc_id: Long, frame_idx: Int, payload: Array[Byte])

  /** Decoded-frame summary for the video path. */
  final case class FrameStats(doc_id: Long, frame_idx: Long, width: Long,
      height: Long, lum_sum: Long, min_r: Long, max_r: Long)

  /** documents.text → binary payload column (the ingest boundary where real
    * media bytes would enter). */
  def asBinary(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))

  // ----------------------------------------------------- STUB DECODERS
  /** sha256-hex slice → bounded long: the shared basis of every stub
    * kernel. Cross-engine exact (sha256 and hex→int agree everywhere), so
    * the stub pipeline is oracle-able end to end. */
  private def shaSlice(sha: Column, start: Column, len: Int): Column =
    conv(sha.substr(start, lit(len)), 16, 10).cast("long")

  /** STUB: deterministic fake image-header decode (a real implementation
    * would parse PNG/JPEG headers; the hash-derived shape keeps the
    * pipeline testable, deterministic, and DuckDB-replicable). Hex chars
    * 49-54 → width, 55-60 → height, each in [32, 257). */
  def decodeStub(payload: Column): Column = {
    val sha = sha2(payload, 256)
    struct(
      (pmod(shaSlice(sha, lit(49), 6), lit(225L)) + 32L).cast("int").as("width"),
      (pmod(shaSlice(sha, lit(55), 6), lit(225L)) + 32L).cast("int").as("height"),
      lit(3).as("channels"))
  }

  /** STUB: deterministic fake feature extraction — `dim` (≤8) pseudo-
    * features in [0,1) from 6-hex-char sha slices (a real one would run a
    * vision/audio model per batch). Integer basis ÷ 1000 keeps every value
    * bit-identical across engines. */
  def featureStub(payload: Column, dim: Int = 8): Column = {
    require(dim <= 8, "featureStub draws from hex chars 1-48 (8 slices)")
    val sha = sha2(payload, 256)
    transform(sequence(lit(0), lit(dim - 1)),
      i => pmod(shaSlice(sha, i * lit(6) + lit(1), 6), lit(1000L))
        .cast("double") / lit(1000.0))
  }

  /** Integer feature basis (values in [0,1000)) — q51 reduces this to
    * scalar stats so the comparison stays integer-exact until one final
    * division. */
  private def featureInts(payload: Column, dim: Int = 8): Column = {
    val sha = sha2(payload, 256)
    transform(sequence(lit(0), lit(dim - 1)),
      i => pmod(shaSlice(sha, i * lit(6) + lit(1), 6), lit(1000L)))
  }

  /** Frame sampling: every `stride`-th fixed-size byte window of the payload
    * (the video-frame-sample shape; real frames would be decoded chunks). */
  def frameSample(payload: Column, frameBytes: Int, stride: Int,
      maxFrames: Int): Column =
    filter(
      transform(sequence(lit(0), lit(maxFrames - 1)),
        i => payload.substr(i * lit(stride) + lit(1), lit(frameBytes))),
      f => octet_length(f) > 0)

  // ------------------------------------------------ REAL IMAGE KERNELS
  /** Synthetic-image dimensions for doc `d`: width 8..16, height 8..14.
    * Small enough that the oracle's per-pixel UNNEST stays cheap, varied
    * enough that per-doc stats differ (w·h < 256, so min/max are not the
    * degenerate 0/255 for every doc).
    *
    * PRECONDITION: docId >= 0. Scala's truncating `/` and `%` diverge from
    * DuckDB's floor `//` / `%` on negative operands (and a non-positive
    * width would make BufferedImage throw); fixture doc_ids are 0..N. */
  def imageDims(docId: Long): (Int, Int) = {
    require(docId >= 0, s"imageDims requires nonnegative doc_id, got $docId")
    ((8 + docId % 9).toInt, (8 + (docId / 9) % 7).toInt)
  }

  /** Per-channel pixel value at flat index `i` (row-major y·w+x) of frame
    * `frame`, channel offset 0/101/202 for R/G/B — the closed form the
    * DuckDB oracle replicates with integer arithmetic. Same docId >= 0
    * precondition as [[imageDims]] (enforced there — every caller sizes
    * via imageDims). */
  @inline def framePixelValue(docId: Long, frame: Int, i: Int,
      channelOffset: Int): Int =
    ((docId * 31 + frame.toLong * 13 + i.toLong * 7 + channelOffset) % 256)
      .toInt

  /** Frame-0 pixel value (the single-image pattern q76 oracles). */
  @inline def pixelValue(docId: Long, i: Int, channelOffset: Int): Int =
    framePixelValue(docId, 0, i, channelOffset)

  /** REAL PNG encode (javax.imageio, JDK-only): renders the deterministic
    * per-frame pattern into a TYPE_INT_RGB buffer and writes actual PNG
    * bytes. The *byte stream* is encoder-version-dependent (never
    * oracled); the *decoded pixels* are exact because PNG is lossless. */
  /** ImageIO defaults to a DISK-backed stream cache: every read/write
    * spills through a temp file — at corpus scale that is one file
    * create+delete per image. Memory-cached streams are strictly better
    * for byte-array payloads. JVM-global, set once lazily (executors
    * included: every kernel references this before touching ImageIO). */
  @transient private lazy val imageIoNoDiskCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  def syntheticFramePng(docId: Long, frame: Int): Array[Byte] = {
    imageIoNoDiskCache
    val (w, h) = imageDims(docId)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    // one bulk setRGB: the per-pixel form re-runs color-model conversion
    // per call and dominates encode time at corpus scale
    val px = new Array[Int](w * h)
    var i = 0
    while (i < px.length) {
      px(i) = (framePixelValue(docId, frame, i, 0) << 16) |
        (framePixelValue(docId, frame, i, 101) << 8) |
        framePixelValue(docId, frame, i, 202)
      i += 1
    }
    img.setRGB(0, 0, w, h, px, 0, w)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Single-image (frame-0) encode — the q76 fixture. */
  def syntheticPng(docId: Long): Array[Byte] = syntheticFramePng(docId, 0)

  /** Shared ImageIO read with the reference's per-row corrupt-payload skip
    * (pipeline.py:96-102): undecodable bytes → None, never a task crash. */
  private def readImage(
      payload: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    imageIoNoDiskCache
    try Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload)))
    catch {
      case _: java.io.IOException => None
      case _: RuntimeException => None // malformed container metadata
    }
  }

  /** REAL partition-batched decode via typed mapPartitions — the seam
    * where a decoder is initialized once per partition and fed record
    * batches (the JVM analog of arrow-batched UDFs). Runs
    * `javax.imageio.ImageIO.read` per payload; payloads that are not a
    * decodable image (null reader match or IO error) are SKIPPED, row by
    * row, mirroring the reference's per-event corrupt-JSON skip
    * (pipeline.py:96-102). Emits dimensions, channel count from the color
    * model, and exact per-channel integer pixel stats. */
  def decodeBatch(media: Dataset[Media]): Dataset[ImageStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // ImageIO's plugin-registry scan is JVM-global; a heavier codec
      // would be initialized here, once per partition, and amortized
      // across the partition's rows.
      it.flatMap { m =>
        readImage(m.payload).map { bi =>
          val w = bi.getWidth
          val h = bi.getHeight
          val px = bi.getRGB(0, 0, w, h, null, 0, w) // one bulk read
          var sr = 0L; var sg = 0L; var sb = 0L
          var mnr = 255; var mng = 255; var mnb = 255
          var mxr = 0; var mxg = 0; var mxb = 0
          var i = 0
          while (i < px.length) {
            val rgb = px(i)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            sr += r; sg += g; sb += b
            if (r < mnr) mnr = r; if (r > mxr) mxr = r
            if (g < mng) mng = g; if (g > mxg) mxg = g
            if (b < mnb) mnb = b; if (b > mxb) mxb = b
            i += 1
          }
          ImageStats(m.doc_id, w, h, bi.getColorModel.getNumComponents,
            sr, sg, sb, mnr, mng, mnb, mxr, mxg, mxb)
        }
      }
    }
  }

  /** REAL feature extraction over decoded pixels (the q51 stub's
    * replacement): 8-bin red histogram, luminance sum, and 4-neighbor edge
    * energy on the red channel — classic cheap vision features a JDK can
    * compute, through the same per-partition batched seam as
    * [[decodeBatch]]. Undecodable payloads are skipped row by row. */
  def featureBatch(media: Dataset[Media]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        readImage(m.payload).map { bi =>
          val w = bi.getWidth
          val h = bi.getHeight
          val px = bi.getRGB(0, 0, w, h, null, 0, w) // one bulk read
          val red = new Array[Int](w * h)
          val hist = new Array[Long](8)
          var lum = 0L
          var i = 0
          while (i < px.length) {
            val rgb = px(i)
            val r = (rgb >> 16) & 0xff
            red(i) = r
            hist(r >> 5) += 1
            lum += r + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            i += 1
          }
          var edge = 0L
          i = 0
          while (i < w * h) {
            if (i % w != w - 1) edge += math.abs(red(i + 1) - red(i))
            if (i < w * (h - 1)) edge += math.abs(red(i + w) - red(i))
            i += 1
          }
          ImageFeatures(m.doc_id, hist(0), hist(1), hist(2), hist(3),
            hist(4), hist(5), hist(6), hist(7), lum, edge)
        }
      }
    }
  }

  /** REAL per-frame decode for the video path (the q68 stub's
    * replacement): each sampled frame's PNG bytes go through the same
    * ImageIO seam; emits per-frame luminance and red-channel extrema. */
  def decodeFrames(frames: Dataset[Frame]): Dataset[FrameStats] = {
    import frames.sparkSession.implicits._
    frames.mapPartitions { it =>
      it.flatMap { f =>
        readImage(f.payload).map { bi =>
          val w = bi.getWidth
          val h = bi.getHeight
          val px = bi.getRGB(0, 0, w, h, null, 0, w) // one bulk read
          var lum = 0L
          var mnr = 255
          var mxr = 0
          var i = 0
          while (i < px.length) {
            val rgb = px(i)
            val r = (rgb >> 16) & 0xff
            lum += r + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            if (r < mnr) mnr = r
            if (r > mxr) mxr = r
            i += 1
          }
          FrameStats(f.doc_id, f.frame_idx.toLong, w.toLong, h.toLong,
            lum, mnr.toLong, mxr.toLong)
        }
      }
    }
  }

  // ---------------------------------------------------------------- q50
  /** Binary metadata audit — fully oracle-able (byte length, sha256, head
    * bytes in hex). ASCII fixture text makes char/byte substring agree. */
  private val q50: Q = (s, dir) => {
    import s.implicits._
    asBinary(Tables(s, dir, "documents"))
      .select(
        $"doc_id",
        length($"payload").cast("long").as("n_bytes"),
        sha2($"payload", 256).as("sha256_hex"),
        hex(substring($"payload", 1, 8)).as("head_hex"),
        lit("text/plain").as("mime"))
      .orderBy($"doc_id")
  }
  private val q50Sql =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  sha256(text) AS sha256_hex,
      |  hex(encode(substr(text, 1, 8))) AS head_hex,
      |  'text/plain' AS mime
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q51
  /** Decode + feature-extract pipeline over binary payloads. The stub
    * kernels are sha256-derived, so the whole pipeline is oracle-able; the
    * feature vector is reduced to scalar stats (integer basis, one final
    * ÷1000.0) to keep the output flat and the doubles bit-exact. */
  private val q51: Q = (s, dir) => {
    import s.implicits._
    asBinary(Tables(s, dir, "documents"))
      .select($"doc_id",
        decodeStub($"payload").as("meta"),
        featureInts($"payload").as("fi"))
      .select($"doc_id",
        $"meta.width".cast("long").as("width"),
        $"meta.height".cast("long").as("height"),
        $"meta.channels".cast("long").as("channels"),
        ($"meta.width" * $"meta.height" * $"meta.channels").cast("long")
          .as("n_values"),
        (aggregate($"fi", lit(0L), (a, x) => a + x).cast("double") /
          lit(1000.0)).as("feat_sum"),
        (array_min($"fi").cast("double") / lit(1000.0)).as("feat_min"),
        (array_max($"fi").cast("double") / lit(1000.0)).as("feat_max"))
      .orderBy($"doc_id")
  }
  private val q51Sql =
    """WITH f AS (
      |  SELECT doc_id, sha256(text) AS sha,
      |    list_transform(range(0, 8),
      |      i -> CAST(CAST('0x' || substr(sha256(text), i*6 + 1, 6) AS INTEGER)
      |           AS BIGINT) % 1000) AS fi
      |  FROM documents)
      |SELECT doc_id,
      |  32 + CAST('0x' || substr(sha, 49, 6) AS INTEGER)::BIGINT % 225 AS width,
      |  32 + CAST('0x' || substr(sha, 55, 6) AS INTEGER)::BIGINT % 225 AS height,
      |  CAST(3 AS BIGINT) AS channels,
      |  (32 + CAST('0x' || substr(sha, 49, 6) AS INTEGER)::BIGINT % 225)
      |    * (32 + CAST('0x' || substr(sha, 55, 6) AS INTEGER)::BIGINT % 225)
      |    * 3 AS n_values,
      |  CAST(list_sum(fi) AS DOUBLE) / 1000.0 AS feat_sum,
      |  CAST(list_min(fi) AS DOUBLE) / 1000.0 AS feat_min,
      |  CAST(list_max(fi) AS DOUBLE) / 1000.0 AS feat_max
      |FROM f
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q68
  /** Frame-sample pipeline (the video shape): every stride-th fixed-size
    * byte window of the payload becomes a frame row (posexplode — one
    * generate, no shuffle until the output sort), each frame carrying its
    * length and a per-frame STUB feature reduction (sha-derived, like
    * q51's — a real pipeline would decode and resize the frame here; the
    * frame slicing, row explosion, and per-frame kernel seam are the real
    * plumbing). Payloads shorter than the frame grid yield fewer frames;
    * a trailing partial window survives as a short frame. All counts are
    * integers and the feature basis divides once at the end, so the whole
    * query hash-matches the DuckDB oracle. */
  private val q68: Q = (s, dir) => {
    import s.implicits._
    asBinary(Tables(s, dir, "documents"))
      .select($"doc_id",
        posexplode(frameSample($"payload", frameBytes = 32, stride = 64,
          maxFrames = 8)).as(Seq("frame_idx", "frame")))
      .select($"doc_id",
        $"frame_idx".cast("long").as("frame_idx"),
        octet_length($"frame").cast("long").as("frame_len"),
        (aggregate(featureInts($"frame", 4), lit(0L), (a, x) => a + x)
          .cast("double") / lit(1000.0)).as("feat_sum"))
      .orderBy($"doc_id", $"frame_idx")
  }
  private val q68Sql =
    """WITH fr AS (
      |  SELECT doc_id, i AS raw_idx, substr(text, i*64 + 1, 32) AS frame
      |  FROM documents, UNNEST(range(0, 8)) AS t(i)),
      |kept AS (
      |  SELECT doc_id, frame,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY raw_idx) - 1
      |      AS frame_idx
      |  FROM fr WHERE length(frame) > 0)
      |SELECT doc_id,
      |  CAST(frame_idx AS BIGINT) AS frame_idx,
      |  CAST(length(frame) AS BIGINT) AS frame_len,
      |  CAST(list_sum(list_transform(range(0, 4),
      |    i -> CAST('0x' || substr(sha256(frame), i*6 + 1, 6) AS INTEGER)
      |         ::BIGINT % 1000)) AS DOUBLE) / 1000.0 AS feat_sum
      |FROM kept
      |ORDER BY doc_id, frame_idx""".stripMargin

  // ---------------------------------------------------------------- q76
  /** REAL image decode end-to-end: per doc, ImageIO-encode a deterministic
    * pattern PNG, then decode it back through the `decodeBatch` ImageIO
    * seam and emit dimensions + per-channel pixel stats. Every decoded
    * value equals a closed-form function of (doc_id, pixel index) — PNG is
    * lossless — so DuckDB reproduces the stats with integer arithmetic
    * over an UNNEST(range(w·h)) pixel grid, no image library needed.
    * The PNG byte size is deliberately NOT emitted (encoder-dependent). */
  private val q76: Q = (s, dir) => {
    import s.implicits._
    val media = Tables(s, dir, "documents").select($"doc_id").as[Long]
      .mapPartitions(it => it.map(d => Media(d, syntheticPng(d))))
    decodeBatch(media).toDF()
      .select($"doc_id",
        $"width".cast("long").as("width"),
        $"height".cast("long").as("height"),
        $"channels".cast("long").as("channels"),
        $"sum_r", $"sum_g", $"sum_b",
        $"min_r".cast("long").as("min_r"),
        $"min_g".cast("long").as("min_g"),
        $"min_b".cast("long").as("min_b"),
        $"max_r".cast("long").as("max_r"),
        $"max_g".cast("long").as("max_g"),
        $"max_b".cast("long").as("max_b"))
      .orderBy($"doc_id")
  }
  private val q76Sql =
    """WITH d AS (
      |  SELECT doc_id,
      |         8 + doc_id % 9 AS w,
      |         8 + (doc_id // 9) % 7 AS h
      |  FROM documents),
      |px AS (
      |  SELECT doc_id, w, h,
      |         (doc_id * 31 + i * 7) % 256 AS r,
      |         (doc_id * 31 + i * 7 + 101) % 256 AS g,
      |         (doc_id * 31 + i * 7 + 202) % 256 AS b
      |  FROM d, UNNEST(range(0, w * h)) AS t(i))
      |SELECT doc_id,
      |  CAST(w AS BIGINT) AS width,
      |  CAST(h AS BIGINT) AS height,
      |  CAST(3 AS BIGINT) AS channels,
      |  CAST(SUM(r) AS BIGINT) AS sum_r,
      |  CAST(SUM(g) AS BIGINT) AS sum_g,
      |  CAST(SUM(b) AS BIGINT) AS sum_b,
      |  CAST(MIN(r) AS BIGINT) AS min_r,
      |  CAST(MIN(g) AS BIGINT) AS min_g,
      |  CAST(MIN(b) AS BIGINT) AS min_b,
      |  CAST(MAX(r) AS BIGINT) AS max_r,
      |  CAST(MAX(g) AS BIGINT) AS max_g,
      |  CAST(MAX(b) AS BIGINT) AS max_b
      |FROM px
      |GROUP BY doc_id, w, h
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q79
  /** REAL image features end-to-end (q51's stub kernel made real): encode
    * the deterministic pattern, decode through ImageIO, and compute
    * histogram / luminance / edge energy from the actual pixels. Every
    * output is an integer function of (doc_id, pixel index), so DuckDB
    * reproduces it over an UNNEST(range(w·h)) grid: bin = r//32, edge
    * terms re-derive each neighbor's red value from the closed form. */
  private val q79: Q = (s, dir) => {
    import s.implicits._
    val media = Tables(s, dir, "documents").select($"doc_id").as[Long]
      .mapPartitions(it => it.map(d => Media(d, syntheticPng(d))))
    featureBatch(media).toDF().orderBy($"doc_id")
  }
  private val q79Sql =
    """WITH d AS (
      |  SELECT doc_id,
      |         8 + doc_id % 9 AS w,
      |         8 + (doc_id // 9) % 7 AS h
      |  FROM documents),
      |px AS (
      |  SELECT doc_id, w, h, i,
      |         (doc_id * 31 + i * 7) % 256 AS r,
      |         (doc_id * 31 + i * 7 + 101) % 256 AS g,
      |         (doc_id * 31 + i * 7 + 202) % 256 AS b
      |  FROM d, UNNEST(range(0, w * h)) AS t(i))
      |SELECT doc_id,
      |  CAST(SUM(CASE WHEN r // 32 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS hist_0,
      |  CAST(SUM(CASE WHEN r // 32 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hist_1,
      |  CAST(SUM(CASE WHEN r // 32 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS hist_2,
      |  CAST(SUM(CASE WHEN r // 32 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS hist_3,
      |  CAST(SUM(CASE WHEN r // 32 = 4 THEN 1 ELSE 0 END) AS BIGINT) AS hist_4,
      |  CAST(SUM(CASE WHEN r // 32 = 5 THEN 1 ELSE 0 END) AS BIGINT) AS hist_5,
      |  CAST(SUM(CASE WHEN r // 32 = 6 THEN 1 ELSE 0 END) AS BIGINT) AS hist_6,
      |  CAST(SUM(CASE WHEN r // 32 = 7 THEN 1 ELSE 0 END) AS BIGINT) AS hist_7,
      |  CAST(SUM(r + g + b) AS BIGINT) AS lum_sum,
      |  CAST(SUM(
      |    CASE WHEN i % w <> w - 1
      |         THEN abs((doc_id * 31 + (i + 1) * 7) % 256 - r) ELSE 0 END
      |    + CASE WHEN i < w * (h - 1)
      |           THEN abs((doc_id * 31 + (i + w) * 7) % 256 - r) ELSE 0 END)
      |    AS BIGINT) AS edge_energy
      |FROM px
      |GROUP BY doc_id, w, h
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q80
  /** REAL video-frame pipeline (q68's stub kernel made real): each doc is
    * a variable-length frame list (4 + doc_id%5 PNG-encoded frames); a
    * relational stride filter SAMPLES every 2nd frame BEFORE the expensive
    * decode (cheap-predicate-before-decode is the ordering that matters at
    * 100 TB — never decode what sampling will drop), then each kept frame
    * is really decoded through the ImageIO seam. Per-frame stats follow
    * the closed form with a per-frame offset of 13·frame_idx. */
  private val q80: Q = (s, dir) => {
    import s.implicits._
    // Relational (doc, frame) grid + stride filter FIRST: only sampled
    // frames ever reach the encode/decode seam, so frames the sampler
    // drops are never materialized at all (at scale, decode dominates —
    // a sampler that runs after decode wastes most of the pipeline).
    val grid = Tables(s, dir, "documents")
      .select($"doc_id",
        explode(sequence(lit(0), ((lit(4) + $"doc_id" % 5) - 1).cast("int")))
          .as("frame_idx"))
      .filter($"frame_idx" % 2 === 0)
    val frames = grid.as[(Long, Int)].mapPartitions { it =>
      it.map { case (d, k) => Frame(d, k, syntheticFramePng(d, k)) }
    }
    decodeFrames(frames).toDF().orderBy($"doc_id", $"frame_idx")
  }
  private val q80Sql =
    """WITH d AS (
      |  SELECT doc_id,
      |         8 + doc_id % 9 AS w,
      |         8 + (doc_id // 9) % 7 AS h,
      |         4 + doc_id % 5 AS nf
      |  FROM documents),
      |fr AS (
      |  SELECT doc_id, w, h, k
      |  FROM d, UNNEST(range(0, nf)) AS t(k)
      |  WHERE k % 2 = 0),
      |px AS (
      |  SELECT doc_id, k, w, h,
      |         (doc_id * 31 + k * 13 + i * 7) % 256 AS r,
      |         (doc_id * 31 + k * 13 + i * 7 + 101) % 256 AS g,
      |         (doc_id * 31 + k * 13 + i * 7 + 202) % 256 AS b
      |  FROM fr, UNNEST(range(0, w * h)) AS t(i))
      |SELECT doc_id,
      |  CAST(k AS BIGINT) AS frame_idx,
      |  CAST(w AS BIGINT) AS width,
      |  CAST(h AS BIGINT) AS height,
      |  CAST(SUM(r + g + b) AS BIGINT) AS lum_sum,
      |  CAST(MIN(r) AS BIGINT) AS min_r,
      |  CAST(MAX(r) AS BIGINT) AS max_r
      |FROM px
      |GROUP BY doc_id, k, w, h
      |ORDER BY doc_id, frame_idx""".stripMargin

  // ------------------------------------------------- PERCEPTUAL HASHING
  /** 64-bit dHash row: the hash is carried as two 32-bit halves in signed
    * longs so every downstream engine (Spark, DuckDB) can band, xor, and
    * popcount it without unsigned-overflow edge cases at bit 63. */
  final case class DHashRow(doc_id: Long, dhash_lo: Long, dhash_hi: Long)

  /** REAL perceptual dHash over decoded pixels, through the same
    * partition-batched ImageIO seam as [[decodeBatch]]: sample a 9×8
    * grayscale grid (nearest-neighbor — integer index math an oracle can
    * replicate exactly, unlike area-average resize), then one bit per
    * adjacent-column comparison: bit(gy·8+gx) = gray(gx+1,gy) > gray(gx,gy).
    * Comparing NEIGHBORS makes the hash invariant under uniform brightness
    * shift (both sides move together), which is exactly the perturbation
    * class near-dup images exhibit; only values that wrap mod 256 flip
    * bits. Undecodable payloads are skipped row by row. */
  /** The dHash bit kernel over one decoded image (shared by the per-row
    * and content-addressed seams). */
  private def dhashOf(bi: java.awt.image.BufferedImage): (Long, Long) = {
    val w = bi.getWidth
    val h = bi.getHeight
    val px = bi.getRGB(0, 0, w, h, null, 0, w)
    @inline def gray(gx: Int, gy: Int): Int = {
      val rgb = px((gy * h / 8) * w + (gx * w / 9))
      (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
    }
    var lo = 0L; var hi = 0L
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        if (gray(gx + 1, gy) > gray(gx, gy)) {
          val bit = gy * 8 + gx
          if (bit < 32) lo |= 1L << bit else hi |= 1L << (bit - 32)
        }
        gx += 1
      }
      gy += 1
    }
    (lo, hi)
  }

  def dhashBatch(media: Dataset[Media]): Dataset[DHashRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        readImage(m.payload).map { bi =>
          val (lo, hi) = dhashOf(bi)
          DHashRow(m.doc_id, lo, hi)
        }
      }
    }
  }

  /** CONTENT-ADDRESSED dHash: byte-identical payloads decode exactly
    * once. Real corpora are full of byte-identical media (re-uploads,
    * mirrors, hotlink caches), and decode is the expensive stage of the
    * pipeline — so collapse on a sha-256 content key BEFORE the codec
    * seam, decode one representative per distinct payload, and fan the
    * hash back out to every carrying row.
    *
    * Shape (one pass over `media`, one shuffle): hash each payload
    * (codegen sha2 — orders of magnitude cheaper than the ImageIO
    * decode it elides), then a single partially-aggregated groupBy
    * ships ONE payload per content key per map partition (`first` is
    * map-side combinable) plus the carrying doc ids (`collect_list`,
    * the same bounded-duplication collapse contract as
    * [[dhashNearDup]]'s identical-hash groups); the decode seam then
    * runs over DISTINCT payloads only, and an `explode` restores
    * per-doc rows. Decode cost scales with distinct content, not
    * corpus size — on a corpus with duplication factor f this is an
    * f× cut of the dominant stage. Output rows match [[dhashBatch]]
    * exactly (spec-pinned). */
  def dhashContentAddressed(media: Dataset[Media]): DataFrame = {
    import media.sparkSession.implicits._
    media.toDF()
      .select(sha2(col("payload"), 256).as("__ck"), col("payload"),
        col("doc_id"))
      .groupBy(col("__ck"))
      .agg(first(col("payload")).as("payload"),
        collect_list(col("doc_id")).as("__ids"))
      .select(col("payload"), col("__ids"))
      .as[(Array[Byte], Seq[Long])]
      .mapPartitions { it =>
        it.flatMap { case (p, ids) =>
          readImage(p).map { bi => val (lo, hi) = dhashOf(bi); (ids, lo, hi) }
        }
      }
      .toDF("__ids", "dhash_lo", "dhash_hi")
      .select(explode(col("__ids")).as("doc_id"), col("dhash_lo"),
        col("dhash_hi"))
  }

  /** REAL nearest-neighbor RESIZE through the ImageIO seam — the
    * thumbnail/normalization stage of a media pipeline, emitting resized
    * MEDIA (PNG payloads), not just stats: decode, resample to
    * `outW`×`outH` with integer nearest-neighbor index math
    * (ix = x·w/outW, iy = y·h/outH — the same oracle-replicable sampling
    * as [[dhashBatch]]'s grid; area-average interpolation is
    * deliberately avoided because float filtering is not cross-engine
    * exact), re-encode PNG. Undecodable payloads are skipped row by row.
    * Composes with every other media stage ([[decodeBatch]],
    * [[dhashBatch]], [[dhashContentAddressed]]) since the output is the
    * same `Media` shape as the input. */
  def resizeBatch(media: Dataset[Media], outW: Int,
      outH: Int): Dataset[Media] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        readImage(m.payload).map { bi =>
          val w = bi.getWidth
          val h = bi.getHeight
          val px = bi.getRGB(0, 0, w, h, null, 0, w)
          val out = new java.awt.image.BufferedImage(
            outW, outH, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val opx = new Array[Int](outW * outH)
          var y = 0
          while (y < outH) {
            val iy = y * h / outH
            var x = 0
            while (x < outW) {
              opx(y * outW + x) = px(iy * w + (x * w / outW))
              x += 1
            }
            y += 1
          }
          out.setRGB(0, 0, outW, outH, opx, 0, outW)
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          Media(m.doc_id, bos.toByteArray)
        }
      }
    }
  }

  /** Image near-dup by Hamming distance over dHash — the pixel analog of
    * MinHash-LSH, reusing its scale machinery end to end: collapse
    * identical hashes first (an exact-dup cluster of m images is ONE
    * node through candidate generation), band the 64 bits into 4×16-bit
    * exact-match keys, generate candidates through
    * [[DedupOps.bandSelfJoin]] (hot-bucket capped), verify with two
    * xor+popcounts, and expand members after verification.
    *
    * RECALL CONTRACT (r9 advice): with 4 bands, candidate generation is
    * guaranteed-complete only for `maxHamming` ≤ 3 (pigeonhole: ≤ 3
    * flipped bits cannot touch all 4 bands, so some band matches
    * exactly). At `maxHamming` ≥ 4 a pair whose flipped bits land in 4
    * distinct bands shares no band and is silently dropped — banded
    * recall < 1, the standard LSH tradeoff. Callers needing exact
    * Hamming-≤ k semantics for k ≥ 4 must add probe bands (q115 runs at
    * maxHamming = 4 and its oracle mirrors the same banded candidate
    * generation, so the gate measures the banded semantics, not exact
    * Hamming). */
  def dhashNearDup(hashes: DataFrame, maxHamming: Int,
      maxBucket: Int = DedupOps.DefaultMaxBucket): DataFrame = {
    // persist: everything upstream of here is the DECODE+hash pipeline —
    // the probe job, both candidate sides, and both expansion sides
    // consume this frame, and without the cache each would re-decode the
    // whole corpus (same discipline as minhashNearDupTokens' groups)
    val groups = hashes.groupBy(col("dhash_lo"), col("dhash_hi"))
      .agg(collect_list(col("doc_id")).as("__members"))
      .withColumn("__gid", array_min(col("__members")))
      .persist()
    val banded = groups.select(col("__gid") +: col("dhash_lo") +:
      col("dhash_hi") +:
      Seq(posexplode(array(
        col("dhash_lo").bitwiseAND(65535),
        shiftright(col("dhash_lo"), 16).bitwiseAND(65535),
        col("dhash_hi").bitwiseAND(65535),
        shiftright(col("dhash_hi"), 16).bitwiseAND(65535)))
        .as(Seq("__bidx", "__bhash"))): _*)
    val verified = DedupOps.bandSelfJoin(
        banded, "__gid", Seq("dhash_lo", "dhash_hi"), maxBucket)
      .select(col("__ga"), col("__gb"),
        (bit_count(col("dhash_lo_a").bitwiseXOR(col("dhash_lo_b"))) +
          bit_count(col("dhash_hi_a").bitwiseXOR(col("dhash_hi_b"))))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
    val ga = groups.select(col("__gid").as("__ga"),
      col("__members").as("__mem_a"))
    val gb = groups.select(col("__gid").as("__gb"),
      col("__members").as("__mem_b"))
    val cross = verified.join(ga, "__ga").join(gb, "__gb")
      .select(explode(col("__mem_a")).as("__x"), col("__mem_b"),
        col("hamming"))
      .select(col("__x"), explode(col("__mem_b")).as("__y"), col("hamming"))
      .select(least(col("__x"), col("__y")).as("id_a"),
        greatest(col("__x"), col("__y")).as("id_b"), col("hamming"))
    val intra = groups.filter(size(col("__members")) >= 2)
      .select(explode(col("__members")).as("__x"), col("__members"))
      .select(col("__x"), explode(col("__members")).as("__y"))
      .filter(col("__x") < col("__y"))
      .select(col("__x").as("id_a"), col("__y").as("id_b"),
        lit(0L).as("hamming"))
    cross.union(intra)
  }

  // --------------------------------------------------------------- q115
  /** Perceptual near-dup end-to-end on REAL pixels: each doc renders a
    * brightness-shifted variant of a shared base pattern
    * (`syntheticFramePng(doc_id % 20, (doc_id/20) % 3)` — the frame term
    * adds a uniform +13·v to every channel mod 256, i.e. a brightness
    * shift with wraparound), PNG-encode → ImageIO-decode → dHash →
    * Hamming-banded near-dup at distance ≤ 4. Same-variant docs are
    * pixel-identical (hamming 0, via the identical-hash collapse);
    * cross-variant docs differ only where values wrap, flipping few
    * dHash bits. The oracle replicates hash, bands, candidates, and
    * verification with integer arithmetic over the closed-form pattern. */
  private val q115: Q = (s, dir) => {
    import s.implicits._
    val media = Tables(s, dir, "documents").select($"doc_id").as[Long]
      .mapPartitions(it => it.map(d =>
        Media(d, syntheticFramePng(d % 20, ((d / 20) % 3).toInt))))
    // content-addressed: the corpus is re-upload-heavy by construction
    // (every same-(base, v) doc is byte-identical), so the decode seam
    // runs once per distinct payload, not once per doc
    dhashNearDup(dhashContentAddressed(media), maxHamming = 4)
      .orderBy($"id_a", $"id_b")
  }
  private val q115Sql =
    """WITH d AS (
      |  SELECT doc_id, doc_id % 20 AS base, (doc_id // 20) % 3 AS v
      |  FROM documents),
      |dims AS (
      |  SELECT doc_id, base, v,
      |         8 + base % 9 AS w, 8 + (base // 9) % 7 AS h
      |  FROM d),
      |bits AS (
      |  SELECT doc_id, gy * 8 + gx AS bit,
      |    CASE WHEN
      |      ((base*31 + v*13 + ((gy*h//8)*w + ((gx+1)*w//9))*7) % 256
      |       + (base*31 + v*13 + ((gy*h//8)*w + ((gx+1)*w//9))*7 + 101) % 256
      |       + (base*31 + v*13 + ((gy*h//8)*w + ((gx+1)*w//9))*7 + 202) % 256) // 3
      |      >
      |      ((base*31 + v*13 + ((gy*h//8)*w + (gx*w//9))*7) % 256
      |       + (base*31 + v*13 + ((gy*h//8)*w + (gx*w//9))*7 + 101) % 256
      |       + (base*31 + v*13 + ((gy*h//8)*w + (gx*w//9))*7 + 202) % 256) // 3
      |    THEN 1 ELSE 0 END AS b
      |  FROM dims, UNNEST(range(0, 8)) AS t1(gx), UNNEST(range(0, 8)) AS t2(gy)),
      |hash AS (
      |  SELECT doc_id,
      |    CAST(SUM(CASE WHEN bit < 32
      |      THEN b * (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS lo,
      |    CAST(SUM(CASE WHEN bit >= 32
      |      THEN b * (CAST(1 AS BIGINT) << (bit - 32)) ELSE 0 END) AS BIGINT) AS hi
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
      |WHERE bit_count(xor(ha.lo, hb.lo)) + bit_count(xor(ha.hi, hb.hi)) <= 4
      |ORDER BY id_a, id_b""".stripMargin

  // ------------------------------------------------ VIDEO NEAR-DUP (q123)
  /** Video near-dup — the FIFTH dedup modality, closing the matrix
    * (text shingle/MinHash, image dHash, audio fingerprint, embedding
    * cosine, now multi-frame video). A video's signature is the sorted
    * array of its sampled frames' 64-bit dHashes; two videos are
    * near-dups iff they sampled the SAME frame indices and EVERY aligned
    * frame pair is within `maxFrameHamming` bits. Scale skeleton is
    * q115's, lifted from one hash to a hash sequence:
    *
    *   1. identical-signature collapse FIRST (an exact-dup cluster of m
    *      re-uploads is ONE node through candidate generation);
    *   2. banded candidates — each frame contributes its 4×16-bit
    *      Hamming bands under band index `k·4+j`, so a shared band means
    *      "some aligned frame agrees on 16 bits"; the self-join runs
    *      through [[DedupOps.bandSelfJoin]] (hot-bucket capped, one
    *      reducer never sees more than 2·maxBucket rows);
    *   3. verification is array-local: `zip_with` over the two sorted
    *      signatures (misaligned frame indices poison the pair with a
    *      sentinel distance — padded nulls from unequal lengths resolve
    *      to the sentinel too, so unequal frame counts reject without a
    *      separate length check), `array_max` ≤ threshold;
    *   4. members expand back AFTER verification (output-bound, like
    *      every near-dup query here).
    *
    * Banded-recall contract (same as [[dhashNearDup]]): per aligned
    * frame, 4 bands guarantee a shared band only for frame Hamming ≤ 3 —
    * and a candidate needs only ONE aligned frame to share a band, so
    * video-level recall is strictly better than single-image recall at
    * the same threshold. `frameHashes` must be one row per (video,
    * sampled frame): (doc_id, k, lo, hi). */
  def videoNearDup(frameHashes: DataFrame, maxFrameHamming: Int,
      maxBucket: Int = DedupOps.DefaultMaxBucket): DataFrame = {
    val sentinel = 9999L
    // persist: the signature build reads the whole decode+hash pipeline;
    // the probe job, both candidate sides, and both expansion sides all
    // consume this frame (same discipline as dhashNearDup's groups)
    val groups = frameHashes
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(
        struct(col("k"), col("lo"), col("hi")))).as("sig"))
      .groupBy(col("sig"))
      .agg(collect_list(col("doc_id")).as("__members"))
      .withColumn("__gid", array_min(col("__members")))
      .persist()
    val banded = groups
      .select(col("__gid"), col("sig"),
        posexplode(col("sig")).as(Seq("__fi", "__f")))
      .select(col("__gid"), col("sig"), col("__f.k").as("__k"),
        posexplode(array(
          col("__f.lo").bitwiseAND(65535),
          shiftright(col("__f.lo"), 16).bitwiseAND(65535),
          col("__f.hi").bitwiseAND(65535),
          shiftright(col("__f.hi"), 16).bitwiseAND(65535)))
          .as(Seq("__j", "__bh")))
      .select(col("__gid"), col("sig"),
        (col("__k") * 4 + col("__j")).as("__bidx"),
        col("__bh").as("__bhash"))
    val verified = DedupOps.bandSelfJoin(
        banded, "__gid", Seq("sig"), maxBucket)
      .dropDuplicates("__ga", "__gb")
      .withColumn("max_hamming",
        array_max(zip_with(col("sig_a"), col("sig_b"), (a, b) =>
          when(a.getField("k") === b.getField("k"),
            (bit_count(a.getField("lo").bitwiseXOR(b.getField("lo"))) +
              bit_count(a.getField("hi").bitwiseXOR(b.getField("hi"))))
              .cast("long"))
            .otherwise(lit(sentinel)))))
      .filter(col("max_hamming") <= maxFrameHamming)
      .select(col("__ga"), col("__gb"), col("max_hamming"))
    val ga = groups.select(col("__gid").as("__ga"),
      col("__members").as("__mem_a"))
    val gb = groups.select(col("__gid").as("__gb"),
      col("__members").as("__mem_b"))
    val cross = verified.join(ga, "__ga").join(gb, "__gb")
      .select(explode(col("__mem_a")).as("__x"), col("__mem_b"),
        col("max_hamming"))
      .select(col("__x"), explode(col("__mem_b")).as("__y"),
        col("max_hamming"))
      .select(least(col("__x"), col("__y")).as("id_a"),
        greatest(col("__x"), col("__y")).as("id_b"), col("max_hamming"))
    val intra = groups.filter(size(col("__members")) >= 2)
      .select(explode(col("__members")).as("__x"), col("__members"))
      .select(col("__x"), explode(col("__members")).as("__y"))
      .filter(col("__x") < col("__y"))
      .select(col("__x").as("id_a"), col("__y").as("id_b"),
        lit(0L).as("max_hamming"))
    cross.union(intra)
  }

  /** q123: video near-dup end-to-end on REAL decoded pixels. Each doc is
    * a multi-frame video (nf = 4 + base%3 frames) rendering a
    * brightness-shifted variant of a shared per-base pattern —
    * `syntheticFramePng(base, k·3 + v)` puts frame k of variant v at a
    * uniform +13·(3k+v) channel shift mod 256, so aligned frames of two
    * variants differ exactly as q115's images do. The stride filter
    * (k % 2 = 0) runs RELATIONALLY before any encode/decode — dropped
    * frames are never materialized (q80's cheap-predicate-first rule) —
    * and the frame key packs into the media id (doc·64 + k) so the
    * image dHash kernel is reused unchanged. */
  private val q123: Q = (s, dir) => {
    import s.implicits._
    val grid = Tables(s, dir, "documents").select($"doc_id")
      .select($"doc_id", explode(sequence(lit(0),
        (lit(3) + $"doc_id" % 20 % 3).cast("int"))).as("k"))
      .filter($"k" % 2 === 0)
    val media = grid.as[(Long, Int)].mapPartitions { it =>
      it.map { case (d, k) =>
        val base = d % 20
        val v = ((d / 20) % 3).toInt
        Media(d * 64 + k, syntheticFramePng(base, k * 3 + v))
      }
    }
    // content-addressed: frames repeat across re-uploaded videos (every
    // same-(base, v) video is a byte-identical frame list), so the
    // decode seam — the dominant stage (r10 verdict) — runs once per
    // distinct frame payload, not once per (video, frame)
    val frameHashes = dhashContentAddressed(media)
      .select(shiftright($"doc_id", 6).as("doc_id"),
        $"doc_id".bitwiseAND(63).cast("int").as("k"),
        $"dhash_lo".as("lo"), $"dhash_hi".as("hi"))
    videoNearDup(frameHashes, maxFrameHamming = 4)
      .orderBy($"id_a", $"id_b")
  }
  private val q123Sql =
    """WITH d AS (
      |  SELECT doc_id, doc_id % 20 AS base, (doc_id // 20) % 3 AS v
      |  FROM documents),
      |dims AS (
      |  SELECT doc_id, base, v,
      |         8 + base % 9 AS w, 8 + (base // 9) % 7 AS h,
      |         4 + base % 3 AS nf
      |  FROM d),
      |fr AS (
      |  SELECT doc_id, base, v, w, h, k
      |  FROM dims, UNNEST(range(0, nf)) AS t(k)
      |  WHERE k % 2 = 0),
      |bits AS (
      |  SELECT doc_id, k, gy * 8 + gx AS bit,
      |    CASE WHEN
      |      ((base*31 + (3*k+v)*13 + ((gy*h//8)*w + ((gx+1)*w//9))*7) % 256
      |       + (base*31 + (3*k+v)*13 + ((gy*h//8)*w + ((gx+1)*w//9))*7 + 101) % 256
      |       + (base*31 + (3*k+v)*13 + ((gy*h//8)*w + ((gx+1)*w//9))*7 + 202) % 256) // 3
      |      >
      |      ((base*31 + (3*k+v)*13 + ((gy*h//8)*w + (gx*w//9))*7) % 256
      |       + (base*31 + (3*k+v)*13 + ((gy*h//8)*w + (gx*w//9))*7 + 101) % 256
      |       + (base*31 + (3*k+v)*13 + ((gy*h//8)*w + (gx*w//9))*7 + 202) % 256) // 3
      |    THEN 1 ELSE 0 END AS b
      |  FROM fr, UNNEST(range(0, 8)) AS t1(gx), UNNEST(range(0, 8)) AS t2(gy)),
      |hash AS (
      |  SELECT doc_id, k,
      |    CAST(SUM(CASE WHEN bit < 32
      |      THEN b * (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS lo,
      |    CAST(SUM(CASE WHEN bit >= 32
      |      THEN b * (CAST(1 AS BIGINT) << (bit - 32)) ELSE 0 END) AS BIGINT) AS hi
      |  FROM bits GROUP BY doc_id, k),
      |bands AS (
      |  SELECT doc_id, k, lo, hi,
      |    UNNEST([lo & 65535, (lo >> 16) & 65535,
      |            hi & 65535, (hi >> 16) & 65535]) AS bhash,
      |    UNNEST([k*4 + 0, k*4 + 1, k*4 + 2, k*4 + 3]) AS bidx
      |  FROM hash),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM bands a JOIN bands b
      |    ON a.bidx = b.bidx AND a.bhash = b.bhash AND a.doc_id < b.doc_id),
      |nf_ AS (SELECT doc_id, COUNT(*) AS n FROM hash GROUP BY doc_id),
      |al AS (
      |  SELECT c.id_a, c.id_b, COUNT(*) AS aligned,
      |    MAX(bit_count(xor(ha.lo, hb.lo))
      |      + bit_count(xor(ha.hi, hb.hi))) AS mh
      |  FROM cand c
      |  JOIN hash ha ON ha.doc_id = c.id_a
      |  JOIN hash hb ON hb.doc_id = c.id_b AND hb.k = ha.k
      |  GROUP BY c.id_a, c.id_b)
      |SELECT al.id_a, al.id_b, CAST(al.mh AS BIGINT) AS max_hamming
      |FROM al
      |JOIN nf_ na ON na.doc_id = al.id_a
      |JOIN nf_ nb ON nb.doc_id = al.id_b
      |WHERE al.aligned = na.n AND al.aligned = nb.n AND al.mh <= 4
      |ORDER BY id_a, id_b""".stripMargin

  // ------------------------------------------------- GIF video container
  /** REAL video-container ENCODE: an animated GIF89a — a genuine
    * multi-frame container format (logical screen descriptor, per-frame
    * image descriptors, LZW-compressed palette-indexed data) written
    * through `javax.imageio`'s sequence writer. Grayscale frames
    * round-trip pixel-exact (each frame's ≤256 distinct colors fit the
    * palette — probed true on this JDK), the property that makes a
    * closed-form DuckDB oracle possible, exactly as PNG's losslessness
    * does for the still-image seams. */
  def encodeGifVideo(
      frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    imageIoNoDiskCache
    import javax.imageio.{IIOImage, ImageIO}
    val bos = new java.io.ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach(f => writer.writeToSequence(
        new IIOImage(f, null, null), writer.getDefaultWriteParam))
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** REAL video-container DECODE through the partition-batched seam:
    * parse the GIF container (`ImageReader.getNumImages` walks the
    * block structure; `read(k)` LZW-decodes frame k against its
    * palette) and emit per-frame stats. A payload that is not a
    * well-formed GIF — wrong magic, truncated block stream, corrupt LZW
    * data — is SKIPPED whole, row by row, the reference's corrupt-event
    * rule applied to containers. */
  def gifFrameStats(media: Dataset[Media]): Dataset[FrameStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      imageIoNoDiskCache
      it.flatMap { m =>
        val out = scala.collection.mutable.ArrayBuffer.empty[FrameStats]
        try {
          val reader =
            javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(m.payload))
          try {
            // seekForwardOnly must be FALSE: getNumImages(allowSearch)
            // walks the whole block stream and rejects forward-only input
            reader.setInput(iis, false, true)
            val n = reader.getNumImages(true)
            var k = 0
            while (k < n) {
              val bi = reader.read(k)
              val w = bi.getWidth
              val h = bi.getHeight
              val px = bi.getRGB(0, 0, w, h, null, 0, w)
              var lum = 0L; var mn = 255L; var mx = 0L
              var i = 0
              while (i < px.length) {
                val r = (px(i) >> 16) & 0xff
                lum += r + ((px(i) >> 8) & 0xff) + (px(i) & 0xff)
                if (r < mn) mn = r
                if (r > mx) mx = r
                i += 1
              }
              out += FrameStats(m.doc_id, k.toLong, w.toLong, h.toLong,
                lum, mn, mx)
              k += 1
            }
          } finally { reader.dispose(); iis.close() }
        } catch {
          case _: java.io.IOException => out.clear() // container corrupt
          case _: RuntimeException => out.clear()
        }
        out
      }
    }
  }

  /** Container-native frame-SAMPLED dHash: only every `stride`-th frame
    * of the GIF container is LZW-decoded (`ImageReader.read(k)` decodes
    * on demand), which is the sampling lever a real container gives
    * that a pre-exploded frame table cannot — frames the stride skips
    * are never decompressed at all. Corrupt containers skip whole. */
  def gifFrameDHash(media: Dataset[Media], stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      imageIoNoDiskCache
      it.flatMap { m =>
        val out =
          scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long, Long)]
        try {
          val reader =
            javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(m.payload))
          try {
            reader.setInput(iis, false, true)
            val n = reader.getNumImages(true)
            var k = 0
            while (k < n) {
              if (k % stride == 0) {
                val (lo, hi) = dhashOf(reader.read(k))
                out += ((m.doc_id, k, lo, hi))
              }
              k += 1
            }
          } finally { reader.dispose(); iis.close() }
        } catch {
          case _: java.io.IOException => out.clear()
          case _: RuntimeException => out.clear()
        }
        out
      }
    }.toDF("doc_id", "k", "lo", "hi")
  }

  /** Inter-frame change signal straight off the container — the input
    * to shot-boundary detection (mean-absolute frame difference, the
    * baseline of Boreczky & Rowe 1996): ONE sequential pass LZW-decodes
    * each frame once, holds only the PREVIOUS frame's pixel array, and
    * emits per frame delta = Σ_i (|Δr|+|Δg|+|Δb|) against it (−1 for
    * frame 0, which starts the first scene; a resolution change is a
    * certain cut — Long.MaxValue). Decode stays partition-local and the
    * shuffle carries one integer row per frame, never pixels; corrupt
    * containers skip whole, per the container-seam rule. */
  def gifFrameDelta(media: Dataset[Media]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      imageIoNoDiskCache
      it.flatMap { m =>
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Long, Long, Long)]
        try {
          val reader = javax.imageio.ImageIO
            .getImageReadersByFormatName("gif").next()
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(m.payload))
          try {
            reader.setInput(iis, false, true)
            val n = reader.getNumImages(true)
            var prev: Array[Int] = null
            var pw = -1
            var ph = -1
            var k = 0
            while (k < n) {
              val bi = reader.read(k)
              val w = bi.getWidth
              val h = bi.getHeight
              val px = bi.getRGB(0, 0, w, h, null, 0, w)
              val delta: Long =
                if (k == 0) -1L
                else if (w != pw || h != ph) Long.MaxValue
                else {
                  var s = 0L
                  var i = 0
                  while (i < px.length) {
                    val a = px(i)
                    val b = prev(i)
                    s += math.abs(((a >> 16) & 0xff) - ((b >> 16) & 0xff)) +
                      math.abs(((a >> 8) & 0xff) - ((b >> 8) & 0xff)) +
                      math.abs((a & 0xff) - (b & 0xff))
                    i += 1
                  }
                  s
                }
              out += ((m.doc_id, k.toLong, w.toLong, h.toLong, delta))
              prev = px
              pw = w
              ph = h
              k += 1
            }
          } finally { reader.dispose(); iis.close() }
        } catch {
          case _: java.io.IOException => out.clear()
          case _: RuntimeException => out.clear()
        }
        out
      }
    }.toDF("doc_id", "k", "width", "height", "delta")
  }

  /** Shot segmentation over [[gifFrameDelta]]'s signal: frame k starts
    * a new scene when its delta reaches `perChannel` mean absolute
    * difference per pixel per channel (delta ≥ perChannel·3·w·h —
    * integer arithmetic throughout, so the decision is engine-exact);
    * scenes are the runs between cuts, emitted as
    * (doc_id, scene_idx, start_frame, end_frame, n_frames). The only
    * wide operation is a per-document window over FRAME rows (bounded
    * by the container's frame count, never by pixels) — the clip-
    * extraction preprocessing a video training pipeline runs before
    * sampling frames per scene. */
  def videoScenes(frameDeltas: DataFrame, perChannel: Long = 1L)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cut = col("k") > 0 &&
      col("delta") >= lit(3L * perChannel) * col("width") * col("height")
    frameDeltas
      .withColumn("scene_idx",
        sum(when(cut, 1L).otherwise(0L)).over(
          Window.partitionBy(col("doc_id")).orderBy(col("k"))))
      .groupBy(col("doc_id"), col("scene_idx"))
      .agg(min(col("k")).as("start_frame"), max(col("k")).as("end_frame"),
        count(lit(1)).cast("long").as("n_frames"))
  }

  /** One grayscale pattern frame for the GIF fixture: value
    * v(i) = (base·31 + k·13 + i·7) mod 256 at flat index i. */
  def syntheticGrayFrame(base: Long, k: Int): java.awt.image.BufferedImage = {
    val (w, h) = imageDims(base)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](w * h)
    var i = 0
    while (i < px.length) {
      val v = ((base * 31 + k * 13 + i.toLong * 7) % 256).toInt
      px(i) = (v << 16) | (v << 8) | v
      i += 1
    }
    img.setRGB(0, 0, w, h, px, 0, w)
    img
  }

  // --------------------------------------------------------------- q160
  /** REAL container-format video decode end-to-end: each doc is an
    * ANIMATED GIF (2 + doc_id%3 grayscale pattern frames) — encoded as
    * a true GIF89a container and decoded back through the container
    * seam ([[gifFrameStats]]: block-structure walk + per-frame LZW
    * decode against the palette). Grayscale round-trips pixel-exact, so
    * every emitted stat equals a closed-form function of
    * (doc_id, frame, pixel index) that DuckDB computes with integer
    * arithmetic — the container pipeline gets the same oracle rigor as
    * the still-image seams. */
  private val q160: Q = (s, dir) => {
    import s.implicits._
    val media = Tables(s, dir, "documents").select($"doc_id").as[Long]
      .mapPartitions(it => it.map { d =>
        val nf = (2 + d % 3).toInt
        Media(d, encodeGifVideo(
          (0 until nf).map(k => syntheticGrayFrame(d % 20, k))))
      })
    gifFrameStats(media).toDF()
      .select($"doc_id", $"frame_idx", $"width", $"height",
        $"lum_sum", $"min_r", $"max_r")
      .orderBy($"doc_id", $"frame_idx")
  }
  private val q160Sql =
    """WITH d AS (
      |  SELECT doc_id, doc_id % 20 AS base, 2 + doc_id % 3 AS nf
      |  FROM documents),
      |dims AS (
      |  SELECT doc_id, base, nf,
      |         8 + base % 9 AS w, 8 + (base // 9) % 7 AS h
      |  FROM d),
      |fr AS (
      |  SELECT doc_id, base, w, h, k
      |  FROM dims, UNNEST(range(0, nf)) AS t(k)),
      |px AS (
      |  SELECT doc_id, k, w, h,
      |         (base * 31 + k * 13 + i * 7) % 256 AS v
      |  FROM fr, UNNEST(range(0, w * h)) AS u(i))
      |SELECT doc_id, CAST(k AS BIGINT) AS frame_idx,
      |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
      |  CAST(3 * SUM(v) AS BIGINT) AS lum_sum,
      |  CAST(MIN(v) AS BIGINT) AS min_r,
      |  CAST(MAX(v) AS BIGINT) AS max_r
      |FROM px
      |GROUP BY doc_id, k, w, h
      |ORDER BY doc_id, frame_idx""".stripMargin

  // --------------------------------------------------------------- q161
  /** Video near-dup over REAL containers, end to end: each doc is one
    * ANIMATED GIF holding its full frame list; the stride filter runs
    * AT THE CONTAINER ([[gifFrameDHash]] LZW-decodes only every 2nd
    * frame — skipped frames are never decompressed), and the sampled
    * frame dHashes feed the SAME [[videoNearDup]] pipeline as q123
    * (collapse-first, capped aligned bands, zip_with verify). The
    * fixture mirrors q123's variant structure on grayscale frames
    * (same-(base,v) videos byte-identical, cross-variant near), so the
    * oracle re-derives every sampled frame's hash from the closed form
    * with single-channel integer compares. */
  private val q161: Q = (s, dir) => {
    import s.implicits._
    val media = Tables(s, dir, "documents").select($"doc_id").as[Long]
      .mapPartitions(it => it.map { d =>
        val base = d % 20
        val v = ((d / 20) % 3).toInt
        val nf = (4 + base % 3).toInt
        Media(d, encodeGifVideo(
          (0 until nf).map(k => syntheticGrayFrame(base, 3 * k + v))))
      })
    videoNearDup(gifFrameDHash(media, 2), maxFrameHamming = 4)
      .orderBy($"id_a", $"id_b")
  }
  private val q161Sql =
    """WITH d AS (
      |  SELECT doc_id, doc_id % 20 AS base, (doc_id // 20) % 3 AS v
      |  FROM documents),
      |dims AS (
      |  SELECT doc_id, base, v,
      |         8 + base % 9 AS w, 8 + (base // 9) % 7 AS h,
      |         4 + base % 3 AS nf
      |  FROM d),
      |fr AS (
      |  SELECT doc_id, base, v, w, h, k
      |  FROM dims, UNNEST(range(0, nf)) AS t(k)
      |  WHERE k % 2 = 0),
      |bits AS (
      |  SELECT doc_id, k, gy * 8 + gx AS bit,
      |    CASE WHEN
      |      (base*31 + (3*k+v)*13 + ((gy*h//8)*w + ((gx+1)*w//9))*7) % 256
      |      >
      |      (base*31 + (3*k+v)*13 + ((gy*h//8)*w + (gx*w//9))*7) % 256
      |    THEN 1 ELSE 0 END AS b
      |  FROM fr, UNNEST(range(0, 8)) AS t1(gx), UNNEST(range(0, 8)) AS t2(gy)),
      |hash AS (
      |  SELECT doc_id, k,
      |    CAST(SUM(CASE WHEN bit < 32
      |      THEN b * (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS lo,
      |    CAST(SUM(CASE WHEN bit >= 32
      |      THEN b * (CAST(1 AS BIGINT) << (bit - 32)) ELSE 0 END) AS BIGINT) AS hi
      |  FROM bits GROUP BY doc_id, k),
      |bands AS (
      |  SELECT doc_id, k, lo, hi,
      |    UNNEST([lo & 65535, (lo >> 16) & 65535,
      |            hi & 65535, (hi >> 16) & 65535]) AS bhash,
      |    UNNEST([k*4 + 0, k*4 + 1, k*4 + 2, k*4 + 3]) AS bidx
      |  FROM hash),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM bands a JOIN bands b
      |    ON a.bidx = b.bidx AND a.bhash = b.bhash AND a.doc_id < b.doc_id),
      |nf_ AS (SELECT doc_id, COUNT(*) AS n FROM hash GROUP BY doc_id),
      |al AS (
      |  SELECT c.id_a, c.id_b, COUNT(*) AS aligned,
      |    MAX(bit_count(xor(ha.lo, hb.lo))
      |      + bit_count(xor(ha.hi, hb.hi))) AS mh
      |  FROM cand c
      |  JOIN hash ha ON ha.doc_id = c.id_a
      |  JOIN hash hb ON hb.doc_id = c.id_b AND hb.k = ha.k
      |  GROUP BY c.id_a, c.id_b)
      |SELECT al.id_a, al.id_b, CAST(al.mh AS BIGINT) AS max_hamming
      |FROM al
      |JOIN nf_ na ON na.doc_id = al.id_a
      |JOIN nf_ nb ON nb.doc_id = al.id_b
      |WHERE al.aligned = na.n AND al.aligned = nb.n AND al.mh <= 4
      |ORDER BY id_a, id_b""".stripMargin

  // --------------------------------------------------------------- q156
  /** REAL resize end-to-end — the full media normalization round trip
    * (encode → decode → nearest-neighbor resize to 16×12 → re-encode →
    * decode → stats), four genuine ImageIO passes through two seams
    * composed on the `Media` shape. The oracle replicates the resized
    * pixel values with integer arithmetic alone: output pixel (x, y)
    * samples source index iy·w + ix with ix = ⌊x·w/16⌋, iy = ⌊y·h/12⌋,
    * and the source value is q76's closed-form pattern — PNG is lossless
    * at both encode steps, so the decoded stats are exact. */
  private val q156: Q = (s, dir) => {
    import s.implicits._
    val media = Tables(s, dir, "documents").select($"doc_id").as[Long]
      .mapPartitions(it => it.map(d => Media(d, syntheticPng(d))))
    decodeBatch(resizeBatch(media, 16, 12)).toDF()
      .select($"doc_id",
        $"width".cast("long").as("width"),
        $"height".cast("long").as("height"),
        $"sum_r", $"sum_g", $"sum_b",
        $"min_r".cast("long").as("min_r"),
        $"max_r".cast("long").as("max_r"))
      .orderBy($"doc_id")
  }
  private val q156Sql =
    """WITH d AS (
      |  SELECT doc_id,
      |         8 + doc_id % 9 AS w,
      |         8 + (doc_id // 9) % 7 AS h
      |  FROM documents),
      |px AS (
      |  SELECT doc_id,
      |         ((j // 16) * h // 12) * w + ((j % 16) * w // 16) AS i
      |  FROM d, UNNEST(range(0, 192)) AS t(j)),
      |v AS (
      |  SELECT doc_id,
      |         (doc_id * 31 + i * 7) % 256 AS r,
      |         (doc_id * 31 + i * 7 + 101) % 256 AS g,
      |         (doc_id * 31 + i * 7 + 202) % 256 AS b
      |  FROM px)
      |SELECT doc_id,
      |  CAST(16 AS BIGINT) AS width,
      |  CAST(12 AS BIGINT) AS height,
      |  CAST(SUM(r) AS BIGINT) AS sum_r,
      |  CAST(SUM(g) AS BIGINT) AS sum_g,
      |  CAST(SUM(b) AS BIGINT) AS sum_b,
      |  CAST(MIN(r) AS BIGINT) AS min_r,
      |  CAST(MAX(r) AS BIGINT) AS max_r
      |FROM v
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q203
  /** Shot-boundary detection over REAL containers, end to end: each doc
    * is an animated GIF whose frames repeat in runs of 3 (seed jumps by
    * 41 at each run boundary — within a scene frames are byte-identical,
    * across scenes every pixel moves), [[gifFrameDelta]] emits the
    * mean-absolute-difference signal in one container pass, and
    * [[videoScenes]] segments it relationally (cut ⇔ per-channel MAD ≥
    * 1/pixel; any seed jump clears that bound because 13·Δ mod 256 ≠ 0
    * forces every pixel's |Δ| ≥ min(m, 256−m) ≥ 1). The oracle
    * re-derives every frame's pixels from the closed form, recomputes
    * the deltas, and segments with the same threshold — a decoder that
    * mis-diffs adjacent frames, a cut rule off by an inclusive bound,
    * or a window that leaks across documents all hash-mismatch.
    *
    * Scale: decode is one sequential container pass per doc holding two
    * frames of pixels; the shuffle carries one integer row per FRAME;
    * the scene window is bounded by frames-per-container — the clip
    * extraction a video training pipeline runs before per-scene
    * sampling, never a pixel-level shuffle. */
  private val q203: Q = (s, dir) => {
    import s.implicits._
    val media = Tables(s, dir, "documents").select($"doc_id").as[Long]
      .mapPartitions(it => it.map { d =>
        val base = d % 20
        val nf = (6 + base % 3).toInt
        Media(d, encodeGifVideo(
          (0 until nf).map(k => syntheticGrayFrame(base, (k / 3) * 41))))
      })
    videoScenes(gifFrameDelta(media))
      .orderBy($"doc_id", $"scene_idx")
  }
  private val q203Sql =
    """WITH d AS (SELECT doc_id, doc_id % 20 AS base FROM documents),
      |dims AS (
      |  SELECT doc_id, base, 8 + base % 9 AS w, 8 + (base // 9) % 7 AS h,
      |         6 + base % 3 AS nf
      |  FROM d),
      |fr AS (
      |  SELECT doc_id, base, w, h, k
      |  FROM dims, UNNEST(range(0, nf)) AS t(k)),
      |px AS (
      |  SELECT doc_id, k, w, h,
      |    3 * SUM(ABS(
      |      ((base*31 + (k//3)*41*13 + i*7) % 256)
      |      - ((base*31 + ((k-1)//3)*41*13 + i*7) % 256))) AS delta
      |  FROM fr, UNNEST(range(0, w * h)) AS u(i)
      |  WHERE k > 0
      |  GROUP BY doc_id, k, w, h),
      |cuts AS (
      |  SELECT f.doc_id, f.k,
      |    CASE WHEN f.k > 0 AND p.delta >= 3 * f.w * f.h
      |         THEN 1 ELSE 0 END AS is_cut
      |  FROM fr f
      |  LEFT JOIN px p ON p.doc_id = f.doc_id AND p.k = f.k),
      |scn AS (
      |  SELECT doc_id, k,
      |    SUM(is_cut) OVER (
      |      PARTITION BY doc_id ORDER BY k
      |      ROWS UNBOUNDED PRECEDING) AS scene_idx
      |  FROM cuts)
      |SELECT doc_id, CAST(scene_idx AS BIGINT) AS scene_idx,
      |  CAST(MIN(k) AS BIGINT) AS start_frame,
      |  CAST(MAX(k) AS BIGINT) AS end_frame,
      |  CAST(COUNT(*) AS BIGINT) AS n_frames
      |FROM scn
      |GROUP BY doc_id, scene_idx
      |ORDER BY doc_id, scene_idx""".stripMargin

  val queries: Map[String, Q] = Map(
    "q50_multimodal_metadata" -> q50,
    "q51_multimodal_decode_stub" -> q51,
    "q68_frame_sample" -> q68,
    "q76_image_decode" -> q76,
    "q79_image_features" -> q79,
    "q80_video_frames" -> q80,
    "q115_image_phash_dedup" -> q115,
    "q123_video_near_dup" -> q123,
    "q156_image_resize" -> q156,
    "q160_gif_video_decode" -> q160,
    "q161_gif_video_near_dup" -> q161,
    "q203_video_scene_cuts" -> q203)

  val oracleSql: Map[String, String] = Map(
    "q50_multimodal_metadata" -> q50Sql,
    "q51_multimodal_decode_stub" -> q51Sql,
    "q68_frame_sample" -> q68Sql,
    "q76_image_decode" -> q76Sql,
    "q79_image_features" -> q79Sql,
    "q80_video_frames" -> q80Sql,
    "q115_image_phash_dedup" -> q115Sql,
    "q123_video_near_dup" -> q123Sql,
    "q156_image_resize" -> q156Sql,
    "q160_gif_video_decode" -> q160Sql,
    "q161_gif_video_near_dup" -> q161Sql,
    "q203_video_scene_cuts" -> q203Sql)
}
