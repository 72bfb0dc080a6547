package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing (driver-mandated extension, SURVEY.md §2.10):
  * media payloads as opaque `binary` columns with typed metadata, plus
  * decode / feature-extract / frame-sample stages.
  *
  * No media libraries exist in this environment, so the *decode kernels are
  * deterministic fakes* (clearly marked below); everything around them —
  * schema (binary + metadata struct), partition-level batching via
  * mapPartitions (where a real decoder would amortize library init per
  * partition), batch shape, and the query surface — is real and tested.
  * The fixture payload is the documents text encoded as UTF-8 bytes.
  */
object MultimodalOps {
  type Q = (SparkSession, String) => DataFrame

  /** Media row: opaque payload + typed metadata (the "image table" shape). */
  final case class Media(doc_id: Long, payload: Array[Byte])
  final case class MediaMeta(doc_id: Long, width: Int, height: Int,
      channels: Int, n_bytes: Long)

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

  /** Partition-batched decode via typed mapPartitions — the seam where a
    * real decoder library is initialized once per partition and fed record
    * batches (the JVM analog of arrow-batched UDFs). Produces the same
    * width/height as `decodeStub` (hex chars 49-54 / 55-60 of sha256). */
  def decodeBatch(media: Dataset[Media]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real impl: val decoder = HeavyDecoder.init()  (once per partition)
      val md = java.security.MessageDigest.getInstance("SHA-256")
      it.map { m =>
        val sha = md.digest(m.payload)
        // hex chars 49..54 = bytes 24..26, 55..60 = bytes 27..29
        def slice(b0: Int): Long =
          ((sha(b0) & 0xffL) << 16) | ((sha(b0 + 1) & 0xffL) << 8) |
            (sha(b0 + 2) & 0xffL)
        MediaMeta(m.doc_id, (32 + slice(24) % 225).toInt,
          (32 + slice(27) % 225).toInt, 3, m.payload.length.toLong)
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

  val queries: Map[String, Q] = Map(
    "q50_multimodal_metadata" -> q50,
    "q51_multimodal_decode_stub" -> q51,
    "q68_frame_sample" -> q68)

  val oracleSql: Map[String, String] = Map(
    "q50_multimodal_metadata" -> q50Sql,
    "q51_multimodal_decode_stub" -> q51Sql,
    "q68_frame_sample" -> q68Sql)
}
