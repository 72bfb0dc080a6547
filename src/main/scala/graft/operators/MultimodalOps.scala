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
  /** STUB: deterministic fake image-header decode (a real implementation
    * would parse PNG/JPEG headers; the hash-derived shape keeps the
    * pipeline testable and deterministic). */
  def decodeStub(payload: Column): Column = struct(
    (pmod(xxhash64(payload, lit(1)), lit(225L)) + 32L).cast("int").as("width"),
    (pmod(xxhash64(payload, lit(2)), lit(225L)) + 32L).cast("int").as("height"),
    lit(3).as("channels"))

  /** STUB: deterministic fake feature extraction — 8 pseudo-features from
    * payload hashes (a real one would run a vision/audio model per batch). */
  def featureStub(payload: Column, dim: Int = 8): Column =
    transform(sequence(lit(1), lit(dim)),
      i => pmod(xxhash64(payload, i), lit(1000L)).cast("double") / lit(1000.0))

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
    * batches (the JVM analog of arrow-batched UDFs). */
  def decodeBatch(media: Dataset[Media]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real impl: val decoder = HeavyDecoder.init()  (once per partition)
      it.map { m =>
        val h1 = scala.util.hashing.MurmurHash3.bytesHash(m.payload, 1)
        val h2 = scala.util.hashing.MurmurHash3.bytesHash(m.payload, 2)
        MediaMeta(m.doc_id, 32 + math.floorMod(h1, 225),
          32 + math.floorMod(h2, 225), 3, m.payload.length.toLong)
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
  /** Decode + feature-extract pipeline over binary payloads (stub kernels,
    * rows-only check; kernel determinism unit-tested). */
  private val q51: Q = (s, dir) => {
    import s.implicits._
    asBinary(Tables(s, dir, "documents"))
      .select($"doc_id",
        decodeStub($"payload").as("meta"),
        featureStub($"payload").as("features"))
      .select($"doc_id", $"meta.width", $"meta.height", $"meta.channels",
        ($"meta.width" * $"meta.height" * $"meta.channels").cast("long")
          .as("n_values"),
        $"features")
      .orderBy($"doc_id")
  }

  val queries: Map[String, Q] = Map(
    "q50_multimodal_metadata" -> q50,
    "q51_multimodal_decode_stub" -> q51)

  val oracleSql: Map[String, String] = Map(
    "q50_multimodal_metadata" -> q50Sql)
}
