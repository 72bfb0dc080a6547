package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted text index — posting lists as a lakehouse table.
  *
  * The indexed LEXICAL arm the retrieval pipeline (q86 BM25, q195 RRF)
  * and the contamination / incident lookups (q171) swap in at scale:
  * where a token BLOOM can only prune batch directories of the CORPUS,
  * a posting-list index answers "which documents contain term X" (and
  * with what term frequency) from the postings themselves — no corpus
  * scan at all, at any corpus size.
  *
  * Layout mirrors the IVF posting-list index (q120): one ManifestSink
  * entry per term-hash BUCKET, so a lookup routes to 1/[[Buckets]] of
  * the index planned from manifest metadata alone. A companion
  * doc-length table (one narrow row per document, same bucket layout on
  * doc_id) carries what scoring needs beyond postings: N comes from its
  * manifest row count — metadata-only — and Σdl from one aggregate over
  * docs-sized (never corpus-sized) rows. Freshness and incremental
  * maintenance are inherited wholesale from
  * [[VectorIndex.ensurePartitionedIncremental]]: both tables are
  * stamped with the corpus fingerprint in the same atomic commit as
  * their data, pure corpus appends index only the delta files, and
  * anything else degrades to a rebuild — never a stale or doubled
  * index. The index schema is versioned into the directory name, so a
  * schema change can never misread a prior build's artifact.
  */
object TextIndex {

  /** Term-hash bucket count: each lookup reads 1/Buckets of the index.
    * At deployment scale this rises with the corpus (buckets ≈ index
    * size / target read size), exactly like IVF's nCells. */
  val Buckets = 16

  /** Bumped whenever the posting schema changes — versioning the
    * artifact PATH means a stale-schema artifact can never be read
    * (the fingerprint only guards corpus identity, not reader schema). */
  private val SchemaVersion = 2

  /** Postings-table directory for the corpus under `sfDir`. */
  def postingsDir(sfDir: String): String =
    s"${VectorIndex.indexRoot(sfDir)}/text_postings_v$SchemaVersion"

  /** Doc-length companion directory. */
  def doclenDir(sfDir: String): String = postingsDir(sfDir) + "_dl"

  /** Deterministic term→bucket routing — evaluated Spark-side at BOTH
    * build and lookup, so the two always agree; the oracle never needs
    * to reproduce it (bucketing is pruning, not semantics). */
  def bucketCol(tok: Column): Column =
    pmod(xxhash64(tok), lit(Buckets.toLong)).cast("int")

  /** (doc_id, token, tf, bucket) postings of a corpus slice: one row
    * per DISTINCT whitespace token per document, carrying its term
    * frequency (q171's tokenization, so bloom pruning and index lookup
    * answer the same membership question — tf additionally serves
    * BM25-class scoring). */
  def postings(corpus: DataFrame): DataFrame =
    corpus.select(col("doc_id"),
        explode(split(col("text"), " ")).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("bucket", bucketCol(col("token")))

  /** (doc_id, dl, bucket) — one narrow row per document with its token
    * count, bucketed on doc_id for pruned point reads. */
  def doclens(corpus: DataFrame): DataFrame =
    corpus.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("dl"))
      .withColumn("bucket", pmod(col("doc_id"), lit(Buckets.toLong))
        .cast("int"))

  /** Build or incrementally maintain BOTH index tables for the corpus
    * at `corpusPath`. Fresh fingerprint → no work; pure corpus append →
    * per-bucket entries over the DELTA files only; any other change →
    * full rebuild. One write job per table either way. */
  def ensure(spark: SparkSession, sfDir: String,
      corpusPath: String): Unit = {
    VectorIndex.ensurePartitionedIncremental(spark, postingsDir(sfDir),
      corpusPath, "bucket") { files =>
      postings(spark.read.parquet(files: _*))
    }
    VectorIndex.ensurePartitionedIncremental(spark, doclenDir(sfDir),
      corpusPath, "bucket") { files =>
      doclens(spark.read.parquet(files: _*))
    }
  }

  /** Posting list of one term: route to its bucket (a pruned read of
    * 1/[[Buckets]] of the index, planned from one manifest read) and
    * apply the exact term filter — identical to scanning the whole
    * index whatever the pruning decided. */
  def lookup(spark: SparkSession, sfDir: String,
      term: String): DataFrame =
    lookupTf(spark, sfDir, term).select(col("doc_id"))

  /** [[lookup]] carrying the term and its per-doc frequency — the
    * scoring-ready form (df is simply this frame's row count). */
  def lookupTf(spark: SparkSession, sfDir: String,
      term: String): DataFrame = {
    val b = spark.range(1)
      .select(bucketCol(lit(term)).as("b")).head().getInt(0)
    graft.sinks.ManifestSink
      .readWhereEq(spark, postingsDir(sfDir), "bucket", b)
      .filter(col("token") === term)
      .select(col("doc_id"), col("token").as("term"), col("tf"))
  }
}
