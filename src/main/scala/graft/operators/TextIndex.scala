package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted text index — posting lists as a lakehouse table.
  *
  * The indexed LEXICAL arm the retrieval pipeline (q86 BM25, q195 RRF)
  * and the contamination / incident lookups (q171) swap in at scale:
  * where a token BLOOM can only prune batch directories of the CORPUS,
  * a posting-list index answers "which documents contain term X" from
  * the postings themselves — no corpus scan at all, at any corpus size.
  *
  * Layout mirrors the IVF posting-list index (q120): one ManifestSink
  * entry per term-hash BUCKET, so a lookup routes to 1/[[Buckets]] of
  * the index planned from manifest metadata alone. Freshness and
  * incremental maintenance are inherited wholesale from
  * [[VectorIndex.ensurePartitionedIncremental]]: the index is stamped
  * with the corpus fingerprint in the same atomic commit as its data,
  * pure corpus appends index only the delta files, and anything else
  * degrades to a rebuild — never a stale or doubled index.
  */
object TextIndex {

  /** Term-hash bucket count: each lookup reads 1/Buckets of the index.
    * At deployment scale this rises with the corpus (buckets ≈ index
    * size / target read size), exactly like IVF's nCells. */
  val Buckets = 16

  /** Deterministic term→bucket routing — evaluated Spark-side at BOTH
    * build and lookup, so the two always agree; the oracle never needs
    * to reproduce it (bucketing is pruning, not semantics). */
  def bucketCol(tok: Column): Column =
    pmod(xxhash64(tok), lit(Buckets.toLong)).cast("int")

  /** (doc_id, token, bucket) postings of a corpus slice: one row per
    * DISTINCT whitespace token per document (q171's tokenization, so
    * bloom pruning and index lookup answer the same question). */
  def postings(corpus: DataFrame): DataFrame =
    corpus.select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("token"))
      .withColumn("bucket", bucketCol(col("token")))

  /** Build or incrementally maintain the index for the corpus at
    * `corpusPath`. Fresh fingerprint → no work; pure corpus append →
    * per-bucket entries over the DELTA files only; any other change →
    * full rebuild. One write job either way. */
  def ensure(spark: SparkSession, indexDir: String,
      corpusPath: String): Unit =
    VectorIndex.ensurePartitionedIncremental(spark, indexDir, corpusPath,
      "bucket") { files => postings(spark.read.parquet(files: _*)) }

  /** Posting list of one term: route to its bucket (a pruned read of
    * 1/[[Buckets]] of the index, planned from one manifest read) and
    * apply the exact term filter — identical to scanning the whole
    * index whatever the pruning decided. */
  def lookup(spark: SparkSession, indexDir: String,
      term: String): DataFrame = {
    val b = spark.range(1)
      .select(bucketCol(lit(term)).as("b")).head().getInt(0)
    graft.sinks.ManifestSink.readWhereEq(spark, indexDir, "bucket", b)
      .filter(col("token") === term)
      .select(col("doc_id"))
  }
}
