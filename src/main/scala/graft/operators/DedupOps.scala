package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Near-duplicate detection at scale: MinHash+LSH banding, SimHash, rolling
  * hash (driver-mandated extension, SURVEY.md §2.10).
  *
  * The scale architecture (100 TB): never compare all pairs. Each document is
  * reduced to a constant-size signature in one pass (map-side, codegen'd
  * hash functions, one shuffle per aggregation); LSH banding turns
  * "similar pair" into "equal band hash", i.e. an equi-join Catalyst can
  * shuffle-partition — candidate generation is a join on (band, hash), and
  * only candidates pay the exact-Jaccard verification.
  *
  * Not oracle-able in SQL (xxhash64 is Spark-specific) → registered as
  * rows-only queries; semantics covered by unit tests
  * (graft.operators.DedupOpsSpec).
  */
object DedupOps {
  type Q = (SparkSession, String) => DataFrame

  /** distinct whitespace tokens of a text column */
  def tokenSet(textCol: Column): Column = array_distinct(split(textCol, " "))

  // ------------------------------------------------------------ MinHash
  /** k-permutation MinHash signatures: one row per id, columns __h0..__h{k-1}.
    * Single explode + single groupBy — the k mins are computed in one
    * aggregation pass (map-side partial min, tiny shuffle). */
  def minhashSignatures(toks: DataFrame, idCol: String, tokCol: String,
      k: Int): DataFrame = {
    val exploded = toks.select(col(idCol), explode(col(tokCol)).as("__tok"))
    val aggs = (0 until k).map(i =>
      min(xxhash64(col("__tok"), lit(i))).as(s"__h$i"))
    exploded.groupBy(col(idCol)).agg(aggs.head, aggs.drop(1): _*)
  }

  /** band-hash columns over the __h signature components */
  private def bandHashCols(bands: Int, rowsPerBand: Int): Seq[org.apache.spark.sql.Column] =
    (0 until bands).map { b =>
      val parts = (0 until rowsPerBand).map(r => col(s"__h${b * rowsPerBand + r}"))
      xxhash64(lit(b) +: parts: _*).as(s"__band$b")
    }

  /** LSH banding: signature → `bands` hashes of `rowsPerBand` components;
    * docs sharing any band hash become candidate pairs via an equi-join.
    * `dedup=false` defers the pair-distinct to after verification — when
    * most candidates are filtered out, deduping the small verified set is
    * far cheaper than deduping the raw candidate stream. */
  def lshCandidates(sig: DataFrame, idCol: String, bands: Int,
      rowsPerBand: Int, dedup: Boolean = true): DataFrame = {
    val banded = sig.select(col(idCol) +: bandHashCols(bands, rowsPerBand): _*)
    val long = banded.select(col(idCol),
      posexplode(array((0 until bands).map(b => col(s"__band$b")): _*))
        .as(Seq("__bidx", "__bhash")))
    val a = long.alias("a")
    val b = long.alias("b")
    val pairs = a.join(b,
        col("a.__bidx") === col("b.__bidx") &&
        col("a.__bhash") === col("b.__bhash") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
    if (dedup) pairs.distinct() else pairs
  }

  /** Full MinHash-LSH near-dup pipeline: signatures → banded candidates →
    * exact-Jaccard verification on candidates only.
    *
    * Adaptive verification kernel: when the global vocabulary fits in 62
    * bits, token sets are dictionary-encoded into a single long bitmask and
    * Jaccard becomes integer `bit_count(a&b)/bit_count(a|b)` — orders of
    * magnitude cheaper per pair than string-array intersection, which
    * matters when the corpus is dense with near-dups. Larger vocabularies
    * take the general array path (at 100 TB the analog is a fixed-width
    * hashed bitmap / roaring bitmap per document). The mask table is a few
    * bytes per doc, so Catalyst auto-broadcasts the verify join at test
    * scale and falls back to a shuffle join when it grows. */
  def minhashNearDup(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, bands: Int = 4,
      threshold: Double = 0.9): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val toks = df.select(col(idCol), tokenSet(col(textCol)).as("__toks"))
    val exploded = toks.select(col(idCol), explode(col("__toks")).as("__tok"))
    val vocab = exploded.select("__tok").distinct()
    val sigAggs = (0 until numHashes).map(i =>
      min(xxhash64(col("__tok"), lit(i))).as(s"__h$i"))

    // NOTE: the vocab-size probe is one extra (cheap, column-pruned) job at
    // plan time — the price of picking the kernel adaptively.
    if (vocab.count() <= graft.functions.TokenBitmask.MaxVocab) {
      import graft.functions.TokenBitmask
      val dict = TokenBitmask.dictionary(vocab)
      val sig = TokenBitmask.masks(exploded, dict, Seq(idCol),
        extraAggs = sigAggs)
      // carry the mask through the band explode so the self-join emits
      // verification-ready pairs — no extra joins to attach set data
      val rowsPerBand = numHashes / bands
      val banded = sig
        .select(col(idCol) +: col("__mask") +: bandHashCols(bands, rowsPerBand): _*)
        .select(col(idCol), col("__mask"),
          posexplode(array((0 until bands).map(b => col(s"__band$b")): _*))
            .as(Seq("__bidx", "__bhash")))
      val a = banded.select(col(idCol).as("id_a"), col("__mask").as("__ma"),
        col("__bidx"), col("__bhash"))
      val b = banded.select(col(idCol).as("id_b"), col("__mask").as("__mb"),
        col("__bidx").as("__bidx2"), col("__bhash").as("__bhash2"))
      a.join(b,
          col("__bidx") === col("__bidx2") &&
          col("__bhash") === col("__bhash2") &&
          col("id_a") < col("id_b"))
        .withColumn("jaccard",
          graft.functions.TokenBitmask.jaccard(col("__ma"), col("__mb")))
        .filter(col("jaccard") >= threshold)
        .select(col("id_a"), col("id_b"), col("jaccard"))
        .distinct()
    } else { // general array path
      val sig = exploded.groupBy(col(idCol)).agg(sigAggs.head, sigAggs.drop(1): _*)
      val cand = lshCandidates(sig, idCol, bands, numHashes / bands)
      val ta = toks.select(col(idCol).as("id_a"), col("__toks").as("__toks_a"))
      val tb = toks.select(col(idCol).as("id_b"), col("__toks").as("__toks_b"))
      val inter = size(array_intersect(col("__toks_a"), col("__toks_b"))).cast("double")
      val union = (size(col("__toks_a")) + size(col("__toks_b"))).cast("double") - inter
      cand.join(ta, "id_a").join(tb, "id_b")
        .withColumn("jaccard", inter / union)
        .filter(col("jaccard") >= threshold)
        .select(col("id_a"), col("id_b"), col("jaccard"))
    }
  }

  // ------------------------------------------------------------ SimHash
  /** 64-bit SimHash: per token hash, each bit votes ±1; the signature bit is
    * the vote sign. Two shuffles (per-bit votes, then per-doc assembly);
    * at scale both group on doc id so they co-partition. */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(split(col(textCol), " ")).as("__tok"))
      .withColumn("__h", xxhash64(col("__tok")))
      .select(col(idCol), col("__h"),
        explode(sequence(lit(0), lit(63))).as("__bit"))
      .groupBy(col(idCol), col("__bit"))
      .agg(sum(when(expr("shiftright(__h, __bit) & 1") === 1, 1)
        .otherwise(-1)).as("__vote"))
      .groupBy(col(idCol))
      .agg(sum(when(col("__vote") > 0,
        expr("shiftleft(CAST(1 AS BIGINT), __bit)")).otherwise(0L))
        .as("simhash"))

  /** Hamming distance between two 64-bit signatures (codegen'd builtins). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  // ------------------------------------------------------- rolling hash
  /** Karp-Rabin-style rolling fingerprint over the token sequence
    * (order-sensitive, unlike the md5 content hash): higher-order
    * aggregate, no shuffle. Modular arithmetic keeps the accumulator
    * bounded — ANSI mode (Spark 4 default) would otherwise throw on
    * long overflow. */
  private val RollMod = 1000000007L // 1e9+7, prime
  def rollingHash(tokensCol: Column): Column =
    aggregate(tokensCol, lit(0L),
      (acc, t) =>
        pmod(acc * lit(1000003L) + pmod(xxhash64(t), lit(RollMod)), lit(RollMod)))

  // ------------------------------------------------------------ queries
  /** q36: MinHash-LSH near-dup pairs on documents (rows-only check). */
  private val q36: Q = (s, dir) => {
    import s.implicits._
    minhashNearDup(Tables(s, dir, "documents"), "doc_id", "text")
      .orderBy($"id_a", $"id_b")
  }

  /** q37: SimHash signature + order-sensitive rolling fingerprint per doc
    * (rows-only check). */
  private val q37: Q = (s, dir) => {
    import s.implicits._
    val d = Tables(s, dir, "documents")
    simhash(d, "doc_id", "text")
      .join(d.select($"doc_id",
        rollingHash(split($"text", " ")).as("rolling_hash")), "doc_id")
      .select($"doc_id", $"simhash", $"rolling_hash")
      .orderBy($"doc_id")
  }

  val queries: Map[String, Q] = Map(
    "q36_minhash_near_dup" -> q36,
    "q37_simhash_fingerprints" -> q37)

  /** Not SQL-expressible (xxhash64) → no oracle entries. */
  val oracleSql: Map[String, String] = Map.empty
}
