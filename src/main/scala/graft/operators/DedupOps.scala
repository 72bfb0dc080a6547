package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash
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
  * All hashing goes through [[graft.functions.PortableHash]] (sha256-slice
  * token hash + modular-arithmetic permutations), so every sketch here is
  * reproducible in ANSI SQL — q36/q37 are hash-compared against DuckDB
  * running the mirrored SQL, not just row-counted.
  */
object DedupOps {
  type Q = (SparkSession, String) => DataFrame
  import PortableHash.{P, foldSql, permSql, tokenHashPSql, tokenHashSql}

  /** distinct whitespace tokens of a text column */
  def tokenSet(textCol: Column): Column = array_distinct(split(textCol, " "))

  /** distinct w-shingles (n-gram windows over the token SEQUENCE — order
    * sensitive, unlike tokenSet): the standard MinHash unit for documents
    * where word order matters. Docs shorter than n tokens get an empty
    * set. */
  def shingleSet(textCol: Column, n: Int): Column = {
    val toksCol = split(textCol, " ")
    when(size(toksCol) >= n,
      array_distinct(transform(sequence(lit(1), size(toksCol) - (n - 1)),
        i => concat_ws(" ",
          (0 until n).map(o => element_at(toksCol, i + lit(o))): _*))))
      .otherwise(array().cast("array<string>"))
  }
  /** DuckDB mirror of [[shingleSet]] (n=2). */
  def shingleSetSql(textExpr: String): String =
    s"CASE WHEN len(string_split($textExpr, ' ')) >= 2 THEN " +
      s"list_distinct(list_transform(range(1, len(string_split($textExpr, ' '))), " +
      s"i -> string_split($textExpr, ' ')[i] || ' ' || string_split($textExpr, ' ')[i+1])) " +
      s"ELSE [] END"

  // ------------------------------------------------------------ MinHash
  /** k-permutation MinHash signatures: one row per id, columns __h0..__h{k-1}.
    * Single explode + single groupBy — the k mins are computed in one
    * aggregation pass (map-side partial min, tiny shuffle). One sha256 per
    * token feeds all k permutations (cheap affine mixes). */
  def minhashSignatures(toks: DataFrame, idCol: String, tokCol: String,
      k: Int): DataFrame = {
    val exploded = toks.select(col(idCol), explode(col(tokCol)).as("__tok"))
    exploded.groupBy(col(idCol)).agg(sigAggs(k).head, sigAggs(k).drop(1): _*)
  }

  /** k min-of-permutation aggregates over a mod-P hash column. */
  private def sigAggsOver(k: Int, h: Column): Seq[Column] =
    (0 until k).map(i => min(PortableHash.perm(i, h)).as(s"__h$i"))

  private def sigAggs(k: Int): Seq[Column] =
    sigAggsOver(k, PortableHash.tokenHashP(col("__tok")))

  /** band-hash columns over the __h signature components: order-sensitive
    * fold seeded with the band index */
  private def bandHashCols(bands: Int, rowsPerBand: Int): Seq[Column] =
    (0 until bands).map { b =>
      val parts = (0 until rowsPerBand).map(r => col(s"__h${b * rowsPerBand + r}"))
      PortableHash.fold(b.toLong, parts).as(s"__band$b")
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
      threshold: Double = 0.9): DataFrame =
    minhashNearDupTokens(df, idCol, tokenSet(col(textCol)),
      numHashes, bands, threshold)

  /** [[minhashNearDup]] over an arbitrary token-set expression — the same
    * pipeline runs on unigram sets, w-shingles, or any precomputed
    * array<string> feature column. */
  def minhashNearDupTokens(df: DataFrame, idCol: String, toksCol: Column,
      numHashes: Int, bands: Int, threshold: Double): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val toks = df.select(col(idCol), toksCol.as("__toks"))
    val exploded = toks.select(col(idCol), explode(col("__toks")).as("__tok"))
    val vocab = exploded.select("__tok").distinct()

    // NOTE: the vocab-size probe is one extra (cheap, column-pruned) job at
    // plan time — the price of picking the kernel adaptively.
    val vocabSize = vocab.count()
    if (vocabSize <= graft.functions.TokenBitmask.MaxVocab) {
      // Exact-duplicate collapse first: a MinHash signature depends only on
      // the token SET, so docs with identical masks are interchangeable.
      // All LSH work (signatures, banding, candidate join, verification)
      // runs over DISTINCT masks — on a near-dup-dense corpus that shrinks
      // the pair join quadratically — and doc-level pairs are expanded only
      // for verified mask pairs. Signatures come from the ≤62-entry
      // dictionary (bit-explode + broadcast join), so the per-token sha256
      // disappears from the document pass entirely: the only per-doc work
      // is the mask build. This is the production shape at 100 TB: exact
      // dedup → sketch distinct sets → near-dup join on sketches.
      import graft.functions.TokenBitmask
      val dict = TokenBitmask.dictionary(vocab)
      val masks = TokenBitmask.masks(exploded, dict, Seq(idCol))
      val groups = masks.groupBy(col("__mask"))
        .agg(collect_list(col(idCol)).as("__members"))
      val dictH = dict
        .select(col("__idx"), PortableHash.tokenHashP(col("__tok")).as("__h"))
      val sigList = sigAggsOver(numHashes, col("__h"))
      val sigs = groups
        .select(col("__mask"),
          explode(sequence(lit(0), lit(vocabSize.toInt - 1))).as("__idx"))
        .filter(expr("(shiftright(__mask, __idx) & 1) = 1"))
        .join(broadcast(dictH), "__idx")
        .groupBy(col("__mask"))
        .agg(sigList.head, sigList.drop(1): _*)
      val rowsPerBand = numHashes / bands
      val banded = sigs
        .select(col("__mask") +: bandHashCols(bands, rowsPerBand): _*)
        .select(col("__mask"),
          posexplode(array((0 until bands).map(b => col(s"__band$b")): _*))
            .as(Seq("__bidx", "__bhash")))
      val a = banded.select(col("__mask").as("__ma"),
        col("__bidx"), col("__bhash"))
      val b = banded.select(col("__mask").as("__mb"),
        col("__bidx").as("__bidx2"), col("__bhash").as("__bhash2"))
      val maskPairs = a.join(b,
          col("__bidx") === col("__bidx2") &&
          col("__bhash") === col("__bhash2") &&
          col("__ma") < col("__mb"))
        .select(col("__ma"), col("__mb")).distinct()
        .withColumn("jaccard", TokenBitmask.jaccard(col("__ma"), col("__mb")))
        .filter(col("jaccard") >= threshold)
      // expand verified mask pairs to doc pairs (each doc has one mask →
      // no duplicate pairs; least/greatest restores id_a < id_b)
      val ga = groups.select(col("__mask").as("__ma"),
        col("__members").as("__mem_a"))
      val gb = groups.select(col("__mask").as("__mb"),
        col("__members").as("__mem_b"))
      val cross = maskPairs.join(ga, "__ma").join(gb, "__mb")
        .select(explode(col("__mem_a")).as("__x"), col("__mem_b"), col("jaccard"))
        .select(col("__x"), explode(col("__mem_b")).as("__y"), col("jaccard"))
        .select(least(col("__x"), col("__y")).as("id_a"),
          greatest(col("__x"), col("__y")).as("id_b"), col("jaccard"))
      // identical-set pairs: same mask ⇒ same signature ⇒ always LSH
      // candidates ⇒ jaccard exactly 1.0
      val intra = groups.filter(size(col("__members")) >= 2)
        .select(explode(col("__members")).as("__x"), col("__members"))
        .select(col("__x"), explode(col("__members")).as("__y"))
        .filter(col("__x") < col("__y"))
        .select(col("__x").as("id_a"), col("__y").as("id_b"),
          lit(1.0).as("jaccard"))
      cross.union(intra)
    } else { // general array path
      val sig = exploded.groupBy(col(idCol))
        .agg(sigAggs(numHashes).head, sigAggs(numHashes).drop(1): _*)
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
  /** 48-bit SimHash over the portable token hash: per token, each bit votes
    * ±1; the signature bit is the vote sign. Two shuffles (per-bit votes,
    * then per-doc assembly); at scale both group on doc id so they
    * co-partition. Duplicate tokens vote multiply (frequency-weighted). */
  val SimHashBits = 48

  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(split(col(textCol), " ")).as("__tok"))
      .withColumn("__h", PortableHash.tokenHash(col("__tok")))
      .select(col(idCol), col("__h"),
        explode(sequence(lit(0), lit(SimHashBits - 1))).as("__bit"))
      .groupBy(col(idCol), col("__bit"))
      .agg(sum(when(expr("shiftright(__h, __bit) & 1") === 1, 1)
        .otherwise(-1)).as("__vote"))
      .groupBy(col(idCol))
      .agg(sum(when(col("__vote") > 0,
        expr("shiftleft(CAST(1 AS BIGINT), __bit)")).otherwise(0L))
        .cast("long").as("simhash"))

  /** Hamming distance between two signatures (codegen'd builtins). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  // ------------------------------------------------------- rolling hash
  /** Karp-Rabin-style rolling fingerprint over the token sequence
    * (order-sensitive, unlike the md5 content hash): higher-order
    * aggregate, no shuffle. Modular arithmetic keeps the accumulator
    * bounded — ANSI mode (Spark 4 default) would otherwise throw on
    * long overflow. */
  def rollingHash(tokensCol: Column): Column =
    aggregate(tokensCol, lit(0L),
      (acc, t) => (acc * lit(1000003L) + PortableHash.tokenHashP(t)) % lit(P))

  // ------------------------------------------------------------ queries
  /** q36: MinHash-LSH near-dup pairs on documents. */
  private val q36: Q = (s, dir) => {
    import s.implicits._
    minhashNearDup(Tables(s, dir, "documents"), "doc_id", "text")
      .orderBy($"id_a", $"id_b")
  }

  /** DuckDB mirror of the full LSH pipeline over any token-set SQL
    * expression: same token hash, same affine permutations, same band
    * fold, same candidate join, same exact-Jaccard verification
    * (list_intersect == bitmask kernel on distinct sets). */
  private def lshPipelineSql(tokensExpr: String, numHashes: Int, bands: Int,
      threshold: Double): String = {
    val rpb = numHashes / bands
    val sigCols = (0 until numHashes)
      .map(i => s"    min(${permSql(i, "h")}) AS h${i}")
      .mkString(",\n")
    val bandSelects = (0 until bands).map { b =>
      val parts = (b * rpb until (b + 1) * rpb).map(i => s"h$i")
      s"  SELECT doc_id, $b AS bidx, ${foldSql(b.toLong, parts)} AS bhash FROM sig"
    }.mkString("\n  UNION ALL\n")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest($tokensExpr) AS tok
       |  FROM documents),
       |th AS (SELECT doc_id, ${tokenHashPSql("tok")} AS h FROM toks),
       |sig AS (
       |  SELECT doc_id,
       |$sigCols
       |  FROM th GROUP BY doc_id),
       |bnd AS (
       |$bandSelects),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bnd a JOIN bnd b
       |    ON a.bidx = b.bidx AND a.bhash = b.bhash AND a.doc_id < b.doc_id),
       |sets AS (
       |  SELECT doc_id, $tokensExpr AS s
       |  FROM documents)
       |SELECT id_a, id_b,
       |  CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE) /
       |  CAST(len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)) AS DOUBLE)
       |    AS jaccard
       |FROM cand
       |JOIN sets sa ON cand.id_a = sa.doc_id
       |JOIN sets sb ON cand.id_b = sb.doc_id
       |WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE) /
       |  CAST(len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)) AS DOUBLE)
       |    >= $threshold
       |ORDER BY id_a, id_b""".stripMargin
  }

  private val q36Sql: String =
    lshPipelineSql("list_distinct(string_split(text, ' '))", 16, 4, 0.9)

  /** q37: SimHash signature + order-sensitive rolling fingerprint per doc. */
  private val q37: Q = (s, dir) => {
    import s.implicits._
    val d = Tables(s, dir, "documents")
    simhash(d, "doc_id", "text")
      .join(d.select($"doc_id",
        rollingHash(split($"text", " ")).as("rolling_hash")), "doc_id")
      .select($"doc_id", $"simhash", $"rolling_hash")
      .orderBy($"doc_id")
  }

  private val q37Sql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |th AS (SELECT doc_id, ${tokenHashSql("tok")} AS h FROM toks),
       |votes AS (
       |  SELECT doc_id, bit,
       |    SUM(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS vote
       |  FROM th CROSS JOIN (SELECT unnest(range(0, $SimHashBits)) AS bit) b
       |  GROUP BY doc_id, bit),
       |sh AS (
       |  SELECT doc_id,
       |    CAST(SUM(CASE WHEN vote > 0 THEN (1::BIGINT << bit)
       |             ELSE 0::BIGINT END) AS BIGINT) AS simhash
       |  FROM votes GROUP BY doc_id),
       |roll AS (
       |  SELECT doc_id,
       |    list_reduce(
       |      list_prepend(0::BIGINT,
       |        list_transform(string_split(text, ' '),
       |          t -> ${tokenHashPSql("t")})),
       |      (acc, x) -> (acc * 1000003 + x) % $P) AS rolling_hash
       |  FROM documents)
       |SELECT sh.doc_id AS doc_id, simhash, rolling_hash
       |FROM sh JOIN roll ON sh.doc_id = roll.doc_id
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q60
  /** Order-sensitive near-dup via 2-gram shingle MinHash-LSH: documents
    * that share vocabulary but not word order (which unigram Jaccard, q36,
    * calls identical) only match here when their token SEQUENCES overlap.
    * Same pipeline, shingle token unit, large vocab → general array path. */
  private val q60: Q = (s, dir) => {
    import s.implicits._
    minhashNearDupTokens(Tables(s, dir, "documents"), "doc_id",
      shingleSet($"text", 2), numHashes = 16, bands = 4, threshold = 0.8)
      .orderBy($"id_a", $"id_b")
  }
  private val q60Sql: String =
    lshPipelineSql(shingleSetSql("text"), 16, 4, 0.8)

  val queries: Map[String, Q] = Map(
    "q36_minhash_near_dup" -> q36,
    "q37_simhash_fingerprints" -> q37,
    "q60_shingle_near_dup" -> q60)

  val oracleSql: Map[String, String] = Map(
    "q36_minhash_near_dup" -> q36Sql,
    "q37_simhash_fingerprints" -> q37Sql,
    "q60_shingle_near_dup" -> q60Sql)
}
