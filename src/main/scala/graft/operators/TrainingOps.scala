package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import graft.operators.Lineage.Cuttable
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PortableHash
import graft.sources.Tables

/** Training-data-pipeline operators (driver-mandated extension, SURVEY.md
  * §2.10): relevance scoring and reproducible sampling — the selection
  * stages of an LLM data pipeline.
  *
  * Scale notes: TF-IDF is two hash aggregations (term-frequency, document-
  * frequency) plus one equi-join on term — the df side is orders of
  * magnitude smaller than the token stream, and the corpus size joins in as
  * a 1-row broadcast, never a collect. Hash-based sampling is a stateless
  * map-side filter: no RNG state, no seed coordination across executors,
  * trivially reproducible and pushed to the scan. Both are built on
  * [[graft.functions.PortableHash]] → fully DuckDB-oracled.
  */
object TrainingOps {
  type Q = (SparkSession, String) => DataFrame
  import PortableHash.tokenHashPSql

  /** Deterministic Bernoulli sample: keep rows whose key hashes into the
    * first `rateBp` of 10,000 basis points. Same rows on every run, every
    * engine, any cluster size — the property seeded RNG sampling loses the
    * moment partitioning changes. */
  def hashSample(df: DataFrame, keyCol: String, rateBp: Long): DataFrame =
    df.filter(PortableHash.tokenHashP(col(keyCol)) % lit(10000L) < lit(rateBp))

  // ---------------------------------------------------------------- q55
  /** TF-IDF: top-3 most characteristic terms per document. Natural-log
    * damping; `ln` agrees across libms except occasional 1-ulp drift, so
    * the score is rounded to 6 decimals and the ranking runs on the
    * ROUNDED score — ulp drift collapses into ties, which the term
    * tie-break resolves identically in both engines. */
  private val q55: Q = (s, dir) => {
    import s.implicits._
    val docs = Tables(s, dir, "documents")
    val toks = docs.select($"doc_id", explode(split($"text", " ")).as("term"))
    val tf = toks.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    // df as a window count over the tf frame: one shuffle on term, and the
    // expensive token aggregation is computed once — a groupBy+self-join
    // would re-run the whole token pass for the df side
    val df = tf.withColumn("df", count(lit(1))
      .over(Window.partitionBy($"term")))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val tfidf = round($"tf".cast("double") *
      log($"n_docs".cast("double") / $"df".cast("double")), 6)
    val w = Window.partitionBy($"doc_id").orderBy($"tfidf".desc, $"term".asc)
    df.crossJoin(broadcast(n))
      .withColumn("tfidf", tfidf)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 3)
      .select($"doc_id", $"term", $"tf", $"df", $"tfidf", $"rank")
      .orderBy($"doc_id", $"rank")
  }
  private val q55Sql = {
    val score = "ROUND(CAST(tf AS DOUBLE) * " +
      "ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 6)"
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |tfq AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
       |dfq AS (SELECT term, COUNT(*) AS df FROM tfq GROUP BY 1),
       |n AS (SELECT COUNT(*) AS n_docs FROM documents)
       |SELECT doc_id, term, tf, df, tfidf, rank FROM (
       |  SELECT doc_id, tfq.term AS term, tf, df, $score AS tfidf,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id
       |      ORDER BY $score DESC, tfq.term ASC) AS rank
       |  FROM tfq JOIN dfq ON tfq.term = dfq.term CROSS JOIN n)
       |WHERE rank <= 3
       |ORDER BY doc_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------- q56
  /** 5% deterministic Bernoulli sample of events by event_id hash. */
  private val q56: Q = (s, dir) => {
    import s.implicits._
    hashSample(Tables(s, dir, "events"), "event_id", 500L)
      .select($"event_id", $"user_id", $"event_type", $"value")
      .orderBy($"event_id")
  }
  private val q56Sql =
    s"""SELECT event_id, user_id, event_type, value
       |FROM events
       |WHERE ${tokenHashPSql("event_id")} % 10000 < 500
       |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q57
  /** Stratified deterministic sample: per-stratum rates (downsample the
    * dominant classes, keep the rare one) — the class-rebalancing stage of
    * a training pipeline, as one stateless filter. */
  private val q57: Q = (s, dir) => {
    import s.implicits._
    val rateBp = when($"event_type" === "view", 100L)
      .when($"event_type" === "click", 200L)
      .otherwise(2000L)
    Tables(s, dir, "events")
      .filter(PortableHash.tokenHashP($"event_id") % lit(10000L) < rateBp)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_sampled"),
        min($"event_id").as("min_event_id"),
        max($"event_id").as("max_event_id"))
      .orderBy($"event_type")
  }
  private val q57Sql =
    s"""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_sampled,
       |  MIN(event_id) AS min_event_id, MAX(event_id) AS max_event_id
       |FROM events
       |WHERE ${tokenHashPSql("event_id")} % 10000 <
       |  CASE event_type WHEN 'view' THEN 100 WHEN 'click' THEN 200
       |       ELSE 2000 END
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q64
  /** Count-Min sketch: depth×width counter grid where row d counts keys
    * by `perm_d(hash(key)) mod width`; a point estimate is the MIN over
    * depths of the key's cell (always ≥ the true count — collisions only
    * inflate). Constant memory, mergeable by cell-wise addition (it IS a
    * groupBy on (depth, bucket) — the whole sketch build is one
    * aggregation), deterministic on [[PortableHash]] → fully oracled.
    * Completes the sketch family: MinHash (sets), SimHash (vectors), KMV
    * (cardinality), CMS (frequencies). The query reports estimates vs
    * exact counts for the ten heaviest users. */
  private val CmsDepth = 4
  private val CmsWidth = 256L
  private def cmsCell(d: Int, keyHash: org.apache.spark.sql.Column) =
    PortableHash.perm(d, keyHash) % lit(CmsWidth)

  private val q64: Q = (s, dir) => {
    import s.implicits._
    val ev = Tables(s, dir, "events")
    val keyed = ev.select(PortableHash.tokenHashP($"user_id").as("__h"),
      $"user_id")
    // sketch build: one explode to (depth, bucket) cells + one groupBy
    val cells = keyed.select(explode(array((0 until CmsDepth).map(d =>
        struct(lit(d).as("d"), cmsCell(d, $"__h").as("bucket"))): _*))
        .as("cell"))
      .groupBy($"cell.d".as("d"), $"cell.bucket".as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    // point queries: ten heaviest users, estimate = min over depths
    val top = ev.groupBy($"user_id").agg(count(lit(1)).as("exact_count"))
      .orderBy($"exact_count".desc, $"user_id".asc).limit(10)
      .withColumn("__h", PortableHash.tokenHashP($"user_id"))
    val probes = top.select($"user_id", $"exact_count",
      explode(array((0 until CmsDepth).map(d =>
        struct(lit(d).as("d"), cmsCell(d, $"__h").as("bucket"))): _*))
        .as("cell"))
      .select($"user_id", $"exact_count", $"cell.d".as("d"),
        $"cell.bucket".as("bucket"))
    probes.join(cells, Seq("d", "bucket"))
      .groupBy($"user_id", $"exact_count")
      .agg(min($"cnt").as("cms_estimate"))
      .select($"user_id", $"cms_estimate", $"exact_count")
      .orderBy($"exact_count".desc, $"user_id".asc)
  }
  private val q64Sql = {
    import graft.functions.PortableHash.{permSql, tokenHashPSql}
    val h = tokenHashPSql("user_id")
    def cell(d: Int, he: String) = s"(${permSql(d, he)} % $CmsWidth)"
    val cellRows = (0 until CmsDepth)
      .map(d => s"  SELECT $d AS d, ${cell(d, s"($h)")} AS bucket, user_id FROM events")
      .mkString("\n  UNION ALL\n")
    val probeRows = (0 until CmsDepth)
      .map(d => s"  SELECT user_id, exact_count, $d AS d, ${cell(d, "h")} AS bucket FROM top")
      .mkString("\n  UNION ALL\n")
    s"""WITH cellrows AS (
       |$cellRows),
       |cells AS (
       |  SELECT d, bucket, COUNT(*) AS cnt FROM cellrows GROUP BY d, bucket),
       |top AS (
       |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_count, $h AS h
       |  FROM events GROUP BY user_id
       |  ORDER BY exact_count DESC, user_id ASC LIMIT 10),
       |probes AS (
       |$probeRows)
       |SELECT p.user_id AS user_id,
       |       CAST(MIN(c.cnt) AS BIGINT) AS cms_estimate,
       |       p.exact_count AS exact_count
       |FROM probes p JOIN cells c ON p.d = c.d AND p.bucket = c.bucket
       |GROUP BY p.user_id, p.exact_count
       |ORDER BY exact_count DESC, user_id ASC""".stripMargin
  }

  // ---------------------------------------------------------------- q69
  /** Training-corpus assembly — the capstone composition a data engineer
    * runs to materialize a training set, built entirely from this
    * engine's own operators in one declarative plan:
    *
    *   1. language filter (`lang = 'en'`, map-side at the scan);
    *   2. exact-dup removal: md5 fingerprint, survivor = min doc_id per
    *      fingerprint (one window on the hash — q35's semantics inline);
    *   3. quality gates: token-count band, type-token ratio, duplicate-
    *      bigram fraction via the codegen ShingleArray kernel (all
    *      row-local except the fingerprint window);
    *   4. modality join: embeddings on the primary key, carrying label
    *      and the vector norm (sequentialdot kernel);
    *   5. reproducible split assignment: PortableHash of doc_id → 90/5/5
    *      train/val/test — stable under any partitioning, any engine, any
    *      rerun (the property seeded RNG splits lose on reshuffle).
    *
    * At 100 TB: steps 1/3/5 are map-side; the fingerprint window and the
    * embedding join both hash-partition on high-cardinality keys; nothing
    * materializes on the driver. Every stage is cross-engine exact, so
    * the assembled corpus itself is hash-oracled. */
  private val q69: Q = (s, dir) => {
    import s.implicits._
    val tk = Tables(s, dir, "documents")
      .select($"doc_id", $"lang", $"text", split($"text", " ").as("tk"))
    val wFp = Window.partitionBy($"fp")
    val stats = tk.select($"doc_id", $"lang", $"text",
        size($"tk").cast("long").as("n_tokens"),
        (size(array_distinct($"tk")).cast("double") /
          size($"tk").cast("double")).as("ttr"),
        greatest(size($"tk") - 1, lit(0)).cast("long").as("n_bigrams"),
        size(DedupOps.shingles($"tk", 2)).cast("long").as("nd"))
      .withColumn("fp", md5($"text"))
      .withColumn("keeper", min($"doc_id").over(wFp))
      .withColumn("dup_bigram_frac", when($"n_bigrams" > 0,
        lit(1.0) - $"nd".cast("double") / $"n_bigrams".cast("double"))
        .otherwise(lit(0.0)))
    val kept = stats.filter($"lang" === "en" && $"doc_id" === $"keeper" &&
      $"n_tokens".between(20, 1000) && $"ttr" >= 0.45 &&
      $"dup_bigram_frac" <= 0.06)
    val emb = Tables(s, dir, "embeddings")
      .select($"vec_id".as("doc_id"), $"label",
        sqrt(VectorOps.dot($"embedding", $"embedding")).as("emb_norm"))
    val bucket = PortableHash.tokenHashP($"doc_id") % lit(100L)
    kept.join(emb, "doc_id")
      .select($"doc_id", $"lang", $"n_tokens", $"ttr", $"dup_bigram_frac",
        $"label", $"emb_norm",
        when(bucket < 90, "train").when(bucket < 95, "val")
          .otherwise("test").as("split"))
      .orderBy($"doc_id")
  }
  private val q69Sql = {
    val bigrams = "list_distinct(list_transform(range(1, len(tk)), " +
      "i -> tk[i] || ' ' || tk[i+1]))"
    val bucket = s"(${tokenHashPSql("doc_id")} % 100)"
    s"""WITH tk AS (
       |  SELECT doc_id, lang, text, string_split(text, ' ') AS tk
       |  FROM documents),
       |stats AS (
       |  SELECT doc_id, lang,
       |    CAST(len(tk) AS BIGINT) AS n_tokens,
       |    CAST(len(list_distinct(tk)) AS DOUBLE)
       |      / CAST(len(tk) AS DOUBLE) AS ttr,
       |    CAST(GREATEST(len(tk) - 1, 0) AS BIGINT) AS n_bigrams,
       |    CAST(len($bigrams) AS BIGINT) AS nd,
       |    MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper
       |  FROM tk),
       |kept AS (
       |  SELECT doc_id, lang, n_tokens, ttr,
       |    CASE WHEN n_bigrams > 0
       |      THEN 1.0 - CAST(nd AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
       |      ELSE 0.0 END AS dup_bigram_frac
       |  FROM stats
       |  WHERE lang = 'en' AND doc_id = keeper
       |    AND n_tokens BETWEEN 20 AND 1000 AND ttr >= 0.45
       |    AND (CASE WHEN n_bigrams > 0
       |      THEN 1.0 - CAST(nd AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
       |      ELSE 0.0 END) <= 0.06)
       |SELECT k.doc_id AS doc_id, lang, n_tokens, ttr, dup_bigram_frac,
       |  e.label AS label,
       |  sqrt(${VectorOps.dotSql("e.embedding", "e.embedding")}) AS emb_norm,
       |  CASE WHEN $bucket < 90 THEN 'train'
       |       WHEN $bucket < 95 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM kept k JOIN embeddings e ON k.doc_id = e.vec_id
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q72
  /** Document chunking — overlapping token windows (64 tokens, stride 48,
    * 16-token overlap), the stage that turns variable-length documents
    * into model-sized training sequences. Pure per-row work: one split,
    * one posexplode over the window starts, slices from the projected
    * token array (no re-split per window) — no shuffle before the output
    * sort, embarrassingly parallel at any scale. A trailing short window
    * keeps its actual token count. */
  private val q72: Q = (s, dir) => {
    import s.implicits._
    val W = 64
    val S = 48
    Tables(s, dir, "documents")
      .select($"doc_id", split($"text", " ").as("tk"))
      .select($"doc_id", $"tk",
        posexplode(sequence(lit(0), floor((size($"tk") - 1) / S).cast("int")))
          .as(Seq("chunk_idx", "w")))
      .select($"doc_id",
        $"chunk_idx".cast("long").as("chunk_idx"),
        size(slice($"tk", $"w" * S + 1, lit(W))).cast("long").as("chunk_tokens"),
        array_join(slice($"tk", $"w" * S + 1, lit(W)), " ").as("chunk_text"))
      .orderBy($"doc_id", $"chunk_idx")
  }
  private val q72Sql =
    """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
      |SELECT doc_id,
      |  CAST(w AS BIGINT) AS chunk_idx,
      |  CAST(len(tk[w*48 + 1 : w*48 + 64]) AS BIGINT) AS chunk_tokens,
      |  array_to_string(tk[w*48 + 1 : w*48 + 64], ' ') AS chunk_text
      |FROM tk, UNNEST(range(0, 1 + CAST(FLOOR((len(tk) - 1) / 48) AS INT)))
      |  AS t(w)
      |ORDER BY doc_id, chunk_idx""".stripMargin

  // --------------------------------------------------------------- q162
  /** LENGTH-BUCKETED batching report — the padding-waste accounting
    * behind bucketed batch samplers: docs padded to a common batch width
    * burn compute on pad tokens, so real loaders group similar lengths
    * and pad only to the bucket boundary. Buckets here are pad-to-16
    * bands (band = ⌈tokens/16⌉·16); per band the report carries doc
    * count, real tokens, padded tokens (n·band), and the exact waste
    * fraction — the number that justifies (or kills) a bucketing stage
    * in a training pipeline. One two-phase aggregate over a row-local
    * derived column; integral band arithmetic. */
  private val q162: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "documents")
      .select(size(split($"text", " ")).cast("long").as("n"))
      .withColumn("band", expr("((n + 15) div 16) * 16"))
      .groupBy($"band")
      .agg(count(lit(1)).as("n_docs"), sum($"n").as("sum_tokens"))
      .withColumn("padded_tokens", $"n_docs" * $"band")
      .withColumn("waste_tokens", $"padded_tokens" - $"sum_tokens")
      .withColumn("waste_frac",
        $"waste_tokens".cast("double") / $"padded_tokens".cast("double"))
      .orderBy($"band")
  }
  private val q162Sql =
    """WITH n_ AS (
      |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n
      |  FROM documents),
      |b AS (SELECT n, ((n + 15) // 16) * 16 AS band FROM n_)
      |SELECT band,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n) AS BIGINT) AS sum_tokens,
      |  CAST(COUNT(*) * band AS BIGINT) AS padded_tokens,
      |  CAST(COUNT(*) * band - SUM(n) AS BIGINT) AS waste_tokens,
      |  CAST(COUNT(*) * band - SUM(n) AS DOUBLE)
      |    / CAST(COUNT(*) * band AS DOUBLE) AS waste_frac
      |FROM b
      |GROUP BY band
      |ORDER BY band""".stripMargin

  // ---------------------------------------------------------------- q73
  /** Sequence packing — assign documents to fixed-budget training bins
    * (4096 tokens) by running token count, sharded so the prefix sum
    * never needs a global order: shard = doc_id mod 8, cumulative sum
    * windows partition BY SHARD (the q26 single-partition caveat does not
    * apply — each shard's window is independent, and at 100 TB shards
    * are sized to executors). bin = floor(tokens-before-this-doc / 4096)
    * — contiguous greedy packing, deterministic under any partitioning
    * because the (shard, doc_id) order is total. Output is per-bin:
    * document count and token fill. */
  private val q73: Q = (s, dir) => {
    import s.implicits._
    val cap = 4096L
    val w = Window.partitionBy($"shard").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(s, dir, "documents")
      .select($"doc_id", ($"doc_id" % 8).as("shard"),
        size(split($"text", " ")).cast("long").as("n_tokens"))
      .withColumn("cum", sum($"n_tokens").over(w))
      .withColumn("bin_id", floor(($"cum" - $"n_tokens") / cap))
      .groupBy($"shard", $"bin_id")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("bin_tokens"))
      .orderBy($"shard", $"bin_id")
  }
  private val q73Sql =
    """WITH t AS (
      |  SELECT doc_id, doc_id % 8 AS shard,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |c AS (
      |  SELECT shard, n_tokens,
      |    SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
      |      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM t)
      |SELECT shard, CAST(FLOOR((cum - n_tokens) / 4096) AS BIGINT) AS bin_id,
      |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
      |FROM c
      |GROUP BY 1, 2
      |ORDER BY shard, bin_id""".stripMargin

  // ---------------------------------------------------------------- q81
  /** FLAGSHIP curation pipeline — every stage of a production pretraining
    * corpus build chained in ONE declarative plan, each stage shrinking
    * the data BEFORE the next (more expensive) one touches it:
    *
    *   1. quality gates (q69's): lang=en, exact md5 dedup (min-doc
    *      keeper), 20-1000 tokens, TTR ≥ 0.45, dup-bigram frac ≤ 0.06 —
    *      and src0 (the held-out source) excluded from training outright;
    *   2. MinHash-LSH near-dup admission (q67's band-bucket-first rule)
    *      computed only over the gate SURVIVORS;
    *   3. decontamination (q74's 8-gram rule) against the full held-out
    *      source, applied only to near-dup survivors — the eval n-gram
    *      set broadcasts;
    *   4. reproducible 90/5/5 split by PortableHash.
    *
    * Scale shape: gates are map-side at the scan; the only shuffles are
    * the md5-fingerprint window, the (band,bucket) window, and the
    * broadcast-probe contamination join — all on survivors, never the
    * raw corpus. The gated frame feeds two plan branches (bucket pass +
    * survivor join), so it is persisted like the near-dup family's
    * canonical-set frame (PLANS.md trade-off (a)). */
  private val q81: Q = (s, dir) =>
    curationPipeline(s, Tables(s, dir, "documents"))

  /** q81's pipeline body over an arbitrary documents frame — shared by
    * the raw arm (q81) and the normalization-on-ramp arm (q219, which
    * feeds a [[graft.functions.TextNorm]]-normalized variant corpus in):
    * the curation semantics are input-frame-agnostic, so normalization
    * composes as a stage IN the pipeline rather than a sibling audit. */
  private def curationPipeline(s: SparkSession,
      docs: DataFrame): DataFrame = {
    import s.implicits._
    val wFp = Window.partitionBy($"fp")
    val stats = docs
      .select($"doc_id", $"lang", $"source", $"text",
        split($"text", " ").as("tk"))
      .select($"doc_id", $"lang", $"source", $"text",
        size($"tk").cast("long").as("n_tokens"),
        (size(array_distinct($"tk")).cast("double") /
          size($"tk").cast("double")).as("ttr"),
        greatest(size($"tk") - 1, lit(0)).cast("long").as("n_bigrams"),
        size(DedupOps.shingles($"tk", 2)).cast("long").as("nd"))
      .withColumn("fp", md5($"text"))
      .withColumn("keeper", min($"doc_id").over(wFp))
      .withColumn("dup_bigram_frac", when($"n_bigrams" > 0,
        lit(1.0) - $"nd".cast("double") / $"n_bigrams".cast("double"))
        .otherwise(lit(0.0)))
    val gated = stats.filter($"lang" === "en" && $"source" =!= "src0" &&
        $"doc_id" === $"keeper" && $"n_tokens".between(20, 1000) &&
        $"ttr" >= 0.45 && $"dup_bigram_frac" <= 0.06)
      .select($"doc_id", $"source", $"text", $"n_tokens", $"ttr")
      .lineageCut() // two plan branches read it; ContextCleaner-
                         // reclaimed, no CacheManager residue; non-
                         // replicated (executor-loss trade: see note in
                         // DedupOps.bandSelfJoin)
    val wB = Window.partitionBy($"band", $"bucket")
    val admitted = gated
      .select($"doc_id",
        graft.streaming.StreamingDedup.bandHashes($"text", 16, 4).as("bb"))
      .select($"doc_id", posexplode($"bb").as(Seq("band", "bucket")))
      .withColumn("first_doc", min($"doc_id").over(wB))
      .groupBy($"doc_id")
      .agg(min($"doc_id" === $"first_doc").as("admit"))
      .filter($"admit").select($"doc_id")
    val surv = gated.join(admitted, "doc_id")
    val evalNg = docs.filter($"source" === "src0")
      .select(explode(DedupOps.shingles(split($"text", " "), 8)).as("ng"))
      .distinct()
    val contaminated = surv
      .select($"doc_id",
        explode(DedupOps.shingles(split($"text", " "), 8)).as("ng"))
      .join(broadcast(evalNg), "ng")
      .select($"doc_id").distinct()
    val bucket = PortableHash.tokenHashP($"doc_id") % lit(100L)
    surv.join(contaminated, Seq("doc_id"), "left_anti")
      .select($"doc_id", $"source", $"n_tokens", $"ttr",
        when(bucket < 90, "train").when(bucket < 95, "val")
          .otherwise("test").as("split"))
      .orderBy($"doc_id")
  }
  private val q81Sql = curationSql("documents")

  /** The q81 oracle parameterized by its documents SOURCE (a table name
    * or parenthesized subquery yielding doc_id, lang, source, text) —
    * shared with q219's normalized variant corpus. */
  private def curationSql(src: String): String = {
    import PortableHash.{foldSql, permSql}
    val bigrams = "list_distinct(list_transform(range(1, len(tk)), " +
      "i -> tk[i] || ' ' || tk[i+1]))"
    val ngram8 = (1 to 7).foldLeft("tk[i]")((acc, o) =>
      s"$acc || ' ' || tk[i+$o]")
    val sh8 =
      s"list_distinct(list_transform(range(1, len(tk) - 6), i -> $ngram8))"
    def sig(i: Int) =
      s"list_min(list_transform(hs, h -> ${permSql(i, "h")}))"
    def bucket(b: Int) = foldSql(b.toLong, (b * 4 until b * 4 + 4).map(sig))
    val bandSelects = (0 until 4).map(b =>
      s"SELECT doc_id, $b AS band, ${bucket(b)} AS bucket FROM h")
      .mkString("\n  UNION ALL ")
    val split = s"(${tokenHashPSql("doc_id")} % 100)"
    s"""WITH tk AS (
       |  SELECT doc_id, lang, source, text, string_split(text, ' ') AS tk
       |  FROM $src),
       |stats AS (
       |  SELECT doc_id, lang, source, text,
       |    CAST(len(tk) AS BIGINT) AS n_tokens,
       |    CAST(len(list_distinct(tk)) AS DOUBLE)
       |      / CAST(len(tk) AS DOUBLE) AS ttr,
       |    CAST(GREATEST(len(tk) - 1, 0) AS BIGINT) AS n_bigrams,
       |    CAST(len($bigrams) AS BIGINT) AS nd,
       |    MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper
       |  FROM tk),
       |gated AS (
       |  SELECT doc_id, source, text, n_tokens, ttr
       |  FROM stats
       |  WHERE lang = 'en' AND source <> 'src0' AND doc_id = keeper
       |    AND n_tokens BETWEEN 20 AND 1000 AND ttr >= 0.45
       |    AND (CASE WHEN n_bigrams > 0
       |      THEN 1.0 - CAST(nd AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
       |      ELSE 0.0 END) <= 0.06),
       |h AS (
       |  SELECT doc_id,
       |    list_transform(list_distinct(string_split(text, ' ')),
       |      x -> ${tokenHashPSql("x")}) AS hs
       |  FROM gated),
       |bb AS (
       |  $bandSelects),
       |f AS (
       |  SELECT doc_id, band, bucket,
       |    MIN(doc_id) OVER (PARTITION BY band, bucket) AS first_doc
       |  FROM bb),
       |adm AS (
       |  SELECT doc_id FROM f GROUP BY doc_id
       |  HAVING BOOL_AND(doc_id = first_doc)),
       |surv AS (
       |  SELECT g.* FROM gated g JOIN adm USING (doc_id)),
       |ev AS (
       |  SELECT DISTINCT ng
       |  FROM (SELECT $sh8 AS sh
       |        FROM (SELECT string_split(text, ' ') AS tk
       |              FROM $src WHERE source = 'src0')),
       |       UNNEST(sh) AS u(ng)),
       |cont AS (
       |  SELECT DISTINCT doc_id
       |  FROM (SELECT doc_id, $sh8 AS sh
       |        FROM (SELECT doc_id, string_split(text, ' ') AS tk
       |              FROM surv)),
       |       UNNEST(sh) AS u(ng)
       |  WHERE ng IN (SELECT ng FROM ev))
       |SELECT doc_id, source, n_tokens, ttr,
       |  CASE WHEN $split < 90 THEN 'train'
       |       WHEN $split < 95 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM surv
       |WHERE doc_id NOT IN (SELECT doc_id FROM cont)
       |ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------------------------- q219
  /** Normalization as the CURATION ON-RAMP (r12 verdict #5): q170
    * proved TextNorm restores LSH recall beside the pipeline; here it
    * runs IN the pipeline — the q166/q170 variant corpus (every sliced
    * doc as-is, uppercased, and accent-injected, distinct ids) flows
    * through `TextNorm.normalize` FIRST and then q81's full curation
    * chain. The composition is what the fixture tests: the variant
    * triples only exact-dedup (md5 gate) because normalization made
    * their bytes identical — raw, all three variants would pass the
    * md5 gate separately and near-miss every LSH band (q166 measures
    * that collapse), silently tripling the corpus. The min-id variant
    * survives each triple; every later stage (LSH admission,
    * decontamination, split) then runs on the normalized text, so the
    * whole pipeline sees ONE canonical form — the production on-ramp
    * placement. Slice discipline as q170 (1-in-10 docs: the ×3 blowup
    * is the fixture's point, not a corpus-wide cost). */
  private val q219: Q = (s, dir) => {
    import s.implicits._
    import graft.functions.TextNorm
    val d = Tables(s, dir, "documents").filter($"doc_id" % 10 === 0)
    val accented = replace(replace(replace($"text",
      lit("a"), lit("á")), lit("e"), lit("é")), lit("o"), lit("ó"))
    val variants = d.select(($"doc_id" * 3).as("doc_id"), $"lang",
        $"source", $"text")
      .unionAll(d.select(($"doc_id" * 3 + 1).as("doc_id"), $"lang",
        $"source", upper($"text").as("text")))
      .unionAll(d.select(($"doc_id" * 3 + 2).as("doc_id"), $"lang",
        $"source", accented.as("text")))
      .withColumn("text", TextNorm.normalize($"text")) // the on-ramp
    curationPipeline(s, variants)
  }
  private val q219Sql = {
    import graft.functions.TextNorm.normalizeSql
    val accent = "replace(replace(replace(text, 'a', 'á'), 'e', 'é'), " +
      "'o', 'ó')"
    curationSql(
      s"""(SELECT doc_id * 3 AS doc_id, lang, source,
         |   ${normalizeSql("text")} AS text
         | FROM documents WHERE doc_id % 10 = 0
         | UNION ALL
         | SELECT doc_id * 3 + 1, lang, source,
         |   ${normalizeSql("upper(text)")}
         | FROM documents WHERE doc_id % 10 = 0
         | UNION ALL
         | SELECT doc_id * 3 + 2, lang, source, ${normalizeSql(accent)}
         | FROM documents WHERE doc_id % 10 = 0)""".stripMargin)
  }

  // ---------------------------------------------------------------- q84
  /** Domain-mixture sampling — static per-source rates (the data-mixing
    * stage of corpus assembly: up-weight scarce domains, down-weight
    * dominant ones; the held-out source rate is 0). The per-row decision
    * is the same deterministic hash filter as [[hashSample]], so the mix
    * is reproducible under any partitioning and NESTED across rate
    * changes (raising one domain's rate only adds its documents — a
    * property RNG mixing loses). Unlisted sources fall back to a default
    * rate. Rates broadcast; the filter is map-side at the scan.
    *
    * Output is the per-source audit: docs seen, docs kept, and the
    * realized rate alongside the configured one. */
  private val mixRates = Seq(
    "src0" -> 0L,     // held-out source: never mixed into training
    "src1" -> 10000L, // keep all
    "src2" -> 5000L,
    "src3" -> 2500L,
    "src4" -> 1250L)
  private val mixDefaultBp = 1000L

  private val q84: Q = (s, dir) => {
    import s.implicits._
    val rates = mixRates.toDF("source", "rate_bp")
    Tables(s, dir, "documents")
      .join(broadcast(rates), Seq("source"), "left")
      .select($"source", $"doc_id",
        coalesce($"rate_bp", lit(mixDefaultBp)).as("rate_bp"),
        (PortableHash.tokenHashP($"doc_id") % lit(10000L) < coalesce(
          $"rate_bp", lit(mixDefaultBp))).as("kept"))
      .groupBy($"source")
      .agg(max($"rate_bp").as("rate_bp"),
        count(lit(1)).as("n_docs"),
        sum(when($"kept", 1L).otherwise(0L)).as("n_kept"))
      .orderBy($"source")
  }
  private val q84Sql = {
    val rateRows = mixRates
      .map { case (src, bp) => s"('$src', CAST($bp AS BIGINT))" }
      .mkString(", ")
    s"""WITH rates(source, rate_bp) AS (VALUES $rateRows),
       |d AS (
       |  SELECT doc.source, doc.doc_id,
       |    COALESCE(r.rate_bp, $mixDefaultBp) AS rate_bp,
       |    (${tokenHashPSql("doc.doc_id")} % 10000)
       |      < COALESCE(r.rate_bp, $mixDefaultBp) AS kept
       |  FROM documents doc LEFT JOIN rates r ON doc.source = r.source)
       |SELECT source,
       |  MAX(rate_bp) AS rate_bp,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
       |FROM d GROUP BY source
       |ORDER BY source""".stripMargin
  }

  // ---------------------------------------------------------------- q86
  /** BM25 relevance ranking (Robertson et al.; the Lucene-default scoring
    * function, public method): top-10 documents for a fixed query,
    * k1 = 1.2, b = 0.75, idf = ln(1 + (N − df + 0.5)/(df + 0.5)).
    *
    * Determinism follows q55's ln treatment: the per-term contribution is
    * the only libm-dependent value (one `ln`), so it is rounded to 6
    * decimals and summed in DECIMAL(18,6) — order-free and exact — and the
    * ranking runs on the decimal sum with a doc_id tie-break.
    *
    * Scale: the query-term filter lands BEFORE the tf aggregation, so the
    * expensive per-(doc,term) state is |docs|·|query| not |docs|·|vocab|;
    * df and the (N, Σdl) corpus stats are broadcast-tiny; doc length joins
    * on the primary key; top-10 is sort+limit (TakeOrdered), never a
    * global single-partition window — the final rank window sees 10 rows. */
  private val bmTerms = Seq("hash", "join", "filter")
  private val bmK1 = 1.2
  private val bmB = 0.75

  private val q86: Q = (s, dir) => {
    import s.implicits._
    val toks = Tables(s, dir, "documents")
      .select($"doc_id", explode(split($"text", " ")).as("term"))
    val dl = toks.groupBy($"doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum($"dl").as("tot_dl"))
    val tfq = toks.filter($"term".isin(bmTerms: _*))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val dfq = tfq.groupBy($"term").agg(count(lit(1)).as("df"))
    val avgdl = $"tot_dl".cast("double") / $"n_docs".cast("double")
    val idf = log(lit(1.0) +
      (($"n_docs" - $"df").cast("double") + lit(0.5)) /
        ($"df".cast("double") + lit(0.5)))
    val contrib = round(
      idf * ($"tf".cast("double") * lit(bmK1 + 1)) /
        ($"tf".cast("double") + lit(bmK1) *
          (lit(1 - bmB) + lit(bmB) * ($"dl".cast("double") / avgdl))), 6)
    val agg = tfq.join(broadcast(dfq), "term").join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select($"doc_id", $"dl", contrib.as("c"))
      .groupBy($"doc_id")
      .agg(sum($"c".cast("decimal(18,6)")).as("s"),
        count(lit(1)).as("n_terms"), max($"dl").as("dl"))
    val top = agg.orderBy($"s".desc, $"doc_id".asc).limit(10)
    // rank window runs on the already-limited 10-row frame
    val w = Window.orderBy($"s".desc, $"doc_id".asc)
    top.withColumn("rank", row_number().over(w).cast("long"))
      .select($"doc_id", $"rank", $"n_terms", $"dl",
        $"s".cast("double").as("bm25"))
      .orderBy($"rank")
  }
  private val q86Sql = {
    val terms = bmTerms.map(t => s"'$t'").mkString(", ")
    val avgdl = "(CAST(tot_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    val idf = "ln(1.0 + (CAST(n_docs - df AS DOUBLE) + 0.5)" +
      " / (CAST(df AS DOUBLE) + 0.5))"
    val contrib = s"ROUND($idf * (CAST(tf AS DOUBLE) * ${bmK1 + 1})" +
      s" / (CAST(tf AS DOUBLE) + $bmK1 * (${1 - bmB} + $bmB" +
      s" * (CAST(dl AS DOUBLE) / $avgdl))), 6)"
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |  FROM documents),
       |dlq AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
       |st AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS tot_dl FROM dlq),
       |tfq AS (
       |  SELECT doc_id, term, COUNT(*) AS tf FROM toks
       |  WHERE term IN ($terms) GROUP BY 1, 2),
       |dfq AS (SELECT term, COUNT(*) AS df FROM tfq GROUP BY 1),
       |agg AS (
       |  SELECT doc_id, SUM(CAST($contrib AS DECIMAL(18,6))) AS s,
       |    COUNT(*) AS n_terms, MAX(dl) AS dl
       |  FROM tfq JOIN dfq USING (term) JOIN dlq USING (doc_id)
       |  CROSS JOIN st
       |  GROUP BY doc_id)
       |SELECT doc_id, rank, n_terms, dl, bm25 FROM (
       |  SELECT doc_id,
       |    ROW_NUMBER() OVER (ORDER BY s DESC, doc_id ASC) AS rank,
       |    CAST(n_terms AS BIGINT) AS n_terms,
       |    CAST(dl AS BIGINT) AS dl,
       |    CAST(s AS DOUBLE) AS bm25
       |  FROM agg)
       |WHERE rank <= 10
       |ORDER BY rank""".stripMargin
  }

  // --------------------------------------------------------------- q108
  /** Quantile feature binning — the fit+transform discretizer shape of ML
    * feature prep: quartile cuts are FIT per event_type on the SAME
    * deterministic bottom-K hash sample as q78 — the shared
    * [[Sampling.bottomKByHash]] fit (order-statistic cuts at
    * ceil(q·m) positions, shared integer formulas), then the type→cuts
    * table (one row per type) broadcasts and every event bins MAP-SIDE
    * by three comparisons; the output audits each (type, bin) with row
    * count, exact-decimal value sum, and bounds.
    *
    * Scale: the fit touches K rows per group past the rank-limit window
    * (map-side group-limit, the q78 path — wide groups never hit a
    * reducer whole); the transform is a broadcast hash join +
    * projection, so the fact table shuffles exactly once, for the final
    * two-phase (type, bin) aggregate. The cuts are sample order
    * statistics — both engines compare against the SAME stored double,
    * so bin assignment is exact, never an ulp question. */
  private val q108: Q = (s, dir) => {
    import s.implicits._
    import graft.functions.Exact
    val ev = Tables(s, dir, "events")
      .filter($"value".isNotNull)
      .select($"event_type", $"event_id", $"value")
    val smp = Sampling.bottomKByHash(ev, "event_type", "event_id", Sampling.K)
    val cuts = smp
      .withColumn("rn2", row_number().over(Window.partitionBy($"event_type")
        .orderBy($"value".asc, $"event_id".asc)))
      .withColumn("m", count(lit(1)).over(Window.partitionBy($"event_type")))
      .groupBy($"event_type")
      .agg(
        max(when(expr("rn2 = (m + 3) div 4"), $"value")).as("c1"),
        max(when(expr("rn2 = (m + 1) div 2"), $"value")).as("c2"),
        max(when(expr("rn2 = (3 * m + 3) div 4"), $"value")).as("c3"))
    ev.join(broadcast(cuts), "event_type")
      .withColumn("bin",
        when($"value" <= $"c1", 0L).when($"value" <= $"c2", 1L)
          .when($"value" <= $"c3", 2L).otherwise(3L))
      .groupBy($"event_type", $"bin")
      .agg(count(lit(1)).as("n_rows"), Exact.dsum($"value").as("sum_v"),
        min($"value").as("min_v"), max($"value").as("max_v"))
      .orderBy($"event_type", $"bin")
  }
  private val q108Sql = {
    val smp = Sampling.bottomKByHashSql(
      "event_type, event_id, value", "e", "event_type", "event_id")
    s"""WITH e AS (
       |  SELECT event_type, event_id, value FROM events
       |  WHERE value IS NOT NULL),
       |smp AS (
       |  $smp),
       |sv AS (
       |  SELECT event_type, event_id, value,
       |    ROW_NUMBER() OVER (PARTITION BY event_type
       |                       ORDER BY value ASC, event_id ASC) AS rn2,
       |    COUNT(*) OVER (PARTITION BY event_type) AS m
       |  FROM smp WHERE rn <= ${Sampling.K}),
       |cuts AS (
       |  SELECT event_type,
       |    MAX(CASE WHEN rn2 = (m + 3) // 4 THEN value END) AS c1,
       |    MAX(CASE WHEN rn2 = (m + 1) // 2 THEN value END) AS c2,
       |    MAX(CASE WHEN rn2 = (3 * m + 3) // 4 THEN value END) AS c3
       |  FROM sv GROUP BY event_type)
       |SELECT e.event_type,
       |  CAST(CASE WHEN e.value <= c.c1 THEN 0
       |            WHEN e.value <= c.c2 THEN 1
       |            WHEN e.value <= c.c3 THEN 2 ELSE 3 END AS BIGINT) AS bin,
       |  CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  ${graft.functions.Exact.sqlSum("e.value")} AS sum_v,
       |  MIN(e.value) AS min_v, MAX(e.value) AS max_v
       |FROM e JOIN cuts c USING (event_type)
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin
  }

  // --------------------------------------------------------------- q136
  /** LEAKAGE-SAFE train/val/test split: the split key is the duplicate
    * CLUSTER's representative, not the document — so a document and its
    * duplicates can never straddle splits (the train/test contamination
    * a per-document hash split (q69 step 5) silently allows: one copy
    * trains, its twin evaluates). Clusters here are exact-dup groups
    * (md5 fingerprint, q35's semantics); the same shape composes with
    * any cluster id — MinHash component roots (q71), SemDeDup cells —
    * because the operator only needs `(row, cluster_rep)`. Assignment is
    * [[PortableHash]] of the representative id → 80/10/10, stable under
    * any partitioning, engine, or rerun.
    *
    * Scale: one window over the fingerprint (hash-partitioned,
    * high-cardinality) to elect representatives; the assignment itself
    * is row-local arithmetic — no joins, no state, no driver. */
  private val q136: Q = (s, dir) => {
    import s.implicits._
    val wFp = Window.partitionBy($"f")
    Tables(s, dir, "documents")
      .select($"doc_id", $"lang", md5($"text").as("f"))
      .withColumn("cluster_rep", min($"doc_id").over(wFp))
      .withColumn("b",
        PortableHash.tokenHashP($"cluster_rep") % lit(100L))
      .select($"doc_id", $"lang", $"cluster_rep",
        when($"b" < 80, "train").when($"b" < 90, "val")
          .otherwise("test").as("split"))
      .orderBy($"doc_id")
  }
  private val q136Sql =
    s"""WITH cl AS (
       |  SELECT doc_id, lang,
       |    MIN(doc_id) OVER (PARTITION BY md5(text)) AS cluster_rep
       |  FROM documents),
       |b AS (
       |  SELECT doc_id, lang, cluster_rep,
       |    ${tokenHashPSql("cluster_rep")} % 100 AS bkt
       |  FROM cl)
       |SELECT doc_id, lang, cluster_rep,
       |  CASE WHEN bkt < 80 THEN 'train'
       |       WHEN bkt < 90 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM b ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q147
  /** BPE merge learning — the tokenizer-TRAINING step (Sennrich et al.
    * 2016): q96 applies a fixed vocabulary; this learns one FROM the
    * corpus. Each round counts adjacent symbol pairs across the
    * frequency-weighted word vocabulary, picks the most frequent pair
    * (ties by pair string — deterministic), and merges its left-to-right
    * non-overlapping occurrences in every word; `rounds` merge rules are
    * the learned tokenizer.
    *
    * Word symbol sequences are '/'-joined strings (symbols are corpus
    * tokens' characters and their concatenations — never contain '/'),
    * and the merge application is a STRING FOLD over the symbol list: if
    * the accumulator's last symbol equals the pair's left and the next
    * symbol equals its right, append the right symbol WITHOUT a
    * separator (the two fuse); else append with '/'. A fold never
    * re-merges its own output within a round (the fused symbol no longer
    * equals the pair's left), which is exactly the left-to-right
    * non-overlapping rule — and `functions.aggregate` here and DuckDB's
    * `list_reduce` in the oracle express the IDENTICAL fold, so the
    * learned rules hash-match cross-engine.
    *
    * Scale (100 TB): the corpus collapses to the frequency-weighted
    * DISTINCT-WORD table in one token-count aggregation (the only
    * corpus-sized pass); every round after that is one explode + one
    * map-side-combinable pair count over vocabulary-sized data plus a
    * 1-row argmax decision (the same eager decision-probe pattern as the
    * LSH bucket cap). This is how production BPE trainers distribute:
    * iterate on the vocab, not the corpus. */
  def bpeMerges(docs: DataFrame, textCol: String, rounds: Int)
      : Seq[(Int, String, String, String, Long)] = {
    val wc = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .persist() // vocabulary-sized; every round's pair count reads it
    // Separator-injectivity guard (one vocab-sized probe): a corpus
    // token containing '/' would make the '/'-joined symbol encoding
    // ambiguous — and the top-pair parse would then diverge between
    // engines (Spark split("/", 2) keeps the remainder; DuckDB
    // split_part takes the second segment). Refuse loudly instead of
    // learning silently-wrong merges.
    val slashed = wc.filter(col("w").contains("/")).head(1)
    require(slashed.isEmpty,
      s"bpeMerges: corpus token ${slashed.headOption.fold("?")(r =>
        "'" + r.getString(0) + "'")} contains the symbol separator '/'; " +
        "BPE symbolization here requires '/'-free tokens (pre-split or " +
        "remap the separator before training)")
    // initial symbolization: one symbol per character ("(?!$)" splits at
    // every position except the end — no trailing empty element)
    var words = wc.select(col("n"),
      concat_ws("/", split(col("w"), "(?!$)")).as("sym"))
    val out = Seq.newBuilder[(Int, String, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val l = split(col("sym"), "/")
      val top = words
        // guard: sequence(1, 0) DESCENDS in Spark, so a single-symbol
        // word must yield an empty pair array, not indexes [1, 0]
        .select(col("n"), explode(when(size(l) >= 2,
          transform(sequence(lit(1), size(l) - 1),
            i => concat(element_at(l, i), lit("/"), element_at(l, i + 1))))
          .otherwise(array().cast("array<string>"))).as("pair"))
        .groupBy(col("pair")).agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair").asc)
        .limit(1).collect() // decision probe: ≤1 row off a vocab-sized agg
      top.headOption match {
        case None => exhausted = true // every word is one symbol already
        case Some(t) =>
          val Array(a, b) = t.getString(0).split("/", 2)
          out += ((r, a, b, a + b, t.getLong(1)))
          words = words.withColumn("sym", mergeFold(l, a, b))
          r += 1
      }
    }
    val res = out.result()
    wc.unpersist()
    res
  }

  /** One BPE merge rule applied to a '/'-joined symbol list `l`: the
    * left-to-right non-overlapping string fold shared by learning
    * ([[bpeMerges]]) and encoding (q148) — and mirrored verbatim by the
    * oracle's `list_reduce`. */
  private def mergeFold(l: Column, a: String, b: String): Column =
    aggregate(
      slice(l, lit(2), greatest(size(l) - 1, lit(0))),
      element_at(l, 1),
      (acc, x) => when(
        (acc === lit(a) || acc.endsWith("/" + a)) && x === lit(b),
        concat(acc, x)).otherwise(concat(acc, lit("/"), x)))

  /** q147: learn 5 BPE merge rules from `documents` — the merge table a
    * tokenizer trainer emits, hash-checked against DuckDB recomputing
    * the identical fold. */
  private val q147: Q = (s, dir) => {
    import s.implicits._
    bpeMerges(Tables(s, dir, "documents"), "text", 5)
      .map { case (r, a, b, m, c) => (r.toLong, a, b, m, c) }
      .toDF("round", "left_sym", "right_sym", "merged", "pair_count")
      .orderBy($"round")
  }
  /** Shared WITH-prefix for the BPE oracles: `wc` (word, weight), `w0`
    * (char symbolization), and per-round (pair-count, top-pair, merged
    * words) stages — each stage's `list_reduce` is the verbatim mirror
    * of [[mergeFold]]. Word kept through every stage so the encode
    * oracle (q148) can join the final map back to documents. */
  private def bpeStagesSql(rounds: Int): String = {
    val stages = (1 to rounds).map { r =>
      s"""p$r AS (
         |  SELECT l[i] || '/' || l[i+1] AS pair, SUM(n) AS cnt
         |  FROM (SELECT n, str_split(sym, '/') AS l FROM w${r - 1}),
         |       unnest(range(1, len(l))) t(i)
         |  GROUP BY 1),
         |t$r AS (
         |  SELECT split_part(pair, '/', 1) AS ls,
         |         split_part(pair, '/', 2) AS rs,
         |         CAST(cnt AS BIGINT) AS cnt
         |  FROM p$r ORDER BY cnt DESC, pair ASC LIMIT 1),
         |w$r AS (
         |  SELECT w, n,
         |    list_reduce(str_split(sym, '/'),
         |      (acc, x) -> CASE
         |        WHEN (acc = t.ls OR ends_with(acc, '/' || t.ls))
         |             AND x = t.rs
         |        THEN acc || x ELSE acc || '/' || x END) AS sym
         |  FROM w${r - 1} CROSS JOIN t$r t)""".stripMargin
    }.mkString(",\n")
    s"""WITH wc AS (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM (SELECT unnest(str_split(text, ' ')) AS w FROM documents)
       |  GROUP BY w),
       |w0 AS (
       |  SELECT w, n,
       |    list_reduce(str_split(w, ''), (a, b) -> a || '/' || b) AS sym
       |  FROM wc),
       |$stages""".stripMargin
  }
  private val q147Sql: String = {
    val unions = (1 to 5).map(r =>
      s"SELECT CAST($r AS BIGINT) AS round, ls AS left_sym, rs AS right_sym, ls || rs AS merged, cnt AS pair_count FROM t$r")
      .mkString("\nUNION ALL\n")
    s"""${bpeStagesSql(5)}
       |$unions
       |ORDER BY round""".stripMargin
  }

  // --------------------------------------------------------------- q148
  /** BPE ENCODE under the learned merges — train-then-apply, the full
    * tokenizer lifecycle: re-derive q147's 5 merge rules, apply them in
    * learning order to every distinct word, and report each document's
    * token count under the learned tokenizer beside its character
    * count (`compression` = chars per BPE token — the chars/token lift
    * a vocabulary that small buys on this corpus).
    *
    * Scale: encoding is a JOIN against the distinct-word symbol map —
    * the corpus-sized pass never folds strings per occurrence, it
    * folds once per distinct word and joins the result back (the
    * word-level memoization real tokenizers use). */
  private val q148: Q = (s, dir) => {
    import s.implicits._
    val d = Tables(s, dir, "documents")
    val merges = bpeMerges(d, "text", 5)
    var words = d.select(explode(split($"text", " ")).as("w")).distinct()
      .select($"w", concat_ws("/", split($"w", "(?!$)")).as("sym"))
    for ((_, a, b, _, _) <- merges)
      words = words.withColumn("sym", mergeFold(split($"sym", "/"), a, b))
    val wsym = words.select($"w",
      size(split($"sym", "/")).cast("long").as("n_sym"),
      length($"w").cast("long").as("n_char"))
    d.select($"doc_id", explode(split($"text", " ")).as("w"))
      .join(wsym, "w")
      .groupBy($"doc_id")
      .agg(sum($"n_sym").as("n_bpe_tokens"), sum($"n_char").as("n_chars"))
      .withColumn("compression",
        $"n_chars".cast("double") / $"n_bpe_tokens".cast("double"))
      .orderBy($"doc_id")
  }
  private val q148Sql: String =
    s"""${bpeStagesSql(5)},
       |wsym AS (
       |  SELECT w, CAST(len(str_split(sym, '/')) AS BIGINT) AS n_sym,
       |         CAST(length(w) AS BIGINT) AS n_char
       |  FROM w5),
       |ex AS (
       |  SELECT doc_id, unnest(str_split(text, ' ')) AS w FROM documents)
       |SELECT e.doc_id,
       |  CAST(SUM(s.n_sym) AS BIGINT) AS n_bpe_tokens,
       |  CAST(SUM(s.n_char) AS BIGINT) AS n_chars,
       |  CAST(SUM(s.n_char) AS DOUBLE) / CAST(SUM(s.n_sym) AS DOUBLE)
       |    AS compression
       |FROM ex e JOIN wsym s USING (w)
       |GROUP BY e.doc_id
       |ORDER BY e.doc_id""".stripMargin

  // --------------------------------------------------------------- q176
  /** Token-BUDGET sampling: per stratum, keep the maximal deterministic
    * prefix of documents — ordered by (PortableHash(id), id) — whose
    * cumulative token count stays within the stratum's budget. The
    * quota form of corpus curation ("fill exactly B tokens per
    * language/domain") that rate-based sampling ([[hashSample]] / q57 /
    * q84) cannot express: rates hit a FRACTION, budgets hit a SIZE.
    * Deterministic by construction — same docs on every run, any
    * cluster size, any engine.
    *
    * Scale shape (sharded prefix sum, q155's discipline): a naive
    * per-stratum cumsum window puts a whole stratum — terabytes — on
    * one reducer. Instead the hash domain splits into `buckets`
    * ORDER-PRESERVING ranges (bucket = h·B >> 48, monotone in h):
    * per-(stratum, bucket) token totals roll up map-side into a tiny
    * frame whose running sum classifies every bucket from metadata-
    * sized data — `keep_all` (prefix + total ≤ budget: rows pass
    * WHOLESALE, no window), `drop_all` (exclusive prefix ≥ budget:
    * rows die in the scan filter), `boundary` (≈ one bucket per
    * stratum: only these rows — 1/B of the stratum — pay the in-bucket
    * cumsum window). The expensive sort touches the boundary sliver,
    * never the corpus.
    *
    * `budgets` is one (stratum, budget) row per stratum — broadcast-
    * sized by definition. Strata absent from it are dropped (no budget
    * = not requested). Token counts ≥ 1 per doc make `drop_all` sound:
    * an exclusive prefix at the budget leaves no room for any row. */
  def tokenBudgetSample(docs: DataFrame, stratumCol: String,
      idCol: String, tokCol: String, budgets: DataFrame,
      buckets: Int = 256): DataFrame = {
    require(buckets > 0 && buckets <= (1 << 15),
      s"buckets must be in [1, 32768], got $buckets")
    val st = col(stratumCol)
    val h = PortableHash.tokenHash(col(idCol))
    val rows = docs
      .withColumn("__h", h)
      .withColumn("__b", shiftright(col("__h") * lit(buckets.toLong), 48))
      .join(broadcast(budgets), Seq(stratumCol))
    val perBucket = rows.groupBy(st, col("__b"))
      .agg(sum(col(tokCol)).as("__btok"), first(col("budget")).as("__bud"))
    val wB = Window.partitionBy(st).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val classified = perBucket
      .withColumn("__prefix", sum(col("__btok")).over(wB) - col("__btok"))
      .withColumn("__class",
        when(col("__prefix") + col("__btok") <= col("__bud"), "keep_all")
          .when(col("__prefix") >= col("__bud"), "drop_all")
          .otherwise("boundary"))
      .select(st, col("__b"), col("__prefix"), col("__class"))
    val tagged = rows.join(broadcast(classified), Seq(stratumCol, "__b"))
    val keepWhole = tagged.filter(col("__class") === "keep_all")
    val wIn = Window.partitionBy(st, col("__b"))
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundaryKept = tagged.filter(col("__class") === "boundary")
      .withColumn("__cum", col("__prefix") + sum(col(tokCol)).over(wIn))
      .filter(col("__cum") <= col("budget"))
      .drop("__cum")
    keepWhole.unionByName(boundaryKept)
      .select(docs.columns.map(col).toIndexedSeq: _*)
  }

  /** Token-budget curation through the gate: per-language budgets set to
    * a third of each language's own token mass (data-derived, so the cut
    * lands mid-corpus at every SF), the sampler applied, and the kept
    * set aggregated per language. The oracle computes the SAME maximal
    * hash-ordered prefix with one window — so a bucket misclassified,
    * a boundary row off by one, or a hash-order tie broken differently
    * hash-mismatches. Three bucket counts (1 / 7 / 256) would be
    * plan-identical in output; the registered form runs the 256-bucket
    * scale shape. */
  private val q176: Q = (s, dir) => {
    import s.implicits._
    val t = Tables(s, dir, "documents")
      .select($"doc_id", $"lang",
        size(split($"text", " ")).cast("long").as("tok"))
    val budgets = t.groupBy($"lang")
      .agg(expr("sum(tok) div 3").as("budget"))
    tokenBudgetSample(t, "lang", "doc_id", "tok", budgets)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"tok").cast("long").as("sum_tokens"),
        min($"doc_id").as("min_doc"),
        max($"doc_id").as("max_doc"))
      .orderBy($"lang")
  }
  private val q176Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, lang,
       |    CAST(len(str_split(text, ' ')) AS BIGINT) AS tok,
       |    ${PortableHash.tokenHashSql("doc_id")} AS h
       |  FROM documents),
       |b AS (SELECT lang, SUM(tok) // 3 AS budget FROM t GROUP BY lang),
       |c AS (
       |  SELECT t.*, b.budget,
       |    SUM(tok) OVER (PARTITION BY t.lang ORDER BY h, doc_id
       |      ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM t JOIN b USING (lang))
       |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(tok) AS BIGINT) AS sum_tokens,
       |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
       |FROM c WHERE cum <= budget
       |GROUP BY lang
       |ORDER BY lang""".stripMargin

  // --------------------------------------------------------------- q177
  /** Deterministic corpus shuffle into N equal shards — the data-ordering
    * step of a pretraining run ("permute the corpus reproducibly, split
    * into worker shards"): global position = exact 1-based rank in
    * (PortableHash(id), id) order (a pseudorandom but engine-portable
    * permutation), shard = ⌊(rank−1)·S / total⌋ — shard sizes equal to
    * ±1 by construction, same assignment on every run and every engine.
    *
    * The primitive underneath is an EXACT distributed row_number with no
    * global single-reducer sort (the q176 discipline applied to ranking):
    * order-preserving hash-range buckets → per-bucket counts (map-side,
    * metadata-sized) → running bucket prefix over BUCKET KEYS → in-bucket
    * `row_number` windows over 1/B of the data each → global rank =
    * bucket prefix + in-bucket rank. `total` rides the same tiny count
    * frame (one decision-sized driver probe, q92's precedent). At 100 TB
    * the only sorts are per-bucket; nothing corpus-sized ever lands on
    * one reducer. */
  def shuffleShards(docs: DataFrame, idCol: String, nShards: Int,
      buckets: Int = 256): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    require(buckets > 0 && buckets <= (1 << 15),
      s"buckets must be in [1, 32768], got $buckets")
    val h = PortableHash.tokenHash(col(idCol))
    val rows = docs
      .withColumn("__h", h)
      .withColumn("__b", shiftright(col("__h") * lit(buckets.toLong), 48))
    // ONE corpus scan: per-bucket counts (two-phase agg), then the
    // exclusive prefix AND the grand total fold driver-side over the
    // ≤B-row result — a decision-sized probe, q92's precedent
    val pb = rows.groupBy(col("__b")).agg(count(lit(1)).as("__bn"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val pref = pb.map { case (b, n) => val p = acc; acc += n; (b, p) }
    val total = acc
    require(total > 0, "shuffleShards needs a non-empty corpus")
    val spark = docs.sparkSession
    val prefixed = spark.createDataFrame(
      scala.collection.immutable.Seq(pref.toIndexedSeq: _*))
      .toDF("__b", "__prefix")
    val wIn = Window.partitionBy(col("__b"))
      .orderBy(col("__h"), col(idCol))
    rows.join(broadcast(prefixed), Seq("__b"))
      .withColumn("rank", col("__prefix") + row_number().over(wIn))
      .withColumn("shard",
        expr(s"CAST((rank - 1) * $nShards DIV $total AS INT)"))
      .select((docs.columns.map(col) :+ col("rank") :+ col("shard"))
        .toIndexedSeq: _*)
  }

  /** CURRICULUM PHASE ASSIGNMENT — the data-ordering step of a staged
    * pretraining run ("first 70 % of tokens = web mix, last 10 % =
    * high-quality anneal"): every document gets its EXACT global token
    * START OFFSET in curriculum order, and the token stream is cut into
    * phases at integer token boundaries.
    *
    * Curriculum order is `(tier, hash(id), id)` — tiers (a bounded
    * quality/stage column, the strata contract of q176) play out in
    * ascending order, and documents SHUFFLE WITHIN their tier through
    * the engine-portable [[PortableHash]] permutation, so each phase
    * sees its tiers in a reproducible pseudo-random interleave. Phase
    * boundaries come from integer `weights`: cut p sits at
    * `total·(w₁+…+wₚ) div Σw` tokens — exact long arithmetic, no
    * floating rounding to disagree across engines. A document straddling
    * a cut belongs to the phase its FIRST token falls in (documents are
    * atomic — the documented convention).
    *
    * Scale shape = q177's sharded prefix sum, lifted from row counts to
    * token mass: ONE corpus scan aggregates per-(tier, hash-range
    * bucket) token totals (two-phase agg into a tiers×B frame), the
    * exclusive prefix and grand total fold driver-side over that
    * decision-sized result, and the only windows are in-bucket running
    * sums over 1/B of a tier each — no data-sized global window
    * anywhere. Order-preserving bucketing makes the composed offset
    * bit-identical to the one-window form (the spec pins buckets
    * 1/2/17/256 against it).
    *
    * Output = input columns + `start_offset` (0-based global token
    * offset) + `phase` (0-based). */
  def curriculumPhases(docs: DataFrame, idCol: String, tokCol: String,
      tierCol: String, weights: Seq[Long],
      buckets: Int = 256): DataFrame = {
    require(weights.nonEmpty && weights.forall(_ > 0),
      s"phase weights must be positive, got $weights")
    require(buckets > 0 && buckets <= (1 << 15),
      s"buckets must be in [1, 32768], got $buckets")
    val h = PortableHash.tokenHash(col(idCol))
    val rows = docs
      .withColumn("__h", h)
      .withColumn("__b", shiftright(col("__h") * lit(buckets.toLong), 48))
    // ONE corpus scan: per-(tier, bucket) token totals, prefix + grand
    // total folded driver-side over the decision-sized frame
    val pb = rows.groupBy(col(tierCol).as("__pt"), col("__b").as("__pb"))
      .agg(sum(col(tokCol)).cast("long").as("__bt"))
      .orderBy(col("__pt"), col("__pb"))
      .collect()
    var acc = 0L
    val pref = pb.map { r =>
      val p = acc; acc += r.getLong(2)
      org.apache.spark.sql.Row(r.get(0), r.getLong(1), p)
    }
    val total = acc
    require(total > 0, "curriculumPhases needs a non-empty corpus")
    val sumW = weights.sum
    val cuts = weights.scanLeft(0L)(_ + _).tail.dropRight(1)
      .map(cw => total * cw / sumW)
    val spark = docs.sparkSession
    val tierField = docs.schema(tierCol)
    val prefixed = spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(pref: _*)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__pt", tierField.dataType),
        org.apache.spark.sql.types.StructField("__pb",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("__prefix",
          org.apache.spark.sql.types.LongType))))
    val wIn = Window.partitionBy(col(tierCol), col("__b"))
      .orderBy(col("__h"), col(idCol))
    val phase = cuts
      .map(c => (col("start_offset") >= lit(c)).cast("int"))
      .reduceOption(_ + _).getOrElse(lit(0)).cast("int")
    rows.join(broadcast(prefixed),
        col(tierCol) === col("__pt") && col("__b") === col("__pb"))
      .withColumn("__cum", sum(col(tokCol)).over(wIn))
      .withColumn("start_offset",
        col("__prefix") + col("__cum") - col(tokCol))
      .withColumn("phase", phase)
      .select((docs.columns.map(col) :+ col("start_offset") :+
        col("phase")).toIndexedSeq: _*)
  }

  /** EPOCH-CAPPED UPSAMPLING — the data-constrained-scaling repeat step
    * (Muennighoff et al. 2023: when a source is scarce, repeat it, but
    * only up to a cap past which extra epochs stop helping): each source
    * s with total token mass T_s and budget B_s materializes
    * `e_s = min(B_s div T_s, maxEpochs)` FULL epochs plus one PARTIAL
    * epoch holding the maximal (PortableHash, id)-ordered prefix of the
    * remainder `B_s − e_s·T_s` tokens (zero when the cap bit) — the
    * [[tokenBudgetSample]] prefix, so the partial epoch is the same
    * deterministic subset on every run and engine. Output = input
    * columns + `epoch` (0-based; full epochs 0..e_s−1, the partial
    * epoch e_s). Sources missing from `budgets` are excluded.
    *
    * Scale: per-source totals are one decision-sized two-phase
    * aggregate; full epochs are a row-local explode against a broadcast
    * per-source epoch count (no shuffle, output-bound by construction —
    * the repeats ARE the product); the partial epoch reuses
    * tokenBudgetSample's sharded prefix plan, so nothing corpus-sized
    * ever lands on one reducer. */
  def epochUpsample(docs: DataFrame, sourceCol: String, idCol: String,
      tokCol: String, budgets: DataFrame, maxEpochs: Int,
      buckets: Int = 256): DataFrame = {
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    val totals = docs.groupBy(col(sourceCol))
      .agg(sum(col(tokCol)).cast("long").as("__tot"))
      .join(budgets, Seq(sourceCol))
      .withColumn("__e",
        least(expr("budget div __tot"), lit(maxEpochs.toLong)))
      .withColumn("__r",
        when(col("__e") < maxEpochs,
          col("budget") - col("__e") * col("__tot")).otherwise(lit(0L)))
    val outCols =
      (docs.columns.map(col) :+ col("epoch")).toIndexedSeq
    val full = docs
      .join(broadcast(totals.select(col(sourceCol), col("__e"))),
        Seq(sourceCol))
      .filter(col("__e") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("__e") - 1)))
      .select(outCols: _*)
    val partial = tokenBudgetSample(docs, sourceCol, idCol, tokCol,
        totals.select(col(sourceCol), col("__r").as("budget")), buckets)
      .join(broadcast(totals.select(col(sourceCol),
        col("__e").as("epoch"))), Seq(sourceCol))
      .select(outCols: _*)
    full.unionByName(partial)
  }

  // --------------------------------------------------------------- q181
  /** Epoch upsampling through the gate: per-source budgets derived from
    * each source's own token mass land all three regimes at every SF —
    * class 0 (budget 2.5×) takes two full epochs plus a half-mass
    * partial, class 1 (budget 7×) hits the 3-epoch cap with zero
    * remainder, class 2 (budget 0.5×) is partial-only. The emitted
    * class×epoch matrix (counts, token mass, doc-id sum) must equal the
    * oracle's generate_series repeats + one-window prefix — a repeat
    * count off by one, a cap not applied, or a partial prefix cut at
    * the wrong token all hash-mismatch. */
  private val q181: Q = (s, dir) => {
    import s.implicits._
    val t = Tables(s, dir, "documents").select(
      $"doc_id", $"source",
      size(split($"text", " ")).cast("long").as("tok"))
    val budgets = t.groupBy($"source")
      .agg(sum($"tok").as("__t"))
      .withColumn("__m", expr("CAST(substring(source, 4, 10) AS INT) % 3"))
      .withColumn("budget",
        when($"__m" === 0, expr("__t * 5 div 2"))
          .when($"__m" === 1, $"__t" * 7)
          .otherwise(expr("__t div 2")))
      .select($"source", $"budget")
    epochUpsample(t, "source", "doc_id", "tok", budgets, maxEpochs = 3)
      .withColumn("src_class",
        expr("CAST(CAST(substring(source, 4, 10) AS INT) % 3 AS INT)"))
      .groupBy($"src_class", $"epoch")
      .agg(count(lit(1)).as("n_docs"),
        sum($"tok").cast("long").as("sum_tokens"),
        sum($"doc_id").cast("long").as("sum_doc_id"))
      .orderBy($"src_class", $"epoch")
  }
  private val q181Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, source,
       |    CAST(len(str_split(text, ' ')) AS BIGINT) AS tok,
       |    ${PortableHash.tokenHashSql("doc_id")} AS h
       |  FROM documents),
       |s AS (
       |  SELECT source, SUM(tok) AS tot,
       |    CASE CAST(substr(source, 4) AS INT) % 3
       |      WHEN 0 THEN SUM(tok) * 5 // 2
       |      WHEN 1 THEN SUM(tok) * 7
       |      ELSE SUM(tok) // 2 END AS budget
       |  FROM t GROUP BY source),
       |e AS (
       |  SELECT source, tot, budget, LEAST(budget // tot, 3) AS e,
       |    CASE WHEN LEAST(budget // tot, 3) < 3
       |      THEN budget - LEAST(budget // tot, 3) * tot
       |      ELSE 0 END AS r
       |  FROM s),
       |fulls AS (
       |  SELECT t.doc_id, t.source, t.tok, g.i AS epoch
       |  FROM t JOIN e USING (source)
       |  CROSS JOIN generate_series(0, 2) AS g(i)
       |  WHERE g.i < e.e),
       |pfx AS (
       |  SELECT t.*, SUM(tok) OVER (PARTITION BY source ORDER BY h, doc_id
       |    ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM t),
       |partial AS (
       |  SELECT pfx.doc_id, pfx.source, pfx.tok, e.e AS epoch
       |  FROM pfx JOIN e USING (source)
       |  WHERE pfx.cum <= e.r),
       |u AS (SELECT * FROM fulls UNION ALL SELECT * FROM partial)
       |SELECT CAST(CAST(substr(source, 4) AS INT) % 3 AS INTEGER)
       |    AS src_class,
       |  CAST(epoch AS BIGINT) AS epoch,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(tok) AS BIGINT) AS sum_tokens,
       |  CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
       |FROM u
       |GROUP BY src_class, epoch
       |ORDER BY src_class, epoch""".stripMargin

  // --------------------------------------------------------------- q180
  /** Curriculum through the gate: documents tiered by a deterministic
    * quality proxy (n_chars bands), phases cut 70/20/10 by token mass.
    * The emitted phase×tier matrix (counts, token mass, offset span,
    * doc-id sum) must equal the oracle's one-window exclusive running
    * sum — so a bucket prefix off by one token, a straddling document
    * on the wrong side of a cut, or a tie broken differently all
    * hash-mismatch. */
  private val q180: Q = (s, dir) => {
    import s.implicits._
    val t = Tables(s, dir, "documents").select(
      $"doc_id",
      size(split($"text", " ")).cast("long").as("tok"),
      when($"n_chars" < 200, 0).when($"n_chars" < 400, 1).otherwise(2)
        .cast("int").as("tier"))
    curriculumPhases(t, "doc_id", "tok", "tier", Seq(7L, 2L, 1L))
      .groupBy($"phase", $"tier")
      .agg(count(lit(1)).as("n_docs"),
        sum($"tok").cast("long").as("sum_tokens"),
        min($"start_offset").as("min_off"),
        max($"start_offset").as("max_off"),
        sum($"doc_id").cast("long").as("sum_doc_id"))
      .orderBy($"phase", $"tier")
  }
  private val q180Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CAST(len(str_split(text, ' ')) AS BIGINT) AS tok,
       |    CASE WHEN n_chars < 200 THEN 0 WHEN n_chars < 400 THEN 1
       |         ELSE 2 END AS tier,
       |    ${PortableHash.tokenHashSql("doc_id")} AS h
       |  FROM documents),
       |o AS (
       |  SELECT doc_id, tok, tier,
       |    CAST(COALESCE(SUM(tok) OVER (ORDER BY tier, h, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS start_offset,
       |    CAST(SUM(tok) OVER () AS BIGINT) AS total
       |  FROM t)
       |SELECT CAST((start_offset >= total * 7 // 10)::INT
       |         + (start_offset >= total * 9 // 10)::INT AS INTEGER)
       |    AS phase,
       |  tier,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(tok) AS BIGINT) AS sum_tokens,
       |  MIN(start_offset) AS min_off, MAX(start_offset) AS max_off,
       |  CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
       |FROM o
       |GROUP BY phase, tier
       |ORDER BY phase, tier""".stripMargin

  /** Shard assignment through the gate: 8-way deterministic shuffle of
    * `documents`, per-shard membership pinned by count, token mass, rank
    * span, AND the doc-id sum (so one document in the wrong shard — a
    * bucket prefix off by one, an in-bucket tie broken differently —
    * hash-mismatches the oracle's single-window ROW_NUMBER). */
  private val q177: Q = (s, dir) => {
    import s.implicits._
    val t = Tables(s, dir, "documents")
      .select($"doc_id", size(split($"text", " ")).cast("long").as("tok"))
    shuffleShards(t, "doc_id", nShards = 8)
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"),
        sum($"tok").cast("long").as("sum_tokens"),
        min($"rank").as("min_rank"),
        max($"rank").as("max_rank"),
        sum($"doc_id").cast("long").as("sum_doc_id"))
      .orderBy($"shard")
  }
  private val q177Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CAST(len(str_split(text, ' ')) AS BIGINT) AS tok,
       |    ${PortableHash.tokenHashSql("doc_id")} AS h
       |  FROM documents),
       |r AS (
       |  SELECT doc_id, tok,
       |    ROW_NUMBER() OVER (ORDER BY h, doc_id) AS rank,
       |    COUNT(*) OVER () AS total
       |  FROM t)
       |SELECT CAST((rank - 1) * 8 // total AS INTEGER) AS shard,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(tok) AS BIGINT) AS sum_tokens,
       |  MIN(rank) AS min_rank, MAX(rank) AS max_rank,
       |  CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
       |FROM r
       |GROUP BY 1
       |ORDER BY 1""".stripMargin

  /** TEMPORAL TRAIN/EVAL SPLIT WITH EMBARGO — the time-series twin of
    * q136's fingerprint-leakage-safe split: evaluation data must be
    * strictly AFTER the training cutoff, and an embargo gap before the
    * cutoff is withheld from training so that autocorrelated rows
    * adjacent to the eval window cannot leak target information across
    * the boundary (the purged/embargoed split of financial ML — de
    * Prado, "Advances in Financial Machine Learning" ch. 7, a published
    * method). Row-local: each row compares its integer-microsecond
    * timestamp against two broadcast literals — no joins, no windows,
    * no state, so the split is a map-side predicate at any scale and
    * identical on every engine. */
  def temporalSplit(df: DataFrame, tsCol: String, cutoffUs: Long,
      embargoUs: Long): DataFrame = {
    require(embargoUs >= 0, s"embargo must be >= 0, got $embargoUs")
    df.withColumn("split",
      when(unix_micros(col(tsCol)) > cutoffUs, lit("test"))
        .when(unix_micros(col(tsCol)) <= cutoffUs - embargoUs,
          lit("train"))
        .otherwise(lit("embargo")))
  }

  // --------------------------------------------------------------- q191
  /** [[temporalSplit]] over events: cutoff at 80 % of the observed time
    * span, embargo 5 % of it (exact integer-microsecond arithmetic on
    * both engines). The report pins each split's row count, user
    * count, and time bounds — a row on the wrong side of either
    * boundary, or an embargo row leaking into train, hash-mismatches.
    * Scale: the min/max span probe is one two-phase aggregate; the
    * split itself is a row-local predicate; the report a 3-group
    * aggregate. */
  private val q191: Q = (s, dir) => {
    import s.implicits._
    val ev = Tables(s, dir, "events").select($"user_id", $"ts")
    val mm = ev.agg(min(unix_micros($"ts")).as("mn"),
      max(unix_micros($"ts")).as("mx")).head()
    val (mn, mx) = (mm.getLong(0), mm.getLong(1))
    val span = mx - mn
    temporalSplit(ev, "ts", mn + span * 4 / 5, span / 20)
      .groupBy($"split")
      .agg(count(lit(1)).cast("long").as("n_rows"),
        countDistinct($"user_id").cast("long").as("n_users"),
        min(unix_micros($"ts")).as("min_us"),
        max(unix_micros($"ts")).as("max_us"))
      .orderBy($"split")
  }
  private val q191Sql: String =
    """WITH b AS (SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx
       |           FROM events),
       |c AS (SELECT mn + (mx - mn) * 4 // 5 AS cutoff,
       |        (mx - mn) // 20 AS emb FROM b),
       |s AS (SELECT user_id, epoch_us(ts) AS us,
       |        CASE WHEN epoch_us(ts) > cutoff THEN 'test'
       |             WHEN epoch_us(ts) <= cutoff - emb THEN 'train'
       |             ELSE 'embargo' END AS split
       |      FROM events, c)
       |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       |  MIN(us) AS min_us, MAX(us) AS max_us
       |FROM s GROUP BY 1 ORDER BY 1""".stripMargin

  /** PER-CLASS EXACT-k BALANCED SAMPLE — the class-rebalancing selection
    * stage (cap every class at k rows so a dominant class cannot swamp
    * a fine-tuning mix): keep the k rows of each class that rank first
    * by (portable hash, key) — a deterministic pseudorandom choice,
    * identical on every engine and any partitioning, where q57's
    * Bernoulli sampler fixes a RATE, not a count. Scale shape: the
    * rank-limit window compiles to WindowGroupLimit (Spark pushes the
    * per-group top-k below the exchange since 3.5), so each map task
    * forwards at most k rows per class it sees — the shuffle carries
    * O(classes · k · tasks) rows, never the corpus. */
  def balancedSample(df: DataFrame, classCol: String, keyCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"need k > 0 rows per class, got $k")
    val w = Window.partitionBy(col(classCol))
      .orderBy(PortableHash.tokenHashP(col(keyCol)), col(keyCol))
    df.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= k).drop("__r")
  }

  // --------------------------------------------------------------- q192
  /** [[balancedSample]] over events at k=500: classes below the cap keep
    * everything (exercised at sf0.001 where some types are smaller),
    * classes above it keep exactly their 500 first-by-hash rows — the
    * checksum pins WHICH rows, not just how many. */
  private val q192: Q = (s, dir) => {
    import s.implicits._
    balancedSample(Tables(s, dir, "events")
      .select($"event_type", $"event_id"), "event_type", "event_id", 500)
      .groupBy($"event_type")
      .agg(count(lit(1)).cast("long").as("n_sampled"),
        sum($"event_id").cast("long").as("sum_event_id"))
      .orderBy($"event_type")
  }
  private val q192Sql: String =
    s"""WITH r AS (
       |  SELECT event_type, event_id,
       |    ROW_NUMBER() OVER (PARTITION BY event_type
       |      ORDER BY ${tokenHashPSql("event_id")}, event_id) AS rk
       |  FROM events)
       |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_sampled,
       |  CAST(SUM(event_id) AS BIGINT) AS sum_event_id
       |FROM r WHERE rk <= 500
       |GROUP BY event_type ORDER BY event_type""".stripMargin

  // --------------------------------------------------------------- q195
  /** Hybrid retrieval with reciprocal-rank fusion (Cormack et al. 2009
    * — the standard lexical+semantic combiner, and the hard-negative
    * mining shape for embedding training: BM25-top documents that the
    * semantic arm does NOT rank high are the classic hard negatives).
    * The lexical arm is q86's BM25 top-20; the semantic arm is cosine
    * top-20 against the query document's embedding (documents and
    * embeddings share an id space); fusion scores each candidate
    * Σ 1/(60 + rank) over the arms it appears in — rank-based, so the
    * two arms' incomparable score scales never need calibration — and
    * keeps the fused top-10.
    *
    * Determinism: both arms rank on integer row_numbers with doc-id
    * tie-breaks (BM25's score is decimal-rounded per q86, the dot the
    * shared sequential kernel), and the RRF sum is a fixed-shape double
    * expression over small integers — engine-exact.
    *
    * Scale: each arm is TakeOrdered top-k (never a global window over
    * the corpus); fusion joins two ≤k-row frames. At 100 TB the arms
    * swap in the indexed candidate generators (token-bloom pruned scans
    * for lexical, IVF posting lists for semantic) — the fusion contract
    * is arm-agnostic, which is the point of rank fusion. */
  private val rrfC = 60
  private val rrfArmK = 20

  private val q195: Q = (s, dir) => {
    import s.implicits._
    // lexical arm — q86's decimal-exact BM25, query doc excluded
    val toks = Tables(s, dir, "documents")
      .select($"doc_id", explode(split($"text", " ")).as("term"))
    val dl = toks.groupBy($"doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum($"dl").as("tot_dl"))
    val tfq = toks.filter($"term".isin(bmTerms: _*))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val dfq = tfq.groupBy($"term").agg(count(lit(1)).as("df"))
    val avgdl = $"tot_dl".cast("double") / $"n_docs".cast("double")
    val idf = log(lit(1.0) +
      (($"n_docs" - $"df").cast("double") + lit(0.5)) /
        ($"df".cast("double") + lit(0.5)))
    val contrib = round(
      idf * ($"tf".cast("double") * lit(bmK1 + 1)) /
        ($"tf".cast("double") + lit(bmK1) *
          (lit(1 - bmB) + lit(bmB) * ($"dl".cast("double") / avgdl))), 6)
    val bmAgg = tfq.join(broadcast(dfq), "term").join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select($"doc_id", contrib.as("c"))
      .groupBy($"doc_id").agg(sum($"c".cast("decimal(18,6)")).as("s"))
    val bmTop = bmAgg.filter($"doc_id" =!= 0L)
      .orderBy($"s".desc, $"doc_id".asc).limit(rrfArmK)
    val wb = Window.orderBy($"s".desc, $"doc_id".asc)
    val bmRank = bmTop
      .withColumn("bm25_rank", row_number().over(wb).cast("long"))
      .select($"doc_id", $"bm25_rank")
    // semantic arm — cosine vs the query doc's embedding (unit-norm-free:
    // dot ranks identically for a fixed query vector up to doc norms,
    // which the shared corpus construction keeps comparable; the oracle
    // computes the IDENTICAL expression so the ranking contract is exact)
    val e = Tables(s, dir, "embeddings").select($"vec_id", $"embedding")
    val qv = broadcast(e.filter($"vec_id" === 0L)
      .select($"embedding".as("qv")))
    val cosTop = e.filter($"vec_id" =!= 0L).crossJoin(qv)
      .select($"vec_id".as("doc_id"),
        VectorOps.dot($"embedding", $"qv").as("dp"))
      .orderBy($"dp".desc, $"doc_id".asc).limit(rrfArmK)
    val wc = Window.orderBy($"dp".desc, $"doc_id".asc)
    val cosRank = cosTop
      .withColumn("cos_rank", row_number().over(wc).cast("long"))
      .select($"doc_id", $"cos_rank")
    // fusion — 1/(c + rank) per arm, absent arm contributes 0
    val fused = bmRank.join(cosRank, Seq("doc_id"), "full")
      .select($"doc_id", $"bm25_rank", $"cos_rank",
        (coalesce(lit(1.0) / ($"bm25_rank" + lit(rrfC)), lit(0.0)) +
          coalesce(lit(1.0) / ($"cos_rank" + lit(rrfC)), lit(0.0)))
          .as("rrf"))
    val wf = Window.orderBy($"rrf".desc, $"doc_id".asc)
    fused.withColumn("rank", row_number().over(wf).cast("long"))
      .filter($"rank" <= 10)
      .select($"rank", $"doc_id", $"bm25_rank", $"cos_rank", $"rrf")
      .orderBy($"rank")
  }
  private val q195Sql = {
    val terms = bmTerms.map(t => s"'$t'").mkString(", ")
    val avgdl = "(CAST(tot_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    val idf = "ln(1.0 + (CAST(n_docs - df AS DOUBLE) + 0.5)" +
      " / (CAST(df AS DOUBLE) + 0.5))"
    val contrib = s"ROUND($idf * (CAST(tf AS DOUBLE) * ${bmK1 + 1})" +
      s" / (CAST(tf AS DOUBLE) + $bmK1 * (${1 - bmB} + $bmB" +
      s" * (CAST(dl AS DOUBLE) / $avgdl))), 6)"
    val d = VectorOps.dotSql("e.embedding", "q.qv")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |  FROM documents),
       |dlq AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
       |st AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS tot_dl FROM dlq),
       |tfq AS (
       |  SELECT doc_id, term, COUNT(*) AS tf FROM toks
       |  WHERE term IN ($terms) GROUP BY 1, 2),
       |dfq AS (SELECT term, COUNT(*) AS df FROM tfq GROUP BY 1),
       |agg AS (
       |  SELECT doc_id, SUM(CAST($contrib AS DECIMAL(18,6))) AS s
       |  FROM tfq JOIN dfq USING (term) JOIN dlq USING (doc_id)
       |  CROSS JOIN st
       |  GROUP BY doc_id),
       |bm AS (SELECT doc_id, bm25_rank FROM (
       |  SELECT doc_id,
       |    ROW_NUMBER() OVER (ORDER BY s DESC, doc_id ASC) AS bm25_rank
       |  FROM agg WHERE doc_id <> 0)
       |  WHERE bm25_rank <= $rrfArmK),
       |cos AS (SELECT doc_id, cos_rank FROM (
       |  SELECT e.vec_id AS doc_id,
       |    ROW_NUMBER() OVER (ORDER BY $d DESC, e.vec_id ASC) AS cos_rank
       |  FROM embeddings e
       |  CROSS JOIN (SELECT embedding AS qv FROM embeddings
       |              WHERE vec_id = 0) q
       |  WHERE e.vec_id <> 0)
       |  WHERE cos_rank <= $rrfArmK),
       |fused AS (SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
       |    b.bm25_rank, c.cos_rank,
       |    COALESCE(1.0 / (b.bm25_rank + $rrfC), 0)
       |      + COALESCE(1.0 / (c.cos_rank + $rrfC), 0) AS rrf
       |  FROM bm b FULL OUTER JOIN cos c ON b.doc_id = c.doc_id)
       |SELECT rank, doc_id, bm25_rank, cos_rank, rrf FROM (
       |  SELECT ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id ASC) AS rank,
       |    doc_id, bm25_rank, cos_rank, rrf
       |  FROM fused)
       |WHERE rank <= 10
       |ORDER BY rank""".stripMargin
  }

  // --------------------------------------------------------------- q208
  /** q86's BM25 answered FROM THE INVERTED INDEX ([[TextIndex]]) — the
    * corpus is never tokenized at query time: per-term tf postings come
    * from three bucket-pruned index reads, df is each posting list's
    * row count, doc lengths join from the docs-sized companion table,
    * and N is the companion's manifest ROW COUNT — metadata-only. The
    * scoring formula, rounding discipline, tie-breaks, and output are
    * q86's exactly, so the oracle IS q86's full-corpus formulation: an
    * index whose postings drop/double a row, mis-count a tf, or whose
    * maintenance serves a stale corpus hash-mismatches immediately.
    *
    * Scale: this is the difference between scoring a query by
    * re-tokenizing 100 TB (q86's formulation — correct, priced for
    * calibration) and reading three posting buckets + one docs-sized
    * narrow table. Same stats-broadcast shape as q86 (1-row Σdl frame,
    * plan-audit allowlisted). */
  private val q208: Q = (s, dir) => {
    import s.implicits._
    TextIndex.ensure(s, dir, s"$dir/documents.parquet")
    val tfq = bmTerms.map(t => TextIndex.lookupTf(s, dir, t))
      .reduce(_.union(_))
    val dfq = tfq.groupBy($"term").agg(count(lit(1)).as("df"))
    val dl = graft.sinks.ManifestSink.read(s, TextIndex.doclenDir(dir))
      .select($"doc_id", $"dl")
    val nDocs = graft.sinks.ManifestSink
      .rowCount(s, TextIndex.doclenDir(dir))
      .getOrElse(sys.error("doclen table lost its manifest row counts"))
    val stats = dl.agg(sum($"dl").as("tot_dl"))
      .select(lit(nDocs).as("n_docs"), $"tot_dl")
    val avgdl = $"tot_dl".cast("double") / $"n_docs".cast("double")
    val idf = log(lit(1.0) +
      (($"n_docs" - $"df").cast("double") + lit(0.5)) /
        ($"df".cast("double") + lit(0.5)))
    val contrib = round(
      idf * ($"tf".cast("double") * lit(bmK1 + 1)) /
        ($"tf".cast("double") + lit(bmK1) *
          (lit(1 - bmB) + lit(bmB) * ($"dl".cast("double") / avgdl))), 6)
    val agg = tfq.join(broadcast(dfq), "term").join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select($"doc_id", $"dl", contrib.as("c"))
      .groupBy($"doc_id")
      .agg(sum($"c".cast("decimal(18,6)")).as("s"),
        count(lit(1)).as("n_terms"), max($"dl").as("dl"))
    val top = agg.orderBy($"s".desc, $"doc_id".asc).limit(10)
    val w = Window.orderBy($"s".desc, $"doc_id".asc)
    top.withColumn("rank", row_number().over(w).cast("long"))
      .select($"doc_id", $"rank", $"n_terms", $"dl",
        $"s".cast("double").as("bm25"))
      .orderBy($"rank")
  }

  // --------------------------------------------------------------- q209
  /** Temperature mixture sampling (α = 0.5) — q84 with DATA-DERIVED
    * rates instead of a static table: each source's keep rate is
    * ∝ c_s^(α−1) = 1/√c_s, normalized so the smallest source keeps
    * everything — the multilingual/web "alpha sampling" that flattens a
    * skewed source distribution toward (but not all the way to)
    * uniform, standard in multilingual pretraining (e.g. the XLM-R
    * recipe). Rates quantize to integer basis points via one
    * fixed-shape double expression (sqrt/divide/floor — both engines
    * bit-identical on identical inputs), and the per-doc keep decision
    * is q84's integer hash-vs-bp compare — no float leaves the rate
    * derivation.
    *
    * Scale: rate derivation is a source-count-sized aggregate + a
    * 1-row min probe; the decision is a broadcast join + row-local
    * integer hash — no shuffle touches the corpus rows. */
  private val q209: Q = (s, dir) => {
    import s.implicits._
    val counts = Tables(s, dir, "documents")
      .groupBy($"source").agg(count(lit(1)).as("c"))
    val minC = counts.agg(min($"c")).head().getLong(0)
    val rates = counts.select($"source", $"c",
      least(lit(10000L),
        floor(lit(10000.0) * sqrt(lit(minC.toDouble))
          / sqrt($"c".cast("double"))).cast("long")).as("rate_bp"))
    Tables(s, dir, "documents").join(broadcast(rates), "source")
      .select($"source", $"c", $"rate_bp",
        (PortableHash.tokenHashP($"doc_id") % lit(10000L) < $"rate_bp")
          .as("kept"))
      .groupBy($"source")
      .agg(max($"c").cast("long").as("n_docs"),
        max($"rate_bp").as("rate_bp"),
        sum(when($"kept", 1L).otherwise(0L)).as("n_kept"))
      .orderBy($"source")
  }
  /** shared with q218 (SinkOps): the metadata-derived mixture must equal
    * this scanning formulation row-for-row. */
  private[operators] val q209Sql =
    s"""WITH c AS (SELECT source, COUNT(*) AS c FROM documents GROUP BY 1),
       |m AS (SELECT MIN(c) AS mc FROM c),
       |r AS (
       |  SELECT source, c,
       |    LEAST(10000, CAST(FLOOR(10000.0 * sqrt(CAST(mc AS DOUBLE))
       |      / sqrt(CAST(c AS DOUBLE))) AS BIGINT)) AS rate_bp
       |  FROM c CROSS JOIN m),
       |d AS (
       |  SELECT doc.source, r.c, r.rate_bp,
       |    (${tokenHashPSql("doc.doc_id")} % 10000) < r.rate_bp AS kept
       |  FROM documents doc JOIN r USING (source))
       |SELECT source, CAST(MAX(c) AS BIGINT) AS n_docs,
       |  MAX(rate_bp) AS rate_bp,
       |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
       |FROM d GROUP BY source
       |ORDER BY source""".stripMargin

  // --------------------------------------------------------------- q211
  /** DSIR data selection — importance resampling with hashed n-gram
    * features (Xie et al. 2023, "Data Selection for Language Models via
    * Importance Resampling"): estimate a TARGET feature distribution
    * p̂ (here: the `lang = 'en'` slice standing in for the curated
    * target domain) and a RAW distribution q̂ (the whole corpus), both
    * as add-one-smoothed histograms over B = 4096 hashed-bigram
    * buckets, and weight every document by its log importance ratio
    * Σ_f ln(p̂(f)/q̂(f)) over its feature occurrences. Documents whose
    * feature mass looks like the target keep (mean ratio ≥ 0, the
    * equal-prior boundary); the paper's Gumbel-noise sampling step is
    * replaced by the deterministic ratio rank — the noiseless variant
    * every later stage can reproduce bit-exact (at the 100 TB deploy
    * the keep cut calibrates via q183's weighted quantiles instead of
    * a literal). Differs from q210 (NB over raw unigrams) exactly the
    * way the paper differs from the GPT-3 filter: fixed-width HASHED
    * bigram features — model state is B buckets regardless of
    * vocabulary, the property that lets the estimator run at any
    * corpus size with KB-scale state.
    *
    * Determinism: features are portable 48-bit sha-derived hashes mod
    * B ([[PortableHash]]); per-feature log-ratios round to 6 dp and
    * sum in DECIMAL(18,6) (q75's order-free recipe).
    *
    * Scale: bigram construction is q204's shuffle-free projection off
    * the hoisted token array; BOTH class histograms come from ONE
    * B-bounded conditional aggregate (target count + raw count per
    * bucket in a single pass); scoring joins the feature stream
    * against the ≤B-row model frame (AQE broadcasts it) and folds one
    * per-doc aggregate — train + score = two corpus scans, state = B
    * rows, no corpus-sized shuffle beyond the per-doc fold. */
  private val q211: Q = (s, dir) => {
    import s.implicits._
    val B = 4096L
    val feats = Tables(s, dir, "documents")
      .select($"doc_id", $"lang", split($"text", " ").as("tk"))
      .filter(size($"tk") >= 2)
      .select($"doc_id", $"lang", explode(expr(
        "transform(sequence(1, size(tk) - 1)," +
          " i -> concat_ws(' ', tk[i-1], tk[i]))")).as("bg"))
      .select($"doc_id", $"lang",
        (PortableHash.tokenHash($"bg") % lit(B)).as("f"))
    val model = feats.groupBy($"f").agg(
      sum(when($"lang" === "en", 1L).otherwise(0L)).as("ct"),
      count(lit(1)).as("cr"))
    val tot = model.agg(sum($"ct").as("nt"), sum($"cr").as("nr"))
    val lr = round(
      log(($"ct" + 1).cast("double") / ($"nt" + lit(B)).cast("double")) -
        log(($"cr" + 1).cast("double") / ($"nr" + lit(B)).cast("double")), 6)
      .cast("decimal(18,6)")
    feats.join(model, "f").crossJoin(broadcast(tot))
      .groupBy($"doc_id")
      .agg(count(lit(1)).cast("long").as("n_feats"),
        sum(lr).cast("double").as("logw"),
        (sum(lr).cast("double") / count(lit(1))).as("avg_logw"))
      .select($"doc_id", $"n_feats", $"logw", $"avg_logw",
        ($"avg_logw" >= 0.0).as("keep"))
      .orderBy($"doc_id")
  }
  private val q211Sql = {
    val fh = s"(${PortableHash.tokenHashSql("bg")} % 4096)"
    s"""WITH t AS (
       |  SELECT doc_id, lang, string_split(text, ' ') AS tk
       |  FROM documents),
       |bi AS (
       |  SELECT doc_id, lang, unnest(list_transform(range(1, len(tk)),
       |    i -> tk[i] || ' ' || tk[i+1])) AS bg
       |  FROM t),
       |fs AS (SELECT doc_id, lang, $fh AS f FROM bi),
       |model AS (
       |  SELECT f,
       |    SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct,
       |    COUNT(*) AS cr
       |  FROM fs GROUP BY f),
       |tot AS (SELECT SUM(ct) AS nt, SUM(cr) AS nr FROM model),
       |lp AS (
       |  SELECT doc_id,
       |    CAST(ROUND(ln(CAST(ct + 1 AS DOUBLE) / (nt + 4096))
       |             - ln(CAST(cr + 1 AS DOUBLE) / (nr + 4096)), 6)
       |      AS DECIMAL(18,6)) AS lr
       |  FROM fs JOIN model USING (f) CROSS JOIN tot)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
       |  CAST(SUM(lr) AS DOUBLE) AS logw,
       |  CAST(SUM(lr) AS DOUBLE) / COUNT(*) AS avg_logw,
       |  (CAST(SUM(lr) AS DOUBLE) / COUNT(*)) >= 0.0 AS keep
       |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q211_dsir_selection" -> q211,
    "q209_temperature_mixture" -> q209,
    "q208_indexed_bm25" -> q208,
    "q195_hybrid_rrf" -> q195,
    "q192_balanced_sample" -> q192,
    "q191_temporal_split" -> q191,
    "q181_epoch_upsample" -> q181,
    "q180_curriculum_phases" -> q180,
    "q177_shuffle_shards" -> q177,
    "q176_token_budget_sample" -> q176,
    "q147_bpe_merges" -> q147,
    "q148_bpe_encode" -> q148,
    "q136_leakage_safe_split" -> q136,
    "q108_feature_binning" -> q108,
    "q55_tfidf_top_terms" -> q55,
    "q86_bm25_ranking" -> q86,
    "q56_hash_sample" -> q56,
    "q57_stratified_sample" -> q57,
    "q64_countmin_sketch" -> q64,
    "q69_training_corpus" -> q69,
    "q72_document_chunks" -> q72,
    "q73_sequence_packing" -> q73,
    "q162_length_buckets" -> q162,
    "q81_curation_pipeline" -> q81,
    "q219_normalized_curation" -> q219,
    "q84_mixture_sample" -> q84)

  val oracleSql: Map[String, String] = Map(
    // the indexed path must equal the full-corpus formulation exactly
    "q208_indexed_bm25" -> q86Sql,
    "q211_dsir_selection" -> q211Sql,
    "q209_temperature_mixture" -> q209Sql,
    "q195_hybrid_rrf" -> q195Sql,
    "q192_balanced_sample" -> q192Sql,
    "q191_temporal_split" -> q191Sql,
    "q181_epoch_upsample" -> q181Sql,
    "q180_curriculum_phases" -> q180Sql,
    "q177_shuffle_shards" -> q177Sql,
    "q176_token_budget_sample" -> q176Sql,
    "q147_bpe_merges" -> q147Sql,
    "q148_bpe_encode" -> q148Sql,
    "q136_leakage_safe_split" -> q136Sql,
    "q108_feature_binning" -> q108Sql,
    "q55_tfidf_top_terms" -> q55Sql,
    "q86_bm25_ranking" -> q86Sql,
    "q56_hash_sample" -> q56Sql,
    "q57_stratified_sample" -> q57Sql,
    "q64_countmin_sketch" -> q64Sql,
    "q69_training_corpus" -> q69Sql,
    "q72_document_chunks" -> q72Sql,
    "q73_sequence_packing" -> q73Sql,
    "q162_length_buckets" -> q162Sql,
    "q81_curation_pipeline" -> q81Sql,
    "q219_normalized_curation" -> q219Sql,
    "q84_mixture_sample" -> q84Sql)
}
