package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Text-analysis operators over `documents` (driver-mandated extension,
  * SURVEY.md §2.10): token stats, language stats, top words, stopword
  * language-ID, quality scoring, fingerprinting, regex tokenization.
  *
  * All scalar work uses codegen'd builtins and higher-order array functions
  * (`split`/`filter`/`array_distinct`/`array_intersect`) — no UDFs, so
  * every stage stays inside whole-stage codegen and the only shuffles are
  * the final aggregations/sorts. Each query has an exact DuckDB mirror
  * (list_* higher-order functions).
  */
object TextOps {
  type Q = (SparkSession, String) => DataFrame

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** whitespace tokens of `text` */
  private val toks: Column = split(col("text"), " ")

  /** count of occurrences of word `w` in text (higher-order filter) */
  private def hits(w: String): Column =
    size(filter(toks, t => t === w)).cast("long")
  private def hitsSql(w: String): String =
    s"CAST(len(list_filter(str_split(text, ' '), t -> t = '$w')) AS BIGINT)"

  // ---------------------------------------------------------------- q30
  /** Per-document token statistics: counts, type-token ratio, mean token
    * length — pure narrow projection, no shuffle until the output sort. */
  private val q30: Q = (s, dir) => {
    import s.implicits._
    docs(s, dir)
      .select(
        $"doc_id",
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct_tokens"),
        $"n_chars")
      .withColumn("ttr",
        $"n_distinct_tokens".cast("double") / $"n_tokens".cast("double"))
      .orderBy($"doc_id")
  }
  private val q30Sql =
    """SELECT doc_id,
      |  CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
      |  CAST(len(list_distinct(str_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
      |  n_chars,
      |  CAST(len(list_distinct(str_split(text, ' '))) AS DOUBLE)
      |    / CAST(len(str_split(text, ' ')) AS DOUBLE) AS ttr
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q31
  /** Per-language corpus statistics. */
  private val q31: Q = (s, dir) => {
    import s.implicits._
    docs(s, dir)
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_chars").as("sum_chars"),
        (sum($"n_chars").cast("double") / count(lit(1))).as("avg_chars"),
        min($"n_chars").as("min_chars"),
        max($"n_chars").as("max_chars"))
      .orderBy($"lang")
  }
  private val q31Sql =
    """SELECT lang,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
      |  MIN(n_chars) AS min_chars,
      |  MAX(n_chars) AS max_chars
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q32
  /** Corpus top-20 words: explode → count → top-k with unique tiebreak. */
  private val q32: Q = (s, dir) => {
    import s.implicits._
    docs(s, dir)
      .select(explode(toks).as("word"))
      .filter($"word" =!= "")
      .groupBy($"word")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"word".asc)
      .limit(20)
  }
  private val q32Sql =
    """SELECT word, COUNT(*) AS n
      |FROM (SELECT unnest(str_split(text, ' ')) AS word FROM documents)
      |WHERE word <> ''
      |GROUP BY word
      |ORDER BY n DESC, word ASC
      |LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q33
  /** Stopword-marker language ID (n-gram-free heuristic): per-language
    * marker-word hit counts, argmax with deterministic tiebreak order.
    * Marker lists are public high-frequency function words. */
  private val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "of", "and", "a"),
    "de" -> Seq("der", "und", "die", "ist"),
    "es" -> Seq("el", "los", "que", "y"),
    "fr" -> Seq("le", "les", "et", "est"))
  private val langOrder = Seq("en", "de", "es", "fr")

  private def score(lang: String): Column =
    markers(lang).map(hits).reduce(_ + _)
  private def scoreSql(lang: String): String =
    markers(lang).map(hitsSql).mkString("(", " + ", ")")

  private val q33: Q = (s, dir) => {
    import s.implicits._
    val sc = langOrder.map(l => l -> score(l)).toMap
    val best = langOrder.map(sc).reduce((a, b) => greatest(a, b))
    // argmax with tiebreak = langOrder position; all-zero → 'und'
    val pred = langOrder.foldRight(lit("und"): Column) { (l, els) =>
      when(sc(l) === best && best > 0, lit(l)).otherwise(els)
    }
    docs(s, dir)
      .select(
        $"doc_id", $"lang",
        sc("en").as("en_hits"), sc("de").as("de_hits"),
        sc("es").as("es_hits"), sc("fr").as("fr_hits"),
        pred.as("predicted"))
      .orderBy($"doc_id")
  }
  private val q33Sql = {
    val e = scoreSql("en"); val d = scoreSql("de")
    val es = scoreSql("es"); val f = scoreSql("fr")
    s"""SELECT doc_id, lang,
       |  $e AS en_hits, $d AS de_hits, $es AS es_hits, $f AS fr_hits,
       |  CASE
       |    WHEN $e = GREATEST($e, $d, $es, $f) AND GREATEST($e, $d, $es, $f) > 0 THEN 'en'
       |    WHEN $d = GREATEST($e, $d, $es, $f) AND GREATEST($e, $d, $es, $f) > 0 THEN 'de'
       |    WHEN $es = GREATEST($e, $d, $es, $f) AND GREATEST($e, $d, $es, $f) > 0 THEN 'es'
       |    WHEN $f = GREATEST($e, $d, $es, $f) AND GREATEST($e, $d, $es, $f) > 0 THEN 'fr'
       |    ELSE 'und'
       |  END AS predicted
       |FROM documents
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q34
  /** Quality scoring: type-token ratio, stopword ratio, length saturation →
    * composite score + keep flag (training-data filter shape). */
  private val q34: Q = (s, dir) => {
    import s.implicits._
    val enStop = markers("en")
    val nTokens = size(toks).cast("double")
    val stopHits = enStop.map(hits).reduce(_ + _).cast("double")
    val ttr = size(array_distinct(toks)).cast("double") / nTokens
    val stopRatio = stopHits / nTokens
    val lenSat = least(lit(1.0), nTokens / lit(50.0))
    val quality = ttr * lit(0.4) + (lit(1.0) - stopRatio) * lit(0.4) +
      lenSat * lit(0.2)
    docs(s, dir)
      .select($"doc_id",
        nTokens.cast("long").as("n_tokens"),
        ttr.as("ttr"),
        stopRatio.as("stopword_ratio"),
        quality.as("quality"),
        (quality >= 0.5).as("keep"))
      .orderBy($"doc_id")
  }
  private val q34Sql = {
    val stopHits = markers("en").map(hitsSql).mkString("(", " + ", ")")
    val nTok = "CAST(len(str_split(text, ' ')) AS DOUBLE)"
    val ttr = s"CAST(len(list_distinct(str_split(text, ' '))) AS DOUBLE) / $nTok"
    val stopRatio = s"CAST($stopHits AS DOUBLE) / $nTok"
    val lenSat = s"LEAST(1.0, $nTok / 50.0)"
    val quality = s"($ttr) * 0.4 + (1.0 - $stopRatio) * 0.4 + ($lenSat) * 0.2"
    s"""SELECT doc_id,
       |  CAST($nTok AS BIGINT) AS n_tokens,
       |  $ttr AS ttr,
       |  $stopRatio AS stopword_ratio,
       |  $quality AS quality,
       |  ($quality) >= 0.5 AS keep
       |FROM documents
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q35
  /** Exact-duplicate fingerprint dedup: md5 content hash → survivor =
    * min doc_id per fingerprint (first-write-wins at corpus scale: one
    * shuffle on the 128-bit key, no pairwise compare). */
  private val q35: Q = (s, dir) => {
    import s.implicits._
    docs(s, dir)
      .select($"doc_id", md5($"text").as("fingerprint"))
      .groupBy($"fingerprint")
      .agg(min($"doc_id").as("keeper_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy($"fingerprint")
  }
  private val q35Sql =
    """SELECT md5(text) AS fingerprint,
      |  MIN(doc_id) AS keeper_doc_id,
      |  COUNT(*) AS n_copies
      |FROM documents
      |GROUP BY 1
      |ORDER BY fingerprint""".stripMargin

  // --------------------------------------------------------------- q154
  /** Source-PRECEDENCE survivor selection: within each exact-dup cluster
    * (same text), keep the copy from the highest-priority source (here
    * src0 > src1 > src2 — lexicographic source order IS the priority
    * ladder), ties to the smallest doc_id. The policy complement of
    * q35's first-write-wins: cross-corpus curation dedups BY PROVENANCE
    * (licensed > crawled > scraped mirrors), not by arrival order.
    * Every doc is emitted with its verdict and — for losers — the
    * survivor it duplicates. One shuffle on the content key; the
    * survivor travels via the window's running `first`, no second join. */
  private val q154: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"text").orderBy($"source".asc, $"doc_id".asc)
    docs(s, dir)
      .select($"doc_id", $"source", $"text")
      .withColumn("__rn", row_number().over(w))
      .withColumn("__surv", first($"doc_id").over(w))
      .select($"doc_id", $"source",
        ($"__rn" === 1).as("keep"),
        when($"__rn" === 1, lit(null).cast("long"))
          .otherwise($"__surv").as("dup_of"))
      .orderBy($"doc_id")
  }
  private val q154Sql =
    """SELECT doc_id, source,
      |  (rn = 1) AS keep,
      |  CASE WHEN rn = 1 THEN NULL ELSE surv END AS dup_of
      |FROM (
      |  SELECT doc_id, source,
      |    ROW_NUMBER() OVER (PARTITION BY text
      |                       ORDER BY source ASC, doc_id ASC) AS rn,
      |    FIRST_VALUE(doc_id) OVER (PARTITION BY text
      |                              ORDER BY source ASC, doc_id ASC) AS surv
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q38
  /** Exact n-gram(1) Jaccard near-dup pairs, blocked by `source`: the
    * candidate space is each source group, not the full cross product —
    * the blocking key is the scale lever (at 100 TB you block on a cheap
    * partition key and only self-join within blocks). */
  private val q38: Q = (s, dir) => {
    import s.implicits._
    // Token sets are dictionary-encoded into 64-bit masks (global vocab is
    // tiny), so per-pair Jaccard is integer bit_count work instead of
    // string-array intersection — same exact values as the oracle's
    // list_intersect formulation since |A∩B| and |A∪B| are the same
    // integers either way. General-vocab fallback: DedupOps array path.
    import graft.functions.TokenBitmask
    val exploded = docs(s, dir)
      .select($"doc_id", $"source", explode(array_distinct(toks)).as("__tok"))
    val vocab = exploded.select($"__tok").distinct()
    if (vocab.count() <= TokenBitmask.MaxVocab) {
      // Identical-set collapse (same move as the MinHash path): pair
      // enumeration runs over DISTINCT (source, mask) combinations, and
      // doc pairs are expanded only for mask pairs that pass the
      // threshold — on a dup-dense corpus the quadratic join shrinks by
      // the square of the average duplicate-group size.
      val d = TokenBitmask.masks(exploded, TokenBitmask.dictionary(vocab),
        Seq("doc_id", "source")).withColumnRenamed("__mask", "mask")
      val groups = d.groupBy($"source", $"mask")
        .agg(collect_list($"doc_id").as("__members"))
      val a = groups.select($"source", $"mask".as("__ma"),
        $"__members".as("__mem_a"))
      val b = groups.select($"source".as("__src_b"), $"mask".as("__mb"),
        $"__members".as("__mem_b"))
      val inter = TokenBitmask.intersectCount($"__ma", $"__mb").cast("long")
      val uni = TokenBitmask.unionCount($"__ma", $"__mb").cast("long")
      val cross = a.join(b, $"source" === $"__src_b" && $"__ma" < $"__mb")
        .select($"__mem_a", $"__mem_b", inter.as("n_common"),
          (inter.cast("double") / uni.cast("double")).as("jaccard"))
        .filter($"jaccard" >= 0.9)
        .select(explode($"__mem_a").as("__x"), $"__mem_b",
          $"n_common", $"jaccard")
        .select($"__x", explode($"__mem_b").as("__y"),
          $"n_common", $"jaccard")
        .select(least($"__x", $"__y").as("doc_a"),
          greatest($"__x", $"__y").as("doc_b"), $"n_common", $"jaccard")
      val intra = groups.filter(size($"__members") >= 2)
        .select($"mask", explode($"__members").as("__x"), $"__members")
        .select($"mask", $"__x", explode($"__members").as("__y"))
        .filter($"__x" < $"__y")
        .select($"__x".as("doc_a"), $"__y".as("doc_b"),
          bit_count($"mask").cast("long").as("n_common"),
          lit(1.0).as("jaccard"))
      cross.union(intra).orderBy($"doc_a", $"doc_b")
    } else {
      // Open-vocab tier: PREFIX-FILTERED similarity self-join (the
      // SSJoin kernel q143 runs), never all-pairs. The source blocking
      // key rides INSIDE the elements (source-qualified tokens): a
      // cross-source pair shares zero elements, so it can never surface
      // as a candidate, and within-source Jaccard is unchanged because
      // the qualification is injective per source. The integral 9/10
      // threshold is exactly `jaccard >= 0.9`. The r13 scale sweep
      // caught the previous fallback — an all-pairs join WITHIN each
      // source block — at 43× wall time for 10× data (quadratic within
      // block, hidden at every SF whose vocabulary fit the bitmap
      // tier); this path is candidate-bound instead.
      val sets = docs(s, dir).select($"doc_id",
        transform(array_distinct(toks),
          t => concat($"source", lit("\u0000"), t)).as("qt"))
      graft.operators.DedupOps.prefixSimilarityJoin(sets, "doc_id", "qt",
          9, 10, fragments = graft.operators.DedupOps
            .dedupFragments(s, dir, passFactor = 1500L),
          resize = graft.operators.DedupOps
            .dedupResize(s, dir, passFactor = 1500L))
        .withColumnRenamed("id_a", "doc_a")
        .withColumnRenamed("id_b", "doc_b")
        .orderBy($"doc_a", $"doc_b")
    }
  }
  private val q38Sql =
    """WITH t AS (SELECT doc_id, source,
      |                  list_distinct(str_split(text, ' ')) AS tokens
      |           FROM documents)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(len(list_intersect(a.tokens, b.tokens)) AS BIGINT) AS n_common,
      |  CAST(len(list_intersect(a.tokens, b.tokens)) AS DOUBLE)
      |    / CAST(len(a.tokens) + len(b.tokens)
      |           - len(list_intersect(a.tokens, b.tokens)) AS DOUBLE) AS jaccard
      |FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
      |WHERE CAST(len(list_intersect(a.tokens, b.tokens)) AS DOUBLE)
      |    / CAST(len(a.tokens) + len(b.tokens)
      |           - len(list_intersect(a.tokens, b.tokens)) AS DOUBLE) >= 0.9
      |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------- q39
  /** Regex tokenization (BPE-ish word/number/symbol classes) vs whitespace
    * count — same RE2-safe pattern on both engines. */
  private val q39: Q = (s, dir) => {
    import s.implicits._
    docs(s, dir)
      .select(
        $"doc_id",
        size(toks).cast("long").as("n_ws_tokens"),
        size(regexp_extract_all($"text", lit("[a-z]+|[0-9]+"), lit(0)))
          .cast("long").as("n_re_tokens"))
      .orderBy($"doc_id")
  }
  private val q39Sql =
    """SELECT doc_id,
      |  CAST(len(str_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT) AS n_re_tokens
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q66
  /** Gopher/C4-style repetition signals — the training-data quality
    * filters that complement q34's lexical score: a document dominated by
    * one token or by repeated n-grams is boilerplate/spam even when its
    * token-level stats look fine (Rae et al. 2021 §A1.1 use the same
    * family: top-n-gram fraction, duplicate-n-gram fraction).
    *
    * Signals (all exact integer counts → deterministic double ratios):
    *   - `top_token_frac`: multiplicity of the most frequent token over
    *     n_tokens (mode via explode + two-level groupBy, both map-side
    *     partial; total token count falls out of the same aggregate for
    *     free);
    *   - `dup_bigram_frac`: 1 − distinct bigrams / total bigrams, with
    *     the distinct count from the codegen'd [[graft.functions
    *     .ShingleArray]] kernel — a narrow projection, no shuffle.
    *
    * The two sides join on doc_id (doc-count rows each). At 100 TB both
    * aggregations partial map-side and the join is a co-partitioned
    * shuffle on the primary key — no pairwise anything. Thresholds keep
    * ≈75% of this corpus (Gopher's 0.2/0.2 tuned to the synthetic
    * vocabulary). */
  private val q66: Q = (s, dir) => {
    import s.implicits._
    val t = docs(s, dir).select($"doc_id", split($"text", " ").as("tk"))
    val base = t.select($"doc_id",
      size($"tk").cast("long").as("n_tokens"),
      greatest(size($"tk") - 1, lit(0)).cast("long").as("n_bigrams"),
      size(DedupOps.shingles($"tk", 2)).cast("long").as("n_distinct_bigrams"))
    val top = t.select($"doc_id", explode($"tk").as("tok"))
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id").agg(max($"c").as("top_c"))
    val topFrac = $"top_c".cast("double") / $"n_tokens".cast("double")
    val dupFrac = when($"n_bigrams" > 0,
      lit(1.0) - $"n_distinct_bigrams".cast("double") /
        $"n_bigrams".cast("double")).otherwise(lit(0.0))
    base.join(top, "doc_id")
      .select($"doc_id", $"n_tokens",
        topFrac.as("top_token_frac"),
        dupFrac.as("dup_bigram_frac"),
        (topFrac <= 0.125 && dupFrac <= 0.06).as("keep"))
      .orderBy($"doc_id")
  }
  private val q66Sql = {
    val bigrams = "list_distinct(list_transform(range(1, len(tk)), " +
      "i -> tk[i] || ' ' || tk[i+1]))"
    val topFrac = "CAST(top_c AS DOUBLE) / CAST(n_tokens AS DOUBLE)"
    val dupFrac = "CASE WHEN n_bigrams > 0 THEN 1.0 - " +
      "CAST(n_distinct_bigrams AS DOUBLE) / CAST(n_bigrams AS DOUBLE) " +
      "ELSE 0.0 END"
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |base AS (
       |  SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
       |    CAST(GREATEST(len(tk) - 1, 0) AS BIGINT) AS n_bigrams,
       |    CAST(len($bigrams) AS BIGINT) AS n_distinct_bigrams
       |  FROM t),
       |top AS (
       |  SELECT doc_id, MAX(c) AS top_c FROM (
       |    SELECT doc_id, tok, COUNT(*) AS c
       |    FROM t, UNNEST(tk) AS u(tok) GROUP BY doc_id, tok)
       |  GROUP BY doc_id)
       |SELECT base.doc_id AS doc_id, n_tokens,
       |  $topFrac AS top_token_frac,
       |  $dupFrac AS dup_bigram_frac,
       |  (($topFrac) <= 0.125 AND ($dupFrac) <= 0.06) AS keep
       |FROM base JOIN top USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q75
  /** Unigram language-model quality score — the engine-side analog of
    * perplexity filtering (KenLM-style): score each document by the mean
    * log corpus-probability of its tokens; gibberish and vocabulary
    * outliers score low. Two aggregations (corpus unigram counts + total)
    * joined back to the token stream — the frequency table is tiny
    * relative to the corpus and broadcasts.
    *
    * Determinism: per-token log-probabilities are ROUNDED to 6 dp (the
    * q55 ln-ulp-drift treatment) and then summed in DECIMAL(18,6) — an
    * exact, order-free sum, so the mean is bit-stable under any
    * partitioning and hash-matches DuckDB (a double sum would be
    * order-dependent even with identical summands). */
  private val q75: Q = (s, dir) => {
    import s.implicits._
    val tokStream = docs(s, dir).select($"doc_id", explode(toks).as("tok"))
    val freq = tokStream.groupBy($"tok").agg(count(lit(1)).as("c"))
    val tot = tokStream.agg(count(lit(1)).as("n"))
    val logp = round(log($"c".cast("double") / $"n".cast("double")), 6)
      .cast("decimal(18,6)")
    tokStream.join(broadcast(freq), "tok").crossJoin(broadcast(tot))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        (sum(logp).cast("double") / count(lit(1))).as("avg_logp"))
      .select($"doc_id", $"n_tokens", $"avg_logp",
        ($"avg_logp" >= -3.41).as("keep"))
      .orderBy($"doc_id")
  }
  private val q75Sql =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |freq AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
      |tot AS (SELECT COUNT(*) AS n FROM toks)
      |SELECT doc_id, COUNT(*) AS n_tokens,
      |  CAST(SUM(CAST(ROUND(ln(CAST(c AS DOUBLE) / n), 6) AS DECIMAL(18,6)))
      |    AS DOUBLE) / COUNT(*) AS avg_logp,
      |  (CAST(SUM(CAST(ROUND(ln(CAST(c AS DOUBLE) / n), 6) AS DECIMAL(18,6)))
      |    AS DOUBLE) / COUNT(*)) >= -3.41 AS keep
      |FROM toks JOIN freq USING (tok) CROSS JOIN tot
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q87
  /** PII redaction (the scrub stage every published-corpus pipeline runs
    * before training): regex-replace emails, phone numbers, and IPv4
    * addresses with typed placeholders, and report per-category match
    * counts. The kernel is a map-side chained `regexp_replace` +
    * `regexp_extract_all` projection — codegen'd, no shuffle until the
    * output sort; at 100 TB the scrub cost is embarrassingly parallel.
    *
    * The fixtures are PII-free by construction, so the input is a
    * deterministic "dirty" contact string synthesized per event from
    * fixture columns (emails only on signup events, phones only on
    * purchases — counts vary by row). Patterns stick to the regex subset
    * Java and RE2 interpret identically (character classes, bounded
    * repetition, \b ASCII word boundaries; no lookaround/backrefs), so the
    * redacted text and counts are hash-exact against DuckDB. */
  private val emailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  private val phoneRe = """\+1-[0-9]{3}-[0-9]{4}"""
  private val ipRe = """\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"""

  private val q87: Q = (s, dir) => {
    import s.implicits._
    val dirty = concat(
      lit("user "), $"user_id".cast("string"),
      when($"event_type" === "signup",
        concat(lit(" mail u"), $"user_id".cast("string"), lit("@ex.org")))
        .otherwise(lit("")),
      when($"event_type" === "purchase",
        concat(lit(" tel +1-"),
          lpad(($"user_id" % 1000).cast("string"), 3, "0"), lit("-"),
          lpad(($"event_id" % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")),
      lit(" ip 10."), ($"user_id" % 256).cast("string"),
      lit(".0."), ($"event_id" % 256).cast("string"))
    val redacted = regexp_replace(
      regexp_replace(
        regexp_replace($"dirty", emailRe, "[EMAIL]"),
        phoneRe, "[PHONE]"),
      ipRe, "[IP]")
    Tables(s, dir, "events")
      .withColumn("dirty", dirty)
      .select($"event_id",
        size(regexp_extract_all($"dirty", lit(emailRe), lit(0)))
          .cast("long").as("n_email"),
        size(regexp_extract_all($"dirty", lit(phoneRe), lit(0)))
          .cast("long").as("n_phone"),
        size(regexp_extract_all($"dirty", lit(ipRe), lit(0)))
          .cast("long").as("n_ip"),
        redacted.as("redacted"))
      .orderBy($"event_id")
  }
  private val q87Sql = {
    // single-quoted SQL literals: escape nothing (patterns have no quotes)
    val dirty =
      "'user ' || CAST(user_id AS VARCHAR)" +
        " || CASE WHEN event_type = 'signup' THEN" +
        " ' mail u' || CAST(user_id AS VARCHAR) || '@ex.org'" +
        " ELSE '' END" +
        " || CASE WHEN event_type = 'purchase' THEN" +
        " ' tel +1-' || lpad(CAST(user_id % 1000 AS VARCHAR), 3, '0')" +
        " || '-' || lpad(CAST(event_id % 10000 AS VARCHAR), 4, '0')" +
        " ELSE '' END" +
        " || ' ip 10.' || CAST(user_id % 256 AS VARCHAR)" +
        " || '.0.' || CAST(event_id % 256 AS VARCHAR)"
    s"""WITH d AS (SELECT event_id, $dirty AS dirty FROM events)
       |SELECT event_id,
       |  CAST(len(regexp_extract_all(dirty, '$emailRe')) AS BIGINT)
       |    AS n_email,
       |  CAST(len(regexp_extract_all(dirty, '$phoneRe')) AS BIGINT)
       |    AS n_phone,
       |  CAST(len(regexp_extract_all(dirty, '$ipRe')) AS BIGINT) AS n_ip,
       |  regexp_replace(regexp_replace(regexp_replace(dirty,
       |    '$emailRe', '[EMAIL]', 'g'),
       |    '$phoneRe', '[PHONE]', 'g'),
       |    '$ipRe', '[IP]', 'g') AS redacted
       |FROM d
       |ORDER BY event_id""".stripMargin
  }

  // --------------------------------------------------------------- q141
  /** Vocabulary COVERAGE curve — the tokenizer-design question q32's
    * plain top-words list doesn't answer: what fraction of the token
    * STREAM does a size-V vocabulary cover (equivalently, the OOV rate
    * a V-entry tokenizer pays)? Terms rank by (frequency desc, term
    * asc — a total, engine-identical order); coverage at V = Σ n over
    * ranks ≤ V. Evaluated at V ∈ {4, 8, 16, 32} via ONE conditional
    * aggregate over the ranked terms (no rank-range join — the
    * cutoff×term non-equi join would be a nested-loop), unpivoted with
    * `stack`. The global rank window runs over DISTINCT TERMS (the
    * vocabulary), not tokens — vocabulary-sized, the same bounded-row
    * caveat as q26's minute series.
    *
    * Scale: token explode + term count is the q30/q32 two-phase
    * aggregate; everything after operates on vocabulary rows. */
  private val q141: Q = (s, dir) => {
    import s.implicits._
    val tf = Tables(s, dir, "documents")
      .select(explode(split($"text", " ")).as("term"))
      .groupBy($"term").agg(count(lit(1)).as("n"))
    val wr = Window.orderBy($"n".desc, $"term".asc)
    val ranked = tf.withColumn("rank", row_number().over(wr))
    val cuts = Seq(4, 8, 16, 32)
    val agg = ranked.agg(
      sum($"n").cast("double").as("total"),
      cuts.map(v => sum(when($"rank" <= v, $"n").otherwise(0L))
        .cast("long").as(s"c$v")): _*)
    agg.select(col("total"), expr(
        s"stack(${cuts.size}, " +
          cuts.map(v => s"${v}L, c$v").mkString(", ") +
          ") as (vocab_size, covered_tokens)"))
      .withColumn("coverage", $"covered_tokens".cast("double") / $"total")
      .withColumn("oov_rate", lit(1.0) - $"coverage")
      .select($"vocab_size", $"covered_tokens", $"coverage", $"oov_rate")
      .orderBy($"vocab_size")
  }
  private val q141Sql = {
    val cuts = Seq(4, 8, 16, 32)
    val sums = cuts.map(v =>
      s"CAST(SUM(CASE WHEN rank <= $v THEN n ELSE 0 END) AS BIGINT) " +
        s"AS c$v").mkString(",\n|    ")
    val rows = cuts.map(v =>
      s"SELECT CAST($v AS BIGINT) AS vocab_size, c$v AS covered_tokens, " +
        s"CAST(c$v AS DOUBLE) / total AS coverage, " +
        s"1.0 - CAST(c$v AS DOUBLE) / total AS oov_rate FROM t")
      .mkString("\n|  UNION ALL\n|  ")
    s"""WITH tf AS (
       |  SELECT term, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM (SELECT unnest(string_split(text, ' ')) AS term
       |        FROM documents)
       |  GROUP BY term),
       |r AS (
       |  SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, term ASC)
       |    AS rank
       |  FROM tf),
       |t AS (
       |  SELECT CAST(SUM(n) AS DOUBLE) AS total,
       |    $sums
       |  FROM r)
       |SELECT * FROM (
       |  $rows)
       |ORDER BY vocab_size""".stripMargin
  }

  // --------------------------------------------------------------- q144
  /** Cross-document duplicated-n-gram coverage — the document-level
    * "how much of me exists elsewhere" signal substring-dedup pipelines
    * filter on (Lee et al. 2022, "Deduplicating Training Data Makes
    * Language Models Better", measure duplication at the substring
    * level precisely because whole-doc dedup misses partial copies):
    * for each document, the fraction of its distinct 2-gram shingles
    * that also occur in at least one OTHER document. A doc at coverage
    * 1.0 is wholly reassembled from corpus-shared n-grams; high-coverage
    * docs are the span-dedup (q83) candidates.
    *
    * Scale: one shingle explode + one (shingle) groupBy for corpus
    * document frequency, one join back on shingle, one per-doc
    * aggregate — all map-side-combinable two-phase aggs; no pair
    * enumeration anywhere (this is the linear-cost triage that decides
    * whether the quadratic-output q143/q60 pipelines are worth running).
    * Docs with fewer than 2 tokens have no shingles and drop out (both
    * engines). */
  private val q144: Q = (s, dir) => {
    import s.implicits._
    val sets = docs(s, dir)
      .select($"doc_id", split($"text", " ").as("__words"))
      .select($"doc_id", DedupOps.shingles($"__words", 2).as("sh"))
    val ex = sets.select($"doc_id", explode($"sh").as("g"))
    val dfreq = ex.groupBy($"g")
      .agg(count_distinct($"doc_id").as("df"))
    ex.join(dfreq, "g")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when($"df" >= 2, 1L).otherwise(0L)).as("n_dup_grams"))
      .withColumn("dup_coverage",
        $"n_dup_grams".cast("double") / $"n_grams".cast("double"))
      .orderBy($"doc_id")
  }
  private val q144Sql: String =
    s"""WITH sets AS (
       |  SELECT doc_id, ${DedupOps.shingleSetSql("text")} AS sh
       |  FROM documents),
       |ex AS (SELECT doc_id, unnest(sh) AS g FROM sets),
       |dfreq AS (SELECT g, COUNT(DISTINCT doc_id) AS df FROM ex GROUP BY g)
       |SELECT e.doc_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_grams,
       |  CAST(SUM(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_dup_grams,
       |  CAST(SUM(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE) AS dup_coverage
       |FROM ex e JOIN dfreq d USING (g)
       |GROUP BY e.doc_id
       |ORDER BY e.doc_id""".stripMargin

  // --------------------------------------------------------------- q166
  /** Unicode normalization as the dedup on-ramp ([[graft.functions
    * .TextNorm]] — r11 ask #3): a corpus of case/diacritic variants (each
    * document three ways — as-is, uppercased, and with precomposed
    * accents injected on a/e/o) dedups THREE WAYS WORSE raw than
    * normalized. The emitted row pair is the before/after audit: variant
    * row count, distinct texts, and distinct 2-shingles computed over the
    * RAW variants vs over `TextNorm.normalize`d text — raw sees ~3× the
    * distinct texts and shingles (every fingerprint downstream would
    * near-miss), normalized collapses each document's variants to one.
    * The oracle rebuilds the same corpus and pipeline on DuckDB's
    * `strip_accents(lower(nfc_normalize(...)))` — pinning the JDK
    * normalizer byte-exact against utf8proc on the Latin range.
    *
    * Scale: normalize is a codegen'd per-row kernel (ASCII fast-path,
    * no shuffle); the aggregates are two-phase distincts. */
  private val q166: Q = (s, dir) => {
    import s.implicits._
    import graft.functions.TextNorm
    val d = docs(s, dir)
    val accented = replace(replace(replace($"text",
      lit("a"), lit("á")), lit("e"), lit("é")), lit("o"), lit("ó"))
    val v = d.select($"text")
      .unionAll(d.select(upper($"text").as("text")))
      .unionAll(d.select(accented.as("text")))
    def metrics(kind: String, f: DataFrame): DataFrame = {
      val m = f.agg(count(lit(1)).cast("long").as("n_rows"),
        countDistinct($"text").cast("long").as("distinct_texts"))
      val sh = f.select(explode(DedupOps.shingleSet($"text", 2)).as("sh"))
        .agg(countDistinct($"sh").cast("long").as("distinct_shingles"))
      m.crossJoin(sh) // 1-row × 1-row (PlanAuditSpec-allowlisted)
        .select(lit(kind).as("kind"), $"n_rows", $"distinct_texts",
          $"distinct_shingles")
    }
    metrics("raw", v)
      .unionAll(metrics("normalized",
        v.select(TextNorm.normalize($"text").as("text"))))
      .orderBy($"kind")
  }
  private val q166Sql = {
    val norm = graft.functions.TextNorm.normalizeSql("text")
    def block(src: String) =
      s"""(SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         |   CAST(COUNT(DISTINCT text) AS BIGINT) AS distinct_texts
         | FROM $src),
         |(SELECT CAST(COUNT(DISTINCT sh) AS BIGINT) AS distinct_shingles
         | FROM (SELECT unnest(${DedupOps.shingleSetSql("text")}) AS sh
         |       FROM $src))""".stripMargin
    s"""WITH v AS (
       |  SELECT text FROM documents
       |  UNION ALL SELECT upper(text) FROM documents
       |  UNION ALL SELECT
       |    replace(replace(replace(text, 'a', 'á'), 'e', 'é'), 'o', 'ó')
       |  FROM documents),
       |nv AS (SELECT $norm AS text FROM v)
       |SELECT 'normalized' AS kind, n_rows, distinct_texts,
       |  distinct_shingles
       |FROM ${block("nv")}
       |UNION ALL
       |SELECT 'raw', n_rows, distinct_texts, distinct_shingles
       |FROM ${block("v")}
       |ORDER BY kind""".stripMargin
  }

  // --------------------------------------------------------------- q197
  /** JSONL corpus ingest with a dead-letter channel
    * ([[graft.sources.JsonlCorpus]]): the documents table is serialized
    * to line-delimited JSON with every 97th record deterministically
    * truncated mid-object (an unbalanced brace — always malformed), the
    * corpus is read back through the schema-on-read parser, and the
    * report pins BOTH channels: good-row count, char-mass and id
    * checksums (a row that leaked to the wrong channel, a field that
    * round-tripped wrong, or a dead letter that vanished all
    * hash-mismatch) plus the dead-letter count.
    *
    * Scale: one text scan, `from_json` row-local, no shuffle on either
    * channel — the Common-Crawl on-ramp costs a parallel read. */
  private val q197: Q = (s, dir) => {
    import s.implicits._
    val root = SinkOps.freshScratch("graft_q197", dir)
    val jl = root + "/corpus.jsonl"
    Tables(s, dir, "documents")
      .withColumn("j", to_json(struct($"doc_id", $"lang", $"n_chars")))
      .select(when($"doc_id" % 97 === 0,
        expr("substring(j, 1, CAST(length(j) / 2 AS INT))"))
        .otherwise($"j").as("value"))
      .write.text(jl)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("lang",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_chars",
        org.apache.spark.sql.types.LongType)))
    val good = graft.sources.JsonlCorpus.read(s, jl, schema)
      .agg(count(lit(1)).cast("long").as("n_rows"),
        sum($"n_chars").cast("long").as("sum_chars"),
        sum($"doc_id").cast("long").as("sum_ids"),
        countDistinct($"lang").cast("long").as("n_langs"))
      .select(lit("good").as("channel"), $"n_rows", $"sum_chars",
        $"sum_ids", $"n_langs")
    val dead = graft.sources.JsonlCorpus.deadLetters(s, jl, schema)
      .agg(count(lit(1)).cast("long").as("n_rows"))
      .select(lit("dead").as("channel"), $"n_rows",
        lit(0L).as("sum_chars"), lit(0L).as("sum_ids"),
        lit(0L).as("n_langs"))
    good.union(dead).orderBy($"channel")
  }
  private val q197Sql =
    """SELECT 'dead' AS channel, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(0 AS BIGINT) AS sum_chars, CAST(0 AS BIGINT) AS sum_ids,
      |  CAST(0 AS BIGINT) AS n_langs
      |FROM documents WHERE doc_id % 97 = 0
      |UNION ALL
      |SELECT 'good', CAST(COUNT(*) AS BIGINT),
      |  CAST(SUM(n_chars) AS BIGINT), CAST(SUM(doc_id) AS BIGINT),
      |  CAST(COUNT(DISTINCT lang) AS BIGINT)
      |FROM documents WHERE doc_id % 97 <> 0
      |ORDER BY channel""".stripMargin

  // --------------------------------------------------------------- q204
  /** Bigram-LM quality scoring — the conditional upgrade of q75's
    * unigram filter (the CCNet/KenLM perplexity-filter shape, here with
    * an add-one-smoothed bigram model trained on the corpus itself):
    * per document, the mean of ln((c(w₁w₂)+1) / (c(w₁·)+V)) over its
    * token bigrams, where c(w₁·) counts w₁'s occurrences AS A CONTEXT
    * and V is the corpus vocabulary — a document of individually-common
    * but incoherently-ordered tokens scores low where q75 scores it
    * high, which is exactly what the conditional model adds. Each
    * per-bigram logp rounds to 6 dp and sums in DECIMAL(18,6) (q75's
    * order-free recipe), so the score is engine-exact.
    *
    * Scale: bigram construction is a shuffle-free projection off the
    * hoisted token array (documented interpreted-HOF cost, PLANS.md);
    * the model is two count aggregates — bigram-vocabulary-sized, not
    * corpus-sized — joined back to the bigram stream (broadcast-sized
    * on a bounded vocabulary, plain hash joins on an open one: no hint
    * is forced); docs with <2 tokens drop in both engines. */
  private val q204: Q = (s, dir) => {
    import s.implicits._
    val withTk = docs(s, dir).select($"doc_id", toks.as("tk"))
      .filter(size($"tk") >= 2)
    val bi = withTk.select($"doc_id", explode(expr(
        "transform(sequence(1, size(tk) - 1)," +
          " i -> concat_ws(' ', tk[i-1], tk[i]))")).as("bg"))
      .withColumn("ctx", split($"bg", " ").getItem(0))
    val cb = bi.groupBy($"bg").agg(count(lit(1)).as("cb"))
    val cu = bi.groupBy($"ctx").agg(count(lit(1)).as("cu"))
    val v = docs(s, dir).select(explode(toks).as("tok"))
      .agg(countDistinct($"tok").as("v"))
    val logp = round(log(($"cb" + 1).cast("double")
        / ($"cu" + $"v").cast("double")), 6)
      .cast("decimal(18,6)")
    bi.join(cb, "bg").join(cu, "ctx").crossJoin(broadcast(v))
      .groupBy($"doc_id")
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        (sum(logp).cast("double") / count(lit(1))).as("avg_logp"))
      .select($"doc_id", $"n_bigrams", $"avg_logp",
        ($"avg_logp" >= -3.4).as("keep"))
      .orderBy($"doc_id")
  }
  private val q204Sql =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |bi AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(tk)),
      |    i -> tk[i] || ' ' || tk[i+1])) AS bg
      |  FROM t),
      |b2 AS (SELECT doc_id, bg, string_split(bg, ' ')[1] AS ctx FROM bi),
      |cb AS (SELECT bg, COUNT(*) AS cb FROM b2 GROUP BY bg),
      |cu AS (SELECT ctx, COUNT(*) AS cu FROM b2 GROUP BY ctx),
      |v AS (SELECT COUNT(DISTINCT tok) AS v FROM t, UNNEST(tk) AS u(tok)),
      |lp AS (
      |  SELECT doc_id,
      |    CAST(ROUND(ln(CAST(cb.cb + 1 AS DOUBLE) / (cu.cu + v.v)), 6)
      |      AS DECIMAL(18,6)) AS logp
      |  FROM b2 JOIN cb USING (bg) JOIN cu USING (ctx) CROSS JOIN v)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |  CAST(SUM(logp) AS DOUBLE) / COUNT(*) AS avg_logp,
      |  (CAST(SUM(logp) AS DOUBLE) / COUNT(*)) >= -3.4 AS keep
      |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q210
  /** Naive-Bayes quality classifier — the discriminative upgrade of the
    * generative LM filters (q75 unigram, q204 bigram): the GPT-3 /
    * CCNet quality-filter shape (Brown et al. 2020 Appendix A; Wenzek
    * et al. 2020), where a classifier trained "curated reference vs
    * everything else" scores the whole corpus and the keep decision is
    * the class log-odds. The reference slice here is a deterministic
    * source subset (src0-src3 — the "WebText side"); the model is
    * add-one-smoothed per-class unigram likelihoods over the shared
    * vocabulary, and each document scores the mean per-token
    * log-likelihood-ratio ln P(w|ref) − ln P(w|rest), keep at the
    * natural equal-prior NB boundary 0. A doc of tokens that skew
    * toward the curated slice's vocabulary keeps; q75/q204 cannot
    * express this — they score fluency against ONE corpus-wide model,
    * not closeness to a curated distribution.
    *
    * Determinism: per-token LLRs round to 6 dp and sum in
    * DECIMAL(18,6) (q75's order-free recipe), so the score is
    * engine-exact.
    *
    * Scale: the model is ONE vocabulary-sized conditional aggregate
    * (both class counts in one pass — the corpus is scanned once to
    * train); totals are a second aggregate over the vocab frame, not
    * the corpus; scoring joins the token stream against the vocab
    * frame (broadcast-sized on a bounded vocabulary, plain hash join
    * on an open one: no hint forced, q204's policy). At 100 TB:
    * train = one scan + vocab-sized state, score = one scan + one
    * join — no corpus-sized shuffle beyond the per-doc aggregate. */
  private val nbRefSrcs = Seq("src0", "src1", "src2", "src3")
  private val q210: Q = (s, dir) => {
    import s.implicits._
    val tokStream = docs(s, dir)
      .select($"doc_id", $"source", explode(toks).as("tok"))
    val model = tokStream.groupBy($"tok").agg(
      sum(when($"source".isin(nbRefSrcs: _*), 1L).otherwise(0L)).as("cp"),
      sum(when($"source".isin(nbRefSrcs: _*), 0L).otherwise(1L)).as("cn"))
    NbQuality.score(docs(s, dir), model).orderBy($"doc_id")
  }
  private val nbRefSqlIn = nbRefSrcs.map(s => s"'$s'").mkString(", ")
  /** shared with q214 (SinkOps): the incrementally-maintained model must
    * score identically to this full retrain. */
  private[operators] val q210Sql =
    s"""WITH toks AS (
       |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
       |  FROM documents),
       |model AS (
       |  SELECT tok,
       |    SUM(CASE WHEN source IN ($nbRefSqlIn) THEN 1 ELSE 0 END) AS cp,
       |    SUM(CASE WHEN source IN ($nbRefSqlIn) THEN 0 ELSE 1 END) AS cn
       |  FROM toks GROUP BY tok),
       |tot AS (SELECT SUM(cp) AS np, SUM(cn) AS nn, COUNT(*) AS v
       |  FROM model),
       |lp AS (
       |  SELECT doc_id,
       |    CAST(ROUND(ln(CAST(cp + 1 AS DOUBLE) / (np + v))
       |             - ln(CAST(cn + 1 AS DOUBLE) / (nn + v)), 6)
       |      AS DECIMAL(18,6)) AS llr
       |  FROM toks JOIN model USING (tok) CROSS JOIN tot)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |  CAST(SUM(llr) AS DOUBLE) / COUNT(*) AS avg_llr,
       |  (CAST(SUM(llr) AS DOUBLE) / COUNT(*)) >= 0.0 AS keep
       |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q207
  /** Persisted inverted-index lookup through the gate ([[TextIndex]]):
    * the corpus's postings land as a ManifestSink table with one entry
    * per term-hash bucket (stamped with the corpus fingerprint, q120's
    * lakehouse-index shape), and each probed term answers from a
    * bucket-pruned read of 1/16 of the index — no corpus scan at all,
    * the indexed upgrade of q171's bloom-pruned scan and the lexical
    * arm q195's RRF fusion swaps in at scale. Probes are the two most
    * frequent tokens (a deterministic choice the oracle mirrors) plus a
    * guaranteed-absent term that must return the empty posting list
    * through the same path; the in-query require pins that bucket
    * routing actually pruned. An index that drops a posting, doubles
    * one across buckets, or mis-routes a term hash-mismatches the
    * oracle's full-corpus membership recomputation.
    *
    * Scale: the lookup reads one bucket's entries planned from one
    * manifest read; build cost is one explode + one partitioned write,
    * amortized across every future lookup by the fingerprint check;
    * pure corpus appends index only the delta files
    * ([[VectorIndex.ensurePartitionedIncremental]]'s contract). */
  private val q207: Q = (s, dir) => {
    import s.implicits._
    TextIndex.ensure(s, dir, s"$dir/documents.parquet")
    val toksD = docs(s, dir).select($"doc_id",
      explode(array_distinct(split($"text", " "))).as("token"))
    val top2 = toksD.groupBy($"token").agg(count(lit(1)).as("c"))
      .orderBy($"c".desc, $"token".asc).limit(2)
      .collect().map(_.getString(0)).toSeq
    val terms = top2 :+ "zzz_absent_term"
    val b0 = s.range(1)
      .select(TextIndex.bucketCol(lit(terms.head))).head().getInt(0)
    val (kept, skipped) = graft.sinks.ManifestSink.prunedEntriesEq(
      s, TextIndex.postingsDir(dir), "bucket", b0)
    require(skipped.nonEmpty,
      s"bucket routing failed to prune: kept all ${kept.size} entries")
    terms.map { t =>
      TextIndex.lookup(s, dir, t)
        .agg(count(lit(1)).cast("long").as("n_docs"),
          coalesce(sum($"doc_id"), lit(0L)).cast("long").as("id_sum"))
        .select(lit(t).as("term"), $"n_docs", $"id_sum")
    }.reduce(_.union(_)).orderBy($"term")
  }
  private val q207Sql =
    """WITH toks AS (
      |  SELECT doc_id, unnest(list_distinct(string_split(text, ' ')))
      |    AS token
      |  FROM documents),
      |freq AS (SELECT token, COUNT(*) AS c FROM toks GROUP BY token),
      |probe AS (
      |  SELECT token FROM (
      |    SELECT token, ROW_NUMBER() OVER (ORDER BY c DESC, token ASC)
      |      AS rn
      |    FROM freq) WHERE rn <= 2
      |  UNION ALL SELECT 'zzz_absent_term'),
      |hits AS (
      |  SELECT p.token, COUNT(t.doc_id) AS n_docs,
      |    COALESCE(SUM(t.doc_id), 0) AS id_sum
      |  FROM probe p LEFT JOIN toks t ON t.token = p.token
      |  GROUP BY p.token)
      |SELECT token AS term, CAST(n_docs AS BIGINT) AS n_docs,
      |  CAST(id_sum AS BIGINT) AS id_sum
      |FROM hits ORDER BY term""".stripMargin

  // --------------------------------------------------------------- q220
  /** Per-language heavy hitters via the native [[graft.functions.SpaceSaving]]
    * aggregate — the BOUNDED-STATE swap for q32's exact top-words plan:
    * q32 shuffles every distinct token to count it, this plan builds
    * m-counter summaries map-side and ships exactly m (item, cnt, err)
    * triples per (partition, lang) — at 100 TB the token stream never
    * crosses the wire. Run here in the sketch's EXACT regime (capacity
    * 256 ≥ the corpus vocabulary), where the summary is the exact
    * frequency table and err pins at 0 — deterministic under any
    * partitioning, hash-comparable against the DuckDB GROUP BY. The
    * approximate regime's ε = n/m bounds are property-tested in
    * SpaceSavingSpec, not oracled (summary counters are arrival-order
    * dependent, like every sketch of this family). */
  private val q220: Q = (s, dir) => {
    import s.implicits._
    val t = docs(s, dir)
      .select($"lang", explode(toks).as("tok"))
      .filter($"tok" =!= "")
    // EXACT-REGIME GUARD (r14 advice, made one-pass by r15 #4): the
    // oracle equivalence holds only while every language's vocabulary
    // fits the capacity — a future corpus change pushing a language
    // past it would silently turn the Spark side into
    // arrival-order-dependent approximate counters while the DuckDB SQL
    // stays exact, surfacing as a baffling flaky hash mismatch.
    // exactSummary is the same aggregate with the sketch's own sticky
    // exactness-loss flag armed: it throws at eval the moment any
    // group's vocabulary outgrows the capacity — no separate
    // corpus-wide countDistinct pass per run. (The unguarded
    // approximate-regime production path is SpaceSaving.summary,
    // bounds per its scaladoc.)
    t.groupBy($"lang")
      .agg(graft.functions.SpaceSaving.exactSummary($"tok", 256).as("hh"))
      .select($"lang", explode(slice($"hh", 1, 20)).as("e"))
      .select($"lang", $"e.item".as("token"),
        $"e.cnt".cast("long").as("cnt"), $"e.err".cast("long").as("err"))
      .orderBy($"lang", $"cnt".desc, $"token")
  }
  private val q220Sql =
    """WITH t AS (
      |  SELECT lang, unnest(string_split(text, ' ')) AS token
      |  FROM documents),
      |f AS (
      |  SELECT lang, token, COUNT(*) AS cnt FROM t
      |  WHERE token <> '' GROUP BY 1, 2),
      |r AS (
      |  SELECT lang, token, cnt, ROW_NUMBER() OVER (
      |    PARTITION BY lang ORDER BY cnt DESC, token) AS rk
      |  FROM f)
      |SELECT lang, token, CAST(cnt AS BIGINT) AS cnt,
      |  CAST(0 AS BIGINT) AS err
      |FROM r WHERE rk <= 20
      |ORDER BY lang, cnt DESC, token""".stripMargin

  // --------------------------------------------------------------- q221
  /** CCNet-style perplexity-bucket admission (Wenzek et al., LREC 2020):
    * score every document with the corpus-trained bigram LM (q204's
    * decimal-exact kernel), rank WITHIN EACH LANGUAGE, and cut into
    * head / middle / tail terciles — CCNet's policy keeps head+middle
    * and drops the tail, which this reports per (lang, bucket) so the
    * dropped mass is visible, not silent. Ranking is (avg_logp desc,
    * doc_id) — avg_logp is one double division of an exact DECIMAL sum,
    * so the order and the NTILE cuts are engine-identical.
    *
    * Scale: the bucket stage windows over the DOC-LEVEL score frame
    * (one narrow row per document, not the token stream); at 100 TB the
    * exact per-lang NTILE sort becomes sampled tercile cuts from the
    * q78 quantile-sketch path — the admission policy is cut-agnostic,
    * the exact window is the oracled form. */
  private val q221: Q = (s, dir) => {
    import s.implicits._
    val withTk = docs(s, dir).select($"doc_id", $"lang", toks.as("tk"))
      .filter(size($"tk") >= 2)
    val bi = withTk.select($"doc_id", $"lang", explode(expr(
        "transform(sequence(1, size(tk) - 1)," +
          " i -> concat_ws(' ', tk[i-1], tk[i]))")).as("bg"))
      .withColumn("ctx", split($"bg", " ").getItem(0))
    val cb = bi.groupBy($"bg").agg(count(lit(1)).as("cb"))
    val cu = bi.groupBy($"ctx").agg(count(lit(1)).as("cu"))
    val v = docs(s, dir).select(explode(toks).as("tok"))
      .agg(countDistinct($"tok").as("v"))
    val logp = round(log(($"cb" + 1).cast("double")
        / ($"cu" + $"v").cast("double")), 6)
      .cast("decimal(18,6)")
    val scored = bi.join(cb, "bg").join(cu, "ctx").crossJoin(broadcast(v))
      .groupBy($"doc_id", $"lang")
      .agg((sum(logp).cast("double") / count(lit(1))).as("avg_logp"))
    val w = Window.partitionBy($"lang")
      .orderBy($"avg_logp".desc, $"doc_id")
    scored.withColumn("t", ntile(3).over(w))
      .withColumn("bucket", when($"t" === 1, "head")
        .when($"t" === 2, "middle").otherwise("tail"))
      .groupBy($"lang", $"bucket")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum($"doc_id").cast("long").as("sum_ids"))
      .withColumn("kept", $"bucket" =!= "tail")
      .orderBy($"lang", $"bucket")
  }
  private val q221Sql =
    """WITH t AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS tk
      |  FROM documents),
      |t2 AS (SELECT * FROM t WHERE len(tk) >= 2),
      |bi AS (
      |  SELECT doc_id, lang, unnest(list_transform(range(1, len(tk)),
      |    i -> tk[i] || ' ' || tk[i+1])) AS bg
      |  FROM t2),
      |b2 AS (SELECT doc_id, lang, bg, string_split(bg, ' ')[1] AS ctx
      |  FROM bi),
      |cb AS (SELECT bg, COUNT(*) AS cb FROM b2 GROUP BY bg),
      |cu AS (SELECT ctx, COUNT(*) AS cu FROM b2 GROUP BY ctx),
      |v AS (SELECT COUNT(DISTINCT tok) AS v
      |  FROM t, UNNEST(tk) AS u(tok)),
      |scored AS (
      |  SELECT doc_id, lang,
      |    CAST(SUM(CAST(ROUND(ln(CAST(cb.cb + 1 AS DOUBLE) / (cu.cu + v.v)),
      |      6) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_logp
      |  FROM b2 JOIN cb USING (bg) JOIN cu USING (ctx) CROSS JOIN v
      |  GROUP BY doc_id, lang),
      |bk AS (
      |  SELECT lang, doc_id,
      |    NTILE(3) OVER (PARTITION BY lang
      |      ORDER BY avg_logp DESC, doc_id) AS t
      |  FROM scored)
      |SELECT lang,
      |  CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
      |    AS bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
      |  (t <> 3) AS kept
      |FROM bk GROUP BY lang, t
      |ORDER BY lang, bucket""".stripMargin

  val queries: Map[String, Q] = Map(
    "q220_heavy_hitters" -> q220,
    "q221_ccnet_buckets" -> q221,
    "q210_nb_quality" -> q210,
    "q207_inverted_index" -> q207,
    "q204_bigram_lm" -> q204,
    "q197_jsonl_ingest" -> q197,
    "q166_normalized_dedup" -> q166,
    "q144_dup_ngram_coverage" -> q144,
    "q154_precedence_survivor" -> q154,
    "q141_vocab_coverage" -> q141,
    "q87_pii_redaction" -> q87,
    "q75_lm_quality" -> q75,
    "q66_repetition_signals" -> q66,
    "q30_text_stats" -> q30,
    "q31_lang_stats" -> q31,
    "q32_top_words" -> q32,
    "q33_lang_id" -> q33,
    "q34_quality_score" -> q34,
    "q35_fingerprint_dedup" -> q35,
    "q38_jaccard_near_dup" -> q38,
    "q39_regex_tokens" -> q39)

  val oracleSql: Map[String, String] = Map(
    "q220_heavy_hitters" -> q220Sql,
    "q221_ccnet_buckets" -> q221Sql,
    "q210_nb_quality" -> q210Sql,
    "q207_inverted_index" -> q207Sql,
    "q204_bigram_lm" -> q204Sql,
    "q197_jsonl_ingest" -> q197Sql,
    "q166_normalized_dedup" -> q166Sql,
    "q144_dup_ngram_coverage" -> q144Sql,
    "q154_precedence_survivor" -> q154Sql,
    "q141_vocab_coverage" -> q141Sql,
    "q87_pii_redaction" -> q87Sql,
    "q75_lm_quality" -> q75Sql,
    "q66_repetition_signals" -> q66Sql,
    "q30_text_stats" -> q30Sql,
    "q31_lang_stats" -> q31Sql,
    "q32_top_words" -> q32Sql,
    "q33_lang_id" -> q33Sql,
    "q34_quality_score" -> q34Sql,
    "q35_fingerprint_dedup" -> q35Sql,
    "q38_jaccard_near_dup" -> q38Sql,
    "q39_regex_tokens" -> q39Sql)
}
