package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupOpsSpec extends SparkSpec {
  import spark.implicits._

  // near-dup pair (one word differs), one exact dup, two unrelated docs
  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the river shore"),
    (3L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (4L, "completely different content about spark catalyst optimizer rules"),
    (5L, "unrelated text describing parquet column pruning and pushdown")
  ).toDF("doc_id", "text")

  test("minhash-LSH finds exact and near duplicates, skips unrelated") {
    val pairs = DedupOps
      .minhashNearDup(docs, "doc_id", "text", numHashes = 16, bands = 8,
        threshold = 0.8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(pairs.contains((1L, 3L))) // exact dup, jaccard 1.0
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 3L))) // near dup
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("minhash signature is identical for identical token sets") {
    val sig = DedupOps.minhashSignatures(
      docs.select($"doc_id", DedupOps.tokenSet($"text").as("t")),
      "doc_id", "t", 16)
    val rows = sig.collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(rows(1L) === rows(3L))
    assert(rows(1L) !== rows(4L))
  }

  test("codegen shingle kernel is identical to the higher-order form") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      "the quick brown fox jumps over the quick brown fox",
      "a b", "one", "", "x y z x y z x y"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .select($"doc_id", split($"text", " ").as("w"))
    for (n <- Seq(1, 2, 3)) {
      val fast = docs.select($"doc_id", DedupOps.shingles($"w", n).as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val ref = docs.select($"doc_id", DedupOps.shinglesHof($"w", n).as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(fast === ref, s"n=$n") // values AND first-occurrence order
    }
  }

  test("shingles are order-sensitive; reordered docs stop matching") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the quick brown fox jumps"), // identical
      (3L, "jumps fox brown quick the"), // same bag, reversed order
      (4L, "x")                          // shorter than a 2-shingle
    ).toDF("doc_id", "text")
    val sh = docs.select($"doc_id",
      DedupOps.shingleSet($"text", 2).as("s")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(sh(1L) === Set("the quick", "quick brown", "brown fox", "fox jumps"))
    assert(sh(1L) === sh(2L))
    assert((sh(1L) intersect sh(3L)).isEmpty) // order flip kills all shingles
    assert(sh(4L).isEmpty)
    // unigram near-dup says 1~3 are identical; shingle near-dup does not
    val uni = DedupOps.minhashNearDup(docs, "doc_id", "text",
      numHashes = 16, bands = 8, threshold = 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val shg = DedupOps.minhashNearDupTokens(docs, "doc_id",
      DedupOps.shingleSet($"text", 2), numHashes = 16, bands = 8,
      threshold = 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uni.contains((1L, 3L)))
    assert(shg === Set((1L, 2L)))
  }

  test("simhash: near-dups have small hamming distance, unrelated large") {
    val sh = DedupOps.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(3L)) === 0) // identical content
    assert(ham(sh(1L), sh(2L)) < ham(sh(1L), sh(4L)))
  }

  test("hamming column function matches bitCount") {
    val df = Seq((0x0FL, 0xF0L)).toDF("a", "b")
    assert(df.select(DedupOps.hamming($"a", $"b")).head().getInt(0) === 8)
  }

  test("hashed-bitmap tier: estimates bound exact jaccard from above") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables(spark, sf, "documents")
    val exact = DedupOps.minhashNearDup(docs, "doc_id", "text",
        threshold = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val hashed = DedupOps.minhashNearDupHashed(docs, "doc_id",
        DedupOps.tokenSet(col("text")), threshold = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // collisions only merge tokens: every exact pair survives hashing and
    // every estimate is >= the exact value (within float wiggle)
    exact.foreach { case (pair, j) =>
      assert(hashed.contains(pair), s"exact pair $pair lost by hashing")
      assert(hashed(pair) >= j - 1e-9, s"estimate below exact for $pair")
    }
    // identical-set pairs stay exactly 1.0
    exact.filter(_._2 == 1.0).keys.foreach(p => assert(hashed(p) === 1.0))
    // width 128 words = 8192 bits vs ~31-token sets: estimates stay close
    hashed.foreach { case (pair, je) =>
      exact.get(pair).foreach(j => assert(je - j <= 0.05,
        s"hashed estimate drifted ${je - j} for $pair"))
    }
  }

  test("component labels are a fixpoint: no edge crosses two components") {
    // run q71 and re-derive the candidate edges; every edge's endpoints
    // must share a component, and each component id must be its min member
    val comps = DedupOps.queries("q71_dedup_components")(spark, sf).collect()
    comps.foreach { r =>
      assert(r.getLong(0) === r.getLong(2),
        "component_id must equal the component's min doc_id")
      assert(r.getLong(1) >= 1L)
    }
    // sizes partition the corpus exactly
    val total = comps.map(_.getLong(1)).sum
    val nDocs = graft.sources.Tables(spark, sf, "documents").count()
    assert(total === nDocs)
  }

  test("two-star contraction matches label propagation on the corpus") {
    val a = DedupOps.queries("q71_dedup_components")(spark, sf).collect()
    val b = DedupOps.queries("q71b_components_twostar")(spark, sf).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
  }

  test("two-star contraction needs O(log n) rounds on a 1000-node chain") {
    // the adversarial case for label propagation: a path graph of
    // diameter 999 would take ~999 propagation rounds; the alternating
    // large-star/small-star contraction must fold it in O(log n)
    val n = 1000
    val nodes = spark.range(0, n).select($"id".as("doc_id"))
    val edges = spark.range(0, n - 1)
      .select($"id".as("a"), ($"id" + 1).as("b"))
    val (labels, rounds) = DedupOps.twoStarLabels(nodes, edges)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length === n)
    assert(got.forall(_._2 === 0L),
      s"all chain nodes must label 0, got ${got.filter(_._2 != 0L).take(5).toSeq}")
    assert(rounds <= 20,
      s"expected O(log n) ≈ ≤20 rounds on a $n-node chain, took $rounds")
  }

  test("two-star contraction handles singletons and empty edge sets") {
    val nodes = spark.range(0, 5).select($"id".as("doc_id"))
    val edges = nodes.limit(0).select($"doc_id".as("a"), $"doc_id".as("b"))
    val (labels, rounds) = DedupOps.twoStarLabels(nodes, edges)
    assert(rounds === 0)
    assert(labels.collect().forall(r => r.getLong(0) === r.getLong(1)))
  }

  test("rolling hash is order-sensitive, md5-style content hash is not needed") {
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma beta alpha"),
      (3L, "alpha beta gamma")
    ).toDF("id", "text")
    val h = df.select($"id",
      DedupOps.rollingHash(split($"text", " ")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) === h(3L))
    assert(h(1L) !== h(2L))
  }

  test("span dedup keeps each distinct span exactly once corpus-wide") {
    val out = DedupOps.queries("q83_span_dedup")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_spans"))
    }
    // the defining invariant: total kept spans == distinct spans in the
    // corpus (each survives exactly once), recomputed independently
    val distinctSpans = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", split($"text", " ").as("tk"))
      .select(explode(transform(
        sequence(lit(0), ((size($"tk") + lit(7)) / lit(8)).cast("int") - 1),
        w => array_join(slice($"tk", w * 8 + 1, lit(8)), " "))).as("span"))
      .distinct().count()
    assert(out.map(_.getAs[Long]("n_kept")).sum === distinctSpans)
    // the corpus-first document's opening span can never be a duplicate
    val first = out.minBy(_.getLong(0))
    assert(first.getAs[Long]("n_kept") >= 1)
    assert(first.getAs[String]("clean_text").nonEmpty)
  }

  test("ed-1 fuzzy join is exact: every edit type found, distance 2 excluded") {
    // 1~2 equal, 1~3 substitution, 1~4 deletion, 1~5 insertion,
    // 6 is two substitutions away from 1, 7 shares nothing
    val names = Seq(
      (1L, "customer#42"), (2L, "customer#42"), (3L, "customer#4X"),
      (4L, "customer#4"), (5L, "customer#042"), (6L, "customer#XX"),
      (7L, "supplier#99")
    ).toDF("id", "name")
    val pairs = DedupOps.fuzzyJoinEd1(names, "id", "name")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // ground truth: brute-force all pairs at <= 1 edit
    val rows = names.collect().map(r => (r.getLong(0), r.getString(1)))
    val expected = (for {
      (i, a) <- rows; (j, b) <- rows if i < j
      if org.apache.commons.text.similarity.LevenshteinDistance
        .getDefaultInstance.apply(a, b) <= 1
    } yield (i, j)).toSet
    assert(pairs === expected)
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)))
    assert(pairs.contains((1L, 4L)) && pairs.contains((1L, 5L)))
    assert(!pairs.contains((1L, 6L)) && !pairs.exists(p => p._2 == 7L))
  }

  test("incremental admission covers the new batch and is consistent") {
    val out = DedupOps.queries("q85_incremental_admission")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(out.size.toLong === total - 250) // one verdict per new doc
    assert(out.keys.forall(_ >= 250L))
    assert(out.values.exists(identity) && out.values.exists(!_))
    // batch-mode admission can only be STRICTER than full-corpus q67
    // admission restricted to the batch: a doc whose bucket set is
    // clean against corpus+batch (q67 admit, doc >= 250) must also be
    // clean against existing claims... the converse does not hold, but
    // q67-admitted new docs are exactly those first in EVERY bucket,
    // which implies no existing (smaller-id) claimant either
    val q67Admit = DedupOps.queries("q67_streaming_dedup_pin")(spark, sf)
      .collect().filter(_.getLong(0) >= 250L)
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    q67Admit.foreach { case (d, a) =>
      if (a) assert(out(d), s"doc $d admitted by q67 but rejected by q85")
    }
  }

  // ---- hot-bucket cap: one pathological band bucket must never become a
  // single quadratic reducer (block-pair decomposition, result-identical)

  test("bandSelfJoin: hot bucket decomposes into block pairs, pair-exact") {
    val banded = spark.range(50).select(
      col("id").as("__gid"), lit(0).as("__bidx"), lit(42L).as("__bhash"),
      (col("id") * 2).as("__pay"))
    val capped = DedupOps.bandSelfJoin(banded, "__gid", Seq("__pay"), 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every unordered pair exactly once, ordered, payload carried intact
    assert(capped.length === 50 * 49 / 2)
    assert(capped.toSet.size === capped.length)
    capped.foreach { case (ga, gb, pa, pb) =>
      assert(ga < gb); assert(pa === ga * 2); assert(pb === gb * 2)
    }
  }

  test("bandSelfJoin: capped equals uncapped on mixed hot/cold buckets") {
    // bucket (0,1): 30 members — hot at cap 8; bucket (1,2): 5 — cold.
    // Ids 0-4 sit in both buckets, so their pairs keep multiplicity 2
    // (one row per shared band, the contract callers' .distinct relies on).
    val rows = (0 until 30).map(i => (i.toLong, 0, 1L)) ++
      (0 until 5).map(i => (i.toLong, 1, 2L))
    val banded = rows.toDF("__gid", "__bidx", "__bhash")
    def run(cap: Int) = DedupOps.bandSelfJoin(banded, "__gid", Seq.empty, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val capped = run(8)
    assert(capped === run(Int.MaxValue))
    assert(capped.count(_ == (0L, 1L)) === 2)
  }

  test("minhash near-dup is identical under an adversarial hot bucket") {
    // 60 near-identical-but-DISTINCT docs (shared base + one unique token
    // each): every band bucket holds all 60 sets, the exact shape that
    // defeats identical-set collapse. cap=4 forces the block-pair path in
    // both verification tiers; results must match the uncapped run.
    def pairs(docs: org.apache.spark.sql.DataFrame, cap: Int) =
      DedupOps.minhashNearDupTokens(docs, "doc_id",
          DedupOps.tokenSet(col("text")), 16, 4, 0.8, maxBucket = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSeq.sorted
    // vocab 10+40=50 ≤ 62 → single-long bitmask tier (payload through join)
    val base10 = (0 until 10).map(i => s"tok$i").mkString(" ")
    val small = (0 until 40).map(i => (i.toLong, s"$base10 unique$i"))
      .toDF("doc_id", "text")
    // LSH recall is probabilistic (jaccard 10/12 → ~93% of pairs become
    // candidates with 4 bands of 4), so the contract is capped ≡ uncapped
    // plus a recall floor, not the full pair count.
    val smallCapped = pairs(small, 4)
    assert(smallCapped === pairs(small, Int.MaxValue))
    assert(smallCapped.length > 40 * 39 / 2 / 2)
    // vocab 20+60=80 > 62 → long-array bitmap tier (candidatePairs path)
    val base20 = (0 until 20).map(i => s"tok$i").mkString(" ")
    val mid = (0 until 60).map(i => (i.toLong, s"$base20 unique$i"))
      .toDF("doc_id", "text")
    val midCapped = pairs(mid, 4)
    assert(midCapped === pairs(mid, Int.MaxValue))
    assert(midCapped.length > 60 * 59 / 2 / 2)
  }

  test("lshCandidates: capped equals uncapped, with and without dedup") {
    val base = (0 until 15).map(i => s"w$i").mkString(" ")
    val docs = (0 until 30).map(i => (i.toLong, s"$base extra$i"))
      .toDF("doc_id", "text")
    val sig = DedupOps.minhashSignatures(
      docs.select($"doc_id", DedupOps.tokenSet($"text").as("t")),
      "doc_id", "t", 16)
    def run(cap: Int, dedup: Boolean) =
      DedupOps.lshCandidates(sig, "doc_id", 4, 4, dedup = dedup,
          maxBucket = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(run(4, dedup = true) === run(Int.MaxValue, dedup = true))
    assert(run(4, dedup = false) === run(Int.MaxValue, dedup = false))
  }

  test("prefixSimilarityJoin is lossless: equals the all-pairs exact join") {
    // 40 docs: 8 near-dup families (one token perturbed per member) plus
    // distinct fillers — enough overlap structure to exercise prefix
    // pruning, small enough for the quadratic reference
    val fams = (0 until 8).flatMap { f =>
      val base = (0 until 12).map(i => s"w${f}_$i")
      Seq((f * 3 + 0).toLong -> base,
        (f * 3 + 1).toLong -> (base.dropRight(1) :+ s"x$f"),
        (f * 3 + 2).toLong -> base.reverse)
    }
    val fillers = (24 until 40).map(i =>
      i.toLong -> (0 until 12).map(j => s"f${i}_$j"))
    val docs = (fams ++ fillers)
      .map { case (id, ws) => (id, ws.mkString(" ")) }
      .toDF("doc_id", "text")
    val sets = docs.select($"doc_id",
      DedupOps.shingleSet($"text", 2).as("sh"))
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select("id_a", "id_b", "n_common", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sorted
    val fast = norm(
      DedupOps.prefixSimilarityJoin(sets, "doc_id", "sh", 7, 10))
    // quadratic reference: every pair, exact Jaccard, same threshold
    val a = sets.select($"doc_id".as("id_a"), $"sh".as("sa"))
    val b = sets.select($"doc_id".as("id_b"), $"sh".as("sb"))
    val inter = size(array_intersect($"sa", $"sb")).cast("long")
    val uni = size($"sa").cast("long") + size($"sb").cast("long") - inter
    val slow = norm(a.crossJoin(b).filter($"id_a" < $"id_b")
      .select($"id_a", $"id_b", inter.as("n_common"),
        (inter.cast("double") / uni.cast("double")).as("jaccard"))
      .filter($"n_common" * 10 >= uni * 7)) // J >= 7/10, integer form
    assert(fast.nonEmpty, "fixture must produce qualifying pairs")
    assert(fast === slow)
  }

  test("containmentJoin is lossless vs the all-pairs reference, both " +
      "directions, and the hot-bucket cap is result-identical") {
    // subset structure Jaccard misses: doc 100 is a short "quote" fully
    // inside doc 0 (containment 1.0, Jaccard ~0.3); near-dup families
    // exercise the both-directions case; fillers exercise pruning
    val fams = (0 until 6).flatMap { f =>
      val base = (0 until 12).map(i => s"w${f}_$i")
      Seq((f * 2 + 0).toLong -> base,
        (f * 2 + 1).toLong -> (base.dropRight(1) :+ s"x$f"))
    }
    val quote = Seq(100L -> (0 until 5).map(i => s"w0_$i"))
    val fillers = (20 until 32).map(i =>
      i.toLong -> (0 until 12).map(j => s"f${i}_$j"))
    val sets = (fams ++ quote ++ fillers)
      .map { case (id, ws) => (id, ws.mkString(" ")) }
      .toDF("doc_id", "text")
      .select($"doc_id", DedupOps.shingleSet($"text", 2).as("sh"))
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select("inner_id", "outer_id", "n_common", "containment").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sorted
    val fast = norm(
      DedupOps.containmentJoin(sets, "doc_id", "sh", 4, 5, minSize = 3))
    // quadratic reference: every ORDERED pair, exact containment
    val base = sets.filter(size($"sh") >= 3)
    val a = base.select($"doc_id".as("inner_id"), $"sh".as("sa"))
    val b = base.select($"doc_id".as("outer_id"), $"sh".as("sb"))
    val inter = size(array_intersect($"sa", $"sb")).cast("long")
    val slow = norm(a.crossJoin(b).filter($"inner_id" =!= $"outer_id")
      .select($"inner_id", $"outer_id", inter.as("n_common"),
        (inter.cast("double") / size($"sa").cast("double"))
          .as("containment"))
      .filter($"n_common" * 5 >= size($"sa").cast("long") * 4))
    assert(fast.nonEmpty, "fixture must produce qualifying pairs")
    // the quote-inside-article pair is found (the case Jaccard misses)
    assert(fast.exists { case (in, out, _, c) =>
      in == 100L && out == 0L && c == 1.0 })
    assert(fast === slow)
    // capped decomposition path returns identical rows
    assert(fast === norm(DedupOps.containmentJoin(
      sets, "doc_id", "sh", 4, 5, minSize = 3, maxBucket = 1)))
    // the open-vocab array tier returns identical rows to the bitmap tier
    assert(fast === norm(DedupOps.containmentJoin(
      sets, "doc_id", "sh", 4, 5, minSize = 3, bitmapMaxVocab = 0L)))
  }

  test("simhashNearDupProbed: lossless vs all-pairs to Hamming 7 — " +
      "including the all-bands-spread case plain banding misses — and " +
      "the capped path is result-identical") {
    val base = 0x0000FACEB00CL & ((1L << 48) - 1)
    def flip(bits: Int*): Long = bits.foldLeft(base)((h, b) => h ^ (1L << b))
    val rows = Seq(
      0L -> base,
      1L -> flip(0, 13, 26, 39), // one flip in EVERY band: a plain
                                 // 4-band exact match has no clean band
      2L -> flip(1, 2),
      3L -> flip(0, 13, 26, 39, 1, 14, 27), // 7 flips, band 3 clean-ish
      4L -> base,                // exact dup of 0
      5L -> flip(0, 1, 2, 3, 12, 13, 14, 15, 24, 25)) // hamming 10: out
    val df = rows.toDF("doc_id", "simhash")
    def norm(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val got = norm(DedupOps.simhashNearDupProbed(df, 7))
    val slow = (for {
      (a, ha) <- rows; (b, hb) <- rows if a < b
      hm = java.lang.Long.bitCount(ha ^ hb) if hm <= 7
    } yield (a, b, hm.toLong)).sorted
    assert(slow.contains((0L, 1L, 4L)),
      "fixture must include the spread pair")
    assert(got === slow)
    // plain 4-band exact matching would DROP the spread pair: no band
    // of doc 1 equals the corresponding band of doc 0
    assert((0 until 4).forall(k =>
      ((base >> (12 * k)) & 4095) != ((flip(0, 13, 26, 39) >> (12 * k)) & 4095)))
    assert(got === norm(DedupOps.simhashNearDupProbed(df, 7, maxBucket = 1)))
  }

  test("prefixSimilarityJoin bitmap and array verify tiers are identical") {
    val docs = (0 until 30).flatMap { i =>
      val base = (0 until 10).map(j => s"w${i % 6}_$j")
      Seq((i * 2L, base.mkString(" ")),
        (i * 2 + 1L, (base.dropRight(1) :+ s"x$i").mkString(" ")))
    }.toDF("doc_id", "text")
    val sets = docs.select($"doc_id",
      DedupOps.shingleSet($"text", 2).as("sh"))
    def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sorted
    // bitmapMaxVocab = 0 forces the open-vocab array path
    val viaBitmap = norm(
      DedupOps.prefixSimilarityJoin(sets, "doc_id", "sh", 7, 10))
    val viaArrays = norm(DedupOps.prefixSimilarityJoin(
      sets, "doc_id", "sh", 7, 10, bitmapMaxVocab = 0L))
    assert(viaBitmap.nonEmpty && viaBitmap === viaArrays)
  }

  test("PPJoin positional/length filters are lossless on the shapes " +
      "they prune hardest: hub element, threshold-exact pairs with " +
      "rare-unique ordering") {
    // (a) hub: 20 docs share ONE rare-ish element R and nothing else —
    //     the bare prefix filter keeps all 190 pairs (R is in every
    //     prefix), the positional bound kills every one (overlap ≤ 1 +
    //     min suffix, far under ⌈τ·(sa+sb)/(1+τ)⌉); all non-qualifying.
    // (b) threshold-exact: |a|=|b|=9, overlap 8 → J = 8/10 = τ exactly,
    //     built so each doc's UNIQUE token is its RAREST (df=1 < df=2)
    //     — the first common element sits as LATE as possible in both
    //     lists (pa=pb=2), the positional bound's tightest qualifying
    //     case; must survive.
    // (c) near-miss twin: overlap 7 of 9/9 → J = 7/11 < τ; must prune.
    // Containment analog: inner {c1..c4,u} ⊂ outer + exact-0.8 inner.
    val hub = (0 until 20).map(i =>
      (100L + i, Seq("RHUB") ++ (0 until 9).map(j => s"h${i}_$j")))
    val thresh = (0 until 3).flatMap { f =>
      val common = (0 until 8).map(j => s"c${f}_$j")
      Seq((200L + f * 2, common :+ s"ua$f"), // J(pair) = 8/10 = 4/5
        (201L + f * 2, common :+ s"ub$f"))
    }
    val miss = {
      val common = (0 until 7).map(j => s"m$j")
      Seq((300L, common ++ Seq("na1", "na2")),
        (301L, common ++ Seq("nb1", "nb2"))) // J = 7/11 < 4/5
    }
    val rows = hub ++ thresh ++ miss
    val sets = rows.toDF("doc_id", "sh")
    def normJ(df: org.apache.spark.sql.DataFrame) = df
      .select("id_a", "id_b", "n_common", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sorted
    val a = sets.select($"doc_id".as("id_a"), $"sh".as("sa"))
    val b = sets.select($"doc_id".as("id_b"), $"sh".as("sb"))
    val inter = size(array_intersect($"sa", $"sb")).cast("long")
    val uni = size($"sa").cast("long") + size($"sb").cast("long") - inter
    val slow = normJ(a.crossJoin(b).filter($"id_a" < $"id_b")
      .select($"id_a", $"id_b", inter.as("n_common"),
        (inter.cast("double") / uni.cast("double")).as("jaccard"))
      .filter($"n_common" * 5 >= uni * 4))
    assert(slow.size === 3, "exactly the three threshold-exact pairs")
    // both verify tiers (the open tier is where the filters carry load)
    assert(normJ(DedupOps.prefixSimilarityJoin(
      sets, "doc_id", "sh", 4, 5)) === slow)
    assert(normJ(DedupOps.prefixSimilarityJoin(
      sets, "doc_id", "sh", 4, 5, bitmapMaxVocab = 0L)) === slow)

    // containment: inner exactly at 0.8 (4 of 5 inside outer), hub
    // must produce nothing, both tiers identical to all-pairs
    val crows = hub ++ Seq(
      (400L, Seq("k1", "k2", "k3", "k4", "uq")), // 4/5 = 0.8 in 401
      (401L, Seq("k1", "k2", "k3", "k4") ++ (0 until 8).map(j => s"o$j")),
      (402L, Seq("k1", "k2", "k3", "uq2", "uq3"))) // 3/5 < 0.8: prune
    val csets = crows.toDF("doc_id", "sh")
    def normC(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sorted
    val ca = csets.select($"doc_id".as("ia"), $"sh".as("sa"))
    val cb = csets.select($"doc_id".as("ib"), $"sh".as("sb"))
    val ci = size(array_intersect($"sa", $"sb")).cast("long")
    val cslow = normC(ca.crossJoin(cb).filter($"ia" =!= $"ib")
      .filter(size($"sa") >= 5)
      .select($"ia", $"ib", ci.as("n_common"),
        (ci.cast("double") / size($"sa").cast("double")).as("containment"))
      .filter($"n_common" * 5 >= size($"sa").cast("long") * 4))
    assert(cslow.exists { case (i, o, n, c) =>
      i == 400L && o == 401L && n == 4L && c == 0.8 })
    assert(normC(DedupOps.containmentJoin(
      csets, "doc_id", "sh", 4, 5, minSize = 5)) === cslow)
    assert(normC(DedupOps.containmentJoin(
      csets, "doc_id", "sh", 4, 5, minSize = 5,
      bitmapMaxVocab = 0L)) === cslow)
  }

  test("fragmented out-of-core passes are result-identical to the " +
      "single-pass plan, both operators") {
    // the q143/q151 shapes on a small corpus: every pair must land in
    // exactly one id-hash slice and the union must equal fragments = 1
    val docs = (0 until 30).flatMap { i =>
      val base = (0 until 10).map(j => s"w${i % 6}_$j")
      Seq((i * 2L, base.mkString(" ")),
        (i * 2 + 1L, (base.dropRight(1) :+ s"x$i").mkString(" ")))
    }.toDF("doc_id", "text")
    val sets = docs.select($"doc_id",
      DedupOps.shingleSet($"text", 2).as("sh"))
    def normJ(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sorted
    // open tier forced (bitmapMaxVocab = 0): fragments only applies there
    val one = normJ(DedupOps.prefixSimilarityJoin(
      sets, "doc_id", "sh", 7, 10, bitmapMaxVocab = 0L))
    assert(one.nonEmpty)
    assert(normJ(DedupOps.prefixSimilarityJoin(sets, "doc_id", "sh", 7, 10,
      bitmapMaxVocab = 0L, fragments = 3)) === one)
    val onec = normJ(DedupOps.containmentJoin(
      sets, "doc_id", "sh", 4, 5, minSize = 3, bitmapMaxVocab = 0L))
    assert(onec.nonEmpty)
    assert(normJ(DedupOps.containmentJoin(sets, "doc_id", "sh", 4, 5,
      minSize = 3, bitmapMaxVocab = 0L, fragments = 3)) === onec)
  }

  test("observed-resident resize is result-identical in BOTH replan " +
      "directions (merge and split), both operators") {
    // the r16 #3 path: auto mode re-sizes the remaining passes from the
    // measured resident footprint after pass 1. The callback below
    // ignores the measurement and forces each direction; the contract
    // under test is exactness — every pair still lands in exactly one
    // pass whatever the replan says
    val docs = (0 until 30).flatMap { i =>
      val base = (0 until 10).map(j => s"w${i % 6}_$j")
      Seq((i * 2L, base.mkString(" ")),
        (i * 2 + 1L, (base.dropRight(1) :+ s"x$i").mkString(" ")))
    }.toDF("doc_id", "text")
    val sets = docs.select($"doc_id",
      DedupOps.shingleSet($"text", 2).as("sh"))
    def normJ(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sorted
    val one = normJ(DedupOps.prefixSimilarityJoin(
      sets, "doc_id", "sh", 7, 10, bitmapMaxVocab = 0L))
    assert(one.nonEmpty)
    for (forced <- Seq(1, 2, 4, 11)) { // merge-to-one, merge, identity+, split
      assert(normJ(DedupOps.prefixSimilarityJoin(sets, "doc_id", "sh",
        7, 10, bitmapMaxVocab = 0L, fragments = 4,
        resize = Some(_ => forced))) === one, s"prefix forced=$forced")
    }
    val onec = normJ(DedupOps.containmentJoin(
      sets, "doc_id", "sh", 4, 5, minSize = 3, bitmapMaxVocab = 0L))
    assert(onec.nonEmpty)
    for (forced <- Seq(2, 9)) {
      assert(normJ(DedupOps.containmentJoin(sets, "doc_id", "sh", 4, 5,
        minSize = 3, bitmapMaxVocab = 0L, fragments = 4,
        resize = Some(_ => forced))) === onec, s"containment forced=$forced")
    }
  }

  test("replanPasses partitions the remaining slices exactly, both " +
      "directions, and sizeFragments honors an observed-resident override") {
    import DedupOps.{SliceRange, SubSlice}
    // merge/keep: ranges must tile [1, n0) contiguously, as evenly as
    // integer division allows. This branch also owns the MARGINAL
    // OVERSHOOT nIdeal ∈ (n0, 1.5·n0): round-to-nearest keeps one pass
    // per remaining slice rather than doubling via a 2-way split.
    for (n0 <- Seq(2, 5, 24);
         nIdeal <- Seq(1, 2, 3, n0 - 1, n0, n0 + 1, n0 + n0 / 3).distinct
           .filter(v => v <= n0 || math.round(v.toDouble / n0) < 2)) {
      val passes = DedupOps.replanPasses(n0, nIdeal)
      val ranges = passes.collect { case SliceRange(lo, hi) => (lo, hi) }
      assert(ranges.size === passes.size, s"n0=$n0 nIdeal=$nIdeal")
      // the remaining (n0−1)/n0 share gets its PROPORTIONAL pass count
      // (capped at one pass per slice): nIdeal is for the whole space
      // and pass 1 took 1/n0 of it
      assert(ranges.size === math.min(n0 - 1,
        math.max(1, math.ceil((n0 - 1).toDouble * nIdeal / n0).toInt)),
        s"n0=$n0 nIdeal=$nIdeal")
      assert(ranges.head._1 === 1 && ranges.last._2 === n0)
      ranges.sliding(2).foreach {
        case Seq((_, h), (l, _)) => assert(h === l); case _ => ()
      }
      val sizes = ranges.map { case (l, h) => h - l }
      assert(sizes.max - sizes.min <= 1, "even distribution")
    }
    // split: every remaining slice f gets the same full [0, m) subslice
    // set, m = round(nIdeal / n0) — nearest, not ceil, so a fractional
    // excess can't cost a full extra n0 passes
    for (n0 <- Seq(2, 5); nIdeal <- Seq(2 * n0, 3 * n0, 64)) {
      val subs = DedupOps.replanPasses(n0, nIdeal)
        .collect { case SubSlice(f, j, m) => (f, j, m) }
      val m = math.round(nIdeal.toDouble / n0).toInt
      assert(subs.toSet ===
        (for (f <- 1 until n0; j <- 0 until m) yield (f, j, m)).toSet,
        s"n0=$n0 nIdeal=$nIdeal")
    }
    // the marginal-overshoot guard, pinned: a 20% overshoot (5 → 6)
    // used to split every slice in two (8 passes); now one pass each
    assert(DedupOps.replanPasses(5, 6) ===
      (1 until 5).map(f => SliceRange(f, f + 1)))
    assert(DedupOps.replanPasses(24, 35)
      .collect { case s: SubSlice => s }.isEmpty,
      "nIdeal < 1.5*n0 must never split")
    assert(DedupOps.replanPasses(1, 7) === Nil) // no remaining slices
    // observed resident replaces the 800x-input prior, same formula:
    // x100 anchor pool/input, but a corpus whose measured blocks are
    // half the prior -> more headroom -> fewer passes; double -> spill
    // floor -> more passes. None keeps the calibration anchors intact.
    val pool96 = ((103079215104L - (300L << 20)) * 0.6).toLong
    val x100 = 62030239L
    val prior = DedupOps.sizeFragments(pool96, x100, 4600L)
    assert(prior === 24)
    assert(DedupOps.sizeFragments(pool96, x100, 4600L,
      observedResidentBytes = Some(800L * x100)) === prior,
      "observation equal to the prior must reproduce it")
    val lighter = DedupOps.sizeFragments(pool96, x100, 4600L,
      observedResidentBytes = Some(400L * x100))
    assert(lighter < prior, s"lighter corpus must merge: $lighter")
    // …but only down to the per-pass STREAM budget (a conservatism
    // bound: the ×100 anchors validated ~11-12 GiB per-pass streams;
    // a merge past that extrapolates to giant passes no run covers).
    // Even a zero-resident observation keeps ceil(stream / budget) —
    // 23 passes at ~12 GiB each, not 5 at 57 GiB:
    assert(DedupOps.sizeFragments(pool96, x100, 4600L,
      observedResidentBytes = Some(0L)) === 23,
      "the stream budget must floor the merge")
    // the r17 stretch-8 open-tier run (SURVEY §2.28), both phases
    // exactly as logged: 56 g heap (pool 34226 MiB), 63 MiB long-doc
    // corpus, passFactor 1500. Pass 1, prior: 800× = 50431 MiB
    // resident > pool → spill-floor path → 19. Observed: 1663 MiB
    // resident (prior 30× high) → the 12 GiB budget binds, not the
    // 32.5 GiB headroom → ideal total 8 (rows stayed exact, 2480).
    val pool56 = ((56L << 30) - (300L << 20)) * 6 / 10
    val long8 = 66102231L
    assert(DedupOps.sizeFragments(pool56, long8, 1500L) === 19)
    assert(DedupOps.sizeFragments(pool56, long8, 1500L,
      observedResidentBytes = Some(1663L << 20)) === 8)
    val err = new java.io.ByteArrayOutputStream()
    val heavier = Console.withErr(err) {
      DedupOps.sizeFragments(pool96, x100, 4600L, warnAt = "spec",
        observedResidentBytes = Some(2000L * x100))
    }
    assert(heavier > prior, s"heavier corpus must split: $heavier")
    assert(err.toString.contains("SPILL REGIME") &&
      err.toString.contains("observation"),
      s"spill warning must say the resident term was OBSERVED: '${err.toString}'")
  }

  test("prefixSimilarityJoin capped equals uncapped on a hot prefix") {
    // every doc shares one ultra-common shingle that lands in some
    // prefixes; the cap must not change the result set
    val docs = (0 until 25).map { i =>
      (i.toLong, s"hot hot a$i b$i c$i d$i e$i " +
        (if (i % 5 == 0) "s0 s1 s2 s3" else s"t$i u$i v$i w$i"))
    }.toDF("doc_id", "text")
    val sets = docs.select($"doc_id",
      DedupOps.shingleSet($"text", 2).as("sh"))
    def run(cap: Int) =
      DedupOps.prefixSimilarityJoin(sets, "doc_id", "sh", 3, 10, cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(run(4) === run(Int.MaxValue))
  }

  test("substringDupCoverage catches the unaligned passage q83 misses") {
    // A 10-token passage repeated at OFFSET 3 in doc 1 vs offset 0 in
    // doc 2: no 8-token boundary-aligned chunk of doc 1 equals any
    // chunk of doc 2 (the passage straddles every chunk boundary), so
    // C4-style aligned span dedup sees zero sharing — while the
    // sliding-window coverage finds the exact 10-token region on both
    // sides. This is precisely the recall Lee et al.'s suffix method
    // buys over aligned chunking.
    val passage = (0 until 10).map(i => s"p$i").mkString(" ")
    val doc1 = s"x0 x1 x2 $passage y0 y1 y2" // passage at tokens 3..12
    val doc2 = s"$passage z0 z1 z2 z3 z4 z5" // passage at tokens 0..9
    val df = Seq((1L, doc1), (2L, doc2)).toDF("doc_id", "text")

    // q83's unit: aligned 8-token chunks — provably disjoint here
    def chunks(s: String): Seq[String] =
      s.split(" ").grouped(8).map(_.mkString(" ")).toSeq
    assert(chunks(doc1).intersect(chunks(doc2)).isEmpty,
      "fixture broken: aligned chunks must not match")

    val got = DedupOps.substringDupCoverage(df, "doc_id", "text", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq.sortBy(_._1)
    // windows fully inside the passage: doc 1 p ∈ {3,4,5}, doc 2
    // p ∈ {0,1,2} — one island each, coverage exactly the 10 tokens
    assert(got === Seq((1L, 16L, 1L, 10L), (2L, 16L, 1L, 10L)))
  }

  test("substringDupCoverage: within-doc repetition and clean docs") {
    // the SAME 8 tokens twice in one doc (adjacent → one contiguous
    // region); a clean doc reports zero
    val rep = (0 until 8).map(i => s"r$i").mkString(" ")
    val df = Seq(
      (1L, s"$rep $rep tail0 tail1"),  // 16-token dup region at [0,16)
      (2L, "c0 c1 c2 c3 c4 c5 c6 c7 c8 c9")).toDF("doc_id", "text")
    val got = DedupOps.substringDupCoverage(df, "doc_id", "text", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq.sortBy(_._1)
    assert(got === Seq((1L, 18L, 1L, 16L), (2L, 10L, 0L, 0L)))
  }

  test("substringDedup keeps the canonical copy, removes the others") {
    val passage = (0 until 10).map(i => s"p$i").mkString(" ")
    val doc1 = s"x0 x1 x2 $passage y0 y1 y2" // canonical (doc 1 < doc 2)
    val doc2 = s"$passage z0 z1 z2 z3 z4 z5" // later copy — removed
    val rep = (0 until 8).map(i => s"r$i").mkString(" ")
    val df = Seq(
      (1L, doc1), (2L, doc2),
      (3L, s"$rep $rep tail0 tail1"), // within-doc: second copy removed
      (4L, "c0 c1 c2 c3 c4 c5 c6 c7 c8 c9")).toDF("doc_id", "text")
    val got = DedupOps.substringDedup(df, "doc_id", "text", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSeq.sortBy(_._1)
    assert(got === Seq(
      (1L, 16L, 0L, doc1), // canonical copy survives byte-exact
      (2L, 16L, 10L, "z0 z1 z2 z3 z4 z5"),
      (3L, 18L, 8L, s"$rep tail0 tail1"),
      (4L, 10L, 0L, "c0 c1 c2 c3 c4 c5 c6 c7 c8 c9")))
  }

  test("sizeFragments reproduces the x100 calibration anchors, warns " +
      "in the measured spill regime, and is the identity at test SFs") {
    // the ×100 anchors (SURVEY §2.27): 96 GiB heap → 57.4 GiB pool,
    // 62 MB documents parquet → containment 24, prefix-similarity 8
    val pool96 = ((103079215104L - (300L << 20)) * 0.6).toLong
    val pool64 = ((64L * (1L << 30) - (300L << 20)) * 0.6).toLong
    val x100 = 62030239L
    assert(DedupOps.sizeFragments(pool96, x100, 4600L) === 24)
    assert(DedupOps.sizeFragments(pool96, x100, 1500L) === 8)
    // the measured 2.4× spill regime (-Xmx64g): resident blocks exceed
    // the pool — the sizer must WARN and size against the floor
    val err = new java.io.ByteArrayOutputStream()
    val picked = Console.withErr(err) {
      DedupOps.sizeFragments(pool64, x100, 4600L, warnAt = "spec")
    }
    assert(picked === 47)
    assert(err.toString.contains("SPILL REGIME"),
      s"expected a spill warning, got: '${err.toString}'")
    // a test-SF corpus vanishes into the headroom: auto = 1, the plain
    // lazy plan — and no warning
    val err2 = new java.io.ByteArrayOutputStream()
    val one = Console.withErr(err2) {
      DedupOps.sizeFragments(pool96, 590472L, 4600L)
    }
    assert(one === 1)
    assert(err2.toString.isEmpty)
    // clamps: never 0, never past 64 passes
    assert(DedupOps.sizeFragments(pool96, 0L, 4600L) === 1)
    assert(DedupOps.sizeFragments(1L << 30, 1L << 30, 4600L) === 64)
  }

  test("parseFragments names the env var on a bad value and never " +
      "probes the pool unless auto is requested") {
    var probed = false
    def auto: Int = { probed = true; 24 }
    assert(DedupOps.parseFragments(None, auto) === 1)
    assert(DedupOps.parseFragments(Some("8"), auto) === 8)
    assert(DedupOps.parseFragments(Some(" 8 "), auto) === 8) // trimmed
    assert(!probed) // by-name: no pool/corpus probe for explicit values
    assert(DedupOps.parseFragments(Some("auto"), auto) === 24)
    assert(probed)
    for (bad <- Seq("Auto", "8.5", "", "-3", "0", "twelve")) {
      val e = intercept[IllegalArgumentException] {
        DedupOps.parseFragments(Some(bad), auto)
      }
      assert(e.getMessage.contains("SPARK_GRAFT_DEDUP_FRAGMENTS"),
        s"error for '$bad' must name the env var: ${e.getMessage}")
      assert(e.getMessage.contains("auto"),
        s"error for '$bad' must state accepted values: ${e.getMessage}")
    }
  }
}
