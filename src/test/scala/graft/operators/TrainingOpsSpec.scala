package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TrainingOpsSpec extends SparkSpec {
  import spark.implicits._

  test("hash sampling is deterministic and partitioning-independent") {
    val df = spark.range(0, 10000).select($"id".as("k"))
    val once = TrainingOps.hashSample(df, "k", 1000L)
      .collect().map(_.getLong(0)).toSet
    val again = TrainingOps.hashSample(df.repartition(13), "k", 1000L)
      .collect().map(_.getLong(0)).toSet
    assert(once === again) // same rows regardless of physical layout
    // ~10% within loose tolerance (hash uniformity)
    assert(once.size > 700 && once.size < 1300, s"got ${once.size}")
  }

  test("hash sampling rate is monotone in rateBp and nested") {
    val df = spark.range(0, 5000).select($"id".as("k"))
    val small = TrainingOps.hashSample(df, "k", 100L)
      .collect().map(_.getLong(0)).toSet
    val large = TrainingOps.hashSample(df, "k", 2000L)
      .collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(large)) // raising the rate only adds rows
  }

  test("feature binning: bins partition rows and are value-disjoint") {
    val out = TrainingOps.queries("q108_feature_binning")(spark, sf)
      .collect()
    val total = graft.sources.Tables(spark, sf, "events")
      .filter(col("value").isNotNull).count()
    assert(out.map(_.getAs[Long]("n_rows")).sum === total)
    // within a type, bins are ordered intervals: each bin's max stays
    // below the next bin's min (cuts from the sample really separate)
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val byBin = rows.sortBy(_.getAs[Long]("bin"))
      // bins are a strictly increasing subset of 0..3 (a middle bin may
      // be structurally empty when sampled cuts tie, e.g. tiny groups)
      val bins = byBin.map(_.getAs[Long]("bin")).toSeq
      assert(bins === bins.sorted.distinct && bins.forall(b => b >= 0L && b <= 3L),
        s"bins not a subset of 0..3: $bins")
      byBin.sliding(2).foreach {
        case Array(lo, hi) =>
          assert(lo.getAs[Double]("max_v") <= hi.getAs[Double]("min_v"))
        case _ =>
      }
    }
  }

  test("count-min estimates never undercount (CMS upper-bound property)") {
    val out = TrainingOps.queries("q64_countmin_sketch")(spark, sf).collect()
    assert(out.length === 10)
    out.foreach { r =>
      val est = r.getAs[Long]("cms_estimate")
      val exact = r.getAs[Long]("exact_count")
      assert(est >= exact, s"CMS undercounted: $est < $exact")
    }
  }

  test("sequence packing: bins are contiguous per shard and token-complete") {
    val bins = TrainingOps.queries("q73_sequence_packing")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // bin ids are dense from 0 within each shard
    bins.groupBy(_._1).foreach { case (_, rows) =>
      val ids = rows.map(_._2).sorted
      assert(ids.toSeq === (0L until ids.length).toSeq)
    }
    // token totals across bins equal the corpus token count
    import org.apache.spark.sql.functions._
    val totalTokens = graft.sources.Tables(spark, sf, "documents")
      .select(sum(size(split(col("text"), " ")).cast("long"))).head().getLong(0)
    assert(bins.map(_._4).sum === totalTokens)
  }

  test("document chunks reassemble to the original text") {
    import org.apache.spark.sql.functions._
    // stride 48 < window 64: overlapping windows; the stride-aligned
    // prefixes (first 48 tokens of each chunk, all of the last chunk)
    // concatenate back to the document
    val docs = graft.sources.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val chunks = TrainingOps.queries("q72_document_chunks")(spark, sf)
      .collect().groupBy(_.getLong(0))
    chunks.foreach { case (docId, rows) =>
      val ordered = rows.sortBy(_.getLong(1))
      val rebuilt = ordered.zipWithIndex.map { case (r, i) =>
        val toks = r.getString(3).split(" ", -1)
        if (i == ordered.length - 1) toks else toks.take(48)
      }.flatten.mkString(" ")
      assert(rebuilt === docs(docId), s"doc $docId did not reassemble")
    }
  }

  test("tf-idf ranks a distinctive term above ubiquitous ones") {
    val docs = Seq(
      (1L, "common common rare common"),
      (2L, "common common common common"),
      (3L, "common other common other")
    ).toDF("doc_id", "text").createOrReplaceTempView("tdocs")
    val toks = spark.table("tdocs")
      .select($"doc_id", explode(split($"text", " ")).as("term"))
    val tf = toks.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val n = spark.table("tdocs").agg(count(lit(1)).as("n_docs"))
    val top = tf.join(df, "term").crossJoin(broadcast(n))
      .withColumn("tfidf", $"tf".cast("double") *
        log($"n_docs".cast("double") / $"df".cast("double")))
      .filter($"doc_id" === 1L)
      .orderBy($"tfidf".desc, $"term")
      .select($"term").head().getString(0)
    assert(top === "rare") // df=1 beats the df=3 'common' despite tf=3
  }
  test("bm25 top-10: ranks are total, scores ordered, docs match query") {
    val out = TrainingOps.queries("q86_bm25_ranking")(spark, sf).collect()
    assert(out.map(_.getAs[Long]("rank")).toSeq === (1L to 10L))
    val scores = out.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("bm25"))
    // ordered by score desc (ties broken by doc_id, so non-strict here)
    scores.sliding(2).foreach { case Array(a, b) => assert(a >= b) }
    assert(scores.forall(_ > 0.0))
    out.foreach { r =>
      val nt = r.getAs[Long]("n_terms")
      assert(nt >= 1 && nt <= 3) // only the 3 query terms can contribute
    }
    // every ranked doc really contains at least one query term
    val ranked = out.map(_.getAs[Long]("doc_id")).toSet
    val withTerm = graft.sources.Tables(spark, sf, "documents")
      .select($"doc_id", explode(split($"text", " ")).as("term"))
      .filter($"term".isin("hash", "join", "filter"))
      .select($"doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(ranked.subsetOf(withTerm))
  }

  test("bm25 saturates in tf and rewards rarity") {
    // two-term corpus built so 'rare' appears in one doc only: that doc
    // must outrank a doc with MORE total query-term occurrences of the
    // ubiquitous term — idf dominates saturated tf (the BM25 point)
    val docs = Seq(
      (1L, "common rare pad pad"),
      (2L, "common common common common"),
      (3L, "common pad common pad")
    ).toDF("doc_id", "text")
    val toks = docs.select($"doc_id", explode(split($"text", " ")).as("term"))
    val dl = toks.groupBy($"doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum($"dl").as("tot_dl"))
    val tfq = toks.filter($"term".isin("common", "rare"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val dfq = tfq.groupBy($"term").agg(count(lit(1)).as("df"))
    val avgdl = $"tot_dl".cast("double") / $"n_docs".cast("double")
    val idf = log(lit(1.0) +
      (($"n_docs" - $"df").cast("double") + lit(0.5)) /
        ($"df".cast("double") + lit(0.5)))
    val contrib = idf * ($"tf".cast("double") * lit(2.2)) /
      ($"tf".cast("double") + lit(1.2) *
        (lit(0.25) + lit(0.75) * ($"dl".cast("double") / avgdl)))
    val byDoc = tfq.join(dfq, "term").join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .groupBy($"doc_id").agg(sum(contrib).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(byDoc(1L) > byDoc(2L), s"rarity must beat saturated tf: $byDoc")
    assert(byDoc(2L) > byDoc(3L), s"higher tf must beat lower tf: $byDoc")
  }

  test("curation pipeline: stages compose monotonically and cleanly") {
    val out = TrainingOps.queries("q81_curation_pipeline")(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // held-out source never survives into the training corpus
    assert(rows.forall(_.getAs[String]("source") != "src0"))
    // split labels are exactly the 90/5/5 partition values
    assert(rows.map(_.getAs[String]("split")).toSet.subsetOf(
      Set("train", "val", "test")))
    // quality gates actually hold on every emitted row
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      assert(n >= 20 && n <= 1000, s"n_tokens gate violated: $n")
      assert(r.getAs[Double]("ttr") >= 0.45)
    }
    val q81Ids = rows.map(_.getAs[Long]("doc_id")).toSet
    // no contaminated doc survives: every q81 doc is absent from q74's
    // contaminated list
    val contaminated = DedupOps.queries("q74_decontamination")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(q81Ids.intersect(contaminated).isEmpty)
  }

  test("mixture sampling: rate-0 excludes, rate-10000 keeps all, audit adds up") {
    val out = TrainingOps.queries("q84_mixture_sample")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (r0, n0, k0) = out("src0")
    assert(r0 === 0L && k0 === 0L && n0 > 0L) // held-out: never sampled
    val (r1, n1, k1) = out("src1")
    assert(r1 === 10000L && k1 === n1) // keep-all domain keeps everything
    out.values.foreach { case (_, n, k) => assert(k >= 0L && k <= n) }
    // deterministic: a second run returns the identical audit
    val again = TrainingOps.queries("q84_mixture_sample")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(again === out)
  }

  test("bpeMerges learns the hand-computed merge sequence with " +
      "deterministic tie-breaks") {
    import spark.implicits._
    // wc: key:3 keg:1 egg:1 → r1 (k,e,4); r2 (ke,y,3); r3 tie at 1
    //   among e/g, g/g, ke/g → lex picks (e,g); r4 tie eg/g vs ke/g →
    //   (eg,g); r5 (ke,g,1)
    val docs = Seq("key key key keg egg").toDF("text")
    val merges = TrainingOps.bpeMerges(docs, "text", 5)
    assert(merges === Seq(
      (1, "k", "e", "ke", 4L), (2, "ke", "y", "key", 3L),
      (3, "e", "g", "eg", 1L), (4, "eg", "g", "egg", 1L),
      (5, "ke", "g", "keg", 1L)))
  }

  test("bpeMerges fold is left-to-right non-overlapping on runs") {
    import spark.implicits._
    // 'aaaa' x2: r1 counts the overlapping a/a pairs (3 per word, 6
    // total — standard BPE statistics) but merges only non-overlapping
    // occurrences → aa/aa; r2 fuses those → one 'aaaa' symbol
    val docs = Seq("aaaa aaaa").toDF("text")
    val merges = TrainingOps.bpeMerges(docs, "text", 2)
    assert(merges === Seq(
      (1, "a", "a", "aa", 6L), (2, "aa", "aa", "aaaa", 2L)))
  }

  test("bpeMerges stops early when no pairs remain") {
    import spark.implicits._
    // single-char words have no pairs at all → zero merges, no crash
    assert(TrainingOps.bpeMerges(Seq("a b c").toDF("text"), "text", 3)
      === Seq())
    // 'ab' fuses in round 1; round 2 finds nothing and stops
    assert(TrainingOps.bpeMerges(Seq("ab ab").toDF("text"), "text", 3)
      === Seq((1, "a", "b", "ab", 2L)))
  }
}
