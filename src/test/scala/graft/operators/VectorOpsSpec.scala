package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  test("codegen SequentialDot is bit-identical to the higher-order form") {
    val e = graft.sources.Tables(spark, sf, "embeddings")
    val a = e.select($"vec_id", $"embedding")
    val b = e.select($"vec_id".as("id2"), $"embedding".as("e2"))
    val pairs = a.join(b, $"vec_id" % 7 === $"id2" % 7 && $"vec_id" < $"id2")
      .limit(2000)
    val diff = pairs.select(
      (VectorOps.dot($"embedding", $"e2") -
        VectorOps.dotHof($"embedding", $"e2")).as("d"))
      .filter($"d" =!= 0.0).count()
    assert(diff === 0L)
  }

  test("mismatched array lengths yield null, matching the zip_with form") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f)))
      .toDF("a", "b")
    val native = df.select(VectorOps.dot($"a", $"b")).head()
    val hof = df.select(VectorOps.dotHof($"a", $"b")).head()
    assert(native.isNullAt(0) && hof.isNullAt(0))
  }

  test("dot product matches a hand computation") {
    val df = Seq((1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("id", "a", "b")
    val d = df.select(VectorOps.dot($"a", $"b")).head().getDouble(0)
    assert(d === 32.0)
  }

  test("cosine of identical vectors is 1.0") {
    val df = Seq((1L, Array(0.6f, 0.8f))).toDF("id", "a")
    val c = df.select(VectorOps.cosine($"a", $"a")).head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("LSH buckets: identical vectors share a bucket, clusters separate") {
    // 3 well-separated clusters, zero noise: bucket is a pure function of
    // the vector, so cluster members MUST share it; distinct directions
    // should not all collapse into one bucket.
    def mk(axis: Int): Array[Float] =
      Array.tabulate(64)(i => if (i == axis) 1.0f else 0.0f)
    val rows = (0 until 30).map { i =>
      (i.toLong, (i % 3).toLong, mk((i % 3) * 20))
    }
    val df = rows.toDF("vec_id", "cluster", "embedding")
    val bucketed = df.withColumn("bucket", VectorOps.lshBucket($"embedding"))
      .select($"cluster", $"bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val byCluster = bucketed.groupBy(_._1).map { case (c, xs) =>
      c -> xs.map(_._2).distinct
    }
    assert(byCluster.values.forall(_.size == 1))
    assert(byCluster.values.flatten.toSet.size >= 2)
  }

  test("ANN within-bucket results are a subset of brute-force candidates") {
    val ann = VectorOps.queries("q42_ann_lsh_bucketed")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = graft.sources.Tables(spark, sf, "embeddings").count()
    assert(ann.nonEmpty && ann.size <= 10 * 5)
    assert(all === 500)
  }

  test("IVF cells partition the corpus; probed search ranks consistently") {
    val ivf = VectorOps.queries("q58_ann_ivf_cells")(spark, sf).collect()
    assert(ivf.nonEmpty && ivf.length <= 10 * 5)
    // per query: ranks are 1..k and dots are non-increasing in rank
    ivf.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getLong(3))
      assert(byRank.map(_.getLong(3)).toSeq === (1L to byRank.length).toSeq)
      val dots = byRank.map(_.getDouble(2)).toSeq
      assert(dots === dots.sorted.reverse)
    }
    // IVF top-1 should usually agree with brute force (recall sanity):
    // require agreement for at least half the queries on this corpus
    val bf = VectorOps.queries("q41_knn_brute_force")(spark, sf).collect()
      .filter(_.getLong(3) == 1L).map(r => r.getLong(0) -> r.getLong(1)).toMap
    val top1 = ivf.filter(_.getLong(3) == 1L)
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agree = top1.count { case (q, n) => bf.get(q).contains(n) }
    assert(agree * 2 >= top1.size, s"IVF top-1 agreement $agree/${top1.size}")
  }

  test("Lloyd-refined IVF keeps the output contract and is deterministic") {
    val a = VectorOps.queries("q58b_ann_ivf_lloyd")(spark, sf).collect()
    assert(a.nonEmpty && a.length <= 10 * 5)
    a.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getLong(3))
      assert(byRank.map(_.getLong(3)).toSeq === (1L to byRank.length).toSeq)
      val dots = byRank.map(_.getDouble(2)).toSeq
      assert(dots === dots.sorted.reverse)
    }
    // the refinement is decimal-exact → re-running yields IDENTICAL rows
    // (bitwise, including the double dot column) — the property that makes
    // it oracle-able at all
    val b = VectorOps.queries("q58b_ann_ivf_lloyd")(spark, sf).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    // refined recall sanity, same bar as the unrefined variant
    val bf = VectorOps.queries("q41_knn_brute_force")(spark, sf).collect()
      .filter(_.getLong(3) == 1L).map(r => r.getLong(0) -> r.getLong(1)).toMap
    val top1 = a.filter(_.getLong(3) == 1L)
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agree = top1.count { case (q, n) => bf.get(q).contains(n) }
    assert(agree * 2 >= top1.size,
      s"Lloyd IVF top-1 agreement $agree/${top1.size}")
  }

  test("q77 recall@5 equals independent set-math over the underlying queries") {
    def pairs(q: String): Set[(Long, Long)] =
      VectorOps.queries(q)(spark, sf).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toSet
    val gt = pairs("q41_knn_brute_force")
    val expected = Map(
      "lsh" -> pairs("q42_ann_lsh_bucketed"),
      "lsh_multi" -> pairs("q42b_ann_lsh_multitable"),
      "ivf" -> pairs("q58_ann_ivf_cells"),
      "ivf_lloyd" -> pairs("q58b_ann_ivf_lloyd"),
      "pq" -> pairs("q94_ann_pq"),
      "sq8" -> pairs("q185_ann_sq8"))
    val queryIds = gt.map(_._1)
    val out = VectorOps.queries("q77_ann_recall")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out.size === 6 * queryIds.size)
    for (m <- expected.keys; q <- queryIds) {
      val hits = (expected(m) & gt).count(_._1 == q).toLong
      val (gotHits, gotRecall) = out((m, q))
      assert(gotHits === hits, s"method=$m query=$q")
      assert(gotRecall === hits / 5.0, s"method=$m query=$q")
      assert(gotRecall >= 0.0 && gotRecall <= 1.0)
    }
    // int8 reconstruction is near-exact: sq8 must dominate pq's recall
    def panelHits(m: String): Long =
      queryIds.toSeq.map(q => out((m, q))._1).sum
    assert(panelHits("sq8") >= panelHits("pq"),
      s"sq8 recall ${panelHits("sq8")} below pq ${panelHits("pq")}")
    // the refined IVF index must not LOSE recall vs its unrefined seed
    // in aggregate — the tuning property this gate exists to protect
    def total(m: String) = out.collect { case ((`m`, _), (h, _)) => h }.sum
    assert(total("ivf_lloyd") >= total("ivf") - 2,
      s"Lloyd refinement collapsed recall: ${total("ivf_lloyd")} vs ${total("ivf")}")
  }

  test("q82 semdedup: verdicts are consistent and representatives are kept") {
    val rows = VectorOps.queries("q82_semdedup")(spark, sf).collect()
    // every corpus vector appears exactly once
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(rows.length.toLong === n)
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    rows.foreach { r =>
      val keep = r.getBoolean(2)
      val dupOf = if (r.isNullAt(3)) None else Some(r.getLong(3))
      // keep XOR has-representative
      assert(keep === dupOf.isEmpty)
      dupOf.foreach { d =>
        assert(d < r.getLong(0), "representative must be the smaller id")
        // the representative lives in the same cell
        assert(byId(d).getLong(1) === r.getLong(1))
        // and was itself kept OR was dropped for a yet-smaller doc:
        // min-id-per-pair does not chain, but the representative must
        // exist in the corpus
        assert(byId.contains(d))
      }
    }
    // at least one doc kept per cell (the cell minimum can never drop)
    val cells = rows.map(_.getLong(1)).toSet
    val keptCells = rows.filter(_.getBoolean(2)).map(_.getLong(1)).toSet
    assert(cells === keptCells)
  }
}
