package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class StreamingSemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  // two orthogonal cells: cent 0 along x, cent 1 along y (dim 4)
  private val cents: Array[(Long, Array[Double])] = Array(
    0L -> Array(1.0, 0.0, 0.0, 0.0),
    1L -> Array(0.0, 1.0, 0.0, 0.0))

  private def unit(v: Array[Double]): Array[Float] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(x => (x / n).toFloat)
  }

  private val xA = unit(Array(1.0, 0.02, 0.0, 0.0))   // cell 0
  private val xB = unit(Array(1.0, 0.03, 0.01, 0.0))  // cos(xA,xB) > 0.99
  private val xFar = unit(Array(1.0, 0.6, 0.0, 0.0))  // cell 0, cos < 0.9
  private val yA = unit(Array(0.01, 1.0, 0.0, 0.0))   // cell 1
  private val yB = unit(Array(0.0, 1.0, 0.02, 0.0))   // cell 1, near yA

  test("streaming semantic admission: cell-blocked cosine registry") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, Array[Float])]
    val verdicts = StreamingSemanticDedup.semanticVerdicts(
      src.toDF().toDF("doc_id", "embedding"), cents, tau = 0.99)
    val got = mutable.Map[Long, (Long, Boolean, Long)]()
    val q = verdicts.toDF().writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          got(r.getLong(0)) = (r.getLong(1), r.getBoolean(2), r.getLong(3))
        }
      }.start()
    try {
      // batch 1: one vector per cell — both admitted
      src.addData((1L, xA), (2L, yA))
      q.processAllAvailable()
      assert(got(1L) === ((0L, true, -1L)))
      assert(got(2L) === ((1L, true, -1L)))
      // batch 2, cross-batch state: doc 3 = doc 1's vector verbatim and
      // doc 4 a near-parallel variant — both rejected against doc 1; doc
      // 5 is in cell 0 but below tau — admitted; doc 6 is near yA but
      // lives in cell 1's registry, never compared with cell 0
      src.addData((3L, xA), (4L, xB), (5L, xFar), (6L, yB))
      q.processAllAvailable()
      assert(got(3L) === ((0L, false, 1L)))
      assert(got(4L) === ((0L, false, 1L)))
      assert(got(5L) === ((0L, true, -1L)))
      assert(got(6L) === ((1L, false, 2L)))
      // batch 3, within-batch contention: two copies of a fresh vector in
      // one batch — the smaller doc_id admits (replay-stable order), and
      // the duplicate points at it
      val fresh = unit(Array(1.0, -0.4, 0.0, 0.0)) // cell 0, far from xA/xFar
      src.addData((9L, fresh), (8L, fresh))
      q.processAllAvailable()
      assert(got(8L) === ((0L, true, -1L)))
      assert(got(9L) === ((0L, false, 8L)))
    } finally q.stop()
  }

  test("rejected vectors claim nothing: a later twin matches the ADMITTED cover") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, Array[Float])]
    val verdicts = StreamingSemanticDedup.semanticVerdicts(
      src.toDF().toDF("doc_id", "embedding"), cents, tau = 0.99)
    val got = mutable.Map[Long, (Boolean, Long)]()
    val q = verdicts.toDF().writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          got(r.getLong(0)) = (r.getBoolean(2), r.getLong(3))
        }
      }.start()
    try {
      src.addData((1L, xA))
      q.processAllAvailable()
      src.addData((2L, xB)) // rejected against 1, NOT added to state
      q.processAllAvailable()
      src.addData((3L, xB)) // matches the admitted cover 1, not the reject 2
      q.processAllAvailable()
      assert(got(2L) === ((false, 1L)))
      assert(got(3L) === ((false, 1L)))
    } finally q.stop()
  }

  test("routing through STORED index centroids matches the batch cell assignment") {
    // centroids loaded the way a deployment would: from the VectorIndex
    // table the batch q117 run committed for this corpus — stream and
    // batch then share one cell geometry
    graft.SparkEntry.queries("q117_ann_ivf_indexed")(spark, sf).count()
    val idx = s"${graft.operators.VectorIndex.indexRoot(sf)}/ivf_sample"
    val stored = graft.sinks.ManifestSink.read(spark, idx)
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray))
    assert(stored.length === 16)
    // batch ground truth: q82's cell column (same corpus, same sample
    // centroids, same argmax-dot tie-to-smaller-id rule)
    val batchCells = graft.SparkEntry.queries("q82_semdedup")(spark, sf)
      .select($"vec_id", $"cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // stream the first 50 corpus vectors through the admission path
    val vecs = graft.sources.Tables(spark, sf, "embeddings")
      .select($"vec_id", $"embedding").limit(50)
      .collect().map(r =>
        (r.getLong(0), r.getSeq[Float](1).toArray))
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, Array[Float])]
    val verdicts = StreamingSemanticDedup.semanticVerdicts(
      src.toDF().toDF("doc_id", "embedding"), stored, tau = 2.0) // τ>1: route only
    val cells = mutable.Map[Long, Long]()
    val q = verdicts.toDF().writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r => cells(r.getLong(0)) = r.getLong(1))
      }.start()
    try {
      src.addData(vecs.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    vecs.foreach { case (id, _) =>
      assert(cells(id) === batchCells(id),
        s"vec $id routed to a different cell than the batch assignment")
    }
  }
}
