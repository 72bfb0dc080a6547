package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private def reference(vals: Seq[Long], k: Int): (Long, Long) = {
    val distinct = vals.distinct.sorted.take(k)
    (distinct.size.toLong, if (distinct.isEmpty) 0L else distinct.last)
  }

  test("sketch equals distinct-sort-take reference, any partitioning") {
    val vals = (1 to 5000).map(i => (i * 2654435761L) % 1000003L)
    for (parts <- Seq(1, 7, 32)) {
      val got = vals.toDF("h").repartition(parts)
        .agg(KmvSketch.sketch($"h", 64).as("sk"))
        .select($"sk.n_sketch", $"sk.kth")
        .head()
      assert((got.getLong(0), got.getLong(1)) === reference(vals, 64),
        s"parts=$parts")
    }
  }

  test("fewer distinct values than k: sketch holds them all") {
    val vals = Seq(5L, 3L, 5L, 3L, 9L)
    val got = vals.toDF("h").agg(KmvSketch.sketch($"h", 64).as("sk"))
      .select($"sk.n_sketch", $"sk.kth").head()
    assert(got.getLong(0) === 3L)
    assert(got.getLong(1) === 9L)
  }

  test("nulls are ignored; duplicates never inflate the sketch") {
    val df = Seq(Some(1L), None, Some(1L), Some(2L), None).toDF("h")
    val got = df.agg(KmvSketch.sketch($"h", 4).as("sk"))
      .select($"sk.n_sketch", $"sk.kth").head()
    assert(got.getLong(0) === 2L)
    assert(got.getLong(1) === 2L)
  }

  test("grouped sketches estimate per-group cardinality") {
    val df = spark.range(0, 10000).select(
      ($"id" % 4).as("g"),
      PortableHash.tokenHashP(($"id" % 1000).cast("string")).as("h"))
    val est = df.groupBy($"g").agg(KmvSketch.sketch($"h", 32).as("sk"))
      .select($"g",
        (lit(31.0 * PortableHash.P) / $"sk.kth").as("est"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // each group sees 250 distinct ids; KMV(32) should land within ±40%
    est.values.foreach(e => assert(e > 150 && e < 350, est))
  }
}
