package graft.sinks

import java.nio.file.Files

import graft.SparkSpec

class IncrementalQuantilesSpec extends SparkSpec {
  import spark.implicits._

  private def stateMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) ->
      r.getSeq[org.apache.spark.sql.Row](1).map(x =>
        (x.getLong(0), x.getLong(1), x.getDouble(2)))).toMap

  test("folded sample state is bit-identical to sampling the whole " +
      "table; quantiles match the batch estimator; rewrites refused") {
    val dir = Files.createTempDirectory("iq").toString + "/t"
    val k = 8
    def rows(ids: Range) = ids.map(i =>
      (i.toLong, if (i % 2 == 0) "a" else "b", i * 1.5))
      .toDF("id", "g", "v")
    val v0 = ManifestSink.append(rows(1 to 40), dir)
    val s0 = IncrementalQuantiles.refresh(
      spark, None, dir, -1L, v0, "g", "id", "v", k)
    val v1 = ManifestSink.append(rows(41 to 90), dir)
    val s1 = IncrementalQuantiles.refresh(
      spark, Some(s0), dir, v0, v1, "g", "id", "v", k)
    // fold == from-scratch sample of the snapshot (order-ideal merge)
    val scratch = IncrementalQuantiles.sampleState(
      ManifestSink.read(spark, dir), "g", "id", "v", k)
    assert(stateMap(s1) === stateMap(scratch))
    // every group's sample is capped at k
    stateMap(s1).values.foreach(s => assert(s.size === k))
    // presented quantiles == the q78 estimator run on the full table
    val inc = IncrementalQuantiles.present(s1, "g")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val batch = graft.operators.Relational3.sampledQuantiles(
        ManifestSink.read(spark, dir).toDF(), "g", "v", "id", k)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(inc === batch)
    // non-append history → refuse
    val v2 = ManifestSink.replace(rows(1 to 5), dir)
    intercept[IllegalArgumentException] {
      IncrementalQuantiles.refresh(
        spark, Some(s1), dir, v1, v2, "g", "id", "v", k)
    }
  }
}
