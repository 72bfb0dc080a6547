package graft.operators

import graft.SparkSpec

/** q104 invariants the cross-engine hash oracle can't state on its own:
  * mass conservation bounds and run-to-run determinism of the iterative
  * fixed-point loop.
  */
class GraphOpsSpec extends SparkSpec {

  private lazy val ranks =
    GraphOps.queries("q104_nation_pagerank")(spark, sf).collect()

  test("pagerank emits one bounded rank per nation") {
    assert(ranks.length == 25)
    val scale = 1000000000000L
    val base = ((scale * 15L) / 100L) / 25L
    val rs = ranks.map(_.getLong(1))
    // every node keeps at least the teleport mass; truncating division
    // and dangling nations only ever LOSE mass, so the total stays under
    // the injected SCALE
    assert(rs.forall(r => r >= base && r <= scale))
    assert(rs.sum <= scale)
  }

  test("ranks are a deterministic function of the corpus") {
    val again =
      GraphOps.queries("q104_nation_pagerank")(spark, sf).collect()
    assert(ranks.toSeq == again.toSeq)
  }

  test("rank order is non-uniform (the flows actually moved mass)") {
    val rs = ranks.map(_.getLong(1))
    assert(rs.distinct.length > 1)
  }

  test("triangle participation: each triangle counted once per corner") {
    import spark.implicits._
    // K4 on 1..4 (four triangles, every node in three of them), a pendant
    // node 5 (edge into the clique, zero triangles), and an isolated
    // edge 6-7; edges are (p1 < p2) distinct as the kernel requires
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (6L, 7L)
    ).toDF("p1", "p2")
    val got = GraphOps.triangleParticipation(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // global count = participation / 3
    assert(got.values.sum / 3 === 4)
  }

  test("triangle kernel matches brute force on a random-ish graph") {
    import spark.implicits._
    // deterministic pseudo-random graph: 30 nodes, edge iff hash test
    val all = for {
      a <- 1L to 30L; b <- (a + 1) to 30L
      if (a * 7919 + b * 104729) % 5 == 0
    } yield (a, b)
    val edges = all.toDF("p1", "p2")
    val got = GraphOps.triangleParticipation(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val es = all.toSet
    def has(a: Long, b: Long) = es.contains(if (a < b) (a, b) else (b, a))
    val brute = (for {
      a <- 1L to 30L; b <- (a + 1) to 30L; c <- (b + 1) to 30L
      if has(a, b) && has(a, c) && has(b, c)
      n <- Seq(a, b, c)
    } yield n).groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    assert(got === brute)
  }
}
