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
}
