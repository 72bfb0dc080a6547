package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Lineage.Cuttable
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Graph analytics beyond connected components (q71/q71b): weighted
  * PageRank over a graph AGGREGATED from the fact table. The pattern is
  * the scale-honest one for relational-sourced graphs: the 100 TB work is
  * collapsing the fact table into a weighted edge list (one distributed
  * aggregation); the iteration then runs over the edge list, whose size
  * is bounded by the key-pair domain, not the data volume.
  *
  * Determinism across engines comes from FIXED-POINT INTEGER arithmetic:
  * ranks are scaled longs ([[GraphOps.SCALE]]) and edge transition
  * probabilities are scaled longs ([[GraphOps.PSCALE]]), so every update
  * is integer multiply + truncating divide + exact integer sum — no
  * float accumulation order to disagree on. Spark's `div` and DuckDB's
  * `//` agree on nonnegative operands (both truncate), and all values
  * here are nonnegative. Overflow bound: r <= SCALE (total rank mass is
  * non-increasing) and p <= PSCALE, so r*p <= 1e18 < 2^63 regardless of
  * data scale; p's own product w*PSCALE stays in range for any
  * per-edge-weight below 9.2e12 events.
  */
object GraphOps {
  type Q = (SparkSession, String) => DataFrame

  /** Rank fixed-point scale (1.0 == 1e12). */
  private val SCALE = 1000000000000L

  /** Edge-probability fixed-point scale (1.0 == 1e6). */
  private val PSCALE = 1000000L

  private val ITERS = 10

  // --------------------------------------------------------------- q104
  /** Nation-to-nation trade PageRank: edges are order flows (customer's
    * nation -> supplier's nation, weighted by lineitem count), ranks the
    * damped-0.85 fixpoint after 10 iterations. Dangling nations (no
    * outgoing flow) leak their mass — the implicit-sink PageRank variant,
    * identical in both engines, chosen so the update needs no global
    * dangling-mass redistribution term.
    *
    * Scale: the 4-way join + groupBy collapses the fact table once into
    * a <= |nations|^2 edge list; edges and the per-round 25-row rank
    * frame are localCheckpoint'd (the q71 discipline: constant-size plan
    * per round, no lineage growth, no fact-table re-scan inside the
    * loop). Lineage cuts are non-replicated — executor loss mid-query
    * fails the (idempotent, retryable) query instead of recomputing;
    * see the canonical trade note in DedupOps.bandSelfJoin.
    * Each round is a tiny broadcast join + hash aggregate. The
    * only driver scalars are the node count and the derived literals. */
  private val q104: Q = (s, dir) => {
    import s.implicits._
    val li = Tables(s, dir, "lineitem").select($"l_orderkey", $"l_suppkey")
    val o = Tables(s, dir, "orders").select($"o_orderkey", $"o_custkey")
    val c = Tables(s, dir, "customer").select($"c_custkey", $"c_nationkey")
    val su = Tables(s, dir, "supplier").select($"s_suppkey", $"s_nationkey")
    val flows = li.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .join(su, $"l_suppkey" === $"s_suppkey")
      .groupBy($"c_nationkey", $"s_nationkey")
      .agg(count(lit(1)).as("w"))
      .select($"c_nationkey".as("src"), $"s_nationkey".as("dst"), $"w")
    // per-source transition probability as a scaled long; the window runs
    // over the <= |nations|^2 edge list, never the fact table. Both loop
    // inputs collapse to ONE partition before checkpointing: the rounds
    // operate on key-pair-domain-sized frames, so 32-partition shuffles
    // inside the loop would be pure scheduling overhead (measured 5.7 s
    // -> ~1.5 s for the whole query at sf0.1)
    val edges = flows
      .withColumn("out_w", sum($"w").over(Window.partitionBy($"src")))
      .selectExpr("src", "dst", s"(w * ${PSCALE}L) div out_w AS p")
      .coalesce(1).lineageCut()
    val nations = Tables(s, dir, "nation")
      .select($"n_nationkey".as("node"), $"n_name")
      .coalesce(1).lineageCut()
    val n = nations.count()
    val r0 = SCALE / n
    val base = ((SCALE * 15L) / 100L) / n
    var ranks = nations.select($"node", lit(r0).as("r"))
    for (_ <- 1 to ITERS) {
      val inflow = edges.join(ranks, edges("src") === ranks("node"))
        .selectExpr("dst", s"(r * p) div ${PSCALE}L AS c")
        .groupBy($"dst").agg(sum($"c").as("inflow"))
      ranks = nations.select($"node")
        .join(inflow, $"node" === $"dst", "left")
        .selectExpr("node",
          s"${base}L + (85L * coalesce(inflow, 0L)) div 100 AS r")
        .coalesce(1).lineageCut()
    }
    ranks.join(nations, "node")
      .select($"n_name", $"r".as("rank_fp"))
      .orderBy($"rank_fp".desc, $"n_name")
  }

  /** One unrolled oracle iteration (DuckDB disallows nothing here, but
    * aggregates inside a recursive term are engine-dependent — a chain of
    * plain CTEs is portable and exactly ITERS long). DuckDB's SUM(BIGINT)
    * widens to HUGEINT; the closing CAST narrows back losslessly because
    * every value is bounded by SCALE. */
  private def iterCte(k: Int): String =
    s"""r$k AS (
       |  SELECT nodes.node,
       |    CAST(bs.base + (85 * COALESCE(inf.c, 0)) // 100 AS BIGINT) AS r
       |  FROM nodes CROSS JOIN bs
       |  LEFT JOIN (
       |    SELECT e.dst AS node, SUM((p.r * e.p) // $PSCALE) AS c
       |    FROM e JOIN r${k - 1} p ON e.src = p.node
       |    GROUP BY e.dst) inf ON nodes.node = inf.node)""".stripMargin

  private val q104Sql =
    s"""WITH flows AS (
       |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
       |    COUNT(*) AS w
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  GROUP BY 1, 2),
       |e AS (
       |  SELECT src, dst,
       |    CAST((w * $PSCALE) // SUM(w) OVER (PARTITION BY src)
       |      AS BIGINT) AS p
       |  FROM flows),
       |nodes AS (SELECT n_nationkey AS node FROM nation),
       |bs AS (
       |  SELECT ((${SCALE} * 15) // 100) // COUNT(*) AS base,
       |    ${SCALE} // COUNT(*) AS r0
       |  FROM nodes),
       |r0 AS (
       |  SELECT node, CAST(bs.r0 AS BIGINT) AS r
       |  FROM nodes CROSS JOIN bs),
       |${(1 to ITERS).map(iterCte).mkString(",\n")}
       |SELECT n.n_name, r.r AS rank_fp
       |FROM r$ITERS r JOIN nation n ON r.node = n.n_nationkey
       |ORDER BY rank_fp DESC, n.n_name""".stripMargin

  // --------------------------------------------------------------- q112
  /** Triangle counting over a part co-occurrence graph, the third classic
    * distributed-graph kernel beside components (q71) and PageRank
    * (q104). Nodes are parts; an undirected edge connects two parts that
    * appear in the same 1995 order (the date window scales the graph
    * linearly with data while preserving per-order density — within-order
    * cliques survive any window).
    *
    * The kernel is DEGREE-ORDERED EDGE ORIENTATION — the shape that
    * survives skewed degree distributions at scale: every undirected edge
    * is directed from its (degree, id)-smaller endpoint to the larger, so
    * a node's out-degree is O(sqrt(m)) regardless of its true degree, and
    * the wedge join (out-edges ⋈ out-edges on source) is bounded by
    * Σ outdeg² ~ m^1.5 instead of the unoriented Σ deg² that explodes on
    * hub nodes. Each triangle is then found EXACTLY ONCE (at its
    * orientation-minimal vertex) by probing wedges against the oriented
    * edge set. Per-node participation re-expands the found triangles to
    * all three corners. Edge building is a within-group pair expansion
    * bounded by (items/order)², not data volume.
    *
    * Everything is exact integer counting — nothing for engines to
    * disagree on; the top-100 cut has the (count desc, part asc) total
    * order. */
  /** Per-node triangle participation of an undirected graph given as a
    * distinct (p1 < p2) edge list — the degree-ordered-orientation kernel
    * q112 runs over the co-occurrence graph. Nodes outside any triangle
    * are absent from the output. */
  def triangleParticipation(e: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    // degree table is node-domain-sized (a dimension, not a fact) —
    // broadcast both probes
    val deg = e.select($"p1".as("p")).unionAll(e.select($"p2".as("p")))
      .groupBy($"p").agg(count(lit(1)).as("d"))
    // materialize the oriented edge list ONCE: it feeds three join legs
    // (both wedge sides + the closing probe), and without pinning it the
    // whole edge build — two distincts over the fact join — re-runs per
    // leg (measured 2.4 s -> 0.7 s for the counting phase at sf0.1)
    val oriented = e
      .join(broadcast(deg.as("da")), $"p1" === $"da.p")
      .join(broadcast(deg.as("db")), $"p2" === $"db.p")
      .select(
        when($"da.d" < $"db.d" ||
          ($"da.d" === $"db.d" && $"p1" < $"p2"), $"p1").otherwise($"p2")
          .as("s"),
        when($"da.d" < $"db.d" ||
          ($"da.d" === $"db.d" && $"p1" < $"p2"), $"p2").otherwise($"p1")
          .as("t"))
      .lineageCut()
    // wedge (s; v, w): two out-edges of s, deduped by t order; the
    // closing probe finds the edge that closes the triangle
    val tri = oriented.as("x").join(oriented.as("y"),
        $"x.s" === $"y.s" && $"x.t" < $"y.t")
      .select($"x.s".as("u"), $"x.t".as("v"), $"y.t".as("w"))
      .join(oriented.as("z"), $"v" === $"z.s" && $"w" === $"z.t")
      .select($"u", $"v", $"w")
    tri.select(explode(array($"u", $"v", $"w")).as("part"))
      .groupBy($"part").agg(count(lit(1)).as("triangles"))
  }

  private val q112: Q = (s, dir) => {
    import s.implicits._
    val ip = Tables(s, dir, "lineitem").select($"l_orderkey", $"l_partkey")
      .join(Tables(s, dir, "orders")
          .filter($"o_orderdate".between("1995-01-01", "1995-12-31"))
          .select($"o_orderkey"),
        $"l_orderkey" === $"o_orderkey")
      .select($"l_orderkey".as("ok"), $"l_partkey".as("p")).distinct()
    val e = ip.as("a").join(ip.as("b"),
        $"a.ok" === $"b.ok" && $"a.p" < $"b.p")
      .select($"a.p".as("p1"), $"b.p".as("p2")).distinct()
    triangleParticipation(e)
      .orderBy($"triangles".desc, $"part")
      .limit(100)
  }

  private val q112Sql =
    """WITH ip AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'),
      |e AS (
      |  SELECT DISTINCT a.p AS p1, b.p AS p2
      |  FROM ip a JOIN ip b ON a.ok = b.ok AND a.p < b.p),
      |deg AS (
      |  SELECT p, COUNT(*) AS d
      |  FROM (SELECT p1 AS p FROM e UNION ALL SELECT p2 FROM e)
      |  GROUP BY p),
      |o AS (
      |  SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND e.p1 < e.p2)
      |              THEN e.p1 ELSE e.p2 END AS s,
      |         CASE WHEN da.d < db.d OR (da.d = db.d AND e.p1 < e.p2)
      |              THEN e.p2 ELSE e.p1 END AS t
      |  FROM e JOIN deg da ON e.p1 = da.p JOIN deg db ON e.p2 = db.p),
      |tri AS (
      |  SELECT x.s AS u, x.t AS v, y.t AS w
      |  FROM o x JOIN o y ON x.s = y.s AND x.t < y.t
      |  JOIN o z ON z.s = x.t AND z.t = y.t)
      |SELECT part, CAST(COUNT(*) AS BIGINT) AS triangles
      |FROM (SELECT u AS part FROM tri UNION ALL SELECT v FROM tri
      |      UNION ALL SELECT w FROM tri)
      |GROUP BY part
      |ORDER BY triangles DESC, part
      |LIMIT 100""".stripMargin

  val queries: Map[String, Q] = Map(
    "q104_nation_pagerank" -> q104,
    "q112_triangle_count" -> q112)

  val oracleSql: Map[String, String] = Map(
    "q104_nation_pagerank" -> q104Sql,
    "q112_triangle_count" -> q112Sql)
}
