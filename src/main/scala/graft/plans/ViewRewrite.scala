package graft.plans

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DataType, DecimalType}

/** Transparent materialized-view rewrite: an optimizer rule that answers
  * a user's grouped aggregate over a BASE table from its maintained
  * [[graft.sinks.IncrementalAgg]] state instead — the missing last step
  * of the incremental-view family (q98/q125/q126/q130/q175 keep views
  * fresh in O(delta), but until now a user had to know the view exists
  * and query it by name).
  *
  * A registration says: the parquet state at `stateDir` (schema
  * `keys..., n, sum_dec, mn, mx` — exactly [[graft.sinks
  * .IncrementalAgg.aggregate]]'s output) summarizes column `value` of
  * the base scan whose qualified root paths are `basePaths`. The rule
  * fires on `Aggregate` nodes whose child is that bare scan (optionally
  * through a column-pruning Project) and whose every output is built
  * from grouping keys plus the mergeable family the state can serve:
  *
  *   - `count(*)` / `count(lit(1))`      → `sum(n)`
  *   - `sum(value)`                      → `sum(sum_dec)` cast back
  *   - `sum(cast(value as dec(38,4)))`   → `sum(sum_dec)` (bit-exact)
  *   - `min(value)` / `max(value)`       → `min(mn)` / `max(mx)`
  *
  * Compositions rewrite transparently because matching happens per
  * [[AggregateExpression]] inside each output expression — e.g.
  * [[graft.functions.Exact.dsum]] (`cast(sum(cast(v)) as double)`) and
  * `Exact.davg` (`cast(sum(cast(v)),double) / count(1)`) both land on
  * the state with no special cases. Anything else — a `count(col)`
  * (null-sensitive where state `n` counts rows), a DISTINCT or FILTER
  * clause, a non-`value` column, a filter under the aggregate, grouping
  * keys that aren't exactly the view's — vetoes the WHOLE node and the
  * query runs against the base unchanged. Rewrite or identity, never a
  * half-translated plan.
  *
  * STALENESS SAFETY IS STRUCTURAL: registrations are keyed by the base
  * scan's qualified root-path set, and a [[graft.sinks.ManifestSink]]
  * table's path set changes on every commit (entry dirs are
  * never-reused UUIDs). A view registered at version v simply stops
  * matching the v+1 scan — a stale state can lose freshness, never
  * correctness. [[registerForSink]] re-registration after each refresh
  * is the maintenance loop's one-liner.
  *
  * EXACTNESS: `sum` is served from the state's DECIMAL(38,4)
  * accumulation — order-independent and exact wherever the decimal is
  * (integral and decimal(p≤34,s≤4) columns always; doubles whenever
  * their mass is within the decimal's range, the same contract
  * `IncrementalAgg.present` and `Exact.dsum` already document). `min`/
  * `max`/`count` are exact for any type.
  *
  * A second arm serves JOINS: [[registerJoinForView]] registers a
  * [[graft.sinks.IncrementalJoinView]] (keyed by BOTH sides' path sets
  * at the versions the view absorbed, read off the view's own header),
  * and an inner shared-key equi-join of those two scans rewrites to the
  * materialized join table — any parent (filter, ANY aggregate, window,
  * further joins over stacked views) composes on top untouched.
  * Single-side filters and extra cross-side conjuncts commute with an
  * inner join, so they are collected, remapped by name, and RE-APPLIED
  * above the view scan — filtered reads of the join serve too.
  *
  * At 100 TB this is the difference between a dashboard query reading
  * the whole fact table (or re-running a 100 TB ⋈ 100 TB join) and
  * reading the maintained result: the rewritten plan's only scan is the
  * state/view parquet. Registered through [[graft.Graft.init]] (inert
  * until a view is registered) or [[install]].
  */
object ViewRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** One registered view: base scan paths → state location + shape.
    * `statePaths` is the parquet path list of the state — one plain dir
    * for a hand-materialized state, the entry-dir list for a state kept
    * in a [[graft.sinks.ManifestSink]] table ([[graft.sinks.AggMatView]]). */
  case class Registration(basePaths: Set[String], keys: Seq[String],
      value: String, statePaths: Seq[String])

  private val registry =
    new ConcurrentHashMap[Set[String], Registration]()

  /** One registered JOIN view ([[graft.sinks.IncrementalJoinView]]):
    * both sides' scan paths at the versions the view absorbed, the
    * shared key name, and the view's own data paths. */
  case class JoinRegistration(leftPaths: Set[String],
      rightPaths: Set[String], key: String, viewPaths: Seq[String])

  private val joinRegistry =
    new ConcurrentHashMap[(Set[String], Set[String]), JoinRegistration]()

  /** Idempotently hook the rule into `spark`'s optimizer. */
  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
  }

  /** Qualify a path string the way scan rootPaths are qualified, so
    * registration-time and plan-time strings compare equal. */
  private def qualify(spark: SparkSession, p: String): String = {
    val path = new Path(p)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    fs.makeQualified(path).toString
  }

  /** Register `stateDir` (IncrementalAgg state schema) as the
    * materialization of `value` grouped by `keys` over the scan of
    * `basePaths`. Validates the state schema up front. */
  def register(spark: SparkSession, basePaths: Seq[String],
      keys: Seq[String], value: String, stateDir: String): Unit =
    registerState(spark, basePaths, keys, value, Seq(stateDir))

  /** [[register]] with the state spread over several parquet paths —
    * the entry dirs of a state kept in a manifest table. */
  def registerState(spark: SparkSession, basePaths: Seq[String],
      keys: Seq[String], value: String, statePaths: Seq[String]): Unit = {
    val st = spark.read.parquet(statePaths: _*).schema
    val need = keys ++ Seq("n", "sum_dec", "mn", "mx")
    val missing = need.filterNot(c => st.fieldNames.contains(c))
    require(missing.isEmpty,
      s"state at ${statePaths.mkString(",")} lacks columns " +
        s"${missing.mkString(",")} (have ${st.fieldNames.mkString(",")})")
    val qp = basePaths.map(qualify(spark, _)).toSet
    registry.put(qp, Registration(qp, keys, value, statePaths))
  }

  /** [[register]] against a [[graft.sinks.ManifestSink]] table's CURRENT
    * snapshot: resolves the entry dirs of the head version (the exact
    * root paths `ManifestSink.read` scans). Refuses tombstoned tables —
    * their assembled read is not a bare scan, so the rule could never
    * fire and a registration would be dead weight. Call again after the
    * view absorbs new commits to re-pin freshness. */
  def registerForSink(spark: SparkSession, sinkDir: String,
      keys: Seq[String], value: String, stateDir: String): Unit = {
    val paths = graft.sinks.ManifestSink.currentDataPaths(spark, sinkDir)
    register(spark, paths, keys, value, stateDir)
  }

  /** Register a [[graft.sinks.IncrementalJoinView]] at `viewDir` as the
    * materialization of `leftDir ⋈ rightDir` on shared-name `key` — ONE
    * call straight off the view's own header: the absorbed source
    * versions come from the view manifest, both sides' entry dirs at
    * those versions become the match key, and the view's current data
    * paths become the served scan. The same structural staleness as the
    * aggregate path: a source commit changes its path set and the match
    * silently stops; re-register after each
    * [[graft.sinks.IncrementalJoinView.refresh]]. Refuses tombstoned
    * snapshots on any of the three tables. */
  def registerJoinForView(spark: SparkSession, viewDir: String,
      leftDir: String, rightDir: String, key: String): Unit = {
    import graft.sinks.{IncrementalJoinView, ManifestSink}
    val (vL, vR) = IncrementalJoinView.sourceVersions(spark, viewDir)
    val lp = ManifestSink.dataPathsAt(spark, leftDir, vL)
      .map(qualify(spark, _)).toSet
    val rp = ManifestSink.dataPathsAt(spark, rightDir, vR)
      .map(qualify(spark, _)).toSet
    val vp = ManifestSink.currentDataPaths(spark, viewDir)
    val st = spark.read.parquet(vp: _*).schema
    require(st.fieldNames.contains(key),
      s"join view at $viewDir lacks key column '$key'")
    joinRegistry.put((lp, rp), JoinRegistration(lp, rp, key, vp))
  }

  /** Drop every registration (test isolation). */
  def clear(): Unit = { registry.clear(); joinRegistry.clear() }

  /** Drop the registration matching these base paths, if any. */
  def deregister(spark: SparkSession, basePaths: Seq[String]): Unit =
    registry.remove(basePaths.map(qualify(spark, _)).toSet)

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (registry.isEmpty && joinRegistry.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate =>
        tryRewrite(agg).getOrElse(agg)
      case j: Join =>
        tryRewriteJoin(j).getOrElse(j)
    }

  /** Serve an inner shared-key equi-join of two registered base scans
    * from the materialized join view. Single-side filters COMMUTE with
    * an inner join (σₚ(L) ⋈ R = σₚ(L ⋈ R) when p references one side),
    * and so do extra cross-side conjuncts — so instead of vetoing them,
    * collect every deterministic predicate found under the join (the
    * optimizer pushes user filters below joins before this rule runs,
    * and infers `isnotnull(key)` there too) plus any non-key join
    * conjuncts, remap them BY NAME onto the view, and re-apply them
    * above the view scan: a filtered read of the join serves from the
    * view with the filter intact. Every output attribute (both key
    * attrs — inner equi rows make them equal, the view stores the
    * single shared column) maps to the view column of the same name
    * under the original exprId, so parents — ANY aggregate, windows,
    * more joins (stacked views rewrite transitively through the
    * fixed-point batch) — compose untouched. Vetoes non-inner joins,
    * non-deterministic or subquery predicates, conditions without the
    * registered key equality, and any column the view can't supply by
    * name. */
  private def tryRewriteJoin(j: Join): Option[LogicalPlan] = {
    if (joinRegistry.isEmpty) return None
    val (l, r, cond) = j match {
      case Join(l0, r0, Inner, Some(c), _) => (l0, r0, c)
      case _ => return None
    }
    def usable(e: Expression): Boolean =
      e.deterministic && !e.exists(_.isInstanceOf[PlanExpression[_]])
    // the key equality among the conjuncts; everything else re-applies
    val conjuncts = splitConjunctivePredicates(cond)
    val (keyEqNode, keyAttr) = conjuncts.collectFirst {
      case eq @ EqualTo(a: AttributeReference, b: AttributeReference)
          if a.name == b.name &&
            ((l.outputSet.contains(a) && r.outputSet.contains(b)) ||
              (l.outputSet.contains(b) && r.outputSet.contains(a))) =>
        (eq, a)
    }.getOrElse(return None)
    val extraCond = conjuncts.filterNot(_ eq keyEqNode)
    if (!extraCond.forall(usable)) return None
    // unwrap one side: pruning / identity-alias Projects and
    // deterministic Filters over the base relation; collect predicates
    def unwrap(p: LogicalPlan,
        preds: Seq[Expression]): Option[(Set[String], Seq[Expression])] =
      p match {
        case org.apache.spark.sql.catalyst.plans.logical.Filter(c, child)
            if usable(c) =>
          unwrap(child, preds ++ splitConjunctivePredicates(c))
        case Project(pl, child) if pl.forall {
              case _: AttributeReference => true
              case Alias(x: AttributeReference, n) => n == x.name
              case _ => false
            } =>
          unwrap(child, preds)
        case other => bareScanPaths(other).map((_, preds))
      }
    val (lp, lPreds) = unwrap(l, Nil).getOrElse(return None)
    val (rp, rPreds) = unwrap(r, Nil).getOrElse(return None)
    val reg = Option(joinRegistry.get((lp, rp))).getOrElse(return None)
    if (keyAttr.name != reg.key) return None
    val spark = SparkSession.active
    val view = spark.read.parquet(reg.viewPaths: _*)
      .queryExecution.analyzed
    val viewOut = view.output.collect { case x: AttributeReference => x }
    def byName(n: String): Option[AttributeReference] =
      viewOut.find(_.name == n)
    val allPreds = lPreds ++ rPreds ++ extraCond
    val remapped = allPreds.map { p =>
      var ok = true
      val q = p.transform {
        case x: AttributeReference =>
          byName(x.name).getOrElse { ok = false; x }
      }
      if (!ok) return None
      q
    }
    val filtered = remapped.reduceOption(And).fold(view: LogicalPlan)(
      org.apache.spark.sql.catalyst.plans.logical.Filter(_, view))
    val mapped = j.output.map { o =>
      val src = byName(o.name).getOrElse(return None)
      Alias(src, o.name)(exprId = o.exprId)
    }
    Some(Project(mapped, filtered))
  }

  /** The scan under an Aggregate, looking through a pure column-pruning
    * Project (what the optimizer inserts); anything else — a Filter, a
    * computed projection, a join — is not the registered base scan. */
  private def bareScanPaths(plan: LogicalPlan): Option[Set[String]] =
    plan match {
      case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        bareScanPaths(child)
      case lr: LogicalRelation =>
        lr.relation match {
          case h: HadoopFsRelation =>
            Some(h.location.rootPaths.map(_.toString).toSet)
          case _ => None
        }
      case _ => None
    }

  private def isDec384(dt: DataType): Boolean = dt match {
    case d: DecimalType => d.precision == 38 && d.scale == 4
    case _ => false
  }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
    val paths = bareScanPaths(agg.child).getOrElse(return None)
    val reg = Option(registry.get(paths)).getOrElse(return None)

    // grouping expressions must be exactly the view's key attributes
    val groupAttrs = agg.groupingExpressions.map {
      case a: AttributeReference => a
      case _ => return None
    }
    if (groupAttrs.map(_.name).toSet != reg.keys.toSet) return None
    if (groupAttrs.map(_.name).distinct.size != groupAttrs.size) return None

    // fresh state relation per rewrite — new exprIds, safe to splice
    val spark = SparkSession.active
    val state = spark.read.parquet(reg.statePaths: _*)
      .queryExecution.analyzed
    val stateOut = state.output.collect { case a: AttributeReference => a }
    def stateAttr(name: String): Option[AttributeReference] =
      stateOut.find(_.name == name)
    // schema validated at register time; a rename since then just vetoes
    val (nA, sumA, mnA, mxA) =
      (stateAttr("n"), stateAttr("sum_dec"), stateAttr("mn"),
        stateAttr("mx")) match {
        case (Some(n), Some(s), Some(mn), Some(mx)) => (n, s, mn, mx)
        case _ => return None
      }

    val tz = Some(conf.sessionLocalTimeZone)

    /** Serve one AggregateExpression from the state, or veto. */
    def serve(ae: AggregateExpression): Option[Expression] = {
      if (ae.isDistinct || ae.filter.isDefined) return None
      ae.aggregateFunction match {
        case Count(Seq(Literal(_, _))) =>
          Some(Sum(nA).toAggregateExpression())
        case s: Sum => s.child match {
          case a: AttributeReference if a.name == reg.value =>
            Some(Cast(Sum(sumA).toAggregateExpression(), s.dataType, tz))
          case Cast(a: AttributeReference, dt, _, _)
              if a.name == reg.value && isDec384(dt) =>
            Some(Sum(sumA).toAggregateExpression())
          case _ => None
        }
        case Min(a: AttributeReference) if a.name == reg.value =>
          Some(Min(mnA).toAggregateExpression())
        case Max(a: AttributeReference) if a.name == reg.value =>
          Some(Max(mxA).toAggregateExpression())
        case _ => None
      }
    }

    val keyFor: Map[ExprId, AttributeReference] =
      groupAttrs.map(g =>
        g.exprId -> stateAttr(g.name).getOrElse(return None)).toMap

    // rewrite every output expression; any unservable piece vetoes all
    val newAggExprs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference =>
        val k = keyFor.getOrElse(a.exprId, return None)
        Alias(k, a.name)(exprId = a.exprId)
      case al @ Alias(child, name) =>
        // pre-validate: every AggregateExpression servable, every
        // reference outside one a grouping key
        val aggs = child.collect { case ae: AggregateExpression => ae }
        val served = aggs.map(ae => ae -> serve(ae).getOrElse(return None))
        val insideAgg = AttributeSet(aggs.flatMap(_.references))
        val outside = child.references.filterNot(insideAgg.contains)
        if (!outside.forall(a => keyFor.contains(a.exprId))) return None
        val servedMap = served.toMap
        val rewritten = child.transform {
          case ae: AggregateExpression if servedMap.contains(ae) =>
            servedMap(ae)
        }.transform {
          case a: AttributeReference if keyFor.contains(a.exprId) =>
            keyFor(a.exprId)
        }
        Alias(rewritten, name)(exprId = al.exprId)
      case _ => return None
    }

    Some(agg.copy(
      groupingExpressions = groupAttrs.map(g => keyFor(g.exprId)),
      aggregateExpressions = newAggExprs,
      child = state))
  }

  /** Diagnostic view of the registry (tests, dashboards). */
  def registrations: Seq[Registration] =
    registry.values.asScala.toSeq

  /** Diagnostic view of the join registry (tests, dashboards). */
  def joinRegistrations: Seq[JoinRegistration] =
    joinRegistry.values.asScala.toSeq
}
