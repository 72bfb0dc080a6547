package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, GenericInternalRow, JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.expressions.{Ascending, NullsFirst}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** As-of join as a first-class operator: custom LogicalPlan + Strategy +
  * physical exec (the (c) tier of the extension ladder, SURVEY.md §7.4 —
  * the compositional union+window form lives in Relational2.q17; this node
  * expresses the same semantics as one operator with an explicit
  * merge-scan physical plan).
  *
  * Semantics: for each left row, `matched_time` = max right.time with
  * right.key == left.key and right.time <= left.time (null if none) —
  * DuckDB's `ASOF LEFT JOIN ... ON l.key = r.key AND l.time >= r.time`.
  *
  * Physical plan: both sides hash-clustered on key and sorted by
  * (key, time) — EnsureRequirements inserts the exchanges/sorts — then a
  * single forward merge per partition: O(n+m), no buffering beyond one
  * running match, no range explosion. The shuffles are the theoretical
  * minimum for a key-matched time join at any scale.
  *
  * Constraints (checked at construction): key is LongType, time is
  * TimestampType (internally µs longs). Nulls follow SQL join semantics:
  * null right key/time rows are filtered before the merge (they can match
  * nothing), and a null left key/time yields a null `matched_time`.
  */
final case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute,
    matchedTime: AttributeReference) extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ matchedTime
  override def producedAttributes
      : org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(matchedTime)
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): AsOfJoinPlan = copy(left = newLeft, right = newRight)
}

final case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute,
    matchedTime: AttributeReference) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ matchedTime
  override def producedAttributes
      : org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(matchedTime)

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending, NullsFirst, Seq.empty),
      SortOrder(leftTime, Ascending, NullsFirst, Seq.empty)),
    Seq(SortOrder(rightKey, Ascending, NullsFirst, Seq.empty),
      SortOrder(rightTime, Ascending, NullsFirst, Seq.empty)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTimeIdx = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rKeyIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTimeIdx = right.output.indexWhere(_.exprId == rightTime.exprId)
    val outTypes = output.map(_.dataType).toArray
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      // downstream operators require UnsafeRow; project per partition
      val toUnsafe = org.apache.spark.sql.catalyst.expressions
        .UnsafeProjection.create(outTypes)
      val rBuf = rIt.buffered
      var matchKey = 0L
      var matchTime = 0L
      var hasMatch = false
      lIt.map { lRow =>
        val out = new GenericInternalRow(1)
        // A null left key/time can never match (SQL null-comparison
        // semantics, same as DuckDB ASOF): emit null without touching the
        // right cursor. NullsFirst ordering puts these rows before any
        // non-null key, so not advancing here preserves the merge invariant.
        if (lRow.isNullAt(lKeyIdx) || lRow.isNullAt(lTimeIdx)) {
          out.setNullAt(0)
        } else {
          val k = lRow.getLong(lKeyIdx)
          val t = lRow.getLong(lTimeIdx) // timestamp = µs long internally
          // advance the right side through everything joinable at-or-before;
          // null right key/time rows (sorted first) are consumed and skipped
          while (rBuf.hasNext && {
            val h = rBuf.head
            h.isNullAt(rKeyIdx) || h.isNullAt(rTimeIdx) || {
              val rk = h.getLong(rKeyIdx)
              rk < k || (rk == k && h.getLong(rTimeIdx) <= t)
            }
          }) {
            val h = rBuf.next()
            if (!h.isNullAt(rKeyIdx) && !h.isNullAt(rTimeIdx)) {
              val rk = h.getLong(rKeyIdx)
              if (rk == k) { matchKey = k; matchTime = h.getLong(rTimeIdx); hasMatch = true }
            }
          }
          if (hasMatch && matchKey == k) out.setLong(0, matchTime)
          else out.setNullAt(0)
        }
        toUnsafe(new JoinedRow(lRow, out)).copy()
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): AsOfJoinExec = copy(left = newLeft, right = newRight)
}

object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, lt, rk, rt, m) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, m) :: Nil
    case _ => Nil
  }
}

object AsOf {
  /** Public entry: left-as-of join `probes` to `refs` on (key, time);
    * adds a nullable `matched_time` column. Registers the planner strategy
    * on first use (public ExperimentalMethods hook). */
  def join(probesIn: DataFrame, refsIn: DataFrame, keyCol: String,
      timeCol: String): DataFrame = {
    // tolerate TimestampNTZ time columns (footer-shape drift): cast to
    // instant at ingress — value-identity under the pinned UTC session
    val probes = graft.functions.TsNorm.instant(probesIn, timeCol)
    val refs = graft.functions.TsNorm.instant(refsIn, timeCol)
    val spark = probes.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfStrategy
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val lPlan = ColumnBridge.planOf(probes)
    // self-join safety: the analyzer deduplicates attribute ids for
    // built-in Join nodes but not for custom ones — when probes and refs
    // derive from the same scan they share exprIds, and column pruning
    // then empties one side. Fresh aliases give the right side its own ids.
    // Null right key/time rows can never match any probe, so drop them
    // here rather than relying on a documented non-null precondition.
    val rPlan = ColumnBridge.planOf(refs.select(
        refs(keyCol).as("__asof_key"), refs(timeCol).as("__asof_time"))
      .filter(org.apache.spark.sql.functions.col("__asof_key").isNotNull &&
        org.apache.spark.sql.functions.col("__asof_time").isNotNull))
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name"))
    val lk = attr(lPlan, keyCol); val lt = attr(lPlan, timeCol)
    val rk = attr(rPlan, "__asof_key"); val rt = attr(rPlan, "__asof_time")
    require(lk.dataType == LongType && rk.dataType == LongType,
      "as-of key must be LongType")
    require(lt.dataType == TimestampType && rt.dataType == TimestampType,
      "as-of time must be TimestampType")
    val matched = AttributeReference("matched_time", TimestampType,
      nullable = true)()
    ColumnBridge.ofRows(spark,
      AsOfJoinPlan(lPlan, rPlan, lk, lt, rk, rt, matched))
  }
}
