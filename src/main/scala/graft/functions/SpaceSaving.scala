package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.util.{HashMap => JHashMap}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-Saving heavy-hitters sketch (Metwally, Agrawal, El Abbadi,
  * ICDT'05) as a native imperative aggregate — the frequent-items member
  * of the sketch family beside [[KmvSketch]] (distinct count) and the
  * Count-Min column (point frequency): one pass, EXACTLY `m` counters of
  * state per group however large the stream, mergeable partials.
  *
  * Per counter the summary carries (item, cnt, err) with the classic
  * guarantees `cnt >= true >= cnt - err`. In a single-partition pass any
  * item whose true count exceeds n/m is guaranteed present (the ICDT'05
  * theorem). Across MERGED partials both (cnt, err) bounds stay valid,
  * and heavy survival has a PROVEN (not margin-dependent) threshold at
  * twice the single-pass one: every per-partial minimum is at most
  * n_p/m, so the min-floor merge inflates any estimate by at most
  * Σ_p n_p/m = n/m in total; an item with true count > 2n/m therefore
  * ranks (estimate ≥ true > 2n/m) above all but the < m items whose
  * true counts exceed n/m (anything out-ranking it has estimate > 2n/m,
  * hence true > 2n/m − n/m = n/m, and fewer than m items can), so the
  * prune-to-m keeps it — under ANY partitioning and merge order
  * (adversarially spec-tested with engineered per-partition floors at
  * the margin, 1/5/8/32-way). SIZING RULE: to guarantee every item
  * above threshold φ·n appears, provision m ≥ 1/φ for a single
  * partition and m ≥ 2/φ under merged partials — the ×2
  * over-provisioning is the distributed-execution price. Items between
  * n/m and 2n/m may or may not survive (that band narrows as 1/m);
  * the bounds on every REPORTED item hold regardless.
  * Updates: a tracked item increments;
  * an untracked one below capacity inserts (1, 0); at capacity it
  * REPLACES a minimum counter, inheriting its count as both estimate
  * floor and error (`(min+1, min)`). Eviction picks the lexicographically
  * smallest among minimum-count items so a single-partition pass is
  * deterministic; across partitions the approximate regime is
  * arrival-order dependent like every summary of this family — the
  * bounds, not the counters, are the portable contract.
  *
  * Merge (the mergeable-summaries form, Agarwal et al. PODS'12 §3 /
  * Cormode & Hadjieleftheriou CACM'09): an item absent from a FULL
  * side's summary may have occurred up to that side's minimum counter
  * times there, so its contribution merges as (est=min, err=min); a side
  * below capacity tracked everything it saw, so absence there is an
  * exact zero. Sums of per-side (est, err) keep both bounds valid, and
  * pruning back to the `m` largest (count desc, item asc) only drops
  * items — survivors' bounds are untouched.
  *
  * EXACT REGIME, the oracle contract: when `m` is at least the group's
  * true distinct count, no buffer ever fills, so no eviction, no
  * min-add on merge, err = 0 everywhere — the eval is the exact ordered
  * frequency table, a deterministic function of the input SET
  * (hash-comparable against a DuckDB GROUP BY under any partitioning).
  * The aggregation state carries a sticky `inexact` flag, set at the
  * three (and only three) events where exactness is lost — an update
  * eviction, a merge that actually applies a full side's min-floor to
  * an absent item, a prune that actually drops counters — so exactness
  * is decided by the pass itself, not by a separate NDV probe over the
  * corpus. With `exactRequired = true` ([[SpaceSaving.exactSummary]])
  * eval REFUSES (IllegalStateException) when the flag is set: a caller
  * whose oracle equivalence depends on the exact regime (q220) fails
  * loudly in its single pass the moment a group's vocabulary outgrows
  * the capacity, instead of paying a corpus-wide countDistinct guard
  * every run (r15 verdict #4) or silently drifting approximate.
  *
  * Scale shape: partials build map-side under ObjectHashAggregate; only
  * `m` (item, cnt, err) triples per group cross the wire — the top-k
  * token report over 100 TB never shuffles the token stream, versus the
  * exact groupBy whose first shuffle carries every distinct token. */
case class SpaceSaving(child: Expression, m: Int,
    exactRequired: Boolean = false,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSaving.Buffer]
  with UnaryLike[Expression] {
  import SpaceSaving.Buffer

  require(m >= 1, "SpaceSaving needs capacity m >= 1")

  override def prettyName: String = "space_saving"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"space_saving expects a string item column, got $other")
    }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def nullIntolerant: Boolean = false

  override def createAggregationBuffer(): Buffer =
    new Buffer(new JHashMap[String, Array[Long]](), inexact = false)

  /** Minimum counter value, and the lexicographically smallest item
    * holding it (the deterministic eviction victim). O(m) scan — m is a
    * structural constant (hundreds), eviction-path only. */
  private def minEntry(buf: JHashMap[String, Array[Long]]): (String, Long) = {
    var minCnt = Long.MaxValue
    var minItem: String = null
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue()(0)
      if (c < minCnt || (c == minCnt && e.getKey < minItem)) {
        minCnt = c; minItem = e.getKey
      }
    }
    (minItem, minCnt)
  }

  private def add(buf: JHashMap[String, Array[Long]], item: String,
      cnt: Long, err: Long): Unit = {
    val cur = buf.get(item)
    if (cur != null) { cur(0) += cnt; cur(1) += err; () }
    else {
      buf.put(item, Array(cnt, err)); ()
    }
  }

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      val cur = buf.map.get(item)
      if (cur != null) cur(0) += 1
      else if (buf.map.size < m) { buf.map.put(item, Array(1L, 0L)); () }
      else {
        val (victim, minCnt) = minEntry(buf.map)
        buf.map.remove(victim)
        buf.map.put(item, Array(minCnt + 1, minCnt))
        buf.inexact = true // eviction: the summary left the exact regime
        ()
      }
    }
    buf
  }

  /** Prune to the m largest counters (count desc, item asc). Dropping
    * never violates survivors' bounds, but it does leave the exact
    * regime (a dropped counter's count is lost), so it flags. */
  private def prune(buf: Buffer): Unit = {
    if (buf.map.size <= m) return
    val ranked = sortedEntries(buf.map)
    var i = m
    while (i < ranked.length) { buf.map.remove(ranked(i)._1); i += 1 }
    buf.inexact = true
  }

  private def sortedEntries(buf: JHashMap[String, Array[Long]])
      : Array[(String, Array[Long])] = {
    val arr = new Array[(String, Array[Long])](buf.size)
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next(); arr(i) = (e.getKey, e.getValue); i += 1
    }
    scala.util.Sorting.stableSort(arr,
      (a: (String, Array[Long]), b: (String, Array[Long])) =>
        a._2(0) > b._2(0) || (a._2(0) == b._2(0) && a._1 < b._1))
    arr
  }

  override def merge(b1: Buffer, b2: Buffer): Buffer = {
    b1.inexact ||= b2.inexact
    if (b2.map.isEmpty) return b1
    if (b1.map.isEmpty) { b1.map.putAll(b2.map); return b1 }
    // an item a FULL side never tracked may still have appeared up to
    // min(side) times there; a below-capacity side tracked everything.
    val min1 = if (b1.map.size >= m) minEntry(b1.map)._2 else 0L
    val min2 = if (b2.map.size >= m) minEntry(b2.map)._2 else 0L
    if (min2 > 0L) {
      // items only in b1 pick up b2's uncertainty floor (they may have
      // appeared up to min2 times in the stream b2 summarizes)
      val it1 = b1.map.entrySet().iterator()
      while (it1.hasNext) {
        val e = it1.next()
        if (!b2.map.containsKey(e.getKey)) { e.getValue()(0) += min2
          e.getValue()(1) += min2
          b1.inexact = true } // a floor actually landed: estimates inflated
      }
    }
    val it2 = b2.map.entrySet().iterator()
    while (it2.hasNext) {
      val e = it2.next()
      val cur = b1.map.get(e.getKey)
      if (cur != null) { cur(0) += e.getValue()(0); cur(1) += e.getValue()(1) }
      else {
        // symmetric floor: absent from b1's full summary => up to min1 there
        add(b1.map, e.getKey, e.getValue()(0) + min1, e.getValue()(1) + min1)
        if (min1 > 0L) b1.inexact = true
      }
    }
    prune(b1)
    b1
  }

  override def eval(buf: Buffer): Any = {
    if (exactRequired && buf.inexact) throw new IllegalStateException(
      s"space_saving exact regime violated: a group's distinct-item " +
        s"count exceeded capacity m=$m (an eviction, merge min-floor, " +
        "or prune fired), so the summary is an approximate sketch while " +
        "this caller's contract (exactSummary) requires the exact " +
        "frequency table. Raise the capacity with the corpus, or switch " +
        "to SpaceSaving.summary and the (cnt, err) bounds.")
    val ranked = sortedEntries(buf.map)
    new GenericArrayData(ranked.map { case (item, ce) =>
      InternalRow(UTF8String.fromString(item), ce(0), ce(1))
    })
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeBoolean(buf.inexact)
    out.writeInt(buf.map.size)
    val it = buf.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes(StandardCharsets.UTF_8)
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(e.getValue()(0))
      out.writeLong(e.getValue()(1))
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val inexact = bb.get() != 0
    val n = bb.getInt
    val map = new JHashMap[String, Array[Long]](n * 2)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val sb = new Array[Byte](len)
      bb.get(sb)
      map.put(new String(sb, StandardCharsets.UTF_8),
        Array(bb.getLong, bb.getLong))
      i += 1
    }
    new Buffer(map, inexact)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSaving =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSaving =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): SpaceSaving =
    copy(child = newChild)
}

object SpaceSaving {
  /** Aggregation state: the counter map plus a sticky exactness-loss
    * flag — true iff an eviction, an applied merge min-floor, or a
    * prune drop has occurred anywhere in this buffer's history (the
    * three events that make the summary approximate). */
  final class Buffer(val map: JHashMap[String, Array[Long]],
      var inexact: Boolean)

  /** Aggregate column: the full summary as
    * `array<struct<item,cnt,err>>` ordered (cnt desc, item asc) —
    * callers `slice` their k. `itemCol` must be StringType. */
  def summary(itemCol: Column, m: Int): Column =
    ColumnBridge.column(
      SpaceSaving(ColumnBridge.expression(itemCol), m)
        .toAggregateExpression())

  /** [[summary]] that REFUSES at eval unless the pass stayed in the
    * exact regime (every group's vocabulary fit the capacity) — the
    * free, in-pass form of the exact-regime guard for callers whose
    * oracle equivalence depends on it (q220). */
  def exactSummary(itemCol: Column, m: Int): Column =
    ColumnBridge.column(
      SpaceSaving(ColumnBridge.expression(itemCol), m,
        exactRequired = true).toAggregateExpression())
}
