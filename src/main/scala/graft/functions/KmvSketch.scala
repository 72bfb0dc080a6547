package graft.functions

import java.nio.ByteBuffer
import java.util.{TreeSet => JTreeSet}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) cardinality sketch as a native imperative
  * aggregate: one pass, O(k) state per group, mergeable — the (b) tier of
  * the extension ladder (SURVEY.md §7.4), complementing the codegen'd
  * scalar SequentialDot.
  *
  * Keeps the k smallest DISTINCT values of a LongType child (callers feed
  * a uniform hash, e.g. [[PortableHash.tokenHashP]]); `eval` returns
  * struct(n_sketch, kth) from which the estimator reads
  * n ≈ (k−1)·M / kth (M = hash modulus). Unlike `approx_count_distinct`
  * (HLL++), the result is a deterministic function of the input SET —
  * identical across engines, partitionings, and cluster sizes, so it
  * hash-compares against a DuckDB oracle.
  *
  * Scale shape: partial sketches build map-side (ObjectHashAggregate),
  * only k longs per group cross the wire, merge is a bounded set union —
  * versus the distinct-then-global-top-k formulation whose first shuffle
  * carries every distinct value.
  */
case class KmvSketch(child: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[JTreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, "KMV needs k >= 2")

  override def prettyName: String = "kmv_sketch"
  override def dataType: DataType = StructType(Seq(
    StructField("n_sketch", LongType, nullable = false),
    StructField("kth", LongType, nullable = false)))
  override def nullable: Boolean = false
  override def nullIntolerant: Boolean = false

  override def createAggregationBuffer(): JTreeSet[java.lang.Long] =
    new JTreeSet[java.lang.Long]()

  private def add(buf: JTreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last()) {
      if (buf.add(v)) buf.pollLast()
      ()
    }
  }

  override def update(buf: JTreeSet[java.lang.Long],
      input: InternalRow): JTreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: JTreeSet[java.lang.Long],
      b2: JTreeSet[java.lang.Long]): JTreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next().longValue())
    b1
  }

  override def eval(buf: JTreeSet[java.lang.Long]): Any =
    InternalRow(buf.size.toLong,
      if (buf.isEmpty) 0L else buf.last().longValue())

  override def serialize(buf: JTreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): JTreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new JTreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
}

/** [[KmvSketch]]'s persistable twin: same buffer, same merge, but `eval`
  * returns the SKETCH CONTENT (the sorted k minima as `array<long>`)
  * instead of the collapsed (n, kth) summary — the form that can be
  * STORED as data and re-merged later. The KMV order-ideal property
  * makes the stored form losslessly mergeable: the k smallest distinct
  * hashes of A ∪ B are computable from the k smallest of A and the k
  * smallest of B alone, so per-batch sketch columns persisted beside a
  * table fold into exact global sketches without rescanning — the
  * mergeable-summary pattern (Agarwal et al., "Mergeable Summaries",
  * PODS'12) that incremental distinct-count maintenance needs. */
case class KmvSketchValues(child: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[JTreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, "KMV needs k >= 2")

  private val impl = KmvSketch(child, k)

  override def prettyName: String = "kmv_sketch_values"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def nullIntolerant: Boolean = false

  override def createAggregationBuffer(): JTreeSet[java.lang.Long] =
    impl.createAggregationBuffer()
  override def update(buf: JTreeSet[java.lang.Long],
      input: InternalRow): JTreeSet[java.lang.Long] = impl.update(buf, input)
  override def merge(b1: JTreeSet[java.lang.Long],
      b2: JTreeSet[java.lang.Long]): JTreeSet[java.lang.Long] =
    impl.merge(b1, b2)
  override def serialize(buf: JTreeSet[java.lang.Long]): Array[Byte] =
    impl.serialize(buf)
  override def deserialize(bytes: Array[Byte]): JTreeSet[java.lang.Long] =
    impl.deserialize(bytes)

  override def eval(buf: JTreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  override def withNewMutableAggBufferOffset(
      newOffset: Int): KmvSketchValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): KmvSketchValues =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): KmvSketchValues =
    copy(child = newChild)
}

object KmvSketch {
  /** Aggregate column: `struct(n_sketch, kth)` over the k smallest
    * distinct values of `hashCol` (must be LongType). */
  def sketch(hashCol: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSketch(ColumnBridge.expression(hashCol), k).toAggregateExpression())

  /** Aggregate column: the sorted k smallest distinct values themselves
    * (`array<long>`) — the persistable, re-mergeable sketch form. */
  def sketchValues(hashCol: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSketchValues(ColumnBridge.expression(hashCol), k)
        .toAggregateExpression())
}
