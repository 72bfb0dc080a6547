package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd distinct w-shingles over a token array.
  *
  * Semantically identical to the higher-order form
  * `array_distinct(transform(sequence(1, size-n+1), i => concat_ws(" ",
  * tokens[i..i+n-1])))` (with docs shorter than n yielding an empty
  * array), but executed as one kernel call from generated code instead of
  * walking an interpreted expression tree per element — higher-order
  * lambdas have no codegen, and the measured cost was ~µs per shingle
  * (seconds per pass at sf0.1, SURVEY §2.13 / PLANS.md). Distinctness
  * keeps first-occurrence order, matching `array_distinct`.
  */
case class ShingleArray(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_array"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_array expects array<string>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    ShingleArray.kernel(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleArray.kernel($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleArray =
    copy(child = newChild)
}

object ShingleArray {
  private val Space = UTF8String.fromString(" ")

  /** Distinct n-gram windows, first-occurrence order. Null tokens are
    * treated as empty strings (the token source — split() — never yields
    * null elements). */
  def kernel(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= len - n) {
      val parts = new Array[UTF8String](2 * n - 1)
      var j = 0
      while (j < n) {
        val t = tokens.getUTF8String(i + j)
        parts(2 * j) = if (t == null) UTF8String.EMPTY_UTF8 else t
        if (j < n - 1) parts(2 * j + 1) = Space
        j += 1
      }
      seen.add(UTF8String.concat(parts: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** Column wrapper. */
  def shingles(tokens: Column, n: Int): Column =
    ColumnBridge.column(ShingleArray(ColumnBridge.expression(tokens), n))
}
