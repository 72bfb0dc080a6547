package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd sequential dot product over two numeric arrays.
  *
  * Semantics are IDENTICAL to the higher-order form
  * `aggregate(zip_with(a,b,(x,y)=>x*y), 0.0, (acc,v)=>acc+v)` — a strict
  * left-to-right double accumulation (the cross-engine-reproducible order,
  * see graft.operators.VectorOps) — but compiled into a tight loop inside
  * whole-stage codegen instead of per-element interpreted lambda calls.
  * This is the §7.6 "custom Expression for the similarity kernel" lever:
  * the similarity queries spend nearly all their time in this kernel.
  *
  * Assumes non-null array elements (enforced by the embedding schema).
  */
case class SequentialDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // nullable even for non-null children: mismatched array lengths → null
  // (also keeps codegen's isNull a real variable, never a folded literal)
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"seq_dot expects array<float|double>, got ${left.dataType} / ${right.dataType}")
  }

  // Mismatched lengths yield null, exactly like the zip_with+aggregate
  // reference form (zip_with pads the shorter side with nulls and
  // null*x poisons the sum) — a silently-truncated dot product would hide
  // corrupt embeddings.
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def get(arr: String, dt: DataType, i: String): String = dt match {
        case FloatType => s"((double) $arr.getFloat($i))"
        case _ => s"$arr.getDouble($i)"
      }
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ${get(a, elemType(left), i)} * ${get(b, elemType(right), i)};
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

object SequentialDot {
  /** Column-level entry point (Spark 4 Column↔Expression bridge). */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      SequentialDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}
