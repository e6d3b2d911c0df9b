package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SqlBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Native Catalyst expression for the vector hot path.
  *
  * `aggregate`/`zip_with` lambdas are evaluated interpreted (no codegen),
  * which made per-pair cosine the dominant cost of the similarity
  * operators. FloatDotProduct compiles to a tight primitive loop inside
  * whole-stage codegen. Accumulation is double, strictly left-to-right —
  * the exact order the DuckDB oracle's list_sum fold uses, so results stay
  * bit-identical.
  */
case class FloatDotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Integer twin of [[FloatDotProduct]] for quantized (int8-in-int32)
  * vectors: exact long accumulation of int products in a codegen'd
  * primitive loop. 64 products of |q| ≤ 127 can't overflow a long.
  */
case class IntDotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += x.getInt(i).toLong * y.getInt(i).toLong
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((long) $a.getInt($i)) * ((long) $b.getInt($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {

  /** Codegen'd dot product of two array<float> columns, as double. */
  def dotF(a: Column, b: Column): Column =
    SqlBridge.column(FloatDotProduct(SqlBridge.expression(a), SqlBridge.expression(b)))

  /** L2 norm of an array<float> column. */
  def normF(a: Column): Column = sqrt(dotF(a, a))

  /** Codegen'd exact dot product of two array<int> columns, as long. */
  def dotI(a: Column, b: Column): Column =
    SqlBridge.column(IntDotProduct(SqlBridge.expression(a), SqlBridge.expression(b)))
}
