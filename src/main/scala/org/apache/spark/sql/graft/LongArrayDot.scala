/* Hosted under org.apache.spark.sql so the expression can use the
 * private[sql] Catalyst surface (AbstractDataType, ExpressionUtils) —
 * the established pattern for third-party native expressions. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Exact integer dot product of two BIGINT arrays — a native Catalyst
  * expression with whole-stage codegen (`doGenCode` emits a tight
  * primitive loop). Replaces the interpreted
  * `aggregate(zip_with(a, b, _*_), 0L, _+_)` chain on the similarity
  * hot path: same exact semantics, none of the per-element overhead.
  * See SURVEY §4 (custom-operator preference order (b)).
  *
  * Observationally equivalent to the declarative idiom on EVERY input:
  * unequal lengths → null (zip_with null-pads the shorter side, the
  * null product nulls the sum), and a null element in either array →
  * null. This equivalence is what makes [[RewriteIntegerDot]] safe to
  * inject globally.
  */
case class LongArrayDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "long_array_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayDot =
    copy(left = newLeft, right = newRight)
}

object LongArrayDot {
  def column(a: Column, b: Column): Column =
    ExpressionUtils.column(LongArrayDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
