package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct 3-gram word shingles of a whitespace-tokenized string —
  * native replacement for the interpreted
  * `array_distinct(transform(sequence(...), i → array_join(slice(...))))`
  * chain used by dedup/fingerprint operators. Same result set (order
  * is irrelevant downstream: explode / size / array_min only).
  * Codegen delegates to one static helper call, keeping the
  * whole-stage span intact.
  */
case class WordShingles3(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles3"

  override protected def nullSafeEval(input: Any): Any =
    WordShingles3.shingles3(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.WordShingles3.shingles3($c);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles3 =
    copy(child = newChild)
}

object WordShingles3 {
  private val SPACE = UTF8String.fromString(" ")

  /** Distinct 3-gram shingles, first-occurrence order. Called from
    * generated code — must stay a static-forwardable method. */
  def shingles3(text: UTF8String): ArrayData = {
    val toks = text.split(SPACE, -1)
    val n = toks.length
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](math.max(16, n * 2))
    var i = 0
    while (i <= n - 3) {
      seen.add(UTF8String.concat(toks(i), SPACE, toks(i + 1), SPACE, toks(i + 2)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  def column(text: Column): Column =
    ExpressionUtils.column(WordShingles3(ExpressionUtils.expression(text)))
}
