package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** k-member md5 MinHash signature of a shingle set in ONE pass:
  * h_i = min over shingles of md5("i|" + shingle) (lowercase hex) —
  * exactly the hash family the DuckDB oracle replays, but without k
  * interpreted `transform` traversals. Codegen delegates to a static
  * helper, keeping the whole-stage span.
  */
case class MinHashMd5(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash_md5"

  override protected def nullSafeEval(input: Any): Any =
    MinHashMd5.signature(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.MinHashMd5.signature($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinHashMd5 =
    copy(child = newChild)
}

object MinHashMd5 {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HEX = "0123456789abcdef".toCharArray

  private def md5Hex(prefix: Array[Byte], s: UTF8String): UTF8String = {
    val digest = md.get()
    digest.reset()
    digest.update(prefix)
    digest.update(s.getBytes)
    val d = digest.digest()
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HEX(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Called from generated code. */
  def signature(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    val mins = new Array[Any](k)
    var i = 0
    while (i < k) {
      val prefix = s"$i|".getBytes("UTF-8")
      var best: UTF8String = null
      var j = 0
      while (j < n) {
        val h = md5Hex(prefix, shingles.getUTF8String(j))
        if (best == null || h.compareTo(best) < 0) best = h
        j += 1
      }
      mins(i) = best
      i += 1
    }
    new GenericArrayData(mins)
  }

  def column(shingles: Column, k: Int): Column =
    ExpressionUtils.column(MinHashMd5(ExpressionUtils.expression(shingles), k))
}
