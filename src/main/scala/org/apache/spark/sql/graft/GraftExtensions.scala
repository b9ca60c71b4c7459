package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Expression, ExpressionInfo, LambdaFunction, Literal, Multiply, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Session extensions (SURVEY §4 custom-operator tier (c)):
  *
  *  - SQL-registers the native expressions so
  *    `spark.sql("SELECT long_array_dot(a, b)")` works;
  *  - injects [[RewriteIntegerDot]], an optimizer rule that rewrites
  *    the declarative integer-dot-product idiom
  *    `aggregate(zip_with(a, b, (x,y) -> x*y), 0L, (acc,x) -> acc+x)`
  *    into [[LongArrayDot]] — users keep writing portable DataFrame
  *    code and still get the codegen'd tight loop.
  *
  * Enable with
  * `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
  * or `SparkSession.builder.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("long_array_dot"),
      new ExpressionInfo(classOf[LongArrayDot].getName, "long_array_dot"),
      (args: Seq[Expression]) => LongArrayDot(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("word_shingles3"),
      new ExpressionInfo(classOf[WordShingles3].getName, "word_shingles3"),
      (args: Seq[Expression]) => WordShingles3(args(0))))
    ext.injectFunction((
      new FunctionIdentifier("minhash_md5"),
      new ExpressionInfo(classOf[MinHashMd5].getName, "minhash_md5"),
      (args: Seq[Expression]) => MinHashMd5(args(0),
        args(1).asInstanceOf[Literal].value.asInstanceOf[Int])))
    ext.injectOptimizerRule(_ => RewriteIntegerDot)
  }
}

/** aggregate(zip_with(a, b, (x,y) → x*y), 0L, (acc,v) → acc+v[, id]) ⇒
  * long_array_dot(a, b).
  *
  * Safe on every input because [[LongArrayDot]] reproduces the
  * declarative chain's null semantics at runtime: unequal lengths →
  * null (zip_with null-pads) and null elements → null — so no static
  * containsNull guard is needed and nullable arrays still get the
  * codegen path. */
object RewriteIntegerDot extends Rule[LogicalPlan] {
  private def isMultiplyLambda(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(l, r, _), args, _) =>
      args.length == 2 && Set(l, r) == args.map(a => a: Expression).toSet
    case _ => false
  }
  private def isAddLambda(f: Expression): Boolean = f match {
    case LambdaFunction(Add(l, r, _), args, _) =>
      args.length == 2 && Set(l, r) == args.map(a => a: Expression).toSet
    case _ => false
  }
  private def isIdentityLambda(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(arg), _) => body == arg
    case _ => true // default finish lambda
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(ZipWith(a, b, mul), Literal(0L, _), acc, fin)
          if isMultiplyLambda(mul) && isAddLambda(acc) && isIdentityLambda(fin) &&
            a.dataType.sameType(org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.LongType)) &&
            b.dataType.sameType(org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.LongType)) =>
        LongArrayDot(a, b)
    }
}
