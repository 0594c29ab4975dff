package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native Catalyst expression: hamming distance between two 64-bit
  * signatures (`Long.bitCount(a ^ b)`), with whole-stage codegen — the
  * custom-`Expression` surface of SURVEY.md §7.4. Semantically equal to
  * `bit_count(a ^ b)` (asserted in CustomFnSpec); the point is a codegen'd
  * kernel that stays inside the generated loop — the preferred shape for
  * hot-path scalar kernels (vs a boxed UDF).
  *
  * Inputs must be LongType (callers cast; no ExpectsInputTypes because
  * that trait is private[sql] in Spark 4).
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming64"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = java.lang.Long.bitCount($a ^ $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HammingDistance {
  /** For SparkSessionExtensions.injectFunction (GraftExtensions). */
  val functionDescription: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) =
    (org.apache.spark.sql.catalyst.FunctionIdentifier("hamming64"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[HammingDistance].getName, "hamming64"),
      exprs => HammingDistance(exprs(0), exprs(1)))

  /** Column-API form. */
  def hamming64(a: Column, b: Column): Column =
    CatalystBridge.column(
      HammingDistance(CatalystBridge.expression(a), CatalystBridge.expression(b)))

  /** Register as a SQL function `hamming64(a, b)` on the session. */
  def register(spark: SparkSession): Unit =
    CatalystBridge.registerFunction(spark, "hamming64",
      exprs => HammingDistance(exprs(0), exprs(1)))
}
