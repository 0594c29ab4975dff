package graft.ann

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Tight-loop cosine kernel, shared by interpreted eval and generated
  * code. Arithmetic is bit-identical to [[VectorKernels]]' JVM kernel and
  * to the higher-order-function spec ([[Similarity.cosine]]): each
  * accumulator (dot, ‖a‖², ‖b‖²) sums in ascending index order, then
  * cos = dot / (√na · √nb). IEEE doubles make that deterministic across
  * all three formulations.
  */
object CosineKernel {
  /** Static forwarder-friendly (callable as `graft.ann.CosineKernel
    * .cosine(...)` from Janino-generated Java). */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val va = a.toDoubleArray()
    val vb = b.toDoubleArray()
    if (va.length != vb.length)
      throw new IllegalArgumentException(
        s"cosine_sim: vector length mismatch (${va.length} vs ${vb.length})")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < va.length) {
      dot += va(i) * vb(i)
      na += va(i) * va(i)
      nb += vb(i) * vb(i)
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** Native Catalyst expression: cosine similarity of two `array<double>`
  * columns, with whole-stage codegen.
  *
  * Exists because Spark's higher-order array functions evaluate one
  * interpreted boxed lambda per element — the right executable spec
  * ([[Similarity.cosine]]), the wrong hot path (~100× slower measured on
  * all-pairs scoring). This expression keeps candidate scoring inside the
  * generated loop, so LSH/IVF verification is a codegen'd map over the
  * join output — the 100 TB-safe shape (no driver materialization).
  *
  * Inputs must be ArrayType(DoubleType) (callers cast; ExpectsInputTypes
  * is private[sql] in Spark 4).
  */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  // analysis-time type validation for the SQL surface (ExpectsInputTypes
  // is private[sql] in Spark 4, so validate directly)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires two array<double> arguments, got " +
          s"${l.simpleString} and ${r.simpleString}")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineKernel.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.ann.CosineKernel.cosine($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimExpr {
  /** Column-API form. */
  def cosineFast(a: Column, b: Column): Column =
    CatalystBridge.column(
      CosineSimExpr(CatalystBridge.expression(a), CatalystBridge.expression(b)))

  /** For SparkSessionExtensions.injectFunction (GraftExtensions). */
  val functionDescription: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) =
    (org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[CosineSimExpr].getName, "cosine_sim"),
      exprs => {
        require(exprs.length == 2,
          s"cosine_sim takes 2 arguments, got ${exprs.length}")
        CosineSimExpr(exprs(0), exprs(1))
      })
}
