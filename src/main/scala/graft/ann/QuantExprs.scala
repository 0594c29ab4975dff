package graft.ann

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types._

/** Symmetric int8 embedding quantization — the standard compression step
  * before shipping an embedding corpus to an ANN index or a training run
  * (4× smaller than float32, 8× smaller than the double form Spark
  * shuffles).
  *
  * Per vector: scale = max|x_i|, q_i = round(x_i · 127 / scale), rounding
  * half away from zero (C `round`/DuckDB semantics; ties are detected by
  * exact fraction comparison, not by adding 0.5 — `|x| + 0.5` rounds up
  * half an ulp below the tie, the classic 0.49999999999999994 artifact).
  * A zero vector (scale 0) quantizes to all zeros rather than dividing.
  *
  * Scale: one codegen'd zero-shuffle pass over the corpus — quantization
  * must run at scan speed because it touches every vector exactly once;
  * the interpreted-HOF Column form (spec'd in SimilaritySpec for parity)
  * pays one boxed lambda per element.
  */
case class QuantizeI8Expr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("dim", IntegerType, nullable = false),
    StructField("scale", DoubleType, nullable = false),
    StructField("qvec", ArrayType(IntegerType, containsNull = false),
      nullable = false)))
  override def prettyName: String = "quantize_i8"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"quantize_i8 requires an array<double> argument, got ${other.simpleString}")
    }
  }

  override protected def nullSafeEval(v: Any): Any =
    QuantizeI8Expr.quantize(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.ann.QuantizeI8Expr.quantize($a);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object QuantizeI8Expr {

  /** Round half away from zero, exactly: the fractional part of a double
    * below 2⁵² is exact after `floor` subtraction, so the tie compare is
    * precise. Matches C/DuckDB `round(double)` bit-for-bit. */
  def roundAway(x: Double): Double = {
    val a = math.abs(x)
    val f = math.floor(a)
    val r = if (a - f >= 0.5) f + 1.0 else f
    if (x < 0) -r else r
  }

  def quantize(arr: ArrayData): InternalRow = {
    val v = arr.toDoubleArray()
    var s = 0.0
    var i = 0
    while (i < v.length) {
      val a = math.abs(v(i))
      if (a > s) s = a
      i += 1
    }
    val q = new Array[Int](v.length)
    if (s != 0.0) {
      i = 0
      while (i < v.length) {
        q(i) = roundAway(v(i) * 127.0 / s).toInt
        i += 1
      }
    }
    InternalRow(v.length, s, new GenericArrayData(q))
  }
}

object QuantExprs {
  /** Codegen'd symmetric int8 quantization of an `array<double>` vector:
    * struct(dim, scale, qvec). */
  def quantizeI8(emb: Column): Column =
    CatalystBridge.column(QuantizeI8Expr(CatalystBridge.expression(emb)))

  /** SQL registration: `quantize_i8(array<double>)`. Injected by
    * [[graft.GraftExtensions]]. */
  val functionDescription: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) =
    (org.apache.spark.sql.catalyst.FunctionIdentifier("quantize_i8"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[QuantizeI8Expr].getName, "quantize_i8"),
      exprs => {
        require(exprs.length == 1,
          s"quantize_i8 takes one array<double> argument, got ${exprs.length}")
        QuantizeI8Expr(exprs.head)
      })
}
