package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Coalesce, Expression, If, IsNull, Literal, Multiply}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** `product(x)` as a [[DeclarativeAggregate]] — the pure-expression
  * aggregate form (init/update/merge/evaluate are Catalyst expressions, so
  * the whole aggregate inlines into generated code; contrast with the
  * row-at-a-time typed [[Custom.SecondMax]] Aggregator). Spark has no
  * product aggregate; DuckDB's native `product()` is the oracle.
  *
  * Null semantics match sum/avg: nulls skipped, empty/all-null group →
  * NULL. Buffer is a single nullable double.
  */
case class ProductAgg(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "product_agg"

  private lazy val product =
    AttributeReference("product", DoubleType, nullable = true)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = product :: Nil
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal.create(null, DoubleType))

  private def childD: Expression = child.cast(DoubleType)

  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(childD), product,
      Multiply(Coalesce(Seq(product, Literal(1.0))), childD)))

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    If(IsNull(product.right), product.left,
      Multiply(Coalesce(Seq(product.left, Literal(1.0))), product.right)))

  override lazy val evaluateExpression: Expression = product

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object ProductAgg {
  def product_agg(c: Column): Column =
    CatalystBridge.column(
      ProductAgg(CatalystBridge.expression(c)).toAggregateExpression())

  private def build(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1,
      s"product_agg takes exactly 1 argument, got ${exprs.length}")
    ProductAgg(exprs.head).toAggregateExpression()
  }

  /** For SparkSessionExtensions.injectFunction (GraftExtensions). */
  val functionDescription: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) =
    (org.apache.spark.sql.catalyst.FunctionIdentifier("product_agg"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[ProductAgg].getName, "product_agg"),
      build _)

  def register(spark: SparkSession): Unit =
    CatalystBridge.registerFunction(spark, "product_agg", build _)
}
