package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, LongType}

/** `min_by`/`max_by` over a two-part integer ordering key as a
  * [[TypedImperativeAggregate]] — the object-buffer aggregate form, and
  * the fix for the built-in `min_by(value, struct(ts, id))`'s physical
  * shape: a struct-ordered buffer is not hash-aggregable, so Catalyst
  * demotes the WHOLE aggregate to SortAggregate, sorting every scan
  * split by the grouping key (documented at the `ts_ohlc` PLANS.md
  * audit). A TypedImperativeAggregate instead runs in
  * ObjectHashAggregateExec: hash-grouped, map-side partials, no sort —
  * the 24-byte (ord1, ord2, value) buffer replaces the struct.
  *
  * This also completes the custom-aggregate surface: typed
  * `Aggregator` ([[Custom.SecondMax]]), expression-based
  * [[ProductAgg]] (DeclarativeAggregate), and now the serialized-
  * object form — the three extension classes Spark offers.
  *
  * Null semantics: rows where value or either ordering key is NULL are
  * skipped (min_by/max_by behavior); an empty group yields NULL. Ties
  * on (ord1, ord2) keep the first-seen value only if the keys are
  * strictly equal — callers pass a unique tiebreak (event_id) so ties
  * cannot occur, which is what makes the result deterministic.
  */
case class ExtremumByOrd(
    valueExpr: Expression, ord1: Expression, ord2: Expression,
    isMin: Boolean,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with TernaryLike[Expression] {

  override def first: Expression = valueExpr
  override def second: Expression = ord1
  override def third: Expression = ord2

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires three BIGINT arguments, got " +
        children.map(_.dataType.simpleString).mkString(", "))
  override def prettyName: String = if (isMin) "min_by_ord" else "max_by_ord"

  // buffer: [set, ord1, ord2, value]
  override def createAggregationBuffer(): Array[Long] = Array(0L, 0L, 0L, 0L)

  private def better(o1: Long, o2: Long, b: Array[Long]): Boolean =
    b(0) == 0L || {
      val cmp = if (o1 != b(1)) java.lang.Long.compare(o1, b(1))
                else java.lang.Long.compare(o2, b(2))
      if (isMin) cmp < 0 else cmp > 0
    }

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = valueExpr.eval(input)
    val k1 = ord1.eval(input)
    val k2 = ord2.eval(input)
    if (v != null && k1 != null && k2 != null) {
      val (o1, o2) = (k1.asInstanceOf[Long], k2.asInstanceOf[Long])
      if (better(o1, o2, b)) {
        b(0) = 1L; b(1) = o1; b(2) = o2; b(3) = v.asInstanceOf[Long]
      }
    }
    b
  }

  override def merge(b: Array[Long], other: Array[Long]): Array[Long] = {
    if (other(0) == 1L && better(other(1), other(2), b)) {
      b(0) = 1L; b(1) = other(1); b(2) = other(2); b(3) = other(3)
    }
    b
  }

  override def eval(b: Array[Long]): Any =
    if (b(0) == 0L) null else b(3)

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(32)
    b.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(4)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ExtremumByOrd =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ExtremumByOrd =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): ExtremumByOrd =
    copy(valueExpr = newFirst, ord1 = newSecond, ord2 = newThird)
}

object ExtremumByOrd {
  private def agg(value: Column, o1: Column, o2: Column,
      isMin: Boolean): Column =
    CatalystBridge.column(ExtremumByOrd(
      CatalystBridge.expression(value), CatalystBridge.expression(o1),
      CatalystBridge.expression(o2), isMin).toAggregateExpression())

  private def build(isMin: Boolean)(args: Seq[Expression]): Expression = {
    if (args.length != 3)
      throw CatalystBridge.wrongNumArgs(
        if (isMin) "min_by_ord" else "max_by_ord", 3, args.length)
    ExtremumByOrd(args(0), args(1), args(2), isMin).toAggregateExpression()
  }

  /** For SparkSessionExtensions.injectFunction (GraftExtensions). */
  val minFunctionDescription: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) =
    (org.apache.spark.sql.catalyst.FunctionIdentifier("min_by_ord"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[ExtremumByOrd].getName, "min_by_ord"),
      build(isMin = true) _)

  val maxFunctionDescription: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) =
    (org.apache.spark.sql.catalyst.FunctionIdentifier("max_by_ord"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[ExtremumByOrd].getName, "max_by_ord"),
      build(isMin = false) _)

  /** value at the lexicographically smallest (o1, o2). */
  def minByOrd(value: Column, o1: Column, o2: Column): Column =
    agg(value, o1, o2, isMin = true)

  /** value at the lexicographically largest (o1, o2). */
  def maxByOrd(value: Column, o1: Column, o2: Column): Column =
    agg(value, o1, o2, isMin = false)
}
