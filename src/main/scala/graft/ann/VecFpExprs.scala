package graft.ann

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types._

/** Native Catalyst kernels for the fixed-point ANN hot paths.
  *
  * The `functions._` HOF forms ([[FixedPointAnn]]'s
  * `aggregate(zip_with(...))` squared-L2 and the Lloyd argmin fold over
  * the broadcast centroid array) are the executable spec, but they
  * evaluate one interpreted lambda per element: the k-means assignment
  * pass pays k cells × d dims of boxed dispatch per vector — the
  * dominant term of `_shared_ann_models` at the ×100 rehearsal. These
  * expressions compute the IDENTICAL integer values (same strict-<,
  * ties to the lowest cell, same Long.MaxValue/-1 empty-centroid
  * behavior — asserted by the existing FixedPointAnnSpec exact-replay
  * tests) in one tight JVM loop per row, inside whole-stage codegen. */
object VecFpKernel {
  /** Integer squared L2; arrays must be same length (always true here —
    * both sides come off the same 2⁻¹⁰ grid). */
  def sqDist(a: ArrayData, b: ArrayData): Long = {
    val x = a.toLongArray()
    val y = b.toLongArray()
    var s = 0L
    var i = 0
    while (i < x.length) { val d = x(i) - y(i); s += d * d; i += 1 }
    s
  }

  /** ADC distance: Σ_m dt[m·kpq + codes(m)] over the compressed code
    * array against a query's (slot → partial-dist) map. One primitive
    * scan of the map entries (M wants checked per entry, M = 8) instead
    * of M interpreted `element_at` calls that each scan the whole
    * unsorted MapData — the knn_pq/knn_ivfpq compressed-domain hot loop.
    * Every referenced slot exists by construction (codes only reference
    * codebook cells the table was built from; FixedPointAnnSpec replays
    * the emitted distances exactly). */
  def adcDist(codes: ArrayData, dt: org.apache.spark.sql.catalyst.util.MapData,
      kpq: Int): Long = {
    val m = codes.numElements()
    val want = new Array[Int](m)
    var i = 0
    while (i < m) { want(i) = i * kpq + codes.getInt(i); i += 1 }
    val keys = dt.keyArray()
    val vals = dt.valueArray()
    var s = 0L
    var found = 0
    var e = 0
    val n = keys.numElements()
    while (e < n && found < m) {
      val k = keys.getInt(e)
      var i2 = 0
      while (i2 < m) {
        if (want(i2) == k) { s += vals.getLong(e); found += 1; i2 = m }
        else i2 += 1
      }
      e += 1
    }
    // fail FAST on a missing slot instead of returning a partial sum:
    // the element_at fold this kernel replaced propagated NULL there,
    // so a model-construction bug must surface as an error, never as a
    // plausible-but-wrong distance.
    if (found < m) {
      var miss = -1
      var i3 = 0
      while (i3 < m && miss < 0) {
        var e2 = 0
        var hit = false
        while (e2 < n && !hit) {
          if (keys.getInt(e2) == want(i3)) hit = true else e2 += 1
        }
        if (!hit) miss = want(i3)
        i3 += 1
      }
      throw new IllegalStateException(
        s"adc_dist: distance table is missing slot $miss " +
          s"(found $found of $m code slots) — the PQ codes reference a " +
          "codebook cell the table was not built from")
    }
    s
  }

  /** Argmin over a cell-ascending `array<struct<cell:int, qc:array<long>>>`
    * centroid array: returns struct(dist, cell); strict < keeps the
    * lowest cell on ties, empty input yields (Long.MaxValue, -1) —
    * exactly the HOF fold it replaces. */
  def argMinCell(vec: ArrayData, cents: ArrayData): InternalRow = {
    val v = vec.toLongArray()
    var best = Long.MaxValue
    var bestCell = -1
    var i = 0
    val n = cents.numElements()
    while (i < n) {
      val row = cents.getStruct(i, 2)
      val qc = row.getArray(1)
      var d = 0L
      var j = 0
      while (j < v.length) { val t = v(j) - qc.getLong(j); d += t * t; j += 1 }
      if (d < best) { best = d; bestCell = row.getInt(0) }
      i += 1
    }
    new GenericInternalRow(Array[Any](best, bestCell))
  }
}

/** Codegen'd integer squared L2 between two `array<long>` vectors. */
case class SqDistFpExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "sqdist_fp"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sqdist_fp requires two array<bigint> arguments, got $other")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecFpKernel.sqDist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.ann.VecFpKernel.sqDist($a, $b);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** Codegen'd Lloyd assignment step: nearest centroid of a broadcast
  * cell-ascending centroid array, as `struct<dist:long, cell:int>`. */
case class ArgMinCellExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("dist", LongType, nullable = false),
    StructField("cell", IntegerType, nullable = false)))
  override def prettyName: String = "argmin_cell"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(st: StructType, _))
          if st.fields.length == 2 &&
            st.fields(0).dataType == IntegerType &&
            (st.fields(1).dataType match {
              case ArrayType(LongType, _) => true; case _ => false }) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"argmin_cell requires (array<bigint>, array<struct<int, array<bigint>>>), got $other")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecFpKernel.argMinCell(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.ann.VecFpKernel.argMinCell($a, $b);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** Codegen'd ADC scan distance (see [[VecFpKernel.adcDist]]). */
case class AdcDistExpr(left: Expression, right: Expression, kpq: Int)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "adc_dist"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), MapType(IntegerType, LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"adc_dist requires (array<int>, map<int, bigint>), got $other")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecFpKernel.adcDist(a.asInstanceOf[ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData], kpq)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.ann.VecFpKernel.adcDist($a, $b, $kpq);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object VecFpExprs {
  def sqDistFp(a: Column, b: Column): Column =
    CatalystBridge.column(SqDistFpExpr(
      CatalystBridge.expression(a), CatalystBridge.expression(b)))
  def argMinCell(vec: Column, cents: Column): Column =
    CatalystBridge.column(ArgMinCellExpr(
      CatalystBridge.expression(vec), CatalystBridge.expression(cents)))
  def adcDist(codes: Column, dt: Column, kpq: Int): Column =
    CatalystBridge.column(AdcDistExpr(
      CatalystBridge.expression(codes), CatalystBridge.expression(dt), kpq))
}
