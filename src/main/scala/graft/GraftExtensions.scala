package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.HammingDistance
import graft.plans.AsOfJoinStrategy

/** Library packaging via the standard extension point:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * Injects the custom function(s) and the as-of join planner strategy so
  * SQL users get them without touching the Scala API. (The Scala APIs —
  * [[graft.plans.AsOfJoin.asof]], [[HammingDistance.hamming64]] — also
  * self-register on first use.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(HammingDistance.functionDescription)
    e.injectFunction(graft.functions.ProductAgg.functionDescription)
    e.injectFunction(graft.ann.CosineSimExpr.functionDescription)
    e.injectFunction(graft.text.TextExprs.functionDescription)
    e.injectFunction(graft.text.TextExprs.repStatsFunctionDescription)
    e.injectFunction(graft.text.TextExprs.wordCountsFunctionDescription)
    e.injectFunction(graft.ann.QuantExprs.functionDescription)
    e.injectFunction(graft.functions.ExtremumByOrd.minFunctionDescription)
    e.injectFunction(graft.functions.ExtremumByOrd.maxFunctionDescription)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsOfJoin)
  }
}
