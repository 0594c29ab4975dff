package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expression for dictionary-word counting on the text hot paths.
  *
  * The Column spec `size(filter(split(text, " "), w => w.isin(dict)))`
  * evaluates one interpreted boxed lambda per word — the same
  * interpreted-HOF shape measured ~100× slower than codegen elsewhere in
  * this repo (see [[graft.dedup.SignatureExprs]]). Quality scoring runs
  * over the WHOLE corpus, so the count must be scan-speed: at the sf1
  * rehearsal the HOF form put `text_quality_filter` at 8.4 s (≈ 2 corpus
  * passes × 50k docs × ~200 words of lambda dispatch); this expression
  * does one tight JVM pass per row. Value-identical to the spec form —
  * asserted in TextAnalysisSpec.
  */

/** Count of whitespace-separated words of `child` that are in `dict`
  * (with multiplicity) — equal to `size(filter(split(text, " "),
  * w => w.isin(dict: _*)))` for non-null input. Tokenization matches
  * `split(text, " ")`: Java regex split with trailing empties kept. */
case class DictWordCountExpr(child: Expression, dict: Seq[String])
    extends UnaryExpression {
  require(dict.nonEmpty, "dict_word_count: empty dictionary")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "dict_word_count"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"dict_word_count requires a string argument, got ${other.simpleString}")
    }
  }

  // UTF8String keys: compare in the scan's native representation — no
  // per-word String materialization in the hot loop
  @transient private lazy val dictSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](dict.size * 2)
    dict.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override protected def nullSafeEval(v: Any): Any =
    DictWordCountExpr.count(v.asInstanceOf[UTF8String], dictSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the dict set is tiny and deterministic — materialize it once per
    // generated class via a reference to this expression instance
    val setRef = ctx.addReferenceObj("dictSet", dictSet,
      classOf[java.util.HashSet[UTF8String]].getName)
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.text.DictWordCountExpr.count($t, $setRef);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object DictWordCountExpr {
  /** Shared by interpreted eval and generated code. Splits on single
    * spaces exactly like `split(text, " ")` (Java `String.split` with
    * limit -1: consecutive separators yield empty tokens, which are never
    * in the dict). */
  def count(text: UTF8String, dict: java.util.HashSet[UTF8String]): Int = {
    val sp = UTF8String.fromString(" ")
    val parts = text.split(sp, -1)
    var n = 0
    var i = 0
    while (i < parts.length) {
      if (dict.contains(parts(i))) n += 1
      i += 1
    }
    n
  }
}

object TextExprs {
  /** Codegen'd count of dictionary words in `text` — the hot-path form of
    * `size(filter(split(text, " "), w => w.isin(dict: _*)))`. */
  def dictWordCount(text: Column, dict: Seq[String]): Column =
    CatalystBridge.column(
      DictWordCountExpr(CatalystBridge.expression(text), dict))
}
