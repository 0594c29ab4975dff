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

/** Count of code points of `child` OUTSIDE [A-Za-z0-9 ] — equal to
  * `regexp_count(text, '[^A-Za-z0-9 ]')` (a negated single-char class
  * matches exactly one code point per hit; Java regex iterates code
  * points, so astral chars count once — mirrored here by counting UTF-8
  * lead bytes). The regex form measured 2.5 s/pass over the sf1 corpus
  * even at full parallelism — ~8× the rest of the scoring pass combined —
  * and quality scoring runs it over every doc. */
case class PunctCountExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "punct_count"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"punct_count requires a string argument, got ${other.simpleString}")
    }
  }

  override protected def nullSafeEval(v: Any): Any =
    PunctCountExpr.count(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.text.PunctCountExpr.count($t);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object PunctCountExpr {
  /** One pass over the UTF-8 bytes: ASCII bytes check the class directly;
    * a non-ASCII code point is never in [A-Za-z0-9 ], so count its lead
    * byte (`(b & 0xC0) != 0x80`) and skip continuations. */
  def count(text: UTF8String): Int = {
    val n = text.numBytes()
    var i = 0
    var c = 0
    while (i < n) {
      val b = text.getByte(i)
      if (b >= 0) { // ASCII
        val inClass = (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
          (b >= '0' && b <= '9') || b == ' '
        if (!inClass) c += 1
      } else if ((b & 0xC0) != 0x80) { // UTF-8 lead byte = one code point
        c += 1
      }
      i += 1
    }
    c
  }
}

object TextExprs {
  /** Codegen'd count of code points outside [A-Za-z0-9 ] — the hot-path
    * form of `regexp_count(text, lit("[^A-Za-z0-9 ]"))`. */
  def punctCount(text: Column): Column =
    CatalystBridge.column(PunctCountExpr(CatalystBridge.expression(text)))

  /** Codegen'd count of dictionary words in `text` — the hot-path form of
    * `size(filter(split(text, " "), w => w.isin(dict: _*)))`. */
  def dictWordCount(text: Column, dict: Seq[String]): Column =
    CatalystBridge.column(
      DictWordCountExpr(CatalystBridge.expression(text), dict))

  /** SQL registration: `dict_word_count(text, 'the', 'a', ...)` — the
    * dictionary arguments must be foldable string literals (they become
    * the per-row probe set). Injected by [[graft.GraftExtensions]]. */
  val functionDescription: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) =
    (org.apache.spark.sql.catalyst.FunctionIdentifier("dict_word_count"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DictWordCountExpr].getName, "dict_word_count"),
      exprs => {
        require(exprs.length >= 2,
          s"dict_word_count takes (text, word...), got ${exprs.length} args")
        val dict = exprs.tail.map { e =>
          require(e.foldable && e.dataType == StringType,
            s"dict_word_count dictionary args must be string literals, got $e")
          e.eval().asInstanceOf[UTF8String].toString
        }
        DictWordCountExpr(exprs.head, dict)
      })
}
