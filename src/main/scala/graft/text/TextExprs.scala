package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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

/** Per-document repetition statistics — the Gopher/MassiveText-style
  * repetition filter features (duplicate-word fraction, most-frequent
  * n-gram fraction) that pre-training pipelines use to drop degenerate
  * documents (boilerplate, keyword stuffing, decode loops).
  *
  * One zero-shuffle pass per row: word offsets are walked once off the
  * UTF-8 bytes (same byte-identity argument as
  * [[graft.dedup.ShingleKernel]] — an n-gram's string form is exactly the
  * text region from its first word's start to its last word's end), words
  * and n-grams are counted by their xxhash64 under the repo-wide
  * 2⁻⁶⁴-collision contract the dedup join keys already carry. At corpus
  * scale this is a scan-speed map with NO aggregation shuffle — the
  * naive explode(n-grams) → groupBy(doc, gram) → max(count) form
  * shuffles every n-gram occurrence of every document. */
case class NgramRepStatsExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 2, s"ngram_rep_stats: n must be >= 2, got $n")

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("distinct_words", LongType, nullable = false),
    StructField("top_ngram_count", LongType, nullable = false)))
  override def prettyName: String = "ngram_rep_stats"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"ngram_rep_stats requires a string argument, got ${other.simpleString}")
    }
  }

  override protected def nullSafeEval(v: Any): Any =
    NgramRepStatsExpr.stats(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.text.NgramRepStatsExpr.stats($t, $n);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object NgramRepStatsExpr {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.XXH64

  /** (word count, distinct words, max n-gram multiplicity) of the
    * single-space word sequence of `text`. Tokenization matches
    * `split(text, " ")` / DuckDB `string_split`: separators + 1 words,
    * empties kept. A document with fewer than n words has ZERO n-grams
    * (top count 0) — unlike the dedup shingle edge, a repetition
    * statistic must not invent an n-gram that isn't there. */
  def stats(text: UTF8String, n: Int): InternalRow = {
    val nb = text.numBytes()
    var m = 1
    var i = 0
    while (i < nb) { if (text.getByte(i) == 0x20) m += 1; i += 1 }
    val ws = new Array[Int](m + 1)
    var w = 1
    i = 0
    while (i < nb) { if (text.getByte(i) == 0x20) { ws(w) = i + 1; w += 1 }; i += 1 }
    ws(m) = nb + 1 // virtual start just past a trailing separator
    val base = text.getBaseObject
    val off = text.getBaseOffset
    // distinct words: hash each word's byte region (primitive
    // open-addressed set — no per-word boxing)
    val wordSet = new graft.dedup.LongSet(m)
    i = 0
    while (i < m) {
      val s = ws(i)
      val e = ws(i + 1) - 1
      wordSet.add(XXH64.hashUnsafeBytes(base, off + s, e - s, 42L))
      i += 1
    }
    // n-gram multiplicities: count by hash, track the max
    val cnt = m - n + 1
    var top = 0L
    if (cnt > 0) {
      val freq = new graft.dedup.LongCounter(cnt)
      i = 0
      while (i < cnt) {
        val s = ws(i)
        val e = ws(i + n) - 1
        val c = freq.inc(XXH64.hashUnsafeBytes(base, off + s, e - s, 42L))
        if (c > top) top = c
        i += 1
      }
    }
    InternalRow(m.toLong, wordSet.size.toLong, top)
  }
}

/** Per-document word multiplicities in ONE pass:
  * `array<struct<w string, c bigint>>`, sorted by word bytes — the
  * in-row equivalent of `explode(split(text, ' '))` followed by
  * `groupBy(doc_id, w).count()`. The point is the SHUFFLE it deletes:
  * bag-of-words consumers (langid_nb's evidence stream, its (lang, word)
  * model training) otherwise push every token of the corpus through an
  * exchange just to collapse per-doc repeats; this computes the collapsed
  * pairs where the text already is, so only distinct (doc, word) rows
  * ever leave the scan. Tokenization matches `split(text, " ")` exactly
  * (single-space separator, empties kept) — asserted in
  * TextAnalysisSpec. */
case class WordCountsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("w", StringType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "word_counts"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"word_counts requires a string argument, got ${other.simpleString}")
    }
  }

  override protected def nullSafeEval(v: Any): Any =
    WordCountsExpr.counts(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.text.WordCountsExpr.counts($t);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object WordCountsExpr {
  import org.apache.spark.sql.catalyst.InternalRow

  private val space = UTF8String.fromString(" ")

  /** Sorted (word, count) rows. The word slices reference the input
    * buffer (same contract as Spark's own StringSplit result — the
    * consuming projection copies them before the next input row). */
  def counts(text: UTF8String): ArrayData = {
    val parts = text.split(space, -1)
    val m = new java.util.TreeMap[UTF8String, Array[Long]]()
    var i = 0
    while (i < parts.length) {
      val cur = m.get(parts(i))
      if (cur == null) m.put(parts(i), Array(1L)) else cur(0) += 1L
      i += 1
    }
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = InternalRow(e.getKey, e.getValue()(0))
      j += 1
    }
    new GenericArrayData(out)
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

  /** Codegen'd per-doc sorted word multiplicities:
    * `array<struct<w, c>>` == the groupBy(doc, word) counts, computed
    * in-row (no shuffle). */
  def wordCounts(text: Column): Column =
    CatalystBridge.column(WordCountsExpr(CatalystBridge.expression(text)))

  /** Codegen'd per-doc repetition stats: struct(n_words, distinct_words,
    * top_ngram_count) for word `n`-grams. */
  def ngramRepStats(text: Column, n: Int): Column =
    CatalystBridge.column(
      NgramRepStatsExpr(CatalystBridge.expression(text), n))

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

  /** SQL registration: `ngram_rep_stats(text, n)` → struct(n_words,
    * distinct_words, top_ngram_count); `n` must be an int literal.
    * Injected by [[graft.GraftExtensions]]. */
  val repStatsFunctionDescription: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) =
    (org.apache.spark.sql.catalyst.FunctionIdentifier("ngram_rep_stats"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[NgramRepStatsExpr].getName, "ngram_rep_stats"),
      exprs => {
        require(exprs.length == 2,
          s"ngram_rep_stats takes (text, n), got ${exprs.length} args")
        val n = exprs(1)
        require(n.foldable && n.dataType == IntegerType,
          s"ngram_rep_stats n must be an int literal, got $n")
        NgramRepStatsExpr(exprs.head, n.eval().asInstanceOf[Int])
      })

  /** SQL registration: `word_counts(text)` → sorted
    * `array<struct<w, c>>` of per-doc word multiplicities. Injected by
    * [[graft.GraftExtensions]]. */
  val wordCountsFunctionDescription: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) =
    (org.apache.spark.sql.catalyst.FunctionIdentifier("word_counts"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[WordCountsExpr].getName, "word_counts"),
      exprs => {
        require(exprs.length == 1,
          s"word_counts takes (text), got ${exprs.length} args")
        WordCountsExpr(exprs.head)
      })
}
