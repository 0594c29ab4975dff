package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators for LLM training-data pipelines (BASELINE.json
  * north star): language-ID heuristic, quality scoring, token counting,
  * document fingerprinting.
  *
  * Everything is narrow, per-row, codegen'd column expressions — at 100 TB
  * these run scan-speed with zero shuffles; only the final ORDER BY (for
  * oracle determinism) would be dropped in production.
  */
object TextAnalysis {

  private val Stop = Seq("the", "a", "an", "and", "of", "to", "in", "is")

  private def words(c: Column): Column = split(c, " ")

  /** Executable SPEC of dictionary-word counting — interpreted HOF, one
    * boxed lambda per word. The query entries use the codegen'd
    * [[TextExprs.dictWordCount]] (value-identical; asserted in
    * TextAnalysisSpec) — the HOF form measured 8.4 s on the sf1
    * `text_quality_filter` (2 corpus passes of per-word lambda dispatch)
    * vs scan-speed for the native expression. */
  private[text] def countIn(ws: Column, dict: Seq[String]): Column =
    size(filter(ws, w => w.isin(dict: _*)))

  /** Hot-path form: codegen'd dictionary count straight off the text. */
  private def countInFast(text: Column, dict: Seq[String]): Column =
    TextExprs.dictWordCount(text, dict)

  /** Rabin–Karp polynomial rolling hash over words, mod 1e9+7. Library
    * form (exact polynomial; exercised in TextSpec). The oracle-checked
    * query uses the position-weighted variant below, which both engines
    * can express identically. */
  def rollingHash(text: Column): Column =
    aggregate(words(text), lit(0L), (acc, w) =>
      pmod(acc * 31 + wordKey(w), lit(1000000007L)))

  /** Cheap deterministic word key: length·131 + first-char·7 + last-char
    * (ascii = code point of first char in both engines). */
  private def wordKey(w: Column): Column =
    length(w) * 131 + ascii(w) * 7 + ascii(substring(w, -1, 1))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // n-gram/stopword-profile language ID: marker-word hit counts per
    // language, deterministic CASE argmax. (The synthetic corpus is
    // English word soup with a random `lang` label — the point is the
    // operator shape, scored per-row at scan speed.)
    "text_langid" -> ((s, d) => {
      val en = Seq("the", "and", "of", "to", "a")
      val de = Seq("der", "und", "die", "nicht", "ein")
      val es = Seq("el", "la", "de", "que", "los")
      Tables.documents(s, d)
        .select(
          col("doc_id"), col("lang"),
          countInFast(col("text"), en).as("s_en"),
          countInFast(col("text"), de).as("s_de"),
          countInFast(col("text"), es).as("s_es"))
        .withColumn("predicted",
          when(col("s_en") >= col("s_de") && col("s_en") >= col("s_es"), "en")
            .when(col("s_de") >= col("s_es"), "de")
            .otherwise("es"))
        .orderBy(col("doc_id"))
    }),

    // Quality scoring: length/punctuation/stopword/digit ratios + a
    // composite score; the standard pre-training quality-filter features.
    "text_quality" -> ((s, d) => {
      val ws = words(col("text"))
      val nWords = size(ws).cast("double")
      val nStop = countInFast(col("text"), Stop).cast("double")
      val nPunct = TextExprs.punctCount(col("text")).cast("double")
      val nChars = length(col("text")).cast("double")
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          nChars.cast("long").as("n_chars"),
          nWords.cast("long").as("n_words"),
          (nChars / nWords).as("avg_word_len"),
          (nStop / nWords).as("stop_ratio"),
          (nPunct / nChars).as("punct_ratio"),
          // composite: stopword presence good, punctuation soup bad,
          // degenerate word length bad — all IEEE-exact double math
          ((nStop / nWords) * 2.0 - (nPunct / nChars) * 5.0).as("quality"))
        .orderBy(col("doc_id"))
    }),

    // Percentile-threshold quality filter — the standard corpus-pruning
    // step: keep documents at or above their language's p25 composite
    // quality. Exact interpolated percentile per lang (a tiny per-lang
    // frame, broadcast back); one pass to score + one agg — at corpus
    // scale the cutoff frame is KBs regardless of corpus size.
    "text_quality_filter" -> ((s, d) => {
      val ws = words(col("text"))
      val nWords = size(ws).cast("double")
      val nStop = countInFast(col("text"), Stop).cast("double")
      val nPunct = TextExprs.punctCount(col("text")).cast("double")
      val nChars = length(col("text")).cast("double")
      // repartition: the per-doc scoring is CPU-bound and the testdata
      // scan is one split (MB-sized files) — spread it first
      val scored = Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), col("lang"),
          ((nStop / nWords) * 2.0 - (nPunct / nChars) * 5.0).as("quality"))
      val cut = scored.groupBy(col("lang"))
        .agg(expr("percentile(quality, 0.25)").as("q25"))
      scored.join(broadcast(cut), Seq("lang"))
        .filter(col("quality") >= col("q25"))
        .select(col("doc_id"), col("lang"), col("quality"))
        .orderBy(col("doc_id"))
    }),

    // The 100 TB form of the percentile cutoff: exact percentile() holds
    // EVERY group value in aggregation state (memory ∝ group size — a
    // non-starter when one lang has 10¹⁰ docs). The fixed-grid histogram
    // (the `winsorize` machinery) is the variant that is BOTH bounded and
    // replayable: one (lang, bin) count aggregation — map-side combined,
    // state ≤ langs × bins regardless of corpus size (bin = 1e-4 on the
    // ~[-5, 2] quality domain ⇒ ≤ 70k bins/lang) — then the cutoff is
    // the first bin whose running mass reaches ¼, all integer arithmetic
    // the oracle replays bit-for-bit. Cutoff error ≤ one bin width;
    // TextAnalysisSpec (LayoutSpec) pins the kept set to the exact-p25
    // filter within 2%.
    "text_quality_filter_approx" -> ((s, d) => {
      val ws = words(col("text"))
      val nWords = size(ws).cast("double")
      val nStop = countInFast(col("text"), Stop).cast("double")
      val nPunct = TextExprs.punctCount(col("text")).cast("double")
      val nChars = length(col("text")).cast("double")
      val scored = Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), col("lang"),
          ((nStop / nWords) * 2.0 - (nPunct / nChars) * 5.0).as("quality"))
      val qg = floor(col("quality") * 10000).cast("long")
      val hist = scored.select(col("lang"), qg.as("qg"))
        .groupBy(col("lang"), col("qg")).agg(count(lit(1)).as("cnt"))
      val wc = Window.partitionBy(col("lang")).orderBy(col("qg"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wt = Window.partitionBy(col("lang"))
      val cut = hist
        .withColumn("cum", sum(col("cnt")).over(wc))
        .withColumn("n", sum(col("cnt")).over(wt))
        .groupBy(col("lang"))
        .agg(min(when(col("cum") * 4 >= col("n"), col("qg"))).as("gcut"))
      scored.join(broadcast(cut), Seq("lang"))
        .filter(qg >= col("gcut"))
        .select(col("doc_id"), col("lang"), col("quality"))
        .orderBy(col("doc_id"))
    }),

    // Per-document top terms: tf-idf's ranking core with an all-integer
    // ordering (tf desc, df asc, term asc) — no floating tie-break, so
    // the result is bit-stable across engines and partitionings. Shapes:
    // explode → two keyed aggregations (tf by (doc, term), df by term)
    // → join df back UNHINTED → per-doc window. The df table is
    // vocabulary-sized — billions of distinct terms on a web corpus
    // (Heaps' law) — so a forced broadcast would grow with the data;
    // the term key hash-partitions uniformly and AQE still broadcasts
    // small vocabularies. The window keys on doc_id (uniform).
    "text_top_terms" -> ((s, d) => {
      // round 10b: per-doc tf pairs are born collapsed at the scan
      // (word_counts kernel — the langid_nb precedent), which deletes
      // BOTH corpus-token exchanges this query used to pay: the
      // groupBy(doc, term) tf aggregation AND the DISTINCT feeding df
      // (kernel pairs are distinct per doc by construction, so df is a
      // plain term-keyed count with map-side combine)
      // r18: the tf frame feeds BOTH the df aggregation and the final
      // join — size-gated sharing runs the corpus tokenize pass once
      // above the gate instead of twice (plan-identical below it)
      val tf = graft.PlanShare.shared(Tables.documents(s, d)
        .select(col("doc_id"),
          explode(TextExprs.wordCounts(col("text"))).as("p"))
        .select(col("doc_id"), col("p.w").as("term"), col("p.c").as("tf")))
      val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
        .orderBy(col("tf").desc, col("df").asc, col("term"))
      tf.join(df, Seq("term"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("term"), col("tf"), col("df"), col("rnk"))
        .orderBy(col("doc_id"), col("rnk"))
    }),

    // Gopher/MassiveText-style repetition filter features: duplicate-word
    // fraction and most-frequent-bigram fraction per document — the
    // standard screens for boilerplate / keyword-stuffed / decode-loop
    // docs. One codegen'd zero-shuffle pass (NgramRepStatsExpr); the
    // naive form shuffles every bigram occurrence of the corpus. The
    // fractions are single integer-over-integer double divisions —
    // IEEE-exact in both engines.
    "text_repetition" -> ((s, d) => {
      val st = TextExprs.ngramRepStats(col("text"), 2)
      Tables.documents(s, d)
        .select(col("doc_id"), st.as("st"))
        .select(
          col("doc_id"),
          col("st.n_words").as("n_words"),
          col("st.distinct_words").as("distinct_words"),
          col("st.top_ngram_count").as("top_bigram_count"),
          ((col("st.n_words") - col("st.distinct_words")).cast("double") /
            col("st.n_words")).as("dup_word_frac"),
          when(col("st.n_words") > 1,
            col("st.top_ngram_count").cast("double") / (col("st.n_words") - 1))
            .otherwise(lit(0.0)).as("top_bigram_frac"))
        .orderBy(col("doc_id"))
    }),

    // Token counting: whitespace tokens + BPE-ish regex token classes
    // (letter runs / digit runs / single punctuation), chars-per-token.
    "text_tokens" -> ((s, d) => {
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          size(words(col("text"))).as("ws_tokens"),
          regexp_count(col("text"), lit("[A-Za-z]+")).as("alpha_tokens"),
          regexp_count(col("text"), lit("[0-9]+")).as("num_tokens"),
          regexp_count(col("text"), lit("[^A-Za-z0-9 ]")).as("other_tokens"),
          size(array_distinct(words(col("text")))).as("distinct_tokens"),
          (length(col("text")).cast("double") /
            greatest(regexp_count(col("text"), lit("[A-Za-z0-9]+")), lit(1)))
            .as("chars_per_token"))
        .orderBy(col("doc_id"))
    }),

    // Edit-distance near-dup check over the planted pairs: exact integer
    // Levenshtein between each base doc and its first-word-dropped copy,
    // normalized by length. Bounded work: one pair per base doc.
    "text_levenshtein" -> ((s, d) => {
      // bounded to 500 docs: edit distance is O(n·m) per pair — at bench
      // scale (5000 docs) unbounded cost would dwarf the suite; at the
      // oracle scale (500 docs) the bound is a no-op
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        .filter(col("doc_id") < 500)
      val near = docs.select((col("doc_id") + 100000).as("near_id"),
        array_join(slice(split(col("text"), " "), 2, 1000000), " ").as("near_text"))
      docs.join(near, col("doc_id") + 100000 === col("near_id"))
        .select(
          col("doc_id"),
          levenshtein(col("text"), col("near_text")).as("edit_dist"),
          (levenshtein(col("text"), col("near_text")).cast("double") /
            greatest(length(col("text")), lit(1))).as("rel_dist"))
        .orderBy(col("doc_id"))
    }),

    // Position-weighted fingerprint mod 1e9+7: order-sensitive 64-bit
    // integer arithmetic, bit-identical in any engine.
    "text_fingerprint" -> ((s, d) => {
      val ws = words(col("text"))
      val keyed = zip_with(ws, sequence(lit(1), size(ws)),
        (w, i) => wordKey(w).cast("long") * i)
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          pmod(aggregate(keyed, lit(0L), (acc, x) => acc + x),
            lit(1000000007L)).as("fingerprint"))
        .orderBy(col("doc_id"))
    }),

    // BM25 retrieval scoring (k1=1.2, b=0.75) of the whole corpus against
    // a fixed query-term set — the relevance ranking a data pipeline runs
    // to mine query-matched training examples. Scale shape: per-doc term
    // frequencies are one codegen'd byte-walk per term (no token explode,
    // no shuffle); the corpus stats the formula needs (N, Σdl, per-term
    // document frequencies) are ONE tiny aggregate broadcast back — so
    // the whole operator is a scan + a 1-row broadcast join + a top-k
    // (TakeOrderedAndProject), zero wide shuffles at any corpus size.
    // Numerics: ln is the one op here with no cross-engine bit guarantee
    // (correctly-rounded to within 1 ulp on each side, not THE same ulp),
    // so the idf — the only transcendental — is rounded to 6 dp at its
    // source; every downstream op is then an identical-input IEEE
    // multiply/divide/add in a fixed tree shape, and the final 6-dp round
    // compares bit-identical doubles. Residual risk: one of |terms|
    // distinct idf values landing within ~1e-15 of a 5e-7 rounding
    // boundary — not 20 free-form scores doing so.
    "text_bm25" -> ((s, d) => {
      val terms = Seq("spark", "join", "window")
      val k1 = 1.2
      val b = 0.75
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        .withColumn("dl", size(words(col("text"))))
      val tf = terms.zipWithIndex.foldLeft(docs) { case (df0, (t, i)) =>
        df0.withColumn(s"tf$i", countInFast(col("text"), Seq(t)))
      }.drop("text")
      // one pass over the tf frame: N, Σdl, df per term (docs containing it)
      val statAggs =
        Seq(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl")) ++
          terms.indices.map(i =>
            sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
      val stats = tf.agg(statAggs.head, statAggs.tail: _*)
      val withStats = tf.crossJoin(broadcast(stats))
      val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
      def score(i: Int): Column = {
        val tfi = col(s"tf$i").cast("double")
        val idf = round(log((col("n_docs").cast("double") - col(s"df$i") + 0.5) /
          (col(s"df$i") + 0.5) + 1.0), 6)
        // dl·b (not b·dl) only for Column-API reasons: IEEE multiply is
        // commutative bit-for-bit, so this matches the oracle's 0.75*dl
        val denom = tfi +
          lit(k1) * (lit(1.0) - b + col("dl").cast("double") * b / avgdl)
        idf * (tfi * (k1 + 1)) / denom
      }
      val total = terms.indices.map(score).reduce(_ + _)
      withStats
        .select(col("doc_id"), col("dl"), round(total, 6).as("bm25"))
        .orderBy(col("bm25").desc, col("doc_id")).limit(20)
    }),

    // Phrase mining (word2phrase, Mikolov et al. 2013 "Distributed
    // Representations of Words and Phrases"): adjacent word pairs whose
    // co-occurrence beats an independence baseline become collocation
    // candidates — the vocabulary-building step before phrase-aware
    // tokenization. score = (n_ab − δ) / (n_a · n_b), here in exact
    // parts-per-billion via the repo's fixed-point convention:
    // DECIMAL(38,0) numerator ×10⁹, DECIMAL product denominator (never
    // a raw BIGINT product — n_a·n_b overflows 2⁶³ at web scale, the
    // trend_slope lesson), truncating div. Three corpus-shaped aggs
    // (unigrams, adjacent bigrams via the shifted-slice zip, then
    // UNHINTED joins of the unigram counts onto the bigram frame —
    // both tables are vocabulary-scaled, so forcing a broadcast would
    // grow with the corpus; the w1/w2 keys hash uniformly and AQE
    // broadcasts small vocabularies on its own).
    "phrase_mining" -> ((s, d) => {
      val ws = split(col("text"), " ")
      val docs = Tables.documents(s, d)
      // r18: ABOVE the share gate, unigram and adjacent-bigram postings
      // are generated in ONE in-row explode (a null w2 marks a unigram
      // posting — the two posting classes are disjoint, so grouping by
      // (w1, w2) yields exactly the two old aggregates' counts) and the
      // vocabulary-sized count frame is materialized across its three
      // consumers (bi + the two unigram joins): the corpus is
      // scanned/split ONCE instead of three times (uni's subtree used
      // to execute once per join side), with unchanged total shuffle
      // volume (tokens + bigrams ≈ 2n postings either way, map-side
      // combined to vocab size). BELOW the gate the combined explode is
      // a pure loss — un-materialized it re-runs per consumer, emitting
      // 2n rows where the old per-aggregate passes emit n (measured
      // +25% wall at sf0.1, TimeQuery min-of-4 both orders) — so the
      // SHAPE itself is gated, the q21Core two-forms pattern;
      // TextAnalysisSpec pins the forms' row equality.
      val (uni, bi) =
        if (graft.PlanShare.crossesGate(docs)) {
          val counts = graft.PlanShare.shared(docs
            .select(explode(concat(
              transform(ws, w =>
                struct(w.as("w1"), lit(null).cast("string").as("w2"))),
              zip_with(
                slice(ws, lit(1), greatest(size(ws) - 1, lit(0))),
                slice(ws, lit(2), greatest(size(ws) - 1, lit(0))),
                (a, b) => struct(a.as("w1"), b.as("w2"))))).as("p"))
            .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
            .agg(count(lit(1)).as("n")))
          (counts.filter(col("w2").isNull).select(col("w1").as("w"), col("n")),
            counts.filter(col("w2").isNotNull)
              .select(col("w1"), col("w2"), col("n").as("n_ab")))
        } else {
          (docs.select(explode(ws).as("w"))
            .groupBy(col("w")).agg(count(lit(1)).as("n")),
            docs.select(explode(zip_with(
              slice(ws, lit(1), greatest(size(ws) - 1, lit(0))),
              slice(ws, lit(2), greatest(size(ws) - 1, lit(0))),
              (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
              .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
              .agg(count(lit(1)).as("n_ab")))
        }
      bi
        .join(uni.select(col("w").as("w1"), col("n").as("n_w1")), "w1")
        .join(uni.select(col("w").as("w2"), col("n").as("n_w2")), "w2")
        .filter(col("n_ab") >= 8)
        .selectExpr("w1", "w2", "n_ab", "n_w1", "n_w2",
          """CAST((CAST(n_ab - 5 AS DECIMAL(38,0)) * 1000000000)
            | div (CAST(n_w1 AS DECIMAL(19,0)) * n_w2) AS BIGINT)
            | AS score_ppb""".stripMargin)
        .filter(col("score_ppb") > 0)
        .orderBy(col("score_ppb").desc, col("w1"), col("w2"))
    }),

    // LM n-gram table extraction (Google-ngram shape): corpus 1/2/3-gram
    // counts with a min-count threshold and a deterministic top-100.
    // All three orders are generated IN-ROW in ONE scan (shifted-slice
    // zips, the skipgram/phrase_mining trick — no positional self-join
    // shuffle), then a single gram-keyed hash agg with map-side combine;
    // the threshold prunes the long tail at the aggregate, never the
    // scan. The oracle is the independent positional-self-join
    // formulation. Shuffle volume ≤ 3×tokens with uniform string keys;
    // at 100 TB the threshold would move into a count-min pre-filter
    // (the heavy_hitters machinery) — same downstream table.
    "ngram_counts" -> ((s, d) => {
      val ws = words(col("text"))
      def tail(k: Int, m: Int): Column =
        slice(ws, lit(k), greatest(size(ws) - (m - 1), lit(0)))
      val bi = zip_with(tail(1, 2), tail(2, 2),
        (a, b) => concat(a, lit(" "), b))
      val tri = zip_with(
        zip_with(tail(1, 3), tail(2, 3), (a, b) => concat(a, lit(" "), b)),
        tail(3, 3), (ab, c) => concat(ab, lit(" "), c))
      Tables.documents(s, d)
        .select(explode(concat(
          transform(ws, w => struct(lit(1).as("n"), w.as("gram"))),
          transform(bi, g => struct(lit(2).as("n"), g.as("gram"))),
          transform(tri, g => struct(lit(3).as("n"), g.as("gram"))))).as("g"))
        .groupBy(col("g.n").as("n"), col("g.gram").as("gram"))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 4)
        .orderBy(col("cnt").desc, col("n"), col("gram"))
        .limit(100)
    }),
  )

  def oracle: Map[String, String] = Map(
    "text_langid" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(string_split(text,' '), w -> w IN ('the','and','of','to','a'))) AS s_en,
        |    len(list_filter(string_split(text,' '), w -> w IN ('der','und','die','nicht','ein'))) AS s_de,
        |    len(list_filter(string_split(text,' '), w -> w IN ('el','la','de','que','los'))) AS s_es
        |  FROM documents)
        |SELECT doc_id, lang, CAST(s_en AS INT) AS s_en, CAST(s_de AS INT) AS s_de,
        |  CAST(s_es AS INT) AS s_es,
        |  CASE WHEN s_en >= s_de AND s_en >= s_es THEN 'en'
        |       WHEN s_de >= s_es THEN 'de' ELSE 'es' END AS predicted
        |FROM t ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      """SELECT doc_id,
        | CAST(length(text) AS BIGINT) AS n_chars,
        | CAST(len(string_split(text,' ')) AS BIGINT) AS n_words,
        | CAST(length(text) AS DOUBLE) / len(string_split(text,' ')) AS avg_word_len,
        | CAST(len(list_filter(string_split(text,' '),
        |   w -> w IN ('the','a','an','and','of','to','in','is'))) AS DOUBLE)
        |   / len(string_split(text,' ')) AS stop_ratio,
        | CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS DOUBLE)
        |   / length(text) AS punct_ratio,
        | (CAST(len(list_filter(string_split(text,' '),
        |    w -> w IN ('the','a','an','and','of','to','in','is'))) AS DOUBLE)
        |   / len(string_split(text,' '))) * 2.0
        |  - (CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS DOUBLE)
        |   / length(text)) * 5.0 AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality_filter" ->
      """WITH scored AS (
        |  SELECT doc_id, lang,
        |    (CAST(len(list_filter(string_split(text,' '),
        |       w -> w IN ('the','a','an','and','of','to','in','is'))) AS DOUBLE)
        |      / len(string_split(text,' '))) * 2.0
        |     - (CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS DOUBLE)
        |      / length(text)) * 5.0 AS quality
        |  FROM documents),
        |cut AS (
        |  SELECT lang, quantile_cont(quality, 0.25) AS q25
        |  FROM scored GROUP BY 1)
        |SELECT s.doc_id, s.lang, s.quality
        |FROM scored s JOIN cut c ON c.lang = s.lang
        |WHERE s.quality >= c.q25
        |ORDER BY s.doc_id""".stripMargin,
    // identical double scoring, identical 1e-4 grid bucketing, identical
    // first-bin-at-quarter-mass integer cutoff rule
    "text_quality_filter_approx" ->
      """WITH scored AS (
        |  SELECT doc_id, lang,
        |    (CAST(len(list_filter(string_split(text,' '),
        |       w -> w IN ('the','a','an','and','of','to','in','is'))) AS DOUBLE)
        |      / len(string_split(text,' '))) * 2.0
        |     - (CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS DOUBLE)
        |      / length(text)) * 5.0 AS quality
        |  FROM documents),
        |h AS (
        |  SELECT lang, CAST(floor(quality * 10000) AS BIGINT) AS qg,
        |    count(1) AS cnt
        |  FROM scored GROUP BY 1, 2),
        |cu AS (
        |  SELECT lang, qg,
        |    sum(cnt) OVER (PARTITION BY lang ORDER BY qg
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER (PARTITION BY lang) AS n
        |  FROM h),
        |cut AS (
        |  SELECT lang, min(CASE WHEN cum * 4 >= n THEN qg END) AS gcut
        |  FROM cu GROUP BY 1)
        |SELECT s.doc_id, s.lang, s.quality
        |FROM scored s JOIN cut c ON c.lang = s.lang
        |WHERE CAST(floor(s.quality * 10000) AS BIGINT) >= c.gcut
        |ORDER BY s.doc_id""".stripMargin,
    "text_top_terms" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, term, count(1) AS tf
        |  FROM terms GROUP BY 1, 2),
        |df AS (
        |  SELECT term, count(1) AS df FROM (
        |    SELECT DISTINCT doc_id, term FROM terms) GROUP BY 1),
        |ranked AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |    CAST(row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS INT) AS rnk
        |  FROM tf JOIN df ON df.term = tf.term)
        |SELECT doc_id, term, tf, df, rnk
        |FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,
    "text_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |idx AS (
        |  SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM t),
        |bg AS (
        |  SELECT doc_id, w[i] || ' ' || w[i+1] AS bigram FROM idx),
        |top AS (
        |  SELECT doc_id, max(cnt) AS top_cnt FROM (
        |    SELECT doc_id, bigram, count(*) AS cnt
        |    FROM bg GROUP BY doc_id, bigram) GROUP BY doc_id)
        |SELECT t.doc_id,
        |  CAST(len(w) AS BIGINT) AS n_words,
        |  CAST(len(list_distinct(w)) AS BIGINT) AS distinct_words,
        |  CAST(coalesce(top.top_cnt, 0) AS BIGINT) AS top_bigram_count,
        |  CAST(len(w) - len(list_distinct(w)) AS DOUBLE) / len(w) AS dup_word_frac,
        |  CASE WHEN len(w) > 1
        |    THEN CAST(coalesce(top.top_cnt, 0) AS DOUBLE) / (len(w) - 1)
        |    ELSE CAST(0 AS DOUBLE) END AS top_bigram_frac
        |FROM t LEFT JOIN top ON top.doc_id = t.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        | CAST(len(string_split(text,' ')) AS INT) AS ws_tokens,
        | CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS INT) AS alpha_tokens,
        | CAST(len(regexp_extract_all(text, '[0-9]+')) AS INT) AS num_tokens,
        | CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS INT) AS other_tokens,
        | CAST(len(list_distinct(string_split(text,' '))) AS INT) AS distinct_tokens,
        | CAST(length(text) AS DOUBLE)
        |   / greatest(len(regexp_extract_all(text, '[A-Za-z0-9]+')), 1) AS chars_per_token
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_levenshtein" ->
      """WITH near AS (
        |  SELECT doc_id + 100000 AS near_id,
        |         array_to_string(string_split(text, ' ')[2:], ' ') AS near_text
        |  FROM documents WHERE doc_id < 500)
        |SELECT doc_id,
        | CAST(levenshtein(text, near_text) AS INT) AS edit_dist,
        | CAST(levenshtein(text, near_text) AS DOUBLE)
        |   / greatest(length(text), 1) AS rel_dist
        |FROM documents JOIN near ON doc_id + 100000 = near_id
        |WHERE doc_id < 500
        |ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        | CAST(sum((length(w)*131 + ascii(w)*7 + ascii(right(w,1))) * i) % 1000000007 AS BIGINT) AS fingerprint
        |FROM documents,
        |  LATERAL (SELECT unnest(string_split(text,' ')) AS w,
        |           generate_subscripts(string_split(text,' '),1) AS i)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // idf rounded to 6 dp at its source (the only transcendental), then a
    // fixed left-associated double expression tree — mirrors the Spark
    // plan op for op (see the query entry's numerics note)
    "text_bm25" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS INT) AS dl,
        |    CAST(len(list_filter(string_split(text, ' '), w -> w = 'spark')) AS INT) AS tf0,
        |    CAST(len(list_filter(string_split(text, ' '), w -> w = 'join')) AS INT) AS tf1,
        |    CAST(len(list_filter(string_split(text, ' '), w -> w = 'window')) AS INT) AS tf2
        |  FROM documents),
        |s AS (
        |  SELECT count(1) AS n_docs, sum(dl) AS sum_dl,
        |    sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
        |    sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
        |    sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
        |  FROM t)
        |SELECT doc_id, dl,
        |  round(
        |    round(ln((CAST(n_docs AS DOUBLE) - df0 + 0.5) / (df0 + 0.5) + 1.0), 6)
        |      * (CAST(tf0 AS DOUBLE) * (1.2 + 1))
        |      / (CAST(tf0 AS DOUBLE) + 1.2 * (1 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))
        |  + round(ln((CAST(n_docs AS DOUBLE) - df1 + 0.5) / (df1 + 0.5) + 1.0), 6)
        |      * (CAST(tf1 AS DOUBLE) * (1.2 + 1))
        |      / (CAST(tf1 AS DOUBLE) + 1.2 * (1 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))
        |  + round(ln((CAST(n_docs AS DOUBLE) - df2 + 0.5) / (df2 + 0.5) + 1.0), 6)
        |      * (CAST(tf2 AS DOUBLE) * (1.2 + 1))
        |      / (CAST(tf2 AS DOUBLE) + 1.2 * (1 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))
        |  , 6) AS bm25
        |FROM t CROSS JOIN s
        |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin,
    // identical counts, identical HUGEINT (≡ DECIMAL(38,0)) fixed-point
    // score with truncating division
    "phrase_mining" ->
      """WITH uni AS (
        |  SELECT w, count(1) AS n FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY 1),
        |bi AS (
        |  SELECT ws[i] AS w1, ws[i + 1] AS w2, count(1) AS n_ab FROM (
        |    SELECT string_split(text, ' ') AS ws FROM documents) d,
        |    LATERAL (SELECT unnest(generate_series(1, len(d.ws) - 1)) AS i)
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT b.w1, b.w2, b.n_ab, u1.n AS n_w1, u2.n AS n_w2,
        |    CAST((CAST(b.n_ab - 5 AS HUGEINT) * 1000000000)
        |      // (CAST(u1.n AS HUGEINT) * u2.n) AS BIGINT) AS score_ppb
        |  FROM bi b JOIN uni u1 ON u1.w = b.w1
        |            JOIN uni u2 ON u2.w = b.w2
        |  WHERE b.n_ab >= 8)
        |SELECT * FROM scored WHERE score_ppb > 0
        |ORDER BY score_ppb DESC, w1, w2""".stripMargin,
    // independent positional formulation: per-doc word arrays indexed
    // by LATERAL generate_series, n-grams rebuilt by subscript
    "ngram_counts" ->
      """WITH d AS (SELECT string_split(text, ' ') AS ws FROM documents),
        |uni AS (
        |  SELECT 1 AS n, ws[i] AS gram FROM d,
        |    LATERAL (SELECT unnest(generate_series(1, len(d.ws))) AS i)),
        |bi AS (
        |  SELECT 2 AS n, ws[i] || ' ' || ws[i + 1] AS gram FROM d,
        |    LATERAL (SELECT unnest(generate_series(1, len(d.ws) - 1)) AS i)),
        |tri AS (
        |  SELECT 3 AS n, ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS gram
        |  FROM d,
        |    LATERAL (SELECT unnest(generate_series(1, len(d.ws) - 2)) AS i))
        |SELECT n, gram, count(1) AS cnt
        |FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi
        |      UNION ALL SELECT * FROM tri)
        |GROUP BY 1, 2 HAVING count(1) >= 4
        |ORDER BY cnt DESC, n, gram LIMIT 100""".stripMargin,
  )
}
