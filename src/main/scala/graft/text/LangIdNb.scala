package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Trained Naive-Bayes language identification — the model-based
  * counterpart of `text_langid`'s fixed-dictionary heuristic: the
  * classifier is TRAINED in-query from the corpus's own (lang, word)
  * counts (add-one smoothing), every document is scored against every
  * language, and the output is the confusion matrix against the stored
  * labels — the exact eval loop a curation pipeline runs to decide
  * whether its language router is good enough to gate ingestion on.
  *
  * Score arithmetic is the repo's integer micro-nat discipline (see
  * `token_entropy` / `feature_mi`): each ln is rounded to 6 dp ONCE
  * (`CAST(round(ln(x)·10⁶) AS BIGINT)`), everything after is exact
  * integer multiply/add, so scores and argmaxes are bit-identical
  * cross-engine — no float-sum ordering hazards.
  *
  *   score(d, L) = ln n_docs(L)                       (prior, micro-nats)
  *              + Σ_w c_d(w) · ln(c_L(w) + 1)         (per-word evidence)
  *              − n_tok(d) · ln(tot_L + V)            (smoothing mass)
  *
  * The missing-word case costs nothing by construction: ln(0 + 1) = 0,
  * so the evidence join is a plain INNER join on the (lang, word) table
  * and absent pairs contribute exactly their true value. The smoothing
  * term needs only the doc's token count.
  *
  * Scale shape: training is ONE vocab-bounded (lang, word) aggregation;
  * the model (langs × vocab rows, plus a langs-row totals frame) is
  * broadcast. Per-doc scoring shuffles doc-word counts once (corpus-token
  * bounded, the `skipgram_pairs` budget), the doc × lang score grid is
  * |docs|·|langs| rows on a doc-keyed window, and the confusion matrix
  * collapses to langs² rows. No stage ever holds more than one corpus
  * pass of state.
  *
  * Reference scope: no classifier surface exists in the reference (string
  * columns are only grouped/compared, /root/reference/src/
  * QueryProcessor1.java); LLM-pipeline extension per the build brief.
  */
object LangIdNb {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "langid_nb" -> ((s, d) => {
      // per-doc word multiplicities computed IN-ROW (word_counts
      // kernel): the (doc, word) collapse happens at the scan, so no
      // corpus-token stream ever reaches an exchange — the evidence
      // side ships one row per DISTINCT (doc, word) straight into the
      // join, and model training partial-aggregates pre-collapsed
      // counts instead of raw tokens.
      //
      // ONE tokenize pass at scale (r17): the exploded (doc, lang,
      // word, count) frame feeds BOTH the evidence stream and the
      // model training — the previous form re-ran the word_counts scan
      // for docWords, langTot, vocab and the evidence-join model side
      // (4 full text parses, plan-verified). PlanShare.shared
      // materializes dw (the same distinct-(doc, word) volume the
      // evidence join already shuffles) and langWord (langs × vocab
      // rows) once the corpus is big enough that re-tokenizing
      // dominates; below the gate the recompute is cheaper than the
      // barrier (measured at sf0.1) and the plan falls back to it.
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang").as("true_lang"),
          size(split(col("text"), " ")).cast("long").as("n_tok"),
          TextExprs.wordCounts(col("text")).as("wc"))
      val dw = graft.PlanShare.shared(docs
        .select(col("doc_id"), col("true_lang"), explode(col("wc")).as("p"))
        .select(col("doc_id"), col("true_lang"),
          col("p.w").as("w"), col("p.c").as("c")))
      val docWords = dw.select(col("doc_id"), col("w"), col("c"))
      // model: (lang, word) counts + per-lang totals, V = corpus vocab
      val langWord = graft.PlanShare.shared(dw
        .groupBy(col("true_lang").as("lang"), col("w"))
        .agg(sum(col("c")).as("cw")))
      val vocab = langWord.agg(
        count_distinct(col("w")).as("v")) // 1 row
      val langTot = langWord
        .groupBy(col("lang"))
        .agg(sum(col("cw")).as("tot"))
        .crossJoin(broadcast(vocab))
        .select(col("lang"),
          expr("CAST(round(ln(CAST(tot + v AS DOUBLE)) * 1000000) AS BIGINT)")
            .as("ln_tot_v"))
      val langPrior = Tables.documents(s, d)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("nd"))
        .select(col("lang"),
          expr("CAST(round(ln(CAST(nd AS DOUBLE)) * 1000000) AS BIGINT)")
            .as("prior"))
      val model = langWord.select(col("lang"), col("w"),
        expr("CAST(round(ln(CAST(cw + 1 AS DOUBLE)) * 1000000) AS BIGINT)")
          .as("ln_c1"))
      // evidence: inner join is exact (absent (lang, word) ⇒ ln 1 = 0).
      // UNHINTED: the (lang, word) model is vocabulary-scaled — a
      // forced broadcast would grow with the corpus; `w` hash-
      // partitions uniformly (the lang-bounded prior/total frames
      // below stay broadcast — they are |langs| rows at any scale)
      val evidence = docWords
        .join(model.hint("shuffle_hash"), "w")
        .groupBy(col("doc_id"), col("lang"))
        .agg(sum(col("c") * col("ln_c1")).as("t1"))
      // every doc × every lang, then the two broadcast model frames
      val scored = docs.select(col("doc_id"), col("true_lang"), col("n_tok"))
        .crossJoin(broadcast(langPrior))
        .join(broadcast(langTot), "lang")
        .join(evidence, Seq("doc_id", "lang"), "left")
        .select(col("doc_id"), col("true_lang"), col("lang"),
          (col("prior") + coalesce(col("t1"), lit(0L)) -
            col("n_tok") * col("ln_tot_v")).as("score"))
      // per-doc argmax as a hash-aggregated struct-min — (score desc,
      // lang asc) tie-break encoded as min(struct(-score, lang)), so the
      // doc×lang grid collapses in a partial-aggregating HashAggregate
      // instead of a full (doc_id)-window SORT of |docs|·|langs| rows
      val pred = scored
        .groupBy(col("doc_id"), col("true_lang"))
        .agg(min(struct((-col("score")).as("ns"), col("lang").as("lang")))
          .as("m"))
      pred.groupBy(col("true_lang"), col("m.lang").as("pred_lang"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("true_lang"), col("pred_lang"))
    }))

  def oracle: Map[String, String] = Map(
    "langid_nb" ->
      """WITH doc_words AS (
        |  SELECT doc_id, w, count(*)::BIGINT AS c
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |        FROM documents)
        |  GROUP BY doc_id, w),
        |lang_word AS (
        |  SELECT lang, w, count(*)::BIGINT AS cw
        |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS w
        |        FROM documents)
        |  GROUP BY lang, w),
        |vocab AS (SELECT count(DISTINCT w) AS v FROM lang_word),
        |lang_tot AS (
        |  SELECT lang,
        |         CAST(round(ln(CAST(tot + v AS DOUBLE)) * 1000000) AS BIGINT)
        |           AS ln_tot_v
        |  FROM (SELECT lang, sum(cw) AS tot FROM lang_word GROUP BY lang),
        |       vocab),
        |lang_prior AS (
        |  SELECT lang,
        |         CAST(round(ln(CAST(count(*) AS DOUBLE)) * 1000000) AS BIGINT)
        |           AS prior
        |  FROM documents GROUP BY lang),
        |model AS (
        |  SELECT lang, w,
        |         CAST(round(ln(CAST(cw + 1 AS DOUBLE)) * 1000000) AS BIGINT)
        |           AS ln_c1
        |  FROM lang_word),
        |evidence AS (
        |  SELECT dw.doc_id, m.lang, sum(dw.c * m.ln_c1)::BIGINT AS t1
        |  FROM doc_words dw JOIN model m USING (w)
        |  GROUP BY dw.doc_id, m.lang),
        |docs AS (
        |  SELECT doc_id, lang AS true_lang,
        |         len(string_split(text, ' '))::BIGINT AS n_tok
        |  FROM documents),
        |scored AS (
        |  SELECT d.doc_id, d.true_lang, p.lang,
        |         p.prior + coalesce(e.t1, 0) - d.n_tok * t.ln_tot_v AS score
        |  FROM docs d
        |  CROSS JOIN lang_prior p
        |  JOIN lang_tot t USING (lang)
        |  LEFT JOIN evidence e ON e.doc_id = d.doc_id AND e.lang = p.lang),
        |pred AS (
        |  SELECT true_lang, lang AS pred_lang
        |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
        |          ORDER BY score DESC, lang) AS rk
        |        FROM scored)
        |  WHERE rk = 1)
        |SELECT true_lang, pred_lang, count(*)::BIGINT AS n_docs
        |FROM pred
        |GROUP BY true_lang, pred_lang
        |ORDER BY true_lang, pred_lang""".stripMargin)
}
