package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Distributed descriptive statistics over the fact tables — the profiling
  * pass a training-data pipeline runs before deciding what to filter,
  * rebalance, or drop (north-star surface; the reference's engine has no
  * statistics beyond its five aggregate kernels — SURVEY.md §2.2):
  *
  *  - '''Correlation matrix''' (`feature_corr`): pairwise Pearson r over
  *    the lineitem measures, computed from one single-pass aggregate of
  *    the 10 raw moments (n, Σx, Σxy, Σx² per pair). The measures live on
  *    exact fixed-point grids (quantity integer, discount/tax on a 0.01
  *    grid), so every moment is an exact BIGINT and r is reported as an
  *    exact integer: `corr_sign` = sign(cov) and `r2_ppm` =
  *    ⌊num²·10⁶ / (varx·vary)⌋ with the >2⁶³ products carried in
  *    DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — no float op anywhere, so
  *    the result is bit-identical cross-engine and partitioning-
  *    independent. Plan shape at 100 TB: scan → map-side partial moments
  *    → ONE 1-row exchange — the same cost as `count(*)`. Headroom: the
  *    BIGINT moments are exact to ~10¹² rows (Σx² ≤ 2500n); the derived
  *    num²·10⁶ term is exact in 38 digits to ~10⁹ rows — past that,
  *    pre-scale the moments (shift num/var right until they fit) or
  *    center on a first-pass mean; the single-pass shape is unchanged.
  *  - '''Token entropy''' (`token_entropy`): per-language Shannon entropy
  *    of the unigram distribution, H = ln N − (Σ c·ln c)/N — the
  *    diversity score used to spot boilerplate-dominated or template
  *    languages (low H) before mixing. Integer micro-nats end to end:
  *    each ln is rounded to 6 dp ONCE (`round(ln(c)·10⁶)` — kills the
  *    ≤1-ulp libm divergence between JVM `Math.log` and DuckDB's libm,
  *    the same trick the green `text_bm25`/`scalar_math` oracles pin),
  *    then everything downstream is exact integer sum/div. Type-token
  *    ratio (`ttr_ppm`) rides along free. Plan shape: one word-count
  *    shuffle keyed by (lang, word) with map-side combine — the count
  *    frame is vocabulary-sized (≪ corpus) — then a lang-keyed rollup.
  *    The c·⌊10⁶·ln c⌋ terms stay under 2⁶³ to ~10¹⁴ tokens per word.
  */
object Stats {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Pairwise Pearson over (quantity, discount, tax) — one pass, ten
    // exact BIGINT moments, three rows out via stack(). round(x*100)
    // recovers the exact grid integer (0.07*100 = 7.000…001 in IEEE;
    // both engines run the identical multiply-then-round).
    "feature_corr" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(
        col("l_quantity").cast("long").as("q"),
        round(col("l_discount") * 100).cast("long").as("dd"),
        round(col("l_tax") * 100).cast("long").as("tt"))
      val m = li.agg(
        count(lit(1)).as("n"),
        sum("q").as("sq"), sum("dd").as("sd"), sum("tt").as("st"),
        sum(col("q") * col("q")).as("sqq"),
        sum(col("dd") * col("dd")).as("sdd"),
        sum(col("tt") * col("tt")).as("stt"),
        sum(col("q") * col("dd")).as("sqd"),
        sum(col("q") * col("tt")).as("sqt"),
        sum(col("dd") * col("tt")).as("sdt"))
      m.selectExpr("n",
          """stack(3,
            |  'quantity', 'discount', sq, sd, sqq, sdd, sqd,
            |  'quantity', 'tax',      sq, st, sqq, stt, sqt,
            |  'discount', 'tax',      sd, st, sdd, stt, sdt
            |) AS (x_name, y_name, sx, sy, sxx, syy, sxy)""".stripMargin)
        .selectExpr("x_name", "y_name", "n",
          "n*sxy - sx*sy AS num",
          "n*sxx - sx*sx AS varx",
          "n*syy - sy*sy AS vary")
        .selectExpr("x_name", "y_name", "n",
          "CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END AS INT) AS corr_sign",
          """CAST((CAST(num AS DECIMAL(38,0)) * num * 1000000)
            |  div (CAST(varx AS DECIMAL(38,0)) * vary) AS BIGINT) AS r2_ppm""".stripMargin)
        .orderBy(col("x_name"), col("y_name"))
    }),

    // Per-language unigram Shannon entropy + type-token ratio, integer
    // micro-nats (6-dp-rounded ln, exact integer arithmetic after).
    "token_entropy" -> ((s, d) => {
      val c = Tables.documents(s, d)
        .select(col("lang"), explode(split(col("text"), " ")).as("w"))
        .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("c"))
      c.groupBy(col("lang")).agg(
          sum("c").as("n_tokens"),
          count(lit(1)).as("vocab"),
          sum(col("c") * round(log(col("c").cast("double")) * 1e6).cast("long"))
            .as("sum_clnc"))
        .selectExpr("lang", "n_tokens", "vocab",
          "CAST(round(ln(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT) - (sum_clnc div n_tokens) AS entropy_micronats",
          "(vocab * 1000000L) div n_tokens AS ttr_ppm")
        .orderBy(col("lang"))
    }),
  )

  def oracle: Map[String, String] = Map(
    // identical moment tree; sums pinned back to BIGINT (DuckDB sums
    // BIGINT into HUGEINT, which pandas would lossily float64), the two
    // >2⁶³ products carried in HUGEINT like Spark's DECIMAL(38,0)
    "feature_corr" ->
      """WITH g AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS q,
        |         CAST(round(l_discount*100) AS BIGINT) AS dd,
        |         CAST(round(l_tax*100) AS BIGINT) AS tt
        |  FROM lineitem),
        |m AS (
        |  SELECT count(1) AS n,
        |    CAST(sum(q) AS BIGINT) AS sq, CAST(sum(dd) AS BIGINT) AS sd,
        |    CAST(sum(tt) AS BIGINT) AS st,
        |    CAST(sum(q*q) AS BIGINT) AS sqq, CAST(sum(dd*dd) AS BIGINT) AS sdd,
        |    CAST(sum(tt*tt) AS BIGINT) AS stt,
        |    CAST(sum(q*dd) AS BIGINT) AS sqd, CAST(sum(q*tt) AS BIGINT) AS sqt,
        |    CAST(sum(dd*tt) AS BIGINT) AS sdt
        |  FROM g),
        |p AS (
        |  SELECT 'quantity' AS x_name, 'discount' AS y_name, n,
        |         sq AS sx, sd AS sy, sqq AS sxx, sdd AS syy, sqd AS sxy FROM m
        |  UNION ALL SELECT 'quantity', 'tax', n, sq, st, sqq, stt, sqt FROM m
        |  UNION ALL SELECT 'discount', 'tax', n, sd, st, sdd, stt, sdt FROM m),
        |d AS (
        |  SELECT x_name, y_name, n,
        |    n*sxy - sx*sy AS num, n*sxx - sx*sx AS varx, n*syy - sy*sy AS vary
        |  FROM p)
        |SELECT x_name, y_name, n,
        |  CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END AS INT)
        |    AS corr_sign,
        |  CAST((CAST(num AS HUGEINT) * num * 1000000)
        |    // (CAST(varx AS HUGEINT) * vary) AS BIGINT) AS r2_ppm
        |FROM d ORDER BY x_name, y_name""".stripMargin,
    "token_entropy" ->
      """WITH w AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents),
        |c AS (SELECT lang, w, count(1) AS c FROM w GROUP BY 1, 2),
        |l AS (
        |  SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    count(1) AS vocab,
        |    CAST(sum(c * CAST(round(ln(CAST(c AS DOUBLE))*1000000) AS BIGINT))
        |      AS BIGINT) AS sum_clnc
        |  FROM c GROUP BY 1)
        |SELECT lang, n_tokens, vocab,
        |  CAST(round(ln(CAST(n_tokens AS DOUBLE))*1000000) AS BIGINT)
        |    - (sum_clnc // n_tokens) AS entropy_micronats,
        |  (vocab * 1000000) // n_tokens AS ttr_ppm
        |FROM l ORDER BY lang""".stripMargin,
  )
}
