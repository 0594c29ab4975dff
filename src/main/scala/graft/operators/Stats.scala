package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  *  - '''MAD outliers''' (`event_mad`): robust outlier detection via the
  *    median absolute deviation — the filter that survives the heavy
  *    tails that break the 3σ rule (`event_outliers` keeps the moment
  *    version for comparison). Exact integer end to end by the ×2 trick:
  *    `percentile()` on an even group lands on a half-integer midpoint,
  *    so 2·median and 2·median-of-deviations (`med2`, `mad4` = 4·MAD)
  *    are exact BIGINTs, and the flag |v−med| > 3·MAD becomes the
  *    integer test 2·dev2 > 3·mad4 — no float compare anywhere. Plan:
  *    two per-type exact-percentile aggs with the 5-row stats frames
  *    broadcast back (exact percentile buffers per group — at 100 TB
  *    swap in the `quantile_hist` fixed-grid edges, same downstream
  *    algebra). DuckDB `quantile_cont` ≡ Spark `percentile` (the
  *    agg_median-pinned equivalence).
  *  - '''RFM segmentation''' (`rfm_segments`): the classic
  *    recency/frequency/monetary customer quartiling. Per-customer
  *    metrics from ONE orders pass (recency = days from last order to
  *    the global max date via a broadcast 1-row anchor); quartile
  *    cutoffs ×4-exact as above, broadcast as ONE row — scoring is a
  *    map-side comparison, NOT a global `ntile` sort, which is the
  *    difference between a KB broadcast and a single-partition sort of
  *    every customer at 100 TB. Output: 4×4×4 segment census.
  *  - '''A/B experiment readout''' (`ab_test`): users deterministically
  *    split into two variants by the shared multiplicative-xorshift
  *    bucket (the same hash every sampler uses, so experiment holdouts
  *    compose with sampling and survive repartitioning), per-user
  *    purchase spend as the metric, Welch's t² from exact integer
  *    moments via the cross-multiplied all-integer identity
  *    t² = (SₐN_b−S_bNₐ)²(Nₐ−1)(N_b−1) /
  *    [(NₐQₐ−Sₐ²)N_b²(N_b−1) + (N_bQ_b−S_b²)Nₐ²(Nₐ−1)] with the >2⁶³
  *    products AND the mean numerators S·10⁶ in DECIMAL(38,0)/HUGEINT
  *    (the `feature_corr` discipline) — no float op, no BIGINT wrap at
  *    any corpus size, bit-identical cross-engine. Plan: one
  *    user-keyed agg, one 2-row variant agg, a 1-row crossed readout —
  *    count(*)-class cost at any corpus size.
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
        // moment combination in DECIMAL(38,0): n·sxy alone is ~1.8·10²⁰
        // at sf100's 600M rows — past 2⁶³ (sf10 just fits, which is how
        // the BIGINT form stayed green there). And the old readout
        // num²·10⁶ needs ~46 digits at sf100 — past decimal(38) AND
        // DuckDB's HUGEINT — so r² is read out STEPWISE,
        // ((|num|·10⁶ div varx) · |num|) div vary: every intermediate
        // stays under 10³⁷ up to ~10¹⁴-row corpora, the ≤ few-ppm
        // truncation skew vs the one-shot division is deterministic and
        // identical cross-engine (all operands non-negative, so Spark's
        // truncating div ≡ DuckDB's floor //; the sign rides corr_sign)
        .selectExpr("x_name", "y_name", "n",
          "CAST(n AS DECIMAL(38,0))*sxy - CAST(sx AS DECIMAL(38,0))*sy AS num",
          "CAST(n AS DECIMAL(38,0))*sxx - CAST(sx AS DECIMAL(38,0))*sx AS varx",
          "CAST(n AS DECIMAL(38,0))*syy - CAST(sy AS DECIMAL(38,0))*sy AS vary")
        .selectExpr("x_name", "y_name", "n",
          "CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END AS INT) AS corr_sign",
          "CAST(((abs(num) * 1000000) div varx) * abs(num) div vary AS BIGINT) AS r2_ppm")
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

    // Median-absolute-deviation outlier census per event type; ×2/×4
    // integer-exact percentiles, broadcast stats, integer-only flag.
    "event_mad" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))
      val med = ev.groupBy(col("event_type"))
        .agg((expr("percentile(c, 0.5)") * 2).cast("long").as("med2"))
      // size-gated share (r17): dev feeds the MAD percentile AND the
      // outlier census — un-materialized, the event scan + median join
      // runs twice (plan-verified 4 scans; shared, 2 — the two
      // percentile passes the algorithm fundamentally needs). Narrow
      // (type, med2, dev2) rows.
      val dev = graft.PlanShare.shared(ev.join(broadcast(med), "event_type")
        .select(col("event_type"), col("med2"),
          abs(col("c") * 2 - col("med2")).as("dev2")))
      val mad = dev.groupBy(col("event_type"))
        .agg(min(col("med2")).as("med2"), count(lit(1)).as("n"),
          (expr("percentile(dev2, 0.5)") * 2).cast("long").as("mad4"))
      dev.drop("med2").join(broadcast(mad), "event_type")
        .groupBy(col("event_type"), col("n"), col("med2"), col("mad4"))
        .agg(sum(when(col("dev2") * 2 > col("mad4") * 3, 1L).otherwise(0L))
          .as("n_outliers"))
        .select(col("event_type"), col("n"), col("med2"), col("mad4"),
          col("n_outliers"))
        .orderBy(col("event_type"))
    }),

    // Mutual information between two categoricals (segment × nation) in
    // integer micro-nats: MI = Σ n_xy·(ln n_xy + ln N − ln n_x − ln n_y)/N
    // with every ln 6-dp-rounded ONCE (the token_entropy trick), exact
    // integer arithmetic after. Marginal entropies + normalized MI ride
    // along. Plan: one (x, y) grid agg over the table; everything after
    // is grid-sized (≤ |segments|×|nations| rows) with broadcast
    // marginals — count(*)-class cost at any scale.
    "feature_mi" -> ((s, d) => {
      def l6(c: Column): Column =
        round(log(c.cast("double")) * 1e6).cast("long")
      val cust = Tables.customer(s, d)
        .select(col("c_mktsegment").as("x"), col("c_nationkey").as("y"))
      val grid = cust.groupBy(col("x"), col("y"))
        .agg(count(lit(1)).as("nxy"))
      val nx = grid.groupBy(col("x")).agg(sum(col("nxy")).as("nx"))
      val ny = grid.groupBy(col("y")).agg(sum(col("nxy")).as("ny"))
      val n = grid.agg(sum(col("nxy")).as("n"))
      val mi = grid.join(broadcast(nx), "x").join(broadcast(ny), "y")
        .crossJoin(broadcast(n))
        .agg(sum(col("nxy") * (l6(col("nxy")) + l6(col("n"))
          - l6(col("nx")) - l6(col("ny")))).as("mi_num"))
      val sx = nx.agg(sum(col("nx") * l6(col("nx"))).as("sxl"),
        count(lit(1)).as("card_x"))
      val sy = ny.agg(sum(col("ny") * l6(col("ny"))).as("syl"),
        count(lit(1)).as("card_y"))
      n.crossJoin(broadcast(mi)).crossJoin(broadcast(sx))
        .crossJoin(broadcast(sy))
        .selectExpr("n", "card_x", "card_y",
          "mi_num div n AS mi_micronats",
          "CAST(round(ln(CAST(n AS DOUBLE))*1000000) AS BIGINT) - (sxl div n) AS hx_micronats",
          "CAST(round(ln(CAST(n AS DOUBLE))*1000000) AS BIGINT) - (syl div n) AS hy_micronats")
        .selectExpr("n", "card_x", "card_y", "mi_micronats",
          "hx_micronats", "hy_micronats",
          """CASE WHEN least(hx_micronats, hy_micronats) <= 0 THEN NULL
            |ELSE (mi_micronats * 1000000L) div least(hx_micronats, hy_micronats)
            |END AS nmi_ppm""".stripMargin)
    }),

    // Recency/frequency/monetary quartile census over orders; cutoffs
    // ×4-exact, broadcast, scored by map-side comparison (no ntile sort).
    "rfm_segments" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_custkey"),
        to_date(col("o_orderdate")).as("day"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      // r17: the per-customer aggregate carries max(day) instead of
      // pre-joining the global anchor onto every order row: datediff
      // is monotone in `day`, so min(datediff(dmax, day)) ==
      // datediff(dmax, max(day)) exactly, and the global anchor is the
      // max over the small per-cust frame — the corpus-side broadcast
      // join (and the anchor's separate corpus scan) are gone at every
      // scale. rfm0 is |custs| narrow rows with three consumers
      // (anchor, cutoffs, scoring) — size-gated share.
      val rfm0 = graft.PlanShare.shared(o.groupBy(col("o_custkey"))
        .agg(max(col("day")).as("dmax_c"),
          count(lit(1)).as("f_orders"), sum(col("cents")).as("m_cents")))
      val anchor = rfm0.agg(max(col("dmax_c")).as("dmax"))
      val rfm = rfm0.crossJoin(broadcast(anchor))
        .select(col("o_custkey"),
          datediff(col("dmax"), col("dmax_c")).cast("long").as("r_days"),
          col("f_orders"), col("m_cents"))
      def cut4(c: String, q: Double): Column =
        (expr(s"percentile($c, $q)") * 4).cast("long")
      val cuts = rfm.agg(
        cut4("r_days", 0.25).as("r1"), cut4("r_days", 0.5).as("r2"),
        cut4("r_days", 0.75).as("r3"),
        cut4("f_orders", 0.25).as("f1"), cut4("f_orders", 0.5).as("f2"),
        cut4("f_orders", 0.75).as("f3"),
        cut4("m_cents", 0.25).as("m1"), cut4("m_cents", 0.5).as("m2"),
        cut4("m_cents", 0.75).as("m3"))
      def score(metric: Column, c1: Column, c2: Column, c3: Column): Column =
        lit(1) + (metric * 4 > c1).cast("int") +
          (metric * 4 > c2).cast("int") + (metric * 4 > c3).cast("int")
      rfm.crossJoin(broadcast(cuts))
        .select(col("m_cents"),
          score(col("r_days"), col("r1"), col("r2"), col("r3")).as("r_q"),
          score(col("f_orders"), col("f1"), col("f2"), col("f3")).as("f_q"),
          score(col("m_cents"), col("m1"), col("m2"), col("m3")).as("m_q"))
        .groupBy(col("r_q"), col("f_q"), col("m_q"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("m_cents")).as("monetary_cents"))
        .orderBy(col("r_q"), col("f_q"), col("m_q"))
    }),

    // Welch two-sample test on per-user purchase spend, variants from
    // the shared xorshift bucket; exact integer moments, DECIMAL(38,0)
    // headroom for the crossed products, t² as exact ppm. 3841600 ppm
    // = 1.96² — the large-df 95% two-sided threshold.
    "ab_test" -> ((s, d) => {
      val users = Tables.events(s, d).groupBy(col("user_id"))
        .agg(coalesce(sum(when(col("event_type") === "purchase",
          (col("value").cast("decimal(18,2)") * 100).cast("long"))), lit(0L))
          .as("spend"))
      val v = users
        .withColumn("variant",
          when(graft.pipeline.CorpusOps.bucket1M(col("user_id")) < 500000,
            lit("A")).otherwise(lit("B")))
        .groupBy(col("variant"))
        .agg(count(lit(1)).as("n"), sum(col("spend")).as("ss"),
          sum(col("spend") * col("spend")).as("qq"))
      // fold the 2-row variant frame into one wide row by conditional
      // aggregation — a filter-per-variant + cross join would recompute
      // the whole user aggregation subtree once per side
      val ab = v.agg(
        sum(when(col("variant") === "A", col("n"))).as("n_a"),
        sum(when(col("variant") === "A", col("ss"))).as("s_a"),
        sum(when(col("variant") === "A", col("qq"))).as("q_a"),
        sum(when(col("variant") === "B", col("n"))).as("n_b"),
        sum(when(col("variant") === "B", col("ss"))).as("s_b"),
        sum(when(col("variant") === "B", col("qq"))).as("q_b"))
      ab
        // an empty variant leaves one all-NULL conditional-agg row while
        // the oracle's A×B self-join emits zero rows — drop it so both
        // engines agree on the degenerate shape too
        .filter(col("n_a").isNotNull && col("n_b").isNotNull)
        .selectExpr("n_a", "n_b", "s_a", "s_b",
          "CAST(n_a AS DECIMAL(38,0))*q_a - CAST(s_a AS DECIMAL(38,0))*s_a AS va",
          "CAST(n_b AS DECIMAL(38,0))*q_b - CAST(s_b AS DECIMAL(38,0))*s_b AS vb")
        // DIVIDE-EARLY fixed point (round-13 sf10 gate catch): the
        // single-rational form `diff²(na−1)(nb−1)·10⁶ div D` grows as
        // n⁶ (measured 7.9e44 at sf10's 150k users) — past DECIMAL(38,0)
        // AND DuckDB's HUGEINT, i.e. no 128-bit engine can hold it at
        // scale. Instead: exact truncated means in micro-cents (md),
        // exact truncated per-variant SE² in cents²·10⁶ (se2), then
        // t2_ppm = md² div (se2_a + se2_b) — the 10⁶ unit factors cancel
        // into exactly ppm. Every operand is now bounded by data
        // magnitudes, not cross-multiplied counts: va·10⁶ ≈ 5.7e28 at
        // sf100 (headroom through sf10⁵), md² ≤ 3.4e22, se2 peaks ~3e16
        // at n = 2 and SHRINKS with n — fits BIGINT at every SF. Both
        // engines replay the SAME truncation points (`div` here, `//`
        // in DuckDB), so results stay bit-identical; truncation error
        // vs the exact rational is ≤ 1 unit of each fixed-point term —
        // irrelevant at ppm resolution. n < 2 → NULL (a one-user
        // variant has no variance), matching the old D = 0 degenerate
        // path.
        .selectExpr("n_a", "n_b",
          "CAST(CAST(s_a AS DECIMAL(38,0)) * 1000000 div n_a AS BIGINT) AS mean_a_ucents",
          "CAST(CAST(s_b AS DECIMAL(38,0)) * 1000000 div n_b AS BIGINT) AS mean_b_ucents",
          """CASE WHEN n_a < 2 THEN NULL
            |ELSE va * 1000000 div (CAST(n_a AS DECIMAL(38,0)) * n_a * (n_a - 1))
            |END AS se2_a""".stripMargin,
          """CASE WHEN n_b < 2 THEN NULL
            |ELSE vb * 1000000 div (CAST(n_b AS DECIMAL(38,0)) * n_b * (n_b - 1))
            |END AS se2_b""".stripMargin)
        .selectExpr("n_a", "n_b", "mean_a_ucents", "mean_b_ucents",
          """CASE WHEN se2_a IS NULL OR se2_b IS NULL OR se2_a + se2_b = 0
            |  THEN NULL
            |ELSE CAST(mean_a_ucents - mean_b_ucents AS DECIMAL(38,0))
            |  * (mean_a_ucents - mean_b_ucents) div (se2_a + se2_b)
            |END AS t2_ppm""".stripMargin)
        .selectExpr("n_a", "n_b", "mean_a_ucents", "mean_b_ucents", "t2_ppm",
          "CAST(t2_ppm > 3841600 AS INT) AS significant")
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
        |    CAST(n AS HUGEINT)*sxy - CAST(sx AS HUGEINT)*sy AS num,
        |    CAST(n AS HUGEINT)*sxx - CAST(sx AS HUGEINT)*sx AS varx,
        |    CAST(n AS HUGEINT)*syy - CAST(sy AS HUGEINT)*sy AS vary
        |  FROM p)
        |SELECT x_name, y_name, n,
        |  CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END AS INT)
        |    AS corr_sign,
        |  CAST(((abs(num) * 1000000) // varx) * abs(num) // vary AS BIGINT)
        |    AS r2_ppm
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
    "event_mad" ->
      """WITH ev AS (
        |  SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT) AS c
        |  FROM events),
        |med AS (SELECT event_type,
        |    CAST(quantile_cont(c, 0.5)*2 AS BIGINT) AS med2
        |  FROM ev GROUP BY 1),
        |dev AS (SELECT ev.event_type, med.med2,
        |    abs(2*ev.c - med.med2) AS dev2
        |  FROM ev JOIN med USING (event_type)),
        |md AS (SELECT event_type, min(med2) AS med2, count(1) AS n,
        |    CAST(quantile_cont(dev2, 0.5)*2 AS BIGINT) AS mad4
        |  FROM dev GROUP BY 1)
        |SELECT d.event_type, m.n, m.med2, m.mad4,
        |  CAST(sum(CASE WHEN 2*d.dev2 > 3*m.mad4 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers
        |FROM dev d JOIN md m USING (event_type)
        |GROUP BY d.event_type, m.n, m.med2, m.mad4
        |ORDER BY d.event_type""".stripMargin,
    "feature_mi" ->
      """WITH g AS (
        |  SELECT c_mktsegment AS x, c_nationkey AS y, count(1) AS nxy
        |  FROM customer GROUP BY 1, 2),
        |mx AS (SELECT x, CAST(sum(nxy) AS BIGINT) AS nx FROM g GROUP BY 1),
        |my AS (SELECT y, CAST(sum(nxy) AS BIGINT) AS ny FROM g GROUP BY 1),
        |tot AS (SELECT CAST(sum(nxy) AS BIGINT) AS n FROM g),
        |mi AS (
        |  SELECT CAST(sum(nxy * (
        |      CAST(round(ln(CAST(nxy AS DOUBLE))*1000000) AS BIGINT)
        |    + CAST(round(ln(CAST(n AS DOUBLE))*1000000) AS BIGINT)
        |    - CAST(round(ln(CAST(nx AS DOUBLE))*1000000) AS BIGINT)
        |    - CAST(round(ln(CAST(ny AS DOUBLE))*1000000) AS BIGINT)))
        |    AS BIGINT) AS mi_num
        |  FROM g JOIN mx USING (x) JOIN my USING (y) CROSS JOIN tot),
        |sx AS (SELECT CAST(sum(nx *
        |    CAST(round(ln(CAST(nx AS DOUBLE))*1000000) AS BIGINT)) AS BIGINT)
        |    AS sxl, count(1) AS card_x FROM mx),
        |sy AS (SELECT CAST(sum(ny *
        |    CAST(round(ln(CAST(ny AS DOUBLE))*1000000) AS BIGINT)) AS BIGINT)
        |    AS syl, count(1) AS card_y FROM my),
        |h AS (
        |  SELECT n, card_x, card_y,
        |    mi_num // n AS mi_micronats,
        |    CAST(round(ln(CAST(n AS DOUBLE))*1000000) AS BIGINT) - (sxl // n)
        |      AS hx_micronats,
        |    CAST(round(ln(CAST(n AS DOUBLE))*1000000) AS BIGINT) - (syl // n)
        |      AS hy_micronats
        |  FROM tot CROSS JOIN mi CROSS JOIN sx CROSS JOIN sy)
        |SELECT n, card_x, card_y, mi_micronats, hx_micronats, hy_micronats,
        |  CASE WHEN least(hx_micronats, hy_micronats) <= 0 THEN NULL
        |  ELSE (mi_micronats * 1000000) // least(hx_micronats, hy_micronats)
        |  END AS nmi_ppm
        |FROM h""".stripMargin,
    "rfm_segments" ->
      """WITH o AS (
        |  SELECT o_custkey, CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) AS cents
        |  FROM orders),
        |a AS (SELECT max(day) AS dmax FROM o),
        |rfm AS (SELECT o_custkey,
        |    CAST(min(datediff('day', day, a.dmax)) AS BIGINT) AS r_days,
        |    count(1) AS f_orders, CAST(sum(cents) AS BIGINT) AS m_cents
        |  FROM o CROSS JOIN a GROUP BY 1),
        |cut AS (SELECT
        |    CAST(quantile_cont(r_days, 0.25)*4 AS BIGINT) AS r1,
        |    CAST(quantile_cont(r_days, 0.5)*4 AS BIGINT) AS r2,
        |    CAST(quantile_cont(r_days, 0.75)*4 AS BIGINT) AS r3,
        |    CAST(quantile_cont(f_orders, 0.25)*4 AS BIGINT) AS f1,
        |    CAST(quantile_cont(f_orders, 0.5)*4 AS BIGINT) AS f2,
        |    CAST(quantile_cont(f_orders, 0.75)*4 AS BIGINT) AS f3,
        |    CAST(quantile_cont(m_cents, 0.25)*4 AS BIGINT) AS m1,
        |    CAST(quantile_cont(m_cents, 0.5)*4 AS BIGINT) AS m2,
        |    CAST(quantile_cont(m_cents, 0.75)*4 AS BIGINT) AS m3
        |  FROM rfm)
        |SELECT
        |  1 + CAST(4*r_days > r1 AS INT) + CAST(4*r_days > r2 AS INT)
        |    + CAST(4*r_days > r3 AS INT) AS r_q,
        |  1 + CAST(4*f_orders > f1 AS INT) + CAST(4*f_orders > f2 AS INT)
        |    + CAST(4*f_orders > f3 AS INT) AS f_q,
        |  1 + CAST(4*m_cents > m1 AS INT) + CAST(4*m_cents > m2 AS INT)
        |    + CAST(4*m_cents > m3 AS INT) AS m_q,
        |  count(1) AS n_customers, CAST(sum(m_cents) AS BIGINT) AS monetary_cents
        |FROM rfm CROSS JOIN cut GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // identical bucket hash, identical integer Welch identity, HUGEINT
    // for the crossed products like Spark's DECIMAL(38,0)
    "ab_test" ->
      """WITH u AS (
        |  SELECT user_id,
        |    coalesce(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT) END), 0)
        |      AS spend
        |  FROM events GROUP BY 1),
        |v AS (
        |  SELECT CASE WHEN xor((user_id % 1000003) * 2654435761,
        |      ((user_id % 1000003) * 2654435761) >> 13) % 1000000 < 500000
        |      THEN 'A' ELSE 'B' END AS variant,
        |    count(1) AS n, CAST(sum(spend) AS BIGINT) AS ss,
        |    CAST(sum(spend*spend) AS BIGINT) AS qq
        |  FROM u GROUP BY 1),
        |ab AS (
        |  SELECT a.n AS n_a, a.ss AS s_a, a.qq AS q_a,
        |         b.n AS n_b, b.ss AS s_b, b.qq AS q_b
        |  FROM v a, v b WHERE a.variant = 'A' AND b.variant = 'B'),
        |t AS (
        |  SELECT n_a, n_b, s_a, s_b,
        |    CAST(n_a AS HUGEINT)*q_a - CAST(s_a AS HUGEINT)*s_a AS va,
        |    CAST(n_b AS HUGEINT)*q_b - CAST(s_b AS HUGEINT)*s_b AS vb
        |  FROM ab),
        |m AS (
        |  SELECT n_a, n_b,
        |    CAST(CAST(s_a AS HUGEINT) * 1000000 // n_a AS BIGINT) AS mean_a_ucents,
        |    CAST(CAST(s_b AS HUGEINT) * 1000000 // n_b AS BIGINT) AS mean_b_ucents,
        |    CASE WHEN n_a < 2 THEN NULL
        |    ELSE va * 1000000 // (CAST(n_a AS HUGEINT) * n_a * (n_a - 1))
        |    END AS se2_a,
        |    CASE WHEN n_b < 2 THEN NULL
        |    ELSE vb * 1000000 // (CAST(n_b AS HUGEINT) * n_b * (n_b - 1))
        |    END AS se2_b
        |  FROM t),
        |r AS (
        |  SELECT n_a, n_b, mean_a_ucents, mean_b_ucents,
        |    CASE WHEN se2_a IS NULL OR se2_b IS NULL OR se2_a + se2_b = 0
        |      THEN NULL
        |    ELSE CAST(CAST(mean_a_ucents - mean_b_ucents AS HUGEINT)
        |      * (mean_a_ucents - mean_b_ucents)
        |      // (se2_a + se2_b) AS BIGINT)
        |    END AS t2_ppm
        |  FROM m)
        |SELECT n_a, n_b, mean_a_ucents, mean_b_ucents, t2_ppm,
        |  CAST(t2_ppm > 3841600 AS INT) AS significant
        |FROM r""".stripMargin,
  )
}
