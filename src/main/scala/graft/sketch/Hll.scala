package graft.sketch

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** HyperLogLog-style distinct counting over the event stream — the
  * third fixed-size sketch next to [[CountMin]] (frequency) and
  * [[Bloom]] (membership): "how many distinct users per event type"
  * without the user-keyed distinct shuffle that `COUNT(DISTINCT)`
  * costs at 100 TB. The sketch is m=32 registers per group; build is
  * ONE scan emitting (group, register, rho) with map-side max-combine
  * down to ≤ groups×m rows — shuffle volume is constant in event
  * count, and registers max-merge losslessly across shards (the same
  * linearity CM/Bloom pin for counters/bits).
  *
  * `agg_approx_distinct` already covers Spark's own HLL++ — which is
  * rows-only at the oracle because its hash is engine-private. This
  * operator exists to make the ALGORITHM oracle-checkable: every step
  * is deterministic integer arithmetic — the shared multiplicative-
  * xorshift mix on user_id, register = low 5 bits, rho = trailing
  * zeros of the remaining bits via `bit_count((w & -w) - 1) + 1`
  * (Flajolet's leftmost-1 statistic on the bit-reversed word; the
  * geometric distribution is identical), the harmonic sum in fixed
  * point 2⁻²⁰ (every register term 2^(20−M_j) is an exact long, so S
  * is exact and order-independent), and the final estimate is ONE
  * integer division with alpha_32 = 0.697 as an exact ppm constant
  * (Flajolet et al. 2007's constant for m=32). Small-range correction
  * is the standard linear-counting rule (V empty registers,
  * est = m·ln(m/V)) — with V ∈ {1..32} the correction takes only 32
  * values, precomputed as an integer lookup table shared verbatim by
  * both engines, so no transcendental is evaluated at query time.
  * The DuckDB oracle replays the ENTIRE sketch bit-for-bit.
  *
  * m=32 gives ~18% standard error (1.04/√m) — test-scale sizing that
  * makes both regimes reachable (~150 distinct users land in the raw
  * regime; HllSpec forces the linear-counting branch with small
  * groups and asserts the error bound + shard-merge identity).
  * Production p=14 (m=16384, ~0.8%) changes only the constants.
  */
object Hll {

  private[graft] val M = 32
  /** round(10⁶ · α₃₂), α₃₂ = 0.697 (Flajolet et al. 2007, m=32). */
  private[graft] val AlphaPpm = 697000L
  /** round(m·ln(m/V)) for V = 1..32 — the linear-counting estimates. */
  private[graft] val LcTable = Seq(
    111, 89, 76, 67, 59, 54, 49, 44, 41, 37, 34, 31, 29, 26, 24, 22,
    20, 18, 17, 15, 13, 12, 11, 9, 8, 7, 5, 4, 3, 2, 1, 0)

  /** TWO rounds of the sampler family's multiplicative-xorshift shape
    * (CorpusOps.bucket1M's round, then a second fold-multiply-xorshift
    * with different constants). One round is measurably non-uniform on
    * sequential ids at the register granularity (8/32 registers empty
    * at n=150 → 3× underestimate); the second round fixes it (≤ 1
    * empty, est within 10%).
    *
    * Moduli sizing: the distinguishable key domain is capped by the
    * fold moduli — keys congruent mod [[P1]] collide before mixing, so
    * NDV saturates at ~P1 distinct keys. The sampler family's ~10⁶
    * moduli were fine for keep/drop decisions but capped this SKETCH's
    * domain at ~1e6 (l_partkey exceeds that around sf5). Both moduli
    * are now the largest primes below 2³¹ that keep every product
    * inside a signed 64-bit in BOTH engines (DuckDB BIGINT errors on
    * overflow): (P1−1)·C1 ≈ 5.7e18 and (P2−1)·C2 ≈ 3.8e18 < 2⁶³−1 ≈
    * 9.2e18. Domain cap is ~2.1e9 keys — sf ~10⁴ for l_partkey; past
    * that the SIZE HINT on [[regRho]] selects [[mixWide]], the
    * two-word mix with no pre-mix fold. ~46 usable bits after the
    * register split. */
  private[graft] val P1 = 2147483629L // largest prime < 2^31
  private[graft] val C1 = 2654435761L
  private[graft] val P2 = 2147483587L // next prime below 2^31
  private[graft] val C2 = 1779033703L

  /** Keys-per-sketch bound above which [[mix]]'s fold moduli alias raw
    * keys (ids congruent mod [[P1]] hash identically) — the size hint
    * switches to [[mixWide]] past it. */
  private[graft] val NarrowDomainMax = P1

  private[graft] def mix(id: Column): Column = {
    val m0 = pmod(id, lit(P1)) * lit(C1)
    val h1 = m0.bitwiseXOR(shiftright(m0, 13))
    val h2 = pmod(h1, lit(P2)) * lit(C2)
    h2.bitwiseXOR(shiftright(h2, 17))
  }

  /** Two-word mix for key domains past [[NarrowDomainMax]]: the key
    * splits into two 31-bit words BEFORE any fold, so no two distinct
    * keys below 2⁶² share a pre-mix image (the structured aliasing of
    * `id % P1` — sequential ids P1 apart colliding deterministically —
    * is gone; residual collisions are the ~2⁻³¹-per-pair accidents of
    * the final fold, random rather than periodic).
    *
    * KEY-DOMAIN CONTRACT: keys must be non-negative and < 2⁶². A
    * negative id (arithmetic shiftright smears the sign bit through
    * `hi`) or an id ≥ 2⁶² (bits above the two 31-bit words are simply
    * dropped) aliases pre-mix again — exactly the periodic collision
    * class this mix exists to remove. [[regRho]] fail-fasts on a size
    * hint past 2⁶² (a DOMAIN larger than 2⁶² cannot fit the contract
    * for any key assignment); per-row key-range validation is the
    * caller's job, same as every other fail-fast boundary here. Round 1 scrambles
    * the low word exactly like [[mix]]'s first round; round 2 multiplies
    * `(hi XOR h1 % P2)` — both 31-bit, so every product stays inside
    * signed-64 in both engines — which degenerates to [[mix]]'s own
    * round 2 when hi = 0: small keys keep two full rounds of avalanche.
    * x XOR (x >> k) is a bijection, lo·C1 is injective below 2³¹, so
    * h1 is injective in lo and hi injects before the only fold. */
  private[graft] def mixWide(id: Column): Column = {
    val lo = id.bitwiseAND(lit(2147483647L))
    val hi = shiftright(id, 31).bitwiseAND(lit(2147483647L))
    val m1 = lo * lit(C1)
    val h1 = m1.bitwiseXOR(shiftright(m1, 13))
    val m2 = hi.bitwiseXOR(pmod(h1, lit(P2))) * lit(C2)
    m2.bitwiseXOR(shiftright(m2, 17))
  }

  /** DuckDB replay of [[mix]]'s two rounds — oracle CTEs interpolate
    * these so the constants CANNOT drift from the Spark side. Round 1
    * maps the raw key to `h1`; round 2 maps `h1` to the final hash. */
  private[graft] def mixSql1(c: String): String =
    s"xor(($c % $P1) * $C1, (($c % $P1) * $C1) >> 13)"
  private[graft] def mixSql2(c: String): String =
    s"xor(($c % $P2) * $C2, (($c % $P2) * $C2) >> 17)"

  /** DuckDB replay of [[mixWide]], interpolated for the same
    * no-constant-drift guarantee. Word split (`wideSqlLo`/`wideSqlHi` →
    * h1), then the combining round. */
  private[graft] def mixWideSql1(c: String): String = {
    val m1 = s"(($c & 2147483647) * $C1)"
    s"xor($m1, $m1 >> 13)"
  }
  private[graft] def mixWideSql2(c: String, h1: String): String = {
    val m2 = s"(xor(($c >> 31) & 2147483647, $h1 % $P2) * $C2)"
    s"xor($m2, $m2 >> 17)"
  }

  /** Per-value (register, rho): register = low 5 bits, rho = trailing
    * zeros of the rest + 1, capped at 20 so 2^(20−rho) stays an exact
    * long term (w == 0 hits the cap). `expectedDomain` is the size
    * hint: past [[NarrowDomainMax]] distinct keys the folded [[mix]]
    * would alias, so the sketch switches to [[mixWide]] (keys must then
    * be non-negative and < 2⁶² — see [[mixWide]]'s domain contract; a
    * hint past 2⁶² fails loudly below).
    *
    * MERGE/ALGEBRA CONTRACT: register-level algebra (the per-register
    * max that merges sketches, and inclusion-exclusion intersection on
    * top of it — `sketch_hll_intersect`) is only meaningful between
    * sketches built with the SAME mix variant; a wide-mix register set
    * merged with a narrow-mix one combines two different hash spaces
    * and estimates nothing. All sketches entering one algebra must be
    * built under the same `expectedDomain` side of the
    * [[NarrowDomainMax]] switch — build them from one [[regRho]] call
    * (as the intersect query does) or assert
    * `mixVariant(domA) == mixVariant(domB)` first. */
  private[graft] def mixVariant(expectedDomain: Long): String =
    if (expectedDomain > NarrowDomainMax) "wide" else "narrow"

  private[graft] def regRho(df: DataFrame, value: Column,
      expectedDomain: Long = 1L << 20): DataFrame = {
    require(expectedDomain <= (1L << 62),
      s"HLL size hint $expectedDomain exceeds mixWide's 2^62 key-domain " +
        "ceiling — keys above 2^62 (or negative) alias pre-mix; " +
        "re-key the domain into [0, 2^62) first")
    df.withColumn("h",
        if (expectedDomain > NarrowDomainMax) mixWide(value) else mix(value))
      .withColumn("reg", col("h") % M)
      .withColumn("w", shiftright(col("h"), 5))
      .withColumn("rho",
        when(col("w") === 0, lit(20L))
          .otherwise(least(
            expr("CAST(bit_count((w & -w) - 1) AS BIGINT) + 1"), lit(20L))))
  }

  /** Registers → estimate for one grouping column: the harmonic sum in
    * fixed point (absent registers contribute the full 2²⁰ term), raw
    * estimate = α·m²·2²⁰ / S as one integer division, linear-counting
    * lookup when V > 0 and the raw estimate ≤ 2.5m. */
  private[graft] def estimate(regs: DataFrame, key: String): DataFrame =
    regs
      .groupBy(col(key), col("reg"))
      .agg(max(col("rho")).as("mj"))
      .groupBy(col(key))
      .agg(count(lit(1)).as("touched"),
        sum(expr("shiftleft(1L, CAST(20 - mj AS INT))")).as("s_touched"))
      .withColumn("v_zero", lit(M.toLong) - col("touched"))
      .withColumn("s_fixed",
        col("s_touched") + col("v_zero") * lit(1048576L))
      .withColumn("hll_raw",
        expr(s"(${AlphaPpm}L * ${M * M}L * 1048576L) div (1000000L * s_fixed)"))
      .withColumn("hll_est",
        when(col("v_zero") > 0 && col("hll_raw") <= lit((2.5 * M).toLong),
          element_at(
            array(LcTable.map(v => lit(v.toLong)): _*),
            col("v_zero").cast("int")))
          .otherwise(col("hll_raw")))
      .select(col(key), col("v_zero"), col("hll_raw"), col("hll_est"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Distinct users per event type: ~2000 events per type collapse to
    // ~150 distinct users — the sketch answers from 32 registers. The
    // exact COUNT(DISTINCT) column is the shuffle you cannot afford at
    // scale and drops away; here it makes the error oracle-visible.
    "sketch_hll" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("user_id").isNotNull)
        .select(col("event_type"), col("user_id"))
      val est = estimate(regRho(ev, col("user_id")), "event_type")
      val exact = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
      est.join(exact, Seq("event_type"))
        .select(col("event_type"), col("n_exact"), col("v_zero"),
          col("hll_raw"), col("hll_est"))
        .orderBy(col("event_type"))
    }),

    // The size hint's reason to exist, oracle-checked end-to-end: every
    // user contributes TWO keys exactly P1 apart ({uid, uid + P1}), a
    // key set the folded mix aliases pairwise (both land on the same
    // residue, halving apparent NDV), spread across a > 2³¹ domain.
    // With the hint past NarrowDomainMax the sketch runs the two-word
    // mix and the estimate tracks the DOUBLED exact count; HllSpec
    // additionally pins that the narrow mix on the same keys collapses
    // to the single count (the aliasing this query proves is gone).
    "sketch_hll_wide" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("user_id").isNotNull)
        .select(col("event_type"),
          explode(array(col("user_id"), col("user_id") + lit(P1)))
            .as("wid"))
      val est = estimate(
        regRho(ev, col("wid"), expectedDomain = 1L << 42), "event_type")
      val exact = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("wid")).as("n_exact"))
      est.join(exact, Seq("event_type"))
        .select(col("event_type"), col("n_exact"), col("v_zero"),
          col("hll_raw"), col("hll_est"))
        .orderBy(col("event_type"))
    }),

    // Audience-overlap screen: distinct-user intersection ESTIMATES for
    // every event-type pair by HLL register algebra — union = per-register
    // max of the two sketches (the merge HLL is built for), intersection
    // = inclusion-exclusion, clamped at 0. This is the constant-size
    // pre-pass that decides which pairs earn an exact intersection (the
    // corpus_overlap relationship at sketch scale): per pair it touches
    // 2·m registers, never the corpus. Every step is the same
    // oracle-replayable integer arithmetic as sketch_hll.
    "sketch_hll_intersect" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("user_id").isNotNull)
        .select(col("event_type"), col("user_id"))
      val regs = regRho(ev, col("user_id"))
        .groupBy(col("event_type"), col("reg"))
        .agg(max(col("rho")).as("mj"))
      val est = estimate(regRho(ev, col("user_id")), "event_type")
        .select(col("event_type"), col("hll_est"))
      // union sketch per (a < b) pair: replicate each type's registers
      // to every pair it belongs to, then per-register MAX — registers
      // present in only one sketch contribute their own mj, registers
      // absent from both contribute via v_zero, exactly as a single
      // sketch. The grid is |types|² rows, the union frame ≤ pairs × m.
      val types = regs.select(col("event_type")).distinct()
      val grid = types.select(col("event_type").as("ta"))
        .crossJoin(types.select(col("event_type").as("tb")))
        .filter(col("ta") < col("tb"))
      val a = regs.select(col("event_type").as("ta"), col("reg"), col("mj"))
      val b = regs.select(col("event_type").as("tb"), col("reg"), col("mj"))
      val unionRegs = grid.join(a, Seq("ta"))
        .select(col("ta"), col("tb"), col("reg"), col("mj"))
        .unionByName(grid.join(b, Seq("tb"))
          .select(col("ta"), col("tb"), col("reg"), col("mj")))
        .groupBy(col("ta"), col("tb"), col("reg"))
        .agg(max(col("mj")).as("mj"))
      val merged = unionRegs
        .groupBy(col("ta"), col("tb"))
        .agg(count(lit(1)).as("touched"),
          sum(expr("shiftleft(1L, CAST(20 - mj AS INT))")).as("s_touched"))
        .withColumn("v_zero", lit(M.toLong) - col("touched"))
        .withColumn("s_fixed",
          col("s_touched") + col("v_zero") * lit(1048576L))
        .withColumn("u_raw",
          expr(s"(${AlphaPpm}L * ${M * M}L * 1048576L) div (1000000L * s_fixed)"))
        .withColumn("est_union",
          when(col("v_zero") > 0 && col("u_raw") <= lit((2.5 * M).toLong),
            element_at(
              array(LcTable.map(v => lit(v.toLong)): _*),
              col("v_zero").cast("int")))
            .otherwise(col("u_raw")))
        .select(col("ta"), col("tb"), col("est_union"))
      // distinct (event_type, user_id) BEFORE the self-join: the join's
      // per-user fanout is then |types_a| x |types_b| (bounded by the tiny
      // type domain), not events_a x events_b — registers-not-corpus scale
      val evD = ev.distinct()
      val exactI = evD.select(col("event_type").as("ta"), col("user_id"))
        .join(evD.select(col("event_type").as("tb"), col("user_id")),
          Seq("user_id"))
        .filter(col("ta") < col("tb"))
        .groupBy(col("ta"), col("tb"))
        .agg(countDistinct(col("user_id")).as("n_exact_inter"))
      merged
        .join(broadcast(est.select(col("event_type").as("ta"),
          col("hll_est").as("est_a"))), Seq("ta"))
        .join(broadcast(est.select(col("event_type").as("tb"),
          col("hll_est").as("est_b"))), Seq("tb"))
        .join(exactI, Seq("ta", "tb"), "left")
        .select(col("ta"), col("tb"), col("est_a"), col("est_b"),
          col("est_union"),
          greatest(col("est_a") + col("est_b") - col("est_union"), lit(0L))
            .as("inter_est"),
          coalesce(col("n_exact_inter"), lit(0L)).as("n_exact_inter"))
        .orderBy(col("ta"), col("tb"))
    }))

  def oracle: Map[String, String] = Map(
    // the identical mix/register/rho arithmetic and fixed-point
    // harmonic sum replayed in SQL; LC table embedded verbatim
    "sketch_hll" ->
      s"""WITH ev AS (
         |  SELECT event_type, user_id FROM events
         |  WHERE user_id IS NOT NULL),
         |h1 AS (
         |  SELECT event_type, user_id,
         |    ${mixSql1("user_id")} AS h1
         |  FROM ev),
         |h AS (
         |  SELECT event_type, user_id,
         |    ${mixSql2("h1")} AS h
         |  FROM h1),
         |rr AS (
         |  SELECT event_type, h % $M AS reg,
         |    CASE WHEN h >> 5 = 0 THEN 20
         |         ELSE least(CAST(bit_count(((h >> 5) & -(h >> 5)) - 1)
         |                      AS BIGINT) + 1, 20)
         |    END AS rho
         |  FROM h),
         |regs AS (
         |  SELECT event_type, reg, max(rho) AS mj FROM rr GROUP BY 1, 2),
         |agg AS (
         |  SELECT event_type, count(1) AS touched,
         |    CAST(sum(CAST(1 AS BIGINT) << CAST(20 - mj AS INT)) AS BIGINT)
         |      AS s_touched
         |  FROM regs GROUP BY 1),
         |est AS (
         |  SELECT event_type, CAST($M - touched AS BIGINT) AS v_zero,
         |    (CAST($AlphaPpm AS BIGINT) * ${M * M} * 1048576)
         |      // (CAST(1000000 AS BIGINT)
         |          * (s_touched + ($M - touched) * 1048576))
         |      AS hll_raw
         |  FROM agg),
         |lc AS (
         |  SELECT est.event_type, est.v_zero, est.hll_raw,
         |    CASE WHEN est.v_zero > 0 AND est.hll_raw <= ${(2.5 * M).toLong}
         |      THEN CAST(list_extract([${LcTable.mkString(", ")}],
         |                             CAST(est.v_zero AS INT)) AS BIGINT)
         |      ELSE est.hll_raw END AS hll_est
         |  FROM est),
         |exact AS (
         |  SELECT event_type, count(DISTINCT user_id) AS n_exact
         |  FROM ev GROUP BY 1)
         |SELECT lc.event_type, exact.n_exact, lc.v_zero, lc.hll_raw,
         |  lc.hll_est
         |FROM lc JOIN exact USING (event_type)
         |ORDER BY lc.event_type""".stripMargin,
    // the two-word mix replayed in SQL on the widened key set — the
    // same register/rho/fixed-point arithmetic, mixWideSql interpolated
    "sketch_hll_wide" ->
      s"""WITH ev AS (
         |  SELECT event_type, wid FROM (
         |    SELECT event_type,
         |      unnest([CAST(user_id AS BIGINT),
         |              CAST(user_id AS BIGINT) + $P1]) AS wid
         |    FROM events WHERE user_id IS NOT NULL)),
         |h1 AS (
         |  SELECT event_type, wid,
         |    ${mixWideSql1("wid")} AS h1
         |  FROM ev),
         |h AS (
         |  SELECT event_type, wid,
         |    ${mixWideSql2("wid", "h1")} AS h
         |  FROM h1),
         |rr AS (
         |  SELECT event_type, h % $M AS reg,
         |    CASE WHEN h >> 5 = 0 THEN 20
         |         ELSE least(CAST(bit_count(((h >> 5) & -(h >> 5)) - 1)
         |                      AS BIGINT) + 1, 20)
         |    END AS rho
         |  FROM h),
         |regs AS (
         |  SELECT event_type, reg, max(rho) AS mj FROM rr GROUP BY 1, 2),
         |agg AS (
         |  SELECT event_type, count(1) AS touched,
         |    CAST(sum(CAST(1 AS BIGINT) << CAST(20 - mj AS INT)) AS BIGINT)
         |      AS s_touched
         |  FROM regs GROUP BY 1),
         |est AS (
         |  SELECT event_type, CAST($M - touched AS BIGINT) AS v_zero,
         |    (CAST($AlphaPpm AS BIGINT) * ${M * M} * 1048576)
         |      // (CAST(1000000 AS BIGINT)
         |          * (s_touched + ($M - touched) * 1048576))
         |      AS hll_raw
         |  FROM agg),
         |lc AS (
         |  SELECT est.event_type, est.v_zero, est.hll_raw,
         |    CASE WHEN est.v_zero > 0 AND est.hll_raw <= ${(2.5 * M).toLong}
         |      THEN CAST(list_extract([${LcTable.mkString(", ")}],
         |                             CAST(est.v_zero AS INT)) AS BIGINT)
         |      ELSE est.hll_raw END AS hll_est
         |  FROM est),
         |exact AS (
         |  SELECT event_type, count(DISTINCT wid) AS n_exact
         |  FROM ev GROUP BY 1)
         |SELECT lc.event_type, exact.n_exact, lc.v_zero, lc.hll_raw,
         |  lc.hll_est
         |FROM lc JOIN exact USING (event_type)
         |ORDER BY lc.event_type""".stripMargin,
    // the same sketch CTEs; union = per-register max over the pair
    // (the OR-join IS the union-all-then-max), identical fixed-point
    // estimate on the merged registers, inclusion-exclusion clamped at 0
    "sketch_hll_intersect" ->
      s"""WITH ev AS (
         |  SELECT event_type, user_id FROM events
         |  WHERE user_id IS NOT NULL),
         |h1 AS (
         |  SELECT event_type, user_id,
         |    ${mixSql1("user_id")} AS h1
         |  FROM ev),
         |h AS (
         |  SELECT event_type, user_id,
         |    ${mixSql2("h1")} AS h
         |  FROM h1),
         |rr AS (
         |  SELECT event_type, h % $M AS reg,
         |    CASE WHEN h >> 5 = 0 THEN 20
         |         ELSE least(CAST(bit_count(((h >> 5) & -(h >> 5)) - 1)
         |                      AS BIGINT) + 1, 20)
         |    END AS rho
         |  FROM h),
         |regs AS (
         |  SELECT event_type, reg, max(rho) AS mj FROM rr GROUP BY 1, 2),
         |agg AS (
         |  SELECT event_type, count(1) AS touched,
         |    CAST(sum(CAST(1 AS BIGINT) << CAST(20 - mj AS INT)) AS BIGINT)
         |      AS s_touched
         |  FROM regs GROUP BY 1),
         |est AS (
         |  SELECT event_type, CAST($M - touched AS BIGINT) AS v_zero,
         |    (CAST($AlphaPpm AS BIGINT) * ${M * M} * 1048576)
         |      // (CAST(1000000 AS BIGINT)
         |          * (s_touched + ($M - touched) * 1048576))
         |      AS hll_raw
         |  FROM agg),
         |lc AS (
         |  SELECT est.event_type, est.v_zero, est.hll_raw,
         |    CASE WHEN est.v_zero > 0 AND est.hll_raw <= ${(2.5 * M).toLong}
         |      THEN CAST(list_extract([${LcTable.mkString(", ")}],
         |                             CAST(est.v_zero AS INT)) AS BIGINT)
         |      ELSE est.hll_raw END AS hll_est
         |  FROM est),
         |grid AS (
         |  SELECT a.event_type AS ta, b.event_type AS tb
         |  FROM (SELECT DISTINCT event_type FROM regs) a,
         |       (SELECT DISTINCT event_type FROM regs) b
         |  WHERE a.event_type < b.event_type),
         |ur AS (
         |  SELECT g.ta, g.tb, r.reg, max(r.mj) AS mj
         |  FROM grid g JOIN regs r
         |    ON r.event_type = g.ta OR r.event_type = g.tb
         |  GROUP BY 1, 2, 3),
         |uagg AS (
         |  SELECT ta, tb, count(1) AS touched,
         |    CAST(sum(CAST(1 AS BIGINT) << CAST(20 - mj AS INT)) AS BIGINT)
         |      AS s_touched
         |  FROM ur GROUP BY 1, 2),
         |uest AS (
         |  SELECT ta, tb, CAST($M - touched AS BIGINT) AS v_zero,
         |    (CAST($AlphaPpm AS BIGINT) * ${M * M} * 1048576)
         |      // (CAST(1000000 AS BIGINT)
         |          * (s_touched + ($M - touched) * 1048576))
         |      AS u_raw
         |  FROM uagg),
         |ulc AS (
         |  SELECT ta, tb,
         |    CASE WHEN v_zero > 0 AND u_raw <= ${(2.5 * M).toLong}
         |      THEN CAST(list_extract([${LcTable.mkString(", ")}],
         |                             CAST(v_zero AS INT)) AS BIGINT)
         |      ELSE u_raw END AS est_union
         |  FROM uest),
         |ex AS (
         |  SELECT a.event_type AS ta, b.event_type AS tb,
         |    count(DISTINCT a.user_id) AS n_exact_inter
         |  FROM (SELECT DISTINCT event_type, user_id FROM ev) a
         |  JOIN (SELECT DISTINCT event_type, user_id FROM ev) b
         |    ON a.user_id = b.user_id AND a.event_type < b.event_type
         |  GROUP BY 1, 2)
         |SELECT g.ta, g.tb, ea.hll_est AS est_a, eb.hll_est AS est_b,
         |  ulc.est_union,
         |  greatest(ea.hll_est + eb.hll_est - ulc.est_union, 0) AS inter_est,
         |  coalesce(ex.n_exact_inter, 0) AS n_exact_inter
         |FROM grid g
         |JOIN ulc USING (ta, tb)
         |JOIN lc ea ON ea.event_type = g.ta
         |JOIN lc eb ON eb.event_type = g.tb
         |LEFT JOIN ex USING (ta, tb)
         |ORDER BY ta, tb""".stripMargin)
}
