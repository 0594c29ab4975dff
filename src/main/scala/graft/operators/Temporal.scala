package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Time-series shaping over the event log — the regularization pass every
  * monitoring/training pipeline runs before feeding models that assume a
  * dense, ordered time axis (the reference engine has no time-series
  * surface at all — its only temporal columns are the `day/month/year`
  * integers of the `sales` schema, SURVEY.md §1.2):
  *
  *  - '''Gap fill + forward fill''' (`ts_fill`): the hourly
  *    (event_type × hour) activity marginal with MISSING HOURS
  *    materialized (count 0) and the last-seen hourly revenue carried
  *    forward across gaps. The dense axis comes from one 1-row min/max
  *    aggregate expanded with `sequence()` — never a driver-side range —
  *    and the grid is |types| × |hours| (KBs at any corpus size), so the
  *    only full-data pass is the marginal itself: one (type, hour)
  *    hash aggregation with map-side combine. The forward-fill window
  *    sorts the GRID (types × hours), not the corpus — at 100 TB the
  *    expensive sort the naive per-event formulation would do simply
  *    never exists. Cents are exact integers (the 0.01-grid recovery via
  *    DECIMAL(18,2), shared with `feature_zscore`), so fill values
  *    hash-match bit-for-bit. At sf0.01, 215 of the 3 600 grid cells are
  *    true gaps — the fill path is exercised, not vacuous.
  *  - '''OHLC resampling''' (`ts_ohlc`): per (event_type, day) candle —
  *    open/close = value at the earliest/latest event with a
  *    deterministic (ts, event_id) tiebreak, high/low/volume as plain
  *    min/max/sum. ONE hash aggregation: open/close ride `min_by`/
  *    `max_by` on the (ts, event_id) struct, so there is NO per-group
  *    sort and NO window over the corpus — the classic "first/last per
  *    bucket" trap (row_number + filter shuffles and sorts everything)
  *    reduced to an agg with map-side partials. The oracle replays it
  *    with the window formulation, pinning the two shapes equal.
  *  - '''Trend slope''' (`trend_slope`): per-type least-squares slope of
  *    daily activity vs day index — the drift detector that says
  *    "signups are growing, purchases are decaying". Computed entirely
  *    from the (type, day) marginal (≤ types × days rows, KBs), as
  *    integer moments on a day index centered at the global min day:
  *    slope sign + slope in events-per-day ppm + fit r² ppm, with the
  *    >2⁶³ products carried in DECIMAL(38,0)/HUGEINT exactly like the
  *    green `feature_corr` — zero float ops, bit-identical cross-engine,
  *    degenerate variance guarded to NULL on identical trees. Plan cost
  *    beyond the marginal: one 5-row aggregate.
  */
object Temporal {

  private def cents(c: Column): Column =
    (c.cast("decimal(18,2)") * 100).cast("long")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_fill" -> ((s, d) => {
      val ev = Tables.events(s, d).select(
        col("event_type"), date_trunc("hour", col("ts")).as("h"),
        cents(col("value")).as("c"))
      val m = ev.groupBy(col("event_type"), col("h"))
        .agg(count(lit(1)).as("n"), sum(col("c")).as("v_cents"))
      val hours = ev.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
        .select(explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
      val grid = ev.select(col("event_type")).distinct()
        .crossJoin(broadcast(hours))
      val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(m, Seq("event_type", "h"), "left")
        .select(col("event_type"), col("h"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("v_cents"), lit(0L)).as("v_cents"),
          last(col("v_cents"), ignoreNulls = true).over(w).as("ffill_cents"))
        .orderBy(col("event_type"), col("h"))
    }),

    "ts_ohlc" -> ((s, d) => {
      import graft.functions.ExtremumByOrd.{maxByOrd, minByOrd}
      val ev = Tables.events(s, d).select(
        col("event_type"), to_date(col("ts")).as("day"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"),
        cents(col("value")).as("c"))
      // open/close via the custom TypedImperativeAggregate, NOT the
      // built-in min_by(value, struct(...)): the struct buffer demotes
      // the whole agg to SortAggregate (per-split sort of the scan);
      // the object-buffer form keeps it in ObjectHashAggregate — no
      // sort anywhere (plan asserted in TemporalSpec, shape audited in
      // PLANS.md). Same deterministic (ts, event_id) ordering key.
      ev.groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n_events"),
          minByOrd(col("c"), col("ts_us"), col("event_id")).as("open_cents"),
          maxByOrd(col("c"), col("ts_us"), col("event_id")).as("close_cents"),
          max(col("c")).as("high_cents"),
          min(col("c")).as("low_cents"),
          sum(col("c")).as("vol_cents"))
        .orderBy(col("event_type"), col("day"))
    }),

    // Rolling 7-day exact median of daily activity — robust smoothing
    // (a moving average follows spikes; the rolling median ignores
    // them). Runs on the KB (type, day) marginal, so the windowed
    // exact-percentile's per-frame buffering is bounded by the 7-row
    // frame × grid rows — the corpus never enters a window. ×2-exact
    // integers (the event_mad trick): `percentile` ≡ `quantile_cont`
    // over identical ROWS frames.
    "window_median" -> ((s, d) => {
      val m = Tables.events(s, d)
        .select(col("event_type"), to_date(col("ts")).as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-6, Window.currentRow)
      m.withColumn("med2_7d",
          (expr("percentile(n, 0.5)").over(w) * 2).cast("long"))
        .orderBy(col("event_type"), col("day"))
    }),

    // Spike detection on the smoothed series: a day is anomalous when
    // its count deviates from the trailing 7-day median by more than
    // 12.5% of that median — the robust relative-deviation rule
    // (|n − med| > med/8, exactly 8·|2n − med2| > 2·med2 in the
    // ×2-integer domain; no float compare; threshold chosen so real
    // spikes exist at both gate scales — 5 at sf0.01, 69 at sf0.001).
    // Same grid-sized plan as window_median; the census rolls up per
    // type with the worst day picked by the object-buffer
    // `maxByOrd` ((dev_ppt, epoch day) key — always defined, no
    // NULL-date column for an all-calm type).
    "ts_anomaly" -> ((s, d) => {
      import graft.functions.ExtremumByOrd.maxByOrd
      val m = Tables.events(s, d)
        .select(col("event_type"), to_date(col("ts")).as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-6, Window.currentRow)
      val epochDay = datediff(col("day"), lit("1970-01-01").cast("date"))
        .cast("long")
      m.withColumn("med2",
          (expr("percentile(n, 0.5)").over(w) * 2).cast("long"))
        .withColumn("dev_ppt",
          expr("(abs(n * 2 - med2) * 1000L) div med2"))
        .withColumn("spike",
          (abs(col("n") * 2 - col("med2")) * 8 > col("med2") * 2).cast("int"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"), sum(col("spike")).as("n_spikes"),
          max(col("dev_ppt")).as("worst_dev_ppt"),
          date_from_unix_date(
            maxByOrd(epochDay, col("dev_ppt"), epochDay).cast("int"))
            .as("worst_day"))
        .orderBy(col("event_type"))
    }),

    "trend_slope" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"), to_date(col("ts")).as("day"))
      val b = ev.agg(min(col("day")).as("d0"))
      val m = ev.crossJoin(broadcast(b))
        .groupBy(col("event_type"),
          datediff(col("day"), col("d0")).cast("long").as("x"))
        .agg(count(lit(1)).as("y"))
      m.groupBy(col("event_type")).agg(
          count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .selectExpr("event_type", "n AS n_days",
          "n*sxy - sx*sy AS num", "n*sxx - sx*sx AS varx",
          "n*syy - sy*sy AS vary")
        .selectExpr("event_type", "n_days",
          "CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END AS INT) AS slope_sign",
          """CASE WHEN varx = 0 THEN NULL ELSE
            |  CAST((CAST(num AS DECIMAL(38,0)) * 1000000) div varx AS BIGINT)
            |END AS slope_ppm""".stripMargin,
          """CASE WHEN varx = 0 OR vary = 0 THEN NULL ELSE
            |  CAST((CAST(num AS DECIMAL(38,0)) * num * 1000000)
            |    div (CAST(varx AS DECIMAL(38,0)) * vary) AS BIGINT)
            |END AS r2_ppm""".stripMargin)
        .orderBy(col("event_type"))
    }),

    // Day-of-week seasonal decomposition: daily revenue totals, per-dow
    // mean (exact truncating div), and each weekday's worst residual day
    // — the seasonality audit behind traffic mixing/scheduling. The
    // corpus collapses to the calendar-sized daily marginal in the ONE
    // data-sized aggregation; everything after (dow means, residuals,
    // argmax windows) runs on ≤ |days| rows. Days are integer epoch-days
    // (micros div 86400e6) and dow = day mod 7 — pure integer arithmetic,
    // no calendar API to diverge between engines.
    "ts_seasonal" -> ((s, d) => {
      // sign-explicit FLOOR division for the epoch-day bucket: Spark div
      // truncates toward zero, so pre-1970 micros would bucket one day
      // late vs the floored calendar day; spell out the floor on both
      // engines (identical CASE in the oracle) and keep dow non-negative
      // via pmod / the ((x%7)+7)%7 oracle form
      val daily = Tables.events(s, d)
        .select(expr(
          """CASE WHEN unix_micros(cast(ts as timestamp)) >= 0
            |THEN unix_micros(cast(ts as timestamp)) div 86400000000
            |ELSE -(((-unix_micros(cast(ts as timestamp))) + 86399999999)
            |       div 86400000000) END""".stripMargin)
          .as("day"), cents(col("value")).as("c"))
        .groupBy(col("day")).agg(sum(col("c")).as("total"))
        .withColumn("dow", pmod(col("day"), lit(7)))
      // sign-explicit truncating division (the attribution_linear
      // convention): Spark div truncates toward zero, DuckDB // floors —
      // identical only when the numerator is non-negative, which a
      // refund-bearing ledger would violate
      val dw = daily.groupBy(col("dow"))
        .agg(count(lit(1)).as("n_days"), sum(col("total")).as("s"))
        .selectExpr("dow", "n_days",
          """CASE WHEN s >= 0 THEN s div n_days
            |ELSE -((-s) div n_days) END AS mean_cents""".stripMargin)
      val res = daily.join(broadcast(dw), "dow")
        .withColumn("resid", col("total") - col("mean_cents"))
      val w = Window.partitionBy(col("dow"))
        .orderBy(abs(col("resid")).desc, col("day"))
      res.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("dow"), col("n_days"), col("mean_cents"),
          col("day").as("worst_day"), col("resid").as("worst_resid_cents"))
        .orderBy(col("dow"))
    }),
  )

  def oracle: Map[String, String] = Map(
    // identical integer epoch-day bucketing, identical truncating dow
    // mean, identical (|resid| desc, day) argmax tie-break
    "ts_seasonal" ->
      """WITH sec AS (
        |  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS s,
        |    CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT) AS c
        |  FROM events),
        |daily AS (
        |  SELECT CASE WHEN s >= 0 THEN s // 86400
        |         ELSE -(((-s) + 86399) // 86400) END AS day,
        |    CAST(sum(c) AS BIGINT) AS total
        |  FROM sec GROUP BY 1),
        |dw AS (
        |  SELECT ((day % 7) + 7) % 7 AS dow, count(1) AS n_days,
        |    CAST(sum(total) AS BIGINT) AS s
        |  FROM daily GROUP BY 1),
        |dm AS (
        |  SELECT dow, n_days,
        |    CAST(CASE WHEN s >= 0 THEN s // n_days
        |         ELSE -((-s) // n_days) END AS BIGINT) AS mean_cents
        |  FROM dw),
        |j AS (
        |  SELECT d.day, w.dow, w.n_days, w.mean_cents,
        |    d.total - w.mean_cents AS resid
        |  FROM daily d JOIN dm w ON ((d.day % 7) + 7) % 7 = w.dow)
        |SELECT dow, n_days, mean_cents, day AS worst_day,
        |  CAST(resid AS BIGINT) AS worst_resid_cents
        |FROM j
        |QUALIFY row_number() OVER (PARTITION BY dow
        |  ORDER BY abs(resid) DESC, day) = 1
        |ORDER BY dow""".stripMargin,
    "ts_fill" ->
      """WITH ev AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h,
        |    CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT) AS c
        |  FROM events),
        |m AS (SELECT event_type, h, count(1) AS n,
        |        CAST(sum(c) AS BIGINT) AS v_cents FROM ev GROUP BY 1, 2),
        |b AS (SELECT min(h) AS h0, max(h) AS h1 FROM ev),
        |hrs AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM b),
        |grid AS (SELECT t.event_type, hrs.h
        |         FROM (SELECT DISTINCT event_type FROM ev) t CROSS JOIN hrs)
        |SELECT g.event_type, g.h, coalesce(m.n, 0) AS n,
        |  coalesce(m.v_cents, 0) AS v_cents,
        |  last_value(m.v_cents IGNORE NULLS) OVER (
        |    PARTITION BY g.event_type ORDER BY g.h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill_cents
        |FROM grid g LEFT JOIN m USING (event_type, h)
        |ORDER BY event_type, h""".stripMargin,
    // the window formulation is the ORACLE ONLY — the engine-side agg
    // (min_by/max_by) never sorts; their equality is the point
    "ts_ohlc" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    ts, event_id,
        |    CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT) AS c
        |  FROM events),
        |r AS (SELECT *,
        |    row_number() OVER (PARTITION BY event_type, day
        |                       ORDER BY ts, event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY event_type, day
        |                       ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM ev)
        |SELECT event_type, day, count(1) AS n_events,
        |  CAST(max(CASE WHEN rn_a = 1 THEN c END) AS BIGINT) AS open_cents,
        |  CAST(max(CASE WHEN rn_d = 1 THEN c END) AS BIGINT) AS close_cents,
        |  CAST(max(c) AS BIGINT) AS high_cents,
        |  CAST(min(c) AS BIGINT) AS low_cents,
        |  CAST(sum(c) AS BIGINT) AS vol_cents
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "window_median" ->
      """WITH m AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    count(1) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, day, n,
        |  CAST(quantile_cont(n, 0.5) OVER (
        |    PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) * 2 AS BIGINT)
        |    AS med2_7d
        |FROM m ORDER BY event_type, day""".stripMargin,
    "ts_anomaly" ->
      """WITH m AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    count(1) AS n
        |  FROM events GROUP BY 1, 2),
        |sm AS (
        |  SELECT event_type, day, n,
        |    CAST(quantile_cont(n, 0.5) OVER (
        |      PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) * 2 AS BIGINT)
        |      AS med2
        |  FROM m),
        |fl AS (
        |  SELECT event_type, day,
        |    (abs(n*2 - med2) * 1000) // med2 AS dev_ppt,
        |    CASE WHEN abs(n*2 - med2) * 8 > med2 * 2 THEN 1 ELSE 0 END
        |      AS spike,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY (abs(n*2 - med2) * 1000) // med2 DESC, day DESC)
        |      AS rn
        |  FROM sm)
        |SELECT event_type, count(1) AS n_days,
        |  CAST(sum(spike) AS BIGINT) AS n_spikes,
        |  CAST(max(dev_ppt) AS BIGINT) AS worst_dev_ppt,
        |  max(CASE WHEN rn = 1 THEN day END) AS worst_day
        |FROM fl GROUP BY 1 ORDER BY 1""".stripMargin,
    "trend_slope" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day
        |  FROM events),
        |b AS (SELECT min(day) AS d0 FROM ev),
        |m AS (SELECT event_type,
        |        CAST(datediff('day', b.d0, day) AS BIGINT) AS x,
        |        count(1) AS y
        |      FROM ev CROSS JOIN b GROUP BY 1, 2),
        |mo AS (SELECT event_type, count(1) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x*y) AS BIGINT) AS sxy,
        |    CAST(sum(x*x) AS BIGINT) AS sxx,
        |    CAST(sum(y*y) AS BIGINT) AS syy
        |  FROM m GROUP BY 1),
        |dd AS (SELECT event_type, n AS n_days,
        |    n*sxy - sx*sy AS num, n*sxx - sx*sx AS varx,
        |    n*syy - sy*sy AS vary
        |  FROM mo)
        |SELECT event_type, n_days,
        |  CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END AS INT)
        |    AS slope_sign,
        |  CASE WHEN varx = 0 THEN NULL ELSE
        |    CAST((CAST(num AS HUGEINT) * 1000000) // varx AS BIGINT)
        |  END AS slope_ppm,
        |  CASE WHEN varx = 0 OR vary = 0 THEN NULL ELSE
        |    CAST((CAST(num AS HUGEINT) * num * 1000000)
        |      // (CAST(varx AS HUGEINT) * vary) AS BIGINT)
        |  END AS r2_ppm
        |FROM dd ORDER BY event_type""".stripMargin,
  )
}
