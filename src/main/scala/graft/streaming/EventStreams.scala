package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Event-stream processing over the `events` table (FIXTURES.md §3).
  *
  * Each transformation is a pure `DataFrame => DataFrame`, applied
  * identically to a batch read (`Tables.events`) — which is what the
  * DuckDB oracle checks — and to a `readStream` source
  * ([[StreamingSpec]] runs the same functions under Structured Streaming
  * with watermarks and asserts batch/stream agreement).
  *
  * Scale notes: windowed aggregation shuffles on (window, key) — the
  * watermark bounds state size; session windows use Spark's
  * session-merging state store. `value` sums are decimal-exact.
  */
object EventStreams {

  /** Tumbling 1-hour windows per event type. */
  def tumbling(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("sum_value"))
      .select(col("w.start").as("wstart"), col("event_type"), col("n"), col("sum_value"))

  /** Sliding 1-hour windows, 30-minute slide. */
  def sliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("sum_value"))
      .select(col("w.start").as("wstart"), col("event_type"), col("n"), col("sum_value"))

  /** First-arrival-wins dedup: one event per (user_id, event_type), the
    * earliest by (ts, event_id). Batch form is one aggregation of
    * `min(struct(ts, event_id, value))` — lexicographic struct min ≡
    * first arrival, payload riding along, so the whole dedup is a single
    * pass. Plan reality (audited in PLANS.md): the struct-typed buffer is
    * not hash-aggregable, so Spark plans SortAggregate — each scan split
    * sorts locally by the GROUP key before partial aggregation. That
    * local sort is the price of carrying the payload in one pass; the
    * shuffle still carries only per-split per-key minima (partial agg),
    * which is the lever that matters at corpus scale. The window
    * row_number alternative shuffles EVERY event to sort whole
    * partitions; the hash-friendly alternative (min over an encoded
    * scalar, then join back for the payload) pays a second corpus-wide
    * join. Streaming form is `dropDuplicates` over the same key with a
    * watermark bounding state ([[graft.streaming.StreamingSpec]] proves
    * batch/stream agreement on a time-ordered stream). */
  def firstArrival(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(struct(col("ts"), col("event_id"), col("value"))).as("f"))
      .select(col("user_id"), col("event_type"),
        col("f.ts").as("first_ts"), col("f.event_id").as("first_event_id"),
        col("f.value").as("first_value"))

  /** Sessionized event TRAJECTORIES: per (user, 10-min-gap session),
    * the ordered sequence of event types — the shaping step that turns
    * a raw event log into sequence-model training examples. The
    * sessionization is the same lag→flag→running-sum window as
    * [[sessions]]; the sequence itself is `sort_array(collect_list(
    * struct(ts, event_id, type)))` — collect_list alone has NO ordering
    * guarantee under parallel execution, the struct sort is what makes
    * the trajectory deterministic ((ts, event_id) is unique). One
    * user-keyed shuffle for the windows, one (user, session) hash
    * aggregation for the collect; at corpus scale sequences are bounded
    * by session length, not corpus size. */
  def sessionTrajectories(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val flagged = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      // strict < gap, matching session_window's boundary convention
      // (events exactly one gap apart start a new session — pinned in
      // StreamingSpec); integer microsecond arithmetic, exact in both
      // engines
      .withColumn("new_s",
        when(col("prev_ts").isNotNull &&
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) < 600000000L, 0)
          .otherwise(1))
      .withColumn("sid", sum(col("new_s")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged
      .groupBy(col("user_id"), col("sid"))
      .agg(
        min(col("ts")).as("session_start"),
        count(lit(1)).as("n_events"),
        array_join(
          transform(
            sort_array(collect_list(struct(col("ts"), col("event_id"),
              col("event_type")))),
            s => s.getField("event_type")),
          ">").as("trajectory"))
      .drop("sid")
  }

  /** Gap-based session windows (10 min) per user. */
  def sessions(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "10 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("sum_value"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Per-window top-k heavy hitters: the trending-items readout over
    * tumbling 1-hour windows — item counts then a rank cut per window.
    * Batch form here (the oracle-checked contract); the streaming form
    * is the same windowed count as an incremental stateful aggregation
    * with the rank applied on the emitted snapshot
    * (batch ≡ stream pinned in StreamingSpec). Scale shape: the count
    * is a uniform (window, item)-keyed aggregation with map-side
    * combine; the rank partitions by window (WindowGroupLimit keeps the
    * per-task sort to k), so no stage depends on corpus size — only on
    * per-window item cardinality. */
  def windowTopK(events: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counted = events
      .select(window(col("ts"), "1 hour").as("w"),
        // try_cast: under ANSI a digit-free props row would otherwise
        // ERROR on cast('') instead of nulling out (DuckDB mirrors with
        // TRY_CAST)
        expr("try_cast(regexp_extract(props, '(\\\\d+)', 1) AS BIGINT)")
          .as("item"))
      .filter(col("item").isNotNull) // digit-free props: drop, never rank
      .groupBy(col("w"), col("item"))
      .agg(count(lit(1)).as("n"))
    counted
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("w")).orderBy(col("n").desc, col("item"))))
      .filter(col("rnk") <= k)
      .select(col("w.start").as("wstart"), col("item"), col("n"),
        col("rnk").cast("int").as("rnk"))
  }

  /** Windowed value histogram on the $10 fixed grid — the
    * streaming-STATEFUL part of [[windowQuantile]]: an incremental
    * (window, type, bin) count whose state is bounded at
    * windows × types × bins regardless of event volume, exactly the
    * property that lets a latency-percentile dashboard run forever.
    * Counter addition also merges snapshots across shards/restarts. */
  def windowValueBins(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"),
        (floor(col("value") / 10).cast("long") * 10).as("bin_lo"))
      .agg(count(lit(1)).as("cnt"))

  /** Snapshot readout for [[windowValueBins]]: nearest-rank p50/p90 as
    * the first bin whose cumulative mass reaches ceil(q·n) — integer
    * cross-multiplication, deterministic, bin-width-bounded error (the
    * streaming counterpart of `quantile_hist`; `quantile_exact` is the
    * batch path when edge error is unacceptable). Runs on the emitted
    * state snapshot, so the rank never touches the event stream. */
  def quantileReadout(bins: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wc = Window.partitionBy(col("w"), col("event_type"))
      .orderBy(col("bin_lo"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wt = Window.partitionBy(col("w"), col("event_type"))
    bins
      .withColumn("cum", sum(col("cnt")).over(wc))
      .withColumn("n", sum(col("cnt")).over(wt))
      .groupBy(col("w"), col("event_type"), col("n"))
      .agg(
        min(when(col("cum") * 100 >= col("n") * 50, col("bin_lo")))
          .as("p50_lo"),
        min(when(col("cum") * 100 >= col("n") * 90, col("bin_lo")))
          .as("p90_lo"))
      .select(col("w.start").as("wstart"), col("event_type"), col("n"),
        col("p50_lo"), col("p90_lo"))
  }

  /** Per-window value percentiles (batch form of the streaming pair
    * above; StreamingSpec pins batch ≡ stream across a state-carrying
    * batch split). */
  def windowQuantile(events: DataFrame): DataFrame =
    quantileReadout(windowValueBins(events))

  /** Windowed user bitmaps — streaming EXACT distinct-user state: per
    * (window, type, 32-id bucket) the member bitmap OR-accumulates
    * (`bit_or` is an incremental stateful aggregation), so the state is
    * bounded by windows × types × |user domain|/32 longs — independent
    * of EVENT volume, and the bits are exact where a streaming HLL
    * would estimate. Sign bit avoided (32 ids per long) so the shift
    * replays identically in the DuckDB oracle. */
  def windowUserBitmaps(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"),
        expr("user_id div 32").as("bkt"))
      .agg(expr("bit_or(shiftleft(1L, int(user_id % 32)))").as("bits"))

  /** Snapshot readout for [[windowUserBitmaps]]: exact distinct users
    * per (window, type) as one popcount sum over the state rows. */
  def bitmapDistinctReadout(bitmaps: DataFrame): DataFrame =
    bitmaps
      .groupBy(col("w"), col("event_type"))
      .agg(sum(bit_count(col("bits"))).as("n_users"))
      .select(col("w.start").as("wstart"), col("event_type"),
        col("n_users"))

  /** Per-window exact distinct users (batch form; StreamingSpec pins
    * batch ≡ stream across a state-carrying batch split — the
    * streaming counterpart of `agg_bitmap_distinct`'s shard rollup). */
  def windowBitmapDistinct(events: DataFrame): DataFrame =
    bitmapDistinctReadout(windowUserBitmaps(events))

  /** Decimal sums surfaced as double at the checked-output boundary —
    * both engines cast the same exact decimal, so bits (and the driver's
    * stringified compare) agree. */
  private def sumValueAsDouble(df: DataFrame): DataFrame =
    df.withColumn("sum_value", col("sum_value").cast("double"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_tumbling" -> ((s, d) =>
      sumValueAsDouble(tumbling(Tables.events(s, d)))
        .orderBy(col("wstart"), col("event_type"))),
    "stream_sliding" -> ((s, d) =>
      sumValueAsDouble(sliding(Tables.events(s, d)))
        .orderBy(col("wstart"), col("event_type"))),
    "stream_session" -> ((s, d) =>
      sumValueAsDouble(sessions(Tables.events(s, d)))
        .orderBy(col("user_id"), col("session_start"))),
    "stream_dedup" -> ((s, d) =>
      firstArrival(Tables.events(s, d))
        .orderBy(col("user_id"), col("event_type"))),
    "stream_topk" -> ((s, d) =>
      windowTopK(Tables.events(s, d))
        .orderBy(col("wstart"), col("rnk"))),
    "stream_quantile" -> ((s, d) =>
      windowQuantile(Tables.events(s, d))
        .orderBy(col("wstart"), col("event_type"))),
    "stream_bitmap_distinct" -> ((s, d) =>
      windowBitmapDistinct(Tables.events(s, d))
        .orderBy(col("wstart"), col("event_type"))),
    "session_trajectories" -> ((s, d) =>
      sessionTrajectories(Tables.events(s, d))
        .orderBy(col("user_id"), col("session_start"))),

    // Conversion-funnel analysis: users who viewed, then clicked
    // STRICTLY AFTER their first view, then purchased strictly after
    // that click — the ordered-sequence semantics (not mere
    // set-intersection of event types). Three stage frames, each a
    // user-keyed min-aggregation of a type-filtered scan joined to the
    // previous stage; every intermediate is ≤ |users| rows, every
    // shuffle is user-keyed and uniform, and the filters sit on the
    // scan. Timestamps compare exactly in both engines.
    "event_funnel" -> ((s, d) => {
      // size-gated share (r17): each stage frame feeds the NEXT
      // stage's join AND its own census count — un-materialized, g3's
      // count re-runs the whole g1→g2→g3 chain and g2's count re-runs
      // g1→g2 (plan-verified 6 event scans; shared, 3 — one per stage,
      // the funnel's floor). Each frame is ≤ |users| rows, the volume
      // its own shuffle already carries.
      val ev = Tables.events(s, d).select(col("user_id"), col("event_type"), col("ts"))
      val g1 = graft.PlanShare.shared(ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1")))
      val g2 = graft.PlanShare.shared(ev.filter(col("event_type") === "click")
        .join(g1, "user_id").filter(col("ts") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2")))
      val g3 = graft.PlanShare.shared(ev.filter(col("event_type") === "purchase")
        .join(g2, "user_id").filter(col("ts") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3")))
      g1.agg(count(lit(1)).as("n_view_users"))
        .crossJoin(g2.agg(count(lit(1)).as("n_click_users")))
        .crossJoin(g3.agg(count(lit(1)).as("n_purchase_users")))
    }),

    // 3σ outlier counts per event type, with NO sqrt and NO division:
    // (x−μ)² > 9σ² ⟺ (n·x − S)² > 9·(n·Q − S²) where S=Σx, Q=Σx² —
    // the moments are EXACT integer fixed-point (value·100 as long;
    // bounds audited: Q ≤ 6.4e14 at sf1), and the final comparison runs
    // in doubles built from identical exact integers with an identical
    // tree shape, so both engines flag identically even where the
    // squares exceed 2⁵³. Plan: one moments aggregation (5-row result,
    // broadcast back) + one counting aggregation — two uniform
    // event_type-keyed shuffles, no sort, at any scale.
    "event_outliers" -> ((s, d) => {
      val w = (col("value").cast("decimal(18,2)") * 100).cast("long")
      val ev = Tables.events(s, d).select(col("event_type"), w.as("w"))
      val stats = ev.groupBy(col("event_type")).agg(
        count(lit(1)).as("n"), sum(col("w")).as("sw"),
        sum(col("w") * col("w")).as("qw"))
      def d2(c: Column): Column = c.cast("double")
      val dev = d2(col("n")) * d2(col("w")) - d2(col("sw"))
      val rhs = lit(9.0) * (d2(col("n")) * d2(col("qw")) -
        d2(col("sw")) * d2(col("sw")))
      ev.join(broadcast(stats), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(dev * dev > rhs, 1L).otherwise(0L)).as("n_outliers"))
        .orderBy(col("event_type"))
    }),

    // Per-DAY distribution-drift monitor — the temporal twin of
    // CorpusOps' per-source `source_drift`: each day's distribution over
    // (event_type × value-bin) buckets vs the whole-log reference, as
    // integer total-variation distance on the cross-multiplied form
    // |n_db·N − n_b·N_d| (no per-bucket float division to round; one
    // truncating div to ppm at the end — bit-stable cross-engine). The
    // day that a feed broke, an event type vanished, or values shifted
    // magnitude pops out as a TV spike with the worst bucket named.
    // Missing buckets still contribute (days × buckets grid with
    // coalesced-0 counts): a day that DROPS an event type entirely is
    // exactly the drift this must catch. Scale shape: ONE event-log scan
    // feeding the (day, bucket) count shuffle (map-side combine,
    // |days|·|buckets| rows out); the grid / window / rollup all run on
    // that KB-sized marginal — the monitor costs one scan at any log
    // size, and the value-bin edges are static so the binning is
    // codegen'd scan-side. Overflow headroom: each dev term n_db·N ≤ N²
    // is exact in long to N ~ 3·10⁹ events; everything DOWNSTREAM of
    // the terms (their sum can reach 2·N·n_d, and the ppm scaling
    // multiplies by another 10⁶) runs in decimal(38,0) — matching
    // DuckDB's HUGEINT reduction — so the binding constraint is the
    // long dev term alone, not the 10⁶-scaled sum (which would wrap
    // silently in long once N·n_d > ~4.6·10¹², a regime DuckDB's
    // exact HUGEINT would NOT wrap in — a cross-engine divergence).
    "temporal_drift" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d).select(
        to_date(col("ts")).as("day"),
        // value ∈ [0, ~500): 125-wide bins capped at 3 — one IEEE
        // division + exact floor, identical on identical doubles
        concat(col("event_type"), lit("|"),
          least(floor(col("value") / 125.0d).cast("long"), lit(3L))
            .cast("string")).as("bucket"))
      // ONE log scan: (day, bucket) is the finest marginal; day, bucket,
      // and grand totals all re-aggregate this KB frame (without the
      // persist Catalyst would plan a parquet scan per count subtree)
      val ndb = ev.groupBy(col("day"), col("bucket"))
        .agg(count(lit(1)).as("n_db"))
        .persist() // KB frame, 3 consumers; registry reclaims post-action
      graft.emf.EmfPlanner.registerPersisted(ndb)
      val nb = ndb.groupBy(col("bucket")).agg(sum(col("n_db")).as("n_b"))
      val nd = ndb.groupBy(col("day")).agg(sum(col("n_db")).as("n_d"))
      // each day's grid carries every bucket exactly once, so summing
      // n_b within the day re-derives N on the KB frame
      val grid = nd.crossJoin(broadcast(nb))
        .join(ndb, Seq("day", "bucket"), "left")
        .withColumn("n_tot",
          sum(col("n_b")).over(Window.partitionBy(col("day"))))
        .withColumn("dev",
          abs(coalesce(col("n_db"), lit(0L)) * col("n_tot") -
            col("n_b") * col("n_d")))
      val w = Window.partitionBy(col("day"))
        .orderBy(col("dev").desc, col("bucket"))
      grid.withColumn("rnk", row_number().over(w))
        .groupBy(col("day"), col("n_d"))
        // decimal(38,0) from the sum onward — see overflow headroom note
        .agg(sum(col("dev").cast("decimal(38,0)")).as("tv_num"),
          max(col("n_tot")).as("n_tot"),
          max(when(col("rnk") === 1, col("bucket"))).as("top_bucket"),
          max(when(col("rnk") === 1, col("dev"))).as("top_dev"))
        .select(col("day"), col("n_d").as("n_events"),
          expr("tv_num * 1000000 div (2 * cast(n_tot as decimal(38,0)) * n_d)")
            .as("tv_ppm"),
          col("top_bucket"), col("top_dev"))
        .orderBy(col("day"))
    }),

    // Freshness-weighted (exponentially decayed) event statistics — the
    // recency weighting a training-data pipeline applies so last week's
    // data outweighs last year's. The decay weight is EXACT integer
    // arithmetic: half-life = 7 days, weight = 1024 >> (age div 7) — a
    // bit shift, no exp()/pow() to round differently across engines
    // (2^-k IS exponential decay, just sampled at half-life steps). The
    // anchor is the log's last day as a literal (a production run passes
    // "now"; current_date would make the result non-reproducible).
    // Scale shape: the weight depends only on (event_type, day), so the
    // corpus scan collapses to the (type, day) marginal FIRST (one
    // map-side-combinable shuffle, |types|·|days| rows out) and the
    // reweighting runs on that KB frame — re-decaying under a different
    // half-life or anchor never rescans the log. Overflow headroom:
    // term ≤ 1024·sum(cents per type-day); the per-type weighted sum
    // stays exact in long to ~1.8e11 events per type (max-weight worst
    // case — widen to decimal(38,0) beyond). decayed_avg_cents is one
    // truncating div on positive operands (Spark `div` ≡ DuckDB `//`).
    "temporal_decay" -> ((s, d) => {
      val anchor = lit("2024-01-31").cast("date")
      val cents = (col("value").cast("decimal(18,2)") * 100).cast("long")
      val marginal = Tables.events(s, d)
        .select(col("event_type"), to_date(col("ts")).as("day"), cents.as("c"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n_de"), sum(col("c")).as("s_de"))
      marginal
        .withColumn("k",
          least(floor(datediff(anchor, col("day")) / 7).cast("int"), lit(10)))
        .withColumn("w", expr("shiftright(1024L, k)"))
        .groupBy(col("event_type"))
        .agg(sum(col("n_de")).as("n_events"),
          sum(col("w") * col("n_de")).as("decayed_n"),
          sum(col("w") * col("s_de")).as("decayed_cents"))
        .withColumn("decayed_avg_cents",
          expr("decayed_cents div decayed_n"))
        .orderBy(col("event_type"))
    }),

    // SCD2 history construction — the warehouse temporal-modeling
    // primitive: turn a change log into effective-dated dimension rows
    // (valid_from / valid_to / is_current), where only an ACTUAL value
    // change opens a new version (consecutive duplicates collapse into
    // one validity interval — the islands-and-gaps pattern, which is
    // what separates SCD2 from a plain lead() join). Here each user's
    // event_type stream is the tracked attribute. Plan shape: one
    // user-keyed window (change flag via lag, version via running sum),
    // one (user, version) aggregation, then a second window on the
    // VERSION frame (≤ one row per change, ≪ log size) for valid_to =
    // lead(valid_from). All three steps share the user partitioning, so
    // the log is shuffled once; history size is bounded by change
    // count, not log size. (ts, event_id) is unique, so every window
    // and the min-struct version opener are deterministic.
    "scd2_history" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val flagged = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev", lag(col("event_type"), 1).over(byUser))
        .withColumn("chg",
          when(col("prev").isNull || col("prev") =!= col("event_type"), 1)
            .otherwise(0))
        .withColumn("version", sum(col("chg")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val versions = flagged
        .groupBy(col("user_id"), col("version"))
        .agg(min(col("event_type")).as("state"), // constant within version
          min(col("ts")).as("valid_from"),
          count(lit(1)).as("n_records"))
      val byVer = Window.partitionBy(col("user_id")).orderBy(col("version"))
      versions
        .withColumn("valid_to", lead(col("valid_from"), 1).over(byVer))
        .withColumn("is_current", col("valid_to").isNull)
        .select(col("user_id"), col("version"), col("state"),
          col("valid_from"), col("valid_to"), col("is_current"),
          col("n_records"))
        .orderBy(col("user_id"), col("version"))
    }),

    // Per-group z-score normalization — the feature-standardization
    // step of a training pipeline, bit-exact cross-engine: the moments
    // are EXACT integers (cents, the event_outliers convention), and
    // z = (n·x − S) / √(n·Q − S²) — algebraically (x−μ)/σ with
    // population σ, rearranged so the float path is exactly THREE
    // correctly-rounded IEEE ops (subtract of exact-integer doubles,
    // one √ of an exact-integer double, one division) in an identical
    // tree on both engines. Plan: one 5-row moments aggregation
    // broadcast back onto the scan — the normalization itself is
    // map-only at any log size.
    "feature_zscore" -> ((s, d) => {
      val cents = (col("value").cast("decimal(18,2)") * 100).cast("long")
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("event_type"), cents.as("w"))
      val stats = ev.groupBy(col("event_type")).agg(
        count(lit(1)).as("n"), sum(col("w")).as("sw"),
        sum(col("w") * col("w")).as("qw"))
      def d2(c: Column): Column = c.cast("double")
      ev.join(broadcast(stats), "event_type")
        .select(col("event_id"), col("event_type"),
          ((d2(col("n")) * d2(col("w")) - d2(col("sw"))) /
            sqrt(d2(col("n")) * d2(col("qw")) - d2(col("sw")) * d2(col("sw"))))
            .as("z"))
        .orderBy(col("event_id"))
    }),

    // Cohort retention — the product-analytics matrix: users bucketed
    // by first-seen week, counted in each subsequent week they return.
    // Weeks are INTEGER arithmetic from a fixed Monday epoch
    // (2024-01-01), not date_trunc, so both engines bucket identically
    // with no week-start convention to match. Plan: one user-keyed min
    // aggregation for the cohort frame (|users| rows, joined back
    // UNHINTED — the user dimension is billions at 100 TB, so a forced
    // broadcast would grow with the data; user_id hash-partitions
    // uniformly and AQE broadcasts small user sets), then one
    // (cohort, age) distinct-user count; distinct is exact because a
    // user appears once per (cohort, age) cell after the de-dup — the
    // whole matrix is |cohorts|² cells.
    "cohort_retention" -> ((s, d) => {
      val wk = floor(datediff(to_date(col("ts")),
        lit("2024-01-01").cast("date")) / 7).cast("long")
      val ev = Tables.events(s, d)
        .select(col("user_id"), wk.as("wk"))
      val cohort = ev.groupBy(col("user_id"))
        .agg(min(col("wk")).as("cohort_wk"))
      ev.join(cohort, "user_id")
        .select(col("user_id"), col("cohort_wk"),
          (col("wk") - col("cohort_wk")).as("age_wk"))
        .distinct()
        .groupBy(col("cohort_wk"), col("age_wk"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("cohort_wk"), col("age_wk"))
    }),
  )

  def oracle: Map[String, String] = Map(
    "stream_tumbling" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart, event_type,
        | count(1) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY wstart, event_type""".stripMargin,
    // a 1h/30min sliding window = two interleaved 1h bucketings offset by
    // 30 minutes: every event belongs to exactly two windows
    "stream_sliding" ->
      """WITH assigned AS (
        |  SELECT time_bucket(INTERVAL '30 minutes', ts) AS wstart, event_type, value
        |  FROM events
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes',
        |         event_type, value
        |  FROM events)
        |SELECT wstart, event_type, count(1) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM assigned GROUP BY 1, 2 ORDER BY wstart, event_type""".stripMargin,
    // gap-based sessionization: lag → new-session flag → cumulative id;
    // session end = last ts + gap (Spark's session_window convention)
    "stream_session" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              <= INTERVAL '10 minutes' THEN 0 ELSE 1 END AS new_s
        |  FROM events),
        |numbered AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT min(ts) AS session_start,
        |       max(ts) + INTERVAL '10 minutes' AS session_end,
        |       user_id, count(1) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM numbered GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    // row_number ≡ struct-min because event_id is unique (no (ts,
    // event_id) ties); value travels with the picked row, no arithmetic
    "stream_dedup" ->
      """WITH r AS (
        |  SELECT user_id, event_type, ts, event_id, value,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts, event_id) AS rn
        |  FROM events)
        |SELECT user_id, event_type, ts AS first_ts,
        |  event_id AS first_event_id, value AS first_value
        |FROM r WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
    // identical hour bucketing, identical digit-run item extraction
    // (both engines drop digit-free props BEFORE ranking), identical
    // (count desc, item asc) rank tie-break
    "stream_topk" ->
      """WITH ev AS (
        |  SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart,
        |    TRY_CAST(regexp_extract(props, '(\d+)', 1) AS BIGINT) AS item
        |  FROM events),
        |g AS (
        |  SELECT wstart, item, count(1) AS n
        |  FROM ev WHERE item IS NOT NULL GROUP BY 1, 2)
        |SELECT wstart, item, n,
        |  CAST(row_number() OVER (PARTITION BY wstart
        |    ORDER BY n DESC, item) AS INT) AS rnk
        |FROM g QUALIFY rnk <= 3 ORDER BY wstart, rnk""".stripMargin,
    // identical hour bucketing, identical $10 grid, identical integer
    // nearest-rank cutoffs (the quantile_hist rule per window)
    "stream_quantile" ->
      """WITH b AS (
        |  SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart, event_type,
        |    CAST(floor(value / 10) AS BIGINT) * 10 AS bin_lo,
        |    count(1) AS cnt
        |  FROM events GROUP BY 1, 2, 3),
        |c AS (
        |  SELECT wstart, event_type, bin_lo,
        |    sum(cnt) OVER (PARTITION BY wstart, event_type ORDER BY bin_lo
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER (PARTITION BY wstart, event_type) AS n
        |  FROM b)
        |SELECT wstart, event_type, CAST(n AS BIGINT) AS n,
        |  CAST(min(CASE WHEN cum * 100 >= n * 50 THEN bin_lo END)
        |    AS BIGINT) AS p50_lo,
        |  CAST(min(CASE WHEN cum * 100 >= n * 90 THEN bin_lo END)
        |    AS BIGINT) AS p90_lo
        |FROM c GROUP BY wstart, event_type, n
        |ORDER BY wstart, event_type""".stripMargin,
    // identical hour bucketing, identical 32-id bitmap shift/OR/popcount
    "stream_bitmap_distinct" ->
      """WITH b AS (
        |  SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart, event_type,
        |    user_id // 32 AS bkt,
        |    bit_or((1::BIGINT) << CAST(user_id % 32 AS INT)) AS bits
        |  FROM events GROUP BY 1, 2, 3)
        |SELECT wstart, event_type,
        |  CAST(sum(bit_count(bits)) AS BIGINT) AS n_users
        |FROM b GROUP BY 1, 2 ORDER BY wstart, event_type""".stripMargin,
    // same lag→flag→running-sum sessionization (strict < 10-min gap in
    // integer microseconds), trajectory = types ordered by (ts, event_id)
    "session_trajectories" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (
        |           PARTITION BY user_id ORDER BY ts, event_id))
        |         < 600000000 THEN 0 ELSE 1 END AS new_s
        |  FROM events),
        |numbered AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT user_id, min(ts) AS session_start, count(1) AS n_events,
        |  string_agg(event_type, '>' ORDER BY ts, event_id) AS trajectory
        |FROM numbered GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    // identical stage chain: first view, first click after it, first
    // purchase after that
    "event_funnel" ->
      """WITH g1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |g2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN g1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > g1.t1 GROUP BY 1),
        |g3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN g2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > g2.t2 GROUP BY 1)
        |SELECT (SELECT count(1) FROM g1) AS n_view_users,
        |       (SELECT count(1) FROM g2) AS n_click_users,
        |       (SELECT count(1) FROM g3) AS n_purchase_users""".stripMargin,
    // identical integer moments, identical double expression tree
    "event_outliers" ->
      """WITH ev AS (
        |  SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS w
        |  FROM events),
        |st AS (
        |  SELECT event_type, count(1) AS n,
        |    CAST(sum(w) AS BIGINT) AS sw,
        |    CAST(sum(w * w) AS BIGINT) AS qw
        |  FROM ev GROUP BY event_type)
        |SELECT event_type, count(1) AS n,
        |  CAST(sum(CASE WHEN
        |    (CAST(st.n AS DOUBLE) * CAST(ev.w AS DOUBLE) - CAST(st.sw AS DOUBLE))
        |    * (CAST(st.n AS DOUBLE) * CAST(ev.w AS DOUBLE) - CAST(st.sw AS DOUBLE))
        |    > 9.0 * (CAST(st.n AS DOUBLE) * CAST(st.qw AS DOUBLE)
        |             - CAST(st.sw AS DOUBLE) * CAST(st.sw AS DOUBLE))
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM ev JOIN st USING (event_type)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // same day truncation (nanos ts → date), same static value bins,
    // same day×bucket grid with coalesced-0 counts, same
    // cross-multiplied integer deviations; CASTs because DuckDB sums to
    // HUGEINT (which .df() would float)
    "temporal_drift" ->
      """WITH ev AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    event_type || '|' || CAST(least(
        |      CAST(floor(value / 125.0) AS BIGINT), 3) AS VARCHAR) AS bucket
        |  FROM events),
        |ndb AS (SELECT day, bucket, count(1) AS n_db
        |        FROM ev GROUP BY 1, 2),
        |nb AS (SELECT bucket, count(1) AS n_b FROM ev GROUP BY 1),
        |nd AS (SELECT day, count(1) AS n_d FROM ev GROUP BY 1),
        |tot AS (SELECT count(1) AS n_tot FROM ev),
        |grid AS (
        |  SELECT nd.day, nd.n_d, nb.bucket, nb.n_b, tot.n_tot,
        |    abs(coalesce(ndb.n_db, 0) * tot.n_tot - nb.n_b * nd.n_d) AS dev
        |  FROM nd CROSS JOIN nb CROSS JOIN tot
        |  LEFT JOIN ndb ON ndb.day = nd.day AND ndb.bucket = nb.bucket),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY day
        |    ORDER BY dev DESC, bucket) AS rnk
        |  FROM grid)
        |SELECT day, CAST(n_d AS BIGINT) AS n_events,
        |  CAST(sum(dev) * 1000000 // (2 * max(n_tot) * n_d) AS BIGINT)
        |    AS tv_ppm,
        |  max(CASE WHEN rnk = 1 THEN bucket END) AS top_bucket,
        |  CAST(max(CASE WHEN rnk = 1 THEN dev END) AS BIGINT) AS top_dev
        |FROM ranked GROUP BY day, n_d ORDER BY day""".stripMargin,
    // identical (type, day) marginal, identical bit-shift weight
    // (DuckDB >> on BIGINT), identical truncating final division
    "temporal_decay" ->
      """WITH m AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    count(1) AS n_de,
        |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS BIGINT) AS s_de
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT *, 1024 >> least(
        |    CAST(floor(date_diff('day', day, DATE '2024-01-31') / 7)
        |      AS INTEGER), 10) AS w
        |  FROM m)
        |SELECT event_type,
        |  CAST(sum(n_de) AS BIGINT) AS n_events,
        |  CAST(sum(w * n_de) AS BIGINT) AS decayed_n,
        |  CAST(sum(w * s_de) AS BIGINT) AS decayed_cents,
        |  CAST(sum(w * s_de) // sum(w * n_de) AS BIGINT)
        |    AS decayed_avg_cents
        |FROM w GROUP BY event_type ORDER BY event_type""".stripMargin,
    // identical change-flag / running-sum versioning, identical
    // version-frame lead
    "scd2_history" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |           OR lag(event_type) OVER w != event_type
        |         THEN 1 ELSE 0 END AS chg
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |numbered AS (
        |  SELECT *, sum(chg) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version
        |  FROM flagged),
        |versions AS (
        |  SELECT user_id, version, min(event_type) AS state,
        |    min(ts) AS valid_from, CAST(count(1) AS BIGINT) AS n_records
        |  FROM numbered GROUP BY 1, 2)
        |SELECT user_id, CAST(version AS BIGINT) AS version, state,
        |  valid_from,
        |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
        |    AS valid_to,
        |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
        |    IS NULL AS is_current,
        |  n_records
        |FROM versions ORDER BY user_id, version""".stripMargin,
    // identical exact-integer moments, identical 3-op IEEE tree
    "feature_zscore" ->
      """WITH ev AS (
        |  SELECT event_id, event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS w
        |  FROM events),
        |st AS (
        |  SELECT event_type, count(1) AS n,
        |    CAST(sum(w) AS BIGINT) AS sw, CAST(sum(w * w) AS BIGINT) AS qw
        |  FROM ev GROUP BY 1)
        |SELECT ev.event_id, ev.event_type,
        |  (CAST(st.n AS DOUBLE) * CAST(ev.w AS DOUBLE)
        |     - CAST(st.sw AS DOUBLE))
        |  / sqrt(CAST(st.n AS DOUBLE) * CAST(st.qw AS DOUBLE)
        |     - CAST(st.sw AS DOUBLE) * CAST(st.sw AS DOUBLE)) AS z
        |FROM ev JOIN st USING (event_type)
        |ORDER BY ev.event_id""".stripMargin,
    // identical integer week bucketing from the same Monday epoch
    "cohort_retention" ->
      """WITH ev AS (
        |  SELECT user_id,
        |    CAST(floor(date_diff('day', DATE '2024-01-01',
        |      CAST(ts AS DATE)) / 7) AS BIGINT) AS wk
        |  FROM events),
        |cohort AS (
        |  SELECT user_id, min(wk) AS cohort_wk FROM ev GROUP BY 1),
        |cells AS (
        |  SELECT DISTINCT ev.user_id, cohort.cohort_wk,
        |    ev.wk - cohort.cohort_wk AS age_wk
        |  FROM ev JOIN cohort USING (user_id))
        |SELECT cohort_wk, age_wk, CAST(count(1) AS BIGINT) AS n_users
        |FROM cells GROUP BY 1, 2 ORDER BY cohort_wk, age_wk""".stripMargin,
  )
}

/** Typed rows for [[EventStreams.attributionStream]]. */
case class AttrEvent(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
    event_type: String, cents: Long)
case class AttrHit(user_id: Long, event_id: Long, attributed_type: String,
    cents: Long)

/** Streaming last-touch attribution — the live form of the
  * oracle-checked `attribution_last_touch` batch query. State per user
  * is ONE string (the last non-purchase event type seen); each incoming
  * purchase is credited to it, each non-purchase replaces it. The
  * order-sensitivity the batch window gets from ORDER BY is recovered
  * per micro-batch by sorting the group's rows on (ts, event_id) —
  * correct as long as a user's events arrive watermark-ordered across
  * batches, which is the same in-order contract the batch oracle
  * encodes. State is O(1) per user forever (no timeout needed);
  * contrast with the windowed EMF state in [[graft.emf.EmfStreaming]],
  * which must hold per-window partials. StreamingSpec feeds the real
  * event log in two time-split batches and asserts the per-purchase
  * attribution equals the batch query's, pinning the cross-batch state
  * carry.
  */
object AttributionStream {
  import org.apache.spark.sql.Dataset
  import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

  def attributionStream(ev: Dataset[AttrEvent]): Dataset[AttrHit] = {
    import ev.sparkSession.implicits._
    ev.groupByKey(_.user_id)
      .flatMapGroupsWithState[String, AttrHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[AttrEvent], state: GroupState[String]) =>
          val sorted = rows.toIndexedSeq
            .sortBy(r => (r.ts.getTime, r.ts.getNanos, r.event_id))
          var last = state.getOption.getOrElse("direct")
          val out = IndexedSeq.newBuilder[AttrHit]
          for (r <- sorted) {
            if (r.event_type == "purchase")
              out += AttrHit(uid, r.event_id, last, r.cents)
            else last = r.event_type
          }
          state.update(last)
          out.result().iterator
      }
  }
}
