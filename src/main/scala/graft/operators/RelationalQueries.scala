package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational operator surface (SURVEY.md §2.2): joins in every shape,
  * window functions, sorts/top-k, set operations, grouping analytics.
  *
  * Scale notes (100 TB design):
  *  - Only CONSTANT-size dimensions (`nation` 25 rows, `region` 5) carry
  *    broadcast hints. `part`/`customer`/`supplier` scale with SF (a
  *    100 TB warehouse has TB-scale "dims"), so those joins are
  *    unhinted — AQE broadcasts them while they fit and shuffles them
  *    when they don't. `join_broadcast` alone keeps its hint, because
  *    demonstrating that strategy is the operator's purpose.
  *  - Fact-fact joins (lineitem ⋈ orders) shuffle on the join key; AQE
  *    re-plans to broadcast when a filtered side shrinks below the
  *    threshold, and handles skew.
  *  - Money sums are computed in DECIMAL: deterministic (exact) regardless
  *    of partitioning/summation order, so results are reproducible across
  *    cluster sizes. At the output boundary every decimal is cast to
  *    DOUBLE: both engines cast the same exact decimal → bit-identical
  *    doubles, and the driver's stringified compare (where
  *    Decimal('139345.00') != 139345.0) sees identical values. Never
  *    surface a DECIMAL or ARRAY column in a checked query result.
  *  - Every query ends in an ORDER BY for deterministic output; Catalyst's
  *    EliminateSorts removes it under count()-style consumers, so the
  *    bench path does not pay for it.
  */
object RelationalQueries {

  /** decimal-exact money expression */
  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Columns the profiler queries cover (orders table). */
  private[graft] val ProfileCols =
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")

  /** Input-size gate for [[profileColumns]]'s exact↔approx switch: 1 GiB
    * of scan input (parquet file bytes). Under it the exact multi-distinct
    * Expand costs ~|rows|·|cols| extra aggregation input — fine at
    * fixture scale (orders at sf10 is 267 MB and profiles exactly);
    * above it the Expand is the profiler's scale killer (measured 211×
    * wall at ×1000 data, BASELINE.md sf100 probe) and the distinct
    * counts switch to approx_count_distinct in one scan-shaped pass. */
  private[graft] val ProfileExactMaxBytes = 1L << 30

  /** Per-column profile: non-null/null counts, min/max (as strings),
    * and distinct counts — EXACT below `exactMaxBytes` of scan input,
    * APPROX (HLL++, rsd 0.05) above it. The gate reads the logical
    * plan's size statistics (parquet footer/file metadata — no job runs
    * to decide), so the plan genuinely switches on data scale:
    *
    *  - exact regime: TWO single-row aggregates, crossed. Mixing the
    *    multi-distinct rewrite (Expand ×|cols|) with min/max(string) in
    *    ONE agg forces the whole expanded frame into SortAggregate
    *    (string buffers are not hash-aggregable), sorting |rows|·|cols|
    *    — measured 2.8 s at sf0.1. Split, the distinct counts
    *    hash-aggregate over the expanded keys and the min/max/null pass
    *    is a plain scan-shaped single-group agg: no sort anywhere,
    *    2.8 s → ~0.8 s.
    *  - approx regime: ONE aggregation pass — approx_count_distinct's
    *    HLL++ buffers ride the same ObjectHashAggregate as the
    *    min/max/null aggs, so the profiler reads the data once and
    *    never Expands. This is the 100 TB path.
    *
    * ProfilingSpec pins the plan shape of both regimes and the approx
    * regime's 3·rsd accuracy; the `profile_columns` oracle replays the
    * exact regime bit-for-bit at every gate SF. */
  def profileColumns(df: DataFrame, cols: Seq[String],
      exactMaxBytes: Long = ProfileExactMaxBytes): DataFrame = {
    val exact =
      df.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(exactMaxBytes)
    val bAggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val stacked =
      s"stack(${cols.size}, " + cols.map(c =>
        s"'$c', ${c}__n, ${c}__nulls, ${c}__distinct, ${c}__min, ${c}__max")
        .mkString(", ") +
        ") as (col_name, n_nonnull, n_null, n_distinct, min_val, max_val)"
    val profiled =
      if (exact) {
        val dAggs = cols.map(c => countDistinct(col(c)).as(s"${c}__distinct"))
        df.agg(bAggs.head, bAggs.tail: _*)
          .crossJoin(broadcast(df.agg(dAggs.head, dAggs.tail: _*)))
      } else {
        val aAggs = cols.map(c =>
          approx_count_distinct(col(c)).as(s"${c}__distinct"))
        val all = bAggs ++ aAggs
        df.agg(all.head, all.tail: _*)
      }
    profiled.selectExpr(stacked).orderBy(col("col_name"))
  }

  /** Rows-per-key ceiling above which [[q21Core]] abandons the lineitem
    * self-joins for the single-shuffle distinct-count form. TPC-H-shaped
    * data has ≤ 7 lines per order — orders of magnitude under this. */
  private[graft] val Q21SkewMaxPerKey = 10000L

  /** Scan-size floor under which [[q21Core]] skips the hot-key stat and
    * takes the self-join form unconditionally. The stat protects
    * CLUSTER-scale runs from a quadratic key; under ~1 GiB of plan-stats
    * input the guaranteed sampling job (a full, if column-pruned, pass —
    * Bernoulli sampling still reads every row group) costs a visible
    * fraction of the very query it protects, so the planner accepts the
    * self-join form's documented worst case instead of paying a certain
    * stat scan on every small run — the same cost-of-deciding reasoning
    * as [[ProfileExactMaxBytes]], read from the same job-free logical
    * plan statistics. Above the floor the stat runs AT MOST ONCE per
    * (frame, key) per JVM ([[hotKeyStatCache]]). */
  private[graft] val Q21StatMinBytes = 1L << 30

  /** Session-scoped memo for [[estMaxRowsPerKey]]: the hot-key ceiling
    * is a property of the source table, not of the query run, so one
    * measurement per (frame identity, key) serves every later q21 build
    * in the JVM — the lazily-materialized stand-in for the warehouse
    * table-statistics read described on [[estMaxRowsPerKey]]. Keyed by
    * the frame's file-source root paths plus its analyzed-plan semantic
    * hash (identical rebuilds of the same query share the entry;
    * differently-filtered frames never do), bounded by the number of
    * distinct query shapes built in the session. */
  private[operators] val hotKeyStatCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), java.lang.Long]()

  /** Cache identity for a frame: file-source root paths + analyzed-plan
    * semantic hash (the hash alone for non-file frames). */
  private def frameIdentity(df: DataFrame): String = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val paths = df.queryExecution.analyzed.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.mkString(",")
        case _ => ""
      }
    }.filter(_.nonEmpty)
    paths.sorted.mkString(";") + "#" + df.queryExecution.analyzed.semanticHash()
  }

  /** Order-of-magnitude estimate of the hottest key's row count from a
    * 0.1% Bernoulli sample (fixed seed → deterministic on a fixed
    * layout): a key with f rows lands ~f/1000 sampled rows, so
    * max(sampleCount)·1000 resolves "7 rows" vs "10 million rows" —
    * the only distinction the [[q21Core]] gate needs. Computed at most
    * once per (frame, key) per JVM; at warehouse scale you'd read this
    * from table statistics instead and pass the threshold accordingly. */
  private def estMaxRowsPerKey(df: DataFrame, key: String): Long = {
    val id = (frameIdentity(df), key)
    val cached = hotKeyStatCache.get(id)
    if (cached != null) return cached.longValue
    val p = 0.001
    val m = df.sample(p, seed = 42L).groupBy(col(key))
      .agg(count(lit(1)).as("c")).agg(max(col("c"))).collect()(0)
    val est = if (m.isNullAt(0)) 0L else (m.getLong(0) / p).toLong
    hotKeyStatCache.put(id, java.lang.Long.valueOf(est))
    est
  }

  /** Q21's join pipeline with the self-correlation strategy chosen by a
    * hot-key stat. `l` carries (l_orderkey, l_suppkey, l_returnflag);
    * `o` the qualifying order keys; `suN` the (s_suppkey, s_name)
    * dimension remnant.
    *
    *  - NORMAL distribution (max rows per orderkey ≤ `skewMaxPerKey`):
    *    the semi (EXISTS other-supplier line) and anti (NOT EXISTS other
    *    at-fault supplier) ride as lineitem self-joins — the orders
    *    join, the semi and the anti are ALL keyed on l_orderkey, so ONE
    *    shuffle partitioning feeds three consecutive joins with the <>
    *    predicates as residuals (never a BNLJ). This is what SQL EXISTS
    *    planning produces and the plan you want while per-key match
    *    lists stay small.
    *  - EXTREME ORDER-KEY SKEW (a key past the ceiling): within one SMJ
    *    key the semi/anti scan is O(left·right) — a 10M-row key does
    *    10¹⁴ residual comparisons. The alternative replaces BOTH
    *    self-joins with ONE groupBy(l_orderkey) pass over the same
    *    shuffle computing per-order distinct-supplier counts:
    *    `EXISTS x.supp ≠ s` ⇔ nSupp ≥ 2 (s itself is in the order), and
    *    `NOT EXISTS fault y.supp ≠ s` ⇔ nFault = 1 (s is a fault
    *    supplier by l1 membership) — linear in the key's rows, skew
    *    handled by AQE like any aggregation.
    *
    * Both forms are the same function of the data (Q21SkewSpec pins
    * result equality on a skewed fixture and the plan shape of each);
    * `skewMaxPerKey ≤ 0` forces the count form, `Long.MaxValue` forces
    * the self-join form — both short-circuit the sampling scan, as does
    * any frame under [[Q21StatMinBytes]] of plan-stats scan input (so
    * building this query at bench/fixture scale runs NO job at all, and
    * above the floor the stat is paid once per session, not per run). */
  private[graft] def q21Core(suN: DataFrame, o: DataFrame, l: DataFrame,
      skewMaxPerKey: Long = Q21SkewMaxPerKey,
      statMinBytes: Long = Q21StatMinBytes): DataFrame = {
    val l1 = l.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_suppkey"))
    val skewed = skewMaxPerKey <= 0L ||
      (skewMaxPerKey != Long.MaxValue &&
        l.queryExecution.optimizedPlan.stats.sizeInBytes >
          BigInt(statMinBytes) &&
        estMaxRowsPerKey(l, "l_orderkey") > skewMaxPerKey)
    val waiting =
      if (!skewed) {
        val l2 = l.select(col("l_orderkey").as("x_orderkey"),
          col("l_suppkey").as("x_suppkey"))
        val l3 = l1.select(col("l_orderkey").as("y_orderkey"),
          col("l_suppkey").as("y_suppkey"))
        l1.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(l2, col("l_orderkey") === col("x_orderkey") &&
            col("l_suppkey") =!= col("x_suppkey"), "left_semi")
          .join(l3, col("l_orderkey") === col("y_orderkey") &&
            col("l_suppkey") =!= col("y_suppkey"), "left_anti")
      } else {
        val counts = l
          .groupBy(col("l_orderkey").as("k_orderkey"))
          .agg(countDistinct(col("l_suppkey")).as("n_supp"),
            countDistinct(when(col("l_returnflag") === "R",
              col("l_suppkey"))).as("n_fault"))
        l1.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(counts, col("l_orderkey") === col("k_orderkey"))
          .filter(col("n_supp") >= 2 && col("n_fault") === 1)
          .drop("k_orderkey", "n_supp", "n_fault")
      }
    waiting
      .join(suN, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TPC-H Q1 shape: the canonical scan → filter → hash-agg pipeline.
    // One shuffle on (returnflag, linestatus); partial aggregation map-side.
    "q1_pricing" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))).cast("double").as("sum_disc_price"),
          // averages as exact-decimal sum ÷ count in double: both engines
          // divide identical doubles → bit-identical results, no rounding
          (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
          (sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
          (sum(dec(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Broadcast hash join: fact ⋈ small dim. No shuffle on the fact side
    // at all — the dim ships to every executor. The hint IS this demo
    // operator's semantics (join_shuffle is the sibling strategy); a
    // production query on a dim that scales with the fact should stay
    // unhinted and let AQE pick, as every non-demo query here does.
    "join_broadcast" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("p_brand"))
    }),

    // Fact-fact equi join: shuffles both sides on the key (sort-merge or
    // shuffled-hash; AQE decides), then one agg shuffle.
    "join_shuffle" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(dec(col("o_totalprice"))).cast("double").as("sum_price"))
        .orderBy(col("c_mktsegment"))
    }),

    // Left-semi: EXISTS without materializing the right side's columns.
    "join_semi" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // Left-anti: NOT EXISTS. Customers with no URGENT order — the
    // filtered right side keeps the result non-empty in this testdata
    // (every customer has SOME order, so the unfiltered "never ordered"
    // form was a vacuous empty-vs-empty oracle match).
    "join_anti" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // Left-outer + agg: per-customer order count INCLUDING zero-order
    // customers (count of the non-null join side, not count(*)).
    "join_outer" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_custkey"))
    }),

    // Equi join with a non-equi residual: hash join on partkey, residual
    // predicate evaluated in the join — NOT a nested-loop. Unhinted:
    // part scales with the fact in TPC-H (SF×200k), so AQE decides;
    // the equi key alone drives the join either way.
    "join_nonequi" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      l.join(p,
          l("l_partkey") === p("p_partkey") && l("l_quantity") > p("p_size"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_over"), sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
        .orderBy(col("p_brand"))
    }),

    // Window: rank within partition, keep top ranks. TakeOrdered per
    // partition; rank() keeps ties so the result is deterministic.
    "window_topk_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice").desc, col("p_partkey"))
      Tables.part(s, d)
        .withColumn("rnk", rank().over(w))
        .filter(col("rnk") <= 3)
        .select(col("p_brand"), col("p_partkey"), col("p_retailprice").as("price"), col("rnk"))
        .orderBy(col("p_brand"), col("rnk"), col("p_partkey"))
    }),

    // Window: running total per customer over time (default RANGE frame —
    // ties share a value, so double-rounding is safe).
    "window_running" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"))
      Tables.orders(s, d)
        .withColumn("running", sum(dec(col("o_totalprice"))).over(w).cast("double"))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("running"))
        .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    }),

    // Window: lag over a pre-aggregated frame (month-over-month delta).
    // Two shuffles total: agg on (brand, month), window on brand.
    "window_lag" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      val monthly = l.join(p, l("l_partkey") === p("p_partkey"))
        .groupBy(col("p_brand"), date_trunc("month", col("l_shipdate")).as("month"))
        .agg(sum(dec(col("l_extendedprice"))).as("rev"))
      val w = Window.partitionBy(col("p_brand")).orderBy(col("month"))
      monthly
        .withColumn("prev_rev", lag(col("rev"), 1).over(w))
        .withColumn("delta", col("rev") - col("prev_rev"))
        .select(col("p_brand"), col("month"), col("rev").cast("double").as("rev"),
          col("prev_rev").cast("double").as("prev_rev"),
          col("delta").cast("double").as("delta"))
        .orderBy(col("p_brand"), col("month"))
    }),

    // Window: moving average over a 3-row frame (ROWS; order made total
    // by the unique month-per-brand grain). The unpartitioned window is
    // deliberate AND bounded: it runs over the MONTHLY aggregate —
    // cardinality = #months, fixed by the calendar, not the corpus —
    // so the single-partition stage never grows with data volume.
    "window_moving" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val monthly = o
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(sum(dec(col("o_totalprice"))).as("rev"))
      val w = Window.orderBy(col("month")).rowsBetween(-2, 0)
      monthly
        .withColumn("mov_avg",
          sum(col("rev")).over(w).cast("double") / count(col("rev")).over(w))
        .withColumn("rev", col("rev").cast("double"))
        .orderBy(col("month"))
    }),

    // Window: RANGE frame over a VALUE interval (trailing 7 calendar
    // days), the frame class ROWS can't express when the time grid has
    // gaps — a missing day must still age rows out of the frame. Runs
    // on the DAILY aggregate per priority (calendar-bounded input, like
    // window_moving's monthly grid but partitioned), ordered by integer
    // epoch-day so both engines' RANGE arithmetic is exact integer
    // comparison; revenue in cents keeps the sums bit-exact.
    "window_range_interval" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(col("o_orderpriority"),
          to_date(col("o_orderdate")).as("day"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("rev_cents"))
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("d"))
        .rangeBetween(-6, 0)
      daily
        .withColumn("d", datediff(col("day"), to_date(lit("1970-01-01"))))
        .withColumn("trail7_cents", sum(col("rev_cents")).over(w))
        .select(col("o_orderpriority"), col("day"), col("rev_cents"),
          col("trail7_cents"))
        .orderBy(col("o_orderpriority"), col("day"))
    }),

    // Global top-k: TakeOrderedAndProject — no full sort, each partition
    // keeps k rows, driver merges.
    "topk_orders" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice").as("price"))
        .orderBy(col("price").desc, col("o_orderkey"))
        .limit(10)
    }),

    // Set ops over aligned schemas.
    "setop_union" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val big = c.filter(col("c_acctbal") > 9000).select(col("c_custkey"))
      val seg = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      big.union(seg).distinct().orderBy(col("c_custkey"))
    }),
    "setop_intersect" -> ((s, d) => {
      val c = Tables.customer(s, d)
      c.filter(col("c_acctbal") > 5000).select(col("c_custkey"))
        .intersect(c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey")))
        .orderBy(col("c_custkey"))
    }),
    "setop_except" -> ((s, d) => {
      val c = Tables.customer(s, d)
      c.filter(col("c_acctbal") > 5000).select(col("c_custkey"))
        .except(c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey")))
        .orderBy(col("c_custkey"))
    }),
    // Cartesian product (explicit cross join) over two small dims.
    "join_cross" -> ((s, d) => {
      Tables.region(s, d).crossJoin(Tables.nation(s, d))
        .select(col("r_name"), col("n_name"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // UNION ALL (bag semantics — duplicates preserved).
    "setop_union_all" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      l.filter(col("l_quantity") > 45).select(col("l_orderkey"))
        .unionAll(l.filter(col("l_returnflag") === "A" && col("l_quantity") > 45)
          .select(col("l_orderkey")))
        .orderBy(col("l_orderkey"))
    }),

    // Null handling: na.fill / na.drop over synthesized nulls.
    "null_handling" -> ((s, d) => {
      val withNulls = Tables.customer(s, d)
        .withColumn("bal_opt",
          when(col("c_acctbal") < 0, lit(null: java.lang.Double))
            .otherwise(col("c_acctbal")))
      val filled = withNulls.na.fill(Map("bal_opt" -> 0.0))
        .agg(sum(dec(col("bal_opt"))).cast("double").as("sum_filled"),
          count(lit(1)).as("n_all"))
      val dropped = withNulls.na.drop(Seq("bal_opt"))
        .agg(count(lit(1)).as("n_kept"))
      filled.crossJoin(dropped)
    }),

    // Data profiling — the catalog/schema probe grown up: per-column
    // non-null/null/distinct counts and min/max, then a stack() unpivot
    // of the stats row into a row per column. min/max surface as strings
    // so one schema serves every column type (bigint/varchar here;
    // doubles are excluded because float-to-string rendering differs
    // across engines). The distinct counts switch EXACT↔APPROX on input
    // size — see [[profileColumns]] — but THIS entry pins the exact
    // regime at every SF (exactMaxBytes = MaxValue): its DuckDB oracle
    // computes exact count(DISTINCT), so letting the gate flip above
    // 1 GiB would make the entry fail BY DESIGN on big inputs (round-13
    // advice). The default gate's behavior is covered from both sides:
    // `profile_columns_approx` oracle-checks the approx regime, and
    // ProfilingSpec pins the switch itself on plan shape.
    "profile_columns" -> ((s, d) =>
      profileColumns(Tables.orders(s, d), ProfileCols,
        exactMaxBytes = Long.MaxValue)),

    // The profiler's APPROX regime as its own oracle-checked entry (the
    // agg_approx_distinct pattern): force the gate, then emit the exact
    // NDVs plus 0/1 flags asserting each HLL++ estimate lands within
    // 3·rsd (rsd = 0.05 default → 15%) of exact. The exact distincts
    // here are the test harness, not the scale path — above the gate
    // you'd ship only the estimates, which is the point of the switch.
    "profile_columns_approx" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val ap = profileColumns(o, ProfileCols, exactMaxBytes = -1L)
        .select(col("col_name"), col("n_nonnull"), col("n_null"),
          col("n_distinct").as("n_est"), col("min_val"), col("max_val"))
      val dAggs = ProfileCols.map(c => countDistinct(col(c)).as(s"${c}__distinct"))
      val ex = o.agg(dAggs.head, dAggs.tail: _*)
        .selectExpr(
          s"stack(${ProfileCols.size}, " + ProfileCols.map(c =>
            s"'$c', ${c}__distinct").mkString(", ") +
            ") as (col_name, n_distinct)")
      ap.join(broadcast(ex), Seq("col_name"))
        .select(col("col_name"), col("n_nonnull"), col("n_null"),
          col("n_distinct"),
          (abs(col("n_est") - col("n_distinct")) * 100 <= col("n_distinct") * 15)
            .cast("int").as("distinct_in_3rsd"),
          col("min_val"), col("max_val"))
        .orderBy(col("col_name"))
    }),

    // bag-semantics variants (multiplicity-preserving)
    "setop_intersect_all" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      l.filter(col("l_quantity") > 25).select(col("l_orderkey"))
        .intersectAll(l.filter(col("l_returnflag") === "R").select(col("l_orderkey")))
        .orderBy(col("l_orderkey"))
    }),
    "setop_except_all" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      l.filter(col("l_quantity") > 25).select(col("l_orderkey"))
        .exceptAll(l.filter(col("l_returnflag") === "R").select(col("l_orderkey")))
        .orderBy(col("l_orderkey"))
    }),

    // Grouping analytics: rollup / cube / grouping sets share one shuffle
    // with an Expand node feeding partial aggregation.
    "agg_rollup" -> ((s, d) => {
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),
    "agg_cube" -> ((s, d) => {
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),
    "agg_groupingsets" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_gs")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority,
          |       count(1) AS n,
          |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
          |FROM orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
    }),

    // Distinct aggregation: two-phase (distinct expand + agg).
    "agg_distinct" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          countDistinct(col("o_custkey")).as("n_custs"),
          countDistinct(col("o_orderpriority")).as("n_prios"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("c_mktsegment"))
    }),

    // Bitmap-index distinct aggregation — the classic OLAP rollup
    // structure for EXACT NDV over a dense integer domain: per
    // (group, id-bucket) the member bitmap is OR-accumulated (32 ids
    // per long here; sign bit avoided so the shift replays in every
    // engine), then the group's NDV is one popcount sum. The point vs
    // countDistinct's distinct-expand: bitmap partials are tiny
    // (domain/32 longs per group, independent of ROW count), the OR is
    // map-side combined, and — like the HLL registers, but exact —
    // bitmaps MERGE across shards/days by the same OR, so a 100 TB
    // ingest keeps per-day bitmap rollups and answers cross-day NDV
    // without touching raw events.
    "agg_bitmap_distinct" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_type"), col("user_id"))
      ev
        .groupBy(col("event_type"), expr("user_id div 32").as("bkt"))
        .agg(expr("bit_or(shiftleft(1L, int(user_id % 32)))").as("bits"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_buckets"),
          sum(bit_count(col("bits"))).as("n_users"))
        .orderBy(col("event_type"))
    }),

    // TPC-H Q3 shape: 3-way join, filter both sides, agg, top-k.
    // customer join unhinted (customer scales with the fact — AQE
    // broadcasts the filtered segment when it fits); orders⋈lineitem
    // shuffles on orderkey; top-10 via TakeOrderedAndProject (no
    // global sort).
    "q3_shipping_priority" -> ((s, d) => {
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1997-06-01").cast("timestamp"))
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate") > lit("1997-06-01").cast("timestamp"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 shape: 5-way snowflake join, revenue per nation.
    // nation/region broadcast (25/5 rows at ANY scale); supplier
    // unhinted (SF-scaled — AQE decides).
    "q5_local_volume" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val su = Tables.supplier(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(su, l("l_suppkey") === su("s_suppkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))).cast("double").as("revenue"))
        .orderBy(col("n_name"))
    }),

    // TPC-H Q21 shape: the deepest join pipeline in the suite — six
    // relations: supplier ⋈ lineitem(l1) ⋈ orders ⋈ nation plus a semi
    // (EXISTS other-supplier line) and an anti (NOT EXISTS other
    // at-fault supplier) self-correlation of lineitem. The fault marker
    // is l_returnflag = 'R' (the synthetic schema has no receipt/commit
    // dates). Since round 13 the self-correlations are a COST-BASED
    // choice gated on a sampled hot-key stat — see [[q21Core]].
    "q21_waiting_suppliers" -> ((s, d) => {
      val n = Tables.nation(s, d).filter(col("n_name").isin(
        "NATION_1", "NATION_7", "NATION_13", "NATION_19"))
      val suN = Tables.supplier(s, d)
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"))
      val o = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"))
      val l = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
      q21Core(suN, o, l)
    }),

    // TPC-H Q18 shape (large-volume "whale" orders): the agg-subquery
    // pattern the suite's other headlines don't cover — the fact table
    // aggregates FIRST (one l_orderkey shuffle, map-side combine),
    // HAVING prunes to the whales (~3.4% of orders on the synthetic
    // quantity distribution), and only THEN do dimensions join. The
    // whale frame is deliberately UNHINTED: AQE broadcasts it at small
    // SF and switches to an orderkey SMJ once it outgrows the threshold
    // (sf10 executed plan: SMJ — the correct call for a 3.4% set; both
    // behaviors are the same declarative plan). Top-100 via
    // TakeOrderedAndProject, tie-broken on the unique key. At 100 TB
    // the aggregate-then-join order is the whole story: the naive
    // join-then-aggregate shape carries orders x lineitem through the
    // shuffle before dropping ~97% of it.
    "q18_large_orders" -> ((s, d) => {
      val big = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"))
        .filter(col("qty") > 220)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      o.join(big, o("o_orderkey") === big("l_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .select(col("c_name"), col("o_orderkey"), col("o_orderdate"),
          dec(col("o_totalprice")).cast("double").as("total_price"),
          col("qty"))
        .orderBy(col("total_price").desc, col("o_orderkey"))
        .limit(100)
    }),

    // argmax per group, tie-broken deterministically via struct ordering
    // (max of (price, key) pairs) — one aggregation, no window shuffle.
    "agg_argmax" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(max(struct(dec(col("o_totalprice")).as("p"), col("o_orderkey").as("k"))).as("m"))
        .select(col("o_orderpriority"), col("m.k").as("top_orderkey"),
          col("m.p").cast("double").as("top_price"))
        .orderBy(col("o_orderpriority"))
    }),

    // exact MODE per group (most frequent value, ties to the smallest
    // value): two hash aggregations — (group, value) counts with
    // map-side combine, then argmax as min(struct(-cnt, value)) — the
    // scale shape whose second stage is values-per-group-bounded, vs
    // DuckDB's mode() whose tie choice is unspecified (the oracle
    // replays the explicit rank rule instead).
    "agg_mode" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("o_orderstatus"))
        .agg(min(struct((-col("n")).as("nn"),
          col("o_orderpriority").as("p"))).as("m"))
        .select(col("o_orderstatus"), col("m.p").as("mode_priority"),
          (-col("m.nn")).as("n_mode"))
        .orderBy(col("o_orderstatus"))
    }),

    // exact median (interpolated) per group — Spark `percentile` == DuckDB
    // `quantile_cont` on integer-valued doubles (exact rank arithmetic).
    "agg_median" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, 0.5)").as("median_qty"),
          expr("percentile(l_quantity, 0.25)").as("q25"),
          expr("percentile(l_quantity, 0.75)").as("q75"))
        .orderBy(col("l_returnflag"))
    }),

    // Histogram quantiles — the 100 TB quantile path. agg_median's
    // exact percentile() buffers every value per group; percentile_
    // approx (KLL-ish) is bounded but not cross-engine-replayable
    // (text_quality_filter_approx stays rows-only for that reason).
    // A FIXED-GRID histogram is both: one (type, bin) count
    // aggregation — map-side combined, shuffle bounded at
    // groups×bins regardless of row count — then the quantile is the
    // lower edge of the first bin whose running mass reaches
    // ceil(q·n), all integer arithmetic the oracle replays
    // bit-for-bit. Error is bounded by bin width (here 10 on a 0-500
    // domain), the estimate is deterministic, and the histogram
    // MERGES across shards/days (counter addition, like sketch_cms).
    "quantile_hist" -> ((s, d) => {
      val bins = Tables.events(s, d)
        .select(col("event_type"),
          (floor(col("value") / 10).cast("long") * 10).as("bin_lo"))
        .groupBy(col("event_type"), col("bin_lo"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("bin_lo"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wt = Window.partitionBy(col("event_type"))
      bins
        .withColumn("cum", sum(col("cnt")).over(w))
        .withColumn("n", sum(col("cnt")).over(wt))
        .groupBy(col("event_type"), col("n"))
        .agg(
          min(when(col("cum") * 100 >= col("n") * 25, col("bin_lo"))).as("p25_lo"),
          min(when(col("cum") * 100 >= col("n") * 50, col("bin_lo"))).as("p50_lo"),
          min(when(col("cum") * 100 >= col("n") * 90, col("bin_lo"))).as("p90_lo"))
        .orderBy(col("event_type"))
    }),

    // Winsorization (percentile clipping) — quantile_hist's rule turned
    // into the robust-preprocessing step a feature pipeline applies
    // before training: per group, clamp values into [p05_edge, p95_edge]
    // where the edges come from the same fixed-grid integer histogram
    // (nearest-rank on bin lower edges, integer cross-multiplied — no
    // percentile_approx nondeterminism, merges across shards). Two-pass
    // shape like event_outliers: the histogram/edges frame is
    // groups×bins (KBs) and broadcasts back onto the scan; the clamp is
    // map-only. Everything is exact integer cents, so clipped means are
    // bit-stable (one truncating div).
    "winsorize" -> ((s, d) => {
      val cents = (col("value").cast("decimal(18,2)") * 100).cast("long")
      val ev = Tables.events(s, d)
        .select(col("event_type"), cents.as("c"))
      val bins = ev
        .withColumn("bin_lo", expr("(c div 100) * 100"))
        .groupBy(col("event_type"), col("bin_lo"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("bin_lo"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wt = Window.partitionBy(col("event_type"))
      val edges = bins
        .withColumn("cum", sum(col("cnt")).over(w))
        .withColumn("n", sum(col("cnt")).over(wt))
        .groupBy(col("event_type"))
        .agg(
          min(when(col("cum") * 100 >= col("n") * 5, col("bin_lo"))).as("lo"),
          min(when(col("cum") * 100 >= col("n") * 95, col("bin_lo"))).as("hi"))
      ev.join(broadcast(edges), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          max(col("lo")).as("lo_edge"), max(col("hi")).as("hi_edge"),
          sum(when(col("c") < col("lo"), 1L).otherwise(0L)).as("n_clip_lo"),
          sum(when(col("c") > col("hi"), 1L).otherwise(0L)).as("n_clip_hi"),
          sum(least(greatest(col("c"), col("lo")), col("hi"))).as("sum_wins"))
        .withColumn("mean_wins_cents", expr("sum_wins div n"))
        .orderBy(col("event_type"))
    }),

    // EXACT distributed quantile in two bounded passes — the 100 TB
    // answer when bin-edge error (quantile_hist) isn't acceptable and a
    // full sort is off the table. Pass 1 is quantile_hist's fixed-grid
    // histogram (shuffle bounded at groups×bins); from its cumulative
    // counts each group derives the TARGET BIN holding the nearest-rank
    // value and the rank offset k inside that bin (r = ceil(q·n), all
    // integer cross-multiplication). Pass 2 joins the scan to the
    // groups×quantiles-sized target frame on (group, bin) — AQE
    // broadcasts it at any size because its cardinality is bounded by
    // the group domain, not the data — and ranks ONLY the single target
    // bin's members (≈ n/bins rows per group, the only sort anywhere).
    // The picked element is the exact order statistic: bins below the
    // target contribute `below` ranks, so the k-th smallest member IS
    // the r-th smallest overall. Values are integer cents throughout,
    // so the DuckDB oracle (a plain row_number selection) matches
    // bit-for-bit.
    "quantile_exact" -> ((s, d) => {
      val cents = (col("value").cast("decimal(18,2)") * 100).cast("long")
      val ev = Tables.events(s, d)
        .select(col("event_type"), cents.as("c"))
        .withColumn("bin", expr("c div 1000"))
      val bins = ev.groupBy(col("event_type"), col("bin"))
        .agg(count(lit(1)).as("cnt"))
      val wc = Window.partitionBy(col("event_type")).orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wt = Window.partitionBy(col("event_type"))
      val tgt = bins
        .withColumn("cum", sum(col("cnt")).over(wc))
        .withColumn("n", sum(col("cnt")).over(wt))
        .groupBy(col("event_type"), col("n"))
        .agg(
          // min over (bin, below) structs = the FIRST bin whose cum
          // reaches the rank (integer form of cum >= ceil(q*n)), and
          // that bin's count of ranks below it
          min(when(col("cum") * 100 >= col("n") * 50,
            struct(col("bin"), (col("cum") - col("cnt")).as("below"))))
            .as("t50"),
          min(when(col("cum") * 100 >= col("n") * 90,
            struct(col("bin"), (col("cum") - col("cnt")).as("below"))))
            .as("t90"))
        .select(col("event_type"), col("n"), explode(array(
          struct(lit(50).as("q"), col("t50.bin").as("bin"),
            (expr("(n * 50 + 99) div 100") - col("t50.below")).as("k")),
          struct(lit(90).as("q"), col("t90.bin").as("bin"),
            (expr("(n * 90 + 99) div 100") - col("t90.below")).as("k"))))
          .as("t"))
        .select(col("event_type"), col("n"),
          col("t.q").as("q"), col("t.bin").as("bin"), col("t.k").as("k"))
      // pass 2 is AGGREGATION-ONLY: values are integer cents, so the
      // finest grid is exact — count bin members per distinct value
      // (map-side combined; ≤ binWidth distinct values per target bin
      // regardless of row count), then the k-th smallest is the first
      // value whose cumulative count reaches k. The cumulative window
      // runs over ≤ groups×quantiles×binWidth rows — never raw events —
      // where a row_number over the bin MEMBERS would have sorted
      // n/bins rows in one task per (group, q) at 100×.
      val wv = Window.partitionBy(col("event_type"), col("q"))
        .orderBy(col("c"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.join(tgt, Seq("event_type", "bin"))
        .groupBy(col("event_type"), col("n"), col("q"), col("k"), col("c"))
        .agg(count(lit(1)).as("vc"))
        .withColumn("cum", sum(col("vc")).over(wv))
        .filter(col("cum") >= col("k") &&
          col("cum") - col("vc") < col("k"))
        .groupBy(col("event_type"), col("n"))
        .agg(min(when(col("q") === 50, col("c"))).as("p50_c"),
          min(when(col("q") === 90, col("c"))).as("p90_c"))
        .orderBy(col("event_type"))
    }),

    // TPC-H Q6 shape: pure filter + global aggregate — the minimal
    // pushdown showcase (all three predicates reach the parquet scan).
    "q6_revenue_delta" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_quantity") < 24)
        .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount"))).cast("double").as("revenue_delta"),
          count(lit(1)).as("n"))
    }),

    // Full outer join: per-nation customer count ⟗ per-nation supplier
    // count (nations can miss either side).
    "join_full_outer" -> ((s, d) => {
      val c = Tables.customer(s, d).groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_cust"))
      val su = Tables.supplier(s, d).groupBy(col("s_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(su, Seq("nk"), "full_outer")
        .select(col("nk"), coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy(col("nk"))
    }),

    // first_value / last_value over explicit frames with a total order.
    "window_firstlast" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("first_key",
          first(col("o_orderkey")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("last_key",
          last(col("o_orderkey")).over(
            w.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
        .select(col("o_custkey"), col("o_orderkey"), col("first_key"), col("last_key"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Unpivot (wide → long): per-returnflag sums melted into
    // (metric, value) rows. Oracle via the portable UNION ALL form.
    "agg_unpivot" -> ((s, d) => {
      val wide = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(sum(dec(col("l_quantity"))).as("sum_qty"),
          sum(dec(col("l_extendedprice"))).as("sum_price"))
      wide.unpivot(Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price")), "metric", "value")
        .withColumn("value", col("value").cast("double"))
        .orderBy(col("l_returnflag"), col("metric"))
    }),

    // Correlated scalar subquery — Catalyst decorrelates it into an
    // aggregate + join (no per-row re-execution).
    "subquery_correlated" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_sq")
      s.sql(
        """SELECT o_orderkey, o_totalprice AS price
          |FROM orders_sq o
          |WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders_sq i
          |                          WHERE i.o_custkey = o.o_custkey)
          |ORDER BY o_orderkey""".stripMargin)
    }),

    // IN / NOT-EXISTS subqueries (planned as semi/anti joins). The
    // exclusion is written NOT EXISTS rather than NOT IN on purpose:
    // NOT IN over a nullable-typed subquery forces Spark's null-aware
    // anti join, which exists ONLY in broadcast form — the exclusion
    // set here is fact-sized (~half of orders), so that plan broadcasts
    // a table that grows linearly with the data and OOMs long before
    // 100 TB. NOT EXISTS decorrelates to a plain LEFT ANTI hash join
    // that shuffles both sides on the key; o_orderkey is a non-null
    // primary key, so the two forms are semantically identical.
    "subquery_in" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_in")
      Tables.customer(s, d).createOrReplaceTempView("customer_in")
      s.sql(
        """SELECT o_orderkey FROM orders_in o
          |WHERE o_custkey IN (SELECT c_custkey FROM customer_in
          |                    WHERE c_mktsegment = 'MACHINERY')
          |  AND NOT EXISTS (SELECT 1 FROM orders_in f
          |                  WHERE f.o_orderstatus = 'F'
          |                    AND f.o_orderkey = o.o_orderkey)
          |ORDER BY o_orderkey""".stripMargin)
    }),

    // Rank-family window functions over a total order. The global window
    // is bounded before it runs: TakeOrderedAndProject keeps 1000 rows,
    // so the single-partition rank stage is O(1000) at any corpus size.
    "window_ranks" -> ((s, d) => {
      val w = Window.orderBy(col("price").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice").as("price"))
        .orderBy(col("price").desc, col("o_orderkey")).limit(1000) // deterministic top-1000
        .withColumn("rn", row_number().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .withColumn("ntl", ntile(4).over(w))
        .withColumn("prank", percent_rank().over(w))
        .withColumn("cdist", cume_dist().over(w))
        .orderBy(col("rn"))
    }),

    // Null-safe equality (<=> / IS NOT DISTINCT FROM) on a column with
    // synthesized nulls.
    "scalar_nullsafe" -> ((s, d) => {
      Tables.customer(s, d)
        .withColumn("seg_opt", when(col("c_acctbal") < 0, lit(null:String))
          .otherwise(col("c_mktsegment")))
        .select(col("c_custkey"),
          (col("seg_opt") <=> lit(null:String)).cast("int").as("is_null_eq"),
          (col("seg_opt") <=> lit("BUILDING")).cast("int").as("is_bldg_eq"))
        .orderBy(col("c_custkey"))
    }),

    // Pivot with a fixed value list (deterministic output schema); lowers
    // to a single conditional aggregation, one shuffle.
    "agg_pivot" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(dec(col("l_quantity"))))
        .withColumnsRenamed(Map("F" -> "qty_F", "O" -> "qty_O"))
        .withColumn("qty_F", col("qty_F").cast("double"))
        .withColumn("qty_O", col("qty_O").cast("double"))
        .orderBy(col("l_returnflag"))
    }),

    // Explode / flatMap (UDTF shape): word fan-out + top-10 word counts.
    "explode_wordcount" -> ((s, d) => {
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word"))
        .limit(10)
    }),

    // Collection aggregates, made deterministic by sorting the collected
    // set (collect_set order is partitioning-dependent; sort_array fixes).
    // Surfaced as a joined string: array columns crash the driver's
    // pandas-based row sort (unhashable ndarray).
    "agg_collect" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(array_join(sort_array(collect_set(col("o_orderpriority"))), ",").as("prios"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    }),

    // Approximate distinct (Spark's built-in HLL++). The raw estimates
    // are engine-private (HLL++ hashes differ from anything DuckDB can
    // replay), so the oracle-checkable contract is the ERROR BOUND: the
    // query emits the exact NDVs plus 0/1 flags asserting each estimate
    // lands within 3·rsd (rsd = 0.05 default → 15%) of the exact count.
    // A correct HLL++ at thousands of distincts is inside 3σ with
    // overwhelming probability; a broken one hash-fails the gate. The
    // exact COUNT(DISTINCT) columns are the test harness, not the scale
    // path — at 100 TB you'd ship only the estimate.
    "agg_approx_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          approx_count_distinct(col("l_partkey")).as("ap"),
          approx_count_distinct(col("l_suppkey")).as("asup"))
        .select(col("l_returnflag"), col("n_parts"), col("n_supps"),
          (abs(col("ap") - col("n_parts")) * 100 <= col("n_parts") * 15)
            .cast("int").as("parts_in_3rsd"),
          (abs(col("asup") - col("n_supps")) * 100 <= col("n_supps") * 15)
            .cast("int").as("supps_in_3rsd"))
        .orderBy(col("l_returnflag"))
    }),
  )

  /** DuckDB oracle SQL — column names/types matched to the Spark side. */
  def oracle: Map[String, String] = Map(
    "profile_columns" ->
      ProfileCols
        .map(c =>
          s"""SELECT '$c' AS col_name, count($c) AS n_nonnull,
             | CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             | count(DISTINCT $c) AS n_distinct,
             | CAST(min($c) AS VARCHAR) AS min_val,
             | CAST(max($c) AS VARCHAR) AS max_val
             |FROM orders""".stripMargin)
        .mkString("", "\nUNION ALL\n", "\nORDER BY col_name"),
    // profile_columns_approx: the HLL++ estimates are engine-private;
    // the checkable contract is exact NDVs + always-true 3σ bound flags
    // (the agg_approx_distinct pattern).
    "profile_columns_approx" ->
      ProfileCols
        .map(c =>
          s"""SELECT '$c' AS col_name, count($c) AS n_nonnull,
             | CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             | count(DISTINCT $c) AS n_distinct,
             | CAST(1 AS INT) AS distinct_in_3rsd,
             | CAST(min($c) AS VARCHAR) AS min_val,
             | CAST(max($c) AS VARCHAR) AS max_val
             |FROM orders""".stripMargin)
        .mkString("", "\nUNION ALL\n", "\nORDER BY col_name"),
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(1) AS avg_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(1) AS avg_price,
        | CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(1) AS avg_disc,
        | count(1) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "join_broadcast" ->
      """SELECT p_brand,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        | count(1) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "join_shuffle" ->
      """SELECT c_mktsegment, count(1) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "join_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "join_nonequi" ->
      """SELECT p_brand, count(1) AS n_over,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey AND l_quantity > p_size
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "window_topk_rank" ->
      """SELECT p_brand, p_partkey, p_retailprice AS price, rnk
        |FROM (SELECT p_brand, p_partkey, p_retailprice,
        |        rank() OVER (PARTITION BY p_brand
        |                     ORDER BY p_retailprice DESC, p_partkey) AS rnk
        |      FROM part)
        |WHERE rnk <= 3 ORDER BY p_brand, rnk, p_partkey""".stripMargin,
    "window_running" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
        |   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
        |FROM orders
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "window_lag" ->
      """WITH monthly AS (
        |  SELECT p_brand, CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS month,
        |         sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2)
        |SELECT p_brand, month, CAST(rev AS DOUBLE) AS rev,
        |  CAST(lag(rev, 1) OVER (PARTITION BY p_brand ORDER BY month) AS DOUBLE) AS prev_rev,
        |  CAST(rev - lag(rev, 1) OVER (PARTITION BY p_brand ORDER BY month) AS DOUBLE) AS delta
        |FROM monthly ORDER BY p_brand, month""".stripMargin,
    "window_moving" ->
      """WITH monthly AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1)
        |SELECT month, CAST(rev AS DOUBLE) AS rev,
        |  CAST(sum(rev) OVER (ORDER BY month ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |   / count(rev) OVER (ORDER BY month ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov_avg
        |FROM monthly ORDER BY month""".stripMargin,
    // same integer epoch-day RANGE frame; the 6-PRECEDING bound is the
    // identical integer comparison in both engines
    "window_range_interval" ->
      """WITH daily AS (
        |  SELECT o_orderpriority, CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS rev_cents
        |  FROM orders GROUP BY 1, 2)
        |SELECT o_orderpriority, day, rev_cents,
        |  CAST(sum(rev_cents) OVER (PARTITION BY o_orderpriority
        |    ORDER BY datediff('day', DATE '1970-01-01', day)
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS trail7_cents
        |FROM daily ORDER BY o_orderpriority, day""".stripMargin,
    "topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice AS price
        |FROM orders ORDER BY price DESC, o_orderkey LIMIT 10""".stripMargin,
    "setop_union" ->
      """SELECT c_custkey FROM customer WHERE c_acctbal > 9000
        |UNION
        |SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |ORDER BY c_custkey""".stripMargin,
    "setop_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        |INTERSECT
        |SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |ORDER BY c_custkey""".stripMargin,
    "setop_except" ->
      """SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        |EXCEPT
        |SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |ORDER BY c_custkey""".stripMargin,
    "q6_revenue_delta" ->
      """SELECT
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue_delta,
        | count(1) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_quantity < 24""".stripMargin,
    "join_full_outer" ->
      """WITH c AS (SELECT c_nationkey AS nk, count(1) AS n_cust
        |           FROM customer GROUP BY 1),
        |     s AS (SELECT s_nationkey AS nk, count(1) AS n_supp
        |           FROM supplier GROUP BY 1)
        |SELECT COALESCE(c.nk, s.nk) AS nk,
        |       COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
        |FROM c FULL OUTER JOIN s ON c.nk = s.nk
        |ORDER BY nk""".stripMargin,
    "window_firstlast" ->
      """SELECT o_custkey, o_orderkey,
        | first_value(o_orderkey) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_key,
        | last_value(o_orderkey) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS last_key
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "agg_unpivot" ->
      """WITH wide AS (
        |  SELECT l_returnflag,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_price
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, 'sum_qty' AS metric, CAST(sum_qty AS DOUBLE) AS value FROM wide
        |UNION ALL
        |SELECT l_returnflag, 'sum_price', CAST(sum_price AS DOUBLE) FROM wide
        |ORDER BY l_returnflag, metric""".stripMargin,
    "subquery_correlated" ->
      """SELECT o_orderkey, o_totalprice AS price
        |FROM orders o
        |WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders i
        |                          WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,
    "subquery_in" ->
      """SELECT o_orderkey FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'MACHINERY')
        |  AND o_orderkey NOT IN (SELECT o_orderkey FROM orders
        |                         WHERE o_orderstatus = 'F')
        |ORDER BY o_orderkey""".stripMargin,
    "window_ranks" ->
      """WITH top1000 AS (
        |  SELECT o_orderkey, o_totalprice AS price
        |  FROM orders ORDER BY price DESC, o_orderkey LIMIT 1000)
        |SELECT o_orderkey, price,
        |  row_number() OVER w AS rn,
        |  dense_rank() OVER w AS drnk,
        |  CAST(ntile(4) OVER w AS INT) AS ntl,
        |  percent_rank() OVER w AS prank,
        |  cume_dist() OVER w AS cdist
        |FROM top1000
        |WINDOW w AS (ORDER BY price DESC, o_orderkey)
        |ORDER BY rn""".stripMargin,
    "scalar_nullsafe" ->
      """SELECT c_custkey,
        | CAST((CASE WHEN c_acctbal < 0 THEN NULL ELSE c_mktsegment END
        |        IS NOT DISTINCT FROM NULL) AS INT) AS is_null_eq,
        | CAST((CASE WHEN c_acctbal < 0 THEN NULL ELSE c_mktsegment END
        |        IS NOT DISTINCT FROM 'BUILDING') AS INT) AS is_bldg_eq
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,
    "setop_union_all" ->
      """SELECT l_orderkey FROM lineitem WHERE l_quantity > 45
        |UNION ALL
        |SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'A' AND l_quantity > 45
        |ORDER BY l_orderkey""".stripMargin,
    "null_handling" ->
      """SELECT
        | CAST(sum(CAST(CASE WHEN c_acctbal < 0 THEN 0.0 ELSE c_acctbal END AS DECIMAL(18,2))) AS DOUBLE) AS sum_filled,
        | count(1) AS n_all,
        | count(CASE WHEN c_acctbal < 0 THEN NULL ELSE 1 END) AS n_kept
        |FROM customer""".stripMargin,
    "setop_intersect_all" ->
      """SELECT l_orderkey FROM lineitem WHERE l_quantity > 25
        |INTERSECT ALL
        |SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
        |ORDER BY l_orderkey""".stripMargin,
    "setop_except_all" ->
      """SELECT l_orderkey FROM lineitem WHERE l_quantity > 25
        |EXCEPT ALL
        |SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
        |ORDER BY l_orderkey""".stripMargin,
    "agg_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(1) AS n,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "agg_cube" ->
      """SELECT l_returnflag, l_linestatus, count(1) AS n,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    // identical fixed-grid histogram + integer cross-multiplied
    // thresholds (CASTs: DuckDB window sums are HUGEINT)
    "quantile_hist" ->
      """WITH b AS (
        |  SELECT event_type,
        |    CAST(floor(value / 10) AS BIGINT) * 10 AS bin_lo,
        |    count(1) AS cnt
        |  FROM events GROUP BY 1, 2),
        |c AS (
        |  SELECT event_type, bin_lo,
        |    sum(cnt) OVER (PARTITION BY event_type ORDER BY bin_lo
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER (PARTITION BY event_type) AS n
        |  FROM b)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |  CAST(min(CASE WHEN cum * 100 >= n * 25 THEN bin_lo END)
        |    AS BIGINT) AS p25_lo,
        |  CAST(min(CASE WHEN cum * 100 >= n * 50 THEN bin_lo END)
        |    AS BIGINT) AS p50_lo,
        |  CAST(min(CASE WHEN cum * 100 >= n * 90 THEN bin_lo END)
        |    AS BIGINT) AS p90_lo
        |FROM c GROUP BY event_type, n ORDER BY event_type""".stripMargin,
    // explicit (count desc, value asc) rank — NOT DuckDB's mode(),
    // whose tie-break is unspecified
    "agg_mode" ->
      """WITH c AS (
        |  SELECT o_orderstatus, o_orderpriority, count(1) AS n
        |  FROM orders GROUP BY 1, 2)
        |SELECT o_orderstatus, o_orderpriority AS mode_priority,
        |  CAST(n AS BIGINT) AS n_mode
        |FROM c
        |QUALIFY row_number() OVER (PARTITION BY o_orderstatus
        |  ORDER BY n DESC, o_orderpriority) = 1
        |ORDER BY o_orderstatus""".stripMargin,
    // the DEFINITION (nearest-rank order statistic via a full ranking),
    // not the two-pass algorithm — matching hashes prove the bounded
    // histogram+target-bin plan picks the exact same element
    "quantile_exact" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events),
        |r AS (
        |  SELECT event_type, c,
        |    row_number() OVER (PARTITION BY event_type ORDER BY c) AS rn,
        |    count(1) OVER (PARTITION BY event_type) AS n
        |  FROM e)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |  CAST(min(CASE WHEN rn = (n * 50 + 99) // 100 THEN c END)
        |    AS BIGINT) AS p50_c,
        |  CAST(min(CASE WHEN rn = (n * 90 + 99) // 100 THEN c END)
        |    AS BIGINT) AS p90_c
        |FROM r GROUP BY event_type, n ORDER BY event_type""".stripMargin,
    // identical cents grid, identical nearest-rank edges, identical clamp
    "winsorize" ->
      """WITH ev AS (
        |  SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events),
        |b AS (
        |  SELECT event_type, (c // 100) * 100 AS bin_lo, count(1) AS cnt
        |  FROM ev GROUP BY 1, 2),
        |cu AS (
        |  SELECT event_type, bin_lo,
        |    sum(cnt) OVER (PARTITION BY event_type ORDER BY bin_lo
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER (PARTITION BY event_type) AS n
        |  FROM b),
        |edges AS (
        |  SELECT event_type,
        |    min(CASE WHEN cum * 100 >= n * 5 THEN bin_lo END) AS lo,
        |    min(CASE WHEN cum * 100 >= n * 95 THEN bin_lo END) AS hi
        |  FROM cu GROUP BY event_type)
        |SELECT ev.event_type, CAST(count(1) AS BIGINT) AS n,
        |  CAST(max(lo) AS BIGINT) AS lo_edge,
        |  CAST(max(hi) AS BIGINT) AS hi_edge,
        |  CAST(sum(CASE WHEN c < lo THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clip_lo,
        |  CAST(sum(CASE WHEN c > hi THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clip_hi,
        |  CAST(sum(least(greatest(c, lo), hi)) AS BIGINT) AS sum_wins,
        |  CAST(sum(least(greatest(c, lo), hi)) // count(1) AS BIGINT)
        |    AS mean_wins_cents
        |FROM ev JOIN edges USING (event_type)
        |GROUP BY ev.event_type ORDER BY ev.event_type""".stripMargin,
    "agg_groupingsets" ->
      """SELECT o_orderstatus, o_orderpriority, count(1) AS n,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-06-01'
        |  AND l_shipdate > TIMESTAMP '1997-06-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_local_volume" ->
      """SELECT n_name,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q18_large_orders" ->
      """SELECT c_name, o_orderkey, o_orderdate,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price,
        |  qty
        |FROM orders
        |JOIN (SELECT l_orderkey, sum(l_quantity) AS qty
        |      FROM lineitem GROUP BY 1
        |      HAVING sum(l_quantity) > 220) big
        |  ON o_orderkey = big.l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |ORDER BY total_price DESC, o_orderkey LIMIT 100""".stripMargin,
    "q21_waiting_suppliers" ->
      """SELECT s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN supplier ON s_suppkey = l1.l_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND n_name IN ('NATION_1','NATION_7','NATION_13','NATION_19')
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |              WHERE l3.l_orderkey = l1.l_orderkey
        |                AND l3.l_suppkey <> l1.l_suppkey
        |                AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name""".stripMargin,
    "agg_argmax" ->
      """SELECT o_orderpriority, o_orderkey AS top_orderkey,
        | CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS top_price
        |FROM orders
        |QUALIFY row_number() OVER (PARTITION BY o_orderpriority
        |  ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC, o_orderkey DESC) = 1
        |ORDER BY o_orderpriority""".stripMargin,
    "agg_median" ->
      """SELECT l_returnflag,
        | quantile_cont(l_quantity, 0.5) AS median_qty,
        | quantile_cont(l_quantity, 0.25) AS q25,
        | quantile_cont(l_quantity, 0.75) AS q75
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_pivot" ->
      """SELECT l_returnflag,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_F,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS qty_O
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "explode_wordcount" ->
      """SELECT w AS word, count(1) AS n
        |FROM documents, LATERAL (SELECT unnest(string_split(text, ' ')) AS w)
        |GROUP BY w ORDER BY n DESC, word LIMIT 10""".stripMargin,
    "agg_collect" ->
      """SELECT o_orderstatus,
        | array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS prios,
        | count(1) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // identical 32-id bucketing, shift, OR-merge, popcount sum
    "agg_bitmap_distinct" ->
      """WITH b AS (
        |  SELECT event_type, user_id // 32 AS bkt,
        |    bit_or((1::BIGINT) << CAST(user_id % 32 AS INT)) AS bits
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, CAST(count(1) AS BIGINT) AS n_buckets,
        |  CAST(sum(bit_count(bits)) AS BIGINT) AS n_users
        |FROM b GROUP BY 1 ORDER BY event_type""".stripMargin,
    "agg_distinct" ->
      """SELECT c_mktsegment,
        | count(DISTINCT o_custkey) AS n_custs,
        | count(DISTINCT o_orderpriority) AS n_prios,
        | count(1) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    // agg_approx_distinct: the raw HLL++ estimates are engine-private;
    // the checkable contract is exact NDVs + always-true 3σ bound flags.
    "agg_approx_distinct" ->
      """SELECT l_returnflag,
        | count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps,
        | CAST(1 AS INT) AS parts_in_3rsd,
        | CAST(1 AS INT) AS supps_in_3rsd
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
  )
}
