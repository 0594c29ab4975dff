package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Declarative data-quality validation (Deequ/Great-Expectations shape) —
  * the constraint-checking pass a warehouse runs before promoting a load,
  * expressed as plain aggregations so the whole report is ONE job per
  * table family (the reference engine validates nothing — its corpus
  * contains two latent crashes precisely because no output was ever
  * checked, SURVEY.md §5).
  *
  * `dq_checks` emits one row per constraint: name, rows checked, rows
  * violating. Constraint classes covered: referential integrity
  * (fact→dim anti-join counts), domain ranges, positivity, primary-key
  * uniqueness, and null presence. Plan shape per class:
  *
  *  - FK checks are LEFT ANTI joins fact⟕dim on the key — the dim side
  *    (orders keys, part keys) broadcasts at every realistic dim/fact
  *    ratio, so each check is a scan + broadcast probe, no shuffle of
  *    the fact table. Spark counts the survivors; the anti join IS the
  *    violation set, so the check's cost is the scan it shares with
  *    every other check of that table.
  *  - Range/positivity/null checks are conditional sums inside ONE
  *    aggregation over the table — adding a constraint adds a column,
  *    not a pass.
  *  - PK uniqueness is count(*) − count(distinct pk) on the composite
  *    key: one exact distinct (hash-partitioned by the key at scale).
  *
  * The report is a UNION of 1-row frames — KBs regardless of corpus
  * size. At 100 TB you run exactly this plan; the only choice that
  * changes is approx vs exact distinct for the PK check
  * (`agg_approx_distinct` covers the sketch variant).
  */
object Quality {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_checks" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val p = Tables.part(s, d)
      // ONE pass per table family (the docstring's contract — the first
      // cut unioned 7 independent aggregates and re-scanned lineitem 4×,
      // 33 s at the sf10 rehearsal): each FK check is a LEFT join whose
      // null-probe count is a conditional sum inside the family's single
      // aggregation. Key sides are deduped so a (hypothetically)
      // duplicated dim key cannot multiply fact rows and corrupt the
      // fused counts — the report must stay exact on DIRTY data, that
      // being its whole point. part/customer are true dimensions →
      // broadcast; orders is fact-sized, so its (deduped) key column
      // goes through a plain equi-join and the planner picks
      // broadcast-vs-shuffle by size. The PK-uniqueness distinct rides
      // the same aggregation (Expand ×2 of the scan — cheaper than the
      // separate full scan + distinct it replaces).
      val liRep = li
        // the key sides are deduped but FACT-SCALED (orders SF×1.5M,
        // part SF×200k) — the join strategy is left to AQE on purpose.
        // An earlier form FORCED shuffle_hash (per-partition build ≈
        // keys/shuffle-partitions, cheaper than SMJ's fact-side sort at
        // the ×100 rehearsal) — but a forced SHJ build CANNOT SPILL,
        // and at sf100/28 partitions the ~5.4M-key ≈ 268 MB build died
        // on memory acquisition. AQE picks SHJ exactly when the runtime
        // build fits and falls back to sort-merge (which spills) when
        // it doesn't — the only strategy that is correct at every SF ×
        // partition-count combination.
        .join(o.select(col("o_orderkey").as("__ok")).distinct(),
          col("l_orderkey") === col("__ok"), "left")
        .join(p.select(col("p_partkey").as("__pk")).distinct(),
          col("l_partkey") === col("__pk"), "left")
        .agg(count(lit(1)).as("n_li"),
          sum(when(col("__ok").isNull, 1L).otherwise(0L)).as("v_fk_o"),
          sum(when(col("__pk").isNull, 1L).otherwise(0L)).as("v_fk_p"),
          sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L)
            .otherwise(0L)).as("v_qty"))
      // Exact PK-duplicate count as a TWO-LEVEL aggregation: per-key
      // counts (hash-partitioned by the composite key, partial-agg
      // combined, per-task state bounded by the task's key share and
      // spillable) then Σ(cnt−1) — byte-identical to
      // count − count_distinct but without the single exact-distinct
      // aggregate whose state must hold every key (the 11× term at the
      // ×100 rehearsal; at 10¹⁰ fact rows the one-aggregate form is a
      // non-starter while per-key counting scales with executors).
      val liPk = li
        .groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(count(lit(1)).as("cnt"))
        .agg(coalesce(sum(col("cnt") - lit(1L)), lit(0L)).as("v_pk"))
      val oRep = o
        // customer scales with SF too (SF×150k) — AQE-chosen join,
        // same rationale as the lineitem FK probes above
        .join(c.select(col("c_custkey").as("__ck")).distinct(),
          col("o_custkey") === col("__ck"), "left")
        .agg(count(lit(1)).as("n_o"),
          sum(when(col("__ck").isNull, 1L).otherwise(0L)).as("v_fk_c"),
          sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("v_price"),
          sum(when(col("o_custkey").isNull || col("o_orderkey").isNull, 1L)
            .otherwise(0L)).as("v_null"))
      liRep.crossJoin(liPk).crossJoin(oRep).selectExpr(
        """stack(7,
          |  'lineitem_fk_orders',   n_li, v_fk_o,
          |  'lineitem_fk_part',     n_li, v_fk_p,
          |  'orders_fk_customer',   n_o,  v_fk_c,
          |  'lineitem_qty_range',   n_li, v_qty,
          |  'orders_price_positive',n_o,  v_price,
          |  'lineitem_pk_unique',   n_li, v_pk,
          |  'orders_null_keys',     n_o,  v_null
          |) AS (check_name, n_checked, n_violations)""".stripMargin)
        .orderBy(col("check_name"))
    }),
  )

  def oracle: Map[String, String] = Map(
    "dq_checks" ->
      """SELECT * FROM (
        |  SELECT 'lineitem_fk_orders' AS check_name,
        |    (SELECT count(1) FROM lineitem) AS n_checked,
        |    (SELECT count(1) FROM lineitem l LEFT JOIN orders o
        |       ON l.l_orderkey = o.o_orderkey
        |     WHERE o.o_orderkey IS NULL) AS n_violations
        |  UNION ALL
        |  SELECT 'lineitem_fk_part',
        |    (SELECT count(1) FROM lineitem),
        |    (SELECT count(1) FROM lineitem l LEFT JOIN part p
        |       ON l.l_partkey = p.p_partkey
        |     WHERE p.p_partkey IS NULL)
        |  UNION ALL
        |  SELECT 'orders_fk_customer',
        |    (SELECT count(1) FROM orders),
        |    (SELECT count(1) FROM orders o LEFT JOIN customer c
        |       ON o.o_custkey = c.c_custkey
        |     WHERE c.c_custkey IS NULL)
        |  UNION ALL
        |  SELECT 'lineitem_qty_range',
        |    (SELECT count(1) FROM lineitem),
        |    (SELECT CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
        |       THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem)
        |  UNION ALL
        |  SELECT 'orders_price_positive',
        |    (SELECT count(1) FROM orders),
        |    (SELECT CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
        |       AS BIGINT) FROM orders)
        |  UNION ALL
        |  SELECT 'lineitem_pk_unique',
        |    (SELECT count(1) FROM lineitem),
        |    (SELECT count(1) - count(DISTINCT (l_orderkey, l_linenumber))
        |       FROM lineitem)
        |  UNION ALL
        |  SELECT 'orders_null_keys',
        |    (SELECT count(1) FROM orders),
        |    (SELECT CAST(sum(CASE WHEN o_custkey IS NULL OR o_orderkey IS NULL
        |       THEN 1 ELSE 0 END) AS BIGINT) FROM orders)
        |) ORDER BY check_name""".stripMargin,
  )
}
