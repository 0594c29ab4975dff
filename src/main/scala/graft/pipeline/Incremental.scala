package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Incremental materialized-view maintenance — the warehouse pattern
  * that makes a 100 TB nightly rollup affordable: keep the view's
  * ALGEBRAIC PARTIAL STATE (count / sum / min / max per group — each a
  * commutative monoid, the same decomposition Spark's own partial
  * aggregation uses), and on refresh aggregate ONLY the delta, then
  * merge delta partials into the stored state with a |view|-sized
  * aggregation. Cost per refresh = delta scan + KB merge, instead of a
  * full-history rescan; the merge is associative, so shards, late
  * backfills, and multi-day catch-ups all fold in the same way.
  *
  * Derived measures (avg here) are NOT stored — they are not monoids —
  * but re-derive exactly from the stored partials at read time
  * (`sum div count`). That split (store partials, finalize on read) is
  * the entire trick; [[IncrementalSpec]] proves merge ≡ full recompute
  * for any split point and any delta sharding, which is the invariant a
  * production refresh relies on.
  *
  * The `mv_refresh` query exercises the whole cycle on the event log:
  * base partials below a cutoff date (in production: the stored MV),
  * delta partials above it (in a date-partitioned production layout the
  * cutoff prunes at the partition level, so the base history is never
  * even scanned on a real refresh), merged and finalized. The DuckDB oracle is the full
  * recompute — the refresh path must be indistinguishable from it.
  * Values ride as exact integer cents (decimal(18,2)·100, the
  * event_outliers convention) so every partial is bit-stable
  * cross-engine; sums stay exact in long to ~1.8e14 events per type.
  */
object Incremental {

  /** Exact integer cents for the `value` column. */
  private def cents: Column =
    (col("value").cast("decimal(18,2)") * 100).cast("long")

  /** The view's algebraic partial state: one row per key with the four
    * monoid accumulators. This is both the initial build AND the
    * per-delta increment — there is deliberately no separate "first
    * build" path. */
  def partials(df: DataFrame, keys: Seq[String], value: Column): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_events"), sum(value).as("sum_cents"),
        min(value).as("min_cents"), max(value).as("max_cents"))

  /** Fold any number of partial-state frames (stored MV + one or more
    * deltas) into one: union, then a |view|-sized re-aggregation with
    * each accumulator's own merge op (counts and sums ADD, min/max
    * fold). Associative and commutative — shard and reorder freely. */
  def merge(keys: Seq[String], parts: DataFrame*): DataFrame =
    parts.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n_events")).as("n_events"),
        sum(col("sum_cents")).as("sum_cents"),
        min(col("min_cents")).as("min_cents"),
        max(col("max_cents")).as("max_cents"))

  /** Read-time finalization: derive the non-monoid measures from the
    * stored partials (truncating div on positive operands — bit-stable
    * cross-engine, like temporal_decay's). */
  def finalizeView(mv: DataFrame): DataFrame =
    mv.withColumn("avg_cents", expr("sum_cents div n_events"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mv_refresh" -> ((s, d) => {
      val keys = Seq("event_type")
      def slice(pred: Column): DataFrame =
        partials(Tables.events(s, d).filter(pred)
          .select(col("event_type"), cents.as("c")), keys, col("c"))
      val cutoff = lit("2024-01-25").cast("timestamp")
      val base = slice(col("ts") < cutoff)   // in production: the stored MV
      val delta = slice(col("ts") >= cutoff) // the new partition, scanned alone
      finalizeView(merge(keys, base, delta))
        .orderBy(col("event_type"))
    }),
  )

  def oracle: Map[String, String] = Map(
    // the full recompute the incremental refresh must be
    // indistinguishable from
    "mv_refresh" ->
      """WITH ev AS (
        |  SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events)
        |SELECT event_type,
        |  CAST(count(1) AS BIGINT) AS n_events,
        |  CAST(sum(c) AS BIGINT) AS sum_cents,
        |  CAST(min(c) AS BIGINT) AS min_cents,
        |  CAST(max(c) AS BIGINT) AS max_cents,
        |  CAST(sum(c) // count(1) AS BIGINT) AS avg_cents
        |FROM ev GROUP BY event_type ORDER BY event_type""".stripMargin,
  )
}
