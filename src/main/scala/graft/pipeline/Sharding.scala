package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Curriculum sharding — range-partition the corpus into S equal-mass
  * quality tiers WITHOUT a global sort. Ordered (easy→hard or
  * clean→noisy) shard layouts are how curriculum schedules and
  * quality-annealed mixes ship; the naive formulation (`ORDER BY quality`
  * then chunk) is a full-corpus global sort, the classic 100 TB
  * serialization. The scalable shape mirrors how Spark's own
  * `repartitionByRange` samples boundaries, but deterministically:
  *
  *  1. ONE pass builds a fixed-grid integer histogram of the shared
  *     quality score (`CorpusOps.qualityPpm`, the same fixed-point score
  *     the samplers compose on) — shuffle bounded at the bin-grid size,
  *     not corpus rows.
  *  2. Shard boundaries are nearest-rank edges on the bin grid (the
  *     `winsorize`/`quantile_hist` rule: first bin whose cumulative mass
  *     reaches j·n/S, integer cross-multiplied). The cumulative count
  *     runs as a triangular self-join on the BIN frame (bins² ≤ ~700²
  *     KB-scale rows) — deliberately NOT an unpartitioned window, so
  *     the repo's global-window ban stays intact.
  *  3. Boundaries collapse to ONE broadcast row; shard assignment is a
  *     map-side sum of ≥-edge indicators on the scan. A writer would
  *     `partitionBy(shard)` here; the query reports the shard census a
  *     release sign-off reads (mass balance + score ranges + mean
  *     tokens).
  *
  * Equal mass is approximate at bin granularity (docs in one bin never
  * split — identical scores land in the same shard, which is exactly
  * what makes the layout deterministic under re-runs and shard-local
  * reproduction possible).
  *
  * Scores are shifted non-negative (+5·10⁶, the score's lower bound)
  * before binning so both engines' truncating integer division IS floor
  * division — no negative-operand `div` vs `//` asymmetry.
  *
  * Reference scope: no ordering/partitioned-write surface exists in the
  * reference (sink is a console print, /root/reference/src/
  * QueryProcessor1.java:648-682); LLM-pipeline extension per the brief.
  */
object Sharding {

  /** Shard count (mirrored by the oracle). */
  val Shards = 8

  /** Histogram bin width in ppm-score units. */
  val BinW = 10000L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "shard_by_quality" -> ((s, d) => {
      // size-gated share (r17): scored feeds the histogram AND the
      // final assignment pass, and the bin frame feeds the triangular
      // cumulative join twice plus the census — un-materialized, the
      // quality kernel re-scans the corpus 4× (plan-verified). Shared,
      // a big corpus pays ONE text pass (the floor): scored is |docs|
      // narrow rows (the guide-§8 decide-on-small-rows frame), bins is
      // KB-sized.
      val scored = graft.PlanShare.shared(Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tok"),
          (CorpusOps.qualityPpm(col("text")) + 5000000L).as("q")))
      val bins = graft.PlanShare.pinned(scored
        .select(expr(s"q div $BinW").as("bin"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("cnt")))
      // cumulative mass via a triangular self-join on the KB bin frame
      val cum = bins.as("a")
        .join(bins.as("b"), col("b.bin") <= col("a.bin"))
        .groupBy(col("a.bin").as("bin"))
        .agg(sum(col("b.cnt")).as("cum"))
      val n1 = bins.agg(sum(col("cnt")).as("n")) // 1 row
      // nearest-rank shard edges j = 1..S-1, as ONE broadcastable row
      val edgeCols = max(col("n")).as("n") +:
        (1 until Shards).map(j =>
          min(when(col("cum") * Shards >= col("n") * j,
            col("bin") * BinW)).as(s"e$j"))
      val edges = cum.crossJoin(broadcast(n1))
        .agg(edgeCols.head, edgeCols.tail: _*)
      val shardCol = (1 until Shards)
        .map(j => when(col("q") >= col(s"e$j"), 1).otherwise(0))
        .reduce(_ + _)
      scored.crossJoin(broadcast(edges))
        .select(col("doc_id"), col("n_tok"), col("q"),
          shardCol.as("shard"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("q")).as("q_min"), max(col("q")).as("q_max"),
          expr("sum(n_tok) div count(1)").as("mean_tok"))
        .orderBy(col("shard"))
    }))

  def oracle: Map[String, String] = Map(
    "shard_by_quality" -> {
      val S = Shards
      val edgeCols = (1 until S).map(j =>
        s"min(CASE WHEN cum * $S >= n * $j THEN bin * $BinW END) AS e$j")
        .mkString(",\n       ")
      val shardSum = (1 until S).map(j =>
        s"CASE WHEN q >= e$j THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH scored AS (
         |  SELECT doc_id,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |         (CAST(len(list_filter(string_split(text,' '),
         |            w -> w IN ('the','a','an','and','of','to','in','is')))
         |            AS BIGINT) * 2000000)
         |           // CAST(len(string_split(text,' ')) AS BIGINT)
         |         - (CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]'))
         |            AS BIGINT) * 5000000)
         |           // CAST(length(text) AS BIGINT)
         |         + 5000000 AS q
         |  FROM documents),
         |bins AS (
         |  SELECT q // $BinW AS bin, count(*)::BIGINT AS cnt
         |  FROM scored GROUP BY 1),
         |cum AS (
         |  SELECT a.bin AS bin, sum(b.cnt)::BIGINT AS cum
         |  FROM bins a JOIN bins b ON b.bin <= a.bin
         |  GROUP BY a.bin),
         |edges AS (
         |  SELECT max(n) AS n,
         |       $edgeCols
         |  FROM cum, (SELECT sum(cnt)::BIGINT AS n FROM bins)),
         |assigned AS (
         |  SELECT doc_id, n_tok, q, $shardSum AS shard
         |  FROM scored, edges)
         |SELECT shard, count(*)::BIGINT AS n_docs,
         |       min(q) AS q_min, max(q) AS q_max,
         |       CAST(sum(n_tok) // count(*) AS BIGINT) AS mean_tok
         |FROM assigned
         |GROUP BY shard
         |ORDER BY shard""".stripMargin
    })
}
