package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.emf.GoldenQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in [[queries]] with a matching key in [[oracleSql]] is
  * hash-compared against DuckDB by the driver (sf0.01). Column names must
  * match the oracle exactly; results are explicitly ordered.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the whole EMF stack end-to-end: reference-format spec text →
    * parser → planner (simple + dependent variables, HAVING) → Catalyst.
    * Corpus query 6 — the EMF query whose second variable's predicate
    * references the first variable's aggregate. */
  def entry(spark: SparkSession): DataFrame =
    GoldenQueries.run(6)(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map[String, (SparkSession, String) => DataFrame](
      "emf_q1" -> (GoldenQueries.run(1) _),
      "emf_q2" -> (GoldenQueries.run(2) _),
      "emf_q3" -> (GoldenQueries.run(3) _),
      "emf_q4" -> (GoldenQueries.run(4) _),
      "emf_q5" -> (GoldenQueries.run(5) _),
      "emf_q6" -> (GoldenQueries.run(6) _),
      // q7: cross-attribute tuple-vs-MF operand + MF-vs-MF group
      // restriction — reference-supported forms its corpus never runs
      "emf_q7" -> (GoldenQueries.run(7) _),
      // q8: dependent variable chained onto a windowed one — the two
      // planner classes the corpus never combines
      "emf_q8" -> (GoldenQueries.run(8) _),
      // EMF via the MF-SQL frontend over the events table; the planner's
      // decimal-exact avg over floating columns is bit-stable cross-engine
      "emf_events" -> ((s: SparkSession, d: String) => GoldenQueries.runEventsMf(s, d)),
      // the whole corpus as ONE batch over a shared cached fact frame
      // (multi-query optimization; the reference's own workload shape)
      "emf_batch" -> ((s: SparkSession, d: String) => GoldenQueries.runBatch(s, d)),
    ) ++
      graft.operators.RelationalQueries.queries ++
      graft.operators.Scale.queries ++
      graft.operators.Layout.queries ++
      graft.operators.Stats.queries ++
      graft.operators.Temporal.queries ++
      graft.operators.Quality.queries ++
      graft.functions.ScalarQueries.queries ++
      graft.dedup.Dedup.queries ++
      graft.ann.Similarity.queries ++
      graft.text.TextAnalysis.queries ++
      graft.streaming.EventStreams.queries ++
      graft.multimodal.Multimodal.queries ++
      graft.functions.Custom.queries ++
      graft.plans.AsOfJoin.queries ++
      graft.plans.RangeJoin.queries ++
      graft.ann.FixedPointAnn.queries ++
      graft.ann.Pca.queries ++
      graft.ann.KMeans.queries ++
      graft.pipeline.DatasetPrep.queries ++
      graft.pipeline.CorpusOps.queries ++
      graft.pipeline.CorpusOverlap.queries ++
      graft.pipeline.Incremental.queries ++
      graft.operators.Mining.queries ++
      graft.dedup.EditNeighbors.queries ++
      graft.sketch.CountMin.queries ++
      graft.sketch.Bloom.queries ++
      graft.sketch.Hll.queries ++
      graft.sketch.HeavyHitters.queries ++
      graft.text.Bpe.queries ++
      graft.text.LangIdNb.queries ++
      graft.dedup.SubstringDedup.queries ++
      graft.pipeline.Sharding.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    GoldenQueries.oracle ++
      graft.operators.RelationalQueries.oracle ++
      graft.operators.Scale.oracle ++
      graft.operators.Layout.oracle ++
      graft.operators.Stats.oracle ++
      graft.operators.Temporal.oracle ++
      graft.operators.Quality.oracle ++
      graft.functions.ScalarQueries.oracle ++
      graft.dedup.Dedup.oracle ++
      graft.ann.Similarity.oracle ++
      graft.text.TextAnalysis.oracle ++
      graft.streaming.EventStreams.oracle ++
      graft.multimodal.Multimodal.oracle ++
      graft.functions.Custom.oracle ++
      graft.plans.AsOfJoin.oracle ++
      graft.plans.RangeJoin.oracle ++
      graft.ann.Pca.oracle ++
      graft.ann.KMeans.oracle ++
      graft.ann.FixedPointAnn.oracle ++
      graft.pipeline.DatasetPrep.oracle ++
      graft.pipeline.CorpusOps.oracle ++
      graft.pipeline.CorpusOverlap.oracle ++
      graft.pipeline.Incremental.oracle ++
      graft.operators.Mining.oracle ++
      graft.dedup.EditNeighbors.oracle ++
      graft.sketch.CountMin.oracle ++
      graft.sketch.Bloom.oracle ++
      graft.sketch.Hll.oracle ++
      graft.sketch.HeavyHitters.oracle ++
      graft.text.Bpe.oracle ++
      graft.text.LangIdNb.oracle ++
      graft.dedup.SubstringDedup.oracle ++
      graft.pipeline.Sharding.oracle

  /** Scale-form oracle substitutions for the sf10+ comparator only:
    * algebraically identical rewrites of primary oracles whose join
    * shape is infeasible at ×100 data (see each provider's scaladoc).
    * The driver's sf0.01 gate keeps running the primary forms; the
    * equivalence of each pair is checked empirically at sf0.1 by
    * `tools/check_scale_form.py`. */
  def oracleSqlScale: Map[String, String] =
    GoldenQueries.scaleOracle ++
      graft.dedup.Dedup.scaleOracle ++
      graft.ann.Similarity.scaleOracle ++
      graft.multimodal.Multimodal.scaleOracle

  /** Margin diagnostics for scale-form entries whose exact arithmetic
    * differs microscopically from the primary's (summation order):
    * `tools/check_scale_form.py` runs these after a green digest and
    * records how far the corpus's values sit from the entry's
    * threshold / rounding boundaries (see each provider's scaladoc). */
  def oracleMarginProbes: Map[String, String] =
    graft.ann.Similarity.marginProbes ++
      graft.dedup.Dedup.marginProbes ++
      GoldenQueries.marginProbes
}
