package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Cross-source corpus overlap: the contamination audit a pretraining
  * pipeline runs before mixing corpora ("how much of source B is
  * already inside source A?"). For every source pair it reports the
  * exact 3-gram-shingle set overlap — Jaccard and containment in exact
  * ppm — over the same shingle construction the dedup family uses
  * ([[graft.dedup.Dedup.shingles]]), so the two families measure the
  * same universe.
  *
  * Scale shape (100 TB): ONE corpus pass — explode shingles into a
  * shingle-keyed grouped-postings aggregation whose `collect_set`
  * dedups (source, shingle) repeats in the same shuffle a DISTINCT
  * would cost. Everything downstream derives from that vocab-sized
  * postings frame: set sizes re-explode the ≤|sources| arrays (never
  * the corpus), and pairs are emitted IN-ROW from each sorted array —
  * no shingle self-join, per-shingle fanout bounded by |sources|²/2
  * (sources are few; contrast the per-DOC postings in dedup_ngram
  * which need the df cap). Both consumers sit on the same
  * shingle-keyed Exchange, which Spark reuses (the first cut computed
  * sizes as two separate corpus re-scans — 3 passes total, caught in
  * the plan audit). The final frame is |sources|² rows.
  *
  * Integer-exact: counts and truncating ppm divisions only (`div` and
  * DuckDB `//` agree on non-negative operands), so the driver
  * hash-checks it like any relational query.
  *
  * Reference anchor: no counterpart (single-table MF/EMF engine,
  * /root/reference/src/QueryProcessor1.java); part of the LLM-pipeline
  * surface mandated by the build brief.
  */
object CorpusOverlap {

  private val N = 3

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_overlap" -> ((s, d) => {
      import graft.dedup.SignatureExprs
      // Round 9: the postings shuffle keys on the fused 8-byte
      // shingle HASH (the dedup_ngram convention — counts over
      // xxhash64 keys equal the string counts up to ~2⁻⁶⁴ collisions,
      // the documented tradeoff), sources are coded to dense ints
      // IN-ROW against the 1-row broadcast sorted-source array (≤
      // |sources| elements — no window, no extra shuffle), and source
      // pairs stream out of the codegen'd packed-pair kernel instead
      // of a nested interpreted HOF over string arrays. sid order ≡
      // alphabetical source order, so pair orientation (sid_a < sid_b)
      // matches the oracle's string comparison exactly.
      val docs = Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
      // r17: the docstring's "both consumers sit on the same Exchange,
      // which Spark reuses" did NOT hold — the executed plan showed 7
      // documents scans and zero ReusedExchange (AQE plans each
      // subtree independently). Size-gated materialization of the
      // dataflow: srcArr and sizes are ≤|sources| rows, posts IS the
      // vocab-sized pivot frame the design centers on — shared, sizes
      // and pairs read one build instead of re-running the corpus
      // shingle pass each; a big corpus then pays exactly 2 corpus
      // scans (srcArr, posts), the design's intended floor.
      val srcArr = graft.PlanShare.pinned(
        docs.agg(sort_array(collect_set(col("source"))).as("srcs")))
      val posts = graft.PlanShare.shared(docs
        .crossJoin(broadcast(srcArr))
        .select((array_position(col("srcs"), col("source")) - 1).as("sid"),
          explode(SignatureExprs.shingleHashes(col("text"), N)).as("sh"))
        .groupBy(col("sh"))
        .agg(sort_array(collect_set(col("sid"))).as("sids")))
      val sizes = graft.PlanShare.pinned(
        posts.select(explode(col("sids")).as("sid"))
          .groupBy(col("sid")).agg(count(lit(1)).as("n_sh")))
      val pairs = posts
        .filter(size(col("sids")) > 1)
        .select(explode(SignatureExprs.packedPairs(col("sids"))).as("pk"))
        .groupBy(col("pk")).agg(count(lit(1)).as("n_inter"))
        .select(shiftrightunsigned(col("pk"), 31).as("sid_a"),
          col("pk").bitwiseAND(lit((1L << 31) - 1)).as("sid_b"),
          col("n_inter"))
      pairs
        .join(broadcast(sizes.withColumnRenamed("sid", "sid_a")
          .withColumnRenamed("n_sh", "n_a")), "sid_a")
        .join(broadcast(sizes.withColumnRenamed("sid", "sid_b")
          .withColumnRenamed("n_sh", "n_b")), "sid_b")
        .crossJoin(broadcast(srcArr))
        .select(
          element_at(col("srcs"), (col("sid_a") + 1).cast("int")).as("src_a"),
          element_at(col("srcs"), (col("sid_b") + 1).cast("int")).as("src_b"),
          col("n_a"), col("n_b"), col("n_inter"))
        .selectExpr("src_a", "src_b", "n_a", "n_b", "n_inter",
          "CAST(n_inter * 1000000 div (n_a + n_b - n_inter) AS BIGINT) AS jaccard_ppm",
          "CAST(n_inter * 1000000 div least(n_a, n_b) AS BIGINT) AS containment_ppm")
        .orderBy(col("src_a"), col("src_b"))
    }))

  def oracle: Map[String, String] = Map(
    // identical shingle construction (the dedup_ngram oracle form),
    // identical source-pair ordering (both engines compare strings by
    // UTF-8 bytes), identical truncating ppm division
    "corpus_overlap" ->
      """WITH ss AS (
        |  SELECT DISTINCT source,
        |    array_to_string(string_split(text, ' ')[i:i+2], ' ') AS sh
        |  FROM documents,
        |    LATERAL (SELECT unnest(generate_series(1,
        |      greatest(len(string_split(text, ' ')) - 2, 1))) AS i)),
        |sizes AS (
        |  SELECT source, CAST(count(1) AS BIGINT) AS n_sh FROM ss GROUP BY 1),
        |inter AS (
        |  SELECT a.source AS src_a, b.source AS src_b,
        |    CAST(count(1) AS BIGINT) AS n_inter
        |  FROM ss a JOIN ss b ON a.sh = b.sh AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT src_a, src_b, sa.n_sh AS n_a, sb.n_sh AS n_b, n_inter,
        |  CAST(n_inter * 1000000 // (sa.n_sh + sb.n_sh - n_inter) AS BIGINT)
        |    AS jaccard_ppm,
        |  CAST(n_inter * 1000000 // least(sa.n_sh, sb.n_sh) AS BIGINT)
        |    AS containment_ppm
        |FROM inter
        |JOIN sizes sa ON sa.source = src_a
        |JOIN sizes sb ON sb.source = src_b
        |ORDER BY src_a, src_b""".stripMargin)
}
