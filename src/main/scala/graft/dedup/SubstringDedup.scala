package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Exact-substring duplication census — the "dedup at the substring
  * level" pass of LLM corpus curation (Lee et al. 2022, *Deduplicating
  * Training Data Makes Language Models Better*): any L-token window that
  * occurs more than once ANYWHERE in the corpus (across docs or repeated
  * within one doc) marks its span as duplicated text, and each document
  * reports how much of its token mass lies under such spans.
  *
  * The published implementation builds a monolithic suffix array; that is
  * the one data structure that cannot shard. The equivalent corpus-scale
  * formulation is windowed fingerprints (the same equivalence Lee et al.
  * note for their "approximate" mode, made exact here because windows are
  * compared by content through an 8-byte fingerprint join key):
  *
  *  1. L-gram generation IN-ROW (sequence → slice → hash — a narrow ~1×
  *     row expansion, no join); only the 8-byte `xxhash64` fingerprint
  *     and a position ever leave the row, never L-token strings.
  *  2. One fingerprint-keyed count with map-side combine finds windows
  *     with global occurrence count > 1, then one fingerprint-keyed join
  *     brings the duplicated positions back. Both shuffles are bounded by
  *     gram occurrences (≈ corpus tokens), the same budget `skipgram_pairs`
  *     runs on — no all-pairs, no suffix array.
  *  3. Per-doc interval union (islands): duplicated window [p, p+L)
  *     overlaps the running span when p < max(end) over earlier windows —
  *     one doc-keyed window + one (doc, island) aggregation on the SAME
  *     partitioning, so the merge costs one shuffle total.
  *
  * Output is the per-document duplication census (dup token mass + ppm),
  * the quantity a curation run thresholds on before cutting. Docs shorter
  * than L, or with no duplicated window, report 0 via the final left
  * join.
  *
  * The DuckDB oracle replays the identical pipeline with the gram STRING
  * itself as the join key — so a Spark-side fingerprint collision (two
  * different grams colliding in 64 bits) would fail the hash gate rather
  * than silently agree; the fingerprints are a pure shuffle-width
  * optimization, not a semantic approximation.
  *
  * Reference scope: the reference has no text surface at all (string
  * columns are only grouped/compared, /root/reference/src/
  * QueryProcessor1.java); this extends the LLM-pipeline dedup family
  * (exact, MinHash, SimHash, Jaccard, semantic) down to substring
  * granularity.
  */
object SubstringDedup {

  /** Window length in tokens (mirrored by the oracle). Long enough that
    * on the synthetic 31-word vocabulary a random 8-gram repeat is
    * vanishingly unlikely (31^8 ≈ 8.5e11 ≫ corpus windows), so every
    * detected span is real duplication (the planted near-dup fixtures),
    * not birthday noise. */
  val L = 8

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_substring" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          split(col("text"), " ").as("ws"))
      // 1. in-row L-gram fingerprints at each start position
      val posGrams = docs
        .select(col("doc_id"),
          explode(
            when(size(col("ws")) >= L,
              transform(sequence(lit(0), size(col("ws")) - L), i =>
                struct(i.as("pos"),
                  xxhash64(concat_ws(" ", slice(col("ws"), i + 1, lit(L))))
                    .as("gh"))))
              .otherwise(array().cast("array<struct<pos:int,gh:bigint>>")))
            .as("g"))
        .select(col("doc_id"), col("g.pos").as("pos"), col("g.gh").as("gh"))
      // 2. windows occurring >1 time anywhere; positions joined back on
      //    the 8-byte key
      val dupCounts = posGrams.groupBy(col("gh"))
        .agg(count(lit(1)).as("c"))
        .filter(col("c") > 1)
      val dupPos = posGrams.join(dupCounts, "gh")
        .select(col("doc_id"), col("pos"))
      // 3. islands: merge strictly-overlapping [pos, pos+L) spans per doc
      val prevEnd = max(col("pos") + L).over(
        Window.partitionBy(col("doc_id")).orderBy(col("pos"))
          .rowsBetween(Window.unboundedPreceding, -1))
      val islands = dupPos
        .withColumn("new_isl",
          when(col("pos") >= coalesce(prevEnd, lit(Int.MinValue)), 1)
            .otherwise(0))
        .withColumn("isl",
          sum(col("new_isl")).over(
            Window.partitionBy(col("doc_id")).orderBy(col("pos"))
              .rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("doc_id"), col("isl"))
        .agg((max(col("pos")) + L - min(col("pos"))).cast("long").as("len"))
        .groupBy(col("doc_id"))
        .agg(sum(col("len")).as("dup_tokens"))
      docs.select(col("doc_id"), col("n_tokens"))
        .join(islands, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"))
        .withColumn("dup_ppm",
          expr("(dup_tokens * 1000000L) div n_tokens"))
        .orderBy(col("doc_id"))
    }))

  def oracle: Map[String, String] = Map(
    "dedup_substring" ->
      s"""WITH docs AS (
         |  SELECT doc_id,
         |         len(string_split(text, ' '))::BIGINT AS n_tokens,
         |         string_split(text, ' ') AS ws
         |  FROM documents),
         |pos_grams AS (
         |  SELECT doc_id, i AS pos,
         |         array_to_string(ws[i+1 : i+$L], ' ') AS gram
         |  FROM docs, unnest(range(0, n_tokens - $L + 1)) AS t(i)
         |  WHERE n_tokens >= $L),
         |dup_pos AS (
         |  SELECT doc_id, pos
         |  FROM pos_grams
         |  WHERE gram IN (SELECT gram FROM pos_grams
         |                 GROUP BY gram HAVING count(*) > 1)),
         |flagged AS (
         |  SELECT doc_id, pos,
         |         CASE WHEN pos >= coalesce(
         |             max(pos + $L) OVER (PARTITION BY doc_id ORDER BY pos
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |             -2147483648) THEN 1 ELSE 0 END AS new_isl
         |  FROM dup_pos),
         |islands AS (
         |  SELECT doc_id,
         |         sum(new_isl) OVER (PARTITION BY doc_id ORDER BY pos
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl,
         |         pos
         |  FROM flagged),
         |doc_dup AS (
         |  SELECT doc_id, sum(len)::BIGINT AS dup_tokens
         |  FROM (SELECT doc_id, isl,
         |               (max(pos) + $L - min(pos))::BIGINT AS len
         |        FROM islands GROUP BY doc_id, isl)
         |  GROUP BY doc_id)
         |SELECT d.doc_id, d.n_tokens,
         |       coalesce(dd.dup_tokens, 0)::BIGINT AS dup_tokens,
         |       (coalesce(dd.dup_tokens, 0) * 1000000) // d.n_tokens
         |         AS dup_ppm
         |FROM docs d LEFT JOIN doc_dup dd USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin)
}
