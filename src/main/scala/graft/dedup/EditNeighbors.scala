package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Edit-distance-1 similarity join via deletion-neighborhood blocking
  * (the FastSS family) — the string-side sibling of the n-gram/MinHash
  * document near-dup operators: find all pairs within Levenshtein
  * distance 1 WITHOUT the all-pairs quadratic.
  *
  * Blocking invariant: two strings are within edit distance 1
  * (one substitution, insertion, or deletion) IFF they share a member
  * of each other's deletion neighborhood `{s} ∪ {s minus one char}` —
  * substitution pairs share the variant that deletes the differing
  * position from both; insertion/deletion pairs share the shorter
  * string itself. So candidate generation is LINEAR: |s|+1 variants per
  * string, candidates = equi-join on the variant, and the exact
  * `levenshtein = 1` check filters residually (it also kills the rare
  * xxhash64 collision, so hashing the variant to an 8-byte join key is
  * loss-free — the same argument as the n-gram family's hashed
  * shingles). A shared variant is ~length-of-string specific, so
  * candidate groups stay small for natural vocabularies — but short
  * strings are STRUCTURALLY hot (every 1-char string shares the ""
  * deletion variant; every copy of a duplicated token shares its own
  * string as a variant), so each variant's posting list is capped at
  * the first [[maxVariantDf]] members by (id, string) — the df-cap
  * precedent of `dedup_ngram`'s maxShingleDf, mirrored bit-for-bit in
  * the DuckDB oracle (which replays the blocking + cap + exact verify
  * in SQL). A 100 TB run with an adversarial hub therefore COMPLETES
  * with deterministic, oracle-checkable semantics instead of dying in
  * [[PairKernel.MaxBucketMembers]]'s fail-fast; that fail-fast stays
  * in force for the OTHER pair kernels, where a cap has no semantic
  * story (their buckets are all-duplicate groups needing no verify).
  *
  * Scale shape (the grouped-postings + in-kernel-verify pattern shared
  * with the simhash/phash bucket families): one scan emitting |s|+1
  * hashed keys per row, ONE uniform 8-byte-key shuffle grouping each
  * variant's postings into a bucket row, then [[EditPairsExpr]]
  * generates the bucket's pairs with the exact one-edit check INSIDE
  * the kernel — only TRUE pairs leave the bucket, so the pair-keyed
  * distinct exchange (a pair with repeated characters can share two
  * variants) carries ≈ output-size rows, never the candidate stream.
  * This replaced a variant-keyed self-join whose candidate stream was
  * ~4× the true-pair count at sf10. Never O(n²); hot buckets hit
  * [[PairKernel.MaxBucketMembers]]'s named fail-fast.
  */
object EditNeighbors {

  /** Max members kept per variant posting list — first N by (id,
    * string). Recall cost: a pair is LOST when every variant the two
    * strings share evicts at least ONE of them (one-sided eviction
    * suffices — e.g. a rank-1 hub member keeps its slot in a
    * hub-dominated variant while its true high-rank partner is evicted,
    * and if that variant was their only shared one, the pair is gone).
    * So hub-ADJACENT non-hub strings can lose pairs too, not only
    * intra-hub ones. The loss is deterministic (rank by (id, s)) and
    * the oracle mirrors the cap exactly (row_number ≤ cap per variant),
    * so streaming and batch agree bit-for-bit on WHAT is kept.
    *
    * Behavior change vs the pre-cap kernel: buckets of 257..16384
    * members previously completed EXHAUSTIVELY (and >16384 hit
    * [[PairKernel.MaxBucketMembers]]'s abort); they now complete with
    * capped postings. Callers that want the old exhaustive window pass
    * a larger cap through [[neighbors]]'s `cap` parameter — the cap is
    * a query-level knob, this constant only sets the default. On the
    * customer-name fixture no bucket comes near either bound at any
    * tested SF, so the output is identical to the uncapped quadratic
    * definition. */
  private[dedup] val maxVariantDf = 256

  /** `{s} ∪ {s minus one char}`, duplicates removed (repeated chars
    * make several deletions coincide). */
  private[dedup] def deletionVariants(s: Column): Column =
    array_distinct(concat(array(s),
      transform(sequence(lit(1), length(s)),
        i => concat(s.substr(lit(1), i - 1),
          s.substr(i + 1, length(s) - i)))))

  /** All unordered pairs of `df` rows with `levenshtein(strCol) == 1`,
    * exactly once each, as (a_id, a_name, b_id, b_name) — over the
    * `cap`-bounded variant universe (see [[maxVariantDf]]). */
  def neighbors(df: DataFrame, idCol: String, strCol: String,
                cap: Int = maxVariantDf): DataFrame = {
    val buckets = df
      .select(col(idCol).as("id"), col(strCol).as("s"))
      .select(col("id"), col("s"),
        explode(deletionVariants(col("s"))).as("vstr"))
      .groupBy(xxhash64(col("vstr")).as("key"))
      // BoundedCollect keeps the FIRST cap members by (id, s) with an
      // O(cap) buffer — a collect_list + slice would still buffer the
      // whole hot bucket during aggregation. Ascending (id, s) order
      // also gives the kernel its sorted-input invariant (a_id < b_id
      // for free), deterministic regardless of shuffle arrival order.
      .agg(graft.functions.BoundedCollect.firstN(
        col("id"), col("s"), cap).as("ms"))
    buckets
      .select(explode(SignatureExprs.editPairs(col("ms"))).as("p"))
      .select(col("p.a_id").as("a_id"), col("p.a_name").as("a_name"),
        col("p.b_id").as("b_id"), col("p.b_name").as("b_name"))
      .distinct()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Entity-resolution probe over the customer directory: every pair of
    // names one typo apart (here: ids whose zero-padded forms differ in
    // one digit — dense ground truth for the blocking to reproduce).
    "word_neighbors" -> ((s, d) =>
      neighbors(Tables.customer(s, d), "c_custkey", "c_name")
        .orderBy(col("a_id"), col("b_id"))),
  )

  def oracle: Map[String, String] = Map(
    // The blocking + cap + exact verify replayed in SQL (the
    // maxShingleDf mirroring precedent): deletion variants per name,
    // first maxVariantDf members per variant by (id, s), pairs from
    // shared variants, residual levenshtein = 1 check, DISTINCT. The
    // only Spark-side divergence is bucketing by xxhash64(variant)
    // instead of the variant string — identical up to 2⁻⁶⁴ collisions
    // (the n-gram family's argument). On this fixture no bucket nears
    // the cap, so the result ALSO equals the clean quadratic
    // definition — EditNeighborsSpec pins that equality independently.
    "word_neighbors" ->
      s"""WITH v AS (
         |  SELECT c_custkey AS id, c_name AS s, unnest(vs) AS vstr
         |  FROM (
         |    SELECT c_custkey, c_name,
         |           list_distinct(list_prepend(c_name,
         |             list_transform(range(1, length(c_name) + 1),
         |               i -> substr(c_name, 1, i - 1)
         |                    || substr(c_name, i + 1, length(c_name) - i))))
         |             AS vs
         |    FROM customer)),
         |capped AS (
         |  SELECT * FROM (
         |    SELECT id, s, vstr,
         |           row_number() OVER (PARTITION BY vstr ORDER BY id, s)
         |             AS rn
         |    FROM v)
         |  WHERE rn <= $maxVariantDf)
         |SELECT DISTINCT a.id AS a_id, a.s AS a_name,
         |                x.id AS b_id, x.s AS b_name
         |FROM capped a JOIN capped x
         |  ON a.vstr = x.vstr AND a.id < x.id
         |WHERE levenshtein(a.s, x.s) = 1
         |ORDER BY a_id, b_id""".stripMargin,
  )
}
