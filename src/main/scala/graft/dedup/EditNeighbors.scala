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
  * candidate groups stay small for natural vocabularies; a df-style cap
  * (mirror of `dedup_ngram`'s hot-shingle cap) is the escape hatch for
  * adversarial hubs and would be mirrored in the oracle the same way.
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

  /** `{s} ∪ {s minus one char}`, duplicates removed (repeated chars
    * make several deletions coincide). */
  private[dedup] def deletionVariants(s: Column): Column =
    array_distinct(concat(array(s),
      transform(sequence(lit(1), length(s)),
        i => concat(s.substr(lit(1), i - 1),
          s.substr(i + 1, length(s) - i)))))

  /** All unordered pairs of `df` rows with `levenshtein(strCol) == 1`,
    * exactly once each, as (a_id, a_name, b_id, b_name). */
  def neighbors(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    val buckets = df
      .select(col(idCol).as("id"), col(strCol).as("s"))
      .select(col("id"), col("s"),
        explode(deletionVariants(col("s"))).as("vstr"))
      .groupBy(xxhash64(col("vstr")).as("key"))
      // sort by id: the kernel emits i<j pairs, so a_id < b_id for free
      .agg(sort_array(collect_list(struct(col("id"), col("s")))).as("ms"))
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
    // the quadratic definition the linear blocking must reproduce
    "word_neighbors" ->
      """SELECT a.c_custkey AS a_id, a.c_name AS a_name,
        |       b.c_custkey AS b_id, b.c_name AS b_name
        |FROM customer a JOIN customer b
        |  ON a.c_custkey < b.c_custkey
        | AND levenshtein(a.c_name, b.c_name) = 1
        |ORDER BY a_id, b_id""".stripMargin,
  )
}
