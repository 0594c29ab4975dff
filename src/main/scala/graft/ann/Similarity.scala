package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Similarity search over embedding columns (BASELINE.json north star).
  *
  * Scale design (100 TB):
  *  - Brute-force top-k is the exactness baseline: broadcast the (small)
  *    query set against the corpus — a map-side cross product with a
  *    per-partition top-k (window + filter plans as rank-limited), no
  *    shuffle of the corpus itself. Cost O(|corpus|·|queries|·d); right
  *    answer, only viable for modest query sets.
  *  - The scale path is sign-random-projection LSH ([[knnLsh]]): b
  *    deterministic hyperplanes → b-bit bucket key; only same-bucket
  *    candidates are scored. One shuffle on the bucket key. Recall is
  *    tunable via bands/probes; [[graft.SimilaritySpec]] measures it
  *    against the brute-force baseline. (An IVF variant — k-means
  *    centroids + nearest-centroid bucketing — shares the same skeleton:
  *    assign, shuffle on centroid id, score within cell.)
  *
  * All vector math is double-precision array expressions (`zip_with` +
  * `aggregate`) — codegen'd, no UDF, no Python. Cosines compared against
  * the oracle are rounded to 6 dp (summation order across engines differs
  * in the last ulp; every ranking gap in the testdata is ≥ 2e-4).
  */
object Similarity {

  /** Σ aᵢ·bᵢ in double precision, sequential fold (deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Codegen'd native-expression form of [[cosine]] — bit-identical values
    * (same accumulation order; asserted in SimilaritySpec), ~100× faster
    * per pair than the interpreted higher-order functions. Use this on hot
    * paths; keep [[cosine]] as the executable spec. */
  def cosineFast(a: Column, b: Column): Column = CosineSimExpr.cosineFast(a, b)

  /** embeddings ∪ deterministic near-duplicates (0.9·x + 0.01 per
    * component, vec_id + 10000, cosine ≈ 0.996 to the original). */
  def embWithNearDups(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("emb"))
    val near = e.select((col("vec_id") + 10000).as("vec_id"),
      transform(col("emb"), x => x * 0.9 + 0.01).as("emb"))
    e.unionByName(near)
  }

  /** Sign-random-projection bucket key: b pseudo-hyperplanes, plane p's
    * component for dimension i is ±1 from xxhash64(i, p) — deterministic,
    * no stored model. */
  def srpKey(emb: Column, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(emb, sequence(lit(0), size(emb) - 1), (x, i) =>
          x.cast("double") *
            when(pmod(xxhash64(i, lit(p)), lit(2)) === 0, 1.0).otherwise(-1.0)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_ bitwiseOR _)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact top-3 cosine neighbors for query vectors 0..4. Broadcast the
    // query side; rank per query; deterministic tiebreak on vec_id.
    "knn_brute" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("emb"))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("emb").as("qemb"))
      val scored = e.join(broadcast(q), col("vec_id") =!= col("qid"))
        .withColumn("cos", cosineFast(col("qemb"), col("emb")))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("vec_id"))
      scored
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("qid"), col("vec_id").as("nid"), col("rnk"),
          round(col("cos"), 6).as("cos6"))
        .orderBy(col("qid"), col("rnk"))
    }),

    // Embedding-cosine near-duplicate pairs (≥ 0.99) over the augmented
    // corpus — all-pairs via the broadcast dense kernel
    // ([[VectorKernels.cosinePairs]]; the expression formulation measured
    // ~100× slower — interpreted HOF lambdas). LSH below is the 100 TB
    // route; SimilaritySpec checks they agree here.
    "dedup_embcos" -> ((s, d) => {
      VectorKernels.cosinePairs(embWithNearDups(s, d), 0.99)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // LSH-bucketed near-dup: same semantics as dedup_embcos but only
    // same-bucket pairs are scored — bucketing is a distributed shuffle
    // on the key, and scoring joins candidates back to the embedding
    // table with the codegen'd CosineSimExpr kernel (identical
    // arithmetic, nothing driver-side) — end-to-end distributed, the
    // true 100 TB route. Hash-dependent recall → rows-only check here;
    // recall measured in SimilaritySpec.
    "knn_lsh" -> ((s, d) => {
      val e = embWithNearDups(s, d).withColumn("key", srpKey(col("emb"), 8))
      val a = e.select(col("vec_id").as("id_a"), col("key"))
      val b = e.select(col("vec_id").as("id_b"), col("key"))
      val cand = a.join(b, Seq("key")).filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
      VectorKernels.scorePairs(cand, e.select("vec_id", "emb"), 0.99)
        .orderBy(col("id_a"), col("id_b"))
    }),
  )

  def oracle: Map[String, String] = Map(
    "knn_brute" ->
      """WITH ex AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |         CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings),
        |norms AS (SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM ex GROUP BY 1),
        |dots AS (
        |  SELECT q.vec_id AS qid, e.vec_id AS nid, sum(q.x * e.x) AS dot
        |  FROM ex q JOIN ex e ON q.i = e.i AND q.vec_id < 5 AND e.vec_id <> q.vec_id
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT qid, nid, dot / (nq.nrm * ne.nrm) AS cos,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY dot / (nq.nrm * ne.nrm) DESC, nid) AS rnk
        |  FROM dots JOIN norms nq ON nq.vec_id = qid
        |            JOIN norms ne ON ne.vec_id = nid)
        |SELECT qid, nid, CAST(rnk AS INT) AS rnk, round(cos, 6) AS cos6
        |FROM scored WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin,
    "dedup_embcos" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 10000,
        |         list_transform(CAST(embedding AS DOUBLE[]), x -> x * 0.9 + 0.01)
        |  FROM embeddings),
        |ex AS (
        |  SELECT vec_id, generate_subscripts(emb, 1) AS i, unnest(emb) AS x
        |  FROM e),
        |norms AS (SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM ex GROUP BY 1),
        |dots AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, sum(a.x * b.x) AS dot
        |  FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id < b.vec_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, round(dot / (na.nrm * nb.nrm), 6) AS cos6
        |FROM dots JOIN norms na ON na.vec_id = id_a
        |          JOIN norms nb ON nb.vec_id = id_b
        |WHERE dot / (na.nrm * nb.nrm) >= 0.99
        |ORDER BY id_a, id_b""".stripMargin,
  )
}
