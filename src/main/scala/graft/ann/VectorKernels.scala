package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dense vector kernels for similarity workloads.
  *
  * Spark's higher-order array functions are evaluated interpreted (one
  * boxed lambda call per element) — fine for per-row feature math, ~100×
  * too slow for all-pairs scoring (measured: 8M pairs × 64 dims ≈ 150 s
  * at sf0.1). This kernel keeps the *orchestration* in Spark (a
  * distributed range over pair-blocks) and the *inner loop* in plain JVM
  * arrays over a broadcast of the smaller side — exactly a broadcast hash
  * join's shape, with a GEMM-like block kernel instead of a hash probe.
  *
  * Scale: valid whenever one side fits in executor memory (embedding dim
  * × rows × 8B; 2 MB here, ~GBs on real corpora — same budget rule as any
  * broadcast join). For corpus×corpus at 100 TB use the LSH/IVF bucketed
  * paths ([[Similarity]]), which shuffle on bucket keys instead.
  */
object VectorKernels {

  /** Rows the dense kernels may materialize driver-side. This is the same
    * budget rule as any broadcast join's small side (≈128 MB at 64 dims):
    * the kernels REQUIRE the table to be small, and the guard makes the
    * contract checked, not assumed — a caller holding a corpus-sized table
    * fails fast instead of OOMing the driver, and is pointed at the
    * bucketed LSH/IVF paths. */
  val maxBroadcastRows: Int = 1 << 18

  /** All-pairs cosine ≥ tau. `e` must have (vec_id: long, emb:
    * array<double>); the whole table is broadcast (small-side contract,
    * enforced via [[maxBroadcastRows]]). Arithmetic is bit-identical to
    * the expression form: sequential index-order dot/norm sums,
    * cos = dot/(na·nb), HALF_UP 6-dp round.
    *
    * Pair blocks are mirrored (k ↔ n-1-k) so every task scores ~n pairs —
    * no triangle skew. */
  /** Guarded driver-side materialization for the dense kernels: collects
    * at most `maxBroadcastRows + 1` rows (so the failure mode is a clear
    * exception, not a driver OOM) and requires the result to fit the
    * broadcast budget. */
  private def boundedCollect(e: DataFrame): Array[(Long, Seq[Double])] = {
    val spark = e.sparkSession
    import spark.implicits._
    val rows = e.selectExpr("vec_id", "emb").as[(Long, Seq[Double])]
      .limit(maxBroadcastRows + 1).collect()
    require(rows.length <= maxBroadcastRows,
      s"dense vector kernel asked to broadcast > $maxBroadcastRows rows; " +
        "use the bucketed LSH/IVF paths (graft.ann.Similarity / Ivf) for " +
        "corpus-scale inputs")
    rows.sortBy(_._1)
  }

  def cosinePairs(e: DataFrame, tau: Double): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val rows = boundedCollect(e)
    val ids = rows.map(_._1)
    val vecs = rows.map(_._2.toArray)
    val norms = vecs.map(v => math.sqrt(dot(v, v)))
    val n = ids.length
    if (n == 0) return spark.emptyDataset[(Long, Long, Double)]
      .toDF("id_a", "id_b", "cos6")
    val bc = spark.sparkContext.broadcast((ids, vecs, norms))
    val half = (n + 1) / 2
    spark.range(0, half.toLong, 1, math.max(1, math.min(half, 64)))
      .flatMap { k0 =>
        val (bIds, bVecs, bNorms) = bc.value
        val k = k0.toInt
        val mirror = n - 1 - k
        val rowsToDo = if (mirror == k) Seq(k) else Seq(k, mirror)
        rowsToDo.iterator.flatMap { i =>
          (i + 1 until n).iterator.flatMap { j =>
            val c = dot(bVecs(i), bVecs(j)) / (bNorms(i) * bNorms(j))
            if (c >= tau) Some((bIds(i), bIds(j), round6(c))) else None
          }
        }
      }
      .toDF("id_a", "id_b", "cos6")
  }

  /** Score an explicit candidate-pair set (id_a, id_b) against the vector
    * table, keeping pairs with cosine ≥ tau. Fully distributed — the
    * candidates join back to `e` twice (shuffle/broadcast chosen by
    * Catalyst + AQE on the ids) and the cosine is the codegen'd
    * [[CosineSimExpr]] kernel, so neither the corpus nor the pair set is
    * ever materialized on the driver. This is the scorer behind the
    * LSH "100 TB route" ([[Similarity]] knn_lsh). Arithmetic and HALF_UP
    * 6-dp rounding are bit-identical to [[cosinePairs]] (asserted in
    * SimilaritySpec). Candidate ids absent from `e` are dropped by the
    * inner joins (LSH candidates always originate from `e`). */
  def scorePairs(pairs: DataFrame, e: DataFrame, tau: Double): DataFrame = {
    import org.apache.spark.sql.functions.{col, round}
    val ea = e.selectExpr("vec_id AS id_a", "emb AS emb_a")
    val eb = e.selectExpr("vec_id AS id_b", "emb AS emb_b")
    pairs.select(col("id_a"), col("id_b"))
      .join(ea, Seq("id_a"))
      .join(eb, Seq("id_b"))
      .withColumn("cos", CosineSimExpr.cosineFast(col("emb_a"), col("emb_b")))
      .filter(col("cos") >= tau)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos6"))
  }

  /** Exact top-k neighbors for each of `queryIds` (cosine, tiebreak id).
    * Dense small-side kernel (guarded by [[maxBroadcastRows]]); the
    * distributed exactness baseline is `knn_brute` in [[Similarity]]. */
  def topK(e: DataFrame, queryIds: Set[Long], k: Int): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val rows = boundedCollect(e)
    val ids = rows.map(_._1)
    val vecs = rows.map(_._2.toArray)
    val norms = vecs.map(v => math.sqrt(dot(v, v)))
    val bc = spark.sparkContext.broadcast((ids, vecs, norms))
    val qs = ids.zipWithIndex.filter(t => queryIds(t._1)).map(_._2)
    spark.sparkContext.parallelize(qs.toSeq, math.min(qs.length max 1, 32))
      .flatMap { qi =>
        val (bIds, bVecs, bNorms) = bc.value
        val scored = bIds.indices.iterator
          .filter(_ != qi)
          .map(j => (bIds(j),
            dot(bVecs(qi), bVecs(j)) / (bNorms(qi) * bNorms(j))))
          .toSeq
        scored.sortBy { case (id, c) => (-c, id) }.take(k).zipWithIndex
          .map { case ((nid, c), r) => (bIds(qi), nid, r + 1, round6(c)) }
      }
      .toDF("qid", "nid", "rnk", "cos6")
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Same rounding as Spark's round(col, 6) on doubles. */
  private def round6(d: Double): Double =
    java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
}
