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

  /** All-pairs cosine ≥ tau. `e` must have (vec_id: long, emb:
    * array<double>); the whole table is broadcast (small-side contract).
    * Arithmetic is bit-identical to the expression form: sequential
    * index-order dot/norm sums, cos = dot/(na·nb), HALF_UP 6-dp round.
    *
    * Pair blocks are mirrored (k ↔ n-1-k) so every task scores ~n pairs —
    * no triangle skew. */
  def cosinePairs(e: DataFrame, tau: Double): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val rows = e.selectExpr("vec_id", "emb").as[(Long, Seq[Double])]
      .collect().sortBy(_._1)
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

  /** Score an explicit candidate-pair set (id_a, id_b) against the
    * broadcast vector table, keeping pairs with cosine ≥ tau. Same
    * arithmetic/rounding as [[cosinePairs]]. */
  def scorePairs(pairs: DataFrame, e: DataFrame, tau: Double): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val rows = e.selectExpr("vec_id", "emb").as[(Long, Seq[Double])].collect()
    val vecs = rows.map { case (id, v) => id -> v.toArray }.toMap
    val norms = vecs.map { case (id, v) => id -> math.sqrt(dot(v, v)) }
    val bc = spark.sparkContext.broadcast((vecs, norms))
    pairs.selectExpr("id_a", "id_b").as[(Long, Long)]
      .mapPartitions { it =>
        val (bVecs, bNorms) = bc.value
        it.flatMap { case (a, b) =>
          require(bVecs.contains(a) && bVecs.contains(b),
            s"candidate pair ($a,$b) references ids absent from the vector table")
          val c = dot(bVecs(a), bVecs(b)) / (bNorms(a) * bNorms(b))
          if (c >= tau) Some((a, b, round6(c))) else None
        }
      }
      .toDF("id_a", "id_b", "cos6")
  }

  /** Exact top-k neighbors for each of `queryIds` (cosine, tiebreak id). */
  def topK(e: DataFrame, queryIds: Set[Long], k: Int): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val rows = e.selectExpr("vec_id", "emb").as[(Long, Seq[Double])]
      .collect().sortBy(_._1)
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
