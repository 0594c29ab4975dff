package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest-neighbor search.
  *
  * Standard two-phase shape:
  *  1. '''Train''' k centroids with Lloyd's algorithm on a (driver-side)
  *     sample — at 100 TB one always trains the coarse quantizer on a
  *     sample; the model is a few KB and broadcasts.
  *  2. '''Assign''' every vector to its nearest centroid (embarrassingly
  *     parallel map over the corpus; output is a `cell` column you'd
  *     persist partitioned-by-cell so probes prune at the file level).
  *  3. '''Search''' probes the `nprobe` nearest cells per query and
  *     scores only those candidates — corpus-fraction scanned ≈
  *     nprobe/nlist instead of 1.
  *
  * Deterministic: centroid init = first k vectors by id, fixed iteration
  * count, no RNG. Recall vs the exact brute-force path is measured (and
  * pinned) in SimilaritySpec.
  */
object Ivf {

  final case class Model(centroids: Array[Array[Double]]) {
    def nearestCell(v: Array[Double]): Int = {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < centroids.length) {
        val d = sqDist(v, centroids(c))
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    def nearestCells(v: Array[Double], n: Int): Seq[Int] =
      centroids.indices.sortBy(c => sqDist(v, centroids(c))).take(n)
  }

  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Lloyd's k-means, deterministic (init = first k sample vectors).
    * k is clamped to the sample size. */
  def train(sample: Array[Array[Double]], k0: Int, iters: Int): Model = {
    require(sample.nonEmpty, "cannot train IVF on an empty sample")
    val k = math.min(k0, sample.length)
    val dim = sample.head.length
    var centroids = sample.take(k).map(_.clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(k, dim)(0.0)
      val counts = new Array[Long](k)
      val m = Model(centroids)
      sample.foreach { v =>
        val c = m.nearestCell(v)
        counts(c) += 1
        var i = 0
        while (i < dim) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) centroids(c)
        else { val out = sums(c); var i = 0
          while (i < dim) { out(i) /= counts(c); i += 1 }; out }
      }
    }
    Model(centroids)
  }

  /** Assign a cell id to every vector (distributed map over the corpus
    * against the broadcast model). */
  def assign(e: DataFrame, model: Model): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    e.selectExpr("vec_id", "emb").as[(Long, Seq[Double])]
      .map { case (id, v) => (id, v, bc.value.nearestCell(v.toArray)) }
      .toDF("vec_id", "emb", "cell")
  }

  /** Upper bound on the k-means training sample pulled to the driver.
    * The coarse quantizer only needs a representative sample — a few KB
    * of centroids come out regardless of corpus size — so training cost
    * and driver memory stay O(maxTrainSample), never O(corpus). */
  val maxTrainSample: Int = 1 << 16

  /** Top-k cosine neighbors for `queryIds`, probing `nprobe` cells. */
  def knnIvf(e: DataFrame, queryIds: Set[Long], k: Int,
      nlist: Int, nprobe: Int, iters: Int = 5): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    // deterministic bounded sample, stratified by hash order — an
    // id-prefix sample would bias the quantizer wherever vec_id
    // correlates with content (time-ordered ingestion, per-source id
    // blocks). TakeOrderedAndProject on (xxhash64(vec_id), vec_id):
    // distributed top-n, not a whole-table collect; at test scale the
    // sample is still the whole table.
    val sample = e.selectExpr("vec_id", "emb")
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(maxTrainSample)
      .as[(Long, Seq[Double])].collect()
    val model = train(sample.map(_._2.toArray), nlist, iters)
    val assigned = assign(e, model)
    // query vectors fetched by id — |queryIds| rows, independent of the
    // sample bound
    val queries = e.filter(col("vec_id").isInCollection(queryIds))
      .selectExpr("vec_id", "emb").as[(Long, Seq[Double])]
      .collect().sortBy(_._1)
    val probes = queries.map { case (qid, qv) =>
      (qid, qv, model.nearestCells(qv.toArray, nprobe))
    }
    val probeDf = spark.createDataset(probes.toIndexedSeq)
      .toDF("qid", "qemb", "cells")
    // candidates: rows whose cell is probed by the query; score only those
    val cand = assigned.join(broadcast(probeDf),
      array_contains(col("cells"), col("cell")) && col("vec_id") =!= col("qid"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    cand
      .withColumn("cos", Similarity.cosineFast(col("qemb"), col("emb")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("vec_id").as("nid"), col("rnk"),
        round(col("cos"), 6).as("cos6"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** Float corpus frame (vec_id, emb) for [[knnIvf]] / [[Pq.knnPq]] —
    * the production-parameter paths, spec-pinned; the driver-checked
    * `knn_ivf`/`knn_pq`/`knn_ivfpq` queries live in [[FixedPointAnn]]. */
  def embFloat(s: SparkSession, d: String): DataFrame =
    graft.Tables.embeddings(s, d)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("emb"))
}
