package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-quantization (PQ) approximate nearest-neighbor search —
  * Jégou et al. 2011, "Product quantization for nearest neighbor
  * search". Completes the ANN family: brute (exact), SRP-LSH (bucketed),
  * IVF (cell-probed), PQ (compressed-domain scan).
  *
  * Shape (and why it scales):
  *  1. '''Train''': split the d-dim space into `M` subspaces; per
  *     subspace, Lloyd a `K`-entry codebook on a bounded sample
  *     (deterministic: [[Ivf.train]], first-k init, fixed iterations —
  *     the codebook is M·K·(d/M) doubles ≈ KBs, broadcastable).
  *  2. '''Encode''': every vector → M sub-codes (one byte each at
  *     K ≤ 256). 64-dim float corpus (512 B/vec) compresses to 8 B/vec
  *     — the compressed corpus of a 10⁹-vector deployment fits in
  *     aggregate executor memory, which is the whole point: the ADC
  *     scan touches codes only, never raw vectors.
  *  3. '''Search''' (asymmetric distance computation): per query, an
  *     M×K table of partial squared distances to every codebook entry;
  *     a row's approximate distance is M table lookups summed — no
  *     float math against raw vectors. Top candidates by ADC are then
  *     RESCORED exactly (cosine on the raw vectors, standard
  *     refinement) so returned neighbors carry true cosines.
  *
  * Deterministic end-to-end (no RNG anywhere), but the codebook floats
  * make a cross-engine SQL replay impractical → rows-only at the
  * driver gate; PqSpec pins recall vs knn_brute, encode determinism,
  * code bounds, and that returned cosines match the exact kernel.
  */
object Pq {

  /** Subspace count (64-dim corpus → 8 dims per subspace). */
  val M = 8

  /** Codebook entries per subspace — the standard 8-bit PQ code (one
    * byte per subspace; Jégou et al.'s reference configuration).
    * Clamped to the sample size when the corpus is smaller. */
  val K = 256

  /** Training-sample bound for the M codebooks. Tighter than
    * [[Ivf.maxTrainSample]] because Lloyd cost here is
    * iters·sample·K·d — at K=256 a 2¹⁴ sample keeps driver-side
    * training in seconds; the codebook quality a coarse quantizer
    * needs saturates well below that (the published recipe trains on
    * a bounded sample regardless of corpus size). */
  val maxTrainSample: Int = 1 << 14

  final case class Model(books: Array[Array[Array[Double]]]) {
    // books(m)(k) is the K-entry codebook of subspace m
    def encode(v: Array[Double]): Array[Int] = {
      val dsub = v.length / books.length
      Array.tabulate(books.length) { m =>
        var best = 0; var bestD = Double.MaxValue
        var k = 0
        while (k < books(m).length) {
          var s = 0.0; var i = 0
          while (i < dsub) {
            val diff = v(m * dsub + i) - books(m)(k)(i); s += diff * diff; i += 1
          }
          if (s < bestD) { bestD = s; best = k }
          k += 1
        }
        best
      }
    }
    /** Flattened M×K ADC table for `q`: entry m·K + k is the partial
      * squared distance between q's m-th subvector and codebook entry k. */
    def adcTable(q: Array[Double]): Array[Double] = {
      val dsub = q.length / books.length
      val out = new Array[Double](books.length * K)
      for (m <- books.indices; k <- books(m).indices) {
        var s = 0.0; var i = 0
        while (i < dsub) {
          val diff = q(m * dsub + i) - books(m)(k)(i); s += diff * diff; i += 1
        }
        out(m * K + k) = s
      }
      out
    }
  }

  /** Per-subspace Lloyd on the shared bounded sample ([[Ivf.train]] —
    * same first-k init, same fixed iterations, no RNG). */
  def train(sample: Array[Array[Double]], iters: Int = 3): Model = {
    val dsub = sample.head.length / M
    Model(Array.tabulate(M) { m =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, m * dsub, (m + 1) * dsub))
      Ivf.train(sub, K, iters).centroids
    })
  }

  /** Distributed encode: corpus scan × broadcast codebook → M codes. */
  def encode(e: DataFrame, model: Model): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    e.selectExpr("vec_id", "emb").as[(Long, Seq[Double])]
      .map { case (id, v) => (id, v, bc.value.encode(v.toArray).toSeq) }
      .toDF("vec_id", "emb", "codes")
  }

  /** Top-`k` neighbors for `queryIds` via ADC scan + exact rescoring of
    * the top `rescore`·k ADC candidates. Same output contract and
    * (cos desc, vec_id) tiebreak as knn_brute, so overlapping rows agree
    * bit-for-bit. */
  def knnPq(e: DataFrame, queryIds: Set[Long], k: Int,
      rescore: Int = 4, iters: Int = 3): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val sample = e.selectExpr("vec_id", "emb")
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(maxTrainSample)
      .as[(Long, Seq[Double])].collect()
    val model = train(sample.map(_._2.toArray), iters)
    val coded = encode(e, model)
    val queries = e.filter(col("vec_id").isInCollection(queryIds))
      .selectExpr("vec_id", "emb").as[(Long, Seq[Double])]
      .collect().sortBy(_._1)
    val qdf = spark.createDataset(queries.toIndexedSeq.map { case (qid, qv) =>
      (qid, qv, model.adcTable(qv.toArray).toSeq)
    }).toDF("qid", "qemb", "dt")
    // ADC scan: the in-row distance is M table lookups summed; only
    // (qid, vec_id, adc) survives to the per-query top-(rescore·k) cut
    val adc = coded.join(broadcast(qdf), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("qemb"), col("vec_id"), col("emb"),
        aggregate(
          zip_with(col("codes"), sequence(lit(0), lit(M - 1)),
            (c, m) => element_at(col("dt"), m * K + c + 1)),
          lit(0.0), (acc, x) => acc + x).as("adc"))
    val wAdc = Window.partitionBy(col("qid"))
      .orderBy(col("adc"), col("vec_id"))
    val wCos = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id"))
    adc
      .withColumn("arnk", row_number().over(wAdc))
      .filter(col("arnk") <= k * rescore)
      .withColumn("cos", Similarity.cosineFast(col("qemb"), col("emb")))
      .withColumn("rnk", row_number().over(wCos))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("vec_id").as("nid"), col("rnk"),
        round(col("cos"), 6).as("cos6"))
      .orderBy(col("qid"), col("rnk"))
  }

}
