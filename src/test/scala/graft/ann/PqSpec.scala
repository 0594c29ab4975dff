package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  test("knn_pq: recall vs brute force; returned cosines are EXACT (rescored)") {
    val brute = Similarity.queries("knn_brute")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val pq = Pq.knnPq(Ivf.embFloat(spark, sf0001), (0L until 5L).toSet, k = 3)
      .collect()
    assert(pq.length == 15) // 5 queries × 3
    val hits = pq.map(r => (r.getLong(0), r.getLong(1))).count(brute.contains)
    val recall = hits.toDouble / brute.size
    // deterministic pipeline; at the 8-bit code width (K=256) the ADC
    // ordering is accurate enough that the 4k rescore recovers most of
    // the exact top-3 even on near-uniform vectors
    assert(recall >= 0.6, s"PQ recall@3 = $recall")
    // the rescoring phase returns TRUE cosines: every overlapping
    // (qid, nid) pair carries bit-identical cos6
    pq.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      brute.get(key).foreach(c => assert(r.getDouble(3) == c, s"$key cosine drift"))
    }
  }

  test("encode: deterministic, code bounds, and compression contract") {
    val e = Similarity.embWithNearDups(spark, sf0001)
    val sample = e.orderBy("vec_id").limit(256)
      .select("emb").as[Seq[Double]].collect().map(_.toArray)
    val model = Pq.train(sample)
    val a = Pq.encode(e, model).select("vec_id", "codes")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val b = Pq.encode(e.repartition(7), model).select("vec_id", "codes")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(a == b, "encoding must not depend on partitioning")
    assert(a.values.forall(c => c.length == Pq.M && c.forall(x => x >= 0 && x < Pq.K)))
    // self-query sanity: a vector's ADC distance to its own codes is the
    // sum of its per-subspace quantization errors — strictly below the
    // table's worst entry for a non-degenerate codebook
    val v = sample.head
    val dt = model.adcTable(v)
    val own = model.encode(v).zipWithIndex.map { case (c, m) => dt(m * Pq.K + c) }.sum
    assert(own <= dt.grouped(Pq.K).map(_.min).sum + 1e-12)
  }
}
