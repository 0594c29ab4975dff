package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {

  test("emb_pca_power: exact integer replay of both unrolled iterations") {
    val got = Pca.queries("emb_pca_power")(spark, sf0001).collect()
      .map(r => (r.getAs[Int]("j"), r.getAs[Long]("v1_scaled"),
        r.getAs[Long]("v2_scaled"), r.getAs[Long]("lambda_grid")))
    assert(got.length == 8)
    val qs = graft.Tables.embeddings(spark, sf0001)
      .select(col("embedding")).collect()
      .map(_.getAs[Seq[Float]]("embedding")
        .map(x => math.floor(x.toDouble * 1024).toLong).toArray)
    val d = qs.head.length
    def iterate(v: Array[Long]): (Array[Long], Long) = {
      val u = new Array[Long](d)
      for (q <- qs) {
        var s = 0L; var j = 0
        while (j < d) { s += q(j) * v(j); j += 1 }
        j = 0
        while (j < d) { u(j) += q(j) * s; j += 1 }
      }
      val m = u.map(math.abs).max
      (u.map(x => if (x >= 0) x * 1024 / m else -((-x) * 1024 / m)), m)
    }
    val (v1, _) = iterate(Array.fill(d)(1L))
    val (v2, m2) = iterate(v1)
    for ((j, g1, g2, lg) <- got) {
      assert(g1 == v1(j), s"v1[$j]: got $g1 want ${v1(j)}")
      assert(g2 == v2(j), s"v2[$j]: got $g2 want ${v2(j)}")
      assert(lg == m2 / 1024, s"lambda: got $lg want ${m2 / 1024}")
    }
    // sanity: the iterate is heading somewhere — successive normalized
    // iterates correlate (power iteration contracts toward the dominant
    // eigenvector, whose Rayleigh quotient is positive for QᵀQ)
    val dot = v1.zip(v2).map { case (a, b) => a.toDouble * b }.sum
    assert(dot > 0, "successive iterates anti-correlated")
  }

  test("emb_pca_power is deterministic across runs") {
    // integer grid arithmetic: sums commute exactly, so re-execution
    // (fresh shuffles, different reduce orders) is bit-identical
    val a = Pca.queries("emb_pca_power")(spark, sf0001).collect().toSeq
    val b = Pca.queries("emb_pca_power")(spark, sf0001).collect().toSeq
    assert(a.map(_.toString) == b.map(_.toString))
  }
}
